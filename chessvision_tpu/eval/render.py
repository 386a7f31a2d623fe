"""Board rendering for evaluation artifacts — no cairo dependency.

The reference renders predicted positions through chess.svg + cairosvg
(evaluate.py:155-157); neither is available here, so boards are drawn
directly with matplotlib (unicode piece glyphs on a colored grid), giving
the same capability: per-image predicted-position PNGs next to masks and
extracted boards.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from chessvision_tpu.chessboard import expand_fen

GLYPHS = {
    "P": "♙", "N": "♘", "B": "♗", "R": "♖", "Q": "♕", "K": "♔",
    "p": "♟", "n": "♞", "b": "♝", "r": "♜", "q": "♛", "k": "♚",
}
LIGHT = "#f0d9b5"
DARK = "#b58863"


def render_board_png(fen: str, path: str | Path, size: int = 400) -> Path:
    """Render a board FEN to a PNG file."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    expanded = expand_fen(fen)
    fig, ax = plt.subplots(figsize=(size / 100, size / 100), dpi=100)
    for rank in range(8):  # rank 0 = top (8th rank)
        for file in range(8):
            color = LIGHT if (rank + file) % 2 == 0 else DARK
            ax.add_patch(plt.Rectangle((file, 7 - rank), 1, 1, facecolor=color))
            piece = expanded[rank * 8 + file]
            if piece != ".":
                ax.text(
                    file + 0.5,
                    7 - rank + 0.5,
                    GLYPHS[piece],
                    fontsize=size / 16,
                    ha="center",
                    va="center",
                )
    ax.set_xlim(0, 8)
    ax.set_ylim(0, 8)
    ax.set_aspect("equal")
    ax.axis("off")
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return path


def save_eval_artifacts(
    out_dir: str | Path,
    name: str,
    *,
    fen: str | None = None,
    binary_mask: np.ndarray | None = None,
    board_image: np.ndarray | None = None,
) -> dict[str, Path]:
    """Persist the reference's per-image eval artifacts (evaluate.py:373-403):
    predicted-board render, binary mask, extracted board crop.  Returns
    ``{kind: path}`` so callers can record artifact locations per table row
    (the reference writes these images INTO the per-sample metrics table,
    evaluate.py:248-261)."""
    import cv2

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    written: dict[str, Path] = {}
    stem = Path(name).stem
    if fen:
        written["predicted_board"] = render_board_png(fen, out / f"{stem}_predicted.png")
    if binary_mask is not None:
        p = out / f"{stem}_mask.png"
        cv2.imwrite(str(p), binary_mask)
        written["binary_mask"] = p
    if board_image is not None:
        p = out / f"{stem}_board.png"
        cv2.imwrite(str(p), board_image)
        written["extracted_board"] = p
    return written


def display_comparison(
    result,
    path: str | Path | None = None,
    *,
    image=None,
    show: bool = False,
):
    """Side-by-side input / probability mask / extracted board / predicted
    position — the reference's ``display_comparison`` notebook helper
    (reference utils.py:135-187), rendered with matplotlib.

    ``result`` is a ``ChessVisionResult`` (core.process_image output);
    ``image`` is the original BGR input frame (reference panel 0 —
    results don't retain it, so pass it explicitly to get that panel).
    Saves to ``path`` when given; returns the matplotlib figure.
    """
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    board = result.board_extraction
    base = 2 + (1 if image is not None else 0)
    n = base + (2 if result.position is not None else 0)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4))
    col = 0
    if image is not None:
        axes[col].imshow(np.asarray(image)[..., ::-1])  # BGR → RGB
        axes[col].set_title("input")
        col += 1
    # .probabilities stores raw logits (core.py stores result.logits
    # there) — squash through a sigmoid so the panel shows probabilities
    axes[col].imshow(1.0 / (1.0 + np.exp(-np.asarray(board.probabilities, np.float32))),
                     cmap="viridis", vmin=0.0, vmax=1.0)
    axes[col].set_title("segmentation probabilities")
    axes[col + 1].imshow(board.binary_mask, cmap="gray")
    axes[col + 1].set_title("binary mask")
    if result.position is not None:
        axes[col + 2].imshow(board.board_image, cmap="gray")
        axes[col + 2].set_title("extracted board")
        # render the predicted position into the last panel via a temp PNG
        import tempfile

        import numpy as _np
        from PIL import Image as _Image

        with tempfile.NamedTemporaryFile(suffix=".png") as tmp:
            render_board_png(result.position.fen, tmp.name)
            axes[col + 3].imshow(_np.asarray(_Image.open(tmp.name)))
        axes[col + 3].set_title(result.position.fen.split("/")[0] + "…")
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    if path is not None:
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(p, bbox_inches="tight")
    if show:  # pragma: no cover — interactive sessions only
        plt.show()
    else:
        plt.close(fig)
    return fig
