"""Generate synthetic SCREEN-PHOTO board images for segmentation training.

Round-4 error analysis (scripts/error_analysis.py, RESULTS.md) found the
test set's errors concentrated on photos of DIGITAL boards on screens:
73% of wrong squares come from 4 screen-photo boards where the UNet's
mask bleeds past the board into the monitor (shifting every rank) or —
for a small board diagram embedded in a busy webpage — vanishes entirely
(the one extraction failure). The board_extraction training set is
dominated by physical boards, so this is a data gap, not a model gap.

This generator closes the gap with the 3LC-style curation move the
reference's workflow prescribes (DATA_COLLECTION.md: inspect → fix data →
retrain): synthesize digital-board screen photos WITH exact masks —

  - board diagrams rendered from random positions in random website
    themes (checkered grid + unicode piece glyphs, eval/render.py style),
  - composited into screen contexts: webpage-with-text-clutter, dark
    desktop, bezel margins — at scales 0.35–0.95 of the frame,
  - under mild perspective/rotation, then screen-photo degradation:
    moiré interference bands, washout, blur, JPEG artifacts,

and write images/ + masks/ dirs shaped exactly like data/board_extraction
(256², mask = filled board quad). Deterministic from --seed; the output
dir is regenerable, not committed.

Usage:
    python scripts/make_screen_boards.py --n 400 \
        --out store/datasets/screen_synth
Then fine-tune with:
    python -m chessvision_tpu.train.train_unet \
        --extra-data store/datasets/screen_synth ...
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

GLYPHS = {
    "P": "♙", "N": "♘", "B": "♗", "R": "♖", "Q": "♕", "K": "♔",
    "p": "♟", "n": "♞", "b": "♝", "r": "♜", "q": "♛", "k": "♚",
}
PIECES = list(GLYPHS)

# (light, dark) square themes seen on common chess sites / the test set's
# screen photos: lichess brown, chess.com green, blue, gray, washed gray
THEMES = [
    ((240, 217, 181), (181, 136, 99)),
    ((238, 238, 210), (118, 150, 86)),
    ((222, 227, 230), (140, 162, 173)),
    ((220, 220, 220), (150, 150, 150)),
    ((200, 200, 200), (120, 130, 140)),
    ((250, 250, 250), (160, 160, 170)),
]


def render_digital_board(rng: np.random.Generator, px: int) -> np.ndarray:
    """A px×px BGR digital board diagram: themed checkerboard + glyphs."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    light, dark = THEMES[rng.integers(len(THEMES))]
    light_f = tuple(c / 255 for c in reversed(light))
    dark_f = tuple(c / 255 for c in reversed(dark))
    fig = plt.figure(figsize=(px / 100, px / 100), dpi=100)
    ax = fig.add_axes([0, 0, 1, 1])
    occupied = rng.random((8, 8)) < rng.uniform(0.2, 0.55)
    piece_color = "black" if rng.random() < 0.8 else "#333"
    for rank in range(8):
        for file in range(8):
            color = light_f if (rank + file) % 2 == 0 else dark_f
            ax.add_patch(plt.Rectangle((file, 7 - rank), 1, 1, facecolor=color))
            if occupied[rank, file]:
                ax.text(
                    file + 0.5,
                    7 - rank + 0.47,
                    GLYPHS[PIECES[rng.integers(len(PIECES))]],
                    fontsize=px / 14,
                    ha="center",
                    va="center",
                    color=piece_color,
                )
    ax.set_xlim(0, 8)
    ax.set_ylim(0, 8)
    ax.set_aspect("equal")
    ax.axis("off")
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return buf[..., ::-1].copy()  # RGB → BGR


def render_print_board(
    rng: np.random.Generator, px: int, paper: tuple[int, int, int]
) -> tuple[np.ndarray, float]:
    """A book/magazine DIAGRAM tile (BGR) + the margin fraction.

    Round-4 follow-up: the first synthetic batch (screen UI boards) fixed
    the screen-photo test errors but left the two PRINTED-page boards
    (b7ab6da8: diagram in a book with caption text; 006bab7f: underexposed
    page with coordinate labels) — line-art checkerboards with black
    outline glyphs look nothing like colored website themes.  Returns the
    tile and the fraction of the tile that is margin (coordinate labels /
    paper border) so compose() can mask the inner board quad only.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    coords = rng.random() < 0.6  # coordinate letters/digits around the board
    mb = 0.55 if coords else rng.uniform(0.0, 0.2)  # margin in square units
    paper_f = tuple(c / 255 for c in reversed(paper))
    tpx = int(px * (8 + 2 * mb) / 8)
    fig = plt.figure(figsize=(tpx / 100, tpx / 100), dpi=100, facecolor=paper_f)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.set_facecolor(paper_f)
    hatch_dark = rng.random() < 0.4  # hatched vs flat-gray dark squares
    gray = rng.uniform(0.45, 0.72)
    occupied = rng.random((8, 8)) < rng.uniform(0.2, 0.55)
    for rank in range(8):
        for file in range(8):
            dark_sq = (rank + file) % 2 == 1
            kw: dict = {"edgecolor": "black", "linewidth": 0.4}
            if dark_sq and hatch_dark:
                kw |= {"facecolor": "white", "hatch": "////"}
            else:
                kw |= {"facecolor": (gray,) * 3 if dark_sq else "white"}
            ax.add_patch(plt.Rectangle((file, 7 - rank), 1, 1, **kw))
            if occupied[rank, file]:
                ax.text(
                    file + 0.5,
                    7 - rank + 0.47,
                    GLYPHS[PIECES[rng.integers(len(PIECES))]],
                    fontsize=px / 14,
                    ha="center",
                    va="center",
                    color="black",
                )
    ax.add_patch(
        plt.Rectangle((0, 0), 8, 8, facecolor="none", edgecolor="black", linewidth=1.2)
    )
    if coords:
        for i in range(8):
            ax.text(i + 0.5, -0.38, "abcdefgh"[i], fontsize=px / 22,
                    ha="center", va="center", color="black", family="serif")
            ax.text(-0.3, i + 0.45, str(i + 1), fontsize=px / 22,
                    ha="center", va="center", color="black", family="serif")
    ax.set_xlim(-mb, 8 + mb)
    ax.set_ylim(-mb, 8 + mb)
    ax.set_aspect("equal")
    ax.axis("off")
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return buf[..., ::-1].copy(), mb / (8 + 2 * mb)


def make_page_background(rng: np.random.Generator, size: int) -> np.ndarray:
    """Printed-page context: paper tone + dark serif text lines (chess-book
    body text and captions around a diagram)."""
    tone = rng.integers(215, 252)
    tint = rng.integers(-6, 4, 3)
    bg = np.clip(np.full((size, size, 3), tone, np.int16) + tint, 0, 255).astype(np.uint8)
    for _ in range(rng.integers(6, 22)):  # text lines: dark print on paper
        y = rng.integers(0, size - 4)
        h = rng.integers(2, 5)
        x = rng.integers(0, size // 3)
        w = rng.integers(size // 6, size - x)
        bg[y : y + h, x : x + w] = rng.integers(25, 90)
    if rng.random() < 0.3:  # page gutter / edge shadow
        side = rng.integers(8, 30)
        shade = np.linspace(0.55, 1.0, side)[None, :, None]
        if rng.random() < 0.5:
            bg[:, :side] = (bg[:, :side] * shade).astype(np.uint8)
        else:
            bg[:, -side:] = (bg[:, -side:] * shade[:, ::-1]).astype(np.uint8)
    return bg


def make_background(rng: np.random.Generator, size: int) -> np.ndarray:
    """Screen context: webpage with text clutter, flat desktop, or dark UI."""
    kind = rng.integers(3)
    if kind == 0:  # webpage: white-ish with gray text-line blocks
        bg = np.full((size, size, 3), rng.integers(235, 256), np.uint8)
        for _ in range(rng.integers(8, 26)):
            y = rng.integers(0, size - 4)
            h = rng.integers(2, 6)
            x = rng.integers(0, size // 2)
            w = rng.integers(size // 8, size - x)
            shade = rng.integers(90, 200)
            bg[y : y + h, x : x + w] = shade
        if rng.random() < 0.5:  # colored header / sidebar band
            c = rng.integers(60, 200, 3)
            if rng.random() < 0.5:
                bg[: rng.integers(10, 40)] = c
            else:
                bg[:, : rng.integers(10, 50)] = c
    elif kind == 1:  # flat / gradient desktop
        base = rng.integers(30, 220, 3).astype(np.float32)
        grad = np.linspace(0, rng.uniform(-40, 40), size, dtype=np.float32)
        bg = np.clip(base[None, None] + grad[:, None, None], 0, 255).astype(np.uint8)
    else:  # dark UI / monitor off-area
        bg = np.full((size, size, 3), rng.integers(10, 60), np.uint8)
        if rng.random() < 0.6:  # taskbar-like band
            bg[-rng.integers(8, 24) :] = rng.integers(0, 40)
    return bg


def screen_degrade(
    rng: np.random.Generator, img: np.ndarray, print_mode: bool = False
) -> np.ndarray:
    """Photo artifacts: moiré bands + washout (screens), underexposure +
    sensor noise (printed pages, e.g. the 006bab7f test photo), blur."""
    import cv2

    out = img.astype(np.float32)
    if print_mode:
        if rng.random() < 0.5:  # gutter shading ACROSS the scene, board
            # included — the 006bab7f failure mode is the page curling
            # into a dark gutter that dims the board's left files, which
            # background-only shading can never teach
            h, w = out.shape[:2]
            g0 = rng.uniform(0.35, 0.75)
            grad = np.linspace(g0, 1.0, w, dtype=np.float32)
            if rng.random() < 0.5:
                grad = grad[::-1]
            if rng.random() < 0.5:
                out *= grad[None, :, None]
            else:
                out *= grad[:, None, None]
        if rng.random() < 0.5:  # underexposed page photo
            out *= rng.uniform(0.3, 0.8)
        if rng.random() < 0.6:  # sensor noise in dim light
            out += rng.normal(0.0, rng.uniform(1.5, 6.0), out.shape)
        out = np.clip(out, 0, 255).astype(np.uint8)
        if rng.random() < 0.7:
            out = cv2.GaussianBlur(out, (5, 5), rng.uniform(0.4, 1.4))
        return out
    if rng.random() < 0.75:  # moiré: low-frequency interference bands
        h, w = out.shape[:2]
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        theta = rng.uniform(0, np.pi)
        freq = rng.uniform(0.08, 0.8)
        phase = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(4, 18)
        bands = np.sin((xx * np.cos(theta) + yy * np.sin(theta)) * freq + phase)
        if rng.random() < 0.5:  # beat pattern (two close frequencies)
            bands = bands * np.sin(
                (xx * np.cos(theta) + yy * np.sin(theta)) * freq * rng.uniform(0.85, 0.98)
            )
        out += amp * bands[..., None]
    if rng.random() < 0.4:  # washout: compress toward mid-gray (006bab7f)
        t = rng.uniform(0.25, 0.65)
        out = out * (1 - t) + 170 * t
    out = np.clip(out, 0, 255).astype(np.uint8)
    if rng.random() < 0.7:
        sigma = rng.uniform(0.4, 1.6)
        out = cv2.GaussianBlur(out, (5, 5), sigma)
    return out


def compose(
    rng: np.random.Generator, size: int = 256, mode: str = "screen"
) -> tuple[np.ndarray, np.ndarray]:
    """One (image, mask) pair: a digital (``screen``) or book-diagram
    (``print``) board warped into its scene.  The mask covers the BOARD
    quad only — for print tiles with coordinate-label margins the labels
    stay outside the mask, as a human annotator would draw it."""
    import cv2

    board_px = int(rng.integers(160, 321))
    if mode == "print":
        bg = make_page_background(rng, size)
        paper = tuple(int(c) for c in bg[bg.mean(axis=2) > 180].mean(axis=0)) if (
            bg.mean(axis=2) > 180
        ).any() else (235, 235, 235)
        board, margin_frac = render_print_board(rng, board_px, paper)
        max_ang, scale_lo, scale_hi = 0.07, 0.45, 0.9  # book photos near-axis
    else:
        board = render_digital_board(rng, board_px)
        bg = make_background(rng, size)
        margin_frac = 0.0
        max_ang, scale_lo, scale_hi = 0.14, 0.35, 0.95

    # tile quad in the frame: scale, offset, small rotation + perspective
    scale = rng.uniform(scale_lo, scale_hi)
    side = scale * size
    cx = rng.uniform(side / 2, size - side / 2)
    cy = rng.uniform(side / 2, size - side / 2)
    half = side / 2
    corners = np.array(
        [[-half, -half], [half, -half], [half, half], [-half, half]], np.float32
    )
    ang = rng.uniform(-max_ang, max_ang)
    rot = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]], np.float32)
    corners = corners @ rot.T
    corners += rng.uniform(-0.03 * side, 0.03 * side, (4, 2)).astype(np.float32)
    quad = (corners + np.array([cx, cy], np.float32)).astype(np.float32)
    quad = np.clip(quad, 0, size - 1)

    h, w = board.shape[:2]
    src = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], np.float32)
    m = cv2.getPerspectiveTransform(src, quad)
    warped = cv2.warpPerspective(board, m, (size, size))
    poly = quad.round().astype(np.int32)
    region = np.zeros((size, size), np.uint8)
    cv2.fillConvexPoly(region, poly, 1)
    img = np.where(region[..., None] > 0, warped, bg)
    img = screen_degrade(rng, img, print_mode=mode == "print")

    # mask: the inner board corners (tile minus coordinate margin) through
    # the same homography
    inner_src = np.array(
        [
            [margin_frac * w, margin_frac * h],
            [(1 - margin_frac) * w - 1, margin_frac * h],
            [(1 - margin_frac) * w - 1, (1 - margin_frac) * h - 1],
            [margin_frac * w, (1 - margin_frac) * h - 1],
        ],
        np.float32,
    )
    inner = cv2.perspectiveTransform(inner_src[None], m)[0]
    mask = np.zeros((size, size), np.uint8)
    cv2.fillConvexPoly(mask, inner.round().astype(np.int32), 255)
    return img, mask


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--mode", choices=["screen", "print", "mix"], default="screen",
                    help="mix alternates screen UI boards and printed book diagrams")
    ap.add_argument("--out", default=str(REPO / "store" / "datasets" / "screen_synth"))
    args = ap.parse_args()

    import cv2

    out = Path(args.out)
    (out / "images").mkdir(parents=True, exist_ok=True)
    (out / "masks").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.n):
        mode = args.mode if args.mode != "mix" else ("print" if i % 2 else "screen")
        img, mask = compose(rng, mode=mode)
        stem = f"{mode}_{args.seed:03d}_{i:05d}"
        quality = int(rng.integers(55, 96))
        cv2.imwrite(str(out / "images" / f"{stem}.jpg"), img, [cv2.IMWRITE_JPEG_QUALITY, quality])
        cv2.imwrite(str(out / "masks" / f"{stem}.png"), mask)
        if (i + 1) % 50 == 0:
            print(f"  {i + 1}/{args.n}", flush=True)
    print(f"wrote {args.n} image/mask pairs to {out}")


if __name__ == "__main__":
    main()
