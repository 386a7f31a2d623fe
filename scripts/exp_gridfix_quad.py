"""Offline experiment: richer grid-detection families on the residual boards.

Round-4 closing state: 24 wrong squares, 14 of them on one board
(006bab7f) whose UNet mask bleeds past the physical board.  The shipped
detector (ops/gridfix.py) proposes a per-axis AFFINE correction (offset
o, spacing s, lines at o + k*s).  Two hypotheses for why it leaves 14
squares on that board:

  wide  — the needed offset exceeds the +-32 px search range (the mask
          bled by ~a full square on one side); try +-56 px.
  quad  — the residual is keystone (projective): spacing varies across
          the board, lines at o + k*s + k^2*q; try |q| <= 2 px.

For every test board this script classifies the original warp, the
shipped affine correction, and each candidate family, and prints
per-board wrong-square counts plus set-level totals (each family alone
and soft-blend-arbitrated against the original, tau=0.01) so a win or a
wash is measurable before anything touches the engine.  CPU by default
(bit-stable vs the committed goldens).

Usage: python scripts/exp_gridfix_quad.py [--tpu]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    import jax

    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from chessvision_tpu import ChessVision, constants
    from chessvision_tpu.chessboard import fen_to_labels, labels_to_fen
    from chessvision_tpu.engine import (
        _DEST,
        _classify_squares,
        find_quadrangle_batch,
        hflip,
        preprocess_images,
        scale_quadrangle,
        validate_labels_batch,
        warp_perspective,
    )
    from chessvision_tpu.eval.evaluate import get_test_generator
    from chessvision_tpu.ops import gridfix
    from chessvision_tpu.ops.warp import get_perspective_transform

    B = gridfix.BOARD_SIZE
    CELL = gridfix.CELL

    # ---- candidate families -------------------------------------------
    def build_cand(off_max: float, q_vals: np.ndarray) -> np.ndarray:
        offs = np.arange(-off_max, off_max + 0.5, 0.5, dtype=np.float32)
        sps = np.arange(58.0, 70.25, 0.25, dtype=np.float32)
        cand = np.array(
            [(o, s, q) for o in offs for s in sps for q in q_vals], dtype=np.float32
        )
        return cand  # (C, 3)

    def build_comb(cand: np.ndarray) -> np.ndarray:
        xs = np.arange(B, dtype=np.float32)
        k = np.arange(1, 8, dtype=np.float32)
        lines = cand[:, 0:1] + cand[:, 1:2] * k + cand[:, 2:3] * k * k  # (C, 7)
        w = np.zeros((len(cand), B), np.float32)
        for c0 in range(0, len(cand), 1024):
            sl = slice(c0, c0 + 1024)
            d = np.maximum(0.0, 1.0 - np.abs(xs[None, None, :] - lines[sl, :, None]))
            w[sl] = d.sum(axis=1)
        return w

    FAMILIES = {
        "wide": build_cand(56.0, np.array([0.0], np.float32)),
        "quad": build_cand(32.0, np.arange(-2.0, 2.25, 0.25, dtype=np.float32)),
    }
    COMBS = {name: build_comb(c) for name, c in FAMILIES.items()}

    def detect(boards_np: np.ndarray, name: str) -> np.ndarray:
        """numpy comb search -> (Bn, 6) rows (ox, sx, qx, oy, sy, qy)."""
        p = np.asarray(
            gridfix._condition(gridfix._profiles(jnp.asarray(boards_np)))
        )  # (2B, 512)
        scores = p @ COMBS[name].T
        best = scores.argmax(axis=-1)
        sel = FAMILIES[name][best]  # (2B, 3)
        bn = boards_np.shape[0]
        return np.concatenate([sel[:bn], sel[bn:]], axis=1)

    def resample_matrix(o: float, s: float, q: float) -> np.ndarray:
        u = np.arange(B, dtype=np.float32)
        t = u / CELL
        pos = o + t * s + t * t * q
        j = np.arange(B, dtype=np.float32)
        return np.maximum(0.0, 1.0 - np.abs(pos[:, None] - j[None, :]))

    def apply_corr(boards_np: np.ndarray, corr: np.ndarray) -> np.ndarray:
        out = np.empty_like(boards_np)
        for i in range(boards_np.shape[0]):
            rx = resample_matrix(corr[i, 0], corr[i, 1], corr[i, 2])
            ry = resample_matrix(corr[i, 3], corr[i, 4], corr[i, 5])
            out[i] = ry @ boards_np[i] @ rx.T
        return out

    # ---- pipeline up to the warped board ------------------------------
    cv = ChessVision(lazy_load=False)
    eng = cv.engine
    cl, cl_vars, probs_flag = eng._classifier, eng._cl_vars, eng._cls_probs_flag
    square_names = constants.SQUARE_NAMES_NORMAL

    @jax.jit
    def to_boards(images: jnp.ndarray, thr: jnp.ndarray) -> dict:
        comp, gray = preprocess_images(images)
        b, h, w = gray.shape
        x = comp.astype(jnp.float32) / 255.0
        seg_logits = eng._extractor.apply(eng._ex_vars, x)[..., 0].astype(jnp.float32)
        probs = jax.nn.sigmoid(seg_logits)
        quad, found = find_quadrangle_batch(probs, thr)
        quad_scaled = scale_quadrangle(quad, float(h), constants.INPUT_SIZE[1])
        safe_quad = jnp.where(found[:, None, None], quad_scaled, jnp.asarray(_DEST))
        ms = jax.vmap(
            lambda q: get_perspective_transform(q, jnp.asarray(_DEST))
        )(safe_quad)
        boards0 = warp_perspective(gray.astype(jnp.float32), ms, constants.BOARD_SIZE)
        return {"boards0": boards0, "found": found}

    @jax.jit
    def classify(boards: jnp.ndarray) -> jnp.ndarray:
        return _classify_squares(cl, cl_vars, probs_flag, hflip(boards))

    items = list(get_test_generator())
    shape_groups: dict[tuple, list] = {}
    for idx, it in enumerate(items):
        shape_groups.setdefault(it[0].shape, []).append(idx)

    def fen_of(p: np.ndarray) -> str:
        validated, _ = validate_labels_batch(p[None], square_names)
        return labels_to_fen(validated[0], square_names)

    def errs(p: np.ndarray, true_fen: str) -> int:
        return sum(
            a != b for a, b in zip(fen_to_labels(fen_of(p)), fen_to_labels(true_fen))
        )

    variants = ["orig", "affine", "wide", "quad"]
    per_board: list[dict] = []
    for idxs in shape_groups.values():
        batch = np.stack([items[i][0] for i in idxs])
        out = to_boards(jnp.asarray(batch), jnp.float32(0.5))
        boards0 = np.asarray(out["boards0"])
        rounded = np.clip(np.floor(boards0 + 0.5), 0, 255)

        cand_boards = {"orig": boards0}
        corr_aff = np.asarray(gridfix.detect_grid(jnp.asarray(rounded)))
        cand_boards["affine"] = np.asarray(
            gridfix.apply_correction(jnp.asarray(boards0), jnp.asarray(corr_aff))
        )
        det = {}
        for fam in ("wide", "quad"):
            c = detect(rounded, fam)
            det[fam] = c
            cand_boards[fam] = apply_corr(boards0, c)

        probs = {v: np.asarray(classify(jnp.asarray(cand_boards[v]))) for v in variants}
        for j, i in enumerate(idxs):
            _, name, true_fen = items[i]
            rec = {"image": name[:8], "true": true_fen}
            for v in variants:
                rec[f"e_{v}"] = errs(probs[v][j], true_fen)
                rec[f"c_{v}"] = float(probs[v][j].max(axis=-1).mean())
            for fam in ("wide", "quad"):
                rec[f"corr_{fam}"] = [round(float(x), 2) for x in det[fam][j]]
            rec["p"] = {v: probs[v][j] for v in variants}
            per_board.append(rec)

    # ---- set-level totals: each family alone + blend-vs-orig ----------
    tau = 0.01
    totals = {f"sum_{v}": 0 for v in variants}
    totals.update({f"blend_{v}": 0 for v in variants[1:]})
    totals["oracle_all"] = 0
    for rec in per_board:
        for v in variants:
            totals[f"sum_{v}"] += rec[f"e_{v}"]
        totals["oracle_all"] += min(rec[f"e_{v}"] for v in variants)
        p0 = rec["p"]["orig"]
        c0 = rec["c_orig"]
        for v in variants[1:]:
            gap = rec[f"c_{v}"] - c0
            w = 1.0 / (1.0 + np.exp(-gap / tau))
            pb = w * rec["p"][v] + (1.0 - w) * p0
            totals[f"blend_{v}"] += errs(pb, rec["true"])
        del rec["p"]

    for rec in sorted(per_board, key=lambda r: -r["e_affine"]):
        if max(rec[f"e_{v}"] for v in variants) > 0:
            print(json.dumps(rec))
    print(json.dumps({"backend": jax.default_backend(), **totals}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
