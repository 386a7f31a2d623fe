"""Per-stage timing of the fused inference pipeline on the current backend.

Times each pipeline stage as its own jitted program with device-resident
inputs and a forced scalar host transfer as the sync (CLAUDE.md: the axon
backend's block_until_ready returns early; only host transfers sync).

Usage: python scripts/profile_stages.py [--batch-size 128] [--iters 5]
Prints one JSON line with per-stage median milliseconds.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--iters", type=int, default=5)
    args = parser.parse_args()
    bsz = args.batch_size

    import jax
    import jax.numpy as jnp

    from chessvision_tpu import ChessVision, constants
    from chessvision_tpu.ops import bgr_to_gray, extract_squares_batch, get_perspective_transform, hflip, resize, warp_perspective
    from chessvision_tpu.ops.quad import find_quadrangle_batch

    cv = ChessVision(lazy_load=False)
    eng = cv.engine
    ex, exv = eng._extractor, eng._ex_vars
    cl, clv = eng._classifier, eng._cl_vars

    # device-resident inputs (no link traffic in the timed region)
    key = jax.random.PRNGKey(0)
    images = jax.random.randint(key, (bsz, 512, 512, 3), 0, 256, jnp.uint8)
    comp = jax.random.randint(key, (bsz, 256, 256, 3), 0, 256, jnp.uint8)
    gray_in = jax.random.randint(key, (bsz, 512, 512), 0, 256, jnp.uint8)
    # synthetic soft board mask: probability blob covering a quad
    yy = jnp.linspace(-1, 1, 256)[None, :, None]
    xx = jnp.linspace(-1, 1, 256)[None, None, :]
    probs_in = jnp.broadcast_to(jax.nn.sigmoid(8.0 * (0.6 - jnp.maximum(jnp.abs(yy), jnp.abs(xx)))), (bsz, 256, 256))
    quads_in = jnp.broadcast_to(
        jnp.asarray([[60.0, 60.0], [450.0, 70.0], [460.0, 440.0], [50.0, 450.0]], jnp.float32)[None],
        (bsz, 4, 2),
    )
    boards_in = jax.random.uniform(key, (bsz, 512, 512), jnp.float32, 0, 255)

    dest = jnp.asarray(
        [[0.0, 0.0], [512.0, 0.0], [512.0, 512.0], [0.0, 512.0]], jnp.float32
    )

    def stage_resize(x):
        return resize(x, constants.INPUT_SIZE, round_uint8=True)

    def stage_gray(x):
        return bgr_to_gray(x, exact_u8=True)

    def stage_unet(c):
        return ex.apply(exv, c.astype(jnp.float32) / 255.0)[..., 0].astype(jnp.float32)

    def stage_quad(p):
        q, f = find_quadrangle_batch(p, jnp.float32(0.5))
        return q.sum() + f.sum()

    def stage_warp(g, q):
        ms = jax.vmap(lambda qq: get_perspective_transform(qq, dest))(q)
        boards = warp_perspective(g.astype(jnp.float32), ms, constants.BOARD_SIZE)
        return hflip(boards)

    def stage_classify(b):
        squares = extract_squares_batch(b)
        cls_in = squares.reshape(bsz * 64, *constants.PIECE_SIZE, 1) / 255.0
        return cl.apply(clv, cls_in)

    stages = {
        "resize_512_256": (stage_resize, (images,)),
        "grayscale": (stage_gray, (images,)),
        "unet_fwd": (stage_unet, (comp,)),
        "quadrangle": (stage_quad, (probs_in,)),
        "homography_warp": (stage_warp, (gray_in, quads_in)),
        "squares_classifier": (stage_classify, (boards_in,)),
    }

    def sync(out):
        x = out
        while isinstance(x, (tuple, list, dict)):
            x = list(x.values())[0] if isinstance(x, dict) else x[0]
        float(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32 else x))

    results = {}
    for name, (fn, inputs) in stages.items():
        jf = jax.jit(fn)
        sync(jf(*inputs))  # compile
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            sync(jf(*inputs))
            times.append(time.perf_counter() - t0)
        results[name] = round(float(np.median(times)) * 1000, 2)
        print(f"{name}: {results[name]} ms", file=sys.stderr)

    # fused end-to-end for reference
    out = eng._jitted_closed(images, jnp.float32(0.5))
    np.asarray(out["found"])
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = eng._jitted_closed(images, jnp.float32(0.5))
        np.asarray(out["found"])
        times.append(time.perf_counter() - t0)
    results["fused_total"] = round(float(np.median(times)) * 1000, 2)
    results["batch_size"] = bsz
    results["backend"] = jax.default_backend()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
