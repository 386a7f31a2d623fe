"""Tracing / profiling utilities.

The reference only wall-clocks whole predictions (SURVEY.md §5.1); here
profiling is first-class: ``jax.profiler`` trace capture around any code
region (viewable in TensorBoard/Perfetto) and a per-stage device timing
harness that runs the engine's stages as separate jitted programs to
attribute time (the fused program itself intentionally has no stage
boundaries to measure).
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Any, Iterator

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/cvtpu_trace") -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Any, *args: Any, iters: int = 10, warmup: int = 2) -> dict[str, float]:
    """Median/best wall time of a device function with proper sync."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return {"p50_ms": float(np.median(times) * 1e3), "best_ms": float(np.min(times) * 1e3)}


def profile_engine_stages(cv_model: Any, batch_size: int = 32, iters: int = 5) -> dict[str, dict[str, float]]:
    """Per-stage device timings for the pipeline (stages dispatched
    separately; the production path stays fused)."""
    import jax
    import jax.numpy as jnp

    from chessvision_tpu import constants, ops
    from chessvision_tpu.ops.quad import find_quadrangle_batch

    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (batch_size, 512, 512, 3), np.uint8)
    )
    ex_mod, _, ex_vars = cv_model.board_extractor
    cl_mod, cl_spec, cl_vars = cv_model.classifier

    resize_fn = jax.jit(lambda im: ops.resize(im, constants.INPUT_SIZE[::-1], round_uint8=True))  # (W,H) -> (H,W)
    small = resize_fn(images)
    x = small.astype(jnp.float32) / 255.0

    unet_fn = jax.jit(lambda t: ex_mod.apply(ex_vars, t))
    logits = unet_fn(x)
    probs = jax.nn.sigmoid(logits[..., 0])

    quad_fn = jax.jit(lambda p: find_quadrangle_batch(p, 0.5))
    quads, _ = quad_fn(probs)

    dest = jnp.asarray([[0.0, 0.0], [512.0, 0.0], [512.0, 512.0], [0.0, 512.0]])

    def warp_stage(im, q):
        ms = jax.vmap(lambda qq: ops.get_perspective_transform(qq * 2.0, dest))(q)
        gray = ops.bgr_to_gray(im.astype(jnp.float32))
        return ops.hflip(ops.warp_perspective(gray, ms, constants.BOARD_SIZE))

    warp_fn = jax.jit(warp_stage)
    boards = warp_fn(images, quads)

    def cls_stage(b):
        sq = ops.extract_squares_batch(b).reshape(batch_size * 64, 64, 64, 1) / 255.0
        return cl_mod.apply(cl_vars, sq)

    cls_fn = jax.jit(cls_stage)

    return {
        "resize": time_fn(resize_fn, images, iters=iters),
        "unet": time_fn(unet_fn, x, iters=iters),
        "quadrangle": time_fn(quad_fn, probs, iters=iters),
        "warp": time_fn(warp_fn, images, quads, iters=iters),
        "classify": time_fn(cls_fn, boards, iters=iters),
    }
