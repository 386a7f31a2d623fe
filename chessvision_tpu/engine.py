"""The fused image→FEN inference engine.

This is the TPU-native re-centering of the reference's per-image,
host-hopping pipeline (reference core.py:152-249 — 2 uploads + 2 downloads
per image, with contours and warping on host CPU, SURVEY.md §3.1): one
jitted, batched function takes uint8 images and produces segmentation
logits, binary masks, quadrangles, rectified boards and per-square class
probabilities **entirely on device** — resize (matmul), UNet forward,
sigmoid+threshold, flood-fill quadrangle extraction, homography solve,
bilinear warp, grayscale/flip, 8×8 slicing and the 64-way classifier
forward are a single XLA program, optionally sharded over a device mesh
on the batch axis.

Only FEN string assembly and the rule-based validation happen on host
(string work, microseconds per board).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from chessvision_tpu import constants
from chessvision_tpu.chessboard import labels_to_fen
from chessvision_tpu.cv_types import BatchResult, ValidationFix
from chessvision_tpu.ops import (
    bgr_to_gray,
    extract_squares_batch,
    get_perspective_transform,
    hflip,
    resize,
    warp_perspective,
)
from chessvision_tpu.ops import gridfix
from chessvision_tpu.ops.quad import find_quadrangle_batch, scale_quadrangle
from chessvision_tpu.parallel import mesh as mesh_lib

# Destination corners for the rectified board — note (w, h), not (w-1, h-1),
# matching the reference exactly (utils.py:127-128).
_BOARD_W, _BOARD_H = constants.BOARD_SIZE
# constants sizes are cv2-style (width, height); ops.resize takes (height,
# width).  Square today, but keep the conversion explicit so a non-square
# INPUT_SIZE cannot silently transpose the segmentation input.
_INPUT_HW = (constants.INPUT_SIZE[1], constants.INPUT_SIZE[0])
_DEST = np.array(
    [[0.0, 0.0], [_BOARD_W, 0.0], [_BOARD_W, _BOARD_H], [0.0, _BOARD_H]], np.float32
)

# Grid-refinement arbitration temperature: the sigmoid width (in mean-top-1
# confidence units) of the original↔refined probability blend.  Swept over
# {1e-3..2e-2} on both backends (scripts/debug_gridfix.py --summary): 0.01
# minimizes test wrong squares on CPU (24) and TPU (23) and keeps
# cross-platform FEN agreement at 36/38 with a worst diff of 2 squares.
_ARBITRATE_TAU = 0.01

# PER-DEVICE batches above this size run the arbitrate tail (resample + two
# classifier passes + blend) as a lax.scan over fixed-size chunks, bounding
# live stem activations per device to ~2.2 GB regardless of batch size
# (8.4 MB/board/pass × chunk × 2 passes).  128 boards = 8192 square crops
# per classifier matmul — enough to keep the MXU busy, though the scan's
# serialization costs measurable throughput vs the unchunked program
# (sweep via CVTPU_ARBITRATE_CHUNK; measured numbers in RESULTS.md).
# The Engine scales the threshold by mesh size (per-device residency is
# b/n_devices, and a scan's leading axis cannot stay batch-sharded — see
# Engine.__init__), so eval/golden paths (B ≤ 38), the e2e bench batch
# (128) and moderate mesh batches stay unchunked; committed FEN goldens
# are unaffected by the chunk boundary.
_ARBITRATE_CHUNK = 128

# Grid-refinement warp margin (px).  In refine != "off" modes the board
# warps into a (512 + 2m)² canvas with the mask quad mapped to the interior
# [m, m+512)² — the interior is the nominal board (measured: ≤ 0.036 gray
# levels from the direct 512² warp on all 38 test boards, 0 pixels moved
# after uint8 rounding), and the margin ring holds real image context the
# reference pipeline throws away.  When grid detection finds the true board
# extending past the nominal edge (offset < 0 or offset + 8·spacing > 512 —
# a mask quad that undershot the board), the refinement resample reads real
# pixels from the ring instead of the zero border: test board 16c72614's
# detected grid spans rows −17..543 and its rank-1 pieces live in the 31 px
# the 512² canvas amputated (RESULTS.md round 5).  0 disables (round-4
# geometry).
_REFINE_MARGIN = int(os.getenv("CVTPU_REFINE_MARGIN", "32"))

# Missing-king promotion floor (validate_labels_batch rule 3): a color with
# zero kings promotes its best king candidate only if that candidate's king
# probability clears this — a cleared/empty board (king probs ~1e-3
# everywhere) must not grow hallucinated kings, while genuinely misread
# kings measure well above it (test board 76be4f7f: 0.142 / 0.064).
_MISSING_KING_FLOOR = 0.05


def process_images_fn(
    extractor: Any,
    classifier: Any,
    classifier_outputs_probabilities: bool,
    refine: str = "arbitrate",
    arbitrate_chunk: int | None = None,
) -> Any:
    """Build the pure batched pipeline function for a (extractor,
    classifier) module pair.  The returned function is jit-compatible and
    fully shardable on the batch axis."""

    def fn(
        extractor_vars: Any,
        classifier_vars: Any,
        images: jnp.ndarray,  # (B, H, W, 3) uint8, BGR
        threshold: jnp.ndarray,  # scalar f32
    ) -> dict[str, jnp.ndarray]:
        comp, gray = preprocess_images(images)
        return _pipeline_core(
            extractor,
            classifier,
            classifier_outputs_probabilities,
            extractor_vars,
            classifier_vars,
            comp.astype(jnp.float32),
            gray.astype(jnp.float32),
            threshold,
            refine,
            arbitrate_chunk,
        )

    return fn


def preprocess_images(images: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side front half: uint8 frames → (comp, gray), both uint8.

    - comp: exact INTER_AREA resize to the segmentation input size (two
      HIGHEST-precision matmuls; bit-equal to cv2, reference core.py:212).
    - gray: exact fixed-point BGR→grayscale (bit-equal to cv2.cvtColor,
      reference core.py:299).  Grayscale commutes with the (linear)
      bilinear warp, so converting first and warping one channel is 3×
      fewer samples than the reference's warp-then-convert order.

    The outputs feed the same compiled back half the host-packed paths use
    (``process_packed_fn``), so raw-frame and packed inference produce
    bit-identical results."""
    comp = resize(images, _INPUT_HW, round_uint8=True)
    gray = bgr_to_gray(images, exact_u8=True)
    return comp, gray


def _classify_squares(
    classifier: Any,
    classifier_vars: Any,
    classifier_outputs_probabilities: bool,
    boards: jnp.ndarray,  # (N, 512, 512) f32, post-flip
) -> jnp.ndarray:
    """Slice boards into squares and classify: (N, 64, 13) f32 probs."""
    n = boards.shape[0]
    squares = extract_squares_batch(boards)
    cls_in = squares.reshape(n * 64, *constants.PIECE_SIZE, 1) / 255.0
    cls_out = classifier.apply(classifier_vars, cls_in)
    # softmax in f32 even when the model runs bf16: bf16 exp/normalise
    # flattens confident predictions to ~0.95-0.97 (measured on a v5e),
    # which corrupts the served confidence_scores; the cast costs 64x13xN
    # elements, nothing
    cls_probs = (
        cls_out
        if classifier_outputs_probabilities
        else jax.nn.softmax(cls_out.astype(jnp.float32), axis=-1)
    )
    return cls_probs.reshape(n, 64, constants.NUM_CLASSES).astype(jnp.float32)


def _pipeline_core(
    extractor: Any,
    classifier: Any,
    classifier_outputs_probabilities: bool,
    extractor_vars: Any,
    classifier_vars: Any,
    comp_f32: jnp.ndarray,  # (B, 256, 256, 3) f32 in [0, 255], BGR
    gray: jnp.ndarray,  # (B, H, W) f32 grayscale full-res
    threshold: jnp.ndarray,
    refine: str = "arbitrate",
    arbitrate_chunk: int | None = None,
) -> dict[str, jnp.ndarray]:
    """Shared back half of every packed pipeline variant: segmentation →
    quadrangle → warp → grid refinement → slice → classify, from a
    prepared seg input and a full-res grayscale.

    ``refine`` (static): "arbitrate" (default — detect the 8×8 grid in the
    warped board, apply the affine correction, classify BOTH versions and
    softly blend their probabilities by confidence; the measured round-4
    config, see ops/gridfix.py), "detect" (apply the detected correction
    unconditionally — one classifier pass, no safety net) or "off" (the
    reference's geometry: the mask quad is final).

    ``arbitrate_chunk`` (static): batch sizes above it run the arbitrate
    tail as a lax.scan over chunks of this size (HBM bound); None reads
    the module default.  The Engine scales it by mesh size."""
    chunk = _ARBITRATE_CHUNK if arbitrate_chunk is None else arbitrate_chunk
    b, h, w = gray.shape
    x = comp_f32 / 255.0
    seg_logits = extractor.apply(extractor_vars, x)[..., 0].astype(jnp.float32)
    probs = jax.nn.sigmoid(seg_logits)
    quad, found = find_quadrangle_batch(probs, threshold)
    quad_scaled = scale_quadrangle(quad, float(h), constants.INPUT_SIZE[1])
    safe_quad = jnp.where(found[:, None, None], quad_scaled, jnp.asarray(_DEST))
    ms = jax.vmap(lambda q: get_perspective_transform(q, jnp.asarray(_DEST)))(safe_quad)

    if refine == "off":
        boards_sel = warp_perspective(gray, ms, constants.BOARD_SIZE)  # pre-flip
        quad_out = quad_scaled
        cls_probs = _classify_squares(
            classifier, classifier_vars, classifier_outputs_probabilities, hflip(boards_sel)
        )
    else:
        # One margin-expanded warp replaces the nominal 512² warp: the
        # interior slice IS the nominal board (≤ 0.036 gray levels from
        # the direct warp, identical after uint8 rounding — see
        # _REFINE_MARGIN), and the ring gives the refinement resample real
        # pixels when the detected grid extends past the nominal edge.
        margin = _REFINE_MARGIN
        if margin:
            dest_wide = jnp.asarray(_DEST, jnp.float32) + jnp.float32(margin)
            ms_wide = jax.vmap(lambda q: get_perspective_transform(q, dest_wide))(
                safe_quad
            )
            wide_px = (_BOARD_W + 2 * margin, _BOARD_H + 2 * margin)
            wide = warp_perspective(gray, ms_wide, wide_px)
            boards0 = wide[:, margin : margin + _BOARD_H, margin : margin + _BOARD_W]
        else:
            wide = boards0 = warp_perspective(gray, ms, constants.BOARD_SIZE)
        # detection runs on the uint8-rounded board: sub-quantum platform
        # numerics (bf16 UNet → marginal mask pixels) can shift the f32
        # board by fractions of a gray level, and rounding first keeps the
        # detected comb identical across CPU/TPU
        rounded = jnp.clip(jnp.floor(boards0 + 0.5), 0, 255)
        corr = gridfix.detect_grid(rounded)  # (B, 4)
        if refine == "detect":
            boards_sel = gridfix.apply_correction(wide, corr, margin=margin)
            quad_out = gridfix.refined_quadrangle(ms, corr)
            cls_probs = _classify_squares(
                classifier, classifier_vars, classifier_outputs_probabilities, hflip(boards_sel)
            )
        else:  # arbitrate
            # Memory shape of this branch: the classifier's stem
            # activations are the pipeline's largest buffers (~8.4
            # MB/board/pass bf16 — 8.6 GB at B=1024), and arbitration
            # needs TWO passes.  Unchunked that OOMs a 16 GB v5e at
            # B=1024 (25.3 GB requested), and on the relay backend a
            # failed execution poisons HBM for the rest of the process
            # (measured: after 1024→512→256 OOMs even a 100 MB
            # device_put fails) — so the big-batch path must fit BY
            # CONSTRUCTION, not by fallback.  A lax.scan over fixed-size
            # chunks runs the whole arbitrate tail (resample + both
            # classifier passes + blend) sequentially over the batch:
            # live stems are bounded by the chunk, at a measured
            # serialization cost (RESULTS.md round 5).
            # Inside a chunk an optimization_barrier orders pass 1
            # after pass 0 so their stems share the same HBM (the
            # previous zero-valued-add data dependency was algebraically
            # simplified away by XLA, which is how the OOM shipped).
            def _arb_chunk(
                xs: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
            ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
                wide_c, corr_c, ms_c = xs
                b0 = wide_c[
                    :, margin : margin + _BOARD_H, margin : margin + _BOARD_W
                ]
                b1 = gridfix.apply_correction(wide_c, corr_c, margin=margin)
                q1 = gridfix.refined_quadrangle(ms_c, corr_c)
                p0 = _classify_squares(
                    classifier, classifier_vars, classifier_outputs_probabilities, hflip(b0)
                )  # (c, 64, 13)
                p0, b1 = jax.lax.optimization_barrier((p0, b1))
                p1 = _classify_squares(
                    classifier, classifier_vars, classifier_outputs_probabilities, hflip(b1)
                )
                # mean top-1 probability over the 64 squares: the measured
                # arbitration metric (beats mean-log; RESULTS.md round 4)
                # — crops centered on their squares classify more
                # confidently
                conf0 = p0.max(axis=-1).mean(axis=-1)  # (c,)
                conf1 = p1.max(axis=-1).mean(axis=-1)
                # Soft blend rather than hard argmax: the confidence gap
                # is a near-tie (|gap| < 0.01) on most boards, and
                # bf16/XLA wobble of ~±3e-3 across platforms AND batch
                # shapes flips a hard argmax unpredictably (measured: one
                # board drifted 5 squares CPU→TPU).  A sigmoid blend of
                # the two probability fields is continuous in the gap —
                # platform wobble moves FENs by at most the genuinely
                # ambiguous squares — and measured MORE accurate than the
                # argmax (CPU 25→24, TPU 24→23 wrong squares; τ swept in
                # scripts/debug_gridfix.py --summary).
                gap = conf1 - conf0
                wgt = jax.nn.sigmoid(gap / jnp.float32(_ARBITRATE_TAU))[:, None, None]
                probs_c = wgt * p1 + (1.0 - wgt) * p0
                # board_image/quadrangle metadata stay discrete (better side)
                use = gap > 0
                bsel = jnp.where(use[:, None, None], b1, b0)
                return probs_c, bsel, q1, use

            if b > chunk:
                # lax.scan over (n_chunks, chunk, ...) with the batched
                # body; the tail chunk is padded by repeating row 0 (the
                # pad rows' outputs are sliced away, and padding keeps
                # ONE compiled body instead of a separate remainder
                # program).
                n_chunks = -(-b // chunk)
                padded = n_chunks * chunk

                def _chunked(a: jnp.ndarray) -> jnp.ndarray:
                    if padded != b:
                        fill = jnp.broadcast_to(a[:1], (padded - b, *a.shape[1:]))
                        a = jnp.concatenate([a, fill], axis=0)
                    return a.reshape(n_chunks, chunk, *a.shape[1:])

                xs_r = tuple(_chunked(a) for a in (wide, corr, ms))
                _, ys = jax.lax.scan(
                    lambda carry, x: (carry, _arb_chunk(x)), None, xs_r
                )
                cls_probs, boards_sel, quad1, use = (
                    y.reshape(padded, *y.shape[2:])[:b] for y in ys
                )
            else:
                cls_probs, boards_sel, quad1, use = _arb_chunk((wide, corr, ms))
            quad_out = jnp.where(use[:, None, None], quad1, quad_scaled)

    boards_flipped = hflip(boards_sel)
    boards_u8 = jnp.clip(jnp.floor(boards_flipped + 0.5), 0, 255).astype(jnp.uint8)
    return {
        "logits": seg_logits,
        "quadrangle": quad_out,
        "found": found,
        "board_image": boards_u8,
        "probabilities": cls_probs,
    }


def process_packed_fn(
    extractor: Any,
    classifier: Any,
    classifier_outputs_probabilities: bool,
    refine: str = "arbitrate",
    arbitrate_chunk: int | None = None,
) -> Any:
    """IO-optimized variant: takes host-prepared inputs — the 256×256×3
    resized image (for segmentation) and the 512×512 grayscale (for
    warping/classification) — 1.7× fewer host→device bytes than raw
    512×512×3 frames.  Host prep (exact INTER_AREA + fixed-point
    grayscale) comes from the native cvloader / ops parity
    implementations, so results match the all-device path to ±1 gray
    level.  Useful when host→device bandwidth, not compute, bounds
    throughput (e.g. 100 MB/s tunneled links)."""

    def fn(
        extractor_vars: Any,
        classifier_vars: Any,
        comp: jnp.ndarray,  # (B, 256, 256, 3) uint8 BGR, already resized
        gray: jnp.ndarray,  # (B, H, W) uint8 grayscale full-res
        threshold: jnp.ndarray,
    ) -> dict[str, jnp.ndarray]:
        return _pipeline_core(
            extractor,
            classifier,
            classifier_outputs_probabilities,
            extractor_vars,
            classifier_vars,
            comp.astype(jnp.float32),
            gray.astype(jnp.float32),
            threshold,
            refine,
            arbitrate_chunk,
        )

    return fn


# BT.601 luma weights in the pipeline's fixed-point convention
# (reference cvtColor BGR→GRAY; ops/color.py uses (9798, 19235, 3735)/2^15).
_LUMA_R = 9798.0 / 32768.0
_LUMA_G = 19235.0 / 32768.0
_LUMA_B = 3735.0 / 32768.0


def process_yuv_fn(
    extractor: Any,
    classifier: Any,
    classifier_outputs_probabilities: bool,
    refine: str = "arbitrate",
    arbitrate_chunk: int | None = None,
) -> Any:
    """Minimum-bytes variant: full-res luma + 2×-subsampled blue/red chroma
    of the segmentation input.  295 KB/board at 512×512 vs 459 KB for
    ``process_packed_fn`` and 786 KB for raw frames — 2.7× less than raw.
    The segmentation input is reconstructed ON DEVICE: luma is area-resized
    512→256 (matmul), chroma planes are bilinearly upsampled 128→256, and
    green is solved from the BT.601 luma equation.  The warp/classify half
    uses the exact full-res luma, so board extraction geometry and square
    classification see bit-identical grayscale; only the UNet's color input
    carries mild chroma blur (FEN agreement vs the exact packed path on data/test is
    enforced by tests/test_engine_packed.py)."""

    def fn(
        extractor_vars: Any,
        classifier_vars: Any,
        y: jnp.ndarray,  # (B, H, W) uint8 full-res luma (fixed-point gray)
        cb: jnp.ndarray,  # (B, 128, 128) uint8: clip(B256 − Y256, ±128) + 128
        cr: jnp.ndarray,  # (B, 128, 128) uint8: clip(R256 − Y256, ±128) + 128
        threshold: jnp.ndarray,
    ) -> dict[str, jnp.ndarray]:
        y_f = y.astype(jnp.float32)
        y256 = resize(y_f, _INPUT_HW)  # (B, 256, 256) f32, area
        cb256 = resize(cb, _INPUT_HW) - 128.0  # bilinear upscale
        cr256 = resize(cr, _INPUT_HW) - 128.0
        b256 = y256 + cb256
        r256 = y256 + cr256
        g256 = (y256 - _LUMA_R * r256 - _LUMA_B * b256) / _LUMA_G
        comp = jnp.stack([b256, g256, r256], axis=-1)
        comp = jnp.clip(jnp.floor(comp + 0.5), 0.0, 255.0)  # uint8 round-trip
        return _pipeline_core(
            extractor,
            classifier,
            classifier_outputs_probabilities,
            extractor_vars,
            classifier_vars,
            comp,
            y_f,
            threshold,
            refine,
            arbitrate_chunk,
        )

    return fn


# fixed-point BT.601 luma weights (ops/color.py): gray = (LR·R + LG·G +
# LB·B + 2^14) >> 15, with LR + LG + LB = 2^15 exactly — the identity the
# yuv444 reconstruction inverts in pure int32.
_LUMA_R_I = 9798
_LUMA_G_I = 19235
_LUMA_B_I = 3735


def process_yuv444_fn(
    extractor: Any,
    classifier: Any,
    classifier_outputs_probabilities: bool,
    refine: str = "arbitrate",
    arbitrate_chunk: int | None = None,
) -> Any:
    """BIT-EXACT minimum-bytes variant: full-res luma + full-resolution
    (256²) blue/red chroma differences + a 4-bit/pixel green residual
    plane.  416 KB/board at 512×512 — 7% under ``process_packed_fn``'s
    448 KB, 1.85× under raw frames — while reconstructing the
    segmentation input EXACTLY (the earlier residual-free form left G
    within ±2 of exact, which flipped 6/38 FENs):

    - B and R: stored as diffs against the rounded luma downsample, which
      host and device compute identically in int32, so ``y256r + diff``
      reproduces the exact INTER_AREA comp wherever the diff fit int8
      (chroma diffs beyond ±127 clip; essentially absent in board photos).
    - G: predicted by inverting the BT.601 luma identity — in PURE INT32
      (scaled sums and round-half-up integer division), so the prediction
      is bit-identical on host and device with no FMA/rounding hazard —
      then corrected by the stored 4-bit residual (prediction error is
      ≤ ~±3 wherever chroma didn't clip; the int4 range ±8 has slack).
      The host computes the residual against the same clipped
      reconstruction the device sees, so G stays exact even where B/R
      clip — except the rare heavily-clipped pixel whose residual
      overflows int4 (measured 1/131072 on a worst-case random-chroma
      frame; zero on the real test set).

    The warp/classify half uses the exact full-res luma as always, so the
    ENTIRE pipeline output is bit-identical to the exact packed path (FEN
    agreement gated 38/38 by tests/test_engine_packed.py).  (Reference
    input semantics: core.py:212, 299-300.)"""

    def fn(
        extractor_vars: Any,
        classifier_vars: Any,
        y: jnp.ndarray,  # (B, H, W) uint8 full-res luma (fixed-point gray)
        cb: jnp.ndarray,  # (B, 256, 256) uint8: clip(B256 − y256r, ±128) + 128
        cr: jnp.ndarray,  # (B, 256, 256) uint8: clip(R256 − y256r, ±128) + 128
        gres: jnp.ndarray,  # (B, 256, 128) uint8: two 4-bit G residuals/byte
        threshold: jnp.ndarray,
    ) -> dict[str, jnp.ndarray]:
        comp = reconstruct_comp_yuv444(y, cb, cr, gres)
        return _pipeline_core(
            extractor,
            classifier,
            classifier_outputs_probabilities,
            extractor_vars,
            classifier_vars,
            comp,
            y.astype(jnp.float32),
            threshold,
            refine,
            arbitrate_chunk,
        )

    return fn


def reconstruct_comp_yuv444(
    y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray, gres: jnp.ndarray
) -> jnp.ndarray:
    """Device half of the yuv444 codec: (B, 256, 256, 3) float32 comp,
    bit-exactly equal to the host's ``pack_inputs_yuv444`` source comp
    (jit-testable on its own — tests/test_engine_packed.py)."""
    bsz, h, w = y.shape
    ih, iw = _INPUT_HW
    fh, fw = h // ih, w // iw
    f2 = fh * fw
    # area-sum of the luma block — small ints, exact
    sum4 = (
        y.astype(jnp.int32).reshape(bsz, ih, fh, iw, fw).sum(axis=(2, 4))
    )  # (B, 256, 256), ≤ f2·255
    y256r = (2 * sum4 + f2) // (2 * f2)  # round-half-up of sum4/f2
    b256 = y256r + (cb.astype(jnp.int32) - 128)  # exact comp B
    r256 = y256r + (cr.astype(jnp.int32) - 128)  # exact comp R
    # G prediction from the luma identity anchored on the ROUNDED luma
    # (the host can then source y256r from cv2's integer INTER_AREA
    # instead of a block-sum pass): N = y256r·2^15 − LR·r − LB·b; g ≈ N/LG
    n = (y256r << 15) - _LUMA_R_I * r256 - _LUMA_B_I * b256
    g_pred = (2 * n + _LUMA_G_I) // (2 * _LUMA_G_I)  # round-half-up
    g_pred = jnp.clip(g_pred, 0, 255)
    gi = gres.astype(jnp.int32)
    e = jnp.stack([gi & 15, (gi >> 4) & 15], axis=-1).reshape(bsz, ih, iw)
    g256 = jnp.clip(g_pred + (e - 8), 0, 255)  # exact comp G
    comp = jnp.stack([b256, g256, r256], axis=-1).astype(jnp.float32)
    return jnp.clip(comp, 0.0, 255.0)


def _yuv_block_factors(gray: np.ndarray) -> tuple[int, int]:
    """Validate a frame for YUV packing (dims divisible by the segmentation
    input size) and return the (fh, fw) block factors.  Every pack path —
    native, cv2, numpy — must go through this guard, or invalid sizes
    surface as garbage output / an opaque in-jit reshape error instead of
    a clear host-side ValueError."""
    ih, iw = _INPUT_HW
    h, w = gray.shape[1:3]
    if h % ih or w % iw:
        raise ValueError(
            f"YUV packing needs frame dims divisible by {constants.INPUT_SIZE} "
            f"(w, h); got {(w, h)} — use pack_inputs/the raw path for this size"
        )
    return h // ih, w // iw


def _luma_block_sums(gray: np.ndarray) -> tuple[np.ndarray, int]:
    """(B, 256, 256) int32 area-block sums of the full-res luma and the
    block pixel count f2 — the shared host/device integer base of the
    yuv444 reconstruction."""
    ih, iw = _INPUT_HW
    fh, fw = _yuv_block_factors(gray)
    # accumulate in int32 WITHOUT materializing an upcast copy of the
    # full-res plane (an int64 astype of a (B, 512, 512) batch allocates
    # gigabytes and dominated the pack cost)
    s = gray.reshape(len(gray), ih, fh, iw, fw).sum((2, 4), dtype=np.int32)
    return s, fh * fw


def pack_inputs_yuv444(
    images: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host-side packing for the bit-exact YUV444 engine path: full-res
    fixed-point grayscale, full-resolution (256²) chroma differences, and
    the 4-bit packed green residual plane (see process_yuv444_fn — the
    host mirrors the device's integer reconstruction exactly, so the
    residual it stores is the one the device needs).  416 KB/board at
    512² — 1.85× fewer host→device bytes than raw frames."""
    comp, gray = pack_inputs(images)  # exact INTER_AREA + fixed-point gray
    fh, fw = _yuv_block_factors(gray)  # guard BEFORE any pack path runs
    from chessvision_tpu import native_loader

    if native_loader.has_pack_yuv444():
        # fused C++ single pass (bit-identical to the numpy path below,
        # enforced by tests/test_native_loader.py; ~50× less host time)
        cb, cr, gres = native_loader.pack_yuv444(comp, gray)
        return gray, cb, cr, gres
    y256r = None
    if (fh, fw) == (2, 2):
        # cv2's integer INTER_AREA is bit-equal to round-half-up of the
        # block mean ONLY at factor 2 (measured: factors 4/8 differ on
        # thousands of pixels) — use it for the production 512² size,
        # fall through to the exact block-sum math elsewhere
        try:
            import cv2

            y256r = np.stack(
                [
                    cv2.resize(g, constants.INPUT_SIZE, interpolation=cv2.INTER_AREA)
                    for g in gray
                ]
            ).astype(np.int16)
        except ImportError:
            pass
    if y256r is None:
        sum4, f2 = _luma_block_sums(gray)
        y256r = ((2 * sum4 + f2) // (2 * f2)).astype(np.int16)
    # int16 throughout the small-range stages (fewer bytes touched)
    cb_c = np.clip(comp[..., 0].astype(np.int16) - y256r, -128, 127)
    cr_c = np.clip(comp[..., 2].astype(np.int16) - y256r, -128, 127)
    cb = (cb_c + 128).astype(np.uint8)
    cr = (cr_c + 128).astype(np.uint8)
    # G prediction WITHOUT materializing B/R: with b = y256r + cb_c and
    # r = y256r + cr_c, the device's n = (y256r<<15) − LR·r − LB·b equals
    # LG·y256r + m with m = −LR·cr_c − LB·cb_c, so its round-half-up
    # quotient is y256r + floor((2m + LG) / 2LG).  The f32 quotient is
    # exact-to-floor: |2m + LG| < 2^22 (exact in f32), true quotients are
    # ≥ 1/LG ≈ 5e-5 from any non-attained integer, f32 error ≤ ~6e-6.
    m2 = cr_c * np.float32(-2.0 * _LUMA_R_I) + cb_c * np.float32(-2.0 * _LUMA_B_I)
    adj = np.floor((m2 + np.float32(_LUMA_G_I)) / np.float32(2 * _LUMA_G_I))
    g_pred = np.clip(y256r + adj, 0, 255)
    resid = comp[..., 1].astype(np.int16) - g_pred
    e = (np.clip(resid, -8, 7) + 8).astype(np.uint8)  # (B, 256, 256) in [0, 15]
    gres = (e[..., 0::2] | (e[..., 1::2] << 4)).astype(np.uint8)  # (B, 256, 128)
    return gray, cb, cr, gres


def pack_inputs_yuv(images: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side packing for the YUV engine path: fixed-point grayscale at
    full resolution plus 2×-subsampled chroma DIFFERENCES of the
    segmentation input (Cb = B−Y, Cr = R−Y, offset-128 uint8).  Chroma
    differences are smooth in natural images, so 4:2:0 subsampling costs
    almost nothing while every reconstructed channel keeps full luma
    detail.  2.7× fewer host→device bytes than raw 512×512×3 frames.

    The subsampled diff is defined in pure integer arithmetic —
    round-half-up of (4·f2·ΣB − 4·ΣS)/(16·f2) over each 2×2 block, with
    ΣB the comp-channel block sum and ΣS the luma block sums — so the
    native C++ pack and this numpy fallback are bit-identical (enforced
    by tests/test_native_loader.py)."""
    comp, gray = pack_inputs(images)  # exact INTER_AREA + fixed-point gray
    _yuv_block_factors(gray)  # guard before any pack path
    from chessvision_tpu import native_loader

    if native_loader.has_pack_yuv420():
        cb, cr = native_loader.pack_yuv420(comp, gray)
        return gray, cb, cr
    ih, iw = _INPUT_HW
    th, tw = ih // 2, iw // 2
    b = len(images)
    sum4, f2 = _luma_block_sums(gray)  # (B, 256, 256) int32
    # 2×2 block sums of comp channels and luma sums (int32, exact)
    s_l = sum4.reshape(b, th, 2, tw, 2).sum((2, 4), dtype=np.int32)  # ΣS ≤ 4f2·255
    out = []
    for ch in (0, 2):
        s_c = (
            comp[..., ch].reshape(b, th, 2, tw, 2).sum((2, 4), dtype=np.int32)
        )  # ΣB ≤ 1020
        # mean diff = ΣB/4 − ΣS/(4f2); round-half-up via integer floor div
        num = 2 * (s_c * f2 - s_l) + 4 * f2
        d = num // (8 * f2)
        out.append(np.clip(d + 128, 0, 255).astype(np.uint8))
    return gray, out[0], out[1]


def pack_inputs(images: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side input packing for the packed engine path: exact
    INTER_AREA 256×256 resize + fixed-point grayscale (cv2 when present,
    else the numpy parity path)."""
    try:
        import cv2

        comp = np.stack(
            [cv2.resize(im, constants.INPUT_SIZE, interpolation=cv2.INTER_AREA) for im in images]
        )
        gray = np.stack([cv2.cvtColor(im, cv2.COLOR_BGR2GRAY) for im in images])
        return comp, gray
    except ImportError:
        b = images.astype(np.int32)
        gray = ((b[..., 2] * 9798 + b[..., 1] * 19235 + b[..., 0] * 3735 + (1 << 14)) >> 15).astype(
            np.uint8
        )
        # integer-factor area mean (exact INTER_AREA for divisible sizes);
        # fail loudly on non-divisible frames rather than emit wrong geometry
        h, w = images.shape[1:3]
        tw, th = constants.INPUT_SIZE
        if h % th or w % tw:
            raise ValueError(
                f"pack_inputs numpy fallback needs frame dims divisible by "
                f"{constants.INPUT_SIZE}; got {(h, w)} — install cv2 or resize on host first"
            )
        fh, fw = h // th, w // tw
        comp = images.reshape(len(images), th, fh, tw, fw, 3).mean((2, 4))
        comp = np.floor(comp + 0.5).astype(np.uint8)
        return comp, gray


def validate_labels_batch(
    probabilities: np.ndarray,  # (B, 64, 13)
    square_names: list[str],
) -> tuple[list[list[str]], list[list[ValidationFix]]]:
    """Host-side chess-rule validation (reference core.py:441-567).

    Rule 1 — no pawns on the back ranks → next-best non-pawn (the
    reference's only active rule, core.py:449-469).
    Rule 2 — one king per color: keep the most-probable king, demote the
    rest to their next-best non-king (non-pawn too on back-rank squares,
    so rule 2 cannot reintroduce a rule-1 violation).  The reference
    sketched exactly this rule and left it commented out
    (core.py:471-511); measured here it repairs phantom second kings
    born from board-edge noise (e.g. test board f41748b5 h1) without
    touching any correct square on the test set (RESULTS.md round 5).
    Rule 3 — every color has a king: a chess position always contains
    both kings (the reference's domain; its sketch covers only the
    surplus direction), so a color with ZERO kings promotes its
    most-king-probable square.  Guards: the best candidate must clear a
    probability floor (a cleared/empty board must not grow hallucinated
    kings from ~0 probabilities), and squares already corrected by rules
    1–2 or holding the other color's king are never displaced.
    Measured: repairs both misread kings on test board 76be4f7f and
    touches nothing else (RESULTS.md round 5).
    """
    b = probabilities.shape[0]
    preds = np.argmax(probabilities, axis=-1)  # (B, 64)
    labels = np.asarray(constants.LABEL_NAMES, dtype=object)[preds]  # (B, 64)

    pawn_idx = {constants.LABEL_INDICES["P"], constants.LABEL_INDICES["p"]}
    king_idx = {constants.LABEL_INDICES["K"], constants.LABEL_INDICES["k"]}
    invalid_rows = [
        i for i, name in enumerate(square_names) if name in constants.INVALID_PAWN_SQUARES
    ]
    back_rank = set(invalid_rows)

    all_labels: list[list[str]] = []
    all_fixes: list[list[ValidationFix]] = []
    # candidates sorted descending only for the 16 squares that can need fixing
    order = np.argsort(-probabilities[:, invalid_rows, :], axis=-1)  # (B, 16, 13)
    for bi in range(b):
        row_labels = list(labels[bi])
        fixes: list[ValidationFix] = []
        for ii, sq in enumerate(invalid_rows):
            if preds[bi, sq] in pawn_idx:
                for alt in order[bi, ii]:
                    if int(alt) not in pawn_idx:
                        alt_piece = constants.LABEL_NAMES[int(alt)]
                        fixes.append(
                            ValidationFix(
                                square_name=square_names[sq],
                                original_piece=row_labels[sq],
                                corrected_piece=alt_piece,
                                rule_name="no_pawns_on_ends",
                            )
                        )
                        row_labels[sq] = alt_piece
                        break
        for king in ("K", "k"):
            ki = constants.LABEL_INDICES[king]
            claimants = [sq for sq in range(64) if row_labels[sq] == king]
            if len(claimants) <= 1:
                continue
            claimants.sort(key=lambda sq: -float(probabilities[bi, sq, ki]))
            for sq in claimants[1:]:
                banned = king_idx | (pawn_idx if sq in back_rank else set())
                for alt in np.argsort(-probabilities[bi, sq]):
                    if int(alt) not in banned:
                        alt_piece = constants.LABEL_NAMES[int(alt)]
                        fixes.append(
                            ValidationFix(
                                square_name=square_names[sq],
                                original_piece=king,
                                corrected_piece=alt_piece,
                                rule_name="one_king_per_color",
                            )
                        )
                        row_labels[sq] = alt_piece
                        break
        touched = {f.square_name for f in fixes}
        for king, other in (("K", "k"), ("k", "K")):
            ki = constants.LABEL_INDICES[king]
            if any(lab == king for lab in row_labels):
                continue
            for sq in map(int, np.argsort(-probabilities[bi, :, ki])):
                if float(probabilities[bi, sq, ki]) < _MISSING_KING_FLOOR:
                    break  # no plausible candidate anywhere — leave as-is
                if row_labels[sq] == other or square_names[sq] in touched:
                    continue
                fixes.append(
                    ValidationFix(
                        square_name=square_names[sq],
                        original_piece=row_labels[sq],
                        corrected_piece=king,
                        rule_name="missing_king",
                    )
                )
                row_labels[sq] = king
                break
        all_labels.append(row_labels)
        all_fixes.append(fixes)
    return all_labels, all_fixes


class Engine:
    """Compiled batched image→FEN engine over an optional device mesh.

    One instance holds the model variables on device and a jit cache per
    input shape.  ``process_batch`` is the throughput API; the per-image
    ``ChessVision`` facade (core.py) wraps it for the reference's API.
    """

    def __init__(
        self,
        extractor: Any,
        extractor_vars: Any,
        classifier: Any,
        classifier_vars: Any,
        *,
        classifier_outputs_probabilities: bool = False,
        mesh: Any = None,
        donate_inputs: bool = False,
        refine_grid: str | None = None,
        arbitrate_chunk: int | None = None,
    ) -> None:
        # grid-refinement mode (ops/gridfix.py): "arbitrate" (default),
        # "detect", or "off"; CVTPU_REFINE overrides for quick A/B runs
        if refine_grid is None:
            refine_grid = os.getenv("CVTPU_REFINE", "arbitrate")
        if refine_grid not in ("arbitrate", "detect", "off"):
            raise ValueError(f"unknown refine_grid mode {refine_grid!r}")
        self._refine = refine_grid
        self.mesh = mesh
        # Arbitrate-tail chunk: the HBM bound is PER DEVICE, so on a mesh
        # (batch axis sharded over n devices) the chunk scales by mesh
        # size — B=1024 on 8 chips has 128-board per-device residency and
        # must NOT chunk: a scan's leading axis cannot stay batch-sharded,
        # so chunking a sharded batch serializes the data-parallel tail
        # (advisor r4).  CVTPU_ARBITRATE_CHUNK overrides the per-device
        # chunk for throughput sweeps on real hardware.
        if arbitrate_chunk is None:
            env_chunk = os.getenv("CVTPU_ARBITRATE_CHUNK")
            per_device = int(env_chunk) if env_chunk else _ARBITRATE_CHUNK
            arbitrate_chunk = per_device * (mesh.size if mesh is not None else 1)
        self._arbitrate_chunk = arbitrate_chunk
        if mesh is not None:
            self._ex_vars = jax.device_put(extractor_vars, mesh_lib.replicate(mesh))
            self._cl_vars = jax.device_put(classifier_vars, mesh_lib.replicate(mesh))
        else:
            self._ex_vars = extractor_vars
            self._cl_vars = classifier_vars
        # Close over the variables instead of passing them as call
        # arguments: on the tunneled backend, staging the ~10⁷-leaf f32
        # parameter tree per call cost ~1.5 s; baked as compile-time
        # constants the same program executes in tens of ms.
        self._extractor = extractor
        self._classifier = classifier
        self._cls_probs_flag = classifier_outputs_probabilities
        self._jitted_packed = None
        self._jitted_yuv = None
        self._jitted_yuv444 = None
        # The raw-frame path CHAINS two programs: a tiny preprocess program
        # (resize + exact grayscale) feeding the SAME compiled back half the
        # host-packed path uses.  Sharing the back-half program guarantees
        # raw and packed inference are bit-identical (a fused monolithic
        # program can round the warp's matmuls differently and flip marginal
        # squares); the extra dispatch costs ~nothing at batch sizes.
        self._jitted_pre = jax.jit(preprocess_images)

        def closed(images: Any, thr: Any) -> dict[str, jnp.ndarray]:
            comp, gray = self._jitted_pre(images)
            return self._packed_program()(comp, gray, thr)

        self._jitted_closed = closed
        # lite program: only the small outputs (found/quad/probabilities) —
        # for latency-sensitive serving, where shipping the board/logits
        # buffers D2H dominates B=1 time
        ex_vars, cl_vars = self._ex_vars, self._cl_vars
        lite_fn = process_packed_fn(
            extractor,
            classifier,
            classifier_outputs_probabilities,
            self._refine,
            self._arbitrate_chunk,
        )
        self._jitted_lite_packed = jax.jit(
            lambda c, g, t: {
                k: v
                for k, v in lite_fn(ex_vars, cl_vars, c, g, t).items()
                if k in ("found", "quadrangle", "probabilities")
            }
        )

        def lite(images: Any, thr: Any) -> dict[str, jnp.ndarray]:
            comp, gray = self._jitted_pre(images)
            return self._jitted_lite_packed(comp, gray, thr)

        self._jitted_lite = lite
        # serve program: lite + the extracted board (for serving modes that
        # persist uploads, reference cv_endpoint.py:174-187) — still skips
        # the logits buffer, the largest D2H transfer (f32 256² = 256
        # KB/board vs the uint8 board's 256 KB; mask is host-recomputable)
        self._jitted_serve_packed = jax.jit(
            lambda c, g, t: {
                k: v
                for k, v in lite_fn(ex_vars, cl_vars, c, g, t).items()
                if k in ("found", "quadrangle", "probabilities", "board_image")
            }
        )

        def serve_prog(images: Any, thr: Any) -> dict[str, jnp.ndarray]:
            comp, gray = self._jitted_pre(images)
            return self._jitted_serve_packed(comp, gray, thr)

        self._jitted_serve = serve_prog

    def run_packed(self, comp: Any, gray: Any, threshold: float = 0.5) -> dict[str, jnp.ndarray]:
        """Run the IO-optimized packed-input pipeline (see
        process_packed_fn); inputs from ``pack_inputs`` or the native
        loader."""
        return self._packed_program()(
            jnp.asarray(comp), jnp.asarray(gray), jnp.float32(threshold)
        )

    def _packed_program(self) -> Any:
        if self._jitted_packed is None:
            fn = process_packed_fn(
                self._extractor,
                self._classifier,
                self._cls_probs_flag,
                self._refine,
                self._arbitrate_chunk,
            )
            ex_vars, cl_vars = self._ex_vars, self._cl_vars
            self._jitted_packed = jax.jit(lambda c, g, t: fn(ex_vars, cl_vars, c, g, t))
        return self._jitted_packed

    def run_yuv(self, y: Any, bc: Any, rc: Any, threshold: float = 0.5) -> dict[str, jnp.ndarray]:
        """Run the minimum-bytes YUV pipeline (see process_yuv_fn); inputs
        from ``pack_inputs_yuv``."""
        return self._yuv_program()(
            jnp.asarray(y), jnp.asarray(bc), jnp.asarray(rc), jnp.float32(threshold)
        )

    def _yuv_program(self) -> Any:
        if self._jitted_yuv is None:
            fn = process_yuv_fn(
                self._extractor,
                self._classifier,
                self._cls_probs_flag,
                self._refine,
                self._arbitrate_chunk,
            )
            ex_vars, cl_vars = self._ex_vars, self._cl_vars
            self._jitted_yuv = jax.jit(lambda y, b, r, t: fn(ex_vars, cl_vars, y, b, r, t))
        return self._jitted_yuv

    def run_yuv444(
        self, y: Any, cb: Any, cr: Any, gres: Any, threshold: float = 0.5
    ) -> dict[str, jnp.ndarray]:
        """Run the bit-exact minimum-bytes pipeline (see
        process_yuv444_fn); inputs from ``pack_inputs_yuv444``."""
        return self._yuv444_program()(
            jnp.asarray(y),
            jnp.asarray(cb),
            jnp.asarray(cr),
            jnp.asarray(gres),
            jnp.float32(threshold),
        )

    def _yuv444_program(self) -> Any:
        if self._jitted_yuv444 is None:
            fn = process_yuv444_fn(
                self._extractor,
                self._classifier,
                self._cls_probs_flag,
                self._refine,
                self._arbitrate_chunk,
            )
            ex_vars, cl_vars = self._ex_vars, self._cl_vars
            self._jitted_yuv444 = jax.jit(
                lambda y, b, r, s, t: fn(ex_vars, cl_vars, y, b, r, s, t)
            )
        return self._jitted_yuv444

    # -- device path ---------------------------------------------------------

    def run_device(self, images: np.ndarray | jnp.ndarray, threshold: float = 0.5) -> dict[str, jnp.ndarray]:
        """Run the fused pipeline; returns device arrays (no host sync).

        On a mesh, input rides the same multi-host input-pipeline primitive
        the trainers use (``make_global_batch``): every process constructs
        the full batch but device_puts only its own rows; XLA shards the
        program over the whole (possibly cross-process) mesh.  When the
        mesh spans processes the outputs are all-gathered to every host
        first (eager ops on cross-process arrays are illegal), so the
        returned arrays are host numpy there."""
        if self.mesh is not None:
            n = self.mesh.size
            images, orig = mesh_lib.pad_to_multiple(np.asarray(images), n)
            global_images = mesh_lib.make_global_batch(self.mesh, images)
            out = self._jitted_closed(global_images, jnp.float32(threshold))
            if mesh_lib.spans_processes(self.mesh):
                out = mesh_lib.host_gather(self.mesh, out)
            return {k: v[:orig] for k, v in out.items()}
        images = jnp.asarray(images)
        return self._jitted_closed(images, jnp.float32(threshold))

    def run_stream(self, batches, threshold: float = 0.5, kind: str = "raw"):
        """Pipelined streaming inference: upload batch i+1 while batch i
        computes (double buffering via async device_put).  Yields device
        output dicts in order.

        ``kind`` selects the input format per element of ``batches``:
        "raw" — (B, H, W, 3) uint8 frames; "packed" — (comp, gray) tuples
        from ``pack_inputs``; "yuv" — (y, bc, rc) tuples from
        ``pack_inputs_yuv``; "yuv444" — (y, cb, cr, gres) tuples from
        ``pack_inputs_yuv444``."""
        if kind == "raw":
            program = self._jitted_closed
            put = jax.device_put
            call = lambda cur, thr: program(cur, thr)  # noqa: E731
        elif kind in ("packed", "yuv", "yuv444"):
            program = {
                "packed": self._packed_program,
                "yuv": self._yuv_program,
                "yuv444": self._yuv444_program,
            }[kind]()
            put = lambda t: tuple(jax.device_put(a) for a in t)  # noqa: E731
            call = lambda cur, thr: program(*cur, thr)  # noqa: E731
        else:
            raise ValueError(f"unknown stream kind {kind!r}")

        threshold = jnp.float32(threshold)
        it = iter(batches)
        try:
            current = put(next(it))
        except StopIteration:
            return
        while True:
            # dispatch FIRST (jit dispatch is async — the device starts on
            # batch i immediately), THEN draw the next element: when
            # ``batches`` is a generator that packs on demand, the host
            # pack of batch i+1 and its async H2D both overlap batch i's
            # compute, so steady-state throughput is max(pack, upload,
            # compute) instead of their sum
            out = call(current, threshold)
            nxt = next(it, None)
            pending = put(nxt) if nxt is not None else None
            yield out
            if pending is None:
                return
            current = pending

    # -- host result assembly --------------------------------------------------

    def process_batch(
        self,
        images: np.ndarray,
        threshold: float = 0.5,
        flip: bool = False,
        lite: bool = False,
        include_board: bool = False,
    ) -> BatchResult:
        """Full image→FEN over a uniform-shape batch (B, H, W, 3) uint8.

        ``lite=True`` skips the board/mask/logits outputs (FEN +
        probabilities + quadrangle only) — roughly 3× lower single-image
        latency for serving, where those buffers' D2H transfers dominate.
        ``include_board=True`` with ``lite`` adds back just the extracted
        board (what persisting serving modes need, reference
        cv_endpoint.py:174-187) while still skipping the logits buffer.
        """
        if lite and self.mesh is None:
            program = self._jitted_serve if include_board else self._jitted_lite
            out = program(jnp.asarray(images), jnp.float32(threshold))
            out = jax.tree.map(np.asarray, out)
            b = images.shape[0]
            out["logits"] = np.zeros((b, 0, 0), np.float32)
            out["binary_mask"] = np.zeros((b, 0, 0), np.uint8)
            if not include_board:
                out["board_image"] = np.zeros((b, 0, 0), np.uint8)
        else:
            out = self.run_device(images, threshold)
            out = jax.tree.map(np.asarray, out)
            # host-side threshold mask (reference utils.py:101-112 semantics)
            with np.errstate(over="ignore"):
                probs_mask = 1.0 / (1.0 + np.exp(-out["logits"], dtype=np.float32))
            out["binary_mask"] = np.where(probs_mask > threshold, np.uint8(255), np.uint8(0))

        square_names = (
            constants.SQUARE_NAMES_FLIPPED if flip else constants.SQUARE_NAMES_NORMAL
        )
        probs = out["probabilities"]
        found = out["found"]

        original_fens: list[str] = []
        fens: list[str] = []
        labels = np.asarray(constants.LABEL_NAMES, dtype=object)[np.argmax(probs, axis=-1)]
        validated, fixes = validate_labels_batch(probs, square_names)
        for bi in range(images.shape[0]):
            if not found[bi]:
                original_fens.append("")
                fens.append("")
                continue
            original_fens.append(labels_to_fen(list(labels[bi]), square_names))
            fens.append(labels_to_fen(validated[bi], square_names))

        return BatchResult(
            logits=out["logits"],
            binary_mask=out["binary_mask"],
            quadrangle=out["quadrangle"],
            board_found=found,
            board_image=out["board_image"],
            probabilities=probs,
            fens=fens,
            original_fens=original_fens,
            validation_fixes=[f if found[i] else [] for i, f in enumerate(fixes)],
            extra={"square_names": square_names},
        )
