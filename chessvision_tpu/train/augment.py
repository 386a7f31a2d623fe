"""Jittable, batched data augmentations.

Replaces the reference's torchvision per-sample host transforms — seg:
hflip / rotate ±15° / ColorJitter(0.1×4) / GaussianBlur(3), each at p=0.5
(train_unet.py:68-91); cls: RandomAffine(translate 0.1, scale 0.95–1.05) +
RandomRotation(15°) (train_classifier.py:34-43) — with batched device
transforms that run fused with the train step.

TPU notes: all geometric transforms are expressed as per-sample 3×3
homographies executed by the gather-free two-pass warp kernel
(ops/warp.py) in ONE batched call — per-pixel fancy indexing under vmap
compiles to pathological TPU gathers.  Unselected samples get the
identity matrix (a no-op warp) instead of a lax.select of two full
images.  Hue jitter uses the YIQ rotation approximation instead of an
HSV round-trip; rotation interpolates bilinearly where torchvision
defaults to nearest (training-time noise; parity is statistical).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from chessvision_tpu.ops.warp import _warp_batched_twopass


def _rotation_matrices(angles_deg: jnp.ndarray, h: float, w: float) -> jnp.ndarray:
    """(B,) angles → (B, 3, 3) forward homographies rotating about center."""
    theta = angles_deg * jnp.pi / 180.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    zeros = jnp.zeros_like(cos)
    ones = jnp.ones_like(cos)
    # T(c) R T(-c)
    m = jnp.stack(
        [
            jnp.stack([cos, -sin, cx - cos * cx + sin * cy], -1),
            jnp.stack([sin, cos, cy - sin * cx - cos * cy], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    return m


def _affine_matrices(
    tx: jnp.ndarray, ty: jnp.ndarray, scale: jnp.ndarray, h: float, w: float
) -> jnp.ndarray:
    """Translate + uniform scale about center → (B, 3, 3)."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    zeros = jnp.zeros_like(scale)
    ones = jnp.ones_like(scale)
    m = jnp.stack(
        [
            jnp.stack([scale, zeros, cx + tx - scale * cx], -1),
            jnp.stack([zeros, scale, cy + ty - scale * cy], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    return m


def _warp_nhwc(images: jnp.ndarray, ms: jnp.ndarray) -> jnp.ndarray:
    """Batched homography warp of (B, H, W[, C]) by forward matrices."""
    if images.ndim == 4:
        b, h, w, c = images.shape
        flat = images.transpose(0, 3, 1, 2).reshape(b * c, h, w)
        ms_flat = jnp.repeat(ms, c, axis=0)
        out = _warp_batched_twopass(flat, ms_flat, h, w)
        return out.reshape(b, c, h, w).transpose(0, 2, 3, 1)
    b, h, w = images.shape
    return _warp_batched_twopass(images, ms, h, w)


def _color_jitter_batch(key: jax.Array, img: jnp.ndarray, apply: jnp.ndarray) -> jnp.ndarray:
    """brightness/contrast/saturation/hue, each ±0.1, per sample (BGR, [0,1])."""
    b = img.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)

    def per(k, lo, hi):
        v = jax.random.uniform(k, (b,), minval=lo, maxval=hi)
        return jnp.where(apply, v, (lo + hi) / 2.0)[:, None, None, None]

    bright = per(kb, 0.9, 1.1)
    contrast = per(kc, 0.9, 1.1)
    sat = per(ks, 0.9, 1.1)
    hshift = (per(kh, -0.1, 0.1) * 2 * jnp.pi)[..., 0]

    img = img * bright
    mean = img.mean(axis=(1, 2, 3), keepdims=True)
    img = (img - mean) * contrast + mean
    gray = img[..., 2:3] * 0.299 + img[..., 1:2] * 0.587 + img[..., 0:1] * 0.114
    img = (img - gray) * sat + gray
    r, g, bch = img[..., 2], img[..., 1], img[..., 0]
    y = 0.299 * r + 0.587 * g + 0.114 * bch
    i = 0.596 * r - 0.274 * g - 0.322 * bch
    q = 0.211 * r - 0.523 * g + 0.312 * bch
    cos, sin = jnp.cos(hshift), jnp.sin(hshift)
    i2 = i * cos - q * sin
    q2 = i * sin + q * cos
    r2 = y + 0.956 * i2 + 0.621 * q2
    g2 = y - 0.272 * i2 - 0.647 * q2
    b2 = y - 1.106 * i2 + 1.703 * q2
    img = jnp.stack([b2, g2, r2], axis=-1)
    return jnp.clip(img, 0.0, 1.0)


def _gaussian_blur3_batch(key: jax.Array, img: jnp.ndarray, apply: jnp.ndarray) -> jnp.ndarray:
    """3×3 Gaussian blur, sigma ~ U(0.1, 2.0) per sample; identity kernel
    where not applied."""
    b = img.shape[0]
    sigma = jax.random.uniform(key, (b,), minval=0.1, maxval=2.0)
    xs = jnp.array([-1.0, 0.0, 1.0])
    k = jnp.exp(-0.5 * (xs[None, :] / sigma[:, None]) ** 2)
    k = k / k.sum(axis=1, keepdims=True)
    ident = jnp.array([0.0, 1.0, 0.0])
    k = jnp.where(apply[:, None], k, ident)  # (B, 3)
    k0, k1, k2 = (k[:, i][:, None, None, None] for i in range(3))
    pad_h = jnp.pad(img, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    img = k0 * pad_h[:, :-2] + k1 * pad_h[:, 1:-1] + k2 * pad_h[:, 2:]
    pad_w = jnp.pad(img, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    img = k0 * pad_w[:, :, :-2] + k1 * pad_w[:, :, 1:-1] + k2 * pad_w[:, :, 2:]
    return img


def _illum_gradient_batch(key: jax.Array, img: jnp.ndarray) -> jnp.ndarray:
    """Page-level illumination gradient (p=0.3 per sample): multiply by a
    linear ramp 1 → (1 − s), s ~ U(0.25, 0.65), along one of the four
    axis directions.  Models the book-gutter / page-shadow dimming that
    under-segments the dark files of printed boards (test board 006bab7f
    — 58% of the round-4 residual errors).  Applied to the REAL photos on
    device, so the model learns illumination invariance without the
    synthetic-domain shift that overfit the round-4/5 print fine-tunes
    (RESULTS.md).  No reference analogue (torchvision ColorJitter is
    spatially uniform, reference train_unet.py:68-91)."""
    b, h, w = img.shape[0], img.shape[1], img.shape[2]
    kp, ks, kd = jax.random.split(key, 3)
    apply = jax.random.uniform(kp, (b,)) < 0.3
    s = jax.random.uniform(ks, (b,), minval=0.25, maxval=0.65)
    s = jnp.where(apply, s, 0.0)[:, None, None]
    direction = jax.random.randint(kd, (b,), 0, 4)
    tx = jnp.linspace(0.0, 1.0, w)[None, None, :] * jnp.ones((1, h, 1))
    ty = jnp.linspace(0.0, 1.0, h)[None, :, None] * jnp.ones((1, 1, w))
    t = jnp.select(
        [direction[:, None, None] == k for k in range(4)],
        [tx, 1.0 - tx, ty, 1.0 - ty],
    )
    return img * (1.0 - s * t)[..., None]


@functools.partial(jax.jit, static_argnames=("illum_gradient",))
def augment_segmentation_batch(
    key: jax.Array,
    images: jnp.ndarray,
    masks: jnp.ndarray,
    illum_gradient: bool = False,
):
    """(B,256,256,3) f32 in [0,1], (B,256,256) f32 → augmented pair."""
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    k1, k2, k3, k4, kr, kj, kb = jax.random.split(key, 7)
    if illum_gradient:
        # derived key (not an 8-way split) so enabling the gradient leaves
        # every pre-existing augmentation's stream untouched at a seed
        images = _illum_gradient_batch(jax.random.fold_in(k1, 1), images)

    do_flip = jax.random.uniform(k1, (b,)) > 0.5
    flipped = images[:, :, ::-1]
    images = jnp.where(do_flip[:, None, None, None], flipped, images)
    masks = jnp.where(do_flip[:, None, None], masks[:, :, ::-1], masks)

    do_rot = jax.random.uniform(k2, (b,)) > 0.5
    angles = jax.random.randint(kr, (b,), -15, 15).astype(jnp.float32)
    angles = jnp.where(do_rot, angles, 0.0)
    ms = _rotation_matrices(angles, h, w)
    images = _warp_nhwc(images, ms)
    masks = _warp_nhwc(masks, ms)

    do_jit = jax.random.uniform(k3, (b,)) > 0.5
    images = _color_jitter_batch(kj, images, do_jit)

    do_blur = jax.random.uniform(k4, (b,)) > 0.5
    images = _gaussian_blur3_batch(kb, images, do_blur)
    return images, masks


@functools.partial(jax.jit, static_argnames=("photometric", "cutout", "dim", "fade"))
def augment_classification_batch(
    key: jax.Array,
    images: jnp.ndarray,
    photometric: bool = True,
    cutout: bool = False,
    dim: bool = False,
    fade: bool = False,
) -> jnp.ndarray:
    """(B,64,64,1) f32 in [0,1]: RandomAffine(translate ±10%, scale
    0.95–1.05) then RandomRotation(±15°) as one composed batched warp
    (the reference's transform set, train_classifier.py:34-43), plus —
    beyond the reference — per-sample photometric jitter (brightness/
    contrast, p=0.5 blur) to close the clean-training-square vs
    warped-test-board domain gap.

    ``dim``: heavy per-square dimming, factor ~ U(0.3, 0.75) at p=0.25 —
    squares inside a page gutter / shadow arrive at ~0.35× brightness,
    far below the standard jitter's 0.75× floor; the round-5 error
    analysis reads the residual gutter-board confusions as pieces→empty
    on exactly such squares (RESULTS.md round 5).

    ``fade``: contrast fade toward paper white at p=0.25 — the measured
    transform of book-gutter defocus (test board 006bab7f ranks 1–2:
    crop std collapses 25–39 → 10–20 while the MEAN stays normal and
    darks lift p5 ≈ 46 → 90, i.e. pieces become faint outlines on a
    light ground).  x → L − c·(L − x) with residual contrast
    c ~ U(0.3, 0.75) and white anchor L ~ U(0.55, 0.95); brightness
    dimming (``dim``) cannot emulate this — it moves the mean, not the
    contrast."""
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    kt, ks, kr, kb, kc, kg, kp = jax.random.split(key, 7)
    # derived (not split(key, 8)) so enabling cutout leaves every
    # pre-existing augmentation's random stream untouched at a given seed
    kcut = jax.random.fold_in(kp, 1)
    if dim:
        kd1, kd2 = jax.random.split(jax.random.fold_in(kp, 2))
        do_dim = jax.random.uniform(kd1, (b,)) < 0.25
        factor = jax.random.uniform(kd2, (b,), minval=0.3, maxval=0.75)
        factor = jnp.where(do_dim, factor, 1.0)[:, None, None, None]
        images = images * factor
    if fade:
        kf1, kf2, kf3 = jax.random.split(jax.random.fold_in(kp, 3), 3)
        do_fade = jax.random.uniform(kf1, (b,)) < 0.25
        c = jax.random.uniform(kf2, (b,), minval=0.3, maxval=0.75)
        c = jnp.where(do_fade, c, 1.0)[:, None, None, None]
        paper = jax.random.uniform(kf3, (b,), minval=0.55, maxval=0.95)
        paper_b = paper[:, None, None, None]
        # identity when c = 1 regardless of the anchor; stays in [0, 1]
        images = paper_b - c * (paper_b - images)
    txy = jax.random.uniform(kt, (b, 2), minval=-0.1, maxval=0.1) * w
    scale = jax.random.uniform(ks, (b,), minval=0.95, maxval=1.05)
    angles = jax.random.uniform(kr, (b,), minval=-15.0, maxval=15.0)
    m_aff = _affine_matrices(txy[:, 0], txy[:, 1], scale, h, w)
    m_rot = _rotation_matrices(angles, h, w)
    ms = jnp.einsum("bij,bjk->bik", m_rot, m_aff)
    images = _warp_nhwc(images, ms)

    if photometric:
        bright = jax.random.uniform(kb, (b, 1, 1, 1), minval=0.75, maxval=1.25)
        contrast = jax.random.uniform(kc, (b, 1, 1, 1), minval=0.75, maxval=1.25)
        images = images * bright
        mean = images.mean(axis=(1, 2, 3), keepdims=True)
        images = (images - mean) * contrast + mean
        do_blur = jax.random.uniform(kp, (b,)) > 0.5
        images = _gaussian_blur3_batch(kg, images, do_blur)
        images = jnp.clip(images, 0.0, 1.0)

    if cutout:
        # random erasing (p=0.5): mean-fill a rectangle covering 10–25% of
        # each side — simulates fingers/pieces occluding squares in photos
        kc1, kc2, kc3 = jax.random.split(kcut, 3)
        do_cut = jax.random.uniform(kc1, (b,)) > 0.5
        cy_cx = jax.random.uniform(kc2, (b, 2), minval=0.1, maxval=0.9)
        half = jax.random.uniform(kc3, (b, 2), minval=0.05, maxval=0.125)
        ys = jnp.arange(h, dtype=jnp.float32)[None, :, None] / h  # (1,H,1)
        xs = jnp.arange(w, dtype=jnp.float32)[None, None, :] / w  # (1,1,W)
        in_y = jnp.abs(ys - cy_cx[:, 0][:, None, None]) < half[:, 0][:, None, None]
        in_x = jnp.abs(xs - cy_cx[:, 1][:, None, None]) < half[:, 1][:, None, None]
        hole = (in_y & in_x & do_cut[:, None, None])[..., None]  # (B,H,W,1)
        fill = images.mean(axis=(1, 2, 3), keepdims=True)
        images = jnp.where(hole, fill, images)
    return images
