"""Jittable, batched data augmentations.

Replaces the reference's torchvision per-sample host transforms — seg:
hflip / rotate ±15° / ColorJitter(0.1×4) / GaussianBlur(3), each at p=0.5
(train_unet.py:68-91); cls: RandomAffine(translate 0.1, scale 0.95–1.05) +
RandomRotation(15°) (train_classifier.py:34-43) — with vmapped
``jax.random`` transforms that run on device fused into the train step.
Hue jitter uses the YIQ rotation approximation instead of an HSV
round-trip (training-time noise; parity is statistical, not bitwise).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _rotate_bilinear(img: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate (H, W, C) around the center, zero fill, bilinear sampling."""
    h, w = img.shape[0], img.shape[1]
    theta = angle_deg * jnp.pi / 180.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    sx = cos * xs + sin * ys + cx
    sy = -sin * xs + cos * ys + cy
    return _bilinear_sample(img, sx, sy)


def _affine(img: jnp.ndarray, tx: jnp.ndarray, ty: jnp.ndarray, scale: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Inverse-mapped affine: translate (pixels), uniform scale, rotate."""
    h, w = img.shape[0], img.shape[1]
    theta = angle_deg * jnp.pi / 180.0
    cos, sin = jnp.cos(theta) / scale, jnp.sin(theta) / scale
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy - ty
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx - tx
    sx = cos * xs + sin * ys + cx
    sy = -sin * xs + cos * ys + cy
    return _bilinear_sample(img, sx, sy)


def _bilinear_sample(img: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx, fy = sx - x0, sy - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)

    def sample(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        if img.ndim == 3:
            valid = valid[..., None]
        return jnp.where(valid, v, 0.0)

    w00, w01 = (1 - fx) * (1 - fy), fx * (1 - fy)
    w10, w11 = (1 - fx) * fy, fx * fy
    if img.ndim == 3:
        w00, w01, w10, w11 = (t[..., None] for t in (w00, w01, w10, w11))
    return sample(y0i, x0i) * w00 + sample(y0i, x0i + 1) * w01 + sample(y0i + 1, x0i) * w10 + sample(y0i + 1, x0i + 1) * w11


def _color_jitter(key: jax.Array, img: jnp.ndarray) -> jnp.ndarray:
    """brightness/contrast/saturation/hue, each ±0.1 (BGR in [0,1])."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    b = jax.random.uniform(kb, (), minval=0.9, maxval=1.1)
    c = jax.random.uniform(kc, (), minval=0.9, maxval=1.1)
    s = jax.random.uniform(ks, (), minval=0.9, maxval=1.1)
    hshift = jax.random.uniform(kh, (), minval=-0.1, maxval=0.1) * 2 * jnp.pi

    img = img * b
    mean = img.mean(keepdims=True)
    img = (img - mean) * c + mean
    gray = img[..., 2:3] * 0.299 + img[..., 1:2] * 0.587 + img[..., 0:1] * 0.114
    img = (img - gray) * s + gray
    # hue rotation in YIQ space (channels are BGR)
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


def _gaussian_blur3(key: jax.Array, img: jnp.ndarray) -> jnp.ndarray:
    """3×3 Gaussian blur with sigma ~ U(0.1, 2.0) (torchvision default)."""
    sigma = jax.random.uniform(key, (), minval=0.1, maxval=2.0)
    xs = jnp.array([-1.0, 0.0, 1.0])
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    k = k / k.sum()
    # separable 1-D convolutions along H then W
    pad_h = jnp.pad(img, ((1, 1), (0, 0), (0, 0)), mode="edge")
    img = k[0] * pad_h[:-2] + k[1] * pad_h[1:-1] + k[2] * pad_h[2:]
    pad_w = jnp.pad(img, ((0, 0), (1, 1), (0, 0)), mode="edge")
    img = k[0] * pad_w[:, :-2] + k[1] * pad_w[:, 1:-1] + k[2] * pad_w[:, 2:]
    return img


def _augment_seg_one(key: jax.Array, img: jnp.ndarray, mask: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One (256,256,3)+(256,256) sample in [0,1]."""
    k1, k2, k3, k4, kf, kr, kj, kb = jax.random.split(key, 8)

    do_flip = jax.random.uniform(k1) > 0.5
    img = jnp.where(do_flip, img[:, ::-1], img)
    mask = jnp.where(do_flip, mask[:, ::-1], mask)

    do_rot = jax.random.uniform(k2) > 0.5
    angle = jax.random.randint(kr, (), -15, 15).astype(jnp.float32)
    img_r = _rotate_bilinear(img, angle)
    mask_r = _rotate_bilinear(mask[..., None], angle)[..., 0]
    img = jnp.where(do_rot, img_r, img)
    mask = jnp.where(do_rot, mask_r, mask)

    do_jit = jax.random.uniform(k3) > 0.5
    img = jnp.where(do_jit, _color_jitter(kj, img), img)

    do_blur = jax.random.uniform(k4) > 0.5
    img = jnp.where(do_blur, _gaussian_blur3(kb, img), img)
    return img, mask


@partial(jax.jit, donate_argnums=())
def augment_segmentation_batch(key: jax.Array, images: jnp.ndarray, masks: jnp.ndarray):
    """(B,256,256,3) f32 in [0,1], (B,256,256) f32 → augmented pair."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(_augment_seg_one)(keys, images, masks)


def _augment_cls_one(key: jax.Array, img: jnp.ndarray) -> jnp.ndarray:
    """One (64,64,1) sample: RandomAffine(translate ±10%, scale 0.95–1.05)
    then RandomRotation(±15°)."""
    kt, ks, kr = jax.random.split(key, 3)
    txy = jax.random.uniform(kt, (2,), minval=-0.1, maxval=0.1) * 64.0
    scale = jax.random.uniform(ks, (), minval=0.95, maxval=1.05)
    img = _affine(img, txy[0], txy[1], scale, jnp.float32(0.0))
    angle = jax.random.uniform(kr, (), minval=-15.0, maxval=15.0)
    return _rotate_bilinear(img, angle)


@jax.jit
def augment_classification_batch(key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    """(B,64,64,1) f32 in [0,1] → augmented."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(_augment_cls_one)(keys, images)
