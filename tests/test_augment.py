"""Augmentation tests: shape/range contracts, determinism, identity no-ops."""

import numpy as np

import jax
import jax.numpy as jnp

from chessvision_tpu.train.augment import (
    _affine_matrices,
    _rotation_matrices,
    _warp_nhwc,
    augment_classification_batch,
    augment_segmentation_batch,
)


def test_segmentation_augment_contracts() -> None:
    key = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.default_rng(0).random((4, 256, 256, 3)), jnp.float32)
    # realistic solid board-blob masks, not binary noise
    msk = np.zeros((4, 256, 256), np.float32)
    msk[:, 40:210, 50:220] = 1.0
    ai, am = augment_segmentation_batch(key, imgs, jnp.asarray(msk))
    assert ai.shape == imgs.shape and am.shape == msk.shape
    assert float(ai.min()) >= 0.0 and float(ai.max()) <= 1.0
    # masks stay near-binary (warping interpolates edges only)
    frac_mid = float(((am > 0.1) & (am < 0.9)).mean())
    assert frac_mid < 0.05


def test_segmentation_augment_deterministic() -> None:
    key = jax.random.PRNGKey(7)
    imgs = jnp.asarray(np.random.default_rng(0).random((2, 256, 256, 3)), jnp.float32)
    msks = jnp.zeros((2, 256, 256), jnp.float32)
    a1, _ = augment_segmentation_batch(key, imgs, msks)
    a2, _ = augment_segmentation_batch(key, imgs, msks)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    a3, _ = augment_segmentation_batch(jax.random.PRNGKey(8), imgs, msks)
    assert not np.array_equal(np.asarray(a1), np.asarray(a3))


def test_classification_augment_contracts() -> None:
    key = jax.random.PRNGKey(0)
    sq = jnp.asarray(np.random.default_rng(2).random((8, 64, 64, 1)), jnp.float32)
    aq = augment_classification_batch(key, sq)
    assert aq.shape == sq.shape
    # content preserved-ish: mean shifts only moderately
    assert abs(float(aq.mean()) - float(sq.mean())) < 0.15


def test_identity_matrices_are_noops() -> None:
    imgs = jnp.asarray(np.random.default_rng(0).random((3, 64, 64)), jnp.float32)
    m0 = _rotation_matrices(jnp.zeros((3,)), 64, 64)
    out = _warp_nhwc(imgs, m0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)
    m1 = _affine_matrices(jnp.zeros((3,)), jnp.zeros((3,)), jnp.ones((3,)), 64, 64)
    out = _warp_nhwc(imgs, m1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)


def test_rotation_moves_content() -> None:
    # 45° is within the two-pass warp's well-conditioned range (augment
    # rotations are ±15°; ~90° is the documented bottleneck, covered by
    # the exact bilinear path)
    img = np.zeros((1, 64, 64), np.float32)
    img[0, 10:20, 40:50] = 1.0
    m = _rotation_matrices(jnp.asarray([45.0]), 64, 64)
    out = np.asarray(_warp_nhwc(jnp.asarray(img), m))
    assert out.sum() > 50  # mass preserved (away from borders)
    assert np.abs(out[0, 10:20, 40:50]).sum() < out.sum() * 0.5  # moved


def test_twopass_matches_bilinear_at_moderate_rotation() -> None:
    """Lock in two-pass accuracy across the rotation range the engine can
    produce (quad ordering bounds it to ~±45°)."""
    from chessvision_tpu.ops.warp import warp_perspective

    # smooth natural-image-like content (blurred noise): white noise has
    # no spatial correlation and exaggerates footprint differences
    rough = np.random.default_rng(0).random((64, 64)).astype(np.float32)
    k = np.ones((3, 3)) / 9.0
    img = rough.copy()
    for _ in range(2):
        img = np.pad(img, 1, mode="edge")
        img = sum(
            img[1 + dy : 65 + dy, 1 + dx : 65 + dx] * k[dy + 1, dx + 1]
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        )
    img = jnp.asarray(img, jnp.float32)
    for ang in [-45.0, -30.0, 0.0, 30.0, 45.0]:
        m = _rotation_matrices(jnp.asarray([ang]), 64, 64)[0]
        a = np.asarray(warp_perspective(img, m, (64, 64), method="twopass"))
        b = np.asarray(warp_perspective(img, m, (64, 64), method="bilinear"))
        # interiors agree to interpolation-footprint differences
        assert np.abs(a - b)[8:-8, 8:-8].mean() < 0.02, ang


def test_classification_cutout_erases_and_preserves_shape() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chessvision_tpu.train.augment import augment_classification_batch

    imgs = jnp.ones((16, 64, 64, 1), jnp.float32) * 0.8
    out = augment_classification_batch(
        jax.random.PRNGKey(0), imgs, photometric=False, cutout=True
    )
    assert out.shape == imgs.shape
    # the geometric warp runs in both calls with the same key, so the
    # cutout=True/False difference isolates the erasing: with p=0.5 over
    # 16 samples some must differ (a filled rectangle) and some must not
    grad = jnp.broadcast_to(jnp.linspace(0, 1, 64)[None, :, None, None], imgs.shape)
    with_cut = augment_classification_batch(
        jax.random.PRNGKey(0), grad, photometric=False, cutout=True
    )
    without = augment_classification_batch(
        jax.random.PRNGKey(0), grad, photometric=False, cutout=False
    )
    changed = np.asarray(jnp.any(jnp.abs(with_cut - without) > 1e-6, axis=(1, 2, 3)))
    assert changed.any() and not changed.all()


def test_illum_gradient_contracts() -> None:
    """The page-gutter illumination gradient (round 5): multiplicative
    ≤ 1 ramp on images only, masks untouched, default-off leaves the
    pre-existing random streams unchanged at a given seed."""
    import numpy as np

    from chessvision_tpu.train.augment import _illum_gradient_batch

    key = jax.random.PRNGKey(5)
    imgs = jax.random.uniform(jax.random.fold_in(key, 1), (8, 32, 32, 3))
    msk = (jax.random.uniform(jax.random.fold_in(key, 2), (8, 32, 32)) > 0.5).astype(
        jnp.float32
    )

    out = _illum_gradient_batch(key, imgs)
    assert out.shape == imgs.shape
    # multiplicative dimming only: never brightens, never goes negative
    assert float(jnp.max(out - imgs)) <= 1e-6
    assert float(jnp.min(out)) >= 0.0
    # some sample in a batch of 8 is dimmed (p=0.3 each, seed-checked)
    assert float(jnp.max(jnp.abs(out - imgs))) > 0.01

    # flag off (default) == previous behavior, bit for bit
    a_img, a_msk = augment_segmentation_batch(key, imgs, msk)
    b_img, b_msk = augment_segmentation_batch(key, imgs, msk, illum_gradient=False)
    np.testing.assert_array_equal(np.asarray(a_img), np.asarray(b_img))
    # masks are never touched by the (photometric) gradient
    c_img, c_msk = augment_segmentation_batch(key, imgs, msk, illum_gradient=True)
    np.testing.assert_array_equal(np.asarray(a_msk), np.asarray(c_msk))


def test_classifier_dim_aug_contracts() -> None:
    """Heavy square dimming (round 5): multiplicative-only on crops,
    default-off leaves the pre-existing streams bit-identical."""
    import numpy as np

    key = jax.random.PRNGKey(9)
    crops = jax.random.uniform(jax.random.fold_in(key, 1), (16, 64, 64, 1))
    a = augment_classification_batch(key, crops)
    b = augment_classification_batch(key, crops, dim=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = augment_classification_batch(key, crops, dim=True)
    assert c.shape == crops.shape
    # dimming happens before the warp/jitter, so compare the dim stage
    # directly: some crops in a batch of 16 are dimmed at p=0.25
    assert float(jnp.max(jnp.abs(np.asarray(c) - np.asarray(a)))) > 0.01
    assert float(jnp.min(c)) >= 0.0


def test_classifier_fade_aug_contracts() -> None:
    """Contrast fade toward paper white (round 5): collapses std while
    keeping the mean near the anchor, stays in [0, 1], default-off leaves
    the pre-existing streams bit-identical."""
    import numpy as np

    key = jax.random.PRNGKey(11)
    crops = jax.random.uniform(jax.random.fold_in(key, 1), (16, 64, 64, 1))
    a = augment_classification_batch(key, crops)
    b = augment_classification_batch(key, crops, fade=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = augment_classification_batch(key, crops, fade=True, photometric=False)
    base = augment_classification_batch(key, crops, photometric=False)
    assert c.shape == crops.shape
    assert float(jnp.min(c)) >= 0.0 and float(jnp.max(c)) <= 1.0
    # some crops in a batch of 16 fade at p=0.25, and a faded crop's
    # contrast shrinks: its std is strictly below its unfaded twin's
    ca, ba = np.asarray(c), np.asarray(base)
    changed = np.abs(ca - ba).max(axis=(1, 2, 3)) > 0.01
    assert changed.any() and not changed.all()
    # compare contrast over the crop interior — the shared random warp
    # (same key) zero-fills borders, which would inflate a faded crop's
    # whole-image std against the lifted interior
    mid = (slice(None), slice(16, 48), slice(16, 48), slice(None))
    assert (
        ca[mid][changed].std(axis=(1, 2, 3)) < ba[mid][changed].std(axis=(1, 2, 3))
    ).all()
