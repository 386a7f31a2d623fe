"""Model zoo tests: shapes, registry contracts, checkpoint round-trips,
and torch-layer conversion numerics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chessvision_tpu import models
from chessvision_tpu import checkpoint as ckpt


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


def test_unet_shapes(key) -> None:
    model = models.UNet(dtype=jnp.float32)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(key, x)
    y = model.apply(variables, x)
    assert y.shape == (1, 256, 256, 1)
    assert y.dtype == jnp.float32
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # milesial UNet(3→1, transposed-conv): ~31M parameters
    assert 30_000_000 < n_params < 32_000_000, n_params


def test_unet_bilinear_shapes(key) -> None:
    model = models.UNet(bilinear=True, dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(key, x)
    y = model.apply(variables, x)
    assert y.shape == (1, 128, 128, 1)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    assert 17_000_000 < n_params < 18_000_000, n_params


def test_resnet18_shapes(key) -> None:
    model = models.resnet18(dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 1), jnp.float32)
    variables = model.init(key, x)
    y = model.apply(variables, x)
    assert y.shape == (2, 13)
    logits, feats = model.apply(variables, x, return_features=True)
    assert feats.shape == (2, 512)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # resnet18 with 1-chan stem and 13-class fc
    assert 11_000_000 < n_params < 11_400_000, n_params


def test_yolo_cls_shapes(key) -> None:
    model = models.YoloCls(dtype=jnp.float32)
    x = jnp.zeros((4, 64, 64, 1), jnp.float32)
    variables = model.init(key, x)
    y = model.apply(variables, x)
    assert y.shape == (4, 13)


def test_yolo_seg_shapes(key) -> None:
    model = models.YoloSeg(dtype=jnp.float32)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(key, x)
    y = model.apply(variables, x)
    assert y.shape == (1, 256, 256, 1)


def test_registry_contracts() -> None:
    m, spec = models.create_extractor(None, dtype=jnp.float32)
    assert isinstance(m, models.UNet) and spec.input_size == (256, 256)
    m, spec = models.create_extractor("yolo", dtype=jnp.float32)
    assert isinstance(m, models.YoloSeg)
    m, spec = models.create_classifier("yolo", dtype=jnp.float32)
    assert isinstance(m, models.YoloCls) and spec.outputs_probabilities
    m, spec = models.create_classifier("resnet18", dtype=jnp.float32)
    assert isinstance(m, models.ResNet) and not spec.outputs_probabilities
    with pytest.raises(KeyError):
        models.create_extractor("nope")


def test_checkpoint_roundtrip(tmp_path, key) -> None:
    model = models.YoloCls(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    variables = jax.tree.map(np.asarray, dict(model.init(key, x)))
    meta = {"best_val_score": 0.99, "epoch": 3, "model_id": "yolo"}
    path = tmp_path / "ck.npz"
    ckpt.save_checkpoint(path, variables, meta)
    loaded, meta2 = ckpt.load_checkpoint(path)
    assert meta2 == meta
    flat_a = ckpt._flatten(variables)
    flat_b = ckpt._flatten(loaded)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


# --- torch layer conversion numerics -----------------------------------------

torch = pytest.importorskip("torch")


def test_conv_kernel_conversion() -> None:
    tconv = torch.nn.Conv2d(3, 8, 3, padding=1, bias=False)
    x = torch.randn(1, 3, 16, 16)
    want = tconv(x).detach().numpy()

    from flax import linen as nn

    fconv = nn.Conv(8, (3, 3), padding=1, use_bias=False)
    kernel = ckpt._conv_kernel(tconv.weight.detach().numpy())
    got = fconv.apply({"params": {"kernel": kernel}}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_convtranspose_kernel_conversion() -> None:
    tct = torch.nn.ConvTranspose2d(6, 3, 2, stride=2)
    x = torch.randn(1, 6, 8, 8)
    want = tct(x).detach().numpy()

    from flax import linen as nn

    fct = nn.ConvTranspose(3, (2, 2), strides=(2, 2))
    kernel = ckpt._convtranspose_kernel(tct.weight.detach().numpy())
    params = {"kernel": kernel, "bias": tct.bias.detach().numpy()}
    got = fct.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_torch_unet_checkpoint_ingestion(tmp_path, key) -> None:
    """Build a synthetic milesial-layout state dict shaped for UNet(3,1),
    convert, and run the Flax UNet with it."""
    model = models.UNet(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(key, x)

    def dc_entries(prefix, cin, cmid, cout):
        return {
            f"{prefix}.0.weight": torch.randn(cmid, cin, 3, 3),
            f"{prefix}.1.weight": torch.randn(cmid),
            f"{prefix}.1.bias": torch.randn(cmid),
            f"{prefix}.1.running_mean": torch.randn(cmid),
            f"{prefix}.1.running_var": torch.rand(cmid) + 0.5,
            f"{prefix}.3.weight": torch.randn(cout, cmid, 3, 3),
            f"{prefix}.4.weight": torch.randn(cout),
            f"{prefix}.4.bias": torch.randn(cout),
            f"{prefix}.4.running_mean": torch.randn(cout),
            f"{prefix}.4.running_var": torch.rand(cout) + 0.5,
        }

    sd = {}
    sd.update(dc_entries("inc.double_conv", 3, 64, 64))
    chans = [(64, 128), (128, 256), (256, 512), (512, 1024)]
    for k, (ci, co) in enumerate(chans, 1):
        sd.update(dc_entries(f"down{k}.maxpool_conv.1.double_conv", ci, co, co))
    up_chans = [(1024, 512), (512, 256), (256, 128), (128, 64)]
    for k, (ci, co) in enumerate(up_chans, 1):
        sd[f"up{k}.up.weight"] = torch.randn(ci, ci // 2, 2, 2)
        sd[f"up{k}.up.bias"] = torch.randn(ci // 2)
        sd.update(dc_entries(f"up{k}.conv.double_conv", ci, co, co))
    sd["outc.conv.weight"] = torch.randn(1, 64, 1, 1)
    sd["outc.conv.bias"] = torch.randn(1)

    path = tmp_path / "ref.pth"
    torch.save({"model_state_dict": sd, "metadata": {"best_val_score": 0.97}}, path)

    converted, meta = ckpt.load_checkpoint(path)
    assert meta["best_val_score"] == 0.97
    # identical tree structure to a fresh init
    want_flat = set(ckpt._flatten(dict(variables)))
    got_flat = set(ckpt._flatten(converted))
    assert want_flat == got_flat, want_flat ^ got_flat
    y = model.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        jnp.ones((1, 64, 64, 3), jnp.float32),
    )
    assert y.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(y)).all()
