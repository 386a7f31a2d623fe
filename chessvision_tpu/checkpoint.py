"""Checkpoint save/load.

Native format: a flat ``.npz`` of the Flax variable tree (params +
batch_stats) with a JSON metadata entry — the analogue of the reference's
``{model_state_dict, metadata}`` torch checkpoints (reference
train_unet.py:31-40, utils.py:42-86).  Best-checkpoint-by-val-metric policy
lives in the trainers; this module is pure serialization.

For parity testing the loader also ingests the reference's ``.pth``
layouts (milesial UNet and timm resnet18 state dicts, any of the four
wrapper formats utils.py:57-80) and converts torch NCHW/OIHW tensors to
Flax NHWC/HWIO.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import numpy as np

Metadata = dict[str, Any]
VariableTree = dict[str, Any]

_META_KEY = "__metadata__"


def _flatten(tree: dict[str, Any], prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> dict[str, Any]:
    tree: dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_checkpoint(
    path: str | Path,
    variables: VariableTree,
    metadata: Metadata | None = None,
    opt_state: Any = None,
) -> None:
    """Save a Flax variable tree ({'params': ..., 'batch_stats': ...}) with
    metadata to ``path`` (.npz).  ``opt_state`` (any pytree) is stored
    under 'opt_state/' for resumable training — the analogue of the
    reference classifier checkpoints' optimizer_state_dict
    (train_classifier.py:114-125); strip with strip_checkpoint()."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tree = {k: v for k, v in variables.items()}
    if opt_state is not None:
        import jax

        leaves = jax.tree.leaves(opt_state)
        tree["opt_state"] = {f"leaf{i:04d}": np.asarray(l) for i, l in enumerate(leaves)}
    flat = _flatten(tree)
    flat[_META_KEY] = np.frombuffer(
        json.dumps(metadata or {}).encode("utf-8"), dtype=np.uint8
    )
    np.savez(path, **flat)


def load_opt_state_leaves(variables: VariableTree) -> list[np.ndarray] | None:
    """Extract saved optimizer leaves (restore with
    jax.tree.unflatten(treedef, leaves) against a freshly built state)."""
    opt = variables.get("opt_state")
    if not opt:
        return None
    return [opt[k] for k in sorted(opt)]


def promote_checkpoint(src: str | Path, dest: str | Path, compress: bool = True) -> Path:
    """Copy a training checkpoint to a weights/ path, dropping optimizer
    state and (optionally) storing float params as float16 — a ~2×
    smaller distribution artifact; loaders upcast to float32.  BatchNorm
    running stats stay float32.  If the trainer stored an EMA view
    (``ema_params``, see --ema-decay), that is what ships as ``params``
    — the raw trajectory stays behind in the training checkpoint."""
    variables, metadata = load_checkpoint(src)
    variables.pop("opt_state", None)
    ema = variables.pop("ema_params", None)
    if ema is not None:
        variables["params"] = ema
    if compress:
        def shrink(tree):
            return {
                k: shrink(v) if isinstance(v, dict) else (
                    v.astype(np.float16) if np.asarray(v).dtype == np.float32 else v
                )
                for k, v in tree.items()
            }

        variables["params"] = shrink(variables["params"])
    save_checkpoint(dest, variables, metadata)
    return Path(dest)


def strip_checkpoint(path: str | Path, out_path: str | Path | None = None) -> Path:
    """Remove optimizer state from a checkpoint (the reference's
    strip_optimizer.py:15-47)."""
    path = Path(path)
    variables, metadata = load_checkpoint(path)
    variables.pop("opt_state", None)
    out = Path(out_path or path)
    save_checkpoint(out, variables, metadata)
    return out


def load_metadata(path: str | Path) -> Metadata:
    """Read only a checkpoint's metadata dict (empty if absent).  For .npz
    this touches just the metadata member — npz loads lazily per array —
    so callers can inspect training_config (architecture, epoch) without
    materializing the weights."""
    path = Path(path)
    if path.suffix in (".pth", ".pt"):
        return load_torch_checkpoint(path)[1]
    with np.load(path, allow_pickle=False) as data:
        if _META_KEY not in data.files:
            return {}
        return json.loads(bytes(data[_META_KEY].tolist()).decode("utf-8"))


def load_checkpoint(path: str | Path) -> tuple[VariableTree, Metadata]:
    """Load a checkpoint.  Dispatches on extension: .npz native, .pth/.pt
    torch (reference formats)."""
    path = Path(path)
    if path.suffix in (".pth", ".pt"):
        return load_torch_checkpoint(path)
    with np.load(path, allow_pickle=False) as data:
        flat = {}
        for k in data.files:
            if k == _META_KEY:
                continue
            v = data[k]
            # float16 is a storage format (promote_checkpoint); compute in f32
            flat[k] = v.astype(np.float32) if v.dtype == np.float16 else v
        metadata: Metadata = {}
        if _META_KEY in data.files:
            metadata = json.loads(bytes(data[_META_KEY].tolist()).decode("utf-8"))
    return _unflatten(flat), metadata


# --- torch .pth ingestion -----------------------------------------------------


def _torch_state_dict(path: Path) -> tuple[dict[str, np.ndarray], Metadata]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    metadata: Metadata = {}
    if isinstance(obj, dict):
        # reference wrapper formats (utils.py:57-80)
        for key in ("model_state_dict", "state_dict", "model"):
            if key in obj:
                metadata = {k: v for k, v in obj.get("metadata", {}).items() if _jsonable(v)}
                obj = obj[key]
                break
    state = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v) for k, v in obj.items()}
    return state, metadata


def _jsonable(v: Any) -> bool:
    try:
        json.dumps(v)
        return True
    except (TypeError, ValueError):
        return False


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    # torch OIHW → flax HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _convtranspose_kernel(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d weight is (in, out, kH, kW) → flax (kH, kW, in, out),
    # spatially flipped (torch CT places the kernel as the gradient of conv;
    # flax ConvTranspose correlates) — for the 2×2 stride-2 kernels used here
    # the flip is what makes outputs match (verified in tests vs torch).
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def _bn_entries(state: dict[str, np.ndarray], torch_prefix: str) -> tuple[dict, dict]:
    params = {
        "scale": state[f"{torch_prefix}.weight"],
        "bias": state[f"{torch_prefix}.bias"],
    }
    stats = {
        "mean": state[f"{torch_prefix}.running_mean"],
        "var": state[f"{torch_prefix}.running_var"],
    }
    return params, stats


def _convert_double_conv(state: dict[str, np.ndarray], torch_prefix: str) -> tuple[dict, dict]:
    """milesial DoubleConv: Sequential(conv, bn, relu, conv, bn, relu) at
    indices 0,1,3,4."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    params["conv1"] = {"kernel": _conv_kernel(state[f"{torch_prefix}.0.weight"])}
    params["bn1"], stats["bn1"] = _bn_entries(state, f"{torch_prefix}.1")
    params["conv2"] = {"kernel": _conv_kernel(state[f"{torch_prefix}.3.weight"])}
    params["bn2"], stats["bn2"] = _bn_entries(state, f"{torch_prefix}.4")
    return params, stats


def convert_unet_state_dict(state: dict[str, np.ndarray]) -> VariableTree:
    """milesial UNet .pth state dict → Flax UNet variable tree."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    params["inc"], stats["inc"] = _convert_double_conv(state, "inc.double_conv")
    for k in range(1, 5):
        p, s = _convert_double_conv(state, f"down{k}.maxpool_conv.1.double_conv")
        params[f"down{k}"] = {"conv": p}
        stats[f"down{k}"] = {"conv": s}
    bilinear = "up1.up.weight" not in state
    for k in range(1, 5):
        p, s = _convert_double_conv(state, f"up{k}.conv.double_conv")
        up_p: dict[str, Any] = {"conv": p}
        if not bilinear:
            up_p["up"] = {
                "kernel": _convtranspose_kernel(state[f"up{k}.up.weight"]),
                "bias": state[f"up{k}.up.bias"],
            }
        params[f"up{k}"] = up_p
        stats[f"up{k}"] = {"conv": s}
    params["outc"] = {
        "kernel": _conv_kernel(state["outc.conv.weight"]),
        "bias": state["outc.conv.bias"],
    }
    return {"params": params, "batch_stats": stats}


def convert_resnet_state_dict(state: dict[str, np.ndarray]) -> VariableTree:
    """timm/torchvision resnet18 state dict → Flax ResNet variable tree."""
    params: dict[str, Any] = {"conv1": {"kernel": _conv_kernel(state["conv1.weight"])}}
    stats: dict[str, Any] = {}
    params["bn1"], stats["bn1"] = _bn_entries(state, "bn1")
    for i in range(1, 5):
        nblocks = 2
        for j in range(nblocks):
            tp = f"layer{i}.{j}"
            name = f"layer{i}_{j}"
            p: dict[str, Any] = {
                "conv1": {"kernel": _conv_kernel(state[f"{tp}.conv1.weight"])},
                "conv2": {"kernel": _conv_kernel(state[f"{tp}.conv2.weight"])},
            }
            s: dict[str, Any] = {}
            p["bn1"], s["bn1"] = _bn_entries(state, f"{tp}.bn1")
            p["bn2"], s["bn2"] = _bn_entries(state, f"{tp}.bn2")
            if f"{tp}.downsample.0.weight" in state:
                p["down_conv"] = {"kernel": _conv_kernel(state[f"{tp}.downsample.0.weight"])}
                p["down_bn"], s["down_bn"] = _bn_entries(state, f"{tp}.downsample.1")
            params[name] = p
            stats[name] = s
    params["fc"] = {"kernel": state["fc.weight"].T, "bias": state["fc.bias"]}
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str | Path) -> tuple[VariableTree, Metadata]:
    """Load a reference .pth checkpoint, auto-detecting UNet vs ResNet."""
    state, metadata = _torch_state_dict(Path(path))
    if any(k.startswith("inc.") for k in state):
        return convert_unet_state_dict(state), metadata
    if "conv1.weight" in state and "layer1.0.conv1.weight" in state:
        return convert_resnet_state_dict(state), metadata
    raise ValueError(f"Unrecognized torch checkpoint layout: {sorted(state)[:5]} ...")
