"""Offline weight conversion: PyTorch ``.pth`` state dicts → JAX pytrees / ``.npz``.

The reference ships three pretrained checkpoints whose state dicts follow the
torch module naming of its U-Net (/root/reference/lungmask/resunet.py). This
module converts them once into a flat ``.npz`` (plus alias resolution) that the
TPU framework loads without any torch dependency at inference time.

Conversion rules:

* Conv kernels transpose OIHW → HWIO (TPU-native layout).
* Inference-mode BatchNorm folds into a per-channel affine:
  ``scale = gamma / sqrt(running_var + eps)``, ``bias = beta - running_mean * scale``
  (eps = 1e-5, the torch default). The reference always runs ``eval()``
  (/root/reference/lungmask/mask.py:67), so this is exact.
* The checkpoints contain dead ``residual_input_conv`` / ``residual_batchnorm``
  tensors that are never executed in the production (non-residual) config
  (/root/reference/lungmask/resunet.py:81-82,125-126; SURVEY §2 rows 8-9).
  They are deliberately dropped.
* ``n_classes`` is inferred from the final conv bias — the last tensor of the
  state dict — exactly like the reference (/root/reference/lungmask/mask.py:56),
  so a custom checkpoint always wins over the registry's class count.

Torch state-dict key layout in the production config (batch_norm=True,
residual=False, up_mode='upsample'); ``block`` indices come from the
nn.Sequential assembled at /root/reference/lungmask/resunet.py:86-106:

    down_path.{i}.block.0.{weight,bias}              conv1 (3×3)
    down_path.{i}.block.2.{weight,bias,running_*}    bn1
    down_path.{i}.block.3.{weight,bias}              conv2 (3×3)
    down_path.{i}.block.5.{weight,bias,running_*}    bn2
    up_path.{i}.up.1.{weight,bias}                   1×1 projection after Upsample
    up_path.{i}.conv_block.block.{0,2,3,5}.*         as in down blocks
    last.{weight,bias}                               1×1 classifier
"""

from __future__ import annotations

import json
from typing import Any, Dict, Mapping, Tuple

import numpy as np

from lungmask_tpu.models.unet import BN_EPS, DEPTH

Params = Dict[str, Any]


def _to_numpy(t) -> np.ndarray:
    """Accepts torch tensors or numpy arrays without importing torch eagerly."""
    if isinstance(t, np.ndarray):
        return t
    # torch.Tensor duck-typing: .detach().cpu().numpy()
    return t.detach().cpu().numpy()


def _conv(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    w = _to_numpy(sd[prefix + ".weight"]).astype(np.float32)
    b = _to_numpy(sd[prefix + ".bias"]).astype(np.float32)
    return {"w": np.transpose(w, (2, 3, 1, 0)), "b": b}  # OIHW → HWIO


def _folded_bn(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    gamma = _to_numpy(sd[prefix + ".weight"]).astype(np.float64)
    beta = _to_numpy(sd[prefix + ".bias"]).astype(np.float64)
    mean = _to_numpy(sd[prefix + ".running_mean"]).astype(np.float64)
    var = _to_numpy(sd[prefix + ".running_var"]).astype(np.float64)
    scale = gamma / np.sqrt(var + BN_EPS)
    bias = beta - mean * scale
    return {"scale": scale.astype(np.float32), "bias": bias.astype(np.float32)}


def _conv_block(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "conv1": _conv(sd, prefix + ".block.0"),
        "bn1": _folded_bn(sd, prefix + ".block.2"),
        "conv2": _conv(sd, prefix + ".block.3"),
        "bn2": _folded_bn(sd, prefix + ".block.5"),
    }


def convert_state_dict(state_dict: Mapping[str, Any], depth: int = DEPTH) -> Params:
    """Torch state dict (production U-Net config) → JAX parameter pytree."""
    down = [_conv_block(state_dict, f"down_path.{i}") for i in range(depth)]
    up = [
        {
            "proj": _conv(state_dict, f"up_path.{i}.up.1"),
            "conv_block": _conv_block(state_dict, f"up_path.{i}.conv_block"),
        }
        for i in range(depth - 1)
    ]
    last = _conv(state_dict, "last")
    return {"down": down, "up": up, "last": last}


def infer_n_classes(state_dict: Mapping[str, Any]) -> int:
    """len() of the last state-dict tensor (the final conv bias) — reference
    semantics at /root/reference/lungmask/mask.py:56."""
    last_value = list(state_dict.values())[-1]
    return len(_to_numpy(last_value))


def load_pth_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.pth`` checkpoint into numpy arrays (requires torch,
    conversion-time only)."""
    import torch  # local import: torch is a converter dependency, not a runtime one

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _to_numpy(v) for k, v in sd.items()}


def convert_pth(path: str) -> Tuple[Params, int]:
    """Convert a reference ``.pth`` checkpoint file. Returns (params, n_classes)."""
    sd = load_pth_state_dict(path)
    return convert_state_dict(sd), infer_n_classes(sd)


def torch_available() -> bool:
    """Whether .pth conversion is possible in this environment."""
    try:
        import torch  # noqa: F401

        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Flat (de)serialization to .npz
# ---------------------------------------------------------------------------


def flatten_params(params: Params) -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}

    def add(prefix: str, tree) -> None:
        if isinstance(tree, dict):
            for k, v in tree.items():
                add(f"{prefix}.{k}" if prefix else k, v)
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                add(f"{prefix}.{i}", v)
        else:
            flat[prefix] = np.asarray(tree)

    add("", params)
    return flat


def unflatten_params(flat: Mapping[str, np.ndarray]) -> Params:
    depth_down = 1 + max(
        int(k.split(".")[1]) for k in flat if k.startswith("down.")
    )
    depth_up = 1 + max(int(k.split(".")[1]) for k in flat if k.startswith("up."))

    def conv(prefix):
        return {"w": np.asarray(flat[prefix + ".w"]), "b": np.asarray(flat[prefix + ".b"])}

    def affine(prefix):
        return {
            "scale": np.asarray(flat[prefix + ".scale"]),
            "bias": np.asarray(flat[prefix + ".bias"]),
        }

    def conv_block(prefix):
        return {
            "conv1": conv(prefix + ".conv1"),
            "bn1": affine(prefix + ".bn1"),
            "conv2": conv(prefix + ".conv2"),
            "bn2": affine(prefix + ".bn2"),
        }

    return {
        "down": [conv_block(f"down.{i}") for i in range(depth_down)],
        "up": [
            {"proj": conv(f"up.{i}.proj"), "conv_block": conv_block(f"up.{i}.conv_block")}
            for i in range(depth_up)
        ],
        "last": conv("last"),
    }


def save_npz(path: str, params: Params, meta: Dict[str, Any] | None = None) -> None:
    flat = flatten_params(params)
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode("utf-8"), dtype=np.uint8
    )
    np.savez(path, **flat)


def load_npz(path: str) -> Tuple[Params, Dict[str, Any]]:
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files if k != "__meta__"}
        meta = (
            json.loads(bytes(data["__meta__"]).decode("utf-8"))
            if "__meta__" in data.files
            else {}
        )
    return unflatten_params(flat), meta
