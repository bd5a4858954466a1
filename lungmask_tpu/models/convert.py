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
import os
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
    """Non-residual, batch_norm=True block (the production layout)."""
    return {
        "conv1": _conv(sd, prefix + ".block.0"),
        "bn1": _folded_bn(sd, prefix + ".block.2"),
        "conv2": _conv(sd, prefix + ".block.3"),
        "bn2": _folded_bn(sd, prefix + ".block.5"),
    }


def _res_path(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """The residual 1×1-conv + BN skip path (resunet.py:81-82,107-114) — used
    (not dead) when residual=True, since in/out widths differ at every level."""
    return {
        "conv": _conv(sd, prefix + ".residual_input_conv"),
        "bn": _folded_bn(sd, prefix + ".residual_batchnorm"),
    }


def _res_conv_block(sd: Mapping[str, Any], prefix: str, first: bool) -> Dict[str, Any]:
    """Residual, batch_norm=True block. Pre-activation nn.Sequential layout
    (resunet.py:86-106): first block [Conv,ReLU,BN,Conv] → indices 0/2/3;
    later blocks [ReLU,BN,Conv,ReLU,BN,Conv] → indices 1/2/4/5."""
    if first:
        block = {
            "conv1": _conv(sd, prefix + ".block.0"),
            "bn1": _folded_bn(sd, prefix + ".block.2"),
            "conv2": _conv(sd, prefix + ".block.3"),
        }
    else:
        block = {
            "bn_pre": _folded_bn(sd, prefix + ".block.1"),
            "conv1": _conv(sd, prefix + ".block.2"),
            "bn1": _folded_bn(sd, prefix + ".block.4"),
            "conv2": _conv(sd, prefix + ".block.5"),
        }
    block["res"] = _res_path(sd, prefix)
    return block


def detect_config(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Infer (depth, residual, up_mode) from a reference-layout state dict.

    * depth: number of ``down_path.{i}`` modules.
    * residual: in the residual layout the non-first down blocks start with
      ReLU (no parameters at ``block.0``), so ``down_path.1.block.0.weight``
      exists iff residual=False (resunet.py:86-106).
    * up_mode: 'upconv' stores the transposed conv directly at
      ``up_path.0.up.weight``; 'upsample' wraps Upsample+Conv2d in a
      Sequential → ``up_path.0.up.1.weight`` (resunet.py:128-133).

    Only batch_norm=True checkpoints are supported (all shipped checkpoints
    are); a BN-less layout raises with a clear message.
    """
    depth = 1 + max(
        int(k.split(".")[1]) for k in state_dict if k.startswith("down_path.")
    )
    if depth < 2:
        raise ValueError("state dict has fewer than 2 encoder levels")
    residual = "down_path.1.block.0.weight" not in state_dict
    up_mode = "upconv" if "up_path.0.up.weight" in state_dict else "upsample"
    bn_probe = "down_path.1.block.4.running_mean" if residual else (
        "down_path.1.block.2.running_mean"
    )
    if bn_probe not in state_dict:
        raise NotImplementedError(
            "batch_norm=False checkpoints are not supported (all reference "
            "checkpoints use batch_norm=True)"
        )
    return {"depth": depth, "residual": residual, "up_mode": up_mode}


def convert_state_dict(state_dict: Mapping[str, Any], depth: int | None = None) -> Params:
    """Torch state dict (any reference U-Net config with batch_norm=True) →
    JAX parameter pytree. The variant (residual / up_mode) is auto-detected
    and encoded *structurally* in the pytree (``res`` / ``bn_pre`` /
    ``upconv`` keys), so the forward pass needs no side-channel config."""
    cfg = detect_config(state_dict)
    if depth is not None and depth != cfg["depth"]:
        raise ValueError(f"depth mismatch: requested {depth}, found {cfg['depth']}")
    depth = cfg["depth"]

    if cfg["residual"]:
        down = [
            _res_conv_block(state_dict, f"down_path.{i}", first=(i == 0))
            for i in range(depth)
        ]
    else:
        down = [_conv_block(state_dict, f"down_path.{i}") for i in range(depth)]

    up = []
    for i in range(depth - 1):
        if cfg["up_mode"] == "upconv":
            # ConvTranspose2d weight is (in, out, kh, kw) → (kh, kw, in, out).
            w = _to_numpy(state_dict[f"up_path.{i}.up.weight"]).astype(np.float32)
            b = _to_numpy(state_dict[f"up_path.{i}.up.bias"]).astype(np.float32)
            block = {"upconv": {"w": np.transpose(w, (2, 3, 0, 1)), "b": b}}
        else:
            block = {"proj": _conv(state_dict, f"up_path.{i}.up.1")}
        # In residual mode the up block's inner conv block is the standard
        # non-residual one (resunet.py:134 passes residual=False implicitly);
        # the residual path wraps the whole block instead (resunet.py:149-153).
        block["conv_block"] = _conv_block(state_dict, f"up_path.{i}.conv_block")
        if cfg["residual"]:
            block["res"] = _res_path(state_dict, f"up_path.{i}")
        up.append(block)

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
    """Inverse of :func:`flatten_params` for any pytree of dicts/lists —
    fully generic so variant pytrees (``res`` / ``bn_pre`` / ``upconv`` keys)
    round-trip unchanged. Dot-separated path components that are all-digit
    become list indices."""
    nested: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = nested
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = np.asarray(value)

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [listify(node[str(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(nested)


def save_npz(path: str, params: Params, meta: Dict[str, Any] | None = None) -> None:
    flat = flatten_params(params)
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode("utf-8"), dtype=np.uint8
    )
    # Atomic write (tmp + rename), mirroring the .pth download: the registry
    # cache can be shared (multi-host pods with a common home dir) and a
    # crash mid-save must not leave a truncated .npz that poisons every
    # subsequent load.
    tmp = path + ".part"
    np.savez(tmp, **flat)
    saved = tmp if os.path.exists(tmp) else tmp + ".npz"  # savez may append
    os.replace(saved, path)


def load_npz(path: str) -> Tuple[Params, Dict[str, Any]]:
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files if k != "__meta__"}
        meta = (
            json.loads(bytes(data["__meta__"]).decode("utf-8"))
            if "__meta__" in data.files
            else {}
        )
    return unflatten_params(flat), meta
