"""Training checkpoint/resume: TrainState ↔ ``.npz``.

Extends the framework's weight store (models/convert — inference weights) to
full fine-tuning state: parameters, optimizer state, and step counter
round-trip through one flat ``.npz`` via generic pytree flattening, so an
interrupted fine-tune resumes exactly (SURVEY §5 'checkpoint/resume': the
reference only has pretrained-weight caching; training is this framework's
extension).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from lungmask_tpu.train.trainer import TrainState


def _normalize(path: str) -> str:
    """np.savez appends '.npz' to extensionless paths; normalize on both the
    save and load side so the same string round-trips."""
    return path if path.endswith(".npz") else path + ".npz"


def save_train_state(path: str, state: TrainState, meta: Dict[str, Any] | None = None) -> None:
    path = _normalize(path)
    flat = {
        f"leaf{i:05d}": np.asarray(x)
        for i, x in enumerate(jax.tree_util.tree_leaves(state))
    }
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode("utf-8"), dtype=np.uint8
    )
    np.savez(path, **flat)


def load_train_state(path: str, template: TrainState) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore a state saved by :func:`save_train_state`.

    ``template`` supplies the pytree structure (build it with
    ``init_train_state`` using the same model/optimizer configuration).
    """
    path = _normalize(path)
    with np.load(path) as data:
        meta = (
            json.loads(bytes(data["__meta__"]).decode("utf-8"))
            if "__meta__" in data.files
            else {}
        )
        leaves = [data[k] for k in sorted(data.files) if k.startswith("leaf")]
    treedef = jax.tree_util.tree_structure(template)
    n_expected = len(jax.tree_util.tree_leaves(template))
    if len(leaves) != n_expected:
        raise ValueError(
            f"{path}: checkpoint has {len(leaves)} leaves, template expects "
            f"{n_expected} — model/optimizer configuration mismatch"
        )
    restored = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(x) for x in leaves]
    )
    return restored, meta
