"""Segmentation quality metrics (Dice, IoU, volume agreement).

The reference's accuracy story lives in its paper (R231 Dice evaluation,
Hofmanninger et al. 2020 — /root/reference/README.md:33-38) but ships no
evaluation code; BASELINE.json names "mask Dice vs ref" as a tracked metric.
This module provides it as part of the framework: per-label overlap metrics
computed in one pass over the volume pair, on device (jit, histogram-based —
no per-label boolean volumes) or on host arrays transparently.

Conventions: label 0 is background and excluded from per-label tables and
averages; a label absent from BOTH volumes scores Dice/IoU 1.0 (perfect
agreement on absence) — masked out of macro averages to keep them meaningful.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_classes",))
def confusion_counts(
    pred: jnp.ndarray, ref: jnp.ndarray, n_classes: int
) -> jnp.ndarray:
    """(n_classes, n_classes) confusion matrix: rows = reference label,
    columns = predicted label. One fused histogram pass — the basis for every
    overlap metric below."""
    pred = pred.reshape(-1).astype(jnp.int32)
    ref = ref.reshape(-1).astype(jnp.int32)
    idx = ref * n_classes + pred
    # int32 bins: a single CT volume holds ≲10⁸ voxels, far under 2³¹ —
    # and jnp.int64 demotes (with a warning) unless x64 is enabled anyway.
    flat = jnp.zeros((n_classes * n_classes,), jnp.int32).at[idx].add(1)
    return flat.reshape(n_classes, n_classes)


@dataclass
class LabelMetrics:
    dice: float
    iou: float
    ref_voxels: int
    pred_voxels: int
    intersection: int

    @property
    def volume_ratio(self) -> float:
        """Predicted / reference voxel count (1.0 = same volume)."""
        if self.ref_voxels == 0:
            return float("inf") if self.pred_voxels else 1.0
        return self.pred_voxels / self.ref_voxels


@dataclass
class MaskComparison:
    per_label: Dict[int, LabelMetrics]
    voxel_accuracy: float
    total_voxels: int

    @property
    def macro_dice(self) -> float:
        """Mean foreground Dice over labels present in either volume."""
        vals = [
            m.dice
            for m in self.per_label.values()
            if m.ref_voxels or m.pred_voxels
        ]
        return float(np.mean(vals)) if vals else 1.0

    @property
    def macro_iou(self) -> float:
        vals = [
            m.iou
            for m in self.per_label.values()
            if m.ref_voxels or m.pred_voxels
        ]
        return float(np.mean(vals)) if vals else 1.0


def compare_masks(
    pred: np.ndarray, ref: np.ndarray, n_classes: Optional[int] = None
) -> MaskComparison:
    """Per-label Dice/IoU/volume metrics between two label volumes.

    Accepts numpy or device arrays of identical shape; the confusion matrix
    is computed on device in one pass and only the (n_classes)² counts come
    back to the host.
    """
    if pred.shape != ref.shape:
        raise ValueError(f"shape mismatch: pred {pred.shape} vs ref {ref.shape}")
    observed = int(max(int(np.max(pred)), int(np.max(ref)))) if pred.size else 0
    lowest = int(min(int(np.min(pred)), int(np.min(ref)))) if pred.size else 0
    if lowest < 0:
        # Negative labels (e.g. -1 padding from a signed mask format) would
        # wrap in the device scatter and count as bogus matches silently.
        raise ValueError(
            f"negative labels present (min {lowest}); masks must be "
            "non-negative label maps"
        )
    if n_classes is None:
        n_classes = observed + 1
    elif observed >= n_classes:
        # JAX drops out-of-bounds scatter updates silently, which would skew
        # voxel_accuracy/total_voxels with no error — fail loudly instead.
        raise ValueError(
            f"n_classes={n_classes} but labels up to {observed} are present; "
            f"pass n_classes >= {observed + 1} (or None to infer)"
        )
    cm = np.asarray(
        confusion_counts(jnp.asarray(pred), jnp.asarray(ref), n_classes)
    ).astype(np.int64)
    per_label: Dict[int, LabelMetrics] = {}
    for v in range(1, n_classes):
        inter = int(cm[v, v])
        ref_n = int(cm[v, :].sum())
        pred_n = int(cm[:, v].sum())
        union = ref_n + pred_n - inter
        per_label[v] = LabelMetrics(
            dice=(2.0 * inter / (ref_n + pred_n)) if (ref_n + pred_n) else 1.0,
            iou=(inter / union) if union else 1.0,
            ref_voxels=ref_n,
            pred_voxels=pred_n,
            intersection=inter,
        )
    total = int(cm.sum())
    correct = int(np.trace(cm))
    return MaskComparison(
        per_label=per_label,
        voxel_accuracy=correct / total if total else 1.0,
        total_voxels=total,
    )


def dice(pred: np.ndarray, ref: np.ndarray) -> float:
    """Binary Dice of ``pred > 0`` vs ``ref > 0`` (lung-vs-background overlap
    regardless of laterality/lobe labels)."""
    cmp = compare_masks(
        (np.asarray(pred) > 0).astype(np.uint8),
        (np.asarray(ref) > 0).astype(np.uint8),
        n_classes=2,
    )
    return cmp.per_label[1].dice
