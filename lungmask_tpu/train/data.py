"""Fine-tuning data pipeline: (volume, mask) pairs → shuffled 256² slice batches.

A capability extension (the reference ships no training code and only a dead
``torch.utils.data.Dataset`` import, /root/reference/lungmask/utils.py:12;
SURVEY §2.2). Slices go through the SAME preprocessing as inference —
HU clip, body-crop box, scipy-exact bilinear resize to 256², intensity
normalization — and the label masks ride the same boxes with nearest-neighbor
resampling, so fine-tuned models see exactly the inference-time distribution.
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from lungmask_tpu.ops import resample
from lungmask_tpu.transforms import preprocess as prep

Pair = Tuple[np.ndarray, np.ndarray]  # (HU volume (N,H,W), label mask (N,H,W))


def slices_from_pair(
    volume: np.ndarray, mask: np.ndarray, resolution=(256, 256)
) -> Tuple[np.ndarray, np.ndarray]:
    """One volume/mask pair → (images (N,256,256) f32, labels (N,256,256) i32)."""
    if volume.shape != mask.shape:
        raise ValueError(f"volume {volume.shape} vs mask {mask.shape}")
    normalized, boxes = prep.preprocess(volume, resolution=resolution)
    n = volume.shape[0]
    images = np.asarray(normalized)[:n]
    label_plan = resample.crop_resize_plan(boxes, resolution, order=0)
    labels = np.asarray(
        resample.apply_crop_resize(jnp.asarray(mask.astype(np.int32)), label_plan)
    ).astype(np.int32)
    return images.astype(np.float32), labels


def iter_shuffled_batches(
    n: int,
    batch_size: int,
    gather,
    *,
    seed: int = 0,
    epochs: int = 1,
    drop_last: bool = True,
    what: str = "dataset",
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Shared shuffle/epoch/drop_last loop for slice pools (``SliceDataset``
    and the memmap ``SliceStore`` differ only in how a batch is gathered).
    ``gather(idx)`` maps an index array to the yielded batch."""
    rng = np.random.default_rng(seed)
    if drop_last and n < batch_size:
        raise ValueError(
            f"batch_size={batch_size} exceeds the {what} ({n} slices); "
            "every epoch would yield zero batches — lower batch_size or "
            "pass drop_last=False"
        )
    for _ in range(epochs):
        order = rng.permutation(n)
        stop = n - (n % batch_size) if drop_last else n
        for i in range(0, stop, batch_size):
            yield gather(order[i : i + batch_size])


class SliceDataset:
    """In-memory pool of preprocessed slices with shuffled batch iteration."""

    def __init__(self, pairs: Sequence[Pair], resolution=(256, 256)):
        images, labels = [], []
        for vol, mask in pairs:
            im, lb = slices_from_pair(np.asarray(vol), np.asarray(mask), resolution)
            images.append(im)
            labels.append(lb)
        self.images = np.concatenate(images, axis=0)
        self.labels = np.concatenate(labels, axis=0)

    def __len__(self) -> int:
        return self.images.shape[0]

    def batches(
        self, batch_size: int, *, seed: int = 0, epochs: int = 1, drop_last: bool = True
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yields (images (B,256,256,1) f32, labels (B,256,256) i32)."""
        return iter_shuffled_batches(
            len(self),
            batch_size,
            lambda idx: (self.images[idx][..., None], self.labels[idx]),
            seed=seed,
            epochs=epochs,
            drop_last=drop_last,
            what="dataset",
        )
