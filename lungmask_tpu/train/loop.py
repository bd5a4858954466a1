"""Fine-tuning driver: ``fit`` = schedule + augment + step + eval + checkpoint.

A capability extension (the reference ships no training code, SURVEY §2.2).
Composes the existing pieces — ``SliceDataset`` batches, ``Augmenter``,
``make_train_step`` (optionally mesh-sharded), ``checkpoint`` — into one
reproducible loop with periodic Dice evaluation and best-state tracking, so
fine-tuning the shipped U-Nets needs one call instead of a hand-rolled loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from lungmask_tpu import metrics
from lungmask_tpu.logger import logger
from lungmask_tpu.models import unet
from lungmask_tpu.train.augment import Augmenter
from lungmask_tpu.train.checkpoint import save_train_state
from lungmask_tpu.train.data import SliceDataset
from lungmask_tpu.train.trainer import TrainState, init_train_state, make_train_step


@dataclass
class FitResult:
    state: TrainState          # final train state
    best_params: Any           # params at the best eval macro-Dice (or final)
    best_dice: float
    history: List[Dict[str, float]] = field(default_factory=list)


def default_optimizer(
    steps: int, peak_lr: float = 1e-4, warmup_frac: float = 0.1,
    weight_decay: float = 1e-5,
) -> optax.GradientTransformation:
    """AdamW under a linear-warmup + cosine-decay schedule — the standard
    fine-tuning recipe; exposed so callers can reuse or replace it."""
    warmup = max(1, int(steps * warmup_frac))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=peak_lr * 1e-2, peak_value=peak_lr,
        warmup_steps=warmup, decay_steps=max(steps, warmup + 1),
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=weight_decay),
    )


_eval_forward = jax.jit(unet.unet_argmax, static_argnames=("compute_dtype",))


def evaluate(params, images: np.ndarray, labels: np.ndarray,
             batch_size: int = 8, compute_dtype=jnp.bfloat16) -> float:
    """Macro Dice of argmax predictions over an eval slice pool.

    images (N,H,W) float32 normalized, labels (N,H,W) int. Runs in
    ``batch_size`` chunks to bound device memory; the tail chunk is padded to
    ``batch_size`` so exactly one program shape compiles per (arch, batch).
    """
    n = images.shape[0]
    preds = []
    for i in range(0, n, batch_size):
        chunk = images[i : i + batch_size][..., None]
        got = chunk.shape[0]
        if got < batch_size:
            chunk = np.concatenate(
                [chunk, np.zeros((batch_size - got,) + chunk.shape[1:],
                                 chunk.dtype)]
            )
        out = _eval_forward(params, jnp.asarray(chunk),
                            compute_dtype=compute_dtype)
        preds.append(np.asarray(out[:got]))
    pred = np.concatenate(preds, axis=0).astype(np.uint8)
    cmp = metrics.compare_masks(pred, labels.astype(np.uint8))
    return float(cmp.macro_dice)


def fit(
    params,
    dataset: SliceDataset,
    *,
    epochs: int = 1,
    batch_size: int = 8,
    optimizer: Optional[optax.GradientTransformation] = None,
    mesh=None,
    augment: Optional[Augmenter] = None,
    eval_pairs: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    eval_every: int = 0,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    seed: int = 0,
    log_every: int = 10,
    compute_dtype=jnp.bfloat16,
    dice_weight: float = 0.5,
    remat: bool = False,
) -> FitResult:
    """Fine-tune ``params`` on ``dataset``.

    * ``eval_pairs`` — (images (N,H,W), labels (N,H,W)) held-out slices;
      evaluated every ``eval_every`` steps (and at the end) with macro Dice;
      the best-scoring params are kept in ``FitResult.best_params``.
    * ``checkpoint_path`` + ``checkpoint_every`` — periodic exact-resume
      snapshots via ``train.checkpoint`` (also written at the end).
    * ``mesh`` — shard batches over a ``data × space`` device mesh.
    """
    n_batches = (len(dataset) // batch_size) * epochs
    if n_batches == 0:
        raise ValueError(
            f"dataset ({len(dataset)} slices) yields no batches at "
            f"batch_size={batch_size}"
        )
    if optimizer is None:
        optimizer = default_optimizer(n_batches)
    step_fn = make_train_step(
        optimizer, mesh=mesh, compute_dtype=compute_dtype,
        dice_weight=dice_weight, remat=remat,
    )
    state = init_train_state(params, optimizer)
    rng = np.random.default_rng(seed)
    history: List[Dict[str, float]] = []
    best_dice, best_params = float("-inf"), None

    def run_eval(step_no: int):
        nonlocal best_dice, best_params
        imgs, lbls = eval_pairs
        d = evaluate(state.params, np.asarray(imgs), np.asarray(lbls),
                     batch_size=batch_size, compute_dtype=compute_dtype)
        history.append({"step": float(step_no), "eval_macro_dice": d})
        logger.info(f"fit step {step_no}: eval macro Dice {d:.4f}")
        if d > best_dice:
            best_dice, best_params = d, state.params

    step_no = 0
    for images, labels in dataset.batches(
        batch_size, seed=seed, epochs=epochs, drop_last=True
    ):
        if augment is not None:
            aug_i, aug_l = augment(images[..., 0], labels, rng)
            images, labels = aug_i[..., None], aug_l
        state, loss = step_fn(
            state, jnp.asarray(images), jnp.asarray(labels)
        )
        step_no += 1
        if log_every and step_no % log_every == 0:
            history.append({"step": float(step_no), "loss": float(loss)})
            logger.info(f"fit step {step_no}/{n_batches}: loss {float(loss):.4f}")
        if eval_pairs is not None and eval_every and step_no % eval_every == 0:
            run_eval(step_no)
        if checkpoint_path and checkpoint_every and step_no % checkpoint_every == 0:
            save_train_state(checkpoint_path, state)

    # final eval/checkpoint, unless the last step already triggered them
    if eval_pairs is not None and not (eval_every and step_no % eval_every == 0):
        run_eval(step_no)
    if checkpoint_path and not (
        checkpoint_every and step_no % checkpoint_every == 0
    ):
        save_train_state(checkpoint_path, state)
    if best_params is None:
        best_dice, best_params = float("nan"), state.params
    return FitResult(
        state=state, best_params=best_params, best_dice=best_dice,
        history=history,
    )
