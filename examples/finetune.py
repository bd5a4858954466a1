#!/usr/bin/env python
"""Fine-tune a lungmask U-Net on your own (volume, mask) pairs.

Pairs of ``.nii.gz`` volumes/label masks in a directory —
``case0.nii.gz`` + ``case0_mask.nii.gz`` etc. The last pair is held out
for macro-Dice evaluation; the best-scoring parameters are saved.

    python examples/finetune.py DATA_DIR OUT_WEIGHTS.npz [--epochs N] [--model R231|/path.npz]

The loop shards batches over all local devices (data × space mesh) and
checkpoints full training state next to OUT_WEIGHTS for exact resume.
"""

import argparse
import glob
import os

import numpy as np

from lungmask_tpu.io import load_input_image
from lungmask_tpu.models import convert, registry
from lungmask_tpu.parallel import make_mesh
from lungmask_tpu.train import Augmenter, fit
from lungmask_tpu.train.data import SliceDataset, slices_from_pair


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("data_dir")
    ap.add_argument("out_path")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--model", default="R231",
                    help="warm-start weights: registry name or .npz/.pth path")
    ap.add_argument("--resolution", type=int, default=256,
                    help="slice resolution (the shipped models use 256)")
    args = ap.parse_args(argv)

    pairs = []
    for vol_path in sorted(glob.glob(os.path.join(args.data_dir, "*[!k].nii.gz"))):
        mask_path = vol_path.replace(".nii.gz", "_mask.nii.gz")
        if os.path.exists(mask_path):
            pairs.append(
                (load_input_image(vol_path).array, load_input_image(mask_path).array)
            )
    if len(pairs) < 2:
        raise SystemExit(
            f"need at least 2 volume/mask pairs in {args.data_dir} (got {len(pairs)})"
        )

    if os.path.exists(args.model):
        params, n_classes = registry.get_model(modelpath=args.model)
    else:
        params, n_classes = registry.get_model(args.model)

    res = (args.resolution, args.resolution)
    train_pairs, eval_pair = pairs[:-1], pairs[-1]
    dataset = SliceDataset(train_pairs, resolution=res)
    eval_images, eval_labels = slices_from_pair(
        np.asarray(eval_pair[0]), np.asarray(eval_pair[1]), resolution=res
    )
    print(f"{len(train_pairs)} train volumes -> {len(dataset)} slices; "
          f"{eval_images.shape[0]} held-out eval slices")

    mesh = make_mesh()  # all local devices, data-parallel
    ndata = mesh.devices.shape[0]
    # batch must split evenly over the mesh's data axis
    batch = max(ndata, min(len(dataset), 8 * ndata) // ndata * ndata)
    steps_per_epoch = max(1, len(dataset) // batch)
    result = fit(
        params,
        dataset,
        epochs=args.epochs,
        batch_size=batch,
        mesh=mesh,
        # R231 classes are lateralized: swap right (1) / left (2) on LR flips
        augment=Augmenter(lr_swap=(1, 2) if n_classes == 3 else None),
        eval_pairs=(eval_images, eval_labels),
        eval_every=steps_per_epoch,
        checkpoint_path=args.out_path.replace(".npz", "") + "-trainstate.npz",
        checkpoint_every=steps_per_epoch,
    )

    convert.save_npz(
        args.out_path,
        result.best_params,
        meta={"finetuned_from": args.model, "eval_macro_dice": result.best_dice},
    )
    print(f"best eval macro Dice {result.best_dice:.4f}; wrote {args.out_path} — "
          f"use it via LMInferer(modelpath={args.out_path!r})")


if __name__ == "__main__":
    main()
