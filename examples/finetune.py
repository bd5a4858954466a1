#!/usr/bin/env python
"""Fine-tune a lungmask U-Net on your own (volume, mask) pairs.

Sketch: pairs of .nii.gz volumes/label masks in a directory —
``case0.nii.gz`` + ``case0_mask.nii.gz`` etc.

    python examples/finetune.py DATA_DIR OUT_WEIGHTS.npz [steps]
"""

import glob
import os
import sys

import numpy as np
import optax

import jax.numpy as jnp

from lungmask_tpu.io import load_input_image
from lungmask_tpu.models import convert, registry
from lungmask_tpu.parallel import make_mesh
from lungmask_tpu.train import init_train_state, make_train_step
from lungmask_tpu.train.data import SliceDataset


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    data_dir, out_path = sys.argv[1], sys.argv[2]
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    pairs = []
    for vol_path in sorted(glob.glob(os.path.join(data_dir, "*[!k].nii.gz"))):
        mask_path = vol_path.replace(".nii.gz", "_mask.nii.gz")
        if os.path.exists(mask_path):
            pairs.append(
                (load_input_image(vol_path).array, load_input_image(mask_path).array)
            )
    if not pairs:
        sys.exit(f"no volume/mask pairs found in {data_dir}")

    params, n_classes = registry.get_model("R231")  # warm-start from pretrained
    dataset = SliceDataset(pairs)
    print(f"{len(pairs)} volumes → {len(dataset)} slices")

    mesh = make_mesh()  # all local devices, data-parallel
    optimizer = optax.adamw(1e-4)
    state = init_train_state(params, optimizer)
    step = make_train_step(optimizer, mesh=mesh)

    batch = 8 * mesh.devices.shape[0]
    it = dataset.batches(batch_size=batch, epochs=10_000)
    for i in range(steps):
        images, labels = next(it)
        state, loss = step(state, jnp.asarray(images), jnp.asarray(labels))
        if i % 20 == 0:
            print(f"step {i}: loss {float(loss):.4f}")

    convert.save_npz(out_path, state.params, meta={"finetuned_from": "R231"})
    print(f"wrote {out_path} — use it via LMInferer(modelpath={out_path!r})")


if __name__ == "__main__":
    main()
