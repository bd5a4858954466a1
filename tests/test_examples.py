"""Smoke tests for the shipped examples: they must run end-to-end as a user
would invoke them (tiny synthetic data + synthetic weights, CPU mesh)."""

import glob
import importlib.util
import os
import sys

import numpy as np
import pytest

import jax

from lungmask_tpu.io.loader import write_image
from lungmask_tpu.io.image import MedicalImage
from lungmask_tpu.models import convert, registry, unet

pytestmark = pytest.mark.slow

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _load_example(name):
    spec = importlib.util.spec_from_file_location(
        f"example_{name}", os.path.join(EXAMPLES, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_pair(dirpath, stem, seed, n=6, hw=64):
    rng = np.random.default_rng(seed)
    vol = np.full((n, hw, hw), -1000, dtype=np.int16)
    mask = np.zeros((n, hw, hw), dtype=np.uint8)
    yy, xx = np.mgrid[0:hw, 0:hw]
    body = ((yy - hw / 2) / (hw * 0.35)) ** 2 + ((xx - hw / 2) / (hw * 0.3)) ** 2 < 1
    lung = ((yy - hw / 2) / (hw * 0.15)) ** 2 + ((xx - hw / 2) / (hw * 0.12)) ** 2 < 1
    for i in range(n):
        vol[i][body] = 40 + rng.integers(-30, 30, size=int(body.sum()))
        vol[i][lung] = -850
        mask[i][lung] = 1
    write_image(MedicalImage(vol), os.path.join(dirpath, f"{stem}.nii.gz"))
    write_image(MedicalImage(mask), os.path.join(dirpath, f"{stem}_mask.nii.gz"))


def test_finetune_example_end_to_end(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    for i in range(3):
        _write_pair(str(data), f"case{i}", seed=i)

    weights = str(tmp_path / "tiny.npz")
    convert.save_npz(
        weights, unet.init_params(jax.random.PRNGKey(0), 2, depth=3, wf=3), meta={}
    )
    out = str(tmp_path / "finetuned.npz")

    mod = _load_example("finetune")
    mod.main([str(data), out, "--epochs", "2", "--model", weights,
              "--resolution", "64"])

    assert os.path.exists(out)
    # train state checkpoint written next to it
    assert glob.glob(str(tmp_path / "finetuned-trainstate*"))
    params, meta = convert.load_npz(out)
    assert meta["finetuned_from"] == weights
    assert "eval_macro_dice" in meta
    # the fine-tuned weights load back through the standard model resolver
    params2, n_classes = registry.get_model(modelpath=out)
    assert n_classes == 2
