"""Device postprocessing: matches the exact host path on volumes where the
neighbor-merge stage is a no-op (single dominant component per label)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lungmask_tpu.transforms.postprocess import postprocessing
from lungmask_tpu.transforms.postprocess_device import postprocess_device


def _clean_pred(rng):
    pred = np.zeros((4, 48, 48), dtype=np.uint8)
    yy, xx = np.mgrid[0:48, 0:48]
    left = ((yy - 24) / 14.0) ** 2 + ((xx - 15) / 8.0) ** 2 < 1
    right = ((yy - 24) / 14.0) ** 2 + ((xx - 33) / 8.0) ** 2 < 1
    pred[1:3, left] = 1
    pred[1:3, right] = 2
    # holes inside each lung
    pred[1, 22:25, 13:16] = 0
    pred[2, 22:25, 31:34] = 0
    # stray 1-voxel specks (below skip_below → removed by both paths)
    pred[0, 2, 2] = 1
    pred[3, 40, 40] = 2
    return pred


def test_device_matches_exact_on_clean_volume(rng):
    pred = _clean_pred(rng)
    exact = postprocessing(pred.copy(), disable_tqdm=True)
    dev = np.asarray(postprocess_device(jnp.asarray(pred), n_classes=3))
    np.testing.assert_array_equal(dev, exact)


def test_device_keeps_largest_and_fills():
    pred = np.zeros((3, 16, 16), dtype=np.uint8)
    pred[1, 2:10, 2:10] = 1
    pred[1, 5:7, 5:7] = 0  # 2-D hole; closed volume in 3-D? no — open in z
    pred[1, 12:14, 12:14] = 1  # small second component
    out = np.asarray(postprocess_device(jnp.asarray(pred), n_classes=2))
    assert out[1, 12, 12] == 0  # small CC removed
    assert out[1, 3, 3] == 1


def test_inferer_device_mode(tmp_path):
    import jax

    from lungmask_tpu import LMInferer
    from lungmask_tpu.models import convert, unet

    params = unet.init_params(jax.random.PRNGKey(0), n_classes=3)
    p = str(tmp_path / "w.npz")
    convert.save_npz(p, params)
    vol = np.full((2, 64, 64), -1000, dtype=np.int16)
    yy, xx = np.mgrid[0:64, 0:64]
    vol[:, ((yy - 32) / 22.0) ** 2 + ((xx - 32) / 19.0) ** 2 < 1] = 40
    inferer = LMInferer(
        modelpath=p, tqdm_disable=True, batch_size=2, postprocessing_mode="device"
    )
    out = inferer.apply(vol)
    assert out.shape == vol.shape and out.dtype == np.uint8
