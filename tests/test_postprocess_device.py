"""Device postprocessing: matches the exact host path on volumes where the
neighbor-merge stage is a no-op (single dominant component per label)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lungmask_tpu.transforms.postprocess import postprocessing
from lungmask_tpu.transforms.postprocess_device import postprocess_device


pytestmark = pytest.mark.slow  # deselect with -m "not slow" for the smoke tier

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


def _lobe_phantom():
    """LTRCLobes-like phantom: 5 solid lobes + satellite components that the
    exact path REMAPS into adjacent lobes and the device path REMOVES."""
    pred = np.zeros((12, 96, 96), dtype=np.uint8)
    yy, xx = np.mgrid[0:96, 0:96]

    def ellipse(cy, cx, ry, rx):
        return ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1

    # left lung: lobes 1 (upper) / 2 (lower); right lung: 3 / 4 / 5
    pred[2:10, ellipse(30, 28, 16, 12)] = 1
    pred[2:10, ellipse(62, 28, 16, 12)] = 2
    pred[2:10, ellipse(22, 68, 12, 11)] = 3
    pred[2:10, ellipse(48, 68, 12, 11)] = 4
    pred[2:10, ellipse(72, 68, 12, 11)] = 5

    satellites = np.zeros_like(pred, dtype=bool)
    # satellite of label 1 glued to the OUTSIDE edge of lobe 2 (area well
    # below label-1's champion): exact remaps it to 2, device removes it.
    sat1 = np.zeros_like(pred, dtype=bool)
    sat1[4:6, 60:64, 40:44] = True
    sat1 &= pred == 0
    assert sat1.any()
    pred[sat1] = 1
    satellites |= sat1
    # satellite of label 4 glued to the outside edge of lobe 5:
    sat2 = np.zeros_like(pred, dtype=bool)
    sat2[5:7, 70:73, 79:83] = True
    sat2 &= pred == 0
    assert sat2.any()
    pred[sat2] = 4
    satellites |= sat2
    # sub-skip_below speck (area 2): both paths must drop it
    pred[0, 2, 2:4] = 3
    return pred, satellites


def test_device_divergence_contract():
    """Accuracy contract for postprocessing_mode='device' (VERDICT r1 #9):
    it may differ from the exact path ONLY on non-champion components that the
    exact path merges into a neighboring label (device removes them instead).
    On this merge-heavy lobe phantom the difference is exactly the satellite
    set, and the divergence fraction is reported."""
    pred, satellites = _lobe_phantom()
    exact = postprocessing(pred.copy(), disable_tqdm=True)
    dev = np.asarray(postprocess_device(jnp.asarray(pred), n_classes=6))

    diff = dev != exact
    frac = float(diff.mean())
    nonzero = float((pred != 0).mean())
    print(
        f"\n[device-postprocess] divergence: {diff.sum()} voxels "
        f"({frac:.5f} of volume, phantom occupancy {nonzero:.3f}); "
        f"satellite voxels: {satellites.sum()}"
    )
    # Exactly the satellites diverge — remapped by exact, removed by device.
    np.testing.assert_array_equal(diff, satellites)
    assert np.all(dev[satellites] == 0)
    assert np.all(exact[satellites] != 0)
    # Everywhere else: bit-identical.
    np.testing.assert_array_equal(dev[~satellites], exact[~satellites])


def test_packed_device_postprocess_matches_dense():
    """postprocess_device_packed2 + crumb unpack == dense postprocess_device
    (the packed form is the production download for ≤4-class models)."""
    import jax.numpy as jnp

    from lungmask_tpu.runtime.engine import unpack_crumbs
    from lungmask_tpu.transforms.postprocess_device import (
        postprocess_device,
        postprocess_device_packed2,
    )

    vol = np.zeros((6, 16, 32), dtype=np.uint8)
    vol[1:5, 2:10, 2:20] = 1
    vol[2:4, 4:7, 5:12] = 0   # hole
    vol[0, 14, 28] = 1        # satellite
    vol[3:5, 11:15, 22:30] = 2
    dense = np.asarray(postprocess_device(jnp.asarray(vol), 3))
    packed = np.asarray(postprocess_device_packed2(jnp.asarray(vol), 3))
    np.testing.assert_array_equal(unpack_crumbs(packed), dense)


def test_sweep_cc_spiral_worst_case():
    """A spiral is the worst case for sweep-based labeling (label must
    propagate around every bend); the fixpoint must still match the host
    labeling partition exactly."""
    import jax.numpy as jnp

    from lungmask_tpu.ops import cc, cc_host

    img = np.zeros((33, 33), dtype=np.uint8)
    # draw an inward rectangular spiral of value 1
    top, left, bottom, right = 0, 0, 32, 32
    while top < bottom and left < right:
        img[top, left:right + 1] = 1
        img[top:bottom + 1, right] = 1
        img[bottom, left:right + 1] = 1
        img[top + 2:bottom + 1, left] = 1
        top += 2
        bottom -= 2
        left += 2
        right -= 2
    # plus an unrelated second component
    img[16, 16] = 2

    dev = np.asarray(cc.label(jnp.asarray(img)))
    host = cc_host.label(img)
    # same partition: bijection between label sets
    for hv in np.unique(host):
        sel = host == hv
        assert len(np.unique(dev[sel])) == 1
    for dv in np.unique(dev):
        sel = dev == dv
        assert len(np.unique(host[sel])) == 1
