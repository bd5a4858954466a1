"""Hybrid (transfer-lean) preprocessing: bit-parity with the host oracle.

The hybrid mode (transforms/preprocess.py) splits preprocessing as
packed-bits upload → device bodymask/boxes → host float64 resample+normalize.
Its contract is *bit-identical output to preprocessing="host"* for integer
volumes (the CT case): boxes come from the device bodymask (proven equal to
the host's) and the resample is the same float64 scipy arithmetic — via the
native C++ core (csrc/preproc.cpp) or the scipy fallback.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lungmask_tpu.ops import native
from lungmask_tpu.transforms import host_pipeline, preprocess


pytestmark = pytest.mark.slow  # deselect with -m "not slow" for the smoke tier

def _phantom(rng, n=3, h=512, w=512):
    """Body ellipse + two lungs + an 'arm' blob, ≥128² (hybrid main path)."""
    vol = np.full((n, h, w), -1000, dtype=np.int16)
    yy, xx = np.mgrid[0:h, 0:w]
    body = ((yy - h / 2) / (h * 0.40)) ** 2 + ((xx - w / 2) / (w * 0.35)) ** 2 < 1
    lung_l = ((yy - h / 2) / (h * 0.2)) ** 2 + ((xx - w * 0.35) / (w * 0.12)) ** 2 < 1
    lung_r = ((yy - h / 2) / (h * 0.2)) ** 2 + ((xx - w * 0.65) / (w * 0.12)) ** 2 < 1
    for i in range(n):
        sl = vol[i]
        sl[body] = 40
        sl[lung_l | lung_r] = -850
        sl += rng.integers(-30, 30, size=sl.shape).astype(np.int16)
        sl[10:24, 5:17] = 100  # separate blob losing the largest-CC contest
    return vol


def _host_oracle(vol):
    slices, boxes = host_pipeline.preprocess(vol, resolution=(256, 256))
    return host_pipeline.normalize_hu(slices).astype(np.float32), np.asarray(boxes)


@pytest.mark.parametrize("shape", [(512, 512), (300, 420), (128, 128), (517, 130)])
def test_hybrid_matches_host_oracle_int16(rng, shape):
    vol = _phantom(rng, n=3, h=shape[0], w=shape[1])
    norm_h, boxes_h = _host_oracle(vol)
    norm_y, boxes_y = preprocess.preprocess_hybrid(vol)
    assert np.array_equal(boxes_h, boxes_y)
    assert np.array_equal(norm_h, np.asarray(norm_y))


def test_hybrid_boxes_match_device_path(rng):
    vol = _phantom(rng, n=5, h=256, w=384)
    boxes_d = preprocess.compute_boxes(vol)
    _, boxes_y = preprocess.preprocess_hybrid(vol)
    assert np.array_equal(boxes_d, boxes_y)


def test_hybrid_float_input_matches_host(rng):
    vol = _phantom(rng, n=2, h=256, w=256).astype(np.float32) + 0.25
    norm_h, boxes_h = _host_oracle(vol)
    norm_y, boxes_y = preprocess.preprocess_hybrid(vol)
    assert np.array_equal(boxes_h, boxes_y)
    assert np.array_equal(norm_h, np.asarray(norm_y))


def test_hybrid_bf16_cast_matches_device_entry_cast(rng):
    vol = _phantom(rng, n=2, h=256, w=256)
    f32, _ = preprocess.preprocess_hybrid(vol)
    b16, _ = preprocess.preprocess_hybrid(vol, compute_dtype=jnp.bfloat16)
    assert b16.dtype == jnp.bfloat16
    # Host f32→bf16 cast must equal the device's own entry cast
    # (models/unet.py casts x to compute_dtype with the same RNE rounding).
    assert np.array_equal(np.asarray(b16), np.asarray(f32.astype(jnp.bfloat16)))


def test_hybrid_small_slices_fallback(rng):
    vol = _phantom(rng, n=2, h=96, w=96)
    norm_y, boxes_y = preprocess.preprocess_hybrid(vol)
    assert norm_y.shape == (2, 256, 256)
    boxes_d = preprocess.compute_boxes(vol)
    assert np.array_equal(boxes_d, boxes_y)


@pytest.mark.skipif(native.get_lib() is None, reason="no native core")
def test_native_crop_resize_matches_scipy_randomized(rng):
    """The C++ two-pass must reproduce ndimage.zoom bit-for-bit after the
    integer rounding cast, across adversarial box shapes (incl. the scipy
    cval=0 out-of-bounds quirk at exact-ratio sizes) and int dtypes."""
    h, w = 200, 230
    for trial in range(6):
        vol = rng.integers(-1200, 900, (4, h, w)).astype(
            np.int16 if trial % 2 == 0 else np.int32
        )
        boxes = []
        for _ in range(4):
            r0 = int(rng.integers(0, h - 2))
            c0 = int(rng.integers(0, w - 2))
            r1 = int(rng.integers(r0 + 1, h + 1))
            c1 = int(rng.integers(c0 + 1, w + 1))
            boxes.append((r0, c0, r1, c1))
        boxes = np.asarray(boxes, np.int32)
        got = native.crop_resize_normalize(vol, boxes, (256, 256))
        assert got is not None
        want = preprocess._crop_resize_normalize_scipy(vol, boxes, (256, 256))
        assert np.array_equal(got, want)


def test_native_rejects_bad_boxes(rng):
    if native.get_lib() is None:
        pytest.skip("no native core")
    vol = rng.integers(-1024, 600, (1, 64, 64)).astype(np.int16)
    bad = np.asarray([[0, 0, 65, 64]], np.int32)  # r1 > H
    assert native.crop_resize_normalize(vol, bad, (256, 256)) is None


def test_inferer_hybrid_equals_host_masks(rng, tmp_path):
    """End-to-end: the default hybrid mode at f32 precision produces the exact
    mask of the strict host mode (they share boxes and resample arithmetic)."""
    import jax

    from lungmask_tpu import LMInferer
    from lungmask_tpu.models import convert, unet

    params = unet.init_params(jax.random.PRNGKey(3), n_classes=3)
    wpath = str(tmp_path / "w.npz")
    convert.save_npz(wpath, params)
    vol = _phantom(rng, n=2, h=192, w=192)
    kw = dict(modelpath=wpath, tqdm_disable=True, batch_size=2, precision="float32")
    res_hybrid = LMInferer(preprocessing="hybrid", **kw).apply(vol)
    res_host = LMInferer(preprocessing="host", **kw).apply(vol)
    assert np.array_equal(res_hybrid, res_host)


def test_pack_bodymask_bits_matches_device_threshold(rng):
    """The packed bits must equal the device's subsample+threshold, including
    the oob-rows-become-body quirk (resize cval=0 > −500)."""
    vol = _phantom(rng, n=2, h=517, w=130)
    packed = preprocess.pack_bodymask_bits(vol)
    bits = np.unpackbits(packed, axis=-1).reshape(2, 128, 128).astype(bool)
    from lungmask_tpu.ops import resample

    clipped = np.clip(vol, -1024, 600)
    for i in range(2):
        small = np.asarray(
            resample.resize(jnp.asarray(clipped[i]), (128, 128), order=0)
        )
        assert np.array_equal(bits[i], small > preprocess.BODY_THRESHOLD)


def test_hybrid_small_slices_bit_exact_with_host():
    """Sub-128² slices must STILL honor hybrid's bit-for-bit-with-host
    contract (they route to the strict host pipeline)."""
    import jax.numpy as jnp

    from lungmask_tpu.transforms import host_pipeline, preprocess

    rng = np.random.default_rng(3)
    vol = np.full((2, 100, 90), -1000, dtype=np.int16)
    yy, xx = np.mgrid[0:100, 0:90]
    body = ((yy - 50) / 35.0) ** 2 + ((xx - 45) / 30.0) ** 2 < 1
    vol[:, body] = 40 + rng.integers(-60, 60, size=int(body.sum()))

    hn, hb = preprocess.preprocess_hybrid(vol, compute_dtype=jnp.bfloat16)
    slices, boxes = host_pipeline.preprocess(vol, resolution=(256, 256))
    want = host_pipeline.normalize_hu(slices).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(hb), np.asarray(boxes))
    assert hn.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(hn), want.astype(jnp.bfloat16)
    )
