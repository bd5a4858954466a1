"""Native C++ core vs numpy/scipy fallback: identical labelings, props, fills."""

import numpy as np
import pytest
from scipy import ndimage

from lungmask_tpu.ops import cc_host, native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def _fallback_label(img, connectivity=None):
    """The pure scipy path, bypassing native dispatch."""
    struct = cc_host._structure(img.ndim, connectivity)
    out = np.zeros(img.shape, dtype=np.int32)
    offset = 0
    for v in np.unique(img):
        if v == 0:
            continue
        lab, n = ndimage.label(img == v, structure=struct)
        sel = lab > 0
        out[sel] = lab[sel] + offset
        offset += n
    out, num = cc_host._relabel_scan_order(out)
    return out, num


@pytest.mark.parametrize("shape", [(20, 20), (6, 9, 11), (1, 6, 6)])
@pytest.mark.parametrize("connectivity", [1, None])
def test_label_matches_fallback(lib, shape, connectivity, rng):
    img = rng.integers(0, 4, size=shape).astype(np.int32)
    got, n_got = native.label(img, connectivity)
    want, n_want = _fallback_label(img, connectivity)
    assert n_got == n_want
    np.testing.assert_array_equal(got, want)


def test_label_binary_large(lib, rng):
    img = (rng.random((40, 64, 64)) < 0.4).astype(np.int32)
    got, n_got = native.label(img, None)
    want, n_want = _fallback_label(img, None)
    assert n_got == n_want
    np.testing.assert_array_equal(got, want)


def test_regionprops_matches(lib, rng):
    img = rng.integers(0, 3, size=(8, 16, 16)).astype(np.uint8)
    labels, n = native.label(img.astype(np.int32), None)
    areas, maxint, bbox = native.regionprops_arrays(labels, img, n)
    # oracle via scipy
    for lbl in range(1, n + 1):
        sel = labels == lbl
        assert areas[lbl - 1] == sel.sum()
        assert maxint[lbl - 1] == img[sel].max()
        zs, ys, xs = np.nonzero(sel)
        np.testing.assert_array_equal(
            bbox[lbl - 1],
            [zs.min(), ys.min(), xs.min(), zs.max() + 1, ys.max() + 1, xs.max() + 1],
        )


def test_fill_holes_matches_scipy(lib, rng):
    m = np.zeros((10, 12, 12), dtype=bool)
    m[1:9, 1:11, 1:11] = True
    m[4:6, 4:7, 4:7] = False
    got = native.fill_holes(m)
    np.testing.assert_array_equal(got, ndimage.binary_fill_holes(m))
    r = rng.random((8, 20, 20)) < 0.6
    np.testing.assert_array_equal(native.fill_holes(r), ndimage.binary_fill_holes(r))


def test_postprocessing_golden_with_native(lib):
    """The reference 6×6 golden vectors must hold on the native path too."""
    from lungmask_tpu.transforms.postprocess import postprocessing

    label_image = np.zeros((1, 6, 6), dtype=np.uint8)
    label_image[0] = np.asarray(
        [
            [0, 0, 0, 0, 0, 0],
            [0, 1, 1, 2, 2, 0],
            [0, 2, 0, 3, 1, 0],
            [0, 4, 4, 4, 0, 0],
            [0, 4, 0, 4, 0, 0],
            [0, 4, 4, 4, 0, 0],
        ]
    )
    res = postprocessing(np.tile(label_image, (2, 1, 1)), spare=[], skip_below=1)[0]
    assert np.all(
        res
        == [
            [0, 0, 0, 0, 0, 0],
            [0, 1, 1, 2, 2, 0],
            [0, 1, 0, 3, 2, 0],
            [0, 4, 4, 4, 0, 0],
            [0, 4, 0, 4, 0, 0],
            [0, 4, 4, 4, 0, 0],
        ]
    )


@pytest.mark.parametrize("seed", range(6))
def test_lm_postprocess_matches_python(lib, seed):
    """One-call native postprocessing vs the Python oracle, bit-exact, across
    random blobby volumes incl. fusion-style spare labels and merge-heavy
    settings (the fused path's workload)."""
    if not hasattr(lib, "lm_postprocess"):
        pytest.skip("lm_postprocess not in library")
    from lungmask_tpu.transforms.postprocess import _postprocessing_python

    rng = np.random.default_rng(100 + seed)
    shape = (int(rng.integers(3, 7)), 28, 28)
    n_labels = int(rng.integers(2, 6))
    vol = np.zeros(shape, dtype=np.uint8)
    for v in range(1, n_labels + 1):
        noise = ndimage.gaussian_filter(rng.normal(size=shape), sigma=1.2)
        vol[noise > np.quantile(noise, 0.75)] = v
    # Fusion-style spare on odd seeds: a spare value painted where class 0 was
    spare = []
    if seed % 2:
        spare_value = n_labels + 1
        fill = ndimage.gaussian_filter(rng.normal(size=shape), sigma=1.0)
        vol[(vol == 0) & (fill > np.quantile(fill, 0.9))] = spare_value
        spare = [spare_value]
    skip_below = [1, 3, 7][seed % 3]

    got = native.postprocess(vol.copy(), spare, skip_below)
    assert got is not None
    want = _postprocessing_python(
        vol.copy(), spare=spare, disable_tqdm=True, skip_below=skip_below
    )
    np.testing.assert_array_equal(got, want)


def test_lm_postprocess_empty_and_full(lib):
    if not hasattr(lib, "lm_postprocess"):
        pytest.skip("lm_postprocess not in library")
    from lungmask_tpu.transforms.postprocess import _postprocessing_python

    zero = np.zeros((3, 8, 8), dtype=np.uint8)
    np.testing.assert_array_equal(
        native.postprocess(zero, [], 3), _postprocessing_python(zero, disable_tqdm=True)
    )
    # No background anywhere: np.unique[1:] drops class 1 (reference quirk).
    ones = np.ones((3, 8, 8), dtype=np.uint8)
    np.testing.assert_array_equal(
        native.postprocess(ones, [], 3), _postprocessing_python(ones, disable_tqdm=True)
    )


@pytest.mark.parametrize("seed", range(3))
def test_lm_fused_finish_matches_numpy_formulation(lib, seed):
    """One-call fused finish vs the literal FN-fill/FP-removal + spare-aware
    postprocessing (reference mask.py:228-232)."""
    if not hasattr(lib, "lm_fused_finish"):
        pytest.skip("lm_fused_finish not in library")
    from lungmask_tpu.transforms.postprocess import _postprocessing_python

    rng = np.random.default_rng(300 + seed)
    shape = (5, 26, 26)
    res_l = np.zeros(shape, dtype=np.uint8)
    res_r = np.zeros(shape, dtype=np.uint8)
    for v in range(1, 6):
        noise = ndimage.gaussian_filter(rng.normal(size=shape), 1.3)
        res_l[noise > np.quantile(noise, 0.8)] = v
    noise = ndimage.gaussian_filter(rng.normal(size=shape), 1.5)
    res_r[noise > np.quantile(noise, 0.65)] = 1

    got = native.fused_finish(res_l.copy(), res_r.copy())
    assert got is not None
    l = res_l.copy()
    spare_value = l.max() + 1
    l[np.logical_and(l == 0, res_r > 0)] = spare_value
    l[res_r == 0] = 0
    want = _postprocessing_python(l, spare=[spare_value], disable_tqdm=True)
    np.testing.assert_array_equal(got, want)


def test_lm_postprocess_scratch_reuse_across_sizes(lib):
    """The native core retains thread_local scratch across calls; interleaved
    volume sizes (grow -> shrink -> grow) must not leak state between calls."""
    if not hasattr(lib, "lm_postprocess"):
        pytest.skip("lm_postprocess not in library")
    from lungmask_tpu.transforms.postprocess import _postprocessing_python

    rng = np.random.default_rng(77)
    for shape in [(4, 24, 24), (8, 40, 40), (3, 12, 12), (6, 32, 32)]:
        vol = np.zeros(shape, dtype=np.uint8)
        for v in range(1, 4):
            noise = ndimage.gaussian_filter(rng.normal(size=shape), sigma=1.2)
            vol[noise > np.quantile(noise, 0.78)] = v
        got = native.postprocess(vol.copy(), [], 3)
        want = _postprocessing_python(vol.copy(), disable_tqdm=True)
        np.testing.assert_array_equal(got, want)


def test_lm_postprocess_concurrent_threads(lib):
    """Two threads driving the native core concurrently (the cohort finisher
    thread does exactly this) must each get oracle-exact results — the
    persistent scratch is thread_local, not shared."""
    if not hasattr(lib, "lm_postprocess"):
        pytest.skip("lm_postprocess not in library")
    import threading

    from lungmask_tpu.transforms.postprocess import _postprocessing_python

    rng = np.random.default_rng(88)
    vols = []
    for i in range(6):
        shape = (int(rng.integers(3, 7)), 30, 30)
        vol = np.zeros(shape, dtype=np.uint8)
        for v in range(1, 4):
            noise = ndimage.gaussian_filter(rng.normal(size=shape), sigma=1.1)
            vol[noise > np.quantile(noise, 0.8)] = v
        vols.append(vol)
    wants = [_postprocessing_python(v.copy(), disable_tqdm=True) for v in vols]
    gots = [None] * len(vols)
    errs = []

    def worker(idxs):
        try:
            for i in idxs:
                gots[i] = native.postprocess(vols[i].copy(), [], 3)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [
        threading.Thread(target=worker, args=(range(0, len(vols), 2),)),
        threading.Thread(target=worker, args=(range(1, len(vols), 2),)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    for got, want in zip(gots, wants):
        np.testing.assert_array_equal(got, want)
