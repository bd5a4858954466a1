"""Property test: the production postprocessing (bbox-windowed merges, C++ CC)
must equal a LITERAL transcription of the reference algorithm
(/root/reference/lungmask/utils.py:272-358) that operates on the full volume
at every step, across random multi-class volumes and parameter settings."""

import numpy as np
import pytest
from scipy import ndimage

from lungmask_tpu.ops import cc_host
from lungmask_tpu.transforms.postprocess import postprocessing


def _literal_reference(label_image, spare=(), skip_below=3):
    """Verbatim algorithm semantics, no windowing optimizations."""
    spare = list(spare)
    regionmask = cc_host.label(label_image)
    origlabels = np.unique(label_image)
    maxsub = np.zeros((int(max(origlabels)) + 1,), dtype=np.uint32)
    regions = cc_host.regionprops(regionmask, label_image)
    regions.sort(key=lambda x: x.area)
    regionlabels = [x.label for x in regions]
    to_lobe = np.zeros((len(regionlabels) + 1,), dtype=np.uint8)
    for r in regions:
        v = int(r.max_intensity)
        if r.area > maxsub[v]:
            maxsub[v] = r.area
            to_lobe[r.label] = v
    for r in regions:
        v = int(r.max_intensity)
        if (r.area < maxsub[v] or v in spare) and r.area >= skip_below:
            bb = cc_host.bbox_nd(regionmask == r.label)
            sub = regionmask[bb[0] : bb[1], bb[2] : bb[3], bb[4] : bb[5]]
            dil = ndimage.binary_dilation(sub == r.label)
            neighbours, counts = np.unique(sub[dil], return_counts=True)
            mapto, maxmap, myarea = r.label, 0, 0
            for ix, n in enumerate(neighbours):
                n = int(n)
                if n != 0 and n != r.label and counts[ix] > maxmap and n not in spare:
                    maxmap, mapto, myarea = int(counts[ix]), n, r.area
            regionmask[regionmask == r.label] = mapto
            tgt = regions[regionlabels.index(mapto)]
            if tgt.area == maxsub[int(tgt.max_intensity)]:
                maxsub[int(tgt.max_intensity)] += myarea
            tgt.area += myarea
    mapped = to_lobe[regionmask]
    mapped[np.isin(mapped, spare)] = 0
    if mapped.shape[0] == 1:
        def holefiller(x):
            return cc_host.area_closing_binary(x[0], area_threshold=64)[None]
    else:
        holefiller = cc_host.fill_holes_3d
    out = np.zeros(mapped.shape, dtype=np.uint8)
    for i in np.unique(mapped)[1:]:
        out[holefiller(cc_host.keep_largest_connected_component(mapped == i))] = i
    return out


@pytest.mark.parametrize("seed", range(8))
def test_windowed_equals_literal(seed):
    rng = np.random.default_rng(seed)
    shape = (int(rng.integers(2, 5)), 20, 20)
    n_labels = int(rng.integers(2, 6))
    # blobby random label volume: threshold smoothed noise per label
    vol = np.zeros(shape, dtype=np.uint8)
    for v in range(1, n_labels + 1):
        noise = rng.normal(size=shape)
        noise = ndimage.gaussian_filter(noise, sigma=1.5)
        vol[noise > np.quantile(noise, 0.8)] = v
    spare = [n_labels] if seed % 2 else []
    skip_below = [1, 3, 5][seed % 3]

    got = postprocessing(vol.copy(), spare=spare, skip_below=skip_below)
    want = _literal_reference(vol.copy(), spare=spare, skip_below=skip_below)
    np.testing.assert_array_equal(got, want)


def test_single_slice_volume_path():
    rng = np.random.default_rng(0)
    vol = np.zeros((1, 24, 24), dtype=np.uint8)
    vol[0, 4:20, 4:20] = 1
    vol[0, 8:10, 8:10] = 0  # small hole < 64 px → area_closing fills
    vol[0, 2, 2] = 2
    got = postprocessing(vol.copy())
    want = _literal_reference(vol.copy())
    np.testing.assert_array_equal(got, want)
    assert got[0, 8, 8] == 1


def test_no_merge_fast_path_equals_literal():
    """Clean volumes (champions + sub-skip_below specks only, no merges, no
    spare) take the label-reuse fast path; output must still equal the
    literal reference algorithm exactly — including interim-champion removal
    and hole filling."""
    vol = np.zeros((8, 32, 32), dtype=np.uint8)
    vol[1:7, 2:14, 2:14] = 1          # class-1 champion
    vol[2:5, 4:9, 4:9] = 0            # hole in it (must fill)
    vol[1:3, 20:24, 20:24] = 1        # smaller class-1 component (interim
    vol[5, 28, 28] = 1                # champion ordering exercised) + speck
    vol[3:6, 16:28, 2:10] = 2         # class-2 champion
    vol[7, 1, 1] = 2                  # speck below skip_below
    got = postprocessing(vol, disable_tqdm=True)
    want = _literal_reference(vol)
    np.testing.assert_array_equal(got, want)
