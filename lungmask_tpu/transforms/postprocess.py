"""Volume postprocessing: component cleanup, neighbor-merge relabeling, hole fill.

Re-derivation of the reference's ``utils.postprocessing``
(/root/reference/lungmask/utils.py:272-358) with identical observable
semantics, including its quirks (documented inline), but restructured for
speed: every per-region operation works on the region's current bounding
window instead of the full volume, turning the reference's
O(regions × volume) Python loop into O(Σ region-window volumes). On typical
CT volumes this is orders of magnitude faster and is the main reason the
fused-model path drops from "several minutes" (reference README.md:9) to
sub-second host time.

Observable semantics preserved exactly (verified by the reference's own
postprocessing unit-test vectors in tests/test_postprocess.py):

* 3-D connected components of the multi-class map with full (26) connectivity
  and raster-scan label ordering.
* Regions processed in ascending-area order (stable sort → ties keep
  scan order).
* A region merges into the neighbor sharing the largest dilated border,
  neighbor-count ties broken by ascending label; labels numerically present in
  ``spare`` are excluded as merge targets (the reference compares *region
  labels* against ``spare`` — which holds intensity values — at utils.py:323;
  we reproduce that comparison verbatim).
* The merge-target's cached area grows (utils.py:339) and, when the target is
  currently the largest component of its intensity, the per-intensity max
  grows too (utils.py:330-338) — both affect later regions' merge conditions.
* Regions smaller than ``skip_below`` neither merge nor update caches; they
  die in the final largest-CC sweep.
* Final sweep iterates ``np.unique(mapped)[1:]`` (utils.py:355) — verbatim,
  including the implicit assumption that 0 is present.
* Hole filling: 3-D fill for volumes, binary area-closing (<64 px, 4-conn)
  for single-slice volumes (utils.py:344-352).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from scipy import ndimage

from lungmask_tpu.logger import logger
from lungmask_tpu.ops import cc_host


def _expand_box(lo: np.ndarray, hi: np.ndarray, shape, margin: int = 2):
    lo = np.maximum(lo - margin, 0)
    hi = np.minimum(hi + margin, shape)
    return lo, hi


def postprocessing(
    label_image: np.ndarray,
    spare: Sequence[int] = (),
    disable_tqdm: bool = False,  # accepted for API parity; no progress bar here
    skip_below: int = 3,
) -> np.ndarray:
    """Map small label patches to the neighbor sharing the largest border,
    keep only each label's largest connected component, fill holes.

    Args:
        label_image: int label volume (z, y, x).
        spare: labels used for neighbor mapping but erased from the final
            result (the fusion path's FN-fill marker, see LMInferer.apply).
        skip_below: components smaller than this are removed instead of merged.

    Returns:
        uint8 postprocessed volume.
    """
    label_image = np.asarray(label_image)
    logger.info("Postprocessing")
    spare = list(spare)

    regionmask = cc_host.label(label_image)
    origlabels = np.unique(label_image)
    origlabels_maxsub = np.zeros((int(max(origlabels)) + 1,), dtype=np.uint32)

    regions = cc_host.regionprops(regionmask, label_image)
    regions.sort(key=lambda r: r.area)
    regionlabels = [r.label for r in regions]
    pos_of_label = {lbl: i for i, lbl in enumerate(regionlabels)}

    # Current bounding window per region label (half-open), updated on merges.
    ndim = label_image.ndim
    box_lo = {r.label: np.asarray(r.bbox[:ndim]) for r in regions}
    box_hi = {r.label: np.asarray(r.bbox[ndim:]) for r in regions}

    region_to_lobemap = np.zeros((len(regionlabels) + 1,), dtype=np.uint8)
    for r in regions:
        v = int(r.max_intensity)
        if r.area > origlabels_maxsub[v]:
            origlabels_maxsub[v] = r.area
            region_to_lobemap[r.label] = v

    for r in regions:
        v = int(r.max_intensity)
        if (
            r.area < origlabels_maxsub[v] or v in spare
        ) and r.area >= skip_below:
            lo, hi = _expand_box(box_lo[r.label], box_hi[r.label], label_image.shape)
            window = tuple(slice(int(a), int(b)) for a, b in zip(lo, hi))
            sub = regionmask[window]
            rmask = sub == r.label
            dil = ndimage.binary_dilation(rmask)
            neighbours, counts = np.unique(sub[dil], return_counts=True)
            mapto = r.label
            maxmap = 0
            myarea = 0
            for ix, n in enumerate(neighbours):
                n = int(n)
                if n != 0 and n != r.label and counts[ix] > maxmap and n not in spare:
                    maxmap = int(counts[ix])
                    mapto = n
                    myarea = r.area
            if mapto != r.label:
                sub[rmask] = mapto  # writes through into regionmask
                # Target's territory grows: union the windows.
                box_lo[mapto] = np.minimum(box_lo[mapto], box_lo[r.label])
                box_hi[mapto] = np.maximum(box_hi[mapto], box_hi[r.label])
            target = regions[pos_of_label[mapto]]
            if target.area == origlabels_maxsub[int(target.max_intensity)]:
                origlabels_maxsub[int(target.max_intensity)] += myarea
            target.area += myarea

    outmask_mapped = region_to_lobemap[regionmask]
    outmask_mapped[np.isin(outmask_mapped, spare)] = 0

    if outmask_mapped.shape[0] == 1:
        def holefiller(x):
            return cc_host.area_closing_binary(x[0], area_threshold=64)[None, :, :]
    else:
        holefiller = cc_host.fill_holes_3d

    outmask = np.zeros(outmask_mapped.shape, dtype=np.uint8)
    for i in np.unique(outmask_mapped)[1:]:
        outmask[holefiller(cc_host.keep_largest_connected_component(outmask_mapped == i))] = i

    return outmask
