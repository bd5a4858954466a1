"""TPU-native 2-D U-Net forward pass in pure JAX.

Capability parity target: the reference's PyTorch U-Net
(/root/reference/lungmask/resunet.py:8-155) in its production configuration
(/root/reference/lungmask/mask.py:58-65): ``in_channels=1, depth=5, wf=6,
padding=True, batch_norm=True, up_mode='upsample', residual=False``.

Design (TPU-first, not a port):

* **Layout**: NHWC activations with HWIO kernels — the native layout for TPU
  convolutions (feature dim on the 128-lane axis).
* **Parameters** are a plain pytree (nested dicts of ``jnp.ndarray``), so the
  whole forward pass is a pure function ``unet_apply(params, x)`` that composes
  freely with ``jit`` / ``vmap`` / ``pjit`` / ``shard_map``.
* **BatchNorm is folded at conversion time** into a per-channel affine
  ``y = x * scale + bias`` (inference only; the reference always runs its net in
  ``eval()`` mode — /root/reference/lungmask/mask.py:67). XLA fuses the affine
  into the neighboring convolution epilogue, so it is free at runtime.
* The ``LogSoftmax`` head (/root/reference/lungmask/resunet.py:56,70) is exposed
  as :func:`unet_apply` (log-probs, for API parity) while the hot inference path
  uses :func:`unet_argmax` — ``argmax`` commutes with ``log_softmax`` so the
  normalization is skipped entirely on device.
* Mixed precision: ``compute_dtype=bfloat16`` runs convs on the MXU in bf16 with
  float32 accumulation (``preferred_element_type``); ``float32`` (default) uses
  HIGHEST precision for bit-parity testing against the reference weights.

Architecture (production config), encoder channels 1→64→128→256→512→1024 with
2×2 average-pooling between levels, decoder mirrors with bilinear 2× upsampling
followed by a 1×1 projection, skip concatenation, and a 1×1 classifier head:
see /root/reference/lungmask/resunet.py:39-70.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, Any]

# Production architecture constants (reference: mask.py:58-65, resunet.py:9).
IN_CHANNELS = 1
DEPTH = 5
WF = 6
BN_EPS = 1e-5  # torch.nn.BatchNorm2d default, folded at conversion time.

_DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def encoder_channels(depth: int = DEPTH, wf: int = WF) -> List[int]:
    """Channel counts of the encoder levels: [64, 128, 256, 512, 1024]."""
    return [2 ** (wf + i) for i in range(depth)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv_acc32(x: jnp.ndarray, w: jnp.ndarray, padding: str, precision) -> jnp.ndarray:
    """Convolution with float32 accumulation (``preferred_element_type``).

    jax 0.9's conv transpose rule rejects mixed dtypes, so a bf16 conv with an
    f32 ``preferred_element_type`` is not reverse-differentiable as written —
    which would bar the bf16 training path. The custom VJP keeps the primal
    bit-identical and computes dgrad/wgrad through the dtype-uniform conv
    (cotangent rounded to the compute dtype): exactly the standard TPU
    mixed-precision recipe, where dgrad/wgrad also run on the MXU in bf16
    with f32 accumulation.
    """
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=_DIMENSION_NUMBERS,
        precision=precision,
        preferred_element_type=jnp.float32,
    )


def _conv_acc32_fwd(x, w, padding, precision):
    return _conv_acc32(x, w, padding, precision), (x, w)


def _conv_acc32_bwd(padding, precision, res, ct):
    x, w = res

    def surrogate(x_, w_):
        return lax.conv_general_dilated(
            x_,
            w_,
            window_strides=(1, 1),
            padding=padding,
            dimension_numbers=_DIMENSION_NUMBERS,
            precision=precision,
        ).astype(jnp.float32)

    _, vjp = jax.vjp(surrogate, x, w)
    return vjp(ct)


_conv_acc32.defvjp(_conv_acc32_fwd, _conv_acc32_bwd)


def _conv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, *, precision) -> jnp.ndarray:
    out = _conv_acc32(
        x,
        w.astype(x.dtype),
        "SAME" if w.shape[0] > 1 else "VALID",
        precision,
    )
    return out + b.astype(out.dtype)


def _head(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, *, precision) -> jnp.ndarray:
    """The 1×1 classifier head (reference: Conv2d(64, n_classes, 1),
    resunet.py:55) as a channel contraction.

    Expressed as ``lax.dot_general`` rather than a conv: with n_classes ≤ 6
    output channels XLA's conv path runs the head at ~22% of its HBM bound,
    while the identical contraction as a dot runs at 66% — measured 1.495 →
    0.496 ms per 32-slice chunk on v5e (tools/op_experiments.py, r5). Same
    MXU contraction (K over input channels, f32 accumulation), so logits
    are unchanged within the conv's own tiling nondeterminism.
    """
    y = lax.dot_general(
        x,
        w[0, 0].astype(x.dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    return y + b.astype(y.dtype)


def _affine(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Folded inference-mode BatchNorm: per-channel scale/bias."""
    return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _conv_block(p: Params, x: jnp.ndarray, *, precision, compute_dtype) -> jnp.ndarray:
    """The reference's UNetConvBlock, dispatched structurally on the pytree.

    Non-residual (production): conv3x3 → ReLU → BN → conv3x3 → ReLU → BN
    (/root/reference/lungmask/resunet.py:93-105; BN sits *after* the ReLU, so
    it folds to an affine rather than into the conv).

    Residual (``"res"`` key present, resunet.py:88-91,107-114): pre-activation
    ordering — [ReLU → BN(in) when not the first block] → conv3x3 → ReLU →
    BN → conv3x3, then ``+`` the skip path (1×1 conv + BN when channel counts
    differ — always the case at these widths — carried as ``p["res"]``).
    """
    if "res" in p:
        inp = x
        if "bn_pre" in p:
            x = jnp.maximum(x, 0.0)
            x = _affine(x, p["bn_pre"]).astype(compute_dtype)
        x = _conv(x, p["conv1"]["w"], p["conv1"]["b"], precision=precision)
        x = jnp.maximum(x, 0.0)
        x = _affine(x, p["bn1"]).astype(compute_dtype)
        x = _conv(x, p["conv2"]["w"], p["conv2"]["b"], precision=precision)
        r = _conv(inp, p["res"]["conv"]["w"], p["res"]["conv"]["b"], precision=precision)
        r = _affine(r, p["res"]["bn"])
        return (x + r).astype(compute_dtype)
    x = _conv(x, p["conv1"]["w"], p["conv1"]["b"], precision=precision)
    x = jnp.maximum(x, 0.0)
    x = _affine(x, p["bn1"]).astype(compute_dtype)
    x = _conv(x, p["conv2"]["w"], p["conv2"]["b"], precision=precision)
    x = jnp.maximum(x, 0.0)
    x = _affine(x, p["bn2"]).astype(compute_dtype)
    return x


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2×2/2 average pooling (reference: F.avg_pool2d(x, 2), resunet.py:64).

    The init value must be a concrete scalar literal (numpy, not a traced
    jnp constant): under ``jax.checkpoint`` partial-eval a traced init makes
    reduce_window's linearization fail ("unknown output primals"), breaking
    the bf16 training path. np.zeros keeps the lowered program identical.
    """
    summed = lax.reduce_window(
        x, 0.0 if x.dtype == jnp.float32 else np.zeros((), x.dtype),
        lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )
    return summed * jnp.asarray(0.25, summed.dtype)


def _bilinear_up2(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2× upsampling, half-pixel centers (align_corners=False).

    Matches torch.nn.Upsample(mode='bilinear', scale_factor=2) used at
    /root/reference/lungmask/resunet.py:132. For an exact ×2 ratio the
    half-pixel-center resample reduces to a fixed 4-tap [1/4, 3/4] stencil,
    which ``jax.image.resize(method='bilinear')`` implements exactly.
    """
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")


def _upconv2(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, *, precision) -> jnp.ndarray:
    """Transposed conv, kernel 2 stride 2 (the reference's ``up_mode='upconv'``,
    /root/reference/lungmask/resunet.py:128-130). With kernel == stride the
    output blocks don't overlap, so the transposed conv is exactly one matmul
    per pixel: ``out[2i+dy, 2j+dx, o] = Σ_c x[i,j,c]·W[dy,dx,c,o] + b[o]`` —
    a pure MXU op with a reshape, no scatter. ``w`` is (2, 2, cin, cout)."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    y = jnp.einsum(
        "nhwc,co->nhwo",
        x,
        w.astype(x.dtype).reshape(-1, cin, cout).transpose(1, 0, 2).reshape(cin, 4 * cout),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    # y[..., (dy*2+dx)*cout + o] → (n, h, 2, w, 2, cout) → (n, 2h, 2w, cout)
    y = y.reshape(n, h, wd, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, 2 * h, 2 * wd, cout) + b.astype(jnp.float32)


# Bilinear ×2 phase stencil (half-pixel centers): output row 2i interpolates
# inputs (i-1, i) with weights (1/4, 3/4); row 2i+1 interpolates (i, i+1) with
# (3/4, 1/4). Axis taps live on a 3-wide window {-1, 0, +1} per phase.
_BILERP_TAPS = np.zeros((2, 3), np.float32)  # [phase, tap(-1,0,+1)]
_BILERP_TAPS[0, 0], _BILERP_TAPS[0, 1] = 0.25, 0.75
_BILERP_TAPS[1, 1], _BILERP_TAPS[1, 2] = 0.75, 0.25
# [ky, kx, phase(py*2+px)] separable product stencil for the fused kernel.
_BILERP_STENCIL = np.einsum(
    "pk,ql->klpq", _BILERP_TAPS, _BILERP_TAPS
).reshape(3, 3, 4)


# Opt-in only (LUNGMASK_TPU_FUSED_UPSAMPLE=1): measured SLOWER end-to-end on
# TPU v5e (763 vs 961 slices/s) — see the rationale in _up_block. Kept for
# re-evaluation on hardware where conv efficiency at these shapes differs.
_FUSED_UPSAMPLE = os.environ.get("LUNGMASK_TPU_FUSED_UPSAMPLE") == "1"


def _up_proj_fused(
    x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, *, precision
) -> jnp.ndarray:
    """Bilinear ×2 upsample + 1×1 projection as ONE MXU convolution.

    ``_bilinear_up2`` lowers to VPU gather/lerp passes plus an HBM round-trip
    of the upsampled (2h, 2w, Cin) tensor before the projection conv reads it
    back; a per-op device trace (FUTURE.md §2) shows resize among the ~40% of
    device time spent on VPU work while the MXU convs sit at their roofline
    only half the time. Because the ×2 half-pixel-center resample is a fixed
    separable [1/4, 3/4] stencil, upsample∘proj is exactly a stride-1 3×3
    convolution producing the 4 output phases as channel groups::

        out(2i+py, 2j+px, o) = Σ_{dy,dx,c} S[dy,dx,(py,px)]·P[c,o]·x(i+dy, j+dx, c)

    followed by a depth-to-space interleave (the same pattern as
    :func:`_upconv2`). Edge taps replicate the border pixel (torch/`
    ``jax.image.resize`` clamp semantics), handled by an edge-pad + VALID.

    **Measured SLOWER than the two-step path on TPU v5e** (961 → 763
    slices/s end-to-end) and therefore opt-in via
    ``LUNGMASK_TPU_FUSED_UPSAMPLE=1``: the dense 3×3×Cin×4Cout kernel pays
    9× the projection's MXU FLOPs (per output phase only a 2×2 subset of
    the 3×3 stencil is non-zero, but a dense conv cannot exploit that), and
    at these channel counts the extra MXU time exceeds the HBM round-trip
    it saves. Numerics: identical math with f32 accumulation — only the
    weight-product rounding differs from the two-step path, so the f32
    bit-parity configuration always keeps the two-step form (see
    ``_up_block``).
    """
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    stencil = jnp.asarray(_BILERP_STENCIL, jnp.float32)
    proj = w.astype(jnp.float32).reshape(cin, cout)
    # K[ky, kx, c, phase*cout + o]
    kern = jnp.einsum("klp,co->klcpo", stencil, proj).reshape(3, 3, cin, 4 * cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    # _conv_acc32 (not a raw conv call) so the bf16 training path keeps its
    # differentiable f32-accumulating custom VJP.
    y = _conv_acc32(xp, kern.astype(x.dtype), "VALID", precision)
    y = y.reshape(n, h, wd, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, 2 * h, 2 * wd, cout) + b.astype(jnp.float32)


def _center_crop(skip: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """The reference's UNetUpBlock.center_crop (resunet.py:136-142): static
    center crop of the skip tensor to the upsampled tensor's spatial size.
    A no-op at power-of-two sizes with padding=True; load-bearing for odd
    input sizes (floor-division pooling makes 2·pool(n) < n)."""
    sh, sw = skip.shape[1], skip.shape[2]
    if (sh, sw) == (h, w):
        return skip
    dy, dx = (sh - h) // 2, (sw - w) // 2
    return skip[:, dy : dy + h, dx : dx + w, :]


def _up_block(
    p: Params,
    x: jnp.ndarray,
    skip: jnp.ndarray,
    *,
    precision,
    compute_dtype,
) -> jnp.ndarray:
    """Upsample (bilinear ×2 + 1×1 proj, or transposed conv) → center-crop the
    skip → concat → conv block [→ + residual 1×1-conv/BN path of the concat].

    Reference: UNetUpBlock.forward at /root/reference/lungmask/resunet.py:144-153.
    Variant dispatch is structural: ``"upconv"`` vs ``"proj"`` selects the
    up_mode, a ``"res"`` key adds the residual path around the conv block.
    """
    if "upconv" in p:
        up = _upconv2(
            x, p["upconv"]["w"], p["upconv"]["b"], precision=precision
        ).astype(compute_dtype)
    elif _FUSED_UPSAMPLE and compute_dtype != jnp.float32:
        up = _up_proj_fused(
            x, p["proj"]["w"], p["proj"]["b"], precision=precision
        ).astype(compute_dtype)
    else:
        # Default (and the float32 bit-parity configuration): the reference's
        # two-step form — resize then project — so f32 logits match torch to
        # float32 rounding. This is ALSO the measured-fastest bf16 path: the
        # fused 3×3 phase-conv (_up_proj_fused) pays 9× the projection's
        # MXU FLOPs (the dense stencil can't exploit its per-phase 2×2
        # sparsity), and the end-to-end stream measured 763 vs 961 slices/s
        # on TPU v5e with fusion on — the VPU resize + 1×1 conv wins.
        up = _bilinear_up2(x)
        up = _conv(up, p["proj"]["w"], p["proj"]["b"], precision=precision).astype(
            compute_dtype
        )
    skip = _center_crop(skip, up.shape[1], up.shape[2])
    x = jnp.concatenate([up, skip], axis=-1)
    out = _conv_block(
        p["conv_block"], x, precision=precision, compute_dtype=compute_dtype
    )
    if "res" in p:
        r = _conv(x, p["res"]["conv"]["w"], p["res"]["conv"]["b"], precision=precision)
        r = _affine(r, p["res"]["bn"])
        out = (out + r).astype(compute_dtype)
    return out


def unet_logits(
    params: Params,
    x: jnp.ndarray,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    precision: lax.Precision | None = None,
) -> jnp.ndarray:
    """Raw classifier logits (pre log-softmax), NHWC.

    Args:
        params: parameter pytree (see :func:`init_params` /
            ``lungmask_tpu.models.convert``).
        x: input batch, shape (N, H, W, 1), float.
        compute_dtype: activation dtype (bfloat16 for MXU throughput, float32
            for parity testing).
        precision: conv precision; defaults to HIGHEST for float32 (parity) and
            DEFAULT for bfloat16.
    """
    if precision is None:
        precision = (
            lax.Precision.HIGHEST if compute_dtype == jnp.float32 else lax.Precision.DEFAULT
        )
    x = x.astype(compute_dtype)

    skips = []
    for i, block in enumerate(params["down"]):
        x = _conv_block(block, x, precision=precision, compute_dtype=compute_dtype)
        if i != len(params["down"]) - 1:
            skips.append(x)
            x = _avg_pool2(x)

    for i, block in enumerate(params["up"]):
        x = _up_block(
            block, x, skips[-i - 1], precision=precision, compute_dtype=compute_dtype
        )

    logits = _head(x, params["last"]["w"], params["last"]["b"], precision=precision)
    return logits  # float32 (preferred_element_type) regardless of compute dtype


def unet_apply(
    params: Params,
    x: jnp.ndarray,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    precision: lax.Precision | None = None,
) -> jnp.ndarray:
    """Log-probabilities, matching the reference's LogSoftmax(dim=1) head
    (/root/reference/lungmask/resunet.py:56,70) — here over the channel-last axis.
    """
    logits = unet_logits(params, x, compute_dtype=compute_dtype, precision=precision)
    return jax.nn.log_softmax(logits, axis=-1)


def unet_argmax(
    params: Params,
    x: jnp.ndarray,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    precision: lax.Precision | None = None,
) -> jnp.ndarray:
    """Per-pixel class prediction (uint8), the hot inference head.

    argmax ∘ log_softmax == argmax, so the softmax normalization of the
    reference head (/root/reference/lungmask/mask.py:183-185) is elided.
    """
    logits = unet_logits(params, x, compute_dtype=compute_dtype, precision=precision)
    return jnp.argmax(logits, axis=-1).astype(jnp.uint8)


def init_params(
    key: jax.Array,
    n_classes: int,
    *,
    in_channels: int = IN_CHANNELS,
    depth: int = DEPTH,
    wf: int = WF,
    dtype: jnp.dtype = jnp.float32,
) -> Params:
    """Random parameter pytree with the production architecture's shapes.

    Initialization follows torch's Conv2d default (Kaiming-uniform with
    a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and
    bias), so randomly-initialized parity tests exercise realistic magnitudes.
    Folded-BN affines start as identity (scale=1, bias=0).
    """
    chans = encoder_channels(depth, wf)

    def conv_init(key, kh, kw, cin, cout):
        wkey, bkey = jax.random.split(key)
        bound = 1.0 / np.sqrt(kh * kw * cin)
        w = jax.random.uniform(wkey, (kh, kw, cin, cout), dtype, -bound, bound)
        b = jax.random.uniform(bkey, (cout,), dtype, -bound, bound)
        return {"w": w, "b": b}

    def affine_init(cout):
        return {"scale": jnp.ones((cout,), dtype), "bias": jnp.zeros((cout,), dtype)}

    def conv_block_init(key, cin, cout):
        k1, k2 = jax.random.split(key)
        return {
            "conv1": conv_init(k1, 3, 3, cin, cout),
            "bn1": affine_init(cout),
            "conv2": conv_init(k2, 3, 3, cout, cout),
            "bn2": affine_init(cout),
        }

    keys = jax.random.split(key, 2 * depth)
    down = []
    prev = in_channels
    for i in range(depth):
        down.append(conv_block_init(keys[i], prev, chans[i]))
        prev = chans[i]

    up = []
    for j, i in enumerate(reversed(range(depth - 1))):
        cout = chans[i]
        kproj, kblock = jax.random.split(keys[depth + j])
        up.append(
            {
                "proj": conv_init(kproj, 1, 1, prev, cout),
                "conv_block": conv_block_init(kblock, 2 * cout, cout),
            }
        )
        prev = cout

    last = conv_init(keys[-1], 1, 1, prev, n_classes)
    return {"down": down, "up": up, "last": last}


def n_classes_of(params: Params) -> int:
    """Number of output classes (length of the final conv bias), mirroring the
    reference's n_classes inference from the last state-dict tensor
    (/root/reference/lungmask/mask.py:56)."""
    return int(params["last"]["b"].shape[0])


def cast_params(params: Params, dtype: jnp.dtype) -> Params:
    """Cast all parameters (weights + folded affines) to ``dtype``."""
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)
