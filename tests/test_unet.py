"""U-Net forward parity: JAX implementation vs a torch oracle.

The oracle below is written fresh from the architecture spec (SURVEY §2 rows
7-9: conv3x3→ReLU→BN ×2 blocks, avg-pool downsampling, bilinear-2×+1×1-conv
upsampling, skip concat, 1×1 classifier + log-softmax) and emits state-dict
keys in the same layout as the reference checkpoints, so it exercises
``convert_state_dict`` exactly as a real ``.pth`` would — including the dead
``residual_*`` tensors that the converter must drop.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lungmask_tpu.models import convert, unet  # noqa: E402


def _conv_block_seq(cin, cout):
    return nn.Sequential(
        nn.Conv2d(cin, cout, 3, padding=1),
        nn.ReLU(),
        nn.BatchNorm2d(cout),
        nn.Conv2d(cout, cout, 3, padding=1),
        nn.ReLU(),
        nn.BatchNorm2d(cout),
    )


class _DownBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        # Dead tensors present in shipped checkpoints (converter must ignore).
        self.residual_input_conv = nn.Conv2d(cin, cout, 1)
        self.residual_batchnorm = nn.BatchNorm2d(cout)
        self.block = _conv_block_seq(cin, cout)

    def forward(self, x):
        return self.block(x)


class _UpBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.residual_input_conv = nn.Conv2d(cin, cout, 1)
        self.residual_batchnorm = nn.BatchNorm2d(cout)
        self.up = nn.Sequential(
            nn.Upsample(mode="bilinear", scale_factor=2),
            nn.Conv2d(cin, cout, 1),
        )
        self.conv_block = _DownBlock(cin, cout)

    def forward(self, x, skip):
        u = self.up(x)
        return self.conv_block(torch.cat([u, skip], 1))


class TorchOracleUNet(nn.Module):
    """Production-config U-Net oracle (in=1, depth=5, wf=6, padding, BN,
    upsample mode, non-residual)."""

    def __init__(self, n_classes, depth=5, wf=6):
        super().__init__()
        chans = [2 ** (wf + i) for i in range(depth)]
        self.down_path = nn.ModuleList()
        prev = 1
        for c in chans:
            self.down_path.append(_DownBlock(prev, c))
            prev = c
        self.up_path = nn.ModuleList()
        for c in reversed(chans[:-1]):
            self.up_path.append(_UpBlock(prev, c))
            prev = c
        self.last = nn.Conv2d(prev, n_classes, 1)

    def forward(self, x):
        skips = []
        for i, d in enumerate(self.down_path):
            x = d(x)
            if i != len(self.down_path) - 1:
                skips.append(x)
                x = F.avg_pool2d(x, 2)
        for i, u in enumerate(self.up_path):
            x = u(x, skips[-i - 1])
        return F.log_softmax(self.last(x), dim=1)


def _randomized_oracle(n_classes, seed=0, wf=6):
    torch.manual_seed(seed)
    model = TorchOracleUNet(n_classes, wf=wf)
    # Randomize BN running stats so folding is actually exercised.
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
    model.eval()
    return model


@pytest.fixture(scope="module")
def oracle_and_params():
    # wf=4 keeps the smoke tier fast; parity is width-independent (the
    # converter and forward are channel-count generic), and the full wf=6
    # production width stays covered by the slow-tier tests below.
    model = _randomized_oracle(n_classes=3, wf=4)
    sd = {k: v for k, v in model.state_dict().items()}
    params = convert.convert_state_dict(sd)
    return model, params


def test_n_classes_inference(oracle_and_params):
    model, params = oracle_and_params
    sd = model.state_dict()
    assert convert.infer_n_classes(sd) == 3
    assert unet.n_classes_of(params) == 3


def test_forward_parity_small(oracle_and_params):
    """Log-prob parity on a 64² input (fast, CPU)."""
    model, params = oracle_and_params
    rng = np.random.default_rng(0)
    # Realistic normalized-HU range [0, 1] (reference mask.py:167-168).
    x = rng.uniform(0.0, 1.0, size=(2, 64, 64, 1)).astype(np.float32)

    with torch.inference_mode():
        ref = model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))  # NCHW → NHWC

    got = np.asarray(unet.unet_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.slow  # production-resolution forward on 1 CPU core
def test_argmax_parity_256():
    """Class-decision parity at the production 256² resolution and the full
    production width (wf=6)."""
    model = _randomized_oracle(n_classes=3)
    params = convert.convert_state_dict(dict(model.state_dict()))
    rng = np.random.default_rng(1)
    x = rng.uniform(0.0, 1.0, size=(1, 256, 256, 1)).astype(np.float32)

    with torch.inference_mode():
        ref = model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ref_cls = np.argmax(ref, axis=1)[0]

    got_cls = np.asarray(unet.unet_argmax(params, jnp.asarray(x)))[0]
    # Allow a tiny number of tie-flips at class boundaries from float
    # reassociation; in practice this is 0 on CPU.
    mismatch = np.mean(got_cls != ref_cls)
    assert mismatch < 1e-4, f"argmax mismatch fraction {mismatch}"


def test_npz_roundtrip(tmp_path, oracle_and_params):
    _, params = oracle_and_params
    path = str(tmp_path / "weights.npz")
    convert.save_npz(path, params, meta={"model": "test"})
    loaded, meta = convert.load_npz(path)
    assert meta["model"] == "test"
    flat_a = convert.flatten_params(params)
    flat_b = convert.flatten_params(loaded)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_init_params_shapes_small():
    """Structure/dtype checks on a narrow config (wf-generic code).

    Runs under jax.eval_shape — shape semantics are identical to a real
    call but nothing compiles or executes, keeping this in the smoke tier
    (the executed forward is covered by test_forward_parity_small and the
    slow-tier full-width variant)."""
    params = jax.eval_shape(
        lambda: unet.init_params(jax.random.PRNGKey(0), n_classes=6, wf=3)
    )
    assert unet.n_classes_of(params) == 6
    assert params["down"][0]["conv1"]["w"].shape == (3, 3, 1, 8)
    assert params["down"][4]["conv2"]["w"].shape == (3, 3, 128, 128)
    assert params["up"][0]["proj"]["w"].shape == (1, 1, 128, 64)
    assert params["last"]["w"].shape == (1, 1, 8, 6)
    out = jax.eval_shape(unet.unet_argmax, params, jnp.zeros((1, 64, 64, 1)))
    assert out.shape == (1, 64, 64)
    assert out.dtype == jnp.uint8


@pytest.mark.slow  # full-width random init is ~25 s of PRNG compiles on 1 core
def test_init_params_shapes():
    params = unet.init_params(jax.random.PRNGKey(0), n_classes=6)
    assert unet.n_classes_of(params) == 6
    assert params["down"][0]["conv1"]["w"].shape == (3, 3, 1, 64)
    assert params["down"][4]["conv2"]["w"].shape == (3, 3, 1024, 1024)
    assert params["up"][0]["proj"]["w"].shape == (1, 1, 1024, 512)
    assert params["up"][0]["conv_block"]["conv1"]["w"].shape == (3, 3, 1024, 512)
    assert params["last"]["w"].shape == (1, 1, 64, 6)
    out = unet.unet_argmax(params, jnp.zeros((1, 64, 64, 1)))
    assert out.shape == (1, 64, 64)
    assert out.dtype == jnp.uint8


@pytest.mark.slow
def test_bfloat16_path_agrees():
    """bf16 MXU path must agree with f32 on the overwhelming majority of pixels."""
    params = unet.init_params(jax.random.PRNGKey(2), n_classes=3)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 1))
    a = np.asarray(unet.unet_argmax(params, x))
    b = np.asarray(unet.unet_argmax(params, x, compute_dtype=jnp.bfloat16))
    assert np.mean(a != b) < 0.02


def test_up_proj_fused_matches_two_step():
    """The fused bilinear-upsample+projection conv (models/unet._up_proj_fused,
    the bf16 production path) must match resize-then-1x1-conv to f32 rounding,
    including the edge-replication taps (constant input stays constant)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 12, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((1, 1, 8, 4)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((4,)), jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    two = np.asarray(unet._conv(unet._bilinear_up2(x), w, b, precision=hi))
    fused = np.asarray(unet._up_proj_fused(x, w, b, precision=hi))
    assert fused.shape == two.shape
    np.testing.assert_allclose(fused, two, atol=5e-6, rtol=1e-5)

    xc = jnp.full((1, 8, 8, 3), 2.5, jnp.float32)
    wc = jnp.asarray(rng.standard_normal((1, 1, 3, 2)), jnp.float32)
    fc = np.asarray(unet._up_proj_fused(xc, wc, jnp.zeros((2,), jnp.float32), precision=hi))
    # edge clamp: constant in -> spatially constant out (per channel)
    assert float(np.ptp(fc, axis=(0, 1, 2)).max()) < 1e-5
