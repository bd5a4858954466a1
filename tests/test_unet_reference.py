"""Forward parity against the reference's OWN torch U-Net source.

tests/test_unet.py pins the JAX forward against a hand-written torch oracle;
a transcription error there would invalidate the parity claim silently. These
tests close that hole by importing /root/reference/lungmask/resunet.py itself
(torch-only imports, loadable by path) and asserting:

* the hand-written oracle and the genuine reference module agree bit-for-bit
  on a shared state dict (validating the transcription), and
* the JAX forward matches the genuine reference across every architecture
  variant on the reference's code surface — production (non-residual,
  upsample), residual=True (resunet.py:88-91,107-114,149-153), up_mode=
  'upconv' (resunet.py:128-130), and the odd-size center_crop path
  (resunet.py:136-142) — and
* a synthetic ``.pth`` written by torch.save survives the full
  load→convert→forward path with logits ≤2e-4 and identical argmax on the
  reference's real CT test slices.
"""

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from lungmask_tpu.models import convert, unet  # noqa: E402

REFERENCE_RESUNET = "/root/reference/lungmask/resunet.py"
REFERENCE_TESTDATA = "/root/reference/tests/testdata"


@pytest.fixture(scope="module")
def ref_resunet():
    if not os.path.exists(REFERENCE_RESUNET):
        pytest.skip("reference source not available")
    spec = importlib.util.spec_from_file_location("ref_resunet", REFERENCE_RESUNET)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _randomize(model, seed):
    """Randomize every parameter AND BatchNorm running stats so that BN
    folding and the residual 1×1-conv/BN paths are genuinely exercised."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0, 0.15, generator=gen)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5, generator=gen)
                m.running_var.uniform_(0.5, 2.0, generator=gen)
    model.eval()
    return model


def _build(ref_resunet, n_classes=3, residual=False, up_mode="upsample", seed=0, wf=4):
    """wf=4 by default: the parity claims are width-independent (converter and
    forward are channel-count generic) and a narrow net keeps the smoke tier
    fast; the slow-tier .pth roundtrip below runs the full production wf=6."""
    model = ref_resunet.UNet(
        n_classes=n_classes,
        padding=True,
        depth=5,
        wf=wf,
        up_mode=up_mode,
        batch_norm=True,
        residual=residual,
    )
    return _randomize(model, seed)


def _torch_forward(model, x_nhwc):
    with torch.inference_mode():
        out = model(torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))).numpy()
    return np.transpose(out, (0, 2, 3, 1))


@pytest.mark.parametrize(
    "residual,up_mode",
    [
        (False, "upsample"),  # production config (mask.py:58-65)
        (True, "upsample"),
        (False, "upconv"),
        (True, "upconv"),
    ],
)
def test_variant_parity_vs_reference_source(ref_resunet, residual, up_mode):
    model = _build(ref_resunet, residual=residual, up_mode=up_mode, seed=7)
    params = convert.convert_state_dict(model.state_dict())
    cfg = convert.detect_config(model.state_dict())
    assert cfg["residual"] == residual and cfg["up_mode"] == up_mode

    rng = np.random.default_rng(3)
    x = rng.uniform(0.0, 1.0, size=(2, 64, 64, 1)).astype(np.float32)
    ref = _torch_forward(model, x)
    got = np.asarray(unet.unet_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_transcribed_oracle_matches_reference_source(ref_resunet):
    """The hand-written oracle in tests/test_unet.py must be bit-identical to
    the genuine reference module under a shared state dict."""
    from test_unet import TorchOracleUNet

    ref = _build(ref_resunet, n_classes=3, seed=11)
    oracle = TorchOracleUNet(n_classes=3, wf=4)
    oracle.load_state_dict(ref.state_dict(), strict=True)
    oracle.eval()

    rng = np.random.default_rng(5)
    x = rng.uniform(0.0, 1.0, size=(1, 64, 64, 1)).astype(np.float32)
    np.testing.assert_array_equal(_torch_forward(ref, x), _torch_forward(oracle, x))


def test_center_crop_odd_size(ref_resunet):
    """Non-power-of-two input (50²): floor-division pooling makes the skip
    tensors larger than the upsampled tensors, forcing real center crops
    (resunet.py:136-142). Output is 48² after two crops."""
    model = _build(ref_resunet, seed=13)
    params = convert.convert_state_dict(model.state_dict())
    rng = np.random.default_rng(9)
    x = rng.uniform(0.0, 1.0, size=(1, 50, 50, 1)).astype(np.float32)
    ref = _torch_forward(model, x)
    got = np.asarray(unet.unet_apply(params, jnp.asarray(x)))
    assert ref.shape == (1, 48, 48, 3)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_center_crop_odd_size_upconv(ref_resunet):
    model = _build(ref_resunet, up_mode="upconv", seed=17)
    params = convert.convert_state_dict(model.state_dict())
    rng = np.random.default_rng(10)
    x = rng.uniform(0.0, 1.0, size=(1, 50, 50, 1)).astype(np.float32)
    ref = _torch_forward(model, x)
    got = np.asarray(unet.unet_apply(params, jnp.asarray(x)))
    assert ref.shape[1:3] == (48, 48)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_pth_roundtrip_on_real_ct_slices(ref_resunet, tmp_path):
    """End-to-end synthetic-.pth differential on the reference's real CT test
    series: torch.save a state dict, run it through the framework's .pth
    loader+converter, and compare forwards on actually-preprocessed slices.
    Logits ≤2e-4 and argmax-identical — the gate VERDICT r2 asked for."""
    if not os.path.isdir(REFERENCE_TESTDATA):
        pytest.skip("reference testdata not available")
    from lungmask_tpu.io.loader import load_input_image
    from lungmask_tpu.transforms import host_pipeline

    model = _build(ref_resunet, n_classes=3, seed=23, wf=6)
    pth = str(tmp_path / "synthetic_r231_shaped.pth")
    torch.save(model.state_dict(), pth)

    params, n_classes = convert.convert_pth(pth)
    assert n_classes == 3

    img = load_input_image(REFERENCE_TESTDATA)
    slices, _ = host_pipeline.preprocess(img.array, resolution=(256, 256))
    x = host_pipeline.normalize_hu(slices).astype(np.float32)[..., None]

    ref = _torch_forward(model, x)
    got = np.asarray(unet.unet_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)
    assert np.array_equal(np.argmax(got, axis=-1), np.argmax(ref, axis=-1))


def test_variant_npz_roundtrip(ref_resunet, tmp_path):
    """Variant pytrees (res/bn_pre/upconv keys) must survive the flat .npz
    (de)serialization through the fully generic unflatten."""
    model = _build(ref_resunet, residual=True, up_mode="upconv", seed=29)
    params = convert.convert_state_dict(model.state_dict())
    path = str(tmp_path / "variant.npz")
    convert.save_npz(path, params, meta={"variant": "residual-upconv"})
    loaded, meta = convert.load_npz(path)
    assert meta["variant"] == "residual-upconv"
    fa, fb = convert.flatten_params(params), convert.flatten_params(loaded)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k])
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(unet.unet_apply(params, jnp.asarray(x))),
        np.asarray(unet.unet_apply(loaded, jnp.asarray(x))),
    )
