"""Cohort streaming runtime tests."""

import os

import numpy as np
import pytest

import jax

from lungmask_tpu import LMInferer
from lungmask_tpu.io import nifti
from lungmask_tpu.io.image import MedicalImage
from lungmask_tpu.models import convert, unet
from lungmask_tpu.runtime.cohort import run_cohort


pytestmark = pytest.mark.slow  # deselect with -m "not slow" for the smoke tier

@pytest.fixture(scope="module")
def inferer(tmp_path_factory):
    params = unet.init_params(jax.random.PRNGKey(0), n_classes=3)
    p = str(tmp_path_factory.mktemp("w") / "w.npz")
    convert.save_npz(p, params)
    return LMInferer(modelpath=p, tqdm_disable=True, batch_size=4)


def _vol(seed, n=2, hw=64):
    rng = np.random.default_rng(seed)
    v = np.full((n, hw, hw), -1000, dtype=np.int16)
    yy, xx = np.mgrid[0:hw, 0:hw]
    body = ((yy - hw / 2) / (hw * 0.35)) ** 2 + ((xx - hw / 2) / (hw * 0.3)) ** 2 < 1
    v[:, body] = 40
    return v


def test_cohort_arrays(inferer):
    stats = run_cohort([_vol(i) for i in range(3)], inferer, keep_masks=True)
    assert len(stats.results) == 3
    assert all(r.error is None for r in stats.results)
    assert all(r.mask.shape == (2, 64, 64) for r in stats.results)
    assert stats.volumes_per_hour > 0


def test_cohort_writes_outputs(tmp_path, inferer):
    out = tmp_path / "masks"
    out.mkdir()
    vols = []
    for i in range(2):
        p = str(tmp_path / f"case{i}.nii.gz")
        nifti.write(MedicalImage(_vol(i)), p)
        vols.append(p)
    stats = run_cohort(vols, inferer, output_dir=str(out))
    assert all(r.error is None for r in stats.results)
    written = sorted(os.listdir(out))
    assert written == ["case0_mask.nii.gz", "case1_mask.nii.gz"]
    back = nifti.read(str(out / "case0_mask.nii.gz"))
    assert back.array.shape == (2, 64, 64)


def test_cohort_stress_order_preserved(inferer):
    """Many volumes through the 3-thread pipeline: results arrive complete and
    in submission order (the finisher consumes a FIFO queue)."""
    vols = [_vol(i) + i for i in range(8)]
    stats = run_cohort(vols, inferer, prefetch=3, keep_masks=True)
    assert [r.name for r in stats.results] == [f"volume{i:04d}" for i in range(8)]
    assert all(r.error is None for r in stats.results)


def test_profiler_trace_hook(tmp_path, monkeypatch):
    """The jax.profiler trace wrapper writes a trace dir when enabled and is a
    no-op otherwise."""
    import os

    from lungmask_tpu.utils.profiling import trace

    with trace("noop"):
        pass  # env unset → no-op

    monkeypatch.setenv("LUNGMASK_TPU_TRACE_DIR", str(tmp_path))
    import jax.numpy as jnp

    with trace("smoke"):
        jnp.ones(8).sum().block_until_ready()
    assert os.path.isdir(tmp_path / "smoke")
    assert any(os.scandir(tmp_path / "smoke"))


def test_cohort_skips_bad_volume(inferer, tmp_path):
    bad = str(tmp_path / "missing.nii.gz")
    stats = run_cohort([_vol(0), bad], inferer, keep_masks=True)
    assert len(stats.results) == 2
    errs = [r for r in stats.results if r.error is not None]
    assert len(errs) == 1 and "missing" in errs[0].name


def test_cohort_on_result_exception_does_not_hang(inferer):
    """A raising on_result callback must not kill the finisher thread (which
    would deadlock the bounded queue); the error lands on that result."""
    calls = []

    def bad_cb(res):
        calls.append(res.name)
        raise RuntimeError("observer crashed")

    stats = run_cohort(
        [_vol(i) for i in range(5)], inferer, on_result=bad_cb, keep_masks=True
    )
    assert len(stats.results) == 5
    assert len(calls) == 5
    assert all("on_result failed" in (r.error or "") for r in stats.results)
    assert all(r.mask is not None for r in stats.results)  # masks still produced


def test_cohort_duplicate_names_not_overwritten(tmp_path, inferer):
    """Two sources with the same basename must not clobber each other's
    output mask."""
    a = tmp_path / "patientA"
    b = tmp_path / "patientB"
    a.mkdir()
    b.mkdir()
    for d, seed in ((a, 1), (b, 2)):
        nifti.write(MedicalImage(_vol(seed)), str(d / "CT.nii.gz"))
    out = tmp_path / "out"
    out.mkdir()
    stats = run_cohort(
        [str(a / "CT.nii.gz"), str(b / "CT.nii.gz")], inferer, output_dir=str(out)
    )
    assert all(r.error is None for r in stats.results)
    written = sorted(os.listdir(out))
    assert len(written) == 2, written


def test_cohort_failing_source_iterator(inferer):
    """An exception from the sources iterable itself is recorded instead of
    silently truncating the cohort."""

    def gen():
        yield _vol(0)
        yield _vol(1)
        raise OSError("listing failed")

    stats = run_cohort(gen(), inferer)
    errors = [r for r in stats.results if r.error]
    assert len(stats.results) == 3
    assert len(errors) == 1 and "source iteration failed" in errors[0].error
