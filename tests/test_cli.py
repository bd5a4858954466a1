"""CLI end-to-end test (reference /root/reference/tests/test_cli.py shape):
in-process main() over a synthetic DICOM series, output round-trip."""

import numpy as np
import jax
import pytest

from lungmask_tpu.cli import main
from lungmask_tpu.io import dicom, loader
from lungmask_tpu.models import convert, unet


pytestmark = pytest.mark.slow  # deselect with -m "not slow" for the smoke tier

@pytest.fixture(scope="module")
def weights3(tmp_path_factory):
    params = unet.init_params(jax.random.PRNGKey(0), n_classes=3)
    p = str(tmp_path_factory.mktemp("w") / "synthetic3.npz")
    convert.save_npz(p, params, meta={"model": "synthetic3"})
    return p


@pytest.fixture(scope="module")
def dicom_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("series")
    rng = np.random.default_rng(3)
    series_uid = dicom.generate_uid()
    study_uid = dicom.generate_uid()
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    body = ((yy - h / 2) / (h * 0.35)) ** 2 + ((xx - w / 2) / (w * 0.3)) ** 2 < 1
    for i in range(2):
        arr = np.full((h, w), -1000, dtype=np.int16)
        arr[body] = 40 + rng.integers(-50, 50, size=int(body.sum())).astype(np.int16)
        dicom.write_slice(
            str(d / f"{i}.dcm"),
            arr,
            series_uid=series_uid,
            study_uid=study_uid,
            position=(0.0, 0.0, float(i)),
            tags={(0x0010, 0x0010): "Test^Patient", (0x0010, 0x0020): "ID001"},
        )
    return str(d)


def test_cli_end_to_end(tmp_path, dicom_dir, weights3):
    out = str(tmp_path / "testres.nii.gz")
    main([dicom_dir, out, "--modelpath", weights3, "--noprogress", "--batchsize", "2"])
    img = loader.load_input_image(out)
    assert img.size == (64, 64, 2)
    res = img.array
    assert res.dtype == np.uint8 or res.max() < 3
    assert res.shape == (2, 64, 64)


def test_cli_version(capsys):
    with pytest.raises(SystemExit) as exc:
        main(["--version"])
    assert exc.value.code == 0


def test_cli_missing_input_exits(tmp_path):
    with pytest.raises(SystemExit):
        main([str(tmp_path / "nope"), str(tmp_path / "out.nii.gz")])


def test_cli_fused_mode_end_to_end(tmp_path, dicom_dir, monkeypatch):
    """LTRCLobes_R231 through the CLI with synthetic weights injected for both
    models (real checkpoints are unavailable offline)."""
    from lungmask_tpu.models import registry

    w6 = unet.init_params(jax.random.PRNGKey(2), n_classes=6)
    w3 = unet.init_params(jax.random.PRNGKey(3), n_classes=3)

    def fake_get_model(modelname="R231", modelpath=None):
        params = w6 if modelname == "LTRCLobes" else w3
        return params, unet.n_classes_of(params)

    monkeypatch.setattr("lungmask_tpu.inferer.get_model", fake_get_model)
    out = str(tmp_path / "fused.nii.gz")
    main([dicom_dir, out, "--modelname", "LTRCLobes_R231", "--noprogress", "--batchsize", "2"])
    img = loader.load_input_image(out)
    assert img.size == (64, 64, 2)
    assert img.array.dtype == np.uint8


def test_compat_get_model(tmp_path, weights3):
    from lungmask_tpu import compat

    runner = compat.get_model("LTRCLobes", weights3)  # path overrides name
    assert runner.n_classes == 3
    out = runner.run_numpy(np.zeros((2, 64, 64), np.float32))
    assert out.shape == (2, 64, 64)


def test_cli_fused_forbids_modelpath(tmp_path, dicom_dir, weights3):
    out = str(tmp_path / "o.nii.gz")
    with pytest.raises(AssertionError):
        main(
            [dicom_dir, out, "--modelname", "LTRCLobes_R231", "--modelpath", weights3]
        )


def test_cli_warmup(tmp_path, monkeypatch):
    """--warmup runs the full pipeline on a synthetic phantom with no
    input/output arguments (tiny slice count to keep CPU compiles fast)."""
    import numpy as np

    from lungmask_tpu import cli
    from lungmask_tpu.models import convert, unet
    import jax

    w = str(tmp_path / "w.npz")
    convert.save_npz(w, jax.tree_util.tree_map(
        np.asarray, unet.init_params(jax.random.PRNGKey(0), 3)))
    cli.main(["--warmup", "2", "--modelpath", w, "--noprogress"])


def test_cli_requires_io_without_warmup():
    import pytest as _pytest

    from lungmask_tpu import cli

    with _pytest.raises(SystemExit):
        cli.main(["--noprogress"])


def test_cli_cohort_mode(tmp_path, dicom_dir, weights3):
    """--cohort streams a directory of volumes (a DICOM series subdir + a
    NIfTI file + a corrupt file) to OUTPUT/<name>_mask.nii.gz; the corrupt
    volume fails per-volume without aborting the run."""
    import shutil

    cohort_in = tmp_path / "cohort"
    cohort_in.mkdir()
    shutil.copytree(dicom_dir, cohort_in / "patient_a")
    vol = np.full((2, 48, 48), -1000, dtype=np.int16)
    vol[:, 12:36, 10:38] = 40
    from lungmask_tpu.io.image import MedicalImage

    loader.write_image(MedicalImage(array=vol), str(cohort_in / "patient_b.nii.gz"))
    (cohort_in / "patient_c.nii").write_bytes(b"not a nifti at all")
    out_dir = tmp_path / "masks"

    main(
        [
            str(cohort_in),
            str(out_dir),
            "--cohort",
            "--modelpath",
            weights3,
            "--noprogress",
            "--batchsize",
            "2",
        ]
    )
    a = loader.load_input_image(str(out_dir / "patient_a_mask.nii.gz"))
    assert a.array.shape == (2, 64, 64)
    b = loader.load_input_image(str(out_dir / "patient_b_mask.nii.gz"))
    assert b.array.shape == (2, 48, 48)
    assert not (out_dir / "patient_c_mask.nii.gz").exists()


def test_cli_cohort_rejects_non_directory(tmp_path, weights3):
    f = tmp_path / "single.nii"
    f.write_bytes(b"x")
    with pytest.raises(SystemExit):
        main([str(f), str(tmp_path / "out"), "--cohort", "--modelpath", weights3])


def test_cli_device_postprocessing(tmp_path, dicom_dir, weights3):
    out = str(tmp_path / "dev.nii.gz")
    main(
        [
            dicom_dir,
            out,
            "--modelpath",
            weights3,
            "--noprogress",
            "--batchsize",
            "2",
            "--postprocessing",
            "device",
        ]
    )
    img = loader.load_input_image(out)
    assert img.array.shape == (2, 64, 64)
