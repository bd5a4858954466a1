"""HTTP serving lane tests (runtime/serve.py).

The reference has no serving surface (CLI + library only); these gate the
TPU build's REST extension: health/models/metrics routes, volume upload →
mask download round-trips (single-file formats, zipped DICOM series in and
out), client-error mapping, and concurrent requests against one service.
"""

import io
import json
import threading
import urllib.error
import urllib.request
import zipfile

import numpy as np
import pytest

import jax

from lungmask_tpu import LMInferer
from lungmask_tpu.models import convert, unet
from lungmask_tpu.runtime.serve import make_server

pytestmark = pytest.mark.slow  # deselect with -m "not slow" for the smoke tier


@pytest.fixture(scope="module")
def server():
    params = unet.init_params(jax.random.PRNGKey(0), n_classes=3)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        w = os.path.join(d, "w3.npz")
        convert.save_npz(w, params, meta={})
        inferer = LMInferer(modelpath=w, tqdm_disable=True, batch_size=2)
        httpd, service = make_server(inferer, port=0)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        try:
            yield f"http://127.0.0.1:{httpd.server_address[1]}", service
        finally:
            httpd.shutdown()
            httpd.server_close()


def _get(url):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def _testvol(n=2, h=64, w=64):
    vol = np.full((n, h, w), -1000, dtype=np.int16)
    yy, xx = np.mgrid[0:h, 0:w]
    body = ((yy - h / 2) / (h * 0.35)) ** 2 + ((xx - w / 2) / (w * 0.3)) ** 2 < 1
    vol[:, body] = 40
    return vol


def _nii_bytes(vol, tmp_path, name="v.nii.gz"):
    from lungmask_tpu.io import loader
    from lungmask_tpu.io.image import MedicalImage

    p = str(tmp_path / name)
    loader.write_image(MedicalImage(vol), p)
    with open(p, "rb") as f:
        return f.read()


def test_health_models_metrics(server):
    base, service = server
    status, health = _get(base + "/healthz")
    assert status == 200 and health["status"] == "ok"
    status, models = _get(base + "/v1/models")
    assert status == 200 and models["R231"]["n_classes"] == 3
    status, metrics = _get(base + "/metrics")
    assert status == 200 and "volumes_segmented" in metrics
    status, err = _get(base + "/nope")
    assert status == 404


def test_segment_nii_roundtrip(server, tmp_path):
    base, service = server
    vol = _testvol()
    status, body, ctype = _post(
        base + "/v1/segment?name=v.nii.gz", _nii_bytes(vol, tmp_path)
    )
    assert status == 200, body
    assert ctype == "application/octet-stream"
    out = tmp_path / "mask.nii.gz"
    out.write_bytes(body)
    from lungmask_tpu.io import loader

    mask = loader.load_input_image(str(out))
    assert mask.array.shape == vol.shape
    assert mask.array.dtype == np.uint8
    assert service.metrics()["volumes_segmented"] >= 1


def test_segment_zip_dicom_in_dcm_zip_out(server, tmp_path):
    """Zipped DICOM series upload → zipped DICOM series response."""
    base, _ = server
    from lungmask_tpu.io import dicom

    vol = _testvol()
    suid, stuid = dicom.generate_uid(), dicom.generate_uid()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for i in range(vol.shape[0]):
            p = str(tmp_path / f"{i}.dcm")
            dicom.write_slice(
                p, vol[i], series_uid=suid, study_uid=stuid,
                position=(0.0, 0.0, float(i)),
            )
            zf.write(p, f"{i}.dcm")
    status, body, ctype = _post(
        base + "/v1/segment?name=series.zip&out=.dcm", buf.getvalue()
    )
    assert status == 200, body
    assert ctype == "application/zip"
    with zipfile.ZipFile(io.BytesIO(body)) as zf:
        names = zf.namelist()
        assert len(names) == vol.shape[0]
        assert all(n.endswith(".dcm") for n in names)


def test_segment_client_errors(server, tmp_path):
    base, service = server
    before = service.metrics()["errors"]
    # Unsupported output extension
    status, body, _ = _post(
        base + "/v1/segment?out=.xyz", _nii_bytes(_testvol(), tmp_path)
    )
    assert status == 400 and b"unsupported" in body
    # Garbage bytes under a known extension
    status, body, _ = _post(base + "/v1/segment?name=v.nii.gz", b"not a nifti")
    assert status == 400
    # Bad zip
    status, body, _ = _post(base + "/v1/segment?name=s.zip", b"PK\x00\x00nope")
    assert status == 400 and b"zip" in body.lower()
    # Empty body
    status, body, _ = _post(base + "/v1/segment?name=v.nii.gz", b"")
    assert status == 400
    # Wrong route
    status, body, _ = _post(base + "/v2/segment", b"x")
    assert status == 404
    # Model mismatch: one server binds one model
    status, body, _ = _post(
        base + "/v1/segment?model=LTRCLobes", _nii_bytes(_testvol(), tmp_path)
    )
    assert status == 400 and b"this server runs" in body
    # Oversized upload (cap the service low for the check, restore after)
    orig_cap = service.max_upload_bytes
    try:
        service.max_upload_bytes = 16
        status, body, _ = _post(
            base + "/v1/segment?name=v.nii.gz", b"x" * 64
        )
        assert status == 413 and b"limit" in body
    finally:
        service.max_upload_bytes = orig_cap
    assert service.metrics()["errors"] >= before + 6


def test_hostile_name_and_truncated_stream(server, tmp_path):
    """A traversal-shaped name must stay inside the scratch dir (falls back
    to the default name → decode error, never an escape), and a stream
    shorter than its declared length is a 400."""
    base, service = server
    status, body, _ = _post(base + "/v1/segment?name=..", b"\x00" * 64)
    assert status == 400  # treated as volume.nii.gz → decode error

    class Short:
        def __init__(self, data):
            self.data, self.pos = data, 0

        def read(self, n):
            chunk = self.data[self.pos : self.pos + n]
            self.pos += len(chunk)
            return chunk

    with pytest.raises(ValueError, match="truncated"):
        service.segment_stream(Short(b"abc"), 100, "v.nii.gz", ".nii.gz")


def test_memory_lane_matches_spool_lane(server, tmp_path, monkeypatch):
    """The in-memory fast lane (.nii straight from the socket buffer, reply
    encoded without a temp file) must return the same voxels as the
    spool-to-scratch lane (forced via LUNGMASK_TPU_SERVE_SPOOL_DIR)."""
    base, service = server
    from lungmask_tpu.io import loader

    masks = {}
    for lane in ("memory", "spool"):
        if lane == "spool":
            monkeypatch.setenv("LUNGMASK_TPU_SERVE_SPOOL_DIR", str(tmp_path / "sp"))
        else:
            monkeypatch.delenv("LUNGMASK_TPU_SERVE_SPOOL_DIR", raising=False)
        for up_ext, out_ext in ((".nii", ".nii"), (".nii.gz", ".nii.gz")):
            payload = _nii_bytes(_testvol(), tmp_path, name=f"v{up_ext}")
            status, body, _ = _post(
                base + f"/v1/segment?name=v{up_ext}&out={out_ext}", payload
            )
            assert status == 200, body
            p = tmp_path / f"m_{lane}{out_ext}"
            p.write_bytes(body)
            masks[(lane, up_ext)] = loader.load_input_image(str(p)).array
    for up_ext in (".nii", ".nii.gz"):
        np.testing.assert_array_equal(
            masks[("memory", up_ext)], masks[("spool", up_ext)]
        )


def test_concurrent_requests_identical(server, tmp_path):
    """Two simultaneous uploads of the same volume return identical masks —
    the device lock serializes forwards; host phases overlap."""
    base, _ = server
    payload = _nii_bytes(_testvol(), tmp_path)
    results = [None, None]

    def hit(i):
        results[i] = _post(base + "/v1/segment?name=v.nii.gz", payload)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 for r in results)
    # Compare decoded voxels, not raw bytes — the gzip header in .nii.gz
    # embeds a timestamp, so byte-identity across requests is not guaranteed.
    from lungmask_tpu.io import loader

    masks = []
    for i, r in enumerate(results):
        p = tmp_path / f"res{i}.nii.gz"
        p.write_bytes(r[1])
        masks.append(loader.load_input_image(str(p)).array)
    np.testing.assert_array_equal(masks[0], masks[1])
