"""HTTP serving lane: segment CT volumes over a REST endpoint.

The reference ships no serving surface at all (its only entry points are the
CLI, /root/reference/lungmask/__main__.py, and the LMInferer library API) —
this is a deployment extension for the TPU build, designed around the same
split-phase pipeline the cohort runtime uses (runtime/cohort.py): request
threads run host preprocessing/postprocessing concurrently while device
forwards serialize through one lock, so the accelerator stays busy without
ever interleaving programs.

Stdlib only (``http.server``) — no new dependencies. Start from the CLI::

    lungmask --serve 8080                       # or HOST:PORT
    lungmask --serve 8080 --modelname LTRCLobes_R231 --postprocessing device

Endpoints:

``GET /healthz``
    ``{"status": "ok", "model": ..., "backend": ...}`` — liveness + config.
``GET /v1/models``
    The model registry (name → n_classes), for clients picking a model.
``GET /metrics``
    JSON counters: requests, errors, volumes segmented, busy/total seconds.
``POST /v1/segment?name=<filename>&out=<ext>``
    Body is the volume file bytes. ``name`` names the upload (its extension
    selects the reader; defaults to ``volume.nii.gz``); a ``.zip`` upload is
    unpacked and scanned as a DICOM series directory. ``out`` selects the
    response format (default ``.nii.gz``); ``out=.dcm`` returns a zip of the
    output DICOM series. The response body is the mask file's bytes.
"""

from __future__ import annotations

import io
import json
import os
import shutil
import tempfile
import threading
import time
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple
from urllib.parse import parse_qs, urlparse

import numpy as np

from lungmask_tpu.logger import logger

# Single-file response formats (pair-writing formats like .mhd/.nhdr/.hdr
# would drop their data half; .dcm is special-cased to a zipped series).
_SINGLE_FILE_OUT = (".nii", ".nii.gz", ".mha", ".nrrd", ".gipl", ".vtk")


def _scratch_base(need_bytes: int, reserved_bytes: int = 0) -> Optional[str]:
    """Directory for a request's scratch files, preferring RAM over disk.

    Spooling bounds RSS (a request's bytes live in files, not Python
    buffers), but a disk-backed /tmp makes every request pay two full
    write+read passes (upload spool + response encode). tmpfs keeps the
    bound — the kernel accounts the pages and reclaims them on rmtree —
    without the disk IO. Falls back to the default temp dir when /dev/shm
    is absent (macOS, some containers) or too full for ~3x the upload.
    ``reserved_bytes`` is space already promised to in-flight requests
    (the free-space probe alone is check-then-use racy under concurrency).
    ``LUNGMASK_TPU_SERVE_SPOOL_DIR`` overrides (e.g. force disk spooling
    on RAM-tight hosts)."""
    override = os.environ.get("LUNGMASK_TPU_SERVE_SPOOL_DIR")
    if override:
        try:
            os.makedirs(override, exist_ok=True)
            return override
        except OSError as e:
            logger.warning(
                f"serve: LUNGMASK_TPU_SERVE_SPOOL_DIR={override!r} unusable "
                f"({e}); falling back to the default temp dir"
            )
            return None
    shm = "/dev/shm"
    try:
        if shutil.disk_usage(shm).free - reserved_bytes > need_bytes * 3 + (1 << 30):
            return shm
    except OSError:
        pass
    return None  # tempfile default


def _safe_name(name: str) -> str:
    """Sanitize a client-supplied upload name: it selects the decoder by
    extension and names the spool file, so it must not escape the scratch
    dir or smuggle path separators."""
    base = os.path.basename(name)
    if base in ("", ".", "..") or any(c in base for c in "/\\\x00"):
        return "volume.nii.gz"  # untrusted name must stay inside tmp
    return base


class InferenceService:
    """Thread-safe segmentation service around one :class:`LMInferer`.

    Host phases (decode, preprocess, postprocess, encode) run on the calling
    thread; the device forward is serialized by ``_device_lock`` — the same
    overlap structure as the cohort pipeline, driven by request threads
    instead of a fixed 3-stage crew.
    """

    def __init__(self, inferer, max_upload_mb: int = 2048):
        self.inferer = inferer
        # A 512-slice 512x512 int16 series is ~260 MB; 2 GB covers any real
        # CT upload while bounding what one request can make us buffer.
        self.max_upload_bytes = max_upload_mb * 1024 * 1024
        self._device_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        # Admission lock: serializes the RAM/tmpfs free-space probe with the
        # reservation update (check-then-reserve must be atomic under
        # concurrency). Dedicated lock — _scratch_base runs filesystem
        # syscalls (makedirs, disk_usage), and holding _stats_lock across
        # those would stall every _count() and the /metrics endpoint when a
        # spool filesystem is slow or hung.
        self._reserve_lock = threading.Lock()
        # tmpfs bytes promised to in-flight requests (see _scratch_base):
        # concurrent 2 GB uploads must not all pass the same free-space
        # probe and then ENOSPC each other mid-spool.
        self._scratch_reserved = 0
        self.stats = {
            "requests": 0,
            "errors": 0,
            "volumes_segmented": 0,
            "busy_seconds": 0.0,
            "device_seconds": 0.0,
            # Per-stage request breakdown (summed seconds) — the serving
            # lane's equivalent of CohortStats.stage_seconds: where a request
            # actually spends its time, and how long requests queue on the
            # device lock (lock_wait vs device = queueing vs compute).
            "spool_seconds": 0.0,
            "decode_seconds": 0.0,
            "preprocess_seconds": 0.0,
            "lock_wait_seconds": 0.0,
            "finish_seconds": 0.0,
            "encode_seconds": 0.0,
        }

    def _count(self, key, value=1):
        with self._stats_lock:
            self.stats[key] += value

    def segment_bytes(
        self, body: bytes, name: str, out_ext: str
    ) -> Tuple[bytes, str]:
        """Segment an in-memory upload (see :meth:`segment_stream`)."""
        return self.segment_stream(io.BytesIO(body), len(body), name, out_ext)

    def segment_stream(
        self, stream, length: int, name: str, out_ext: str
    ) -> Tuple[bytes, str]:
        """Segment an uploaded volume; returns (response bytes, content type).

        ``stream`` is read exactly ``length`` bytes and either buffered in
        memory (single-buffer formats, when the tmpfs RAM-admission probe +
        reservation passes — the same RAM the spool file would have used,
        minus two filesystem passes) or spooled to a scratch file (zip
        series, RAM-tight hosts). Either way the bytes a request may hold
        are bounded by the admission reservation, not by trust in clients.
        Raises ``ValueError`` for client errors (bad format/extension/bytes).
        """
        from lungmask_tpu.io import loader

        out_ext = out_ext.lower()
        if out_ext not in _SINGLE_FILE_OUT + (".dcm",):
            raise ValueError(
                f"out={out_ext!r} unsupported (supported: "
                f"{', '.join(_SINGLE_FILE_OUT)}, .dcm)"
            )
        t0 = time.monotonic()
        need = length * 3 + (1 << 30)
        safe = _safe_name(name)
        with self._reserve_lock:
            base = _scratch_base(length, self._scratch_reserved)
            reserved = need if base == "/dev/shm" else 0
            self._scratch_reserved += reserved
            # In-memory fast lane: when the upload's format decodes from a
            # single buffer AND RAM admission passed (the same probe that
            # would have put the spool file in tmpfs — identical RAM
            # footprint, the bytes just skip the filesystem), read the body
            # straight into a bytearray and decode zero-copy. Saves two
            # full passes over ~100 MB per request vs spool→file→read.
            in_memory = bool(reserved) and loader.supports_memory_io(safe)
        tmp = None
        try:
            if in_memory:
                buf = self._slurp(stream, length)
                t1 = time.monotonic()
                self._count("spool_seconds", t1 - t0)
                try:
                    image = loader.load_input_bytes(buf, safe)
                except ValueError:
                    raise
                except (OSError, EOFError, KeyError, IndexError) as e:
                    raise ValueError(f"could not decode {name!r}: {e}") from e
            else:
                tmp = tempfile.mkdtemp(prefix="lungmask_serve_", dir=base)
                src = self._materialize(stream, length, safe, tmp)
                t1 = time.monotonic()
                self._count("spool_seconds", t1 - t0)
                try:
                    image = loader.load_input_image(src)
                except ValueError:
                    raise
                except (OSError, EOFError, KeyError, IndexError) as e:
                    # Malformed upload bytes surface as format-specific
                    # errors (BadGzipFile, struct truncations, …) — client
                    # errors, not server faults.
                    raise ValueError(f"could not decode {name!r}: {e}") from e
            t2 = time.monotonic()
            self._count("decode_seconds", t2 - t1)
            pre = self.inferer.preprocess_image(image)
            t_dev = time.monotonic()
            self._count("preprocess_seconds", t_dev - t2)
            with self._device_lock:
                t_lock = time.monotonic()
                self._count("lock_wait_seconds", t_lock - t_dev)
                pred = self.inferer.forward_preprocessed(pre)
            t3 = time.monotonic()
            self._count("device_seconds", t3 - t_lock)
            mask = self.inferer.finish_forward(pre, pred)
            result = image.with_array(mask)
            result.metadata = {}
            t4 = time.monotonic()
            self._count("finish_seconds", t4 - t3)
            if loader.supports_memory_io(out_ext):
                payload = loader.encode_image_bytes(result, out_ext)
            else:
                if tmp is None:
                    tmp = tempfile.mkdtemp(prefix="lungmask_serve_", dir=base)
                payload = self._encode(result, out_ext, tmp)
            self._count("encode_seconds", time.monotonic() - t4)
            self._count("volumes_segmented")
            self._count("busy_seconds", time.monotonic() - t0)
            return payload, (
                "application/zip" if out_ext == ".dcm" else "application/octet-stream"
            )
        finally:
            if tmp is not None:
                shutil.rmtree(tmp, ignore_errors=True)
            if reserved:
                with self._reserve_lock:
                    self._scratch_reserved -= reserved

    def _slurp(self, stream, length: int) -> bytearray:
        """Read exactly ``length`` body bytes into one RAM buffer (in-memory
        fast lane — the buffer is what the decoder aliases, zero-copy)."""
        buf = bytearray(length)
        view = memoryview(buf)
        readinto = getattr(stream, "readinto", None)
        got = 0
        while got < length:
            window = view[got : got + (8 << 20)]
            if readinto is not None:
                n = readinto(window)
            else:
                chunk = stream.read(len(window))
                n = len(chunk)
                window[:n] = chunk
            if not n:
                raise ValueError(f"truncated upload ({got} of {length} bytes)")
            got += n
        return buf

    def _materialize(self, stream, length: int, name: str, tmp: str) -> str:
        """Spool the upload into ``tmp``; returns the path to load.
        ``name`` must already be sanitized (:func:`_safe_name`)."""
        base = name
        upload = os.path.join(tmp, "upload.bin" if base.lower().endswith(".zip") else base)
        remaining = length
        with open(upload, "wb") as f:
            while remaining > 0:
                # 8 MB chunks: a 100 MB upload is ~13 GIL round-trips instead
                # of 100 — under concurrent requests on a small host the
                # per-chunk Python overhead was measurable in spool_seconds.
                chunk = stream.read(min(remaining, 8 << 20))
                if not chunk:
                    raise ValueError(
                        f"truncated upload ({length - remaining} of {length} bytes)"
                    )
                f.write(chunk)
                remaining -= len(chunk)
        if not base.lower().endswith(".zip"):
            return upload
        series_dir = os.path.join(tmp, "series")
        os.makedirs(series_dir)
        try:
            with zipfile.ZipFile(upload) as zf:
                for i, info in enumerate(zf.infolist()):
                    # Flatten + sanitize: member paths from the client are
                    # untrusted; never let them escape the scratch dir.
                    # An index prefix keeps same-named leaves from
                    # different archive subdirectories distinct (the
                    # DICOM scan keys slices by UID/position, not name).
                    leaf = os.path.basename(info.filename)
                    if not leaf or info.is_dir():
                        continue
                    with zf.open(info) as f, open(
                        os.path.join(series_dir, f"{i:05d}_{leaf}"), "wb"
                    ) as o:
                        shutil.copyfileobj(f, o)
        except zipfile.BadZipFile as e:
            raise ValueError(f"bad zip upload: {e}") from e
        return series_dir

    def _encode(self, result, out_ext: str, tmp: str) -> bytes:
        from lungmask_tpu.io import loader

        if out_ext == ".dcm":
            out_dir = os.path.join(tmp, "out")
            os.makedirs(out_dir)
            loader.write_dicom_series(result, os.path.join(out_dir, "mask.dcm"))
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
                for leaf in sorted(os.listdir(out_dir)):
                    zf.write(os.path.join(out_dir, leaf), leaf)
            return buf.getvalue()
        out_path = os.path.join(tmp, "mask" + out_ext)
        loader.write_image(result, out_path)
        with open(out_path, "rb") as f:
            return f.read()

    def health(self) -> dict:
        import jax

        inf = self.inferer
        return {
            "status": "ok",
            "model": inf.modelname,
            "fillmodel": inf.fillmodel,
            "postprocessing_mode": getattr(inf, "postprocessing_mode", "exact"),
            "backend": jax.default_backend(),
        }

    def metrics(self) -> dict:
        with self._stats_lock:
            return dict(self.stats)


def _make_handler(service: InferenceService):
    class Handler(BaseHTTPRequestHandler):
        # Keep-alive so one client can stream a cohort of volumes over a
        # single connection (error replies opt out — see _reply).
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route to our logger, not stderr
            logger.info("serve: " + fmt % args)

        def _reply(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            if code >= 400:
                # Error replies may be sent without the request body fully
                # drained; keeping such a connection alive would desync the
                # next pipelined request.
                self.send_header("Connection", "close")
                self.close_connection = True
            self.end_headers()
            self.wfile.write(body)

        def _reply_json(self, code: int, obj) -> None:
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                self._reply_json(200, service.health())
            elif path == "/v1/models":
                from lungmask_tpu.models.registry import MODEL_URLS

                self._reply_json(
                    200, {k: {"n_classes": v[1]} for k, v in MODEL_URLS.items()}
                )
            elif path == "/metrics":
                self._reply_json(200, service.metrics())
            else:
                self._reply_json(404, {"error": f"no route {path}"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/v1/segment":
                self._reply_json(404, {"error": f"no route {url.path}"})
                return
            service._count("requests")
            q = parse_qs(url.query)
            name = q.get("name", ["volume.nii.gz"])[0]
            out_ext = q.get("out", [".nii.gz"])[0]
            if not out_ext.startswith("."):
                out_ext = "." + out_ext
            want_model = q.get("model", [None])[0]
            have = service.inferer.modelname
            if service.inferer.fillmodel:
                have = f"{have}_{service.inferer.fillmodel}"
            if want_model is not None and want_model != have:
                # One server binds one (possibly fused) model — routing a
                # request for another would silently return the wrong labels.
                service._count("errors")
                self._reply_json(
                    400,
                    {"error": f"this server runs model {have!r}, not "
                     f"{want_model!r} (start one with --modelname)"},
                )
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if length <= 0:
                    raise ValueError("empty request body")
                if length > service.max_upload_bytes:
                    service._count("errors")
                    self._reply_json(
                        413,
                        {
                            "error": f"upload of {length} bytes exceeds the "
                            f"{service.max_upload_bytes}-byte limit"
                        },
                    )
                    return
                payload, ctype = service.segment_stream(
                    self.rfile, length, name, out_ext
                )
                self._reply(200, payload, ctype)
            except ValueError as e:
                service._count("errors")
                logger.info(f"serve: rejected request: {e}")
                self._reply_json(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — a request must never kill the server
                service._count("errors")
                logger.warning(f"serve: internal error: {e!r}")
                self._reply_json(500, {"error": f"internal error: {e!r}"})

    return Handler


def make_server(
    inferer, host: str = "127.0.0.1", port: int = 8080, max_upload_mb: int = 2048
) -> Tuple[ThreadingHTTPServer, InferenceService]:
    """Build (but do not start) the HTTP server; port 0 picks a free port."""
    service = InferenceService(inferer, max_upload_mb=max_upload_mb)
    httpd = ThreadingHTTPServer((host, port), _make_handler(service))
    return httpd, service


def serve_forever(
    inferer, host: str = "127.0.0.1", port: int = 8080, warmup: Optional[int] = None
) -> None:
    """Blocking entry point used by ``lungmask --serve``."""
    if warmup:
        # Compile every device program before accepting traffic (first cold
        # compile on a fresh machine takes minutes — see docs/OPERATIONS.md).
        phantom = np.full((warmup, 64, 64), -1024, dtype=np.int16)
        phantom[:, 16:48, 16:48] = 40
        inferer.apply(phantom)
    httpd, _ = make_server(inferer, host, port)
    actual = httpd.server_address
    logger.info(f"serving on http://{actual[0]}:{actual[1]} (POST /v1/segment)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        logger.info("shutting down")
    finally:
        httpd.server_close()
