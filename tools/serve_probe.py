"""Serve-lane stage profiler: where an HTTP segmentation request spends time.

Runs the same workload as bench.py's serve section (uncompressed .nii uploads
of the synthetic 192x512^2 phantom, 3 concurrent clients against an in-process
server) and prints volumes/hour plus the per-volume stage breakdown from
``InferenceService.stats`` — spool/decode/preprocess/lock-wait/device/finish/
encode. Run it uncontended: on the 1-core bench host any concurrent process
inflates every host stage.

    PYTHONPATH=. python tools/serve_probe.py [N_VOLUMES] [THREADS]
"""

import json
import os
import sys
import tempfile
import threading
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["LUNGMASK_TPU_LOGLEVEL"] = "WARNING"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import numpy as np

    from bench import _synthetic_volume
    from lungmask_tpu.inferer import LMInferer
    from lungmask_tpu.io.image import MedicalImage
    from lungmask_tpu.io.loader import write_image
    from lungmask_tpu.models import convert, synthetic
    from lungmask_tpu.runtime import enable_compile_cache, prefault_host_heap
    from lungmask_tpu.runtime.serve import make_server

    enable_compile_cache()
    prefault_host_heap()

    vol = _synthetic_volume(192)
    with tempfile.TemporaryDirectory() as td:
        wpath = os.path.join(td, "w.npz")
        convert.save_npz(wpath, synthetic.threshold_params(n_classes=3))
        inferer = LMInferer(
            modelpath=wpath, tqdm_disable=True, postprocessing_mode="device"
        )
        t0 = time.perf_counter()
        inferer.apply(vol)  # compile + warm
        print(f"warm apply: {time.perf_counter() - t0:.2f}s", file=sys.stderr)

        p = os.path.join(td, "vol.nii")
        write_image(MedicalImage(vol), p)
        with open(p, "rb") as f:
            payload = f.read()

    httpd, service = make_server(inferer, port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = (
        f"http://127.0.0.1:{httpd.server_address[1]}/v1/segment"
        "?name=vol.nii&out=.nii"
    )
    # Transport-level failures only (connection refused/reset, timeouts) —
    # anything the SERVER saw, including non-200 replies, is already counted
    # in service.metrics()["errors"]; counting both double-books a failed
    # request. Guarded by the jobs lock (threads share the counter).
    transport_errors = [0]
    jobs = list(range(n))
    lock = threading.Lock()

    def client():
        while True:
            with lock:
                if not jobs:
                    return
                jobs.pop()
            try:
                req = urllib.request.Request(url, data=payload, method="POST")
                with urllib.request.urlopen(req, timeout=600) as r:
                    r.read()
            except urllib.error.HTTPError as e:
                # Server replied with an error status: the service already
                # counted it; just surface it for the log.
                print(f"server error reply: {e.code}", file=sys.stderr)
            except Exception as e:
                print(f"client error: {e!r}", file=sys.stderr)
                with lock:
                    transport_errors[0] += 1

    t0 = time.perf_counter()
    workers = [threading.Thread(target=client) for _ in range(threads)]
    for w in workers:
        w.start()
    for w in workers:
        w.join()
    wall = time.perf_counter() - t0
    httpd.shutdown()
    httpd.server_close()

    m = service.metrics()
    done = max(m["volumes_segmented"], 1)
    per_vol = {
        k: round(v / done, 3)
        for k, v in m.items()
        if k.endswith("_seconds")
    }
    print(
        json.dumps(
            {
                "volumes": n,
                "threads": threads,
                "errors": m["errors"],
                "transport_errors": transport_errors[0],
                "wall_s": round(wall, 2),
                "vph": round(n / wall * 3600.0, 1),
                "sec_per_vol_wall": round(wall / n, 3),
                "stages_per_vol": per_vol,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
