"""Multi-host (DCN) bring-up exercised for real: two localhost processes run
``jax.distributed.initialize`` over the CPU backend and check cohort sharding
determinism. The runtime forbidding sockets (or a broken distributed service)
skips rather than fails — but when the control plane works, the asserts are
strict."""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # deselect with -m "not slow" for the smoke tier

_WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
from lungmask_tpu.parallel import multihost

pid = int(sys.argv[1])
coord = sys.argv[2]
ok = multihost.initialize_multihost(
    coordinator_address=coord, num_processes=2, process_id=pid
)
assert ok, "initialize_multihost returned False in forced-multihost mode"
shard = multihost.shard_cohort([f"vol{i}" for i in range(7)])
print(
    "RESULT " + json.dumps(
        {
            "pid": pid,
            "process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "shard": shard,
        }
    )
)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_initialize_and_shard(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), coord],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    results = {}
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            if p.returncode != 0 and (
                "UNAVAILABLE" in err or "DEADLINE" in err or "permission" in err.lower()
            ):
                pytest.skip(f"distributed service unavailable in this runtime: {err[-300:]}")
            assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
            line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
            r = json.loads(line[len("RESULT "):])
            results[r["pid"]] = r
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    assert results[0]["process_count"] == 2
    assert results[1]["process_count"] == 2
    assert results[0]["process_index"] == 0
    assert results[1]["process_index"] == 1
    # Round-robin partition: deterministic, disjoint, complete.
    assert results[0]["shard"] == ["vol0", "vol2", "vol4", "vol6"]
    assert results[1]["shard"] == ["vol1", "vol3", "vol5"]


def test_shard_cohort_explicit_ids():
    from lungmask_tpu.parallel import multihost

    vols = list(range(10))
    shards = [
        multihost.shard_cohort(vols, process_id=i, process_count=3) for i in range(3)
    ]
    assert sorted(sum(shards, [])) == vols
    assert all(len(set(a) & set(b)) == 0 for a in shards for b in shards if a is not b)


def test_initialize_noop_single_host(monkeypatch):
    from lungmask_tpu.parallel import multihost

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert multihost.initialize_multihost() is False
