"""Multi-host (DCN) conformance: the product scan_batch path over a
jax.distributed global mesh (2 processes x 4 virtual CPU devices) must
produce exactly the single-process match tuples.

Reference analogue: none (the reference is single-threaded); this is the
SURVEY §5.8 DCN plan — corpus shards data-parallel across hosts,
database replicated, match buffers all_gather'd — exercised with real
multi-process collectives (the control plane and cross-process
collectives are the same code paths a TPU pod runs over DCN/ICI)."""

import json
import os
import socket
import subprocess
import sys

import pytest

import hyperscan_tpu as hs

sys.path.insert(0, os.path.dirname(__file__))
from multihost_worker import build_db, corpus_blocks  # noqa: E402

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_multihost_scan_batch_matches_single_process(tmp_path):
    # single-process reference through the same public entry point
    db = build_db(hs)
    blocks = corpus_blocks()
    ref = hs.scan_batch(db, blocks)
    assert sum(len(m) for m in ref) >= len(blocks)  # plants all found

    port = _free_port()
    out = str(tmp_path / "mh")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    # the dev image's sitecustomize registers a TPU-tunnel backend at
    # interpreter start when this is set, initializing the XLA backend
    # before jax.distributed can come up — the workers must be pure CPU
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, (so.decode()[-2000:], se.decode()[-2000:])

    for pid in range(2):
        with open(f"{out}.{pid}") as f:
            res = json.load(f)
        assert res["process_count"] == 2
        assert res["global_devices"] == 8
        assert res["local_devices"] == 4
        got = [[tuple(m) for m in ms] for ms in res["matches"]]
        assert got == ref, f"process {pid} diverged"
