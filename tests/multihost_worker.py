"""Worker process for the multi-host (DCN) test: one of N jax.distributed
processes running the product scan_batch path over a global mesh.

Launched by tests/test_multihost.py with argv:
    process_id coordinator_port out_path
Environment (set by the parent): JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=<local devices>.
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corpus_blocks():
    import numpy as np

    rng = np.random.default_rng(123)
    blocks = []
    plants = [b"attack7 ", b"payload3x99z", b"sig5hit "]
    for b in range(16):
        blob = bytearray(
            (32 + rng.integers(0, 95, 700)).astype(np.uint8).tobytes())
        p = plants[b % len(plants)]
        off = 37 + 11 * b
        blob[off:off + len(p)] = p
        blocks.append(bytes(blob))
    return blocks


def build_db(hs):
    pats = ["attack7", r"payload3x[0-9]{2}z", "sig5hit", r"q9(ab|cd)*end9"]
    return hs.compile_multi(pats, ids=[1, 2, 3, 4])


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]

    from hyperscan_tpu.parallel.sharded import make_multihost_mesh

    mesh = make_multihost_mesh(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    import jax

    import hyperscan_tpu as hs

    db = build_db(hs)
    blocks = corpus_blocks()
    out = hs.scan_batch(db, blocks, mesh=mesh)
    result = {
        "process_id": pid,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "matches": [[list(m) for m in ms] for ms in out],
    }
    with open(f"{out_path}.{pid}", "w") as f:
        json.dump(result, f)
    print(f"[worker {pid}] done", flush=True)


if __name__ == "__main__":
    main()
