"""Throughput benchmark — hsbench analogue (reference: tools/hsbench).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures steady-state device scan throughput (GB/s) of the block-mode
engine over a batched corpus on the available accelerator. vs_baseline
compares against the reference's only published figure: the hsbench doc
sample of 19,241.10 Mbit/s ≈ 2.405 GB/s (doc/dev-reference/tools.rst:72).
"""

from __future__ import annotations

import json
import time

import numpy as np


BASELINE_GBPS = 19241.10 / 8 / 1000.0  # doc sample, Mbit/s → GB/s


def _patterns(n: int = 100):
    """Deterministic Snort-flavored ruleset: literals + classes + repeats."""
    rng = np.random.default_rng(42)
    pats, ids = [], []
    words = ["attack", "payload", "shell", "admin", "select", "union", "eval",
             "script", "passwd", "cookie", "token", "login", "root", "exec"]
    for i in range(n):
        k = i % 5
        if k == 0:
            w = words[i % len(words)]
            pats.append(w + str(i))
        elif k == 1:
            pats.append(rf"{words[i % len(words)]}[0-9]{{2,4}}z")
        elif k == 2:
            pats.append(rf"x{i}(GET|POST|PUT) /[a-z]+")
        elif k == 3:
            pats.append(rf"q{i}[a-f0-9]{{8}}")
        else:
            pats.append(rf"v{i}\.(exe|dll|bat)")
        ids.append(i)
    return pats, ids


def main() -> None:
    import jax
    import jax.numpy as jnp

    import hyperscan_tpu as hs
    from hyperscan_tpu.ops.dfa import dfa_scan_batch
    from hyperscan_tpu.ops.match import count_matches

    pats, ids = _patterns(100)
    db = hs.compile_multi(pats, ids=ids)

    # corpus: 64 blocks x 256 KiB of printable noise with planted matches
    B, L = 64, 256 * 1024
    rng = np.random.default_rng(7)
    data = rng.integers(32, 127, size=(B, L), dtype=np.uint8)
    for i in range(B):
        m = (b"attack0 " * 4) + b"union84xx"
        data[i, 1000 : 1000 + len(m)] = np.frombuffer(m, dtype=np.uint8)
    lengths = np.full((B,), L, dtype=np.int32)

    @jax.jit
    def step(tables, data, lengths):
        total = jnp.int32(0)
        for (trans, b2c, acc, acce, ss) in tables:
            accepts, _ = dfa_scan_batch(trans, b2c, acc, ss, data, lengths)
            total = total + count_matches(accepts)
        return total

    tables = tuple(
        (
            jnp.asarray(e.trans),
            jnp.asarray(e.byte_to_class.astype(np.int32)),
            jnp.asarray(e.accept_id),
            jnp.asarray(e.accept_eod_id),
            jnp.int32(e.start_state),
        )
        for e in db.engines
    )
    data_d = jnp.asarray(data)
    len_d = jnp.asarray(lengths)

    total = int(step(tables, data_d, len_d))  # warmup/compile
    assert total > 0, "benchmark corpus produced no matches"

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        step(tables, data_d, len_d).block_until_ready()
    dt = time.perf_counter() - t0

    gbps = (B * L * iters) / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "block scan throughput, 100-pattern DFA, single chip",
                "value": round(gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(gbps / BASELINE_GBPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
