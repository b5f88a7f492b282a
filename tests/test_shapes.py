"""Jit-shape bucketing: a fresh database scanning mixed-size corpora
must compile a bounded number of kernel shapes.

Through the dev tunnel a fresh (engine, shape) pair costs 3-5 minutes of
remote compilation, so every device scan path pads its shape parameter
(teddy cells, DFA chunk groups, NFA tile groups, block counts) to the
canonical series {2^k, 3*2^(k-1)} — two shapes per octave, < 50%
worst-case padding. These tests pin (a) the series itself and (b) the compile
budget: scans spanning two orders of magnitude of corpus size may key at
most ~2 shapes per octave per engine family.
"""

import numpy as np
import pytest

import hyperscan_tpu as hs
from hyperscan_tpu.database import compile_patterns
from hyperscan_tpu.grey import Grey
from hyperscan_tpu.ops.teddy import bucket_up


def test_bucket_series():
    want = [1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64]
    got = sorted({bucket_up(n) for n in range(1, 65)})
    assert got == want
    for n in range(1, 4096):
        b = bucket_up(n)
        assert b >= n
        assert b <= -(-3 * n // 2)  # < 50% padding (worst: just past 2^k)


def _distinct_shapes(fn_cache):
    """Shape-relevant key tuples currently in an lru-cached jit factory."""
    return fn_cache.cache_info().currsize


def test_literal_device_shape_budget():
    """Mixed block sizes through the fused teddy path: the number of
    distinct compiled filter shapes stays logarithmic, not linear."""
    from hyperscan_tpu.ops import teddy as T

    T._jit_filter_confirm.cache_clear()
    db = compile_patterns(
        ["attack" + str(i) for i in range(50)],
        ids=list(range(50)),
        grey=Grey(host_scan_limit=0),  # force the device (interpret) path
    )
    rng = np.random.default_rng(11)
    sizes = sorted(rng.integers(1 << 10, 1 << 17, size=40).tolist())
    for n in sizes:
        data = (32 + rng.integers(0, 95, size=n)).astype(np.uint8)
        data[100:107] = np.frombuffer(b"attack3", np.uint8)
        ms = hs.scan(db, data.tobytes())
        assert any(m[0] == 3 for m in ms)
    # 1 KiB..128 KiB spans cells 1..16: buckets {1,2,3,4,6,8,12,16} = 8,
    # x <=2 capacity-learning steps observed in practice
    n_shapes = _distinct_shapes(T._jit_filter_confirm)
    assert n_shapes <= 12, n_shapes


def test_dfa_device_shape_budget():
    """Mixed block sizes through the DFA chunk kernel: bucketed groups."""
    from hyperscan_tpu.ops import dfa_kernel as D

    D._jit_scan.cache_clear()
    db = compile_patterns(
        [r"[0-9]{3}-[0-9]{4}"],  # no literal factor -> general engine
        grey=Grey(host_scan_limit=0),
    )
    rng = np.random.default_rng(12)
    for n in sorted(rng.integers(1 << 12, 1 << 18, size=25).tolist()):
        data = (97 + rng.integers(0, 26, size=n)).astype(np.uint8)
        data[50:58] = np.frombuffer(b"555-1212", np.uint8)
        ms = hs.scan(db, data.tobytes())
        assert any(m[2] == 58 for m in ms)
    n_shapes = _distinct_shapes(D._jit_scan)
    assert n_shapes <= 12, n_shapes


def test_batched_scan_shape_budget():
    """scan_batch with varying batch sizes and block lengths must not
    key one compile per (batch, length) combination."""
    from hyperscan_tpu.ops import teddy as T

    T._jit_filter_confirm.cache_clear()
    db = compile_patterns(["needle"], grey=Grey(host_scan_limit=0))
    rng = np.random.default_rng(13)
    for bsz in (1, 2, 3, 5, 7, 9, 12):
        blocks = []
        for _ in range(bsz):
            n = int(rng.integers(1 << 10, 1 << 14))
            d = (32 + rng.integers(0, 95, size=n)).astype(np.uint8)
            d[10:16] = np.frombuffer(b"needle", np.uint8)
            blocks.append(d.tobytes())
        outs = hs.scan_batch(db, blocks)
        assert all(any(m[0] == 0 for m in o) for o in outs)
    n_shapes = _distinct_shapes(T._jit_filter_confirm)
    assert n_shapes <= 10, n_shapes
