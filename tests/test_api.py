"""End-to-end public API tests: compile → device scan → match tuples,
differentially against the NFA oracle (reference strategy:
unit/hyperscan/single.cpp + multi.cpp through the public API only)."""

import numpy as np
import pytest

import hyperscan_tpu as hs
from hyperscan_tpu.compiler.parser import parse
from hyperscan_tpu.compiler.glushkov import build_nfa
from hyperscan_tpu.utils.oracle import nfa_match_ends

from test_frontend import CORPORA, RE_PATTERNS, ANCHOR_PATTERNS

ALL_PATTERNS = RE_PATTERNS + ANCHOR_PATTERNS


def oracle_matches(patterns, data):
    want = set()
    for (pid, (p, f)) in enumerate(patterns):
        g = build_nfa(parse(p, f))
        want |= {(pid, 0, e) for e in nfa_match_ends(g, data)}
    return want


@pytest.mark.parametrize("pattern,flags", ALL_PATTERNS[::3])
def test_scan_single(pattern, flags):
    db = hs.compile(pattern, flags | hs.HS_FLAG_ALLOWEMPTY)
    for data in CORPORA:
        got = set(hs.scan(db, data))
        want = oracle_matches([(pattern, flags)], data)
        want = {(0, f, t) for (_e, f, t) in want}
        assert got == want, f"{pattern!r} on {data!r}"


def test_scan_multi_ids():
    pats = [r"abc", r"a.c", r"[abc]{3}", r"\bfox\b"]
    ids = [10, 20, 30, 40]
    db = hs.compile_multi(pats, ids=ids)
    data = b"The quick brown fox jumps abcabc"
    got = set(hs.scan(db, data))
    want = set()
    for i, p in enumerate(pats):
        g = build_nfa(parse(p, 0))
        want |= {(ids[i], 0, e) for e in nfa_match_ends(g, data)}
    assert got == want


def test_scan_order_and_callback():
    db = hs.compile_multi([r"a", r"ab"], ids=[1, 2])
    seen = []

    def cb(mid, frm, to, cbflags):
        seen.append((mid, frm, to))
        return 0

    matches = hs.scan(db, b"abab", cb)
    assert matches == seen
    tos = [t for (_, _, t) in seen]
    assert tos == sorted(tos)  # offset order

    # nonzero callback return terminates delivery
    stop = []

    def cb2(mid, frm, to, cbflags):
        stop.append((mid, to))
        return 1

    hs.scan(db, b"abab", cb2)
    assert len(stop) == 1


def test_singlematch_flag():
    db = hs.compile(r"a", hs.HS_FLAG_SINGLEMATCH)
    assert hs.scan(db, b"aaa") == [(0, 0, 1)]


def test_quiet_flag():
    db = hs.compile(r"a", hs.HS_FLAG_QUIET)
    assert hs.scan(db, b"aaa") == []


def test_ext_params_offsets():
    ext = hs.ExprExt(min_offset=3, max_offset=5)
    db = hs.compile_ext_multi([r"a"], ext=[ext])
    got = hs.scan(db, b"aaaaaaaa")
    assert got == [(0, 0, 3), (0, 0, 4), (0, 0, 5)]


def test_allowempty_required():
    with pytest.raises(hs.CompileError):
        hs.compile(r"a*")
    db = hs.compile(r"a*", hs.HS_FLAG_ALLOWEMPTY)
    got = {t for (_, _, t) in hs.scan(db, b"xa")}
    assert got == {0, 1, 2}


def test_literal_api():
    db = hs.compile_lit_multi([b"a.c", b"xyz"], ids=[5, 6])
    got = set(hs.scan(db, b"a.c abc xyz"))
    assert got == {(5, 0, 3), (6, 0, 11)}
    # caseless literal
    db2 = hs.compile_lit(b"AbC", hs.HS_FLAG_CASELESS)
    assert hs.scan(db2, b"xxabc") == [(0, 0, 5)]


def test_serialize_roundtrip():
    pats = [r"foo\d+", r"^bar", r"baz$"]
    db = hs.compile_multi(pats, ids=[1, 2, 3])
    blob = hs.serialize_database(db)
    db2 = hs.deserialize_database(blob)
    data = b"foo123 bar\nbaz"
    assert hs.scan(db, data) == hs.scan(db2, data)
    assert hs.database_info(db2) == hs.database_info(db)
    with pytest.raises(hs.DbVersionError):
        hs.deserialize_database(b"garbage" * 10)
    # corrupted payload
    bad = bytearray(blob)
    bad[25] ^= 0xFF
    with pytest.raises(hs.DbVersionError):
        hs.deserialize_database(bytes(bad))


def test_scan_batch():
    db = hs.compile_multi([r"ab+", r"c"], ids=[1, 2])
    blocks = [b"abbb", b"", b"cc", b"xaby"]
    res = hs.scan_batch(db, blocks)
    assert len(res) == 4
    for blk, matches in zip(blocks, res):
        want = oracle_matches([(r"ab+", 0), (r"c", 0)], blk)
        want = {(eid + 1, 0, t) for (eid, _f, t) in want}
        assert set(matches) == want


def test_mode_errors():
    db = hs.compile(r"a", mode=hs.HS_MODE_STREAM)
    with pytest.raises(hs.DbModeError):
        hs.scan(db, b"a")


def test_expression_info():
    info = hs.expression_info(r"ab{2,4}c")
    assert info["min_width"] == 4 and info["max_width"] == 6
    info = hs.expression_info(r"a+")
    assert info["min_width"] == 1 and info["max_width"] == 0xFFFFFFFF
    info = hs.expression_info(r"abc$")
    assert info["matches_at_eod"]


def test_scratch_guard():
    db = hs.compile(r"a")
    s = hs.alloc_scratch(db)
    s.in_use = True
    with pytest.raises(hs.ScratchInUseError):
        hs.scan(db, b"a", scratch=s)
    s.in_use = False
    s2 = hs.clone_scratch(s)
    assert s2.capacity == s.capacity


def test_capacity_overflow_rescan():
    # tiny capacity forces the doubled-capacity retry path
    db = hs.compile(r"a", hs.HS_FLAG_ALLOWEMPTY if False else 0)
    s = hs.alloc_scratch(db, capacity=2)
    matches = hs.scan(db, b"a" * 100, scratch=s)
    assert len(matches) == 100


def test_big_random_differential():
    rng = np.random.default_rng(42)
    data = bytes(rng.integers(97, 101, size=2000, dtype=np.uint8))
    pats = [(r"ab", 0), (r"a[bc]d", 0), (r"(ab|cd)e", 0), (r"ad{2,3}", 0)]
    db = hs.compile_multi([p for p, _ in pats], ids=list(range(4)))
    got = set(hs.scan(db, data))
    want = {(e, f, t) for (e, f, t) in oracle_matches(pats, data)}
    assert got == want


def test_scan_batch_threads_match_single():
    import numpy as np

    pats = [r"attack[0-9]+", r"foo(bar|baz)", r"abc.*"]
    db = hs.compile_multi(pats, ids=[1, 2, 3])
    rng = np.random.default_rng(4)
    blocks = []
    for k in range(9):
        b = bytearray((32 + rng.integers(0, 95, 4000)).astype(np.uint8).tobytes())
        b[100:108] = b"attack42"
        if k % 2:
            b[2000:2006] = b"foobar"
        blocks.append(bytes(b))
    single = hs.scan_batch(db, blocks)
    threaded = hs.scan_batch(db, blocks, threads=3)
    assert single == threaded


def test_scan_streams_threads_match_single():
    import numpy as np

    pats = [r"attack[0-9]+", r"head[a-z]*tail"]
    db1 = hs.compile_multi(pats, ids=[1, 2], mode=hs.HS_MODE_STREAM)
    rng = np.random.default_rng(5)
    writes = []
    for r in range(4):
        row = []
        for s in range(6):
            b = bytearray((32 + rng.integers(0, 95, 1500)).astype(np.uint8).tobytes())
            if (r + s) % 3 == 0:
                b[10:18] = b"attack77"
            row.append(bytes(b))
        writes.append(row)

    def run(threads):
        sts = [hs.open_stream(db1) for _ in range(6)]
        out = []
        for row in writes:
            out.append(hs.scan_streams(db1, sts, row, threads=threads))
        for st in sts:
            out.append([hs.close_stream(st)])
        return out

    assert run(1) == run(3)


def test_scan_ranges_and_count_dense():
    """Range-record API: pathological match densities stay O(ranges)
    (reference delivers per-offset callbacks at ns cost; the vectorized
    runtime's equivalent is the interval itself)."""
    import time

    import numpy as np

    db = hs.compile_multi([r"x*", "needle"], ids=[1, 2],
                          flags=[hs.HS_FLAG_ALLOWEMPTY, 0])
    data = b"ab" + b"x" * (1 << 20) + b"needle" + b"y" * 100
    hs.scan_count(db, data)  # warm (compile)
    hs.scan_count(db, data)  # warm (learned capacity shape)
    t0 = time.perf_counter()
    ms, ranges = hs.scan_block_ranges(db, data)
    n = hs.scan_count(db, data)
    dt = time.perf_counter() - t0
    # every offset reports x* (empty match) plus needle's end
    assert n == (len(data) + 1) + 1
    assert (2, 0, 2 + (1 << 20) + 6) in ms
    total_r = sum(hi - lo + 1 for (_e, lo, hi) in ranges)
    assert total_r == len(data) + 1
    assert all(e == 1 for (e, _lo, _hi) in ranges)
    assert dt < 2.0, dt  # seconds, CI-lenient; O(offsets) would be ~100x

    # semantics parity: expanding the ranges reproduces hs.scan exactly
    small = b"zz" + b"x" * 50 + b"q"
    ms2, rg2 = hs.scan_block_ranges(db, small)
    expanded = set(ms2) | {
        (e, 0, t) for (e, lo, hi) in rg2 for t in range(lo, hi + 1)}
    assert expanded == set(hs.scan(db, small))

    # SINGLEMATCH collapses a range to its first offset
    db3 = hs.compile_multi([r"x*"], ids=[9],
                           flags=[hs.HS_FLAG_ALLOWEMPTY
                                  | hs.HS_FLAG_SINGLEMATCH])
    ms3, rg3 = hs.scan_block_ranges(db3, b"xxxx")
    assert ms3 == [(9, 0, 0)] and rg3 == []


def test_scan_batch_threads_ordering_and_mesh_exclusive():
    """Thread-partitioned batches must return per-block matches in the
    same order as single-threaded scans (one scratch per thread in the
    reference model), and threads+mesh together is an error."""
    import numpy as np

    pats = ["alpha", "beta", r"g[0-9]{2}x"]
    db = hs.compile_multi(pats, ids=[1, 2, 3])
    rng = np.random.default_rng(8)
    blocks = []
    for b in range(9):
        blob = bytearray((32 + rng.integers(0, 95, 300)).astype(
            np.uint8).tobytes())
        blob[10:15] = b"alpha"
        blob[50:54] = b"beta"
        blob[90:94] = b"g77x"
        blocks.append(bytes(blob))
    ref = hs.scan_batch(db, blocks)
    got = hs.scan_batch(db, blocks, threads=3)
    assert got == ref  # exact per-block lists, offset-ordered
    import pytest as _pytest

    from hyperscan_tpu.parallel.sharded import make_mesh

    with _pytest.raises(hs.InvalidError):
        hs.scan_batch(db, blocks, threads=2, mesh=make_mesh(2))


def test_lifecycle_compat_entry_points():
    """hs_free_* / size / deserialize_at shims (reference:
    src/hs_common.h) — no-ops or thin wrappers, but they must exist
    and behave sanely."""
    db = hs.compile_multi(["liftok1", "liftok2"], ids=[1, 2])
    blob = hs.serialize_database(db)
    assert hs.hs_serialized_database_size(blob) == len(blob)
    db2 = hs.hs_deserialize_database_at(blob)
    assert hs.scan(db2, b"xx liftok1") == [(1, 0, 10)]
    hs.hs_free_database(db2)
    hs.hs_free_scratch(hs.alloc_scratch(db))
    hs.hs_free_compile_error(None)
    sdb = hs.compile_multi(["szprobe"], ids=[9], mode=hs.HS_MODE_STREAM)
    sz = hs.hs_stream_size(sdb)
    assert isinstance(sz, int) and sz > 0


def test_reset_and_copy_stream():
    """hs_reset_and_copy_stream: `to` reports EOD matches, then adopts
    `src`'s state in place (reference: src/hs_runtime.h:462)."""
    sdb = hs.compile_multi([r"split\d+end", r"eodtail$"], ids=[1, 2],
                           mode=hs.HS_MODE_STREAM)
    src = hs.open_stream(sdb)
    assert hs.scan_stream(src, b"xx split12") == []
    to = hs.open_stream(sdb)
    hs.scan_stream(to, b"zz eodtail")
    eod = []
    ms = hs.hs_reset_and_copy_stream(
        to, src, callback=lambda i, f, t, fl: eod.append((i, t)))
    assert (2, 10) in {(i, t) for (i, t) in eod} or \
        (2, 10) in {(i, t) for (i, _f, t) in ms}
    # `to` continues from src's state: the split match completes
    out = hs.scan_stream(to, b"34end yy")
    assert any(i == 1 for (i, _f, _t) in out), out
    # src is untouched and completes independently
    out_src = hs.scan_stream(src, b"99end")
    assert any(i == 1 for (i, _f, _t) in out_src), out_src
    # mismatched databases must be rejected
    other = hs.compile_multi(["zz"], ids=[3], mode=hs.HS_MODE_STREAM)
    o = hs.open_stream(other)
    import pytest as _pytest
    with _pytest.raises(hs.InvalidError):
        hs.hs_reset_and_copy_stream(o, src)
