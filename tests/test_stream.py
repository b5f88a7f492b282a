"""Streaming conformance: chunked scans must equal block scans.

The reference's invariant (hscollider tests exactly this): scanning a
buffer as one block and as a stream of arbitrary writes yields the same
(id, to) match set, regardless of write boundaries. Also covers stream
lifecycle, state compress/expand round trips, vectored mode, and
SINGLEMATCH-across-writes semantics."""

import numpy as np
import pytest

import hyperscan_tpu as hs

PATTERNS = [
    (r"attack", 0),
    (r"error|warning", 0),
    (r"admin[0-9]{1,3}", 0),
    (r"^root:x", 0),
    (r"passwd$", 0),
    (r"\bshell\b", 0),
    (r"foo[a-z]+bar", 0),          # general path (unbounded gap)
    (r"[0-9]{3}-[0-9]{4}", 0),     # general path (no factor)
    (r"xyz\z", 0),
]

CORPORA = [
    b"",
    b"attack",
    b"attack at dawn; warning: error in passwd",
    b"root:x:0:0 admin77 shell 555-1212 foozzzbar xyz",
    b"passwd\npasswd",
    b"sh" + b"e" * 40 + b"ll shell",
    b"a" * 300 + b"attack" + b"b" * 300,
    b"xyz xyz",
]


def _splits(data, rng):
    yield [data]
    if len(data) > 1:
        for _ in range(3):
            k = rng.integers(1, min(5, len(data)) + 1)
            cuts = sorted(rng.choice(len(data), size=k, replace=False).tolist())
            parts, prev = [], 0
            for c in cuts + [len(data)]:
                parts.append(data[prev:c])
                prev = c
            yield parts


@pytest.fixture(scope="module")
def dbs():
    exprs = [p for (p, _f) in PATTERNS]
    flags = [f for (_p, f) in PATTERNS]
    ids = list(range(len(PATTERNS)))
    return (
        hs.compile_multi(exprs, flags=flags, ids=ids, mode=hs.HS_MODE_BLOCK),
        hs.compile_multi(exprs, flags=flags, ids=ids, mode=hs.HS_MODE_STREAM),
        hs.compile_multi(exprs, flags=flags, ids=ids, mode=hs.HS_MODE_VECTORED),
    )


def _stream_scan(sdb, parts):
    st = hs.open_stream(sdb)
    ms = []
    for p in parts:
        ms.extend(hs.scan_stream(st, p))
    ms.extend(hs.close_stream(st))
    return ms


def test_stream_equals_block(dbs):
    bdb, sdb, _vdb = dbs
    rng = np.random.default_rng(42)
    for data in CORPORA:
        want = {(m, t) for (m, _f, t) in hs.scan(bdb, data)}
        for parts in _splits(data, rng):
            got = {(m, t) for (m, _f, t) in _stream_scan(sdb, parts)}
            assert got == want, (
                f"data={data!r} splits={[len(p) for p in parts]}: "
                f"{sorted(got)} != {sorted(want)}"
            )


def test_vectored_equals_block(dbs):
    bdb, _sdb, vdb = dbs
    rng = np.random.default_rng(7)
    for data in CORPORA:
        want = {(m, t) for (m, _f, t) in hs.scan(bdb, data)}
        for parts in _splits(data, rng):
            got = {(m, t) for (m, _f, t) in hs.scan_vector(vdb, parts)}
            assert got == want, f"data={data!r}: {sorted(got)} != {sorted(want)}"


def test_compress_expand_roundtrip(dbs):
    _bdb, sdb, _vdb = dbs
    data = b"attack at dawn; warning: error in passwd"
    st = hs.open_stream(sdb)
    ms1 = hs.scan_stream(st, data[:15])
    buf = hs.compress_stream(st)
    st2 = hs.expand_stream(sdb, buf)
    ms2a = hs.scan_stream(st, data[15:]) + hs.close_stream(st)
    ms2b = hs.scan_stream(st2, data[15:]) + hs.close_stream(st2)
    assert ms2a == ms2b


def test_reset_and_expand_stream(dbs):
    """hs_reset_and_expand_stream (reference: src/hs_runtime.h:438):
    the existing stream reports its EOD matches through the callback,
    then continues from the decompressed state — equal to a fresh
    expand_stream, with no new stream object."""
    _bdb, sdb, _vdb = dbs
    data = b"attack at dawn; warning: error in passwd"
    st = hs.open_stream(sdb)
    hs.scan_stream(st, data[:15])
    buf = hs.compress_stream(st)
    ref = hs.expand_stream(sdb, buf)
    want = hs.scan_stream(ref, data[15:])
    want_eod = hs.close_stream(ref)

    # a different stream, mid-way through a passwd$ match: resetting it
    # with a callback must deliver ITS eod matches, then adopt buf
    victim = hs.open_stream(sdb)
    hs.scan_stream(victim, b"root passwd")
    eod = []
    got_eod = hs.reset_and_expand_stream(
        victim, buf, lambda e, f, t, fl: eod.append((e, f, t)))
    assert got_eod == eod and (4, 0, 11) in eod  # passwd$ at old EOD
    got = hs.scan_stream(victim, data[15:])
    assert got == want
    assert hs.close_stream(victim) == want_eod

    # without a callback no EOD work happens (reference contract)
    victim2 = hs.open_stream(sdb)
    hs.scan_stream(victim2, b"root passwd")
    assert hs.reset_and_expand_stream(victim2, buf) == []
    assert hs.scan_stream(victim2, data[15:]) == want


def test_copy_stream_independent(dbs):
    _bdb, sdb, _vdb = dbs
    st = hs.open_stream(sdb)
    hs.scan_stream(st, b"atta")
    st2 = hs.copy_stream(st)
    a = hs.scan_stream(st, b"ck") + hs.close_stream(st)
    b = hs.scan_stream(st2, b"ck") + hs.close_stream(st2)
    assert a == b
    assert any(m[0] == 0 for m in a)


def test_reset_stream(dbs):
    _bdb, sdb, _vdb = dbs
    st = hs.open_stream(sdb)
    hs.scan_stream(st, b"attack")
    hs.reset_stream(st)
    ms = hs.scan_stream(st, b"^^attack") + hs.close_stream(st)
    assert (0, 0, 8) in ms


def test_singlematch_across_writes(dbs):
    del dbs
    sdb = hs.compile_multi(
        [r"attack"], flags=[hs.HS_FLAG_SINGLEMATCH], ids=[3],
        mode=hs.HS_MODE_STREAM,
    )
    st = hs.open_stream(sdb)
    ms = hs.scan_stream(st, b"attack attack ")
    ms += hs.scan_stream(st, b"attack")
    ms += hs.close_stream(st)
    assert ms == [(3, 0, 6)]


def test_terminated_stream_rejects_writes(dbs):
    _bdb, sdb, _vdb = dbs
    st = hs.open_stream(sdb)
    hs.scan_stream(st, b"attack", lambda i, f, t, fl: 1)
    assert st.terminated
    with pytest.raises(Exception):
        hs.scan_stream(st, b"more")


def test_mode_enforcement(dbs):
    bdb, sdb, vdb = dbs
    with pytest.raises(hs.DbModeError):
        hs.open_stream(bdb)
    with pytest.raises(hs.DbModeError):
        hs.scan(sdb, b"data")
    with pytest.raises(hs.DbModeError):
        hs.scan_vector(sdb, [b"data"])


def test_batched_scan_streams(dbs):
    _bdb, sdb, _vdb = dbs
    n = 6
    streams = [hs.open_stream(sdb) for _ in range(n)]
    chunk1 = [b"atta", b"warn", b"admin", b"root", b"pass", b"xy"]
    chunk2 = [b"ck", b"ing!", b"77 go", b":x:0", b"wd", b"z"]
    r1 = hs.scan_streams(sdb, streams, chunk1)
    r2 = hs.scan_streams(sdb, streams, chunk2)
    closes = [hs.close_stream(st) for st in streams]
    combined = [a + b + c for (a, b, c) in zip(r1, r2, closes)]
    # compare against per-stream runs
    for i, (c1, c2) in enumerate(zip(chunk1, chunk2)):
        st = hs.open_stream(sdb)
        want = hs.scan_stream(st, c1) + hs.scan_stream(st, c2) + hs.close_stream(st)
        assert combined[i] == want, f"stream {i}"


# --- regression tests for round-1 advisor findings --------------------------


def _match_set(ms):
    return sorted(tuple(m) for m in ms)


def test_chain_prefix_trimmed_from_history():
    """Prefix factor ends inside the extent whose bytes were trimmed out
    of history must still confirm the chain (advisor: stream.py carried
    evidence filter)."""
    sdb = hs.compile_multi([r"foo.*bar"], mode=hs.HS_MODE_STREAM)
    bdb = hs.compile_multi([r"foo.*bar"], mode=hs.HS_MODE_BLOCK)
    for fill in range(0, 14):
        data = b"foo" + b"z" * fill + b"bar"
        want = _match_set(hs.scan(bdb, data))
        got = _match_set(
            _stream_scan(sdb, [b"foo" + b"z" * fill, b"bar"]))
        assert got == want, f"fill={fill}: {got} != {want}"


def test_anchored_width_256_device_halo():
    """Anchored match ending exactly at the halo-depth bound must not be
    dropped by the device chunk-halo path (advisor: MAX_HALO_DEPTH)."""
    db = hs.compile_multi([r"^[ab]{255}c"], mode=hs.HS_MODE_BLOCK)
    data = b"a" * 255 + b"c" + b"x" * (200 * 1024 - 256)
    got = _match_set(hs.scan(db, data))
    assert got == [(0, 0, 256)], got


def test_zero_length_write_does_not_clear_dedupe():
    """A zero-length write must not clear the boundary dedupe set
    (advisor: st.recent rebuilt from current write only)."""
    sdb = hs.compile_multi([r"abcdef"], mode=hs.HS_MODE_STREAM)
    got = _match_set(_stream_scan(sdb, [b"xxabcdef", b"", b""]))
    assert got == [(0, 0, 8)], got


def test_vacuous_empty_first_write_not_duplicated():
    """Empty first write + data write must report the offset-0 empty
    match exactly once (advisor: _vacuous_stream_reports lo=0)."""
    sdb = hs.compile_multi(
        [r"x*"], flags=[hs.HS_FLAG_ALLOWEMPTY], mode=hs.HS_MODE_STREAM)
    want = _match_set(_stream_scan(sdb, [b"ab"]))
    got = _match_set(_stream_scan(sdb, [b"", b"ab"]))
    assert got == want, f"{got} != {want}"
    got2 = _match_set(_stream_scan(sdb, [b"", b"", b"ab"]))
    assert got2 == want, f"{got2} != {want}"


def test_large_stream_writes_device_path():
    """Writes above HOST_SCAN_LIMIT route the stream extent through the
    fused device filter+confirm and must equal the block scan
    (reference: the shared SIMD runtime across block/stream,
    src/rose/stream.c:545)."""
    import numpy as np

    pats = ["attack" + str(i) for i in range(60)] + [r"foo.*bar"]
    sdb = hs.compile_multi(pats, ids=list(range(61)), mode=hs.HS_MODE_STREAM)
    bdb = hs.compile_multi(pats, ids=list(range(61)))
    rng = np.random.default_rng(4)
    parts = []
    for size in (500, 200_000, 120, 160_000):
        c = (32 + rng.integers(0, 95, size=size)).astype(np.uint8)
        i = int(rng.integers(0, size - 30))
        c[i : i + 8] = np.frombuffer(b"attack5 ", np.uint8)
        parts.append(c.tobytes())
    parts[1] = parts[1][:1000] + b"foo" + parts[1][1000:]
    parts[3] = b"bar " + parts[3]
    data = b"".join(parts)
    want = sorted((m[0], m[2]) for m in hs.scan(bdb, data))
    st = hs.open_stream(sdb)
    ms = []
    for p in parts:
        ms += hs.scan_stream(st, p)
    ms += hs.close_stream(st)
    assert sorted((m[0], m[2]) for m in ms) == want


def test_large_stream_writes_general_engine_device_path():
    """General (no-literal) bounded engines also scan large stream
    writes on the device chunk-halo kernel, entered in the carried
    per-stream states; matches spanning write boundaries must survive
    (reference: resumed stream state, src/rose/stream.c:545)."""
    import numpy as np

    from hyperscan_tpu.database import compile_patterns
    from hyperscan_tpu.grey import Grey
    from hyperscan_tpu.runtime.stream import (
        close_stream, open_stream, scan_stream,
    )

    pat = r"[0-9]{6}[a-f]"
    db = compile_patterns([pat], grey=Grey(host_scan_limit=1 << 10))
    db.mode = hs.HS_MODE_STREAM
    assert db.engines and db.engines[0].max_depth is not None

    rng = np.random.default_rng(7)
    data = bytes(rng.choice(np.frombuffer(b"0123abgh ", np.uint8),
                            size=6000))
    # plant one match straddling the write boundary at 3000
    data = data[:2997] + b"456789c" + data[3004:]

    bdb = compile_patterns([pat])
    want = {(m[0], m[2]) for m in __import__("hyperscan_tpu").scan(bdb, data)}
    assert want, "planted match missing from block scan"

    st = open_stream(db)
    ms = list(scan_stream(st, data[:3000]))
    ms += scan_stream(st, data[3000:])
    ms += close_stream(st)
    assert {(m[0], m[2]) for m in ms} == want


def test_large_write_unbounded_engine_device_path():
    """Large stream writes route unbounded general engines through the
    speculative device kernel with carried per-stream entry states
    (reference: src/rose/stream.c:545 resumed-state scanning)."""
    import numpy as np

    import hyperscan_tpu as hs

    pat = r"q[a-y]*z"
    db = hs.compile(pat, mode=hs.HS_MODE_STREAM, flags=hs.HS_FLAG_DOTALL)
    db.host_scan_limit = 1024  # force the device path at test sizes
    st = hs.open_stream(db)
    rng = np.random.default_rng(1)
    w1 = b"q" + b"m" * 3000
    w2 = b"m" * 2000 + b"z" + bytes(rng.integers(65, 90, 3000, dtype=np.uint8))
    got = list(hs.scan_stream(st, w1)) + list(hs.scan_stream(st, w2))
    got += list(hs.close_stream(st))
    want = hs.scan(hs.compile(pat, flags=hs.HS_FLAG_DOTALL), w1 + w2)
    assert sorted(got) == sorted(want)
