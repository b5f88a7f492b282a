"""StreamSet (batched streams) conformance: per-round matches and final
state must be identical to the per-stream scan_streams path, on every
database shape (pure literal, validators, chains, general engines, SOM,
SINGLEMATCH, vacuous), including the pipelined start/finish form and the
pre-stitched-extent (device rows) form."""

import numpy as np
import pytest

import hyperscan_tpu as hs
from hyperscan_tpu.runtime.stream import history_required
from hyperscan_tpu.runtime.streamset import (
    close_streamset,
    open_streamset,
    scan_streamset,
    streamset_stream,
    streamset_write_finish,
    streamset_write_start,
)

DBSETS = {
    "literal": (["attack", "payload7", "select"], [1, 2, 3], [0, 0, 0]),
    "validators": (
        [r"attack[0-9]{2,4}z", r"ad(min|visor)q", r"^hdr[a-f]{2}"],
        [1, 2, 3], [0, 0, 0],
    ),
    "chains": (
        [r"foomark[0-9]{3,9}barmark", r"lead\d{4,}tail"],
        [1, 2], [0, 0],
    ),
    "engines": (
        [r"[0-9]{3}-[0-9]{4}", r"q[a-z]*7end"],
        [1, 2], [0, 0],
    ),
    "som": (
        [r"num[0-9]{2,5}x", "plainlit"],
        [1, 2], [hs.HS_FLAG_SOM_LEFTMOST, hs.HS_FLAG_SOM_LEFTMOST],
    ),
    "single": (
        ["dup", r"v[0-9]ral"], [1, 2],
        [hs.HS_FLAG_SINGLEMATCH, 0],
    ),
    "vacuous": (
        [r"x*", "anchor"], [1, 2],
        [hs.HS_FLAG_ALLOWEMPTY, 0],
    ),
}

SEEDS = [3, 11]


def _gen_writes(rng, S, rounds):
    """Random writes salted with fragments that can hit the patterns."""
    frags = [b"attack123z", b"attack", b"payload7", b"adminq", b"advisorq",
             b"hdrab", b"foomark12345barmark", b"lead4444tail", b"555-1212",
             b"qzz7end", b"num123x", b"plainlit", b"dup", b"v9ral",
             b"xxxx", b"anchor", b"select"]
    writes = []
    for _r in range(rounds):
        per = []
        for _s in range(S):
            n = int(rng.integers(0, 60))
            c = bytearray(rng.integers(32, 127, size=n).astype(np.uint8))
            for _k in range(int(rng.integers(0, 3))):
                f = frags[int(rng.integers(0, len(frags)))]
                p = int(rng.integers(0, max(1, n)))
                c[p : p + len(f)] = f[: max(0, n - p)]
            per.append(bytes(c))
        writes.append(per)
    return writes


@pytest.mark.parametrize("dbname", sorted(DBSETS))
@pytest.mark.parametrize("seed", SEEDS)
def test_streamset_matches_scan_streams(dbname, seed):
    pats, ids, flags = DBSETS[dbname]
    db = hs.compile_multi(pats, ids=ids, flags=flags,
                          mode=hs.HS_MODE_STREAM)
    rng = np.random.default_rng(seed)
    S, ROUNDS = 4, 5
    writes = _gen_writes(rng, S, ROUNDS)

    streams = [hs.open_stream(db) for _ in range(S)]
    ss = open_streamset(db, S)
    for r in range(ROUNDS):
        ref = hs.scan_streams(db, streams, writes[r])
        got = scan_streamset(db, ss, writes[r])
        for i in range(S):
            assert sorted(got[i]) == sorted(ref[i]), (
                dbname, seed, r, i, got[i], ref[i])
    ref_close = [hs.close_stream(st) for st in streams]
    got_close = close_streamset(db, ss)
    for i in range(S):
        assert sorted(got_close[i]) == sorted(ref_close[i]), (dbname, i)


def test_streamset_state_interop():
    """streamset_stream snapshots must behave exactly like the stream."""
    pats, ids, flags = DBSETS["validators"]
    db = hs.compile_multi(pats, ids=ids, flags=flags,
                          mode=hs.HS_MODE_STREAM)
    rng = np.random.default_rng(5)
    S = 3
    writes = _gen_writes(rng, S, 3)
    streams = [hs.open_stream(db) for _ in range(S)]
    ss = open_streamset(db, S)
    for r in range(3):
        hs.scan_streams(db, streams, writes[r])
        scan_streamset(db, ss, writes[r])
    # detached copies continue identically on a fresh write
    tail = _gen_writes(rng, S, 1)[0]
    for i in range(S):
        s_copy = streamset_stream(ss, i)
        a = hs.scan_stream(streams[i], tail[i])
        b = hs.scan_stream(s_copy, tail[i])
        assert sorted(a) == sorted(b)
        # codec round trip of the snapshot
        blob = hs.compress_stream(s_copy)
        s2 = hs.expand_stream(db, blob)
        assert s2.offset == s_copy.offset


def test_streamset_pipelined_pure_literal():
    """start/start/.../finish/finish == synchronous rounds for a
    pure-literal database (the device-pipelined form)."""
    pats = ["attack", "payload7", "sig%dx" % 7]
    db = hs.compile_multi(pats, ids=[1, 2, 3], mode=hs.HS_MODE_STREAM)
    assert not db.engines and not db.lit.chains
    rng = np.random.default_rng(9)
    S, ROUNDS = 3, 4
    writes = _gen_writes(rng, S, ROUNDS)

    ss_sync = open_streamset(db, S)
    ref = [scan_streamset(db, ss_sync, writes[r]) for r in range(ROUNDS)]

    ss_pipe = open_streamset(db, S)
    handles = [streamset_write_start(db, ss_pipe, writes[r])
               for r in range(ROUNDS)]
    got = [streamset_write_finish(db, ss_pipe, h) for h in handles]
    for r in range(ROUNDS):
        for i in range(S):
            assert sorted(got[r][i]) == sorted(ref[r][i]), (r, i)
    assert close_streamset(db, ss_pipe) == close_streamset(db, ss_sync)


def test_streamset_ext_rows_device_form():
    """The pre-stitched extent form (host mirror + device rows) must equal
    the chunks form — this is the TPU bulk streaming path (Pallas kernel
    in interpret mode on CPU)."""
    from hyperscan_tpu.ops.teddy import corpus_to_rows
    import jax.numpy as jnp

    pats = ["attack", "payload7", r"sig[0-9]{2}end"]
    db = hs.compile_multi(pats, ids=[1, 2, 3], mode=hs.HS_MODE_STREAM)
    rng = np.random.default_rng(21)
    S, ROUNDS = 3, 3
    writes = _gen_writes(rng, S, ROUNDS)

    ss_ref = open_streamset(db, S)
    ref = [scan_streamset(db, ss_ref, writes[r]) for r in range(ROUNDS)]

    ss = open_streamset(db, S)
    hist_req = history_required(db)
    assert hist_req > 0
    for r in range(ROUNDS):
        hl = np.asarray([len(h) for h in ss.hist], dtype=np.int64)
        cl = np.asarray([len(c) for c in writes[r]], dtype=np.int64)
        parts = []
        for i in range(S):
            parts.append(ss.hist[i])
            parts.append(writes[r][i])
        ext_np = np.frombuffer(b"".join(parts), dtype=np.uint8)
        rows = jnp.asarray(corpus_to_rows(ext_np))
        h = streamset_write_start(
            db, ss, ext_np=ext_np, ext_rows=rows, hlens=hl, chunk_lens=cl)
        got = streamset_write_finish(db, ss, h)
        for i in range(S):
            assert sorted(got[i]) == sorted(ref[r][i]), (r, i)
    assert close_streamset(db, ss) == close_streamset(db, ss_ref)


def test_streamset_pipelines_with_engines_and_chains():
    """Every database shape pipelines: engine/chain state advances in
    the (ordered) finish stage, so pipelined rounds must equal
    synchronous rounds even for stateful engines."""
    for dbname in ("engines", "chains"):
        pats, ids, flags = DBSETS[dbname]
        db = hs.compile_multi(pats, ids=ids, flags=flags,
                              mode=hs.HS_MODE_STREAM)
        rng = np.random.default_rng(31)
        S, ROUNDS = 3, 4
        writes = _gen_writes(rng, S, ROUNDS)
        ss_sync = open_streamset(db, S)
        ref = [scan_streamset(db, ss_sync, writes[r]) for r in range(ROUNDS)]
        ss = open_streamset(db, S)
        handles = [streamset_write_start(db, ss, writes[r])
                   for r in range(ROUNDS)]
        got = [streamset_write_finish(db, ss, h) for h in handles]
        for r in range(ROUNDS):
            assert got[r] == ref[r], (dbname, r)
        assert close_streamset(db, ss) == close_streamset(db, ss_sync)


def test_streamset_guards():
    pats, ids, flags = DBSETS["engines"]
    db = hs.compile_multi(pats, ids=ids, flags=flags,
                          mode=hs.HS_MODE_STREAM)
    ss = open_streamset(db, 2)
    h = streamset_write_start(db, ss, [b"abc", b"def"])
    h2 = streamset_write_start(db, ss, [b"x", b"y"])
    # finishes must run in write order
    with pytest.raises(hs.InvalidError):
        streamset_write_finish(db, ss, h2)
    streamset_write_finish(db, ss, h)
    streamset_write_finish(db, ss, h2)
    close_streamset(db, ss)
    with pytest.raises(hs.InvalidError):
        streamset_write_start(db, ss, [b"x", b"y"])


def test_terminated_stream_stops_delivery():
    """A callback-terminated stream receives no further matches or
    callbacks (reference: HS_SCAN_TERMINATED), in both the scalar and
    vectorized delivery paths and in scan_streams."""
    db = hs.compile_multi(["stopword", "other1"], ids=[1, 2],
                          mode=hs.HS_MODE_STREAM)
    calls = []

    def cb(mid, frm, to, fl):
        calls.append((mid, to))
        return 1  # terminate on first match

    ss = open_streamset(db, 2)
    out = scan_streamset(db, ss, [b"x stopword y", b"quiet"],
                         callbacks=[cb, None])
    assert ss.terminated[0] and len(calls) == 1
    out2 = scan_streamset(db, ss, [b"stopword again", b"other1"],
                          callbacks=[cb, None])
    assert out2[0] == [] and len(calls) == 1  # no delivery, no callback
    assert out2[1] and out2[1][0][0] == 2  # other stream unaffected
    # vectorized (no-callback) path also suppresses
    out3 = scan_streamset(db, ss, [b"stopword", b"zz"])
    assert out3[0] == []

    # scan_streams parity
    s1, s2 = hs.open_stream(db), hs.open_stream(db)
    hs.scan_streams(db, [s1, s2], [b"x stopword y", b"quiet"],
                    [cb, None])
    r = hs.scan_streams(db, [s1, s2], [b"stopword again", b"other1"])
    assert r[0] == [] and r[1]


def test_streamset_empty_and_pipeline_guards():
    db = hs.compile_multi(["abc"], ids=[1], mode=hs.HS_MODE_STREAM)
    ss = open_streamset(db, 0)
    assert scan_streamset(db, ss, []) == []
    assert close_streamset(db, ss) == []

    db2 = hs.compile_multi(["abc"], ids=[1], mode=hs.HS_MODE_STREAM)
    ss2 = open_streamset(db2, 1)
    h = streamset_write_start(db2, ss2, [b"ab"])
    with pytest.raises(hs.InvalidError):
        streamset_stream(ss2, 0)  # mid-pipeline snapshot is inconsistent
    streamset_write_finish(db2, ss2, h)
    streamset_stream(ss2, 0)  # fine once finished


def test_infix_connect_accept_live_at_extent_start():
    """A carried infix mask that is accept-live AT the extent start must
    connect a role start at that exact position (the history-cut
    boundary) — found by code review with a unit repro."""
    import numpy as np

    from hyperscan_tpu.compiler.chains import build_infix
    from hyperscan_tpu.compiler.parser import parse
    from hyperscan_tpu.runtime.lit_runtime import _infix_connect

    spec = build_infix(parse(r"(ab|cd)+", 0))
    corpus = np.frombuffer(b"ababab", np.uint8)
    # block-style: inject at 0, role start at 6
    conn, cap = _infix_connect(spec, corpus, np.asarray([0]),
                               np.asarray([6]), 6, capture_at=6)
    assert 6 in conn and cap
    # streaming resume: carried mask at position 6, start exactly there
    conn2, _ = _infix_connect(spec, corpus, np.zeros(0, np.int64),
                              np.asarray([6]), 6,
                              init_mask=cap, init_pos=6)
    assert 6 in conn2
