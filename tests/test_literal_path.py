"""Literal path (Teddy filter → confirm → window validation) conformance.

Differential tests against the AST oracle — the hscollider analogue for
the literal-decomposition path (reference: tools/hscollider compares
engine output against PCRE ground truth)."""

import numpy as np
import pytest

import hyperscan_tpu as hs
from hyperscan_tpu.compiler.parser import parse
from hyperscan_tpu.utils.oracle import ast_match_ends

LIT_PATTERNS = [
    (r"attack", 0),
    (r"error|warning|fatal", 0),
    (r"foo(bar|baz)", 0),
    (r"admin[0-9]{1,3}", 0),
    (r"^root:x:0", 0),
    (r"union\s+select", 0),
    (r"passwd$", 0),
    (r"GET\s/index\.html", 0),
    (r"cookie=[a-f0-9]{4}", 0),
    (r"xyz{2,4}w", 0),
    (r"SeLeCt", 1),  # CASELESS
    (r"\bshell\b", 0),
]

CORPORA = [
    b"",
    b"attack",
    b"an attack and an error, warning: fatal foobar foobaz",
    b"admin1 admin22 admin333 admin4444",
    b"root:x:0:0:root:/root:/bin/bash",
    b"union  select * from users; UNION\tSELECT 1",
    b"user passwd\nand passwd",
    b"GET /index.html HTTP/1.1",
    b"cookie=deadbeef cookie=xyz",
    b"xyzw xyzzw xyzzzzw xyzzzzzw",
    b"select SELECT sElEcT",
    b"shell shells bombshell shell!",
    b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    bytes(range(256)) * 2,
]


@pytest.fixture(scope="module")
def lit_db():
    db = hs.compile_multi(
        [p for (p, _f) in LIT_PATTERNS],
        flags=[f for (_p, f) in LIT_PATTERNS],
        ids=list(range(len(LIT_PATTERNS))),
    )
    assert db.lit is not None
    return db


def test_routing(lit_db):
    # `union\s+select` decomposes as a chain (unbounded gap); only
    # `xyz{2,4}w` (2-byte runs) stays on the general engines
    assert lit_db.lit.num_factors >= 10
    assert 5 in lit_db.lit.chains
    general = {e for eng in lit_db.engines for e in set(eng.set_exprs.tolist())}
    assert general == {9}


def test_differential_vs_oracle(lit_db):
    for data in CORPORA:
        got = {}
        for (mid, _f, to) in hs.scan(lit_db, data):
            got.setdefault(mid, set()).add(to)
        for i, (pat, fl) in enumerate(LIT_PATTERNS):
            want = ast_match_ends(parse(pat, fl), data)
            assert got.get(i, set()) == want, (
                f"pattern {pat!r} on {data!r}: got {sorted(got.get(i, set()))} "
                f"want {sorted(want)}"
            )


def test_batch_matches_blockwise(lit_db):
    blocks = CORPORA
    batched = hs.scan_batch(lit_db, blocks)
    for blk, ms in zip(blocks, batched):
        single = hs.scan(lit_db, blk)
        assert ms == single


def test_match_at_block_boundaries(lit_db):
    # factor spans must not leak across concatenated blocks
    blocks = [b"atta", b"ck", b"attack"]
    res = hs.scan_batch(lit_db, blocks)
    assert res[0] == [] and res[1] == []
    assert (0, 0, 6) in res[2]


def test_serialize_roundtrip_with_lit(lit_db):
    data = hs.serialize_database(lit_db)
    db2 = hs.deserialize_database(data)
    assert db2.lit is not None
    corpus = b"an attack; union select; SELECT; shell!"
    assert hs.scan(db2, corpus) == hs.scan(lit_db, corpus)


def test_mixed_literal_and_general():
    db = hs.compile_multi(
        [r"attack", r"[0-9]{3}-[0-9]{4}", r"foo[a-z]+bar"],
        ids=[1, 2, 3],
    )
    assert db.lit is not None and db.engines
    data = b"attack 555-1212 fooqqqbar"
    got = {(m, t) for (m, _f, t) in hs.scan(db, data)}
    assert (1, 6) in got
    assert (2, 15) in got
    assert (3, 25) in got


def test_caseless_literal_equiv():
    db = hs.compile_multi([r"Admin"], flags=[hs.HS_FLAG_CASELESS], ids=[9])
    got = hs.scan(db, b"admin ADMIN aDmIn admix")
    assert [t for (_m, _f, t) in got] == [5, 11, 17]


def test_long_factor_confirm():
    # factor longer than the teddy suffix depth M still confirms exactly
    db = hs.compile_multi([r"abcdefghijklmnop"], ids=[5])
    hit = b"xx abcdefghijklmnop yy"
    miss = b"xx Abcdefghijklmnop yy"  # differs before the suffix window
    assert [(5, 0, 19)] == hs.scan(db, hit)
    assert hs.scan(db, miss) == []


def test_fused_device_confirm_equals_host_path():
    """The fused device filter+hash-confirm path must produce exactly the
    host filter+confirm pipeline's matches (reference parity:
    do_confirm_fdr inline vs separate confirm)."""
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.runtime.lit_runtime import finish_literal_scan
    from hyperscan_tpu.runtime.scan import RecordSink, finalize_reports
    from hyperscan_tpu.runtime.smallwrite import teddy_filter_host

    words = ["attack", "payload", "shell", "admin"]
    pats = []
    for i in range(120):
        w = words[i % 4]
        pats.append(
            [w + str(i), rf"{w}{i}[0-9]{{2,4}}z", rf"q{i}h[a-f0-9]{{8}}",
             rf"x{i}(GET|POST) /[a-z]{{1,9}}"][i % 4]
        )
    db = hs.compile_multi(pats, ids=list(range(120)))
    rng = np.random.default_rng(3)
    corpus = (32 + rng.integers(0, 95, size=300_000)).astype(np.uint8)
    plants = [b"attack0 ", b"payload1699z", b"q2hdeadbeef", b"x3GET /ab",
              b"shell2442z99"]
    off = 4000
    for p in plants:
        corpus[off : off + len(p)] = np.frombuffer(p, np.uint8)
        off += 50_000
    data = corpus.tobytes()

    got_dev = sorted(tuple(m) for m in hs.scan(db, data))  # fused path

    pos, words_v = teddy_filter_host(corpus, db.lit.masks)
    bs = np.zeros(1, np.int64)
    be = np.asarray([len(data)], np.int64)
    recs = finish_literal_scan(db, corpus, bs, be, pos, words_v)
    sink = RecordSink()
    for (_b, e, t, f) in recs:
        sink.add(e, t, f)
    ms, _ = finalize_reports(db, sink.materialize(len(data)))
    got_host = sorted(tuple(m) for m in ms)
    assert got_dev == got_host
    assert len(got_dev) >= 4


def test_class_split_reproduces_masks():
    """The byte->class remap + class tables must reproduce the byte
    tables exactly (the class kernel's correctness precondition)."""
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.ops.teddy import _class_split

    pats = [w + str(i) for i, w in enumerate(
        ["attack", "shell", "admin", "eval"] * 30)]
    db = hs.compile_multi(pats, ids=list(range(len(pats))))
    masks = db.lit.masks
    split = _class_split(masks)
    assert split is not None
    b2c, cmasks = split
    M, W, _ = masks.shape
    cls = np.concatenate([b2c[0], b2c[1]])  # [256]
    for m in range(M):
        for w in range(W):
            assert np.array_equal(masks[m, w], cmasks[m, w][cls]), (m, w)


def test_fetch_many_equals_per_scan_finish():
    """teddy_confirm_fetch_many must hand each scan the same buffer a
    per-scan fetch would have produced."""
    import jax.numpy as jnp
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.ops.teddy import (
        corpus_to_rows,
        teddy_confirm_fetch_many,
        teddy_confirm_finish,
        teddy_confirm_start,
    )

    db = hs.compile_multi(["attack0", "shell42"], ids=[1, 2])
    rng = np.random.default_rng(9)
    corpora = []
    for s in range(3):
        c = (32 + rng.integers(0, 95, size=40_000)).astype(np.uint8)
        c[100 + s: 107 + s] = np.frombuffer(b"attack0", np.uint8)[:7]
        corpora.append(c)
    handles = [
        teddy_confirm_start(jnp.asarray(corpus_to_rows(c)), db.lit,
                            c.shape[0])
        for c in corpora
    ]
    gots = teddy_confirm_fetch_many(handles)
    for h, g, c in zip(handles, gots, corpora):
        fid_b, p_b = teddy_confirm_finish(h, got=g)
        h2 = teddy_confirm_start(
            jnp.asarray(corpus_to_rows(c)), db.lit, c.shape[0]
        )
        fid_r, p_r = teddy_confirm_finish(h2)
        assert sorted(zip(fid_b.tolist(), p_b.tolist())) == \
            sorted(zip(fid_r.tolist(), p_r.tolist()))


def test_spread_candidates_chunk_capacity_overflow():
    """Candidates spread one-per-extraction-chunk overflow the chunk
    budget (cap//16) long before the value budget; the finish retry must
    raise the chunk capacity instead of silently dropping later chunks'
    candidates (regression: streams past ~cap_chunks*256 bytes lost all
    matches in the batched streaming bench)."""
    import jax.numpy as jnp
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.ops.teddy import (
        corpus_to_rows,
        teddy_confirm_finish,
        teddy_confirm_start,
    )
    from hyperscan_tpu.runtime.lit_runtime import verify_pairs

    db = hs.compile_multi(["needleZ"], ids=[7])
    # one instance per 256-byte extraction chunk: n_hit == total, far
    # above total//16
    NCHUNKS = 2048
    corpus = np.full(NCHUNKS * 256, ord("."), dtype=np.uint8)
    for c in range(NCHUNKS):
        corpus[c * 256 + 17 : c * 256 + 24] = np.frombuffer(
            b"needleZ", np.uint8)
    h = teddy_confirm_start(
        jnp.asarray(corpus_to_rows(corpus)), db.lit, len(corpus),
        capacity=1 << 14)
    fid_a, p_a = teddy_confirm_finish(h)
    fid_a, p_a = verify_pairs(
        db.lit, corpus, np.zeros(1, np.int64), fid_a, p_a)
    assert len(p_a) == NCHUNKS, len(p_a)
    assert sorted(p_a.tolist()) == [c * 256 + 23 for c in range(NCHUNKS)]


def test_capacity_overflow_compiles_no_new_shapes():
    """Capacity overflow with a host corpus available falls back to the
    host filter for that scan — zero new kernel shapes (a fresh shape
    costs minutes through the dev tunnel). The observed load still
    teaches the NEXT dispatch its size."""
    import jax.numpy as jnp
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.ops import teddy as T

    db = hs.compile_multi(["needleZ"], ids=[7])
    # small scan: compiles the default capacity shape
    small = np.full(1 << 16, ord("."), dtype=np.uint8)
    small[100:107] = np.frombuffer(b"needleZ", np.uint8)
    h = T.teddy_confirm_start(jnp.asarray(T.corpus_to_rows(small)),
                              db.lit, len(small))
    fid, pos = T.teddy_confirm_finish(h, host_corpus=small)
    assert len(pos) == 1

    # one needle per extraction chunk, enough to overflow every cap
    NC = 6000
    big = np.full(NC * 256, ord("."), dtype=np.uint8)
    for c in range(NC):
        big[c * 256 + 9 : c * 256 + 16] = np.frombuffer(b"needleZ", np.uint8)
    h = T.teddy_confirm_start(jnp.asarray(T.corpus_to_rows(big)),
                              db.lit, len(big))
    # the start above may compile the (new corpus size) shape — that is
    # the normal per-size shape; the OVERFLOW handling below must not
    # compile anything further
    misses_before = T._jit_filter_confirm.cache_info().misses
    fid, pos = T.teddy_confirm_finish(h, host_corpus=big)
    assert len(pos) == NC
    assert sorted(pos.tolist()) == [c * 256 + 15 for c in range(NC)]
    assert T._jit_filter_confirm.cache_info().misses == misses_before, \
        "overflow handling must not compile new kernel shapes"
    # the observed load right-sizes the NEXT dispatch: cap1 covers the
    # total, and the per-cell compaction capacity covers the densest
    # cell (one needle per 256 B chunk -> 256 per 64 KiB cell)
    caps = T._caps_for(db.lit, 1 << 14)
    assert caps[0] >= NC and caps[1] >= 256


def _gated_db(n_patterns=600):
    """A ruleset large enough for a multi-word plan (W >= 2), where the
    compiler builds the single-word gate tables."""
    import hyperscan_tpu as hs

    words = ["attack", "payload", "shell", "admin", "select", "union"]
    pats, ids = [], []
    for i in range(n_patterns):
        pats.append(words[i % len(words)] + str(i) + "zq")
        ids.append(i)
    return hs.compile_multi(pats, ids=ids)


def test_gate_masks_superset_and_class_constant():
    """The gate tables must be a per-(offset, byte) superset of the full
    masks (a gate miss must prove no bucket can hit) and constant within
    every byte class of the full masks (the gate kernel reuses the full
    masks' b2c remap)."""
    import numpy as np

    from hyperscan_tpu.ops.teddy import _class_split

    db = _gated_db()
    lit = db.lit
    assert lit.masks.shape[1] >= 2
    assert lit.gate_masks is not None
    M, W, _ = lit.masks.shape
    u = lit.masks.view(np.uint32)
    g = lit.gate_masks.view(np.uint32)
    for m in range(M):
        full_any = np.zeros(256, bool)
        for w in range(W):
            full_any |= u[m, w] != 0
        gate_any = g[m, 0] != 0
        assert not (full_any & ~gate_any).any(), f"gate not superset @m={m}"
    b2c, _cm = _class_split(lit.masks)
    inv = np.concatenate([b2c[0], b2c[1]])
    for m in range(M):
        for c in np.unique(inv):
            vals = np.unique(g[m, 0][inv == c])
            assert len(vals) == 1, (m, c)


def test_gated_equals_ungated_pipeline():
    """The gated two-stage filter+confirm must produce exactly the
    ungated fused pipeline's confirmed (fid, pos) set — plants at row
    boundaries (cross-row shift windows), mid-corpus, and near the end."""
    import jax.numpy as jnp
    import numpy as np

    from hyperscan_tpu.ops.teddy import (
        corpus_to_rows,
        teddy_confirm_finish,
        teddy_confirm_start,
    )

    db = _gated_db()
    lit = db.lit
    rng = np.random.default_rng(4)
    corpus = (32 + rng.integers(0, 95, size=300_000)).astype(np.uint8)
    plants = [b"attack0zq ", b"payload13zq!", b"union5zq"]
    # row-boundary crossings: factor tails straddle 128-byte rows
    offs = [0, 122, 250, 384, 6000, 131_070, 299_980]
    for k, off in enumerate(offs):
        p = plants[k % len(plants)]
        corpus[off: off + len(p)] = np.frombuffer(p, np.uint8)
    rows = jnp.asarray(corpus_to_rows(corpus))
    h = teddy_confirm_start(rows, lit, len(corpus))
    assert h[7] is True, "multi-word plan must route to the gated path"
    fid_g, pos_g = teddy_confirm_finish(h)
    gate = lit.gate_masks
    try:
        lit.gate_masks = None
        lit._dev_gate = None
        h2 = teddy_confirm_start(rows, lit, len(corpus))
        assert h2[7] is False
        fid_u, pos_u = teddy_confirm_finish(h2)
    finally:
        lit.gate_masks = gate
        if hasattr(lit, "_dev_gate"):
            del lit._dev_gate
    sg = sorted(zip(fid_g.tolist(), pos_g.tolist()))
    su = sorted(zip(fid_u.tolist(), pos_u.tolist()))
    assert sg == su and len(sg) >= len(offs)


def test_gated_survivor_capacity_overflow_grows(monkeypatch):
    """Survivor rows past capK must re-dispatch at a learned larger
    shape (without a host corpus) and lose nothing. (Survival-rate
    family selection is disabled here — see the test below for it.)"""
    import jax.numpy as jnp
    import numpy as np

    from hyperscan_tpu.ops import teddy as T
    from hyperscan_tpu.runtime.lit_runtime import verify_pairs

    monkeypatch.setattr(T, "GATE_ROW_FRAC", 1.0)
    db = _gated_db()
    lit = db.lit
    # a plant every 128-byte row for 1024 rows: K == 1024 > capK floor
    corpus = np.full(1 << 18, ord("."), dtype=np.uint8)
    p = np.frombuffer(b"attack0zq", np.uint8)
    n_plant = 1024
    for r in range(n_plant):
        corpus[r * 128 + 40: r * 128 + 40 + len(p)] = p
    h = T.teddy_confirm_start(jnp.asarray(T.corpus_to_rows(corpus)),
                              lit, len(corpus))
    assert h[7] is True
    fid, pos = T.teddy_confirm_finish(h)
    fid, pos = verify_pairs(lit, corpus, np.zeros(1, np.int64), fid, pos)
    hits = [(f, q) for f, q in zip(fid.tolist(), pos.tolist())]
    assert len(hits) == n_plant
    assert T._caps_for_gated(lit, 1 << 14)[0] >= n_plant


def test_gate_family_switch_on_high_survival():
    """A corpus where most rows survive the gate (here: a plant every
    other 128-byte row, ~50% survival vs the 1/64 threshold) must teach
    the database to dispatch the UNGATED family from the next start —
    the gated path's survivor machinery costs work proportional to capK
    and loses to the corpus-independent full filter at such rates — and
    the adversarial scan itself must still return the exact confirmed
    set (reference analogue: FDR flood detection,
    src/fdr/flood_runtime.h)."""
    import jax.numpy as jnp
    import numpy as np

    from hyperscan_tpu.ops import teddy as T
    from hyperscan_tpu.runtime.lit_runtime import verify_pairs

    db = _gated_db()
    lit = db.lit
    corpus = np.full(1 << 18, ord("."), dtype=np.uint8)
    p = np.frombuffer(b"attack0zq", np.uint8)
    n_plant = 1024
    for r in range(n_plant):
        corpus[r * 128 + 40: r * 128 + 40 + len(p)] = p
    rows = jnp.asarray(T.corpus_to_rows(corpus))
    h = T.teddy_confirm_start(rows, lit, len(corpus))
    assert h[7] is True  # first dispatch: nothing observed yet
    fid, pos = T.teddy_confirm_finish(h)
    fid, pos = verify_pairs(lit, corpus, np.zeros(1, np.int64), fid, pos)
    assert len(pos) == n_plant
    assert getattr(lit, "_gate_rate", 0.0) > T.GATE_ROW_FRAC
    h2 = T.teddy_confirm_start(rows, lit, len(corpus))
    assert h2[7] is False, "high survival must switch to ungated"
    fid2, pos2 = T.teddy_confirm_finish(h2)
    fid2, pos2 = verify_pairs(lit, corpus, np.zeros(1, np.int64),
                              fid2, pos2)
    assert sorted(zip(fid2.tolist(), pos2.tolist())) == \
        sorted(zip(fid.tolist(), pos.tolist()))


def test_gate_serialization_roundtrip():
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.database import Database

    db = _gated_db(400)
    data = db.serialize()
    db2 = Database.deserialize(data)
    assert db2.lit.gate_masks is not None
    assert np.array_equal(db2.lit.gate_masks, db.lit.gate_masks)
    out = hs.scan(db2, b"." * 500 + b"attack0zq" + b"." * 500)
    assert any(eid == 0 for (eid, _f, _t) in
               [(m[0], m[1], m[2]) for m in out])


def test_compact_extraction_equals_dense():
    """The in-kernel per-cell compaction must produce exactly the dense
    sparse-extraction pipeline's confirmed (fid, pos) set, including
    row-boundary and cell-boundary crossings."""
    import jax.numpy as jnp
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.ops import teddy as T

    db = hs.compile_multi(["needleZ", "probeQ"], ids=[1, 2])
    rng = np.random.default_rng(11)
    corpus = (32 + rng.integers(0, 95, size=200_000)).astype(np.uint8)
    offs = [0, 120, 127, 65_520, 65_533, 131_000, 199_990]
    for k, off in enumerate(offs):
        p = b"needleZ" if k % 2 else b"probeQ"
        corpus[off: off + len(p)] = np.frombuffer(p, np.uint8)
    rows = jnp.asarray(T.corpus_to_rows(corpus))
    h = T.teddy_confirm_start(rows, db.lit, len(corpus))
    assert h[6] is False, "fresh database must use the compact family"
    fid_c, pos_c = T.teddy_confirm_finish(h)
    try:
        db.lit._dense_extract = True
        h2 = T.teddy_confirm_start(rows, db.lit, len(corpus))
        assert h2[6] is True
        fid_d, pos_d = T.teddy_confirm_finish(h2)
    finally:
        db.lit._dense_extract = False
    assert sorted(zip(fid_c.tolist(), pos_c.tolist())) == \
        sorted(zip(fid_d.tolist(), pos_d.tolist()))
    assert len(pos_c) >= len(offs)


def test_compact_flood_demotes_to_dense():
    """A flood corpus (every position a candidate: a cell's count
    exceeds CAPC_MAX) must demote the database to the dense extraction
    family and still return the exact confirmed set (reference
    analogue: FDR flood handling, src/fdr/flood_runtime.h)."""
    import jax.numpy as jnp
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.ops import teddy as T
    from hyperscan_tpu.runtime.lit_runtime import verify_pairs

    db = hs.compile_multi(["aaaa"], ids=[3])
    corpus = np.full(1 << 17, ord("a"), dtype=np.uint8)
    rows = jnp.asarray(T.corpus_to_rows(corpus))
    h = T.teddy_confirm_start(rows, db.lit, len(corpus))
    fid, pos = T.teddy_confirm_finish(h)
    fid, pos = verify_pairs(db.lit, corpus, np.zeros(1, np.int64),
                            fid, pos)
    assert getattr(db.lit, "_dense_extract", False) is True
    # every offset >= 3 ends a match of aaaa
    assert len(pos) == len(corpus) - 3
    assert pos.min() == 3 and pos.max() == len(corpus) - 1
