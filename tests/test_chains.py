"""Chain decomposition (LEFT <gap> RIGHT) conformance.

Reference: the Rose prefix→infix→suffix role machinery (ng_violet.cpp
decomposition + rose role chaining); here restricted to single-class
infixes, resolved with prefix-end sets + suffix reverse scans + a
vectorized gap-run check."""

import numpy as np
import pytest

import hyperscan_tpu as hs
from hyperscan_tpu.compiler.parser import parse
from hyperscan_tpu.utils.oracle import ast_match_ends

CHAIN_PATTERNS = [
    r"foo[a-z]+bar",
    r"foo.*bar",
    r"abc\s+def",
    r"head[^\n]*tail",
    r"foo[a-z]*bar",
    r"^hdr.*end",
    r"foo.{2,}bar",
    r"one(two|2).*three",
]

CORPORA = [
    b"",
    b"foobar fooxbar foo bar",
    b"xx fooqqbar foo123bar fooa\nbar yy",
    b"abc   def abcdef abc\t\ndef",
    b"head zzz tail head\ntail headtail",
    b"hdr stuff end zhdr zzz end",
    b"fooxxbar fooxbar",
    b"onetwo stuff three one2 three onethree",
    b"foo" + b"x" * 600 + b"bar",       # gap crossing teddy cell rows
    b"fooabar " * 50,                    # many prefix/suffix hits
    b"bar foo",                          # suffix before prefix
]


@pytest.fixture(scope="module")
def db():
    d = hs.compile_multi(CHAIN_PATTERNS, ids=list(range(len(CHAIN_PATTERNS))))
    assert d.lit is not None and len(d.lit.chains) == len(CHAIN_PATTERNS)
    return d


def test_chain_vs_oracle(db):
    for data in CORPORA:
        got = {}
        for (mid, _f, to) in hs.scan(db, data):
            got.setdefault(mid, set()).add(to)
        for i, pat in enumerate(CHAIN_PATTERNS):
            want = ast_match_ends(parse(pat, 0), data)
            assert got.get(i, set()) == want, (
                f"{pat!r} on {data[:40]!r}: "
                f"{sorted(got.get(i, set()))} != {sorted(want)}"
            )


def test_chain_serialize_roundtrip(db):
    db2 = hs.deserialize_database(hs.serialize_database(db))
    assert len(db2.lit.chains) == len(CHAIN_PATTERNS)
    data = b"xx fooqqbar abc  def head...tail"
    assert hs.scan(db2, data) == hs.scan(db, data)


def test_chain_gap_respects_block_boundary():
    d = hs.compile(r"foo.*bar")
    # prefix in one block, suffix in the next: must NOT match
    res = hs.scan_batch(d, [b"xx foozz", b"zzbar yy"])
    assert res == [[], []]


def test_chain_with_min_gap():
    d = hs.compile(r"aqz.{3,}xvb")
    got = {t for (_i, _f, t) in hs.scan(d, b"aqz12xvb aqz123xvb")}
    assert got == {18}


def test_chain_streaming_basic():
    d = hs.compile(r"foo[a-z]+bar", mode=hs.HS_MODE_STREAM)
    assert d.lit.chains
    st = hs.open_stream(d)
    ms = hs.scan_stream(st, b"fooqq")
    ms += hs.scan_stream(st, b"qbar")
    ms += hs.close_stream(st)
    assert ms == [(0, 0, 9)]


def test_chain_streaming_long_gap_carried_evidence():
    # the prefix leaves the history window entirely; the carried chain
    # state must keep the evidence alive across the gap
    d = hs.compile(r"foo[a-z]+bar", mode=hs.HS_MODE_STREAM)
    st = hs.open_stream(d)
    ms = hs.scan_stream(st, b"xx fooq")
    for _ in range(5):
        ms += hs.scan_stream(st, b"q" * 100)
    ms += hs.scan_stream(st, b"qbar")
    ms += hs.close_stream(st)
    assert ms == [(0, 0, 511)]


def test_chain_streaming_gap_break_kills_evidence():
    d = hs.compile(r"foo[a-z]+bar", mode=hs.HS_MODE_STREAM)
    st = hs.open_stream(d)
    ms = hs.scan_stream(st, b"xx fooqqq")
    ms += hs.scan_stream(st, b"q" * 60 + b"!" + b"q" * 10)  # '!' breaks gap
    ms += hs.scan_stream(st, b"qbar")
    ms += hs.close_stream(st)
    assert ms == []


def test_chain_streaming_compress_roundtrip():
    d = hs.compile(r"foo.*bar", mode=hs.HS_MODE_STREAM)
    st = hs.open_stream(d)
    hs.scan_stream(st, b"foo then a lot " + b"x" * 80)
    buf = hs.compress_stream(st)
    st2 = hs.expand_stream(d, buf)
    a = hs.scan_stream(st, b" and bar") + hs.close_stream(st)
    b = hs.scan_stream(st2, b" and bar") + hs.close_stream(st2)
    assert a == b and len(a) == 1


def test_chain_stream_equals_block_random_splits():
    pats = [r"foo[a-z]+bar", r"abc\s+def"]
    bdb = hs.compile_multi(pats, ids=[1, 2])
    sdb = hs.compile_multi(pats, ids=[1, 2], mode=hs.HS_MODE_STREAM)
    rng = np.random.default_rng(9)
    corpora = [
        b"fooqbar abc def",
        b"foo" + b"m" * 200 + b"bar xyz abc \t def",
        b"fooq barq fooabar abcdef abc  def",
    ]
    for data in corpora:
        want = {(m, t) for (m, _f, t) in hs.scan(bdb, data)}
        for _ in range(4):
            k = int(rng.integers(1, 6))
            cuts = sorted(rng.choice(len(data), size=k, replace=False).tolist())
            st = hs.open_stream(sdb)
            ms, prev = [], 0
            for c in cuts + [len(data)]:
                ms.extend(hs.scan_stream(st, data[prev:c]))
                prev = c
            ms.extend(hs.close_stream(st))
            got = {(m, t) for (m, _f, t) in ms}
            assert got == want, f"{data!r} cuts={cuts}: {sorted(got)} != {sorted(want)}"


def test_multigap_chain_routing_and_matches():
    """`alpha.*beta.*gamma` must be literal-routed (multi-role chain),
    with exact oracle parity (reference: doViolet multi-cut splits,
    ng_violet.cpp:3053)."""
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.compiler.parser import parse
    from hyperscan_tpu.utils.oracle import ast_match_ends

    db = hs.compile_multi([r"alpha.*beta.*gamma"])
    assert db.lit is not None and db.lit.chains[0].num_roles == 3
    assert not db.engines

    rng = np.random.default_rng(12)
    node = parse(r"alpha.*beta.*gamma", 0)
    for _ in range(30):
        d = b""
        for plant in [b"alpha", b"beta", b"gamma", b"alphabetagamma"]:
            if rng.integers(0, 2):
                d += plant
            d += bytes(rng.choice(np.frombuffer(b"abgl m", np.uint8),
                                  size=int(rng.integers(0, 10))))
        got = {t for (_i, _f, t) in hs.scan(db, d)}
        assert got == ast_match_ends(node, d), d


def test_multigap_chain_streaming_splits():
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.compiler.parser import parse
    from hyperscan_tpu.utils.oracle import ast_match_ends

    pat = r"foo[a-c]*barx[0-9]*qux"
    sdb = hs.compile_multi([pat], mode=hs.HS_MODE_STREAM)
    node = parse(pat, 0)
    d = b"zz fooabc barx123 qux foobarxqux tail"
    want = ast_match_ends(node, d)
    rng = np.random.default_rng(8)
    for _ in range(12):
        k = int(rng.integers(1, 7))
        cuts = sorted(rng.choice(len(d), size=k, replace=False).tolist())
        st = hs.open_stream(sdb)
        ms, prev = [], 0
        for c in cuts + [len(d)]:
            ms += hs.scan_stream(st, d[prev:c])
            prev = c
        ms += hs.close_stream(st)
        assert {m[2] for m in ms} == want, cuts


# --- leading / trailing counted gaps (Castle-prefix / MPV-puff analogues,
# reference: src/nfa/castle.c, src/nfa/mpv.c) --------------------------------

LEAD_TRAIL_PATTERNS = [
    r"foo[0-9]{600,}",        # trailing unbounded counted gap
    r"xyz[0-9]{512,1200}",    # trailing bounded counted gap
    r"[0-9]{600,}foo",        # leading unbounded counted gap
    r"[a-z]{512,1200}END",    # leading bounded counted gap
    r"abc.*",                 # trailing .* (dense ends)
    r"hdr[^\n]{600,}stop.*",  # mid gap + trailing gap
]


def _lead_trail_db(mode=0):
    kw = {"mode": mode} if mode else {}
    d = hs.compile_multi(
        LEAD_TRAIL_PATTERNS, ids=list(range(len(LEAD_TRAIL_PATTERNS))), **kw
    )
    assert d.lit is not None and not d.engines, "all must literal-route"
    for i in (0, 1, 4):
        assert d.lit.chains[i].trail is not None
    for i in (2, 3):
        assert d.lit.chains[i].lead is not None
    return d


def _lt_corpora():
    return [
        b"",
        b"foo" + b"7" * 599,                      # one short of trail lo
        b"foo" + b"7" * 800,                      # long run
        b"foo" + b"7" * 650 + b"q" + b"7" * 700,  # broken run
        b"xyz" + b"1" * 1400,                     # bounded trail caps ends
        b"7" * 700 + b"foo " + b"7" * 599 + b"foo",
        b"m" * 600 + b"END " + b"m" * 200 + b"END",
        b"abc tail abc",
        b"hdr" + b"x" * 700 + b"stop...",
        b"hdr" + b"x" * 700 + b"\n" + b"x" * 10 + b"stop..",
    ]


def test_lead_trail_chain_vs_oracle():
    db = _lead_trail_db()
    for data in _lt_corpora():
        got = {}
        for (mid, _f, to) in hs.scan(db, data):
            got.setdefault(mid, set()).add(to)
        for i, pat in enumerate(LEAD_TRAIL_PATTERNS):
            want = ast_match_ends(parse(pat, 0), data)
            assert got.get(i, set()) == want, (
                f"{pat!r} on {data[:32]!r}...: missing "
                f"{sorted(want - got.get(i, set()))[:5]} extra "
                f"{sorted(got.get(i, set()) - want)[:5]}"
            )


def test_lead_trail_serialize_roundtrip():
    db = _lead_trail_db()
    db2 = hs.deserialize_database(hs.serialize_database(db))
    ch = db2.lit.chains[0]
    assert ch.trail is not None and ch.trail[1] == 600
    data = b"foo" + b"7" * 700
    assert hs.scan(db2, data) == hs.scan(db, data)


def test_lead_trail_stream_equals_block_random_splits():
    bdb = _lead_trail_db()
    sdb = _lead_trail_db(mode=hs.HS_MODE_STREAM)
    rng = np.random.default_rng(17)
    for data in _lt_corpora():
        if not data:
            continue
        want = {(m, t) for (m, _f, t) in hs.scan(bdb, data)}
        for _ in range(3):
            k = int(rng.integers(1, 6))
            cuts = sorted(
                rng.choice(len(data), size=min(k, len(data) - 1),
                           replace=False).tolist()
            )
            st = hs.open_stream(sdb)
            ms, prev = [], 0
            for c in cuts + [len(data)]:
                ms.extend(hs.scan_stream(st, data[prev:c]))
                prev = c
            ms.extend(hs.close_stream(st))
            got = {(m, t) for (m, _f, t) in ms}
            assert got == want, (
                f"{data[:32]!r} cuts={cuts}: missing "
                f"{sorted(want - got)[:6]} extra {sorted(got - want)[:6]}"
            )


def test_trail_chain_stream_run_survives_many_writes():
    # the pending trail run crosses many writes; ends keep firing
    d = hs.compile(r"foo[0-9]{600,}", mode=hs.HS_MODE_STREAM)
    st = hs.open_stream(d)
    ms = hs.scan_stream(st, b"foo" + b"5" * 10)
    for _ in range(7):
        ms += hs.scan_stream(st, b"5" * 100)
    ms += hs.close_stream(st)
    tos = sorted(t for (_m, _f, t) in ms)
    assert tos == list(range(603, 714))  # every offset from lo to run end


def test_trail_chain_stream_compress_roundtrip():
    d = hs.compile(r"foo[0-9]{600,}", mode=hs.HS_MODE_STREAM)
    st = hs.open_stream(d)
    hs.scan_stream(st, b"foo" + b"5" * 300)
    buf = hs.compress_stream(st)
    st2 = hs.expand_stream(d, buf)
    a = hs.scan_stream(st, b"5" * 400) + hs.close_stream(st)
    b = hs.scan_stream(st2, b"5" * 400) + hs.close_stream(st2)
    assert a == b and len(a) == 101


# --------------------------------------------------------------------------
# General (non-single-class) infix gaps: arbitrary sub-graphs between
# literal roles, joins validated by the forward injection scan
# (reference: doViolet with LeftEngInfo infix engines, ng_violet.cpp:3053,
# rose_graph.h:140, infix.h)
# --------------------------------------------------------------------------

INFIX_PATS = [
    r"foomark(ab|cd)*barmark",
    r"foomark(ab|cd)+barmark",
    r"alpha(x[0-9]y|qq)*omega7",
    r"lead77(GET |POST )+trail",
    r"aaa111(bc*d|e)*zzz222",
    r"one11(ab|cd)*two22(ef|gh)+three33",  # two general gaps
    r"mix44[0-9]*gap55(xy|z)+end66",       # class gap + general gap
]


@pytest.mark.parametrize("pat", INFIX_PATS)
def test_general_infix_routes_literal(pat):
    """The VERDICT r2 regression: a non-single-class infix must keep the
    literal prefilter (block mode)."""
    db = hs.compile_multi([pat], ids=[5])
    assert db.lit is not None and not db.engines
    assert 0 in db.lit.chains and db.lit.chains[0].infix


@pytest.mark.parametrize("pat", INFIX_PATS)
def test_general_infix_oracle_exact(pat):
    rng = np.random.default_rng(11)
    db = hs.compile_multi([pat], ids=[5])
    frags = [b"foomark", b"barmark", b"ab", b"cd", b"alpha", b"omega7",
             b"x3y", b"qq", b"lead77", b"GET ", b"POST ", b"trail",
             b"aaa111", b"zzz222", b"bcd", b"bccccd", b"e",
             b"one11", b"two22", b"three33", b"ef", b"gh",
             b"mix44", b"gap55", b"xy", b"z", b"end66",
             b"foomarkabbarmark", b"one11two22efthree33",
             b"mix44123gap55xyzend66", b"alphaqqx4yomega7"]
    for _trial in range(10):
        blob = bytearray(
            (32 + rng.integers(0, 95, 300)).astype(np.uint8).tobytes())
        for _ in range(int(rng.integers(2, 10))):
            f = frags[int(rng.integers(0, len(frags)))]
            off = int(rng.integers(0, 280))
            blob[off:off + len(f)] = f
        data = bytes(blob)
        got = {t for (_i, _f, t) in hs.scan(db, data)}
        want = ast_match_ends(parse(pat, 0), data)
        assert got == want, (sorted(got ^ want))


def test_general_infix_edges():
    db = hs.compile_multi([r"fooseg(ab|cd)*barseg"], ids=[1])
    # zero-length gap (nullable infix)
    assert hs.scan(db, b"foosegbarseg") == [(1, 0, 12)]
    # one and many repetitions, mixed branches
    assert hs.scan(db, b"foosegabbarseg") == [(1, 0, 14)]
    assert hs.scan(db, b"foosegabcdabbarseg") == [(1, 0, 18)]
    # broken gap does not connect
    assert hs.scan(db, b"foosegaXbarseg") == []
    assert hs.scan(db, b"foosegabXcdbarseg") == []
    # non-nullable variant rejects the empty gap
    db2 = hs.compile_multi([r"fooseg(ab|cd)+barseg"], ids=[1])
    assert hs.scan(db2, b"foosegbarseg") == []
    assert hs.scan(db2, b"foosegcdbarseg") == [(1, 0, 14)]
    # serialize round trip preserves the infix engine
    db3 = hs.deserialize_database(hs.serialize_database(db))
    assert hs.scan(db3, b"zzfoosegababbarseg") == [(1, 0, 18)]


def test_general_infix_streaming_carried_state():
    """Streaming carries the infix engine's state across writes (NFA
    mask at the next extent start + recent role ends): matches whose
    gap spans many writes must be found, and write splits must be
    invisible (block parity)."""
    db = hs.compile_multi([r"fooseg(ab|cd)*barseg"], ids=[1],
                          mode=hs.HS_MODE_STREAM)
    assert db.lit is not None and 0 in db.lit.chains \
        and db.lit.chains[0].infix
    st = hs.open_stream(db)
    ms = hs.scan_stream(st, b"foosegab")
    ms += hs.scan_stream(st, b"cdbarseg!")
    ms += hs.close_stream(st)
    assert (1, 0, 16) in ms

    # gap spanning MANY writes (far beyond the history window)
    st = hs.open_stream(db)
    ms = hs.scan_stream(st, b"xx fooseg")
    for _ in range(40):
        ms += hs.scan_stream(st, b"abcd" * 16)
    ms += hs.scan_stream(st, b"abbarseg yy")
    ms += hs.close_stream(st)
    assert len(ms) == 1 and ms[0][2] == 9 + 40 * 64 + 8, ms
    # a broken gap mid-stream kills the carried state
    st = hs.open_stream(db)
    hs.scan_stream(st, b"fooseg" + b"ab" * 30)
    hs.scan_stream(st, b"X")
    ms = hs.scan_stream(st, b"ab" * 10 + b"barseg")
    assert ms == []


@pytest.mark.parametrize("pat", INFIX_PATS)
@pytest.mark.parametrize("seed", [3, 9])
def test_general_infix_stream_splits_match_block(pat, seed):
    """Random write splits (with state-codec round trips) must reproduce
    the block match set for general-infix chains."""
    bdb = hs.compile_multi([pat], ids=[5])
    sdb = hs.compile_multi([pat], ids=[5], mode=hs.HS_MODE_STREAM)
    rng = np.random.default_rng(seed)
    frags = [b"foomark", b"barmark", b"ab", b"cd", b"alpha", b"omega7",
             b"x3y", b"qq", b"lead77", b"GET ", b"POST ", b"trail",
             b"aaa111", b"zzz222", b"bcd", b"e", b"one11", b"two22",
             b"three33", b"ef", b"gh", b"mix44", b"gap55", b"xy", b"z",
             b"end66", b"foomarkababbarmark", b"one11cdtwo22ghthree33"]
    for _trial in range(6):
        blob = bytearray(
            (32 + rng.integers(0, 95, 300)).astype(np.uint8).tobytes())
        for _ in range(int(rng.integers(3, 10))):
            f = frags[int(rng.integers(0, len(frags)))]
            off = int(rng.integers(0, 280))
            blob[off:off + len(f)] = f
        data = bytes(blob)
        want = set(hs.scan(bdb, data))
        k = int(rng.integers(1, 7))
        cuts = sorted(rng.choice(len(data), size=k, replace=False).tolist())
        st = hs.open_stream(sdb)
        ms = []
        prev = 0
        for ci, c in enumerate(cuts + [len(data)]):
            ms.extend(hs.scan_stream(st, data[prev:c]))
            if ci % 2 == 1:
                st = hs.expand_stream(sdb, hs.compress_stream(st))
            prev = c
        ms.extend(hs.close_stream(st))
        assert set(ms) == want, (pat, _trial, sorted(set(ms) ^ want))


def test_nested_chain_alternations_ride_infix_gaps():
    """Alternations OF sub-chains between literal roles (role-graph
    shapes: `pre(foo.*bar|baz\\d+qux)post`) keep the literal prefilter —
    the alternation compiles into the gap's infix NFA (reference: Rose
    role graphs from RoseInGraph, rose_graph.h)."""
    for p in (r"pre7x(foo.*bar|baz[0-9]+qux)post7y",
              r"hdr9(GET .*|POST [a-z]+)end9q"):
        db = hs.compile_multi([p], ids=[1])
        assert db.lit is not None and not db.engines
        assert 0 in db.lit.chains and db.lit.chains[0].infix
        rng = np.random.default_rng(2)
        frags = [b"pre7x", b"post7y", b"foo", b"bar", b"baz123qux",
                 b"fooZZbar", b"hdr9", b"end9q", b"GET xx", b"POST ab"]
        for t in range(6):
            blob = bytearray(
                (32 + rng.integers(0, 95, 250)).astype(np.uint8).tobytes())
            for _ in range(int(rng.integers(2, 8))):
                f = frags[int(rng.integers(0, len(frags)))]
                off = int(rng.integers(0, 230))
                blob[off:off + len(f)] = f
            data = bytes(blob)
            got = {x[2] for x in hs.scan(db, data)}
            want = ast_match_ends(parse(p, 0), data)
            assert got == want, (p, t, sorted(got ^ want))


def test_wide_infix_multiword_stays_literal_routed():
    """A 16-token alternation infix (>62 Glushkov positions, past the
    round-3 single-word cap) must stay on the literal path with a
    multi-word infix NFA — block, stream-split, and a compress/expand
    round trip mid-gap (reference: 512-bit LimEx infixes,
    src/nfa/limex_simd512.c)."""
    import numpy as np

    import hyperscan_tpu as hs

    alts = "|".join(f"tk{i:02d}" for i in range(16))
    pat = f"foomark({alts})*barmark"
    db = hs.compile_multi([pat], ids=[5])
    assert db.lit is not None and not db.engines
    inf = db.lit.chains[0].infix[0]
    assert len(inf.follow) - 1 > 62  # genuinely multi-word
    assert inf.follow.shape[1] >= 2

    data = b"." * 100 + b"foomark" + b"tk03tk15tk00" + b"barmark" + b"." * 50
    ms = [(m[0], m[1], m[2]) for m in hs.scan(db, data)]
    assert (5, 0, 126) in ms
    assert hs.scan(
        db, b"." * 100 + b"foomarktk03xk15barmark" + b"." * 50) == []
    assert any(m[0] == 5 for m in hs.scan(db, b"foomarkbarmark"))

    sdb = hs.compile_multi([pat], ids=[5], mode=hs.HS_MODE_STREAM)
    st = hs.open_stream(sdb)
    out = hs.scan_stream(st, b"." * 30 + b"foomarktk01tk0")
    st2 = hs.expand_stream(sdb, hs.compress_stream(st))
    out += hs.scan_stream(st2, b"2tk11tk04")
    out += hs.scan_stream(st2, b"tk09barmark!!")
    out += hs.close_stream(st2)
    assert any(m[0] == 5 for m in out), out


def test_wide_infix_serialize_roundtrip():
    import numpy as np

    import hyperscan_tpu as hs

    alts = "|".join(f"w{i}x{i}" for i in range(14))
    pat = f"headmark({alts})+tailmark"
    db = hs.compile_multi([pat], ids=[3])
    assert db.lit is not None and not db.engines
    db2 = hs.deserialize_database(db.serialize())
    data = b"?" * 64 + b"headmarkw3x3w9x9tailmark" + b"?" * 64
    a = sorted(hs.scan(db, data))
    b = sorted(hs.scan(db2, data))
    assert a == b and len(a) == 1


def test_many_roles_chain():
    """Chains with more than 8 roles (the round-3 cap) stay on the
    literal path end to end."""
    import hyperscan_tpu as hs
    from hyperscan_tpu.utils.oracle import ast_match_ends
    from hyperscan_tpu.compiler.parser import parse

    segs = [f"seg{i:02d}tok" for i in range(12)]
    pat = ".*".join(segs)
    db = hs.compile_multi([pat], ids=[1])
    assert db.lit is not None and not db.engines
    assert db.lit.chains[0].num_roles == 12
    data = b"__" + b"__".join(s.encode() for s in segs) + b"__"
    ms = hs.scan(db, data)
    want = ast_match_ends(parse(pat, 0), data)
    assert sorted(m[2] for m in ms) == sorted(want)
    # a broken middle role must reject
    bad = data.replace(b"seg06tok", b"seg06tak")
    assert hs.scan(db, bad) == []


def test_wide_infix_high_positions_cross_write_boundary():
    """Round-5 regression (collider seed 424242): a write boundary that
    leaves HIGH infix NFA positions live makes the carried mask exceed
    int64 — the chain_ctx build must keep infix evidence as Python ints
    (np.asarray(int64) raised OverflowError), in both the per-stream
    and StreamSet paths, and through the state codec."""
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.runtime.streamset import (
        open_streamset,
        streamset_write_finish,
        streamset_write_start,
    )

    alts = "|".join(f"tok{i:02d}" for i in range(16))
    pat = f"foomark({alts})*barmark"
    sdb = hs.compile_multi([pat], ids=[7], mode=hs.HS_MODE_STREAM)
    inf = sdb.lit.chains[0].infix[0]
    assert len(inf.follow) - 1 > 62

    # split INSIDE the last alternation token: its Glushkov positions
    # are the highest, so the carried mask needs the top mask word
    st = hs.open_stream(sdb)
    out = hs.scan_stream(st, b"x" * 40 + b"foomarktok15tok1")
    # mid-gap codec round trip with the wide mask live
    st2 = hs.expand_stream(sdb, hs.compress_stream(st))
    out += hs.scan_stream(st2, b"5tok1")  # still inside tok15's band
    out += hs.scan_stream(st2, b"4barmark zz")
    out += hs.close_stream(st2)
    assert any(m[0] == 7 for m in out), out

    # same through the StreamSet bulk path
    ss = open_streamset(sdb, 2)
    writes = [
        [b"y" * 20 + b"foomarktok15tok1", b"noise only here...."],
        [b"5tok15tok1", b"more noise.........."],
        [b"5barmark!!", b"...................."],
    ]
    nm = 0
    for w in writes:
        h = streamset_write_start(sdb, ss, w)
        nm += sum(len(m) for m in streamset_write_finish(sdb, ss, h))
    assert nm >= 1
