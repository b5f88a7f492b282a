"""Bit-parallel NFA engine (LimEx analogue) conformance.

Reference: the LimEx engines keep DFA-blowup patterns compilable
(src/nfa/limex_compile.cpp); these tests pin the same capability: the
`.*a.{18}b` class compiles, scans on the layered device path, carries
state across stream writes, and round-trips serialization.
"""

import numpy as np
import pytest

import hyperscan_tpu as hs
from hyperscan_tpu.compiler.bitnfa import build_bitnfa, bitnfa_scan_reference
from hyperscan_tpu.compiler.glushkov import build_nfa, reduce_graph
from hyperscan_tpu.compiler.parser import parse
from hyperscan_tpu.database import NfaEngine, compile_patterns
from hyperscan_tpu.grey import Grey
from hyperscan_tpu.utils.oracle import ast_match_ends

BLOWUPS = [r".*a.{18}b", r".*[ab]c.{12}[de]", r"(x|y).*q.{9}z"]


def _rand(rng, alphabet: bytes, n: int) -> bytes:
    return bytes(rng.choice(np.frombuffer(alphabet, np.uint8), size=n))


def test_blowup_pattern_compiles_to_bitnfa():
    db = hs.compile_multi([r".*a.{18}b"])
    assert any(isinstance(e, NfaEngine) for e in db.engines)
    eng = next(e for e in db.engines if isinstance(e, NfaEngine))
    assert eng.acyclic and eng.max_depth == 20


def test_reduce_graph_preserves_match_ends():
    rng = np.random.default_rng(7)
    for pat in [r".*a.{5}b", r"a*b", r"(a|.)*x", r".*foo", r"[^x]*foo"]:
        g = build_nfa(parse(pat, 0))
        r = reduce_graph(g)
        node = parse(pat, 0)
        for _ in range(25):
            d = _rand(rng, b"abfox\n ", int(rng.integers(0, 40)))
            nfa = build_bitnfa([r], [0])
            got = {t for (_e, t) in bitnfa_scan_reference(nfa, d)}
            assert got == ast_match_ends(node, d), (pat, d)


@pytest.mark.parametrize("pat", BLOWUPS)
def test_bitnfa_host_path_vs_oracle(pat):
    rng = np.random.default_rng(3)
    db = hs.compile_multi([pat])
    node = parse(pat, 0)
    for _ in range(15):
        d = _rand(rng, b"abcdexyzq", int(rng.integers(0, 300)))
        got = {t for (_i, _f, t) in hs.scan(db, d)}
        assert got == ast_match_ends(node, d), (pat, d[:60])


def test_bitnfa_device_path_vs_reference():
    # > HOST_SCAN_LIMIT routes through the layered device kernel
    rng = np.random.default_rng(5)
    pat = r".*a.{18}b"
    db = hs.compile_multi([pat])
    d = _rand(rng, b"aabxy", 150_000)
    got = {t for (_i, _f, t) in hs.scan(db, d)}
    nfa = build_bitnfa([reduce_graph(build_nfa(parse(pat, 0)))], [0])
    want = {t for (_e, t) in bitnfa_scan_reference(nfa, d)}
    assert got == want and len(want) > 100


def test_bitnfa_device_anchored():
    rng = np.random.default_rng(6)
    pat = r"^[ab]a.{10}b"
    db = compile_patterns(
        [pat], grey=Grey(max_dfa_states=8, allow_teddy=False)
    )
    assert isinstance(db.engines[0], NfaEngine)
    from hyperscan_tpu.runtime.scan import scan_block

    d = _rand(rng, b"ab", 140_000)
    got = {t for (_i, _f, t) in scan_block(db, d)[0]}
    nfa = build_bitnfa([reduce_graph(build_nfa(parse(pat, 0)))], [0])
    want = {t for (_e, t) in bitnfa_scan_reference(nfa, d)}
    assert got == want


def test_bitnfa_streaming_and_codec():
    rng = np.random.default_rng(9)
    pat = r".*a.{18}b"
    sdb = hs.compile_multi([pat], mode=hs.HS_MODE_STREAM)
    bdb = hs.compile_multi([pat])
    d = _rand(rng, b"aabxy", 2500)
    want = {t for (_i, _f, t) in hs.scan(bdb, d)}
    for cuts in ([100, 500, 1400], [1, 2, 20, 21], [2499]):
        st = hs.open_stream(sdb)
        ms, prev = [], 0
        for c in cuts + [len(d)]:
            ms += hs.scan_stream(st, d[prev:c])
            prev = c
        ms += hs.close_stream(st)
        assert {m[2] for m in ms} == want, cuts
    # compress/expand round-trips bit-NFA (big-int) states
    st = hs.open_stream(sdb)
    hs.scan_stream(st, d[:1200])
    st2 = hs.expand_stream(sdb, hs.compress_stream(st))
    a = hs.scan_stream(st, d[1200:]) + hs.close_stream(st)
    b = hs.scan_stream(st2, d[1200:]) + hs.close_stream(st2)
    assert a == b


def test_bitnfa_serialize_roundtrip():
    db = hs.compile_multi(BLOWUPS, ids=[1, 2, 3])
    db2 = hs.deserialize_database(hs.serialize_database(db))
    rng = np.random.default_rng(1)
    d = _rand(rng, b"abcdexyzq", 400)
    assert sorted(hs.scan(db, d)) == sorted(hs.scan(db2, d))


def test_bitnfa_native_matches_numpy(monkeypatch):
    rng = np.random.default_rng(2)
    db = hs.compile_multi([r".*a.{18}b"])
    eng = db.engines[0]
    data = rng.choice(np.frombuffer(b"aabxy", np.uint8), size=(2, 3000))
    lengths = np.asarray([3000, 2500], np.int32)
    from hyperscan_tpu.native import bitnfa_scan_batch_native
    from hyperscan_tpu.runtime.nfa_host import nfa_scan_host

    native = bitnfa_scan_batch_native(
        eng, data, lengths, [eng.start_state] * 2
    )
    if native is None:
        pytest.skip("native runtime unavailable")
    monkeypatch.setenv("HSTPU_NO_NATIVE", "1")
    fallback = nfa_scan_host(eng, data, lengths, [eng.start_state] * 2)
    for (np_, nv), (fp, fv) in zip(native[0], fallback[0]):
        assert np_.tolist() == fp.tolist()
        assert nv.tolist() == fv.tolist()
    assert native[1] == fallback[1]


def test_capacity_overflow_learns_hint():
    """Overflow retries jump straight to the needed bucket and remember
    it: a repeat scan neither retries nor compiles a new kernel shape."""
    from hyperscan_tpu.ops import dfa_kernel

    rng = np.random.default_rng(4)
    db = compile_patterns([r"ab"], grey=Grey(allow_teddy=False))
    eng = db.engines[0]
    d = bytes(rng.choice(np.frombuffer(b"ab", np.uint8), size=200_000))
    blocks = [d]
    recs1, _ = dfa_kernel.dfa_scan_corpus_device(
        eng, blocks, np.ones(1, bool), capacity=64
    )
    assert get_hint_count(eng) is not None
    before = dfa_kernel._jit_scan.cache_info().misses
    recs2, _ = dfa_kernel.dfa_scan_corpus_device(
        eng, blocks, np.ones(1, bool), capacity=64
    )
    after = dfa_kernel._jit_scan.cache_info().misses
    assert after == before, "repeat scan compiled a new kernel shape"
    assert sorted(zip(*[a.tolist() for a in recs1])) == sorted(
        zip(*[a.tolist() for a in recs2])
    )


def get_hint_count(eng):
    from hyperscan_tpu.ops.teddy import get_capacity_hint

    return get_capacity_hint(eng, "dfa")


def test_anchored_dominance_reduction():
    """`^.*foo` (DOTALL) reduces to floating `foo`; `^.+foo` must NOT
    (a byte is mandatory before the literal)."""
    from hyperscan_tpu.utils.oracle import nfa_match_ends

    DOTALL = hs.HS_FLAG_DOTALL
    g1 = build_nfa(parse(r"^.*foo", DOTALL))
    r1 = reduce_graph(g1)
    assert r1.num_positions == g1.num_positions - 1
    assert nfa_match_ends(r1, b"foo") == {3}

    g2 = build_nfa(parse(r"^.+foo", DOTALL))
    r2 = reduce_graph(g2)
    assert nfa_match_ends(r2, b"foo") == set()
    assert nfa_match_ends(r2, b"xfoo") == {4}


@pytest.mark.skipif(
    not __import__("os").environ.get("HSTPU_SLOW_TESTS"),
    reason="Pallas interpret mode takes minutes; set HSTPU_SLOW_TESTS=1",
)
def test_pallas_layered_kernel_interpret(monkeypatch):
    """The Pallas layered kernel (VMEM-resident planes) matches the
    reference scan in interpret mode, including EOD accepts (verified in
    a full run with HSTPU_SLOW_TESTS=1; 334s on the dev CPU)."""
    import numpy as np

    from hyperscan_tpu.database import compile_patterns
    from hyperscan_tpu.grey import Grey
    from hyperscan_tpu.ops import nfa_kernel as NK
    from hyperscan_tpu.runtime.scan import scan_block

    monkeypatch.setattr(NK, "TILE_BODY", 1 << 12)
    monkeypatch.setattr(NK, "_FORCE_PALLAS", True)
    NK._jit_group_pallas.cache_clear()

    pat = r".*x.{8}(y|z)$"
    db = compile_patterns(
        [pat], grey=Grey(max_dfa_states=8, allow_teddy=False,
                         host_scan_limit=1 << 10)
    )
    from hyperscan_tpu.database import NfaEngine

    eng = db.engines[0]
    assert isinstance(eng, NfaEngine) and bool(eng.accept_eod_gid.max())
    rng = np.random.default_rng(3)
    from hyperscan_tpu.compiler.parser import parse
    from hyperscan_tpu.utils.oracle import ast_match_ends

    node = parse(pat, 0)
    d = bytes(rng.choice(np.frombuffer(b"xyzab", np.uint8), size=9000))
    got = {t for (_i, _f, t) in scan_block(db, d)[0]}
    assert got == ast_match_ends(node, d)


def test_cyclic_nfa_speculative_device_scan():
    """Cyclic literal-less bit-NFA engines (the last host-only class)
    scan on device via their lazy-DFA core (partial determinization +
    chunk speculation); sink/mismatch chunks rescan exactly on host.
    Must be bit-identical to the host word-packed loop."""
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.database import NfaEngine
    from hyperscan_tpu.grey import Grey

    pat = r"(ax|by|cz|dw)+[!]"
    db = compile_patterns([pat], grey=Grey(max_dfa_states=8,
                                           allow_teddy=False))
    eng = next(e for e in db.engines if isinstance(e, NfaEngine))
    assert not eng.acyclic and eng.spec_dfa is not None
    assert eng.spec_dfa.sink_state is not None \
        or eng.spec_dfa.state_masks is not None

    rng = np.random.default_rng(17)
    # large block (forces the device path) with planted accept paths
    blob = bytearray(
        (32 + rng.integers(0, 95, 300_000)).astype(np.uint8).tobytes())
    for k in range(60):
        frag = b"ax" * int(rng.integers(0, 4)) + b"by" + b"!"
        off = int(rng.integers(0, len(blob) - 20))
        blob[off:off + len(frag)] = frag
    data = bytes(blob)

    got = sorted(hs.scan(db, data))

    # host-only reference: same engine with the spec core stripped
    db2 = compile_patterns([pat], grey=Grey(max_dfa_states=8,
                                            allow_teddy=False))
    eng2 = next(e for e in db2.engines if isinstance(e, NfaEngine))
    eng2.spec_dfa = None
    ref = sorted(hs.scan(db2, data))
    assert got == ref and len(got) >= 40

    # serialize round trip keeps the spec core
    db3 = hs.deserialize_database(hs.serialize_database(db))
    eng3 = next(e for e in db3.engines if isinstance(e, NfaEngine))
    assert eng3.spec_dfa is not None
    assert sorted(hs.scan(db3, data)) == got

    # tiny core: transitions leave the explored space (real sink) —
    # sink-touched chunks must rescan exactly on host
    import hyperscan_tpu.database as dbmod

    old = dbmod.SPEC_DFA_STATES
    dbmod.SPEC_DFA_STATES = 5
    try:
        db4 = compile_patterns([pat], grey=Grey(max_dfa_states=8,
                                                allow_teddy=False))
    finally:
        dbmod.SPEC_DFA_STATES = old
    eng4 = next(e for e in db4.engines if isinstance(e, NfaEngine))
    assert eng4.spec_dfa is not None \
        and eng4.spec_dfa.sink_state is not None
    assert sorted(hs.scan(db4, data)) == ref
