"""Internal-component unit tests (reference: unit/internal — each kernel
and table builder gets a direct brute-force reference check)."""

import numpy as np
import pytest

import hyperscan_tpu as hs


def test_utf8_range_split_bruteforce():
    """Byte-sequence alternations must cover exactly the codepoint set."""
    from hyperscan_tpu.compiler.utf8 import cp_ranges_to_seqs

    cases = [
        [(0x41, 0x5A)],
        [(0x7E, 0x84)],            # 1/2-byte boundary straddle
        [(0x7F0, 0x812)],          # 2/3-byte boundary straddle
        [(0xD7FA, 0xE005)],        # surrogate gap straddle
        [(0xFFF0, 0x10010)],       # 3/4-byte boundary straddle
        [(0x3B1, 0x3C9), (0x10400, 0x10427)],
    ]
    for ranges in cases:
        seqs = cp_ranges_to_seqs(ranges)

        def covered(bs: bytes) -> bool:
            return any(
                len(bs) == len(seq)
                and all(lo <= b <= hi for (b, (lo, hi)) in zip(bs, seq))
                for seq in seqs
            )

        for (lo, hi) in ranges:
            for cp in range(max(0, lo - 2), hi + 3):
                if 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
                    continue
                want = any(l <= cp <= h for (l, h) in ranges)
                got = covered(chr(cp).encode("utf-8"))
                assert got == want, f"cp {cp:#x} in {ranges}"


def test_ucp_category_ranges_sanity():
    import unicodedata

    from hyperscan_tpu.compiler.ucp import category_ranges, word_ranges

    lu = category_ranges("Lu")
    assert any(lo <= ord("A") <= hi for (lo, hi) in lu)
    assert not any(lo <= ord("a") <= hi for (lo, hi) in lu)
    w = word_ranges()
    for ch in "aZ9_δ漢":
        assert any(lo <= ord(ch) <= hi for (lo, hi) in w), ch
    assert not any(lo <= ord("-") <= hi for (lo, hi) in w)


def test_sparse_extract_vs_nonzero():
    import jax.numpy as jnp

    from hyperscan_tpu.ops.teddy import sparse_extract

    rng = np.random.default_rng(0)
    for density, n in [(0.0, 1 << 14), (0.001, 1 << 14), (0.3, 1 << 13)]:
        plane = np.where(
            rng.random(n) < density, rng.integers(1, 99, n), 0
        ).astype(np.int32)
        nvalid = n - 100
        meta, packed = sparse_extract(
            [jnp.asarray(plane)], jnp.int32(nvalid), 1 << 13, 1 << 9
        )
        total, n_hit = (int(x) for x in np.asarray(meta))
        # reference: nonzero positions, whole trailing chunks masked
        CHUNK = 1024
        keep = plane.copy()
        nchunk = n // CHUNK
        for c in range(nchunk):
            if c * CHUNK >= nvalid:
                keep[c * CHUNK : (c + 1) * CHUNK] = 0
        want_pos = np.flatnonzero(keep)
        assert total == len(want_pos)
        if total <= (1 << 13):
            got = np.asarray(packed[:, :total])
            assert np.array_equal(got[0], want_pos)
            assert np.array_equal(got[1], keep[want_pos])


def test_teddy_plan_masks_cover_factors():
    from hyperscan_tpu.compiler.literals import Factor, LitAtom
    from hyperscan_tpu.compiler.teddy import build_teddy

    rng = np.random.default_rng(1)
    factors = [
        Factor(tuple(LitAtom(int(b), 0xFF)
                     for b in rng.integers(97, 123, rng.integers(3, 10))))
        for _ in range(200)
    ]
    plan = build_teddy(factors)
    M = plan.m
    for fid, f in enumerate(factors):
        b = plan.bucket_of[fid]
        w, bit = divmod(b, 32)
        for m in range(M):
            byte = f.atoms[-1 - m].value if m < len(f) else None
            if byte is not None:
                assert plan.masks[m, w, byte] & (1 << bit), (fid, m)


def test_fuzzy_graph_width_accounting():
    from hyperscan_tpu.compiler.fuzzy import fuzzy_graph
    from hyperscan_tpu.compiler.glushkov import build_nfa
    from hyperscan_tpu.compiler.parser import parse
    from hyperscan_tpu.utils.oracle import nfa_match_ends

    g = build_nfa(parse("abcd", 0))
    fz = fuzzy_graph(g, edit=1, hamming=0)
    # direct NFA simulation: one deletion/subst/insert each
    assert 3 in nfa_match_ends(fz, b"abd")    # deletion
    assert 4 in nfa_match_ends(fz, b"abxd")   # substitution
    assert 5 in nfa_match_ends(fz, b"abxcd")  # insertion
    assert nfa_match_ends(fz, b"ad") == set()  # two deletions exceed k


def test_reverse_graph_som_roundtrip():
    from hyperscan_tpu.compiler.dfa import determinize, reverse_graph
    from hyperscan_tpu.compiler.glushkov import build_nfa
    from hyperscan_tpu.compiler.parser import parse

    g = build_nfa(parse("a{1,3}bc", 0))
    rev = determinize([reverse_graph(g, eod=False)], [0])
    # scan "aaabc" backwards from the end: starts at offsets 2, 1, 0
    data = b"aaabc"
    s = rev.start_state
    starts = set()
    for j in range(len(data) - 1, -1, -1):
        s = int(rev.trans[s, rev.byte_to_class[data[j]]])
        aid = int(rev.accept_id[s])
        if aid:
            for (_e, adj) in rev.accept_sets[aid]:
                starts.add(j + adj)
    assert starts == {0, 1, 2}


def test_lbr_counter_engine():
    """`X{n,m}` with large n compiles to the counter engine in O(1)
    states, independent of n (reference: src/nfa/lbr.c + repeat models,
    repeat_internal.h:50-91)."""
    import time

    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.compiler.parser import parse
    from hyperscan_tpu.database import LbrEngine
    from hyperscan_tpu.utils.oracle import ast_match_ends

    t0 = time.time()
    db = hs.compile_multi(
        [rf"[0-9]{{{500 + i},{1000 + i}}}" for i in range(50)]
        + [rf"[^ ]{{{5000 + i},}}" for i in range(50)],
        ids=list(range(100)),
    )
    dt = time.time() - t0
    assert dt < 5.0, f"LBR compile took {dt:.1f}s"
    assert all(isinstance(e, LbrEngine) for e in db.engines)
    assert db.state_count() == 100  # one counter per pattern

    ms = hs.scan(db, b"x" + b"7" * 600 + b" tail")
    got0 = sorted(m[2] for m in ms if m[0] == 0)
    assert got0[0] == 501 and got0[-1] == 601 and len(got0) == 101

    # oracle differential at a feasible scale
    pat = r"[0-9]{40,60}"
    db2 = hs.compile_multi([pat])
    node = parse(pat, 0)
    rng = np.random.default_rng(9)
    for _ in range(15):
        d = bytes(rng.choice(np.frombuffer(b"0123x", np.uint8),
                             p=[0.24, 0.24, 0.24, 0.24, 0.04],
                             size=int(rng.integers(0, 180))))
        got2 = {t for (_i, _f, t) in hs.scan(db2, d)}
        assert got2 == ast_match_ends(node, d)


def test_jit_registries_release_dropped_databases():
    """The jit-key registries hold weak references: dropping a database
    must release its literal tables and engines (a long-lived process
    compiling many databases must not pin every device table forever)."""
    import gc
    import weakref

    import hyperscan_tpu as hs
    from hyperscan_tpu.ops import teddy as T

    import jax.numpy as jnp
    import numpy as np

    from hyperscan_tpu.ops.teddy import corpus_to_rows, teddy_confirm_scan_rows

    db = hs.compile_multi(["attackZZ", "needle77"], ids=[1, 2])
    corpus = np.frombuffer(b"xx attackZZ yy" + b"." * 200, np.uint8)
    fid_a, p_a = teddy_confirm_scan_rows(
        jnp.asarray(corpus_to_rows(corpus)), db.lit, corpus.shape[0])
    assert len(fid_a) == 1
    key = db.lit._teddy_key
    assert key in T._LITS
    ref = weakref.ref(db.lit)
    del db
    gc.collect()
    assert ref() is None
    assert key not in T._LITS
