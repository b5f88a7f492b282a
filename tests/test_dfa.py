"""Determinization + minimization differential tests: DFA scan must equal
the NFA simulation on every corpus, for single- and multi-pattern sets."""

import numpy as np
import pytest

from hyperscan_tpu.compiler.parser import parse
from hyperscan_tpu.compiler.glushkov import build_nfa
from hyperscan_tpu.compiler.dfa import determinize, dfa_scan_reference
from hyperscan_tpu.flags import HS_FLAG_CASELESS, HS_FLAG_DOTALL, HS_FLAG_MULTILINE
from hyperscan_tpu.utils.oracle import nfa_match_ends

from test_frontend import CORPORA, RE_PATTERNS, ANCHOR_PATTERNS

ALL_PATTERNS = RE_PATTERNS + ANCHOR_PATTERNS


@pytest.mark.parametrize("pattern,flags", ALL_PATTERNS)
def test_dfa_single_pattern(pattern, flags):
    g = build_nfa(parse(pattern, flags))
    d = determinize([g], [7])
    for data in CORPORA:
        want = {(7, e) for e in nfa_match_ends(g, data)}
        got = dfa_scan_reference(d, data)
        assert got == want, f"{pattern!r} flags={flags} on {data!r}"


MULTI_SETS = [
    [(r"abc", 0), (r"a.c", HS_FLAG_DOTALL), (r"[a-c]+", 0)],
    [(r"^line\d", HS_FLAG_MULTILINE), (r"\bfoo\b", 0), (r"end$", 0)],
    [(r"quick|lazy", HS_FLAG_CASELESS), (r"\w{5,}", 0), (r"\s[a-z]", 0)],
    [(r"a", 0), (r"aa", 0), (r"aaa", 0), (r"a{4}", 0)],
]


@pytest.mark.parametrize("patset", MULTI_SETS)
def test_dfa_multi_pattern(patset):
    nfas = [build_nfa(parse(p, f)) for (p, f) in patset]
    ids = list(range(len(patset)))
    d = determinize(nfas, ids)
    for data in CORPORA:
        want = set()
        for i, g in enumerate(nfas):
            want |= {(i, e) for e in nfa_match_ends(g, data)}
        got = dfa_scan_reference(d, data)
        assert got == want, f"{patset} on {data!r}"


def test_minimization_shrinks():
    # two redundant alternatives must collapse
    g = build_nfa(parse(r"ab|ab|a[b]"))
    d = determinize([g], [0])
    g2 = build_nfa(parse(r"ab"))
    d2 = determinize([g2], [0])
    assert d.num_states == d2.num_states


def test_alphabet_remap_small():
    g = build_nfa(parse(r"abc"))
    d = determinize([g], [0])
    # classes: {a},{b},{c},{rest} = 4
    assert d.num_classes == 4


def test_speculative_unbounded_device_scan():
    """Unbounded-depth engines scan on device via chunk speculation with
    host entry-state fixup; exact vs the AST oracle, including a cascade
    where one in-class run crosses many chunk boundaries (replaces the
    host-only path for mcclellan.c-class engines)."""
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.compiler.parser import parse
    from hyperscan_tpu.ops.dfa_kernel import (
        SPEC_CS,
        dfa_scan_corpus_device_speculative,
    )
    from hyperscan_tpu.utils.oracle import ast_match_ends

    pat = r"\d+[a-z]{3,}\d+"
    db = hs.compile(pat, flags=hs.HS_FLAG_DOTALL)
    (eng,) = db.engines
    assert eng.max_depth is None
    rng = np.random.default_rng(7)
    d = bytearray(rng.integers(32, 127, 40000, dtype=np.uint8).tobytes())
    d[1000:1012] = b"12abcdef3456"
    d[30000:30010] = b"9zzzzzzzz8"
    d = bytes(d)
    got = {t for (_i, _f, t) in hs.scan(db, d)}
    assert got == ast_match_ends(parse(pat, hs.HS_FLAG_DOTALL), d)

    # cascade: run crossing many chunks must re-sync exactly
    pat2 = r"q[a-y]*z"
    db2 = hs.compile(pat2, flags=hs.HS_FLAG_DOTALL)
    d2 = b"q" + b"m" * (SPEC_CS * 20) + b"z" + b"qmz"
    got2 = {t for (_i, _f, t) in hs.scan(db2, d2)}
    assert got2 == ast_match_ends(parse(pat2, hs.HS_FLAG_DOTALL), d2)

    # direct-call parity with the host engine scan across several blocks
    (eng2,) = db2.engines
    blocks = [d2[:7000], d2[7000:], b"", b"qaz"]
    recs, finals = dfa_scan_corpus_device_speculative(
        eng2, blocks, np.ones(len(blocks), dtype=bool)
    )
    from hyperscan_tpu.runtime.smallwrite import dfa_scan_host

    for bi, blk in enumerate(blocks):
        row = np.frombuffer(blk, np.uint8)[None, :] if blk else \
            np.zeros((1, 0), np.uint8)
        hits, fin_h = dfa_scan_host(
            eng2, row, np.asarray([len(blk)], np.int64),
            np.asarray([eng2.start_state], np.int32),
        )
        sel = recs[0] == bi
        got_pairs = sorted(zip(recs[1][sel].tolist(), recs[2][sel].tolist()))
        want_pairs = sorted(zip(hits[0][0].tolist(), hits[0][1].tolist()))
        assert got_pairs == want_pairs, bi
        assert int(finals[bi]) == int(fin_h[0]), bi


def test_speculative_dfa_adversarial_full_miss_exact():
    """Corpus engineered so nearly every 512-byte chunk boundary sits
    mid-match: speculation (enter at float) misses, the host pass
    rescans the mismatched chunks, and the result must still be exact —
    the pinned worst case decays to the host path it replaces."""
    from unittest import mock

    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.grey import Grey
    from hyperscan_tpu.database import compile_patterns
    from hyperscan_tpu.runtime import smallwrite as SW

    db = compile_patterns([r"\d+[a-z]{3,}\d+"], flags=[hs.HS_FLAG_DOTALL],
                          grey=Grey(allow_teddy=False))
    eng = db.engines[0]
    assert eng.max_depth is None  # unbounded: speculative kernel path

    # long digit/letter runs keep the DFA mid-match at every boundary
    unit = b"123456789" * 40 + b"abcdefgh" * 40 + b"55"
    data = (unit * (300_000 // len(unit)))[:260_000]

    real = SW.dfa_scan_host
    calls = {"n": 0}

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    with mock.patch.object(SW, "dfa_scan_host", side_effect=counting):
        got = {t for (_i, _f, t) in hs.scan(db, data)}
    assert calls["n"] >= 100, calls  # speculation missed, host rescans ran

    # exactness vs the pure host path
    db2 = compile_patterns([r"\d+[a-z]{3,}\d+"], flags=[hs.HS_FLAG_DOTALL],
                           grey=Grey(allow_teddy=False,
                                     host_scan_limit=1 << 30))
    want = {t for (_i, _f, t) in hs.scan(db2, data)}
    assert got == want and len(want) > 100
