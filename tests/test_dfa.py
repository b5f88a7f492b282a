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
