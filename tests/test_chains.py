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


def test_chain_streaming_falls_back_to_general():
    d = hs.compile(r"foo[a-z]+bar", mode=hs.HS_MODE_STREAM)
    assert not (d.lit and d.lit.chains)
    st = hs.open_stream(d)
    ms = hs.scan_stream(st, b"fooqq")
    ms += hs.scan_stream(st, b"qbar")
    ms += hs.close_stream(st)
    assert ms == [(0, 0, 9)]
