"""Approximate matching (edit / Hamming distance ext params).

Reference: hs_expr_ext_t HS_EXT_FLAG_EDIT_DISTANCE / HAMMING_DISTANCE
(src/hs_compile.h:227-292) + ng_fuzzy.cpp semantics. Oracle: brute-force
Levenshtein / Hamming over the (small, enumerable) pattern language.
"""

import itertools

import pytest

import hyperscan_tpu as hs
from hyperscan_tpu.flags import ExprExt


def _levenshtein(a: bytes, b: bytes) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _edit_oracle(words, data: bytes, k: int):
    """Match ends: substring within edit distance k of any language word."""
    ends = set()
    n = len(data)
    for e in range(n + 1):
        for w in words:
            lo = max(0, e - len(w) - k)
            for s in range(lo, e + 1):
                if _levenshtein(data[s:e], w) <= k:
                    ends.add(e)
                    break
            else:
                continue
            break
    return ends


def _hamming_oracle(words, data: bytes, k: int):
    ends = set()
    for w in words:
        for s in range(len(data) - len(w) + 1):
            seg = data[s : s + len(w)]
            if sum(x != y for (x, y) in zip(seg, w)) <= k:
                ends.add(s + len(w))
    return ends


CORPORA = [
    b"",
    b"attack",
    b"attck atack attackk",
    b"axtack attxck ttack",
    b"zz abxd abd abcd acbd zz",
    b"aaaaaaa",
]


@pytest.mark.parametrize("k", [1, 2])
def test_edit_distance_literal(k):
    db = hs.compile_ext_multi(
        [r"attack"], ids=[1], ext=[ExprExt(edit_distance=k)],
        flags=[hs.HS_FLAG_ALLOWEMPTY],
    )
    for data in CORPORA:
        want = _edit_oracle([b"attack"], data, k)
        got = {t for (_i, _f, t) in hs.scan(db, data)}
        assert got == want, f"k={k} data={data!r}: {sorted(got)} != {sorted(want)}"


@pytest.mark.parametrize("k", [1, 2])
def test_hamming_distance_literal(k):
    db = hs.compile_ext_multi(
        [r"abcd"], ids=[1], ext=[ExprExt(hamming_distance=k)],
    )
    for data in CORPORA:
        want = _hamming_oracle([b"abcd"], data, k)
        got = {t for (_i, _f, t) in hs.scan(db, data)}
        assert got == want, f"k={k} data={data!r}: {sorted(got)} != {sorted(want)}"


def test_edit_distance_alternation():
    words = [b"foox", b"barby"]
    db = hs.compile_ext_multi(
        [r"foox|barby"], ids=[7], ext=[ExprExt(edit_distance=1)],
    )
    for data in [b"fox barb yfooxy", b"baarby foo"]:
        want = _edit_oracle(words, data, 1)
        got = {t for (_i, _f, t) in hs.scan(db, data)}
        assert got == want, f"{data!r}: {sorted(got)} != {sorted(want)}"


def test_edit_distance_anchored():
    # ^abc with one edit: insertion at the front must match "xabc"
    db = hs.compile_ext_multi(
        [r"^abcq"], ids=[3], ext=[ExprExt(edit_distance=1)],
    )
    got = {t for (_i, _f, t) in hs.scan(db, b"xabcq")}
    assert 5 in got
    got2 = {t for (_i, _f, t) in hs.scan(db, b"zzabcq")}
    assert not got2  # two leading insertions exceed k=1


def test_fuzzy_class_pattern():
    db = hs.compile_ext_multi(
        [r"ab[0-9]d"], ids=[4], ext=[ExprExt(edit_distance=1)],
    )
    words = [bytes([97, 98, d, 100]) for d in range(48, 58)]
    data = b"ab5d abxd abc5d a5d"
    want = _edit_oracle(words, data, 1)
    got = {t for (_i, _f, t) in hs.scan(db, data)}
    assert got == want


def test_both_distances_rejected():
    with pytest.raises(hs.CompileError):
        hs.compile_ext_multi(
            [r"abc"], ids=[1],
            ext=[ExprExt(edit_distance=1, hamming_distance=1)],
        )


def test_fuzzy_streaming():
    db = hs.compile_ext_multi(
        [r"attack"], ids=[1], ext=[ExprExt(edit_distance=1)],
        mode=hs.HS_MODE_STREAM, flags=[hs.HS_FLAG_ALLOWEMPTY],
    )
    st = hs.open_stream(db)
    ms = hs.scan_stream(st, b"zz att")
    ms += hs.scan_stream(st, b"ck zz")
    ms += hs.close_stream(st)
    got = {t for (_i, _f, t) in ms}
    want = _edit_oracle([b"attack"], b"zz attck zz", 1)
    assert got == want


def test_min_length_filters_short_matches():
    # admin[0-9]{1,3}: widths 6..8; min_length 8 keeps only 3-digit matches
    db = hs.compile_ext_multi(
        [r"admin[0-9]{1,3}"], ids=[1], ext=[ExprExt(min_length=8)],
    )
    got = {t for (_i, _f, t) in hs.scan(db, b"admin1 admin22 admin333")}
    assert got == {23}


def test_min_length_noop_when_covered():
    db = hs.compile_ext_multi(
        [r"attack"], ids=[1], ext=[ExprExt(min_length=3)],
    )
    assert [t for (_i, _f, t) in hs.scan(db, b"attack")] == [6]


def test_prefilter_superset():
    db = hs.compile(r"foo(?=bar)", flags=hs.HS_FLAG_PREFILTER)
    got = {t for (_i, _f, t) in hs.scan(db, b"foobar fooqqq")}
    assert got == {3, 10}  # superset: lookahead dropped
