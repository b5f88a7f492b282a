"""Logical combination (HS_FLAG_COMBINATION) semantics.

Reference: hs_compile.h HS_FLAG_COMBINATION + unit/hyperscan/
logical_combination.cpp — combinations report at offsets where a
referenced sub-expression matches and the boolean expression holds;
purely negative combinations report at end of data."""

import pytest

import hyperscan_tpu as hs
from hyperscan_tpu.errors import CompileError

C = hs.HS_FLAG_COMBINATION
Q = hs.HS_FLAG_QUIET


def _db(combo, mode=hs.HS_MODE_BLOCK, sub_flags=0):
    return hs.compile_multi(
        [r"abc", r"def", r"xyz", combo],
        flags=[sub_flags, sub_flags, sub_flags, C],
        ids=[101, 102, 103, 900],
        mode=mode,
    )


def test_and_combination():
    db = _db("101&102")
    assert not any(m[0] == 900 for m in hs.scan(db, b"abc only"))
    ms = hs.scan(db, b"abc then def")
    # combination fires when def completes (both now matched)
    assert (900, 0, 12) in ms
    # earlier abc-only offset must not fire
    assert not any(m == (900, 0, 3) for m in ms)


def test_or_combination():
    db = _db("101|103")
    ms = hs.scan(db, b"xyz at start, abc later")
    assert (900, 0, 3) in ms and (900, 0, 17) in ms


def test_not_combination():
    db = _db("101&!102")
    ms = hs.scan(db, b"abc and xyz")
    assert (900, 0, 3) in ms
    ms2 = hs.scan(db, b"def abc")
    assert not any(m[0] == 900 for m in ms2)


def test_same_offset_negation():
    # both sub-expressions end at the same offset: the flush happens after
    # all events at that offset, so 101&!102 must NOT fire
    db = hs.compile_multi(
        [r"abc", r"babc", r"101&!102"],
        flags=[0, 0, C],
        ids=[101, 102, 900],
    )
    ms = hs.scan(db, b"zbabc")
    assert not any(m[0] == 900 for m in ms)
    ms2 = hs.scan(db, b"aabc")
    assert any(m[0] == 900 for m in ms2)


def test_purely_negative_reports_at_eod():
    db = _db("!101")
    ms = hs.scan(db, b"nothing here")
    assert (900, 0, 12) in ms
    ms2 = hs.scan(db, b"abc here")
    assert not any(m[0] == 900 for m in ms2)


def test_quiet_subexpressions():
    db = _db("101&102", sub_flags=Q)
    ms = hs.scan(db, b"abc then def")
    assert ms == [(900, 0, 12)]


def test_combination_streaming():
    db = _db("101&102", mode=hs.HS_MODE_STREAM)
    st = hs.open_stream(db)
    ms = hs.scan_stream(st, b"abc...")
    assert not any(m[0] == 900 for m in ms)
    ms2 = hs.scan_stream(st, b"def")
    assert any(m[0] == 900 for m in ms2)  # logical vector persists
    hs.close_stream(st)


def test_purely_negative_streaming_eod():
    db = _db("!103", mode=hs.HS_MODE_STREAM)
    st = hs.open_stream(db)
    assert not any(m[0] == 900 for m in hs.scan_stream(st, b"abcdef"))
    end = hs.close_stream(st)
    assert (900, 0, 6) in end


def test_unknown_subexpression_rejected():
    with pytest.raises(CompileError):
        _db("101&777")


def test_bad_syntax_rejected():
    for bad in ["", "101&", "(101", "101 102", "&101", "101!102"]:
        with pytest.raises(CompileError):
            _db(bad)


def test_serialization_roundtrip():
    db = _db("(101|102)&!103")
    db2 = hs.deserialize_database(hs.serialize_database(db))
    data = b"abc stuff"
    assert hs.scan(db2, data) == hs.scan(db, data)
