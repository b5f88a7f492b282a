"""Edge-case battery (reference: unit/hyperscan arg_checks/behaviour)."""

import pytest

import hyperscan_tpu as hs
from hyperscan_tpu.errors import (
    CompileError,
    InvalidError,
    ScratchInUseError,
)


def test_empty_expression_set_rejected():
    with pytest.raises(InvalidError):
        hs.compile_multi([])


def test_length_mismatch_rejected():
    with pytest.raises(InvalidError):
        hs.compile_multi([r"a", r"b"], flags=[0], ids=[1, 2])


def test_vacuous_requires_allowempty():
    with pytest.raises(CompileError):
        hs.compile(r"a*")
    db = hs.compile(r"a*", flags=hs.HS_FLAG_ALLOWEMPTY)
    ms = hs.scan(db, b"ba")
    assert (0, 0, 0) in ms and (0, 0, 2) in ms


def test_scratch_reentrancy_guard():
    db = hs.compile(r"abc")
    sc = hs.alloc_scratch(db)

    def cb(pid, f, t, fl):
        with pytest.raises(ScratchInUseError):
            hs.scan(db, b"abc", scratch=sc)
        return 0

    hs.scan(db, b"abc", callback=cb, scratch=sc)


def test_callback_termination_mid_scan():
    db = hs.compile_multi([r"a"], ids=[1])
    seen = []

    def cb(pid, f, t, fl):
        seen.append(t)
        return 1  # terminate on first match

    ms = hs.scan(db, b"aaa", callback=cb)
    assert seen == [1] and ms == [(1, 0, 1)]


def test_stream_serialize_roundtrip_stream_mode():
    sdb = hs.compile_multi([r"attack", r"admin[0-9]{1,3}"], ids=[1, 2],
                           mode=hs.HS_MODE_STREAM)
    sdb2 = hs.deserialize_database(hs.serialize_database(sdb))
    st = hs.open_stream(sdb2)
    ms = hs.scan_stream(st, b"atta")
    ms += hs.scan_stream(st, b"ck admin42")
    ms += hs.close_stream(st)
    assert (1, 0, 6) in ms and (2, 0, 13) in ms and (2, 0, 14) in ms


def test_compress_mid_factor():
    sdb = hs.compile(r"attack", mode=hs.HS_MODE_STREAM)
    st = hs.open_stream(sdb)
    hs.scan_stream(st, b"xx atta")
    buf = hs.compress_stream(st)
    st2 = hs.expand_stream(sdb, buf)
    ms = hs.scan_stream(st2, b"ck") + hs.close_stream(st2)
    assert ms == [(0, 0, 9)]


def test_trailing_boundary_across_writes():
    sdb = hs.compile(r"\bword\b", mode=hs.HS_MODE_STREAM)
    # boundary byte arrives in the next write
    st = hs.open_stream(sdb)
    ms = hs.scan_stream(st, b"word")
    assert ms == []  # \b at end not yet provable mid-stream
    ms = hs.scan_stream(st, b"!x")
    assert ms == [(0, 0, 4)]
    hs.close_stream(st)
    # close right after: EOD satisfies \b
    st = hs.open_stream(sdb)
    assert hs.scan_stream(st, b"word") == []
    assert hs.close_stream(st) == [(0, 0, 4)]
    # suffix continuation kills the match
    st = hs.open_stream(sdb)
    hs.scan_stream(st, b"word")
    assert hs.scan_stream(st, b"s") == []
    assert hs.close_stream(st) == []


def test_no_duplicate_report_at_write_boundary():
    sdb = hs.compile(r"word", mode=hs.HS_MODE_STREAM)
    st = hs.open_stream(sdb)
    ms = hs.scan_stream(st, b"xword")
    assert ms == [(0, 0, 5)]
    ms = hs.scan_stream(st, b" more")  # history rescan must not re-report
    assert ms == []
    hs.close_stream(st)


def test_binary_patterns_and_data():
    db = hs.compile_multi([rb"\x00\x01\x02", rb"\xff+z"], ids=[1, 2])
    ms = hs.scan(db, b"\x00\x01\x02 \xff\xff\xffz")
    got = {(m, t) for (m, _f, t) in ms}
    assert (1, 3) in got and (2, 8) in got


def test_huge_bounded_repeat_rejected():
    with pytest.raises(CompileError):
        hs.compile(r"a{40000}")


def test_deep_nesting():
    db = hs.compile("(((((((((a)))))))))b")
    assert hs.scan(db, b"zab") == [(0, 0, 3)]


def test_expression_info_surface():
    info = hs.expression_info(r"abc[0-9]{2}")
    assert info["min_width"] == 5 and info["max_width"] == 5
    info2 = hs.expression_info(r"foo$")
    assert info2["matches_at_eod"]
