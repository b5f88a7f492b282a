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


def test_bad_patterns_error_parity():
    """Compile-must-fail battery mirroring the reference's
    unit/hyperscan/bad_patterns.{cpp,txt} error classes."""
    import pytest as _pytest

    import hyperscan_tpu as hs

    P = hs.HS_FLAG_PREFILTER
    bad = [
        # \c must be followed by ASCII (was an IndexError crash)
        ("\\c\u7a7a", 0, None), (r"\cÀ", 0, None), (r"[\cÀ]", 0, None),
        # quantifiers on bare assertions / inline-flag groups
        (r"\b+", 0, None), (r"\B?", 0, None), (r"\b{0,6}", 0, None),
        (r"foo(?m)?bar", 0, None),
        # POSIX collating elements / misplaced named classes
        (r"[.ch.]", 0, None), (r"[=ch=]", 0, None), (r"[:digit:]", 0, None),
        (r"[[.ch.]]", 0, None), (r"[[:bogus:]]", 0, None),
        (r"[A-[:digit:]]", 0, None),
        # dead patterns
        (r"^\B\Bfoo", 0, None), (r"[^\x00-\xff]", 0, None),
        (r"\b\Bfoo", 0, None),
        # group-name rules and reference validation
        (r"(?P<dup>a)(?P<dup>b)", 0, None), (r"(?<1x>a)", 0, None),
        (r"(abc)\2", P, None), (r"abc(?(1)d|e)", P, None),
        (r"abc((d)?(?(R)b))+", P, None),
        # ext-param satisfiability
        (r"^foo", 0, dict(min_offset=5)),
        (r"foobar", 0, dict(min_length=20)),
        (r"foobar", 0, dict(max_offset=3)),
        (r"foo", 0, dict(min_offset=10, max_offset=9)),
        # per-accept match-width intervals (reference bad_patterns 72,75-78:
        # context hops/adjusts discounted, per-alternation-branch feasibility)
        (r"\Bd\B", hs.HS_FLAG_CASELESS,
         dict(min_length=2, min_offset=4, max_offset=54)),
        (r"\B", hs.HS_FLAG_DOTALL | hs.HS_FLAG_ALLOWEMPTY,
         dict(min_length=1)),
        (r"(f|d|(\b)|i|a\Z)", hs.HS_FLAG_MULTILINE | hs.HS_FLAG_ALLOWEMPTY,
         dict(min_length=2, min_offset=9, max_offset=14)),
        (r"(f|e|d{19,}|h\Z|^j|\Aa)",
         hs.HS_FLAG_DOTALL | hs.HS_FLAG_MULTILINE | hs.HS_FLAG_CASELESS,
         dict(min_length=7, min_offset=8, max_offset=18)),
        (r"(i{13,}|i\Z)", hs.HS_FLAG_DOTALL,
         dict(min_length=3, max_offset=5)),
        # approximate-matching restrictions
        (r"abc\b", 0, dict(edit_distance=1)),
        (r"abc", hs.HS_FLAG_UTF8, dict(edit_distance=1)),
        (r"(*UTF8)abc", 0, dict(edit_distance=1)),
        # property-name case sensitivity
        (r"\p{greek}", hs.HS_FLAG_UTF8, None),
    ]
    for pat, fl, ext in bad:
        with _pytest.raises(hs.HyperscanError):
            if ext:
                hs.compile_ext_multi([pat], flags=[fl], ids=[0],
                                     ext=[hs.ExprExt(**ext)])
            else:
                hs.compile(pat, flags=fl)
    # invalid UTF-8 pattern bytes
    with _pytest.raises(hs.HyperscanError):
        hs.compile(b"\xff\xfe", flags=hs.HS_FLAG_UTF8)
    # nearby good patterns still compile
    good = [
        (r"(\b)+", hs.HS_FLAG_ALLOWEMPTY, None),
        (r"[[:alpha:]]", 0, None), (r"[a.b]", 0, None), (r"[:a]", 0, None),
        (r"(abc)\1", P, None),
        (r"(?'g'a)(?('g')b|c)", P, None),
        (r"^abcq", 0, dict(edit_distance=1)),
        (r"\p{Greek}", hs.HS_FLAG_UTF8, None),
        # satisfiable interval siblings of the rejected cases above
        (r"(i{13,}|i\Z)", hs.HS_FLAG_DOTALL,
         dict(min_length=3, max_offset=20)),
        (r"\Bd\B", 0, dict(max_offset=2)),
        (r"foo.*bar", 0, dict(min_length=100)),
    ]
    for pat, fl, ext in good:
        if ext:
            hs.compile_ext_multi([pat], flags=[fl], ids=[0],
                                 ext=[hs.ExprExt(**ext)])
        else:
            hs.compile(pat, flags=fl)
    # the formerly over-rejected context-byte case matches correctly:
    # \Bd\B in "ada" is the 1-byte match ending at offset 2 (the raw NFA
    # path is 3 bytes of which 2 are assertion context)
    db = hs.compile_ext_multi([r"\Bd\B"], flags=[0], ids=[7],
                              ext=[hs.ExprExt(max_offset=2)])
    assert hs.scan(db, b"ada") == [(7, 0, 2)]
    assert hs.scan(db, b"adda") == [(7, 0, 2)]  # 2nd d ends past max_offset
