"""Chimera analogue tests (reference: chimera/ ch_compile / ch_scan)."""
import pytest

from hyperscan_tpu import chimera as ch
from hyperscan_tpu.errors import CompileError


def collect(db, data, **kw):
    out = []
    rc = ch.ch_scan(db, data, matches=out, **kw)
    return rc, out


def test_basic_capture_groups():
    db = ch.ch_compile(r"(\w+)@(\w+)\.com", mode=ch.CH_MODE_GROUPS)
    rc, out = collect(db, b"mail me at bob@example.com please")
    assert rc == ch.CH_SUCCESS
    assert len(out) == 1
    _id, frm, to, caps = out[0]
    assert (frm, to) == (11, 26)
    assert caps[0] == (ch.CH_CAPTURE_FLAG_ACTIVE, 11, 26)
    assert caps[1] == (ch.CH_CAPTURE_FLAG_ACTIVE, 11, 14)
    assert caps[2] == (ch.CH_CAPTURE_FLAG_ACTIVE, 15, 22)


def test_backreference_and_lookahead():
    # constructs the main engine rejects; chimera confirms them via re
    db = ch.ch_compile_multi(
        [r"(foo|bar)\1", r"\d+(?= dollars)"], ids=[7, 8])
    rc, out = collect(db, b"xx foofoo and 25 dollars")
    assert rc == ch.CH_SUCCESS
    got = {(i, f, t) for i, f, t, _ in out}
    assert (7, 3, 9) in got
    assert (8, 14, 16) in got


def test_nogroups_mode():
    db = ch.ch_compile(r"(a)(b)c", mode=ch.CH_MODE_NOGROUPS)
    rc, out = collect(db, b"xxabcxx")
    assert out == [(0, 2, 5, None)]


def test_inactive_group():
    db = ch.ch_compile(r"(a)|(b)")
    rc, out = collect(db, b"b")
    caps = out[0][3]
    assert caps[1][0] == ch.CH_CAPTURE_FLAG_INACTIVE
    assert caps[2] == (ch.CH_CAPTURE_FLAG_ACTIVE, 0, 1)


def test_callback_terminate_and_skip():
    db = ch.ch_compile_multi([r"a", r"b"], ids=[1, 2])
    seen = []

    def cb(id_, frm, to, flags, caps):
        seen.append((id_, to))
        return ch.CH_CALLBACK_TERMINATE

    rc = ch.ch_scan(db, b"aa bb", on_match=cb)
    assert rc == ch.CH_SCAN_TERMINATED
    assert len(seen) == 1

    seen.clear()

    def cb2(id_, frm, to, flags, caps):
        seen.append((id_, to))
        return ch.CH_CALLBACK_SKIP_PATTERN

    rc = ch.ch_scan(db, b"aa bb", on_match=cb2)
    assert rc == ch.CH_SUCCESS
    assert seen == [(1, 1), (2, 4)]  # one match per pattern


def test_singlematch_flag():
    db = ch.ch_compile(r"a", flags=ch.CH_FLAG_SINGLEMATCH)
    rc, out = collect(db, b"aaa")
    assert len(out) == 1


def test_caseless_multiline_dotall():
    db = ch.ch_compile_multi(
        [r"^foo", r"a.b"],
        flags=[ch.CH_FLAG_CASELESS | ch.CH_FLAG_MULTILINE,
               ch.CH_FLAG_DOTALL],
        ids=[1, 2])
    rc, out = collect(db, b"x\nFOO a\nb")
    got = {(i, f, t) for i, f, t, _ in out}
    assert (1, 2, 5) in got
    assert (2, 6, 9) in got


def test_utf8_byte_offsets():
    # offsets reported in BYTES even though confirm runs over str
    db = ch.ch_compile(r"(\w+)é", flags=ch.CH_FLAG_UTF8 | ch.CH_FLAG_UCP)
    data = "x cafés rock".encode("utf-8")
    rc, out = collect(db, data)
    assert len(out) == 1
    _id, frm, to, caps = out[0]
    assert data[frm:to].decode("utf-8") == "café"
    assert caps[1] == (ch.CH_CAPTURE_FLAG_ACTIVE, 2, 5)


def test_invalid_utf8_no_match():
    db = ch.ch_compile(r"a", flags=ch.CH_FLAG_UTF8)
    rc, out = collect(db, b"\xff\xfea")
    assert rc == ch.CH_SUCCESS and out == []


def test_prefilter_split():
    # one hyperscan-able pattern, one backref-only: both must work and
    # the hyperscan-able one should be in the prefilter db
    db = ch.ch_compile_multi([r"foo\d+", r"(x)\1"], ids=[1, 2])
    assert db.prefilter_db is not None
    assert any(not p.always_confirm for p in db.patterns)
    rc, out = collect(db, b"foo12 xx")
    got = {(i, f, t) for i, f, t, _ in out}
    assert (1, 0, 5) in got and (2, 6, 8) in got


def test_match_limit():
    db = ch.ch_compile_ext_multi([r"a"], match_limit=3)
    errors = []
    rc, out = collect(db, b"a" * 10,
                      on_error=lambda code, pid: errors.append(code))
    assert len(out) == 3
    assert errors == [ch.CH_ERROR_MATCHLIMIT]


def test_compile_error():
    with pytest.raises(CompileError) as ei:
        ch.ch_compile_multi([r"ok", r"(unclosed"], ids=[1, 2])
    assert ei.value.expression == 1


def test_bad_mode_and_bad_data():
    with pytest.raises(CompileError):
        ch.ch_compile(r"a", mode=12345)
    db = ch.ch_compile(r"a")
    assert ch.ch_scan(db, 42) == ch.CH_INVALID


def test_pcre_end_anchor_translation():
    db = ch.ch_compile_multi([r"foo\Z", r"bar\z"], ids=[1, 2])
    rc, out = collect(db, b"foo\n")
    assert {(i, f, t) for i, f, t, _ in out} == {(1, 0, 3)}
    rc, out = collect(db, b"bar")
    assert {(i, f, t) for i, f, t, _ in out} == {(2, 0, 3)}


# --------------------------------------------------------------------------
# PCRE-semantics boundary (docstring contract): constructs real libpcre
# accepts but the `re` confirm engine rejects must fail cleanly with the
# expression index (CH_COMPILER_ERROR analogue, chimera/ch_compile.cpp),
# and the supported subset must report capture parity.
# --------------------------------------------------------------------------

UNSUPPORTED_PCRE = [
    r"(?R)",              # recursion
    r"a(?1)b(x)",         # subroutine call
    r"a(?C1)b",           # callout
    r"a(*SKIP)b",         # backtracking verb
    r"a(*FAIL)",          # backtracking verb
    r"foo\Kbar",          # match-start reset
]


@pytest.mark.parametrize("pat", UNSUPPORTED_PCRE)
def test_chimera_rejects_pcre_only(pat):
    with pytest.raises(CompileError) as ei:
        ch.ch_compile_multi(["ok1", pat], ids=[1, 2])
    assert getattr(ei.value, "expression", 1) == 1


def test_chimera_supported_subset_captures():
    cases = [
        # (pattern, data, expected (frm, to) per capture group, group 0
        # = whole match)
        (r"(\w+)=(\w+);\1", b"k=v;k rest", [(0, 5), (0, 1), (2, 3)]),
        (r"(?=ab)a(b)", b"zab", [(1, 3), (2, 3)]),
        (r"(?<=x)(y+)", b"axyyy", [(2, 5), (2, 5)]),
        (r"(?>a+)(b)", b"aaab", [(0, 4), (3, 4)]),
        (r"(a)(?(1)x|y)", b"zax", [(1, 3), (1, 2)]),
    ]
    for (pat, data, want) in cases:
        db = ch.ch_compile(pat, mode=ch.CH_MODE_GROUPS)
        rc, out = collect(db, data)
        assert rc == ch.CH_SUCCESS and out, (pat, rc, out)
        _id, _frm, _to, caps = out[0]
        assert [(f2, t2) for (_fl, f2, t2) in caps] == want, (pat, caps)
