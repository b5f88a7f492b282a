"""UTF-8 mode: codepoint semantics over byte-offset reports.

Reference: HS_FLAG_UTF8 (src/hs_compile.h:913) — patterns are UTF-8;
match offsets remain byte offsets. Oracle: Python re over decoded text
with char→byte offset mapping."""

import re as pyre

import pytest

import hyperscan_tpu as hs
from hyperscan_tpu.errors import CompileError

U = hs.HS_FLAG_UTF8


def _oracle_ends(pattern: str, data: bytes, reflags=0):
    """Match-end byte offsets via Python re over the decoded text."""
    text = data.decode("utf-8")
    # byte offset of each char boundary
    boundaries = [0]
    for ch in text:
        boundaries.append(boundaries[-1] + len(ch.encode("utf-8")))
    ends = set()
    rx = pyre.compile(pattern, reflags)
    for s in range(len(text) + 1):
        for e in range(s, len(text) + 1):
            if rx.fullmatch(text, s, e):
                ends.add(boundaries[e])
    return ends


CASES = [
    (r"héllo", "héllo wörld héllo".encode()),
    (r"h.llo", "hällo hxllo h€llo".encode()),  # dot = one codepoint
    (r"[α-ω]+x", "αβγx δx xx ωx".encode()),
    (r"[^a]b", "ab äb ἴb xb".encode("utf-8")),
    ("€\\d", "€5 €x €9".encode()),
    (r"gr[äa]y", "gray gräy grxy".encode()),
]


@pytest.mark.parametrize("pat,data", CASES)
def test_utf8_vs_python_re(pat, data):
    db = hs.compile(pat, flags=U)
    got = {t for (_i, _f, t) in hs.scan(db, data)}
    want = _oracle_ends(pat, data)
    assert got == want, f"{pat!r}: {sorted(got)} != {sorted(want)}"


def test_utf8_caseless_ascii_fold():
    db = hs.compile(r"WÖrd", flags=U | hs.HS_FLAG_CASELESS)
    # ASCII chars fold; non-ASCII does not without UCP (Ö != ö)
    got = {t for (_i, _f, t) in hs.scan(db, "wÖrd WÖRD wörd".encode())}
    assert got == {5, 11}


def test_utf8_emoji_literal():
    db = hs.compile(r"\x{1F600}!", flags=U)
    data = "hi 😀! 😀x".encode()
    got = {t for (_i, _f, t) in hs.scan(db, data)}
    assert got == {8}


def test_invalid_utf8_pattern_rejected():
    with pytest.raises(CompileError):
        hs.compile(b"\xff\xfe", flags=U)


def test_ucp_word_boundary_rejected():
    # UCP \b needs codepoint-level context — still a documented gap
    with pytest.raises(CompileError):
        hs.compile(r"\bfoo\b", flags=U | hs.HS_FLAG_UCP)


def test_non_utf8_rejects_wide_codepoint():
    with pytest.raises(CompileError):
        hs.compile(r"\x{20AC}")
