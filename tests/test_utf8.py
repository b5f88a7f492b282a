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
    """Match-end byte offsets via Python re over the decoded text.

    Each candidate (s, e) pair is tested with the FULL text visible:
    `match(text, s)` keeps the char before s for lookbehind/\\b, and a
    `(?=suffix\\Z)` lookahead pins the match end at e without hiding the
    following context (fullmatch's endpos would make e look like
    end-of-string to a trailing \\b)."""
    text = data.decode("utf-8")
    # byte offset of each char boundary
    boundaries = [0]
    for ch in text:
        boundaries.append(boundaries[-1] + len(ch.encode("utf-8")))
    ends = set()
    for e in range(len(text) + 1):
        rx = pyre.compile(
            "(?:%s)(?=%s\\Z)" % (pattern, pyre.escape(text[e:])), reflags
        )
        for s in range(e + 1):
            if rx.match(text, s):
                ends.add(boundaries[e])
                break
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


UCP_WB_CASES = [
    # UCP+UTF8: word-ness decided per codepoint (é is a word codepoint)
    (r"\bfoo", "foo éfoo .foo afoo".encode()),
    (r"foo\b", "foo fooé foo. fooa".encode()),
    (r"\bλx", "λx αλx (λx".encode()),
    (r"x\B\w", "xé x. xa αxβ".encode()),
    (r"\Bred", "αred .red ared".encode()),
    (r"\bσ+\b", "σσ ασ σ, βσσγ".encode()),
]


@pytest.mark.parametrize("pat,data", UCP_WB_CASES)
def test_ucp_utf8_word_boundary(pat, data):
    db = hs.compile(pat, flags=U | hs.HS_FLAG_UCP)
    got = {t for (_i, _f, t) in hs.scan(db, data)}
    want = _oracle_ends(pat, data, pyre.UNICODE)
    assert got == want, f"{pat!r}: {sorted(got)} != {sorted(want)}"


def test_ucp_word_boundary_latin1():
    # UCP without UTF8: bytes are Latin-1 codepoints; 0xE9 (é) is word
    db = hs.compile(r"\bfoo\b", flags=hs.HS_FLAG_UCP)
    data = b"foo \xe9foo foo\xe9 .foo."
    got = {t for (_i, _f, t) in hs.scan(db, data)}
    assert got == {3, 18}


def test_ucp_utf8_som_word_boundary():
    # UCP \b prev-context consumes whole codepoints (1-4 bytes); the
    # hop-length accepts on the reverse DFAs / SOM registers report the
    # start past the consumed context chain
    from hyperscan_tpu.compiler.parser import parse
    from hyperscan_tpu.utils.oracle import ast_leftmost_som

    F = U | hs.HS_FLAG_UCP | hs.HS_FLAG_SOM_LEFTMOST
    pats = [r"\bλfoo", r"\bword", r"λx\b", r"\Bend"]
    corpora = [
        "λfoo ωλfoo .λfoo word éword λx€ λxω end bend".encode(),
        "𝛌word λfoo".encode(),  # 4-byte non-word context before word
        b"",
    ]
    for pat in pats:
        db = hs.compile(pat, flags=F)
        for data in corpora:
            want = {(frm, to) for (to, frm)
                    in ast_leftmost_som(parse(pat, F), data).items()}
            got = {(f, t) for (_i, f, t) in hs.scan(db, data)}
            assert got == want, (
                f"{pat!r} on {data!r}: {sorted(got)} != {sorted(want)}"
            )


def test_non_utf8_rejects_wide_codepoint():
    with pytest.raises(CompileError):
        hs.compile(r"\x{20AC}")
