"""Parser + Glushkov differential tests.

Chain of trust (mirrors the reference's hscollider strategy,
doc/dev-reference/tools.rst:91-110):
  Python `re`  ⇔  ast_match_ends   (validates parser semantics)
  ast_match_ends ⇔ nfa_match_ends  (validates Glushkov + assert resolution)
"""

import re

import pytest

from hyperscan_tpu.compiler.parser import parse
from hyperscan_tpu.compiler.glushkov import build_nfa
from hyperscan_tpu.errors import CompileError
from hyperscan_tpu.flags import (
    HS_FLAG_CASELESS,
    HS_FLAG_DOTALL,
    HS_FLAG_MULTILINE,
    HS_FLAG_UTF8,
)
from hyperscan_tpu.utils.oracle import ast_match_ends, nfa_match_ends

CORPORA = [
    b"",
    b"a",
    b"\n",
    b"abc",
    b"aabbcc",
    b"xyzabcxyzabc",
    b"foo bar, baz.",
    b"aaaa",
    b"abab\nabab",
    b"line1\nline2\n",
    b"\nstart",
    b"end\n",
    b"The quick brown fox jumps over the lazy dog",
    b"mixed CASE Text 123",
    b"a,b;c d\te\nf",
    bytes(range(32, 127)),
    b"\x00\x01\xff\xfe binary \x80 data",
]

# Patterns exercised against Python `re` (no anchors — slicing-based
# re-oracle is only exact for anchor-free patterns).
RE_PATTERNS = [
    (r"abc", 0),
    (r"a", 0),
    (r"a+", 0),
    (r"ab*c", 0),
    (r"a|b", 0),
    (r"(ab|cd)+", 0),
    (r"[a-c]x?", 0),
    (r"[^a-z]", 0),
    (r"a.c", 0),
    (r"a.c", HS_FLAG_DOTALL),
    (r"\d+", 0),
    (r"\w\s\w", 0),
    (r"a{2,3}", 0),
    (r"a{3}", 0),
    (r"a{2,}", 0),
    (r"(a|ab)(c|bcd)", 0),
    (r"abc", HS_FLAG_CASELESS),
    (r"[a-f]+", HS_FLAG_CASELESS),
    (r"q(?:uick|uiet)", 0),
    (r"fo{1,2}", 0),
    (r"x\.y", 0),
    (r"\x41\x42", 0),
    (r"[\d,;]+", 0),
    (r"(?i)mIxEd", 0),
    (r"(?i:case) ", 0),
    (r"l(in)*e", 0),
    (r"a??b", 0),
    (r"(a+)+b", 0),
]

# Patterns with assertions — checked AST-oracle vs NFA only (the AST oracle
# implements true zero-width semantics directly).
ANCHOR_PATTERNS = [
    (r"^abc", 0),
    (r"abc$", 0),
    (r"^abc$", 0),
    (r"^", 0),
    (r"$", 0),
    (r"^$", 0),
    (r"\Aabc", 0),
    (r"abc\z", 0),
    (r"abc\Z", 0),
    (r"^line1", HS_FLAG_MULTILINE),
    (r"line1$", HS_FLAG_MULTILINE),
    (r"^line2$", HS_FLAG_MULTILINE),
    (r"^a|b$", 0),
    (r"^a|b$", HS_FLAG_MULTILINE),
    (r"\bfoo", 0),
    (r"foo\b", 0),
    (r"\bfoo\b", 0),
    (r"\Bar", 0),
    (r"a\B", 0),
    (r"\bline\d\b", HS_FLAG_MULTILINE),
    (r"^\w+", HS_FLAG_MULTILINE),
    (r"\w+$", HS_FLAG_MULTILINE),
    (r"^(a|line1)", HS_FLAG_MULTILINE),
    (r"(^|,)b", 0),
    (r"a$|^b", HS_FLAG_MULTILINE),
    (r"^.", 0),
    (r".$", 0),
    (r"^.", HS_FLAG_MULTILINE),
    (r".$", HS_FLAG_MULTILINE),
    (r"^[a-z]+$", HS_FLAG_MULTILINE),
    (r"a\b.", 0),
    (r"x|^", 0),
    (r"end$\n", 0),
    (r"\Qa.c\E", 0),
    (r"[[:alpha:]]+", 0),
]


def _re_flags(flags: int) -> int:
    out = 0
    if flags & HS_FLAG_CASELESS:
        out |= re.IGNORECASE
    if flags & HS_FLAG_DOTALL:
        out |= re.DOTALL
    if flags & HS_FLAG_MULTILINE:
        out |= re.MULTILINE
    return out


def re_ends(pattern: str, flags: int, data: bytes) -> set:
    """All end offsets via Python re (anchor-free patterns only)."""
    c = re.compile(pattern.encode("latin-1"), _re_flags(flags))
    ends = set()
    for e in range(len(data) + 1):
        for s in range(e + 1):
            if c.fullmatch(data[s:e]):
                ends.add(e)
                break
    return ends


@pytest.mark.parametrize("pattern,flags", RE_PATTERNS)
def test_ast_oracle_vs_re(pattern, flags):
    ast = parse(pattern, flags)
    for data in CORPORA:
        got = ast_match_ends(ast, data)
        want = re_ends(pattern, flags, data)
        assert got == want, f"{pattern!r} flags={flags} on {data!r}: {got} != {want}"


@pytest.mark.parametrize(
    "pattern,flags", RE_PATTERNS + ANCHOR_PATTERNS
)
def test_nfa_vs_ast_oracle(pattern, flags):
    ast = parse(pattern, flags)
    g = build_nfa(ast)
    for data in CORPORA:
        want = ast_match_ends(ast, data)
        got = nfa_match_ends(g, data)
        assert got == want, f"{pattern!r} flags={flags} on {data!r}: {got} != {want}"


def test_parse_errors():
    for bad in [
        r"a(b", r")", r"a**", r"*a", r"a{2,1}",
        r"(?=x)y", r"(?<=x)y", r"(?<!x)y", r"x(?!y)", r"(?>ab)",
        r"(a)\1", "a" + chr(92), r"[a", r"a{100000}", r"a*+",
    ]:
        with pytest.raises(CompileError):
            parse(bad)


def test_parse_literal_braces():
    # malformed bounds are literal text, per PCRE
    ast = parse(r"a{,2}")
    assert ast_match_ends(ast, b"xa{,2}") == {6}
    ast = parse(r"a{b}")
    assert ast_match_ends(ast, b"a{b}") == {4}


def test_anchored_empty_cases():
    # `^` alone matches empty at offset 0 on any input
    ast = parse(r"^")
    assert ast_match_ends(ast, b"abc") == {0}
    assert ast_match_ends(ast, b"") == {0}
    # `$` matches at end (and before a final newline)
    ast = parse(r"$")
    assert ast_match_ends(ast, b"abc") == {3}
    assert ast_match_ends(ast, b"abc\n") == {3, 4}
    g = build_nfa(parse(r"$"))
    assert nfa_match_ends(g, b"abc\n") == {3, 4}


def test_word_boundary_trailing():
    # /foo\b/ on "foo," reports to=3 (via consumed ',' with adjust -1)
    g = build_nfa(parse(r"foo\b"))
    assert nfa_match_ends(g, b"foo,") == {3}
    assert nfa_match_ends(g, b"foo") == {3}
    assert nfa_match_ends(g, b"foobar") == set()


def test_eos_chain():
    # /a$\z/: $ and \z assert at the same point; "a\n" must NOT match
    ast = parse(r"a$\z")
    g = build_nfa(ast)
    for data in [b"a", b"a\n", b"ab"]:
        assert nfa_match_ends(g, data) == ast_match_ends(ast, data), data
    assert nfa_match_ends(g, b"a") == {1}
    assert nfa_match_ends(g, b"a\n") == set()


def test_component_splitting_routes_branches():
    """Top-level alternation branches route independently (reference:
    calcComponents, ng_calc_components.cpp): a literal branch takes the
    teddy path, a gap branch the chain path, a big repeat the counter
    engine — no general-engine fallback for the whole pattern."""
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.compiler.parser import parse
    from hyperscan_tpu.database import LbrEngine
    from hyperscan_tpu.utils.oracle import ast_match_ends

    db = hs.compile_multi([r"attackword|foo.*bar|[0-9]{500,}"])
    assert db.lit is not None and 0 in db.lit.chains
    assert any(isinstance(e, LbrEngine) for e in db.engines)

    pat = r"attackword|foo.*bar|[0-9]{40,}"
    db2 = hs.compile_multi([pat])
    node = parse(pat, 0)
    rng = np.random.default_rng(3)
    for _ in range(25):
        d = b""
        for plant in [b"attackword", b"foo", b"bar", b"5" * 45]:
            if rng.integers(0, 2):
                d += plant
            d += bytes(rng.choice(
                np.frombuffer(b"atfobr5 w", np.uint8),
                size=int(rng.integers(0, 20))))
        got = {t for (_i, _f, t) in hs.scan(db2, d)}
        assert got == ast_match_ends(node, d)


def test_assertion_chain_at_start():
    """Carried prev-filters re-decompose against start states (reference
    behavior per hscollider asserts.txt): assertion chains like ^\\b and
    \\b\\b must keep their BOS branch rather than dropping the edge."""
    import hyperscan_tpu as hs

    cases = [
        (r"^\b", 0, b"aaa", {0}),
        (r"^\b", 0, b" aa", set()),
        (r"\A\b", 0, b"aaa", {0}),
        (r"\A\B", 0, b"", {0}),
        (r"\A\B", 0, b"aaa", set()),
        (r"^\B", 0, b"", {0}),
        (r"^\B$", 0, b"", {0}),
        (r"\b\bfoo", 0, b"foobar foo bar", {3, 10}),
        (r"^\b\bfoo", 0, b"foobar foo bar", {3}),
        (r"(a|\A\b)", 0, b"aaa", {0, 1, 2, 3}),
        (r"\b(.*)\b", HS_FLAG_DOTALL, b"aaa", {0, 3}),
        (r"\b.*\b", HS_FLAG_DOTALL, b"aaa", {0, 3}),
    ]
    for pat, fl, data, want in cases:
        db = hs.compile(pat, flags=fl | hs.HS_FLAG_ALLOWEMPTY)
        got = {t for (_i, _f, t) in hs.scan(db, data)}
        assert got == want, (pat, data, got, want)
        ast = parse(pat, fl)
        assert ast_match_ends(ast, data) == want, (pat, data)


def test_malformed_hex_escape_is_compile_error():
    for pat in (r"[\x{31g}]", r"[\x{foo}-~]", r"[\x00-\x{31g}]", r"[\x{31]"):
        with pytest.raises(CompileError):
            parse(pat)


def test_quantified_assertions_reduce():
    """Quantifiers on pure-assertion subtrees reduce (m>=1 -> one copy,
    m==0 -> optional) instead of being rejected; mixed repeat groups with
    assertion cycles eliminate via self-loop subsumption (reference
    compiles all of these, hscollider asserts.txt/anchors.txt)."""
    import hyperscan_tpu as hs

    cases = [
        (r"(^)?foo", b"xfoo foo", {4, 8}),
        (r"(^)*foo", b"xfoo", {4}),
        (r"(^)+foo", b"foo xfoo", {3}),
        (r"foo(\z)?", b"foofoo", {3, 6}),
        (r"((\b){2,})+", b"ab cd", {0, 2, 3, 5}),
        (r"(\b[a-f]\b)+", b"a b xx c", {1, 3, 8}),
        (r"((\b|a){2,})+", b"aaa b", {0, 1, 2, 3, 4, 5}),
        (r"l(\B.)*", b"hello", {3, 4, 5}),
    ]
    for pat, data, want in cases:
        db = hs.compile(pat, flags=hs.HS_FLAG_ALLOWEMPTY)
        got = {t for (_i, _f, t) in hs.scan(db, data)}
        assert got == want, (pat, got, want)
        assert ast_match_ends(parse(pat, 0), data) == want, pat


def test_class_quoting_and_property_escapes():
    """\\Q..\\E inside classes, [\\8], \\p without UCP, \\C byte match
    (reference: Parser.rl class machine + ComponentByte/ComponentClass)."""
    import hyperscan_tpu as hs

    cases = [
        (r"[\Q^\Ea]", b"x^a", {2, 3}),
        (r"[\Qa]\E]", b"a]b", {1, 2}),
        (r"[\E]]", b"]x", {1}),
        (r"[ab-\Q\E]", b"ab-x", {1, 2, 3}),
        (r"[a-\Qe\Ex]", b"cx!", {1, 2}),
        (r"[\81]", b"819", {1, 2}),
        (r"[\W\p{Any}]", b"a!", {1, 2}),
        (r"\p{L}", b"a1", {1}),
        (r"\C", b"\xffz", {1, 2}),
    ]
    for pat, data, want in cases:
        db = hs.compile(pat)
        got = {t for (_i, _f, t) in hs.scan(db, data)}
        assert got == want, (pat, got, want)
    with pytest.raises(CompileError):
        parse(r"\C", HS_FLAG_UTF8)
    with pytest.raises(CompileError):
        parse(r"\X")


def test_prefilter_conditionals_and_named_groups():
    """(?'name'...) groups parse; conditionals over-approximate under
    PREFILTER (reference: prefilter.cpp ComponentCondReference)."""
    import hyperscan_tpu as hs

    db = hs.compile(r"(?'name'foo)bar")
    assert hs.scan(db, b"foobar") == [(0, 0, 6)]
    db = hs.compile(
        r"((?'animal'hamster)|guinea pig) (?('animal')party|nothing)",
        flags=hs.HS_FLAG_PREFILTER,
    )
    assert (0, 0, 13) in hs.scan(db, b"hamster party")
    with pytest.raises(CompileError):
        parse(r"(?(1)yes|no)")


def test_control_verbs_and_braced_octal():
    """(*UTF8)/(*UTF)/(*UCP) leading verbs and \\o{...} octal escapes
    (reference: control_verbs.rl, Parser.rl escapes)."""
    import hyperscan_tpu as hs

    db = hs.compile(r"(*UTF8)\x{7a7a}")
    assert hs.scan(db, "空".encode("utf-8")) == [(0, 0, 3)]
    db = hs.compile(r"(*UCP)(*UTF)\w")
    assert hs.scan(db, "δ".encode("utf-8")) == [(0, 0, 2)]
    db = hs.compile(r"\o{101}")
    assert hs.scan(db, b"A") == [(0, 0, 1)]
    for bad in (r"(*CRLF)foo", r"(*BOGUS)foo", r"\o{9}", r"\o{110000}"):
        with pytest.raises(CompileError):
            parse(bad)
