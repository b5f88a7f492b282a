"""UCP mode (Unicode properties) vs Python re.UNICODE oracle."""

import re as pyre

import pytest

import hyperscan_tpu as hs

UU = hs.HS_FLAG_UTF8 | hs.HS_FLAG_UCP


def _oracle(pattern, data: bytes, reflags=pyre.UNICODE):
    text = data.decode("utf-8")
    boundaries = [0]
    for ch in text:
        boundaries.append(boundaries[-1] + len(ch.encode("utf-8")))
    rx = pyre.compile(pattern, reflags)
    ends = set()
    for s in range(len(text) + 1):
        for e in range(s, len(text) + 1):
            if rx.fullmatch(text, s, e):
                ends.add(boundaries[e])
    return ends


CASES = [
    (r"\w+x", None, "héllo δx wörldx æx".encode()),
    (r"\d\d", None, "42 ٤٢ ４２".encode()),      # arabic-indic + fullwidth
    (r"a\sb", None, "a b a b a b".encode()),  # nbsp, em-space
    (r"\p{L}+!", r"[^\W\d_]+!", "ascii! ελλάδα! 漢字!".encode()),
    (r"[\p{Nd}]+z", r"\d+z", "42z ٤٢z ４２z xz".encode()),
    (r"[^\W]+q", None, "aq δq -q".encode()),
]


@pytest.mark.parametrize("pat,pypat,data", CASES)
def test_ucp_vs_python_re(pat, pypat, data):
    db = hs.compile(pat, flags=UU)
    got = {t for (_i, _f, t) in hs.scan(db, data)}
    want = _oracle(pypat or pat, data)
    assert got == want, f"{pat!r}: {sorted(got)} != {sorted(want)}"


def test_ucp_category_casing():
    db = hs.compile(r"\p{Lu}\p{Ll}+q", flags=UU)
    got = {t for (_i, _f, t) in hs.scan(db, "Wordq Σοφq σοφq".encode())}
    # "Wordq" ends at 5; "Σοφq" = 2+2+2+1 bytes ends at byte 13
    assert got == {5, 13}


def test_ucp_caseless_unicode_fold():
    db = hs.compile("σοφία", flags=UU | hs.HS_FLAG_CASELESS)
    data = "ΣΟΦΊΑ σοφία".encode()
    got = {t for (_i, _f, t) in hs.scan(db, data)}
    assert len(got) == 2


def test_ucp_without_utf8_clips_to_bytes():
    # Latin-1 byte mode: µ (0xB5) is a letter under UCP
    db = hs.compile(r"\w", flags=hs.HS_FLAG_UCP)
    got = {t for (_i, _f, t) in hs.scan(db, b"a\xb5-")}
    assert got == {1, 2}


def test_script_and_special_properties():
    """\\p{...} script names and PCRE specials resolve (reference:
    ucp_table.cpp script/special property tables)."""
    import hyperscan_tpu as hs
    from hyperscan_tpu.compiler.ucp import category_ranges

    fl = hs.HS_FLAG_UTF8 | hs.HS_FLAG_UCP
    db = hs.compile(r"\p{Greek}", flags=fl)
    assert hs.scan(db, "λ".encode("utf-8")) == [(0, 0, 2)]
    db = hs.compile(r"\p{Xan}+", flags=fl)
    assert {t for (_i, _f, t) in hs.scan(db, b"a1!")} == {1, 2}
    any_rs = category_ranges("Any")
    assert any_rs[0][0] == 0
    lamp = category_ranges("L&")
    assert any(lo <= ord("a") <= hi for (lo, hi) in lamp)
    assert not any(lo <= ord("1") <= hi for (lo, hi) in lamp)
    import pytest as _pytest
    from hyperscan_tpu.errors import CompileError

    with _pytest.raises(CompileError):
        category_ranges("NotAProperty")


def test_prop_brace_negation():
    """\\p{^X} == \\P{X} and \\P{^X} == \\p{X} (PCRE brace negation),
    in free position and inside classes."""
    import hyperscan_tpu as hs

    fl = [hs.HS_FLAG_UTF8 | hs.HS_FLAG_UCP]
    d = "aBc δΔ 9".encode("utf-8")
    for a, b in [(r"\p{^Lu}+", r"\P{Lu}+"), (r"\P{^Lu}+", r"\p{Lu}+"),
                 (r"[\p{^Nd}]x", r"[\P{Nd}]x")]:
        da = hs.compile_multi([a], ids=[1], flags=fl)
        db_ = hs.compile_multi([b], ids=[1], flags=fl)
        assert hs.scan(da, d) == hs.scan(db_, d), (a, b)
