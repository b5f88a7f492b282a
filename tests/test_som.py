"""SOM (leftmost start-of-match) conformance vs the AST oracle.

Reference: HS_FLAG_SOM_LEFTMOST (src/hs_compile.h:963) — matches report
(id, from, to) with `from` the leftmost start over matches ending at `to`.
"""

import pytest

import hyperscan_tpu as hs
from hyperscan_tpu.compiler.parser import parse
from hyperscan_tpu.errors import CompileError
from hyperscan_tpu.utils.oracle import ast_leftmost_som

SOM = hs.HS_FLAG_SOM_LEFTMOST

PATTERNS = [
    r"attack",
    r"admin[0-9]{1,3}",
    r"(abc|abcdef)x",
    r"a{1,10}bcd",
    r"^root[0-9]{0,4}",
    r"colou?r",
    r"\bword\b",
    r"tail[0-9]{2}$",
]

CORPORA = [
    b"",
    b"attack aaattack",
    b"admin1 admin22 xadmin333",
    b"abcx abcdefx zabcdefxy",
    b"aaaabcd abcd",
    b"root12 root",
    b"color colour colouur",
    b"word words word.",
    b"see tail42",
    b"tail42 tail9 tail55",
]


def test_som_vs_oracle():
    for pat in PATTERNS:
        db = hs.compile(pat, flags=SOM)
        node = parse(pat, 0)
        for data in CORPORA:
            want = ast_leftmost_som(node, data)
            got = hs.scan(db, data)
            got_map = {to: frm for (_id, frm, to) in got}
            assert set(got_map) == set(want), (
                f"{pat!r} on {data!r}: ends {sorted(got_map)} != {sorted(want)}"
            )
            for to, frm in got_map.items():
                assert frm == want[to], (
                    f"{pat!r} on {data!r} end {to}: from {frm} != {want[to]}"
                )


def test_som_multi_pattern():
    db = hs.compile_multi(
        [r"attack", r"at{1,5}ack"], flags=[SOM, SOM], ids=[1, 2]
    )
    ms = hs.scan(db, b"zz attttack attack")
    assert (2, 3, 11) in ms
    assert (1, 12, 18) in ms and (2, 12, 18) in ms


def test_som_streaming():
    db = hs.compile_multi([r"admin[0-9]{1,3}"], flags=[SOM], ids=[5],
                          mode=hs.HS_MODE_STREAM)
    st = hs.open_stream(db)
    ms = hs.scan_stream(st, b"xx adm")
    ms += hs.scan_stream(st, b"in427 yy")
    ms += hs.close_stream(st)
    assert ms == [(5, 3, 9), (5, 3, 10), (5, 3, 11)]


def test_som_singlematch_conflict():
    with pytest.raises(CompileError):
        hs.compile(r"attack", flags=SOM | hs.HS_FLAG_SINGLEMATCH)


def test_som_unsupported_pattern_errors():
    with pytest.raises(CompileError):
        hs.compile(r"[0-9]{3}-[0-9]{4}", flags=SOM)  # no literal factor
