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


def test_som_without_literal_factor():
    """General SOM: patterns without a literal factor use the
    som-register engine (reference: Gough / ng_som planning)."""
    import numpy as np

    from hyperscan_tpu.database import SomEngine
    from hyperscan_tpu.utils.oracle import ast_leftmost_som

    db = hs.compile(r"[0-9]{3}-[0-9]{4}", flags=SOM)
    assert any(isinstance(e, SomEngine) for e in db.engines)
    ms = hs.scan(db, b"call 555-1212 now")
    assert sorted(tuple(m) for m in ms) == [(0, 5, 13)]

    db2 = hs.compile(r"[0-9]+x{0,3}", flags=SOM)
    rng = np.random.default_rng(4)
    from hyperscan_tpu.compiler.parser import parse

    node = parse(r"[0-9]+x{0,3}", SOM)
    for _ in range(40):
        d = bytes(rng.choice(np.frombuffer(b"019x z", np.uint8),
                             size=int(rng.integers(0, 30))))
        got = {(m[1], m[2]) for m in hs.scan(db2, d)}
        want = {(s0, e) for (e, s0) in ast_leftmost_som(node, d).items()}
        assert got == want, (d, sorted(got), sorted(want))


def test_general_som_streaming_and_serialize():
    import numpy as np

    from hyperscan_tpu.compiler.parser import parse
    from hyperscan_tpu.utils.oracle import ast_leftmost_som

    pat = r"[0-9]+x{0,3}"
    node = parse(pat, SOM)
    sdb = hs.compile(pat, flags=SOM, mode=hs.HS_MODE_STREAM)
    sdb = hs.deserialize_database(hs.serialize_database(sdb))
    rng = np.random.default_rng(6)
    for _ in range(20):
        d = bytes(rng.choice(np.frombuffer(b"019x z", np.uint8),
                             size=int(rng.integers(2, 30))))
        want = {(s, e) for (e, s) in ast_leftmost_som(node, d).items()}
        k = int(rng.integers(1, 4))
        cuts = sorted(rng.choice(len(d), size=k, replace=False).tolist())
        st = hs.open_stream(sdb)
        ms, prev = [], 0
        for c in cuts + [len(d)]:
            ms += hs.scan_stream(st, d[prev:c])
            prev = c
            if rng.integers(0, 3) == 0:
                st = hs.expand_stream(sdb, hs.compress_stream(st))
        ms += hs.close_stream(st)
        got = {(m[1], m[2]) for m in ms}
        assert got == want, (d, cuts, sorted(got), sorted(want))


def test_som_horizon_past_horizon():
    """SOM horizon tiers (reference: hs_compile.h:1184-1210,
    HS_OFFSET_PAST_HORIZON hs_runtime.h:615)."""
    from hyperscan_tpu.flags import (
        HS_MODE_SOM_HORIZON_SMALL,
        HS_OFFSET_PAST_HORIZON,
    )

    sdb = hs.compile(r"a[ab]*z", flags=SOM,
                     mode=hs.HS_MODE_STREAM | HS_MODE_SOM_HORIZON_SMALL)
    st = hs.open_stream(sdb)
    ms = (hs.scan_stream(st, b"a" + b"b" * 70000)
          + hs.scan_stream(st, b"z") + hs.close_stream(st))
    assert [tuple(m) for m in ms] == [(0, HS_OFFSET_PAST_HORIZON, 70002)]
    st = hs.open_stream(sdb)
    ms2 = hs.scan_stream(st, b"xxaz") + hs.close_stream(st)
    assert [tuple(m) for m in ms2] == [(0, 2, 4)]


def test_som_vacuous_branch_with_literal_branch():
    """(1xc)|.? under SOM: the vacuous branch must not prune the literal
    branch's accepts out of the shared window validator (fuzzer
    regression, third SOM catch)."""
    import numpy as np

    from hyperscan_tpu.compiler.parser import parse
    from hyperscan_tpu.utils.oracle import ast_leftmost_som

    p = r"(1xc)|.?"
    fl = hs.HS_FLAG_ALLOWEMPTY | SOM
    db = hs.compile(p, flags=fl)
    assert {(m[1], m[2]) for m in hs.scan(db, b"z1xcz")} == {
        (s, e) for (e, s) in ast_leftmost_som(parse(p, fl), b"z1xcz").items()
    }
    rng = np.random.default_rng(5)
    for _ in range(20):
        d = bytes(rng.choice(np.frombuffer(b"1xcz a", np.uint8),
                             size=int(rng.integers(0, 35))))
        got = {(m[1], m[2]) for m in hs.scan(db, d)}
        want = {(s, e) for (e, s)
                in ast_leftmost_som(parse(p, fl), d).items()}
        assert got == want, (d, sorted(got), sorted(want))


def test_som_eod_boundary_report_defers_until_close():
    r"""An EOD-capable SOM pattern's report at the final write boundary
    must min-merge with the close-time $-match's earlier leftmost start
    (block parity) — and still deliver promptly when the boundary turns
    out to be interior. Found by the SOM-stream fuzzer."""
    pat = r"ab|a.?b$"
    flags = [hs.HS_FLAG_SOM_LEFTMOST]
    bdb = hs.compile_multi([pat], flags=flags)
    sdb = hs.compile_multi([pat], flags=flags, mode=hs.HS_MODE_STREAM)
    data = b"zaxb"  # 'a.?b$' matches (1,4); no 'ab' literal match
    want = set(hs.scan(bdb, data))
    assert want == {(0, 1, 4)}
    st = hs.open_stream(sdb)
    ms = hs.scan_stream(st, b"za")
    ms += hs.scan_stream(st, b"xb")
    ms += hs.close_stream(st)
    assert set(ms) == want, ms

    # both branches end at the same offset: block min-merges to the
    # earlier start; streaming must match even when 'ab' completes at a
    # write boundary
    data2 = b"zaab"  # 'ab' at (2,4); 'a.?b$' at (1,4) -> leftmost 1
    want2 = set(hs.scan(bdb, data2))
    assert want2 == {(0, 1, 4)}
    st = hs.open_stream(sdb)
    ms = hs.scan_stream(st, b"zaab")  # boundary == EOD candidate
    ms += hs.close_stream(st)
    assert set(ms) == want2, ms

    # interior boundary: the deferred report must be released unchanged
    st = hs.open_stream(sdb)
    ms = hs.scan_stream(st, b"zaab")
    ms += hs.scan_stream(st, b"zz")   # boundary becomes interior
    ms += hs.close_stream(st)
    got = set(ms)
    assert got == set(hs.scan(bdb, b"zaabzz")), got

    # codec round trip carries the pending deferral
    st = hs.open_stream(sdb)
    hs.scan_stream(st, b"zaab")
    st2 = hs.expand_stream(sdb, hs.compress_stream(st))
    assert set(hs.close_stream(st2)) == want2
