"""Factor-anchored validation (shared suffix automata).

A pattern whose factors all sit inside its FIXED HEAD at a fixed
distance from the match start validates as head-byte checks plus ONE
anchored suffix-DFA scan — and the suffix automaton is content-shared
across the whole vocabulary family (reference analogue: Rose roles with
zero-lag left context + suffix engines, src/rose/rose_graph.h
LeftEngInfo; merging intent of src/rose/rose_build_merge.cpp)."""

import numpy as np
import pytest

import hyperscan_tpu as hs
from hyperscan_tpu.compiler.parser import parse
from hyperscan_tpu.utils.oracle import ast_match_ends

FAMILY = [
    r"attack7[0-9]{2,4}z",
    r"payload123[0-9]{2,4}z",
    r"evilstring[0-9]{2,4}z",
    r"gadget[0-9]{2,4}z",
]


def _truth(pats, ids, data: bytes):
    out = set()
    for p, i in zip(pats, ids):
        node = parse(p)
        for e in ast_match_ends(node, data):
            out.add((i, e))
    return out


def _got(db, data: bytes):
    return {(i, to) for (i, _f, to) in hs.scan(db, data)}


def test_family_shares_one_suffix_validator():
    db = hs.compile_multi(FAMILY, ids=[1, 2, 3, 4])
    lit = db.lit
    assert len(lit.anchored_refs) == len(FAMILY)
    # one shared suffix automaton, zero whole-pattern validators
    assert len(lit.sfx_validators) == 1
    assert len(lit.validators) == 0
    data = (b"xx attack734z yy payload12399z zz evilstring55z "
            b"attack7z gadget123456z gadget12345z oo attack71234z")
    assert _got(db, data) == _truth(FAMILY, [1, 2, 3, 4], data)


def test_anchored_matches_overlap_and_bounds():
    pats = [r"abend[0-9]{1,3}x", r"bend[0-9]{2}xy"]
    db = hs.compile_multi(pats, ids=[7, 8])
    assert len(db.lit.anchored_refs) >= 1
    data = b"abend12x abend123xy bend12xy zabend1x abend1234x bend12xz"
    assert _got(db, data) == _truth(pats, [7, 8], data)


def test_anchored_caseless_head():
    pats = [r"AdMiN[0-9]{1,2}q"]
    db = hs.compile_multi(pats, ids=[3], flags=[hs.HS_FLAG_CASELESS])
    data = b"admin1q ADMIN22q AdMin333q admin4q"
    got = _got(db, data)
    import re
    truth = {(3, m.end()) for m in re.finditer(
        rb"admin[0-9]{1,2}q", data, re.I)}
    assert got == truth


def test_anchored_assertion_suffix_falls_back():
    # a leading \b in the remainder reads bytes BEFORE the remainder:
    # must stay on the whole-pattern validator route
    db = hs.compile_multi([r"word\b[!]?"], ids=[1],
                          flags=[0])
    assert len(db.lit.anchored_refs) == 0
    data = b"word! word words"
    assert _got(db, data) == _truth([r"word\b[!]?"], [1], data)


def test_anchored_serialization_roundtrip():
    db = hs.compile_multi(FAMILY, ids=[1, 2, 3, 4])
    blob = hs.serialize_database(db)
    db2 = hs.deserialize_database(blob)
    assert len(db2.lit.anchored_refs) == len(FAMILY)
    assert len(db2.lit.sfx_validators) == 1
    data = b"attack788z payload1234z evilstring00z gadget99z"
    assert _got(db2, data) == _got(db, data) == \
        _truth(FAMILY, [1, 2, 3, 4], data)


def test_anchored_streaming_across_writes():
    db = hs.compile_multi(FAMILY, ids=[1, 2, 3, 4],
                          mode=hs.HS_MODE_STREAM)
    data = b"xx attack734z yy payload12399z zz evilstring55z gadget12z"
    truth = _truth(FAMILY, [1, 2, 3, 4], data)
    for cut in range(1, len(data), 3):
        st = hs.open_stream(db)
        got = set()
        cb = lambda i, f, t, fl: got.add((i, t))
        hs.scan_stream(st, data[:cut], cb)
        hs.scan_stream(st, data[cut:], cb)
        hs.close_stream(st, cb)
        assert got == truth, f"cut={cut}"


def test_anchored_stream_state_roundtrip():
    db = hs.compile_multi(FAMILY, ids=[1, 2, 3, 4],
                          mode=hs.HS_MODE_STREAM)
    data = b"qq payload123456z attack799z"
    st = hs.open_stream(db)
    got = set()
    cb = lambda i, f, t, fl: got.add((i, t))
    hs.scan_stream(st, data[:11], cb)
    blob = hs.compress_stream(st)
    st2 = hs.expand_stream(db, blob)
    hs.scan_stream(st2, data[11:], cb)
    hs.close_stream(st2, cb)
    assert got == _truth(FAMILY, [1, 2, 3, 4], data)


def test_anchored_singlematch_and_quiet():
    db = hs.compile_multi([r"hit[0-9]{1,2}e"], ids=[5],
                          flags=[hs.HS_FLAG_SINGLEMATCH])
    data = b"hit1e hit22e hit3e"
    ms = hs.scan(db, data)
    assert len(ms) == 1 and ms[0][0] == 5


def test_anchored_pure_head_empty_suffix():
    # factors not spanning the whole literal-equivalent pattern can
    # still anchor with an EMPTY suffix (svid -1): class positions in
    # the head break lit-equivalence but stay fixed-distance
    pats = [r"foo[ab]barbaz[01]"]
    db = hs.compile_multi(pats, ids=[9])
    data = b"fooabarbaz0 foobbarbaz1 foocbarbaz0 fooabarbaz2"
    assert _got(db, data) == _truth(pats, [9], data)


def test_head_alt_expansion_routes_anchored():
    # fixed alternations blocking the head explode into per-branch
    # literals / anchored refs (x12(GET|POST|PUT) /[a-z]{1,20}; the
    # pure-literal case v4\.(exe|dll|bat) becomes three equiv factors)
    pats = [r"x12(GET|POST|PUT) /[a-z]{1,20}", r"v4\.(exe|dll|bat)"]
    db = hs.compile_multi(pats, ids=[1, 2])
    lit = db.lit
    assert len(lit.validators) == 0
    assert len(lit.anchored_refs) == 3  # one per expanded GET/POST/PUT
    assert len(lit.sfx_validators) == 1
    data = (b"x12GET /abc x12POST /longerpath x12PUT / x12HEAD /zz "
            b"v4.exe v4.dll v4.bat v4.txt x12GET /" + b"q" * 30)
    assert _got(db, data) == _truth(pats, [1, 2], data)


def test_head_alt_expansion_mixed_failure_falls_back():
    # one alternative is NOT fixed -> no expansion; pattern still
    # matches correctly through the whole-pattern validator
    pats = [r"yy12(GET|P[ao]ST) /[a-z]{1,3}"]
    db = hs.compile_multi(pats, ids=[4])
    data = b"yy12GET /ab yy12PaST /xyz yy12PoST /q yy12PeST /q"
    assert _got(db, data) == _truth(pats, [4], data)


def test_vocabulary_scale_validator_reduction():
    # 200-pattern vocabulary over 4 suffix families -> <= 4 suffix
    # validators and no per-pattern whole validators
    rng = np.random.default_rng(7)
    sfx = [r"[0-9]{2,4}z", r"[a-f]{3}q", r"=[0-9a-f]{2}", r"[xy]{1,2}k"]
    pats, ids = [], []
    for i in range(200):
        word = "".join(chr(ord("a") + int(c))
                       for c in rng.integers(0, 26, size=9))
        pats.append(word + sfx[i % 4])
        ids.append(i + 1)
    db = hs.compile_multi(pats, ids=ids)
    lit = db.lit
    assert len(lit.anchored_refs) == 200
    assert len(lit.sfx_validators) <= 4
    assert len(lit.validators) == 0
    # spot-check correctness on planted + noise corpus
    probe = bytearray(
        (97 + rng.integers(0, 26, size=4096)).astype(np.uint8))
    plant = []
    for k in (3, 77, 141):
        s = pats[k].replace(r"[0-9]{2,4}z", "73z") \
            .replace(r"[a-f]{3}q", "abcq") \
            .replace(r"=[0-9a-f]{2}", "=0f") \
            .replace(r"[xy]{1,2}k", "xk").encode()
        off = 200 + 300 * k % 3000
        probe[off:off + len(s)] = s
        plant.append((ids[k], off + len(s)))
    data = bytes(probe)
    got = _got(db, data)
    assert set(plant) <= got
    assert got == _truth(pats, ids, data)


def test_bounded_repeat_tail_rejects_nondigit_run():
    """Round-4 regression: `payload1[0-9]{2,4}z` falsely matched
    `payload16y99z` (the bench plant) through the fixed-head route —
    the `y` breaks the digit run, so there is no match. The anchored
    suffix-DFA route must reject it on both the fixed-head and
    class-head (legacy whole-pattern validator) paths, while still
    finding the true digit-run matches."""
    db = hs.compile_multi([r"payload1[0-9]{2,4}z"], ids=[1])
    assert hs.scan(db, b"xx payload16y99z! yy") == []
    assert _got(db, b"xx payload1699z! yy") == {(1, 15)}
    assert _got(db, b"payload16999z") == {(1, 13)}  # 4-digit run
    # same shape through the legacy route (class head blocks anchoring)
    db2 = hs.compile_multi([r"[ab]ayload1[0-9]{2,4}z"], ids=[3])
    assert len(getattr(db2.lit, "anchored_refs", [])) == 0
    assert hs.scan(db2, b"xx aayload16y99z! yy") == []
    assert _got(db2, b"xx bayload1699z! yy") == {(3, 15)}
