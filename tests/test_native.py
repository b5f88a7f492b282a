"""Native (C++) host runtime vs numpy fallback equivalence."""

import numpy as np
import pytest

import hyperscan_tpu as hs
from hyperscan_tpu import native
from hyperscan_tpu.runtime.smallwrite import teddy_filter_host


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native library unavailable (no g++?)")
    return True


def test_native_builds(built):
    assert native.get_lib() is not None


def test_scan_matches_with_and_without_native(built, monkeypatch):
    db = hs.compile_multi(
        [r"attack[0-9]+", r"foo(bar|baz)", r"[0-9]{3}-[0-9]{4}"],
        ids=[1, 2, 3],
    )
    data = b"zz attack42 foobaz 555-1212 " * 30
    with_native = hs.scan(db, data)
    monkeypatch.setenv("HSTPU_NO_NATIVE", "1")
    without = hs.scan(db, data)
    assert with_native == without
    assert any(m[0] == 1 for m in with_native)
    assert any(m[0] == 3 for m in with_native)


def test_teddy_filter_native_equals_numpy(built, monkeypatch):
    rng = np.random.default_rng(0)
    lits = [bytes(rng.integers(97, 123, rng.integers(3, 9)).tolist())
            for _ in range(50)]
    from hyperscan_tpu.compiler.literals import Factor, LitAtom
    from hyperscan_tpu.compiler.teddy import build_teddy

    plan = build_teddy(
        [Factor(tuple(LitAtom(b, 0xFF) for b in l)) for l in lits]
    )
    corpus = np.frombuffer(
        rng.integers(97, 123, 65536, dtype=np.uint8).tobytes()
        + lits[0] + lits[7], dtype=np.uint8
    )
    pos_n, words_n = native.teddy_filter_native(corpus, plan.masks)
    monkeypatch.setenv("HSTPU_NO_NATIVE", "1")
    pos_p, words_p = teddy_filter_host(corpus, plan.masks)
    assert np.array_equal(pos_n, pos_p)
    assert np.array_equal(words_n, words_p)


def test_teddy_filter_both_gates_equal_numpy(built):
    """The AVX2 nibble super-bucket gate and the scalar pair gate must
    produce byte-identical candidates; force each in turn."""
    rng = np.random.default_rng(5)
    lits = [bytes(rng.integers(32, 127, rng.integers(2, 12)).tolist())
            for _ in range(200)]
    from hyperscan_tpu.compiler.literals import Factor, LitAtom
    from hyperscan_tpu.compiler.teddy import build_teddy

    plan = build_teddy(
        [Factor(tuple(LitAtom(b, 0xFF) for b in l)) for l in lits]
    )
    corpus = np.frombuffer(
        rng.integers(32, 127, 100003, dtype=np.uint8).tobytes()
        + lits[3] + lits[11] + lits[42], dtype=np.uint8
    )
    ref_pos, ref_words = teddy_filter_host(corpus, plan.masks)
    lib = native.get_lib()
    masks = np.ascontiguousarray(plan.masks, dtype=np.int32)
    M, W, _ = masks.shape
    pair = native._pair_table(plan.masks)
    nib, _surv = native._nib_tables(plan.masks)
    _p = native._ptr
    pair8 = native._pair_table8(plan.masks)
    for fn, args in (
        (lib.hstpu_teddy_filter_nib,
         (_p(masks), M, W, _p(pair), _p(nib))),
        (lib.hstpu_teddy_filter_pair, (_p(masks), M, W, _p(pair))),
        (lib.hstpu_teddy_filter_pair8, (_p(masks), M, W, _p(pair8))),
    ):
        cap = 1 << 14
        out_pos = np.empty(cap, np.int64)
        out_words = np.empty((W, cap), np.int32)
        cnt = int(fn(*args, _p(corpus), corpus.shape[0],
                     _p(out_pos), _p(out_words), cap))
        assert cnt <= cap
        assert np.array_equal(out_pos[:cnt], ref_pos)
        assert np.array_equal(out_words[:, :cnt], ref_words)


def test_confirm_native_equals_numpy(built, monkeypatch):
    """hstpu_confirm vs the numpy group-searchsorted confirm, including
    factors longer than the 8-byte tail, caseless masks, candidates near
    offset 0, and block-containment boundaries."""
    from hyperscan_tpu.runtime.lit_runtime import confirm_candidates

    db = hs.compile_multi(
        ["abc", "xabcdefghijklm", "ABC", "q", "deadbeefcafe"],
        ids=[1, 2, 3, 4, 5],
        flags=[0, 0, hs.HS_FLAG_CASELESS, 0, 0],
    )
    assert db.lit is not None
    corpus = np.frombuffer(
        b"abcxabcdefghijklmqqaBcdeadbeefcafe abc", np.uint8
    ).copy()
    pos, words = teddy_filter_host(corpus, db.lit.masks)
    for bs_l in ([0], [0, 5], [0, 17], [0, 1, 2, 3, 30]):
        bs = np.asarray(bs_l, np.int64)
        f_n, p_n = confirm_candidates(db.lit, corpus, bs, pos, words)
        monkeypatch.setenv("HSTPU_NO_NATIVE", "1")
        f_p, p_p = confirm_candidates(db.lit, corpus, bs, pos, words)
        monkeypatch.delenv("HSTPU_NO_NATIVE")
        assert sorted(zip(f_n.tolist(), p_n.tolist())) == \
            sorted(zip(f_p.tolist(), p_p.tolist())), bs_l
    assert len(f_n)  # the probe corpus must actually confirm factors
