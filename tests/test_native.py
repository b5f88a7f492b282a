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
