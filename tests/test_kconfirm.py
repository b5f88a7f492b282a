"""In-kernel confirm (Pallas epilogue) vs XLA confirm differential.

The kconfirm family moves tail-byte extraction + the direct-mapped hash
probes into the filter kernel (MXU one-hot contractions against
VMEM-resident tables, ops/teddy._confirm_epilogue). Both families must
produce identical hash-matched (fid, pos) pairs — correctness downstream
(expand/verify) is family-blind."""

import numpy as np
import pytest

import hyperscan_tpu as hs
import jax.numpy as jnp

from hyperscan_tpu.ops import teddy as T

PATS = [
    "attack%d" % i for i in range(40)
] + [
    r"payload%d[0-9]{2,4}z" % i for i in range(30)
] + [
    r"q%dh[a-f0-9]{8}" % i for i in range(30)
]


def _pairs(lit, rows_d, corpus, n, kconfirm: bool):
    # compare VERIFIED pairs: the two families use different hash table
    # layouts, so their (filtered-downstream) signature false positives
    # differ — the exact-verified set must not
    from hyperscan_tpu.runtime.lit_runtime import verify_pairs

    lit._kconfirm_off = not kconfirm
    lit._kconfirm_force = kconfirm
    h = T.teddy_confirm_start(rows_d, lit, n)
    assert bool(h[8]) == kconfirm
    f, p = T.teddy_confirm_finish(h)
    f, p = verify_pairs(lit, corpus, np.zeros(1, np.int64),
                        np.asarray(f), np.asarray(p))
    return set(zip(f.tolist(), p.tolist()))


@pytest.fixture(scope="module")
def db():
    return hs.compile_multi(PATS, ids=list(range(len(PATS))))


def test_kconfirm_matches_xla_confirm(db):
    lit = db.lit
    assert T.dev_confirm_planes(lit) is not None
    rng = np.random.default_rng(11)
    n = (1 << 18) + 333  # unaligned straggler cell
    corpus = (32 + rng.integers(0, 95, size=n)).astype(np.uint8)
    plant = b" attack7 payload12345z q3hdeadbeef attack39 "
    for off in (0, 5000, 70000, n - len(plant) - 1):
        corpus[off:off + len(plant)] = np.frombuffer(plant, np.uint8)
    rows_d = jnp.asarray(T.corpus_to_rows(corpus))
    s_k = _pairs(lit, rows_d, corpus, n, True)
    s_x = _pairs(lit, rows_d, corpus, n, False)
    assert s_k == s_x
    assert len(s_k) >= 8  # the plants confirmed


def test_kconfirm_end_to_end_scan(db):
    # full scan() equality with the family toggled
    data = (b"zz attack3 yy payload7 1234z q11hcafebabe " * 50
            + b"attack25")
    db.lit._kconfirm_off = False
    db.lit._kconfirm_force = True
    got_k = set(hs.scan(db, data))
    db.lit._kconfirm_off = True
    got_x = set(hs.scan(db, data))
    assert got_k == got_x
    assert any(e == 3 for (e, _f, _t) in got_k)


def test_kconfirm_sidecar_hot_cell(db):
    # a single dense cell must not force a big capc: overflowing cells
    # re-confirm through the XLA sidecar — results identical either way
    lit = db.lit
    rng = np.random.default_rng(5)
    n = 1 << 19
    corpus = (32 + rng.integers(0, 95, size=n)).astype(np.uint8)
    hot = b" attack7 payload3 55z q9hbeef01 " * 40  # ~120 hits, 1 cell
    corpus[70000:70000 + len(hot)] = np.frombuffer(hot, np.uint8)
    rows_d = jnp.asarray(T.corpus_to_rows(corpus))
    lit._kc_mean = 1.0  # force a tiny capc so the hot cell overflows
    lit.__dict__.pop("_kc_force_capc", None)
    try:
        s_k = _pairs(lit, rows_d, corpus, n, True)
        s_x = _pairs(lit, rows_d, corpus, n, False)
    finally:
        lit.__dict__.pop("_kc_mean", None)
        lit.__dict__.pop("_kc_force_capc", None)
    assert s_k == s_x
    assert len(s_k) >= 100


def _clear_kernel_caches():
    T._jit_filter_confirm.cache_clear()
    T._make_kernel_fused.cache_clear()
    T._make_kernel_fused_classes.cache_clear()


def test_kconfirm_pergroup_fallback_path(db, monkeypatch):
    # big-table databases fall back to the per-group probe loop (merged
    # one-hot element limit); force that path and re-run the family
    # differential — results must be identical to the XLA confirm
    lit = db.lit
    monkeypatch.setattr(T, "_KCONF_MERGE_LIMIT", 0)
    _clear_kernel_caches()
    try:
        rng = np.random.default_rng(17)
        n = (1 << 17) + 99
        corpus = (32 + rng.integers(0, 95, size=n)).astype(np.uint8)
        plant = b" attack5 payload9 77z q21hfeedf00d "
        for off in (100, 40000, n - len(plant) - 2):
            corpus[off:off + len(plant)] = np.frombuffer(plant, np.uint8)
        rows_d = jnp.asarray(T.corpus_to_rows(corpus))
        s_k = _pairs(lit, rows_d, corpus, n, True)
        s_x = _pairs(lit, rows_d, corpus, n, False)
        assert s_k == s_x
        assert len(s_k) >= 6
    finally:
        # kernels traced under the patched limit must not leak
        _clear_kernel_caches()


def test_kconfirm_overflow_demotes(db, monkeypatch):
    # a flood of real matches (> CAPC2 confirmed in one cell) must flip
    # the database to the XLA confirm family, never lose records. Drive
    # the device-path entry directly: hs.scan would route a corpus this
    # small through the host path and never exercise the kernel.
    from hyperscan_tpu.runtime.lit_runtime import verify_pairs

    lit = db.lit
    lit._kconfirm_off = False
    lit._kconfirm_force = True
    lit.__dict__.pop("_cap_obs_c", None)
    corpus = np.frombuffer(b" attack7 " * 12000, np.uint8)
    n = corpus.shape[0]  # ~8000 confirms per 64 KB cell >> CAPC2
    rows_d = jnp.asarray(T.corpus_to_rows(corpus))
    h = T.teddy_confirm_start(rows_d, lit, n)
    assert bool(h[8])  # engaged as the kconfirm family
    f, p = T.teddy_confirm_finish(h)
    # the flood demotes the family: either the explicit _kconfirm_off
    # flip (sidecar overflow at the capc ceiling) or the learned per-
    # cell candidate load growing past KCONF_MAX_CAPC — the NEXT
    # dispatch must choose the XLA confirm even with force still set
    h2 = T.teddy_confirm_start(rows_d, lit, n)
    assert not bool(h2[8])
    # ...and the finished (re-dispatched) result must be complete:
    f, p = verify_pairs(lit, corpus, np.zeros(1, np.int64),
                        np.asarray(f), np.asarray(p))
    got_k = set(zip(f.tolist(), p.tolist()))
    f2, p2 = T.teddy_confirm_finish(h2)
    f2, p2 = verify_pairs(lit, corpus, np.zeros(1, np.int64),
                          np.asarray(f2), np.asarray(p2))
    assert got_k == set(zip(f2.tolist(), p2.tolist()))
    assert len(got_k) >= 10000
    lit._kconfirm_force = False
    lit.__dict__.pop("_kconfirm_off", None)
    lit.__dict__.pop("_kc_force_capc", None)
    lit.__dict__.pop("_cap_obs_c", None)
    lit.__dict__.pop("_kc_mean", None)
