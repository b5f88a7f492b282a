"""Multi-device sharded scanning over the virtual 8-device CPU mesh.

Reference analogue: none (single-threaded library); this validates the
TPU-native data-parallel layout of SURVEY.md §2.11 — DB replicated,
corpus blocks sharded, psum/all_gather aggregation.
"""

import numpy as np
import pytest

import hyperscan_tpu as hs
from hyperscan_tpu.parallel import (
    make_mesh,
    pad_batch_for_mesh,
    sharded_scan_counts,
    sharded_scan_matches,
)
from hyperscan_tpu.runtime.scan import scan_batch


@pytest.fixture(scope="module")
def db():
    # none of these has a chainable factor pair or bounded factor, so
    # they land in a single general DFA engine these tests exercise (the
    # literal path has its own tests in test_literal_path.py)
    db = hs.compile_multi(
        [r"f[o0]+[a-z]+bar", r"x[0-9]+y", r"er+or"],
        ids=[10, 20, 30],
    )
    # all three land in one general DFA engine; the first also registers
    # its mandatory "bar" factor as an engine prefilter (round-4 literal
    # degradation), which creates a lit table set with only "pre" refs
    assert len(db.engines) == 1
    if db.lit is not None:
        assert all(k == "pre" for refs in db.lit.factor_refs
                   for (_e, _a, _b, k) in refs)
    return db


def _blocks():
    return [
        b"xx fooqqbar yy x123y",
        b"error and errors",
        b"nothing in here at all",
        b"fooabar" * 3,
        b"",
        b"x88y erroor",
    ]


def test_sharded_counts_match_single_device(db):
    mesh = make_mesh()
    assert mesh.devices.size == 8
    blocks = _blocks()
    data, lengths = pad_batch_for_mesh(blocks, mesh, pad_len=128)
    e = db.engines[0]

    n_sharded = sharded_scan_counts(e, data, lengths, mesh)

    # unsharded truth: dense accept plane count
    import jax.numpy as jnp

    from hyperscan_tpu.ops.dfa import dfa_scan_batch

    accepts, _ = dfa_scan_batch(
        jnp.asarray(e.trans),
        jnp.asarray(e.byte_to_class.astype(np.int32)),
        jnp.asarray(e.accept_id),
        jnp.int32(e.start_state),
        jnp.asarray(data),
        jnp.asarray(lengths),
    )
    assert n_sharded == int(np.sum(np.asarray(accepts) != 0))
    assert n_sharded > 0


def test_sharded_matches_equal_scan_batch(db):
    mesh = make_mesh()
    blocks = _blocks()
    data, lengths = pad_batch_for_mesh(blocks, mesh, pad_len=128)
    e = db.engines[0]
    totals, set_ids, rows, tos, eod_sets = sharded_scan_matches(
        e, data, lengths, mesh, capacity=64
    )
    totals = np.asarray(totals)
    set_ids = np.asarray(set_ids)
    rows = np.asarray(rows)
    tos = np.asarray(tos)

    n_chips = totals.shape[0]
    rows_per_chip = data.shape[0] // n_chips
    got = set()
    for chip in range(n_chips):
        for j in range(int(totals[chip])):
            grow = chip * rows_per_chip + int(rows[chip, j])
            for (eidx, adj) in e.expand_set(int(set_ids[chip, j])):
                got.add((grow, db.patterns[eidx].external_id, int(tos[chip, j]) + adj))

    want = set()
    for bi, ms in enumerate(scan_batch(db, blocks)):
        for (mid, _f, to) in ms:
            want.add((bi, mid, to))
    assert got == want


def test_graft_entry_single_chip():
    import __graft_entry__ as ge
    import jax

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert int(out[0]) > 0  # planted "fooqqbar" match found


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_teddy_count():
    import numpy as np

    from hyperscan_tpu.runtime.smallwrite import teddy_filter_host

    db2 = hs.compile_multi([r"attack", r"needle", r"hayst"], ids=[1, 2, 3])
    assert db2.lit is not None
    rng = np.random.default_rng(5)
    corpus = bytearray(rng.integers(32, 127, 3 * 512 * 128 + 777,
                                    dtype=np.uint8).tobytes())
    for off in (100, 70000, 150000, len(corpus) - 10):
        corpus[off:off + 6] = b"attack"
    corpus = np.frombuffer(bytes(corpus), np.uint8)

    from hyperscan_tpu.parallel import make_mesh, sharded_teddy_count

    mesh = make_mesh()
    got = sharded_teddy_count(corpus, db2.lit.masks, mesh)
    pos, _w = teddy_filter_host(corpus, db2.lit.masks)
    assert got == len(pos) and got >= 4


def test_sharded_scan_batch_product_path():
    """scan_batch(mesh=...) runs the real literal pipeline sharded and
    must reproduce single-device match tuples exactly (SURVEY §2.11)."""
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.parallel.sharded import make_mesh

    pats = ["attack" + str(i) if i % 2 else rf"q{i}h[a-f0-9]{{4}}"
            for i in range(120)]
    db = hs.compile_multi(pats, ids=list(range(120)))
    rng = np.random.default_rng(3)
    blocks = []
    for b in range(19):
        c = (32 + rng.integers(
            0, 95, size=int(rng.integers(3000, 50000)))).astype(np.uint8)
        i = int(rng.integers(0, len(c) - 20))
        c[i : i + 8] = np.frombuffer(b"attack1 ", np.uint8)
        blocks.append(c.tobytes())
    mesh = make_mesh(8)
    single = hs.scan_batch(db, blocks)
    sharded = hs.scan_batch(db, blocks, mesh=mesh)
    assert all(sorted(a) == sorted(b) for a, b in zip(single, sharded))
    assert sum(len(x) for x in single) >= 19


def test_sharded_arbitrary_mesh_and_bucket_boundaries():
    """Two regressions in one: (1) user meshes with any axis names/rank
    flatten to the internal shard axis rather than failing shard_map
    spec checks; (2) per-shard row packing follows corpus_to_rows'
    jit-shape bucketing, so blocks whose padded row count exceeds the
    raw cell count (e.g. 131072 B straddling a bucket edge) still fit
    the shared buffer."""
    import jax
    from jax.sharding import Mesh

    db = hs.compile_multi([r"foo\d+", r"\bbar", r"mark(ab|cd)*end"],
                          ids=[1, 2, 3])
    rng = np.random.default_rng(7)
    sizes = [100, 5000, 120000, 999, 1, 70000, 131072, 42]
    blocks = [
        (32 + rng.integers(0, 95, size=s)).astype(np.uint8).tobytes()
        + b" foo77 bar markcdabend"
        for s in sizes
    ]
    ref = [sorted(hs.scan(db, b)) for b in blocks]
    devs = np.array(jax.devices())
    for shape, names in [((8,), ("d",)), ((2, 4), ("x", "y"))]:
        mesh = Mesh(devs.reshape(shape), names)
        got = hs.scan_batch(db, blocks, mesh=mesh)
        assert [sorted(r) for r in got] == ref
    assert sum(len(r) for r in ref) >= 3 * len(blocks)


def test_sharded_scan_streams():
    """scan_streams(mesh=...) shards streams data-parallel and must
    reproduce single-device results exactly, including chain role state
    carried across writes (SURVEY §2.11 stream sharding)."""
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.parallel.sharded import make_mesh

    pats = ["attack" + str(i) for i in range(30)] + [r"foo.*bar"]
    sdb = hs.compile_multi(pats, ids=list(range(31)), mode=hs.HS_MODE_STREAM)
    rng = np.random.default_rng(5)
    mesh = make_mesh(8)
    S = 11
    writes = []
    for r in range(3):
        ws = []
        for s in range(S):
            c = (32 + rng.integers(0, 95, size=10_000)).astype(np.uint8)
            if (r + s) % 3 == 0:
                c[50:58] = np.frombuffer(b"attack7 ", np.uint8)
            if s == 2 and r == 0:
                c[100:103] = np.frombuffer(b"foo", np.uint8)
            if s == 2 and r == 2:
                c[200:203] = np.frombuffer(b"bar", np.uint8)
            ws.append(c.tobytes())
        writes.append(ws)

    def run(mesh_arg):
        sts = [hs.open_stream(sdb) for _ in range(S)]
        out = [[] for _ in range(S)]
        for w in writes:
            for i, o in enumerate(
                hs.scan_streams(sdb, sts, w, mesh=mesh_arg)
            ):
                out[i] += o
        for i, st in enumerate(sts):
            out[i] += hs.close_stream(st)
        return out

    single = run(None)
    sharded = run(mesh)
    assert all(sorted(a) == sorted(b) for a, b in zip(single, sharded))
    assert sum(len(x) for x in single) >= 8


def test_prefilter_gating_correctness_and_block_subset(monkeypatch):
    """A pattern too big for the chain machinery (here: an infix beyond
    MAX_INFIX_POSITIONS) routes to a general engine but keeps its
    literal factors as a block prefilter: matches are exact, and the
    engine scans ONLY blocks where a mandatory factor hit (reference:
    the Rose literal cut feeding arbitrary engines, ng_violet.cpp)."""
    import numpy as np

    import hyperscan_tpu as hs
    from hyperscan_tpu.grey import Grey
    from hyperscan_tpu.database import compile_patterns
    from hyperscan_tpu.runtime import scan as scan_mod

    alts = "|".join(f"token{i:03d}" for i in range(80))  # >510 positions
    pat = f"headmagic({alts})*tailmagic"
    db = compile_patterns(
        [pat, "plainword1"], ids=[1, 2],
        grey=Grey(host_scan_limit=1 << 10))
    assert db.engines, "monster infix must route to a general engine"
    assert db.lit is not None
    assert any(k == "pre" for refs in db.lit.factor_refs
               for (_e, _a, _b, k) in refs)

    seen = []
    import hyperscan_tpu.ops.dfa_kernel as dk
    import hyperscan_tpu.ops.nfa_kernel as nk

    def make_spy(orig):
        def spy(engine, blocks, *a, **kw):
            seen.append([len(b) for b in blocks])
            return orig(engine, blocks, *a, **kw)
        return spy

    orig_host = scan_mod._host_engine_scan

    def spy_host(engines, blocks, per_block):
        seen.append([len(b) for b in blocks])
        return orig_host(engines, blocks, per_block)

    monkeypatch.setattr(scan_mod, "_host_engine_scan", spy_host)
    for mod, name in ((dk, "dfa_scan_corpus_device"),
                      (dk, "dfa_scan_corpus_device_speculative"),
                      (dk, "nfa_scan_corpus_device_speculative"),
                      (nk, "nfa_scan_corpus_device")):
        monkeypatch.setattr(mod, name, make_spy(getattr(mod, name)))

    filler = b"." * 3000
    hit = (b"." * 500 + b"headmagictoken007token042tailmagic" + b"." * 466)
    plain = b"." * 1000 + b"plainword1" + b"." * 990
    blocks = [filler, hit, filler, plain, filler + b"."]
    out = hs.scan_batch(db, blocks)
    assert [(m[0], m[1], m[2]) for m in out[1]] == [(1, 0, 534)]
    assert [(m[0], m[1], m[2]) for m in out[3]] == [(2, 0, 1010)]
    assert out[0] == out[2] == out[4] == []
    # the general engine saw ONLY the factor-hit block
    assert seen, "expected an engine scan"
    assert all(lens == [len(hit)] for lens in seen), seen


def test_prefilter_gated_engine_eod_and_boundaries():
    """Gated patterns with EOD-anchored accepts still report: the
    factor hit flags the block, the engine then sees the block end."""
    import hyperscan_tpu as hs
    from hyperscan_tpu.grey import Grey
    from hyperscan_tpu.database import compile_patterns

    alts = "|".join(f"tok{i:03d}x" for i in range(80))
    pat = f"needleA({alts})*finZ$"
    db = compile_patterns([pat], ids=[9],
                          grey=Grey(host_scan_limit=1 << 10))
    assert db.engines and db.lit is not None
    data = b"." * 2000 + b"needleAtok004xtok071xfinZ"
    assert [(m[0], m[2]) for m in hs.scan(db, data)] == [(9, len(data))]
    assert hs.scan(db, data + b"!") == []
