"""Device-batched streaming throughput experiment (StreamSet bulk path).

Measures aggregate streaming GB/s on the 10k-pattern ruleset at several
stream counts: S streams x W-byte writes per round, extents (history +
chunk) generated ON DEVICE from a formula mirrored in numpy (the dev
tunnel cannot upload per-write corpora; production NICs DMA them to HBM),
rounds pipelined through streamset_write_start / teddy_confirm_fetch_many
/ streamset_write_finish with full per-write semantics (history stitching,
boundary dedupe, carried offsets).

Usage: python tools_bench_stream.py [S ...]   (default: 16 256 1024 4096)
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import _patterns  # noqa: E402

import hyperscan_tpu as hs  # noqa: E402
from hyperscan_tpu.ops.teddy import (  # noqa: E402
    ROWS_PER_CELL,
    corpus_to_rows,
    teddy_confirm_fetch_many,
)
from hyperscan_tpu.runtime.stream import history_required  # noqa: E402
from hyperscan_tpu.runtime.streamset import (  # noqa: E402
    open_streamset,
    streamset_write_finish,
    streamset_write_start,
)

W = 8192  # bytes per write per stream
PLANT = b"attack0 "
PERIOD = 1 << 17  # one planted match per 128 KiB per stream

_T0 = time.perf_counter()


def _phase(msg: str) -> None:
    print(f"[stream +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _formula(si, t):
    """Shared corpus formula: printable byte for stream si at absolute
    offset t, with PLANT spliced every PERIOD bytes (stream-staggered)."""
    xp = jnp if not isinstance(si, np.ndarray) else np
    u32 = xp.uint32
    # multiply-mix the combined index (same recipe as bench.py gen_rows:
    # adjacent offsets decorrelate in the high bits)
    v = ((si.astype(u32) * u32(1_000_003) + t.astype(u32))
         * u32(2654435761))
    b = (32 + ((v >> 16) % 95)).astype(xp.uint8)
    ph = (t - si * 131) & (PERIOD - 1)  # two's-complement mod 2^k
    plant = (np.frombuffer(PLANT, np.uint8) if xp is np
             else jnp.asarray(np.frombuffer(PLANT, np.uint8)))
    pb = xp.take(plant, xp.minimum(ph, 7).astype(xp.int32))
    return xp.where(ph < len(PLANT), pb, b)


def _make_gen(S: int, ext_len: int, h: int):
    """jitted device generator of one round's extent rows."""
    n = S * ext_len
    cell = ROWS_PER_CELL * 128
    n_cells = -(-n // cell)
    n_rows = 1 + n_cells * ROWS_PER_CELL

    @jax.jit
    def gen(r):
        row = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 1)
        g = (row - 1) * 128 + lane
        si = g // ext_len
        t = r * W - h + (g - si * ext_len)
        b = _formula(si, t)
        valid = (g >= 0) & (g < n) & (t >= 0)
        return jnp.where(valid, b, 0)

    return gen, n_cells


def _gen_host(S: int, ext_len: int, h: int, r: int) -> np.ndarray:
    g = np.arange(S * ext_len, dtype=np.int32)
    si = g // ext_len
    t = r * W - h + (g - si * ext_len)
    return _formula(si, t)


def run_config(db, S: int, rounds: int):
    hreq = history_required(db)
    ext_len = hreq + W
    _phase(f"S={S}: gen {rounds + 2} rounds (ext {S * ext_len >> 10} KiB)")

    gen, _ = _make_gen(S, ext_len, hreq)
    gen0, _ = _make_gen(S, W, 0)  # round 0: no history yet
    rows = {0: gen0(jnp.int32(0))}
    for r in range(1, rounds + 2):
        rows[r] = gen(jnp.int32(r))
    for r in rows:
        int(rows[r][1, 0])  # force materialization
    host = {0: _gen_host(S, W, 0, 0)}
    for r in range(1, rounds + 2):
        host[r] = _gen_host(S, ext_len, hreq, r)

    zl = np.zeros(S, dtype=np.int64)
    wl = np.full(S, W, dtype=np.int64)
    hl = np.full(S, hreq, dtype=np.int64)

    def one_pass(tag: str):
        ss = open_streamset(db, S)
        h0 = streamset_write_start(db, ss, ext_np=host[0], ext_rows=rows[0],
                                   hlens=zl, chunk_lens=wl)
        streamset_write_finish(db, ss, h0)
        h1 = streamset_write_start(db, ss, ext_np=host[1], ext_rows=rows[1],
                                   hlens=hl, chunk_lens=wl)
        streamset_write_finish(db, ss, h1)
        t0 = time.perf_counter()
        handles = [
            streamset_write_start(db, ss, ext_np=host[r], ext_rows=rows[r],
                                  hlens=hl, chunk_lens=wl)
            for r in range(2, rounds + 2)
        ]
        t_start = time.perf_counter() - t0
        gots = teddy_confirm_fetch_many([hh.dev_handle for hh in handles])
        t_fetch = time.perf_counter() - t0
        nm = 0
        for k, hh in enumerate(handles):
            nm += sum(
                len(m)
                for m in streamset_write_finish(db, ss, hh, got=gots[k]))
        dt = time.perf_counter() - t0
        _phase(f"S={S} {tag}: start {t_start:.3f}s fetch {t_fetch:.3f}s "
               f"total {dt:.3f}s matches {nm}")
        return dt, nm

    # the dev tunnel adds large run-to-run variance (client polling
    # threads steal CPU); best-of-3 passes isolates the pipeline's cost.
    # Two warm passes: the first observes the candidate load (capacity
    # learning re-sizes the jit shapes), the second compiles/loads the
    # learned shapes so timed passes run entirely warm.
    # Freeze the long-lived heap (database tables, generated corpora)
    # out of the cyclic GC's scanned set: gen-2 collections otherwise
    # scan the multi-hundred-thousand-object compile graph once every
    # few rounds — measured 145 ms pauses that turned 16384 streams
    # from 3.9 into 1.7 GB/s aggregate (the reference hsbench is C++
    # and pays no such tax; freezing after setup is the honest
    # equivalent methodology).
    import gc

    gc.collect()
    gc.freeze()
    _phase(f"S={S}: 2 warm + 3 passes x {rounds} rounds")
    one_pass("warm0")
    one_pass("warm1")
    results = [one_pass(f"pass{k}") for k in range(3)]
    dt, nm = min(results)
    vol = S * W * rounds
    exp = vol / PERIOD
    assert nm >= 0.5 * exp, (nm, exp)
    return vol / dt / 1e9, nm


def main() -> None:
    svals = [int(a) for a in sys.argv[1:]] or [16, 256, 1024, 4096]
    _phase("compile 10k ruleset")
    pats, ids = _patterns(10_000)
    from hyperscan_tpu.database import compile_patterns

    db = compile_patterns(pats, ids=ids, mode=hs.HS_MODE_STREAM)
    results = {}
    for S in svals:
        rounds = max(6, min(24, (128 << 20) // (S * W)))
        gbps, nm = run_config(db, S, rounds)
        results[S] = gbps
        print(f"S={S:5d}: {gbps:.3f} GB/s aggregate ({nm} matches)",
              flush=True)
    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
