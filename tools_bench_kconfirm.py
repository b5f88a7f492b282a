"""Device microbench: in-kernel confirm vs XLA confirm (iid corpus).

Measures the fused filter + confirm end-to-end on the real TPU at the
bench's 10k ruleset and iid printable-noise corpus — the adversarial
candidate-rate case where the XLA confirm's per-take costs dominated
round 4 (BASELINE.md cost model: ~35 takes x 262144 slots ~ 150 ms of
the 200 ms scan).

Usage: python tools_bench_kconfirm.py [--mb 512] [--iters 3] [--xla]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--xla", action="store_true",
                    help="force the XLA confirm family instead")
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--kind", default="iid")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    import jax.numpy as jnp

    import hyperscan_tpu as hs
    from bench import _patterns, _plant_region
    from hyperscan_tpu.ops.teddy import (
        ROWS_PER_CELL,
        teddy_confirm_fetch_many,
        teddy_confirm_finish,
        teddy_confirm_start,
    )

    t0 = time.perf_counter()
    pats, ids = _patterns(args.n)
    db = hs.compile_multi(pats, ids=ids)
    lit = db.lit
    lit._kconfirm_off = bool(args.xla)
    print(f"[{time.perf_counter()-t0:6.1f}s] compiled {args.n} patterns",
          flush=True)

    n = args.mb << 20
    cell = ROWS_PER_CELL * 128
    n_cells = -(-n // cell)
    n_rows = 1 + n_cells * ROWS_PER_CELL
    plants_d = jnp.asarray(_plant_region().reshape(32, 128))

    @jax.jit
    def gen_rows(salt):
        r = jax.lax.broadcasted_iota(jnp.uint32, (n_rows, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (n_rows, 128), 1)
        g = (r - 1) * 128 + lane
        v = (g + salt * jnp.uint32(1_000_003)) * jnp.uint32(2654435761)
        if args.kind == "iid":
            v = v ^ (v >> 15)
            v = v * jnp.uint32(2246822519)
        b = (32 + ((v >> 16) % 95)).astype(jnp.uint8)
        b = jnp.where(r == 0, 0, b)
        return b.at[2:34, :].set(plants_d)

    corpora = []
    for s in range(args.iters + 2):
        c = gen_rows(jnp.uint32(s))
        corpora.append(c)
    int(corpora[-1][5, 5])  # force completion (block_until_ready lies
    # through the tunnel)
    print(f"[{time.perf_counter()-t0:6.1f}s] corpora on device", flush=True)

    # warmups: first learns capacities (one recompile), second runs the
    # learned shape
    for w in range(2):
        h = teddy_confirm_start(corpora[w], lit, n)
        f, p = teddy_confirm_finish(h)
        print(f"[{time.perf_counter()-t0:6.1f}s] warm{w}: family="
              f"{'kconf' if h[8] else ('gated' if h[7] else 'xla')} "
              f"pairs={len(f)}", flush=True)

    t1 = time.perf_counter()
    handles = [
        teddy_confirm_start(corpora[2 + (s % args.iters)], lit, n)
        for s in range(args.iters)
    ]
    gots = teddy_confirm_fetch_many(handles)
    npairs = 0
    for h, g in zip(handles, gots):
        f, p = teddy_confirm_finish(h, got=g)
        npairs += len(f)
    dt = time.perf_counter() - t1
    gbs = args.mb / 1024 * args.iters / dt
    print(f"[{time.perf_counter()-t0:6.1f}s] timed: {dt:.3f}s for "
          f"{args.iters} x {args.mb} MB -> {gbs:.2f} GB/s "
          f"({npairs} pairs)", flush=True)


if __name__ == "__main__":
    main()
