"""Dev probe: where does the iid 512 MB kconfirm scan spend its time?

Builds three instrumented jits around the SAME pallas kernel the kconf
family uses (A: kernel only, B: kernel + kconf_combine, D: bare filter
kernel without the confirm epilogue) and rep-slope times them against
the known e2e (teddy_confirm_start). Checksums keep fetches tiny.

Usage: python tools_probe_kconf_split.py [--mb 512] [--reps 3]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import hyperscan_tpu as hs
    from bench import _patterns, _plant_region
    from hyperscan_tpu.ops import teddy as T
    from hyperscan_tpu.runtime.lit_runtime import confirm_device_tables

    t0 = time.perf_counter()
    pats, ids = _patterns(10000)
    db = hs.compile_multi(pats, ids=ids)
    lit = db.lit
    print(f"[{time.perf_counter()-t0:6.1f}s] compiled", flush=True)

    n = args.mb << 20
    R = T.ROWS_PER_CELL
    cell = R * 128
    n_cells = -(-n // cell)
    n_rows = 1 + n_cells * R
    plants_d = jnp.asarray(_plant_region().reshape(32, 128))

    @jax.jit
    def gen_rows(salt):
        r = jax.lax.broadcasted_iota(jnp.uint32, (n_rows, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (n_rows, 128), 1)
        g = (r - 1) * 128 + lane
        v = (g + salt * jnp.uint32(1_000_003)) * jnp.uint32(2654435761)
        v = v ^ (v >> 15)
        v = v * jnp.uint32(2246822519)
        b = (32 + ((v >> 16) % 95)).astype(jnp.uint8)
        b = jnp.where(r == 0, 0, b)
        return b.at[2:34, :].set(plants_d)

    corpora = [gen_rows(jnp.uint32(s)) for s in range(args.reps + 1)]
    int(corpora[-1][5, 5])
    print(f"[{time.perf_counter()-t0:6.1f}s] corpora", flush=True)

    # learn caps / engage kconf
    for w in range(2):
        h = T.teddy_confirm_start(corpora[0], lit, n)
        T.teddy_confirm_finish(h)
        print(f"[{time.perf_counter()-t0:6.1f}s] warm{w} family="
              f"{'kconf' if h[8] else ('gated' if h[7] else 'xla')}",
              flush=True)
    assert getattr(lit, "_kc_mean", 0) >= T.KCONF_MIN_MEAN

    # mirror teddy_confirm_start's kconf-family shape computation
    ftabs, h_tables, f_tables = T.dev_filter_tables(lit)
    M, W = int(lit.masks.shape[0]), int(lit.masks.shape[1])
    use_classes = len(ftabs) == 2
    hi_cls = T._hi_class(lit) if use_classes else -1
    caps = T._caps_for(lit, 1 << 14)
    mean = lit._kc_mean
    capc = min(T.KCONF_MAX_CAPC, max(32, T._p2(int(2.2 * mean) + 1)))
    capc = min(T.KCONF_MAX_CAPC,
               max(capc, getattr(lit, "_kc_force_capc", 0)))
    cap1, _, cap2, _ = caps
    groups = confirm_device_tables(lit)
    kconf_meta, planes, slots_cls = T.dev_confirm_planes(lit)
    import os
    if os.environ.get("HS_PROBE_DUMMY_TABLES"):
        # discriminator for per-cell table re-DMA: tiny planes, same
        # count — only valid with teddy._KCONF_STAGE <= 1 (set the
        # module attr before the first kernel build; contents unread)
        planes = tuple(jnp.zeros((8, 128), p.dtype) for p in planes)
    print(f"caps={caps} capc={capc} mean={mean:.1f} "
          f"tabMB={sum(int(np.prod(p.shape)) for p in planes)*2/1e6:.2f}",
          flush=True)

    kernel = (T._make_kernel_fused_classes(M, W, R, hi_cls, capc,
                                           kconf_meta)
              if use_classes else
              T._make_kernel_fused(M, W, R, capc, kconf_meta))
    if use_classes:
        tab_specs = [
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, W, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        tab_specs = [pl.BlockSpec((M, W, 256), lambda i: (0, 0, 0),
                                  memory_space=pltpu.VMEM)]
    tri_c, eye_cc, eye_1c = T._rank_consts(capc)
    planes = (jnp.asarray(tri_c, dtype=jnp.bfloat16),
              jnp.asarray(eye_cc), jnp.asarray(eye_1c)) + tuple(planes)
    for p in planes:
        tab_specs.append(pl.BlockSpec(tuple(p.shape), (lambda i: (0, 0)),
                                      memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((8, 128), lambda i: (i * (R // 8), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + tab_specs

    def call_kernel(rows_all):
        body = rows_all[1:]
        return pl.pallas_call(
            kernel,
            grid=(n_cells,),
            out_shape=[
                jax.ShapeDtypeStruct((n_cells * 8, 128), jnp.int32),
                jax.ShapeDtypeStruct((n_cells * R, 128), jnp.uint8),
            ],
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((8, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
        )(rows_all, body, *ftabs, *planes)

    @jax.jit
    def jit_A(rows_all):
        out, plane = call_kernel(rows_all)
        return jnp.sum(out[:, 0]) + plane[0, 0].astype(jnp.int32)

    @jax.jit
    def jit_B(rows_all, n_valid):
        out, plane = call_kernel(rows_all)
        meta, packed2 = T.kconf_combine(
            out, plane, rows_all, groups, h_tables, f_tables,
            n_cells, R, capc, cap2, n_valid, slots_cls)
        return jnp.sum(meta) + jnp.sum(packed2[:, 0])

    # D: bare filter, dense-plane output (no epilogue at all)
    kernel_d = (T._make_kernel_fused_classes(M, W, R, hi_cls)
                if use_classes else T._make_kernel_fused(M, W, R))

    @jax.jit
    def jit_D(rows_all):
        body = rows_all[1:]
        cand = pl.pallas_call(
            kernel_d,
            grid=(n_cells,),
            out_shape=jax.ShapeDtypeStruct((n_cells * R, 128), jnp.uint8),
            in_specs=in_specs[: 2 + (2 if use_classes else 1)],
            out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(rows_all, body, *ftabs)
        return cand[0, 0].astype(jnp.int32) + cand[-1, -1].astype(jnp.int32)

    def timeit(name, fn, *extra):
        # warm (compile)
        r = fn(corpora[0], *extra)
        int(r)
        t1 = time.perf_counter()
        acc = 0
        for s in range(1, args.reps + 1):
            acc += int(fn(corpora[s % len(corpora)], *extra))
        dt = (time.perf_counter() - t1) / args.reps
        print(f"[{time.perf_counter()-t0:6.1f}s] {name}: "
              f"{dt*1e3:.1f} ms/scan -> {args.mb/1024/dt:.2f} GB/s",
              flush=True)
        return dt

    timeit("D bare filter kernel  ", jit_D)
    timeit("A kconf kernel        ", jit_A)
    timeit("B kernel+combine      ", jit_B, jnp.int32(n))

    # C: e2e reference (same process, learned shapes)
    t1 = time.perf_counter()
    handles = [T.teddy_confirm_start(corpora[1 + (s % args.reps)], lit, n)
               for s in range(args.reps)]
    gots = T.teddy_confirm_fetch_many(handles)
    for h, g in zip(handles, gots):
        T.teddy_confirm_finish(h, got=g)
    dt = (time.perf_counter() - t1) / args.reps
    print(f"[{time.perf_counter()-t0:6.1f}s] C e2e                 : "
          f"{dt*1e3:.1f} ms/scan -> {args.mb/1024/dt:.2f} GB/s", flush=True)


if __name__ == "__main__":
    main()
