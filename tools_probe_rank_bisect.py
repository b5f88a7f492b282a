"""Dev probe: bisect the in-kernel epilogue cost op-group by op-group.

Variants (cumulative):
  0 filter only, plane out (baseline D)
  1 + candidate count (plane reduce)
  2 + lanepre matmul (within-row ranks)
  3 + chunked row prefix + oh/rowpre/lane_j (full _rank_select)
  4 + stage-0 output assembly (both outputs, _early)
  5 + tail extraction (stage 1)
  6 full epilogue (stage 3)

Usage: python tools_probe_rank_bisect.py [--mb 512] [--variants 0,1,2,3,4]
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
    ap.add_argument("--variants", default="0,1,2,3,4")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import hyperscan_tpu as hs
    from bench import _patterns, _plant_region
    from hyperscan_tpu.ops import teddy as T

    t0 = time.perf_counter()
    pats, ids = _patterns(10000)
    db = hs.compile_multi(pats, ids=ids)
    lit = db.lit
    print(f"[{time.perf_counter()-t0:6.1f}s] compiled", flush=True)

    n = args.mb << 20
    R = T.ROWS_PER_CELL
    n_cells = -(-n // (R * 128))
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

    for w in range(2):
        h = T.teddy_confirm_start(corpora[0], lit, n)
        T.teddy_confirm_finish(h)
    ftabs, h_tables, f_tables = T.dev_filter_tables(lit)
    M, W = int(lit.masks.shape[0]), int(lit.masks.shape[1])
    use_classes = len(ftabs) == 2
    hi_cls = T._hi_class(lit) if use_classes else -1
    mean = lit._kc_mean
    capc = min(T.KCONF_MAX_CAPC, max(32, T._p2(int(2.2 * mean) + 1)))
    print(f"capc={capc} mean={mean:.1f} M={M} W={W} cls={use_classes}",
          flush=True)
    tri_c, eye_c, eye_1 = T._rank_consts(capc)
    consts = (jnp.asarray(tri_c, dtype=jnp.bfloat16),
              jnp.asarray(eye_c), jnp.asarray(eye_1))

    def make_kernel(variant):
        def kernel(halo_ref, body_ref, b2c_ref, cmasks_ref,
                   tri_ref, eyec_ref, eye1_ref, out_c, plane_c):
            data = jnp.concatenate(
                [halo_ref[0:1, :], body_ref[...]], axis=0
            ).astype(jnp.int32)
            cls = T._remap_classes(data, b2c_ref, hi_cls)
            lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
            acc = [None] * W
            for m in range(M):
                if m == 0:
                    cm = cls[1:, :]
                else:
                    r = pltpu.roll(cls, m, axis=1)
                    cm = jnp.where(lane >= m, r[1:, :], r[:-1, :])
                for w in range(W):
                    tab = jnp.broadcast_to(
                        cmasks_ref[m, w, :][None, :], cm.shape)
                    v = jnp.take_along_axis(tab, cm, axis=1)
                    acc[w] = v if acc[w] is None else (acc[w] & v)
            cand_or = acc[0]
            for w in range(1, W):
                cand_or = cand_or | acc[w]
            plane_c[...] = (cand_or != 0).astype(jnp.uint8)
            zeros7 = jnp.zeros((7, 128), jnp.int32)
            lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            if variant == 1:
                cnt = jnp.sum((cand_or != 0).astype(jnp.int32))
                out_c[...] = jnp.concatenate(
                    [jnp.where(lane0 == 0, cnt, 0), zeros7], axis=0)
                return
            nzb = (cand_or != 0).astype(jnp.bfloat16)
            tri_l = tri_ref[...].astype(jnp.bfloat16)
            lanepre = jax.lax.dot_general(
                nzb, tri_l, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if variant == 2:
                cnt = jnp.sum(lanepre[:, 127:128]).astype(jnp.int32)
                out_c[...] = jnp.concatenate(
                    [jnp.where(lane0 == 0, cnt, 0), zeros7], axis=0)
                return
            count, pos_f = T._rank_select(cand_or, R, capc, tri_ref)
            if variant == 3:
                cnt = (count.astype(jnp.int32)
                       + jnp.max(pos_f).astype(jnp.int32))
                out_c[...] = jnp.concatenate(
                    [jnp.where(lane0 == 0, cnt, 0), zeros7], axis=0)
                return
            # variant 4: stage-0 _early equivalent
            cr = jnp.where(lane0 == 0, count.astype(jnp.int32),
                           jnp.where(lane0 == 1,
                                     jnp.max(pos_f).astype(jnp.int32), 0))
            out_c[...] = jnp.concatenate([cr, zeros7], axis=0)
        return kernel

    in_specs = [
        pl.BlockSpec((8, 128), lambda i: (i * (R // 8), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((M, W, 128), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((capc, capc), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]

    def build(variant):
        kern = make_kernel(variant)

        @jax.jit
        def run(rows_all):
            body = rows_all[1:]
            out, plane = pl.pallas_call(
                kern,
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
            )(rows_all, body, *ftabs, *consts)
            return jnp.sum(out[:, 0]) + plane[0, 0].astype(jnp.int32)
        return run

    for v in [int(x) for x in args.variants.split(",") if x != ""]:
        if v == 0:
            continue
        fn = build(v)
        r = fn(corpora[0])
        int(r)
        t1 = time.perf_counter()
        for s in range(1, args.reps + 1):
            int(fn(corpora[s % len(corpora)]))
        dt = (time.perf_counter() - t1) / args.reps
        print(f"[{time.perf_counter()-t0:6.1f}s] V{v}: {dt*1e3:.1f} ms "
              f"-> {args.mb/1024/dt:.2f} GB/s", flush=True)


if __name__ == "__main__":
    main()
