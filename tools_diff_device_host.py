"""Hardware-truth differential: device filter+confirm vs the pure-host
native path over the bench corpora.

The device pipeline's exactness rests on host verification of the
candidates it EMITS — a silent device-side filter miss (e.g. a numeric
issue that only manifests on real hardware, like bf16 truncation that
interpret mode hides) would not be caught by verification or by the
CPU-backed test suite. This tool compares the full verified pair sets
of the device path and the host native filter+confirm on identical
512 MB corpora (both corpus kinds), and must report zero missing and
zero extra pairs.

Measured this round: structured 28/28, iid 1375/1375, exact equality.

Usage: python tools_diff_device_host.py [--mb 512] [--n 10000]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=512)
    ap.add_argument("--n", type=int, default=10000)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    import jax.numpy as jnp

    import bench
    import hyperscan_tpu as hs
    from hyperscan_tpu.ops import teddy as T
    from hyperscan_tpu.runtime.lit_runtime import (
        confirm_candidates,
        verify_pairs,
    )
    from hyperscan_tpu.runtime.smallwrite import teddy_filter_host

    pats, ids = bench._patterns(args.n)
    db = hs.compile_multi(pats, ids=ids)
    lit = db.lit
    n = args.mb << 20
    z = np.zeros(1, np.int64)
    for kind in ("structured", "iid"):
        cell = T.ROWS_PER_CELL * 128
        n_cells = -(-n // cell)
        n_rows = 1 + n_cells * T.ROWS_PER_CELL
        plants_d = jnp.asarray(bench._plant_region().reshape(32, 128))

        @jax.jit
        def gen(salt, kind=kind, n_rows=n_rows):
            r = jax.lax.broadcasted_iota(jnp.uint32, (n_rows, 128), 0)
            lane = jax.lax.broadcasted_iota(jnp.uint32, (n_rows, 128), 1)
            g = (r - 1) * 128 + lane
            v = (g + salt * jnp.uint32(1_000_003)) * jnp.uint32(2654435761)
            if kind == "iid":
                v = v ^ (v >> 15)
                v = v * jnp.uint32(2246822519)
            b = (32 + ((v >> 16) % 95)).astype(jnp.uint8)
            b = jnp.where(r == 0, 0, b)
            return b.at[2:34, :].set(plants_d)

        rows_d = gen(jnp.uint32(1))
        int(rows_d[1, 0])
        hc = bench._gen_host(n, 1, kind)
        for _w in range(2):  # first scan learns caps/family
            h = T.teddy_confirm_start(rows_d, lit, n)
            f, p = T.teddy_confirm_finish(h)
        f, p = verify_pairs(lit, hc, z, np.asarray(f), np.asarray(p))
        dev = set(zip(f.tolist(), p.tolist()))
        pos, words = teddy_filter_host(hc, lit.masks)
        fh, ph = confirm_candidates(lit, hc, z, pos, words)
        fh, ph = verify_pairs(lit, hc, z, np.asarray(fh), np.asarray(ph))
        host = set(zip(fh.tolist(), ph.tolist()))
        missing, extra = host - dev, dev - host
        print(f"{kind}: device={len(dev)} host={len(host)} "
              f"missing={len(missing)} extra={len(extra)}", flush=True)
        assert not missing and not extra, (
            sorted(missing)[:5], sorted(extra)[:5])
    print("DEVICE==HOST differential OK")


if __name__ == "__main__":
    main()
