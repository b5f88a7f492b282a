"""Dev probe: SOM_LEFTMOST block config at 512 MB/scan vs the bench's
64 MB — is the 5.3 GB/s SOM number a corpus-size (fixed dispatch/fetch
cost) artifact?

Usage: python tools_probe_som512.py [--mb 512]
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=512)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    import jax.numpy as jnp

    import bench
    import hyperscan_tpu as hs

    g, m, c = bench.run_config(
        100, hs, jax, jnp, flags=hs.HS_FLAG_SOM_LEFTMOST,
        corpus_mb=args.mb, drop_shapes=(5,))
    print(f"SOM {args.mb} MB: {g:.2f} GB/s, {m} matches, "
          f"compile {c:.1f}s", flush=True)


if __name__ == "__main__":
    main()
