"""Per-kernel TPU microbenchmarks for BASELINE.md (not the driver bench).

Corpora are generated ON DEVICE (the dev tunnel cannot upload MBs; see
CLAUDE.md) and fed to the kernels' jitted cores directly; per-call wall
time includes dispatch + the packed-result fetch, i.e. the same
end-to-end accounting as the product scan path.
"""

import time

import numpy as np


def bench_dfa_kernel(jnp, jax, rng):
    from hyperscan_tpu.database import compile_patterns
    from hyperscan_tpu.grey import Grey
    from hyperscan_tpu.ops import dfa_kernel as DK

    db = compile_patterns(
        [r"ab[cd]{2,6}ef", r"[0-9]{3}-[0-9]{4}", r"GET /[a-z]{1,12} "],
        grey=Grey(allow_teddy=False),
    )
    eng = db.engines[0]
    H, CS = DK.chunk_shape(eng)
    trans_rows, b2c_rows, accept_rows, C = DK.pack_tables(eng)
    Wt, Wa = trans_rows.shape[0], accept_rows.shape[0]
    G = DK.GROUP_ROWS

    for n_mb in (32, 64):
        n = n_mb << 20
        nch = -(-n // CS)
        nrows = -(-nch // 128)
        ngroups = max(1, -(-nrows // G))
        nrows_pad = ngroups * G
        ncap = nrows_pad * 128
        n_tb = (H + CS) // DK.T_BLOCK

        @jax.jit
        def make_xe(salt):
            i = jnp.arange(ncap * CS, dtype=jnp.uint32)
            v = (i + salt * jnp.uint32(7919)) * jnp.uint32(2654435761)
            flat = (32 + ((v >> 16) % 95)).astype(jnp.uint8)
            flat = jnp.where(i < n, flat, 0)
            rows = flat.reshape(ncap, CS)
            shifted = jnp.concatenate(
                [jnp.zeros(H, jnp.uint8), flat]
            )[: ncap * CS]
            halos = shifted.reshape(ncap, CS)[:, :H]
            ext = jnp.concatenate([halos, rows], axis=1)
            return ext.T.reshape(H + CS, nrows_pad, 128)

        vfrom = np.zeros(ncap, np.int32)
        vfrom[0] = H
        vto = np.zeros(ncap, np.int32)
        vto[:nch] = H + CS
        vto[nch - 1] = H + (n - (nch - 1) * CS)  # partial last chunk
        init = np.full(ncap, eng.float_state, np.int32)
        init[0] = eng.start_state
        run = DK._jit_scan(Wt, Wa, C, H, ngroups, n_tb, 1 << 16,
                           max(64, (1 << 16) // 16), False)
        args = (
            jnp.asarray(trans_rows), jnp.asarray(b2c_rows),
            jnp.asarray(accept_rows),
            jnp.asarray(init.reshape(nrows_pad, 128)),
            jnp.asarray(vfrom.reshape(nrows_pad, 128)),
            jnp.asarray(vto.reshape(nrows_pad, 128)),
        )
        xe = make_xe(jnp.uint32(0))
        meta, packed, fin = run(xe, *args, jnp.int32(xe.size))
        _ = np.asarray(meta)  # warm + force
        t0 = time.perf_counter()
        xe = make_xe(jnp.uint32(1))
        meta, packed, fin = run(xe, *args, jnp.int32(xe.size))
        total = int(np.asarray(meta)[0])
        dt = time.perf_counter() - t0
        print(f"dfa chunk-halo kernel: {n_mb} MB in {dt:.3f}s = "
              f"{n / dt / 1e9:.2f} GB/s ({total} accepts)", flush=True)


def bench_spec_kernel(jnp, jax, rng):
    """Speculative no-halo chunk kernel for unbounded-depth engines
    (dfa_scan_corpus_device_speculative's device pass; host fixup cost is
    data-dependent and ~zero on random corpora)."""
    from hyperscan_tpu.database import compile_patterns
    from hyperscan_tpu.grey import Grey
    from hyperscan_tpu.ops import dfa_kernel as DK

    db = compile_patterns(
        [r"\d+[a-z]{3,}\d+"], flags=[2],  # DOTALL
        grey=Grey(allow_teddy=False),
    )
    eng = db.engines[0]
    assert eng.max_depth is None
    H, CS = 0, DK.SPEC_CS
    trans_rows, b2c_rows, accept_rows, C = DK.pack_tables(eng)
    Wt, Wa = trans_rows.shape[0], accept_rows.shape[0]
    G = DK.GROUP_ROWS

    for n_mb in (32, 64):
        n = n_mb << 20
        nch = -(-n // CS)
        nrows = -(-nch // 128)
        ngroups = max(1, -(-nrows // G))
        nrows_pad = ngroups * G
        ncap = nrows_pad * 128
        n_tb = (H + CS) // DK.T_BLOCK

        @jax.jit
        def make_xe(salt):
            i = jnp.arange(ncap * CS, dtype=jnp.uint32)
            v = (i + salt * jnp.uint32(7919)) * jnp.uint32(2654435761)
            flat = (32 + ((v >> 16) % 95)).astype(jnp.uint8)
            flat = jnp.where(i < n, flat, 0)
            return flat.reshape(ncap, CS).T.reshape(CS, nrows_pad, 128)

        vfrom = np.zeros(ncap, np.int32)
        vto = np.zeros(ncap, np.int32)
        vto[:nch] = CS
        vto[nch - 1] = n - (nch - 1) * CS
        init = np.full(ncap, eng.float_state, np.int32)
        init[0] = eng.start_state
        run = DK._jit_scan(Wt, Wa, C, H, ngroups, n_tb, 1 << 16,
                           max(64, (1 << 16) // 16), False)
        args = (
            jnp.asarray(trans_rows), jnp.asarray(b2c_rows),
            jnp.asarray(accept_rows),
            jnp.asarray(init.reshape(nrows_pad, 128)),
            jnp.asarray(vfrom.reshape(nrows_pad, 128)),
            jnp.asarray(vto.reshape(nrows_pad, 128)),
        )
        xe = make_xe(jnp.uint32(0))
        meta, packed, fin = run(xe, *args, jnp.int32(xe.size))
        _ = np.asarray(meta)  # warm + force
        t0 = time.perf_counter()
        xe = make_xe(jnp.uint32(1))
        meta, packed, fin = run(xe, *args, jnp.int32(xe.size))
        total = int(np.asarray(meta)[0])
        dt = time.perf_counter() - t0
        print(f"dfa speculative kernel (H=0): {n_mb} MB in {dt:.3f}s = "
              f"{n / dt / 1e9:.2f} GB/s ({total} accepts)", flush=True)


def bench_nfa_spec_kernel(jnp, jax, rng):
    """Speculative device scan for a CYCLIC bit-NFA engine via its
    lazy-DFA core (the class that previously only had the ~161 MB/s host
    word-packed loop). Device pass only; host fixup is data-dependent
    and ~zero when speculation holds on random corpora."""
    from hyperscan_tpu.database import NfaEngine, compile_patterns
    from hyperscan_tpu.grey import Grey
    from hyperscan_tpu.ops import dfa_kernel as DK

    db = compile_patterns(
        [r"(ax|by|cz|dw)+[!]"],
        grey=Grey(max_dfa_states=8, allow_teddy=False),
    )
    eng = next(e for e in db.engines if isinstance(e, NfaEngine))
    assert not eng.acyclic and eng.spec_dfa is not None
    d = eng.spec_dfa
    H, CS = 0, DK.SPEC_CS
    trans_rows, b2c_rows, accept_rows, C = DK.pack_tables(d)
    Wt, Wa = trans_rows.shape[0], accept_rows.shape[0]
    G = DK.GROUP_ROWS

    for n_mb in (32, 64):
        n = n_mb << 20
        nch = -(-n // CS)
        nrows = -(-nch // 128)
        ngroups = max(1, -(-nrows // G))
        nrows_pad = ngroups * G
        ncap = nrows_pad * 128
        n_tb = (H + CS) // DK.T_BLOCK

        @jax.jit
        def make_xe(salt):
            i = jnp.arange(ncap * CS, dtype=jnp.uint32)
            v = (i + salt * jnp.uint32(7919)) * jnp.uint32(2654435761)
            flat = (32 + ((v >> 16) % 95)).astype(jnp.uint8)
            flat = jnp.where(i < n, flat, 0)
            return flat.reshape(ncap, CS).T.reshape(CS, nrows_pad, 128)

        vfrom = np.zeros(ncap, np.int32)
        vto = np.zeros(ncap, np.int32)
        vto[:nch] = CS
        vto[nch - 1] = n - (nch - 1) * CS
        init = np.full(ncap, d.float_state, np.int32)
        init[0] = d.start_state
        run = DK._jit_scan(Wt, Wa, C, H, ngroups, n_tb, 1 << 16,
                           max(64, (1 << 16) // 16), False)
        args = (
            jnp.asarray(trans_rows), jnp.asarray(b2c_rows),
            jnp.asarray(accept_rows),
            jnp.asarray(init.reshape(nrows_pad, 128)),
            jnp.asarray(vfrom.reshape(nrows_pad, 128)),
            jnp.asarray(vto.reshape(nrows_pad, 128)),
        )
        xe = make_xe(jnp.uint32(0))
        meta, packed, fin = run(xe, *args, jnp.int32(xe.size))
        _ = np.asarray(meta)  # warm + force
        t0 = time.perf_counter()
        xe = make_xe(jnp.uint32(1))
        meta, packed, fin = run(xe, *args, jnp.int32(xe.size))
        total = int(np.asarray(meta)[0])
        dt = time.perf_counter() - t0
        print(f"cyclic bit-NFA spec kernel (lazy-DFA core): {n_mb} MB in "
              f"{dt:.3f}s = {n / dt / 1e9:.2f} GB/s ({total} accepts)",
              flush=True)


def bench_nfa_kernel(jnp, jax, rng):
    import hyperscan_tpu as hs
    from hyperscan_tpu.database import NfaEngine
    from hyperscan_tpu.ops import nfa_kernel as NK

    db = hs.compile_multi([r".*a.{18}b"])
    eng = next(e for e in db.engines if isinstance(e, NfaEngine))
    D = NK._halo(eng)
    TB = NK.TILE_BODY
    NE = D + TB

    for n_mb in (32, 64):
        n = n_mb << 20
        ntiles = -(-n // TB)
        npad = ntiles * TB

        @jax.jit
        def make_tiles(salt):
            i = jnp.arange(npad, dtype=jnp.uint32)
            v = (i + salt * jnp.uint32(7919)) * jnp.uint32(2654435761)
            # alphabet biased to produce some accepts
            flat = jnp.take(
                jnp.asarray(np.frombuffer(b"aabxyzjkqrstuvwce", np.uint8)),
                (v >> 16) % 17,
            )
            flat = jnp.where(i < n, flat, 0)
            # x[k] = ext[k*TB : k*TB + NE] as two reshaped pieces:
            # cols [0, TB) then [TB, TB+D); tail zero-pad keeps the
            # second piece in range (TB > D)
            ext = jnp.concatenate(
                [jnp.zeros(D, jnp.uint8), flat, jnp.zeros(TB, jnp.uint8)]
            )
            p1 = ext[: ntiles * TB].reshape(ntiles, TB)
            p2 = ext[TB : TB + ntiles * TB].reshape(ntiles, TB)[:, :D]
            x = jnp.concatenate([p1, p2], axis=1)
            v1 = jnp.concatenate(
                [jnp.zeros(D, bool), jnp.arange(npad) < n,
                 jnp.zeros(TB, bool)]
            )
            q1 = v1[: ntiles * TB].reshape(ntiles, TB)
            q2 = v1[TB : TB + ntiles * TB].reshape(ntiles, TB)[:, :D]
            vx = jnp.concatenate([q1, q2], axis=1)
            return x, vx

        key = NK._engine_key(eng)
        cap = 1 << 16
        runf = NK._jit_group(key, ntiles, NE, 1, cap, max(64, cap // 16))
        anch = np.zeros((ntiles, NE), bool)
        eod_idx = np.full(1, -1, np.int64)
        x, vx = make_tiles(jnp.uint32(0))
        meta, packed, eodb = runf(x, vx, jnp.asarray(anch),
                                  jnp.asarray(eod_idx, jnp.int32),
                                  jnp.int32(ntiles * NE))
        _ = np.asarray(meta)
        t0 = time.perf_counter()
        x, vx = make_tiles(jnp.uint32(1))
        meta, packed, eodb = runf(x, vx, jnp.asarray(anch),
                                  jnp.asarray(eod_idx, jnp.int32),
                                  jnp.int32(ntiles * NE))
        total = int(np.asarray(meta)[0])
        dt = time.perf_counter() - t0
        print(f"bit-NFA layered kernel: {n_mb} MB in {dt:.3f}s = "
              f"{n / dt / 1e9:.2f} GB/s ({total} accepts)", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    bench_dfa_kernel(jnp, jax, rng)
    bench_spec_kernel(jnp, jax, rng)
    bench_nfa_spec_kernel(jnp, jax, rng)
    bench_nfa_kernel(jnp, jax, rng)


if __name__ == "__main__":
    main()
