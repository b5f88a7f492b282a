"""Pallas DFA scan kernel — chunk-halo parallel scanning.

Reference analogues: the McClellan/Sheng byte engines (src/nfa/mcclellan.c,
sheng_impl.h) and FDR's zone machinery (src/fdr/fdr.c:45-133) which splits
a buffer into boundary-safe regions. TPU translation:

- A *scanning* DFA (float restart folded into every state) over a pattern
  set whose maximum match width is D has bounded memory: the state at
  position p is exactly the state obtained by scanning the last H >= D-1
  bytes from the float-rest state. So the corpus splits into CS-byte
  chunks, each scanned independently from its H-byte halo — thousands of
  chunks advance in lockstep lanes, giving the VPU full ILP (a single
  dependent chain per lane is latency-bound and ~1000x slower).
- Transition lookups use `tpu.dynamic_gather` along lanes (the pshufb
  analogue); tables beyond 128 entries use a select tree over rows —
  the Sheng32/64 widening analogue.
- Unbounded-width engines cannot use halos; they take the host (native
  C++) path instead.

Layout: Xe[t, c] = byte (chunk_start(c) - H + t) of the block-padded
corpus, shaped [T_ext, nrows, 128] with chunk c at (row c//128, lane
c%128). Per-lane vfrom/vto mark valid positions (halo of a block's first
chunk is dead; tail padding is dead); accepts are emitted for body
positions only.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_BLOCK = 4      # time steps per grid cell (static unroll)
# chunk rows per grid cell: large planes amortize the ~70ns/vreg gather
# cost and the per-op dependency latency (measured: [128,128] planes are
# latency-bound ~1000x slower; [1024,128] planes reach gather throughput)
GROUP_ROWS = 512  # 64K chunks per cell; fits VMEM with double buffering
MAX_HALO = 256    # engines deeper than this use the host path


def pack_tables(engine) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """(trans_rows [Wt,128], b2c_rows [2,128], accept_rows [Wa,128], C)."""
    if not hasattr(engine, "_packed"):
        trans = np.asarray(engine.trans, dtype=np.int32)
        S, C = trans.shape
        flat = trans.reshape(-1)
        Wt = -(-flat.shape[0] // 128)
        trans_rows = np.zeros((Wt, 128), np.int32)
        trans_rows.reshape(-1)[: flat.shape[0]] = flat
        b2c_rows = (
            np.asarray(engine.byte_to_class, dtype=np.int32)
            .reshape(2, 128)
            .copy()
        )
        acc = np.asarray(engine.accept_id, dtype=np.int32)
        Wa = -(-acc.shape[0] // 128)
        accept_rows = np.zeros((Wa, 128), np.int32)
        accept_rows.reshape(-1)[: acc.shape[0]] = acc
        engine._packed = (trans_rows, b2c_rows, accept_rows, C)
    return engine._packed


def chunk_shape(engine) -> Tuple[int, int]:
    """(halo H, chunk body size CS) for a bounded engine; H+CS = 512."""
    d = engine.max_depth
    assert d is not None
    h = min(max(d - 1, 0), MAX_HALO)
    h = -(-h // T_BLOCK) * T_BLOCK  # align to the unroll tile
    return h, 512 - h


def _lookup(tbl_ref, idx, nrows: int):
    """tbl[idx] over a [nrows,128] row-major table; idx [R,128]."""
    lo = idx & 127
    hi = idx >> 7
    out = jnp.take_along_axis(
        jnp.broadcast_to(tbl_ref[0, :][None, :], idx.shape), lo, axis=1
    )
    for r in range(1, nrows):
        cand = jnp.take_along_axis(
            jnp.broadcast_to(tbl_ref[r, :][None, :], idx.shape), lo, axis=1
        )
        out = jnp.where(hi == r, cand, out)
    return out


def _make_kernel(Wt: int, Wa: int, C: int, H: int, n_tb: int):
    def kernel(data_ref, trans_ref, b2c_ref, acc_ref, init_ref, vfrom_ref,
               vto_ref, out_ref, fin_ref, state_scratch):
        tb = pl.program_id(1)

        @pl.when(tb == 0)
        def _():
            state_scratch[...] = init_ref[...]
            fin_ref[...] = init_ref[...]

        states = state_scratch[...]       # [GROUP_ROWS, 128]
        finals = fin_ref[...]
        vfrom = vfrom_ref[...]
        vto = vto_ref[...]
        trans = trans_ref[...]
        b2c = b2c_ref[...]
        acc = acc_ref[...]
        for tau in range(T_BLOCK):
            pos = tb * T_BLOCK + tau      # static within trace of this cell?
            byte = data_ref[tau].astype(jnp.int32)
            cls = _lookup(b2c, byte, 2)
            nxt = _lookup(trans, states * C + cls, Wt)
            live = (pos >= vfrom) & (pos < vto)
            states = jnp.where(live, nxt, states)
            finals = jnp.where(pos == vto - 1, states, finals)
            aid = jnp.where(live & (pos >= H),
                            _lookup(acc, states, Wa), 0)
            out_ref[tau] = aid
        state_scratch[...] = states
        fin_ref[...] = finals

    return kernel


@functools.lru_cache(maxsize=128)
def _jit_scan(Wt: int, Wa: int, C: int, H: int, ngroups: int, n_tb: int,
              capacity: int, cap_chunks: int, interpret: bool):
    T_ext = n_tb * T_BLOCK

    def run(data, trans_rows, b2c_rows, acc_rows, init, vfrom, vto, n_valid):
        out, fin = pl.pallas_call(
            _make_kernel(Wt, Wa, C, H, n_tb),
            interpret=interpret,
            grid=(ngroups, n_tb),
            out_shape=(
                jax.ShapeDtypeStruct(
                    (T_ext, ngroups * GROUP_ROWS, 128), jnp.int32),
                jax.ShapeDtypeStruct((ngroups * GROUP_ROWS, 128), jnp.int32),
            ),
            in_specs=[
                pl.BlockSpec((T_BLOCK, GROUP_ROWS, 128),
                             lambda g, t: (t, g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Wt, 128), lambda g, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 128), lambda g, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Wa, 128), lambda g, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUP_ROWS, 128), lambda g, t: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUP_ROWS, 128), lambda g, t: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUP_ROWS, 128), lambda g, t: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((T_BLOCK, GROUP_ROWS, 128),
                             lambda g, t: (t, g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUP_ROWS, 128), lambda g, t: (g, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((GROUP_ROWS, 128), jnp.int32)],
        )(data, trans_rows, b2c_rows, acc_rows, init, vfrom, vto)

        from .teddy import sparse_extract

        flat = out.reshape(-1)
        meta, packed = sparse_extract([flat], flat.shape[0], capacity,
                                      cap_chunks)
        return meta, packed, fin

    return jax.jit(run)


def _layout_corpus(blocks: List[bytes], H: int, CS: int):
    """Block-padded chunk layout + per-chunk metadata.

    Returns (Xe [T_ext, nrows, 128] u8, nchunks, chunk_block [nchunks],
    chunk_body_start [nchunks] local offsets, vfrom, vto, first_chunk
    flags) — all numpy.
    """
    chunk_block: List[int] = []
    chunk_body_start: List[int] = []
    vfrom: List[int] = []
    vto: List[int] = []
    first: List[bool] = []
    parts: List[np.ndarray] = []
    for bi, blk in enumerate(blocks):
        n = len(blk)
        nch = max(1, -(-n // CS))
        arr = np.zeros(nch * CS, np.uint8)
        arr[:n] = np.frombuffer(blk, np.uint8)
        parts.append(arr)
        for k in range(nch):
            chunk_block.append(bi)
            chunk_body_start.append(k * CS)
            vfrom.append(H if k == 0 else 0)
            body = min(CS, n - k * CS)
            vto.append(H + max(0, body))
            first.append(k == 0)
    flat = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    nchunks = len(chunk_block)
    nrows = -(-nchunks // 128)
    from .teddy import bucket_up

    # jit-shape bucketing: padded chunk rows land on the canonical
    # series so mixed corpus sizes reuse a bounded set of kernel shapes
    ngroups = bucket_up(max(1, -(-nrows // GROUP_ROWS)))
    nrows_pad = ngroups * GROUP_ROWS
    ncap = nrows_pad * 128

    rows = flat.reshape(nchunks, CS)
    shifted = np.concatenate([np.zeros(H, np.uint8), flat])[: nchunks * CS]
    halos = shifted.reshape(nchunks, CS)[:, :H] if H else \
        np.zeros((nchunks, 0), np.uint8)
    ext = np.concatenate([halos, rows], axis=1)  # [nchunks, H+CS]
    ext_pad = np.zeros((ncap, H + CS), np.uint8)
    ext_pad[:nchunks] = ext
    Xe = np.ascontiguousarray(
        ext_pad.T.reshape(H + CS, nrows_pad, 128)
    )

    def lane_plane(vals, fill):
        a = np.full(ncap, fill, np.int32)
        a[:nchunks] = vals
        return a.reshape(nrows_pad, 128)

    return (
        Xe, nchunks,
        np.asarray(chunk_block, np.int64),
        np.asarray(chunk_body_start, np.int64),
        lane_plane(vfrom, 0),
        lane_plane(vto, 0),
        np.asarray(first, bool),
        ngroups,
    )


def _invoke_device(engine, Xe, trans_rows, b2c_rows, accept_rows, init,
                   vfrom, vto, Wt, Wa, C, H, ngroups, n_tb, nchunks,
                   capacity, hint_key):
    """Run the chunk kernel with capacity-hint retry; returns decoded
    (t, c, aids) record arrays (chunk-local) and per-chunk finals."""
    from .teddy import get_capacity_hint, set_capacity_hint

    interpret = jax.default_backend() == "cpu"
    cap_chunks = max(64, capacity // 16)
    hint = get_capacity_hint(engine, hint_key)
    if hint:
        capacity = max(capacity, hint[0])
        cap_chunks = max(cap_chunks, hint[1])
    while True:
        run = _jit_scan(Wt, Wa, C, H, ngroups, n_tb, capacity, cap_chunks,
                        interpret)
        meta, packed, fin = run(
            jnp.asarray(Xe), jnp.asarray(trans_rows), jnp.asarray(b2c_rows),
            jnp.asarray(accept_rows), jnp.asarray(init), jnp.asarray(vfrom),
            jnp.asarray(vto), jnp.int32(Xe.size),
        )
        total, n_hit = (int(x) for x in np.asarray(meta))
        if total <= capacity and n_hit <= cap_chunks:
            break
        if total > capacity:
            capacity = 1 << (total - 1).bit_length()
        if n_hit > cap_chunks:
            cap_chunks = 1 << (n_hit - 1).bit_length()
    set_capacity_hint(engine, hint_key, capacity, cap_chunks)

    k = min(total, capacity)
    got = np.asarray(packed[:, :k])
    pos_flat, aids = got[0].astype(np.int64), got[1].astype(np.int64)
    nrows_pad = vfrom.shape[0]
    t = pos_flat // (nrows_pad * 128)
    c = pos_flat % (nrows_pad * 128)
    ok = c < nchunks
    fin_np = np.asarray(fin).reshape(-1)[:nchunks]
    return t[ok], c[ok], aids[ok], fin_np


def dfa_scan_corpus_device(
    engine, blocks: List[bytes], block_anchored: np.ndarray,
    capacity: int = 1 << 14, init_states: Optional[np.ndarray] = None,
):
    """Scan concatenated blocks with a bounded-depth engine.

    With ``init_states`` (int32 [n_blocks]), each block's first chunk
    enters in that carried state (streaming: per-stream end-of-write
    states; the halo is skipped for first chunks, so the carried state
    fully determines continuation — reference analogue: stream state
    resumption, src/rose/stream.c:545). Otherwise first chunks enter
    anchored-start or float per ``block_anchored``.

    Returns (records as parallel arrays (block_idx, pos_local,
    accept_set_id), finals [n_blocks] end-of-block states).
    """
    H, CS = chunk_shape(engine)
    trans_rows, b2c_rows, accept_rows, C = pack_tables(engine)
    Wt, Wa = trans_rows.shape[0], accept_rows.shape[0]

    (Xe, nchunks, chunk_block, chunk_body_start, vfrom, vto, first,
     ngroups) = _layout_corpus(blocks, H, CS)
    n_tb = (H + CS) // T_BLOCK

    # entry states: carried per-block state / anchored start for a
    # block's first chunk, float otherwise (halo re-derivation)
    init_flat = np.full(vfrom.size, engine.float_state, np.int32)
    if init_states is not None:
        init_flat[: nchunks][first] = init_states[chunk_block[first]]
    else:
        anch = first & block_anchored[chunk_block]
        init_flat[: nchunks][anch] = engine.start_state
    init = init_flat.reshape(vfrom.shape)

    t, c, aids, fin_np = _invoke_device(
        engine, Xe, trans_rows, b2c_rows, accept_rows, init, vfrom, vto,
        Wt, Wa, C, H, ngroups, n_tb, nchunks, capacity, "dfa",
    )
    bi_a = chunk_block[c]
    pos_a = chunk_body_start[c] + t - H
    recs = (bi_a, pos_a, aids)

    # end-of-block states: finals of each block's last chunk
    n_blocks = len(blocks)
    finals = np.zeros(n_blocks, np.int32)
    last_chunk_of = {}
    for ci in range(nchunks):
        last_chunk_of[int(chunk_block[ci])] = ci
    for bi in range(n_blocks):
        if len(blocks[bi]) == 0:
            if init_states is not None:
                finals[bi] = init_states[bi]
            else:
                finals[bi] = (
                    engine.start_state if block_anchored[bi]
                    else engine.float_state
                )
        else:
            finals[bi] = fin_np[last_chunk_of[bi]]
    return recs, finals


SPEC_CS = 512  # speculative chunk body size (no halo)


def dfa_scan_corpus_device_speculative(
    engine, blocks: List[bytes], block_anchored: np.ndarray,
    capacity: int = 1 << 14, init_states: Optional[np.ndarray] = None,
):
    """Scan an *unbounded-depth* engine on device by chunk speculation.

    Unbounded engines cannot halo-parallelize (the state at a chunk
    boundary may depend on the whole prefix). Instead every chunk scans
    in parallel from the float-rest state (block-first chunks from the
    carried/anchored entry), and a host pass chains the per-chunk exit
    states left to right: a chunk whose true entry equals its speculated
    entry is already exact; a mismatched chunk is rescanned host-native
    from the true entry, cascading until the chain re-synchronizes with
    the float state. Scanning DFAs re-anchor at the float closure, so on
    typical data nearly all chunks validate and throughput is the device
    kernel's; the worst case degrades to the host scan it replaces.
    (Reference analogue: the sequential byte loop of mcclellan.c — this
    is its TPU-parallel replacement for the engines the chunk-halo
    kernel's depth bound excludes.)

    Returns ((block_idx, pos_local, accept_set_id), finals [n_blocks]).
    """
    H, CS = 0, SPEC_CS
    trans_rows, b2c_rows, accept_rows, C = pack_tables(engine)
    Wt, Wa = trans_rows.shape[0], accept_rows.shape[0]

    (Xe, nchunks, chunk_block, chunk_body_start, vfrom, vto, first,
     ngroups) = _layout_corpus(blocks, H, CS)
    n_tb = (H + CS) // T_BLOCK

    float_s = np.int32(engine.float_state)
    init_flat = np.full(vfrom.size, float_s, np.int32)
    if init_states is not None:
        init_flat[:nchunks][first] = init_states[chunk_block[first]]
    else:
        anch = first & block_anchored[chunk_block]
        init_flat[:nchunks][anch] = engine.start_state
    init = init_flat.reshape(vfrom.shape)

    t, c, aids, fin_np = _invoke_device(
        engine, Xe, trans_rows, b2c_rows, accept_rows, init, vfrom, vto,
        Wt, Wa, C, H, ngroups, n_tb, nchunks, capacity, "dfa-spec",
    )

    # ---- host fixup: chain true entry states ---------------------------
    from ..runtime.smallwrite import dfa_scan_host

    n_blocks = len(blocks)
    finals = np.zeros(n_blocks, np.int32)
    entry0 = init_flat[:nchunks]
    body_len = (vfrom.reshape(-1)[:nchunks] * 0
                + vto.reshape(-1)[:nchunks] - H)
    rescanned: List[int] = []
    extra_records: List[Tuple[int, np.ndarray, np.ndarray]] = []

    ci = 0
    for bi in range(n_blocks):
        n = len(blocks[bi])
        nch = max(1, -(-n // CS)) if n else 1
        blk = np.frombuffer(blocks[bi], np.uint8) if n else \
            np.zeros(0, np.uint8)
        actual = int(entry0[ci])  # first chunk's entry is exact
        for k in range(nch):
            cc = ci + k
            bl = int(body_len[cc])
            if actual == int(entry0[cc]):
                actual = int(fin_np[cc])
                continue
            # speculation missed: exact host rescan from the true entry
            rescanned.append(cc)
            row = np.zeros((1, CS), np.uint8)
            seg = blk[k * CS : k * CS + bl]
            row[0, : seg.size] = seg
            hits, fin_h = dfa_scan_host(
                engine, row, np.asarray([bl], np.int64),
                np.asarray([actual], np.int32),
            )
            ph, sh = hits[0]
            if ph.size:
                extra_records.append((
                    bi,
                    chunk_body_start[cc] + ph.astype(np.int64),
                    sh.astype(np.int64),
                ))
            actual = int(fin_h[0])
        finals[bi] = actual
        ci += nch

    if rescanned:
        keep = ~np.isin(c, np.asarray(rescanned, dtype=c.dtype))
        t, c, aids = t[keep], c[keep], aids[keep]
    bi_a = chunk_block[c]
    pos_a = chunk_body_start[c] + t - H
    if extra_records:
        bi_x = np.concatenate(
            [np.full(p.size, b, np.int64) for (b, p, _s) in extra_records]
        )
        pos_x = np.concatenate([p for (_b, p, _s) in extra_records])
        sid_x = np.concatenate([s for (_b, _p, s) in extra_records])
        bi_a = np.concatenate([bi_a, bi_x])
        pos_a = np.concatenate([pos_a, pos_x])
        aids = np.concatenate([aids, sid_x])
    return (bi_a, pos_a, aids), finals


def nfa_scan_corpus_device_speculative(
    engine, blocks: List[bytes], block_anchored: np.ndarray,
    capacity: int = 1 << 14,
):
    """Device scan for *cyclic* bit-NFA engines via their lazy-DFA core.

    The engine's ``spec_dfa`` (partial determinization of the reachable
    subset space, with an absorbing unknown-subset sink) scans every
    chunk speculatively from the float state; the host chains exact NFA
    activation masks through the per-chunk DFA exits (state_masks maps
    DFA ids back to subsets). A chunk is valid iff its true entry mask
    equals the speculated one AND the device exit stayed inside the
    explored core; everything else rescans exactly with the host
    word-packed NFA loop — the path it replaces (reference analogue:
    SIMD LimEx execution, src/nfa/limex_runtime_impl.h:29-33; here the
    explored core rides the chunk-parallel DFA kernel).

    Returns ((block_idx, pos_local, dfa_accept_set_id) device records to
    expand with ``engine.spec_dfa``, a list of (block_idx, pos_array,
    nfa_accept_bits) host-rescan records to expand with ``engine``, and
    per-block final NFA states).
    """
    d = engine.spec_dfa
    H, CS = 0, SPEC_CS
    trans_rows, b2c_rows, accept_rows, C = pack_tables(d)
    Wt, Wa = trans_rows.shape[0], accept_rows.shape[0]

    (Xe, nchunks, chunk_block, chunk_body_start, vfrom, vto, first,
     ngroups) = _layout_corpus(blocks, H, CS)
    n_tb = (H + CS) // T_BLOCK

    init_flat = np.full(vfrom.size, np.int32(d.float_state), np.int32)
    anch = first & block_anchored[chunk_block]
    init_flat[:nchunks][anch] = d.start_state
    init = init_flat.reshape(vfrom.shape)

    t, c, aids, fin_np = _invoke_device(
        engine, Xe, trans_rows, b2c_rows, accept_rows, init, vfrom, vto,
        Wt, Wa, C, H, ngroups, n_tb, nchunks, capacity, "nfa-spec",
    )

    # DFA state id -> NFA subset mask (python ints, cached per dfa)
    if not hasattr(d, "_mask_ints"):
        sm = d.state_masks
        ints = []
        for sid in range(sm.shape[0]):
            v = 0
            for w in range(sm.shape[1] - 1, -1, -1):
                v = (v << 64) | int(sm[sid, w])
            ints.append(v)
        d._mask_ints = ints
    mask_ints = d._mask_ints
    sink = -1 if d.sink_state is None else int(d.sink_state)
    start_bit = 1 << engine.num_positions

    from ..runtime.scan import engine_scan_host

    n_blocks = len(blocks)
    finals: List[int] = [0] * n_blocks
    entry0 = init_flat[:nchunks]
    body_len = vto.reshape(-1)[:nchunks] - H
    rescanned: List[int] = []
    host_records: List[Tuple[int, np.ndarray, np.ndarray]] = []
    ci = 0
    for bi in range(n_blocks):
        n = len(blocks[bi])
        nch = max(1, -(-n // CS)) if n else 1
        blk = np.frombuffer(blocks[bi], np.uint8) if n else \
            np.zeros(0, np.uint8)
        actual = (engine.start_state if block_anchored[bi]
                  else engine.float_state)
        for k in range(nch):
            cc = ci + k
            bl = int(body_len[cc])
            if bl == 0:
                continue
            spec = int(entry0[cc])
            exit_s = int(fin_np[cc])
            amask = int(actual) & (start_bit - 1)
            a_is_start = bool(int(actual) & start_bit)
            if (amask == mask_ints[spec]
                    and a_is_start == (spec == d.start_state)
                    and exit_s != sink):
                actual = mask_ints[exit_s]
                continue
            # speculation missed or the core was left: exact host rescan
            rescanned.append(cc)
            row = np.zeros((1, CS), np.uint8)
            seg = blk[k * CS : k * CS + bl]
            row[0, : seg.size] = seg
            hits, fin_h = engine_scan_host(
                engine, row, np.asarray([bl], np.int64), [actual]
            )
            ph, hv = hits[0]
            if len(ph):
                host_records.append((
                    bi,
                    chunk_body_start[cc] + np.asarray(ph, np.int64),
                    np.asarray(hv, np.int64),
                ))
            actual = int(fin_h[0])
        finals[bi] = int(actual)
        ci += nch

    if rescanned:
        keep = ~np.isin(c, np.asarray(rescanned, dtype=c.dtype))
        t, c, aids = t[keep], c[keep], aids[keep]
    bi_a = chunk_block[c]
    pos_a = chunk_body_start[c] + t - H
    return (bi_a, pos_a, aids), host_records, finals
