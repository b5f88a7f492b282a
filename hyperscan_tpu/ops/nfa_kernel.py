"""Layered position-parallel bit-NFA scan — the device LimEx analogue.

Reference analogues: the LimEx bitvector NFA (src/nfa/limex_internal.h:
71-160) and Rose's 8/32-byte mask checks (src/rose/rose_build_add_mask.cpp,
CHECK_MASK instructions), which evaluate short patterns as shifted byte
compares instead of automata steps.

TPU redesign: a bounded-width scanning NFA is acyclic, so its activation
recurrence

    A_p[t] = reach_p[text[t]] & (entry_p[t] | OR_{u -> p} A_u[t-1])

unrolls into a *topological sweep over positions*, each step a few VPU
ops (shift, OR, AND) over full-corpus planes — NO sequential byte loop
and no chunk-halo lockstep needed. This is teddy's shift-AND generalized
from literal chains to DAGs; work is O(edges x corpus bytes) of
elementwise ops, independent of the 2^P subset blowup that killed the
DFA route.

Byte-class planes are built from range compares (lo <= x <= hi per run of
the class bitmap), avoiding table gathers entirely (XLA gather runs
~130M lookups/s on TPU — 100x too slow for a per-byte table walk).

Tiling: tiles of TILE_BODY bytes with a D-byte left halo; plane values in
the halo may lack context but every body value is exact because a
position of depth d only looks back d <= D bytes. Tiles are vmapped and
grouped so one dispatch covers many tiles (dispatch costs ~30ms on the
dev tunnel).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TILE_BODY = 1 << 17  # 128 KiB body per tile
MAX_NFA_DEPTH = 1024  # halo bound: depth <= TILE_BODY is required; keep sane
MAX_NFA_POSITIONS = 512
MAX_NFA_RANGES = 1024
MAX_DEVICE_SETS = 31  # accept-set bitmask must fit int32 planes
# plane-memory budget per dispatch (bytes); bounds tiles per group
GROUP_PLANE_BUDGET = 1 << 31

import os as _os

# tests force the Pallas layered kernel in interpret mode
_FORCE_PALLAS = bool(_os.environ.get("HSTPU_FORCE_PALLAS_NFA"))


def nfa_device_eligible(engine) -> bool:
    meta = _engine_meta(engine)
    return (
        engine.acyclic
        and engine.max_depth is not None
        and engine.max_depth <= MAX_NFA_DEPTH
        and engine.num_positions <= MAX_NFA_POSITIONS
        and engine.num_sets <= MAX_DEVICE_SETS
        and meta["total_ranges"] <= MAX_NFA_RANGES
    )


def _class_ranges(bits: np.ndarray) -> List[Tuple[int, int]]:
    """Runs of set bytes in a [256] bool class bitmap."""
    idx = np.flatnonzero(bits)
    if len(idx) == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate([[idx[0]], idx[breaks + 1]])
    ends = np.concatenate([idx[breaks], [idx[-1]]])
    return [(int(a), int(b)) for a, b in zip(starts, ends)]


def _engine_meta(engine):
    """Host-side compile of the layered plan: per-position class id,
    predecessor lists in topo order, class ranges."""
    if not hasattr(engine, "_nfa_meta"):
        P = engine.num_positions
        # class id per position = index of its reach row among used rows
        reach = engine.class_reach  # [C, P]
        # position p's byte set = union over classes c with reach[c, p]
        # of class-c bytes; but per construction each position's reach is
        # exactly {bytes b : class_reach[b2c[b], p]} — recover the byte
        # bitmap per position
        b2c = engine.byte_to_class.astype(np.int64)
        pos_bits = reach[b2c, :]  # [256, P] bool
        uniq, inv = np.unique(pos_bits.T, axis=0, return_inverse=True)
        ranges = [_class_ranges(uniq[k]) for k in range(uniq.shape[0])]
        preds: List[List[int]] = [[] for _ in range(P)]
        F = engine.follow
        for u in range(P):
            for v in np.flatnonzero(F[u]):
                preds[int(v)].append(u)
        engine._nfa_meta = {
            "pos_class": inv.reshape(P),
            "ranges": ranges,
            "total_ranges": sum(len(r) for r in ranges),
            "preds": preds,
            "order": [int(p) for p in engine.topo_order],
        }
    return engine._nfa_meta


def _make_scan_fn(engine):
    """Build the traced per-group scan: (x [NT, NE] u8, valid [NT, NE]
    bool, anch [NT, NE] bool, eod_idx [B] int32) ->
    (acc bits [NT, NE] i32, eod bits [B] i32)."""
    meta = _engine_meta(engine)
    ranges = meta["ranges"]
    pos_class = meta["pos_class"]
    preds = meta["preds"]
    order = meta["order"]
    float_mask = engine.float_mask
    anch_mask = engine.anch_mask
    accept_gid = engine.accept_gid
    accept_eod_gid = engine.accept_eod_gid

    def scan(x, valid, anch, eod_idx):
        cls_planes = {}
        for k in set(int(pos_class[p]) for p in order):
            rs = ranges[k]
            if not rs:
                plane = jnp.zeros(x.shape, dtype=bool)
            else:
                plane = (x >= rs[0][0]) & (x <= rs[0][1])
                for (a, b) in rs[1:]:
                    plane = plane | ((x >= a) & (x <= b))
            cls_planes[k] = plane

        planes = {}
        zero_col = jnp.zeros((x.shape[0], 1), dtype=bool)
        acc = jnp.zeros(x.shape, dtype=jnp.int32)
        eod_plane = jnp.zeros(x.shape, dtype=jnp.int32)
        for p in order:
            srcs = []
            if float_mask[p]:
                srcs.append(valid)
            if anch_mask[p]:
                srcs.append(anch)
            pred_or = None
            for u in preds[p]:
                pu = planes[u]
                pred_or = pu if pred_or is None else (pred_or | pu)
            if pred_or is not None:
                srcs.append(
                    jnp.concatenate([zero_col, pred_or[:, :-1]], axis=1)
                )
            if not srcs:
                planes[p] = jnp.zeros(x.shape, dtype=bool)
                continue
            inp = srcs[0]
            for s in srcs[1:]:
                inp = inp | s
            plane = inp & cls_planes[int(pos_class[p])] & valid
            planes[p] = plane
            g = int(accept_gid[p])
            if g:
                acc = acc | (plane.astype(jnp.int32) << (g - 1))
            ge = int(accept_eod_gid[p])
            if ge:
                eod_plane = eod_plane | (plane.astype(jnp.int32) << (ge - 1))
        eod_bits = jnp.where(
            eod_idx >= 0, eod_plane.reshape(-1)[jnp.maximum(eod_idx, 0)], 0
        )
        return acc, eod_bits

    return scan


@functools.lru_cache(maxsize=256)
def _jit_group(engine_key, NT: int, NE: int, B: int, capacity: int,
               cap_chunks: int):
    engine = _ENGINES[engine_key]
    scan = _make_scan_fn(engine)
    D = _halo(engine)

    def run(x, valid, anch, eod_idx, n_valid):
        acc, eod_bits = scan(x, valid, anch, eod_idx)
        # halo accepts have partial context; only body bytes are exact
        body = jnp.arange(acc.shape[1], dtype=jnp.int32)[None, :] >= D
        acc = jnp.where(body, acc, 0)
        from .teddy import sparse_extract

        flat = acc.reshape(-1)
        meta, packed = sparse_extract([flat], n_valid, capacity, cap_chunks)
        return meta, packed, eod_bits

    return jax.jit(run)


# jit-cache key registry: id() alone can collide after gc; pair with a
# monotonically assigned token stored on the engine
import weakref as _weakref

# jit-key registry: weak values, so dropping a database releases its
# engines (the lru-bounded jit wrappers below bound compiled-kernel
# count; without weak refs a long-lived process compiling many
# databases would pin every engine's tables forever)
_ENGINES = _weakref.WeakValueDictionary()
_NEXT_KEY = [0]


def _engine_key(engine) -> int:
    if not hasattr(engine, "_nfa_key"):
        engine._nfa_key = _NEXT_KEY[0]
        _NEXT_KEY[0] += 1
        _ENGINES[engine._nfa_key] = engine
    return engine._nfa_key


def _halo(engine) -> int:
    # halo must cover the longest lookback (a depth-d position looks back
    # d-1 bytes); round to 1024 so NE stays a sparse_extract chunk multiple
    d = int(engine.max_depth)
    return max(1024, -(-d // 1024) * 1024)


def nfa_scan_corpus_device(
    engine, blocks: List[bytes], block_anchored: np.ndarray,
    capacity: int = 1 << 14,
):
    """Scan concatenated blocks with a layered bit-NFA.

    Returns (records as parallel arrays (block_idx, pos_local,
    accept_set_bitmask), eod_bits [n_blocks] int32).
    """
    D = _halo(engine)
    B = len(blocks)
    # corpus layout: blocks head-to-head with one dead gap byte between
    # (every NFA step consumes a byte, so a gap byte with valid=0 breaks
    # any cross-block activation chain)
    offs = np.zeros(B, np.int64)
    pos = 0
    for i, b in enumerate(blocks):
        offs[i] = pos
        pos += len(b) + 1
    NC = pos
    ntiles = max(1, -(-NC // TILE_BODY))
    NCP = ntiles * TILE_BODY
    corpus = np.zeros(NCP, np.uint8)
    valid = np.zeros(NCP, bool)
    anch = np.zeros(NCP, bool)
    for i, b in enumerate(blocks):
        o = int(offs[i])
        n = len(b)
        corpus[o : o + n] = np.frombuffer(b, np.uint8)
        valid[o : o + n] = True
        if n and block_anchored[i]:
            anch[o] = True

    ext = np.concatenate([np.zeros(D, np.uint8), corpus])
    vext = np.concatenate([np.zeros(D, bool), valid])
    aext = np.concatenate([np.zeros(D, bool), anch])
    NE = D + TILE_BODY

    def tile_of(arr):
        return np.stack(
            [arr[k * TILE_BODY : k * TILE_BODY + NE] for k in range(ntiles)]
        )

    x_t = tile_of(ext)
    v_t = tile_of(vext)
    a_t = tile_of(aext)

    # group tiles per dispatch under the plane-memory budget; group size
    # and block count land on the bucket series (bounded jit shapes
    # across mixed corpus/batch sizes)
    P = engine.num_positions
    per_tile = NE * max(P // 4, 8)  # rough live-plane bytes per tile
    from .teddy import bucket_up, get_capacity_hint, set_capacity_hint

    gt_cap = max(1, GROUP_PLANE_BUDGET // max(per_tile, 1))
    gt = min(bucket_up(ntiles), gt_cap)
    Bp = bucket_up(B)

    key = _engine_key(engine)
    cap_chunks = max(64, capacity // 16)
    hint = get_capacity_hint(engine, "nfa")
    if hint:
        capacity = max(capacity, hint[0])
        cap_chunks = max(cap_chunks, hint[1])

    # EOD flat index of each block's last byte in ext-tile coordinates
    ends = np.full(B, -1, np.int64)
    for i, b in enumerate(blocks):
        if len(b):
            ends[i] = int(offs[i]) + len(b) - 1

    rec_bi: List[np.ndarray] = []
    rec_pos: List[np.ndarray] = []
    rec_val: List[np.ndarray] = []
    block_lens = np.asarray([len(b) for b in blocks], np.int64)
    eod_bits = np.zeros(B, np.int32)
    for g0 in range(0, ntiles, gt):
        g1 = min(ntiles, g0 + gt)
        NT = g1 - g0
        # pad the group to the bucket size for jit-cache stability
        if NT < gt:
            pad = gt - NT
            xg = np.concatenate([x_t[g0:g1], np.zeros((pad, NE), np.uint8)])
            vg = np.concatenate([v_t[g0:g1], np.zeros((pad, NE), bool)])
            ag = np.concatenate([a_t[g0:g1], np.zeros((pad, NE), bool)])
        else:
            xg, vg, ag = x_t[g0:g1], v_t[g0:g1], a_t[g0:g1]
        # blocks ending inside this group, in ext coordinates
        lo = g0 * TILE_BODY
        hi = g1 * TILE_BODY
        eod_idx = np.full(Bp, -1, np.int64)
        in_g = (ends >= lo) & (ends < hi)
        # ext index of global body byte t within its tile:
        # tile k = t // TILE_BODY (relative to group), pos = D + t % TILE
        rel = ends[in_g] - lo
        eod_idx[:B][in_g] = (rel // TILE_BODY) * NE + D + rel % TILE_BODY

        use_pallas = (
            engine.num_positions <= PALLAS_MAX_POSITIONS
            and NE % 128 == 0
            and (jax.default_backend() != "cpu"
                 or _FORCE_PALLAS)
        )
        cap = capacity
        cc = cap_chunks
        while True:
            if use_pallas:
                run = _jit_group_pallas(
                    key, gt, NE, Bp, cap, cc,
                    jax.default_backend() == "cpu",
                )
            else:
                run = _jit_group(key, gt, NE, Bp, cap, cc)
            meta, packed, eodb = run(
                jnp.asarray(xg), jnp.asarray(vg), jnp.asarray(ag),
                jnp.asarray(eod_idx, dtype=jnp.int32),
                jnp.int32(gt * NE),
            )
            total, n_hit = (int(v) for v in np.asarray(meta))
            if total <= cap and n_hit <= cc:
                break
            if total > cap:
                cap = 1 << (total - 1).bit_length()
            if n_hit > cc:
                cc = 1 << (n_hit - 1).bit_length()
        capacity, cap_chunks = cap, cc
        set_capacity_hint(engine, "nfa", cap, cc)

        eod_bits |= np.asarray(eodb, np.int32)[:B]
        k = min(total, cap)
        if k:
            got = np.asarray(packed[:, :k])
            flat, bits = got[0].astype(np.int64), got[1].astype(np.int64)
            # flat = tile_in_group * NE + e
            ti = flat // NE
            e = flat % NE
            body = e - D
            ok = body >= 0
            t_global = (g0 + ti[ok]) * TILE_BODY + body[ok]
            bvals = bits[ok]
            # map body offsets to blocks; drop gap/padding positions
            bi = np.searchsorted(offs, t_global, side="right") - 1
            pos_local = t_global - offs[bi]
            ok2 = pos_local < block_lens[bi]
            rec_bi.append(bi[ok2])
            rec_pos.append(pos_local[ok2])
            rec_val.append(bvals[ok2])
    z = np.zeros(0, np.int64)
    recs = (
        (np.concatenate(rec_bi), np.concatenate(rec_pos),
         np.concatenate(rec_val))
        if rec_bi else (z, z, z)
    )
    return recs, eod_bits


# --------------------------------------------------------------------------
# Pallas variant of the layered sweep: each grid cell owns one tile, all
# position planes live in VMEM scratch, so HBM traffic is just corpus in
# and accept-bit planes out (the XLA variant round-trips every plane
# through HBM). Routing: small-P acyclic engines on a real accelerator.
# --------------------------------------------------------------------------

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

PALLAS_MAX_POSITIONS = 48  # VMEM budget: ~(P+2) planes of R x 128 bytes


def _make_layered_kernel(engine, R: int):
    meta = _engine_meta(engine)
    ranges = meta["ranges"]
    pos_class = meta["pos_class"]
    preds = meta["preds"]
    order = meta["order"]
    float_mask = engine.float_mask
    anch_mask = engine.anch_mask
    accept_gid = engine.accept_gid
    accept_eod_gid = engine.accept_eod_gid
    has_eod = bool(accept_eod_gid.max()) if len(accept_eod_gid) else False
    P = engine.num_positions

    def kernel(x_ref, valid_ref, anch_ref, acc_ref, *rest):
        if has_eod:
            eod_ref, planes = rest
        else:
            (planes,) = rest
        x = x_ref[...].astype(jnp.int32)          # [R, 128]
        valid = valid_ref[...] != 0               # bool
        anch = anch_ref[...] != 0
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        acc = jnp.zeros((R, 128), jnp.int32)
        eod = jnp.zeros((R, 128), jnp.int32)
        for p in order:
            rs = ranges[int(pos_class[p])]
            if rs:
                cls = (x >= rs[0][0]) & (x <= rs[0][1])
                for (a, b) in rs[1:]:
                    cls = cls | ((x >= a) & (x <= b))
            else:
                cls = jnp.zeros((R, 128), bool)
            pred_or = None
            for u in preds[p]:
                pu = planes[u] != 0
                pred_or = pu if pred_or is None else (pred_or | pu)
            srcs = []
            if pred_or is not None:
                # shift by one byte in row-major [R, 128] order
                rolled = pltpu.roll(pred_or.astype(jnp.int32), 1, axis=1)
                rows_up = jnp.concatenate(
                    [jnp.zeros((1, 128), jnp.int32), rolled[:-1]], axis=0
                )
                shifted = jnp.where(lane == 0, rows_up, rolled) != 0
                shifted = shifted & ~((lane == 0) & (row == 0))
                srcs.append(shifted)
            if float_mask[p]:
                srcs.append(valid)
            if anch_mask[p]:
                srcs.append(anch)
            if not srcs:
                planes[p] = jnp.zeros((R, 128), jnp.int8)
                continue
            inp = srcs[0]
            for s2 in srcs[1:]:
                inp = inp | s2
            plane = inp & cls & valid
            planes[p] = plane.astype(jnp.int8)
            g = int(accept_gid[p])
            if g:
                acc = acc | (plane.astype(jnp.int32) << (g - 1))
            ge = int(accept_eod_gid[p])
            if ge:
                eod = eod | (plane.astype(jnp.int32) << (ge - 1))
        acc_ref[...] = acc
        if has_eod:
            eod_ref[...] = eod

    return kernel, P, has_eod


@functools.lru_cache(maxsize=128)
def _jit_group_pallas(engine_key, NT: int, NE: int, B: int, capacity: int,
                      cap_chunks: int, interpret: bool):
    engine = _ENGINES[engine_key]
    R = NE // 128
    kernel, P, has_eod = _make_layered_kernel(engine, R)
    D = _halo(engine)

    def run(x, valid, anch, eod_idx, n_valid):
        # [NT, NE] -> [NT*R, 128] row-major per tile
        x2 = x.reshape(NT * R, 128)
        v2 = valid.astype(jnp.int8).reshape(NT * R, 128)
        a2 = anch.astype(jnp.int8).reshape(NT * R, 128)
        n_out = 2 if has_eod else 1
        outs = pl.pallas_call(
            kernel,
            interpret=interpret,
            grid=(NT,),
            out_shape=tuple(
                jax.ShapeDtypeStruct((NT * R, 128), jnp.int32)
                for _ in range(n_out)
            ),
            in_specs=[
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(n_out)
            ),
            scratch_shapes=[
                pltpu.VMEM((engine.num_positions, R, 128), jnp.int8)
            ],
        )(x2, v2, a2)
        outs = outs if isinstance(outs, tuple) else (outs,)
        acc = outs[0].reshape(NT, NE)
        body = jnp.arange(NE, dtype=jnp.int32)[None, :] >= D
        acc = jnp.where(body, acc, 0)
        if has_eod:
            eodp = outs[1].reshape(NT, NE)
            eod_bits = jnp.where(
                eod_idx >= 0, eodp.reshape(-1)[jnp.maximum(eod_idx, 0)], 0
            )
        else:
            eod_bits = jnp.zeros(eod_idx.shape, jnp.int32)
        from .teddy import sparse_extract

        meta, packed = sparse_extract(
            [acc.reshape(-1)], n_valid, capacity, cap_chunks
        )
        return meta, packed, eod_bits

    return jax.jit(run)
