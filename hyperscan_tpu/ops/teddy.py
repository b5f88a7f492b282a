"""Teddy-style multi-literal candidate filter — Pallas TPU kernel.

Reference analogue: the FDR/Teddy literal matchers (src/fdr/teddy.c
prep_conf_teddy_m1..m4, src/fdr/fdr.c zones/shift-or). The TPU version is
*fully parallel* over byte positions — there is no shift-or carry chain:

  candidate bitmask at byte i = AND over suffix offsets m of
      masks[m][ data[i-m] ]

where masks[m][b] is a bucket bitmask (teddy_compile analogue builds it).
Each 256-entry byte table costs two 128-lane `tpu.dynamic_gather`s (the
TPU analogue of pshufb) plus a select; alignment across m is two vector
rolls. Measured ≈9.5 GB/s marginal at M=4/W=1 on v5e.

Layout: the corpus is a flat byte stream reshaped to rows of 128 lanes;
global byte position = row*128 + lane. The kernel grid tiles rows into
cells of R rows, each cell reading one halo row above for the cross-row
shifts. Block-boundary poisoning (a candidate whose window crosses an
input block boundary) is rejected later by the exact confirm stage, the
same division of labor as the reference's zones + confirm.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_CELL = 512  # 64 KiB of corpus per grid cell


def _make_kernel(M: int, W: int, R: int):
    def kernel(halo_ref, body_ref, masks_ref, *out_refs):
        # halo block is 8 rows for tile alignment; only its first row (the
        # last row before this cell) feeds the cross-row shifts
        data = jnp.concatenate(
            [halo_ref[0:1, :], body_ref[...]], axis=0
        ).astype(jnp.int32)  # [R+1, 128]
        is_lo = data < 128
        idx_lo = jnp.where(is_lo, data, 0)
        idx_hi = jnp.where(is_lo, 0, data - 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        for w in range(W):
            planes = []
            for m in range(M):
                lo_t = jnp.broadcast_to(masks_ref[m, w, :128][None, :], data.shape)
                hi_t = jnp.broadcast_to(masks_ref[m, w, 128:][None, :], data.shape)
                lo = jnp.take_along_axis(lo_t, idx_lo, axis=1)
                hi = jnp.take_along_axis(hi_t, idx_hi, axis=1)
                planes.append(jnp.where(is_lo, lo, hi))  # [R+1, 128]
            cand = planes[0][1:, :]
            for m in range(1, M):
                rolled = pltpu.roll(planes[m], m, axis=1)
                shifted = jnp.where(lane >= m, rolled[1:, :], rolled[:-1, :])
                cand = cand & shifted
            out_refs[w][...] = cand
    return kernel


def _class_split(masks: np.ndarray):
    """Byte->class remap + per-class mask tables, or None when the
    alphabet does not compress below 128 classes.

    Two bytes are equivalent iff every (m, w) mask word agrees on them;
    real rulesets compress 256 bytes to a few dozen classes (the same
    alphabet-remap idea as the DFA compiler's byte classes). The fused
    kernel then pays ONE remap gather pair per data plane plus one
    small-table gather per (m, w) — 2 + M*W gathers instead of 2*M*W,
    and one alignment roll per suffix offset instead of three.
    Returns (b2c [8, 128] int32 (rows 0-1 = bytes 0-127 / 128-255),
    cmasks [M, W, 128] int32)."""
    M, W, _ = masks.shape
    stack = masks.reshape(M * W, 256).T  # [256, M*W]
    u, inv = np.unique(stack, axis=0, return_inverse=True)
    C = len(u)
    if C > 128:
        return None
    b2c = np.zeros((8, 128), np.int32)
    b2c[0] = inv[:128]
    b2c[1] = inv[128:]
    cmasks = np.zeros((M, W, 128), np.int32)
    cmasks[:, :, :C] = u.T.reshape(M, W, C)
    return b2c, cmasks


@functools.lru_cache(maxsize=16)
def _rank_consts(capc: int):
    """Constant planes for the in-kernel rank/confirm stages:
    (tri128, eye_capc, eye128) as numpy f32. Converted to traced
    constants at kernel build time and handed to the kernel as VMEM
    operands — building [R, R] triangular / identity planes from iotas
    PER CELL costs ~1000 vreg-ops per cell (~9 ms per 512 MB at 8192
    cells on v5e), and the single padded [R, R] @ [R, 1] row-prefix
    matmul another few ms; as operands they cost one 128 KB upload."""
    tri = np.triu(np.ones((128, 128), np.float32))  # tri[i, j] = i <= j
    return (tri, np.eye(capc, dtype=np.float32),
            np.eye(128, dtype=np.float32))


def _prefix_rows(rowcnt, R: int, tri_ref):
    """Inclusive prefix sum over the R rows of a [R, 1] f32 column, as
    <=128-row chunked triangular matmuls. One [R, R] @ [R, 1] matmul
    pads the lane dim 128x; chunking by 128 rows cuts the MAC count
    R/128-fold and the constant triangular plane comes from `tri_ref`
    instead of per-cell iota builds. Row counts are <= 128 (bf16-exact);
    accumulation and the cross-chunk carries ride f32 (exact < 2^24)."""
    tri = tri_ref[...].astype(jnp.bfloat16)
    chunks = []
    off = None
    for s in range(0, R, 128):
        c = min(128, R - s)
        t = tri if c == 128 else tri[:c, :c]
        pc = jax.lax.dot_general(
            t, rowcnt[s:s + c].astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [c, 1] inclusive
        if off is not None:
            pc = pc + off
        off = pc[c - 1:c, 0:1]
        chunks.append(pc)
    return chunks[0] if len(chunks) == 1 else jnp.concatenate(
        chunks, axis=0)


def _rank_select(cand, R: int, capc: int, tri_ref):
    """MXU rank selection over a candidate grid: cand [R, 128] (nonzero =
    candidate) -> (count [1, 1] f32, pos [1, capc] f32) where pos[j] is
    the j-th candidate's grid position (row*128 + lane, rank order;
    garbage past count — callers mask with j < count).

    Rank selection is expressed MXU/VPU-wide, no scalar loops:
      lanepre  = nz @ lower_tri128          (within-row candidate ranks)
      rowcum   = chunked row prefix         (_prefix_rows)
      oh[r, j] = base[r] <= j < rowcum[r]   (slot j's owner row, one-hot)
      rowpre_j = oh^T @ lanepre             (owner row's rank prefix)
      lane_j   = #\\{lanes: rowpre_j <= within_j\\}
    All matmuls take 0/1 or <=256-valued bf16 inputs (exact) with f32
    accumulation (exact below 2^24). `tri_ref` is the [128, 128]
    triangular constant operand (_rank_consts)."""
    nz = (cand != 0)
    nzb = nz.astype(jnp.bfloat16)
    tri_l = tri_ref[...].astype(jnp.bfloat16)  # [128, 128] lane prefix
    lanepre = jax.lax.dot_general(
        nzb, tri_l, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [R, 128], values <= 128
    rowcnt = lanepre[:, 127:128]  # [R, 1] f32
    rowcum = _prefix_rows(rowcnt, R, tri_ref)  # [R, 1], <= R*128
    base = rowcum - rowcnt  # exclusive
    count = rowcum[R - 1 :, 0:1]  # [1, 1]
    jj = jax.lax.broadcasted_iota(
        jnp.int32, (R, capc), 1).astype(jnp.float32)
    oh = (base <= jj) & (jj < rowcum)  # [R, capc] one-hot over rows
    ohf = oh.astype(jnp.float32)
    rowidx = jax.lax.broadcasted_iota(
        jnp.int32, (R, capc), 0).astype(jnp.float32)
    row_j = jnp.sum(ohf * rowidx, axis=0, keepdims=True)  # [1, capc]
    base_j = jnp.sum(ohf * base, axis=0, keepdims=True)
    within_j = jax.lax.broadcasted_iota(
        jnp.int32, (1, capc), 1).astype(jnp.float32) - base_j
    rowpre_j = jax.lax.dot_general(
        oh.astype(jnp.bfloat16), lanepre, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [capc, 128]
    lane_j = jnp.sum(
        (rowpre_j <= within_j.reshape(capc, 1)).astype(jnp.float32),
        axis=1).reshape(1, capc)
    pos_j = row_j * 128.0 + lane_j  # [1, capc] f32
    return count, pos_j


def _compact_epilogue(cand, R: int, capc: int, tri_ref):
    """In-kernel candidate compaction: cand [R, 128] (nonzero = candidate)
    -> int32 [1 + capc//128, 128] block: row 0 lane 0 = cell count, rows
    1.. = the first `capc` candidate positions (cell-local, row*128+lane,
    rank order).

    Replaces the XLA-side two-level sparse extraction for the fused
    ungated pipeline: at adversarial candidate rates the hit-chunk
    gather + rank searchsorted there cost ~2.8 s per 512 MB (measured
    v5e, iid noise, 524288-chunk capacity — XLA take runs ~20 ns/elem),
    while this epilogue is a handful of small MXU contractions per cell
    (~1-2 ms per 512 MB at capc=128) and leaves only O(n_cells) arrays
    for the XLA side. All matmuls take 0/1 or <=256-valued bf16 inputs
    (exact) with f32 accumulation (exact below 2^24).

    Delegates the rank selection to _rank_select and assembles the
    output block."""
    count, pos_f = _rank_select(cand, R, capc, tri_ref)
    pos_j = pos_f.astype(jnp.int32)  # [1, capc]
    # assemble the output block without scatter (Mosaic has no scatter):
    # row 0 = count at lane 0, rows 1.. = positions, zero padding to the
    # sublane-aligned block height
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == 0
    count_row = jnp.where(lane0, count.astype(jnp.int32), 0)
    pad = _capc_rows(capc) - 1 - capc // 128
    parts = [count_row, pos_j.reshape(capc // 128, 128)]
    if pad:
        parts.append(jnp.zeros((pad, 128), jnp.int32))
    return jnp.concatenate(parts, axis=0)


def _capc_rows(capc: int) -> int:
    """Output block rows per cell: 1 count row + capc//128 position rows,
    padded to a multiple of 8 (Mosaic requires sublane-divisible
    blocks)."""
    need = 1 + capc // 128
    return -(-need // 8) * 8


CAPC2 = 128  # per-cell confirmed-hit capacity of the in-kernel confirm
KCONF_MIN_MEAN = 4.0  # mean candidates/cell below which the XLA confirm
# is cheaper than the kconfirm epilogue's flat per-cell cost
KCONF_MAX_CAPC = 512  # beyond this the epilogue's [capc, T/128] one-hots
# and [capc, capc] transposes stop fitting VMEM comfortably
KCONF_TABLE_BUDGET = 6 << 20  # bytes of f32 hash-table planes in VMEM
_KCONF_MERGE_LIMIT = 1 << 20  # max G*capc*t_pad elements for the merged
# block-diagonal probe (its one-hot probes every group's rows per query:
# bf16 one-hot + int32 iota stay under ~6 MB VMEM at this bound; bigger
# tables take the per-group loop)


def _t_col(v, n: int, eye):
    """[1, n] f32 row vector -> [n, 1] column, MXU-transposed (Mosaic has
    no cheap sublane<->lane relayout; one identity matmul is). Exact for
    integer values below 2^24. `eye` is the [n, n] f32 identity constant
    operand (_rank_consts)."""
    return jax.lax.dot_general(
        eye, v, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # [n, 1]


def _t_row(v, n: int, eye):
    """[n, 1] f32 column -> [1, n] row (same identity-matmul trick)."""
    return jax.lax.dot_general(
        v, eye, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # [1, n]


import os as _os

# dev-only bisect knob: 0 = rank-select only, 1 = +tail extraction,
# 2 = +sig probes, 3 = full (second compaction). NOT a product surface
# and deliberately NOT an environment variable: stages < 3 return dummy
# confirmed counts, so an env knob left exported would silently drop
# every kconfirm match (review finding, round 5). Probe scripts set
# `teddy._KCONF_STAGE = n` explicitly BEFORE the first kernel build
# (the kernel factories are lru-cached, so toggling after a kernel has
# been traced uses the stale kernel).
_KCONF_STAGE = 3


def _confirm_epilogue(data, cand_or, R: int, capc: int, groups_meta,
                      tab_refs, cell_base):
    """In-kernel hash confirm over the cell's compacted candidates.

    Everything the XLA-side _hash_confirm_stage does — 8 tail-byte
    extraction, the avalanche hash, direct-mapped open-addressed slot
    probes — runs here against VMEM-resident tables, replacing ~30 XLA
    takes per candidate slot (~20 ns each on v5e — the measured iid
    bottleneck, BASELINE.md round-4 cost model) with MXU one-hot
    contractions and VPU mul-reduces at full plane width. Byte/table
    values ride exact integer arithmetic: bf16 matmuls for 0/1 x
    (<=256)-valued operands, f32 matmuls for 16-bit table halves
    (reference analogue: do_confirm_fdr + FDRConfirm hash tables,
    src/fdr/fdr.c:330, src/fdr/fdr_confirm.h:78 — redesigned from a
    scalar loop into plane-wide tensor contractions).

    data       : [R+1, 128] int32 corpus bytes (row 0 = halo)
    cand_or    : [R, 128] candidate plane (nonzero = candidate end)
    groups_meta: ((cl, mlo, mhi, T, probes), ...) compile-time constants
    tab_refs   : (tri128, eye_capc, eye128) constant operands
                 (_rank_consts) followed by (gconst [Gpad, 128] int32,
                 hi_all [t_pad, 128] bf16, lo_all [t_pad, 128] bf16) —
                 per-group constants + the stacked hi/lo halves of the
                 slot sigs (see dev_confirm_planes)
    cell_base  : scalar int32, absolute byte offset of this cell

    Returns an [8, 128] int32 block per cell:
      row 0 lane 0 = raw candidate count (capc learning)
      row 0 lane 1 = raw confirmed count (CAPC2 overflow detection)
      row 1 = confirmed cell-local positions (CAPC2 slots, rank order)
      row 2 = confirmed class words (slot & 0xFFFFF, as emitted by the
              XLA confirm — host expand/verify is unchanged)
    """
    lane_sel0 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    tri_ref, eyec_ref, eye1_ref = tab_refs[:3]
    tab_refs = tab_refs[3:]
    eye_c = eyec_ref[...]  # [capc, capc] f32
    eye_1 = eye1_ref[...]  # [128, 128] f32

    def _early(count_v, conf_v):
        cr = jnp.where(
            lane_sel0 == 0, count_v.astype(jnp.int32),
            jnp.where(lane_sel0 == 1, conf_v.astype(jnp.int32), 0))
        return jnp.concatenate(
            [cr, jnp.zeros((7, 128), jnp.int32)], axis=0)

    count, pos_f = _rank_select(cand_or, R, capc, tri_ref)
    if _KCONF_STAGE == 0:
        return _early(count, count * 0)
    pos_c = _t_col(pos_f, capc, eye_c)  # [capc, 1] f32
    pos_i = pos_c.astype(jnp.int32)  # values < R*128 (exact)
    row = pos_i >> 7
    lane = pos_i & 127
    # tail window rows via one-hot row-select matmuls (bytes <= 255 are
    # bf16-exact; body row r's predecessor is data[r], itself data[r+1])
    rio = jax.lax.broadcasted_iota(jnp.int32, (capc, R), 1)
    ohr = (rio == row).astype(jnp.bfloat16)  # [capc, R]
    prev = jax.lax.dot_general(
        ohr, data[:-1].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [capc, 128]
    cur = jax.lax.dot_general(
        ohr, data[1:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # tail bytes pos-k: lane >= k reads cur[lane-k], else prev wraps
    # (cell 0's halo is the corpus's leading zero row, reproducing the
    # XLA path's zero bytes before offset 0)
    # tail bytes: two 8-lane dynamic gathers (cur and prev rows) replace
    # sixteen one-hot mul-reduce passes — the epilogue is VPU-pass-bound
    # and each [capc, 128] pass costs ~capc/8 vreg-rows
    # (Mosaic lowers take_along_axis only with a full-shape index plane)
    if _os.environ.get("HS_KCONF_TAILS", "gather") == "gather":
        kf = jax.lax.broadcasted_iota(jnp.int32, (capc, 128), 1)
        rel = lane - jnp.minimum(kf, 7)  # lanes 0..7 = the tail offsets
        cur8 = jnp.take_along_axis(cur, jnp.maximum(rel, 0), axis=1)
        prev8 = jnp.take_along_axis(prev, rel & 127, axis=1)
        tbm = jnp.where(rel >= 0, cur8, prev8)[:, :8]  # [capc, 8] f32
    else:
        lio0 = jax.lax.broadcasted_iota(jnp.int32, (capc, 128), 1)
        tbc = []
        for k in range(8):
            oc = (lio0 == (lane - k)).astype(jnp.float32)
            op = (lio0 == (128 + (lane - k))).astype(jnp.float32)
            tbc.append(jnp.sum(cur * oc + prev * op, axis=1,
                               keepdims=True))
        tbm = jnp.concatenate(tbc, axis=1)  # [capc, 8] f32
    tbT = jax.lax.dot_general(
        tbm, eye_c, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # [8, capc]
    tb = [tbT[k:k + 1, :].astype(jnp.int32).astype(jnp.uint32)
          for k in range(8)]  # each [1, capc]
    lo_w = tb[7] | (tb[6] << 8) | (tb[5] << 16) | (tb[4] << 24)
    hi_w = tb[3] | (tb[2] << 8) | (tb[1] << 16) | (tb[0] << 24)
    abs_pos_r = pos_f.astype(jnp.int32) + cell_base  # [1, capc]
    alive_r = (jax.lax.broadcasted_iota(jnp.int32, (1, capc), 1)
               < count.astype(jnp.int32))  # [1, capc]
    if _KCONF_STAGE == 1:
        # keep the tail stage live: fold the words into the dummy count
        dummy = jnp.max((lo_w ^ hi_w).astype(jnp.int32) & 1,
                        axis=1, keepdims=True)
        return _early(count, dummy)

    overflow = jnp.zeros((1, 1), jnp.int32)
    lio = jax.lax.broadcasted_iota(jnp.int32, (capc, 128), 1)
    _dbg_gi = int(_os.environ.get("HS_KCONF_DEBUG", "0") or "0")
    _dbg_row = _dbg_sig = _dbg_m = jnp.zeros((1, capc), jnp.float32)
    cls_cols = []  # each [capc, 1] f32: matched global slot index + 1
    G = len(groups_meta)
    gconst_ref, hi_all_ref, lo_all_ref = tab_refs[:3]
    t_pad = hi_all_ref.shape[0]
    if G * capc * t_pad <= _KCONF_MERGE_LIMIT:
        # merged probe: the G groups' hashes ride [G, capc] planes (one
        # VPU pass each instead of one PER GROUP — sublanes are free up
        # to 8), one transpose matmul carries all 3G columns at once,
        # and ONE one-hot [G*capc, t_pad] block-diagonal contraction
        # against the stacked sig planes replaces the 2G row-select
        # matmuls. Same arithmetic as the per-group path below; the
        # epilogue is issue-bound (~30 passes/cell measured), so fewer,
        # larger ops are the lever (BASELINE.md round-5 anatomy).
        gc = gconst_ref[...]
        mlo_g = gc[:G, 0:1].astype(jnp.uint32)
        mhi_g = gc[:G, 1:2].astype(jnp.uint32)
        tmask_g = gc[:G, 2:3].astype(jnp.uint32)
        rowbase_g = gc[:G, 3:4]
        clm1_g = gc[:G, 4:5]
        lo = lo_w & mlo_g  # [G, capc]
        hi = hi_w & mhi_g
        hu = (lo * jnp.uint32(0x9E3779B1)) ^ (hi * jnp.uint32(0x85EBCA6B))
        # avalanche finalizer — must mirror lit_runtime._avalanche32
        hu = hu ^ (hu >> 15)
        hu = hu * jnp.uint32(0x2C1B3C6D)
        hu = hu ^ (hu >> 13)
        row_abs = (hu & tmask_g).astype(jnp.int32) + rowbase_g
        sig_r = (hu >> 16).astype(jnp.int32)  # [G, capc] 16-bit
        okf = (alive_r & (abs_pos_r >= clm1_g)).astype(jnp.int32)
        pack = jnp.concatenate(
            [row_abs.astype(jnp.float32), sig_r.astype(jnp.float32),
             okf.astype(jnp.float32)], axis=0)  # [3G, capc]
        packT = jax.lax.dot_general(
            eye_c, pack, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # [capc, 3G]
        # stack the per-group columns along sublanes. Mosaic cannot
        # concatenate lane-SLICED [capc, 1] columns (their layouts carry
        # different lane offsets: "offset mismatch on non-concat
        # dimension"), so each column is first materialized at full lane
        # width by a broadcast op (compare for the one-hot, +zeros for
        # the value planes) and the full-width results are concatenated.
        trio_c = jax.lax.broadcasted_iota(jnp.int32, (capc, t_pad), 1)
        zed = jnp.zeros((capc, 128), jnp.float32)
        oh_parts, row_parts, sig_parts, ok_parts = [], [], [], []
        for g in range(G):
            rcol = packT[:, g:g + 1]
            oh_parts.append(trio_c == rcol.astype(jnp.int32))
            row_parts.append(zed + rcol)
            sig_parts.append(zed + packT[:, G + g:G + g + 1])
            ok_parts.append(zed + packT[:, 2 * G + g:2 * G + g + 1])
        Q = G * capc
        ohT = jnp.concatenate(oh_parts, axis=0).astype(jnp.bfloat16)
        row_bc = jnp.concatenate(row_parts, axis=0)  # [Q, 128] f32
        sig_bc = jnp.concatenate(sig_parts, axis=0)
        ok_bc = jnp.concatenate(ok_parts, axis=0)
        sel_hi = jax.lax.dot_general(
            ohT, hi_all_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [Q, 128]
        sel_lo = jax.lax.dot_general(
            ohT, lo_all_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sig_i = sig_bc.astype(jnp.int32)
        m = (ok_bc > 0.5) & (sel_hi.astype(jnp.int32) == ((sig_i >> 8) + 1)) \
            & (sel_lo.astype(jnp.int32) == (sig_i & 255))  # [Q, 128]
        lio_q = jax.lax.broadcasted_iota(jnp.int32, (Q, 128), 1)
        cnt = jnp.sum(m.astype(jnp.int32), axis=1, keepdims=True)
        overflow = jnp.maximum(overflow, jnp.max(cnt) - 2)
        # first and last matching lanes (two same-sig classes in one
        # row is ~1e-5; three or more raises the overflow flag and the
        # scan re-runs on the XLA confirm family)
        lane1 = jnp.min(jnp.where(m, lio_q, 128), axis=1, keepdims=True)
        lane2 = jnp.max(jnp.where(m, lio_q, -1), axis=1, keepdims=True)
        ri = row_bc[:, 0:1].astype(jnp.int32)
        gidx1 = ri * 128 + lane1 + 1  # global slot index + 1
        gidx2 = ri * 128 + lane2 + 1
        c1 = jnp.where(cnt >= 1, gidx1, 0).astype(jnp.float32)
        c2 = jnp.where(cnt >= 2, gidx2, 0).astype(jnp.float32)
        for g in range(G):
            cls_cols.append(c1[g * capc:(g + 1) * capc])
            cls_cols.append(c2[g * capc:(g + 1) * capc])
        if _os.environ.get("HS_KCONF_DEBUG"):
            rb = groups_meta[_dbg_gi][4] // 128
            _dbg_row = row_abs[_dbg_gi:_dbg_gi + 1, :] \
                .astype(jnp.float32) - rb
            _dbg_sig = sig_r[_dbg_gi:_dbg_gi + 1, :].astype(jnp.float32)
            _dbg_m = _t_row(
                cnt[_dbg_gi * capc:(_dbg_gi + 1) * capc].astype(
                    jnp.float32), capc, eye_c)
    else:
        # per-group fallback (big-table databases: the merged one-hot
        # probes EVERY group's rows per query, so past the element limit
        # the compare-pass bytes outgrow the saved issue overhead)
        for gi, (cl, mlo, mhi, t_rows, base) in enumerate(groups_meta):
            lo = lo_w & jnp.uint32(mlo)
            hi = hi_w & jnp.uint32(mhi)
            hu = (lo * jnp.uint32(0x9E3779B1)) ^ \
                (hi * jnp.uint32(0x85EBCA6B))
            # avalanche finalizer — must mirror lit_runtime._avalanche32
            hu = hu ^ (hu >> 15)
            hu = hu * jnp.uint32(0x2C1B3C6D)
            hu = hu ^ (hu >> 13)
            row_r = (hu & jnp.uint32(t_rows - 1)).astype(jnp.int32)
            sig_r = (hu >> 16).astype(jnp.int32)  # [1, capc] 16-bit
            okf = (alive_r & (abs_pos_r >= cl - 1)).astype(jnp.int32)
            # one transpose back to column form for row-select compares
            pack = jnp.concatenate(
                [row_r.astype(jnp.float32), sig_r.astype(jnp.float32),
                 okf.astype(jnp.float32)], axis=0)  # [3, capc]
            packT = jax.lax.dot_general(
                eye_c, pack, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)  # [capc, 3]
            row_g = packT[:, 0:1].astype(jnp.int32)
            sig = packT[:, 1:2].astype(jnp.int32)
            ok_g = packT[:, 2:3] > 0.5
            rb = base // 128
            trio = jax.lax.broadcasted_iota(
                jnp.int32, (capc, t_rows), 1)
            ohT = (trio == row_g).astype(jnp.bfloat16)
            sel_hi = jax.lax.dot_general(
                ohT, hi_all_ref[rb:rb + t_rows, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [capc, 128]
            sel_lo = jax.lax.dot_general(
                ohT, lo_all_ref[rb:rb + t_rows, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = ok_g & (sel_hi.astype(jnp.int32) == ((sig >> 8) + 1)) \
                & (sel_lo.astype(jnp.int32) == (sig & 255))  # [capc, 128]
            mi = m.astype(jnp.int32)
            cnt = jnp.sum(mi, axis=1, keepdims=True)  # sig matches in row
            overflow = jnp.maximum(overflow, jnp.max(cnt) - 2)
            # first and last matching lanes (two same-sig classes in one
            # row is ~1e-5; three or more raises the overflow flag and
            # the scan re-runs on the XLA confirm family)
            lane1 = jnp.min(jnp.where(m, lio, 128), axis=1, keepdims=True)
            lane2 = jnp.max(jnp.where(m, lio, -1), axis=1, keepdims=True)
            if _os.environ.get("HS_KCONF_DEBUG") and gi == _dbg_gi:
                _dbg_row = _t_row(packT[:, 0:1], capc, eye_c)
                _dbg_sig = _t_row(packT[:, 1:2], capc, eye_c)
                _dbg_m = _t_row(cnt.astype(jnp.float32), capc, eye_c)
            gidx1 = base + row_g * 128 + lane1 + 1  # global slot idx + 1
            gidx2 = base + row_g * 128 + lane2 + 1
            cls_cols.append(jnp.where(
                cnt >= 1, gidx1, 0).astype(jnp.float32))
            cls_cols.append(jnp.where(
                cnt >= 2, gidx2, 0).astype(jnp.float32))
    if _KCONF_STAGE == 2:
        dummy = jnp.sum(sum(cls_cols), keepdims=True).reshape(1, 1)
        return _early(count, dummy % 2.0)
    n_planes = len(cls_cols)
    assert n_planes <= 128
    # second compaction over the [capc, n_planes] hit grid (slots as
    # sublanes, probe planes as lanes — no relayout): rank-select the
    # confirmed grid positions, then one-hot value-select cls and pos
    grid = jnp.concatenate(
        cls_cols + [jnp.zeros((capc, 128 - n_planes), jnp.float32)],
        axis=1)  # [capc, 128]
    conf_cnt, gpos_f = _rank_select(grid, capc, CAPC2, tri_ref)
    gpos = _t_col(gpos_f, CAPC2, eye_1).astype(jnp.int32)  # [CAPC2, 1]
    grow = gpos >> 7  # owning candidate slot
    glane = gpos & 127  # probe plane
    q_i = jax.lax.broadcasted_iota(jnp.int32, (CAPC2, 1), 0)
    qok = q_i < conf_cnt.astype(jnp.int32)
    gio = jax.lax.broadcasted_iota(jnp.int32, (CAPC2, capc), 1)
    ohg = (gio == grow).astype(jnp.float32)
    selg = jax.lax.dot_general(
        ohg, grid, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # [CAPC2, 128]
    lio2 = jax.lax.broadcasted_iota(jnp.int32, (CAPC2, 128), 1)
    ohl2 = (lio2 == glane).astype(jnp.float32)
    cls_q = jnp.sum(selg * ohl2, axis=1, keepdims=True)  # [CAPC2, 1]
    pos_q = jax.lax.dot_general(
        ohg, pos_c, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # [CAPC2, 1]
    cls_row = _t_row(jnp.where(qok, cls_q, 0.0), CAPC2,
                     eye_1).astype(jnp.int32)
    pos_row = _t_row(jnp.where(qok, pos_q, 0.0), CAPC2,
                     eye_1).astype(jnp.int32)
    lane_sel = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    # >2 same-sig matches in one bucket row would exceed the two slot
    # planes: report it as a confirmed-capacity overflow so the scan
    # re-runs on the XLA confirm family (finish sets _kconfirm_off)
    conf_rep = conf_cnt.astype(jnp.int32) + jnp.where(
        overflow > 0, CAPC2 + 1, 0)
    counts_row = jnp.where(
        lane_sel == 0, count.astype(jnp.int32),
        jnp.where(lane_sel == 1, conf_rep, 0))
    if _os.environ.get("HS_KCONF_DEBUG"):
        # dump intermediates into the spare rows (dev-only bisect aid)
        dbg = [
            tbT[0:1, :128].astype(jnp.int32),           # byte at pos
            tbT[7:8, :128].astype(jnp.int32),           # byte at pos-7
            (_dbg_row.astype(jnp.int32))[:, :128],      # dbg-group row_g
            (_dbg_sig.astype(jnp.int32))[:, :128],      # dbg-group sig
            (_dbg_m.astype(jnp.int32))[:, :128],        # dbg-group cnt
        ]
        return jnp.concatenate(
            [counts_row, pos_row, cls_row] + dbg, axis=0)
    return jnp.concatenate(
        [counts_row, pos_row, cls_row, jnp.zeros((5, 128), jnp.int32)],
        axis=0)  # [8, 128]


@functools.lru_cache(maxsize=64)
def _make_kernel_fused_classes(M: int, W: int, R: int, hi_cls: int = -1,
                               capc: int = 0, kconf: tuple = ()):
    """Class-remap variant of the fused filter kernel (see _class_split):
    the data plane is remapped byte->class once, each suffix offset
    aligns the single class plane with one roll, and each (m, w) mask
    lookup is one gather over a <=128-entry class table. Candidate
    output is byte-identical to the byte-table kernel.

    With `capc` > 0 the kernel emits per-cell compacted candidate
    positions (see _compact_epilogue) instead of the candidacy plane;
    with `kconf` (the groups_meta tuple) it additionally hash-confirms
    the candidates in-kernel (see _confirm_epilogue) — the kernel then
    takes two extra f32 table refs per group."""
    def kernel(halo_ref, body_ref, b2c_ref, cmasks_ref, *rest):
        if kconf:
            tab_refs, out_c = rest[:-2], (rest[-2], rest[-1])
        else:
            tab_refs, out_c = rest[:-1], rest[-1]
        data = jnp.concatenate(
            [halo_ref[0:1, :], body_ref[...]], axis=0
        ).astype(jnp.int32)  # [R+1, 128]
        cls = _remap_classes(data, b2c_ref, hi_cls)
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
                    cmasks_ref[m, w, :][None, :], cm.shape
                )
                v = jnp.take_along_axis(tab, cm, axis=1)
                acc[w] = v if acc[w] is None else (acc[w] & v)
        cand_or = acc[0]
        for w in range(1, W):
            cand_or = cand_or | acc[w]
        if kconf:
            out_c, plane_c = out_c
            cell_base = pl.program_id(0) * (R * 128)
            out_c[...] = _confirm_epilogue(
                data, cand_or, R, capc, kconf, tab_refs, cell_base)
            # candidacy plane sidecar: cells whose candidate count
            # exceeds capc re-confirm on the XLA stage (kconf_combine)
            plane_c[...] = (cand_or != 0).astype(jnp.uint8)
        elif capc:
            out_c[...] = _compact_epilogue(cand_or, R, capc, tab_refs[0])
        else:
            out_c[...] = (cand_or != 0).astype(jnp.uint8)
    return kernel


def _remap_classes(data, b2c_ref, hi_cls: int):
    """byte plane -> class-id plane. `hi_cls >= 0` is the measured fast
    path when every byte >= 128 falls in ONE class (true for ASCII-heavy
    rulesets): one remap gather + a constant select instead of two
    gathers and three selects — each lane-gather costs ~0.55 ms/256 MB
    on v5e, and the where-chains are comparable."""
    is_lo = data < 128
    lo_t = jnp.broadcast_to(b2c_ref[0, :][None, :], data.shape)
    if hi_cls >= 0:
        return jnp.where(
            is_lo,
            jnp.take_along_axis(lo_t, jnp.where(is_lo, data, 0), axis=1),
            hi_cls,
        )
    hi_t = jnp.broadcast_to(b2c_ref[1, :][None, :], data.shape)
    return jnp.where(
        is_lo,
        jnp.take_along_axis(lo_t, jnp.where(is_lo, data, 0), axis=1),
        jnp.take_along_axis(hi_t, jnp.where(is_lo, 0, data - 128), axis=1),
    )


@functools.lru_cache(maxsize=64)
def _make_kernel_gate(M: int, R: int, hi_cls: int = -1):
    """Single-word gate kernel: class remap + M one-word mask lookups,
    emitting a uint8 gate-candidacy plane.

    The gate tables (compiler.teddy.build_gate_masks) are a per-position
    superset of the full filter, so a row whose plane slice is all-zero
    provably holds no candidate end; the full-width kernel then runs
    only on flagged rows. Cost: 1-2 remap + M table gathers per vreg
    versus the full kernel's 2 + M*W. Row flags are reduced OUTSIDE the
    kernel by an XLA bandwidth-rate reduce — an in-kernel cross-lane
    max measured ~3 ms/256 MB on v5e versus ~1 ms for the plane
    store + XLA reduce."""
    def kernel(halo_ref, body_ref, b2c_ref, gmask_ref, out_c):
        data = jnp.concatenate(
            [halo_ref[0:1, :], body_ref[...]], axis=0
        ).astype(jnp.int32)  # [R+1, 128]
        cls = _remap_classes(data, b2c_ref, hi_cls)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        acc = None
        for m in range(M):
            if m == 0:
                cm = cls[1:, :]
            else:
                r = pltpu.roll(cls, m, axis=1)
                cm = jnp.where(lane >= m, r[1:, :], r[:-1, :])
            tab = jnp.broadcast_to(gmask_ref[m, :][None, :], cm.shape)
            v = jnp.take_along_axis(tab, cm, axis=1)
            acc = v if acc is None else (acc & v)
        out_c[...] = (acc != 0).astype(jnp.uint8)
    return kernel


@functools.lru_cache(maxsize=64)
def _make_kernel_fused(M: int, W: int, R: int, capc: int = 0,
                       kconf: tuple = ()):
    """Fused-path variant: emits only the cand_or plane.

    cand_or is the OR across bucket words (the fused confirm never needs
    per-bucket identity — the hash confirm checks exact tail bytes, and a
    real occurrence always fires its own bucket). The candidate tail
    bytes are gathered from the HBM-resident corpus at the (sparse)
    extracted positions instead of being materialized as packed planes:
    at production candidate rates (~1e-5/byte) that is a few thousand
    random gathers versus 2 GB of dense plane writes per 256 MB scanned
    (reference: do_confirm_fdr reads the tail from the scan pointer it
    already holds, src/fdr/fdr.c:330).

    The per-suffix-offset alignment rolls are applied to the byte-index
    planes once per offset m (2 rolls) rather than to every bucket word's
    gather result (W rolls), so the kernel's vector-op count is dominated
    by the irreducible M*W*2 table gathers."""
    def kernel(halo_ref, body_ref, masks_ref, *rest):
        if kconf:
            tab_refs, out_c = rest[:-2], (rest[-2], rest[-1])
        else:
            tab_refs, out_c = rest[:-1], rest[-1]
        data = jnp.concatenate(
            [halo_ref[0:1, :], body_ref[...]], axis=0
        ).astype(jnp.int32)  # [R+1, 128]
        is_lo = data < 128
        idx_lo = jnp.where(is_lo, data, 0)
        idx_hi = jnp.where(is_lo, 0, data - 128)
        sel_lo = is_lo.astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        acc = [None] * W
        for m in range(M):
            if m == 0:
                il, ih = idx_lo[1:, :], idx_hi[1:, :]
                sl = is_lo[1:, :]
            else:
                rl = pltpu.roll(idx_lo, m, axis=1)
                rh = pltpu.roll(idx_hi, m, axis=1)
                rs = pltpu.roll(sel_lo, m, axis=1)
                pick = lane >= m
                il = jnp.where(pick, rl[1:, :], rl[:-1, :])
                ih = jnp.where(pick, rh[1:, :], rh[:-1, :])
                sl = jnp.where(pick, rs[1:, :], rs[:-1, :]) != 0
            for w in range(W):
                lo_t = jnp.broadcast_to(masks_ref[m, w, :128][None, :],
                                        il.shape)
                hi_t = jnp.broadcast_to(masks_ref[m, w, 128:][None, :],
                                        ih.shape)
                lo = jnp.take_along_axis(lo_t, il, axis=1)
                hi = jnp.take_along_axis(hi_t, ih, axis=1)
                v = jnp.where(sl, lo, hi)
                acc[w] = v if acc[w] is None else (acc[w] & v)
        cand_or = acc[0]
        for w in range(1, W):
            cand_or = cand_or | acc[w]
        if kconf:
            out_c, plane_c = out_c
            cell_base = pl.program_id(0) * (R * 128)
            out_c[...] = _confirm_epilogue(
                data, cand_or, R, capc, kconf, tab_refs, cell_base)
            plane_c[...] = (cand_or != 0).astype(jnp.uint8)
        elif capc:
            out_c[...] = _compact_epilogue(cand_or, R, capc, tab_refs[0])
        else:
            # uint8 candidacy plane: the confirm stage re-derives
            # everything from the corpus, so only the nonzero positions
            # matter — a 1-byte plane quarters the HBM write+read
            # traffic of the extraction
            out_c[...] = (cand_or != 0).astype(jnp.uint8)
    return kernel


@functools.lru_cache(maxsize=64)
def _jit_filter(M: int, W: int, n_cells: int, capacity: int, cap_chunks: int,
                interpret: bool):
    R = ROWS_PER_CELL

    def run(rows_all, masks, n_valid):
        body = rows_all[1:]
        outs = pl.pallas_call(
            _make_kernel(M, W, R),
            interpret=interpret,  # CPU backend (tests) has no Mosaic
            grid=(n_cells,),
            out_shape=tuple(
                jax.ShapeDtypeStruct((n_cells * R, 128), jnp.int32)
                for _ in range(W)
            ),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (i * (R // 8), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, W, 256), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(W)
            ),
        )(rows_all, body, masks)
        outs = outs if isinstance(outs, tuple) else (outs,)
        N = n_cells * R * 128
        return sparse_extract(
            [o.reshape(N) for o in outs], n_valid, capacity, cap_chunks
        )

    return jax.jit(run)


def sparse_extract(flats, n_valid, capacity: int, cap_chunks: int, nz=None,
                   chunk: int = 256):
    """Two-level sparse extraction of nonzero entries from flat planes.

    A flat cumsum+scatter over the whole plane costs ~1.3s/128MB on TPU
    (scatter serializes); instead: cheap per-chunk candidate counts (dense
    reduction), gather only the chunks that hit, then rank→position via
    searchsorted (pure gathers) inside the small gathered set.

    Returns (meta [2]=(total, n_hit_chunks), packed [1+len(flats),
    capacity] = (positions, values...)), packed into two buffers to
    minimize host fetch round trips. Whole chunks past n_valid are
    zeroed; stragglers inside the boundary chunk are rejected by the
    callers' bounds checks.

    With `nz`, candidacy is taken from that plane instead of OR-ing the
    value planes (the fused path's tail-word planes are dense, so their
    OR is not a candidacy signal).
    """
    if nz is None:
        nz = flats[0]
        for f in flats[1:]:
            nz = nz | f
    N = nz.shape[0]
    CHUNK = chunk  # finer chunks: the hit-chunk gather cost per candidate
    # is CHUNK lookups, and XLA gathers run ~130M lookups/s on TPU
    nchunk = N // CHUNK
    chunk_counts = (nz != 0).astype(jnp.int32).reshape(nchunk, CHUNK).sum(axis=1)
    chunk_idx = jnp.arange(nchunk, dtype=jnp.int32)
    chunk_counts = jnp.where(chunk_idx * CHUNK < n_valid, chunk_counts, 0)
    total = jnp.sum(chunk_counts)
    hit = (chunk_counts > 0).astype(jnp.int32)
    n_hit = jnp.sum(hit)
    chit = jnp.cumsum(hit)
    # j-th hit chunk index (clamped for j >= n_hit)
    sel = jnp.minimum(
        jnp.searchsorted(chit, jnp.arange(cap_chunks, dtype=jnp.int32),
                         side="right"),
        nchunk - 1,
    )
    gidx = sel[:, None] * CHUNK + jnp.arange(CHUNK, dtype=jnp.int32)[None, :]
    valid_sel = jnp.arange(cap_chunks, dtype=jnp.int32) < n_hit
    gnz = jnp.take(nz, gidx.reshape(-1), axis=0).reshape(cap_chunks, CHUNK)
    gmask = (gnz != 0).astype(jnp.int32) * valid_sel[:, None].astype(jnp.int32)
    gm_flat = gmask.reshape(-1)
    cum = jnp.cumsum(gm_flat)
    # slot j holds the (j+1)-th candidate's index within the gathered set
    slot_src = jnp.minimum(
        jnp.searchsorted(cum, jnp.arange(capacity, dtype=jnp.int32),
                         side="right"),
        cap_chunks * CHUNK - 1,
    )
    have = jnp.arange(capacity, dtype=jnp.int32) < jnp.minimum(total, capacity)
    src_global = jnp.take(gidx.reshape(-1), slot_src, axis=0)
    pos = jnp.where(have, src_global, 0)
    vals = [
        jnp.where(have, jnp.take(f, src_global, axis=0), 0) for f in flats
    ]
    meta = jnp.stack([total, n_hit])
    packed = jnp.stack([pos] + vals)  # [1+W, capacity]
    return meta, packed


def get_capacity_hint(obj, key: str):
    """Learned match-buffer sizing (reference analogue: scratch sizing).

    Capacity is a jit-shape parameter; overflow retries jump straight to
    the needed power-of-two bucket, and the bucket is remembered on the
    owning database/engine object so subsequent scans compile and run
    exactly once (a fresh kernel shape costs minutes cold through the
    dev tunnel)."""
    if obj is None:
        return None
    return getattr(obj, "_cap_hints", {}).get(key)


def set_capacity_hint(obj, key: str, capacity: int, cap_chunks: int) -> None:
    if obj is None:
        return
    if not hasattr(obj, "_cap_hints"):
        obj._cap_hints = {}
    obj._cap_hints[key] = (capacity, cap_chunks)


def bucket_up(n: int) -> int:
    """Round up to the canonical jit-shape series {2^k, 3*2^(k-1)}:
    1, 2, 3, 4, 6, 8, 12, 16, 24, ... Two shapes per octave with < 50%
    worst-case (~21% mean) padding. Every device scan path pads its
    shape parameter
    (teddy cells, DFA chunk groups, NFA tile groups) to this series so a
    fresh database scanning mixed-size corpora pays a bounded,
    logarithmic number of cold compiles (3-5 min each through the dev
    tunnel) instead of one per distinct length."""
    if n <= 1:
        return 1
    p = 1 << (n - 1).bit_length()  # next power of two >= n
    q = 3 * (p >> 2)
    return q if q >= n else p


def _rows_to_bucket(rows_all):
    """Pad a [1 + n_cells*R, 128] rows array so n_cells lands on the
    bucket series (zero rows past n_valid are rejected by the
    extraction's chunk masking, exactly like the existing end-of-corpus
    cell padding)."""
    R = ROWS_PER_CELL
    n_cells = (int(rows_all.shape[0]) - 1) // R
    b = bucket_up(n_cells)
    if b == n_cells:
        return rows_all
    pad = (b - n_cells) * R
    if isinstance(rows_all, np.ndarray):
        return np.concatenate(
            [rows_all, np.zeros((pad, 128), rows_all.dtype)])
    return jnp.concatenate(
        [rows_all, jnp.zeros((pad, 128), rows_all.dtype)])


def teddy_scan_rows(
    rows_all, masks, n_valid: int, capacity: int = 1 << 14, hint_obj=None
) -> Tuple[int, np.ndarray, np.ndarray]:
    """Filter a device-resident corpus, retrying on capacity overflow.

    `rows_all` is a [1 + n_cells*R, 128] uint8 device array whose first row
    is zero padding (the halo of cell 0); byte i of the corpus lives at
    rows_all[1 + i//128, i%128]. Returns (total, pos[:k], words[:, :k]),
    k = min(total, capacity), with `pos` ascending flat byte indices of
    candidate last-factor bytes.
    """
    M, W = int(masks.shape[0]), int(masks.shape[1])
    rows_all = _rows_to_bucket(rows_all)
    n_cells = (rows_all.shape[0] - 1) // ROWS_PER_CELL
    interpret = jax.default_backend() == "cpu"
    cap_chunks = max(64, capacity // 16)
    hint = get_capacity_hint(hint_obj, "teddy")
    if hint:
        capacity = max(capacity, hint[0])
        cap_chunks = max(cap_chunks, hint[1])
    while True:
        run = _jit_filter(M, W, n_cells, capacity, cap_chunks, interpret)
        meta, packed = run(rows_all, masks, jnp.int32(n_valid))
        total, n_hit = (int(x) for x in np.asarray(meta))
        if total <= capacity and n_hit <= cap_chunks:
            break
        if total > capacity:
            capacity = 1 << (total - 1).bit_length()
        if n_hit > cap_chunks:
            cap_chunks = 1 << (n_hit - 1).bit_length()
    set_capacity_hint(hint_obj, "teddy", capacity, cap_chunks)
    k = min(total, capacity)
    got = np.asarray(packed[:, :k])
    return total, got[0], got[1:]


def corpus_to_rows(corpus: np.ndarray) -> np.ndarray:
    """Host-side layout: flat corpus → padded [1 + n_cells*R, 128] rows."""
    R = ROWS_PER_CELL
    n = corpus.shape[0]
    cell_bytes = R * 128
    n_cells = bucket_up(max(1, -(-n // cell_bytes)))
    padded = np.zeros(128 + n_cells * cell_bytes, dtype=np.uint8)
    padded[128 : 128 + n] = corpus
    return padded.reshape(-1, 128)


def teddy_scan(
    corpus: np.ndarray, masks: np.ndarray, capacity: int, hint_obj=None
) -> Tuple[int, np.ndarray, np.ndarray]:
    """Run the filter over a host uint8 corpus (uploads, then filters)."""
    rows_all = jnp.asarray(corpus_to_rows(corpus))
    return teddy_scan_rows(
        rows_all, jnp.asarray(masks), corpus.shape[0], capacity,
        hint_obj=hint_obj,
    )


# --------------------------------------------------------------------------
# Fused filter + confirm (reference: fdr.c main loop calling
# do_confirm_fdr inline, src/fdr/fdr.c:330,700-790). The device runs the
# teddy filter, extracts candidate positions, gathers each candidate's
# 8-byte tail, and hash-matches it against the factor confirm tables —
# only hash-confirmed (pos, fid) pairs cross the device->host boundary
# (the dev tunnel fetches at ~6 MB/s, so shipping raw candidates at 10k
# scale would dominate the scan).
# --------------------------------------------------------------------------

import weakref as _weakref

# jit-key registry: weak values, so dropping a database releases its
# literal tables (the lru-bounded jit wrappers bound compiled-kernel
# count; without weak refs a long-lived process compiling many
# databases would pin every database's device tables forever)
_LITS = _weakref.WeakValueDictionary()
_NEXT_LIT_KEY = [0]


def _lit_key(lit) -> int:
    if not hasattr(lit, "_teddy_key"):
        lit._teddy_key = _NEXT_LIT_KEY[0]
        _NEXT_LIT_KEY[0] += 1
        _LITS[lit._teddy_key] = lit
    return lit._teddy_key


EXTRACT_CHUNK = 256  # candidate-extraction chunk (bytes per hit-chunk gather)


# per-cell compaction slots: floor / ceiling of the learned capc. Past
# the ceiling (a cell where >1/16 of bytes are candidates) the dense
# sparse_extract family takes over — the epilogue's one-hot contraction
# cost grows linearly with capc while the dense path's is flat.
CAPC_FLOOR = 128
CAPC_MAX = 4096


def filter_confirm_body(groups, M: int, W: int, n_cells: int,
                        cap1: int, cap2: int, interpret: bool,
                        use_classes: bool = False,
                        cap1_chunks: int = None, cap2_chunks: int = None,
                        hi_cls: int = -1, capc: int = 0,
                        kconf_meta: tuple = ()):
    """Traced body of the fused filter+confirm: shared by the
    single-device jit and the shard_map multi-chip path.

    With `use_classes`, the trailing filter-table args are the
    (b2c, cmasks) pair from _class_split instead of the byte masks.

    With `capc` > 0 the filter kernel compacts candidate positions
    per cell in VMEM (_compact_epilogue) and the XLA side only combines
    O(n_cells) counts — the default; `capc` = 0 is the dense-regime
    fallback via the two-level sparse extraction (hit-chunk gathers cost
    work ∝ candidate spread, which loses badly at adversarial rates:
    measured 2.8 s/512 MB at iid noise vs ~40 ms for the compact path).

    The capacities are decoupled: every stage after the filter costs
    work proportional to its cap, so the caller right-sizes them from
    learned observations."""
    R = ROWS_PER_CELL
    if cap1_chunks is None:
        cap1_chunks = max(64, cap1 // 16)
    if cap2_chunks is None:
        cap2_chunks = max(64, cap2 // 16)

    def run(rows_all, n_valid, h_tables, f_tables, *ftabs):
        body = rows_all[1:]
        n_ft = 2 if use_classes else 1
        slots_cls = ftabs[-1] if kconf_meta else None
        kplanes = ftabs[n_ft:-1] if kconf_meta else ftabs[n_ft:]
        ftabs = ftabs[:n_ft]
        if use_classes:
            kernel = _make_kernel_fused_classes(M, W, R, hi_cls, capc,
                                                kconf_meta)
            tab_specs = [
                pl.BlockSpec((8, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, W, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
        else:
            kernel = _make_kernel_fused(M, W, R, capc, kconf_meta)
            tab_specs = [
                pl.BlockSpec((M, W, 256), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
        if kconf_meta:
            # constant rank/transpose planes ride as VMEM operands (the
            # tri plane in bf16 — per-cell f32->bf16 casts are free to
            # skip); hoisted once per executable by jit
            tri_c, eye_c, eye_1 = _rank_consts(capc)
            kplanes = (jnp.asarray(tri_c, dtype=jnp.bfloat16),
                       jnp.asarray(eye_c), jnp.asarray(eye_1)) + \
                tuple(kplanes)
        elif capc:
            tri_c, _eye_c, _eye_1 = _rank_consts(min(capc, 128))
            kplanes = (jnp.asarray(tri_c, dtype=jnp.bfloat16),) + \
                tuple(kplanes)
        for p in kplanes:
            tab_specs.append(
                pl.BlockSpec(tuple(p.shape),
                             (lambda i: (0, 0)),
                             memory_space=pltpu.VMEM))
        in_specs = [
            pl.BlockSpec((8, 128), lambda i: (i * (R // 8), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + tab_specs
        if kconf_meta:
            out, plane = pl.pallas_call(
                kernel,
                interpret=interpret,
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
            )(rows_all, body, *ftabs, *kplanes)
            meta, packed2 = kconf_combine(
                out, plane, rows_all, groups, h_tables, f_tables,
                n_cells, R, capc, cap2, n_valid, slots_cls)
            return meta, packed2
        if capc:
            cp_rows = _capc_rows(capc)
            out = pl.pallas_call(
                kernel,
                interpret=interpret,
                grid=(n_cells,),
                out_shape=jax.ShapeDtypeStruct(
                    (n_cells * cp_rows, 128), jnp.int32),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((cp_rows, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(rows_all, body, *ftabs, *kplanes)
            meta1, pos, have = compact_combine(
                out, n_cells, R, capc, cap1, n_valid)
        else:
            cand_or = pl.pallas_call(
                kernel,
                interpret=interpret,
                grid=(n_cells,),
                out_shape=jax.ShapeDtypeStruct((n_cells * R, 128),
                                               jnp.uint8),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(rows_all, body, *ftabs)
            N = n_cells * R * 128
            meta1, packed1 = sparse_extract(
                [], n_valid, cap1, cap1_chunks, nz=cand_or.reshape(N),
                chunk=EXTRACT_CHUNK,
            )
            pos = packed1[0]  # [cap1] candidate flat positions (0=dead)
            have = (
                jnp.arange(cap1, dtype=jnp.int32)
                < jnp.minimum(meta1[0], cap1)
            )
        meta2, packed2 = _hash_confirm_stage(
            groups, rows_all, pos, have, h_tables, f_tables,
            cap1, cap2, cap2_chunks,
        )
        # one [4] meta buffer = one host fetch round trip (the tunnel
        # costs ~30ms per fetch)
        meta = jnp.concatenate([meta1, meta2])
        return meta, packed2

    return run


# sidecar capacities (static: one extra jit shape would cost minutes
# through the dev tunnel; overflow bumps capc instead — see finish)
SC_CAP = 1024
SC_CH = 256
SC_CAP2 = 512
SC_CH2 = 128


def kconf_combine(out, plane, rows_all, groups, h_tables, f_tables,
                  n_cells: int, R: int, capc: int, cap2: int, n_valid,
                  slots_cls):
    """XLA-side combine for the in-kernel-confirm family: gather the
    per-cell confirmed (pos, slot-index) pairs into one cap2-sized
    packed buffer and resolve slot indexes to class ids (one int32 take
    per CONFIRMED pair against the concatenated bucket-row class
    array). Work here is proportional to cap2 (the learned CONFIRMED
    load, ~matches + ~1/65536-per-row-entry signature false positives)
    — at iid noise that is ~100x below the candidate load the XLA
    confirm used to pay per-take for.

    Overflow-cell SIDECAR: capc is sized to ~2x the MEAN cell load (the
    epilogue's cost scales with capc, and sizing it to the hottest cell
    taxes every cell for one dense region). Cells whose candidate count
    exceeds capc re-confirm through the classic extract + XLA hash
    stage, reading the kernel's candidacy-plane output masked to those
    cells — the first capc candidates confirm twice, which only
    duplicates (cls, pos) pairs the downstream set-dedupe absorbs.

    Returns (meta [6] = (cand_total, cand_max_cell, conf_total,
    conf_max_cell, sidecar_positions, sidecar_confirmed), packed
    [3, cap2 + SC_CAP2]) matching the contract consumed by
    teddy_confirm_finish (hdr=6)."""
    out3 = out.reshape(n_cells, 8, 128)
    cell_idx = jnp.arange(n_cells, dtype=jnp.int32)
    cellok = cell_idx * (R * 128) < n_valid
    cand_c = jnp.where(cellok, out3[:, 0, 0], 0)
    conf_raw = jnp.where(cellok, out3[:, 0, 1], 0)
    meta1 = jnp.stack([jnp.sum(cand_c), jnp.max(cand_c)])
    eff = jnp.minimum(conf_raw, CAPC2)
    cum = jnp.cumsum(eff)
    total2 = cum[n_cells - 1]
    slot = jnp.arange(cap2, dtype=jnp.int32)
    cell_j = jnp.minimum(
        jnp.searchsorted(cum, slot, side="right"), n_cells - 1
    ).astype(jnp.int32)
    within = jnp.minimum(
        slot - (jnp.take(cum, cell_j) - jnp.take(eff, cell_j)),
        CAPC2 - 1)
    flat = out.reshape(-1)
    pos_l = jnp.take(flat, cell_j * (8 * 128) + 128 + within, axis=0)
    gv = jnp.take(flat, cell_j * (8 * 128) + 256 + within, axis=0)
    pos_abs = cell_j * (R * 128) + pos_l
    have = (slot < jnp.minimum(total2, cap2)) & (pos_abs < n_valid) \
        & (gv > 0)
    cls_v = jnp.take(slots_cls,
                     jnp.maximum(gv - 1, 0), axis=0)  # class id + 1
    cls_v = jnp.where(have, cls_v, 0)
    pos_abs = jnp.where(have, pos_abs, 0)
    # sidecar: candidacy plane masked to overflowing cells — behind a
    # cond so the no-overflow common case (every scan at the learned
    # capc, i.e. almost all of them) skips the full-plane extraction
    # pass and the SC_CAP-sized confirm takes entirely
    flagged = (cand_c > capc).astype(jnp.uint8)  # [n_cells]

    def _sidecar(_):
        rowflag = jnp.repeat(flagged, R)  # [n_cells * R]
        masked = plane * rowflag[:, None]
        meta_sc, packed_sc = sparse_extract(
            [], n_valid, SC_CAP, SC_CH, nz=masked.reshape(-1),
            chunk=EXTRACT_CHUNK)
        pos_sc = packed_sc[0]
        have_sc = (jnp.arange(SC_CAP, dtype=jnp.int32)
                   < jnp.minimum(meta_sc[0], SC_CAP))
        m2, p2 = _hash_confirm_stage(
            groups, rows_all, pos_sc, have_sc, h_tables, f_tables,
            SC_CAP, SC_CAP2, SC_CH2)
        return meta_sc[:2], m2, p2

    def _no_sidecar(_):
        return (jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32),
                jnp.zeros((3, SC_CAP2), jnp.int32))

    meta_sc, meta2_sc, packed2_sc = jax.lax.cond(
        jnp.any(flagged > 0), _sidecar, _no_sidecar, 0)
    meta2 = jnp.stack([total2, jnp.max(conf_raw)])
    # sidecar totals AND hit-chunk counts: sparse_extract silently clamps
    # past cap_chunks, so both dimensions must be overflow-checked
    meta = jnp.concatenate(
        [meta1, meta2,
         jnp.stack([meta_sc[0], meta_sc[1], meta2_sc[0], meta2_sc[1]])])
    packed2 = jnp.concatenate(
        [jnp.stack([slot, cls_v, pos_abs]), packed2_sc], axis=1)
    return meta, packed2


def compact_combine(out, n_cells: int, R: int, capc: int, cap1: int,
                    n_valid):
    """XLA-side combine of the per-cell compacted candidate blocks:
    slot rank -> owning cell via a searchsorted over the [n_cells]
    count cumsum (a 32 KB array at bench scale — every heavy per-element
    structure stayed in VMEM inside the kernel).

    Returns (meta1 [total, max_cell_count], pos [cap1] flat candidate
    positions, have [cap1] validity). Cells past n_valid are dropped
    whole; stragglers inside the boundary cell are masked here (the
    kernel never sees n_valid)."""
    cp_rows = _capc_rows(capc)
    out3 = out.reshape(n_cells, cp_rows, 128)
    counts = out3[:, 0, 0]  # [n_cells] int32
    cell_idx = jnp.arange(n_cells, dtype=jnp.int32)
    counts = jnp.where(cell_idx * (R * 128) < n_valid, counts, 0)
    total = jnp.sum(counts)
    maxc = jnp.max(counts) if n_cells else jnp.int32(0)
    # count overflowed slots once so `total` sizes the next cap1 but the
    # packed reads stay in range
    eff = jnp.minimum(counts, capc)
    cum = jnp.cumsum(eff)
    slot = jnp.arange(cap1, dtype=jnp.int32)
    cell_j = jnp.minimum(
        jnp.searchsorted(cum, slot, side="right"), n_cells - 1
    ).astype(jnp.int32)
    within = jnp.minimum(slot - (jnp.take(cum, cell_j) -
                                 jnp.take(eff, cell_j)), capc - 1)
    flat = out3.reshape(-1)
    pos_local = jnp.take(
        flat, cell_j * (cp_rows * 128) + 128 + within, axis=0)
    pos = cell_j * (R * 128) + pos_local
    have = (slot < jnp.minimum(total, cap1)) & (pos < n_valid)
    pos = jnp.where(have, pos, 0)
    meta1 = jnp.stack([total, maxc])
    return meta1, pos, have


def _hash_confirm_stage(groups, rows_all, pos, have, h_tables, f_tables,
                        cap1: int, cap2: int, cap2_chunks: int):
    """Shared confirm tail of the fused pipelines: gather each
    candidate's 8 tail bytes from the corpus, hash-match them against
    the factor confirm tables, and sparse-extract the confirmed
    (class, pos) pairs (reference: do_confirm_fdr reads the tail from
    the scan pointer it already holds, src/fdr/fdr.c:330).

    Cost discipline: every take here runs ~20 ns/element on v5e, and
    the stage's work is cap1 x (takes per candidate): 8 tail-byte
    gathers plus a direct-mapped open-addressed hash probe
    (confirm_device_tables): max-displacement probes (~2-4) instead of
    a log2(F) binary search (~13 dependent gathers at 10k scale). (A
    3-word unaligned-load variant was tried and rejected: a [N, 4]
    operand pads its minor dim to 128 lanes on TPU — 32x the memory.)"""
    # flat byte i lives at rows_all.reshape(-1)[128 + i]; pack the tail
    # into the two little-endian words the hash confirm expects:
    # lo_w = bytes pos-7..pos-4, hi_w = bytes pos-3..pos (newest on top)
    flat = rows_all.reshape(-1)
    tb = []
    for k in range(8):
        src = pos - k
        b = jnp.take(flat, jnp.maximum(src, -128) + 128, axis=0)
        tb.append(jnp.where(src >= 0, b, 0).astype(jnp.uint32))
    lo_w = tb[7] | (tb[6] << 8) | (tb[5] << 16) | (tb[4] << 24)
    hi_w = tb[3] | (tb[2] << 8) | (tb[1] << 16) | (tb[0] << 24)

    cls_planes = []
    pos_planes = []
    for gi, (cl, mlo, mhi, _slots, _dummy, probes) in enumerate(groups):
        lo = lo_w & jnp.uint32(mlo)
        hi = hi_w & jnp.uint32(mhi)
        hu = (lo * jnp.uint32(0x9E3779B1)) ^ (hi * jnp.uint32(0x85EBCA6B))
        # avalanche finalizer — must mirror lit_runtime._avalanche32
        hu = hu ^ (hu >> 15)
        hu = hu * jnp.uint32(0x2C1B3C6D)
        hu = hu ^ (hu >> 13)
        slots = h_tables[gi]  # int32: sig12 << 20 | class id + 1; 0=empty
        T = slots.shape[0]
        i0 = (hu & jnp.uint32(T - 1)).astype(jnp.int32)
        sig = hu >> 20
        ok_g = have & (pos >= cl - 1)
        for k in range(probes):
            idx = (i0 + k) & jnp.int32(T - 1)
            sl = jnp.take(slots, idx).astype(jnp.uint32)
            valid = ok_g & (sl != 0) & ((sl >> 20) == sig)
            cls_planes.append(
                jnp.where(valid, (sl & jnp.uint32(0xFFFFF)).astype(
                    jnp.int32), 0))
            pos_planes.append(jnp.where(valid, pos, 0))
    if cls_planes:
        cls_flat = jnp.concatenate(cls_planes)
        pos_flat = jnp.concatenate(pos_planes)
    else:
        cls_flat = jnp.zeros(cap1, jnp.int32)
        pos_flat = jnp.zeros(cap1, jnp.int32)
    return sparse_extract(
        [cls_flat, pos_flat], cls_flat.shape[0], cap2, cap2_chunks
    )


def filter_confirm_body_gated(groups, M: int, W: int, n_cells: int,
                              caps: tuple, interpret: bool,
                              hi_cls: int = -1):
    """Two-stage gated filter + confirm (the round-4 kernel family).

    Stage 1 runs the single-word gate kernel (2 + M gathers/vreg, ~3x
    the full kernel's byte rate) over the WHOLE corpus, producing one
    flag per 128-byte row. Stage 2 gathers each surviving row together
    with its predecessor (the full kernel's cross-row shifts need up to
    M-1 bytes of lookback) into a packed buffer and runs the existing
    byte-exact class kernel on just those rows; candidate positions map
    back through the survivor row list, and the confirm stage is shared
    with the ungated body. Measured on the 10k ruleset: the gate's
    candidate rate is within ~6% of the full filter's on iid printable
    noise and identical on low-entropy corpora, so stage 2 typically
    touches a few percent of the corpus.

    Reference analogue: the two-tier economics of Teddy's cheap first
    pass feeding exact confirm (src/fdr/teddy.c:248-283) and FDR's
    zone-bounded rescans (src/fdr/fdr.c:45-133) — redesigned so tier 1
    is a full-depth hot/cold split gate (see
    compiler.teddy.build_gate_masks) instead of a nibble approximation,
    which saturates at 10k-pattern density.

    Packed-layout correctness: survivor rows are interleaved
    (pred, row) pairs, so inside the packed kernel every ODD row's
    cross-row shift reads its true predecessor; even rows' outputs are
    computed against an unrelated neighbor and masked off. Cell-halo
    contamination at packed-cell boundaries only ever feeds even rows,
    which are masked.
    """
    R = ROWS_PER_CELL
    capK, cap1, cap1_chunks, cap2, cap2_chunks = caps
    assert (2 * capK) % R == 0, "capK must pack whole cells"
    n_cells2 = (2 * capK) // R

    def run(rows_all, n_valid, h_tables, f_tables, b2c, cmasks, gcm):
        body = rows_all[1:]
        n_rows = n_cells * R
        gate_plane = pl.pallas_call(
            _make_kernel_gate(M, R, hi_cls),
            interpret=interpret,
            grid=(n_cells,),
            out_shape=jax.ShapeDtypeStruct((n_rows, 128), jnp.uint8),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (i * (R // 8), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(rows_all, body, b2c, gcm)
        # row flags by XLA bandwidth-rate reduce (an in-kernel cross-lane
        # max measured ~3x the plane-store + reduce cost on v5e)
        flags = jnp.max(gate_plane, axis=1).astype(jnp.int32)
        # row r covers corpus bytes [r*128, r*128+128); int32 is safe:
        # n_valid (and thus r*128) is < 2^31 for any rows layout built
        # by corpus_to_rows
        row_idx = jnp.arange(n_rows, dtype=jnp.int32)
        flags = jnp.where(row_idx * 128 < n_valid, flags, 0)
        cum = jnp.cumsum(flags)
        K = cum[-1]
        # survivor body-row indices: rank k -> k-th flagged row (cost
        # scales with the LEARNED capK, not the corpus — a clean corpus
        # keeps this stage trivial)
        rs = jnp.minimum(
            jnp.searchsorted(
                cum, jnp.arange(1, capK + 1, dtype=jnp.int32), side="left"
            ),
            n_rows - 1,
        ).astype(jnp.int32)
        # body row b = rows_all[1+b]; its predecessor is rows_all[b]
        idx2 = jnp.stack([rs, rs + 1], axis=1).reshape(-1)
        packed_rows = jnp.take(rows_all, idx2, axis=0)  # [2*capK, 128]
        rows2 = jnp.concatenate(
            [jnp.zeros((1, 128), jnp.uint8), packed_rows], axis=0
        )
        cand = pl.pallas_call(
            _make_kernel_fused_classes(M, W, R, hi_cls),
            interpret=interpret,
            grid=(n_cells2,),
            out_shape=jax.ShapeDtypeStruct((2 * capK, 128), jnp.uint8),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (i * (R // 8), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, W, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(rows2, rows2[1:], b2c, cmasks)
        pr = jnp.arange(2 * capK, dtype=jnp.int32)
        valid_row = ((pr % 2) == 1) & ((pr // 2) < jnp.minimum(K, capK))
        cand = cand * valid_row[:, None].astype(jnp.uint8)
        meta1, packed1 = sparse_extract(
            [], 2 * capK * 128, cap1, cap1_chunks,
            nz=cand.reshape(-1), chunk=EXTRACT_CHUNK,
        )
        q = packed1[0]  # positions in PACKED space (odd rows only)
        have = (
            jnp.arange(cap1, dtype=jnp.int32)
            < jnp.minimum(meta1[0], cap1)
        )
        # map packed -> original: packed pair q//256, survivor row
        # rs[pair], lane q%128
        orig_row = jnp.take(rs, jnp.minimum(q // 256, capK - 1), axis=0)
        pos = jnp.where(have, orig_row * 128 + (q % 128), 0)
        meta2, packed2 = _hash_confirm_stage(
            groups, rows_all, pos, have, h_tables, f_tables,
            cap1, cap2, cap2_chunks,
        )
        # rewrite the pair positions to original coordinates happened
        # before confirm, so packed2 already carries original positions
        meta = jnp.concatenate(
            [meta1, meta2, jnp.stack([K, jnp.int32(0)])]
        )
        return meta, packed2

    return run


PREFETCH = 16384  # packed-pair prefix cap: the prefix fetched with the
# meta is min(PREFETCH, cap2), and cap2 is learned at ~2x the max
# observed confirmed load — so low-rate databases ship a few KB and
# high-rate ones (16384-stream rounds confirm ~6k pairs) ship the whole
# set in the ONE batched fetch. Anything past the prefix costs a
# separate ~30 ms tunnel round trip PER HANDLE (measured: the
# 16384-stream rounds spent 165 of 220 ms in those serial re-fetches at
# the old 2048 cap); 16384 pairs = 196 KB = ~33 ms of bandwidth worst
# case, paid only by databases whose learned cap2 is that large.


def dev_filter_tables(lit):
    """Upload-once device tables for the fused filter+confirm: the
    filter tables ((b2c, cmasks) when the alphabet compresses, else the
    byte masks) plus the confirm hash/class tables. Cached on the lit
    object (the dev tunnel's host->device path is slow; these are
    immutable per database)."""
    from ..runtime.lit_runtime import confirm_device_tables

    if not hasattr(lit, "_dev_tables"):
        groups = confirm_device_tables(lit)
        split = _class_split(lit.masks)
        if split is not None:
            ftabs = tuple(jnp.asarray(x) for x in split)
        else:
            ftabs = (jnp.asarray(lit.masks),)
        lit._dev_tables = (
            ftabs,
            tuple(jnp.asarray(g[3]) for g in groups),
            tuple(jnp.asarray(g[4]) for g in groups),
        )
    return lit._dev_tables


def dev_confirm_planes(lit):
    """Bucket-row confirm hash tables for the in-kernel confirm, or None
    when they don't fit the VMEM budget (cached on the lit object).

    The XLA confirm probes an open-addressed table one slot (one take)
    at a time, so it fights displacement; the kernel's one-hot
    row-select matmul fetches a whole 128-lane row per contraction, so
    the natural layout is BUCKET ROWS: an entry lives anywhere within
    row (hash & (rows-1)) — placement inside the row is free, rows
    overflow only past 128 entries (never at the ~40% loads the sizing
    targets; the build doubles rows if one ever does). ONE contraction
    per group replaces the probe loop entirely — this is what makes the
    in-kernel confirm beat the XLA takes (a direct port of the
    linear-probe table cost t_rows x probes matmuls; measured 268M
    f32 MACs/cell on the 10k ruleset's 262144-slot group).

    Per group two bf16 sig planes [t_rows, 128] hold the 12-bit
    signature split into 6-bit halves (bf16 is integer-exact to 256;
    the high half stores +1 so 0 = empty). Classes stay OUT of VMEM:
    the kernel emits the matching slot's global index, and the XLA side
    resolves class ids with one int32 take per CONFIRMED pair from the
    concatenated `slots_cls` array.

    Returns (groups_meta, planes, slots_cls): groups_meta =
    ((cl, mlo, mhi, t_rows, base), ...) trace-time constants."""
    if hasattr(lit, "_kconf_planes"):
        return lit._kconf_planes
    from ..runtime.lit_runtime import _avalanche32, _confirm_index

    packed, _flen = _confirm_index(lit)
    metas = []
    planes = []
    cls_parts = []
    base = 0
    next_cls = 0
    for (cl, mask64, vals, _fids, _long) in packed:
        shift = np.uint64(8 * (8 - cl))
        mask_f = int(mask64) << int(shift)
        mlo = mask_f & 0xFFFFFFFF
        mhi = (mask_f >> 32) & 0xFFFFFFFF
        uvals = np.unique(vals << shift)
        F = len(uvals)
        # class ids must match confirm_device_tables' numbering (the
        # host expand tables are shared): both enumerate np.unique order
        cids = np.arange(next_cls, next_cls + F, dtype=np.int64)
        next_cls += F
        lo = (uvals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (uvals >> np.uint64(32)).astype(np.uint32)
        hm = _avalanche32(
            (lo * np.uint32(0x9E3779B1)) ^ (hi * np.uint32(0x85EBCA6B)))
        sig = (hm >> np.uint32(16)).astype(np.int64)
        t_rows = 8
        while t_rows * 80 < F:  # target <= ~62% row load
            t_rows *= 2
        while True:
            rows_i = (hm & np.uint32(t_rows - 1)).astype(np.int64)
            order = np.argsort(rows_i, kind="stable")
            lane = np.zeros(F, np.int64)
            fill = np.zeros(t_rows, np.int64)
            ok = True
            for j in order.tolist():
                r = rows_i[j]
                if fill[r] >= 128:
                    ok = False
                    break
                lane[j] = fill[r]
                fill[r] += 1
            if ok:
                break
            t_rows *= 2
        hi6 = np.zeros((t_rows, 128), np.float32)
        lo6 = np.zeros((t_rows, 128), np.float32)
        cls_p = np.zeros(t_rows * 128, np.int32)
        hi6[rows_i, lane] = (sig >> 8) + 1  # 1..256; 0 = empty
        lo6[rows_i, lane] = sig & 255
        cls_p[rows_i * 128 + lane] = cids + 1
        metas.append((int(cl), int(mlo), int(mhi), int(t_rows),
                      int(base)))
        planes.append(hi6.astype(np.float32))
        planes.append(lo6.astype(np.float32))
        cls_parts.append(cls_p)
        base += t_rows * 128
    n_bytes = sum(p.size * 2 for p in planes)  # bf16 on device
    if n_bytes > KCONF_TABLE_BUDGET or 2 * len(metas) > 128 \
            or base >= (1 << 24):
        lit._kconf_planes = None
        return None
    # stacked table form: ALL groups' hi/lo sig planes concatenated
    # along rows (group g occupies rows base//128 .. +t_rows), padded to
    # a lane-aligned row count — the epilogue probes every group with
    # ONE block-diagonal one-hot contraction against these two planes
    # instead of 2 matmuls per group (the measured epilogue bottleneck
    # is op-issue count, not MACs; BASELINE.md round-5 cost anatomy)
    t_rows_total = base // 128
    t_pad = -(-max(t_rows_total, 8) // 128) * 128
    hi_all = np.zeros((t_pad, 128), np.float32)
    lo_all = np.zeros((t_pad, 128), np.float32)
    for gi, (_cl, _mlo, _mhi, tr, b) in enumerate(metas):
        rb = b // 128
        hi_all[rb:rb + tr] = planes[2 * gi]
        lo_all[rb:rb + tr] = planes[2 * gi + 1]
    # per-group scalar constants as one int32 VMEM plane (lane 0 = mlo
    # bits, 1 = mhi bits, 2 = row mask, 3 = row base, 4 = cl - 1):
    # building them in-kernel would cost a per-group where-chain per cell
    G = len(metas)
    g_pad = -(-max(G, 1) // 8) * 8
    gconst = np.zeros((g_pad, 128), np.int32)
    def _i32(v: int) -> int:  # uint32 bit pattern as a signed int32
        return int(v) - (1 << 32) if int(v) >= (1 << 31) else int(v)

    for gi, (cl, mlo, mhi, tr, b) in enumerate(metas):
        gconst[gi, 0] = _i32(mlo)
        gconst[gi, 1] = _i32(mhi)
        gconst[gi, 2] = tr - 1
        gconst[gi, 3] = b // 128
        gconst[gi, 4] = cl - 1
    lit._kconf_planes = (
        tuple(metas),
        (jnp.asarray(gconst),
         jnp.asarray(hi_all, dtype=jnp.bfloat16),
         jnp.asarray(lo_all, dtype=jnp.bfloat16)),
        jnp.asarray(np.concatenate(cls_parts)) if cls_parts
        else jnp.zeros(1, jnp.int32),
    )
    return lit._kconf_planes


def _hi_class(lit) -> int:
    """Class id shared by ALL bytes >= 128 under the full masks' remap,
    or -1 (selects the one-gather remap fast path; ASCII-heavy rulesets
    map every high byte to one dead class)."""
    split = _class_split(lit.masks)
    if split is None:
        return -1
    hi = np.unique(np.asarray(split[0])[1])
    return int(hi[0]) if len(hi) == 1 else -1


def dev_gate_table(lit):
    """[M, 128] int32 gate class table for the two-stage filter, or
    None. The gate bits are ORs of full-mask bucket bits, so the gate
    value is constant within every byte class of the FULL masks — the
    gate kernel reuses the same b2c remap and indexes this table by
    class id."""
    if getattr(lit, "gate_masks", None) is None:
        return None
    if not hasattr(lit, "_dev_gate"):
        split = _class_split(lit.masks)
        if split is None:
            lit._dev_gate = None  # no shared remap: gate disabled
        else:
            b2c, _ = split
            inv = np.concatenate([b2c[0], b2c[1]])  # byte -> class id
            rep = np.zeros(128, np.int64)  # class id -> representative byte
            for b in range(255, -1, -1):
                rep[inv[b]] = b
            gcm = lit.gate_masks[:, 0, rep]  # [M, 128] int32
            lit._dev_gate = jnp.asarray(np.ascontiguousarray(gcm))
    return lit._dev_gate


@functools.lru_cache(maxsize=64)
def _jit_filter_confirm(lit_key: int, M: int, W: int, n_cells: int,
                        caps: tuple, interpret: bool,
                        use_classes: bool, gated: bool = False,
                        dense: bool = False, kconfirm: bool = False):
    from ..runtime.lit_runtime import confirm_device_tables

    lit = _LITS[lit_key]
    groups = confirm_device_tables(lit)
    hi_cls = _hi_class(lit) if use_classes else -1
    if gated:
        body = filter_confirm_body_gated(groups, M, W, n_cells, caps,
                                         interpret, hi_cls=hi_cls)
        cap2 = caps[3]
    else:
        cap1, c1ch, cap2, c2ch = caps
        kconf_meta = ()
        if kconfirm:
            kconf_meta = dev_confirm_planes(lit)[0]
        body = filter_confirm_body(groups, M, W, n_cells, cap1, cap2,
                                   interpret, use_classes=use_classes,
                                   cap1_chunks=c1ch, cap2_chunks=c2ch,
                                   hi_cls=hi_cls,
                                   capc=0 if dense else c1ch,
                                   kconf_meta=kconf_meta)
    pre = min(PREFETCH, cap2)

    def run(rows_all, n_valid, h_tables, f_tables, *ftabs):
        meta, packed2 = body(rows_all, n_valid, h_tables, f_tables,
                             *ftabs)
        # ship meta + a pair prefix in ONE buffer: scans whose confirmed
        # set fits the prefix finish in a single ~30ms fetch round trip.
        # The kconfirm family's sidecar band [cap2, cap2+SC_CAP2) rides
        # along whole (6 KB) so an active sidecar costs no extra trip.
        parts = [meta, packed2[:, :pre].reshape(-1)]
        if kconfirm:
            parts.append(packed2[:, cap2:].reshape(-1))
        combined = jnp.concatenate(parts)
        return combined, packed2

    return jax.jit(run)


def _p2(n: int) -> int:
    return 1 << max(0, n - 1).bit_length()


# observed-count floors keeping every post-filter stage's work
# proportional to the real candidate load, not a static worst case
_CAP_FLOORS = (1024, 512, 1024, 256)


def _caps_for(lit, capacity: int) -> tuple:
    """(cap1, cap1_chunks_or_capc, cap2, cap2_chunks) for the next
    ungated dispatch.

    Learned from the running max of observed loads: every stage after
    the filter costs work proportional to these caps (tail gathers,
    hash probes), so right-sizing them to ~2x the observed load is
    worth a one-time recompile (reference analogue: scratch sized at
    compile from engine counts).

    Slot 1 is the per-cell compaction capacity `capc` (observed as the
    max per-cell candidate count) in the default compact family, or the
    hit-chunk budget in the dense fallback (`lit._dense_extract`, set
    once a cell ever exceeded CAPC_MAX)."""
    if getattr(lit, "_dense_extract", False):
        obs = getattr(lit, "_cap_obs", None)
        if obs is None:
            return (max(capacity, _CAP_FLOORS[0]),
                    max(capacity // 4, _CAP_FLOORS[1]),
                    max(capacity // 4, _CAP_FLOORS[2]),
                    max(capacity // 16, _CAP_FLOORS[3]))
        return tuple(
            max(f, _p2(2 * o)) for f, o in zip(_CAP_FLOORS, obs)
        )
    obs = getattr(lit, "_cap_obs_c", None)
    if obs is None:
        return (max(capacity, _CAP_FLOORS[0]), CAPC_FLOOR,
                max(capacity // 4, _CAP_FLOORS[2]),
                max(capacity // 16, _CAP_FLOORS[3]))
    # cap1 margin is 1.25x (not 2x): the confirm stage's takes are
    # proportional to cap1, and candidate totals vary little between
    # same-shape corpora, so the tighter margin halves confirm work
    # whenever the observation lands in the lower half of a p2 bucket
    return (max(_CAP_FLOORS[0], _p2(5 * obs[0] // 4)),
            min(CAPC_MAX, max(CAPC_FLOOR, _p2(2 * obs[1]))),
            max(_CAP_FLOORS[2], _p2(2 * obs[2])),
            max(_CAP_FLOORS[3], _p2(2 * obs[3])))


def _observe_caps(lit, t1, h1, t2, h2, dense: bool) -> None:
    key = "_cap_obs" if dense else "_cap_obs_c"
    obs = getattr(lit, key, (0, 0, 0, 0))
    setattr(lit, key,
            tuple(max(a, b) for a, b in zip(obs, (t1, h1, t2, h2))))


# gated-path floors: (capK survivor rows, cap1, cap1_chunks, cap2,
# cap2_chunks); capK stays a multiple of 256 so survivor pairs pack
# whole kernel cells (2*capK % ROWS_PER_CELL == 0)
_CAP_FLOORS_GATED = (512, 1024, 512, 1024, 256)

# Family selection: the gated path's survivor machinery (rank
# searchsorted + row pair gathers + packed rescan) costs work
# proportional to the learned capK, so it only pays off while few rows
# survive the gate. Measured on v5e (512 MB, 10k ruleset): structured
# corpus ~0.02% row survival -> 15.5 GB/s; iid printable noise ~4.2%
# row survival -> capK 524288 and ~3.5 s/scan (0.15 GB/s), while the
# ungated full filter holds its corpus-independent ~9.6 GB/s kernel
# rate. Databases therefore remember the worst gate survival they have
# seen and switch to the ungated family past this fraction (reference
# analogue: FDR's flood detection demoting the fast path on adversarial
# inputs, src/fdr/flood_runtime.h).
GATE_ROW_FRAC = 1.0 / 64


def _gate_viable(lit) -> bool:
    return getattr(lit, "_gate_rate", 0.0) <= GATE_ROW_FRAC


def _observe_gate_rate(lit, k_rows: int, n_body_rows: int) -> None:
    rate = k_rows / max(1, n_body_rows)
    if rate > getattr(lit, "_gate_rate", 0.0):
        lit._gate_rate = rate


def _caps_for_gated(lit, capacity: int) -> tuple:
    obs = getattr(lit, "_cap_obs_g", None)
    if obs is None:
        return (max(512, _p2(capacity // 32)),
                max(capacity, _CAP_FLOORS_GATED[1]),
                max(capacity // 4, _CAP_FLOORS_GATED[2]),
                max(capacity // 4, _CAP_FLOORS_GATED[3]),
                max(capacity // 16, _CAP_FLOORS_GATED[4]))
    return tuple(
        max(f, _p2(2 * o)) for f, o in zip(_CAP_FLOORS_GATED, obs)
    )


def _observe_caps_gated(lit, k_rows, t1, h1, t2, h2) -> None:
    obs = getattr(lit, "_cap_obs_g", (0, 0, 0, 0, 0))
    lit._cap_obs_g = tuple(
        max(a, b) for a, b in zip(obs, (k_rows, t1, h1, t2, h2))
    )


def teddy_confirm_scan(
    corpus: np.ndarray, lit, capacity: int = 1 << 14
) -> Tuple[np.ndarray, np.ndarray]:
    """Device filter + hash confirm over a host corpus (uploads first)."""
    return teddy_confirm_scan_rows(
        jnp.asarray(corpus_to_rows(corpus)), lit, corpus.shape[0], capacity
    )


def teddy_confirm_start(rows_all, lit, n_valid: int,
                        capacity: int = 1 << 14):
    """Dispatch the fused device filter+confirm without waiting.

    Returns an opaque handle for teddy_confirm_finish. Dispatch is async
    (XLA queues the work); callers overlap several scans by starting
    them all before finishing the first — the per-dispatch tunnel round
    trip then rides under the next scan's device compute.
    """
    ftabs, h_tables, f_tables = dev_filter_tables(lit)
    M, W = int(lit.masks.shape[0]), int(lit.masks.shape[1])
    rows_all = _rows_to_bucket(rows_all)
    n_cells = (rows_all.shape[0] - 1) // ROWS_PER_CELL
    interpret = jax.default_backend() == "cpu"
    key = _lit_key(lit)

    gcm = dev_gate_table(lit)
    gated = gcm is not None and len(ftabs) == 2 and _gate_viable(lit)
    dense = False
    kc = False
    if gated:
        caps = _caps_for_gated(lit, capacity)
        run = _jit_filter_confirm(key, M, W, n_cells, caps, interpret,
                                  True, gated=True)
        combined, packed2 = run(
            rows_all, jnp.int32(n_valid), h_tables, f_tables,
            *ftabs, gcm
        )
    else:
        dense = bool(getattr(lit, "_dense_extract", False))
        caps = _caps_for(lit, capacity)
        # the in-kernel confirm pays a flat per-cell epilogue and wins
        # only at high candidate rates (XLA-confirm cost is ~35 takes
        # per candidate SLOT; at low rates the learned cap1 is tiny and
        # those takes are cheaper than the epilogue's VPU passes) — so
        # it engages once the observed mean cell load crosses the line
        mean = getattr(lit, "_kc_mean", None)
        kc = ((getattr(lit, "_kconfirm_force", False)
               or (mean is not None and mean >= KCONF_MIN_MEAN))
              and not dense and caps[1] <= KCONF_MAX_CAPC
              and not getattr(lit, "_kconfirm_off", False)
              and dev_confirm_planes(lit) is not None)
        if kc:
            # in-kernel confirm: per-cell confirmed capacity is the
            # fixed CAPC2, so the overflow check reads caps[3] := CAPC2.
            # The epilogue's cost scales with capc (its one-hot planes
            # and transposes are [capc, ...]), so capc sizes to ~2.2x
            # the MEAN cell load, not the hottest cell — overflowing
            # cells re-confirm through the XLA sidecar (kconf_combine),
            # and a sidecar overflow bumps _kc_force_capc (finish)
            mean = getattr(lit, "_kc_mean", None)
            capc = caps[1]
            if mean is not None:
                capc = min(KCONF_MAX_CAPC,
                           max(32, _p2(int(2.2 * mean) + 1)))
            capc = min(KCONF_MAX_CAPC,
                       max(capc, getattr(lit, "_kc_force_capc", 0)))
            caps = (caps[0], capc, caps[2], CAPC2)
            run = _jit_filter_confirm(key, M, W, n_cells, caps,
                                      interpret, len(ftabs) == 2,
                                      kconfirm=True)
            _metas, planes, slots_cls = dev_confirm_planes(lit)
            combined, packed2 = run(
                rows_all, jnp.int32(n_valid), h_tables, f_tables,
                *ftabs, *planes, slots_cls
            )
        else:
            run = _jit_filter_confirm(key, M, W, n_cells, caps,
                                      interpret, len(ftabs) == 2,
                                      dense=dense)
            combined, packed2 = run(
                rows_all, jnp.int32(n_valid), h_tables, f_tables, *ftabs
            )
    return (lit, rows_all, n_valid, caps, combined, packed2, dense,
            gated, kc)


def teddy_confirm_finish(handle, got: np.ndarray = None,
                         host_corpus: np.ndarray = None,
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Fetch a started scan's confirmed pairs. Returns hash-matched
    (fid_array, pos_array) pairs — callers must exact-verify with
    runtime.lit_runtime.verify_pairs.

    `got` optionally supplies the already-fetched combined buffer (see
    teddy_confirm_fetch_many). Capacity overflow with `host_corpus`
    given falls back to the host filter+confirm for THIS scan — zero
    new kernel shapes on the overflow path (a fresh shape costs minutes
    through the dev tunnel); the observed load still teaches the next
    dispatch its right size. Without a host corpus the scan
    re-dispatches at the learned shape."""
    from ..runtime.lit_runtime import expand_confirm_classes

    (lit, rows_all, n_valid, caps, combined, packed2, dense, gated,
     kconfirm) = handle
    while True:
        if gated:
            capK, cap1, c1ch, cap2, c2ch = caps
            hdr = 6
        else:
            cap1, c1ch, cap2, c2ch = caps
            capK, hdr = 0, (8 if kconfirm else 4)
        pre = min(PREFETCH, cap2)
        if got is None:
            got = np.asarray(combined)  # ONE fetch: meta + pair prefix
        t1, h1, t2, h2 = (int(x) for x in got[:4])
        # record the observed load: the next dispatch right-sizes every
        # cap to ~2x the running max (chunk capacities overflow
        # independently of the totals — spread candidates hit the chunk
        # budget at one per chunk, and sparse_extract clamps past it)
        if gated:
            k_rows = int(got[4])
            _observe_gate_rate(lit, k_rows, rows_all.shape[0] - 1)
            if _gate_viable(lit):
                _observe_caps_gated(lit, k_rows, t1, h1, t2, h2)
            # a valid result is used even when the rate just crossed the
            # family threshold — the switch applies from the next start
            ok = (t1 <= cap1 and t2 <= cap2 and h1 <= c1ch
                  and h2 <= c2ch and k_rows <= capK)
        else:
            # compact family: h1 = max per-cell candidate count; a cell
            # past CAPC_MAX demotes the database to the dense fallback
            if not dense and h1 > CAPC_MAX:
                lit._dense_extract = True
            _observe_caps(lit, t1, h1, t2,
                          0 if kconfirm else h2, dense)
            # mean cell load drives the kconfirm-vs-XLA family choice
            n_cells = (rows_all.shape[0] - 1) // ROWS_PER_CELL
            mean = t1 / max(1, n_cells)
            lit._kc_mean = max(getattr(lit, "_kc_mean", 0.0), mean)
            if kconfirm:
                if h2 > c2ch:
                    # a cell confirmed more than CAPC2 hits: the
                    # in-kernel confirm cannot grow its per-cell
                    # buffer — this match density wants the XLA confirm
                    lit._kconfirm_off = True
                t_sc, h_sc = int(got[4]), int(got[5])
                sc2, h_sc2 = int(got[6]), int(got[7])
                # candidate overflow per cell is HANDLED (sidecar); ok
                # requires the sidecar itself stayed within its static
                # capacities (totals AND hit-chunk counts — extraction
                # clamps silently past either) and the confirmed sets fit
                sc_ok = (t_sc <= SC_CAP and h_sc <= SC_CH
                         and sc2 <= SC_CAP2 and h_sc2 <= SC_CH2)
                ok = t2 <= cap2 and h2 <= c2ch and sc_ok
                if not ok and not sc_ok:
                    # too many overflow cells at this capc: grow capc
                    # toward the hottest cell; a db already at the cap
                    # falls back to the XLA confirm family
                    force = min(KCONF_MAX_CAPC, _p2(5 * h1 // 4))
                    if force <= getattr(lit, "_kc_force_capc", 0) \
                            or force <= c1ch:
                        lit._kconfirm_off = True
                    else:
                        lit._kc_force_capc = force
            else:
                ok = (t1 <= cap1 and t2 <= cap2 and h1 <= c1ch
                      and h2 <= c2ch)
        if ok:
            break
        if host_corpus is not None:
            from ..runtime.lit_runtime import confirm_candidates
            from ..runtime.smallwrite import teddy_filter_host

            pos, words = teddy_filter_host(host_corpus, lit.masks)
            return confirm_candidates(
                lit, host_corpus, np.zeros(1, np.int64), pos, words)
        handle = teddy_confirm_start(rows_all, lit, n_valid)
        (lit, rows_all, n_valid, caps, combined, packed2, dense,
         gated, kconfirm) = handle
        got = None
    k = min(t2, cap2)
    sc2 = min(int(got[6]), SC_CAP2) if kconfirm else 0
    if k + sc2 == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    prefix = got[hdr:hdr + 3 * pre].reshape(3, pre)
    parts = [prefix[:, :min(k, pre)]]
    if k > pre:
        parts.append(np.asarray(packed2[:, pre:k]))
    if sc2:
        # the sidecar band [cap2, cap2+SC_CAP2) rides in the prefix
        sc_band = got[hdr + 3 * pre:].reshape(3, SC_CAP2)
        parts.append(sc_band[:, :sc2])
    pairs = np.concatenate(parts, axis=1)
    cls = pairs[1].astype(np.int64) - 1
    pos = pairs[2].astype(np.int64)
    keep = cls >= 0
    return expand_confirm_classes(lit, cls[keep], pos[keep])


def teddy_confirm_fetch_many(handles):
    """Fetch several started scans' combined (meta + pair prefix)
    buffers in ONE device->host round trip.

    The dev tunnel costs ~30 ms of latency per fetch regardless of size;
    batch result collection amortizes that single round trip across a
    whole pipeline of scans (hsbench analogue: repeated corpus scans
    whose results are aggregated, doc/dev-reference/tools.rst). Returns
    a list of per-handle fetched buffers to pass to
    teddy_confirm_finish(handle, got=...); scans whose buffers
    overflowed are re-dispatched individually by the finish call.
    """
    import jax.numpy as jnp

    if not handles:
        return []
    sizes = [int(h[4].shape[0]) for h in handles]
    stacked = np.asarray(jnp.concatenate([h[4] for h in handles]))
    outs = []
    off = 0
    for s in sizes:
        outs.append(stacked[off:off + s])
        off += s
    return outs


def teddy_confirm_scan_rows(
    rows_all, lit, n_valid: int, capacity: int = 1 << 14
) -> Tuple[np.ndarray, np.ndarray]:
    """Device filter + hash confirm over a device-resident rows layout.

    Returns hash-matched (fid_array, pos_array) pairs — callers must
    exact-verify with runtime.lit_runtime.verify_pairs.
    """
    return teddy_confirm_finish(
        teddy_confirm_start(rows_all, lit, n_valid, capacity)
    )
