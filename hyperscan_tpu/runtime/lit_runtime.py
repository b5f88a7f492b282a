"""Literal-path runtime: Teddy candidates → exact confirm → window validation.

Reference analogues:
- confirm-after-candidate: src/fdr/fdr_confirm.h / do_confirm_fdr
  (src/fdr/fdr.c:330) — candidates from the filter are checked against the
  exact literal bytes before any reporting.
- role validation around a literal hit: the Rose literal program running
  CHECK_* guards then triggering engines (src/rose/program_runtime.c); here
  the role logic is a bounded window re-scan with the pattern's own
  scanning DFA, entered in the float-rest state (or the anchored start
  state when the window touches offset 0).

The device produces sparse candidates; this stage runs on host over numpy
(work is proportional to candidate count, not corpus size — the same
asymmetry the reference exploits with its confirm step).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Set, Tuple

import numpy as np

Record = Tuple[int, int, int, int]  # (block_idx, expr_idx, to_local, from_local)
# from_local is 0 unless the pattern has HS_FLAG_SOM_LEFTMOST, in which
# case it is the leftmost match start (reference: som/som_runtime.c)

# extra window bytes on each side covering Glushkov-synthesized boundary
# context positions (\b / ^m / $ consume one adjacent byte; see
# compiler/glushkov.py _Resolver)
WINDOW_SLACK = 2


def _confirm_index(lit):
    """Hash-style confirm tables (reference: FDRConfirm,
    src/fdr/fdr_confirm.h:78 — hash the masked tail bytes, then exact
    compare). Factors are grouped by (tail_len, tail_mask); each group is
    a sorted array of masked tail values, so confirm is a handful of
    searchsorted/gather ops over ALL candidates instead of a Python loop
    over every factor (78 factors/bucket at the 10k scale)."""
    if hasattr(lit, "_confirm_idx"):
        return lit._confirm_idx
    groups: Dict[Tuple[int, bytes], List[Tuple[int, int]]] = {}
    flen_arr = np.zeros(len(lit.factor_atoms), dtype=np.int64)
    for fid, atoms in enumerate(lit.factor_atoms):
        flen = len(atoms)
        flen_arr[fid] = flen
        cl = min(flen, 8)
        tail = atoms[-cl:]
        masks = bytes(m for (_v, m) in tail)
        vals = bytes((v & m) for (v, m) in tail)
        groups.setdefault((cl, masks), []).append(
            (int.from_bytes(vals, "little"), fid)
        )
    packed = []
    for (cl, masks), items in groups.items():
        items.sort()
        vals = np.asarray([v for (v, _f) in items], dtype=np.uint64)
        fids = np.asarray([f for (_v, f) in items], dtype=np.int64)
        mask64 = np.uint64(int.from_bytes(masks, "little"))
        long_tail = bool((flen_arr[fids] > 8).any())
        packed.append((cl, mask64, vals, fids, long_tail))
    lit._confirm_idx = (packed, flen_arr)
    return lit._confirm_idx


def confirm_device_tables(lit):
    """Confirm tables in device form (reference: FDRConfirm hash tables).

    Each (tail_len, tail_mask) group becomes a sorted int32 hash table:
    h = (lo32 * 0x9E3779B1) ^ (hi32 * 0x85EBCA6B) over the masked tail.
    The device emits hash-matched (pos, fid) pairs; the host re-verifies
    exactly (32-bit collisions and >8-byte factors), so false positives
    only cost fetch bytes, never correctness.
    Returns [(cl, mlo, mhi, h_sorted i32, fid_sorted i32, maxmult)].
    """
    if hasattr(lit, "_confirm_dev"):
        return lit._confirm_dev
    packed, _flen = _confirm_index(lit)
    out = []
    for (cl, mask64, vals, fids, _long) in packed:
        mask64 = int(mask64)
        mlo = np.uint32(mask64 & 0xFFFFFFFF)
        mhi = np.uint32(mask64 >> 32)
        lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (vals >> np.uint64(32)).astype(np.uint32)
        h = ((lo * np.uint32(0x9E3779B1)) ^ (hi * np.uint32(0x85EBCA6B)))
        h = h.view(np.int32)
        order = np.argsort(h, kind="stable")
        h_s = np.ascontiguousarray(h[order])
        f_s = np.ascontiguousarray(fids[order].astype(np.int32))
        # max run of equal hashes bounds the device multiplicity loop
        if len(h_s) == 0:
            maxmult = 0
        else:
            runs = np.flatnonzero(np.diff(h_s) != 0)
            seg = np.diff(np.concatenate([[-1], runs, [len(h_s) - 1]]))
            maxmult = int(seg.max())
        out.append((int(cl), mlo, mhi, h_s, f_s, maxmult))
    lit._confirm_dev = out
    return out


def verify_pairs(
    lit, corpus: np.ndarray, block_starts: np.ndarray,
    fid_a: np.ndarray, p_a: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact host verification of device hash-confirmed (fid, pos)
    pairs: full (value, mask) atom compare + block containment."""
    if fid_a.size == 0:
        return fid_a, p_a
    _packed, flen_arr = _confirm_index(lit)
    blk = np.searchsorted(block_starts, p_a, side="right") - 1
    keep = (p_a - flen_arr[fid_a] + 1) >= block_starts[blk]
    fid_a, p_a = fid_a[keep], p_a[keep]
    if fid_a.size == 0:
        return fid_a, p_a
    good = np.ones(len(fid_a), dtype=bool)
    for fid in np.unique(fid_a):
        atoms = lit.factor_atoms[fid]
        flen = len(atoms)
        m = fid_a == fid
        ps = p_a[m]
        win = corpus[ps[:, None] - flen + 1 + np.arange(flen)[None, :]]
        va = np.asarray([v for (v, _m) in atoms], np.uint8)
        ma = np.asarray([mm for (_v, mm) in atoms], np.uint8)
        good[np.flatnonzero(m)[~np.all((win & ma) == (va & ma), axis=1)]] \
            = False
    return fid_a[good], p_a[good]


def confirm_candidates(
    lit, corpus: np.ndarray, block_starts: np.ndarray,
    pos: np.ndarray, words: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact-match confirm: returns (fid_array, flat_end_pos_array).

    `pos` are flat indices of candidate last-factor bytes. A factor is
    confirmed when its (value, mask) atoms match the corpus bytes and the
    factor lies entirely inside one input block. The filter's bucket
    bitmask is not re-checked: the tail compare is exact, and a real
    factor occurrence always fires its own bucket, so the hash route
    finds exactly the same set.
    """
    z = np.zeros(0, dtype=np.int64)
    n = pos.shape[0]
    if n == 0:
        return z, z
    clen = corpus.shape[0]
    pos = np.asarray(pos, dtype=np.int64)
    pos = pos[pos < clen]  # drop candidates in the padded tail
    if pos.size == 0:
        return z, z
    blk = np.searchsorted(block_starts, pos, side="right") - 1
    bstart = block_starts[blk]
    packed, flen_arr = _confirm_index(lit)

    # gather each candidate's 8-byte tail once (clamped; short-prefix
    # candidates are masked out per group below)
    tail_idx = np.maximum(pos[:, None] - np.arange(7, -1, -1)[None, :], 0)
    tail = corpus[tail_idx].astype(np.uint64)  # [n, 8] oldest..newest

    out_f: List[np.ndarray] = []
    out_p: List[np.ndarray] = []
    shifts = (np.arange(8, dtype=np.uint64) * np.uint64(8))
    for (cl, mask64, vals, fids, long_tail) in packed:
        v = (tail[:, 8 - cl:] << shifts[:cl][None, :]).sum(
            axis=1, dtype=np.uint64
        )
        v &= mask64
        ok = pos >= cl - 1
        i0 = np.searchsorted(vals, v, side="left")
        i1 = np.searchsorted(vals, v, side="right")
        maxmult = int((i1 - i0).max()) if len(vals) else 0
        for k in range(maxmult):
            sel = np.flatnonzero(ok & (i0 + k < i1))
            if sel.size == 0:
                break
            f_sel = fids[i0[sel] + k]
            p_sel = pos[sel]
            # whole factor must lie inside the candidate's block
            starts = p_sel - flen_arr[f_sel] + 1
            okb = starts >= bstart[sel]
            f_sel, p_sel = f_sel[okb], p_sel[okb]
            if long_tail:
                # factors longer than the 8-byte tail: verify the rest
                for fid in np.unique(f_sel[flen_arr[f_sel] > 8]):
                    atoms = lit.factor_atoms[fid]
                    flen = len(atoms)
                    m = f_sel == fid
                    ps = p_sel[m]
                    win = corpus[ps[:, None] - flen + 1
                                 + np.arange(flen)[None, :]]
                    va = np.asarray([v_ for (v_, _m) in atoms], np.uint8)
                    ma = np.asarray([m_ for (_v, m_) in atoms], np.uint8)
                    hit = np.all((win & ma) == va, axis=1)
                    drop = np.flatnonzero(m)[~hit]
                    keep = np.ones(len(f_sel), dtype=bool)
                    keep[drop] = False
                    f_sel, p_sel = f_sel[keep], p_sel[keep]
            out_f.append(f_sel)
            out_p.append(p_sel)
    if not out_f:
        return z, z
    return np.concatenate(out_f), np.concatenate(out_p)


def _merge_spans(spans: List[Tuple[int, int, int]]) -> List[Tuple[int, int, int]]:
    """Merge overlapping (start, end, block_idx) spans within a block."""
    spans.sort()
    merged: List[Tuple[int, int, int]] = []
    for s, e, b in spans:
        if merged and merged[-1][2] == b and s <= merged[-1][1]:
            ps, pe, pb = merged[-1]
            merged[-1] = (ps, max(pe, e), pb)
        else:
            merged.append((s, e, b))
    return merged


def _som_backscan(rev, row: np.ndarray, upto: int,
                  at_block_start: bool) -> int:
    """Leftmost match start (window-relative) for a match whose consumed
    end is `upto` in this window. Reverse-DFA scan (reference analogue:
    nfaBlockExecReverse for SOM, src/som/som_runtime.c rev-NFA ops)."""
    s = int(rev.start_state)
    dead = int(rev.float_state)
    trans = rev.trans
    b2c = rev.byte_to_class
    aidv = rev.accept_id
    best = None
    completed = True
    for j in range(upto - 1, -1, -1):
        s = int(trans[s, int(b2c[int(row[j])])])
        aid = int(aidv[s])
        if aid:
            for (_e, adj) in rev.expand_set(aid):
                c = j + adj
                best = c if best is None else min(best, c)
        if s == dead:
            completed = False
            break
    if completed and at_block_start:
        aid = int(rev.accept_eod_id[s])
        if aid:
            for (_e, adj) in rev.expand_set(aid):
                best = adj if best is None else min(best, adj)
    return 0 if best is None else best


def validate_windows(
    validator, expr_idx: int, corpus: np.ndarray,
    spans: List[Tuple[int, int, int]],
    block_starts: np.ndarray, block_ends: np.ndarray,
    block_anchored: np.ndarray, block_final: np.ndarray,
    eod_only: bool = False,
    som_rev: Tuple = None,
) -> Set[Record]:
    """Lockstep numpy DFA scan over merged windows of one pattern.

    `validator` is a DfaEngine built from the pattern alone; spans are
    (flat_start, flat_end, block_idx), already clamped to block bounds.
    """
    recs: Set[Record] = set()
    if not spans:
        return recs
    spans = _merge_spans(spans)
    nw = len(spans)
    starts = np.asarray([s for (s, _e, _b) in spans], dtype=np.int64)
    ends = np.asarray([e for (_s, e, _b) in spans], dtype=np.int64)
    blks = np.asarray([b for (_s, _e, b) in spans], dtype=np.int64)
    lens = ends - starts
    wmax = int(lens.max())
    win = np.zeros((nw, wmax), dtype=np.uint8)
    for i, (s, e, _b) in enumerate(spans):
        win[i, : e - s] = corpus[s:e]

    b2c = validator.byte_to_class.astype(np.int64)
    trans = validator.trans
    accept_id = validator.accept_id
    accept_eod_id = validator.accept_eod_id
    bs = block_starts[blks]
    be = block_ends[blks]
    # anchored context only when the window starts at the true beginning
    # of the logical data (offset 0 of a block, or of a whole stream)
    states = np.where(
        (starts == bs) & block_anchored[blks],
        validator.start_state,
        validator.float_state,
    ).astype(np.int64)

    cls = b2c[win]  # [nw, wmax]
    for t in range(wmax):
        active = t < lens
        nxt = trans[states, cls[:, t]]
        states = np.where(active, nxt, states)
        if eod_only:  # close-pass: mid-data accepts were already reported
            continue
        aids = np.where(active, accept_id[states], 0)
        for i in np.flatnonzero(aids):
            to_flat = int(starts[i]) + t + 1
            frm = 0
            if som_rev is not None and som_rev[0] is not None:
                j = _som_backscan(
                    som_rev[0], win[i], t + 1,
                    bool((starts[i] == bs[i]) & block_anchored[blks[i]]),
                )
                frm = max(0, int(starts[i]) + j - int(bs[i]))
            for (eidx, adj) in validator.expand_set(int(aids[i])):
                to_local = to_flat + adj - int(bs[i])
                if 0 <= to_local <= int(be[i]) - int(bs[i]):
                    recs.add((int(blks[i]), eidx, to_local, frm))
    # EOD accepts where the window reaches the end of its block (and the
    # block really is the end of the logical data — not a mid-stream chunk)
    at_eod = (ends == be) & block_final[blks]
    eod_aids = np.where(at_eod, accept_eod_id[states], 0)
    for i in np.flatnonzero(eod_aids):
        blen = int(be[i]) - int(bs[i])
        frm = 0
        if som_rev is not None and som_rev[1] is not None:
            j = _som_backscan(
                som_rev[1], win[i], int(lens[i]),
                bool((starts[i] == bs[i]) & block_anchored[blks[i]]),
            )
            frm = max(0, int(starts[i]) + j - int(bs[i]))
        for (eidx, adj) in validator.expand_set(int(eod_aids[i])):
            to_local = blen + adj
            if 0 <= to_local <= blen:
                recs.add((int(blks[i]), eidx, to_local, frm))
    return recs


def scan_literal_path(
    db, corpus: np.ndarray, block_starts: np.ndarray, block_ends: np.ndarray,
    capacity: int = 1 << 14,
    block_anchored: np.ndarray = None, block_final: np.ndarray = None,
    eod_only: bool = False,
    chain_ctx: Dict = None, chain_out: Dict = None,
) -> Set[Record]:
    """Full literal pipeline for one flat corpus of concatenated blocks."""
    lit = db.lit
    if lit is None or corpus.shape[0] == 0:
        return set()

    from .smallwrite import HOST_SCAN_LIMIT, teddy_filter_host

    if corpus.shape[0] <= HOST_SCAN_LIMIT:
        # small-write path: host shift-AND, no device round trip
        pos, words = teddy_filter_host(corpus, lit.masks)
        return finish_literal_scan(
            db, corpus, block_starts, block_ends, pos, words,
            block_anchored=block_anchored, block_final=block_final,
            eod_only=eod_only, chain_ctx=chain_ctx, chain_out=chain_out,
        )
    # device path: fused filter + hash confirm — only (pos, fid) pairs
    # cross the device boundary; exact re-verify on host
    from ..ops.teddy import teddy_confirm_scan

    fid_a, p_a = teddy_confirm_scan(corpus, lit, capacity)
    fid_a, p_a = verify_pairs(lit, corpus, block_starts, fid_a, p_a)
    return finish_confirmed(
        db, corpus, block_starts, block_ends, fid_a, p_a,
        block_anchored=block_anchored, block_final=block_final,
        eod_only=eod_only, chain_ctx=chain_ctx, chain_out=chain_out,
    )


def finish_literal_scan(
    db, corpus: np.ndarray, block_starts: np.ndarray, block_ends: np.ndarray,
    pos: np.ndarray, words: np.ndarray,
    block_anchored: np.ndarray = None, block_final: np.ndarray = None,
    eod_only: bool = False,
    chain_ctx: Dict = None, chain_out: Dict = None,
) -> Set[Record]:
    """Host stages after the device filter: confirm → windows → validate."""
    fid_a, p_a = confirm_candidates(
        db.lit, corpus, block_starts, pos, words
    )
    return finish_confirmed(
        db, corpus, block_starts, block_ends, fid_a, p_a,
        block_anchored=block_anchored, block_final=block_final,
        eod_only=eod_only, chain_ctx=chain_ctx, chain_out=chain_out,
    )


def finish_confirmed(
    db, corpus: np.ndarray, block_starts: np.ndarray,
    block_ends: np.ndarray, fid_a: np.ndarray, p_a: np.ndarray,
    block_anchored: np.ndarray = None, block_final: np.ndarray = None,
    eod_only: bool = False,
    chain_ctx: Dict = None, chain_out: Dict = None,
) -> Set[Record]:
    """Window building + validation over exact-confirmed (fid, pos)
    pairs (reference: the rose literal program stage after confirm)."""
    lit = db.lit
    nb = block_starts.shape[0]
    if block_anchored is None:
        block_anchored = np.ones(nb, dtype=bool)
    if block_final is None:
        block_final = np.ones(nb, dtype=bool)
    recs: Set[Record] = set()
    if fid_a.size == 0:
        return recs

    # vectorized (confirmed factor) x (pattern ref) expansion
    (r_off, r_eidx, r_s2f, r_f2e, r_kind) = _ref_tables(lit)
    cnt = r_off[fid_a + 1] - r_off[fid_a]
    total = int(cnt.sum())
    rep = np.repeat(np.arange(len(fid_a)), cnt)
    within = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    ridx = r_off[fid_a][rep] + within
    eidx_p = r_eidx[ridx]
    kind_p = r_kind[ridx]
    fe_p = p_a[rep] + 1  # factor end (exclusive), flat
    b_p = np.searchsorted(block_starts, p_a, side="right")[rep] - 1
    bs_p = block_starts[b_p]
    be_p = block_ends[b_p]
    ws_p = np.maximum(bs_p, fe_p - r_s2f[ridx] - WINDOW_SLACK)
    we_p = np.minimum(be_p, fe_p + r_f2e[ridx] + WINDOW_SLACK)

    # kind 0: factor == whole match
    if not eod_only:
        m = kind_p == 0
        if m.any():
            for (b, e, to) in zip(
                b_p[m].tolist(), eidx_p[m].tolist(), (fe_p[m] - bs_p[m]).tolist()
            ):
                recs.add((b, e, to, 0))

    # kind 1: window validation — batched for non-SOM validators,
    # per-pattern for SOM / eod_only passes
    m = kind_p == 1
    if m.any():
        som_eidx = set(lit.rev_validators)
        old_path = eod_only or False
        sel = np.flatnonzero(m)
        if som_eidx or eod_only:
            slow = np.asarray(
                [eod_only or (int(e) in som_eidx) for e in eidx_p[sel]],
                dtype=bool,
            )
        else:
            slow = np.zeros(len(sel), dtype=bool)
        fast = sel[~slow]
        if fast.size:
            recs |= validate_windows_batched(
                lit, corpus, eidx_p[fast], ws_p[fast], we_p[fast],
                b_p[fast], block_starts, block_ends, block_anchored,
                block_final,
            )
        windows: Dict[int, List[Tuple[int, int, int]]] = {}
        for i in sel[slow].tolist():
            windows.setdefault(int(eidx_p[i]), []).append(
                (int(ws_p[i]), int(we_p[i]), int(b_p[i]))
            )
        for eidx, spans in windows.items():
            v = lit.validators[eidx]
            recs |= validate_windows(
                v, eidx, corpus, spans, block_starts, block_ends,
                block_anchored, block_final, eod_only=eod_only,
                som_rev=lit.rev_validators.get(eidx),
            )

    # kinds 2/3: chain roles (LEFT <gap> RIGHT)
    pre_windows: Dict[int, List[Tuple[int, int, int]]] = {}
    suf_windows: Dict[int, List[Tuple[int, int, int]]] = {}
    for kindv, target in ((2, pre_windows), (3, suf_windows)):
        mm = kind_p == kindv
        for i in np.flatnonzero(mm).tolist():
            target.setdefault(int(eidx_p[i]), []).append(
                (int(ws_p[i]), int(we_p[i]), int(b_p[i]))
            )
    if (suf_windows or (chain_out is not None and pre_windows)) \
            and not eod_only:
        recs |= _resolve_chains(
            lit, corpus, block_starts, block_ends, block_anchored,
            block_final, pre_windows, suf_windows,
            chain_ctx=chain_ctx, chain_out=chain_out,
        )
    return recs


_KIND_CODE = {"equiv": 0, "win": 1, "pre": 2, "suf": 3}


def _ref_tables(lit):
    """Flattened factor_refs as parallel arrays for vectorized
    candidate-to-window expansion."""
    if hasattr(lit, "_ref_tab"):
        return lit._ref_tab
    off = [0]
    eidx: List[int] = []
    s2f: List[int] = []
    f2e: List[int] = []
    kind: List[int] = []
    for refs in lit.factor_refs:
        for (e, a, b, k) in refs:
            eidx.append(e)
            s2f.append(a)
            f2e.append(b)
            kind.append(_KIND_CODE[k])
        off.append(len(eidx))
    lit._ref_tab = (
        np.asarray(off, dtype=np.int64),
        np.asarray(eidx, dtype=np.int64),
        np.asarray(s2f, dtype=np.int64),
        np.asarray(f2e, dtype=np.int64),
        np.asarray(kind, dtype=np.int64),
    )
    return lit._ref_tab


def _packed_validators(lit):
    """All non-SOM validator DFAs packed into one global table set, so
    every pattern's windows advance in ONE lockstep scan (the device/
    vector analogue of the Rose literal program: per-candidate work no
    longer pays a per-pattern Python round trip).

    Reference analogue: rose program interpretation over literal matches
    (src/rose/program_runtime.c), re-architected as table-packed DFAs.
    """
    if hasattr(lit, "_vpack"):
        return lit._vpack
    eids = sorted(e for e in lit.validators if e not in lit.rev_validators)
    vid_map: Dict[int, int] = {e: i for i, e in enumerate(eids)}
    V = len(eids)
    if V == 0:
        lit._vpack = None
        return None
    sizes = [lit.validators[e].trans.shape[0] for e in eids]
    cmax = max(lit.validators[e].trans.shape[1] for e in eids)
    total = int(np.sum(sizes))
    trans_all = np.zeros((total, cmax), dtype=np.int64)
    acc_all = np.zeros(total, dtype=np.int64)
    acce_all = np.zeros(total, dtype=np.int64)
    b2c_all = np.zeros((V, 256), dtype=np.int64)
    start_g = np.zeros(V, dtype=np.int64)
    float_g = np.zeros(V, dtype=np.int64)
    base = 0
    for i, e in enumerate(eids):
        v = lit.validators[e]
        S, C = v.trans.shape
        trans_all[base : base + S, :C] = v.trans.astype(np.int64) + base
        acc_all[base : base + S] = v.accept_id
        acce_all[base : base + S] = v.accept_eod_id
        b2c_all[i] = v.byte_to_class
        start_g[i] = base + v.start_state
        float_g[i] = base + v.float_state
        base += S
    max_e = max(eids)
    vid_arr = np.full(max_e + 1, -1, dtype=np.int64)
    for e, i in vid_map.items():
        vid_arr[e] = i
    lit._vpack = (vid_arr, trans_all, acc_all, acce_all, b2c_all,
                  start_g, float_g)
    return lit._vpack


def validate_windows_batched(
    lit, corpus: np.ndarray,
    eidx_w: np.ndarray, ws: np.ndarray, we: np.ndarray, b_w: np.ndarray,
    block_starts: np.ndarray, block_ends: np.ndarray,
    block_anchored: np.ndarray, block_final: np.ndarray,
) -> Set[Record]:
    """One lockstep DFA scan over ALL patterns' windows at once, using
    the packed global tables (per-byte cost: two fancy-index gathers over
    every live window, regardless of pattern count)."""
    recs: Set[Record] = set()
    pack = _packed_validators(lit)
    if pack is None or eidx_w.size == 0:
        return recs
    (vid_arr, trans_all, acc_all, acce_all, b2c_all, start_g, float_g) = pack

    # merge overlapping windows per (pattern, block): sort, then a
    # running-max scan with per-group offsets so groups cannot interact
    order = np.lexsort((ws, b_w, eidx_w))
    e_s, ws_s, we_s, b_s = eidx_w[order], ws[order], we[order], b_w[order]
    ncorp = corpus.shape[0]
    BIG = np.int64(ncorp + (1 << 12))
    newgrp = np.ones(len(e_s), dtype=bool)
    newgrp[1:] = (e_s[1:] != e_s[:-1]) | (b_s[1:] != b_s[:-1])
    gid = np.cumsum(newgrp) - 1
    ws2 = ws_s + gid * BIG
    we2 = we_s + gid * BIG
    runmax = np.maximum.accumulate(we2)
    head = np.ones(len(e_s), dtype=bool)
    head[1:] = ws2[1:] > runmax[:-1]
    hpos = np.flatnonzero(head)
    m_ws = ws_s[hpos]
    m_we = np.maximum.reduceat(we_s, hpos)
    m_e = e_s[hpos]
    m_b = b_s[hpos]
    lens = m_we - m_ws
    vids = vid_arr[m_e]
    bs = block_starts[m_b]
    be = block_ends[m_b]
    anch = (m_ws == bs) & block_anchored[m_b]

    # length buckets bound lockstep padding waste to 2x
    wmax_all = int(lens.max()) if len(lens) else 0
    lo = 0
    wcap = 16
    while lo < len(lens):
        sel = np.flatnonzero((lens > (wcap // 2 if wcap > 16 else 0))
                             & (lens <= wcap))
        lo += len(sel)
        if len(sel) == 0:
            wcap *= 2
            continue
        wmax = min(wcap, wmax_all)
        sws = m_ws[sel]
        slen = lens[sel]
        svid = vids[sel]
        win = corpus[np.minimum(sws[:, None] + np.arange(wmax)[None, :],
                                ncorp - 1)]
        states = np.where(anch[sel], start_g[svid], float_g[svid])
        cls = b2c_all[svid[:, None], win.astype(np.int64)]
        for t in range(wmax):
            active = t < slen
            nxt = trans_all[states, cls[:, t]]
            states = np.where(active, nxt, states)
            aids = np.where(active, acc_all[states], 0)
            for i in np.flatnonzero(aids).tolist():
                gi = sel[i]
                to_flat = int(m_ws[gi]) + t + 1
                v = lit.validators[int(m_e[gi])]
                for (eidx, adj) in v.expand_set(int(aids[i])):
                    to_local = to_flat + adj - int(bs[gi])
                    if 0 <= to_local <= int(be[gi]) - int(bs[gi]):
                        recs.add((int(m_b[gi]), eidx, to_local, 0))
        at_eod = (m_we[sel] == be[sel]) & block_final[m_b[sel]]
        eod_aids = np.where(at_eod, acce_all[states], 0)
        for i in np.flatnonzero(eod_aids).tolist():
            gi = sel[i]
            blen = int(be[gi]) - int(bs[gi])
            v = lit.validators[int(m_e[gi])]
            for (eidx, adj) in v.expand_set(int(eod_aids[i])):
                to_local = blen + adj
                if 0 <= to_local <= blen:
                    recs.add((int(m_b[gi]), eidx, to_local, 0))
        wcap *= 2
    return recs


def _collect_starts(rev, row: np.ndarray, upto: int) -> List[int]:
    """All match starts (window-relative) for a suffix match whose
    consumed end is `upto` (reverse-DFA scan collecting every accept)."""
    s = int(rev.start_state)
    dead = int(rev.float_state)
    trans = rev.trans
    b2c = rev.byte_to_class
    aidv = rev.accept_id
    out: List[int] = []
    for j in range(upto - 1, -1, -1):
        s = int(trans[s, int(b2c[int(row[j])])])
        aid = int(aidv[s])
        if aid:
            for (_e, adj) in rev.expand_set(aid):
                out.append(j + adj)
        if s == dead:
            break
    return out


def _resolve_chains(
    lit, corpus: np.ndarray, block_starts: np.ndarray,
    block_ends: np.ndarray, block_anchored: np.ndarray,
    block_final: np.ndarray,
    pre_windows: Dict[int, List[Tuple[int, int, int]]],
    suf_windows: Dict[int, List[Tuple[int, int, int]]],
    chain_ctx: Dict = None, chain_out: Dict = None,
) -> Set[Record]:
    """LEFT <gap> RIGHT resolution (reference: Rose role chaining).

    prefix ends come from window-validating the left part; suffix match
    ends + their possible starts from the right part (+ reverse DFA); the
    gap is checked with a vectorized last-bad-byte scan: bytes [p, s) are
    all in the gap class iff p > lastbad[s-1].

    `chain_ctx[(b, eidx)]` (streaming) holds ALL live carried prefix ends
    as `(ends_abs, run_start_abs, base_abs)` in absolute coordinates —
    ends whose gap run was unbroken up to the end of the previous write
    (runtime/stream.py prunes at bad bytes). Ends at or after `base_abs`
    (the extent start) map into flat coordinates and merge directly with
    the re-derived in-extent ends — this covers prefix ends whose factor
    bytes were trimmed out of history and cannot be re-derived; the
    lastbad check then rejects any whose run broke inside the extent.
    Ends before the extent are checked separately: they are usable iff no
    bad byte occurs in [extent start, suffix start), by the pruning
    invariant."""
    recs: Set[Record] = set()
    lastbad_cache: Dict[bytes, np.ndarray] = {}
    n = corpus.shape[0]
    idx = None

    active = set(suf_windows) | (
        set(pre_windows) & set(lit.chains) if chain_out is not None else set()
    )
    for eidx in sorted(active):
        spans = suf_windows.get(eidx, [])
        ch = lit.chains[eidx]
        # prefix ends (flat, sorted) per block
        pre_ends: Dict[int, np.ndarray] = {}
        pre_recs = validate_windows(
            ch.pre, eidx, corpus, pre_windows.get(eidx, []),
            block_starts, block_ends, block_anchored,
            np.zeros_like(block_final),  # prefix never uses EOD accepts
        )
        tmp: Dict[int, List[int]] = {}
        for (b, _e, to_local, _f) in pre_recs:
            tmp.setdefault(b, []).append(int(block_starts[b]) + to_local)
        for b, ends in tmp.items():
            pre_ends[b] = np.asarray(sorted(set(ends)), dtype=np.int64)
            if chain_out is not None:
                chain_out[(b, eidx)] = pre_ends[b]
        # b -> (sorted abs ends before the extent, run_start, base_abs)
        carried_pre: Dict[int, Tuple[np.ndarray, int, int]] = {}
        if chain_ctx:
            for (b, ce), (c_ends, c_run, base_abs) in chain_ctx.items():
                if ce != eidx:
                    continue
                c_ends = np.asarray(c_ends, dtype=np.int64)
                bs = int(block_starts[b])
                in_ext = c_ends[c_ends >= base_abs] - base_abs + bs
                if len(in_ext):
                    cur = pre_ends.get(b)
                    pre_ends[b] = np.unique(in_ext) if cur is None else \
                        np.unique(np.concatenate([cur, in_ext]))
                older = c_ends[c_ends < base_abs]
                if len(older):
                    carried_pre[b] = (older, c_run, base_abs)
        if not pre_ends and not carried_pre:
            continue

        key = ch.gap_bits.tobytes()
        if key not in lastbad_cache:
            if idx is None:
                idx = np.arange(n, dtype=np.int64)
            bad = ~ch.gap_bits[corpus]
            lastbad_cache[key] = np.maximum.accumulate(
                np.where(bad, idx, -1)
            )
        lastbad = lastbad_cache[key]

        # suffix ends + starts per merged window
        spans = _merge_spans(list(spans))
        for (ws, we, b) in spans:
            bs = int(block_starts[b])
            ends_here = pre_ends.get(b)
            carried = carried_pre.get(b)
            if ends_here is None and carried is None:
                continue
            if ends_here is None:
                ends_here = np.zeros(0, dtype=np.int64)
            win = corpus[ws:we]
            cls = ch.suf.byte_to_class.astype(np.int64)[win]
            st = int(ch.suf.float_state)
            trans = ch.suf.trans
            aidv = ch.suf.accept_id
            for t in range(we - ws):
                st = int(trans[st, cls[t]])
                aid = int(aidv[st])
                if not aid:
                    continue
                for (_e2, adj) in ch.suf.expand_set(aid):
                    e_flat = ws + t + 1 + adj
                    if not (bs <= e_flat <= int(block_ends[b])):
                        continue
                    for s0 in _collect_starts(ch.suf_rev, win, t + 1):
                        sflat = ws + s0
                        if sflat < bs:
                            continue
                        # gap byte run constraint: p in [p_low, p_high]
                        p_high = sflat - ch.gap_lo
                        p_low = bs
                        if sflat > 0:
                            p_low = max(p_low, int(lastbad[sflat - 1]) + 1)
                        if ch.gap_hi is not None:
                            p_low = max(p_low, sflat - ch.gap_hi)
                        # empty gap (p == sflat) has no byte constraint
                        if ch.gap_lo == 0:
                            p_high = sflat
                            if sflat > 0 and int(lastbad[sflat - 1]) == sflat - 1:
                                # only p == sflat possible
                                p_low = max(p_low, sflat)
                        found = False
                        if p_high >= p_low:
                            lo_i = np.searchsorted(ends_here, p_low,
                                                   side="left")
                            hi_i = np.searchsorted(ends_here, p_high,
                                                   side="right")
                            found = hi_i > lo_i
                        if not found and carried is not None:
                            # carried prefix evidence from before this
                            # extent: usable only when the gap run reaches
                            # back through the whole extent prefix
                            c_ends, c_run, base_abs = carried
                            no_bad = sflat == bs or (
                                sflat > 0 and int(lastbad[sflat - 1]) < bs
                            )
                            if no_bad and ch.gap_lo <= (
                                base_abs + (sflat - bs)
                            ) - (c_ends[0] if len(c_ends) else 1 << 62):
                                s_abs = base_abs + (sflat - bs)
                                pl = c_run
                                if ch.gap_hi is not None:
                                    pl = max(pl, s_abs - ch.gap_hi)
                                ph = s_abs - ch.gap_lo
                                li = np.searchsorted(c_ends, pl, side="left")
                                hi2 = np.searchsorted(c_ends, ph,
                                                      side="right")
                                found = hi2 > li
                        if found:
                            recs.add((b, eidx, e_flat - bs, 0))
                            break
    return recs
