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
# context positions (\b / ^m / $ consume one adjacent byte; under UCP a
# \b context chain consumes one full UTF-8 codepoint of up to 4 bytes;
# see compiler/glushkov.py _Resolver)
WINDOW_SLACK = 4


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


def _avalanche32(h: np.ndarray) -> np.ndarray:
    """Full-avalanche finalizer (xorshift-multiply): every input bit
    affects the low bits used as the hash-bucket index. Mirrored exactly
    by the device in ops.teddy._hash_confirm_stage."""
    h = h.astype(np.uint32).copy()
    h ^= h >> np.uint32(15)
    h *= np.uint32(0x2C1B3C6D)
    h ^= h >> np.uint32(13)
    return h


def confirm_device_tables(lit):
    """Confirm tables in device form (reference: FDRConfirm hash tables).

    Each (tail_len, tail_mask) group becomes a sorted int32 hash table:
    h = (lo32 * 0x9E3779B1) ^ (hi32 * 0x85EBCA6B) over the masked tail,
    with the tail aligned so the newest byte is the top byte of hi32 —
    matching the fixed 8-byte tail words the fused kernel packs for
    every position.

    Entries are deduplicated by distinct masked tail *value* (one class
    per value), so the device multiplicity loop is bounded by genuine
    32-bit hash collisions (≈1), not by how many factors share a tail —
    rulesets built from a phrase vocabulary routinely have 100+ factors
    with identical 8-byte tails, and probing each on device costs a full
    pass over the candidate buffer. The device emits (pos, class) pairs;
    expand_confirm_classes maps classes back to factor ids on host and
    verify_pairs re-checks exact bytes, so hash collisions only cost
    fetch bytes, never correctness.
    Returns [(cl, mlo, mhi, h_sorted i32, class_sorted i32, maxmult)].
    """
    if hasattr(lit, "_confirm_dev"):
        return lit._confirm_dev
    packed, _flen = _confirm_index(lit)
    out = []
    cls_fids: List[np.ndarray] = []
    cls_offs = [0]
    next_cls = 0
    for (cl, mask64, vals, fids, _long) in packed:
        shift = np.uint64(8 * (8 - cl))
        mask_f = int(mask64) << int(shift)
        vals_f = vals << shift  # fixed alignment: newest byte at the top
        mlo = np.uint32(mask_f & 0xFFFFFFFF)
        mhi = np.uint32((mask_f >> 32) & 0xFFFFFFFF)
        # one class per distinct masked tail value (vals is sorted)
        uvals, first = np.unique(vals_f, return_index=True)
        counts = np.diff(np.append(first, len(vals_f)))
        for j in range(len(uvals)):
            cls_fids.append(fids[first[j]:first[j] + counts[j]])
            cls_offs.append(cls_offs[-1] + counts[j])
        lo = (uvals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (uvals >> np.uint64(32)).astype(np.uint32)
        h = ((lo * np.uint32(0x9E3779B1)) ^ (hi * np.uint32(0x85EBCA6B)))
        h = h.view(np.int32)
        cids = np.arange(next_cls, next_cls + len(uvals), dtype=np.int32)
        next_cls += len(uvals)
        # open-addressed direct-mapped table, ONE int32 per slot
        # (12-bit hash signature << 20 | class id + 1; 0 = empty): the
        # device probes slot (h & (T-1)) + k for k <= max displacement —
        # ONE take per probe. A sorted-array binary search costs log2(F)
        # dependent gathers per candidate (~13 at 10k scale); every take
        # costs ~20 ns/candidate on v5e, so probe count is the confirm
        # stage's unit of money. The raw multiplicative hash clusters
        # badly here: its low bits (the bucket index) ignore the
        # operands' high bytes, and vocabulary tails differ exactly in
        # the newest byte (the TOP byte of hi_w) — an xorshift-multiply
        # avalanche (applied identically on device) spreads them. A
        # 12-bit signature passes ~1/4096 false positives per probe;
        # verify_pairs exact-compares bytes afterwards, so collisions
        # cost fetch bytes, never correctness (the same division of
        # labor as the reference's confirm, src/fdr/fdr_confirm.h:78).
        F = len(uvals)
        hm = _avalanche32(h.view(np.uint32))
        sig = (hm >> np.uint32(20)).astype(np.int64)
        if next_cls >= (1 << 20):
            from ..errors import InvalidError

            raise InvalidError("confirm class space exceeded 2^20")
        T = 1 << max(4, (2 * F - 1).bit_length()) if F else 16
        while True:
            slots = np.zeros(T, np.int64)
            disp = 0
            for hv, sg, cid in zip(hm.tolist(), sig.tolist(),
                                   cids.tolist()):
                idx = hv & (T - 1)
                d = 0
                while slots[(idx + d) & (T - 1)] != 0:
                    d += 1
                slots[(idx + d) & (T - 1)] = (sg << 20) | (cid + 1)
                disp = max(disp, d)
            if disp <= 4 or T >= (1 << 22):
                break
            T <<= 1
        out.append((int(cl), mlo, mhi,
                    slots.astype(np.uint32).view(np.int32),
                    np.zeros(1, np.int32), disp + 1))
    lit._confirm_cls = (
        np.asarray(cls_offs, dtype=np.int64),
        np.concatenate(cls_fids).astype(np.int64)
        if cls_fids else np.zeros(0, np.int64),
    )
    lit._confirm_dev = out
    return out


def expand_confirm_classes(
    lit, cls_a: np.ndarray, pos_a: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Expand device (class, pos) pairs to (fid, pos) pairs (a class is
    the set of factors sharing one masked tail value)."""
    if cls_a.size == 0:
        return cls_a, pos_a
    offs, fids = lit._confirm_cls
    starts = offs[cls_a]
    counts = offs[cls_a + 1] - starts
    total = int(counts.sum())
    ends_c = np.cumsum(counts)
    idx = (np.arange(total, dtype=np.int64)
           - np.repeat(ends_c - counts, counts)
           + np.repeat(starts, counts))
    return fids[idx], np.repeat(pos_a, counts)


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

    from ..native import confirm_native

    nat = confirm_native(lit, corpus, block_starts, pos)
    if nat is not None:
        return nat

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

    if eod_only or som_rev is not None:
        # SOM / close-pass: per-accept back-scans need the lockstep loop
        cls = b2c[win]  # [nw, wmax]
        for t in range(wmax):
            active = t < lens
            nxt = trans[states, cls[:, t]]
            states = np.where(active, nxt, states)
            if eod_only:  # close-pass: mid-data accepts already reported
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
    else:
        # common path: native batch DFA scan over the window rows (the
        # per-byte numpy loop costs microseconds of interpreter per step;
        # dense-match windows have one accept per byte)
        from .smallwrite import dfa_scan_host

        hits, states = dfa_scan_host(
            validator, win, lens.astype(np.int32),
            init_states=states.astype(np.int32),
        )
        for i in range(nw):
            hp, hv = hits[i]
            if not len(hp):
                continue
            base_to = int(starts[i]) - int(bs[i]) + 1
            blen = int(be[i]) - int(bs[i])
            bi = int(blks[i])
            for aid in np.unique(hv):
                tt = hp[hv == aid] + base_to
                for (eidx, adj) in validator.expand_set(int(aid)):
                    ta = tt + adj
                    for to_local in ta[(ta >= 0) & (ta <= blen)].tolist():
                        recs.add((bi, eidx, int(to_local), 0))
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


def _max_f2e(lit) -> int:
    """Max window reach right of a factor end, over every reference."""
    if not hasattr(lit, "_max_f2e"):
        m = 0
        for refs in lit.factor_refs:
            for (_e, _s2f, f2e, _k) in refs:
                m = max(m, int(f2e))
        lit._max_f2e = m
    return lit._max_f2e


def scan_literal_path(
    db, corpus: np.ndarray, block_starts: np.ndarray, block_ends: np.ndarray,
    capacity: int = 1 << 14,
    block_anchored: np.ndarray = None, block_final: np.ndarray = None,
    eod_only: bool = False,
    chain_ctx: Dict = None, chain_out: Dict = None,
    ranges_out: List = None,
    filter_from: np.ndarray = None,
    prefilter_out: Dict = None,
) -> Set[Record]:
    """Full literal pipeline for one flat corpus of concatenated blocks.

    `filter_from[b]` (streaming) marks the first NEW flat offset of block
    b's extent: candidates whose windows cannot reach past it were fully
    derived by earlier writes, so the filter runs only over a bounded
    tail region (reference analogue: the delay-rebuild region,
    src/rose/stream.c:415 — the history rescan is bounded, not O(history)).
    The history bytes stay available to confirm/validation windows."""
    lit = db.lit
    if lit is None or corpus.shape[0] == 0:
        return set()

    from .smallwrite import HOST_SCAN_LIMIT, teddy_filter_host

    if corpus.shape[0] <= getattr(db, "host_scan_limit", HOST_SCAN_LIMIT):
        # small-write path: host shift-AND, no device round trip
        if filter_from is None or eod_only:
            pos, words = teddy_filter_host(corpus, lit.masks)
        else:
            M = int(lit.masks.shape[0])
            back = _max_f2e(lit) + WINDOW_SLACK + 1
            fe_min = filter_from.astype(np.int64) - back
            seg_starts = np.maximum(block_starts, fe_min - (M - 1))
            new_bytes = int(np.sum(block_ends - seg_starts))
            if new_bytes * 4 >= int(block_ends[-1]):
                # rescan regions cover most of the extents: one filter
                # call over the whole flat corpus beats per-block call
                # overhead; out-of-region candidates are dropped below
                pos, words = teddy_filter_host(corpus, lit.masks)
                bidx = np.searchsorted(block_starts, pos, side="right") - 1
                keep = pos >= fe_min[bidx]
                pos, words = pos[keep], words[:, keep]
            else:
                pps: List[np.ndarray] = []
                wws: List[np.ndarray] = []
                for b in range(block_starts.shape[0]):
                    bs = int(seg_starts[b])
                    be = int(block_ends[b])
                    p, w = teddy_filter_host(corpus[bs:be], lit.masks)
                    p = p + bs
                    keep = p >= fe_min[b]
                    pps.append(p[keep])
                    wws.append(w[:, keep])
                pos = (np.concatenate(pps) if pps
                       else np.zeros(0, np.int64))
                words = (np.concatenate(wws, axis=1) if wws
                         else np.zeros((int(lit.masks.shape[1]), 0),
                                       np.int32))
        return finish_literal_scan(
            db, corpus, block_starts, block_ends, pos, words,
            block_anchored=block_anchored, block_final=block_final,
            eod_only=eod_only, chain_ctx=chain_ctx, chain_out=chain_out,
            ranges_out=ranges_out, prefilter_out=prefilter_out,
        )
    # device path: fused filter + hash confirm — only (pos, fid) pairs
    # cross the device boundary; exact re-verify on host. The host
    # corpus doubles as the capacity-overflow fallback (zero new kernel
    # shapes on that path).
    from ..ops.teddy import corpus_to_rows, teddy_confirm_finish, \
        teddy_confirm_start
    import jax.numpy as jnp

    h = teddy_confirm_start(jnp.asarray(corpus_to_rows(corpus)), lit,
                            corpus.shape[0], capacity)
    fid_a, p_a = teddy_confirm_finish(h, host_corpus=corpus)
    fid_a, p_a = verify_pairs(lit, corpus, block_starts, fid_a, p_a)
    return finish_confirmed(
        db, corpus, block_starts, block_ends, fid_a, p_a,
        block_anchored=block_anchored, block_final=block_final,
        eod_only=eod_only, chain_ctx=chain_ctx, chain_out=chain_out,
        ranges_out=ranges_out, prefilter_out=prefilter_out,
    )


def finish_literal_scan(
    db, corpus: np.ndarray, block_starts: np.ndarray, block_ends: np.ndarray,
    pos: np.ndarray, words: np.ndarray,
    block_anchored: np.ndarray = None, block_final: np.ndarray = None,
    eod_only: bool = False,
    chain_ctx: Dict = None, chain_out: Dict = None,
    ranges_out: List = None,
    prefilter_out: Dict = None,
) -> Set[Record]:
    """Host stages after the device filter: confirm → windows → validate."""
    fid_a, p_a = confirm_candidates(
        db.lit, corpus, block_starts, pos, words
    )
    return finish_confirmed(
        db, corpus, block_starts, block_ends, fid_a, p_a,
        block_anchored=block_anchored, block_final=block_final,
        eod_only=eod_only, chain_ctx=chain_ctx, chain_out=chain_out,
        ranges_out=ranges_out, prefilter_out=prefilter_out,
    )


def finish_confirmed(
    db, corpus: np.ndarray, block_starts: np.ndarray,
    block_ends: np.ndarray, fid_a: np.ndarray, p_a: np.ndarray,
    block_anchored: np.ndarray = None, block_final: np.ndarray = None,
    eod_only: bool = False,
    chain_ctx: Dict = None, chain_out: Dict = None,
    ranges_out: List = None,
    prefilter_out: Dict = None,
) -> Set[Record]:
    """Window building + validation over exact-confirmed (fid, pos)
    pairs (reference: the rose literal program stage after confirm).

    `prefilter_out` (block mode), when given, collects engine-prefilter
    hits: {pattern_idx: set of block indices where some mandatory "pre"
    factor of that pattern occurred} — the block orchestrator then runs
    the pattern's general engine only over those blocks (the literal-cut
    degradation for patterns whose gaps don't fit the chain machinery;
    reference: Rose's literal cut feeding arbitrary engines,
    ng_violet.cpp:3053)."""
    lit = db.lit
    nb = block_starts.shape[0]
    if block_anchored is None:
        block_anchored = np.ones(nb, dtype=bool)
    if block_final is None:
        block_final = np.ones(nb, dtype=bool)
    recs: Set[Record] = set()
    if fid_a.size == 0:
        # carried chain evidence can produce matches without any new
        # candidate in this extent (a trailing-gap run keeps firing, or
        # a pending role end connects at the extent boundary)
        if chain_ctx and not eod_only:
            recs |= resolve_chains(
                lit, corpus, block_starts, block_ends, block_anchored,
                block_final, {},
                chain_ctx=chain_ctx, chain_out=chain_out,
                ranges_out=ranges_out,
            )
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

    # kind -1: engine-prefilter hits (no records; flags blocks)
    if prefilter_out is not None and not eod_only:
        m = kind_p == -1
        if m.any():
            for (e, b) in zip(eidx_p[m].tolist(), b_p[m].tolist()):
                prefilter_out.setdefault(e, set()).add(b)

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

    # factor-anchored refs: head byte checks + anchored suffix scan
    ma = kind_p >= ANCHOR_KIND_BASE
    if ma.any() and not eod_only:
        recs |= _validate_anchored(
            lit, corpus, kind_p[ma] - ANCHOR_KIND_BASE, fe_p[ma],
            b_p[ma], bs_p[ma], be_p[ma], block_final)

    # kinds 2..65: chain roles (SEG <gap> SEG <gap> ...)
    mm = (kind_p >= 2) & (kind_p < ANCHOR_KIND_BASE)
    chain_windows: Dict[Tuple[int, int], List[Tuple[int, int, int]]] = {}
    for i in np.flatnonzero(mm).tolist():
        chain_windows.setdefault(
            (int(eidx_p[i]), int(kind_p[i]) - 2), []
        ).append((int(ws_p[i]), int(we_p[i]), int(b_p[i])))
    if (chain_windows or chain_ctx) and not eod_only:
        recs |= resolve_chains(
            lit, corpus, block_starts, block_ends, block_anchored,
            block_final, chain_windows,
            chain_ctx=chain_ctx, chain_out=chain_out,
            ranges_out=ranges_out,
        )
    return recs


ANCHOR_KIND_BASE = 1000  # kind "a<idx>" -> 1000 + idx (anchored refs)


def _kind_code(k: str) -> int:
    if k == "pre":
        return -1  # engine prefilter: factor hits gate general engines
    if k == "equiv":
        return 0
    if k == "win":
        return 1
    if k.startswith("a"):
        return ANCHOR_KIND_BASE + int(k[1:])
    assert k.startswith("c"), k
    return 2 + int(k[1:])  # chain role r -> 2 + r


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
            kind.append(_kind_code(k))
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
    cmax = max(lit.validators[e].trans.shape[1] for e in eids)
    # content-deduplicated table regions: isomorphic validators (same
    # class-indexed tables, different byte remap) share one transition
    # region — b2c stays per pattern, states are global ids either way
    # (reference analogue: leftfix dedupe, rose_build_merge.cpp)
    tid_base: Dict[bytes, int] = {}
    tparts: List = []
    b2c_all = np.zeros((V, 256), dtype=np.int64)
    start_g = np.zeros(V, dtype=np.int64)
    float_g = np.zeros(V, dtype=np.int64)
    total = 0
    for i, e in enumerate(eids):
        v = lit.validators[e]
        key = (v.trans.shape, v.trans.tobytes(), v.accept_id.tobytes(),
               v.accept_eod_id.tobytes())
        base = tid_base.get(key)
        if base is None:
            base = total
            tid_base[key] = base
            tparts.append(v)
            total += v.trans.shape[0]
        b2c_all[i] = v.byte_to_class
        start_g[i] = base + v.start_state
        float_g[i] = base + v.float_state
    trans_all = np.zeros((total, cmax), dtype=np.int64)
    acc_all = np.zeros(total, dtype=np.int64)
    acce_all = np.zeros(total, dtype=np.int64)
    base = 0
    for v in tparts:
        S, C = v.trans.shape
        trans_all[base : base + S, :C] = v.trans.astype(np.int64) + base
        acc_all[base : base + S] = v.accept_id
        acce_all[base : base + S] = v.accept_eod_id
        base += S
    max_e = max(eids)
    vid_arr = np.full(max_e + 1, -1, dtype=np.int64)
    for e, i in vid_map.items():
        vid_arr[e] = i
    # shim engine over the packed tables for the native batch scan
    # (window bytes are pre-mapped to class ids, so byte_to_class is the
    # identity)
    import types

    shim = types.SimpleNamespace(
        trans=trans_all.astype(np.int32),
        byte_to_class=np.arange(256, dtype=np.int32),
        accept_id=acc_all.astype(np.int32),
    )
    lit._vpack = (vid_arr, trans_all, acc_all, acce_all, b2c_all,
                  start_g, float_g, shim)
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

    from ..native import validate_windows_native

    nat = validate_windows_native(
        lit, corpus, eidx_w, ws, we, b_w,
        block_starts, block_ends, block_anchored, block_final,
    )
    if nat is not None:
        return nat

    (vid_arr, trans_all, acc_all, acce_all, b2c_all, start_g, float_g,
     shim) = pack

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
        # native batch scan over the pre-class-mapped windows (the
        # per-byte numpy loop costs microseconds of interpreter per step)
        from .smallwrite import dfa_scan_host

        hits, states = dfa_scan_host(
            shim, cls.astype(np.uint8), slen.astype(np.int32),
            init_states=states.astype(np.int32),
        )
        for i in range(len(sel)):
            hp, hv = hits[i]
            if not len(hp):
                continue
            gi = sel[i]
            v = lit.validators[int(m_e[gi])]
            base_to = int(m_ws[gi]) + 1 - int(bs[gi])
            blen = int(be[gi]) - int(bs[gi])
            for k in range(len(hp)):
                for (eidx, adj) in v.expand_set(int(hv[k])):
                    to_local = int(hp[k]) + base_to + adj
                    if 0 <= to_local <= blen:
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


# --------------------------------------------------------------------------
# Factor-anchored validation (kind "a<idx>" refs): a confirmed factor
# inside the pattern's fixed head pins the match start exactly; validation
# is a vectorized head-byte check plus ONE anchored suffix-DFA scan from
# the head end. Suffix automata are shared across vocabulary families
# (reference analogue: Rose zero-lag left context + suffix engines,
# src/rose/rose_graph.h LeftEngInfo; the whole-pattern validator route
# above re-scans the literal spelling per family member instead).
# --------------------------------------------------------------------------


def _aref_tables(lit):
    """Flattened anchored-ref parameters as parallel arrays (cached)."""
    if hasattr(lit, "_arefs"):
        return lit._arefs
    ars = lit.anchored_refs
    n = len(ars)
    a_eidx = np.zeros(n, np.int64)
    a_d = np.zeros(n, np.int64)
    a_H = np.zeros(n, np.int64)
    a_svid = np.zeros(n, np.int64)
    a_sfxw = np.zeros(n, np.int64)
    p_off = np.zeros(n + 1, np.int64)
    pj: List[int] = []
    pv: List[int] = []
    pm: List[int] = []
    for k, (eidx, d, H, prefix, svid, sfxw) in enumerate(ars):
        a_eidx[k], a_d[k], a_H[k] = eidx, d, H
        a_svid[k], a_sfxw[k] = svid, sfxw
        for (j, v, m) in prefix:
            pj.append(j)
            pv.append(v)
            pm.append(m)
        p_off[k + 1] = len(pj)
    lit._arefs = (
        a_eidx, a_d, a_H, a_svid, a_sfxw, p_off,
        np.asarray(pj, np.int64), np.asarray(pv, np.int64),
        np.asarray(pm, np.int64),
    )
    return lit._arefs


def _packed_sfx(lit):
    """Suffix validators packed into one global table set (cached):
    content-identical engines share a region, exactly like
    _packed_validators — but here the accept expansion takes the
    expression index from the REF, so one region serves every family
    member."""
    if hasattr(lit, "_spack"):
        return lit._spack
    engs = lit.sfx_validators
    V = len(engs)
    if V == 0:
        lit._spack = None
        return None
    cmax = max(e.trans.shape[1] for e in engs)
    tid_base: Dict[bytes, int] = {}
    tparts: List = []
    b2c_all = np.zeros((V, 256), dtype=np.int64)
    start_g = np.zeros(V, dtype=np.int64)
    total = 0
    for i, v in enumerate(engs):
        key = (v.trans.shape, v.trans.tobytes(), v.accept_id.tobytes())
        base = tid_base.get(key)
        if base is None:
            base = total
            tid_base[key] = base
            tparts.append(v)
            total += v.trans.shape[0]
        b2c_all[i] = v.byte_to_class
        start_g[i] = base + v.start_state
    trans_all = np.zeros((total, cmax), dtype=np.int64)
    acc_all = np.zeros(total, dtype=np.int64)
    base = 0
    for v in tparts:
        S, C = v.trans.shape
        trans_all[base : base + S, :C] = v.trans.astype(np.int64) + base
        acc_all[base : base + S] = v.accept_id
        base += S
    import types

    shim = types.SimpleNamespace(
        trans=trans_all.astype(np.int32),
        byte_to_class=np.arange(256, dtype=np.int32),
        accept_id=acc_all.astype(np.int32),
    )
    lit._spack = (b2c_all, start_g, shim)
    return lit._spack


def _validate_anchored(
    lit, corpus: np.ndarray, aidx: np.ndarray, fe: np.ndarray,
    b_w: np.ndarray, bs_w: np.ndarray, be_w: np.ndarray,
    block_final: np.ndarray,
) -> Set[Record]:
    """Validate anchored refs: head byte checks, then one anchored
    suffix scan per surviving candidate. `fe` is the exclusive factor
    end; the match start is fe - d and the suffix scan starts at the
    head end (fe + (H - d))."""
    recs: Set[Record] = set()
    if aidx.size == 0:
        return recs
    (a_eidx, a_d, a_H, a_svid, a_sfxw, p_off, pj, pv, pm) = \
        _aref_tables(lit)
    ncorp = corpus.shape[0]
    d = a_d[aidx]
    H = a_H[aidx]
    s = fe - d  # match start (absolute)
    # the whole head must lie inside the block
    valid = (s >= bs_w) & (s + H <= be_w)
    # vectorized head-byte checks (factor bytes were exactly verified)
    cnt = p_off[aidx + 1] - p_off[aidx]
    total = int(cnt.sum())
    if total:
        rep = np.repeat(np.arange(len(aidx)), cnt)
        within = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        fl = p_off[aidx][rep] + within
        pos = s[rep] + pj[fl]
        byte = corpus[np.minimum(np.maximum(pos, 0), ncorp - 1)]
        okb = ((byte & pm[fl]) == pv[fl]) & (pos >= 0) & (pos < ncorp)
        fails = np.bincount(rep, weights=(~okb).astype(np.int64),
                            minlength=len(aidx)) > 0
        valid &= ~fails
    sel = np.flatnonzero(valid)
    if sel.size == 0:
        return recs
    # empty suffix: the match IS the head
    svid = a_svid[aidx[sel]]
    emp = svid < 0
    for i in np.flatnonzero(emp).tolist():
        g = sel[i]
        recs.add((int(b_w[g]), int(a_eidx[aidx[g]]),
                  int(s[g] + H[g] - bs_w[g]), 0))
    # suffix scans, deduped per (svid, start, block, eidx)
    sub = sel[~emp]
    if sub.size == 0:
        return recs
    pack = _packed_sfx(lit)
    b2c_all, start_g, shim = pack
    starts = s[sub] + H[sub]
    lens = np.minimum(be_w[sub] - starts, a_sfxw[aidx[sub]])
    key = np.stack([a_svid[aidx[sub]], starts, b_w[sub],
                    a_eidx[aidx[sub]]], axis=1)
    _, first = np.unique(key, axis=0, return_index=True)
    sub = sub[first]
    starts = starts[first]
    lens = lens[first]
    svid = a_svid[aidx[sub]]
    eidx_w = a_eidx[aidx[sub]]
    # the suffix is non-vacuous by construction, so a zero-length window
    # (the head ends exactly at the block boundary) cannot match
    keep = lens >= 1
    sub, starts, lens = sub[keep], starts[keep], lens[keep]
    svid, eidx_w = svid[keep], eidx_w[keep]
    if starts.size == 0:
        return recs
    from .smallwrite import dfa_scan_host

    # length buckets bound lockstep padding waste to 2x
    lmax_all = int(lens.max())
    wcap, lo = 16, 0
    while lo < lmax_all:
        pick = np.flatnonzero((lens > lo) & (lens <= wcap))
        if len(pick) == 0:
            lo = wcap
            wcap *= 2
            continue
        wmax = min(wcap, lmax_all)
        sws = starts[pick]
        win = corpus[np.minimum(sws[:, None] + np.arange(wmax)[None, :],
                                ncorp - 1)]
        sv = svid[pick]
        cls = b2c_all[sv[:, None], win.astype(np.int64)]
        states = start_g[sv]
        hits, _st = dfa_scan_host(
            shim, cls.astype(np.uint8), lens[pick].astype(np.int32),
            init_states=states.astype(np.int32),
        )
        for i in range(len(pick)):
            hp, hv = hits[i]
            if not len(hp):
                continue
            gi = pick[i]
            g = sub[gi]
            v = lit.sfx_validators[int(svid[gi])]
            e_r = int(eidx_w[gi])
            base_to = int(starts[gi]) + 1 - int(bs_w[g])
            blen = int(be_w[g]) - int(bs_w[g])
            for k in range(len(hp)):
                for (_e, adj) in v.expand_set(int(hv[k])):
                    to_local = int(hp[k]) + base_to + adj
                    if 0 <= to_local <= blen:
                        recs.add((int(b_w[g]), e_r, to_local, 0))
        lo = wcap
        wcap *= 2
    return recs


# --------------------------------------------------------------------------
# Chain resolution: SEG0 <gap> SEG1 <gap> ... (reference: the Rose role
# graph runtime — literal hits trigger prefix/infix/suffix engine checks,
# src/rose/match.c + catchup; here roles resolve left to right with a
# vectorized gap-run check between consecutive boundaries)
# --------------------------------------------------------------------------


def _lastbad(corpus: np.ndarray, gap_bits: np.ndarray, cache: Dict) -> np.ndarray:
    """lastbad[i] = last index <= i whose byte is NOT in the gap class
    (-1 if none): bytes [p, s) are all in-class iff p > lastbad[s-1]."""
    key = (0, gap_bits.tobytes())
    if key not in cache:
        idx = np.arange(corpus.shape[0], dtype=np.int64)
        bad = ~gap_bits[corpus]
        cache[key] = np.maximum.accumulate(np.where(bad, idx, -1))
    return cache[key]


def _firstbad(corpus: np.ndarray, gap_bits: np.ndarray, cache: Dict) -> np.ndarray:
    """firstbad[i] = first index >= i whose byte is NOT in the gap class
    (n if none): bytes [p, e) are all in-class iff e <= firstbad[p]."""
    key = (1, gap_bits.tobytes())
    if key not in cache:
        n = corpus.shape[0]
        idx = np.arange(n, dtype=np.int64)
        bad = ~gap_bits[corpus]
        cache[key] = np.minimum.accumulate(
            np.where(bad, idx, n)[::-1]
        )[::-1]
    return cache[key]


# chain_ctx boundary key for the leading-gap run (streaming carried state)
LEAD_BOUNDARY = -1


def chain_ctx_record(lit, eidx: int, r: int, c_ends, c_run, base_abs):
    """Build one streaming chain_ctx value from carried chain_state.

    General-infix boundaries carry the infix NFA mask at c_ends[0] — an
    arbitrary-width Python int (multi-word infixes exceed int64;
    np.asarray on it raises OverflowError, found by the collider at a
    fresh seed) — so their evidence stays a Python list; class-gap
    boundaries pack to int64 arrays for the vectorized merge."""
    ch = lit.chains.get(eidx)
    if ch is not None and getattr(ch, "infix", None) \
            and r in ch.infix:
        return (list(c_ends), c_run, base_abs)
    return (np.asarray(c_ends, dtype=np.int64), c_run, base_abs)


def _merge_carried(ends, chain_ctx, eidx, boundary, block_starts):
    """Merge streaming carried evidence for one gap boundary into the
    flat end sets; returns (ends, carried_pre) where carried_pre holds
    pre-extent ends per block as (sorted_abs, run_start, base_abs)."""
    carried_pre: Dict[int, Tuple[np.ndarray, int, int]] = {}
    if chain_ctx:
        for (b, ce, rr), (c_ends, c_run, base_abs) in chain_ctx.items():
            if ce != eidx or rr != boundary:
                continue
            c_ends = np.asarray(c_ends, dtype=np.int64)
            bs = int(block_starts[b])
            in_ext = c_ends[c_ends >= base_abs] - base_abs + bs
            if len(in_ext):
                cur = ends.get(b)
                ends[b] = np.unique(in_ext) if cur is None else \
                    np.unique(np.concatenate([cur, in_ext]))
            older = c_ends[c_ends < base_abs]
            if len(older):
                carried_pre[b] = (older, c_run, base_abs)
    return ends, carried_pre


def _role_matches(role, corpus, spans):
    """Forward lockstep scan of one role over merged windows.

    Returns (win, starts_w, blks_w, A_i, A_t, A_aid): accepts at window
    i, byte index t (0-based within window), with accept-set id aid.
    """
    nw = len(spans)
    starts_w = np.asarray([s for (s, _e, _b) in spans], dtype=np.int64)
    ends_w = np.asarray([e for (_s, e, _b) in spans], dtype=np.int64)
    blks_w = np.asarray([b for (_s, _e, b) in spans], dtype=np.int64)
    lens = ends_w - starts_w
    wmax = int(lens.max())
    win = np.zeros((nw, wmax), dtype=np.uint8)
    for i, (s, e, _b) in enumerate(spans):
        win[i, : e - s] = corpus[s:e]
    from .smallwrite import dfa_scan_host

    fwd = role.fwd
    hits, _finals = dfa_scan_host(
        fwd, win, lens.astype(np.int32),
        init_states=np.full(nw, fwd.float_state, dtype=np.int32),
    )
    ai: List[np.ndarray] = []
    at: List[np.ndarray] = []
    aa: List[np.ndarray] = []
    for i in range(nw):
        hp, hv = hits[i]
        if len(hp):
            ai.append(np.full(len(hp), i, dtype=np.int64))
            at.append(hp.astype(np.int64))
            aa.append(hv.astype(np.int64))
    if not ai:
        z = np.zeros(0, dtype=np.int64)
        return win, starts_w, blks_w, z, z, z
    return (win, starts_w, blks_w, np.concatenate(ai), np.concatenate(at),
            np.concatenate(aa))


def _role_starts(role, win, A_i, A_t):
    """Batched reverse scans: for each accept pair (window A_i[k], end
    byte A_t[k]) collect every possible segment start (window-relative).
    Returns (pair_idx, start_j) arrays."""
    rev = role.rev
    trans = rev.trans
    b2c = rev.byte_to_class.astype(np.int64)
    accid = rev.accept_id
    dead = int(rev.float_state)
    P = len(A_i)
    states = np.full(P, rev.start_state, dtype=np.int64)
    out_k: List[np.ndarray] = []
    out_j: List[np.ndarray] = []
    maxlen = int(A_t.max()) + 1 if P else 0
    for step in range(maxlen):
        j = A_t - step
        active = (j >= 0) & (states != dead)
        if not active.any():
            break
        byte = win[A_i, np.maximum(j, 0)]
        nxt = trans[states, b2c[byte]]
        states = np.where(active, nxt, states)
        aids = np.where(active, accid[states], 0)
        nz = np.flatnonzero(aids)
        for aid in np.unique(aids[nz]):
            if not aid:
                continue
            sel = nz[aids[nz] == aid]
            for (_e, adj) in rev.expand_set(int(aid)):
                out_k.append(sel)
                out_j.append(j[sel] + adj)
    if not out_k:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    return np.concatenate(out_k), np.concatenate(out_j)


def _connect_role(
    role, corpus, spans, prev_ends, carried_pre, gap_bits, glo, ghi,
    lastbad_cache, block_starts, block_ends,
) -> Dict[int, np.ndarray]:
    """Role matches whose start connects to a previous-boundary end
    through the gap: returns per-block sorted arrays of match ends."""
    lastbad = _lastbad(corpus, gap_bits, lastbad_cache)
    win, starts_w, blks_w, A_i, A_t, A_aid = _role_matches(
        role, corpus, spans
    )
    if len(A_i) == 0:
        return {}
    S_k, S_j = _role_starts(role, win, A_i, A_t)
    if len(S_k) == 0:
        return {}
    s_flat = starts_w[A_i[S_k]] + S_j
    blk_s = blks_w[A_i[S_k]]
    conn_pair = np.zeros(len(A_i), dtype=bool)
    for b in np.unique(blk_s):
        m = blk_s == b
        s = s_flat[m]
        bs = int(block_starts[b])
        prevb = np.where(s > 0, lastbad[np.maximum(s - 1, 0)], -1)
        p_lo = np.maximum(bs, prevb + 1)
        if ghi is not None:
            p_lo = np.maximum(p_lo, s - ghi)
        p_hi = s - glo
        conn = np.zeros(len(s), dtype=bool)
        E = prev_ends.get(int(b))
        if E is not None and len(E):
            ok = p_hi >= p_lo
            conn = ok & (
                np.searchsorted(E, p_lo, side="left")
                < np.searchsorted(E, p_hi, side="right")
            )
        C = carried_pre.get(int(b))
        if C is not None:
            c_ends, c_run, base_abs = C
            # pre-extent evidence connects iff no bad byte precedes the
            # start inside the extent (pruning guaranteed cleanliness up
            # to the extent start)
            clean = (s == bs) | (prevb < bs)
            s_abs = base_abs + (s - bs)
            pl = np.full_like(s_abs, c_run)
            if ghi is not None:
                pl = np.maximum(pl, s_abs - ghi)
            ph = s_abs - glo
            connc = clean & (ph >= pl) & (
                np.searchsorted(c_ends, pl, side="left")
                < np.searchsorted(c_ends, ph, side="right")
            )
            conn |= connc
        kk = np.flatnonzero(m)[conn]
        conn_pair[S_k[kk]] = True

    return _emit_role_ends(role, conn_pair, starts_w, blks_w, A_i, A_t,
                           A_aid, block_starts, block_ends)


def _emit_role_ends(role, conn_pair, starts_w, blks_w, A_i, A_t, A_aid,
                    block_starts, block_ends) -> Dict[int, np.ndarray]:
    """Expand connected accept pairs into per-block sorted end arrays."""
    if not conn_pair.any():
        return {}
    sel = np.flatnonzero(conn_pair)
    base_e = starts_w[A_i[sel]] + A_t[sel] + 1
    blks_e = blks_w[A_i[sel]]
    aids_e = A_aid[sel]
    out: Dict[int, List[np.ndarray]] = {}
    fwd = role.fwd
    for aid in np.unique(aids_e):
        for (_e2, adj) in fwd.expand_set(int(aid)):
            mm = aids_e == aid
            e_fl = base_e[mm] + adj
            bb = blks_e[mm]
            okb = (e_fl >= block_starts[bb]) & (e_fl <= block_ends[bb])
            for b in np.unique(bb[okb]):
                out.setdefault(int(b), []).append(
                    e_fl[okb][bb[okb] == b]
                )
    return {
        b: np.unique(np.concatenate(parts)) for b, parts in out.items()
    }


def _ints_from_words(a: np.ndarray) -> list:
    """Combine a trailing little-endian uint64 word axis into Python
    ints (one per leading row). 1-D input is the legacy single-word
    layout of round-3 databases."""
    a = np.ascontiguousarray(a.astype(np.uint64))
    if a.ndim == 1:
        return [int(x) for x in a]
    flat = a.reshape(-1, a.shape[-1])
    return [int.from_bytes(w.tobytes(), "little") for w in flat]


def _infix_tables(spec):
    """Python-int step tables cached on the spec (per-byte stepping in
    the injection scan runs on host ints, not numpy scalars — and
    Python ints make the scan width-agnostic: multi-word infix masks
    assemble into one arbitrary-precision value here)."""
    if not hasattr(spec, "_pyt"):
        co = spec.chunk_or
        if co.ndim == 2:  # legacy [nck, 256] single-word tables
            chunks = [row.tolist() for row in co]
        else:  # [nck, 256, Wn]
            chunks = [_ints_from_words(row) for row in co]
        spec._pyt = (
            chunks,
            _ints_from_words(spec.reach),
            int(spec.start),
            int(spec.accept),
        )
    return spec._pyt


def _infix_connect(spec, corpus, E, S, block_end: int,
                   init_mask: int = 0, init_pos: int = 0,
                   capture_at: int = None):
    """Forward injection scan of a general-gap NFA: start states are
    injected at every previous-role end in E, accept liveness is read at
    every candidate next-role start in S; returns (connected subset of
    S, mask at `capture_at`). Exact: mask at position p holds the union
    of all live part-scans data[e:p) over injected e (reference:
    triggered infix engine execution, src/rose/infix.h; monotone in the
    injection set). Bytes are only consumed while some state is live —
    gaps that die fast (the common case) cost a handful of steps per
    injection.

    Streaming: `init_mask` is the carried NFA state valid at `init_pos`
    (the extent start), and `capture_at` asks for the evolved mask at
    that position (the next write's extent start) — the O(1) carried
    infix stream state (reference analogue: LeftEngInfo infix stream
    state, rose_graph.h:140)."""
    chunks, reach, start, accept = _infix_tables(spec)
    conn = set()
    E_l = [int(x) for x in E]
    S_set = set(int(x) for x in S)
    if spec.nullable:
        conn |= set(E_l) & S_set
    if (init_mask & accept) and init_pos in S_set:
        # the carried mask is accept-live AT the extent start: a span
        # ending exactly there connects a role start at that position
        # (the history-cut boundary — older ends live only in the mask)
        conn.add(init_pos)
    s_max = min(int(S[-1]), block_end) if len(S) else init_pos
    scan_to = s_max if capture_at is None else max(s_max, capture_at)
    scan_to = min(scan_to, block_end)
    i_e = 0
    mask = init_mask
    p = init_pos
    cap_mask = 0
    captured = capture_at is None
    if not captured and p >= capture_at:
        cap_mask = init_mask
        captured = True
    n_ck = len(chunks)
    while True:
        if mask == 0:
            # dead: jump to the next injection (bytes between are free)
            if i_e >= len(E_l) or E_l[i_e] >= scan_to:
                break
            nxt = max(p, E_l[i_e])
            if not captured and nxt >= capture_at:
                captured = True  # dead through the capture point
            p = nxt
        while i_e < len(E_l) and E_l[i_e] == p:
            mask |= start
            i_e += 1
        if not captured and p == capture_at:
            cap_mask = mask
            captured = True
        if p >= scan_to:
            break
        # step: follow-union of live positions, masked by byte reach
        f = 0
        m = mask
        k = 0
        while m and k < n_ck:
            f |= chunks[k][m & 255]
            m >>= 8
            k += 1
        mask = f & reach[corpus[p]]
        p += 1
        if (mask & accept) and p in S_set:
            conn.add(p)
        if not captured and p == capture_at:
            cap_mask = mask
            captured = True
    return conn, cap_mask


def lit_history_required(lit) -> int:
    """History bytes needed so candidates, confirm bytes and windows of
    matches ending in a new chunk stay inside history+chunk (reference:
    RoseEngine historyRequired). Cached per lit table set."""
    if hasattr(lit, "_hist_req"):
        return lit._hist_req
    h = 0
    for fid, refs in enumerate(lit.factor_refs):
        flen = len(lit.factor_atoms[fid])
        for (_e, max_s2f, max_f2e, _le) in refs:
            h = max(h, max_f2e + max(max_s2f + WINDOW_SLACK, flen) + 2)
    lit._hist_req = h
    return h


def _resolve_infix_boundary(
    lit, role, spec, eidx, bnd, corpus, spans, prev_ends,
    block_starts, block_ends, chain_ctx, chain_out,
) -> Dict[int, np.ndarray]:
    """Resolve one general-gap boundary: role-r matches whose start
    connects to a previous-boundary end through the infix NFA (forward
    injection scan). Streaming (`chain_out` given) carries the infix
    engine's state across writes: the NFA mask captured at the next
    extent's start plus recent end positions whose factor context will
    be trimmed out of the rescanable history (reference analogue:
    LeftEngInfo infix stream state, rose_graph.h:140)."""
    streaming = chain_out is not None
    if spans:
        win, starts_w, blks_w, A_i, A_t, A_aid = _role_matches(
            role, corpus, spans
        )
        S_k, S_j = (_role_starts(role, win, A_i, A_t)
                    if len(A_i) else (np.zeros(0, np.int64),) * 2)
        s_flat = starts_w[A_i[S_k]] + S_j if len(S_k) else \
            np.zeros(0, np.int64)
        blk_s = blks_w[A_i[S_k]] if len(S_k) else np.zeros(0, np.int64)
    else:
        A_i = A_t = A_aid = starts_w = blks_w = np.zeros(0, np.int64)
        S_k = s_flat = blk_s = np.zeros(0, np.int64)
    carried: Dict[int, tuple] = {}
    if chain_ctx:
        for (b, e, rr), v in chain_ctx.items():
            if e == eidx and rr == bnd:
                carried[b] = v
    touched = set(int(b) for b in prev_ends) | set(carried)
    if len(blk_s):
        touched |= set(int(b) for b in np.unique(blk_s))
    conn_pair = np.zeros(len(A_i), dtype=bool)
    hist_req = lit_history_required(lit) if streaming else None
    for b in sorted(touched):
        bs = int(block_starts[b])
        be = int(block_ends[b])
        E_set = set()
        Ep = prev_ends.get(b)
        if Ep is not None:
            E_set |= set(int(x) for x in Ep)
        mask0 = 0
        if b in carried:
            arr, cap_abs, base_abs = carried[b]
            # plain-int path: arr[0] is the carried NFA mask, an
            # arbitrary-width Python int (chain_ctx_record keeps infix
            # records as lists — int64 arrays cannot hold wide masks)
            lst = [int(x) for x in arr]
            if lst:
                mask0 = lst[0]
                # carried recent ends, absolute -> flat local
                E_set |= {bs + (x - base_abs) for x in lst[1:]}
        m = blk_s == b
        S_b = np.unique(s_flat[m]) if m.any() else np.zeros(0, np.int64)
        E = np.asarray(sorted(E_set), dtype=np.int64)
        if not len(E) and not mask0 and not streaming:
            continue
        capture_at = max(bs, be - hist_req) if streaming else None
        ok, cap_mask = _infix_connect(
            spec, corpus, E, S_b, be,
            init_mask=mask0, init_pos=bs, capture_at=capture_at,
        )
        if streaming:
            keeps = sorted(x for x in E_set if x >= capture_at)[-4096:]
            chain_out[(b, eidx, bnd)] = (
                "imask", int(cap_mask), keeps, int(capture_at))
        if ok and m.any():
            conn = np.asarray([int(x) in ok for x in s_flat[m]],
                              dtype=bool)
            conn_pair[S_k[np.flatnonzero(m)[conn]]] = True
    return _emit_role_ends(role, conn_pair, starts_w, blks_w, A_i, A_t,
                           A_aid, block_starts, block_ends)


def _lead_connect_role(
    role, corpus, spans, gap_bits, glo, lead_floor,
    lastbad_cache, block_starts, block_ends,
) -> Dict[int, np.ndarray]:
    """Role-0 matches preceded by a leading-gap class run of length >= glo
    (Castle-prefix analogue). A bounded gap hi adds no end-set constraint:
    any run of length >= glo contains an in-bounds sub-run ending at the
    role start. `lead_floor[b]` is the flat-coords lower bound of the run
    start when the run extends before the block/extent start (streaming
    carried run; defaults to the block start)."""
    lastbad = _lastbad(corpus, gap_bits, lastbad_cache)
    win, starts_w, blks_w, A_i, A_t, A_aid = _role_matches(
        role, corpus, spans
    )
    if len(A_i) == 0:
        return {}
    S_k, S_j = _role_starts(role, win, A_i, A_t)
    if len(S_k) == 0:
        return {}
    s_flat = starts_w[A_i[S_k]] + S_j
    blk_s = blks_w[A_i[S_k]]
    conn_pair = np.zeros(len(A_i), dtype=bool)
    for b in np.unique(blk_s):
        m = blk_s == b
        s = s_flat[m]
        bs = int(block_starts[b])
        floor = int(lead_floor.get(int(b), bs))
        prevb = np.where(s > 0, lastbad[np.maximum(s - 1, 0)], -1)
        run_start = np.where(prevb >= bs, prevb + 1, floor)
        conn = (s - run_start) >= glo
        kk = np.flatnonzero(m)[conn]
        conn_pair[S_k[kk]] = True
    return _emit_role_ends(role, conn_pair, starts_w, blks_w, A_i, A_t,
                           A_aid, block_starts, block_ends)


def resolve_chains(
    lit, corpus: np.ndarray, block_starts: np.ndarray,
    block_ends: np.ndarray, block_anchored: np.ndarray,
    block_final: np.ndarray,
    chain_windows: Dict[Tuple[int, int], List[Tuple[int, int, int]]],
    chain_ctx: Dict = None, chain_out: Dict = None,
    ranges_out: List = None,
) -> Set[Record]:
    """Multi-segment chain resolution, roles left to right.

    `chain_windows[(eidx, r)]` holds candidate windows for role r.
    `chain_ctx[(b, eidx, r)]` (streaming) carries boundary-r end evidence
    as `(ends_abs, run_start_abs, base_abs)`; boundary LEAD_BOUNDARY
    carries the leading-gap run, boundary R-1 carries trailing-gap
    pending ends. `chain_out[(b, eidx, r)]` receives this write's flat
    boundary ends for the state update. Trailing-gap dense match ends are
    appended to `ranges_out` as (b, eidx, lo_local, hi_local) when given,
    else expanded into the returned records.
    """
    recs: Set[Record] = set()
    lastbad_cache: Dict = {}
    streaming = chain_out is not None
    active = {e for (e, _r) in chain_windows if e in lit.chains}
    if chain_ctx:
        active |= {e for (_b, e, _r) in chain_ctx if e in lit.chains}
    for eidx in sorted(active):
        ch = lit.chains[eidx]
        R = ch.num_roles
        if not streaming and (eidx, R - 1) not in chain_windows:
            continue  # final role can't match in this block scan

        spans0 = _merge_spans(list(chain_windows.get((eidx, 0), [])))
        ends: Dict[int, np.ndarray] = {}
        if spans0 and ch.lead is not None:
            gi, glo, _ghi = ch.lead
            lead_floor: Dict[int, int] = {}
            if chain_ctx:
                for (b, ce, rr), (_ce2, c_run, base_abs) in chain_ctx.items():
                    if ce == eidx and rr == LEAD_BOUNDARY:
                        bs = int(block_starts[b])
                        lead_floor[b] = bs - (base_abs - int(c_run))
            ends = _lead_connect_role(
                ch.roles[0], corpus, spans0, ch.gap_bits[gi], glo,
                lead_floor, lastbad_cache, block_starts, block_ends,
            )
        elif spans0:
            pre_recs = validate_windows(
                ch.roles[0].fwd, eidx, corpus, spans0, block_starts,
                block_ends, block_anchored, np.zeros_like(block_final),
            )
            tmp: Dict[int, List[int]] = {}
            for (b, _e, to_local, _f) in pre_recs:
                tmp.setdefault(b, []).append(int(block_starts[b]) + to_local)
            for b, es in tmp.items():
                ends[b] = np.asarray(sorted(set(es)), dtype=np.int64)
        if streaming and R > 1:
            for b, arr in ends.items():
                chain_out[(b, eidx, 0)] = arr

        for r in range(1, R):
            spans = _merge_spans(list(chain_windows.get((eidx, r), [])))
            inf = ch.infix.get(r - 1) if getattr(ch, "infix", None) \
                else None
            if inf is not None:
                # general-gap boundary (carried state = NFA mask, not
                # class-run evidence — _merge_carried does not apply):
                # runs even without new windows, so the streaming mask
                # advances through every write
                new_ends = _resolve_infix_boundary(
                    lit, ch.roles[r], inf, eidx, r - 1, corpus, spans,
                    ends, block_starts, block_ends, chain_ctx, chain_out,
                )
                ends = new_ends
                if r < R - 1 and streaming:
                    for b, arr in new_ends.items():
                        chain_out[(b, eidx, r)] = arr
                if not streaming and not ends and r < R - 1:
                    break
                continue
            ends, carried_pre = _merge_carried(
                ends, chain_ctx, eidx, r - 1, block_starts
            )
            if (not ends and not carried_pre) or not spans:
                new_ends: Dict[int, np.ndarray] = {}
            else:
                new_ends = _connect_role(
                    ch.roles[r], corpus, spans, ends, carried_pre,
                    ch.gap_bits[r - 1], ch.gap_lo[r - 1], ch.gap_hi[r - 1],
                    lastbad_cache, block_starts, block_ends,
                )
            if r < R - 1 and streaming:
                for b, arr in new_ends.items():
                    chain_out[(b, eidx, r)] = arr
            ends = new_ends
            if not streaming and not ends and r < R - 1:
                break

        # final-role ends -> match reports
        if ch.trail is None:
            for b, arr in ends.items():
                bs = int(block_starts[b])
                for e in arr.tolist():
                    recs.add((b, eidx, e - bs, 0))
            continue

        # trailing gap (MPV-puff analogue): every offset the class run
        # covers in [lo, hi] past a final-role end is a match end
        gi, glo, ghi = ch.trail
        if streaming:
            for b, arr in ends.items():
                chain_out[(b, eidx, R - 1)] = arr
        fb = _firstbad(corpus, ch.gap_bits[gi], lastbad_cache)
        N = corpus.shape[0]
        ends, carried_pre = _merge_carried(
            ends, chain_ctx, eidx, R - 1, block_starts
        )
        for b in set(ends) | set(carried_pre):
            bs = int(block_starts[b])
            be = int(block_ends[b])
            run_end = int(fb[bs]) if bs < N else bs  # run from block start
            e0s: List[Tuple[int, int]] = []  # (e0_local, run_end_local)
            arr = ends.get(b)
            if arr is not None:
                for e0 in arr.tolist():
                    e0 = int(e0)
                    e0_run = int(fb[e0]) if e0 < N else e0
                    e0s.append((e0, e0_run))
            C = carried_pre.get(b)
            if C is not None:
                c_ends, c_run, base_abs = C
                # pre-extent pending ends: run alive through the carried
                # region (pruned by c_run) and into this extent's prefix
                for e0_abs in np.asarray(c_ends).tolist():
                    if int(e0_abs) < int(c_run):
                        continue
                    e0s.append((bs + (int(e0_abs) - base_abs), run_end))
            spans_e: List[Tuple[int, int]] = []
            for (e0, e0_run) in e0s:
                hi = min(e0_run, be)
                if ghi is not None:
                    hi = min(hi, e0 + ghi)
                lo = max(e0 + glo, bs)
                if hi >= lo:
                    spans_e.append((lo, hi))
            # coalesce overlapping/adjacent end ranges: dense role ends
            # inside one gap run would otherwise emit O(ends) overlapping
            # ranges that the delivery stage expands individually
            spans_e.sort()
            merged_s: List[List[int]] = []
            for (lo, hi) in spans_e:
                if merged_s and lo <= merged_s[-1][1] + 1:
                    if hi > merged_s[-1][1]:
                        merged_s[-1][1] = hi
                else:
                    merged_s.append([lo, hi])
            for (lo, hi) in merged_s:
                if ranges_out is not None:
                    ranges_out.append((b, eidx, lo - bs, hi - bs))
                else:
                    for e in range(lo, hi + 1):
                        recs.add((b, eidx, e - bs, 0))
    return recs
