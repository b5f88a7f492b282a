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


def confirm_candidates(
    lit, corpus: np.ndarray, block_starts: np.ndarray,
    pos: np.ndarray, words: np.ndarray,
) -> List[Tuple[int, int]]:
    """Exact-match confirm: returns [(factor_id, flat_end_pos)].

    `pos` are flat indices of candidate last-factor bytes; `words` is
    [W, n] bucket bitmask words. A factor is confirmed when its (mask,
    value) atoms match the corpus bytes and the factor lies entirely
    inside one input block.
    """
    out: List[Tuple[int, int]] = []
    n = pos.shape[0]
    if n == 0:
        return out
    clen = corpus.shape[0]
    pos = np.asarray(pos, dtype=np.int64)
    inb = pos < clen  # drop candidates in the padded tail
    blk = np.searchsorted(block_starts, np.minimum(pos, max(clen - 1, 0)),
                          side="right") - 1
    bstart = block_starts[blk]
    # vectorized per factor: gather each candidate's window and compare
    # all atoms at once (the reference's confirm loop is scalar C; numpy
    # batches it per bucket instead)
    for bucket, fids in enumerate(lit.bucket_factors):
        if not fids:
            continue
        w, bit = divmod(bucket, 32)
        sel = np.flatnonzero(((words[w] >> bit) & 1).astype(bool) & inb)
        if sel.size == 0:
            continue
        p_sel = pos[sel]
        bs_sel = bstart[sel]
        for fid in fids:
            atoms = lit.factor_atoms[fid]
            flen = len(atoms)
            starts = p_sel - flen + 1
            okb = starts >= bs_sel
            if not okb.any():
                continue
            idx = np.flatnonzero(okb)
            win = corpus[starts[idx][:, None] + np.arange(flen)]
            vals = np.asarray([v for (v, _m) in atoms], np.uint8)
            msks = np.asarray([m for (_v, m) in atoms], np.uint8)
            hit = np.all((win & msks) == vals, axis=1)
            for j in np.flatnonzero(hit):
                out.append((fid, int(p_sel[idx[j]])))
    return out


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
    else:
        from ..ops.teddy import teddy_scan

        _total, pos, words = teddy_scan(corpus, lit.masks, capacity,
                                        hint_obj=lit)
    return finish_literal_scan(
        db, corpus, block_starts, block_ends, pos, words,
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
    lit = db.lit
    nb = block_starts.shape[0]
    if block_anchored is None:
        block_anchored = np.ones(nb, dtype=bool)
    if block_final is None:
        block_final = np.ones(nb, dtype=bool)
    recs: Set[Record] = set()
    confirmed = confirm_candidates(lit, corpus, block_starts, pos, words)
    if not confirmed:
        return recs

    blk_of = lambda p: int(np.searchsorted(block_starts, p, side="right") - 1)
    windows: Dict[int, List[Tuple[int, int, int]]] = {}
    pre_windows: Dict[int, List[Tuple[int, int, int]]] = {}
    suf_windows: Dict[int, List[Tuple[int, int, int]]] = {}
    for (fid, p) in confirmed:
        fe = p + 1  # factor end offset (exclusive), flat
        b = blk_of(p)
        bs, be = int(block_starts[b]), int(block_ends[b])
        for (eidx, max_s2f, max_f2e, kind) in lit.factor_refs[fid]:
            if kind == "equiv":
                if not eod_only:
                    recs.add((b, eidx, fe - bs, 0))
                continue
            ws = max(bs, fe - max_s2f - WINDOW_SLACK)
            we = min(be, fe + max_f2e + WINDOW_SLACK)
            if kind == "win":
                windows.setdefault(eidx, []).append((ws, we, b))
            elif kind == "pre":
                pre_windows.setdefault(eidx, []).append((ws, we, b))
            else:  # "suf"
                suf_windows.setdefault(eidx, []).append((ws, we, b))

    for eidx, spans in windows.items():
        v = lit.validators[eidx]
        recs |= validate_windows(
            v, eidx, corpus, spans, block_starts, block_ends,
            block_anchored, block_final, eod_only=eod_only,
            som_rev=lit.rev_validators.get(eidx),
        )

    if (suf_windows or (chain_out is not None and pre_windows)) \
            and not eod_only:
        recs |= _resolve_chains(
            lit, corpus, block_starts, block_ends, block_anchored,
            block_final, pre_windows, suf_windows,
            chain_ctx=chain_ctx, chain_out=chain_out,
        )
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
