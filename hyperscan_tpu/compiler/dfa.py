"""Determinization and minimization: NFAGraph(s) → scanning DFA tables.

Reference analogues:
- subset construction: src/util/determinise.h + src/nfagraph/ng_mcclellan.cpp
- Hopcroft minimization: src/nfa/dfa_min.cpp
- alphabet remap (byte equivalence classes): McClellan's alphaRemap
  (src/nfa/mcclellan_internal.h) — shrinks the 256-wide transition table to
  the number of distinguishable byte classes, which on TPU directly shrinks
  the gather table held in VMEM.

The DFA is a *scanning* DFA: the union NFA's floating starts are folded in
(every state includes the implicit ".*" restart), so no outer loop over
start offsets is needed — one pass over the data yields every match end.
Multi-pattern: accepts carry sets of (expression index, offset adjust).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, FrozenSet, List, Sequence, Set, Tuple

import numpy as np

from ..errors import CompileError
from .glushkov import NFAGraph

Report = Tuple[int, int]  # (expression index, offset adjust)


class DfaLimitExceeded(CompileError):
    """Subset construction exceeded the state budget; caller should
    partition the pattern set (reference: resource limits in grey box)."""


@dataclasses.dataclass
class ScanDFA:
    """A scanning DFA over remapped byte classes."""

    byte_to_class: np.ndarray  # [256] uint16
    trans: np.ndarray  # [S, C] int32
    start_state: int
    # the pure-floating rest state: like start_state but without the
    # anchored firsts — the correct entry state when a scan begins
    # mid-buffer (window validation, chunked scans)
    float_state: int
    # accepts: per state, a set id into `accept_sets` (0 = empty set)
    accept_id: np.ndarray  # [S] int32
    accept_eod_id: np.ndarray  # [S] int32
    accept_sets: List[FrozenSet[Report]]  # accept_sets[0] == frozenset()
    # empty-match reports: (anchored, eod, adjust, expr)
    start_reports: List[Tuple[bool, bool, int, int]]
    # partial determinization (capped subset exploration): transitions
    # into unexplored subsets land in an absorbing sink with no accepts;
    # callers must treat any path through the sink as "unknown" and
    # rescan exactly (the lazy-DFA fallback contract). None = exact DFA.
    sink_state: "Optional[int]" = None
    # NFA position subset per DFA state, packed little-endian into
    # ceil(P/64) uint64 words — lets a speculative scan chain exact NFA
    # activation masks through DFA exits. None unless partial.
    state_masks: "Optional[np.ndarray]" = None

    @property
    def num_states(self) -> int:
        return int(self.trans.shape[0])

    @property
    def num_classes(self) -> int:
        return int(self.trans.shape[1])


@dataclasses.dataclass
class _Union:
    """Flattened multi-NFA with positions renumbered into one space."""

    reach: np.ndarray  # [P, 256] bool
    follow_mask: List[int]  # bitmask ints over positions
    anchored_first_mask: int
    float_first_mask: int
    accept: Dict[int, FrozenSet[Report]]
    accept_eod: Dict[int, FrozenSet[Report]]
    start_reports: List[Tuple[bool, bool, int, int]]


def _flatten(nfas: Sequence[NFAGraph], expr_ids: Sequence[int]) -> _Union:
    reaches = []
    follow_mask: List[int] = []
    af = 0
    ff = 0
    accept: Dict[int, FrozenSet[Report]] = {}
    accept_eod: Dict[int, FrozenSet[Report]] = {}
    start_reports: List[Tuple[bool, bool, int, int]] = []
    base = 0
    for g, eid in zip(nfas, expr_ids):
        P = g.num_positions
        if P:
            reaches.append(g.reach)
        for u in range(P):
            m = 0
            for v in g.follow[u]:
                m |= 1 << (base + v)
            follow_mask.append(m)
        for v in g.anchored_first:
            af |= 1 << (base + v)
        for v in g.float_first:
            ff |= 1 << (base + v)
        for u, adjs in g.accept.items():
            accept[base + u] = frozenset((eid, a) for a in adjs)
        for u, adjs in g.accept_eod.items():
            accept_eod[base + u] = frozenset((eid, a) for a in adjs)
        for (anchored, eod, adj) in g.start_accepts:
            start_reports.append((anchored, eod, adj, eid))
        base += P
    reach = (
        np.concatenate(reaches, axis=0) if reaches else np.zeros((0, 256), dtype=bool)
    )
    return _Union(reach, follow_mask, af, ff, accept, accept_eod, start_reports)


def _byte_classes(reach: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Partition bytes into equivalence classes w.r.t. all position classes.

    Returns (byte_to_class [256] uint16, representative byte per class).
    """
    if reach.shape[0] == 0:
        return np.zeros(256, dtype=np.uint16), np.zeros(1, dtype=np.uint8)
    # signature of byte b = column b of reach; np.unique over 256 rows
    cols = np.ascontiguousarray(reach.T)  # [256, P]
    uniq, inverse = np.unique(cols, axis=0, return_inverse=True)
    byte_to_class = inverse.astype(np.uint16).reshape(256)
    reps = np.zeros(len(uniq), dtype=np.uint8)
    for b in range(255, -1, -1):
        reps[byte_to_class[b]] = b
    return byte_to_class, reps


def prune_covered_accepts(u: "_Union") -> None:
    """Drop accepts whose reports are subsumed by an unanchored vacuous
    start report: a pattern reporting an empty match at EVERY offset
    (to = e + a for all e) makes any accept with adjust >= a redundant —
    the same (id, to) is already reported. Keeps `x*`-class engines
    accept-free, so dense-match scans emit one O(1) range instead of
    millions of per-byte records."""
    # covered eids: an adjust-0 report at every offset spans [0, n], which
    # (after the runtime's 0 <= to <= n bounds clip) subsumes any regular
    # accept with adjust >= 0 (to = t+1+adj) and any EOD accept with
    # adjust <= 0 (to = n+adj)
    cover = {
        eid for (anchored, eod, adj, eid) in u.start_reports
        if not anchored and not eod and adj == 0
    }
    if not cover:
        return

    def filt(m: Dict[int, FrozenSet[Report]], eod: bool) -> None:
        for p in list(m):
            kept = frozenset(
                (eid, adj) for (eid, adj) in m[p]
                if eid not in cover or (adj > 0 if eod else adj < 0)
            )
            if kept:
                m[p] = kept
            else:
                del m[p]

    filt(u.accept, eod=False)
    filt(u.accept_eod, eod=True)


def determinize(
    nfas: Sequence[NFAGraph],
    expr_ids: Sequence[int],
    max_states: int = 60000,
    prune_covered: bool = True,
    partial: bool = False,
) -> ScanDFA:
    """Subset construction over the scanning NFA.

    With ``partial``, exceeding ``max_states`` does not raise: further
    transitions land in an absorbing no-accept sink and the result
    carries ``sink_state`` + per-state NFA masks — the lazy-DFA form the
    speculative device scan uses for engines whose full subset space
    blows up (reference analogue: limex runs such NFAs directly,
    src/nfa/limex_runtime_impl.h; here the explored-core DFA runs on
    device and sink-touched chunks rescan exactly on host)."""
    u = _flatten(nfas, expr_ids)
    if prune_covered:
        # not valid under SOM: a vacuous report's from == to does not
        # subsume a real accept's leftmost start
        prune_covered_accepts(u)
    P = u.reach.shape[0]
    byte_to_class, reps = _byte_classes(u.reach)
    C = len(reps)

    # reach mask per class: positions whose class contains the class's bytes
    reach_mask = [0] * C
    for c in range(C):
        bits = u.reach[:, int(reps[c])]
        m = 0
        for p in np.flatnonzero(bits):
            m |= 1 << int(p)
        reach_mask[c] = m

    follow = u.follow_mask
    ff = u.float_first_mask
    af = u.anchored_first_mask

    # State 0 is the initial ("anchored context") state; it behaves like the
    # floating rest-state but additionally launches anchored firsts.
    # Key: (position bitmask, is_start)
    states: Dict[Tuple[int, bool], int] = {}
    order: List[Tuple[int, bool]] = []

    sink_key = ("sink", "sink")

    def intern(key: Tuple[int, bool]) -> int:
        sid = states.get(key)
        if sid is None:
            if len(order) >= max_states and key != sink_key:
                if partial:
                    return intern(sink_key)
                raise DfaLimitExceeded(
                    f"DFA exceeds {max_states} states; partition the pattern set"
                )
            sid = len(order)
            states[key] = sid
            order.append(key)
        return sid

    start = intern((0, True))
    float_rest = intern((0, False))
    trans_rows: List[List[int]] = []
    i = 0
    # cache of OR-of-follow masks per state mask
    while i < len(order):
        if order[i] == sink_key:
            trans_rows.append([states[sink_key]] * C)
            i += 1
            continue
        mask, is_start = order[i]
        base_next = 0
        m = mask
        while m:
            low = m & (-m)
            p = low.bit_length() - 1
            base_next |= follow[p]
            m ^= low
        firsts = ff | (af if is_start else 0)
        row = []
        for c in range(C):
            nxt = (base_next | firsts) & reach_mask[c]
            row.append(intern((nxt, False)))
        trans_rows.append(row)
        i += 1

    S = len(order)
    trans = np.asarray(trans_rows, dtype=np.int32)

    # accept sets
    accept_sets: List[FrozenSet[Report]] = [frozenset()]
    set_ids: Dict[FrozenSet[Report], int] = {frozenset(): 0}

    def set_id(s: FrozenSet[Report]) -> int:
        if s not in set_ids:
            set_ids[s] = len(accept_sets)
            accept_sets.append(s)
        return set_ids[s]

    accept_id = np.zeros(S, dtype=np.int32)
    accept_eod_id = np.zeros(S, dtype=np.int32)
    for sid, (mask, _is_start) in enumerate(order):
        if mask == "sink":
            continue  # the sink accepts nothing
        acc: Set[Report] = set()
        acce: Set[Report] = set()
        m = mask
        while m:
            low = m & (-m)
            p = low.bit_length() - 1
            if p in u.accept:
                acc |= u.accept[p]
            if p in u.accept_eod:
                acce |= u.accept_eod[p]
            m ^= low
        if acc:
            accept_id[sid] = set_id(frozenset(acc))
        if acce:
            accept_eod_id[sid] = set_id(frozenset(acce))

    sink_state = states.get(sink_key)
    state_masks = None
    if partial:
        # per-state NFA subset masks, packed into uint64 words (sink = 0)
        W64 = max(1, -(-P // 64))
        state_masks = np.zeros((S, W64), dtype=np.uint64)
        for sid, (mask, _is_start) in enumerate(order):
            if mask == "sink":
                continue
            m = mask
            w = 0
            while m:
                state_masks[sid, w] = m & 0xFFFFFFFFFFFFFFFF
                m >>= 64
                w += 1
    dfa = ScanDFA(
        byte_to_class=byte_to_class,
        trans=trans,
        start_state=start,
        float_state=float_rest,
        accept_id=accept_id,
        accept_eod_id=accept_eod_id,
        accept_sets=accept_sets,
        start_reports=u.start_reports,
        sink_state=sink_state,
        state_masks=state_masks,
    )
    # Moore minimization would merge the sink with dead states and lose
    # its "unknown" meaning; partial DFAs are used as-is
    return dfa if partial else minimize(dfa)


def structural_key(g: NFAGraph, *extra) -> tuple:
    """Cache key identifying a graph up to byte relabeling: two graphs
    with the same set of distinct reach columns, follow structure,
    firsts and accepts produce byte-identical class-indexed DFA tables
    (``_byte_classes`` orders classes by column content, not byte
    value), differing only in byte_to_class."""
    cols = np.unique(np.ascontiguousarray(g.reach.T), axis=0)
    return (
        cols.shape, cols.tobytes(),
        tuple(tuple(sorted(s)) for s in g.follow),
        tuple(sorted(g.anchored_first)),
        tuple(sorted(g.float_first)),
        tuple(sorted((p, tuple(sorted(a))) for p, a in g.accept.items())),
        tuple(sorted((p, tuple(sorted(a)))
                     for p, a in g.accept_eod.items())),
        tuple(sorted(g.start_accepts)),
    ) + extra


def determinize_cached(
    g: NFAGraph, eidx: int, cache: dict,
    max_states: int = 60000, prune_covered: bool = True,
) -> ScanDFA:
    """Structure-keyed single-graph determinization: isomorphic graphs
    (same shape, different literal bytes — the dominant case in
    vocabulary-built rulesets) run subset construction ONCE and share
    the class-indexed tables; per pattern only the byte_to_class remap
    and the report id differ (reference analogue: leftfix/suffix dedupe
    across patterns, rose_build_merge.cpp + ng_is_equal.cpp)."""
    import dataclasses as _dc

    key = structural_key(g, max_states, prune_covered)
    hit = cache.get(key)
    if hit is None:
        d = determinize([g], [eidx], max_states=max_states,
                        prune_covered=prune_covered)
        cache[key] = d
        return d
    b2c, _reps = _byte_classes(g.reach)
    return _dc.replace(
        hit,
        byte_to_class=b2c,
        accept_sets=[
            frozenset((eidx, adj) for (_e, adj) in s)
            for s in hit.accept_sets
        ],
        start_reports=[(a, e2, adj, eidx)
                       for (a, e2, adj, _i) in hit.start_reports],
    )


def reverse_graph(g: NFAGraph, eod: bool) -> NFAGraph:
    """Reverse NFA for SOM back-scans (reference: ng_som.cpp reverse NFAs
    + nfaBlockExecReverse, src/nfa/nfa_rev_api.h).

    The reverse automaton starts — anchored, no floating restart — from the
    accept positions (accept_eod positions when `eod`), walks reversed
    follow edges, and accepts at the original first positions: an accept
    after the reverse scan has consumed down to byte j marks a match
    starting at j. Accepts at prev-context hop positions carry adjust +1
    (the hop consumed the byte before the start); anchored-only starts
    become reverse EOD accepts (they require reaching offset 0).
    Determinizing this graph yields a plain anchored DFA whose dead state
    is its (empty) float_state — handy for early exit.
    """
    P = g.num_positions
    follow_rev: List[Set[int]] = [set() for _ in range(P)]
    for u in range(P):
        for v in g.follow[u]:
            follow_rev[v].add(u)
    starts = set((g.accept_eod if eod else g.accept).keys())
    acc: Dict[int, Set[int]] = {}
    acc_eod: Dict[int, Set[int]] = {}
    for p in g.float_first:
        acc.setdefault(p, set()).add(g.hop_lens.get(p, 0))
    for p in g.anchored_first:
        acc_eod.setdefault(p, set()).add(g.hop_lens.get(p, 0))
    return NFAGraph(
        reach=g.reach,
        anchored_first=starts,
        float_first=set(),
        follow=follow_rev,
        accept={k: frozenset(v) for k, v in acc.items()},
        accept_eod={k: frozenset(v) for k, v in acc_eod.items()},
        start_accepts=set(),
        hop_lens={},
    )


def minimize(d: ScanDFA) -> ScanDFA:
    """Hopcroft minimization (reference: src/nfa/dfa_min.cpp).

    Initial partition distinguishes (accept_id, accept_eod_id) signatures.
    The start state is tracked through the merge.
    """
    S, C = d.trans.shape
    if S <= 1:
        return d
    sig = {}
    block_of = np.zeros(S, dtype=np.int64)
    for s in range(S):
        k = (int(d.accept_id[s]), int(d.accept_eod_id[s]))
        if k not in sig:
            sig[k] = len(sig)
        block_of[s] = sig[k]
    nblocks = len(sig)

    # iterative partition refinement (Moore); S is modest (<=60k) and C is
    # small after alphabet remap, so this is fast enough and simple.
    trans = d.trans
    while True:
        # signature: (own block, blocks of successors per class)
        keys = np.concatenate(
            [block_of[:, None], block_of[trans.reshape(S * C)].reshape(S, C)], axis=1
        )
        uniq, new_block = np.unique(keys, axis=0, return_inverse=True)
        if len(uniq) == nblocks:
            break
        nblocks = len(uniq)
        block_of = new_block

    if nblocks == S:
        return d
    # canonical representative per block
    new_trans = np.zeros((nblocks, C), dtype=np.int32)
    new_accept = np.zeros(nblocks, dtype=np.int32)
    new_accept_eod = np.zeros(nblocks, dtype=np.int32)
    rep_seen = np.zeros(nblocks, dtype=bool)
    for s in range(S):
        b = int(block_of[s])
        if not rep_seen[b]:
            rep_seen[b] = True
            new_trans[b] = block_of[trans[s]]
            new_accept[b] = d.accept_id[s]
            new_accept_eod[b] = d.accept_eod_id[s]
    return ScanDFA(
        byte_to_class=d.byte_to_class,
        trans=new_trans,
        start_state=int(block_of[d.start_state]),
        float_state=int(block_of[d.float_state]),
        accept_id=new_accept,
        accept_eod_id=new_accept_eod,
        accept_sets=d.accept_sets,
        start_reports=d.start_reports,
    )


# --------------------------------------------------------------------------
# numpy reference scan (oracle for the device kernels)
# --------------------------------------------------------------------------


def dfa_scan_reference(d: ScanDFA, data: bytes) -> Set[Tuple[int, int]]:
    """Returns the set of (expr_id, to) match records."""
    out: Set[Tuple[int, int]] = set()
    n = len(data)
    for (anchored, eod, adj, eid) in d.start_reports:
        if anchored and eod:
            if n == 0:
                out.add((eid, adj))
        elif anchored:
            out.add((eid, adj))
        elif eod:
            out.add((eid, n + adj))
        else:
            for e in range(n + 1):
                out.add((eid, e + adj))
    s = d.start_state
    arr = np.frombuffer(data, dtype=np.uint8)
    cls = d.byte_to_class[arr]
    for i in range(n):
        s = int(d.trans[s, cls[i]])
        aid = int(d.accept_id[s])
        if aid:
            for (eid, adj) in d.accept_sets[aid]:
                out.add((eid, i + 1 + adj))
    aid = int(d.accept_eod_id[s])
    if aid:
        for (eid, adj) in d.accept_sets[aid]:
            out.add((eid, n + adj))
    return {(e, t) for (e, t) in out if 0 <= t <= n}
