"""Bit-parallel NFA construction — the LimEx analogue.

Reference: src/nfa/limex_internal.h:71-160 (bitvector NFA: states as bits,
transitions as masked shifts/ORs plus exception lists), selected by
src/nfagraph/ng_limex.cpp and built by src/nfa/limex_compile.cpp for
patterns whose subset construction explodes (`.*a.{18}b` tracks 2^18
subsets but only ~20 NFA positions).

TPU redesign — two runtime forms, both built from the same tables here:

1. *Layered position-parallel scan* (ops/nfa_kernel.py): a bounded-width
   scanning NFA is acyclic, so its activation recurrence
   ``A_p[t] = reach_p[text[t]] & (entry_p | OR_{u->p} A_u[t-1])``
   unrolls into a topological sweep of per-position planes over the whole
   corpus — shifts/ANDs/ORs of full-length vectors with NO sequential
   byte loop (teddy's shift-AND generalized from literal chains to DAGs).
2. *Word-packed sequential scan* (native/scan.cpp, host): uint64 state
   words, per byte OR of follower masks of active bits then AND of the
   byte-class reach — the classic LimEx step, for streaming carry-over
   and unbounded (cyclic) graphs.

State encoding for carried stream state: ``mask | (is_start << P)`` as an
arbitrary-precision int (bit p = position p active; the extra bit marks
the offset-0 anchored context, mirroring ScanDFA's (mask, is_start) key).
"""

from __future__ import annotations

import dataclasses
from typing import FrozenSet, List, Sequence, Tuple

import numpy as np

from .dfa import _byte_classes, _flatten, prune_covered_accepts
from .glushkov import NFAGraph

Report = Tuple[int, int]  # (expression index, offset adjust)


@dataclasses.dataclass
class BitNfa:
    """Tables for one bit-parallel NFA over remapped byte classes."""

    byte_to_class: np.ndarray  # [256] int32
    class_reach: np.ndarray  # [C, P] bool: position consumes class bytes
    follow: np.ndarray  # [P, P] bool: follow[u, v] = v in follow(u)
    float_mask: np.ndarray  # [P] bool — float_first positions
    anch_mask: np.ndarray  # [P] bool — anchored_first positions
    accept_gid: np.ndarray  # [P] int32 accept-set id per position (0=none)
    accept_eod_gid: np.ndarray  # [P] int32
    accept_sets: List[FrozenSet[Report]]  # accept_sets[0] == frozenset()
    start_reports: List[Tuple[bool, bool, int, int]]
    # True iff the live graph is acyclic (bounded width): topo_order is a
    # valid evaluation order for the layered position-parallel scan
    acyclic: bool
    topo_order: np.ndarray  # [P] int32 (identity permutation if cyclic)

    @property
    def num_positions(self) -> int:
        return int(self.follow.shape[0])

    @property
    def num_classes(self) -> int:
        return int(self.class_reach.shape[0])


def _topo_sort(follow_sets: List[set], P: int):
    """(acyclic, order). Kahn's algorithm ignoring self-loops — a
    self-loop is a cycle (unbounded width), reported as cyclic."""
    indeg = [0] * P
    for u in range(P):
        for v in follow_sets[u]:
            if v == u:
                return False, np.arange(P, dtype=np.int32)
            indeg[v] += 1
    stack = [p for p in range(P) if indeg[p] == 0]
    order: List[int] = []
    while stack:
        u = stack.pop()
        order.append(u)
        for v in follow_sets[u]:
            indeg[v] -= 1
            if indeg[v] == 0:
                stack.append(v)
    if len(order) != P:
        return False, np.arange(P, dtype=np.int32)
    return True, np.asarray(order, dtype=np.int32)


def build_bitnfa(
    nfas: Sequence[NFAGraph], expr_ids: Sequence[int],
    prune_covered: bool = True,
) -> BitNfa:
    """Flatten one or more position NFAs into bit-NFA tables.

    `prune_covered` must be False for SOM engines: a vacuous
    every-offset report has from == to, so it does NOT subsume a
    real accept's (smaller) leftmost start."""
    u = _flatten(nfas, expr_ids)
    if prune_covered:
        prune_covered_accepts(u)
    P = u.reach.shape[0]
    byte_to_class, reps = _byte_classes(u.reach)
    C = len(reps)
    class_reach = np.zeros((C, P), dtype=bool)
    for c in range(C):
        class_reach[c] = u.reach[:, int(reps[c])]

    follow = np.zeros((P, P), dtype=bool)
    follow_sets: List[set] = [set() for _ in range(P)]
    for p in range(P):
        m = u.follow_mask[p]
        while m:
            low = m & (-m)
            v = low.bit_length() - 1
            follow[p, v] = True
            follow_sets[p].add(v)
            m ^= low

    def mask_to_bools(m: int) -> np.ndarray:
        out = np.zeros(P, dtype=bool)
        while m:
            low = m & (-m)
            out[low.bit_length() - 1] = True
            m ^= low
        return out

    accept_sets: List[FrozenSet[Report]] = [frozenset()]
    set_ids = {frozenset(): 0}

    def sid(s: FrozenSet[Report]) -> int:
        if s not in set_ids:
            set_ids[s] = len(accept_sets)
            accept_sets.append(s)
        return set_ids[s]

    accept_gid = np.zeros(P, dtype=np.int32)
    accept_eod_gid = np.zeros(P, dtype=np.int32)
    for p, s in u.accept.items():
        accept_gid[p] = sid(frozenset(s))
    for p, s in u.accept_eod.items():
        accept_eod_gid[p] = sid(frozenset(s))

    acyclic, order = _topo_sort(follow_sets, P)
    return BitNfa(
        byte_to_class=byte_to_class.astype(np.int32),
        class_reach=class_reach,
        follow=follow,
        float_mask=mask_to_bools(u.float_first_mask),
        anch_mask=mask_to_bools(u.anchored_first_mask),
        accept_gid=accept_gid,
        accept_eod_gid=accept_eod_gid,
        accept_sets=accept_sets,
        start_reports=list(u.start_reports),
        acyclic=acyclic,
        topo_order=order,
    )


def bitnfa_scan_reference(nfa: BitNfa, data: bytes):
    """Sequential numpy reference scan: returns the set of
    (expr_id, to) records (oracle for the kernels)."""
    out = set()
    n = len(data)
    for (anchored, eod, adj, eid) in nfa.start_reports:
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
    P = nfa.num_positions
    act = np.zeros(P, dtype=bool)
    arr = np.frombuffer(data, dtype=np.uint8)
    cls = nfa.byte_to_class[arr]
    F = nfa.follow
    for t in range(n):
        entry = nfa.float_mask | (nfa.anch_mask if t == 0 else False)
        act = ((act @ F) | entry) & nfa.class_reach[cls[t]]
        for p in np.flatnonzero(act):
            g = int(nfa.accept_gid[p])
            if g:
                for (eid, adj) in nfa.accept_sets[g]:
                    out.add((eid, t + 1 + adj))
    for p in np.flatnonzero(act):
        g = int(nfa.accept_eod_gid[p])
        if g:
            for (eid, adj) in nfa.accept_sets[g]:
                out.add((eid, n + adj))
    return {(e, t) for (e, t) in out if 0 <= t <= n}
