"""Approximate matching: expand an NFA to accept within edit/Hamming
distance k.

Reference analogue: src/nfagraph/ng_fuzzy.cpp (make_fuzzy, called from
ng.cpp:350-363) — the graph is layered by error count; here the layers are
built directly over the Glushkov position NFA:

- position (q, e, exact): q's byte consumed correctly, e errors so far
- position (q, e, any):   q consumed by a *substitution* (any byte), or an
  *insertion* stall (extra byte consumed without advancing)
- deletions are folded into the edge structure: a consuming step may first
  skip up to k-e positions (follow^d), costing d errors
- trailing deletions fold into accepts: (q, e) accepts if some accepting
  position is within k-e deletion steps of q

Hamming distance allows substitutions only (no skip/stall layers).
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Set, Tuple

import numpy as np

from ..errors import CompileError
from .glushkov import NFAGraph

MAX_FUZZY_POSITIONS = 30000


def _follow_pow(g: NFAGraph, k: int) -> List[List[Set[int]]]:
    """T[d][p] = positions reachable from p via exactly d follow steps."""
    P = g.num_positions
    T: List[List[Set[int]]] = [[{p} for p in range(P)]]
    for _d in range(k):
        prev = T[-1]
        nxt = [set() for _ in range(P)]
        for p in range(P):
            for q in prev[p]:
                nxt[p] |= g.follow[q]
        T.append(nxt)
    return T


def fuzzy_graph(g: NFAGraph, edit: int, hamming: int) -> NFAGraph:
    """Build the k-error NFA (reference: make_fuzzy, ng_fuzzy.cpp)."""
    assert not (edit and hamming), "at most one distance kind"
    k = edit or hamming
    subs_only = hamming > 0
    P = g.num_positions
    n_layers = k + 1
    # ids: exact copies e*P + q ; 'any' copies base_any + (e-1)*P + q ;
    # anchored insertion pre-positions at the very end
    base_any = n_layers * P
    n_pre = 0 if subs_only else k
    base_pre = base_any + k * P
    total = base_pre + n_pre
    if total > MAX_FUZZY_POSITIONS:
        raise CompileError(
            f"fuzzy expansion too large ({total} positions)"
        )

    def ex(q: int, e: int) -> int:
        return e * P + q

    def an(q: int, e: int) -> int:
        assert e >= 1
        return base_any + (e - 1) * P + q

    reach = np.zeros((total, 256), dtype=bool)
    for e in range(n_layers):
        reach[e * P : (e + 1) * P] = g.reach
    reach[base_any : base_any + k * P] = True  # substitutions eat any byte
    if n_pre:
        reach[base_pre:] = True

    T = _follow_pow(g, 0 if subs_only else k)

    follow: List[Set[int]] = [set() for _ in range(total)]

    def consuming_targets(p: int, e: int) -> Set[int]:
        """All (q, e') reachable from active position p with e errors by
        one consuming step (with optional deletions / a substitution)."""
        out: Set[int] = set()
        max_d = 0 if subs_only else (k - e)
        for d in range(max_d + 1):
            # targets after d deletions = follow^{d+1}(p)
            if d + 1 < len(T):
                tgt: Set[int] = T[d + 1][p]
            else:
                tgt = set()
                for m in T[d][p]:
                    tgt |= g.follow[m]
            for q in tgt:
                if e + d <= k:
                    out.add(ex(q, e + d))
                if e + d + 1 <= k:
                    out.add(an(q, e + d + 1))
        if not subs_only and e + 1 <= k:
            out.add(an(p, e + 1))  # insertion stall: consume, don't advance
        return out

    for e in range(n_layers):
        for p in range(P):
            tgts = consuming_targets(p, e)
            follow[ex(p, e)] |= tgts
            if e >= 1:
                follow[an(p, e)] |= tgts

    # firsts: skip d leading positions (deletions) and/or substitute the
    # first byte
    anchored_first: Set[int] = set()
    float_first: Set[int] = set()

    def first_expand(firsts: Set[int], sink: Set[int]) -> None:
        max_d = 0 if subs_only else k
        layer: Set[int] = set(firsts)
        for d in range(max_d + 1):
            for q in layer:
                if d <= k:
                    sink.add(ex(q, d))
                if d + 1 <= k:
                    sink.add(an(q, d + 1))
            nxt: Set[int] = set()
            for q in layer:
                nxt |= g.follow[q]
            layer = nxt

    first_expand(g.anchored_first, anchored_first)
    first_expand(g.float_first, float_first)

    # anchored insertion pre-positions: ^pat with edit k matches with up to
    # k inserted bytes before the pattern
    if n_pre and g.anchored_first:
        for e in range(1, k + 1):
            pid = base_pre + e - 1
            if e == 1:
                anchored_first.add(pid)
            if e < k:
                follow[pid].add(base_pre + e)
            layer = set(g.anchored_first)
            for d in range(k - e + 1):
                for q in layer:
                    follow[pid].add(ex(q, e + d))
                    if e + d + 1 <= k:
                        follow[pid].add(an(q, e + d + 1))
                nxt: Set[int] = set()
                for q in layer:
                    nxt |= g.follow[q]
                layer = nxt

    # accepts: own accepts at every layer, plus trailing deletions
    accept: Dict[int, Set[int]] = {}
    accept_eod: Dict[int, Set[int]] = {}

    # dist_to_accept[q] = adjusts reachable via d deletions (d -> adjusts)
    acc_by_d: List[Dict[int, FrozenSet[int]]] = [dict(g.accept)]
    acce_by_d: List[Dict[int, FrozenSet[int]]] = [dict(g.accept_eod)]
    if not subs_only:
        for _d in range(k):
            prev_a, prev_e = acc_by_d[-1], acce_by_d[-1]
            cur_a: Dict[int, Set[int]] = {}
            cur_e: Dict[int, Set[int]] = {}
            for p in range(P):
                for q in g.follow[p]:
                    if q in prev_a:
                        cur_a.setdefault(p, set()).update(prev_a[q])
                    if q in prev_e:
                        cur_e.setdefault(p, set()).update(prev_e[q])
            acc_by_d.append({p: frozenset(s) for p, s in cur_a.items()})
            acce_by_d.append({p: frozenset(s) for p, s in cur_e.items()})

    for e in range(n_layers):
        max_d = 0 if subs_only else (k - e)
        for d in range(min(max_d, len(acc_by_d) - 1) + 1):
            for p, adjs in acc_by_d[d].items():
                for pid in ([ex(p, e)] + ([an(p, e)] if e >= 1 else [])):
                    accept.setdefault(pid, set()).update(adjs)
            for p, adjs in acce_by_d[d].items():
                for pid in ([ex(p, e)] + ([an(p, e)] if e >= 1 else [])):
                    accept_eod.setdefault(pid, set()).update(adjs)

    # vacuous: with enough deletions the whole pattern can vanish
    start_accepts = set(g.start_accepts)
    if not subs_only:
        # min consuming path length from firsts to an accept
        INF = 1 << 30
        dist = {p: 1 for p in (g.anchored_first | g.float_first)}
        frontier = set(dist)
        while frontier:
            nxt_f = set()
            for p in frontier:
                for q in g.follow[p]:
                    if q not in dist or dist[q] > dist[p] + 1:
                        dist[q] = dist[p] + 1
                        nxt_f.add(q)
            frontier = nxt_f
        min_w = min(
            (dist[p] for p in set(g.accept) | set(g.accept_eod) if p in dist),
            default=INF,
        )
        if min_w <= k:
            start_accepts.add((False, False, 0))

    return NFAGraph(
        reach=reach,
        anchored_first=anchored_first,
        float_first=float_first,
        follow=[set(f) for f in follow],
        accept={p: frozenset(s) for p, s in accept.items()},
        accept_eod={p: frozenset(s) for p, s in accept_eod.items()},
        start_accepts=start_accepts,
        hop_lens={},
    )
