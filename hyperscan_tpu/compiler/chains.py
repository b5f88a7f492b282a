"""Chain decomposition: `SEG0 <gap> SEG1 <gap> ... SEGn` with unbounded
(or very wide) single-class gaps.

Reference analogue: the Rose decomposition proper (doViolet,
src/nfagraph/ng_violet.cpp:3053) — literal cut-sets split the graph into
prefix → infix → suffix roles. Here each infix is a repeated character
class (`.*`, `[^x]+`, `\\s{3,}` …) and every segment between gaps must be
width-bounded with its own literal factors; this covers the dominant
shapes of real rulesets (`foo.*bar`, `alpha.*beta.*gamma`). The runtime
resolves roles left to right, carrying end-evidence per gap boundary
(runtime/lit_runtime.py resolve_chains; streams carry the evidence
across writes).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from .ast import Node, Pos, Rep, Seq, seq
from .literals import FactorInfo, extract_factors

# gaps longer than this bounded hi also use the chain machinery (a window
# covering them would be too large)
MIN_CHAIN_GAP = 512
MAX_CHAIN_ROLES = 8


@dataclasses.dataclass
class RoleSpec:
    node: Node
    factors: List[FactorInfo]
    wmin: int
    wmax: int


@dataclasses.dataclass
class ChainSpec:
    roles: List[RoleSpec]
    # per gap between role r and r+1: (class bitmap, lo, hi|None)
    gaps: List[Tuple[np.ndarray, int, Optional[int]]]
    # leading gap before role 0 / trailing gap after the last role
    # (reference analogues: a Castle-fed prefix and the MPV "puff"
    # suffix engines — src/nfa/castle.c, src/nfa/mpv.c): the match-end
    # set of `SEG X{n,m}` is a *range* per segment end (every offset the
    # class run covers in [n, m]), and `X{n,m} SEG` requires an n-long
    # class run immediately before the segment start
    lead: Optional[Tuple[np.ndarray, int, Optional[int]]] = None
    trail: Optional[Tuple[np.ndarray, int, Optional[int]]] = None


def _widths(node: Node) -> Tuple[int, Optional[int]]:
    from .literals import _analyze

    r = _analyze(node)
    return r.wmin, r.wmax


def _is_gap(child: Node) -> bool:
    if not (isinstance(child, Rep) and isinstance(child.child, Pos)):
        return False
    if child.child.bos or child.child.eos:
        return False
    return child.hi is None or child.hi >= MIN_CHAIN_GAP


def detect_chain(node: Node, min_factor_len: int = 3,
                 max_window: int = 1024) -> Optional[ChainSpec]:
    """Split at every qualifying gap; None if the pattern doesn't fit the
    multi-segment chain shape with factorable bounded segments."""
    if not isinstance(node, Seq):
        return None
    segs: List[List[Node]] = []
    gaps: List[Rep] = []
    cur: List[Node] = []
    lead: Optional[Rep] = None
    trail: Optional[Rep] = None
    for child in node.children:
        if _is_gap(child):
            if not cur:
                if segs or lead is not None:
                    return None  # doubled gap: not chain shape
                lead = child  # leading gap (Castle-prefix analogue)
                continue
            segs.append(cur)
            gaps.append(child)
            cur = []
        else:
            cur.append(child)
    if cur:
        segs.append(cur)
    elif gaps:
        trail = gaps.pop()  # trailing gap (MPV-puff analogue)
        if not segs:
            return None
    if not segs or not (gaps or lead is not None or trail is not None):
        return None  # no roles, or no gap at all
    if len(segs) > MAX_CHAIN_ROLES:
        return None

    roles: List[RoleSpec] = []
    for parts in segs:
        n = seq(*parts)
        wmin, wmax = _widths(n)
        if wmax is None:
            return None  # nested unbounded constructs inside a segment
        fs = extract_factors(n, min_len=min_factor_len)
        if not fs:
            return None
        if any(
            fi.max_start_to_fend is None or fi.max_fend_to_end is None
            or fi.max_start_to_fend + fi.max_fend_to_end > max_window
            for fi in fs
        ):
            return None
        roles.append(RoleSpec(node=n, factors=fs, wmin=wmin, wmax=wmax))

    def _g(g: Optional[Rep]):
        return None if g is None else (g.child.cr.bits.copy(), g.lo, g.hi)

    return ChainSpec(
        roles=roles,
        gaps=[(g.child.cr.bits.copy(), g.lo, g.hi) for g in gaps],
        lead=_g(lead),
        trail=_g(trail),
    )
