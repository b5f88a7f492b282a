"""Chain decomposition: `LEFT <gap> RIGHT` with an unbounded gap.

Reference analogue: the Rose decomposition proper (ng_violet.cpp) — a
literal cut-set splits the graph into prefix → infix → suffix roles; the
infix here is restricted to a single repeated character class (`.*`,
`[^x]+`, `\\s{3,}` …), which covers the dominant shape of real rulesets
(`foo.*bar`). Both sides must be width-bounded with their own literal
factors; the runtime then resolves

    prefix-match ++ gap bytes ∈ class (len in [lo, hi]) ++ suffix-match

using teddy candidates on both sides, window validation per side, and a
vectorized gap-run check (runtime/lit_runtime.py).
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


@dataclasses.dataclass
class ChainSpec:
    left: Node
    gap_bits: np.ndarray  # [256] bool
    gap_lo: int
    gap_hi: Optional[int]  # None = unbounded
    right: Node
    left_factors: List[FactorInfo]
    right_factors: List[FactorInfo]
    left_wmin: int
    left_wmax: int
    right_wmin: int
    right_wmax: int


def _widths(node: Node) -> Tuple[int, Optional[int]]:
    from .literals import _analyze

    r = _analyze(node)
    return r.wmin, r.wmax


def detect_chain(node: Node, min_factor_len: int = 3,
                 max_window: int = 1024) -> Optional[ChainSpec]:
    """Split at the first qualifying gap; None if the pattern doesn't fit
    the LEFT <gap> RIGHT shape with factorable bounded sides."""
    if not isinstance(node, Seq):
        return None
    for k, child in enumerate(node.children):
        if not (isinstance(child, Rep) and isinstance(child.child, Pos)):
            continue
        if child.child.bos or child.child.eos:
            continue
        unbounded = child.hi is None or child.hi >= MIN_CHAIN_GAP
        if not unbounded:
            continue
        if k == 0 or k == len(node.children) - 1:
            continue  # leading/trailing gap: plain factor machinery handles
        left = seq(*node.children[:k])
        right = seq(*node.children[k + 1 :])
        lw = _widths(left)
        rw = _widths(right)
        if lw[1] is None or rw[1] is None:
            continue  # sides must be bounded (no nested chains this round)
        lf = extract_factors(left, min_len=min_factor_len)
        rf = extract_factors(right, min_len=min_factor_len)
        if not lf or not rf:
            continue
        if any(
            fi.max_start_to_fend is None or fi.max_fend_to_end is None
            or fi.max_start_to_fend + fi.max_fend_to_end > max_window
            for fs in (lf, rf) for fi in fs
        ):
            continue
        return ChainSpec(
            left=left,
            gap_bits=child.child.cr.bits.copy(),
            gap_lo=child.lo,
            gap_hi=child.hi,
            right=right,
            left_factors=lf,
            right_factors=rf,
            left_wmin=lw[0],
            left_wmax=lw[1],
            right_wmin=rw[0],
            right_wmax=rw[1],
        )
    return None
