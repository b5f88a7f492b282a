"""Chain decomposition: `SEG0 <gap> SEG1 <gap> ... SEGn`.

Reference analogue: the Rose decomposition proper (doViolet,
src/nfagraph/ng_violet.cpp:3053) — literal cut-sets split the graph into
prefix → infix → suffix roles. Two gap shapes:

- single-class repeats (`.*`, `[^x]+`, `\\s{3,}` …): O(1) join checks via
  last-bad-byte runs (the "miracle" analogue);
- ARBITRARY unbounded sub-graphs (`(ab|cd)*`, `(GET|POST)+` …): the gap
  carries its own bit-parallel Glushkov NFA (reference: LeftEngInfo infix
  engines, src/rose/rose_graph.h:140, src/rose/infix.h); joins validate
  by a forward injection scan — start states injected at each previous
  role end, accept liveness read at each candidate next-role start —
  exactly the reference's triggered-infix execution, vectorized over
  the evidence region. Streaming carries the infix engine's state
  across writes (the NFA mask at the next extent start plus recent
  role ends), packed into the chain-evidence codec, so gaps may span
  arbitrarily many writes and compress/expand round-trips mid-gap.

Every segment between gaps must be width-bounded with its own literal
factors. The runtime resolves roles left to right, carrying end-evidence
per gap boundary (runtime/lit_runtime.py resolve_chains; streams carry
the evidence across writes for class gaps).
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
MAX_CHAIN_ROLES = 64  # resolve cost is linear in roles; the cap is a
# sanity bound, not a routing cliff (was 8 in round 3)
MAX_INFIX_POSITIONS = 510  # general-gap NFA positions as bits of a
# multi-word uint64 mask (one extra bit is the virtual pre-start
# injection position; 511 bits -> 8 words). Reference infixes scale to
# 512-state LimEx (src/nfa/limex_simd512.c), matched here; beyond this,
# routing degrades to literal-prefilter + general-engine confirm
# instead of dropping the literal path (see database._route_branch).


def _split_words(x: int, wn: int) -> List[int]:
    m = (1 << 64) - 1
    return [(x >> (64 * i)) & m for i in range(wn)]


@dataclasses.dataclass
class InfixSpec:
    """Bit-parallel Glushkov NFA of one general gap, positions as bits
    of a multi-word mask (reference: a Rose infix engine,
    src/rose/infix.h — here a LimEx-style mask NFA of up to
    MAX_INFIX_POSITIONS+1 bits). Word arrays are little-endian uint64
    (word w holds bits 64w..64w+63); the runtime assembles them into
    arbitrary-precision Python ints once per spec
    (runtime/lit_runtime._infix_tables), so the injection scan itself
    is width-agnostic. `start`/`accept` are stored as Python ints
    (JSON-serializable at any width)."""

    reach: np.ndarray  # [256, Wn] uint64: positions whose class has byte
    follow: np.ndarray  # [P+1, Wn] uint64
    start: int  # first-position mask (span-anchored entry)
    accept: int  # accept-position mask
    nullable: bool  # epsilon in L(infix): zero-length gap connects
    # step tables: chunk_or[k][v] = OR of follow[8k+j] over set bits j of
    # v — the step function is ceil((P+1)/8) lookups + one AND per byte
    chunk_or: np.ndarray = None  # [ceil((P+1)/8), 256, Wn] uint64

    def build_tables(self) -> "InfixSpec":
        P = len(self.follow)
        wn = self.follow.shape[1]
        nck = (P + 7) // 8
        tab = np.zeros((nck, 256, wn), dtype=np.uint64)
        v = np.arange(256)
        for k in range(nck):
            for j in range(min(8, P - 8 * k)):
                sel = (v >> j) & 1 == 1
                tab[k, sel, :] |= self.follow[8 * k + j][None, :]
        self.chunk_or = tab
        return self


def build_infix(node: Node) -> Optional[InfixSpec]:
    """Compile a general gap sub-graph to a multi-word bit NFA; None
    when it doesn't fit (too many positions, anchors/EOD semantics, or
    report adjusts that don't translate to span-local matching)."""
    from ..errors import HyperscanError
    from .glushkov import build_nfa

    try:
        g = build_nfa(node)
    except HyperscanError:
        return None
    P = g.num_positions
    if P == 0 or P > MAX_INFIX_POSITIONS:
        return None
    if g.accept_eod or g.hop_lens:
        return None
    if g.anchored_first != g.float_first:
        return None  # offset anchors inside a gap
    if any(adj != 0 for adjs in g.accept.values() for adj in adjs):
        return None
    nullable = False
    for (anch, eod, adj) in g.start_accepts:
        if eod or adj != 0:
            return None
        nullable = True
    wn = (P + 1 + 63) // 64
    reach = np.zeros((256, wn), dtype=np.uint64)
    for w in range(wn):
        lo, hi = 64 * w, min(64 * (w + 1), P)
        if lo >= P:
            break
        sh = np.arange(hi - lo, dtype=np.uint64)
        reach[:, w] = np.bitwise_or.reduce(
            g.reach[lo:hi].T.astype(np.uint64) << sh[None, :], axis=1
        )
    # position P is a virtual pre-start: injected at a span start, its
    # follow set is the Glushkov first set, and no byte re-enters it
    # (reach bit stays 0) — so one step after injection the live set is
    # exactly (first positions reached by the consumed byte)
    follow = np.zeros((P + 1, wn), dtype=np.uint64)
    for p, fs in enumerate(g.follow):
        m = 0
        for q in fs:
            m |= 1 << q
        follow[p] = _split_words(m, wn)
    first = 0
    for p in g.anchored_first | g.float_first:
        first |= 1 << p
    follow[P] = _split_words(first, wn)
    accept = 0
    for p in g.accept:
        accept |= 1 << p
    return InfixSpec(
        reach=reach, follow=follow, start=1 << P, accept=accept,
        nullable=nullable,
    ).build_tables()


@dataclasses.dataclass
class RoleSpec:
    node: Node
    factors: List[FactorInfo]
    wmin: int
    wmax: int


@dataclasses.dataclass
class ChainSpec:
    roles: List[RoleSpec]
    # per gap between role r and r+1: (class bitmap, lo, hi|None);
    # general gaps carry (all-ones bitmap, 0, None) plus an InfixSpec in
    # `infixes` at the same index
    gaps: List[Tuple[np.ndarray, int, Optional[int]]]
    infixes: List[Optional[InfixSpec]] = dataclasses.field(
        default_factory=list)
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


def _is_general_gap(child: Node) -> bool:
    """An unbounded-width sub-graph that is not a single-class repeat:
    candidate for an infix-engine gap (reference: doViolet cutting at
    literals with arbitrary infixes, ng_violet.cpp:3053)."""
    if _is_gap(child):
        return False
    _wmin, wmax = _widths(child)
    return wmax is None


def detect_chain(node: Node, min_factor_len: int = 3,
                 max_window: int = 1024) -> Optional[ChainSpec]:
    """Split at every qualifying gap; None if the pattern doesn't fit the
    multi-segment chain shape with factorable bounded segments."""
    if not isinstance(node, Seq):
        return None
    segs: List[List[Node]] = []
    gaps: List[Rep] = []
    gap_inf: List[Optional[InfixSpec]] = []
    cur: List[Node] = []
    lead: Optional[Rep] = None
    trail: Optional[Rep] = None
    for child in node.children:
        if _is_gap(child) or _is_general_gap(child):
            inf = None
            if not _is_gap(child):
                inf = build_infix(child)
                if inf is None:
                    return None  # general gap that doesn't fit a word NFA
                if not cur or child is node.children[-1]:
                    # general lead/trail gaps need carried engine state
                    # (prefix/suffix engines); not chain-shaped here
                    return None
            if not cur:
                if segs or lead is not None:
                    return None  # doubled gap: not chain shape
                lead = child  # leading gap (Castle-prefix analogue)
                continue
            segs.append(cur)
            gaps.append(child)
            gap_inf.append(inf)
            cur = []
        else:
            cur.append(child)
    if cur:
        segs.append(cur)
    elif gaps:
        if gap_inf[-1] is not None:
            return None  # trailing general gap: suffix engine territory
        trail = gaps.pop()  # trailing gap (MPV-puff analogue)
        gap_inf.pop()
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

    gap_specs = []
    for g, inf in zip(gaps, gap_inf):
        if inf is None:
            gap_specs.append((g.child.cr.bits.copy(), g.lo, g.hi))
        else:
            gap_specs.append((np.ones(256, dtype=bool), 0, None))
    return ChainSpec(
        roles=roles,
        gaps=gap_specs,
        infixes=gap_inf,
        lead=_g(lead),
        trail=_g(trail),
    )
