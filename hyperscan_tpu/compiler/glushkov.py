"""Glushkov NFA construction with assertion resolution.

Reference analogues:
- Glushkov build: src/parser/buildstate.cpp + src/compiler/compiler.cpp:602
  (``buildGraph``: notePositions/buildFollowSet/buildEdges)
- assertion resolution by edge filtering + vertex cloning:
  src/nfagraph/ng_asserts.cpp
- anchored/floating starts (start vs startDs) and acceptEod:
  src/nfagraph/ng_holder.h
- report offset adjustments: src/util/report.h (Report::offsetAdjust)

Model
-----
A position NFA over the byte alphabet. Vertices:

- ``S0``   : anchored start — "consumed BOS"; context exists only at offset 0
- ``SD``   : floating start — self-loop on every byte (unanchored prefix)
- positions: each consumes one byte of its class
- ``ACC``  : immediate accept (report at current offset + adjust)
- ``ACCEOD``: end-of-data accept (report at data length + adjust)

Zero-width assertions (^ $ \\A \\Z \\z \\b \\B) participate in the Glushkov
first/last/follow computation as pseudo-positions and are then eliminated
right-to-left. Each assertion kind is a union of rectangles
``(PREV, NEXT)`` constraining the symbols on either side of the zero-width
gap, where PREV ⊆ bytes ∪ {BOS} and NEXT ⊆ bytes ∪ {EOS}. Elimination
produces edges carrying (prev-filter, next-filter) pairs; filters are
materialized at the end by splitting positions into class atoms — the
systematic version of the reference's assert vertex cloning.

Next-side constraints on accepts are realized by synthesizing a trailing
position that consumes the constrained byte and reports with adjust −1
(e.g. ``foo\\b`` matches in "foo," by consuming ',' and reporting to=3),
exactly the reference's offset-adjusted report scheme.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, FrozenSet, List, Optional, Set, Tuple

import numpy as np

from ..errors import CompileError
from .ast import (
    A_BOS,
    A_EOS,
    A_EOS_NL,
    A_MLINE_BOS,
    A_MLINE_EOS,
    A_NWORDB,
    A_UNWORDB,
    A_UNWORDB8,
    A_UWORDB,
    A_UWORDB8,
    A_WORDB,
    Alt,
    Anchor,
    Empty,
    Node,
    Pos,
    Rep,
    Seq,
)
from .charclass import NEWLINE, WORD, CharReach

MAX_POSITIONS = 50000  # grey-style resource limit on expanded positions

# Special vertex ids
S0 = -1  # anchored start
SD = -2  # floating start
ACC = -3  # immediate accept
ACCEOD = -4  # end-of-data accept

_ANY = CharReach.all()
_NONE = CharReach.none()
_W = WORD
_NW = ~WORD
_NL = NEWLINE


@dataclasses.dataclass
class NFAGraph:
    """Final, assertion-free position NFA for one expression."""

    reach: np.ndarray  # [P, 256] bool: consumed byte class per position
    anchored_first: Set[int]  # reachable as the first byte at offset 0 only
    float_first: Set[int]  # reachable as a first byte at any offset
    follow: List[Set[int]]
    accept: Dict[int, FrozenSet[int]]  # pos -> set of report adjusts
    accept_eod: Dict[int, FrozenSet[int]]  # pos -> adjusts (to = len+adj)
    # empty-match accepts: (anchored, eod, adjust)
    #  (True,  False, a): empty match at offset 0, to = a
    #  (False, False, a): empty match at every offset e, to = e + a
    #  (True,  True,  a): empty input only, to = a
    #  (False, True,  a): empty match at EOD, to = len + a
    start_accepts: Set[Tuple[bool, bool, int]] = dataclasses.field(default_factory=set)
    # entry positions synthesized by assertion resolution that consume
    # bytes *before* the match start (".*[cr]" hops for \b/^m
    # prev-context; UCP \b codepoint chains consume 1-4 bytes): maps the
    # chain's entry position to its byte length, so SOM reverse scans and
    # register seeding report the start that many bytes to the right
    hop_lens: Dict[int, int] = dataclasses.field(default_factory=dict)

    @property
    def num_positions(self) -> int:
        return len(self.follow)

    def is_vacuous(self) -> bool:
        return bool(self.start_accepts)


# --------------------------------------------------------------------------
# Bounded-repeat expansion into Star/Plus/Opt primitives
# (the reference expands {n,m} similarly: src/parser/ComponentRepeat.cpp)
# --------------------------------------------------------------------------


def _count_positions(node: Node) -> int:
    if isinstance(node, (Pos, Anchor)):
        return 1
    if isinstance(node, (Seq, Alt)):
        return sum(_count_positions(c) for c in node.children)
    if isinstance(node, Rep):
        per = _count_positions(node.child)
        hi = node.hi if node.hi is not None else max(node.lo, 1)
        return per * max(hi, 1)
    return 0


def _expand(node: Node) -> Node:
    if _count_positions(node) > MAX_POSITIONS:
        raise CompileError(
            f"pattern too large after repeat expansion (limit {MAX_POSITIONS})"
        )
    return _expand_rec(node)


def _expand_rec(node: Node) -> Node:
    if isinstance(node, (Pos, Anchor, Empty)):
        return node
    if isinstance(node, Seq):
        return Seq(tuple(_expand_rec(c) for c in node.children))
    if isinstance(node, Alt):
        return Alt(tuple(_expand_rec(c) for c in node.children))
    assert isinstance(node, Rep)
    child = _expand_rec(node.child)
    lo, hi = node.lo, node.hi
    if hi is None:
        if lo == 0:
            return Rep(child, 0, None)  # Star
        if lo == 1:
            return Rep(child, 1, None)  # Plus
        return Seq(tuple([child] * (lo - 1)) + (Rep(child, 1, None),))
    if lo == 0 and hi == 0:
        return Empty()
    if lo == 0 and hi == 1:
        return Rep(child, 0, 1)  # Opt
    parts: List[Node] = [child] * lo + [Rep(child, 0, 1)] * (hi - lo)
    if len(parts) == 1:
        return parts[0]
    return Seq(tuple(parts))


# --------------------------------------------------------------------------
# first/last/follow
# --------------------------------------------------------------------------


@dataclasses.dataclass
class _Info:
    nullable: bool
    first: FrozenSet[int]
    last: FrozenSet[int]


class _Builder:
    def __init__(self) -> None:
        self.leaves: List[Node] = []
        self.follow: List[Set[int]] = []

    def new_pos(self, leaf: Node) -> int:
        pid = len(self.leaves)
        if pid >= MAX_POSITIONS:
            raise CompileError(f"pattern exceeds {MAX_POSITIONS} positions")
        self.leaves.append(leaf)
        self.follow.append(set())
        return pid

    def link(self, lasts, firsts) -> None:
        for u in lasts:
            self.follow[u].update(firsts)

    def build(self, node: Node) -> _Info:
        if isinstance(node, Empty):
            return _Info(True, frozenset(), frozenset())
        if isinstance(node, (Pos, Anchor)):
            pid = self.new_pos(node)
            s = frozenset([pid])
            return _Info(False, s, s)
        if isinstance(node, Seq):
            nullable = True
            first: FrozenSet[int] = frozenset()
            last: FrozenSet[int] = frozenset()
            for child in node.children:
                ci = self.build(child)
                self.link(last, ci.first)
                if nullable:
                    first = first | ci.first
                last = (last | ci.last) if ci.nullable else ci.last
                nullable = nullable and ci.nullable
            return _Info(nullable, first, last)
        if isinstance(node, Alt):
            nullable = False
            first = frozenset()
            last = frozenset()
            for child in node.children:
                ci = self.build(child)
                nullable = nullable or ci.nullable
                first = first | ci.first
                last = last | ci.last
            return _Info(nullable, first, last)
        assert isinstance(node, Rep)
        ci = self.build(node.child)
        if node.lo == 0 and node.hi == 1:  # Opt
            return _Info(True, ci.first, ci.last)
        self.link(ci.last, ci.first)  # Star / Plus loopback
        return _Info(node.lo == 0 or ci.nullable, ci.first, ci.last)


# --------------------------------------------------------------------------
# Assertion rectangles
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _PF:
    """Prev-symbol filter: byte set + whether BOS (offset 0) is allowed.

    ``cp`` (UCP+UTF8 word boundaries only): additionally require the
    codepoint *ending* at the previous byte to be a UCP word codepoint
    (True) / non-word codepoint (False). The byte set then applies to the
    final byte of that codepoint (used when other assertions conjoin)."""

    cr: CharReach
    bos: bool
    cp: Optional[bool] = None


@dataclasses.dataclass(frozen=True)
class _NF:
    """Next-symbol filter: byte set + whether EOS (end of data) is allowed.

    ``cp``: require the codepoint *starting* at the next byte to be a UCP
    word codepoint (True) / non-word codepoint (False)."""

    cr: CharReach
    eos: bool
    cp: Optional[bool] = None


_PF_ANY = _PF(_ANY, True)
_NF_ANY = _NF(_ANY, True)


def _cp_merge(a: Optional[bool], b: Optional[bool]):
    """Conjoin two codepoint-wordness requirements; 'conflict' = dead."""
    if a is None:
        return b
    if b is None or a == b:
        return a
    return "conflict"


def _pf_and(a: Optional[_PF], b: _PF) -> _PF:
    if a is None:
        return b
    cp = _cp_merge(a.cp, b.cp)
    if cp == "conflict":
        return _PF(_NONE, False)
    return _PF(a.cr & b.cr, a.bos and b.bos, cp)


def _nf_and(a: Optional[_NF], b: _NF) -> _NF:
    if a is None:
        return b
    cp = _cp_merge(a.cp, b.cp)
    if cp == "conflict":
        return _NF(_NONE, False)
    return _NF(a.cr & b.cr, a.eos and b.eos, cp)


def _pf_trivial(f: Optional[_PF]) -> bool:
    return f is None or (f.bos and f.cr.count() == 256 and f.cp is None)


def _nf_trivial(f: Optional[_NF]) -> bool:
    return f is None or (f.eos and f.cr.count() == 256 and f.cp is None)


@functools.lru_cache(maxsize=1)
def _ucp_word_bytes() -> CharReach:
    from .ucp import word_byte_reach

    return word_byte_reach()


_ASCII = CharReach.range(0, 0x7F)


def _ucp_cp_ranges(word: bool):
    """UCP word / non-word codepoint ranges."""
    from .ucp import nonword_ranges, word_ranges

    return word_ranges() if word else nonword_ranges()


def _cr_to_cp_ranges(cr: CharReach, word: bool):
    """Byte filter ∧ codepoint-wordness → codepoint ranges for the class
    of codepoints the context may hold. ASCII bytes translate 1:1; a byte
    filter that passes every non-ASCII byte leaves multibyte codepoints
    unrestricted; a filter that blocks them all removes them. Anything in
    between cannot be expressed at the codepoint level."""
    from .utf8 import charreach_to_ranges, intersect_ranges

    base = _ucp_cp_ranges(word)
    non_ascii = cr - _ASCII
    ascii_rs = charreach_to_ranges(cr & _ASCII)
    out = intersect_ranges(base, ascii_rs)
    if non_ascii.count() == 128:
        out = out + intersect_ranges(base, [(0x80, 0x10FFFF)])
    elif non_ascii.count() != 0:
        raise CompileError(
            "\\b under UCP: cannot combine a partial non-ASCII byte "
            "constraint with codepoint-level word context"
        )
    from .utf8 import normalize_ranges

    return normalize_ranges(out)


# rectangles per assertion kind; `nl_eod` marks the \Z/"$ before final
# newline" rectangle whose byte branch must land on an EOD accept.
def _assert_rects(kind: str):
    if kind == A_BOS:
        return [(_PF(_NONE, True), _NF_ANY, False)]
    if kind == A_MLINE_BOS:
        return [(_PF(_NL, True), _NF_ANY, False)]
    if kind == A_EOS:
        return [(_PF_ANY, _NF(_NONE, True), False)]
    if kind == A_EOS_NL:  # $, \Z
        return [
            (_PF_ANY, _NF(_NONE, True), False),
            (_PF_ANY, _NF(_NL, False), True),  # before a FINAL newline
        ]
    if kind == A_MLINE_EOS:
        return [(_PF_ANY, _NF(_NL, True), False)]
    if kind == A_WORDB:
        return [
            (_PF(_W, False), _NF(_NW, True), False),
            (_PF(_NW, True), _NF(_W, False), False),
        ]
    if kind == A_NWORDB:
        return [
            (_PF(_W, False), _NF(_W, False), False),
            (_PF(_NW, True), _NF(_NW, True), False),
        ]
    if kind == A_UWORDB8:  # UCP \b, byte == codepoint (no UTF8)
        uw = _ucp_word_bytes()
        return [
            (_PF(uw, False), _NF(~uw, True), False),
            (_PF(~uw, True), _NF(uw, False), False),
        ]
    if kind == A_UNWORDB8:
        uw = _ucp_word_bytes()
        return [
            (_PF(uw, False), _NF(uw, False), False),
            (_PF(~uw, True), _NF(~uw, True), False),
        ]
    if kind == A_UWORDB:  # UCP+UTF8 \b: codepoint-level rectangles
        return [
            (_PF(_ANY, False, True), _NF(_ANY, True, False), False),
            (_PF(_ANY, True, False), _NF(_ANY, False, True), False),
        ]
    if kind == A_UNWORDB:
        return [
            (_PF(_ANY, False, True), _NF(_ANY, False, True), False),
            (_PF(_ANY, True, False), _NF(_ANY, True, False), False),
        ]
    raise CompileError(f"unsupported assertion kind {kind!r}")


# Edge: (u, v, prev_filter, next_filter, adjust)
_Edge = Tuple[int, int, Optional[_PF], Optional[_NF], int]


class _Resolver:
    """Eliminates assertion pseudo-positions from the edge set."""

    def __init__(self, builder: _Builder):
        self.b = builder
        self.synth_prev: Dict[bytes, int] = {}  # class key -> position id
        self.synth_acc: Dict[Tuple[bytes, bool, int], int] = {}
        self._nl_clones: Dict[Tuple, int] = {}
        self.extra_edges: List[_Edge] = []
        # UCP codepoint-context tries: ranges key -> chain summaries
        self.synth_prev_cp: Dict[Tuple, List[Tuple[int, int, int]]] = {}
        self.synth_acc_cp: Dict[Tuple, List[int]] = {}
        self.cp_hop_finals: Set[int] = set()  # cp-trie final positions
        # chain ENTRY position -> prev-context byte count (SOM hop)
        self.hop_first_lens: Dict[int, int] = {}

    def _new_real(self, cr: CharReach, wordcp: Optional[bool] = None) -> int:
        pid = self.b.new_pos(Pos(cr, wordcp=wordcp))
        return pid

    def _cp_chains(self, ranges, tag: bool) -> List[Tuple[int, int, int]]:
        """Synthesize position chains matching one UTF-8 codepoint from
        ``ranges`` (reference analogue: assert-vertex cloning over UTF-8
        subgraphs, src/nfagraph/ng_asserts.cpp). Returns
        (first, final, length) per chain; internal edges are queued."""
        from .utf8 import cp_ranges_to_seqs, normalize_ranges

        out: List[Tuple[int, int, int]] = []
        for byteseq in cp_ranges_to_seqs(normalize_ranges(ranges)):
            pids = []
            for k, (blo, bhi) in enumerate(byteseq):
                is_edge = k == 0 or k == len(byteseq) - 1
                pids.append(self._new_real(
                    CharReach.range(blo, bhi),
                    wordcp=tag if is_edge else None,
                ))
            for a, bb in zip(pids, pids[1:]):
                self.extra_edges.append((a, bb, None, None, 0))
            out.append((pids[0], pids[-1], len(pids)))
        return out

    def _prev_cp_variants(self, pf: _PF) -> List[Tuple[int, None]]:
        """Floating-start decomposition of a codepoint-level prev filter:
        ``.*`` followed by one full codepoint from the class."""
        ranges = _cr_to_cp_ranges(pf.cr, bool(pf.cp))
        key = tuple(ranges) + (bool(pf.cp),)
        if key not in self.synth_prev_cp:
            chains = self._cp_chains(ranges, bool(pf.cp))
            for (first, _final, _ln) in chains:
                self.extra_edges.append((SD, first, None, None, 0))
                self.extra_edges.append((S0, first, None, None, 0))
            self.synth_prev_cp[key] = chains
            for (first, final, ln) in chains:
                self.cp_hop_finals.add(final)
                self.hop_first_lens[first] = ln
        return [(final, None) for (_f, final, _ln) in self.synth_prev_cp[key]]

    def _resolve_pf_real(self, u: int, pf: _PF) -> Optional[Optional[_PF]]:
        """Resolve a codepoint-level prev filter against a concrete
        predecessor position. Returns the residual byte filter (possibly
        None) if the edge survives, or the sentinel string 'drop'."""
        leaf = self.b.leaves[u]
        assert isinstance(leaf, Pos)
        if pf.cp is None:
            return pf if (pf.cr or pf.bos) else None
        tag = leaf.wordcp
        if tag is not None:
            if tag != pf.cp:
                return "drop"
            return None if pf.cr.count() == 256 else _PF(pf.cr, pf.bos)
        if (leaf.cr - _ASCII).count() == 0:
            # single-byte codepoints: byte word-ness == codepoint word-ness
            allowed = _ucp_word_bytes() if pf.cp else (~_ucp_word_bytes())
            eff = pf.cr & allowed & _ASCII
            if not eff:
                return "drop"
            return _PF(eff, pf.bos)
        raise CompileError(
            "\\b under UCP cannot resolve against an untagged non-ASCII "
            "position (unsupported pattern shape)"
        )

    def prev_variants(self, u: int, pf: Optional[_PF]):
        """Decompose a prev-filter for a given predecessor into concrete
        (source, residual prev-filter) pairs, synthesizing ".*[cr]" hop
        positions where the floating start needs a constrained last byte."""
        if _pf_trivial(pf):
            if u == SD:
                return [(SD, None)]
            return [(u, None)]
        assert pf is not None
        out = []
        if u == S0:
            if pf.bos:
                out.append((S0, None))
        elif u == SD:
            if pf.bos:
                out.append((S0, None))
            if pf.cp is not None:
                out.extend(self._prev_cp_variants(pf))
            elif pf.cr:
                k = pf.cr.key()
                if k not in self.synth_prev:
                    w = self._new_real(pf.cr)
                    self.synth_prev[k] = w
                    self.hop_first_lens[w] = 1
                    self.extra_edges.append((SD, w, None, None, 0))
                    self.extra_edges.append((S0, w, None, None, 0))
                out.append((self.synth_prev[k], None))
        elif isinstance(self.b.leaves[u], Pos):
            # concrete predecessor: codepoint requirements resolve now,
            # byte requirements ride the edge into atom splitting
            resolved = self._resolve_pf_real(u, pf)
            if resolved != "drop":
                out.append((u, resolved))
        else:
            # assertion predecessor: carry the filter to its elimination
            if pf.cr or pf.bos or pf.cp is not None:
                out.append((u, pf))
        return out

    def _resolve_nf_real(self, v: int, nf: _NF):
        """Resolve a codepoint-level next filter against a concrete
        successor position: tag check for codepoint chains, byte
        translation for single-byte (ASCII) positions."""
        leaf = self.b.leaves[v]
        if not isinstance(leaf, Pos):
            raise CompileError(
                "\\b under UCP adjacent to an unresolved assertion"
            )
        tag = leaf.wordcp
        if tag is not None:
            if tag != bool(nf.cp):
                return "drop"
            return None if nf.cr.count() == 256 else _NF(nf.cr, nf.eos)
        if (leaf.cr - _ASCII).count() == 0:
            allowed = _ucp_word_bytes() if nf.cp else (~_ucp_word_bytes())
            eff = nf.cr & allowed & _ASCII
            if not eff:
                return "drop"
            return _NF(eff, nf.eos)
        raise CompileError(
            "\\b under UCP cannot resolve against an untagged non-ASCII "
            "position (unsupported pattern shape)"
        )

    def accept_edges(self, u: int, upf: Optional[_PF], nf: Optional[_NF],
                     adjust: int, eod_only: bool, nl_eod: bool) -> List[_Edge]:
        """Route an accept with a next-side constraint, synthesizing a
        trailing consuming position when the constraint names bytes."""
        out: List[_Edge] = []
        if _nf_trivial(nf) and not nl_eod:
            out.append((u, ACCEOD if eod_only else ACC, upf, None, adjust))
            return out
        nf = nf if nf is not None else _NF_ANY
        if nf.eos and not nl_eod:
            # accept exactly at end-of-data
            out.append((u, ACCEOD, upf, None, adjust))
        if eod_only:
            return out
        if nf.cp is not None:
            # consume one full constrained codepoint, report at its start
            # (offset-adjusted by the codepoint's byte length)
            ranges = _cr_to_cp_ranges(nf.cr, bool(nf.cp))
            key = tuple(ranges) + (bool(nf.cp), nl_eod, adjust)
            if key not in self.synth_acc_cp:
                firsts = []
                for (first, final, ln) in self._cp_chains(
                    ranges, bool(nf.cp)
                ):
                    self.extra_edges.append((
                        final, ACCEOD if nl_eod else ACC, None, None,
                        adjust - ln,
                    ))
                    firsts.append(first)
                self.synth_acc_cp[key] = firsts
            for first in self.synth_acc_cp[key]:
                out.append((u, first, upf, None, 0))
            return out
        if nf.cr:
            # consume one constrained byte, report one byte earlier
            eod_flag = nl_eod
            k = (nf.cr.key(), eod_flag, adjust - 1)
            if k not in self.synth_acc:
                w = self._new_real(nf.cr)
                self.synth_acc[k] = w
                self.extra_edges.append(
                    (w, ACCEOD if eod_flag else ACC, None, None, adjust - 1)
                )
            out.append((u, self.synth_acc[k], upf, None, 0))
        return out

    def _nl_eod_clone(self, v: int, ncr: CharReach, edges: List[_Edge]) -> Optional[int]:
        """Clone a real successor of a \\Z/"$ before final newline"
        rectangle: the clone consumes the (final) newline, keeps only v's
        accepts — converted to EOD accepts so finality is enforced — and
        drops all other out-edges (nothing may follow the final byte)."""
        vcls = self.b.leaves[v].cr if isinstance(self.b.leaves[v], Pos) else _NONE
        eff = vcls & ncr
        if not eff:
            return None
        key = ("nl_eod", v, eff.key())
        if key in self._nl_clones:
            return self._nl_clones[key]
        w = self._new_real(eff)
        self._nl_clones[key] = w
        for (su, sv, uf_a, vf_a, adj_a) in edges:
            if su != v:
                continue
            if sv == ACC:
                if vf_a is None or vf_a.eos:
                    self.extra_edges.append((w, ACCEOD, uf_a, None, adj_a))
            elif sv == ACCEOD:
                self.extra_edges.append((w, ACCEOD, uf_a, None, adj_a))
        return w

    def eliminate(self, pid: int, edges: List[_Edge]) -> List[_Edge]:
        kind = self.b.leaves[pid].kind  # type: ignore[union-attr]
        rects = _assert_rects(kind)
        # Self-loop edges (from quantified groups mixing assertions with
        # atoms, e.g. (\b|a){2,}) are dropped: traversing the same
        # assertion twice imposes duplicate filters on the same gap, so
        # every loop path is subsumed by the direct single-traversal path
        # — the language is unchanged.
        preds = [e for e in edges if e[1] == pid and e[0] != pid]
        succs = [e for e in edges if e[0] == pid and e[1] != pid]
        out = [e for e in edges if e[0] != pid and e[1] != pid]

        for (pf_rect, nf_rect, nl_eod) in rects:
            for (u, _p, uf1, vf1, adj1) in preds:
                # prev side: conjoin the incoming prev-filter with the rect's
                pf = _pf_and(uf1, pf_rect)
                if not pf.cr and not pf.bos:
                    continue
                for (uu, residual_pf) in self.prev_variants(u, pf):
                    for (_p2, v, uf2, vf2, adj2) in succs:
                        # uf2 is a prev-side constraint carried on an edge
                        # out of the assertion (from earlier eliminations);
                        # it constrains the same gap, so conjoin.
                        eff_pf = residual_pf
                        if uf2 is not None:
                            eff_pf = _pf_and(eff_pf, uf2) if eff_pf is not None else uf2
                        if uu in (S0, SD) and not _pf_trivial(eff_pf):
                            # start-side byte constraints were already
                            # decomposed once; a constraint carried in from
                            # uf2 re-decomposes against the start: at S0 the
                            # gap sits at BOS (only the bos flag matters),
                            # at SD it spawns ".*[cr]" hop variants.
                            pairs = self.prev_variants(uu, eff_pf)
                        else:
                            pairs = [(uu, eff_pf)]
                        nf = _nf_and(_nf_and(vf1, nf_rect), vf2 or _NF_ANY)
                        adj = adj1 + adj2
                        for (uuu, pf_out) in pairs:
                            if v == ACC:
                                out.extend(
                                    self.accept_edges(uuu, pf_out, nf, adj, False, nl_eod)
                                )
                            elif v == ACCEOD:
                                if nf.eos and not nl_eod:
                                    out.append((uuu, ACCEOD, pf_out, None, adj))
                            else:
                                v_assert = isinstance(self.b.leaves[v], Anchor)
                                # an eos-only next filter is satisfiable
                                # through a successor assertion (it resolves
                                # at that assertion's elimination), but never
                                # through a byte-consuming position
                                if not nf.cr and not (nf.eos and v_assert):
                                    continue
                                if nl_eod:
                                    # "$ before final \n" then a successor that
                                    # consumes exactly that final \n
                                    if nf.cp is True:
                                        continue  # \n is not a word codepoint
                                    w = self._nl_eod_clone(v, nf.cr, edges)
                                    if w is not None:
                                        out.append((uuu, w, pf_out, None, adj))
                                    continue
                                vf_out = _NF(nf.cr, nf.eos, nf.cp)
                                if nf.cp is not None and not v_assert:
                                    vf_out = self._resolve_nf_real(v, nf)
                                    if vf_out == "drop":
                                        continue
                                out.append((uuu, v, pf_out, vf_out, adj))
        return out


# --------------------------------------------------------------------------
# build_nfa
# --------------------------------------------------------------------------


def build_nfa(node: Node) -> NFAGraph:
    node = _expand(node)
    b = _Builder()
    info = b.build(node)

    edges: List[_Edge] = []
    for f in info.first:
        edges.append((SD, f, None, None, 0))
        edges.append((S0, f, None, None, 0))
    for u in range(len(b.leaves)):
        for v in b.follow[u]:
            edges.append((u, v, None, None, 0))
    for l in info.last:
        edges.append((l, ACC, None, None, 0))

    start_accepts: Set[Tuple[bool, bool, int]] = set()
    if info.nullable:
        start_accepts.add((False, False, 0))  # empty match at every offset

    is_assert = [isinstance(l, Anchor) for l in b.leaves]
    resolver = _Resolver(b)

    # eliminate rightmost-first: an assertion is ready when none of its
    # successors is an assertion
    for _ in range(len(b.leaves) + 8):
        while len(is_assert) < len(b.leaves):
            is_assert.append(False)
        pending = [
            p
            for p in range(len(is_assert))
            if is_assert[p] and any(e[0] == p or e[1] == p for e in edges)
        ]
        if not pending:
            break
        ready = [
            p
            for p in pending
            if not any(
                e[0] == p and e[1] >= 0 and e[1] < len(is_assert) and is_assert[e[1]]
                for e in edges
            )
        ]
        if not ready:
            # Assertion-to-assertion cycle (e.g. ((\b|a){2,})+ loops \b
            # back to itself through the repeat). Eliminating any member
            # rewires its predecessors to its successors with conjoined
            # filters; the cycle shrinks to a self-loop, which eliminate()
            # drops as subsumed. Pick the member with the fewest assertion
            # successors to keep the filter chains short.
            ready = sorted(
                pending,
                key=lambda p: sum(
                    1
                    for e in edges
                    if e[0] == p
                    and 0 <= e[1] < len(is_assert)
                    and is_assert[e[1]]
                    and e[1] != p
                ),
            )
        edges = resolver.eliminate(ready[0], edges)
        edges.extend(resolver.extra_edges)
        resolver.extra_edges = []
    else:
        raise CompileError("assertion resolution did not converge")

    while len(is_assert) < len(b.leaves):
        is_assert.append(False)

    # drop any leftover edges touching assertions (unsatisfiable paths)
    edges = [
        e
        for e in edges
        if not (0 <= e[0] < len(is_assert) and is_assert[e[0]])
        and not (0 <= e[1] < len(is_assert) and is_assert[e[1]])
    ]

    # --- start-accept extraction -----------------------------------------
    kept: List[_Edge] = []
    for (u, v, uf, vf, adj) in edges:
        if v in (ACC, ACCEOD) and u in (S0, SD):
            anchored = u == S0
            eod = v == ACCEOD
            start_accepts.add((anchored, eod, adj))
        else:
            kept.append((u, v, uf, vf, adj))
    edges = kept

    # --- resolve residual codepoint-level filters -------------------------
    # Filters carried through chained-assertion eliminations can still
    # hold a cp requirement; materialization is byte-only, so resolve
    # them against the concrete endpoint positions here.
    if any(
        (uf is not None and uf.cp is not None)
        or (vf is not None and vf.cp is not None)
        for (_u, _v, uf, vf, _a) in edges
    ):
        resolved_edges: List[_Edge] = []
        for (u, v, uf, vf, adj) in edges:
            if uf is not None and uf.cp is not None:
                if u >= 0:
                    uf = resolver._resolve_pf_real(u, uf)
                    if uf == "drop":
                        continue
                elif u == S0:
                    if not uf.bos:
                        continue
                    uf = None
                else:  # SD with an unresolved cp context
                    raise CompileError(
                        "\\b under UCP: unresolved floating codepoint "
                        "context (unsupported pattern shape)"
                    )
            if vf is not None and vf.cp is not None:
                if v >= 0:
                    vf = resolver._resolve_nf_real(v, vf)
                    if vf == "drop":
                        continue
                elif v == ACCEOD:
                    if not vf.eos:
                        continue
                    vf = None
                else:
                    raise CompileError(
                        "\\b under UCP: unresolved codepoint context on "
                        "an accept (unsupported pattern shape)"
                    )
            resolved_edges.append((u, v, uf, vf, adj))
        edges = resolved_edges

    # --- materialize filters by atom-splitting ----------------------------
    leaves = b.leaves
    classes: List[CharReach] = [
        l.cr if isinstance(l, Pos) else _NONE for l in leaves
    ]

    # collect refinement filters per position
    refine: Dict[int, List[CharReach]] = {}
    for (u, v, uf, vf, adj) in edges:
        if u >= 0 and uf is not None:
            refine.setdefault(u, []).append(uf.cr)
        if v >= 0 and vf is not None:
            refine.setdefault(v, []).append(vf.cr)

    pos_atoms: Dict[int, List[CharReach]] = {}
    for p in range(len(leaves)):
        if is_assert[p]:
            continue
        base = classes[p]
        atoms = [base] if base else []
        for f in refine.get(p, []):
            nxt = []
            for a in atoms:
                i1, i2 = a & f, a - f
                if i1:
                    nxt.append(i1)
                if i2:
                    nxt.append(i2)
            atoms = nxt
        pos_atoms[p] = atoms

    new_ids: Dict[Tuple[int, int], int] = {}
    new_reach: List[CharReach] = []
    for p, atoms in pos_atoms.items():
        for i, a in enumerate(atoms):
            new_ids[(p, i)] = len(new_reach)
            new_reach.append(a)

    def variants(p: int, filt: Optional[CharReach]):
        for i, a in enumerate(pos_atoms.get(p, [])):
            if filt is None or (a & filt).key() == a.key():
                yield new_ids[(p, i)]

    n_new = len(new_reach)
    anchored_first: Set[int] = set()
    float_first: Set[int] = set()
    follow_new: List[Set[int]] = [set() for _ in range(n_new)]
    accept: Dict[int, Set[int]] = {}
    accept_eod: Dict[int, Set[int]] = {}

    for (u, v, uf, vf, adj) in edges:
        ufilt = uf.cr if uf is not None else None
        vfilt = vf.cr if vf is not None else None
        if v in (ACC, ACCEOD):
            tgt = accept if v == ACC else accept_eod
            for uid in variants(u, ufilt):
                tgt.setdefault(uid, set()).add(adj)
            continue
        tgts = list(variants(v, vfilt))
        if not tgts:
            continue
        if u == S0:
            anchored_first.update(tgts)
        elif u == SD:
            float_first.update(tgts)
        else:
            for uid in variants(u, ufilt):
                follow_new[uid].update(tgts)

    reach = np.zeros((n_new, 256), dtype=bool)
    for i, cr in enumerate(new_reach):
        reach[i] = cr.bits

    hop_lens = {
        nid: resolver.hop_first_lens[p]
        for (p, i), nid in new_ids.items() if p in resolver.hop_first_lens
    }

    g = NFAGraph(
        reach=reach,
        anchored_first=anchored_first,
        float_first=float_first,
        follow=follow_new,
        accept={k: frozenset(v) for k, v in accept.items()},
        accept_eod={k: frozenset(v) for k, v in accept_eod.items()},
        start_accepts=start_accepts,
        hop_lens=hop_lens,
    )
    return _prune(g)


def _prune(g: NFAGraph) -> NFAGraph:
    """Drop unreachable / non-accepting-reachable positions
    (reference: src/nfagraph/ng_prune.cpp)."""
    P = g.num_positions
    fwd = np.zeros(P, dtype=bool)
    stack = [p for p in (g.anchored_first | g.float_first) if g.reach[p].any()]
    for s in stack:
        fwd[s] = True
    while stack:
        u = stack.pop()
        for v in g.follow[u]:
            if not fwd[v] and g.reach[v].any():
                fwd[v] = True
                stack.append(v)
    rev: List[Set[int]] = [set() for _ in range(P)]
    for u in range(P):
        for v in g.follow[u]:
            rev[v].add(u)
    bwd = np.zeros(P, dtype=bool)
    stack = list(set(g.accept) | set(g.accept_eod))
    for s in stack:
        bwd[s] = True
    while stack:
        u = stack.pop()
        for v in rev[u]:
            if not bwd[v]:
                bwd[v] = True
                stack.append(v)
    keep = fwd & bwd
    if keep.all():
        return g
    remap = -np.ones(P, dtype=np.int64)
    remap[keep] = np.arange(int(keep.sum()))

    def rs(s):
        return {int(remap[p]) for p in s if keep[p]}

    return NFAGraph(
        reach=g.reach[keep],
        anchored_first=rs(g.anchored_first),
        float_first=rs(g.float_first),
        follow=[rs(g.follow[p]) for p in range(P) if keep[p]],
        accept={int(remap[p]): a for p, a in g.accept.items() if keep[p]},
        accept_eod={int(remap[p]): a for p, a in g.accept_eod.items() if keep[p]},
        start_accepts=set(g.start_accepts),
        hop_lens={int(remap[p]): L for p, L in g.hop_lens.items()
                  if keep[p]},
    )


def reduce_graph(g: NFAGraph) -> NFAGraph:
    """Remove floating-start-redundant skip positions (leading `.*`-class).

    A non-accepting position p whose exits all land on float-enterable
    positions (follow(p) \\ {p} ⊆ float_first) is simulation-dominated by
    the floating start SD: any accepting run through p re-enters the graph
    at a float-first position, which SD — self-looping on every byte —
    can enter directly at the same offset, so removing p preserves the
    (id, to) match set. This bounds the width of `.*a.{18}b`-class
    patterns, unlocking position-parallel device scanning and the bit-NFA
    engine for subset-construction blowups (reference analogue: startDs
    dominance in the redundancy passes, src/nfagraph/ng_redundancy.cpp).

    NOT valid under SOM/min_length semantics: leading skips extend the
    leftmost match start. Callers gate on that.
    """
    P = g.num_positions
    removed: Set[int] = set()
    changed = True
    while changed:
        changed = False
        for p in range(P):
            if p in removed or p in g.accept or p in g.accept_eod:
                continue
            exits = {v for v in g.follow[p] if v != p and v not in removed}
            if exits <= g.float_first:
                removed.add(p)
                changed = True
    # anchored dominance (`^.*foo` with DOTALL == floating `foo`): when
    # the sole anchored entry is an any-byte self-loop skip and there are
    # no floating entries, every match goes start -> p^k -> successors,
    # which is exactly a floating entry at the successors
    new_float: Set[int] = set()
    if not g.float_first and not g.start_accepts:
        for p in sorted(g.anchored_first):
            if (
                p not in removed
                and p not in g.accept
                and p not in g.accept_eod
                and p in g.follow[p]
                and bool(g.reach[p].all())
                and g.anchored_first <= ({p} | g.follow[p])
                # the skip must be optional: its successors are already
                # enterable at offset 0, so floating entry only restates
                # existing paths (`^.+foo` must NOT reduce — a byte is
                # mandatory before foo)
                and (g.follow[p] - {p}) <= g.anchored_first
            ):
                removed.add(p)
                new_float = {v for v in g.follow[p] if v != p}
                break

    if not removed:
        return g
    keep = np.ones(P, dtype=bool)
    for p in removed:
        keep[p] = False
    remap = -np.ones(P, dtype=np.int64)
    remap[keep] = np.arange(int(keep.sum()))

    def rs(s):
        return {int(remap[p]) for p in s if keep[p]}

    return _prune(NFAGraph(
        reach=g.reach[keep],
        anchored_first=rs(g.anchored_first) | rs(new_float),
        float_first=rs(g.float_first) | rs(new_float),
        follow=[rs(g.follow[p]) for p in range(P) if keep[p]],
        accept={int(remap[p]): a for p, a in g.accept.items() if keep[p]},
        accept_eod={
            int(remap[p]): a for p, a in g.accept_eod.items() if keep[p]
        },
        start_accepts=set(g.start_accepts),
        hop_lens={int(remap[p]): L for p, L in g.hop_lens.items()
                  if keep[p]},
    ))
