"""Literal-factor extraction — the violet-lite decomposition.

Reference analogues:
- mandatory-literal cut extraction: src/nfagraph/ng_violet.cpp (doViolet
  finds literal cut-sets that every accepting path crosses) and literal
  scoring in src/nfagraph/ng_literal_analysis.cpp
- masked literal model: src/hwlm/hwlm_literal.h (hwlmLiteral msk/cmp —
  per-byte (mask, value) compare handles caseless bytes)

Here the extraction runs on the pattern AST instead of the NFA graph:
every match of the pattern must fully contain at least one factor from the
returned factor set. Each factor carries distance bounds that let the
runtime validate candidate sites with a bounded window scan:

    [match start] --(start_to_fend)-- [factor end] --(fend_to_end)-- [match end]

Bounds are (min, max) with max None meaning unbounded (the pattern then
needs the general engine path for validation windows, though the factor
set itself remains a valid prefilter).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

from .ast import Alt, Anchor, Empty, Node, Pos, Rep, Seq

# Factors shorter than this are not worth prefiltering with (they flood the
# candidate stream); patterns without a factor of at least this length fall
# back to the general DFA engines. Reference analogue: literal score
# thresholds in ng_violet.cpp.
MIN_FACTOR_LEN = 3
MAX_FACTOR_LEN = 16  # confirm window cap; longer literals confirm on prefix


@dataclasses.dataclass(frozen=True)
class LitAtom:
    """One byte position: matches b iff (b & mask) == value.

    A caseless ASCII letter uses mask 0xDF (case bit cleared); an exact
    byte uses mask 0xFF. Reference: hwlmLiteral msk/cmp.
    """

    value: int
    mask: int

    def matches(self, b: int) -> bool:
        return (b & self.mask) == self.value


@dataclasses.dataclass(frozen=True)
class Factor:
    atoms: Tuple[LitAtom, ...]

    def __len__(self) -> int:
        return len(self.atoms)

    def key(self) -> Tuple:
        return tuple((a.value, a.mask) for a in self.atoms)


@dataclasses.dataclass
class FactorInfo:
    """A factor occurrence obligation within a pattern, with bounds."""

    factor: Factor
    min_start_to_fend: int
    max_start_to_fend: Optional[int]
    min_fend_to_end: int
    max_fend_to_end: Optional[int]

    def shift_prefix(self, wmin: int, wmax: Optional[int]) -> "FactorInfo":
        return FactorInfo(
            self.factor,
            self.min_start_to_fend + wmin,
            None
            if (self.max_start_to_fend is None or wmax is None)
            else self.max_start_to_fend + wmax,
            self.min_fend_to_end,
            self.max_fend_to_end,
        )

    def shift_suffix(self, wmin: int, wmax: Optional[int]) -> "FactorInfo":
        return FactorInfo(
            self.factor,
            self.min_start_to_fend,
            self.max_start_to_fend,
            self.min_fend_to_end + wmin,
            None
            if (self.max_fend_to_end is None or wmax is None)
            else self.max_fend_to_end + wmax,
        )


def _pos_atom(node: Node) -> Optional[LitAtom]:
    """A Pos that matches exactly one byte, or a caseless ASCII pair."""
    if not isinstance(node, Pos) or node.bos or node.eos:
        return None
    n = node.cr.count()
    if n == 1:
        b = int(node.cr.find_first())
        return LitAtom(value=b, mask=0xFF)
    if n == 2:
        lo, hi = sorted(node.cr.members())
        if hi == lo + 0x20 and 0x41 <= lo <= 0x5A:  # 'A'..'Z' + its lower
            return LitAtom(value=lo, mask=0xDF)
    return None


@dataclasses.dataclass
class _Res:
    wmin: int
    wmax: Optional[int]
    factors: Optional[List[FactorInfo]]  # None = no mandatory factor set
    # best factor-set score, for option selection
    score: Tuple = ()


def _none_score() -> Tuple:
    return (-1,)


def _set_score(infos: List[FactorInfo]) -> Tuple:
    min_len = min(len(fi.factor) for fi in infos)
    bounded = all(
        fi.max_start_to_fend is not None and fi.max_fend_to_end is not None
        for fi in infos
    )
    # fully-bounded factor sets allow window validation (vs falling back to
    # the general engines), so they dominate the score
    return (bounded, min(min_len, 8), -len(infos))


def _add(a: Optional[int], b: Optional[int]) -> Optional[int]:
    return None if (a is None or b is None) else a + b


# cap on product alternatives when extending a literal run through
# alternations (reference: hwlm literal sets per pattern)
MAX_ALT_FACTORS = 8


def _lits(node: Node) -> Optional[List[Tuple[LitAtom, ...]]]:
    """All literalizations of a node as atom tuples, or None when the
    node isn't a small set of fixed strings. Lets factor runs extend
    through alternations: `v4\\.(exe|dll)` yields {v4.exe, v4.dll}
    instead of stopping at the 3-byte prefix."""
    if isinstance(node, Empty):
        return [()]
    if isinstance(node, Pos):
        a = _pos_atom(node)
        return None if a is None else [(a,)]
    if isinstance(node, Alt):
        out: List[Tuple[LitAtom, ...]] = []
        for c in node.children:
            sub = _lits(c)
            if sub is None:
                return None
            out.extend(sub)
            if len(out) > MAX_ALT_FACTORS:
                return None
        return out
    if isinstance(node, Seq):
        cur: List[Tuple[LitAtom, ...]] = [()]
        for c in node.children:
            sub = _lits(c)
            if sub is None:
                return None
            cur = [a + b for a in cur for b in sub]
            if len(cur) > MAX_ALT_FACTORS:
                return None
        return cur
    if isinstance(node, Rep):
        if node.hi != node.lo or node.lo > 4:
            return None
        sub = _lits(node.child)
        if sub is None:
            return None
        cur = [()]
        for _ in range(node.lo):
            cur = [a + b for a in cur for b in sub]
            if len(cur) > MAX_ALT_FACTORS:
                return None
        return cur
    return None


def _mul(a: Optional[int], k: Optional[int]) -> Optional[int]:
    if a is None or k is None:
        return None
    return a * k


def _analyze(node: Node) -> _Res:
    if isinstance(node, Empty) or isinstance(node, Anchor):
        return _Res(0, 0, None, _none_score())
    if isinstance(node, Pos):
        w = 1
        atom = _pos_atom(node)
        if atom is not None:
            fi = FactorInfo(Factor((atom,)), 1, 1, 0, 0)
            return _Res(w, w, [fi], _set_score([fi]))
        return _Res(w, w, None, _none_score())
    if isinstance(node, Alt):
        rs = [_analyze(c) for c in node.children]
        wmin = min(r.wmin for r in rs)
        wmax_list = [r.wmax for r in rs]
        wmax = None if any(w is None for w in wmax_list) else max(wmax_list)
        if all(r.factors for r in rs):
            merged: List[FactorInfo] = []
            for r in rs:
                merged.extend(r.factors)  # type: ignore[arg-type]
            return _Res(wmin, wmax, merged, _set_score(merged))
        return _Res(wmin, wmax, None, _none_score())
    if isinstance(node, Rep):
        r = _analyze(node.child)
        wmin = r.wmin * node.lo
        wmax = _mul(r.wmax, node.hi)
        if node.lo == 0 or not r.factors:
            return _Res(wmin, wmax, None, _none_score())
        # every match contains a full first repetition; remaining lo-1..hi-1
        # repetitions extend the suffix side
        extra_min = r.wmin * (node.lo - 1)
        extra_max = None if node.hi is None else _mul(r.wmax, node.hi - 1)
        infos = [fi.shift_suffix(extra_min, extra_max) for fi in r.factors]
        return _Res(wmin, wmax, infos, _set_score(infos))
    assert isinstance(node, Seq)
    rs = [_analyze(c) for c in node.children]
    wmin = sum(r.wmin for r in rs)
    wmax: Optional[int] = 0
    for r in rs:
        wmax = _add(wmax, r.wmax)

    # prefix/suffix width bounds around each child
    pre_min = [0] * len(rs)
    pre_max: List[Optional[int]] = [0] * len(rs)
    acc_min, acc_max = 0, 0  # type: int, Optional[int]
    for i, r in enumerate(rs):
        pre_min[i], pre_max[i] = acc_min, acc_max
        acc_min += r.wmin
        acc_max = _add(acc_max, r.wmax)
    suf_min = [0] * len(rs)
    suf_max: List[Optional[int]] = [0] * len(rs)
    acc_min, acc_max = 0, 0
    for i in range(len(rs) - 1, -1, -1):
        suf_min[i], suf_max[i] = acc_min, acc_max
        acc_min += rs[i].wmin
        acc_max = _add(acc_max, rs[i].wmax)

    options: List[Tuple[Tuple, List[FactorInfo]]] = []

    # (a) literal runs across consecutive literalizable children — single
    # atoms AND small alternation products (`x12(GET|POST)` contributes
    # {x12GET, x12POST}), per the reference's multi-literal hwlm sets
    child_lits = [_lits(c) for c in node.children]
    for i in range(len(rs)):
        if child_lits[i] is None:
            continue
        prods: List[Tuple[LitAtom, ...]] = [()]
        j = i
        while j < len(rs) and child_lits[j] is not None:
            cand = [a + b for a in prods for b in child_lits[j]]
            if len(cand) > MAX_ALT_FACTORS:
                break
            prods = cand
            j += 1
        if j == i or min(len(p) for p in prods) < 2:
            continue
        infos = []
        for p in prods:
            L = len(p)
            run = p[-MAX_FACTOR_LEN:]
            infos.append(FactorInfo(
                Factor(tuple(run)),
                min_start_to_fend=pre_min[i] + L,
                max_start_to_fend=_add(pre_max[i], L),
                min_fend_to_end=suf_min[j - 1],
                max_fend_to_end=suf_max[j - 1],
            ))
        options.append((_set_score(infos), infos))

    # (b) each child's own factor set, shifted by surrounding widths
    for i, r in enumerate(rs):
        if not r.factors:
            continue
        shifted = [
            fi.shift_prefix(pre_min[i], pre_max[i]).shift_suffix(
                suf_min[i], suf_max[i]
            )
            for fi in r.factors
        ]
        options.append((_set_score(shifted), shifted))

    if not options:
        return _Res(wmin, wmax, None, _none_score())
    best = max(options, key=lambda o: o[0])
    return _Res(wmin, wmax, best[1], best[0])


def split_fixed_head(node: Node) -> Tuple[List[LitAtom], Node]:
    """Split a pattern into its maximal FIXED HEAD — the leading run of
    single-byte atoms (exact or caseless, see _pos_atom) — and the
    remainder node (Empty when the whole pattern is fixed).

    The head is the anchoring structure for factor-anchored validation
    (reference analogue: Rose literal roles with zero-lag left context,
    src/rose/rose_graph.h LeftEngInfo): a confirmed factor inside the
    head fixes the match start exactly, so only the remainder needs a
    DFA — and remainders are shared across whole vocabulary families
    (`attack7[0-9]{2,4}z` and `payload123[0-9]{2,4}z` share one suffix
    automaton) where whole-pattern validators differ per literal
    spelling."""
    atoms: List[LitAtom] = []

    def walk(n: Node) -> Optional[Node]:
        if isinstance(n, Pos):
            a = _pos_atom(n)
            if a is None:
                return n
            atoms.append(a)
            return None
        if isinstance(n, Seq):
            for k, ch in enumerate(n.children):
                rest = walk(ch)
                if rest is not None:
                    rem = [rest] + list(n.children[k + 1:])
                    return rem[0] if len(rem) == 1 else Seq(rem)
            return None
        if isinstance(n, Empty):
            return None
        return n

    rest = walk(node)
    return atoms, (rest if rest is not None else Empty())


def _is_fixed_subtree(n: Node) -> bool:
    """Whole subtree is a sequence of fixed single-byte atoms."""
    if isinstance(n, Pos):
        return _pos_atom(n) is not None
    if isinstance(n, Seq):
        return all(_is_fixed_subtree(c) for c in n.children)
    if isinstance(n, Empty):
        return True
    return False


def expand_head_alts(node: Node, limit: int = 8) -> Optional[List[Node]]:
    """Language-preserving expansion of FIXED alternations that terminate
    the fixed head: `v4\\.(exe|dll|bat)` -> [`v4\\.exe`, `v4\\.dll`,
    `v4\\.bat`], recursively, while the total branch count stays within
    `limit`. Returns the expanded branch list (>= 2 entries) or None when
    nothing head-blocking expands.

    Purpose: each expanded branch has a longer fixed head, making the
    factor-anchored validation route (split_fixed_head) applicable where
    the alternation would otherwise force a whole-pattern validator per
    literal spelling (reference analogue: ng_literal_decorated /
    component splitting, src/nfagraph/ng_calc_components.cpp — the
    reference explodes small literal alternations into separate Rose
    literals the same way)."""

    def head_rest(n: Node) -> Tuple[List[Node], Optional[Node]]:
        """split_fixed_head's walk, keeping the consumed Pos nodes."""
        heads: List[Node] = []

        def walk(x: Node) -> Optional[Node]:
            if isinstance(x, Pos):
                if _pos_atom(x) is None:
                    return x
                heads.append(x)
                return None
            if isinstance(x, Seq):
                for k, ch in enumerate(x.children):
                    rest = walk(ch)
                    if rest is not None:
                        rem = [rest] + list(x.children[k + 1:])
                        return rem[0] if len(rem) == 1 else Seq(
                            tuple(rem))
                return None
            if isinstance(x, Empty):
                return None
            return x

        return heads, walk(n)

    from .ast import seq as _seq

    out = [node]
    progress = True
    any_expanded = False
    while progress:
        progress = False
        for idx, n in enumerate(out):
            heads, rest = head_rest(n)
            if rest is None:
                continue
            if isinstance(rest, Seq) and rest.children:
                blocking, tail = rest.children[0], list(rest.children[1:])
            else:
                blocking, tail = rest, []
            if not isinstance(blocking, Alt):
                continue
            if not all(_is_fixed_subtree(c) for c in blocking.children):
                continue
            if len(out) - 1 + len(blocking.children) > limit:
                continue
            new = [_seq(*heads, alt, *tail) for alt in blocking.children]
            out = out[:idx] + new + out[idx + 1:]
            progress = True
            any_expanded = True
            break
    return out if any_expanded else None


def contains_anchor(node: Node) -> bool:
    """True when any zero-width assertion appears in the subtree —
    assertions in a suffix remainder can reference bytes BEFORE the
    remainder (a leading \\b reads the head's last byte), so such
    remainders stay on the whole-pattern validator route."""
    if isinstance(node, Anchor):
        return True
    if isinstance(node, (Seq, Alt)):
        return any(contains_anchor(c) for c in node.children)
    if isinstance(node, Rep):
        return contains_anchor(node.child)
    return False


def extract_factors(node: Node, min_len: int = MIN_FACTOR_LEN
                    ) -> Optional[List[FactorInfo]]:
    """Best mandatory factor set for a pattern, or None if the pattern has
    no factor of length ≥ min_len (route to general engines)."""
    r = _analyze(node)
    if not r.factors:
        return None
    if min(len(fi.factor) for fi in r.factors) < min_len:
        return None
    return r.factors
