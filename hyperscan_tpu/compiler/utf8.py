"""UTF-8 mode: codepoint classes lowered to byte-sequence automata.

Reference analogues: UTF-8 handling in the parser Component tree +
src/nfagraph/ng_utf8.cpp / src/parser/utf8_validate.cpp. A codepoint range
becomes an alternation of byte-range sequences (the classic UTF-8 range
splitting used by RE2/ragel); the rest of the pipeline stays byte-level,
so literal factor extraction and all engines work unchanged (multi-byte
characters are just byte runs).
"""

from __future__ import annotations

from typing import List, Tuple

from .ast import Node, Pos, alt, seq
from .charclass import CharReach

MAX_CP = 0x10FFFF
SURROGATE_LO, SURROGATE_HI = 0xD800, 0xDFFF

Range = Tuple[int, int]


def _enc(cp: int) -> bytes:
    """UTF-8 encode, tolerating surrogate boundaries used internally."""
    if cp < 0x80:
        return bytes([cp])
    if cp < 0x800:
        return bytes([0xC0 | (cp >> 6), 0x80 | (cp & 0x3F)])
    if cp < 0x10000:
        return bytes(
            [0xE0 | (cp >> 12), 0x80 | ((cp >> 6) & 0x3F), 0x80 | (cp & 0x3F)]
        )
    return bytes(
        [
            0xF0 | (cp >> 18),
            0x80 | ((cp >> 12) & 0x3F),
            0x80 | ((cp >> 6) & 0x3F),
            0x80 | (cp & 0x3F),
        ]
    )


def _byte_seqs(lo: bytes, hi: bytes) -> List[List[Range]]:
    """Byte-range sequences covering all encodings between lo and hi
    (same length). Each sequence is a list of inclusive byte ranges."""
    n = len(lo)
    if n == 1:
        return [[(lo[0], hi[0])]]
    if lo[0] == hi[0]:
        return [
            [(lo[0], lo[0])] + s for s in _byte_seqs(lo[1:], hi[1:])
        ]
    out: List[List[Range]] = []
    lo_min = all(b == 0x80 for b in lo[1:])
    hi_max = all(b == 0xBF for b in hi[1:])
    first_lo = lo[0]
    if not lo_min:
        out += [
            [(lo[0], lo[0])] + s
            for s in _byte_seqs(lo[1:], b"\xbf" * (n - 1))
        ]
        first_lo = lo[0] + 1
    last_hi = hi[0]
    tail_hi: List[List[Range]] = []
    if not hi_max:
        tail_hi = [
            [(hi[0], hi[0])] + s
            for s in _byte_seqs(b"\x80" * (n - 1), hi[1:])
        ]
        last_hi = hi[0] - 1
    if first_lo <= last_hi:
        out.append([(first_lo, last_hi)] + [(0x80, 0xBF)] * (n - 1))
    out += tail_hi
    return out


_LEN_BOUNDS = [(0x0, 0x7F), (0x80, 0x7FF), (0x800, 0xFFFF), (0x10000, MAX_CP)]


def cp_ranges_to_seqs(ranges: List[Range]) -> List[List[Range]]:
    """Codepoint ranges → byte-range sequences (surrogates excluded)."""
    seqs: List[List[Range]] = []
    for (lo, hi) in ranges:
        # strip surrogates
        parts = []
        if lo <= SURROGATE_HI and hi >= SURROGATE_LO:
            if lo < SURROGATE_LO:
                parts.append((lo, SURROGATE_LO - 1))
            if hi > SURROGATE_HI:
                parts.append((SURROGATE_HI + 1, hi))
        else:
            parts.append((lo, hi))
        for (plo, phi) in parts:
            for (a, b) in _LEN_BOUNDS:
                s, e = max(plo, a), min(phi, b)
                if s <= e:
                    seqs += _byte_seqs(_enc(s), _enc(e))
    return seqs


def ranges_to_node(ranges: List[Range], wordcp=None) -> Node:
    """Codepoint ranges → byte-level AST node.

    With ``wordcp`` set, the lead and final position of every chain is
    tagged with that UCP word-ness (caller guarantees the ranges are
    uniformly word or non-word); see ast.Pos.wordcp.
    """
    branches = []
    for byteseq in cp_ranges_to_seqs(normalize_ranges(ranges)):
        poss = [
            Pos(CharReach.range(blo, bhi),
                wordcp=wordcp if (k == 0 or k == len(byteseq) - 1) else None)
            for k, (blo, bhi) in enumerate(byteseq)
        ]
        branches.append(seq(*poss))
    if not branches:
        # empty class matches nothing: a position with empty reach
        return Pos(CharReach.none())
    return alt(*branches)


def normalize_ranges(ranges: List[Range]) -> List[Range]:
    rs = sorted((lo, hi) for (lo, hi) in ranges if lo <= hi)
    out: List[Range] = []
    for (lo, hi) in rs:
        if out and lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return out


def complement_ranges(ranges: List[Range]) -> List[Range]:
    """Complement over [0, MAX_CP] (surrogates removed later)."""
    out: List[Range] = []
    prev = 0
    for (lo, hi) in normalize_ranges(ranges):
        if lo > prev:
            out.append((prev, lo - 1))
        prev = max(prev, hi + 1)
    if prev <= MAX_CP:
        out.append((prev, MAX_CP))
    return out


def intersect_ranges(a: List[Range], b: List[Range]) -> List[Range]:
    """Intersection of two normalized codepoint range lists."""
    a, b = normalize_ranges(a), normalize_ranges(b)
    out: List[Range] = []
    i = j = 0
    while i < len(a) and j < len(b):
        lo = max(a[i][0], b[j][0])
        hi = min(a[i][1], b[j][1])
        if lo <= hi:
            out.append((lo, hi))
        if a[i][1] < b[j][1]:
            i += 1
        else:
            j += 1
    return out


def charreach_to_ranges(cr: CharReach) -> List[Range]:
    """ASCII-byte class → codepoint ranges (values < 0x80 only are safe to
    reinterpret; bytes ≥ 0x80 denote Latin-1 codepoints here)."""
    out: List[Range] = []
    start = None
    for b in range(256):
        if b in cr:
            if start is None:
                start = b
        else:
            if start is not None:
                out.append((start, b - 1))
                start = None
    if start is not None:
        out.append((start, 255))
    return out


def fold_ascii(ranges: List[Range]) -> List[Range]:
    """ASCII-only case closure (reference: non-UCP caseless semantics)."""
    extra: List[Range] = []
    for (lo, hi) in ranges:
        a, b = max(lo, 0x41), min(hi, 0x5A)
        if a <= b:
            extra.append((a + 0x20, b + 0x20))
        a, b = max(lo, 0x61), min(hi, 0x7A)
        if a <= b:
            extra.append((a - 0x20, b - 0x20))
    return normalize_ranges(ranges + extra)


# PCRE multi-byte whitespace sets in UTF mode
VERT_WS_CP: List[Range] = [(0x0A, 0x0D), (0x85, 0x85), (0x2028, 0x2029)]
HORZ_WS_CP: List[Range] = [
    (0x09, 0x09), (0x20, 0x20), (0xA0, 0xA0), (0x1680, 0x1680),
    (0x2000, 0x200A), (0x202F, 0x202F), (0x205F, 0x205F), (0x3000, 0x3000),
]


def validate_utf8(data: bytes, index: int = -1):
    """Pattern byte-stream validation (reference: utf8_validate.cpp)."""
    from ..errors import CompileError

    try:
        return data.decode("utf-8")
    except UnicodeDecodeError as exc:
        raise CompileError(f"invalid UTF-8 in pattern: {exc}", index)
