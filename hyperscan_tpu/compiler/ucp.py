"""UCP mode: Unicode-property character classes.

Reference: HS_FLAG_UCP (src/hs_compile.h:929) + the parser's ucp_table.cpp
property tables. Here the property sets are derived from Python's
unicodedata at first use and cached as codepoint ranges; \\w, \\d, \\s and
\\p{...}/\\P{...} switch to Unicode semantics, and CASELESS closes classes
under simple case folding. Word-boundary assertions under UCP resolve at
the codepoint level (see glushkov.py's uwordb rectangles); this module
supplies the word-codepoint set and membership tests.
"""

from __future__ import annotations

import functools
import unicodedata
from typing import Dict, List, Tuple

from ..errors import CompileError
from .utf8 import MAX_CP, normalize_ranges

Range = Tuple[int, int]


@functools.lru_cache(maxsize=1)
def _category_map() -> Dict[str, List[Range]]:
    """category (major or full) -> codepoint ranges, one pass over the
    Unicode space (cached per process)."""
    out: Dict[str, List[Range]] = {}
    prev_cat = None
    start = 0
    def flush(cat, lo, hi):
        if cat is None:
            return
        for key in (cat, cat[0]):
            out.setdefault(key, []).append((lo, hi))
    for cp in range(MAX_CP + 1):
        cat = unicodedata.category(chr(cp))
        if cat != prev_cat:
            flush(prev_cat, start, cp - 1)
            prev_cat, start = cat, cp
    flush(prev_cat, start, MAX_CP)
    return out


def category_ranges(name: str, index: int = -1) -> List[Range]:
    """Ranges for a \\p{...} property name: general categories from the
    category map, plus script names (Latin, Yi, ...), PCRE specials
    (Xan/Xps/Xsp/Xwd), Any, and L& (reference: parser ucp_table.cpp
    property tables)."""
    cmap = _category_map()
    if name in cmap:
        return list(cmap[name])
    if name == "Any":
        return [(0, MAX_CP)]
    if name == "L&":
        return normalize_ranges(cmap["Lu"] + cmap["Ll"] + cmap["Lt"])
    if name == "Xan":
        return normalize_ranges(cmap["L"] + cmap["N"])
    if name == "Xwd":
        return list(word_ranges())
    if name in ("Xps", "Xsp"):
        return list(space_ranges())
    rs = _property_ranges_via_regex(name)
    if rs is not None:
        return list(rs)
    raise CompileError(f"unknown unicode property {name!r}", index)


@functools.lru_cache(maxsize=None)
def _property_ranges_via_regex(name: str):
    """Script and other property names resolved through the `regex`
    module's Unicode tables (one membership pass over the codepoint
    space, cached per name). Returns None for names regex rejects."""
    try:
        import regex
    except ImportError:  # pragma: no cover - regex is in the base image
        return None
    if not name or not name[0].isupper():
        # reference property names are case-sensitive (ucp_table.cpp);
        # the regex module is case-insensitive, so gate here: \p{greek}
        # and \p{any} are unknown, \p{Greek}/Any are not
        return None
    try:
        pat = regex.compile(rf"\p{{{name}}}")
    except Exception:
        return None
    out: List[Range] = []
    start = None
    for cp in range(MAX_CP + 1):
        if 0xD800 <= cp <= 0xDFFF:
            hit = False
        else:
            hit = pat.match(chr(cp)) is not None
        if hit and start is None:
            start = cp
        elif not hit and start is not None:
            out.append((start, cp - 1))
            start = None
    if start is not None:
        out.append((start, MAX_CP))
    return normalize_ranges(out)


@functools.lru_cache(maxsize=1)
def word_ranges() -> List[Range]:
    """UCP \\w = [\\p{L}\\p{N}_] (reference: ucp \\w semantics)."""
    cmap = _category_map()
    return normalize_ranges(cmap["L"] + cmap["N"] + [(0x5F, 0x5F)])


@functools.lru_cache(maxsize=1)
def digit_ranges() -> List[Range]:
    """UCP \\d = \\p{Nd}."""
    return list(_category_map()["Nd"])


@functools.lru_cache(maxsize=1)
def space_ranges() -> List[Range]:
    """UCP \\s = Unicode whitespace."""
    out = [(cp, cp) for cp in range(0x3000 + 1) if chr(cp).isspace()]
    return normalize_ranges(out)


@functools.lru_cache(maxsize=1)
def nonword_ranges() -> List[Range]:
    """Complement of word_ranges over the valid codepoint space."""
    from .utf8 import complement_ranges

    return [
        (lo, min(hi, MAX_CP))
        for (lo, hi) in complement_ranges(word_ranges())
        if lo <= MAX_CP
    ]


@functools.lru_cache(maxsize=1)
def _word_bytes() -> bytes:
    """Latin-1 clip of the UCP word set (one flag byte per codepoint)."""
    bits = bytearray(256)
    for (lo, hi) in word_ranges():
        if lo > 255:
            break
        for cp in range(lo, min(hi, 255) + 1):
            bits[cp] = 1
    return bytes(bits)


def word_byte_reach():
    """UCP word set clipped to the byte alphabet, as a CharReach (used by
    \\b/\\B under UCP without UTF-8, where bytes ARE codepoints)."""
    import numpy as np

    from .charclass import CharReach

    return CharReach(np.frombuffer(_word_bytes(), np.uint8).astype(bool))


def is_word_cp(cp: int) -> bool:
    """Codepoint membership in the UCP word set (oracle-side)."""
    if cp < 256:
        return bool(_word_bytes()[cp])
    import bisect

    rs = word_ranges()
    i = bisect.bisect_right(rs, (cp, MAX_CP + 1)) - 1
    return i >= 0 and rs[i][0] <= cp <= rs[i][1]


def fold_case(ranges: List[Range]) -> List[Range]:
    """Close codepoint ranges under simple case folding (CASELESS+UCP;
    reference: UCP caseless uses Unicode case equivalence)."""
    extra: List[Range] = []
    for (lo, hi) in ranges:
        if hi - lo > 0x20000:  # huge ranges are effectively case-closed
            continue
        for cp in range(lo, hi + 1):
            c = chr(cp)
            for v in (c.lower(), c.upper()):
                # simple one-to-one case folding only: multi-character
                # expansions (e.g. U+00DF -> "SS") would over-match
                if len(v) != 1:
                    continue
                o = ord(v)
                if not (lo <= o <= hi):
                    extra.append((o, o))
    return normalize_ranges(ranges + extra)
