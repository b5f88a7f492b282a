"""Pattern AST ("Component tree" analogue).

The reference parses PCRE into a polymorphic Component tree
(reference: src/parser/Component*.h) which then drives Glushkov NFA
construction. We use a small immutable dataclass AST over byte classes.

Anchors are modelled with two *virtual symbols* appended to the byte
alphabet — BOS (before-data) and EOS (after-data) — instead of the
reference's anchored-start / acceptEod special vertices
(reference: src/nfagraph/ng_holder.h start/startDs/accept/acceptEod).
The scan conceptually processes  BOS · b0 … b(n-1) · EOS ; a position whose
class contains only BOS can only ever fire at offset 0, and EOS positions
become end-of-data accepts. This keeps the whole pipeline a plain automaton
over a 258-symbol alphabet, which maps directly onto TPU table kernels.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from .charclass import CharReach

# Virtual symbol indices in the 258-symbol alphabet.
SYM_BOS = 256
SYM_EOS = 257
NUM_SYMBOLS = 258


@dataclasses.dataclass(frozen=True)
class Node:
    pass


@dataclasses.dataclass(frozen=True)
class Pos(Node):
    """A Glushkov position: consumes one symbol from the extended alphabet.

    cr      : byte class (may be empty for pure-virtual positions)
    bos/eos : whether the position also matches the virtual BOS/EOS symbol
    adjust  : report-offset adjustment if this position ends a match
              (reference analogue: Report::offsetAdjust, src/util/report.h)
    """

    cr: CharReach
    bos: bool = False
    eos: bool = False
    adjust: int = 0
    # UCP word-ness tag: set on the lead and final byte positions of a
    # codepoint chain whose codepoints are uniformly word (True) or
    # non-word (False); None = untagged. Consulted by the uwordb/unwordb
    # assertion rectangles (glushkov.py) to decide \b at the codepoint
    # level without decoding UTF-8 at scan time.
    wordcp: Optional[bool] = None

    def symbol_count(self) -> int:
        return self.cr.count() + int(self.bos) + int(self.eos)


@dataclasses.dataclass(frozen=True)
class Seq(Node):
    children: Tuple[Node, ...]


@dataclasses.dataclass(frozen=True)
class Alt(Node):
    children: Tuple[Node, ...]


@dataclasses.dataclass(frozen=True)
class Rep(Node):
    child: Node
    lo: int
    hi: Optional[int]  # None = unbounded


@dataclasses.dataclass(frozen=True)
class Empty(Node):
    pass


# Raw anchor kinds produced by the parser; resolved to Pos nodes by
# normalize() before Glushkov construction.
A_BOS = "bos"          # \A, or ^ without MULTILINE
A_MLINE_BOS = "mbos"   # ^ with MULTILINE
A_EOS_NL = "eos_nl"    # $, \Z (end of data, or before a final \n)
A_MLINE_EOS = "meos"   # $ with MULTILINE (before any \n, or end of data)
A_EOS = "eos"          # \z (end of data only)
A_WORDB = "wordb"      # \b (ASCII word set)
A_NWORDB = "nwordb"    # \B
A_UWORDB = "uwordb"    # \b under UCP+UTF8 (codepoint-level word set)
A_UNWORDB = "unwordb"  # \B under UCP+UTF8
A_UWORDB8 = "uwordb8"  # \b under UCP without UTF8 (Latin-1 word bytes)
A_UNWORDB8 = "unwordb8"  # \B under UCP without UTF8


@dataclasses.dataclass(frozen=True)
class Anchor(Node):
    kind: str


def seq(*children: Node) -> Node:
    flat = []
    for c in children:
        if isinstance(c, Seq):
            flat.extend(c.children)
        elif isinstance(c, Empty):
            continue
        else:
            flat.append(c)
    if not flat:
        return Empty()
    if len(flat) == 1:
        return flat[0]
    return Seq(tuple(flat))


def alt(*children: Node) -> Node:
    flat = []
    for c in children:
        if isinstance(c, Alt):
            flat.extend(c.children)
        else:
            flat.append(c)
    if len(flat) == 1:
        return flat[0]
    return Alt(tuple(flat))
