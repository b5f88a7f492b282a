"""CharReach: a set over the 256 byte values.

TPU-native analogue of the reference's ``CharReach`` 256-bit class bitmap
(reference: src/util/charreach.h). Backed by a numpy bool[256] vector so the
compiler can hand classes straight to device-table builders; hashable and
immutable-by-convention for use as dict keys during determinization.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np

_ASCII_UPPER = range(ord("A"), ord("Z") + 1)
_ASCII_LOWER = range(ord("a"), ord("z") + 1)


class CharReach:
    __slots__ = ("bits", "_key")

    def __init__(self, bits: np.ndarray | None = None):
        if bits is None:
            bits = np.zeros(256, dtype=bool)
        assert bits.shape == (256,) and bits.dtype == np.bool_
        self.bits = bits
        self._key: bytes | None = None

    # -- constructors --------------------------------------------------
    @classmethod
    def none(cls) -> "CharReach":
        return cls()

    @classmethod
    def all(cls) -> "CharReach":
        return cls(np.ones(256, dtype=bool))

    @classmethod
    def single(cls, b: int) -> "CharReach":
        bits = np.zeros(256, dtype=bool)
        bits[b] = True
        return cls(bits)

    @classmethod
    def from_bytes(cls, bs: Iterable[int]) -> "CharReach":
        bits = np.zeros(256, dtype=bool)
        for b in bs:
            bits[b] = True
        return cls(bits)

    @classmethod
    def range(cls, lo: int, hi: int) -> "CharReach":
        """Inclusive byte range [lo, hi]."""
        bits = np.zeros(256, dtype=bool)
        bits[lo : hi + 1] = True
        return cls(bits)

    # -- set algebra ----------------------------------------------------
    def __or__(self, other: "CharReach") -> "CharReach":
        return CharReach(self.bits | other.bits)

    def __and__(self, other: "CharReach") -> "CharReach":
        return CharReach(self.bits & other.bits)

    def __invert__(self) -> "CharReach":
        return CharReach(~self.bits)

    def __sub__(self, other: "CharReach") -> "CharReach":
        return CharReach(self.bits & ~other.bits)

    def __contains__(self, b: int) -> bool:
        return bool(self.bits[b])

    def __bool__(self) -> bool:
        return bool(self.bits.any())

    def __eq__(self, other: object) -> bool:
        return isinstance(other, CharReach) and self.key() == other.key()

    def __hash__(self) -> int:
        return hash(self.key())

    def key(self) -> bytes:
        if self._key is None:
            self._key = np.packbits(self.bits).tobytes()
        return self._key

    # -- queries ---------------------------------------------------------
    def count(self) -> int:
        return int(self.bits.sum())

    def find_first(self) -> int:
        idx = np.flatnonzero(self.bits)
        return int(idx[0]) if len(idx) else -1

    def members(self) -> Iterator[int]:
        return iter(np.flatnonzero(self.bits).tolist())

    def is_single(self) -> bool:
        return self.count() == 1

    # -- transforms -------------------------------------------------------
    def make_caseless(self) -> "CharReach":
        """Close the class under ASCII case folding.

        Matches the reference's CASELESS semantics for non-UCP patterns
        (ASCII-only case folding; reference: src/parser/Parser.rl handles
        caseless by setting both cases in the class).
        """
        bits = self.bits.copy()
        for up, lo in zip(_ASCII_UPPER, _ASCII_LOWER):
            if bits[up] or bits[lo]:
                bits[up] = True
                bits[lo] = True
        return CharReach(bits)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        n = self.count()
        if n == 256:
            return "CharReach(ALL)"
        if n <= 8:
            chars = ",".join(
                chr(b) if 32 <= b < 127 else f"\\x{b:02x}" for b in self.members()
            )
            return f"CharReach({chars})"
        return f"CharReach(<{n} bytes>)"


# --- Common classes (PCRE escapes) -----------------------------------------
DIGIT = CharReach.range(ord("0"), ord("9"))
SPACE = CharReach.from_bytes(b" \t\n\r\f\v")
WORD = CharReach(
    DIGIT.bits
    | CharReach.range(ord("a"), ord("z")).bits
    | CharReach.range(ord("A"), ord("Z")).bits
    | CharReach.single(ord("_")).bits
)
NEWLINE = CharReach.single(ord("\n"))
DOT_NO_NL = ~NEWLINE  # `.` without DOTALL excludes \n only (PCRE default)
DOT_ALL = CharReach.all()

# POSIX classes (reference parser supports [:alpha:] etc. in classes)
POSIX_CLASSES = {
    "alnum": CharReach(
        DIGIT.bits
        | CharReach.range(ord("a"), ord("z")).bits
        | CharReach.range(ord("A"), ord("Z")).bits
    ),
    "alpha": CharReach(
        CharReach.range(ord("a"), ord("z")).bits
        | CharReach.range(ord("A"), ord("Z")).bits
    ),
    "ascii": CharReach.range(0, 127),
    "blank": CharReach.from_bytes(b" \t"),
    "cntrl": CharReach(CharReach.range(0, 31).bits | CharReach.single(127).bits),
    "digit": DIGIT,
    "graph": CharReach.range(33, 126),
    "lower": CharReach.range(ord("a"), ord("z")),
    "print": CharReach.range(32, 126),
    "punct": CharReach(
        CharReach.range(33, 47).bits
        | CharReach.range(58, 64).bits
        | CharReach.range(91, 96).bits
        | CharReach.range(123, 126).bits
    ),
    "space": SPACE,
    "upper": CharReach.range(ord("A"), ord("Z")),
    "word": WORD,
    "xdigit": CharReach(
        DIGIT.bits
        | CharReach.range(ord("a"), ord("f")).bits
        | CharReach.range(ord("A"), ord("F")).bits
    ),
}
