r"""PCRE-subset pattern parser.

TPU-native rewrite of the reference's Ragel-generated parser
(reference: src/parser/Parser.rl:1915 ``parse()``), producing the AST in
``ast.py``. Coverage targets the constructs Hyperscan itself supports:
literals, classes (incl. POSIX + escapes), `.`; quantifiers ``* + ? {n,m}``
with lazy suffix; alternation; (non-)capturing groups; inline flags
``(?i)(?s)(?m)(?x)`` incl. scoped forms; ``\\Q..\\E``; anchors
``^ $ \A \Z \z \b \B``. Constructs the reference rejects (backrefs,
lookaround, \G, recursion) raise CompileError exactly as the reference does
(reference: src/parser/unsupported.cpp).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from ..errors import CompileError
from ..flags import (
    HS_FLAG_CASELESS,
    HS_FLAG_DOTALL,
    HS_FLAG_MULTILINE,
    HS_FLAG_PREFILTER,
    HS_FLAG_UCP,
    HS_FLAG_UTF8,
)
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
    alt,
    seq,
)
from .charclass import (
    DIGIT,
    DOT_ALL,
    DOT_NO_NL,
    POSIX_CLASSES,
    SPACE,
    WORD,
    CharReach,
)

# PCRE \v (vertical ws) and \h (horizontal ws) in 8-bit mode.
VERT_WS = CharReach.from_bytes(bytes([0x0A, 0x0B, 0x0C, 0x0D, 0x85]))
HORZ_WS = CharReach.from_bytes(bytes([0x09, 0x20, 0xA0]))
# \R: any newline sequence — approximated as its single-byte members in
# byte mode (the \r\n two-byte form is expanded at parse time).
NL_BYTES = CharReach.from_bytes(bytes([0x0A, 0x0B, 0x0C, 0x0D, 0x85]))

MAX_REPEAT = 32767  # reference caps bounded repeats similarly (grey box)


@dataclasses.dataclass(frozen=True)
class _FlagsOnly(Empty):
    """Empty node produced by a bare inline-flags group (?i) — kept
    distinct so a following quantifier can be rejected like the
    reference does (bad_patterns.txt:49 "Invalid repeat")."""


def _zero_width(node: Node) -> bool:
    """True when the subtree consumes no bytes on any path (assertions and
    empties only) — the precondition for quantifier-on-assertion reduction."""
    if isinstance(node, (Anchor, Empty)):
        return True
    if isinstance(node, (Seq, Alt)):
        return all(_zero_width(c) for c in node.children)
    if isinstance(node, Rep):
        return _zero_width(node.child)
    return False


@dataclasses.dataclass
class _Flags:
    caseless: bool
    dotall: bool
    multiline: bool
    extended: bool
    utf8: bool
    ucp: bool
    prefilter: bool = False

    def copy(self) -> "_Flags":
        return dataclasses.replace(self)


class _Parser:
    def __init__(self, pattern: str, flags: int, index: int = -1):
        utf8 = bool(flags & HS_FLAG_UTF8)
        # Byte-oriented by default (latin-1 round trip); in UTF-8 mode the
        # parser walks codepoints and lowers them to byte sequences
        # (reference: utf8_validate.cpp + UTF-8 Component lowering).
        if isinstance(pattern, bytes):
            if utf8:
                from .utf8 import validate_utf8

                self.pat = validate_utf8(pattern, index)
            else:
                self.pat = pattern.decode("latin-1")
        else:
            self.pat = pattern
        self.n = len(self.pat)
        self.i = 0
        self.index = index
        self.group_depth = 0
        self.n_caps = 0  # capturing-group count (reference validates refs)
        self.verb_flags = 0  # flag bits set by leading control verbs
        self.group_names: set = set()
        # (kind, value, error_index) reference checks resolved at parse end
        self._pending_refs: List[tuple] = []
        self.flags = _Flags(
            caseless=bool(flags & HS_FLAG_CASELESS),
            dotall=bool(flags & HS_FLAG_DOTALL),
            multiline=bool(flags & HS_FLAG_MULTILINE),
            extended=False,
            utf8=bool(flags & HS_FLAG_UTF8),
            ucp=bool(flags & HS_FLAG_UCP),
            prefilter=bool(flags & HS_FLAG_PREFILTER),
        )
        # UCP word boundaries resolve at the codepoint level: classes must
        # be split into uniformly-word / uniformly-nonword chains so the
        # uwordb rectangles can decide \b per neighbor position (see
        # glushkov.py). A textual pre-scan enables the split — it may fire
        # spuriously on "\b" inside a class (backspace), which only costs
        # a few extra positions, never correctness.
        self._split_word = (
            self.flags.ucp
            and self.flags.utf8
            and ("\\b" in self.pat or "\\B" in self.pat)
        )

    # -- utilities -----------------------------------------------------
    def error(self, msg: str) -> CompileError:
        return CompileError(f"{msg} at index {self.i}", self.index)

    def peek(self) -> str:
        return self.pat[self.i] if self.i < self.n else ""

    def at_end(self) -> bool:
        return self.i >= self.n

    def take(self) -> str:
        c = self.pat[self.i]
        self.i += 1
        return c

    def expect(self, c: str) -> None:
        if self.at_end() or self.pat[self.i] != c:
            raise self.error(f"expected {c!r}")
        self.i += 1

    def _skip_ws(self) -> None:
        """In extended mode, whitespace and #-comments are ignored."""
        if not self.flags.extended:
            return
        while self.i < self.n:
            c = self.pat[self.i]
            if c in " \t\n\r\f\v":
                self.i += 1
            elif c == "#":
                while self.i < self.n and self.pat[self.i] != "\n":
                    self.i += 1
            else:
                break

    def _lit(self, byte: int) -> Node:
        cr = CharReach.single(byte)
        if self.flags.caseless:
            cr = cr.make_caseless()
        return Pos(cr)

    def _lit_cp(self, cp: int) -> Node:
        """Literal codepoint: multi-byte UTF-8 sequence when needed."""
        if cp < 0x80 or not self.flags.utf8:
            if cp > 0xFF:
                raise self.error(
                    "codepoint above \\xFF requires HS_FLAG_UTF8"
                )
            return self._lit(cp)
        # route through the class builder so CASELESS(+UCP) folding applies
        return self._utf8_class_node([(cp, cp)])

    def _utf8_class_node(self, ranges, negate: bool = False) -> Node:
        from .utf8 import complement_ranges, fold_ascii, ranges_to_node

        if self.flags.caseless:
            if self.flags.ucp:
                from .ucp import fold_case

                ranges = fold_case(ranges)
            else:
                ranges = fold_ascii(ranges)
        if negate:
            ranges = complement_ranges(ranges)
        if self._split_word:
            from .ucp import nonword_ranges, word_ranges
            from .utf8 import intersect_ranges

            from .ast import alt as _alt

            w = intersect_ranges(ranges, word_ranges())
            nw = intersect_ranges(ranges, nonword_ranges())
            if w and nw:
                return _alt(
                    ranges_to_node(w, wordcp=True),
                    ranges_to_node(nw, wordcp=False),
                )
            if w:
                return ranges_to_node(w, wordcp=True)
            return ranges_to_node(nw, wordcp=False)
        return ranges_to_node(ranges)

    def _ucp_class(self, ranges, negate: bool = False) -> Node:
        """Unicode-property class in the current mode: byte-clipped in
        8-bit mode, UTF-8 expanded otherwise."""
        if self.flags.utf8:
            return self._utf8_class_node(ranges, negate=negate)
        from .utf8 import complement_ranges

        if negate:
            ranges = complement_ranges(ranges)
        cr = CharReach.none()
        import numpy as _np

        bits = _np.zeros(256, dtype=bool)
        for (lo, hi) in ranges:
            if lo > 255:
                break
            bits[lo : min(hi, 255) + 1] = True
        cr = CharReach(bits)
        if self.flags.caseless:
            cr = cr.make_caseless()
        return Pos(cr)

    def _parse_prop_name(self):
        """Parse the name of \\p{...} / \\pX into (name, negated). A
        leading ^ inside the braces negates (PCRE: \\p{^X} == \\P{X}).
        The reference resolves property classes regardless of the UCP
        flag (byte-truncated in 8-bit mode, ComponentClass.cpp
        getPredefinedCharReach)."""
        if self.peek() == "{":
            self.take()
            name = ""
            while not self.at_end() and self.peek() != "}":
                name += self.take()
            self.expect("}")
            if name.startswith("^"):
                return name[1:], True
            return name, False
        if self.at_end():
            raise self.error("malformed \\p escape")
        return self.take(), False

    def _class_node(self, cr: CharReach) -> Node:
        if self.flags.caseless:
            cr = cr.make_caseless()
        return Pos(cr)

    # -- entry -----------------------------------------------------------
    _UNSUPPORTED_VERBS = (
        "CR", "LF", "CRLF", "ANYCRLF", "ANY", "BSR_ANYCRLF", "BSR_UNICODE",
    )

    def parse(self) -> Node:
        # leading control verbs (reference: control_verbs.rl): (*UTF8)
        # and (*UTF) set UTF-8 mode, (*UCP) sets UCP; newline-convention
        # verbs are unsupported, anything else unknown
        while self.pat.startswith("(*", self.i):
            end = self.pat.find(")", self.i + 2)
            if end < 0:
                break
            verb = self.pat[self.i + 2 : end]
            if verb in ("UTF8", "UTF"):
                self.flags.utf8 = True
                self.verb_flags |= HS_FLAG_UTF8
            elif verb == "UCP":
                self.flags.ucp = True
                self.verb_flags |= HS_FLAG_UCP
            elif verb in self._UNSUPPORTED_VERBS:
                raise self.error(f"unsupported control verb (*{verb})")
            elif verb:
                raise self.error(f"unknown control verb (*{verb})")
            else:
                break
            self.i = end + 1
        node = self.parse_alt()
        if not self.at_end():
            if self.peek() == ")":
                raise self.error("unmatched parenthesis")
            raise self.error("trailing input")
        for (kind, val, at) in self._pending_refs:
            self.i = at
            if kind in ("num", "cond-num"):
                if not (1 <= val <= self.n_caps):
                    what = ("conditional reference" if kind == "cond-num"
                            else "back reference")
                    raise self.error(
                        f"invalid {what} to expression {val}")
            else:
                if val not in self.group_names:
                    what = ("conditional reference" if kind == "cond-name"
                            else "back reference")
                    raise self.error(
                        f"invalid {what} to label {val!r}")
        return node

    def parse_alt(self) -> Node:
        branches = [self.parse_seq()]
        while not self.at_end() and self.peek() == "|":
            self.take()
            branches.append(self.parse_seq())
        return alt(*branches)

    def parse_seq(self) -> Node:
        items: List[Node] = []
        while True:
            self._skip_ws()
            if self.at_end() or self.peek() in "|)":
                break
            item = self.parse_quantified()
            if item is not None:
                items.append(item)
        return seq(*items) if items else Empty()

    def parse_quantified(self) -> Optional[Node]:
        atom_start = self.i
        atom = self.parse_atom()
        grouped = atom_start < self.n and self.pat[atom_start] == "("
        self._skip_ws()
        if self.at_end():
            return atom
        c = self.peek()
        lo: Optional[int] = None
        hi: Optional[int] = None
        if c == "*":
            self.take()
            lo, hi = 0, None
        elif c == "+":
            self.take()
            lo, hi = 1, None
        elif c == "?":
            self.take()
            lo, hi = 0, 1
        elif c == "{":
            save = self.i
            bounds = self._try_parse_bounds()
            if bounds is None:
                self.i = save
                return atom
            lo, hi = bounds
        else:
            return atom

        # lazy / possessive suffix
        self._skip_ws()
        if not self.at_end():
            if self.peek() == "?":
                self.take()  # lazy: identical language, ignore
            elif self.peek() == "+":
                # Possessive quantifiers change the matched language under
                # backtracking semantics; the reference rejects them
                # (src/parser/unsupported.cpp).
                raise self.error("possessive quantifiers are not supported")

        if atom is None:
            raise self.error("quantifier with nothing to repeat")
        if isinstance(atom, _FlagsOnly):
            # (?m)? — quantifier after a bare inline-flags group
            # (reference: "Invalid repeat", bad_patterns.txt:49)
            raise self.error("invalid repeat")
        if _zero_width(atom):
            if not grouped:
                # \b+ — quantifier directly on a bare assertion is
                # rejected (reference: bad_patterns.txt:36-43), while
                # grouped forms like (\b)+ reduce below (hscollider
                # asserts.txt compiles those)
                raise self.error("invalid repeat on a zero-width assertion")
            # (X){m,n} on a pure-assertion subtree reduces: asserting the
            # same zero-width condition repeatedly at one position is
            # idempotent, so m>=1 keeps a single copy and m==0 adds the
            # skip path (reference resolves these shapes by assert-vertex
            # rewriting, src/nfagraph/ng_asserts.cpp + ng_misc_opt.cpp).
            if lo >= 1:
                return atom
            return alt(atom, Empty())
        if hi is not None and lo > hi:
            raise self.error("bounded repeat min > max")
        if lo == 1 and hi == 1:
            return atom
        return Rep(atom, lo, hi)

    def _try_parse_bounds(self):
        """Parse {n}, {n,}, {n,m} after consuming nothing; returns None if
        this brace is a literal (PCRE treats malformed bounds as literal)."""
        assert self.peek() == "{"
        self.take()
        start = self.i
        while self.i < self.n and self.pat[self.i].isdigit():
            self.i += 1
        if self.i == start:
            return None
        lo = int(self.pat[start : self.i])
        hi: Optional[int] = lo
        if self.peek() == ",":
            self.take()
            start2 = self.i
            while self.i < self.n and self.pat[self.i].isdigit():
                self.i += 1
            hi = int(self.pat[start2 : self.i]) if self.i > start2 else None
        if self.peek() != "}":
            return None
        self.take()
        if lo > MAX_REPEAT or (hi is not None and hi > MAX_REPEAT):
            raise self.error(f"bounded repeat exceeds limit {MAX_REPEAT}")
        return lo, hi

    # -- atoms -----------------------------------------------------------
    def parse_atom(self) -> Optional[Node]:
        c = self.take()
        if c == "(":
            return self.parse_group()
        if c == "[":
            if self.flags.utf8:
                return self.parse_class_utf8()
            return self._class_node(self.parse_class())
        if c == ".":
            if self.flags.utf8:
                rs = [(0, 0x10FFFF)] if self.flags.dotall else \
                    [(0, 0x09), (0x0B, 0x10FFFF)]
                return self._utf8_class_node(rs)
            return Pos(DOT_ALL if self.flags.dotall else DOT_NO_NL)
        if c == "^":
            return Anchor(A_MLINE_BOS if self.flags.multiline else A_BOS)
        if c == "$":
            return Anchor(A_MLINE_EOS if self.flags.multiline else A_EOS_NL)
        if c == "\\":
            return self.parse_escape()
        if c in "*+?":
            raise self.error("quantifier with nothing to repeat")
        if c == "{":
            # A brace not forming a valid bound is a literal brace.
            self.i -= 1
            save = self.i
            if self._try_parse_bounds() is not None:
                self.i = save
                raise self.error("quantifier with nothing to repeat")
            self.i = save + 1
            return self._lit(ord("{"))
        if c == "}":
            return self._lit(ord("}"))
        if c == "]":
            return self._lit(ord("]"))
        return self._lit_cp(ord(c))

    def _register_group_name(self, name: str) -> None:
        """Named-group rules (reference: Parser.rl enterNamedGroup):
        no leading digit, no duplicates; named groups are capturing."""
        if not name:
            raise self.error("empty group name")
        if name[0].isdigit():
            raise self.error("group name cannot begin with a digit")
        if name in self.group_names:
            raise self.error(
                f"two named subpatterns use the name {name!r}")
        self.group_names.add(name)
        self.n_caps += 1

    def parse_group(self) -> Optional[Node]:
        if self.peek() != "?":
            self.n_caps += 1
        if self.peek() == "?":
            self.take()
            c = self.peek()
            if c == ":":
                self.take()
            elif c == "#":
                # comment group
                while not self.at_end() and self.peek() != ")":
                    self.take()
                self.expect(")")
                return Empty()
            elif c in "=!":
                if self.flags.prefilter:
                    # prefilter mode over-approximates: a lookaround is a
                    # zero-width constraint, dropping it yields a superset
                    # (reference: src/parser/prefilter.cpp)
                    self.take()
                    self.parse_alt()
                    self.expect(")")
                    return Empty()
                raise self.error("lookahead assertions are not supported")
            elif c == "<":
                self.take()
                c2 = self.peek()
                if c2 in "=!":
                    if self.flags.prefilter:
                        self.take()
                        self.parse_alt()
                        self.expect(")")
                        return Empty()
                    raise self.error("lookbehind assertions are not supported")
                # named group (?<name>...)
                start = self.i
                while not self.at_end() and self.peek() != ">":
                    self.take()
                self._register_group_name(self.pat[start : self.i])
                self.expect(">")
            elif c == "P":
                self.take()
                c2 = self.peek()
                if c2 == "<":
                    self.take()
                    start = self.i
                    while not self.at_end() and self.peek() != ">":
                        self.take()
                    self._register_group_name(self.pat[start : self.i])
                    self.expect(">")
                else:
                    raise self.error("subroutine references are not supported")
            elif c == ">":
                if self.flags.prefilter:
                    self.take()  # treat as a plain group (superset)
                else:
                    raise self.error("atomic groups are not supported")
            elif c in "imsx-":
                # inline flags, possibly scoped: (?i) (?i:...) (?-i) ...
                newf = self.flags.copy()
                neg = False
                while not self.at_end() and self.peek() in "imsx-":
                    f = self.take()
                    if f == "-":
                        neg = True
                        continue
                    val = not neg
                    if f == "i":
                        newf.caseless = val
                    elif f == "m":
                        newf.multiline = val
                    elif f == "s":
                        newf.dotall = val
                    elif f == "x":
                        newf.extended = val
                if self.at_end():
                    raise self.error("unterminated group")
                if self.peek() == ")":
                    self.take()
                    self.flags = newf  # applies to rest of enclosing group
                    return _FlagsOnly()
                if self.peek() == ":":
                    self.take()
                    saved = self.flags
                    self.flags = newf
                    node = self.parse_alt()
                    self.flags = saved
                    self.expect(")")
                    return node
                raise self.error("malformed inline-flags group")
            elif c == "'":
                # quote-style named capturing group (?'name'...)
                # (reference: Parser.rl enterNamedGroup)
                self.take()
                start = self.i
                while not self.at_end() and self.peek() != "'":
                    self.take()
                self._register_group_name(self.pat[start : self.i])
                self.expect("'")
            elif c == "R" or c.isdigit() or c == "&" or c == "+":
                raise self.error("recursion/subroutine calls are not supported")
            elif c == "(":
                if self.flags.prefilter:
                    # conditional reference: prefilter replaces it with its
                    # branches plus an empty NO branch (reference:
                    # prefilter.cpp visit(ComponentCondReference)); the
                    # condition itself is validated: recursion is
                    # unsupported and references must resolve
                    self.take()
                    cstart = self.i
                    depth = 1
                    while not self.at_end() and depth:
                        ch = self.take()
                        if ch == "(":
                            depth += 1
                        elif ch == ")":
                            depth -= 1
                    cond = self.pat[cstart : self.i - 1]
                    if cond == "R" or (cond.startswith("R") and (
                            cond[1:].isdigit() or cond[1:2] == "&")):
                        raise self.error("pattern recursion not supported")
                    if cond.isdigit():
                        self._pending_refs.append(("cond-num", int(cond), self.i))
                    elif (len(cond) >= 2 and cond[0] in "<'"
                          and cond[-1] in ">'"):
                        self._pending_refs.append(("cond-name", cond[1:-1], self.i))
                    elif cond and not cond.startswith("?"):
                        self._pending_refs.append(("cond-name", cond, self.i))
                    body = self.parse_alt()
                    self.expect(")")
                    return alt(body, Empty())
                raise self.error("conditional groups are not supported")
            else:
                raise self.error(f"unrecognized group syntax (?{c}")
        # plain capturing or rewritten-to-noncapturing group body
        saved = self.flags.copy()
        self.group_depth += 1
        node = self.parse_alt()
        self.group_depth -= 1
        self.flags = saved
        self.expect(")")
        return node

    # -- escapes -----------------------------------------------------------
    _SIMPLE_ESCAPES = {
        "n": 0x0A,
        "r": 0x0D,
        "t": 0x09,
        "f": 0x0C,
        "a": 0x07,
        "e": 0x1B,
    }

    def parse_escape(self) -> Node:
        if self.at_end():
            raise self.error("pattern may not end with a backslash")
        c = self.take()
        if c in self._SIMPLE_ESCAPES:
            return self._lit(self._SIMPLE_ESCAPES[c])
        if c == "d":
            if self.flags.ucp:
                from .ucp import digit_ranges

                return self._ucp_class(digit_ranges())
            return Pos(DIGIT)
        if c == "D":
            if self.flags.ucp:
                from .ucp import digit_ranges

                return self._ucp_class(digit_ranges(), negate=True)
            if self.flags.utf8:
                return self._utf8_class_node([(0x30, 0x39)], negate=True)
            return Pos(~DIGIT)
        if c == "s":
            if self.flags.ucp:
                from .ucp import space_ranges

                return self._ucp_class(space_ranges())
            return Pos(SPACE)
        if c == "S":
            if self.flags.ucp:
                from .ucp import space_ranges

                return self._ucp_class(space_ranges(), negate=True)
            if self.flags.utf8:
                from .utf8 import charreach_to_ranges

                return self._utf8_class_node(
                    charreach_to_ranges(SPACE), negate=True
                )
            return Pos(~SPACE)
        if c == "w":
            if self.flags.ucp:
                from .ucp import word_ranges

                return self._ucp_class(word_ranges())
            return Pos(WORD)
        if c == "W":
            if self.flags.ucp:
                from .ucp import word_ranges

                return self._ucp_class(word_ranges(), negate=True)
            if self.flags.utf8:
                from .utf8 import charreach_to_ranges

                return self._utf8_class_node(
                    charreach_to_ranges(WORD), negate=True
                )
            return Pos(~WORD)
        if c == "v":
            if self.flags.utf8:
                from .utf8 import VERT_WS_CP

                return self._utf8_class_node(list(VERT_WS_CP))
            return Pos(VERT_WS)
        if c == "V":
            if self.flags.utf8:
                from .utf8 import VERT_WS_CP

                return self._utf8_class_node(list(VERT_WS_CP), negate=True)
            return Pos(~VERT_WS)
        if c == "h":
            if self.flags.utf8:
                from .utf8 import HORZ_WS_CP

                return self._utf8_class_node(list(HORZ_WS_CP))
            return Pos(HORZ_WS)
        if c == "H":
            if self.flags.utf8:
                from .utf8 import HORZ_WS_CP

                return self._utf8_class_node(list(HORZ_WS_CP), negate=True)
            return Pos(~HORZ_WS)
        if c == "R":
            if self.flags.utf8:
                from .utf8 import VERT_WS_CP

                return alt(
                    seq(Pos(CharReach.single(0x0D)),
                        Pos(CharReach.single(0x0A))),
                    self._utf8_class_node(list(VERT_WS_CP)),
                )
            # \r\n | single NL byte
            return alt(
                seq(Pos(CharReach.single(0x0D)), Pos(CharReach.single(0x0A))),
                Pos(NL_BYTES),
            )
        if c == "N":
            if self.flags.utf8:
                return self._utf8_class_node([(0x0A, 0x0A)], negate=True)
            return Pos(DOT_NO_NL)
        if c == "A":
            return Anchor(A_BOS)
        if c == "Z":
            return Anchor(A_EOS_NL)
        if c == "z":
            return Anchor(A_EOS)
        if c == "b":
            if self.flags.ucp:
                if self.flags.prefilter:
                    return Empty()  # over-approximation: drop the constraint
                return Anchor(A_UWORDB if self.flags.utf8 else A_UWORDB8)
            return Anchor(A_WORDB)
        if c == "B":
            if self.flags.ucp:
                if self.flags.prefilter:
                    return Empty()
                return Anchor(A_UNWORDB if self.flags.utf8 else A_UNWORDB8)
            return Anchor(A_NWORDB)
        if c == "G":
            raise self.error("\\G is not supported")
        if c == "X":
            # reference: ComponentEUS is prefilter-only (unsupported.cpp);
            # under prefilter it over-approximates as . / .+ (utf8)
            if self.flags.prefilter:
                if self.flags.utf8:
                    return Rep(Pos(DOT_ALL), 1, None)
                return Pos(DOT_ALL)
            raise self.error("\\X is not supported")
        if c == "C":
            # \C: one data unit (byte); reference rejects it under UTF8
            # (Parser.rl:1304-1308, ComponentByte)
            if self.flags.utf8:
                raise self.error("\\C is unsupported in UTF8")
            return Pos(DOT_ALL)
        if c == "x":
            return self._lit_cp(self._parse_hex_escape())
        if c == "o":
            return self._lit_cp(self._parse_braced_octal())
        if c == "c":
            if self.at_end():
                raise self.error("malformed \\c escape")
            ch = self.take()
            if ord(ch) > 0x7F:
                raise self.error(
                    "\\c must be followed by an ASCII character")
            return self._lit(ord(ch.upper()) ^ 0x40)
        if c == "0":
            return self._lit(self._parse_octal_after_zero())
        if c.isdigit():
            if self.flags.prefilter:
                digits = c
                while not self.at_end() and self.peek().isdigit():
                    digits += self.take()
                # a backreference matches *some* string; .* is its
                # superset — but the referenced group must exist
                # (reference: "Invalid back reference to expression N")
                self._pending_refs.append(("num", int(digits), self.i))
                return Rep(Pos(DOT_ALL), 0, None)
            raise self.error("backreferences are not supported")
        if c == "Q":
            return self._parse_quoted()
        if c == "E":
            return Empty()
        if c == "k" or c == "g":
            if self.flags.prefilter:
                if self.peek() in "<{'":
                    opener = self.take()
                    closer = {"<": ">", "{": "}", "'": "'"}[opener]
                    start = self.i
                    while not self.at_end() and self.peek() != closer:
                        self.take()
                    label = self.pat[start : self.i]
                    if not self.at_end():
                        self.take()
                    if label and not label.lstrip("+-").isdigit():
                        self._pending_refs.append(("name", label, self.i))
                    elif label.lstrip("+-").isdigit() and not label.startswith(("+", "-")):
                        self._pending_refs.append(("num", int(label), self.i))
                return Rep(Pos(DOT_ALL), 0, None)
            raise self.error("backreferences are not supported")
        if c == "p" or c == "P":
            from .ucp import category_ranges

            name, pneg = self._parse_prop_name()
            return self._ucp_class(
                category_ranges(name, self.index),
                negate=(c == "P") != pneg,
            )
        if c.isalpha():
            raise self.error(f"unrecognized escape \\{c}")
        return self._lit(ord(c) & 0xFF)

    def _parse_hex_escape(self) -> int:
        if self.peek() == "{":
            self.take()
            start = self.i
            while not self.at_end() and self.peek() != "}":
                self.take()
            body = self.pat[start : self.i]
            try:
                val = int(body or "0", 16)
            except ValueError:
                raise self.error(f"malformed \\x{{{body}}} hex escape")
            self.expect("}")
            if val > 0xFF and not self.flags.utf8:
                raise self.error(
                    "\\x{} value exceeds one byte (UTF-8 mode required)"
                )
            if val > 0x10FFFF:
                raise self.error("\\x{} value exceeds Unicode range")
            return val
        digits = ""
        while len(digits) < 2 and not self.at_end() and self.peek() in "0123456789abcdefABCDEF":
            digits += self.take()
        return int(digits, 16) if digits else 0

    def _parse_braced_octal(self) -> int:
        """PCRE \\o{ddd..}: braced octal codepoint."""
        self.expect("{")
        start = self.i
        while not self.at_end() and self.peek() != "}":
            self.take()
        body = self.pat[start : self.i]
        self.expect("}")
        try:
            val = int(body, 8)
        except ValueError:
            raise self.error(f"malformed \\o{{{body}}} octal escape")
        if val > 0xFF and not self.flags.utf8:
            raise self.error(
                "codepoint above \\xFF requires HS_FLAG_UTF8"
            )
        if val > 0x10FFFF:
            raise self.error("\\o{} value exceeds Unicode range")
        return val

    def _parse_octal_after_zero(self) -> int:
        digits = "0"
        while len(digits) < 3 and not self.at_end() and self.peek() in "01234567":
            digits += self.take()
        return int(digits, 8) & 0xFF

    def _parse_quoted(self) -> Node:
        items: List[Node] = []
        while not self.at_end():
            c = self.take()
            if c == "\\" and self.peek() == "E":
                self.take()
                break
            items.append(self._lit(ord(c) & 0xFF))
        return seq(*items) if items else Empty()

    # -- character classes ---------------------------------------------
    def _posix_entry_checks(self) -> None:
        """At a class opening: reject [.coll.] / [=coll=] and top-level
        [:name:] forms the way the reference does (bad_patterns.txt:44-48,
        97; PCRE check_posix_syntax: POSIX-ness requires the terminator)."""
        k = self.peek()
        if k in ".=" and self.pat.find(k + "]", self.i + 1) >= 0:
            raise self.error("unsupported POSIX collating element")
        if k == ":" and self.pat.find(":]", self.i + 1) >= 0:
            raise self.error(
                "POSIX named classes are only supported inside a class")

    def parse_class(self) -> CharReach:
        self._posix_entry_checks()
        negate = False
        if self.peek() == "^":
            self.take()
            negate = True
        cr = CharReach.none()
        first = True
        while True:
            if self.at_end():
                raise self.error("unterminated character class")
            c = self.take()
            if c == "\\" and self.peek() == "Q":
                # \Q..\E inside a class: members are literal (PCRE)
                self.take()
                while not self.at_end():
                    q = self.take()
                    if q == "\\" and self.peek() == "E":
                        self.take()
                        break
                    first = False
                    cr = cr | CharReach.single(ord(q) & 0xFF)
                continue
            if c == "\\" and self.peek() == "E":
                self.take()  # stray \E is ignored, [\E]] == []]
                continue
            if c == "]" and not first:
                break
            first = False
            # POSIX class [:name:] (collating elements unsupported)
            if c == "[" and self.peek() in ":.=":
                kind = self.peek()
                if kind in ".=":
                    if self.pat.find(kind + "]", self.i + 1) >= 0:
                        raise self.error(
                            "unsupported POSIX collating element")
                else:
                    j = self.pat.find(":]", self.i + 1)
                    if j >= 0 and "]" not in self.pat[self.i + 1 : j]:
                        body = self.pat[self.i + 1 : j]
                        neg2 = body.startswith("^")
                        name = body[1:] if neg2 else body
                        if name not in POSIX_CLASSES:
                            raise self.error(
                                f"invalid POSIX named class {name!r}")
                        self.i = j + 2
                        pc = POSIX_CLASSES[name]
                        cr = cr | (~pc if neg2 else pc)
                        continue
                # no terminator: literal '['

            lo_cr: Optional[CharReach] = None
            if c == "\\":
                lo_cr, lo_byte = self._class_escape()
            else:
                lo_byte = ord(c) & 0xFF

            if lo_cr is not None:
                cr = cr | lo_cr
                continue

            # possible range a-z
            if self.peek() == "-" and self.i + 1 < self.n and self.pat[self.i + 1] != "]":
                self.take()  # '-'
                if self.pat[self.i : self.i + 2] == "\\Q":
                    # endpoint is quoted: [a-\Q\E] (empty quote) makes the
                    # hyphen literal; [a-\Qz\E] takes the first quoted char
                    # as the range end and the rest as literal members
                    self.i += 2
                    if self.pat[self.i : self.i + 2] == "\\E":
                        self.i += 2
                        cr = cr | CharReach.single(lo_byte) | CharReach.single(ord("-"))
                        continue
                    hi_byte = ord(self.take()) & 0xFF
                    if hi_byte < lo_byte:
                        raise self.error("range out of order in character class")
                    cr = cr | CharReach.range(lo_byte, hi_byte)
                    while not self.at_end():
                        q = self.take()
                        if q == "\\" and self.peek() == "E":
                            self.take()
                            break
                        cr = cr | CharReach.single(ord(q) & 0xFF)
                    continue
                c2 = self.take()
                if c2 == "[" and self.peek() in ":.=" \
                        and self.pat.find(self.peek() + "]", self.i) >= 0:
                    raise self.error("invalid range in character class")
                if c2 == "\\":
                    hi_cr, hi_byte = self._class_escape()
                    if hi_cr is not None:
                        raise self.error("invalid range endpoint in class")
                else:
                    hi_byte = ord(c2) & 0xFF
                if hi_byte < lo_byte:
                    raise self.error("range out of order in character class")
                cr = cr | CharReach.range(lo_byte, hi_byte)
            else:
                cr = cr | CharReach.single(lo_byte)

        if self.flags.caseless:
            cr = cr.make_caseless()
        if negate:
            cr = ~cr
        return cr

    def parse_class_utf8(self) -> Node:
        """Character class over codepoints, lowered to byte sequences."""
        from .utf8 import HORZ_WS_CP, VERT_WS_CP, charreach_to_ranges

        self._posix_entry_checks()
        negate = False
        if self.peek() == "^":
            self.take()
            negate = True
        ranges: List[tuple] = []
        first = True
        while True:
            if self.at_end():
                raise self.error("unterminated character class")
            c = self.take()
            if c == "\\" and self.peek() == "Q":
                # \Q..\E inside a class: members are literal codepoints
                self.take()
                while not self.at_end():
                    q = self.take()
                    if q == "\\" and self.peek() == "E":
                        self.take()
                        break
                    first = False
                    ranges.append((ord(q), ord(q)))
                continue
            if c == "\\" and self.peek() == "E":
                self.take()  # stray \E is ignored
                continue
            if c == "]" and not first:
                break
            first = False
            if c == "[" and self.peek() in ":.=":
                kind = self.peek()
                if kind in ".=":
                    if self.pat.find(kind + "]", self.i + 1) >= 0:
                        raise self.error(
                            "unsupported POSIX collating element")
                else:
                    j = self.pat.find(":]", self.i + 1)
                    if j >= 0 and "]" not in self.pat[self.i + 1 : j]:
                        body = self.pat[self.i + 1 : j]
                        neg2 = body.startswith("^")
                        name = body[1:] if neg2 else body
                        if name not in POSIX_CLASSES:
                            raise self.error(
                                f"invalid POSIX named class {name!r}")
                        self.i = j + 2
                        rs = charreach_to_ranges(POSIX_CLASSES[name])
                        if neg2:
                            from .utf8 import complement_ranges

                            rs = complement_ranges(rs)
                        ranges += rs
                        continue
                # no terminator: literal '['

            lo_cp: Optional[int] = None
            if c == "\\":
                cls_rs, byte = self._class_escape_utf8(
                    VERT_WS_CP, HORZ_WS_CP, charreach_to_ranges
                )
                if cls_rs is not None:
                    ranges += cls_rs
                    continue
                lo_cp = byte
            else:
                lo_cp = ord(c)

            if (
                self.peek() == "-"
                and self.i + 1 < self.n
                and self.pat[self.i + 1] != "]"
            ):
                self.take()
                if self.pat[self.i : self.i + 2] == "\\Q":
                    # quoted endpoint: empty quote makes '-' literal,
                    # else first quoted char ends the range
                    self.i += 2
                    if self.pat[self.i : self.i + 2] == "\\E":
                        self.i += 2
                        ranges.append((lo_cp, lo_cp))
                        ranges.append((ord("-"), ord("-")))
                        continue
                    hi_cp = ord(self.take())
                    if hi_cp < lo_cp:
                        raise self.error(
                            "range out of order in character class")
                    ranges.append((lo_cp, hi_cp))
                    while not self.at_end():
                        q = self.take()
                        if q == "\\" and self.peek() == "E":
                            self.take()
                            break
                        ranges.append((ord(q), ord(q)))
                    continue
                c2 = self.take()
                if c2 == "[" and self.peek() in ":.=" \
                        and self.pat.find(self.peek() + "]", self.i) >= 0:
                    raise self.error("invalid range in character class")
                if c2 == "\\":
                    cls_rs, hi_cp = self._class_escape_utf8(
                        VERT_WS_CP, HORZ_WS_CP, charreach_to_ranges
                    )
                    if cls_rs is not None:
                        raise self.error("invalid range endpoint in class")
                else:
                    hi_cp = ord(c2)
                if hi_cp < lo_cp:
                    raise self.error("range out of order in character class")
                ranges.append((lo_cp, hi_cp))
            else:
                ranges.append((lo_cp, lo_cp))
        return self._utf8_class_node(ranges, negate=negate)

    def _class_escape_utf8(self, VERT_WS_CP, HORZ_WS_CP, charreach_to_ranges):
        """Class escape in UTF-8 mode: (codepoint ranges, None) or
        (None, codepoint)."""
        from .utf8 import complement_ranges

        if self.at_end():
            raise self.error("pattern may not end with a backslash")
        c = self.peek()
        if c in "pP":
            self.take()
            from .ucp import category_ranges

            name, pneg = self._parse_prop_name()
            rs = category_ranges(name, self.index)
            return (complement_ranges(rs) if (c == "P") != pneg
                    else rs), None
        if c in "dDsSwWvVhH":
            self.take()
            if self.flags.ucp and c.lower() in "dsw":
                from .ucp import digit_ranges, space_ranges, word_ranges

                base = {"d": digit_ranges(), "s": space_ranges(),
                        "w": word_ranges()}[c.lower()]
            else:
                base = {
                    "d": charreach_to_ranges(DIGIT),
                    "s": charreach_to_ranges(SPACE),
                    "w": charreach_to_ranges(WORD),
                    "v": list(VERT_WS_CP),
                    "h": list(HORZ_WS_CP),
                }[c.lower()]
            return (complement_ranges(base) if c.isupper() else base), None
        cr, byte = self._class_escape()
        if cr is not None:
            # byte-class escape without a UTF-8 interpretation
            return charreach_to_ranges(cr), None
        return None, byte

    def _class_escape(self):
        """Returns (class, None) for class escapes or (None, byte)."""
        if self.at_end():
            raise self.error("pattern may not end with a backslash")
        c = self.take()
        if c in self._SIMPLE_ESCAPES:
            return None, self._SIMPLE_ESCAPES[c]
        if c in "pP":
            from .ucp import category_ranges

            name, pneg = self._parse_prop_name()
            cr = _ranges_to_charreach(category_ranges(name, self.index))
            return (~cr if (c == "P") != pneg else cr), None
        if c == "d":
            if self.flags.ucp:
                from .ucp import digit_ranges

                return _ranges_to_charreach(digit_ranges()), None
            return DIGIT, None
        if c == "D":
            if self.flags.ucp:
                from .ucp import digit_ranges

                return ~_ranges_to_charreach(digit_ranges()), None
            return ~DIGIT, None
        if c == "s":
            if self.flags.ucp:
                from .ucp import space_ranges

                return _ranges_to_charreach(space_ranges()), None
            return SPACE, None
        if c == "S":
            if self.flags.ucp:
                from .ucp import space_ranges

                return ~_ranges_to_charreach(space_ranges()), None
            return ~SPACE, None
        if c == "w":
            if self.flags.ucp:
                from .ucp import word_ranges

                return _ranges_to_charreach(word_ranges()), None
            return WORD, None
        if c == "W":
            if self.flags.ucp:
                from .ucp import word_ranges

                return ~_ranges_to_charreach(word_ranges()), None
            return ~WORD, None
        if c == "v":
            return VERT_WS, None
        if c == "V":
            return ~VERT_WS, None
        if c == "h":
            return HORZ_WS, None
        if c == "H":
            return ~HORZ_WS, None
        if c == "b":
            return None, 0x08  # backspace inside classes
        if c == "x":
            return None, self._parse_hex_escape()
        if c == "c":
            if self.at_end():
                raise self.error("malformed \\c escape")
            ch = self.take()
            if ord(ch) > 0x7F:
                raise self.error(
                    "\\c must be followed by an ASCII character")
            return None, ord(ch.upper()) ^ 0x40
        if c == "0":
            return None, self._parse_octal_after_zero()
        if c in "89":
            # PCRE: \8 and \9 inside a class are the literal digits
            return None, ord(c)
        if c.isdigit():
            # octal without leading 0 inside classes
            digits = c
            while len(digits) < 3 and not self.at_end() and self.peek() in "01234567":
                digits += self.take()
            try:
                return None, int(digits, 8) & 0xFF
            except ValueError:
                raise self.error("bad octal escape in class")
        if c.isalpha():
            raise self.error(f"unrecognized escape \\{c} in class")
        return None, ord(c) & 0xFF


def _ranges_to_charreach(ranges) -> CharReach:
    """Clip codepoint ranges to the byte alphabet (UCP without UTF8)."""
    import numpy as _np

    bits = _np.zeros(256, dtype=bool)
    for (lo, hi) in ranges:
        if lo > 255:
            break
        bits[lo : min(hi, 255) + 1] = True
    return CharReach(bits)


def parse(pattern, flags: int = 0, index: int = -1) -> Node:
    """Parse a PCRE-subset pattern into an AST (anchors unresolved)."""
    return _Parser(pattern, flags, index).parse()


def parse_with_flags(pattern, flags: int = 0, index: int = -1):
    """Parse and also return the effective flag set: leading control
    verbs ((*UTF8), (*UCP)) fold into the expression flags exactly as the
    reference's ParseMode does (control_verbs.rl)."""
    pp = _Parser(pattern, flags, index)
    node = pp.parse()
    return node, flags | pp.verb_flags
