"""Logical combinations of patterns: `(101&102)|(!103&104)`.

Reference analogues:
- parsing: src/parser/logical_combination.cpp (parseLogicalCombination,
  invoked from src/compiler/compiler.cpp:318)
- runtime evaluation: the Rose SET_LOGICAL / FLUSH_COMBINATION program
  instructions over lkey/ckey vectors (src/util/logical.h,
  src/rose/program_runtime.c); here evaluation is a host-side fold over
  the ordered match event stream.

Semantics (reference: hs_compile.h HS_FLAG_COMBINATION docs): whenever a
sub-expression match event is delivered at offset X, each combination
referencing any sub-expression id re-evaluates over the set of ids that
have matched at or before X; if true, the combination reports at X (deduped
per offset).
"""

from __future__ import annotations

from typing import List, Set, Tuple, Union

from ..errors import CompileError

# AST node encodings (json-serializable nested lists):
#   ("id", n) | ("not", x) | ("and", a, b) | ("or", a, b)
Node = Union[Tuple[str, int], Tuple[str, "Node"], Tuple[str, "Node", "Node"]]


class _Parser:
    def __init__(self, text: str, expr_index: int):
        self.t = text
        self.i = 0
        self.idx = expr_index

    def error(self, msg: str) -> CompileError:
        return CompileError(
            f"logical combination: {msg} at position {self.i}", self.idx
        )

    def _skip(self) -> None:
        while self.i < len(self.t) and self.t[self.i] in " \t":
            self.i += 1

    def peek(self) -> str:
        self._skip()
        return self.t[self.i] if self.i < len(self.t) else ""

    def parse(self) -> Node:
        node = self._or()
        if self.peek():
            raise self.error(f"unexpected character {self.peek()!r}")
        return node

    def _or(self) -> Node:
        left = self._and()
        while self.peek() == "|":
            self.i += 1
            left = ("or", left, self._and())
        return left

    def _and(self) -> Node:
        left = self._unary()
        while self.peek() == "&":
            self.i += 1
            left = ("and", left, self._unary())
        return left

    def _unary(self) -> Node:
        c = self.peek()
        if c == "!":
            self.i += 1
            return ("not", self._unary())
        if c == "(":
            self.i += 1
            node = self._or()
            if self.peek() != ")":
                raise self.error("expected ')'")
            self.i += 1
            return node
        if c.isdigit():
            j = self.i
            while self.i < len(self.t) and self.t[self.i].isdigit():
                self.i += 1
            return ("id", int(self.t[j : self.i]))
        raise self.error(f"expected operand, found {c!r}" if c else "unexpected end")


def parse_combination(expression: str, expr_index: int = -1) -> Node:
    """Parse a combination expression into an AST (reference:
    parseLogicalCombination, src/parser/logical_combination.cpp)."""
    if not expression.strip():
        raise CompileError("empty logical combination", expr_index)
    return _Parser(expression, expr_index).parse()


def referenced_ids(node: Node) -> Set[int]:
    op = node[0]
    if op == "id":
        return {node[1]}
    if op == "not":
        return referenced_ids(node[1])
    return referenced_ids(node[1]) | referenced_ids(node[2])


def evaluate(node: Node, matched: Set[int]) -> bool:
    op = node[0]
    if op == "id":
        return node[1] in matched
    if op == "not":
        return not evaluate(node[1], matched)
    if op == "and":
        return evaluate(node[1], matched) and evaluate(node[2], matched)
    assert op == "or"
    return evaluate(node[1], matched) or evaluate(node[2], matched)


def to_jsonable(node: Node):
    """Nested-list form for database serialization."""
    op = node[0]
    if op == "id":
        return ["id", node[1]]
    if op == "not":
        return ["not", to_jsonable(node[1])]
    return [op, to_jsonable(node[1]), to_jsonable(node[2])]


def from_jsonable(data) -> Node:
    op = data[0]
    if op == "id":
        return ("id", int(data[1]))
    if op == "not":
        return ("not", from_jsonable(data[1]))
    return (op, from_jsonable(data[1]), from_jsonable(data[2]))
