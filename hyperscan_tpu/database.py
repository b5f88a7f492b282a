"""Compiled pattern database.

Reference analogues:
- container + serialization: src/database.c (hs_database: magic, version,
  platform, CRC; serialize = header + blob; deserialize validates)
- compile driver: src/hs.cpp hs_compile_multi_int + src/compiler/compiler.cpp
  (build → generateRoseEngine → dbCreate)

The TPU "bytecode" is a set of host numpy tables (per engine) that are
uploaded as device arrays at first scan. Where the reference partitions
work across an engine zoo chosen by heuristics, round 1 compiles every
pattern through the scanning-DFA path, partitioning the pattern set when
subset construction exceeds the state budget (the analogue of Rose
splitting work across multiple outfixes).
"""

from __future__ import annotations

import dataclasses
import io
import json
import zlib
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .compiler.dfa import DfaLimitExceeded, ScanDFA, determinize
from .compiler.glushkov import NFAGraph, build_nfa
from .compiler.parser import parse
from .errors import (
    CompileError,
    DbModeError,
    DbPlatformError,
    DbVersionError,
    InvalidError,
)
from .flags import (
    HS_FLAG_ALLOWEMPTY,
    HS_FLAG_COMBINATION,
    HS_FLAG_PREFILTER,
    HS_FLAG_QUIET,
    HS_FLAG_SINGLEMATCH,
    HS_FLAG_SOM_LEFTMOST,
    HS_MODE_BLOCK,
    UNBOUNDED,
    ExprExt,
    base_mode,
    validate_flags,
    validate_mode,
)

DB_MAGIC = b"HSTPUDB1"
DB_VERSION = (0, 1, 0)
PLATFORM = "tpu-generic"  # single XLA target; reference: fat-runtime dispatch


@dataclasses.dataclass
class PatternInfo:
    """Per-expression report metadata (reference: src/util/report.h Report:
    onmatch id, dedupe, exhaustion, min/max offset bounds)."""

    external_id: int
    flags: int
    min_offset: int = 0
    max_offset: int = UNBOUNDED
    min_width: int = 0
    max_width: Optional[int] = None  # None = unbounded


@dataclasses.dataclass
class DfaEngine:
    """One scanning DFA covering a subset of the expressions."""

    byte_to_class: np.ndarray  # [256] int32
    trans: np.ndarray  # [S, C] int32
    start_state: int
    accept_id: np.ndarray  # [S] int32
    accept_eod_id: np.ndarray  # [S] int32
    # accept-set expansion: set k covers reports
    # set_offsets[k] : set_offsets[k+1] in (set_exprs, set_adjusts)
    set_offsets: np.ndarray  # [num_sets+1] int32
    set_exprs: np.ndarray  # [total] int32 (expression indices)
    set_adjusts: np.ndarray  # [total] int32
    # empty-match reports: (anchored, eod, adjust, expr)
    start_reports: List[Tuple[bool, bool, int, int]]

    @property
    def num_states(self) -> int:
        return int(self.trans.shape[0])

    @classmethod
    def from_scan_dfa(cls, d: ScanDFA) -> "DfaEngine":
        offsets = [0]
        exprs: List[int] = []
        adjusts: List[int] = []
        for s in d.accept_sets:
            for (eid, adj) in sorted(s):
                exprs.append(eid)
                adjusts.append(adj)
            offsets.append(len(exprs))
        return cls(
            byte_to_class=d.byte_to_class.astype(np.int32),
            trans=d.trans.astype(np.int32),
            start_state=int(d.start_state),
            accept_id=d.accept_id.astype(np.int32),
            accept_eod_id=d.accept_eod_id.astype(np.int32),
            set_offsets=np.asarray(offsets, dtype=np.int32),
            set_exprs=np.asarray(exprs, dtype=np.int32),
            set_adjusts=np.asarray(adjusts, dtype=np.int32),
            start_reports=list(d.start_reports),
        )

    def expand_set(self, set_id: int) -> List[Tuple[int, int]]:
        lo, hi = int(self.set_offsets[set_id]), int(self.set_offsets[set_id + 1])
        return [
            (int(self.set_exprs[i]), int(self.set_adjusts[i])) for i in range(lo, hi)
        ]


@dataclasses.dataclass
class Database:
    mode: int
    patterns: List[PatternInfo]
    engines: List[DfaEngine]

    # -- introspection (reference: hs_database_info, src/database.c) --------
    def info(self) -> str:
        ver = ".".join(map(str, DB_VERSION))
        return f"Version: {ver} Features: {PLATFORM} Mode: {self.mode}"

    def size(self) -> int:
        return len(self.serialize())

    @property
    def num_patterns(self) -> int:
        return len(self.patterns)

    def state_count(self) -> int:
        return sum(e.num_states for e in self.engines)

    # -- serialization (reference: src/database.c:62,200) -------------------
    def serialize(self) -> bytes:
        arrays: Dict[str, np.ndarray] = {}
        meta = {
            "version": DB_VERSION,
            "platform": PLATFORM,
            "mode": self.mode,
            "patterns": [dataclasses.asdict(p) for p in self.patterns],
            "engines": [],
        }
        for i, e in enumerate(self.engines):
            meta["engines"].append(
                {"start_state": e.start_state, "start_reports": e.start_reports}
            )
            for name in (
                "byte_to_class",
                "trans",
                "accept_id",
                "accept_eod_id",
                "set_offsets",
                "set_exprs",
                "set_adjusts",
            ):
                arrays[f"e{i}_{name}"] = getattr(e, name)
        buf = io.BytesIO()
        np.savez(buf, meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
                 **arrays)
        payload = buf.getvalue()
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        header = DB_MAGIC + crc.to_bytes(4, "little") + len(payload).to_bytes(8, "little")
        return header + payload

    @classmethod
    def deserialize(cls, data: bytes) -> "Database":
        if len(data) < 20 or data[:8] != DB_MAGIC:
            raise DbVersionError("bad database magic")
        crc = int.from_bytes(data[8:12], "little")
        plen = int.from_bytes(data[12:20], "little")
        payload = data[20 : 20 + plen]
        if len(payload) != plen or (zlib.crc32(payload) & 0xFFFFFFFF) != crc:
            raise DbVersionError("database CRC mismatch")
        with np.load(io.BytesIO(payload)) as z:
            meta = json.loads(bytes(z["meta"]).decode())
            if tuple(meta["version"])[:2] != DB_VERSION[:2]:
                raise DbVersionError(
                    f"database version {meta['version']} incompatible"
                )
            if meta["platform"] != PLATFORM:
                raise DbPlatformError(
                    f"database built for platform {meta['platform']}"
                )
            patterns = [PatternInfo(**p) for p in meta["patterns"]]
            engines = []
            for i, em in enumerate(meta["engines"]):
                engines.append(
                    DfaEngine(
                        byte_to_class=z[f"e{i}_byte_to_class"],
                        trans=z[f"e{i}_trans"],
                        start_state=int(em["start_state"]),
                        accept_id=z[f"e{i}_accept_id"],
                        accept_eod_id=z[f"e{i}_accept_eod_id"],
                        set_offsets=z[f"e{i}_set_offsets"],
                        set_exprs=z[f"e{i}_set_exprs"],
                        set_adjusts=z[f"e{i}_set_adjusts"],
                        start_reports=[tuple(r) for r in em["start_reports"]],
                    )
                )
        return cls(mode=int(meta["mode"]), patterns=patterns, engines=engines)


def _nfa_widths(g: NFAGraph) -> Tuple[int, Optional[int]]:
    """(min_width, max_width) of matches; max_width None if unbounded.
    Reference: src/nfagraph/ng_width.cpp."""
    P = g.num_positions
    INF = 1 << 30
    dist = [INF] * P
    from collections import deque

    dq = deque()
    for v in g.anchored_first | g.float_first:
        dist[v] = 1
        dq.append(v)
    while dq:
        u = dq.popleft()
        for v in g.follow[u]:
            if dist[v] > dist[u] + 1:
                dist[v] = dist[u] + 1
                dq.append(v)
    accepting = set(g.accept) | set(g.accept_eod)
    min_w = min((dist[v] for v in accepting), default=INF)
    if g.is_vacuous():
        min_w = 0
    # max width: longest path; unbounded if any accepting-reachable cycle
    # exists on a start-reachable path. Detect via DFS cycle check.
    # Simple conservative answer: if the follow graph (restricted to live
    # positions) has any cycle → unbounded.
    color = [0] * P
    has_cycle = False

    def dfs(u: int) -> None:
        nonlocal has_cycle
        stack = [(u, iter(g.follow[u]))]
        color[u] = 1
        while stack:
            node, it = stack[-1]
            advanced = False
            for v in it:
                if color[v] == 1:
                    has_cycle = True
                elif color[v] == 0:
                    color[v] = 1
                    stack.append((v, iter(g.follow[v])))
                    advanced = True
                    break
            if not advanced:
                color[node] = 2
                stack.pop()

    for v in g.anchored_first | g.float_first:
        if color[v] == 0:
            dfs(v)
    if has_cycle:
        return (0 if min_w == INF else min_w), None
    # DAG: longest path via topo order
    import functools

    @functools.lru_cache(maxsize=None)
    def longest(u: int) -> int:
        best = 1
        for v in g.follow[u]:
            best = max(best, 1 + longest(v))
        return best

    max_w = 0
    for v in g.anchored_first | g.float_first:
        max_w = max(max_w, longest(v))
    return (0 if min_w == INF else min_w), max_w


def _build_engines(
    nfas: List[NFAGraph], expr_idx: List[int], max_states: int
) -> List[DfaEngine]:
    """Determinize, partitioning the pattern set on state explosion
    (the analogue of Rose assigning patterns to separate engines)."""
    try:
        d = determinize(nfas, expr_idx, max_states=max_states)
        return [DfaEngine.from_scan_dfa(d)]
    except DfaLimitExceeded:
        if len(nfas) == 1:
            raise CompileError(
                "single pattern exceeds DFA state budget "
                f"({max_states}); not yet supported without NFA engines",
                expr_idx[0],
            )
        mid = len(nfas) // 2
        return _build_engines(nfas[:mid], expr_idx[:mid], max_states) + _build_engines(
            nfas[mid:], expr_idx[mid:], max_states
        )


def compile_patterns(
    expressions: Sequence,
    flags: Optional[Sequence[int]] = None,
    ids: Optional[Sequence[int]] = None,
    mode: int = HS_MODE_BLOCK,
    ext: Optional[Sequence[Optional[ExprExt]]] = None,
    literal: bool = False,
    max_states: int = 60000,
) -> Database:
    """Core compile driver (reference: hs_compile_multi_int, src/hs.cpp:168)."""
    validate_mode(mode)
    n = len(expressions)
    if n == 0:
        raise InvalidError("no expressions given")
    flags = list(flags) if flags is not None else [0] * n
    ids = list(ids) if ids is not None else [0] * n
    ext = list(ext) if ext is not None else [None] * n
    if not (len(flags) == len(ids) == len(ext) == n):
        raise InvalidError("expressions/flags/ids/ext length mismatch")

    patterns: List[PatternInfo] = []
    nfas: List[NFAGraph] = []
    for i, expr in enumerate(expressions):
        f = flags[i]
        validate_flags(f, i)
        if f & HS_FLAG_COMBINATION:
            raise CompileError("logical combinations not yet supported", i)
        if f & HS_FLAG_SOM_LEFTMOST:
            raise CompileError("HS_FLAG_SOM_LEFTMOST not yet supported", i)
        if literal:
            data = expr if isinstance(expr, bytes) else str(expr).encode("latin-1")
            from .compiler.ast import Pos, seq as ast_seq
            from .compiler.charclass import CharReach

            crs = [CharReach.single(b) for b in data]
            if f & 1:  # CASELESS
                crs = [c.make_caseless() for c in crs]
            node = ast_seq(*[Pos(c) for c in crs])
            if not data:
                raise CompileError("empty literal", i)
        else:
            node = parse(expr, f, i)
        g = build_nfa(node)
        if g.is_vacuous() and not (f & HS_FLAG_ALLOWEMPTY):
            raise CompileError(
                "expression matches an empty buffer; use HS_FLAG_ALLOWEMPTY", i
            )
        min_w, max_w = _nfa_widths(g)
        e = ext[i] or ExprExt()
        if e.edit_distance or e.hamming_distance:
            raise CompileError("approximate matching not yet supported", i)
        if e.min_length:
            # exact without SOM only when every match has width ≥ min_length
            if min_w < e.min_length:
                raise CompileError(
                    "min_length below pattern min width requires SOM "
                    "(not yet supported)",
                    i,
                )
        patterns.append(
            PatternInfo(
                external_id=ids[i],
                flags=f,
                min_offset=e.min_offset,
                max_offset=e.max_offset,
                min_width=min_w,
                max_width=max_w,
            )
        )
        nfas.append(g)

    engines = _build_engines(nfas, list(range(n)), max_states)
    return Database(mode=mode, patterns=patterns, engines=engines)
