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

from .compiler.chains import InfixSpec as _InfixSpec
from .compiler.dfa import (DfaLimitExceeded, ScanDFA, determinize,
                           determinize_cached)
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
    HS_FLAG_UTF8,
    HS_MODE_BLOCK,
    UNBOUNDED,
    ExprExt,
    base_mode,
    validate_flags,
    validate_mode,
)

DB_MAGIC = b"HSTPUDB1"
DB_VERSION = (0, 4, 0)


def _narrow_array(a: np.ndarray) -> np.ndarray:
    """Smallest-dtype copy with identical values (storage form only)."""
    if a.dtype.kind not in "iu" or a.size == 0:
        return a
    mn, mx = int(a.min()), int(a.max())
    if mn >= 0:
        for dt in (np.uint8, np.uint16, np.uint32):
            if mx <= np.iinfo(dt).max:
                return a.astype(dt) if a.dtype != dt else a
    else:
        for dt in (np.int8, np.int16, np.int32):
            ii = np.iinfo(dt)
            if ii.min <= mn and mx <= ii.max:
                return a.astype(dt) if a.dtype != dt else a
    return a


class _ArrayStore:
    """Content-addressed array container for serialization: identical
    tables (after dtype narrowing) are stored once and referenced by
    name. Rulesets built from a pattern vocabulary produce thousands of
    validator DFAs that are identical up to the byte->class remap — the
    class-indexed transition tables collapse to one stored copy each
    (reference analogue: engine dedupe/merge, rose_build_merge.cpp)."""

    def __init__(self) -> None:
        import hashlib

        self._sha = hashlib.sha1
        self.arrays: Dict[str, np.ndarray] = {}
        self._names: Dict[bytes, str] = {}

    def put(self, arr: np.ndarray) -> list:
        """Store (deduplicated); returns a JSON-able [name, dtype] ref."""
        arr = np.ascontiguousarray(arr)
        small = _narrow_array(arr)
        key = self._sha(
            small.dtype.str.encode()
            + repr(small.shape).encode()
            + small.tobytes()
        ).digest()
        name = self._names.get(key)
        if name is None:
            name = f"a{len(self.arrays)}"
            self._names[key] = name
            self.arrays[name] = small
        return [name, arr.dtype.str]


class _MemoZip:
    """Memoizing view over an npz handle: content-addressed references
    alias heavily (thousands of validators share dozens of arrays), and
    np.load decompresses on every access — cache each name once."""

    def __init__(self, z):
        self._z = z
        self._cache: Dict[str, np.ndarray] = {}

    def __getitem__(self, name: str) -> np.ndarray:
        a = self._cache.get(name)
        if a is None:
            a = self._z[name]
            self._cache[name] = a
        return a


def _ref_get(z, ref, legacy_name: str) -> np.ndarray:
    """Load an array by [name, dtype] ref (or a legacy per-field name)."""
    if ref is None:
        return z[legacy_name]
    name, dt = ref
    a = z[name]
    return a.astype(dt) if a.dtype.str != dt else a
PLATFORM = "tpu-generic"  # compile-side family tag; reference: hs_platform_info


def current_target() -> dict:
    """The execution target recorded into serialized databases
    (reference: target_to_platform, src/compiler/compiler.cpp:456 — tune
    family + features; here the XLA backend + device generation)."""
    try:
        import jax

        devs = jax.devices()
        if devs:
            return {"backend": devs[0].platform,
                    "device_kind": devs[0].device_kind}
    except Exception:
        pass
    return {"backend": "none", "device_kind": "generic"}


def check_target(recorded: dict) -> None:
    """Deserialization-side target validation (reference:
    db_check_platform, src/database.c:115). The reference rejects
    incompatible microarchitectures because its bytecode embeds
    arch-specific programs; this format's tables are backend-portable
    numpy, so the recorded target is informational (exposed through
    serialized_database_info / database_info) and only the format-family
    `platform` string is load-bearing."""
    return


@dataclasses.dataclass
class PatternInfo:
    """Per-expression report metadata (reference: src/util/report.h Report:
    onmatch id, dedupe, exhaustion, min/max offset bounds)."""

    external_id: int
    flags: int
    min_offset: int = 0
    max_offset: int = UNBOUNDED
    min_length: int = 0  # ext param: minimum match length (0 = off)
    min_width: int = 0
    max_width: Optional[int] = None  # None = unbounded
    # logical-combination AST in jsonable form (reference: CombInfo,
    # src/rose/rose_internal.h + parseLogicalCombination); None for
    # ordinary patterns
    combination: Optional[list] = None
    # the pattern has EOD-anchored accepts ($-reachable): streaming SOM
    # must defer boundary-offset reports until close can min-merge the
    # EOD matches' (possibly earlier) leftmost starts
    eod_capable: bool = False


@dataclasses.dataclass
class DfaEngine:
    """One scanning DFA covering a subset of the expressions."""

    byte_to_class: np.ndarray  # [256] int32
    trans: np.ndarray  # [S, C] int32
    start_state: int
    float_state: int  # pure-floating rest state (mid-buffer entry)
    # max match width over the engine's patterns; None = unbounded. A
    # bounded engine has bounded scan memory, enabling exact chunk-halo
    # parallel scanning (ops/dfa_kernel.py)
    max_depth: "Optional[int]"
    accept_id: np.ndarray  # [S] int32
    accept_eod_id: np.ndarray  # [S] int32
    # accept-set expansion: set k covers reports
    # set_offsets[k] : set_offsets[k+1] in (set_exprs, set_adjusts)
    set_offsets: np.ndarray  # [num_sets+1] int32
    set_exprs: np.ndarray  # [total] int32 (expression indices)
    set_adjusts: np.ndarray  # [total] int32
    # empty-match reports: (anchored, eod, adjust, expr)
    start_reports: List[Tuple[bool, bool, int, int]]
    # partial-determinization extras (lazy-DFA core for the speculative
    # device scan of blown-up NFAs): absorbing unknown-subset sink and
    # per-state NFA position masks (uint64 words). None = exact DFA.
    sink_state: "Optional[int]" = None
    state_masks: "Optional[np.ndarray]" = None

    @property
    def num_states(self) -> int:
        return int(self.trans.shape[0])

    @classmethod
    def from_scan_dfa(cls, d: ScanDFA, max_depth: "Optional[int]" = None) -> "DfaEngine":
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
            float_state=int(d.float_state),
            max_depth=max_depth,
            accept_id=d.accept_id.astype(np.int32),
            accept_eod_id=d.accept_eod_id.astype(np.int32),
            set_offsets=np.asarray(offsets, dtype=np.int32),
            set_exprs=np.asarray(exprs, dtype=np.int32),
            set_adjusts=np.asarray(adjusts, dtype=np.int32),
            start_reports=list(d.start_reports),
            sink_state=d.sink_state,
            state_masks=d.state_masks,
        )

    def expand_set(self, set_id: int) -> List[Tuple[int, int]]:
        lo, hi = int(self.set_offsets[set_id]), int(self.set_offsets[set_id + 1])
        return [
            (int(self.set_exprs[i]), int(self.set_adjusts[i])) for i in range(lo, hi)
        ]

    def eod_set(self, state: int) -> int:
        """EOD accept set id for `state` (uniform interface with
        NfaEngine, whose states are position bitmasks)."""
        return int(self.accept_eod_id[int(state)])

    def eids(self) -> frozenset:
        """Every expression index this engine can report (accepts + EOD
        accepts + empty-match start reports); used by the block
        orchestrator's literal-prefilter gating."""
        out = set(int(e) for e in self.set_exprs)
        out |= {int(e) for (_a, _eod, _adj, e) in self.start_reports}
        return frozenset(out)


@dataclasses.dataclass
class NfaEngine:
    """Bit-parallel NFA engine for subset-construction blowups — the
    LimEx analogue (reference: src/nfa/limex_internal.h:71-160, selected
    by src/nfagraph/ng_limex.cpp when determinization is infeasible).

    State = one bit per Glushkov position, carried as a Python int
    ``mask | (is_start << P)``. Accept hits carry a *bitmask* over accept
    set ids (bit g-1 = set id g active), so ``expand_set`` takes a mask
    where DfaEngine takes a single id — the record plumbing is shared.
    """

    byte_to_class: np.ndarray  # [256] int32
    class_reach: np.ndarray  # [C, P] bool
    follow: np.ndarray  # [P, P] bool
    float_mask: np.ndarray  # [P] bool
    anch_mask: np.ndarray  # [P] bool
    accept_gid: np.ndarray  # [P] int32 (0 = none)
    accept_eod_gid: np.ndarray  # [P] int32
    set_offsets: np.ndarray  # [num_sets+1] int32
    set_exprs: np.ndarray  # [total] int32
    set_adjusts: np.ndarray  # [total] int32
    start_reports: List[Tuple[bool, bool, int, int]]
    max_depth: Optional[int]  # bounded match width or None
    acyclic: bool
    topo_order: np.ndarray  # [P] int32 evaluation order when acyclic
    # lazy-DFA core over the reachable subset space (partial
    # determinization with a sink): lets cyclic engines scan on device
    # speculatively, with sink-touched chunks rescanned exactly on host
    # (reference analogue: SIMD LimEx execution, limex_runtime_impl.h)
    spec_dfa: "Optional[DfaEngine]" = None

    @property
    def num_positions(self) -> int:
        return int(self.follow.shape[0])

    @property
    def num_sets(self) -> int:
        return int(self.set_offsets.shape[0]) - 1

    @property
    def start_state(self) -> int:
        return 1 << self.num_positions  # empty mask + anchored context

    @property
    def float_state(self) -> int:
        return 0

    @property
    def num_states(self) -> int:
        return self.num_positions  # diagnostic: state bits, not subsets

    @classmethod
    def from_bitnfa(cls, nfa, max_depth: Optional[int]) -> "NfaEngine":
        offsets = [0]
        exprs: List[int] = []
        adjusts: List[int] = []
        for s in nfa.accept_sets:
            for (eid, adj) in sorted(s):
                exprs.append(eid)
                adjusts.append(adj)
            offsets.append(len(exprs))
        return cls(
            byte_to_class=nfa.byte_to_class.astype(np.int32),
            class_reach=nfa.class_reach,
            follow=nfa.follow,
            float_mask=nfa.float_mask,
            anch_mask=nfa.anch_mask,
            accept_gid=nfa.accept_gid,
            accept_eod_gid=nfa.accept_eod_gid,
            set_offsets=np.asarray(offsets, dtype=np.int32),
            set_exprs=np.asarray(exprs, dtype=np.int32),
            set_adjusts=np.asarray(adjusts, dtype=np.int32),
            start_reports=list(nfa.start_reports),
            max_depth=max_depth,
            acyclic=bool(nfa.acyclic),
            topo_order=nfa.topo_order.astype(np.int32),
        )

    def expand_set(self, bits: int) -> List[Tuple[int, int]]:
        """Union of report sets named by the bitmask (bit g-1 = set g)."""
        out: set = set()
        bits = int(bits)
        while bits:
            low = bits & (-bits)
            g = low.bit_length()  # bit index + 1 = set id
            lo, hi = int(self.set_offsets[g]), int(self.set_offsets[g + 1])
            for i in range(lo, hi):
                out.add((int(self.set_exprs[i]), int(self.set_adjusts[i])))
            bits ^= low
        return sorted(out)

    def eids(self) -> frozenset:
        """Every expression index this engine can report (see
        DfaEngine.eids)."""
        out = set(int(e) for e in self.set_exprs)
        out |= {int(e) for (_a, _eod, _adj, e) in self.start_reports}
        return frozenset(out)

    def eod_set(self, state: int) -> int:
        """Bitmask of EOD accept sets active in `state`."""
        mask = int(state) & ((1 << self.num_positions) - 1)
        bits = 0
        while mask:
            low = mask & (-mask)
            p = low.bit_length() - 1
            g = int(self.accept_eod_gid[p])
            if g:
                bits |= 1 << (g - 1)
            mask ^= low
        return bits


@dataclasses.dataclass
class LbrEngine:
    """Large-bounded-repeat engine — `X{n,m}` patterns as a run-length
    counter instead of n expanded positions (reference: src/nfa/lbr.c +
    repeat models, src/nfa/repeat_internal.h:50-91).

    Match-end semantics of a floating `X{n,m}`: offset e matches iff the
    run of class-X bytes ending at e has length >= n (any n-length
    sub-run ends there); m never affects the end set. State carried
    across stream writes is the current run length (one int — the O(1)
    repeat state the reference's ring/counter models exist for).
    """

    class_bits: np.ndarray  # [256] bool
    lo: int
    hi: Optional[int]
    eidx: int  # expression index reported
    max_depth: Optional[int] = None  # scans host-vectorized; no halo path
    start_reports: List[Tuple[bool, bool, int, int]] = dataclasses.field(
        default_factory=list
    )

    @property
    def start_state(self) -> int:
        return 0  # run length so far

    @property
    def float_state(self) -> int:
        return 0

    @property
    def num_states(self) -> int:
        return 1

    def expand_set(self, _sid: int) -> List[Tuple[int, int]]:
        return [(self.eidx, 0)]

    def eod_set(self, _state: int) -> int:
        return 0

    def scan_runs(self, data: np.ndarray, lengths: np.ndarray,
                  init_runs) -> Tuple[List[np.ndarray], List[int]]:
        """Vectorized run-length scan of a [B, L] batch.

        Returns (per-row arrays of matching byte indices t — report
        to = t + 1 — and final run lengths)."""
        B, L = data.shape
        hits: List[np.ndarray] = []
        finals: List[int] = []
        inc = self.class_bits
        for b in range(B):
            n = int(lengths[b])
            row = data[b, :n]
            good = inc[row]
            if n == 0:
                hits.append(np.zeros(0, dtype=np.int64))
                finals.append(int(init_runs[b]))
                continue
            idx = np.arange(n, dtype=np.int64)
            lastbad = np.maximum.accumulate(np.where(~good, idx, -1))
            run = idx - lastbad
            # carried prefix run extends runs that start at offset 0
            carry = int(init_runs[b])
            if carry:
                run = np.where(lastbad == -1, run + carry, run)
            hits.append(np.flatnonzero(run >= self.lo).astype(np.int64))
            finals.append(int(run[-1]))
        return hits, finals


@dataclasses.dataclass
class SomEngine(NfaEngine):
    """Bit-NFA with leftmost-start (SOM) registers — the Gough analogue
    (reference: src/nfa/gough.c SOM register file, src/som/slot_manager;
    selected for SOM_LEFTMOST / min_length patterns without a literal
    route). Each active position carries the minimum start offset of any
    run reaching it; accepts report that register as `from`.

    State: ``(mask | (is_start << P), soms)`` where `soms` is a tuple of
    absolute start offsets for the set bits of `mask` in ascending bit
    order.
    """

    # positions that consume the byte BEFORE the match start (\\b / ^m
    # context hops): their entry start is offset+1
    hop_mask: np.ndarray = None

    @property
    def start_state(self):
        return (1 << self.num_positions, ())

    @property
    def float_state(self):
        return (0, ())

    def eod_reports(self, state) -> List[Tuple[int, int, int]]:
        """[(eid, adj, frm)] for EOD accepts active in `state`."""
        mask, soms = state
        mask = int(mask) & ((1 << self.num_positions) - 1)
        out = []
        si = 0
        m = mask
        while m:
            low = m & (-m)
            p = low.bit_length() - 1
            g = int(self.accept_eod_gid[p])
            if g:
                for i in range(int(self.set_offsets[g]),
                               int(self.set_offsets[g + 1])):
                    out.append((int(self.set_exprs[i]),
                                int(self.set_adjusts[i]), int(soms[si])))
            si += 1
            m ^= low
        return out


@dataclasses.dataclass
class ChainRole:
    """One chain segment (reference: a Rose role, rose_graph.h)."""

    fwd: DfaEngine  # segment scanning DFA (reports segment-match ends)
    rev: Optional[DfaEngine]  # reverse DFA (segment starts); None = role 0


@dataclasses.dataclass
class ChainInfo:
    """A multi-segment decomposition `SEG0 <gap> SEG1 <gap> ... SEGn`
    (reference: Rose prefix→infix→suffix role graphs built by doViolet,
    ng_violet.cpp:3053; infixes restricted to single-class repeats).

    Roles resolve left to right: role r's matches connect to role r-1's
    ends through gap r-1 (class/length constrained); the final role's
    connected ends are the pattern's match ends."""

    roles: List[ChainRole]
    gap_bits: np.ndarray  # [R-1+lead+trail, 256] bool — per-gap class
    # (leading gap first when present, trailing gap last when present)
    gap_lo: List[int]
    gap_hi: List[Optional[int]]  # None = unbounded
    # leading gap before role 0: match requires a gap-class run of
    # length in [lo, hi] immediately before the role-0 start (Castle
    # prefix analogue). Stored as an index into gap_bits, or None.
    lead: Optional[Tuple[int, int, Optional[int]]] = None  # (gidx, lo, hi)
    # trailing gap after the last role: every offset the gap-class run
    # covers in [lo, hi] past a final-role end is a match end (MPV puff
    # analogue, dense ends emitted as ranges)
    trail: Optional[Tuple[int, int, Optional[int]]] = None
    # general (non-single-class) gaps: boundary index -> bit-parallel
    # infix NFA (reference: LeftEngInfo infix engines, rose_graph.h:140);
    # joins validate by forward injection scan (block mode)
    infix: Dict[int, "InfixSpec"] = dataclasses.field(default_factory=dict)

    @property
    def num_roles(self) -> int:
        return len(self.roles)


@dataclasses.dataclass
class LiteralEngine:
    """Teddy prefilter + confirm tables + per-pattern window validators.

    Reference analogue: the HWLM floating matcher + FDRConfirm + the Rose
    literal programs (src/hwlm, src/fdr/fdr_confirm.h,
    src/rose/rose_build_matchers.cpp), re-architected as
    device-filter → host-confirm → bounded-window DFA validation.
    """

    masks: np.ndarray  # [M, W, 256] int32 (teddy tables)
    factor_atoms: List[Tuple[Tuple[int, int], ...]]  # fid -> ((value,mask)..)
    bucket_factors: List[List[int]]  # bucket -> factor ids
    # fid -> [(pattern_idx, max_start_to_fend, max_fend_to_end, kind)]
    # kind: "equiv" (factor == whole match), "win" (window validation),
    # "c<r>" (chain role r; reference: Rose literal roles)
    factor_refs: List[List[Tuple[int, int, int, str]]]
    validators: Dict[int, DfaEngine]  # pattern_idx -> window DFA
    # SOM back-scan DFAs (reference: ng_som reverse NFAs): pattern_idx ->
    # (reverse-from-accepts, reverse-from-EOD-accepts); either may be None
    rev_validators: Dict[int, Tuple[Optional[DfaEngine], Optional[DfaEngine]]] = (
        dataclasses.field(default_factory=dict)
    )
    chains: Dict[int, ChainInfo] = dataclasses.field(default_factory=dict)
    # [M, 1, 256] int32 single-word gate tables for the two-stage device
    # filter (compiler.teddy.build_gate_masks), or None when gating does
    # not pay (W < 2, or the hot/cold split is too leaky)
    gate_masks: Optional[np.ndarray] = None
    # factor-anchored validation (kind "a<idx>" refs): a confirmed factor
    # inside the pattern's FIXED HEAD pins the match start exactly, so
    # validation is (head byte checks) + (a suffix DFA anchored at the
    # head end) — suffix automata are SHARED across vocabulary families
    # where whole-pattern validators differ per literal spelling
    # (reference analogue: Rose zero-lag left context + suffix engines,
    # src/rose/rose_graph.h). Entries:
    # (eidx, d, head_len, ((off_from_start, value, mask), ...), svid,
    #  sfx_maxw) with svid = -1 for an empty suffix (pure fixed pattern)
    anchored_refs: List[Tuple] = dataclasses.field(default_factory=list)
    sfx_validators: List[DfaEngine] = dataclasses.field(
        default_factory=list)

    @property
    def num_factors(self) -> int:
        return len(self.factor_atoms)


@dataclasses.dataclass
class Database:
    mode: int
    patterns: List[PatternInfo]
    engines: List[DfaEngine]
    lit: Optional[LiteralEngine] = None
    # execution target this database was serialized on (informational;
    # reference: hs_platform_info in the serialized header)
    target: Optional[dict] = None
    # total batch bytes below which scanning stays on host (grey
    # tunable; the dispatch-latency/host-rate crossover is deployment
    # dependent — a dev tunnel pays ~100ms per dispatch, PCIe ~2ms)
    host_scan_limit: int = 1 << 17

    # -- introspection (reference: hs_database_info, src/database.c) --------
    def info(self) -> str:
        ver = ".".join(map(str, DB_VERSION))
        tgt = self.target or current_target()
        return (f"Version: {ver} Features: {PLATFORM} Mode: {self.mode} "
                f"Target: {tgt.get('backend')}/{tgt.get('device_kind')}")

    def size(self) -> int:
        return len(self.serialize())

    @property
    def num_patterns(self) -> int:
        return len(self.patterns)

    def state_count(self) -> int:
        return sum(e.num_states for e in self.engines)

    def som_eids(self) -> frozenset:
        """Expression indices with SOM_LEFTMOST (cached): their vacuous
        range records have from == to and never dominate array records."""
        if not hasattr(self, "_som_eids"):
            self._som_eids = frozenset(
                i for i, p in enumerate(self.patterns)
                if p.flags & HS_FLAG_SOM_LEFTMOST
            )
        return self._som_eids

    def som_eod_eids(self) -> frozenset:
        """SOM patterns with EOD-anchored accepts: a close-time match
        can end at the final write boundary with an EARLIER leftmost
        start than the record already known there, so streaming defers
        boundary-offset reports for these until the next write or close
        (where _eod_pass min-merges the starts)."""
        if not hasattr(self, "_som_eod_eids"):
            self._som_eod_eids = frozenset(
                i for i, p in enumerate(self.patterns)
                if (p.flags & HS_FLAG_SOM_LEFTMOST) and p.eod_capable
            )
        return self._som_eod_eids

    def combos(self) -> List[Tuple[int, object, frozenset]]:
        """[(pattern_idx, ast, referenced external ids)] for combination
        patterns (cached; reference: CombInfo map)."""
        if not hasattr(self, "_combo_cache"):
            from .compiler.logical import from_jsonable, referenced_ids

            out = []
            for i, p in enumerate(self.patterns):
                if p.combination is not None:
                    ast = from_jsonable(p.combination)
                    out.append((i, ast, frozenset(referenced_ids(ast))))
            self._combo_cache = out
        return self._combo_cache

    # -- serialization (reference: src/database.c:62,200) -------------------
    #
    # Arrays are stored content-addressed: structurally identical tables
    # (byte-identical content after dtype narrowing) are written once and
    # referenced by name. Rulesets built from a pattern vocabulary
    # produce thousands of isomorphic window-validator DFAs whose
    # transition tables are identical up to the byte->class remap — the
    # store collapses them (reference analogue: leftfix/suffix dedupe and
    # merging across patterns, src/rose/rose_build_merge.cpp).
    _ENGINE_ARRAYS = (
        "byte_to_class",
        "trans",
        "accept_id",
        "accept_eod_id",
        "set_offsets",
        "set_exprs",
        "set_adjusts",
    )
    _NFA_ENGINE_ARRAYS = (
        "byte_to_class",
        "class_reach",
        "follow",
        "float_mask",
        "anch_mask",
        "accept_gid",
        "accept_eod_gid",
        "set_offsets",
        "set_exprs",
        "set_adjusts",
        "topo_order",
    )

    @classmethod
    def _pack_engine(cls, e, store: "_ArrayStore") -> dict:
        if isinstance(e, LbrEngine):
            return {
                "kind": "lbr",
                "arrs": {"class_bits": store.put(e.class_bits)},
                "lo": e.lo,
                "hi": e.hi,
                "eidx": e.eidx,
                "start_reports": e.start_reports,
            }
        if isinstance(e, NfaEngine):
            names = list(cls._NFA_ENGINE_ARRAYS)
            if isinstance(e, SomEngine):
                names.append("hop_mask")
            return {
                "kind": "som" if isinstance(e, SomEngine) else "nfa",
                "arrs": {n: store.put(getattr(e, n)) for n in names},
                "max_depth": e.max_depth,
                "acyclic": e.acyclic,
                "start_reports": e.start_reports,
                "spec_dfa": (cls._pack_engine(e.spec_dfa, store)
                             if e.spec_dfa is not None else None),
            }
        meta = {
            "arrs": {n: store.put(getattr(e, n))
                     for n in cls._ENGINE_ARRAYS},
            "start_state": e.start_state,
            "float_state": e.float_state,
            "max_depth": e.max_depth,
            "start_reports": e.start_reports,
        }
        if e.sink_state is not None:
            meta["sink_state"] = int(e.sink_state)
        if e.state_masks is not None:
            meta["arrs"]["state_masks"] = store.put(e.state_masks)
        return meta

    @classmethod
    def _unpack_engine(cls, em: dict, prefix: str, z):
        md = em.get("max_depth")
        refs = em.get("arrs", {})

        def arr(name):
            return _ref_get(z, refs.get(name), f"{prefix}_{name}")

        if em.get("kind") == "lbr":
            return LbrEngine(
                class_bits=arr("class_bits"),
                lo=int(em["lo"]),
                hi=None if em["hi"] is None else int(em["hi"]),
                eidx=int(em["eidx"]),
                start_reports=[tuple(r) for r in em["start_reports"]],
            )
        if em.get("kind") in ("nfa", "som"):
            kw = {name: arr(name) for name in cls._NFA_ENGINE_ARRAYS}
            if em["kind"] == "som":
                return SomEngine(
                    max_depth=None if md is None else int(md),
                    acyclic=bool(em["acyclic"]),
                    start_reports=[tuple(r) for r in em["start_reports"]],
                    hop_mask=arr("hop_mask"),
                    **kw,
                )
            return NfaEngine(
                max_depth=None if md is None else int(md),
                acyclic=bool(em["acyclic"]),
                start_reports=[tuple(r) for r in em["start_reports"]],
                spec_dfa=(cls._unpack_engine(em["spec_dfa"], prefix, z)
                          if em.get("spec_dfa") else None),
                **kw,
            )
        kw = {name: arr(name) for name in cls._ENGINE_ARRAYS}
        sink = em.get("sink_state")
        return DfaEngine(
            start_state=int(em["start_state"]),
            float_state=int(em.get("float_state", 0)),
            max_depth=None if md is None else int(md),
            start_reports=[tuple(r) for r in em["start_reports"]],
            sink_state=None if sink is None else int(sink),
            state_masks=(arr("state_masks")
                         if "state_masks" in refs else None),
            **kw,
        )

    def serialize(self) -> bytes:
        store = _ArrayStore()
        meta = {
            "version": DB_VERSION,
            "platform": PLATFORM,
            "target": self.target or current_target(),
            "mode": self.mode,
            "host_scan_limit": self.host_scan_limit,
            "patterns": [dataclasses.asdict(p) for p in self.patterns],
            "engines": [],
        }
        for e in self.engines:
            meta["engines"].append(self._pack_engine(e, store))
        if self.lit is not None:
            rv_meta = {}
            for k, (ra, re) in self.lit.rev_validators.items():
                rv_meta[str(k)] = [
                    self._pack_engine(ra, store) if ra else None,
                    self._pack_engine(re, store) if re else None,
                ]
            ch_meta = {}
            for k, ch in self.lit.chains.items():
                ch_meta[str(k)] = {
                    "gap_ref": store.put(ch.gap_bits),
                    "gap_lo": ch.gap_lo,
                    "gap_hi": ch.gap_hi,
                    "lead": list(ch.lead) if ch.lead else None,
                    "trail": list(ch.trail) if ch.trail else None,
                    "infix": {
                        str(gi): {
                            "reach": store.put(inf.reach),
                            "follow": store.put(inf.follow),
                            "chunk_or": store.put(inf.chunk_or),
                            "start": int(inf.start),
                            "accept": int(inf.accept),
                            "nullable": inf.nullable,
                        }
                        for gi, inf in ch.infix.items()
                    },
                    "roles": [
                        {
                            "fwd": self._pack_engine(r.fwd, store),
                            "rev": (
                                self._pack_engine(r.rev, store)
                                if r.rev is not None else None
                            ),
                        }
                        for r in ch.roles
                    ],
                }
            meta["lit"] = {
                "masks_ref": store.put(self.lit.masks),
                **(
                    {"gate_masks_ref": store.put(self.lit.gate_masks)}
                    if self.lit.gate_masks is not None else {}
                ),
                "factor_atoms": [
                    [list(a) for a in atoms] for atoms in self.lit.factor_atoms
                ],
                "bucket_factors": self.lit.bucket_factors,
                "factor_refs": self.lit.factor_refs,
                "validators": {
                    str(k): self._pack_engine(v, store)
                    for k, v in self.lit.validators.items()
                },
                "rev_validators": rv_meta,
                "chains": ch_meta,
                "anchored_refs": [
                    [int(e), int(d), int(h),
                     [[int(j), int(v), int(m)] for (j, v, m) in prefix],
                     int(svid), int(sw)]
                    for (e, d, h, prefix, svid, sw)
                    in self.lit.anchored_refs
                ],
                "sfx_validators": [
                    self._pack_engine(v, store)
                    for v in self.lit.sfx_validators
                ],
            }
        buf = io.BytesIO()
        np.savez_compressed(
            buf,
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
            **store.arrays,
        )
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
        with np.load(io.BytesIO(payload)) as zf:
            z = _MemoZip(zf)
            meta = json.loads(bytes(z["meta"]).decode())
            if tuple(meta["version"])[:2] != DB_VERSION[:2]:
                raise DbVersionError(
                    f"database version {meta['version']} incompatible"
                )
            if meta["platform"] != PLATFORM:
                raise DbPlatformError(
                    f"database built for platform {meta['platform']}"
                )
            check_target(meta.get("target", {}))
            patterns = [PatternInfo(**p) for p in meta["patterns"]]
            engines = [
                cls._unpack_engine(em, f"e{i}", z)
                for i, em in enumerate(meta["engines"])
            ]
            lit = None
            if "lit" in meta:
                lm = meta["lit"]
                lit = LiteralEngine(
                    masks=_ref_get(z, lm.get("masks_ref"), "lit_masks"),
                    gate_masks=(
                        _ref_get(z, lm["gate_masks_ref"], "lit_gate_masks")
                        if "gate_masks_ref" in lm else None
                    ),
                    factor_atoms=[
                        tuple(tuple(a) for a in atoms)
                        for atoms in lm["factor_atoms"]
                    ],
                    bucket_factors=[list(b) for b in lm["bucket_factors"]],
                    factor_refs=[
                        [tuple(r) for r in refs] for refs in lm["factor_refs"]
                    ],
                    validators={
                        int(k): cls._unpack_engine(vm, f"v{k}", z)
                        for k, vm in lm["validators"].items()
                    },
                    rev_validators={
                        int(k): (
                            cls._unpack_engine(ra, f"ra{k}", z) if ra else None,
                            cls._unpack_engine(re, f"re{k}", z) if re else None,
                        )
                        for k, (ra, re) in lm.get("rev_validators", {}).items()
                    },
                    anchored_refs=[
                        (int(e), int(d), int(h),
                         tuple((int(j), int(v), int(m))
                               for (j, v, m) in prefix),
                         int(svid), int(sw))
                        for (e, d, h, prefix, svid, sw)
                        in lm.get("anchored_refs", [])
                    ],
                    sfx_validators=[
                        cls._unpack_engine(vm, f"sx{k}", z)
                        for k, vm in enumerate(lm.get("sfx_validators", []))
                    ],
                    chains={
                        int(k): ChainInfo(
                            gap_bits=_ref_get(z, cm.get("gap_ref"),
                                              f"chg{k}"),
                            gap_lo=[int(v) for v in cm["gap_lo"]],
                            gap_hi=list(cm["gap_hi"]),
                            lead=(tuple(cm["lead"])
                                  if cm.get("lead") else None),
                            trail=(tuple(cm["trail"])
                                   if cm.get("trail") else None),
                            infix={
                                int(gi): _InfixSpec(
                                    reach=_ref_get(z, im["reach"], ""),
                                    follow=_ref_get(z, im["follow"], ""),
                                    chunk_or=_ref_get(
                                        z, im["chunk_or"], ""),
                                    start=int(im["start"]),
                                    accept=int(im["accept"]),
                                    nullable=bool(im["nullable"]),
                                )
                                for gi, im in cm.get("infix", {}).items()
                            },
                            roles=[
                                ChainRole(
                                    fwd=cls._unpack_engine(
                                        rm["fwd"], f"c{k}r{ri}f", z),
                                    rev=(
                                        cls._unpack_engine(
                                            rm["rev"], f"c{k}r{ri}r", z)
                                        if rm["rev"] is not None else None
                                    ),
                                )
                                for ri, rm in enumerate(cm["roles"])
                            ],
                        )
                        for k, cm in lm.get("chains", {}).items()
                    },
                )
        if lit is not None:
            # rebuild the packed validator tables up front (same policy
            # as compile: nothing lazy left for the first scan to pay)
            from .runtime.lit_runtime import _packed_validators

            _packed_validators(lit)
            _pack_native_tables(lit)
        return cls(
            mode=int(meta["mode"]), patterns=patterns, engines=engines,
            lit=lit, target=meta.get("target"),
            host_scan_limit=int(meta.get("host_scan_limit", 1 << 17)),
        )


def _has_assertion(node) -> bool:
    """True when the AST contains a word-boundary assertion (reference
    rejects these for approximate matching, ng_fuzzy.cpp; start/end
    anchors are fine — fuzzing preserves them structurally)."""
    from .compiler.ast import (
        A_NWORDB,
        A_UNWORDB,
        A_UNWORDB8,
        A_UWORDB,
        A_UWORDB8,
        A_WORDB,
        Alt as _Alt,
        Anchor as _Anchor,
        Rep as _Rep,
        Seq as _Seq,
    )

    if isinstance(node, _Anchor):
        return node.kind in (A_WORDB, A_NWORDB, A_UWORDB, A_UNWORDB,
                             A_UWORDB8, A_UNWORDB8)
    if isinstance(node, (_Seq, _Alt)):
        return any(_has_assertion(c) for c in node.children)
    if isinstance(node, _Rep):
        return _has_assertion(node.child)
    return False


def _nfa_is_dead(g: NFAGraph) -> bool:
    """True when no accept is reachable: unsatisfiable assertion chains
    (^\\Bfoo) or empty classes ([^\\x00-\\xff]) yield a position NFA with
    no path to an accept (reference: 'Pattern can never match',
    unit/hyperscan/bad_patterns.txt:56-71)."""
    if g.start_accepts:
        return False
    live = {p for p in range(g.num_positions) if g.reach[p].any()}
    frontier = (set(g.anchored_first) | set(g.float_first)) & live
    seen = set(frontier)
    while frontier:
        nxt = set()
        for p in frontier:
            if p in g.accept or p in g.accept_eod:
                return False
            for q in g.follow[p]:
                if q in live and q not in seen:
                    seen.add(q)
                    nxt.add(q)
        frontier = nxt
    return True


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
    # DAG: longest path over an iterative reverse-finish-order topo sort
    # (deep repeats like X{1000} would blow Python's recursion limit)
    order: List[int] = []
    color2 = [0] * P

    def topo(u: int) -> None:
        stack = [(u, iter(g.follow[u]))]
        color2[u] = 1
        while stack:
            node, it = stack[-1]
            advanced = False
            for v in it:
                if color2[v] == 0:
                    color2[v] = 1
                    stack.append((v, iter(g.follow[v])))
                    advanced = True
                    break
            if not advanced:
                order.append(node)
                stack.pop()

    starts = g.anchored_first | g.float_first
    for v in starts:
        if color2[v] == 0:
            topo(v)
    longest = [1] * P
    for u in order:  # children finish before parents
        for v in g.follow[u]:
            if 1 + longest[v] > longest[u]:
                longest[u] = 1 + longest[v]
    max_w = max((longest[v] for v in starts), default=0)
    return (0 if min_w == INF else min_w), max_w


_IVF = 1 << 30  # "unbounded" sentinel for interval arithmetic


def _match_intervals(g: NFAGraph) -> List[Tuple[int, int, int, int]]:
    """Per-accept (len_lo, len_hi, end_lo, end_hi) intervals describing the
    *matches themselves*: assertion-context hop bytes and report adjusts
    are discounted, unlike `_nfa_widths`' raw path widths. `end_*` bounds
    the match end offset (end_hi = _IVF when the accept is reachable from
    a floating start or through a cycle). Used for extended-parameter
    satisfiability, mirroring the reference's per-report width analysis
    (src/nfagraph/ng_extparam.cpp, src/nfagraph/ng_width.cpp)."""
    P = g.num_positions
    starts = g.anchored_first | g.float_first
    # shortest distances: raw path bytes (end offsets for anchored paths)
    # and hop-discounted match lengths. Unit edge weights, but the length
    # metric has per-start init 1 - hop, so relax with a worklist.
    from collections import deque

    raw_lo = [_IVF] * P
    len_lo = [_IVF] * P
    dq = deque()
    for p in starts:
        raw_lo[p] = 1
        len_lo[p] = min(len_lo[p], 1 - g.hop_lens.get(p, 0))
        dq.append(p)
    while dq:
        u = dq.popleft()
        for v in g.follow[u]:
            changed = False
            if raw_lo[u] + 1 < raw_lo[v]:
                raw_lo[v] = raw_lo[u] + 1
                changed = True
            if len_lo[u] + 1 < len_lo[v]:
                len_lo[v] = len_lo[u] + 1
                changed = True
            if changed:
                dq.append(v)
    # positions on (start-reachable) cycles, then their forward closure,
    # have unbounded max distance; the rest form a DAG for longest path
    reach = [p for p in range(P) if raw_lo[p] < _IVF]
    # Tarjan SCC (iterative) over reachable positions
    index = {}
    low = {}
    on_stack = set()
    scc_stack: List[int] = []
    cyclic: Set[int] = set()
    counter = [0]
    for root in reach:
        if root in index:
            continue
        work = [(root, iter(g.follow[root]))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        scc_stack.append(root)
        on_stack.add(root)
        while work:
            node, it = work[-1]
            advanced = False
            for w in it:
                if raw_lo[w] >= _IVF:
                    continue
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    scc_stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(g.follow[w])))
                    advanced = True
                    break
                elif w in on_stack:
                    low[node] = min(low[node], index[w])
            if not advanced:
                work.pop()
                if work:
                    parent = work[-1][0]
                    low[parent] = min(low[parent], low[node])
                if low[node] == index[node]:
                    comp = []
                    while True:
                        w = scc_stack.pop()
                        on_stack.discard(w)
                        comp.append(w)
                        if w == node:
                            break
                    if len(comp) > 1 or node in g.follow[node]:
                        cyclic.update(comp)
    unbounded = set(cyclic)
    dq = deque(cyclic)
    while dq:
        u = dq.popleft()
        for v in g.follow[u]:
            if v not in unbounded and raw_lo[v] < _IVF:
                unbounded.add(v)
                dq.append(v)
    # longest path over the bounded (DAG) portion
    raw_hi = [0] * P
    len_hi = [0] * P
    bounded = [p for p in reach if p not in unbounded]
    indeg = {p: 0 for p in bounded}
    for u in bounded:
        for v in g.follow[u]:
            if v in indeg:
                indeg[v] += 1
    for p in bounded:
        raw_hi[p] = 1 if p in starts else -_IVF
        len_hi[p] = (1 - g.hop_lens.get(p, 0)) if p in starts else -_IVF
    dq = deque(p for p in bounded if indeg[p] == 0)
    while dq:
        u = dq.popleft()
        for v in g.follow[u]:
            if v not in indeg:
                continue
            if raw_hi[u] + 1 > raw_hi[v]:
                raw_hi[v] = raw_hi[u] + 1
            if len_hi[u] + 1 > len_hi[v]:
                len_hi[v] = len_hi[u] + 1
            indeg[v] -= 1
            if indeg[v] == 0:
                dq.append(v)
    # accepts reachable from a floating start have unbounded end offsets
    float_reach: Set[int] = set(g.float_first)
    dq = deque(float_reach)
    while dq:
        u = dq.popleft()
        for v in g.follow[u]:
            if v not in float_reach:
                float_reach.add(v)
                dq.append(v)
    out: List[Tuple[int, int, int, int]] = []
    for accepts in (g.accept, g.accept_eod):
        for v, adjs in accepts.items():
            if raw_lo[v] >= _IVF:
                continue
            unb = v in unbounded
            for a in adjs:
                llo = max(0, len_lo[v] + a)
                lhi = _IVF if unb else max(llo, len_hi[v] + a)
                elo = max(0, raw_lo[v] + a)
                ehi = (_IVF if (unb or v in float_reach)
                       else max(elo, raw_hi[v] + a))
                out.append((llo, lhi, elo, ehi))
    for (anch, _eod, a) in g.start_accepts:
        out.append((0, 0, max(0, a) if anch else 0,
                    max(0, a) if anch else _IVF))
    return out


def _check_ext_param_satisfiability(e, g: NFAGraph, i: int) -> None:
    """Reject ext-param combinations no match of this expression can
    satisfy (reference: ng_extparam.cpp; errors in
    unit/hyperscan/bad_patterns.txt:53-56,72,75-78)."""
    from .flags import UNBOUNDED as _UNB

    if e.max_offset != _UNB and e.min_offset > e.max_offset:
        raise CompileError(
            "min_offset must be less than or equal to max_offset", i
        )
    if e.max_offset != _UNB and e.min_length > e.max_offset:
        raise CompileError(
            "min_length must be less than or equal to max_offset", i
        )
    if not (e.min_length or e.min_offset or e.max_offset != _UNB):
        return
    mo = e.max_offset if e.max_offset != _UNB else _IVF
    ivs = _match_intervals(g)
    for (llo, lhi, elo, ehi) in ivs:
        if (max(llo, e.min_length) <= min(lhi, mo)
                and max(elo, e.min_offset) <= min(ehi, mo)):
            return  # satisfiable through this accept
    # unsatisfiable: pick the reference's message for the dominant cause
    max_len = max((lhi for (_llo, lhi, _elo, _ehi) in ivs), default=0)
    min_end = min((elo for (_llo, _lhi, elo, _ehi) in ivs), default=0)
    max_end = max((ehi for (_llo, _lhi, _elo, ehi) in ivs), default=0)
    if e.min_length and max_len < _IVF and e.min_length > max_len:
        raise CompileError(
            f"expression has min_length={e.min_length} but can only "
            f"produce matches of length {max_len} bytes at most", i
        )
    if mo < _IVF and min_end > mo:
        raise CompileError(
            f"expression has max_offset={e.max_offset} but requires "
            f"{min_end} bytes to match", i
        )
    if e.min_offset and max_end < _IVF and e.min_offset > max_end:
        raise CompileError(
            f"expression is anchored and cannot satisfy "
            f"min_offset={e.min_offset} as it can only produce "
            f"matches of length {max_end} bytes at most", i
        )
    raise CompileError(
        "extended parameter constraints can not be satisfied for any "
        "match from this expression", i
    )


# resource limits (reference analogue: Grey box tunables, src/grey.h)
VALIDATOR_MAX_STATES = 4000
MAX_WINDOW = 1024


def _has_anchor(node) -> bool:
    from .compiler.ast import Alt, Anchor, Rep, Seq

    if isinstance(node, Anchor):
        return True
    if isinstance(node, (Seq, Alt)):
        return any(_has_anchor(c) for c in node.children)
    if isinstance(node, Rep):
        return _has_anchor(node.child)
    return False


def _try_literal_route(node, g, i, grey):
    """Literal-path eligibility: (factor_infos, literal_equiv) or None.

    Eligible when a mandatory factor set exists with finite window bounds
    (reference analogue: ng_violet's decision to decompose vs. fall back
    to an outfix engine)."""
    from .compiler.literals import extract_factors

    if not grey.allow_teddy:
        return None
    fs = extract_factors(node, min_len=grey.min_factor_len)
    if fs is None:
        return None
    for fi in fs:
        if fi.max_start_to_fend is None or fi.max_fend_to_end is None:
            return None
        if fi.max_start_to_fend + fi.max_fend_to_end > grey.max_window:
            return None
    lit_equiv = (not _has_anchor(node)) and all(
        fi.min_start_to_fend == fi.max_start_to_fend == len(fi.factor)
        and fi.min_fend_to_end == fi.max_fend_to_end == 0
        for fi in fs
    )
    return fs, lit_equiv


def _try_anchored_route(node_b, g_b, fs, i, grey, dfa_cache,
                        sfx_validators, sfx_index):
    """Factor-anchored validation eligibility: every factor of `fs` lies
    inside the branch's FIXED HEAD at a fixed distance from the match
    start, and the remainder is assertion-free, non-vacuous and bounded.

    Returns a list of (fi, aref) pairs to register — aref =
    (eidx, d, head_len, ((off, value, mask)...), svid, sfx_maxw) — or
    None when the branch must stay on the whole-pattern validator.

    A confirmed factor then pins the match start exactly: validation is
    a vectorized head-byte check plus ONE anchored suffix-DFA scan from
    the head end, and the suffix automaton is structurally shared across
    the whole vocabulary family (reference analogue: Rose roles with
    zero-lag left context + suffix engines, src/rose/rose_graph.h;
    determinize_cached shares the class-indexed tables)."""
    from .compiler.ast import Empty as _Empty
    from .compiler.literals import contains_anchor, split_fixed_head

    atoms, rest = split_fixed_head(node_b)
    H = len(atoms)
    if H == 0:
        return None
    for fi in fs:
        d = fi.min_start_to_fend
        if fi.max_start_to_fend != d:
            return None
        flen = len(fi.factor)
        if d > H or d < flen:
            return None
        if tuple((a.value, a.mask) for a in atoms[d - flen: d]) \
                != fi.factor.key():
            return None
    if isinstance(rest, _Empty):
        svid, sfx_maxw = -1, 0
    else:
        if contains_anchor(rest):
            return None
        try:
            g_s = build_nfa(rest)
        except CompileError:
            return None
        if g_s.accept_eod or g_s.start_accepts or g_s.is_vacuous():
            return None
        sfx_maxw = _nfa_widths(g_s)[1]
        if sfx_maxw is None:
            return None
        # the suffix DFA must be ANCHORED at the head end: scan DFAs
        # normally re-launch floating firsts at every byte (a floating
        # hit of a WHOLE pattern is always a true match — not so for a
        # pattern fragment). Move the firsts into the anchored set so
        # determinize emits no floating restarts.
        import dataclasses as _dc

        g_s = _dc.replace(
            g_s,
            anchored_first=set(g_s.anchored_first) | set(g_s.float_first),
            float_first=set(),
        )
        try:
            eng = DfaEngine.from_scan_dfa(determinize_cached(
                g_s, i, dfa_cache,
                max_states=grey.validator_max_states))
        except DfaLimitExceeded:
            return None
        # content-dedupe the engine list ACROSS patterns: accept
        # expansion takes the expression index from the REF (the suffix
        # graph's accepts all belong to its own pattern), so the key
        # deliberately omits set_exprs — `attack7[0-9]{2,4}z` and
        # `payload123[0-9]{2,4}z` share one engine object outright
        skey = (eng.trans.tobytes(), eng.byte_to_class.tobytes(),
                eng.accept_id.tobytes(), eng.set_offsets.tobytes(),
                eng.set_adjusts.tobytes())
        svid = sfx_index.get(skey)
        if svid is None:
            svid = len(sfx_validators)
            sfx_index[skey] = svid
            sfx_validators.append(eng)
    out = []
    for fi in fs:
        d = fi.min_start_to_fend
        flen = len(fi.factor)
        prefix = tuple(
            (j, atoms[j].value, atoms[j].mask)
            for j in list(range(0, d - flen)) + list(range(d, H))
        )
        out.append((fi, (i, int(d), int(H), prefix, int(svid),
                         int(sfx_maxw))))
    return out


# engines deeper than this cannot use chunk-halo device scanning.
# The halo invariant needs d-1 <= H (floating entry re-derives the state)
# AND d <= CS (anchored matches must end inside the first chunk body);
# with H capped at 256 and H+CS = 512 that bounds d at 256.
MAX_HALO_DEPTH = 256


def _register_factor(factor_ids, factor_atoms, factor_refs, factor_objs,
                     fi, ref) -> None:
    key = fi.factor.key()
    fid = factor_ids.get(key)
    if fid is None:
        fid = len(factor_atoms)
        factor_ids[key] = fid
        factor_atoms.append(key)
        factor_refs.append([])
        factor_objs.append(fi.factor)
    factor_refs[fid].append(ref)


# at most this many distinct accept report-sets fit the bit-NFA's
# bitmask-over-sets hit encoding (int64 on the host path)
NFA_MAX_ACCEPT_SETS = 63


def _build_engines(
    nfas: List[NFAGraph], expr_idx: List[int], max_states: int,
    max_widths: Optional[List[Optional[int]]] = None,
    allow_limex: bool = True,
) -> List:
    """Partition bounded-width vs unbounded patterns into separate
    engines (bounded ones scan chunk-halo parallel on device), then
    determinize each group, splitting on state explosion (the analogue of
    Rose assigning patterns to separate engines). Single patterns that
    still blow up become bit-parallel NFA engines (the LimEx fallback,
    reference: src/nfagraph/ng_limex.cpp)."""
    if max_widths is None:
        max_widths = [None] * len(nfas)
    bounded = [
        i for i, w in enumerate(max_widths)
        if w is not None and w <= MAX_HALO_DEPTH
    ]
    unbounded = [i for i in range(len(nfas)) if i not in set(bounded)]
    out: List = []
    for group in (bounded, unbounded):
        if not group:
            continue
        out += _build_engine_group(
            [nfas[i] for i in group], [expr_idx[i] for i in group],
            [max_widths[i] for i in group], max_states, allow_limex,
        )
    return out


def _build_engine_group(
    nfas: List[NFAGraph], expr_idx: List[int],
    widths: List[Optional[int]], max_states: int, allow_limex: bool,
) -> List:
    depth = None
    if all(w is not None and w <= MAX_HALO_DEPTH for w in widths):
        depth = max(widths)
    try:
        d = determinize(nfas, expr_idx, max_states=max_states)
        return [DfaEngine.from_scan_dfa(d, max_depth=depth)]
    except DfaLimitExceeded:
        if len(nfas) == 1:
            return [_build_bitnfa_engine(
                nfas[0], expr_idx[0], widths[0], max_states, allow_limex
            )]
        mid = len(nfas) // 2
        return _build_engine_group(
            nfas[:mid], expr_idx[:mid], widths[:mid], max_states, allow_limex
        ) + _build_engine_group(
            nfas[mid:], expr_idx[mid:], widths[mid:], max_states, allow_limex
        )


def _build_bitnfa_engine(
    g: NFAGraph, eidx: int, width: Optional[int], max_states: int,
    allow_limex: bool,
) -> NfaEngine:
    """LimEx-analogue fallback when one pattern blows the DFA budget."""
    if not allow_limex:
        raise CompileError(
            f"single pattern exceeds DFA state budget ({max_states}) "
            "and the bit-NFA engine is disabled (grey allow_limex)", eidx
        )
    from .compiler.bitnfa import build_bitnfa

    nfa = build_bitnfa([g], [eidx])
    if len(nfa.accept_sets) - 1 > NFA_MAX_ACCEPT_SETS:
        raise CompileError(
            "pattern exceeds the bit-NFA accept-set limit "
            f"({NFA_MAX_ACCEPT_SETS})", eidx
        )
    eng = NfaEngine.from_bitnfa(nfa, max_depth=width)
    # lazy-DFA core: partial determinization over the most-reachable
    # subsets, with an absorbing sink for the rest — the device scans
    # this speculatively; sink-touched chunks rescan exactly on host
    # (closes the host-only gap for cyclic literal-less engines)
    try:
        d = determinize([g], [eidx], max_states=SPEC_DFA_STATES,
                        partial=True)
        eng.spec_dfa = DfaEngine.from_scan_dfa(d)
    except Exception:
        eng.spec_dfa = None  # speculation is an optimization only
    return eng


LBR_MIN_REPEAT = 32  # below this, position expansion is cheap enough
SPEC_DFA_STATES = 2048  # lazy-DFA core size for blown-up NFA engines


def detect_lbr(node) -> Optional[Tuple[np.ndarray, int, Optional[int]]]:
    """(class_bits, lo, hi) when the whole pattern is a floating
    `X{n,m}` single-class repeat with large n (reference: ng_lbr.cpp
    isLBR selection). Detected on the AST, BEFORE Glushkov expansion, so
    huge counts never materialize positions."""
    from .compiler.ast import Pos, Rep, Seq

    while isinstance(node, Seq) and len(node.children) == 1:
        node = node.children[0]
    if not (isinstance(node, Rep) and isinstance(node.child, Pos)):
        return None
    if node.child.bos or node.child.eos:
        return None
    if node.lo < LBR_MIN_REPEAT and node.hi is not None:
        # small bounded repeats expand cheaply; unbounded ones always
        # take the counter (dense match ends stay O(runs) ranges)
        return None
    return node.child.cr.bits.copy(), int(node.lo), node.hi


def _build_som_engine(g: NFAGraph, eidx: int,
                      width: Optional[int]) -> SomEngine:
    """Gough-analogue SOM engine: bit-NFA tables + hop mask."""
    from .compiler.bitnfa import build_bitnfa

    nfa = build_bitnfa([g], [eidx], prune_covered=False)
    if len(nfa.accept_sets) - 1 > NFA_MAX_ACCEPT_SETS:
        raise CompileError(
            "SOM pattern exceeds the bit-NFA accept-set limit "
            f"({NFA_MAX_ACCEPT_SETS})", eidx
        )
    base = NfaEngine.from_bitnfa(nfa, max_depth=width)
    hop = np.zeros(base.num_positions, dtype=np.int32)
    for p, L in g.hop_lens.items():
        hop[p] = L
    return SomEngine(
        **{f.name: getattr(base, f.name)
           for f in dataclasses.fields(NfaEngine)},
        hop_mask=hop,
    )


def compile_patterns(
    expressions: Sequence,
    flags: Optional[Sequence[int]] = None,
    ids: Optional[Sequence[int]] = None,
    mode: int = HS_MODE_BLOCK,
    ext: Optional[Sequence[Optional[ExprExt]]] = None,
    literal: bool = False,
    platform: Optional[dict] = None,
    max_states: Optional[int] = None,
    grey=None,
) -> Database:
    """Core compile driver (reference: hs_compile_multi_int, src/hs.cpp:168)."""
    from .grey import DEFAULT_GREY

    if grey is None:
        grey = DEFAULT_GREY
    if max_states is None:
        max_states = grey.max_dfa_states
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
    general_nfas: List[NFAGraph] = []
    general_idx: List[int] = []
    general_widths: List[Optional[int]] = []
    factor_ids: Dict[Tuple, int] = {}
    factor_atoms: List[Tuple[Tuple[int, int], ...]] = []
    factor_refs: List[List[Tuple[int, int, int, bool]]] = []
    factor_objs = []
    validators: Dict[int, DfaEngine] = {}
    anchored_refs: List[Tuple] = []
    sfx_validators: List[DfaEngine] = []
    sfx_index: Dict = {}
    # structure-keyed determinization cache: isomorphic graphs (same
    # shape, different literal bytes) share one subset construction
    dfa_cache: Dict = {}
    rev_validators: Dict[int, Tuple] = {}
    chains: Dict[int, ChainInfo] = {}
    combination_specs: List[Tuple[int, object, set]] = []
    som_engines: List[SomEngine] = []
    # literal-prefilter degradation bookkeeping: eidx -> True while every
    # general-engine-routed branch of the expression registered a
    # mandatory "pre" factor; one factorless branch poisons the eid
    # (reference analogue: Rose keeps its literal cut for arbitrary
    # engines, ng_violet.cpp — here the cut degrades to a block gate)
    prefilter_ok: Dict[int, bool] = {}
    for i, expr in enumerate(expressions):
        f = flags[i]
        validate_flags(f, i)
        if f & HS_FLAG_COMBINATION:
            if f & HS_FLAG_SOM_LEFTMOST:
                raise CompileError(
                    "HS_FLAG_COMBINATION cannot be combined with SOM", i
                )
            from .compiler.logical import parse_combination, referenced_ids

            ast = parse_combination(str(expr), i)
            combination_specs.append((i, ast, referenced_ids(ast)))
            e = ext[i] or ExprExt()
            patterns.append(
                PatternInfo(
                    external_id=ids[i],
                    flags=f,
                    min_offset=e.min_offset,
                    max_offset=e.max_offset,
                    combination=[],  # filled after validation below
                )
            )
            continue
        if (f & HS_FLAG_SOM_LEFTMOST) and (f & HS_FLAG_SINGLEMATCH):
            raise CompileError(
                "HS_FLAG_SOM_LEFTMOST cannot be combined with "
                "HS_FLAG_SINGLEMATCH", i
            )
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
            from .compiler.parser import parse_with_flags

            node, f = parse_with_flags(expr, f, i)
        e = ext[i] or ExprExt()
        fuzzy = bool(e.edit_distance or e.hamming_distance)
        if not fuzzy and not (f & HS_FLAG_SOM_LEFTMOST) \
                and not e.min_length and not literal:
            # pre-expansion shortcut for huge counted repeats only; low
            # lo repeats expand cheaply and must pass the vacuous /
            # ALLOWEMPTY validation below before routing (they still
            # reach the counter engine in route_branch)
            lbr = detect_lbr(node)
            if lbr is not None and lbr[1] < LBR_MIN_REPEAT:
                lbr = None
            if lbr is not None:
                # counter engine: no Glushkov expansion, O(1) state
                bits, lo, hi = lbr
                patterns.append(PatternInfo(
                    external_id=ids[i], flags=f,
                    min_offset=e.min_offset, max_offset=e.max_offset,
                    min_width=lo, max_width=hi,
                ))
                som_engines.append(LbrEngine(
                    class_bits=bits, lo=lo, hi=hi, eidx=i,
                ))
                continue
        g = build_nfa(node)
        if fuzzy:
            if e.edit_distance and e.hamming_distance:
                raise CompileError(
                    "edit_distance and hamming_distance are exclusive", i
                )
            if f & HS_FLAG_SOM_LEFTMOST:
                raise CompileError(
                    "approximate matching does not support SOM", i
                )
            if f & HS_FLAG_UTF8:
                # reference: UTF-8 is disallowed for approximate matching
                # (fuzzing byte sequences breaks codepoint integrity)
                raise CompileError(
                    "UTF-8 is disallowed for approximate matching", i
                )
            if _has_assertion(node):
                raise CompileError(
                    "zero-width assertions are disallowed for approximate "
                    "matching", i
                )
            from .compiler.fuzzy import fuzzy_graph

            g = fuzzy_graph(g, e.edit_distance, e.hamming_distance)
        if (
            grey.reduce_graphs
            and not (f & HS_FLAG_SOM_LEFTMOST)
            and not e.min_length
        ):
            # strip floating-start-redundant skips (`.*foo` -> `foo`):
            # bounds widths, shrinks DFAs, and keeps SOM-free semantics
            # exact (reference: startDs dominance redundancy)
            from .compiler.glushkov import reduce_graph

            g = reduce_graph(g)
        if g.is_vacuous() and not (f & HS_FLAG_ALLOWEMPTY):
            raise CompileError(
                "expression matches an empty buffer; use HS_FLAG_ALLOWEMPTY", i
            )
        if _nfa_is_dead(g):
            # unsatisfiable assertions / empty classes (reference rejects
            # these at compile: unit/hyperscan/bad_patterns.txt)
            raise CompileError("pattern can never match", i)
        min_w, max_w = _nfa_widths(g)
        _check_ext_param_satisfiability(e, g, i)
        # min_length needs per-match length knowledge (leftmost back-scan)
        # unless every match is already long enough; compare against true
        # match lengths (context hops/adjusts discounted), not path widths
        min_match_len = min_w
        if e.min_length and (g.hop_lens or g.start_accepts
                             or any(a for adjs in g.accept.values()
                                    for a in adjs)
                             or any(a for adjs in g.accept_eod.values()
                                    for a in adjs)):
            min_match_len = min(
                (llo for (llo, _lhi, _elo, _ehi) in _match_intervals(g)),
                default=min_w)
        need_minlen = bool(e.min_length) and min_match_len < e.min_length
        patterns.append(
            PatternInfo(
                external_id=ids[i],
                flags=f,
                min_offset=e.min_offset,
                max_offset=e.max_offset,
                min_length=e.min_length if need_minlen else 0,
                min_width=min_w,
                max_width=max_w,
                eod_capable=bool(
                    g.accept_eod
                    or any(eod for (_a, eod, _adj) in g.start_accepts)
                ),
            )
        )

        # route: literal path (Teddy + confirm + window validation) when a
        # bounded mandatory factor set exists; otherwise chains, counter
        # repeats, SOM registers, or general engines
        want_som = bool(f & HS_FLAG_SOM_LEFTMOST) or need_minlen

        def _ensure_validator() -> bool:
            """Whole-pattern window validator (+ SOM reverse DFAs); used
            by every literal-routed branch of this expression."""
            if i in validators:
                return True
            if not grey.allow_validators:
                return False
            try:
                d = determinize_cached(
                    g, i, dfa_cache,
                    max_states=grey.validator_max_states,
                    prune_covered=not want_som)
                validators[i] = DfaEngine.from_scan_dfa(d)
                if want_som:
                    from .compiler.dfa import reverse_graph

                    rev_a = rev_e = None
                    if g.accept:
                        rev_a = DfaEngine.from_scan_dfa(determinize_cached(
                            reverse_graph(g, eod=False), i, dfa_cache,
                            max_states=grey.validator_max_states,
                        ))
                    if g.accept_eod:
                        rev_e = DfaEngine.from_scan_dfa(determinize_cached(
                            reverse_graph(g, eod=True), i, dfa_cache,
                            max_states=grey.validator_max_states,
                        ))
                    rev_validators[i] = (rev_a, rev_e)
                return True
            except DfaLimitExceeded:
                validators.pop(i, None)
                return False

        def route_branch(node_b, g_b) -> None:
            w_b = _nfa_widths(g_b)[1]
            if not fuzzy and not want_som:
                # counter route first, vacuous or not: `x*` and friends
                # match densely (every run offset, or every offset when
                # nullable) — a run-length counter emits them as O(runs)
                # ranges where a DFA engine pays per-offset extraction
                # (reference: ng_lbr.cpp isLBR; vacuous empty matches
                # ride the start-report machinery, ng_vacuous.cpp)
                lbr = detect_lbr(node_b)
                if lbr is not None:
                    bits, lo, hi = lbr
                    som_engines.append(LbrEngine(
                        class_bits=bits, lo=lo, hi=hi, eidx=i,
                        start_reports=[
                            (anch, eod, adj, i)
                            for (anch, eod, adj) in g_b.start_accepts
                        ],
                    ))
                    return
            if not g_b.is_vacuous() and not fuzzy:
                lr = _try_literal_route(node_b, g_b, i, grey)
                if lr is not None:
                    fs, lit_equiv = lr

                    def _commit_anchored(ar) -> None:
                        for (fi, aref) in ar:
                            aidx = len(anchored_refs)
                            anchored_refs.append(aref)
                            _register_factor(
                                factor_ids, factor_atoms, factor_refs,
                                factor_objs, fi,
                                (i, int(aref[1]),
                                 int(aref[2] - aref[1] + aref[5]),
                                 f"a{aidx}"),
                            )

                    if not lit_equiv and not want_som:
                        ar = _try_anchored_route(
                            node_b, g_b, fs, i, grey, dfa_cache,
                            sfx_validators, sfx_index)
                        if ar is not None:
                            _commit_anchored(ar)
                            return
                        # expansion rescue: explode FIXED alternations
                        # that block the head (`v4\.(exe|dll|bat)`) and
                        # route each expanded branch as a pure literal
                        # or an anchored ref — committed only when EVERY
                        # branch succeeds (reference analogue: small
                        # literal-alternation explosion in component
                        # splitting, src/nfagraph/ng_calc_components.cpp)
                        from .compiler.literals import expand_head_alts

                        exp = expand_head_alts(node_b, limit=8)
                        plans = None
                        if exp is not None:
                            from .compiler.glushkov import (
                                reduce_graph as _rg2,
                            )

                            plans = []
                            for sub in exp:
                                g_s = build_nfa(sub)
                                if grey.reduce_graphs:
                                    g_s = _rg2(g_s)
                                if g_s.is_vacuous():
                                    plans = None
                                    break
                                lr_s = _try_literal_route(
                                    sub, g_s, i, grey)
                                if lr_s is None:
                                    plans = None
                                    break
                                fs_s, le_s = lr_s
                                if le_s:
                                    plans.append(("equiv", fs_s))
                                    continue
                                ar_s = _try_anchored_route(
                                    sub, g_s, fs_s, i, grey, dfa_cache,
                                    sfx_validators, sfx_index)
                                if ar_s is None:
                                    plans = None
                                    break
                                plans.append(("anch", ar_s))
                        if plans is not None:
                            for (pk, pl) in plans:
                                if pk == "equiv":
                                    for fi in pl:
                                        _register_factor(
                                            factor_ids, factor_atoms,
                                            factor_refs, factor_objs, fi,
                                            (i,
                                             int(fi.max_start_to_fend),
                                             int(fi.max_fend_to_end),
                                             "equiv"),
                                        )
                                else:
                                    _commit_anchored(pl)
                            return
                    ok = True
                    if not lit_equiv or want_som:
                        ok = _ensure_validator()
                        if ok and want_som:
                            lit_equiv = False  # SOM always validates
                    if ok:
                        for fi in fs:
                            _register_factor(
                                factor_ids, factor_atoms, factor_refs,
                                factor_objs, fi,
                                (i, int(fi.max_start_to_fend),
                                 int(fi.max_fend_to_end),
                                 "equiv" if lit_equiv else "win"),
                            )
                        return
                if not want_som and i not in chains:
                    # chain decomposition: SEG <gap> SEG <gap> ... (Rose
                    # roles); streams carry boundary evidence per gap
                    from .compiler.chains import detect_chain

                    cs = detect_chain(node_b, grey.min_factor_len,
                                      grey.max_window)
                    if cs is not None:
                        try:
                            from .compiler.dfa import reverse_graph

                            roles: List[ChainRole] = []
                            for ri, rs in enumerate(cs.roles):
                                rg = build_nfa(rs.node)
                                if rg.accept_eod or rg.is_vacuous():
                                    raise DfaLimitExceeded(
                                        "chain segment unsupported")
                                fwd = DfaEngine.from_scan_dfa(
                                    determinize_cached(
                                        rg, i, dfa_cache,
                                        max_states=grey.
                                        validator_max_states))
                                rev = None
                                if ri > 0 or cs.lead is not None:
                                    rev = DfaEngine.from_scan_dfa(
                                        determinize_cached(
                                            reverse_graph(rg, eod=False),
                                            i, dfa_cache,
                                            max_states=grey.
                                            validator_max_states))
                                roles.append(ChainRole(fwd=fwd, rev=rev))
                        except DfaLimitExceeded:
                            cs = None
                    if cs is not None:
                        all_gaps = list(cs.gaps)
                        lead = trail = None
                        if cs.lead is not None:
                            lead = (len(all_gaps), int(cs.lead[1]),
                                    cs.lead[2])
                            all_gaps.append(cs.lead)
                        if cs.trail is not None:
                            trail = (len(all_gaps), int(cs.trail[1]),
                                     cs.trail[2])
                            all_gaps.append(cs.trail)
                        chains[i] = ChainInfo(
                            roles=roles,
                            gap_bits=np.stack([gb[0] for gb in all_gaps]),
                            gap_lo=[int(gb[1]) for gb in all_gaps],
                            gap_hi=[gb[2] for gb in all_gaps],
                            lead=lead,
                            trail=trail,
                            infix={gi: inf
                                   for gi, inf in enumerate(cs.infixes)
                                   if inf is not None},
                        )
                        for ri, rs in enumerate(cs.roles):
                            for fi in rs.factors:
                                _register_factor(
                                    factor_ids, factor_atoms, factor_refs,
                                    factor_objs, fi,
                                    (i, int(fi.max_start_to_fend),
                                     int(fi.max_fend_to_end), f"c{ri}"),
                                )
                        return
            if want_som:
                # general SOM: bit-NFA with leftmost-start registers
                # (reference: ng_som.cpp routing to Gough/som planning)
                som_engines.append(_build_som_engine(g_b, i, w_b))
            else:
                # literal-prefilter degradation: a branch that must run a
                # general engine (too many infix positions, unbounded
                # window, blown-up NFA...) still registers its mandatory
                # literal factors as "pre" refs when it has them — the
                # block runtime then scans this branch's engine only over
                # blocks where some factor actually hit, so one hard
                # pattern no longer costs the whole batch the general-
                # engine rate (reference: the literal cut survives into
                # arbitrary prefix/infix engines, ng_violet.cpp:3053)
                pfs = None
                if grey.allow_teddy and not fuzzy \
                        and not g_b.is_vacuous() \
                        and not g_b.start_accepts:
                    from .compiler.literals import extract_factors

                    pfs = extract_factors(
                        node_b, min_len=grey.min_factor_len)
                if pfs:
                    prefilter_ok.setdefault(i, True)
                    for fi in pfs:
                        _register_factor(
                            factor_ids, factor_atoms, factor_refs,
                            factor_objs, fi, (i, 0, 0, "pre"),
                        )
                else:
                    prefilter_ok[i] = False
                general_nfas.append(g_b)
                general_idx.append(i)
                general_widths.append(w_b)

        from .compiler.ast import Alt as _Alt

        if isinstance(node, _Alt) and not fuzzy \
                and 1 < len(node.children) <= 16:
            # component splitting (reference: calcComponents,
            # src/nfagraph/ng_calc_components.cpp): each top-level
            # alternation branch routes to its own best engine; the match
            # set is the union (records dedupe per (expr, to))
            from .compiler.glushkov import reduce_graph as _rg

            for bn in node.children:
                g_b = build_nfa(bn)
                if grey.reduce_graphs and not want_som:
                    g_b = _rg(g_b)
                route_branch(bn, g_b)
        else:
            route_branch(node, g)

    # validate + attach combination ASTs (referenced ids must name ordinary
    # sub-expressions in this database; reference: parseLogicalCombination)
    if combination_specs:
        from .compiler.logical import to_jsonable

        sub_ids = {
            p.external_id
            for j, p in enumerate(patterns)
            if p.combination is None
        }
        for (i, ast, refs) in combination_specs:
            missing = refs - sub_ids
            if missing:
                raise CompileError(
                    f"logical combination references unknown sub-expression "
                    f"id(s) {sorted(missing)}", i
                )
            patterns[i].combination = to_jsonable(ast)

    engines = (
        _build_engines(general_nfas, general_idx, max_states, general_widths,
                       allow_limex=grey.allow_limex)
        if general_nfas
        else []
    )
    engines += som_engines
    # strip prefilter refs of poisoned expressions (some general branch
    # had no mandatory factor, so factor hits cannot gate the engine),
    # then drop factors left with no refs at all
    bad = {e for e, ok in prefilter_ok.items() if not ok}
    if bad:
        for refs in factor_refs:
            refs[:] = [r for r in refs
                       if not (r[3] == "pre" and r[0] in bad)]
    if any(not refs for refs in factor_refs):
        keep = [fi for fi, refs in enumerate(factor_refs) if refs]
        factor_atoms = [factor_atoms[fi] for fi in keep]
        factor_refs = [factor_refs[fi] for fi in keep]
        factor_objs = [factor_objs[fi] for fi in keep]
    # drop suffix validators left dangling by abandoned expansion
    # attempts (a later branch of the same expansion failed to route)
    used_svids = sorted({svid for (*_rest, svid, _sw) in anchored_refs
                         if svid >= 0})
    if len(used_svids) != len(sfx_validators):
        remap = {old: new for new, old in enumerate(used_svids)}
        sfx_validators = [sfx_validators[old] for old in used_svids]
        anchored_refs = [
            (e, d, h, pfx, remap.get(svid, -1), sw)
            for (e, d, h, pfx, svid, sw) in anchored_refs
        ]
    lit = None
    if factor_objs:
        from .compiler.teddy import build_teddy

        plan = build_teddy(factor_objs)
        lit = LiteralEngine(
            masks=plan.masks,
            gate_masks=plan.gate_masks,
            factor_atoms=factor_atoms,
            bucket_factors=plan.buckets,
            factor_refs=factor_refs,
            validators=validators,
            rev_validators=rev_validators,
            chains=chains,
            anchored_refs=anchored_refs,
            sfx_validators=sfx_validators,
        )
        # build the packed validator tables now: everything the run side
        # needs exists at the end of compilation (reference: the whole
        # RoseEngine blob is emitted by buildFinalEngine)
        from .runtime.lit_runtime import _packed_validators

        _packed_validators(lit)
        _pack_native_tables(lit)
    return Database(mode=mode, patterns=patterns, engines=engines, lit=lit,
                    target=platform, host_scan_limit=grey.host_scan_limit)


def _pack_native_tables(lit) -> None:
    """Eagerly pack the native (C) confirm + validation tables so no scan
    pays the packing cost (same policy as _packed_validators: the whole
    run-side blob exists at end of compile, reference buildFinalEngine)."""
    from .native import _confirm_c_tables, _validate_c_tables, get_lib

    if get_lib() is not None:
        _confirm_c_tables(lit)
        _validate_c_tables(lit)
