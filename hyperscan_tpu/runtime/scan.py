"""Block-mode scan runtime.

Reference analogue: src/runtime.c hs_scan → roseBlockExec. The TPU version
runs each engine's scan kernel over the (batched, padded) data on device,
extracts match candidates into fixed-capacity buffers, and finishes report
processing on host: accept-set expansion, offset adjusts, ext-param bounds,
dedupe, ordering, SINGLEMATCH/QUIET handling, and callback delivery
(reference: src/rose/match.c + src/util/report.h semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..database import Database, DfaEngine
from ..errors import DbModeError, InvalidError, ScratchInUseError
from ..flags import (
    HS_FLAG_QUIET,
    HS_FLAG_SINGLEMATCH,
    HS_FLAG_SOM_LEFTMOST,
    HS_MODE_BLOCK,
    UNBOUNDED,
    base_mode,
)

Match = Tuple[int, int, int]  # (external id, from, to)

_LANE = 128  # pad lengths to lane multiples to bound recompiles


def _bucket_len(n: int) -> int:
    """Round up to a padding bucket (next power of two of lane multiples)."""
    m = max(_LANE, n)
    b = _LANE
    while b < m:
        b *= 2
    return b


@dataclasses.dataclass
class Scratch:
    """Per-thread scan workspace (reference: src/scratch.c hs_scratch).

    Holds the match-buffer capacity and marks in-use for reentrancy
    detection. Device buffers are functional in JAX, so the scratch's main
    job is capacity policy + the in-use guard.
    """

    capacity: int = 4096
    in_use: bool = False

    def clone(self) -> "Scratch":
        return Scratch(capacity=self.capacity)


def _engine_device_arrays(engine: DfaEngine):
    # cached per engine object
    if not hasattr(engine, "_dev"):
        engine._dev = (  # type: ignore[attr-defined]
            jnp.asarray(engine.trans),
            jnp.asarray(engine.byte_to_class),
            jnp.asarray(engine.accept_id),
            jnp.asarray(engine.accept_eod_id),
            jnp.int32(engine.start_state),
        )
    return engine._dev  # type: ignore[attr-defined]


def scan_blocks_raw(
    db: Database, blocks: Sequence[bytes], capacity: int
) -> List[List[Tuple[int, int]]]:
    """Scan a batch of independent blocks; returns per-block lists of
    internal (expr_index, to, from) records (pre report-processing),
    deduped and sorted. Capacity overflow retries happen inside the
    device kernel wrappers (teddy_scan_rows / dfa_scan_corpus_device)."""
    B = len(blocks)
    per_block: List[set] = [set() for _ in range(B)]

    # literal path: Teddy filter over the concatenated corpus, then
    # confirm + window validation (reference: Rose floating literal
    # matcher path, src/rose/block.c roseBlockFloating)
    if db.lit is not None:
        from .lit_runtime import scan_literal_path

        lens = np.asarray([len(b) for b in blocks], dtype=np.int64)
        starts = np.zeros(B, dtype=np.int64)
        if B > 1:
            np.cumsum(lens[:-1], out=starts[1:])
        ends = starts + lens
        corpus = (
            np.concatenate([np.frombuffer(b, dtype=np.uint8) for b in blocks])
            if int(lens.sum())
            else np.zeros(0, dtype=np.uint8)
        )
        for (bi, eidx, to, frm) in scan_literal_path(db, corpus, starts, ends):
            per_block[bi].add((eidx, to, frm))

    if not db.engines:
        return [_order_records(per_block[bi], len(blocks[bi])) for bi in range(B)]

    maxlen = max((len(b) for b in blocks), default=0)
    total_bytes = sum(len(b) for b in blocks)
    from .smallwrite import HOST_SCAN_LIMIT, dfa_scan_host

    if total_bytes <= HOST_SCAN_LIMIT:
        # small-write path (reference: runSmallWriteEngine): host numpy
        lengths = _host_engine_scan(db.engines, blocks, per_block)
        return [
            _order_records(per_block[bi], int(lengths[bi])) for bi in range(B)
        ]

    from ..database import MAX_HALO_DEPTH, NfaEngine
    from ..ops.dfa_kernel import dfa_scan_corpus_device

    lengths = np.asarray([len(b) for b in blocks], dtype=np.int32)
    blocks_b = [bytes(b) for b in blocks]
    host_engines = []
    for engine in db.engines:
        if isinstance(engine, NfaEngine):
            from ..ops.nfa_kernel import nfa_device_eligible, nfa_scan_corpus_device

            if not nfa_device_eligible(engine):
                host_engines.append(engine)
                continue
            # acyclic bit-NFA: layered position-parallel device scan
            recs, eod_bits = nfa_scan_corpus_device(
                engine, blocks_b, np.ones(B, dtype=bool), capacity=capacity
            )
            for (bi, pos, bits) in recs:
                for (eid, adj) in engine.expand_set(bits):
                    per_block[bi].add((eid, pos + 1 + adj, 0))
            for bi in range(B):
                if eod_bits[bi]:
                    for (eid, adj) in engine.expand_set(int(eod_bits[bi])):
                        per_block[bi].add((eid, int(lengths[bi]) + adj, 0))
            _add_start_reports(engine, per_block, lengths)
            continue
        if engine.max_depth is None or engine.max_depth > MAX_HALO_DEPTH:
            host_engines.append(engine)
            continue
        # bounded-width engine: exact chunk-halo parallel device scan
        recs, finals = dfa_scan_corpus_device(
            engine, blocks_b, np.ones(B, dtype=bool), capacity=capacity
        )
        for (bi, pos, sid) in recs:
            for (eid, adj) in engine.expand_set(sid):
                per_block[bi].add((eid, pos + 1 + adj, 0))
        for bi in range(B):
            sid = int(engine.accept_eod_id[finals[bi]])
            if sid:
                for (eid, adj) in engine.expand_set(sid):
                    per_block[bi].add((eid, int(lengths[bi]) + adj, 0))
        _add_start_reports(engine, per_block, lengths)

    if host_engines:
        # unbounded-width engines carry state across the whole buffer and
        # cannot halo-parallelize; the native host runtime scans them
        _host_engine_scan(host_engines, blocks_b, per_block)

    return [_order_records(per_block[bi], int(lengths[bi])) for bi in range(B)]


def engine_scan_host(engine, data, lengths, init_states=None):
    """Dispatch a host batch scan to the engine's runtime (DFA byte loop
    or bit-NFA word loop). Returns (hits per row [(pos, set_id_or_bits)],
    finals) with carried-state semantics."""
    from ..database import NfaEngine

    if isinstance(engine, NfaEngine):
        from .nfa_host import nfa_scan_host

        if init_states is None:
            init_states = [engine.start_state] * data.shape[0]
        return nfa_scan_host(engine, data, lengths, init_states)
    from .smallwrite import dfa_scan_host

    return dfa_scan_host(engine, data, lengths, init_states)


def _host_engine_scan(engines, blocks, per_block) -> np.ndarray:
    """Scan engines over a block batch with the host runtime, collecting
    accept / EOD / vacuous records into per_block. Returns lengths."""
    B = len(blocks)
    maxlen = max((len(b) for b in blocks), default=0)
    data = np.zeros((B, max(1, maxlen)), dtype=np.uint8)
    lengths = np.zeros((B,), dtype=np.int32)
    for i, blk in enumerate(blocks):
        data[i, : len(blk)] = np.frombuffer(blk, dtype=np.uint8)
        lengths[i] = len(blk)
    for engine in engines:
        hits, finals = engine_scan_host(engine, data, lengths)
        for bi in range(B):
            for (t, sid) in hits[bi]:
                for (eid, adj) in engine.expand_set(sid):
                    per_block[bi].add((eid, t + 1 + adj, 0))
            sid = engine.eod_set(finals[bi])
            if sid:
                for (eid, adj) in engine.expand_set(sid):
                    per_block[bi].add((eid, int(lengths[bi]) + adj, 0))
        _add_start_reports(engine, per_block, lengths)
    return lengths


def _add_start_reports(engine, per_block, lengths) -> None:
    """Empty-match reports (vacuous patterns; reference: boundary
    programs, roseRunBoundaryProgram)."""
    for (anchored, eod, adj, eid) in engine.start_reports:
        for bi in range(len(per_block)):
            n = int(lengths[bi])
            if anchored and eod:
                if n == 0:
                    per_block[bi].add((eid, adj, 0))
            elif anchored:
                per_block[bi].add((eid, adj, 0))
            elif eod:
                per_block[bi].add((eid, n + adj, 0))
            else:
                for e in range(n + 1):
                    per_block[bi].add((eid, e + adj, 0))


def _order_records(recs, n: int) -> List[Tuple[int, int, int]]:
    """Bound-check, min-merge SOM starts per (expr, to), order by offset."""
    best = {}
    for (e, t, frm) in recs:
        if 0 <= t <= n:
            k = (t, e)
            if k not in best or frm < best[k]:
                best[k] = frm
    return [(e, t, best[(t, e)]) for (t, e) in sorted(best)]


def _expand_combinations(
    db: Database,
    records: List[Tuple[int, int, int]],
    matched: set,
    at_end: bool,
    end_offset: int,
) -> List[Tuple[int, int, int]]:
    """Insert logical-combination reports into the event stream.

    Reference semantics (src/rose/program_runtime.c SET_LOGICAL /
    FLUSH_COMBINATION / LAST_FLUSH_COMBINATION): combinations referenced by
    any sub-expression matching at offset X are flushed once all events at
    X are processed; at end of data, combinations true with *none* of their
    referenced sub-expressions matched report at the data end (purely
    negative combinations)."""
    from ..compiler.logical import evaluate

    combos = db.combos()
    out: List[Tuple[int, int, int]] = []
    active: set = set()
    prev_to: Optional[int] = None

    def flush(to: int) -> None:
        for ci in sorted(active):
            eidx, ast, _refs = combos[ci]
            if evaluate(ast, matched):
                out.append((eidx, to, 0))
        active.clear()

    for (eidx, to, frm) in records:
        if prev_to is not None and to != prev_to:
            flush(prev_to)
        prev_to = to
        out.append((eidx, to, frm))
        xid = db.patterns[eidx].external_id
        matched.add(xid)
        for ci, (_ce, _ast, refs) in enumerate(combos):
            if xid in refs:
                active.add(ci)
    if prev_to is not None:
        flush(prev_to)
    if at_end:
        for (ceidx, ast, refs) in combos:
            if refs.isdisjoint(matched) and evaluate(ast, matched):
                out.append((ceidx, end_offset, 0))
    return out


def finalize_reports(
    db: Database,
    records: List[Tuple[int, int]],
    callback: Optional[Callable[[int, int, int, int], int]] = None,
    seen_single: Optional[set] = None,
    combo_matched: Optional[set] = None,
    at_end: bool = True,
    end_offset: Optional[int] = None,
) -> Tuple[List[Match], bool]:
    """Apply report semantics and deliver matches in offset order.

    Returns (matches, terminated). `terminated` is True if a callback
    returned nonzero (reference: HS_SCAN_TERMINATED, src/hs_runtime.h:78).
    `seen_single` and `combo_matched` carry SINGLEMATCH / logical-vector
    state across calls (streaming: the stream owns them for its lifetime).
    """
    if seen_single is None:
        seen_single = set()

    # stage 1: per-pattern offset bounds (sub-expression guards run before
    # combinations see the event — reference: CHECK_BOUNDS precedes
    # SET_LOGICAL in the literal program)
    recs: List[Tuple[int, int, int]] = []
    for rec in records:
        eidx, to = rec[0], rec[1]
        frm = rec[2] if len(rec) > 2 else 0
        p = db.patterns[eidx]
        if not (p.min_offset <= to <= p.max_offset):
            continue
        if p.min_length and to - frm < p.min_length:
            # frm is the leftmost start, so to-frm is the longest match
            # length ending here (reference: min_length ext param)
            continue
        recs.append((eidx, to, frm))

    # stage 2: logical combinations
    if db.combos():
        if end_offset is None:
            end_offset = recs[-1][1] if recs else 0
        recs = _expand_combinations(
            db, recs, combo_matched if combo_matched is not None else set(),
            at_end, end_offset,
        )

    # stage 3: delivery (QUIET / SINGLEMATCH / callback)
    out: List[Match] = []
    for (eidx, to, frm) in recs:
        p = db.patterns[eidx]
        if p.combination is not None and not (p.min_offset <= to <= p.max_offset):
            continue  # combination's own ext bounds, checked at flush time
        if p.flags & HS_FLAG_QUIET:
            continue
        if p.flags & HS_FLAG_SINGLEMATCH:
            if eidx in seen_single:
                continue
            seen_single.add(eidx)
        # `from` is only reported under SOM_LEFTMOST (it may be tracked
        # internally for min_length without being reported)
        rep_frm = frm if (p.flags & HS_FLAG_SOM_LEFTMOST) else 0
        m = (p.external_id, rep_frm, to)
        out.append(m)
        if callback is not None:
            if callback(p.external_id, rep_frm, to, 0):
                return out, True
    return out, False


def scan_block(
    db: Database,
    data: bytes,
    callback: Optional[Callable[[int, int, int, int], int]] = None,
    scratch: Optional[Scratch] = None,
) -> Tuple[List[Match], bool]:
    """hs_scan analogue (reference: src/runtime.c:316)."""
    if base_mode(db.mode) != HS_MODE_BLOCK:
        raise DbModeError("database not compiled for block mode")
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise InvalidError("data must be bytes-like")
    scratch = scratch or Scratch()
    if scratch.in_use:
        raise ScratchInUseError("scratch is already in use")
    scratch.in_use = True
    try:
        recs = scan_blocks_raw(db, [bytes(data)], scratch.capacity)[0]
        return finalize_reports(db, recs, callback, end_offset=len(data))
    finally:
        scratch.in_use = False


def scan_batch(
    db: Database,
    blocks: Sequence[bytes],
    scratch: Optional[Scratch] = None,
) -> List[List[Match]]:
    """Batched block scan — the TPU-native entry point: many blocks advance
    in lockstep across VPU lanes (reference's per-core thread model
    replaced by batch parallelism)."""
    if base_mode(db.mode) != HS_MODE_BLOCK:
        raise DbModeError("database not compiled for block mode")
    scratch = scratch or Scratch()
    all_recs = scan_blocks_raw(db, [bytes(b) for b in blocks], scratch.capacity)
    return [
        finalize_reports(db, recs, end_offset=len(blocks[i]))[0]
        for i, recs in enumerate(all_recs)
    ]
