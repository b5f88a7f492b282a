"""Host scanning for bit-parallel NFA engines.

Reference analogue: the LimEx runtime step (src/nfa/limex_runtime_impl.h:
shift/OR the state bitvector, AND the byte's reach, collect accepts).
The native C++ path (native/scan.cpp hstpu_bitnfa_scan_batch) does the
word-packed loop; the numpy fallback mirrors it with boolean matmuls.

Hits carry a *bitmask* over accept set ids (bit g-1 = set id g active);
``NfaEngine.expand_set`` unions the named report sets.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def pack_words(engine):
    """Cache uint64 word-packed tables for the native runtime:
    (follow_words [P, KW], reach_words [C, KW], float_words [KW],
    anch_words [KW], accept_any [KW], KW)."""
    if not hasattr(engine, "_words"):
        P = engine.num_positions
        KW = max(1, -(-P // 64))

        def pack_bools(rows: np.ndarray) -> np.ndarray:
            # rows [..., P] bool -> [..., KW] uint64, bit i = position i
            pad = np.zeros(rows.shape[:-1] + (KW * 64,), dtype=np.uint8)
            pad[..., :P] = rows
            packed = np.ascontiguousarray(
                np.packbits(pad, axis=-1, bitorder="little")
            )
            return packed.view(np.uint64).reshape(rows.shape[:-1] + (KW,))

        # follow_words[u] = bitmask of successors of u — but the scan
        # needs OR of follow rows of *active* positions, i.e. row u of
        # the follow matrix; pack row-wise
        follow_words = pack_bools(engine.follow.astype(bool))
        reach_words = pack_bools(engine.class_reach.astype(bool))
        float_words = pack_bools(engine.float_mask.astype(bool))
        anch_words = pack_bools(engine.anch_mask.astype(bool))
        accept_any = pack_bools(engine.accept_gid.astype(bool))
        engine._words = (
            np.ascontiguousarray(follow_words),
            np.ascontiguousarray(reach_words),
            np.ascontiguousarray(float_words),
            np.ascontiguousarray(anch_words),
            np.ascontiguousarray(accept_any),
            KW,
        )
    return engine._words


def _int_to_words(mask: int, KW: int) -> np.ndarray:
    out = np.zeros(KW, dtype=np.uint64)
    for k in range(KW):
        out[k] = (mask >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
    return out


def _words_to_int(words: np.ndarray) -> int:
    out = 0
    for k in range(words.shape[0]):
        out |= int(words[k]) << (64 * k)
    return out


def nfa_scan_host(
    engine, data: np.ndarray, lengths: np.ndarray,
    init_states: Sequence[int],
) -> Tuple[List[List[Tuple[int, int]]], List[int]]:
    """Scan a [B, L] batch with carried big-int states.

    Returns (per-row [(pos, set_bitmask)...], final state ints).
    """
    B, L = data.shape
    P = engine.num_positions
    from ..native import bitnfa_scan_batch_native

    native = bitnfa_scan_batch_native(engine, data, lengths, init_states)
    if native is not None:
        return native

    start_bit = 1 << P
    act = np.zeros((B, P), dtype=bool)
    is_start = np.zeros(B, dtype=bool)
    for b, s in enumerate(init_states):
        s = int(s)
        is_start[b] = bool(s & start_bit)
        m = s & (start_bit - 1)
        while m:
            low = m & (-m)
            act[b, low.bit_length() - 1] = True
            m ^= low

    F = engine.follow.astype(np.uint8)
    reach = engine.class_reach
    gid = engine.accept_gid
    acc: List[List[Tuple[int, int]]] = [[] for _ in range(B)]
    if L:
        cls = engine.byte_to_class.astype(np.int64)[data]
        acc_pos = np.flatnonzero(gid)
        for t in range(L):
            live = t < lengths
            entry = engine.float_mask[None, :] | (
                is_start[:, None] & engine.anch_mask[None, :]
            )
            nxt = ((act.astype(np.uint8) @ F) > 0) | entry
            nxt &= reach[cls[:, t]]
            act = np.where(live[:, None], nxt, act)
            is_start &= ~live
            if len(acc_pos):
                rows = np.flatnonzero(live & act[:, acc_pos].any(axis=1))
                for b in rows:
                    bits = 0
                    for p in acc_pos[act[b, acc_pos]]:
                        bits |= 1 << (int(gid[p]) - 1)
                    acc[b].append((t, bits))
    hits = []
    for b in range(B):
        a = np.asarray(acc[b], dtype=np.int64).reshape(-1, 2)
        hits.append((a[:, 0], a[:, 1]))
    finals: List[int] = []
    for b in range(B):
        m = 0
        for p in np.flatnonzero(act[b]):
            m |= 1 << int(p)
        if is_start[b]:
            m |= start_bit
        finals.append(m)
    return hits, finals


# --------------------------------------------------------------------------
# SOM scan: bit-NFA with leftmost-start registers (the Gough analogue,
# reference: src/nfa/gough.c SOM register file). Each active position
# carries the minimum absolute start offset of any run reaching it;
# accepts report it as `from`.
# --------------------------------------------------------------------------

_INF = 1 << 62


def som_scan_host(
    engine, data: np.ndarray, lengths: np.ndarray,
    init_states, base_offsets,
):
    """Scan a [B, L] batch carrying (activation, som-register) state.

    `init_states[b]` is `(mask | is_start << P, soms_tuple)`;
    `base_offsets[b]` is the absolute offset of data[b, 0]. Returns
    (hits per row [(pos, set_id, frm_abs)...], final states).
    """
    from ..native import somnfa_scan_batch_native

    native = somnfa_scan_batch_native(
        engine, data, lengths, init_states, base_offsets
    )
    if native is not None:
        return native

    B, L = data.shape
    P = engine.num_positions
    start_bit = 1 << P
    act = np.zeros((B, P), dtype=bool)
    som = np.full((B, P), _INF, dtype=np.int64)
    is_start = np.zeros(B, dtype=bool)
    for b, (s, soms) in enumerate(init_states):
        s = int(s)
        is_start[b] = bool(s & start_bit)
        m = s & (start_bit - 1)
        si = 0
        while m:
            low = m & (-m)
            p = low.bit_length() - 1
            act[b, p] = True
            som[b, p] = soms[si]
            si += 1
            m ^= low

    F = engine.follow
    reach = engine.class_reach
    gid = engine.accept_gid
    hop = engine.hop_mask.astype(np.int64)
    hits = [[] for _ in range(B)]
    if L:
        cls = engine.byte_to_class.astype(np.int64)[data]
        acc_pos = np.flatnonzero(gid)
        base = np.asarray(base_offsets, dtype=np.int64)
        for t in range(L):
            live = t < lengths
            succ = (act.astype(np.uint8) @ F.astype(np.uint8)) > 0
            somx = np.where(act, som, _INF)
            succ_som = np.min(
                np.where(F[None, :, :], somx[:, :, None], _INF), axis=1
            )
            entry = engine.float_mask[None, :] | (
                is_start[:, None] & engine.anch_mask[None, :]
            )
            entry_som = (base[:, None] + t) + hop[None, :]
            rc = reach[cls[:, t]]
            nxt = (succ | entry) & rc
            nsom = np.where(succ, succ_som, _INF)
            nsom = np.where(entry, np.minimum(nsom, entry_som), nsom)
            nsom = np.where(nxt, nsom, _INF)
            act = np.where(live[:, None], nxt, act)
            som = np.where(live[:, None], nsom, som)
            is_start &= ~live
            if len(acc_pos):
                rows = np.flatnonzero(live & act[:, acc_pos].any(axis=1))
                for b in rows:
                    best: dict = {}
                    for p in acc_pos[act[b, acc_pos]]:
                        g = int(gid[p])
                        v = int(som[b, p])
                        if g not in best or v < best[g]:
                            best[g] = v
                    for g, frm in best.items():
                        hits[b].append((t, g, frm))
    finals = []
    for b in range(B):
        m = 0
        soms = []
        for p in np.flatnonzero(act[b]):
            m |= 1 << int(p)
            soms.append(int(som[b, p]))
        if is_start[b]:
            m |= start_bit
        finals.append((m, tuple(soms)))
    return hits, finals
