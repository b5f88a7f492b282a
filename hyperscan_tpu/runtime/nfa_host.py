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
