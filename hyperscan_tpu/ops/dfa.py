"""Device DFA scan kernels (JAX/XLA; Pallas variants slot in behind the
same interface).

Reference analogue: the McClellan byte-at-a-time loop
(src/nfa/mcclellan.c:123 doNormal8/16). On TPU the sequential byte loop is
restructured two ways:

- ``dfa_scan_batch``: many independent buffers (blocks or streams) advance
  in lockstep — the scan axis is time, the batch axis fills the VPU lanes.
  This is the TPU replacement for "one core per stream".

- ``dfa_scan_tiled``: one long buffer is split into tiles; each tile
  computes its full state→state map by running from *all* S start states
  (speculative execution, viable for small S — the Sheng-class engines);
  maps are composed with an associative scan and the tile is replayed from
  its known entry state. Cost ≈ (S+1)·L transitions but sequential depth
  2·T instead of L. (Reference precedent for boundary-safe tiling: FDR's
  zone machinery, src/fdr/fdr.c:45-133.)

All functions are jit-compatible with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dfa_scan_batch(trans, byte_to_class, accept_id, init_state, data, lengths):
    """Scan B independent buffers in lockstep.

    Args:
      trans:         [S, C] int32 transition table
      byte_to_class: [256] int32 alphabet remap
      accept_id:     [S] int32 accept-set id per state (0 = none)
      init_state:    scalar int32, or [B] int32 per-lane entry states
                     (streaming: each lane resumes its stream's carried
                     state; reference analogue: loadStreamState)
      data:          [B, L] uint8 (padded)
      lengths:       [B] int32 valid lengths

    Returns:
      accepts:      [B, L] int32 accept-set id at each byte position
                    (0 past the valid length)
      final_states: [B] int32 state at end-of-data (for EOD accepts)
    """
    B, L = data.shape
    cls = byte_to_class[data.astype(jnp.int32)]  # [B, L]

    def step(states, xs):
        c, i = xs
        nxt = trans[states, c]
        # freeze the state once past the buffer's end so the carry out of
        # the scan is the exact end-of-data state
        states = jnp.where(i < lengths, nxt, states)
        acc = jnp.where(i < lengths, accept_id[states], 0)
        return states, acc

    init_state = jnp.asarray(init_state, dtype=jnp.int32)
    states0 = jnp.broadcast_to(init_state, (B,)).astype(jnp.int32)
    idx = jnp.arange(L, dtype=jnp.int32)
    final_states, accs = jax.lax.scan(step, states0, (cls.T, idx))
    return accs.T, final_states


def _compose(m1, m2):
    """Function composition of state maps: (m2 ∘ m1)[s] = m2[m1[s]].

    m1, m2: [..., S] int32 where m[t, s] = state after the tile given entry
    state s. Used as the associative-scan combiner.
    """
    return jnp.take_along_axis(m2, m1, axis=-1)


def dfa_scan_tiled(trans, byte_to_class, accept_id, init_state, data, length,
                   tile_size: int = 512):
    """Scan one long buffer via speculative tile maps (small-S DFAs).

    Args:
      data:   [Lpad] uint8, padded to a multiple of tile_size
      length: scalar int32 valid length

    Returns:
      accepts:     [Lpad] int32 accept-set ids
      final_state: scalar int32 state at end-of-data
    """
    S = trans.shape[0]
    Lpad = data.shape[0]
    assert Lpad % tile_size == 0
    nt = Lpad // tile_size
    cls = byte_to_class[data.astype(jnp.int32)].reshape(nt, tile_size)
    pos0 = (jnp.arange(nt, dtype=jnp.int32) * tile_size)[:, None]  # [nt,1]

    # Pass A: per-tile state maps from every possible entry state.
    def stepA(maps, xs):
        c, i = xs  # c: [nt], i: scalar
        nxt = trans[maps, c[:, None]]  # [nt, S]
        valid = (pos0[:, 0] + i) < length
        maps = jnp.where(valid[:, None], nxt, maps)
        return maps, None

    maps0 = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (nt, S))
    idx = jnp.arange(tile_size, dtype=jnp.int32)
    maps, _ = jax.lax.scan(stepA, maps0, (cls.T, idx))

    # Pass B: inclusive composition across tiles; entry state of tile t is
    # the composition of tiles [0, t) applied to the init state.
    comp = jax.lax.associative_scan(_compose, maps, axis=0)  # [nt, S]
    final_state = comp[-1, init_state]
    entry = jnp.concatenate(
        [jnp.full((1,), init_state, jnp.int32), comp[:-1, init_state]]
    )  # [nt]

    # Pass C: replay each tile from its known entry state, in parallel.
    def stepC(states, xs):
        c, i = xs
        nxt = trans[states, c]
        valid = (pos0[:, 0] + i) < length
        states = jnp.where(valid, nxt, states)
        acc = jnp.where(valid, accept_id[states], 0)
        return states, acc

    _, accs = jax.lax.scan(stepC, entry, (cls.T, idx))  # accs [T, nt]
    return accs.T.reshape(Lpad), final_state
