"""Device DFA scan kernels (JAX/XLA; Pallas variants slot in behind the
same interface).

Reference analogue: the McClellan byte-at-a-time loop
(src/nfa/mcclellan.c:123 doNormal8/16). On TPU the sequential byte loop is
restructured two ways:

- ``dfa_scan_batch``: many independent buffers (blocks or streams) advance
  in lockstep — the scan axis is time, the batch axis fills the VPU lanes.
  This is the TPU replacement for "one core per stream".

A speculative tile-map variant (per-tile state maps composed with an
associative scan — the Sheng-class small-S alternative) was measured and
removed: XLA lowers its per-byte table lookups to ~130M-lookup/s gathers,
which cannot compete with the chunk-halo Pallas kernel
(ops/dfa_kernel.py) or the layered bit-NFA path (ops/nfa_kernel.py).

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
