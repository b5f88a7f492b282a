"""Match extraction: dense per-position accept ids → fixed-capacity match
buffers.

This is the TPU replacement for the reference's callback funnel
(src/rose/match.c roseCallback): the device cannot invoke host callbacks
per match, so engines emit a dense accept-id plane and this kernel
compacts it into (set_id, block, to) tuples under a fixed capacity with
overflow detection (the host rescans at doubled capacity on overflow —
the analogue of scratch-resize).
"""

from __future__ import annotations

import jax.numpy as jnp


def extract_matches(accepts, capacity: int):
    """Compact nonzero entries of a [B, L] accept-id plane.

    Returns:
      total:   scalar int32 — true number of accepts (may exceed capacity)
      set_ids: [capacity] int32 — accept-set id per match slot
      blocks:  [capacity] int32 — batch row of each match
      tos:     [capacity] int32 — end offset within the row (one past the
               matching byte, before report adjusts)

    Slots beyond `total` hold zeros. Matches are emitted in scan order
    (row-major: block, then offset), which is exactly the reference's
    required callback order within a block.
    """
    B, L = accepts.shape
    flat = accepts.reshape(-1)
    mask = flat != 0
    idx = jnp.cumsum(mask) - 1  # target slot per element
    total = jnp.sum(mask, dtype=jnp.int32)
    slot = jnp.where(mask, idx, capacity)  # out-of-range → dropped

    set_ids = jnp.zeros(capacity, jnp.int32).at[slot].set(flat, mode="drop")
    flat_idx = jnp.arange(B * L, dtype=jnp.int32)
    blocks = jnp.zeros(capacity, jnp.int32).at[slot].set(flat_idx // L, mode="drop")
    tos = jnp.zeros(capacity, jnp.int32).at[slot].set(flat_idx % L + 1, mode="drop")
    return total, set_ids, blocks, tos


def count_matches(accepts):
    """Total match count (cheap reduction, for counting-only scans and the
    cross-chip psum aggregation path)."""
    return jnp.sum(accepts != 0, dtype=jnp.int32)
