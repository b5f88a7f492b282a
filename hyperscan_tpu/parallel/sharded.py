"""Multi-chip scanning: corpus shards data-parallel over a device mesh.

Reference analogue: none — the reference is single-threaded per scan and
scales by running one scratch per core (SURVEY.md §2.11). The TPU-native
replacement (BASELINE.json north star):

- pattern database (DFA tables, literal masks) **replicated** per chip,
- corpus blocks / streams **sharded** across chips along the batch axis,
- match counts aggregated with ``psum``,
- match tuples gathered from fixed-capacity per-chip buffers with
  ``all_gather`` over ICI.

Everything here works identically on a real TPU slice and on the virtual
8-device CPU mesh used by tests (xla_force_host_platform_device_count).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.dfa import dfa_scan_batch
from ..ops.match import extract_matches

SHARD_AXIS = "shards"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (SHARD_AXIS,))


def _count_step(trans, b2c, accept_id, accept_eod_id, start_state, data, lengths):
    """Per-shard scan + global psum of the match count.

    The DB arrays arrive replicated; data/lengths arrive as this chip's
    shard of the block batch. Returns the replicated global count.
    """
    accepts, _finals = dfa_scan_batch(
        trans, b2c, accept_id, start_state, data, lengths
    )
    local = jnp.sum(accepts != 0, dtype=jnp.int32)
    return jax.lax.psum(local, SHARD_AXIS)


def _match_step(capacity: int):
    """Per-shard scan + extraction + all_gather of match buffers."""

    def step(trans, b2c, accept_id, accept_eod_id, start_state, data, lengths):
        accepts, finals = dfa_scan_batch(
            trans, b2c, accept_id, start_state, data, lengths
        )
        total, set_ids, blocks, tos = extract_matches(accepts, capacity)
        eod_sets = accept_eod_id[finals]
        # gather fixed-capacity per-chip buffers across the mesh (ICI)
        g = lambda x: jax.lax.all_gather(x, SHARD_AXIS)  # noqa: E731
        return g(total), g(set_ids), g(blocks), g(tos), g(eod_sets)

    return step


@functools.lru_cache(maxsize=64)
def _jit_sharded(mesh: Mesh, capacity: int, counts_only: bool):
    repl = P()
    shard = P(SHARD_AXIS)
    step = _count_step if counts_only else _match_step(capacity)
    out_specs = repl if counts_only else (repl, repl, repl, repl, repl)
    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(repl, repl, repl, repl, repl, shard, shard),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)


def pad_batch_for_mesh(
    blocks: Sequence[bytes], mesh: Mesh, pad_len: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack blocks into [B, L] uint8 + [B] lengths, padding the batch to a
    multiple of the mesh size (empty rows scan as no-ops)."""
    n = mesh.devices.size
    B = max(((len(blocks) + n - 1) // n) * n, n)
    data = np.zeros((B, pad_len), dtype=np.uint8)
    lengths = np.zeros((B,), dtype=np.int32)
    for i, blk in enumerate(blocks):
        a = np.frombuffer(blk, dtype=np.uint8)
        data[i, : len(a)] = a
        lengths[i] = len(a)
    return data, lengths


def sharded_scan_counts(engine, data: np.ndarray, lengths: np.ndarray,
                        mesh: Mesh) -> int:
    """Global match count of one engine over a sharded block batch."""
    fn = _jit_sharded(mesh, 0, True)
    out = fn(
        jnp.asarray(engine.trans),
        jnp.asarray(engine.byte_to_class.astype(np.int32)),
        jnp.asarray(engine.accept_id),
        jnp.asarray(engine.accept_eod_id),
        jnp.int32(engine.start_state),
        jnp.asarray(data),
        jnp.asarray(lengths),
    )
    return int(out)


def sharded_teddy_count(corpus: np.ndarray, masks: np.ndarray,
                        mesh: Mesh) -> int:
    """Literal-filter candidate count over a corpus sharded across the
    mesh: masks replicated, corpus segments data-parallel with one
    halo row carried from the previous segment, counts psum'd
    (BASELINE config 3: Teddy multi-literal with counts allreduced)."""
    import jax

    from ..ops.teddy import ROWS_PER_CELL, _make_kernel

    D = mesh.devices.size
    M, W = int(masks.shape[0]), int(masks.shape[1])
    R = ROWS_PER_CELL
    cell_bytes = R * 128
    n = corpus.shape[0]
    seg = max(cell_bytes, -(-n // (D * cell_bytes)) * cell_bytes)
    cells_per = seg // cell_bytes

    rows = np.zeros((D, 1 + cells_per * R, 128), dtype=np.uint8)
    n_valid = np.zeros((D, 1, 1), dtype=np.int32)
    for d in range(D):
        lo, hi = d * seg, min(n, (d + 1) * seg)
        if hi > lo:
            part = corpus[lo:hi]
            rows[d, 1 : 1 + (-(-len(part) // 128))].reshape(-1)[: len(part)] \
                = part
            n_valid[d, 0, 0] = len(part)
        if lo > 0:  # halo: last 128 bytes of the previous segment
            rows[d, 0] = np.frombuffer(
                corpus[lo - 128 : lo].tobytes().rjust(128, b"\0"), np.uint8
            )

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() == "cpu"

    def per_device(rows_d, masks_d, nv_d):
        rows_d = rows_d[0]
        outs = pl.pallas_call(
            _make_kernel(M, W, R),
            interpret=interpret,
            grid=(cells_per,),
            out_shape=tuple(
                jax.ShapeDtypeStruct((cells_per * R, 128), jnp.int32)
                for _ in range(W)
            ),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (i * (R // 8), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, W, 256), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(W)
            ),
        )(rows_d, rows_d[1:], masks_d)
        outs = outs if isinstance(outs, tuple) else (outs,)
        nz = outs[0]
        for o in outs[1:]:
            nz = nz | o
        posn = jnp.arange(cells_per * R * 128, dtype=jnp.int32).reshape(
            cells_per * R, 128
        )
        local = jnp.sum(
            ((nz != 0) & (posn < nv_d[0, 0, 0])).astype(jnp.int32)
        )
        return jax.lax.psum(local, SHARD_AXIS)

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(), P(SHARD_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    out = jax.jit(fn)(
        jnp.asarray(rows), jnp.asarray(masks), jnp.asarray(n_valid)
    )
    return int(out)


def sharded_scan_matches(engine, data: np.ndarray, lengths: np.ndarray,
                         mesh: Mesh, capacity: int = 4096):
    """Match tuples of one engine over a sharded block batch.

    Returns (total_per_chip [n], set_ids [n, cap], blocks [n, cap] local row
    index, tos [n, cap], eod_sets [n, rows/chip]). Callers translate local
    rows to global rows with chip*rows_per_chip + row.
    """
    fn = _jit_sharded(mesh, capacity, False)
    return fn(
        jnp.asarray(engine.trans),
        jnp.asarray(engine.byte_to_class.astype(np.int32)),
        jnp.asarray(engine.accept_id),
        jnp.asarray(engine.accept_eod_id),
        jnp.int32(engine.start_state),
        jnp.asarray(data),
        jnp.asarray(lengths),
    )
