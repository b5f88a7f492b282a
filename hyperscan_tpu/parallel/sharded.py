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


def _as_shard_mesh(mesh: Mesh) -> Mesh:
    """Accept any user mesh: the scan is pure data-parallel, so an
    arbitrary mesh flattens to a 1-D mesh named SHARD_AXIS over the same
    devices (the internal psum/all_gather axis name). A mesh that
    already carries SHARD_AXIS passes through unchanged so cached jits
    keyed on it stay hot."""
    if SHARD_AXIS in mesh.axis_names:
        return mesh
    return Mesh(mesh.devices.reshape(-1), (SHARD_AXIS,))


def make_multihost_mesh(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Mesh:
    """1-D mesh over ALL global devices of a multi-host slice.

    Initializes ``jax.distributed`` (DCN control plane) when coordinator
    arguments are given or the standard cluster env vars are present,
    then builds the mesh over ``jax.devices()`` — which after init spans
    every host's chips. Collectives lower to ICI within a slice and DCN
    across slices (SURVEY.md §5.8). Each process then contributes its
    process-local block batch via ``global_shard_arrays``; no host ever
    materializes the full corpus. Single-process: identical to
    ``make_mesh()``.
    """
    import os

    want_init = (
        coordinator_address is not None
        or "JAX_COORDINATOR_ADDRESS" in os.environ
        or "COORDINATOR_ADDRESS" in os.environ
    )
    if want_init:
        # probe the distributed client WITHOUT initializing the XLA
        # backend (jax.process_count() would, and distributed init is
        # rejected afterwards); the private-module probe falls back to
        # is_initialized when available
        try:
            from jax._src import distributed as _dist

            already = _dist.global_state.client is not None
        except Exception:
            already = bool(getattr(jax.distributed, "is_initialized",
                                   lambda: False)())
        if not already:
            kwargs = {}
            if coordinator_address is not None:
                kwargs["coordinator_address"] = coordinator_address
            if num_processes is not None:
                kwargs["num_processes"] = num_processes
            if process_id is not None:
                kwargs["process_id"] = process_id
            jax.distributed.initialize(**kwargs)
    return Mesh(np.asarray(jax.devices()), (SHARD_AXIS,))


def global_shard_arrays(mesh: Mesh, data: np.ndarray, lengths: np.ndarray):
    """Assemble globally-sharded device arrays from process-local batch
    rows. Multi-host: each process passes only ITS rows (1/num_processes
    of the global batch, already padded to the per-process multiple) and
    the returned jax.Arrays address the full global batch without any
    host holding it. Single-process: a plain device_put with the sharded
    layout (the fast path the tests exercise)."""
    shard = NamedSharding(mesh, P(SHARD_AXIS))
    shard1 = NamedSharding(mesh, P(SHARD_AXIS))
    if jax.process_count() > 1:
        gd = jax.make_array_from_process_local_data(shard, data)
        gl = jax.make_array_from_process_local_data(shard1, lengths)
        return gd, gl
    return (jax.device_put(jnp.asarray(data), shard),
            jax.device_put(jnp.asarray(lengths), shard1))


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
    mesh = _as_shard_mesh(mesh)
    fn = _jit_sharded(mesh, 0, True)
    gd, gl = global_shard_arrays(mesh, data, lengths)
    out = fn(
        jnp.asarray(engine.trans),
        jnp.asarray(engine.byte_to_class.astype(np.int32)),
        jnp.asarray(engine.accept_id),
        jnp.asarray(engine.accept_eod_id),
        jnp.int32(engine.start_state),
        gd,
        gl,
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

    mesh = _as_shard_mesh(mesh)
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
    mesh = _as_shard_mesh(mesh)
    fn = _jit_sharded(mesh, capacity, False)
    gd, gl = global_shard_arrays(mesh, data, lengths)
    return fn(
        jnp.asarray(engine.trans),
        jnp.asarray(engine.byte_to_class.astype(np.int32)),
        jnp.asarray(engine.accept_id),
        jnp.asarray(engine.accept_eod_id),
        jnp.int32(engine.start_state),
        gd,
        gl,
    )


# --------------------------------------------------------------------------
# Product-path sharding: the real literal pipeline (fused teddy filter +
# hash confirm) data-parallel over the mesh. Blocks partition contiguously
# across chips; each chip filters+confirms its shard; fixed-capacity
# confirmed-pair buffers all_gather over ICI; host stages run per shard
# group (BASELINE north star: >=80 % linear scaling of the real path).
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _jit_sharded_confirm(lit_key: int, mesh: Mesh, M: int, W: int,
                         n_cells: int, cap1: int, cap2: int,
                         interpret: bool, use_classes: bool):
    from ..ops.teddy import _LITS, filter_confirm_body
    from ..runtime.lit_runtime import confirm_device_tables

    groups = confirm_device_tables(_LITS[lit_key])
    body = filter_confirm_body(groups, M, W, n_cells, cap1, cap2,
                               interpret, use_classes=use_classes)
    n_ftabs = 2 if use_classes else 1

    def per_dev(rows, nv, h_tables, f_tables, *ftabs):
        meta, p2 = body(rows[0], nv[0, 0], h_tables, f_tables, *ftabs)
        g = lambda x: jax.lax.all_gather(x, SHARD_AXIS)  # noqa: E731
        return g(meta), g(p2)

    fn = shard_map(
        per_dev,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(), P())
        + tuple(P() for _ in range(n_ftabs)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def partition_blocks(blocks, n_shards: int):
    """Contiguous block partition balancing total bytes per shard."""
    total = sum(len(b) for b in blocks)
    target = max(1, -(-total // n_shards))
    groups = []
    cur = []
    acc = 0
    for i, b in enumerate(blocks):
        cur.append(i)
        acc += len(b)
        if acc >= target and len(groups) < n_shards - 1:
            groups.append(cur)
            cur, acc = [], 0
    groups.append(cur)
    while len(groups) < n_shards:
        groups.append([])
    return groups


def sharded_literal_confirm(lit, blocks, mesh: Mesh, capacity: int):
    """Fused filter+confirm of a block batch sharded across the mesh.

    Returns per-shard (block_indices, fid_array, flat_pos_array,
    corpus_array, starts, ends) — hash-matched pairs, to be exact-verified
    and window-validated by the host stages per shard group.
    """
    import numpy as np

    mesh = _as_shard_mesh(mesh)

    from ..ops.teddy import (
        ROWS_PER_CELL,
        _lit_key,
        bucket_up,
        corpus_to_rows,
        get_capacity_hint,
        set_capacity_hint,
    )

    D = mesh.devices.size
    groups_blocks = partition_blocks(blocks, D)
    shard_meta = []
    corpora = []
    for g in groups_blocks:
        lens = np.asarray([len(blocks[i]) for i in g], dtype=np.int64)
        starts = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            np.cumsum(lens[:-1], out=starts[1:])
        ends = starts + lens
        corpus = (
            np.concatenate(
                [np.frombuffer(blocks[i], np.uint8) for i in g]
            )
            if len(g) and int(lens.sum())
            else np.zeros(0, np.uint8)
        )
        corpora.append(corpus)
        shard_meta.append((g, starts, ends))

    cell = ROWS_PER_CELL * 128
    # match corpus_to_rows' jit-shape bucketing so every shard's padded
    # row count fits the shared buffer
    n_cells = bucket_up(max(1, max(-(-c.shape[0] // cell) for c in corpora)))
    rows = np.zeros((D, 1 + n_cells * ROWS_PER_CELL, 128), np.uint8)
    n_valid = np.zeros((D, 1, 1), np.int32)
    for d, corpus in enumerate(corpora):
        r = corpus_to_rows(corpus)
        rows[d, : r.shape[0]] = r
        n_valid[d, 0, 0] = corpus.shape[0]

    from ..ops.teddy import dev_filter_tables

    ftabs, h_tables, f_tables = dev_filter_tables(lit)
    M, W = int(lit.masks.shape[0]), int(lit.masks.shape[1])
    interpret = jax.default_backend() == "cpu"
    key = _lit_key(lit)

    cap1 = capacity
    cap2 = max(1 << 12, capacity // 4)
    hint = get_capacity_hint(lit, "teddy_sh")
    if hint:
        cap1 = max(cap1, hint[0])
        cap2 = max(cap2, hint[1])
    if jax.process_count() > 1:
        # multi-host: every process passes the same global block list
        # (replicated input contract); each process materializes only its
        # addressable shards of the leading (device) axis. Collective
        # outputs are all_gather'd to replicated, so the host stages run
        # identically on every process (SURVEY §5.8 DCN plan).
        shard = NamedSharding(mesh, P(SHARD_AXIS))
        rows_j = jax.make_array_from_callback(
            rows.shape, shard, lambda idx: rows[idx])
        nv_j = jax.make_array_from_callback(
            n_valid.shape, shard, lambda idx: n_valid[idx])
        # replicated table operands must not be committed to one local
        # device in multi-process jit; hand jit host arrays instead
        h_tables = tuple(np.asarray(x) for x in h_tables)
        f_tables = tuple(np.asarray(x) for x in f_tables)
        ftabs = tuple(np.asarray(x) for x in ftabs)
    else:
        rows_j = jnp.asarray(rows)
        nv_j = jnp.asarray(n_valid)
    while True:
        fn = _jit_sharded_confirm(key, mesh, M, W, n_cells, cap1, cap2,
                                  interpret, len(ftabs) == 2)
        meta, p2 = fn(rows_j, nv_j, h_tables, f_tables, *ftabs)
        meta = np.asarray(meta)
        m2 = meta[:, 2:]
        t1 = int(meta[:, 0].max())
        h1 = int(meta[:, 1].max())
        t2 = int(meta[:, 2].max())
        h2 = int(meta[:, 3].max())
        # chunk capacities (cap//16) overflow independently of the
        # totals: spread candidates hit them at one per chunk, and
        # sparse_extract silently clamps past them
        if (t1 <= cap1 and t2 <= cap2
                and h1 <= max(64, cap1 // 16)
                and h2 <= max(64, cap2 // 16)):
            break
        if t1 > cap1:
            cap1 = 1 << (t1 - 1).bit_length()
        if h1 > max(64, cap1 // 16):
            cap1 = 16 * (1 << (h1 - 1).bit_length())
        if t2 > cap2:
            cap2 = 1 << (t2 - 1).bit_length()
        if h2 > max(64, cap2 // 16):
            cap2 = 16 * (1 << (h2 - 1).bit_length())
    set_capacity_hint(lit, "teddy_sh", cap1, cap2)

    from ..runtime.lit_runtime import expand_confirm_classes

    p2 = np.asarray(p2)  # [D, 3, cap2]
    out = []
    for d, (g, starts, ends) in enumerate(shard_meta):
        k = min(int(m2[d, 0]), cap2)
        cls = p2[d, 1, :k].astype(np.int64) - 1
        pos = p2[d, 2, :k].astype(np.int64)
        keep = cls >= 0
        fid, pos = expand_confirm_classes(lit, cls[keep], pos[keep])
        out.append((g, fid, pos, corpora[d], starts, ends))
    return out
