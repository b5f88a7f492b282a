"""Teddy-style bucketed multi-literal table build.

Reference analogues:
- bucket assignment / mask packing: src/fdr/teddy_compile.cpp
  (assignStringsToBuckets :624, pack :224); byte-exact tables take the
  place of the reference's nibble masks because the TPU analogue of pshufb
  (tpu.dynamic_gather along lanes) handles 128-entry tables natively, so
  a 256-entry byte table costs two gathers + one select — no nibble split
  needed, and byte-exact tables saturate far later than nibble tables.
- masked (caseless) literal bytes: src/hwlm/hwlm_literal.h msk/cmp.

The plan scales with the factor count: more factors → more suffix
positions (M) and more buckets (bitmask words W), trading kernel cost for
candidate precision.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from .literals import Factor

MAX_M = 8  # deepest suffix AND chain


def plan_shape(n_factors: int) -> Tuple[int, int, int]:
    """(M, B, W): suffix depth, bucket count, bitmask words (B = 32*W).

    The filter kernel costs M*W table lookups per corpus byte, but a low
    candidate rate is what keeps the sparse extraction and confirm
    stages trivial: at the 10k scale, W=4 (128 buckets) measured 6.7e-6
    vs 1.2e-3 for W=2, and the extraction's chunk-gather cost scales
    with the rate — so the wider table wins end to end."""
    if n_factors <= 48:
        return 4, 32, 1
    if n_factors <= 300:
        return 6, 32, 1
    if n_factors <= 2500:
        return 8, 64, 2
    return 8, 128, 4


_PROBE_BYTES = 1 << 19


def _pick_depth(masks: np.ndarray, B: int, min_m: int, max_m: int) -> int:
    """Smallest suffix depth whose empirical candidate rate on printable
    noise is within 2x of the full-depth floor (capped at 5e-4 absolute).

    Per-position pass events are correlated, so a density-product model
    wildly overestimates; a ~0.5 MB probe filter run costs milliseconds
    at compile time and measures the truth. The floor is relative
    because near-factor byte runs in the noise set an irreducible rate
    no depth removes (reference analogue: teddy_compile's bucket cost
    heuristics)."""
    if max_m <= min_m:
        return max_m
    rng = np.random.default_rng(0)
    probe = (32 + rng.integers(0, 95, size=_PROBE_BYTES)).astype(np.uint8)
    masks_i32 = (masks & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    from ..runtime.smallwrite import teddy_filter_host

    def rate(M: int) -> float:
        pos, _w = teddy_filter_host(
            probe, np.ascontiguousarray(masks_i32[:M])
        )
        return len(pos) / _PROBE_BYTES

    floor = rate(max_m)
    threshold = min(max(2.0 * floor, 1e-5), 5e-4)
    for M in range(min_m, max_m):
        if rate(M) <= threshold:
            return M
    return max_m


@dataclasses.dataclass
class TeddyPlan:
    masks: np.ndarray  # [M, W, 256] int32 bucket bitmasks
    m: int
    num_buckets: int
    words: int
    factors: List[Factor]
    bucket_of: List[int]  # factor index -> bucket
    buckets: List[List[int]]  # bucket -> factor indices
    # single-word gate tables for the two-stage device filter (see
    # build_gate_masks), or None when gating does not pay
    gate_masks: "np.ndarray | None" = None

    @property
    def max_len(self) -> int:
        return max((len(f) for f in self.factors), default=0)


def _bucket_noise_rates(masks: np.ndarray, probe: np.ndarray) -> np.ndarray:
    """Per-bucket full-depth AND-hit rate of the filter on a noise probe.

    Used to rank buckets for the gate's hot/cold split: a handful of
    buckets (masked-class or short-factor tails whose per-offset byte
    sets are wide) carry ~95% of the filter's false-candidate rate on
    printable noise; the rest are so tight that OR-merging them 4-7x
    costs almost nothing."""
    M, W, _ = masks.shape
    n = len(probe)
    rates = np.zeros(W * 32)
    for w in range(W):
        tab = masks[:, w].view(np.uint32)
        a = tab[0][probe]
        for m in range(1, M):
            sh = np.zeros(n, dtype=np.uint32)
            sh[m:] = tab[m][probe[:-m]]
            a = a & sh
        for bit in range(32):
            rates[w * 32 + bit] = ((a >> bit) & 1).mean()
    return rates


# enable the gate only when its noise candidate rate clears the full
# filter's by at most this factor (a leaky gate feeds stage 2 too many
# rows to be worth its own kernel pass)
_GATE_MAX_RATE_BLOWUP = 4.0
_GATE_MAX_RATE_ABS = 2e-3


def build_gate_masks(masks: np.ndarray) -> "np.ndarray | None":
    """Single-word hot/cold gate tables for the two-stage device filter.

    The full filter costs 2 + M*W lane-gathers per kernel vreg (the
    measured v5e ceiling at M=5/W=4 is ~9.6 GB/s); a full-depth gate
    over ONE mask word costs 2 + M gathers (~24 GB/s) and feeds the
    full kernel only the corpus rows it cannot clear. Naively OR-merging
    the 32*W buckets into 32 saturates (candidate rate plateaus ~100x
    above the full filter's — measured on the 10k bench ruleset),
    because a few "hot" buckets with wide per-offset byte sets dominate
    and poison every merge. The split that works (measured: gate rate
    within 6% of the full filter on iid printable noise, identical on
    low-entropy corpora): keep the hottest H buckets EXACT in their own
    gate bits and OR-merge only the cold remainder, in tail-similarity
    order, into the other 32-H bits.

    Reference analogue: the two-tier filter economics of Teddy's m1
    first pass feeding exact confirm (src/fdr/teddy.c:248), with the
    tier split chosen by measured bucket cost like
    teddy_compile.cpp's bucket heuristics.

    Returns [M, 1, 256] int32 gate tables (a per-position superset of
    the full filter by construction), or None when W < 2 or the gate
    is too leaky to pay for itself.
    """
    M, W, _ = masks.shape
    if W < 2:
        return None  # full filter already costs 2 + M gathers
    B = W * 32
    rng = np.random.default_rng(0)
    probe = (32 + rng.integers(0, 95, size=_PROBE_BYTES)).astype(np.uint8)
    rates = _bucket_noise_rates(masks, probe)
    total = rates.sum()
    order = np.argsort(-rates)
    # hot set: smallest prefix covering 90% of the noise rate, capped
    # so the cold merge still has >= 16 superbuckets to spread over
    H = 1
    while H < 16 and rates[order[:H]].sum() < 0.9 * total:
        H += 1
    hot = order[:H]
    hot_set = set(int(j) for j in hot)
    cold = [j for j in range(B) if j not in hot_set]
    G = 32 - H
    per = -(-len(cold) // G)
    u = masks.view(np.uint32)
    gate = np.zeros((M, 1, 256), np.uint32)
    for k, j in enumerate(hot):
        w, bit = divmod(int(j), 32)
        gate[:, 0, :] |= (((u[:, w, :] >> bit) & 1) << np.uint32(k))
    for k, j in enumerate(cold):
        w, bit = divmod(int(j), 32)
        gate[:, 0, :] |= (
            ((u[:, w, :] >> bit) & 1) << np.uint32(H + k // per)
        )
    gate = gate.view(np.int32)

    def _or_rate(mk: np.ndarray) -> float:
        n = len(probe)
        acc = None
        for w in range(mk.shape[1]):
            tab = mk[:, w].view(np.uint32)
            a = tab[0][probe]
            for m in range(1, M):
                sh = np.zeros(n, dtype=np.uint32)
                sh[m:] = tab[m][probe[:-m]]
                a = a & sh
            acc = a if acc is None else (acc | a)
        return float((acc != 0).mean())

    full_rate = _or_rate(masks)
    gate_rate = _or_rate(gate)
    if gate_rate > max(_GATE_MAX_RATE_BLOWUP * full_rate,
                       _GATE_MAX_RATE_ABS):
        return None
    return gate


def build_teddy(factors: Sequence[Factor]) -> TeddyPlan:
    n = len(factors)
    M, B, W = plan_shape(n)
    # bucket by (length class, reversed tail): factors sharing suffix
    # bytes land together, keeping each bucket's per-position byte-set
    # unions tight — the candidate rate is the product of those unions'
    # densities (reference: assignStringsToBuckets packs by a
    # similar-cost heuristic, src/fdr/teddy_compile.cpp:624). Short
    # factors sort together so their all-pass padding rows poison few
    # buckets.
    def tail_key(i: int):
        f = factors[i]
        rev = []
        for m in range(M):
            if m < len(f):
                a = f.atoms[-1 - m]
                rev.append((int(a.value), int(a.mask)))
            else:
                rev.append((256, 0))  # short-factor sentinel
        return (min(len(f), M), tuple(rev), f.key())

    order = sorted(range(n), key=tail_key)
    buckets: List[List[int]] = [[] for _ in range(B)]
    bucket_of = [0] * n
    per = (n + B - 1) // B
    for k, fi in enumerate(order):
        b = min(k // max(per, 1), B - 1)
        buckets[b].append(fi)
        bucket_of[fi] = b

    bytes_ = np.arange(256, dtype=np.int64)
    masks = np.zeros((M, W, 256), dtype=np.int64)
    for fi, f in enumerate(factors):
        b = bucket_of[fi]
        w, bit = divmod(b, 32)
        for m in range(M):
            if m < len(f):
                a = f.atoms[-1 - m]
                hit = (bytes_ & a.mask) == a.value
            else:
                hit = np.ones(256, dtype=bool)  # short factor: always pass
            masks[m, w, hit] |= 1 << bit
    # adaptive suffix depth: the kernel costs M*W lookups per byte, so
    # trim M to the smallest depth whose analytic candidate-rate estimate
    # (product of per-position bucket densities, under uniform AND
    # printable-ASCII byte distributions) stays tiny. On the 10k bench
    # ruleset this picks M=6 at the same 6.7e-6 measured rate as M=8.
    M = _pick_depth(masks, B, min_m=min(4, M), max_m=M)
    masks = masks[:M]
    masks_i32 = (masks & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    return TeddyPlan(
        masks=masks_i32,
        m=M,
        num_buckets=B,
        words=W,
        factors=list(factors),
        bucket_of=bucket_of,
        buckets=buckets,
        gate_masks=build_gate_masks(masks_i32),
    )
