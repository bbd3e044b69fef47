"""Masked / bucketed reduction primitives, v2 (int32-plane engine).

TPU replacements for the reference's per-doc collect loop (SURVEY.md §3.1).
Formulations are chosen from measured behavior of this TPU's XLA:

- elementwise + tree reductions over int32 run near memory speed;
- int64 is emulated (usable for scalars / small arrays, avoided on the
  10M-row axis);
- scatter, gather-by-10M-indices, big sorts and big cumsums are
  catastrophically slow (hundreds of ms) — every hot path below avoids
  them; the slow forms survive only as `slot_*` fallbacks for rare agg
  shapes (sharded meshes run the same prefix/rank fast paths as one chip:
  per-shard OrderedLayouts + psum'd partials).

Core tricks:
- **Two-stage exact sums** (`ts_sum_plane`): split each int32 addend at bit
  13, reduce 1024-row blocks in int32 (overflow-impossible by construction),
  then combine block sums in int64. Exact for any masked int32 plane,
  including signed f64 limb planes.
- **Blocked one-hot bucket reduce** (`dense_bucket_*`): for nb <= ~256
  buckets, compare-select-reduce per 1024-row block — O(rows * nb) VPU work,
  no scatter. Used by histograms and small-cardinality terms.
- **32-block prefix machinery** (`block32_*`): for the high-cardinality
  terms path over a bucket-sorted OrderedLayout: per-32-row block sums, a
  small int64 cumsum (rows/32 elements), then bounds-gather differences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

I32 = jnp.int32
I64 = jnp.int64
BLOCK = 1024
I32_MAX = 2**31 - 1
I64_MAX = 2**63 - 1
I64_MIN = -(2**63)


def _blocks(x):
    return x.reshape(-1, BLOCK)


def ts_count(mask) -> jnp.ndarray:
    """Exact int64 count of a bool/int8 mask."""
    b = _blocks(mask.astype(I32)).sum(axis=1)
    return b.astype(I64).sum()


def ts_sum_plane(plane, mask) -> jnp.ndarray:
    """Exact int64 sum of a masked int32 plane (values in (-2^31, 2^31),
    signed allowed). Two-stage: 13-bit split keeps 1024-row block sums in
    int32 (|hi| < 2^18 * 2^10 = 2^28, lo < 2^13 * 2^10 = 2^23)."""
    v = jnp.where(mask, plane, 0)
    hi = v >> 13
    lo = v - (hi << 13)
    hs = _blocks(hi).sum(axis=1).astype(I64).sum()
    ls = _blocks(lo).sum(axis=1).astype(I64).sum()
    return (hs << 13) + ls


def masked_min_i32(plane, mask) -> jnp.ndarray:
    return jnp.min(jnp.where(mask, plane, I32_MAX))


def masked_max_i32(plane, mask) -> jnp.ndarray:
    return jnp.max(jnp.where(mask, plane, -1))


def wide_recon(hi, lo) -> jnp.ndarray:
    """(hi, lo) monoized int32 planes -> order-isomorphic int64 ("rm"
    domain: rm = w - 2^63)."""
    return (hi.astype(I64) << 32) + (lo.astype(I64) + 2**31)


def masked_min_i64(rm, mask) -> jnp.ndarray:
    return jnp.min(jnp.where(mask, rm, I64_MAX))


def masked_max_i64(rm, mask) -> jnp.ndarray:
    return jnp.max(jnp.where(mask, rm, I64_MIN))


# ---------------------------------------------------------------------------
# Blocked one-hot bucket reductions (nb small)
# ---------------------------------------------------------------------------

def dense_bucket_counts(bid, valid, nb: int) -> jnp.ndarray:
    """[rows] int32 bucket ids (+validity) -> [nb] int64 counts.
    Out-of-range ids (e.g. -1) simply match nothing."""
    b2 = _blocks(bid)
    m2 = _blocks(valid.astype(jnp.bool_)) if valid.dtype != jnp.bool_ \
        else _blocks(valid)
    oh = (b2[:, :, None] == jnp.arange(nb, dtype=I32)[None, None, :]) \
        & m2[:, :, None]
    per_block = jnp.where(oh, 1, 0).sum(axis=1)  # [G, nb] int32, <= 1024
    return per_block.astype(I64).sum(axis=0)


def dense_bucket_sum(bid, valid, plane, nb: int) -> jnp.ndarray:
    """Exact per-bucket int64 sums of a masked int32 plane via blocked
    one-hot + 13-bit split."""
    b2 = _blocks(bid)
    m2 = _blocks(valid.astype(jnp.bool_)) if valid.dtype != jnp.bool_ \
        else _blocks(valid)
    v2 = _blocks(plane)
    hi = v2 >> 13
    lo = v2 - (hi << 13)
    oh = (b2[:, :, None] == jnp.arange(nb, dtype=I32)[None, None, :]) \
        & m2[:, :, None]
    hs = jnp.where(oh, hi[:, :, None], 0).sum(axis=1).astype(I64).sum(axis=0)
    ls = jnp.where(oh, lo[:, :, None], 0).sum(axis=1).astype(I64).sum(axis=0)
    return (hs << 13) + ls


def dense_bucket_min(bid, valid, plane, nb: int) -> jnp.ndarray:
    b2 = _blocks(bid)
    m2 = _blocks(valid.astype(jnp.bool_)) if valid.dtype != jnp.bool_ \
        else _blocks(valid)
    v2 = _blocks(plane)
    oh = (b2[:, :, None] == jnp.arange(nb, dtype=I32)[None, None, :]) \
        & m2[:, :, None]
    dt_max = I32_MAX if plane.dtype == I32 else I64_MAX
    return jnp.where(oh, v2[:, :, None], dt_max).min(axis=1).min(axis=0)


def dense_bucket_max(bid, valid, plane, nb: int) -> jnp.ndarray:
    b2 = _blocks(bid)
    m2 = _blocks(valid.astype(jnp.bool_)) if valid.dtype != jnp.bool_ \
        else _blocks(valid)
    v2 = _blocks(plane)
    oh = (b2[:, :, None] == jnp.arange(nb, dtype=I32)[None, None, :]) \
        & m2[:, :, None]
    dt_min = -(2**31) if plane.dtype == I32 else I64_MIN
    return jnp.where(oh, v2[:, :, None], dt_min).max(axis=1).max(axis=0)


# ---------------------------------------------------------------------------
# 32-block prefix machinery (high-cardinality terms over OrderedLayout)
# ---------------------------------------------------------------------------

def block32_counts(mask) -> jnp.ndarray:
    """[R] mask -> [R/32] int32 per-32-row counts."""
    return mask.astype(I32).reshape(-1, 32).sum(axis=1)


def block32_sums(plane, mask) -> jnp.ndarray:
    """[R] masked int32 plane -> [R/32] int64 exact per-32-row sums
    (32 * 2^31 overflows int32, so split at 13 bits then widen)."""
    v = jnp.where(mask, plane, 0).reshape(-1, 32)
    hi = v >> 13
    lo = v - (hi << 13)
    return (hi.sum(axis=1).astype(I64) << 13) + lo.sum(axis=1).astype(I64)


def prefix_diff(block_vals, bounds32) -> jnp.ndarray:
    """Exclusive prefix over [R/32] block values, gathered at 32-unit bucket
    bounds [card+1] -> per-bucket totals [card] int64."""
    pref = jnp.cumsum(block_vals.astype(I64))
    pref = jnp.concatenate([jnp.zeros(1, I64), pref])
    at = pref[bounds32]
    return at[1:] - at[:-1]


# ---------------------------------------------------------------------------
# Scatter fallbacks (sharded mesh path / rare shapes; fast on XLA:CPU)
# ---------------------------------------------------------------------------

def slot_count(slot, valid, nslots: int) -> jnp.ndarray:
    return jnp.zeros(nslots, I64).at[slot].add(
        jnp.where(valid, 1, 0).astype(I64), mode="drop")


def slot_min(vals, slot, valid, nslots: int) -> jnp.ndarray:
    big = I32_MAX if vals.dtype == I32 else I64_MAX
    return jnp.full(nslots, big, vals.dtype).at[slot].min(
        jnp.where(valid, vals, big), mode="drop")


def slot_max(vals, slot, valid, nslots: int) -> jnp.ndarray:
    small = -(2**31) if vals.dtype == I32 else I64_MIN
    return jnp.full(nslots, small, vals.dtype).at[slot].max(
        jnp.where(valid, vals, small), mode="drop")


def slot_sum(vals, slot, valid, nslots: int) -> jnp.ndarray:
    return jnp.zeros(nslots, I64).at[slot].add(
        jnp.where(valid, vals.astype(I64), 0), mode="drop")


def values_hit_to_doc_mask(hits, doc_id, T: int) -> jnp.ndarray:
    """CSR value-row hits -> doc mask (scatter-or; multi-valued query fields
    only — single-cardinality fields are dense and never come here)."""
    acc = jnp.zeros(T, jnp.int32).at[doc_id].max(
        hits.astype(jnp.int32), mode="drop")
    return acc > 0
