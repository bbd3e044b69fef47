"""Masked / segmented reduction primitives (device side).

These are the TPU replacements for the reference's per-doc collect loop
(SURVEY.md §3.1 "HOT LOOP"): whole-column masked reductions and scatter
(segment) reductions over bucket slots. All arithmetic is int64 (exact under
XLA's 64-bit emulation); f64 never appears on device.

The default implementations are plain jnp/XLA ops — XLA fuses the mask
select into the reduction. ops/pallas_kernels.py provides fused multi-output
Pallas kernels for the hottest paths; these remain the reference/fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.mono import MONO_NEG_INF, MONO_POS_INF

I64 = jnp.int64


def masked_count(vmask) -> jnp.ndarray:
    return jnp.sum(vmask, dtype=I64)


def masked_min(vals, vmask) -> jnp.ndarray:
    return jnp.min(jnp.where(vmask, vals, MONO_POS_INF))


def masked_max(vals, vmask) -> jnp.ndarray:
    return jnp.max(jnp.where(vmask, vals, MONO_NEG_INF))


def masked_sum_direct(vals, vmask, min_mono: int) -> jnp.ndarray:
    """Exact sum of (v - min_mono) over masked rows; caller adds
    count*min back at harvest. Safe by the loader's sum plan."""
    return jnp.sum(jnp.where(vmask, vals - min_mono, 0), dtype=I64)


def masked_sum_limbs(planes, vmask) -> jnp.ndarray:
    """[N, L] int32 limb planes -> [L] int64 limb sums."""
    return jnp.sum(jnp.where(vmask[:, None], planes.astype(I64), 0), axis=0)


# -- slot (bucket) scatter reductions ----------------------------------------

def slot_count(slot, valid, nslots: int) -> jnp.ndarray:
    return jnp.zeros(nslots, I64).at[slot].add(
        jnp.where(valid, 1, 0).astype(I64), mode="drop")


def slot_min(vals, slot, valid, nslots: int) -> jnp.ndarray:
    return jnp.full(nslots, MONO_POS_INF, I64).at[slot].min(
        jnp.where(valid, vals, MONO_POS_INF), mode="drop")


def slot_max(vals, slot, valid, nslots: int) -> jnp.ndarray:
    return jnp.full(nslots, MONO_NEG_INF, I64).at[slot].max(
        jnp.where(valid, vals, MONO_NEG_INF), mode="drop")


def slot_sum_direct(vals, slot, valid, nslots: int, min_mono: int) -> jnp.ndarray:
    return jnp.zeros(nslots, I64).at[slot].add(
        jnp.where(valid, vals - min_mono, 0), mode="drop")


def slot_sum_limbs(planes, slot, valid, nslots: int) -> jnp.ndarray:
    """[N, L] planes scattered by slot -> [nslots, L] int64."""
    upd = jnp.where(valid[:, None], planes.astype(I64), 0)
    return jnp.zeros((nslots, planes.shape[1]), I64).at[slot].add(
        upd, mode="drop")


def slot_sum_i64(vals_i64, slot, valid, nslots: int) -> jnp.ndarray:
    """Scatter-add of precomputed int64 values (per-doc pre-aggregates)."""
    return jnp.zeros(nslots, I64).at[slot].add(
        jnp.where(valid, vals_i64, 0), mode="drop")


def values_hit_to_doc_mask(hits, doc_id, T: int) -> jnp.ndarray:
    """CSR value-row hits -> doc mask (vectorized replacement for the
    reference's postings seek: SURVEY.md §2.2 T6)."""
    acc = jnp.zeros(T, jnp.int32).at[doc_id].max(
        hits.astype(jnp.int32), mode="drop")
    return acc > 0
