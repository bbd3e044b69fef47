"""Pallas TPU kernels for the hot reduction paths.

`fused_metrics`: ONE HBM pass over (mask int8 [T], plane int32 [T]) producing
exact count, sum (13-bit split pair), min and max — the replacement for the
reference's per-doc collect loop on a metric field (SURVEY.md §3.1), fused so
a StatsAgg costs one column read instead of four reductions. Per-grid-block
int32 partials are combined in XLA under a scoped x64 context (int64 is
unavailable inside Mosaic kernels — and this environment's Mosaic requires
the GLOBAL x64 flag off, which the engine guarantees; see
tantivy_aggregations_tpu/__init__.py).

Hardware notes baked in (probed on this v5e):
- i8 vector compares are unsupported -> mask converts to i32 in-kernel;
- 1-D vector reshapes are unsupported -> operands arrive as [rows, 128];
- scalar VMEM stores are unsupported -> results write lane-selected tiles.

The kernel is exact by construction: the per-block int32 sums of the 13-bit
splits are kept below 2^31 by capping the block row count as a function of
the column's value bound (`max_abs`) — |high-split| <= (max_abs >> 13) + 1
per element (the +1 covers the floor shift of signed limb values), so the
plan-time constraint is blkr * 128 * max(2^13, (max_abs >> 13) + 1) < 2^31.
A 32-row block always satisfies it for any int32 input (32 * 128 * 2^18 =
2^30), so the kernel never becomes unsupported by value range alone.
min/max are pure compares. Vmap-compatible (the msearch batch path vmaps
whole programs; the plane block's index map is batch-invariant, so Mosaic
re-reads the column once per batch, not once per query).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
I32_MAX = 2**31 - 1
I32_MIN = -(2**31)
_MAX_BLKR = 2048  # 2048x128 int32 block = 1MB VMEM per operand (swept: ~1600 rows fastest)


def _overflow_safe_rows(max_abs: int) -> int:
    """Largest block row count whose int32 partial sums of 13-bit splits
    cannot overflow for |v| <= max_abs: blkr * 128 * B < 2^31 with
    B = max(2^13, (max_abs >> 13) + 1)."""
    bound = max(1 << 13, (int(max_abs) >> 13) + 1)
    return (2**31 - 1) // (128 * bound)


def _pick_blkr(rows: int, max_abs: int = (1 << 26) - 1):
    """Largest divisor of `rows` that is a multiple of 32 (the int8 min tile
    is (32, 128) sublanes x lanes), <= _MAX_BLKR, and overflow-safe for
    values |v| <= max_abs; or None if the shape can't be tiled (callers
    fall back to jnp)."""
    cap = min(_MAX_BLKR, _overflow_safe_rows(max_abs))
    best = None
    b = 32
    while b <= cap:
        if rows % b == 0:
            best = b
        b += 32
    return best


def supported(n: int) -> bool:
    # a 32-row block is overflow-safe for ANY int32 values (see module
    # docstring), so supportedness depends only on tileability
    return n % 128 == 0 and _pick_blkr(n // 128) is not None


def _kernel(mask_ref, plane_ref, out_ref):
    m = mask_ref[:].astype(I32) > 0
    v = plane_ref[:]
    s = jnp.where(m, v, 0)
    h13 = s >> 13
    l13 = s - (h13 << 13)
    li = jax.lax.broadcasted_iota(I32, (8, 128), 1)
    out_ref[0] = (jnp.where(li == 0, jnp.sum(jnp.where(m, 1, 0)), 0)
                  + jnp.where(li == 1, jnp.sum(h13), 0)
                  + jnp.where(li == 2, jnp.sum(l13), 0)
                  + jnp.where(li == 3, jnp.min(jnp.where(m, v, I32_MAX)), 0)
                  + jnp.where(li == 4, jnp.max(jnp.where(m, v, I32_MIN)), 0))


def fused_metrics(mask, plane, interpret: bool = False,
                  max_abs: int = (1 << 26) - 1):
    """(count i64, exact sum i64, min i32, max i32) of a masked int32 plane.
    mask: int8/bool [T]; plane: int32 [T]; T % 128 == 0 (loader-padded).
    min/max carry the masked_min_i32/masked_max_i32 sentinel conventions.
    `max_abs` must bound |plane| (static, from column metadata): it caps the
    block size so partial sums stay exact. Default covers 26-bit limb
    planes; pass col.span for direct w planes."""
    n = plane.shape[0]
    rows = n // 128
    blkr = _pick_blkr(rows, max_abs)
    grid = rows // blkr
    # NB: bool.astype under a scoped-x64 trace recurses in this jax build;
    # use the lax primitive directly. The pallas_call itself must ALSO sit
    # under an x64-off scope — a kernel traced inside enable_x64(True)
    # recurses in Mosaic's convert lowering (probed; see memory notes).
    m2 = jax.lax.convert_element_type(mask, jnp.int8).reshape(rows, 128)
    p2 = plane.reshape(rows, 128)
    with jax.enable_x64(False):
        parts = pl.pallas_call(
            _kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((blkr, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((blkr, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid, 8, 128), jnp.int32),
            interpret=interpret,
        )(m2, p2)
    with jax.enable_x64(True):
        cnt = parts[:, 0, 0].astype(jnp.int64).sum()
        tot = ((parts[:, 0, 1].astype(jnp.int64).sum() << 13)
               + parts[:, 0, 2].astype(jnp.int64).sum())
        mn = parts[:, 0, 3].min()
        mx = parts[:, 0, 4].max()
    return cnt, tot, mn, mx
