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


# ---------------------------------------------------------------------------
# chain_counts128: fused query-chain mask -> per-128-row match counts
# ---------------------------------------------------------------------------
#
# The rank-percentile path needs, per query, the count of chain-matched rows
# in every 128-row run of the value-ordered layout (SURVEY.md §3.4's rank
# machinery). The XLA formulation (materialize the [R] mask, reshape-sum,
# cumsum) costs three+ HBM round trips of the full row axis PER QUERY in an
# msearch batch. This kernel fuses mask evaluation (delegated to the same
# trace-time `eval_mask` logic via a caller-supplied `mask_of` callback) with
# the per-run reduction, and carries a custom_vmap rule: a B-query batch
# reads each plane block ONCE and loops the B parameter vectors over it in
# VMEM — HBM traffic drops from O(B * R) to O(R + B * R/128).
#
# Planes arrive TRANSPOSED ([128, R/128] group-major: the g-th 128-row run
# of the layout is COLUMN g): the per-run reduction is then a cross-SUBLANE
# sum, which Mosaic lowers to a short rotate-add tree — the row-major form
# needs a cross-lane pack that costs an MXU dot per 128 rows (measured
# slower). Swept on the v5e at 10M rows x 64 queries: ~25ms regardless of
# block size / unrolling / plane count — per-query VPU compare cost is the
# floor, HBM traffic is negligible.

_CC_BLKC = 512  # lane-groups per grid block (swept 256..1536: flat)


def _cc_pick_blkc(g: int):
    """Largest multiple of 128 that divides g (<= _CC_BLKC), or None.
    Row counts are PAD_BLOCK-padded (32768 = 256 groups), so 256 always
    divides."""
    best = None
    b = 128
    while b <= _CC_BLKC:
        if g % b == 0:
            best = b
        b += 128
    return best


def chain_counts_supported(n_rows: int) -> bool:
    return (n_rows > 0 and n_rows % 16384 == 0
            and _cc_pick_blkc(n_rows // 128) is not None)


def transpose_groups(plane_host, group: int = 128):
    """[R] host array -> [group, R/group] group-major transposed copy (the
    g-th `group`-row run is column g), the layout chain_counts expects."""
    import numpy as np
    return np.ascontiguousarray(plane_host.reshape(-1, group).T)


def _chain_counts_batched(pmat, planes, mask_of, interpret: bool):
    """pmat: int32 [B, P] query params; planes: dict name -> [128, G]
    transposed int32/int8 (see transpose_groups). Returns [B, G] int32
    counts of mask_of-matched rows per 128-row group."""
    names = sorted(planes)
    G = planes[names[0]].shape[1]
    blkc = _cc_pick_blkc(G)
    grid = G // blkc
    B, P = pmat.shape

    def kernel(pref, *refs):
        out_ref = refs[-1]
        # i8 vector compares are unsupported on this Mosaic -> widen loads
        vals = {nm: (jax.lax.convert_element_type(refs[i][:], I32)
                     if refs[i].dtype == jnp.int8 else refs[i][:])
                for i, nm in enumerate(names)}
        biota = jax.lax.broadcasted_iota(I32, (B, blkc), 0)
        acc = jnp.zeros((B, blkc), I32)
        # static unroll over the batch: params become compile-time-scheduled
        # SMEM reads (a dynamic fori_loop index serializes on the scalar
        # unit), and dynamic single-sublane stores are unsupported anyway —
        # rows select into the [B, blkc] accumulator, stored once
        for b in range(B):
            pv = [pref[b, j] for j in range(P)]
            m = mask_of(vals, pv)  # bool [128, blkc]
            s = jnp.where(m, 1, 0).sum(axis=0, keepdims=True)  # [1, blkc]
            acc = jnp.where(biota == b, s, acc)
        out_ref[:, :] = acc

    in_specs = [pl.BlockSpec((B, P), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)]
    in_specs += [pl.BlockSpec((128, blkc), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
                 for _ in names]
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((B, blkc), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, G), jnp.int32),
            interpret=interpret,
        )(pmat, *(planes[nm] for nm in names))
    return out


def make_chain_counts(mask_of, interpret: bool = False):
    """A (pvec [P] i32, planes dict) -> [R/128] i32 counts function with a
    batching rule that evaluates ALL vmapped queries in one plane pass.
    `mask_of(vals, pvals)` must be a pure trace-time mask builder over
    same-shaped int32/int8 blocks (any 2-D shape) and a list of int32
    scalar params; it runs INSIDE the kernel (x64-off, int32 only)."""

    @jax.custom_batching.custom_vmap
    def cc(pvec, planes):
        return _chain_counts_batched(pvec[None, :], planes, mask_of,
                                     interpret)[0]

    @cc.def_vmap
    def _cc_vmap(axis_size, in_batched, pvec, planes):
        if any(jax.tree_util.tree_leaves(in_batched[1])):
            raise NotImplementedError("chain_counts planes cannot be batched")
        if not in_batched[0]:
            pvec = jnp.broadcast_to(pvec[None, :], (axis_size,
                                                    pvec.shape[0]))
        return _chain_counts_batched(pvec, planes, mask_of, interpret), True

    return cc


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


# ---------------------------------------------------------------------------
# chain_blocks: fused query-chain mask -> per-32-row counts + payload sums
# ---------------------------------------------------------------------------
#
# The prefix-mode terms/histogram paths (SURVEY.md §3.3: per-bucket totals
# as prefix differences over a bucket-sorted OrderedLayout) need, per query
# of an msearch batch, (a) chain-matched counts per 32-row block and (b)
# exact masked PAYLOAD sums per 32-row block for each sum sub-agg plane —
# bucket totals then gather a cumsum at the layout's 32-unit bucket bounds
# (ops/reductions.py prefix_diff_*). The XLA formulation materializes the
# [R] mask per query and re-reads the payload planes per query: 4-6 full
# HBM passes per query. This kernel fuses ALL of it into one plane pass per
# batch (same custom_vmap shape as chain_counts above).
#
# Planes arrive transposed at 32-row granularity ([32, R/32]: the g-th
# 32-row run of the layout is COLUMN g — transpose_groups(plane, 32)), so
# every per-block reduction is one cross-sublane sum over exactly the
# block's 32 sublanes: the per-32 output resolution the 32-unit bucket
# bounds require, with no window extraction.
#
# Exactness: payload planes are int32; each element splits as
# v == (v >> 13 << 13) + (v - (v >> 13 << 13)) (arithmetic shift — the
# identity holds for negatives, mirroring reductions.block32_sums). Block
# sums of the splits are bounded by 32 * 2^18 = 2^23 (hi) and 32 * 2^13 =
# 2^18 (lo): int32-exact by construction. The int64 recombination happens
# outside the kernel (reductions.prefix_diff_sums_from_blocks).

_CB_BLKC = 512  # lane-groups per grid block (upper bound)
#: scoped-VMEM budget in accumulator columns: B * (1 + 2L) * blkc. The
#: failing observation on the v5e was B=128, L=1, 4 chain planes at
#: blkc=512 (196K columns -> 18.26M scoped > the 16M limit); 2^17 columns
#: keeps the same shape at blkc=256 comfortably inside it.
_CB_COL_BUDGET = 1 << 17


def _cb_pick_blkc(g: int, b_rows: int = 64, n_out: int = 3):
    cap = _CB_BLKC
    while cap > 128 and b_rows * n_out * cap > _CB_COL_BUDGET:
        cap -= 128
    best = None
    b = 128
    while b <= cap:
        if g % b == 0:
            best = b
        b += 128
    return best


def chain_blocks_supported(n_rows: int) -> bool:
    # rows are PAD_BLOCK (32768) padded -> R/32 is a multiple of 1024
    return (n_rows > 0 and n_rows % 4096 == 0
            and _cb_pick_blkc(n_rows // 32) is not None)


def _chain_blocks_batched(pmat, planes, pay, mask_of, interpret: bool):
    """pmat: int32 [B, P]; planes: dict name -> [32, G] transposed chain
    planes (incl. 'avalid'); pay: dict name -> [32, G] int32 payload
    planes. Returns (counts [B, G] i32, {name: (hi [B, G], lo [B, G])})."""
    names = sorted(planes)
    pnames = sorted(pay)
    G = planes[names[0]].shape[1]
    B, P = pmat.shape
    L = len(pnames)
    blkc = _cb_pick_blkc(G, B, 1 + 2 * L)
    grid = G // blkc

    def kernel(pref, *refs):
        chain_refs = refs[:len(names)]
        pay_refs = refs[len(names):len(names) + L]
        out_c = refs[len(names) + L]
        out_hl = refs[len(names) + L + 1:]
        vals = {nm: (jax.lax.convert_element_type(chain_refs[i][:], I32)
                     if chain_refs[i].dtype == jnp.int8 else chain_refs[i][:])
                for i, nm in enumerate(names)}
        pv_blocks = [r[:] for r in pay_refs]
        biota = jax.lax.broadcasted_iota(I32, (B, blkc), 0)
        acc_c = jnp.zeros((B, blkc), I32)
        acc_h = [jnp.zeros((B, blkc), I32) for _ in range(L)]
        acc_l = [jnp.zeros((B, blkc), I32) for _ in range(L)]
        for b in range(B):
            pvq = [pref[b, j] for j in range(P)]
            m = mask_of(vals, pvq)  # bool [32, blkc]
            c = jnp.where(m, 1, 0).sum(axis=0, keepdims=True)
            acc_c = jnp.where(biota == b, c, acc_c)
            for j in range(L):
                s = jnp.where(m, pv_blocks[j], 0)
                h13 = s >> 13
                l13 = s - (h13 << 13)
                acc_h[j] = jnp.where(biota == b,
                                     h13.sum(axis=0, keepdims=True),
                                     acc_h[j])
                acc_l[j] = jnp.where(biota == b,
                                     l13.sum(axis=0, keepdims=True),
                                     acc_l[j])
        out_c[:, :] = acc_c
        for j in range(L):
            out_hl[2 * j][:, :] = acc_h[j]
            out_hl[2 * j + 1][:, :] = acc_l[j]

    in_specs = [pl.BlockSpec((B, P), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)]
    in_specs += [pl.BlockSpec((32, blkc), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
                 for _ in range(len(names) + L)]
    out_spec = pl.BlockSpec((B, blkc), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((B, G), jnp.int32)
                 for _ in range(1 + 2 * L)]
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=[out_spec] * (1 + 2 * L),
            out_shape=out_shape,
            interpret=interpret,
        )(pmat, *(planes[nm] for nm in names),
          *(pay[nm] for nm in pnames))
    counts = outs[0]
    sums = {nm: (outs[1 + 2 * j], outs[2 + 2 * j])
            for j, nm in enumerate(pnames)}
    return counts, sums


# ---------------------------------------------------------------------------
# chain_slot_counts: fused chain mask -> per-32-row-block PER-SLOT counts
# ---------------------------------------------------------------------------
#
# The slot_rank nested-percentiles path (percentiles under dense bucket
# ancestors, SURVEY.md §3.5) needs, per query, chain-matched counts per
# 32-row block of the value-sorted layout CONDITIONED on the ancestor's
# composite bucket slot. The XLA formulation materializes the [R] mask, a
# [R] slot plane and a [R/32, ns] one-hot count per query — ~10 bytes of
# per-query HBM state per row, which forced msearch groups down to 32 and
# put a [B, R/32, ns] cumsum on the critical path (bench c9: 2.1 ms/q).
# This kernel keeps the mask in VMEM (same custom_vmap batching shape as
# chain_blocks), conditions on a STATIC transposed slot plane, and emits
# only [ns, R/32] int32 counts per query; selection re-derives 32-row mask
# windows lazily from the untransposed planes (compile.py
# _slot_rank_select_rows_lazy), so nothing [R]-sized stays live per query.

def chain_slot_counts_supported(n_rows: int, ns: int,
                                b_max: int = 128) -> bool:
    return (n_rows > 0 and n_rows % 4096 == 0
            and _cb_pick_blkc(n_rows // 32, b_max, ns) is not None)


def _chain_slot_counts_batched(pmat, planes, slot, ns, mask_of,
                               interpret: bool):
    """pmat: int32 [B, P]; planes: chain planes [32, G] (transposed, incl.
    'avalid'); slot: STATIC int32 [32, G] composite slot ids (-1 = none).
    Returns [B, ns, G] int32 matched counts per 32-row block per slot."""
    names = sorted(planes)
    G = planes[names[0]].shape[1]
    B, P = pmat.shape
    blkc = _cb_pick_blkc(G, B, ns)
    grid = G // blkc

    def kernel(pref, *refs):
        chain_refs = refs[:len(names)]
        slot_ref = refs[len(names)]
        out_refs = refs[len(names) + 1:]
        vals = {nm: (jax.lax.convert_element_type(chain_refs[i][:], I32)
                     if chain_refs[i].dtype == jnp.int8 else chain_refs[i][:])
                for i, nm in enumerate(names)}
        sv = slot_ref[:]
        soh = [sv == s for s in range(ns)]  # query-independent one-hots
        biota = jax.lax.broadcasted_iota(I32, (B, blkc), 0)
        acc = [jnp.zeros((B, blkc), I32) for _ in range(ns)]
        for b in range(B):
            pvq = [pref[b, j] for j in range(P)]
            m = mask_of(vals, pvq)  # bool [32, blkc]
            for s in range(ns):
                c = jnp.where(m & soh[s], 1, 0).sum(axis=0, keepdims=True)
                acc[s] = jnp.where(biota == b, c, acc[s])
        for s in range(ns):
            out_refs[s][:, :] = acc[s]

    in_specs = [pl.BlockSpec((B, P), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)]
    in_specs += [pl.BlockSpec((32, blkc), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
                 for _ in range(len(names) + 1)]
    out_spec = pl.BlockSpec((B, blkc), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=[out_spec] * ns,
            out_shape=[jax.ShapeDtypeStruct((B, G), jnp.int32)
                       for _ in range(ns)],
            interpret=interpret,
        )(pmat, *(planes[nm] for nm in names), slot)
    return jnp.stack(outs, axis=1)  # [B, ns, G]


def make_chain_slot_counts(mask_of, ns: int, interpret: bool = False):
    """A (pvec [P] i32, planes dict, slot [32, G] i32) -> [ns, R/32] i32
    per-slot block-count function with a batching rule that evaluates ALL
    vmapped queries in one plane pass (mask_of contract as in
    make_chain_counts; the slot plane must be static/unbatched)."""

    @jax.custom_batching.custom_vmap
    def csc(pvec, planes, slot):
        return _chain_slot_counts_batched(pvec[None, :], planes, slot, ns,
                                          mask_of, interpret)[0]

    @csc.def_vmap
    def _csc_vmap(axis_size, in_batched, pvec, planes, slot):
        if any(jax.tree_util.tree_leaves(in_batched[1])) or in_batched[2]:
            raise NotImplementedError(
                "chain_slot_counts planes cannot be batched")
        if not in_batched[0]:
            pvec = jnp.broadcast_to(pvec[None, :], (axis_size,
                                                    pvec.shape[0]))
        return _chain_slot_counts_batched(pvec, planes, slot, ns, mask_of,
                                          interpret), True

    return csc


def make_chain_blocks(mask_of, interpret: bool = False):
    """A (pvec [P] i32, planes dict, pay dict) -> (counts [R/32] i32,
    {name: (hi, lo) [R/32] i32}) function with a batching rule that
    evaluates ALL vmapped queries in one plane pass (see make_chain_counts
    for the mask_of contract; it runs INSIDE the kernel, x64-off, i32)."""

    @jax.custom_batching.custom_vmap
    def cb(pvec, planes, pay):
        c, s = _chain_blocks_batched(pvec[None, :], planes, pay, mask_of,
                                     interpret)
        return c[0], {k: (h[0], l[0]) for k, (h, l) in s.items()}

    @cb.def_vmap
    def _cb_vmap(axis_size, in_batched, pvec, planes, pay):
        if any(jax.tree_util.tree_leaves(in_batched[1])) or \
                any(jax.tree_util.tree_leaves(in_batched[2])):
            raise NotImplementedError("chain_blocks planes cannot be batched")
        if not in_batched[0]:
            pvec = jnp.broadcast_to(pvec[None, :], (axis_size,
                                                    pvec.shape[0]))
        out = _chain_blocks_batched(pvec, planes, pay, mask_of, interpret)
        return out, (True, {k: (True, True) for k in out[1]})

    return cb


# ---------------------------------------------------------------------------
# gather_rows: scalar-prefetched row DMA (member operands)
# ---------------------------------------------------------------------------

def _gather_rows_batched(idx, op, interpret: bool):
    """idx int32 [B], op int8 [Df, A, 128] -> [B, A, 128]: one contiguous
    A*128-byte HBM->HBM DMA per grid step, indices scalar-prefetched. The
    operand is 3-D so the row slice runs along an UNTILED leading dim
    (int8 HBM memrefs tile the last two dims; a 1-row slice of a 2-D
    operand trips 'must be aligned to tiling (8)'). The XLA gather for
    this shape (vmapped dynamic_slice over a ~600MB member operand)
    measured ~1.8 GB/s on this v5e — the repo's known big-gather
    pathology — while the row DMA runs at wire speed; callers clip idx
    into [0, Df)."""
    B = int(idx.shape[0])
    Df, A, L = op.shape

    def kernel(idx_ref, op_ref, out_ref, sem):
        b = pl.program_id(0)
        dma = pltpu.make_async_copy(op_ref.at[pl.ds(idx_ref[b], 1)],
                                    out_ref.at[pl.ds(b, 1)], sem)
        dma.start()
        dma.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, A, L), op.dtype),
            interpret=interpret,
        )(idx, op)


def make_gather_rows(interpret: bool = False):
    """A (idx i32 scalar, op [Df, A, 128]) -> [A, 128] row-fetch with a
    batching rule that turns a vmapped msearch group into ONE multi-row
    DMA kernel."""

    @jax.custom_batching.custom_vmap
    def gr(i, op):
        return _gather_rows_batched(i[None], op, interpret)[0]

    @gr.def_vmap
    def _gr_vmap(axis_size, in_batched, i, op):
        if in_batched[1]:
            raise NotImplementedError("gather_rows operand cannot be batched")
        if not in_batched[0]:
            i = jnp.broadcast_to(i[None], (axis_size,))
        return _gather_rows_batched(i, op, interpret), True

    return gr
