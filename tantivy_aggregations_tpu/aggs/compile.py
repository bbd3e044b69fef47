"""Agg-tree compiler: IR -> one fused jitted device program + host harvest.

This is the TPU-native replacement for the reference's trait triple
(SURVEY.md §2.1 C2: Agg -> PreparedAgg -> SegmentAgg):

- **plan** (= `prepare`): host walk of the (query, agg tree) pair against the
  device index's static metadata. Resolves fields, picks exact-sum strategies,
  computes static bucket layouts (histogram k-range, terms cardinality),
  records which device arrays the program needs.
- **trace** (= `for_segment` + `collect`): a single traced function that
  materializes the query mask and evaluates every agg as masked/segmented
  reductions. There is no per-segment anything: the doc axis is the
  concatenated index, and bucket fruits live in dense global-ordinal arrays,
  so the reference's per-segment fruit merge (SURVEY.md §3.2) disappears
  into plain vectorized adds.
- **harvest** (= fruit -> user result): converts exact integer outputs back
  to user-domain values with the shared helpers in utils/exact.py, making
  results bit-identical to the oracle.

Sub-agg nesting compiles to composite bucket slots: a child bucket agg under
a parent with flat slot space P and child cardinality C scatters into P*C
(SURVEY.md §7 step 4 "nesting is just a wider scatter index").

v1 documented limits (oracle supports these; device raises NotImplemented):
- percentiles / top_hits under bucket aggs,
- a bucket agg nested under a MULTI-VALUED bucket field (the cross-product
  expansion case); metric sub-aggs under multi-valued parents are supported
  via per-doc pre-aggregation.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..aggs import ir as A
from ..query import compile as qc
from ..query import ir as Q
from ..schema import FieldType
from ..ops import reductions as R
from ..utils import exact, mono as mono_mod
from ..utils.mono import MONO_NEG_INF, MONO_POS_INF

I64 = jnp.int64
MAX_TERMS_CARD = 1 << 27  # composite top-k key budget: count<2^36, id<2^27


# ---------------------------------------------------------------------------
# Contexts
# ---------------------------------------------------------------------------

@dataclass
class MaskCtx:
    mask: object  # [T] bool


@dataclass
class SlotCtx:
    doc: object        # [P] int32 contribution rows
    slot: object       # [P] int32 flat composite slot
    valid: object      # [P] bool
    dims: Tuple[int, ...]  # slot-space shape; flat size = prod(dims)
    # set when every contribution is a single-valued per-doc row, enabling
    # further bucket nesting:
    slot_of_doc: object = None        # [T] int32
    slot_valid_of_doc: object = None  # [T] bool

    @property
    def nslots(self) -> int:
        n = 1
        for d in self.dims:
            n *= d
        return n


def _prod(dims) -> int:
    n = 1
    for d in dims:
        n *= d
    return n


# ---------------------------------------------------------------------------
# Program
# ---------------------------------------------------------------------------

class Program:
    """Compiled (query shape, agg tree shape, index epoch) triple."""

    def __init__(self, dindex, query: Q.Query, aggs: Dict[str, A.Agg]):
        A.validate_agg_tree(dindex.schema, aggs)
        self.dindex = dindex
        self.plan: Dict[tuple, dict] = {}
        self._arrays: Dict[str, object] = {"alive": dindex.alive}
        # host planning walk (static decisions + array collection)
        self._plan_aggs(aggs, ("a",), in_slot=False, parent_single=True,
                        hdims=(), tflat=1)
        self._collect_query_arrays(query)

        self._sharded = dindex.mesh is not None

        def fn(params, arrays):
            self._lT = arrays["alive"].shape[0]  # local doc-axis length
            mask = qc.eval_mask(query, dindex, params, T=self._lT,
                                arrays=arrays) & arrays["alive"]
            ctx = MaskCtx(mask)
            out = {}
            for name, agg in aggs.items():
                out[name] = self._eval(agg, ctx, params, arrays, ("a", name))
            return out

        if self._sharded:
            from jax.sharding import PartitionSpec as P
            arr_specs = {k: P("d", *([None] * (v.ndim - 1)))
                         for k, v in self._arrays.items()}
            fn = jax.shard_map(fn, mesh=dindex.mesh,
                               in_specs=(P(), arr_specs), out_specs=P(),
                               check_vma=False)
        self.raw_fn = fn  # unjitted (for compile checks / entry points)
        self._fn = jax.jit(fn)
        self._query = query
        self._aggs = aggs

    # -- cross-shard merges (ICI collectives; no-ops on one chip) -------------

    def _madd(self, x):
        return jax.lax.psum(x, "d") if self._sharded else x

    def _mmin(self, x):
        if not self._sharded:
            return x
        g = jax.lax.all_gather(x, "d", tiled=False)
        return jnp.min(g, axis=0)

    def _mmax(self, x):
        if not self._sharded:
            return x
        g = jax.lax.all_gather(x, "d", tiled=False)
        return jnp.max(g, axis=0)

    def _merge_metric(self, out):
        if "cnt" in out:
            out["cnt"] = self._madd(out["cnt"])
        if "sum" in out:
            out["sum"] = self._madd(out["sum"])
        if "min" in out:
            out["min"] = self._mmin(out["min"])
        if "max" in out:
            out["max"] = self._mmax(out["max"])
        return out

    # -- public ---------------------------------------------------------------

    def run(self, query: Q.Query, aggs: Dict[str, A.Agg]):
        return self.finalize(self.submit(query, aggs), aggs)

    def submit(self, query: Q.Query, aggs: Dict[str, A.Agg]):
        """Dispatch the device program asynchronously; returns raw device
        outputs. Pipelining submits (submit N, then finalize N) hides
        dispatch latency — the production serving pattern."""
        params = qc.extract_params(query, self.dindex)
        self._extract_filter_params(aggs, ("a",), params)
        return self._fn(params, self._arrays)

    def finalize(self, raw, aggs: Dict[str, A.Agg]):
        stripped, big = self.fetch_strip(aggs, raw)
        host = jax.device_get(stripped)
        gathers = self.percentile_gathers(host, big)
        if gathers:
            self.attach_percentiles(host, jax.device_get(gathers))
        return self.harvest_host(host, aggs)

    def harvest_host(self, host, aggs: Dict[str, A.Agg]):
        return {name: self._harvest(agg, host[name], ("a", name), ())
                for name, agg in aggs.items()}

    # -- batched device->host transfer ----------------------------------------
    # One device_get for everything except percentile sort arrays (big);
    # those get a second round: indices derived from the fetched counts, all
    # node gathers dispatched async, one more device_get. Total: 2 transfers
    # per query regardless of bucket counts (the naive per-bucket fetch costs
    # one round-trip per bucket — catastrophic over a remote device link).

    def fetch_strip(self, aggs, raw):
        """Split raw outputs into (small tree to fetch, big device arrays)."""
        big = {}  # path -> sorted device array

        def strip(node, r, path):
            if isinstance(node, dict) or isinstance(node, tuple):
                items = node.items() if isinstance(node, dict) else node
                return {n: strip(s, r[n], path + (n,)) for n, s in items}
            if isinstance(node, A.PercentilesAgg):
                big[path] = r["sorted"]
                return {"m": r["m"]}
            if isinstance(node, (A.HistogramAgg, A.TermsAgg,
                                 A.FilterAgg, A.PostFilterAgg)):
                out = {k: v for k, v in r.items()
                       if not isinstance(v, dict)}
                for n, s in node.sub_aggs:
                    out[n] = strip(s, r[n], path + (n,))
                return out
            return r

        return {n: strip(s, raw[n], ("a", n)) for n, s in aggs.items()}, big

    @staticmethod
    def _node_at(host, path):
        node = host
        for k in path[1:]:
            node = node[k]
        return node

    def percentile_gathers(self, host, big):
        """Dispatch (async) the rank gathers for every percentile node;
        returns {path: device array} to be fetched in one device_get."""
        gathers = {}
        for path, srt in big.items():
            node_host = self._node_at(host, path)
            m = int(node_host["m"])
            percents = self.plan[path]["percents"]
            idxs, fracs = [], []
            for q in percents:
                if m == 0:
                    idxs.extend([0, 0]); fracs.append(0.0)
                else:
                    lo, hi, frac = exact.percentile_rank(q, m)
                    idxs.extend([lo, hi]); fracs.append(frac)
            gathers[path] = _take(srt, jnp.asarray(idxs, jnp.int32))
            node_host["_fracs"] = fracs
        return gathers

    def attach_percentiles(self, host, got):
        for path, vals in got.items():
            self._node_at(host, path)["pvals"] = vals

    # -- planning -------------------------------------------------------------

    def _col(self, field: str):
        return self.dindex.column(field)

    def _need(self, key: str, arr) -> None:
        self._arrays[key] = arr

    def _need_col_rows(self, col) -> None:
        self._need(f"{col.name}:mono", col.mono)
        if col.multi:
            self._need(f"{col.name}:doc", col.doc_id)
            self._need(f"{col.name}:valid", col.valid)

    def _collect_query_arrays(self, q: Q.Query) -> None:
        if isinstance(q, Q.BooleanQuery):
            for c in (*q.must, *q.should, *q.must_not):
                self._collect_query_arrays(c)
        elif isinstance(q, (Q.TermQuery, Q.RangeQuery)):
            self._need_col_rows(self._col(q.field))

    def _plan_metric(self, node, path, hdims) -> None:
        col = self._col(node.field)
        self._need_col_rows(col)
        needs_sum = isinstance(node, (A.SumAgg, A.AvgAgg, A.StatsAgg))
        p = {"kind": "metric", "ftype": col.ftype, "multi": col.multi,
             "direct": col.sum_direct, "min_mono": col.min_mono,
             "min_user": col.min_user() if col.ftype != FieldType.F64 else None,
             "base": col.f64_base_exp, "L": col.sum_n_limbs, "hdims": hdims}
        if needs_sum and not col.sum_direct:
            self._need(f"{node.field}:limbs", col.sum_limbs())
        self.plan[path] = p

    def _plan_aggs(self, node, path, *, in_slot: bool, parent_single: bool,
                   hdims: tuple, tflat: int) -> None:
        if isinstance(node, dict) or isinstance(node, tuple):
            items = node.items() if isinstance(node, dict) else node
            for name, sub in items:
                self._plan_aggs(sub, path + (name,), in_slot=in_slot,
                                parent_single=parent_single, hdims=hdims,
                                tflat=tflat)
            return
        if isinstance(node, A.CountAgg):
            self.plan[path] = {"kind": "count", "hdims": hdims}
            return
        if isinstance(node, (A.SumAgg, A.MinAgg, A.MaxAgg, A.AvgAgg, A.StatsAgg)):
            self._plan_metric(node, path, hdims)
            return
        if isinstance(node, A.PercentilesAgg):
            if in_slot:
                raise NotImplementedError(
                    "percentiles under bucket aggs not supported on device yet")
            col = self._col(node.field)
            self._need_col_rows(col)
            self.plan[path] = {"kind": "percentiles", "ftype": col.ftype,
                               "multi": col.multi, "percents": node.percents,
                               "hdims": hdims}
            return
        if isinstance(node, A.HistogramAgg):
            self._plan_histogram(node, path, in_slot=in_slot,
                                 parent_single=parent_single, hdims=hdims,
                                 tflat=tflat)
            return
        if isinstance(node, A.TermsAgg):
            self._plan_terms(node, path, in_slot=in_slot,
                             parent_single=parent_single, hdims=hdims,
                             tflat=tflat)
            return
        if isinstance(node, (A.FilterAgg, A.PostFilterAgg)):
            self._collect_query_arrays(node.query)
            self.plan[path] = {"kind": "filter", "hdims": hdims}
            self._plan_aggs(node.sub_aggs, path, in_slot=in_slot,
                            parent_single=parent_single, hdims=hdims,
                            tflat=tflat)
            return
        if isinstance(node, A.TopHitsAgg):
            if in_slot:
                raise NotImplementedError(
                    "top_hits under bucket aggs not supported on device yet")
            col = self._col(node.sort_field)
            if col.multi:
                raise TypeError("top_hits sort field must be single-valued")
            self._need_col_rows(col)
            self.plan[path] = {"kind": "top_hits", "hdims": hdims,
                               "k": min(node.size, self.dindex.T)}
            return
        raise TypeError(f"unknown agg {type(node)!r}")

    def _plan_histogram(self, node, path, *, in_slot: bool, parent_single: bool,
                        hdims: tuple, tflat: int):
        if in_slot and not parent_single:
            raise NotImplementedError(
                "bucket agg nested under a multi-valued bucket field is not "
                "supported on device (oracle supports it)")
        col = self._col(node.field)
        self._need_col_rows(col)
        p = {"kind": "histogram", "ftype": col.ftype, "multi": col.multi}
        if col.n_values == 0:
            p.update(mode="empty", k_min=0, nb=1)
        elif col.ftype == FieldType.F64:
            lo = mono_mod.scalar_from_mono("f64", col.min_mono)
            hi = mono_mod.scalar_from_mono("f64", col.max_mono)
            k_min, bounds = exact.f64_histogram_buckets(
                lo, hi, float(node.interval), float(node.offset))
            p.update(mode="bounds", k_min=k_min, nb=len(bounds) + 1,
                     bounds=jnp.asarray(bounds))
        else:
            iv, off = int(node.interval), int(node.offset)
            lo = col.min_user()
            hi = mono_mod.scalar_from_mono(col.ftype.value, col.max_mono)
            k_min = (lo - off) // iv
            k_max = (hi - off) // iv
            nb = k_max - k_min + 1
            if (hi - off) <= 2**63 - 1 and (lo - off) >= -(2**63):
                off_mono = col.min_mono - (lo - off)  # mono-domain offset
                p.update(mode="direct", k_min=k_min, nb=nb,
                         off_mono=off_mono, interval=iv)
            else:
                bounds_user = [off + (k_min + j + 1) * iv for j in range(nb - 1)]
                bounds = mono_mod.to_mono(
                    col.ftype.value,
                    np.asarray(bounds_user,
                               dtype=np.uint64 if col.ftype in
                               (FieldType.U64, FieldType.DATE) else np.int64))
                p.update(mode="bounds", k_min=k_min, nb=nb,
                         bounds=jnp.asarray(bounds))
        p["interval_user"] = node.interval
        p["offset_user"] = node.offset
        p["hdims"] = hdims
        entry = self.dindex.schema.field(node.field)
        p["chain"] = (not col.multi) or entry.cardinality.value == "single"
        if tflat * p["nb"] >= 2**31:
            raise ValueError("composite bucket slot space exceeds 2^31")
        self.plan[path] = p
        self._plan_aggs(node.sub_aggs, path, in_slot=True,
                        parent_single=p["chain"], hdims=hdims + (p["nb"],),
                        tflat=tflat * p["nb"])

    def _plan_terms(self, node, path, *, in_slot: bool, parent_single: bool,
                    hdims: tuple, tflat: int):
        if in_slot and not parent_single:
            raise NotImplementedError(
                "bucket agg nested under a multi-valued bucket field is not "
                "supported on device (oracle supports it)")
        col = self._col(node.field)
        p = {"kind": "terms", "ftype": col.ftype, "multi": col.multi}
        if col.ftype == FieldType.KEYWORD:
            self._need_col_rows(col)
            card = col.card
            p["keys"] = col.terms  # host table for harvest
        else:
            self._need_col_rows(col)
            tid, values_mono = col.term_ids()
            self._need(f"{node.field}:tid", tid)
            card = col.card
            p["keys_mono"] = values_mono
        if card > MAX_TERMS_CARD:
            raise ValueError(f"terms cardinality {card} exceeds {MAX_TERMS_CARD}")
        p["card"] = card
        p["keff"] = min(node.size, card)
        p["hdims"] = hdims
        entry = self.dindex.schema.field(node.field)
        p["chain"] = (not col.multi) or entry.cardinality.value == "single"
        if tflat * card >= 2**31:
            raise ValueError("composite bucket slot space exceeds 2^31")
        self.plan[path] = p
        self._plan_aggs(node.sub_aggs, path, in_slot=True,
                        parent_single=p["chain"], hdims=hdims + (p["keff"],),
                        tflat=tflat * card)

    def _extract_filter_params(self, node, path, out) -> None:
        if isinstance(node, dict) or isinstance(node, tuple):
            items = node.items() if isinstance(node, dict) else node
            for name, sub in items:
                self._extract_filter_params(sub, path + (name,), out)
            return
        if isinstance(node, (A.FilterAgg, A.PostFilterAgg)):
            out.update(qc.extract_params(node.query, self.dindex,
                                         path=path + ("fq",)))
            self._extract_filter_params(node.sub_aggs, path, out)
            return
        if isinstance(node, (A.HistogramAgg, A.TermsAgg)):
            self._extract_filter_params(node.sub_aggs, path, out)

    # -- trace-time evaluation --------------------------------------------------

    def _rows(self, field: str, ctx: MaskCtx, arrays):
        """(vals, vmask, doc) value rows for a field under a doc mask."""
        col = self._col(field)
        vals = arrays[f"{field}:mono"]
        if col.multi:
            doc = arrays[f"{field}:doc"]
            vmask = ctx.mask[doc] & arrays[f"{field}:valid"]
        else:
            doc = jnp.arange(self._lT, dtype=jnp.int32)
            vmask = ctx.mask
        return vals, vmask, doc

    def _eval(self, node, ctx, params, arrays, path):
        p = self.plan.get(path)
        if isinstance(node, A.CountAgg):
            if isinstance(ctx, MaskCtx):
                return {"cnt": self._madd(R.masked_count(ctx.mask))}
            return {"cnt": self._madd(
                R.slot_count(ctx.slot, ctx.valid, ctx.nslots))}

        if isinstance(node, (A.SumAgg, A.MinAgg, A.MaxAgg, A.AvgAgg, A.StatsAgg)):
            return self._eval_metric(node, ctx, arrays, p)

        if isinstance(node, A.PercentilesAgg):
            vals, vmask, _ = self._rows(node.field, ctx, arrays)
            srt = jnp.sort(jnp.where(vmask, vals, MONO_POS_INF))
            if self._sharded:
                srt = jnp.sort(jax.lax.all_gather(srt, "d", tiled=True))
            return {"sorted": srt, "m": self._madd(R.masked_count(vmask))}

        if isinstance(node, A.HistogramAgg):
            return self._eval_histogram(node, ctx, params, arrays, path, p)

        if isinstance(node, A.TermsAgg):
            return self._eval_terms(node, ctx, params, arrays, path, p)

        if isinstance(node, (A.FilterAgg, A.PostFilterAgg)):
            fmask = qc.eval_mask(node.query, self.dindex, params,
                                 path=path + ("fq",), T=self._lT,
                                 arrays=arrays)
            out = {}
            if isinstance(ctx, MaskCtx):
                sub_ctx = MaskCtx(ctx.mask & fmask)
                out["cnt"] = self._madd(R.masked_count(sub_ctx.mask))
            else:
                valid = ctx.valid & fmask[ctx.doc]
                sv = None if ctx.slot_valid_of_doc is None else (
                    ctx.slot_valid_of_doc & fmask)
                sub_ctx = SlotCtx(ctx.doc, ctx.slot, valid, ctx.dims,
                                  ctx.slot_of_doc, sv)
                out["cnt"] = self._madd(
                    R.slot_count(ctx.slot, valid, ctx.nslots))
            for name, sub in node.sub_aggs:
                out[name] = self._eval(sub, sub_ctx, params, arrays,
                                       path + (name,))
            return out

        if isinstance(node, A.TopHitsAgg):
            vals = arrays[f"{node.sort_field}:mono"]
            key = jnp.where(ctx.mask, ~vals if not node.ascending else vals,
                            MONO_POS_INF)
            doc = jnp.arange(self._lT, dtype=jnp.int64)
            if self._sharded:
                doc = doc + jax.lax.axis_index("d").astype(I64) * self._lT
            sk, sd = jax.lax.sort((key, doc), num_keys=2)
            k = min(self.plan[path]["k"], self._lT)
            sk, sd = sk[:k], sd[:k]
            if self._sharded:
                sk = jax.lax.all_gather(sk, "d", tiled=True)
                sd = jax.lax.all_gather(sd, "d", tiled=True)
                sk, sd = jax.lax.sort((sk, sd), num_keys=2)
                kk = self.plan[path]["k"]
                sk, sd = sk[:kk], sd[:kk]
            return {"keys": sk, "docs": sd,
                    "m": self._madd(R.masked_count(ctx.mask))}

        raise TypeError(f"unknown agg {type(node)!r}")

    # metric under either context
    def _eval_metric(self, node, ctx, arrays, p):
        field = node.field
        need_min = isinstance(node, (A.MinAgg, A.StatsAgg))
        need_max = isinstance(node, (A.MaxAgg, A.StatsAgg))
        need_sum = isinstance(node, (A.SumAgg, A.AvgAgg, A.StatsAgg))
        out = {}
        if isinstance(ctx, MaskCtx):
            vals, vmask, _ = self._rows(field, ctx, arrays)
            out["cnt"] = R.masked_count(vmask)
            if need_min:
                out["min"] = R.masked_min(vals, vmask)
            if need_max:
                out["max"] = R.masked_max(vals, vmask)
            if need_sum:
                if p["direct"]:
                    out["sum"] = R.masked_sum_direct(vals, vmask, p["min_mono"])
                else:
                    out["sum"] = R.masked_sum_limbs(
                        arrays[f"{field}:limbs"], vmask)
            return self._merge_metric(out)

        # SlotCtx
        col = self._col(field)
        ns = ctx.nslots
        if not col.multi:
            v = arrays[f"{field}:mono"][ctx.doc]
            out["cnt"] = R.slot_count(ctx.slot, ctx.valid, ns)
            if need_min:
                out["min"] = R.slot_min(v, ctx.slot, ctx.valid, ns)
            if need_max:
                out["max"] = R.slot_max(v, ctx.slot, ctx.valid, ns)
            if need_sum:
                if p["direct"]:
                    out["sum"] = R.slot_sum_direct(
                        v, ctx.slot, ctx.valid, ns, p["min_mono"])
                else:
                    planes = arrays[f"{field}:limbs"][ctx.doc]
                    out["sum"] = R.slot_sum_limbs(
                        planes, ctx.slot, ctx.valid, ns)
            return self._merge_metric(out)

        # multi-valued field under slots: per-doc pre-aggregation, then
        # scatter per contribution (each parent occurrence sees ALL of the
        # doc's values — the reference's collect(doc) recursion, §3.2)
        T = self._lT
        gv, gdoc, gvalid = (arrays[f"{field}:mono"], arrays[f"{field}:doc"],
                            arrays[f"{field}:valid"])
        cnt_doc = jnp.zeros(T, I64).at[gdoc].add(
            jnp.where(gvalid, 1, 0).astype(I64), mode="drop")
        out["cnt"] = R.slot_sum_i64(cnt_doc[ctx.doc], ctx.slot, ctx.valid, ns)
        if need_min:
            min_doc = jnp.full(T, MONO_POS_INF, I64).at[gdoc].min(
                jnp.where(gvalid, gv, MONO_POS_INF), mode="drop")
            out["min"] = R.slot_min(min_doc[ctx.doc], ctx.slot, ctx.valid, ns)
        if need_max:
            max_doc = jnp.full(T, MONO_NEG_INF, I64).at[gdoc].max(
                jnp.where(gvalid, gv, MONO_NEG_INF), mode="drop")
            out["max"] = R.slot_max(max_doc[ctx.doc], ctx.slot, ctx.valid, ns)
        if need_sum:
            if p["direct"]:
                sum_doc = jnp.zeros(T, I64).at[gdoc].add(
                    jnp.where(gvalid, gv - p["min_mono"], 0), mode="drop")
                out["sum"] = R.slot_sum_i64(
                    sum_doc[ctx.doc], ctx.slot, ctx.valid, ns)
            else:
                planes = arrays[f"{field}:limbs"]
                L = planes.shape[1]
                sum_doc = jnp.zeros((T, L), I64).at[gdoc].add(
                    jnp.where(gvalid[:, None], planes.astype(I64), 0),
                    mode="drop")
                upd = jnp.where(ctx.valid[:, None], sum_doc[ctx.doc], 0)
                out["sum"] = jnp.zeros((ns, L), I64).at[ctx.slot].add(
                    upd, mode="drop")
        return self._merge_metric(out)

    def _bucket_ids(self, p, vals):
        """Value rows -> 0-based bucket index in [0, nb)."""
        if p["mode"] == "empty":
            return jnp.zeros(vals.shape, jnp.int32)
        if p["mode"] == "direct":
            k = jnp.floor_divide(vals - p["off_mono"], p["interval"])
            return (k - p["k_min"]).astype(jnp.int32)
        return jnp.searchsorted(p["bounds"], vals, side="right").astype(jnp.int32)

    def _slot_of_doc(self, col, doc, slot, valid):
        """[T] flat slot per doc (+validity) for chaining bucket nesting.
        For dense single columns the value rows ARE the doc rows; for a
        single-cardinality CSR column (<=1 value/doc) scatter the unique
        contribution."""
        if not col.multi:
            return slot, valid
        T = self._lT
        sod = jnp.full(T, -1, jnp.int32).at[doc].max(
            jnp.where(valid, slot.astype(jnp.int32), -1), mode="drop")
        return sod, sod >= 0

    def _eval_histogram(self, node, ctx, params, arrays, path, p):
        nb = p["nb"]
        field = node.field
        col = self._col(field)
        if isinstance(ctx, MaskCtx):
            vals, vmask, doc = self._rows(field, ctx, arrays)
            bid = self._bucket_ids(p, vals)
            dims = (nb,)
            slot = bid
            valid = vmask
        else:
            # nested: parent chainability guaranteed by the plan check
            vals = arrays[f"{field}:mono"]
            if col.multi:
                doc = arrays[f"{field}:doc"]
                gvalid = arrays[f"{field}:valid"]
            else:
                doc = jnp.arange(self._lT, dtype=jnp.int32)
                gvalid = jnp.ones(self._lT, dtype=bool)
            bid = self._bucket_ids(p, vals)
            pslot = ctx.slot_of_doc[doc]
            pvalid = ctx.slot_valid_of_doc[doc]
            slot = pslot * nb + bid
            valid = gvalid & pvalid
            dims = ctx.dims + (nb,)
        ns = _prod(dims)
        out = {"counts": self._madd(R.slot_count(slot, valid, ns))}
        if node.sub_aggs:
            if p["chain"]:
                sod, svd = self._slot_of_doc(col, doc, slot, valid)
                sub_ctx = SlotCtx(doc, slot, valid, dims, sod, svd)
            else:
                sub_ctx = SlotCtx(doc, slot, valid, dims, None, None)
            for name, sub in node.sub_aggs:
                out[name] = self._eval(sub, sub_ctx, params, arrays,
                                       path + (name,))
        return out

    def _eval_terms(self, node, ctx, params, arrays, path, p):
        card, keff = p["card"], p["keff"]
        field = node.field
        col = self._col(field)
        if col.ftype == FieldType.KEYWORD:
            ids_rows = arrays[f"{field}:mono"].astype(jnp.int32)
        else:
            ids_rows = arrays[f"{field}:tid"]
        if isinstance(ctx, MaskCtx):
            if col.multi:
                doc = arrays[f"{field}:doc"]
                vmask = ctx.mask[doc] & arrays[f"{field}:valid"]
            else:
                doc = jnp.arange(self._lT, dtype=jnp.int32)
                vmask = ctx.mask
            slot = ids_rows
            valid = vmask
            anc_flat = 1
            dims = (card,)
        else:
            if col.multi:
                doc = arrays[f"{field}:doc"]
                gvalid = arrays[f"{field}:valid"]
            else:
                doc = jnp.arange(self._lT, dtype=jnp.int32)
                gvalid = jnp.ones(self._lT, dtype=bool)
            pslot = ctx.slot_of_doc[doc]
            pvalid = ctx.slot_valid_of_doc[doc]
            slot = pslot * card + ids_rows
            valid = gvalid & pvalid
            anc_flat = ctx.nslots
            dims = ctx.dims + (card,)
        ns = _prod(dims)
        counts = self._madd(R.slot_count(slot, valid, ns))

        sub_out = {}
        if node.sub_aggs:
            if p["chain"]:
                sod, svd = self._slot_of_doc(col, doc, slot, valid)
                sub_ctx = SlotCtx(doc, slot, valid, dims, sod, svd)
            else:
                sub_ctx = SlotCtx(doc, slot, valid, dims, None, None)
            for name, sub in node.sub_aggs:
                sub_out[name] = self._eval(sub, sub_ctx, params, arrays,
                                           path + (name,))

        # top-k by (count desc, id asc) via composite key; batched over the
        # ancestor slot space
        c2 = counts.reshape(anc_flat, card)
        ids = jnp.arange(card, dtype=I64)
        key = c2 * (1 << 27) + (card - 1 - ids)[None, :]
        top_key, top_ids = jax.lax.top_k(key, keff)
        top_counts = jnp.take_along_axis(c2, top_ids, axis=1)
        total = jnp.sum(c2, axis=1)

        # gather every descendant output's parent-card axis down to keff
        def gather(a):
            rest = a.shape[0] // (anc_flat * card)
            b = a.reshape((anc_flat, card, rest) + a.shape[1:])
            g = b[jnp.arange(anc_flat)[:, None], top_ids]  # [anc, keff, rest, ...]
            return g.reshape((anc_flat * keff * rest,) + a.shape[1:])

        sub_out = jax.tree_util.tree_map(gather, sub_out)
        return {"counts": top_counts.reshape(anc_flat * keff),
                "ids": top_ids.reshape(anc_flat * keff).astype(jnp.int32),
                "total": total.reshape(anc_flat),
                **sub_out}

    # -- harvest -----------------------------------------------------------------
    # Device outputs are flat on axis 0 over the harvest slot space: the
    # product of each ancestor bucket level's HARVEST size (keff for terms —
    # post-gather — and nb for histograms), recorded as plan["hdims"].

    def _flat(self, raw, path, prefix: Tuple[int, ...], key: str):
        a = raw[key]
        hdims = self.plan[path]["hdims"]
        if not prefix:
            return a
        return a[int(np.ravel_multi_index(prefix, hdims))]

    def _harvest(self, node, raw, path, prefix: Tuple[int, ...]):
        p = self.plan[path] if path in self.plan else None

        if isinstance(node, A.CountAgg):
            return {"value": int(self._flat(raw, path, prefix, "cnt"))}

        if isinstance(node, (A.SumAgg, A.MinAgg, A.MaxAgg, A.AvgAgg, A.StatsAgg)):
            return self._harvest_metric(node, raw, path, prefix)

        if isinstance(node, A.PercentilesAgg):
            return self._harvest_percentiles(node, raw, path)

        if isinstance(node, A.HistogramAgg):
            return self._harvest_histogram(node, raw, path, prefix)

        if isinstance(node, A.TermsAgg):
            return self._harvest_terms(node, raw, path, prefix)

        if isinstance(node, (A.FilterAgg, A.PostFilterAgg)):
            out = {"doc_count": int(self._flat(raw, path, prefix, "cnt"))}
            for name, sub in node.sub_aggs:
                out[name] = self._harvest(sub, raw[name], path + (name,), prefix)
            return out

        if isinstance(node, A.TopHitsAgg):
            return self._harvest_top_hits(node, raw, path)

        raise TypeError(f"unknown agg {type(node)!r}")

    @staticmethod
    def _user(ftype: FieldType, mono_val: int):
        v = mono_mod.scalar_from_mono(ftype.value, int(mono_val))
        return float(v) if ftype == FieldType.F64 else int(v)

    def _reconstruct_sum(self, p, sum_out, cnt: int):
        ftype = p["ftype"]
        if ftype == FieldType.F64:
            return exact.f64_reconstruct_sum(np.atleast_1d(np.asarray(sum_out)),
                                             p["base"])
        if p["direct"]:
            return int(sum_out) + cnt * int(p["min_user"])
        return exact.int_reconstruct_sum(np.asarray(sum_out)) \
            + cnt * int(p["min_user"])

    def _harvest_metric(self, node, raw, path, prefix):
        from fractions import Fraction
        p = self.plan[path]
        ftype = p["ftype"]
        cnt = int(self._flat(raw, path, prefix, "cnt"))
        if isinstance(node, A.SumAgg):
            return {"value": self._reconstruct_sum(
                p, self._flat(raw, path, prefix, "sum"), cnt)}
        if isinstance(node, A.MinAgg):
            return {"value": None if cnt == 0 else
                    self._user(ftype, self._flat(raw, path, prefix, "min"))}
        if isinstance(node, A.MaxAgg):
            return {"value": None if cnt == 0 else
                    self._user(ftype, self._flat(raw, path, prefix, "max"))}
        if isinstance(node, A.AvgAgg):
            s = self._reconstruct_sum(p, self._flat(raw, path, prefix, "sum"), cnt)
            if cnt == 0:
                value = None
            elif ftype == FieldType.F64:
                value = s / cnt
            else:
                value = float(Fraction(s) / cnt)
            return {"value": value, "sum": s, "count": cnt}
        # StatsAgg
        s = self._reconstruct_sum(p, self._flat(raw, path, prefix, "sum"), cnt)
        return {
            "count": cnt,
            "sum": s,
            "min": None if cnt == 0 else
                self._user(ftype, self._flat(raw, path, prefix, "min")),
            "max": None if cnt == 0 else
                self._user(ftype, self._flat(raw, path, prefix, "max")),
            "avg": None if cnt == 0 else (
                s / cnt if ftype == FieldType.F64 else float(Fraction(s) / cnt)),
        }

    def _harvest_percentiles(self, node, raw, path):
        p = self.plan[path]
        ftype = p["ftype"]
        m = int(raw["m"])
        if m == 0:
            return {"values": {str(q): None for q in node.percents}}
        got, fracs = raw["pvals"], raw["_fracs"]
        out = {}
        for i, q in enumerate(node.percents):
            v_lo = self._user(ftype, got[2 * i])
            v_hi = self._user(ftype, got[2 * i + 1])
            out[str(q)] = exact.interpolate(float(v_lo), float(v_hi), fracs[i])
        return {"values": out}

    def _harvest_histogram(self, node, raw, path, prefix):
        p = self.plan[path]
        nb, k_min, ftype = p["nb"], p["k_min"], p["ftype"]
        counts = np.asarray(raw["counts"])
        hdims = p["hdims"]
        buckets = []
        for j in range(nb):
            flat = int(np.ravel_multi_index(prefix + (j,), hdims + (nb,)))
            c = int(counts[flat])
            if c == 0:
                continue
            k = k_min + j
            if ftype == FieldType.F64:
                key = exact.f64_histogram_key(k, float(node.interval),
                                              float(node.offset))
            else:
                key = int(node.offset) + k * int(node.interval)
            b = {"key": key, "doc_count": c}
            for name, sub in node.sub_aggs:
                b[name] = self._harvest(sub, raw[name], path + (name,),
                                        prefix + (j,))
            buckets.append(b)
        return {"buckets": buckets}

    def _harvest_terms(self, node, raw, path, prefix):
        p = self.plan[path]
        keff, ftype = p["keff"], p["ftype"]
        counts = np.asarray(raw["counts"])
        ids = np.asarray(raw["ids"])
        total = np.asarray(raw["total"])
        hdims = p["hdims"]
        total_here = int(total[int(np.ravel_multi_index(prefix, hdims))]
                         if prefix else total.reshape(-1)[0])
        shown = 0
        buckets = []
        for i in range(keff):
            flat = int(np.ravel_multi_index(prefix + (i,), hdims + (keff,)))
            c = int(counts[flat])
            if c == 0:
                continue
            tid = int(ids[flat])
            if ftype == FieldType.KEYWORD:
                key = str(p["keys"][tid])
            else:
                key = self._user(ftype, int(p["keys_mono"][tid]))
            shown += c
            b = {"key": key, "doc_count": c}
            for name, sub in node.sub_aggs:
                b[name] = self._harvest(sub, raw[name], path + (name,),
                                        prefix + (i,))
            buckets.append(b)
        return {"buckets": buckets,
                "sum_other_doc_count": total_here - shown}

    def _harvest_top_hits(self, node, raw, path):
        m = int(raw["m"])
        k = min(node.size, m)
        keys = np.asarray(raw["keys"])[:k]
        docs = np.asarray(raw["docs"])[:k]
        col = self._col(node.sort_field)
        starts = self.dindex.seg_starts
        hits = []
        for kk, dd in zip(keys.tolist(), docs.tolist()):
            mono_v = kk if node.ascending else ~np.int64(kk)
            si = int(np.searchsorted(starts, dd, side="right")) - 1
            hits.append({"segment": si, "doc": int(dd - starts[si]),
                         "value": self._user(col.ftype, int(mono_v))})
        return {"hits": hits}


@jax.jit
def _take(a, idx):
    return a[idx]


def get_program(dindex, query, aggs) -> Program:
    return Program(dindex, query, aggs)
