"""Query -> docid bitmask materializer (SURVEY.md §2.1 C3 rebuild column).

`extract_params` walks a query host-side and produces the traced scalar
parameters (term ordinals / mono-domain bounds) keyed by tree path, so the
same compiled program serves every query of the same shape. `eval_mask`
runs during tracing and emits the vectorized mask algebra.

Exactness notes:
- All compares happen in the int64 mono domain (order-isomorphic to user
  values), so range semantics are exact for every field type.
- f64 signed zeros: -0.0 == 0.0 must hold (IEEE, and the oracle's NumPy
  compare). Equality uses two mono params (the ±0 pair); range bounds at
  zero are normalized host-side to the mono that yields the float-correct
  set (see _normalize_zero_bound).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..query import ir as Q
from ..schema import FieldType
from ..utils import mono as mono_mod
from ..ops import reductions as R


def _mono_param(ftype: FieldType, value) -> int:
    return mono_mod.scalar_to_mono(ftype.value, value)


def _zero_pair(ftype: FieldType, value):
    """(mono_a, mono_b): both monos a float-equal value can carry."""
    if ftype == FieldType.F64 and float(value) == 0.0:
        return (_mono_param(ftype, 0.0), _mono_param(ftype, -0.0))
    m = _mono_param(ftype, value)
    return (m, m)


def _normalize_zero_bound(ftype: FieldType, value, *, is_lower: bool,
                          inclusive: bool) -> int:
    if ftype == FieldType.F64 and float(value) == 0.0:
        # choose the mono that reproduces float compare semantics for ±0
        if (is_lower and inclusive) or (not is_lower and not inclusive):
            return _mono_param(ftype, -0.0)
        return _mono_param(ftype, 0.0)
    return _mono_param(ftype, value)


def extract_params(query: Q.Query, dindex, path=("q",)) -> Dict[str, np.int64]:
    """Host walk: query -> {path_key: int64 mono param}."""
    out: Dict[str, np.int64] = {}
    _extract(query, dindex, path, out)
    return out


def _key(path) -> str:
    return "/".join(map(str, path))


def _extract(q, dindex, path, out) -> None:
    if isinstance(q, Q.MatchAllQuery):
        return
    if isinstance(q, Q.TermQuery):
        entry = dindex.schema.field(q.field)
        if entry.type == FieldType.KEYWORD:
            ordv = dindex.keyword_ord(q.field, str(q.value))
            out[_key(path) + ":term"] = np.int64(ordv)
            out[_key(path) + ":term2"] = np.int64(ordv)
        else:
            a, b = _zero_pair(entry.type, q.value)
            out[_key(path) + ":term"] = np.int64(a)
            out[_key(path) + ":term2"] = np.int64(b)
        return
    if isinstance(q, Q.RangeQuery):
        entry = dindex.schema.field(q.field)
        if not entry.type.is_numeric:
            raise TypeError("range query requires a numeric field")
        if q.lower is not None:
            out[_key(path) + ":lo"] = np.int64(_normalize_zero_bound(
                entry.type, q.lower, is_lower=True, inclusive=q.include_lower))
        if q.upper is not None:
            out[_key(path) + ":hi"] = np.int64(_normalize_zero_bound(
                entry.type, q.upper, is_lower=False, inclusive=q.include_upper))
        return
    if isinstance(q, Q.BooleanQuery):
        for i, c in enumerate(q.must):
            _extract(c, dindex, path + ("m", i), out)
        for i, c in enumerate(q.should):
            _extract(c, dindex, path + ("s", i), out)
        for i, c in enumerate(q.must_not):
            _extract(c, dindex, path + ("n", i), out)
        return
    raise TypeError(f"unknown query {type(q)!r}")


def eval_mask(q, dindex, params, path=("q",), T=None, arrays=None) -> jnp.ndarray:
    """Trace-time evaluation: query -> bool doc mask [T] (alive NOT applied;
    the caller ANDs the alive mask once at the root, SURVEY.md §A.2).

    `T` is the LOCAL doc-axis length and `arrays` the program's array-input
    dict — under shard_map these are the shard-local views, so column data
    must be read from `arrays`, never from the captured DeviceColumn."""
    if T is None:
        T = dindex.T
    if isinstance(q, Q.MatchAllQuery):
        return jnp.ones(T, dtype=bool)
    if isinstance(q, (Q.TermQuery, Q.RangeQuery)):
        col = dindex.column(q.field)
        if arrays is not None:
            mono = arrays[f"{q.field}:mono"]
            doc_id = arrays.get(f"{q.field}:doc")
            valid = arrays.get(f"{q.field}:valid")
        else:
            mono, doc_id, valid = col.mono, col.doc_id, col.valid
        if isinstance(q, Q.TermQuery):
            p1 = params[_key(path) + ":term"]
            p2 = params[_key(path) + ":term2"]
            hits = (mono == p1) | (mono == p2)
        else:
            hits = jnp.ones(mono.shape, dtype=bool)
            if q.lower is not None:
                lo = params[_key(path) + ":lo"]
                hits &= (mono >= lo) if q.include_lower else (mono > lo)
            if q.upper is not None:
                hi = params[_key(path) + ":hi"]
                hits &= (mono <= hi) if q.include_upper else (mono < hi)
        if col.multi:
            hits = hits & valid
            return R.values_hit_to_doc_mask(hits, doc_id, T)
        return hits
    if isinstance(q, Q.BooleanQuery):
        m = jnp.ones(T, dtype=bool)
        for i, c in enumerate(q.must):
            m &= eval_mask(c, dindex, params, path + ("m", i), T, arrays)
        if q.should and not q.must:
            s = jnp.zeros(T, dtype=bool)
            for i, c in enumerate(q.should):
                s |= eval_mask(c, dindex, params, path + ("s", i), T, arrays)
            m &= s
        for i, c in enumerate(q.must_not):
            m &= ~eval_mask(c, dindex, params, path + ("n", i), T, arrays)
        return m
    raise TypeError(f"unknown query {type(q)!r}")
