"""Device index loader: host segments -> HBM-resident column arrays.

TPU-native redesign of tantivy's per-segment fast-field readers (SURVEY.md
§2.2 T4/T5, §3.5). Key departures from the reference, chosen for the
hardware:

- **One concatenated doc axis.** Segments are concatenated (not stacked and
  padded per segment): per-segment execution only exists in the reference
  because its collector state is sequential. Here every reduction is
  order-independent and exact, so the doc axis is a single dense [T] array
  padded with dead docs to a block multiple. Multi-chip sharding shards this
  axis (SURVEY.md §2.3) — data parallelism over docs.
- **Global ordinals at load.** The reference merges terms buckets by term
  bytes because segment ordinals are local (§A.6). We align ordinals to a
  global sorted term table once at load; bucket merge then becomes dense
  integer addition (and cross-chip merge a plain psum over ICI).
- **Mono domain.** All numeric columns are loaded as order-preserving int64
  (utils/mono.py) — device compute never touches f64.
- **CSR expansion, shard-local.** Multi-valued fields become flat value rows
  with a doc_id per row and a validity mask. Under a mesh, value rows are
  partitioned into the same doc-range shards as their docs (padded per
  shard), with doc ids LOCAL to the shard — every gather/scatter between
  value rows and doc rows stays on-chip; only fruit merges cross ICI.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..schema import Cardinality, FieldType, Schema
from ..utils import exact, mono as mono_mod

#: doc/value axes are padded to a multiple of this (VPU lane friendliness)
PAD_BLOCK = 1024


def _pad_to(n: int, block: int) -> int:
    return max(block, ((n + block - 1) // block) * block)


def _put(arr: np.ndarray, mesh, spec_ndim: int):
    """Move to device; under a mesh, shard the leading axis."""
    if mesh is None:
        return jnp.asarray(arr)
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec = P("d", *([None] * (spec_ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


@dataclass
class DeviceColumn:
    """One field's device-resident data (index-wide, concatenated)."""

    name: str
    ftype: FieldType
    multi: bool
    # single-valued: mono [T]; multi-valued: mono [V] flat value rows
    mono: jnp.ndarray
    # multi-valued only:
    doc_id: Optional[jnp.ndarray] = None  # [V] int32, SHARD-LOCAL doc index
    valid: Optional[jnp.ndarray] = None  # [V] bool (False on padding)
    # keyword only:
    terms: Optional[np.ndarray] = None  # global sorted term table (host)
    # numeric metadata (host scalars, over real values)
    min_mono: int = 0
    max_mono: int = 0
    n_values: int = 0  # real value count
    # exact-sum plan (numeric): either direct int64 or limb planes
    sum_direct: bool = True
    f64_base_exp: int = 1
    sum_n_limbs: int = 1
    _mesh: Optional[object] = None
    _sum_limbs: Optional[jnp.ndarray] = None  # [len(mono), L] int32, lazy
    _host_values: Optional[np.ndarray] = None  # user-domain, padded layout
    _host_valid: Optional[np.ndarray] = None  # None = all real
    # numeric terms dictionary (lazy): value id per row + id -> mono value
    _term_ids: Optional[jnp.ndarray] = None
    _term_values_mono: Optional[np.ndarray] = None

    def _real_values(self) -> np.ndarray:
        if self._host_valid is None:
            return self._host_values
        return self._host_values[self._host_valid]

    # -- lazy exact-sum limb planes -------------------------------------------

    def sum_limbs(self) -> jnp.ndarray:
        if self._sum_limbs is None:
            v = self._host_values
            if self.ftype == FieldType.F64:
                planes = exact.f64_limb_planes(
                    v, self.f64_base_exp, self.sum_n_limbs)
            else:
                w = np.asarray(mono_mod.to_mono(self.ftype.value, v),
                               dtype=np.int64) - self.min_mono
                planes = exact.int_limb_planes(w, self.sum_n_limbs)
            pad = self.mono.shape[0] - planes.shape[0]
            if pad:
                planes = np.pad(planes, ((0, pad), (0, 0)))
            self._sum_limbs = _put(planes, self._mesh, 2)
        return self._sum_limbs

    # -- lazy numeric terms dictionary ----------------------------------------

    def term_ids(self):
        """(ids [len] int32, values_mono [card] np.int64) for numeric terms
        aggs: dense group-by ids in ascending value order."""
        if self._term_ids is None:
            m = np.asarray(mono_mod.to_mono(self.ftype.value, self._host_values),
                           dtype=np.int64)
            real = m if self._host_valid is None else m[self._host_valid]
            uniq = np.unique(real) if real.size else np.zeros(1, np.int64)
            ids = np.clip(np.searchsorted(uniq, m), 0, len(uniq) - 1) \
                .astype(np.int32)
            pad = self.mono.shape[0] - ids.shape[0]
            if pad:
                ids = np.pad(ids, (0, pad))
            self._term_ids = _put(ids, self._mesh, 1)
            self._term_values_mono = uniq
        return self._term_ids, self._term_values_mono

    @property
    def card(self) -> int:
        """Static bucket cardinality for terms aggs."""
        if self.ftype == FieldType.KEYWORD:
            return max(1, len(self.terms))
        _, uniq = self.term_ids()
        return max(1, len(uniq))

    def min_user(self):
        return mono_mod.scalar_from_mono(self.ftype.value, self.min_mono)


@dataclass
class DeviceIndex:
    schema: Schema
    epoch: int
    T: int  # padded doc-axis length
    n_docs: int  # real doc count (pre-delete)
    total_values: int  # max real value count across fields (overflow guard)
    alive: jnp.ndarray  # [T] bool; False on padding and deleted docs
    columns: Dict[str, DeviceColumn]
    #: host map global doc -> (segment, local doc) for top_hits harvest
    seg_starts: np.ndarray = field(default_factory=lambda: np.zeros(1, np.int64))
    mesh: Optional[object] = None  # jax.sharding.Mesh ('d' axis) if sharded
    n_shards: int = 1

    def column(self, name: str) -> DeviceColumn:
        try:
            return self.columns[name]
        except KeyError:
            raise KeyError(f"field {name!r} not loaded (not FAST or unknown)")

    def keyword_ord(self, field: str, term: str) -> int:
        """Global ordinal of a term, or -1 if absent (matches nothing)."""
        col = self.column(field)
        i = int(np.searchsorted(col.terms, term))
        if i < len(col.terms) and col.terms[i] == term:
            return i
        return -1


def load_device_index(index, mesh=None) -> DeviceIndex:
    """Concatenate all segments and move columns to the device(s)."""
    schema: Schema = index.schema
    segments = index.segments
    if mesh is not None and tuple(mesh.axis_names) != ("d",):
        raise ValueError("mesh must have a single axis named 'd'")
    D = 1 if mesh is None else int(np.prod(mesh.devices.shape))
    n_docs = sum(s.max_doc for s in segments)
    T = _pad_to(max(n_docs, 1), PAD_BLOCK * D)

    alive = np.zeros(T, dtype=bool)
    pos = 0
    for s in segments:
        alive[pos:pos + s.max_doc] = s.alive_mask()
        pos += s.max_doc

    columns: Dict[str, DeviceColumn] = {}
    total_values = 0
    for entry in schema.fields:
        if not entry.fast:
            continue
        name = entry.name
        if entry.type == FieldType.KEYWORD:
            col = _load_csr(entry, segments, T, D, mesh, keyword=True)
        elif any(s.fields[name].offsets is not None for s in segments):
            col = _load_csr(entry, segments, T, D, mesh, keyword=False)
        else:
            col = _load_numeric_single(entry, segments, T, mesh)
        columns[name] = col
        total_values = max(total_values, col.n_values)

    if max(total_values, n_docs) >= exact.MAX_ADDENDS:
        raise ValueError("index exceeds the exact-sum addend bound (2^36)")

    for col in columns.values():
        if col.ftype != FieldType.KEYWORD:
            _plan_sums(col, max(total_values, n_docs))

    seg_starts = (np.cumsum([0] + [s.max_doc for s in segments])[:-1]
                  if segments else np.zeros(1))
    return DeviceIndex(schema=schema, epoch=index.epoch, T=T, n_docs=n_docs,
                       total_values=total_values,
                       alive=_put(alive, mesh, 1), columns=columns,
                       seg_starts=np.asarray(seg_starts, np.int64),
                       mesh=mesh, n_shards=D)


def _plan_sums(col: DeviceColumn, max_addends: int) -> None:
    guard_bits = max(1, max_addends).bit_length()
    if col.ftype == FieldType.F64:
        col.sum_direct = False
        real = col._real_values()
        if real.size:
            base, n_limbs = exact.f64_sum_plan(real)
        else:
            base, n_limbs = 1, 1
        col.f64_base_exp, col.sum_n_limbs = base, n_limbs
    else:
        span = col.max_mono - col.min_mono
        bits = max(1, int(span).bit_length())
        col.sum_direct = bits + guard_bits <= 63
        col.sum_n_limbs = (bits + exact.LIMB_BITS - 1) // exact.LIMB_BITS


def _load_numeric_single(entry, segments, T, mesh) -> DeviceColumn:
    parts = [s.fields[entry.name].values for s in segments]
    from .segment import numeric_dtype
    vals = (np.concatenate(parts) if parts
            else np.zeros(0, dtype=numeric_dtype(entry.type)))
    m = np.asarray(mono_mod.to_mono(entry.type.value, vals), dtype=np.int64)
    n = m.shape[0]
    min_mono = int(m.min()) if n else 0
    max_mono = int(m.max()) if n else 0
    mono_padded = np.full(T, min_mono, dtype=np.int64)
    mono_padded[:n] = m
    # padded _host_values so limb rows align with mono rows; padding rows are
    # excluded by the alive mask at query time and by _host_valid in plans
    fill = vals[0] if n else 0
    host = np.full(T, 0 if entry.type != FieldType.F64 else 0.0,
                   dtype=vals.dtype if n else np.float64)
    if n:
        host[:n] = vals
        host[n:] = mono_mod.from_mono(entry.type.value,
                                      np.full(T - n, min_mono, np.int64))
    hvalid = np.zeros(T, dtype=bool)
    hvalid[:n] = True
    return DeviceColumn(
        name=entry.name, ftype=entry.type, multi=False,
        mono=_put(mono_padded, mesh, 1),
        min_mono=min_mono, max_mono=max_mono, n_values=n,
        _mesh=mesh, _host_values=host, _host_valid=hvalid)


def _load_csr(entry, segments, T, D, mesh, keyword: bool) -> DeviceColumn:
    """Multi-valued numeric or keyword column: flat value rows partitioned by
    doc shard, with shard-local doc ids."""
    from .segment import numeric_dtype
    name = entry.name
    if keyword:
        gterms = sorted(set().union(*[set(s.fields[name].terms or [])
                                      for s in segments])) if segments else []
        gterms = np.asarray(gterms, dtype=object)
    vals_parts, doc_parts = [], []
    doc_base = 0
    for s in segments:
        fd = s.fields[name]
        offs = fd.offsets.astype(np.int64)
        reps = np.diff(offs)
        doc_of_val = np.repeat(np.arange(s.max_doc, dtype=np.int64), reps)
        if keyword:
            local = np.asarray(fd.terms or [], dtype=object)
            remap = (np.searchsorted(gterms, local).astype(np.int64)
                     if len(local) else np.zeros(0, np.int64))
            vals_parts.append(remap[fd.values.astype(np.int64)])
        else:
            vals_parts.append(fd.values)
        doc_parts.append(doc_of_val + doc_base)
        doc_base += s.max_doc
    if keyword:
        vals = (np.concatenate(vals_parts) if vals_parts
                else np.zeros(0, np.int64))
        m = np.asarray(vals, dtype=np.int64)
    else:
        vals = (np.concatenate(vals_parts) if vals_parts
                else np.zeros(0, dtype=numeric_dtype(entry.type)))
        m = np.asarray(mono_mod.to_mono(entry.type.value, vals), np.int64)
    docs = (np.concatenate(doc_parts) if doc_parts
            else np.zeros(0, np.int64))
    n = m.shape[0]
    min_mono = int(m.min()) if n else 0
    max_mono = int(m.max()) if n else 0

    # partition rows by doc shard (docs are sorted ascending by construction)
    chunk = T // D
    shard_of_row = docs // chunk if n else docs
    counts = np.bincount(shard_of_row.astype(np.int64), minlength=D) \
        if n else np.zeros(D, np.int64)
    Vp = _pad_to(int(counts.max()) if n else 1, PAD_BLOCK)
    V = D * Vp
    mono_out = np.full(V, min_mono, np.int64)
    doc_out = np.zeros(V, np.int32)
    valid_out = np.zeros(V, bool)
    hv_dtype = np.int64 if keyword else vals.dtype if n else np.float64
    host_out = np.zeros(V, hv_dtype)
    if n:
        host_out[:] = mono_mod.from_mono(entry.type.value,
                                         np.full(V, min_mono, np.int64)) \
            if not keyword else 0
    start = 0
    for d in range(D):
        c = int(counts[d])
        sel = slice(start, start + c)
        o = d * Vp
        mono_out[o:o + c] = m[sel]
        doc_out[o:o + c] = (docs[sel] - d * chunk).astype(np.int32)
        valid_out[o:o + c] = True
        host_out[o:o + c] = vals[sel]
        start += c
    return DeviceColumn(
        name=name, ftype=entry.type, multi=True,
        mono=_put(mono_out, mesh, 1),
        doc_id=_put(doc_out, mesh, 1), valid=_put(valid_out, mesh, 1),
        terms=gterms if keyword else None,
        min_mono=min_mono, max_mono=max_mono, n_values=n,
        _mesh=mesh, _host_values=host_out, _host_valid=valid_out)
