"""Device index loader: host segments -> HBM-resident column arrays.

TPU-native redesign of tantivy's per-segment fast-field readers (SURVEY.md
§2.2 T4/T5, §3.5). Key departures from the reference, chosen for the
hardware:

- **One concatenated doc axis.** Segments are concatenated (not stacked and
  padded per segment): per-segment execution only exists in the reference
  because its collector state is sequential. Here every reduction is
  order-independent and exact, so the doc axis is a single dense [T] array
  padded with dead docs to a block multiple. Multi-chip sharding shards this
  axis (SURVEY.md §2.3).
- **Global ordinals at load.** The reference merges terms buckets by term
  bytes because segment ordinals are local (§A.6). We align ordinals to a
  global sorted term table once at load; bucket merge then becomes dense
  integer addition (and cross-chip merge a plain psum).
- **Mono domain.** All numeric columns are loaded as order-preserving int64
  (utils/mono.py) — device compute never touches f64.
- **CSR expansion.** Multi-valued fields become flat value rows with a
  doc_id per row and a validity mask; "which docs match" and "which values
  contribute" are both vectorized gathers/scatters, not per-doc loops.
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

#: doc/value axes are padded to a multiple of this (VPU lane friendliness,
#: and divisibility for up-to-64-way sharding of the doc axis)
PAD_BLOCK = 1024


def _pad_to(n: int, block: int) -> int:
    return max(block, ((n + block - 1) // block) * block)


@dataclass
class DeviceColumn:
    """One field's device-resident data (index-wide, concatenated)."""

    name: str
    ftype: FieldType
    multi: bool
    # single-valued: mono [T]; multi-valued: mono [V] flat value rows
    mono: jnp.ndarray
    # multi-valued only:
    doc_id: Optional[jnp.ndarray] = None  # [V] int32 (0 for padding rows)
    valid: Optional[jnp.ndarray] = None  # [V] bool (False on padding)
    # keyword only:
    terms: Optional[np.ndarray] = None  # global sorted term table (host)
    # numeric metadata (host scalars, over real values)
    min_mono: int = 0
    max_mono: int = 0
    n_values: int = 0  # real (unpadded, pre-delete) value count
    # exact-sum plan (numeric): either direct int64 or limb planes
    sum_direct: bool = True
    f64_base_exp: int = 1
    sum_n_limbs: int = 1
    _sum_limbs: Optional[jnp.ndarray] = None  # [len(mono), L] int32, lazy
    _host_values: Optional[np.ndarray] = None  # user-domain values (for lazies)
    # numeric terms dictionary (lazy): value id per row + id -> mono value
    _term_ids: Optional[jnp.ndarray] = None
    _term_values_mono: Optional[np.ndarray] = None

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
            self._sum_limbs = jnp.asarray(planes)
        return self._sum_limbs

    # -- lazy numeric terms dictionary ----------------------------------------

    def term_ids(self):
        """(ids [len] int32, values_mono [card] np.int64) for numeric terms
        aggs: dense group-by ids in ascending value order."""
        if self._term_ids is None:
            m = np.asarray(mono_mod.to_mono(self.ftype.value, self._host_values),
                           dtype=np.int64)
            uniq = np.unique(m)  # sorted
            ids = np.searchsorted(uniq, m).astype(np.int32)
            pad = self.mono.shape[0] - ids.shape[0]
            if pad:
                ids = np.pad(ids, (0, pad))
            self._term_ids = jnp.asarray(ids)
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
    total_values: int  # max over fields of real value counts (overflow guard)
    alive: jnp.ndarray  # [T] bool; False on padding and deleted docs
    columns: Dict[str, DeviceColumn]
    #: host map global doc -> (segment, local doc) for top_hits harvest
    seg_starts: np.ndarray = field(default_factory=lambda: np.zeros(1, np.int64))
    mesh: Optional[object] = None  # jax.sharding.Mesh for the sharded path

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
    n_docs = sum(s.max_doc for s in segments)
    block = PAD_BLOCK
    if mesh is not None:
        block = _lcm(PAD_BLOCK, int(np.prod([mesh.shape[a] for a in mesh.axis_names])))
    T = _pad_to(max(n_docs, 1), block)

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
            col = _load_keyword(name, segments, T, block)
        elif any(s.fields[name].offsets is not None for s in segments):
            col = _load_numeric_multi(entry, segments, T, block)
        else:
            col = _load_numeric_single(entry, segments, T)
        columns[name] = col
        total_values = max(total_values, col.n_values)

    if total_values >= exact.MAX_ADDENDS:
        raise ValueError("index exceeds the exact-sum addend bound (2^36)")

    # finalize sum plans now that the global value count is known
    for col in columns.values():
        if col.ftype == FieldType.KEYWORD:
            continue
        _plan_sums(col, total_values)

    seg_starts = np.cumsum([0] + [s.max_doc for s in segments])[:-1] \
        if segments else np.zeros(1, np.int64)
    dindex = DeviceIndex(schema=schema, epoch=index.epoch, T=T, n_docs=n_docs,
                         total_values=total_values,
                         alive=jnp.asarray(alive), columns=columns,
                         seg_starts=np.asarray(seg_starts, np.int64), mesh=mesh)
    return dindex


def _lcm(a: int, b: int) -> int:
    return a * b // math.gcd(a, b)


def _plan_sums(col: DeviceColumn, total_values: int) -> None:
    guard_bits = max(1, total_values).bit_length()
    if col.ftype == FieldType.F64:
        col.sum_direct = False
        if col.n_values:
            base, n_limbs = exact.f64_sum_plan(col._host_values)
        else:
            base, n_limbs = 1, 1
        col.f64_base_exp, col.sum_n_limbs = base, n_limbs
    else:
        span = col.max_mono - col.min_mono
        bits = max(1, int(span).bit_length())
        col.sum_direct = bits + guard_bits <= 63
        col.sum_n_limbs = (bits + exact.LIMB_BITS - 1) // exact.LIMB_BITS


def _load_numeric_single(entry, segments, T) -> DeviceColumn:
    parts = [s.fields[entry.name].values for s in segments]
    vals = (np.concatenate(parts) if parts
            else np.zeros(0, dtype=np.float64))
    m = np.asarray(mono_mod.to_mono(entry.type.value, vals), dtype=np.int64)
    n = m.shape[0]
    mono_padded = np.zeros(T, dtype=np.int64)
    mono_padded[:n] = m
    # pad rows hold min_mono so they never perturb min/max under a dead mask
    min_mono = int(m.min()) if n else 0
    max_mono = int(m.max()) if n else 0
    mono_padded[n:] = min_mono
    return DeviceColumn(
        name=entry.name, ftype=entry.type, multi=False,
        mono=jnp.asarray(mono_padded),
        min_mono=min_mono, max_mono=max_mono, n_values=n,
        _host_values=vals)


def _load_numeric_multi(entry, segments, T, block) -> DeviceColumn:
    vals_parts, doc_parts = [], []
    doc_base = 0
    for s in segments:
        fd = s.fields[entry.name]
        offs = fd.offsets.astype(np.int64)
        reps = np.diff(offs)
        doc_of_val = np.repeat(np.arange(s.max_doc, dtype=np.int64), reps)
        vals_parts.append(fd.values)
        doc_parts.append(doc_of_val + doc_base)
        doc_base += s.max_doc
    vals = (np.concatenate(vals_parts) if vals_parts
            else np.zeros(0, dtype=np.float64))
    docs = (np.concatenate(doc_parts) if doc_parts
            else np.zeros(0, dtype=np.int64))
    m = np.asarray(mono_mod.to_mono(entry.type.value, vals), dtype=np.int64)
    n = m.shape[0]
    V = _pad_to(max(n, 1), PAD_BLOCK)
    mono_padded = np.zeros(V, dtype=np.int64)
    mono_padded[:n] = m
    min_mono = int(m.min()) if n else 0
    max_mono = int(m.max()) if n else 0
    mono_padded[n:] = min_mono
    doc_padded = np.zeros(V, dtype=np.int32)
    doc_padded[:n] = docs
    valid = np.zeros(V, dtype=bool)
    valid[:n] = True
    return DeviceColumn(
        name=entry.name, ftype=entry.type, multi=True,
        mono=jnp.asarray(mono_padded),
        doc_id=jnp.asarray(doc_padded), valid=jnp.asarray(valid),
        min_mono=min_mono, max_mono=max_mono, n_values=n,
        _host_values=vals)


def _load_keyword(name, segments, T, block) -> DeviceColumn:
    # global sorted term table + ordinal realignment (SURVEY.md §A.6)
    all_terms = sorted(set().union(*[set(s.fields[name].terms or [])
                                     for s in segments])) if segments else []
    gterms = np.asarray(all_terms, dtype=object)
    vals_parts, doc_parts = [], []
    doc_base = 0
    for s in segments:
        fd = s.fields[name]
        local = np.asarray(fd.terms or [], dtype=object)
        remap = np.searchsorted(gterms, local).astype(np.int64) if len(local) \
            else np.zeros(0, dtype=np.int64)
        offs = fd.offsets.astype(np.int64)
        reps = np.diff(offs)
        doc_of_val = np.repeat(np.arange(s.max_doc, dtype=np.int64), reps)
        vals_parts.append(remap[fd.values.astype(np.int64)])
        doc_parts.append(doc_of_val + doc_base)
        doc_base += s.max_doc
    ords = (np.concatenate(vals_parts) if vals_parts
            else np.zeros(0, dtype=np.int64))
    docs = (np.concatenate(doc_parts) if doc_parts
            else np.zeros(0, dtype=np.int64))
    n = ords.shape[0]
    V = _pad_to(max(n, 1), PAD_BLOCK)
    ords_padded = np.zeros(V, dtype=np.int64)
    ords_padded[:n] = ords
    doc_padded = np.zeros(V, dtype=np.int32)
    doc_padded[:n] = docs
    valid = np.zeros(V, dtype=bool)
    valid[:n] = True
    return DeviceColumn(
        name=name, ftype=FieldType.KEYWORD, multi=True,
        mono=jnp.asarray(ords_padded),
        doc_id=jnp.asarray(doc_padded), valid=jnp.asarray(valid),
        terms=gterms, n_values=n)
