"""Shared test fixtures: small hand-checkable indexes and randomized ones.

Mirrors the reference's inline-test pattern (SURVEY.md §4): build a RAM
index with a handful of docs across numeric / keyword / multi-valued fields,
commit in batches to force multiple segments, optionally delete.
"""

from __future__ import annotations

import numpy as np

from tantivy_aggregations_tpu import (
    Cardinality,
    Index,
    SchemaBuilder,
)


def basic_schema():
    return (
        SchemaBuilder()
        .add_u64_field("qty")
        .add_i64_field("delta")
        .add_f64_field("price")
        .add_date_field("ts")
        .add_keyword_field("cat")
        .add_keyword_field("tags", cardinality=Cardinality.MULTI)
        .add_f64_field("scores", cardinality=Cardinality.MULTI)
        .add_u64_field("counts", cardinality=Cardinality.MULTI)
        .build()
    )


DOCS = [
    {"qty": 3, "delta": -5, "price": 9.99, "ts": 1_000_000, "cat": "a",
     "tags": ["red", "blue"], "scores": [1.5, 2.5], "counts": [1, 2, 3]},
    {"qty": 7, "delta": 12, "price": 0.25, "ts": 2_000_000, "cat": "b",
     "tags": ["red"], "scores": [], "counts": [10]},
    {"qty": 0, "delta": 0, "price": -3.5, "ts": 2_500_000, "cat": "a",
     "tags": [], "scores": [0.0], "counts": []},
    {"qty": 11, "delta": 7, "price": 100.0, "ts": 3_000_000, "cat": "c",
     "tags": ["green", "red", "red"], "scores": [-1.0, 4.25, 4.25],
     "counts": [5, 5]},
    {"qty": 3, "delta": -2, "price": 9.99, "ts": 4_000_000, "cat": "b",
     "tags": ["blue"], "scores": [7.125], "counts": [2]},
]


def basic_index(num_segments: int = 2, with_deletes: bool = False) -> Index:
    idx = Index.create_in_ram(basic_schema())
    w = idx.writer()
    per_seg = max(1, len(DOCS) // num_segments)
    for i, d in enumerate(DOCS):
        w.add_document(d)
        if (i + 1) % per_seg == 0:
            w.commit()
    w.commit()
    if with_deletes:
        w2 = idx.writer()
        w2.delete_term("cat", "c")
        w2.commit()
    return idx


def random_index(seed: int, n_docs: int, n_segments: int = 3,
                 card: int = 50, delete_frac: float = 0.1) -> Index:
    """Randomized index for property tests: skewed values, empty rows,
    multi-segment, deletes."""
    rng = np.random.default_rng(seed)
    idx = Index.create_in_ram(basic_schema())
    w = idx.writer()
    cats = [f"cat{i:04d}" for i in range(card)]
    tags = [f"t{i}" for i in range(10)]
    splits = sorted(rng.integers(0, n_docs + 1, size=max(0, n_segments - 1)).tolist())
    boundaries = set(splits)
    for i in range(n_docs):
        doc = {}
        if rng.random() < 0.9:
            doc["qty"] = int(rng.integers(0, 1000))
        if rng.random() < 0.9:
            doc["delta"] = int(rng.integers(-500, 500))
        if rng.random() < 0.9:
            doc["price"] = float(np.round(rng.standard_normal() * 100, 2))
        doc["ts"] = int(rng.integers(0, 10_000_000))
        if rng.random() < 0.85:
            doc["cat"] = cats[int(rng.integers(0, card))]
        doc["tags"] = [tags[int(t)] for t in
                       rng.integers(0, 10, size=int(rng.integers(0, 4)))]
        doc["scores"] = [float(np.round(x, 3)) for x in
                         rng.standard_normal(int(rng.integers(0, 3)))]
        doc["counts"] = [int(x) for x in
                         rng.integers(0, 100, size=int(rng.integers(0, 3)))]
        w.add_document(doc)
        if i in boundaries:
            w.commit()
    w.commit()
    if delete_frac > 0:
        w2 = idx.writer()
        for c in rng.choice(cats, size=max(1, int(card * delete_frac)),
                            replace=False):
            w2.delete_term("cat", str(c))
        w2.commit()
    return idx
