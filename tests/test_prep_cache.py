"""Cross-process prep cache (round 4, VERDICT r3 #7): cube operands,
member operands and OrderedLayout permutations persist as .npz inside the
index directory, keyed by (format version, epoch, shard count, operand
key). A reopened index loads them instead of rebuilding (argsorts,
bincounts, device scatter builds); a commit bumps the epoch so stale
entries are structurally unreachable. RAM indexes skip persistence."""

import os

import numpy as np

from tantivy_aggregations_tpu import (
    Index,
    MatchAllQuery,
    RangeQuery,
    SchemaBuilder,
    TermQuery,
    count_agg,
    percentiles_agg,
    sum_agg,
    terms_agg,
)
from tantivy_aggregations_tpu.schema import Cardinality


def disk_index(path, n=3000, seed=13):
    schema = (SchemaBuilder()
              .add_u64_field("amount")
              .add_f64_field("price")
              .add_keyword_field("status")
              .add_keyword_field("sku")
              .add_u64_field("weights", cardinality=Cardinality.MULTI)
              .build())
    idx = Index.create(str(path), schema)
    w = idx.writer()
    rng = np.random.default_rng(seed)
    nv = rng.integers(0, 4, n)
    offs = np.zeros(n + 1, np.uint32)
    np.cumsum(nv, out=offs[1:])
    w.add_documents_columnar({
        "amount": rng.integers(0, 2000, n, dtype=np.uint64),
        "price": np.round(rng.lognormal(2.0, 1.0, n), 2),
        "status": np.asarray(["a", "b", "c"], object)[
            rng.integers(0, 3, n)],
        "sku": np.asarray([f"s{int(i):05d}"
                           for i in rng.integers(0, 600, n)], object),
        "weights": (offs, rng.integers(0, 100, int(offs[-1]),
                                       dtype=np.uint64)),
    }, n)
    w.commit()
    return idx


REQS = [
    # cube (status chain), prefix-terms layout, member op, percentiles
    (TermQuery("status", "a"), {"n": count_agg(), "s": sum_agg("amount")}),
    (MatchAllQuery(), {"t": terms_agg("sku", size=8,
                                      sub_aggs={"s": sum_agg("amount")})}),
    (TermQuery("weights", 42), {"t": terms_agg("sku", size=8,
                                               sub_aggs={"s": sum_agg(
                                                   "amount")})}),
    (RangeQuery("amount", lower=100), {"p": percentiles_agg("price")}),
    (TermQuery("status", "b"),
     {"t": terms_agg("status", size=3,
                     sub_aggs={"p": percentiles_agg("price",
                                                    (25.0, 75.0))})}),
]


def test_prep_cache_roundtrip(tmp_path):
    idx = disk_index(tmp_path / "ix")
    s1, o = idx.searcher(), idx.oracle_searcher()
    want = [o.agg_search(q, a) for q, a in REQS]
    assert [s1.agg_search(q, a) for q, a in REQS] == want
    d = tmp_path / "ix" / ".prep_cache"
    assert d.is_dir() and len(list(d.glob("*.npz"))) >= 4, \
        sorted(os.listdir(d)) if d.is_dir() else "no cache dir"
    # "warm restart": a fresh Index.open + searcher loads operands from
    # the cache (fresh DeviceIndex, empty in-memory cube cache)
    idx2 = Index.open(str(tmp_path / "ix"))
    s2 = idx2.searcher()
    assert [s2.agg_search(q, a) for q, a in REQS] == want


def test_prep_cache_epoch_invalidation(tmp_path):
    idx = disk_index(tmp_path / "ix", n=800)
    s1 = idx.searcher()
    q, a = REQS[0]
    s1.agg_search(q, a)
    # a new commit bumps the epoch: reopened searchers must answer from
    # the NEW contents (old cache entries are unreachable by key)
    w = idx.writer()
    w.add_document({"amount": 5, "price": 1.0, "status": "a",
                    "sku": "s99999", "weights": [42]})
    w.commit()
    idx2 = Index.open(str(tmp_path / "ix"))
    s2, o2 = idx2.searcher(), idx2.oracle_searcher()
    assert [s2.agg_search(qq, aa) for qq, aa in REQS] == \
        [o2.agg_search(qq, aa) for qq, aa in REQS]


def test_prep_cache_corrupt_file_is_miss(tmp_path):
    idx = disk_index(tmp_path / "ix", n=600)
    s1, o = idx.searcher(), idx.oracle_searcher()
    want = [o.agg_search(q, a) for q, a in REQS]
    assert [s1.agg_search(q, a) for q, a in REQS] == want
    d = tmp_path / "ix" / ".prep_cache"
    for f in d.glob("*.npz"):
        f.write_bytes(b"garbage")
    idx2 = Index.open(str(tmp_path / "ix"))
    assert [idx2.searcher().agg_search(q, a) for q, a in REQS] == want
