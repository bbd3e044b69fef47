"""Cross-mode property test: for randomized indexes and a broad agg tree,
FOUR independent executions must agree exactly —
oracle == device(unsharded) == device(8-way mesh) == device(scatter-forced).

This is the strongest single invariant in the repo: it exercises every
execution mode (dense one-hot, prefix layout, rank-select, per-doc preagg,
scatter fallback, shard_map collectives) against the sequential spec."""

import numpy as np
import pytest

from tantivy_aggregations_tpu import (
    BooleanQuery,
    Cardinality,
    ExistsQuery,
    Index,
    MatchAllQuery,
    RangeQuery,
    SchemaBuilder,
    TermQuery,
    avg_agg,
    count_agg,
    filter_agg,
    histogram_agg,
    max_agg,
    min_agg,
    percentiles_agg,
    post_filter_agg,
    stats_agg,
    sum_agg,
    terms_agg,
    top_hits_agg,
)
from tantivy_aggregations_tpu.engine_config import EngineConfig
from tantivy_aggregations_tpu.parallel.shard import make_mesh


def build_random(seed: int, n: int) -> Index:
    rng = np.random.default_rng(seed)
    schema = (SchemaBuilder()
              .add_u64_field("u").add_i64_field("i").add_f64_field("f")
              .add_date_field("ts")
              .add_keyword_field("k")
              .add_keyword_field("tags", cardinality=Cardinality.MULTI)
              .add_f64_field("mf", cardinality=Cardinality.MULTI)
              .add_text_field("txt")
              .build())
    idx = Index.create_in_ram(schema)
    w = idx.writer()
    words = ["alpha", "beta", "gamma", "delta", "zipf", "tail"]
    n_seg = int(rng.integers(1, 4))
    bounds = set(rng.integers(0, n, size=n_seg - 1).tolist())
    for d in range(n):
        doc = {"ts": int(rng.integers(0, 10**7))}
        if rng.random() < 0.95:
            doc["u"] = int(rng.integers(0, 2**40))
        if rng.random() < 0.95:
            doc["i"] = int(rng.integers(-2**35, 2**35))
        if rng.random() < 0.95:
            doc["f"] = float(rng.standard_normal() * 10**int(rng.integers(-5, 6)))
        if rng.random() < 0.8:
            doc["k"] = f"key{int(rng.integers(0, 40)):03d}"
        doc["tags"] = [words[int(t)] for t in
                       rng.integers(0, len(words), int(rng.integers(0, 4)))]
        doc["mf"] = [float(np.round(x, 4)) for x in
                     rng.standard_normal(int(rng.integers(0, 3)))]
        doc["txt"] = " ".join(words[int(t)] for t in
                              rng.integers(0, len(words),
                                           int(rng.integers(0, 5))))
        w.add_document(doc)
        if d in bounds:
            w.commit()
    w.commit()
    w2 = idx.writer()
    w2.delete_term("k", "key003")
    w2.commit()
    return idx


AGGS = {
    "n": count_agg(),
    "su": sum_agg("u"), "si": sum_agg("i"), "sf": sum_agg("f"),
    "st": stats_agg("i"),
    "am": avg_agg("mf"),
    "p": percentiles_agg("f"),
    "h": histogram_agg("u", interval=2**33,
                       sub_aggs={"s": sum_agg("f"), "n": count_agg()}),
    "t": terms_agg("k", size=7,
                   sub_aggs={"s": sum_agg("u"), "a": avg_agg("mf")}),
    "tt": terms_agg("tags", size=4, sub_aggs={"n": count_agg()}),
    "tx": terms_agg("txt", size=3),
    "fl": filter_agg(TermQuery("tags", "zipf"),
                     sub_aggs={"n": count_agg(), "s": sum_agg("i")}),
    "pf": post_filter_agg(ExistsQuery("k"), sub_aggs={"n": count_agg()}),
    "th": top_hits_agg(4, "i"),
    "cal": None,  # placeholder replaced below (date_histogram calendar)
}
from tantivy_aggregations_tpu import date_histogram_agg  # noqa: E402
AGGS["cal"] = date_histogram_agg("ts", calendar_interval="month",
                                 sub_aggs={"n": count_agg()})

from tantivy_aggregations_tpu import PrefixQuery  # noqa: E402

QUERIES = [
    MatchAllQuery(),
    BooleanQuery(must=[RangeQuery("u", lower=2**38)],
                 must_not=[TermQuery("tags", "beta")]),
    BooleanQuery(must=[PrefixQuery("k", "key0")],
                 should=[]),
]


def test_four_way_agreement():
    idx = build_random(101, n=400)
    oracle = idx.oracle_searcher()
    dev = idx.searcher()
    dev_scatter = idx.searcher(config=EngineConfig(dense_nb=1))
    dev_mesh = idx.searcher(mesh=make_mesh(8))
    for q in QUERIES:
        want = oracle.agg_search(q, AGGS)
        assert dev.agg_search(q, AGGS) == want
        assert dev_scatter.agg_search(q, AGGS) == want
        assert dev_mesh.agg_search(q, AGGS) == want


def test_more_query_shapes_single_mode():
    idx = build_random(202, n=300)
    oracle = idx.oracle_searcher()
    dev = idx.searcher()
    for q in [TermQuery("k", "key007"),
              PrefixQuery("txt", "ze"),
              RangeQuery("i", lower=-2**34, upper=2**34)]:
        assert dev.agg_search(q, AGGS) == oracle.agg_search(q, AGGS)
