"""Multi-search (vmapped batch) parity: agg_search_batch must equal
per-query agg_search / oracle results for same-shape and mixed batches."""

import pytest

from tantivy_aggregations_tpu import (
    MatchAllQuery,
    RangeQuery,
    TermQuery,
    avg_agg,
    count_agg,
    filter_agg,
    histogram_agg,
    percentiles_agg,
    sum_agg,
    terms_agg,
)

from fixtures import basic_index, random_index


def test_msearch_same_shape():
    idx = random_index(11, n_docs=300, n_segments=2)
    s = idx.searcher()
    o = idx.oracle_searcher()
    aggs = {"n": count_agg(), "s": sum_agg("price"),
            "p": percentiles_agg("price"),
            "t": terms_agg("cat", size=5, sub_aggs={"q": sum_agg("qty")}),
            "h": histogram_agg("qty", interval=101)}
    queries = [TermQuery("cat", f"cat{i:04d}") for i in range(6)]
    got = s.agg_search_batch([(q, aggs) for q in queries])
    for q, r in zip(queries, got):
        assert r == o.agg_search(q, aggs)


def test_msearch_mixed_shapes():
    idx = basic_index(num_segments=2)
    s = idx.searcher()
    o = idx.oracle_searcher()
    a1 = {"n": count_agg()}
    a2 = {"s": sum_agg("price"), "a": avg_agg("scores")}
    reqs = [(MatchAllQuery(), a1), (MatchAllQuery(), a1),
            (TermQuery("cat", "a"), a1),
            (RangeQuery("qty", lower=3), a2),
            (RangeQuery("qty", lower=5), a2)]
    got = s.agg_search_batch(reqs)
    for (q, a), r in zip(reqs, got):
        assert r == o.agg_search(q, a)


def test_msearch_range_params_vary():
    idx = random_index(13, n_docs=400, n_segments=3)
    s = idx.searcher()
    o = idx.oracle_searcher()
    aggs = {"n": count_agg(), "f": filter_agg(TermQuery("tags", "t2"),
                                              sub_aggs={"s": sum_agg("qty")})}
    reqs = [(RangeQuery("delta", lower=-500 + 100 * i, upper=100 * i), aggs)
            for i in range(8)]
    got = s.agg_search_batch(reqs)
    for (q, a), r in zip(reqs, got):
        assert r == o.agg_search(q, a)


def test_msearch_on_sharded_mesh():
    from tantivy_aggregations_tpu.parallel.shard import make_mesh
    idx = basic_index(num_segments=2)
    s = idx.searcher(mesh=make_mesh(8))
    o = idx.oracle_searcher()
    aggs = {"n": count_agg(), "s": sum_agg("price")}
    reqs = [(TermQuery("cat", c), aggs) for c in ["a", "b", "c", "a", "b"]]
    got = s.agg_search_batch(reqs)
    for (q, a), r in zip(reqs, got):
        assert r == o.agg_search(q, a)


def test_msearch_noninteger_percentiles():
    idx = random_index(41, n_docs=300, n_segments=2)
    s = idx.searcher()
    o = idx.oracle_searcher()
    aggs = {"p": percentiles_agg("price", percents=(0.5, 37.5, 99.9))}
    reqs = [(RangeQuery("qty", lower=100 * i), aggs) for i in range(5)]
    got = s.agg_search_batch(reqs)
    for (q, a), r in zip(reqs, got):
        assert r == o.agg_search(q, a)


def test_stream_api():
    idx = random_index(51, n_docs=300, n_segments=2)
    s = idx.searcher()
    o = idx.oracle_searcher()
    aggs = {"n": count_agg(), "s": sum_agg("price")}
    reqs = [(RangeQuery("qty", lower=10 * i), aggs) for i in range(40)]
    got = list(s.agg_search_stream(iter(reqs), lookahead=3))
    assert len(got) == 40
    for (q, a), r in zip(reqs, got):
        assert r == o.agg_search(q, a)


def test_stream_mixed_shapes_order():
    from fixtures import basic_index
    idx = basic_index(num_segments=2)
    s = idx.searcher()
    o = idx.oracle_searcher()
    a1 = {"n": count_agg()}
    a2 = {"s": sum_agg("price")}
    reqs = [(MatchAllQuery(), a1), (TermQuery("cat", "a"), a1),
            (RangeQuery("qty", lower=3), a2), (MatchAllQuery(), a1),
            (RangeQuery("qty", lower=7), a2), (TermQuery("cat", "b"), a1)]
    got = list(s.agg_search_stream(iter(reqs)))
    assert len(got) == len(reqs)
    for (q, a), r in zip(reqs, got):
        assert r == o.agg_search(q, a)


def test_stream_with_percentiles_and_mesh():
    from tantivy_aggregations_tpu.parallel.shard import make_mesh
    idx = random_index(61, n_docs=300, n_segments=2)
    o = idx.oracle_searcher()
    aggs = {"p": percentiles_agg("price"),                 # in-program ranks
            "pn": percentiles_agg("price", percents=(99.9,)),  # 2-phase
            "n": count_agg()}
    reqs = [(RangeQuery("qty", lower=50 * i), aggs) for i in range(20)]
    got = list(idx.searcher().agg_search_stream(iter(reqs)))
    for (q, a), r in zip(reqs, got):
        assert r == o.agg_search(q, a)
    # sharded searcher uses the sort/allgather fallback paths
    got = list(idx.searcher(mesh=make_mesh(8)).agg_search_stream(iter(reqs[:6])))
    for (q, a), r in zip(reqs[:6], got):
        assert r == o.agg_search(q, a)


def test_msearch_dedup():
    """Repeated identical requests in a batch compute once (request-cache
    analog, EngineConfig.msearch_dedup) and every caller still gets a
    correct, independent fruit object; dedup-off path stays identical."""
    import dataclasses
    from tantivy_aggregations_tpu.engine_config import EngineConfig
    idx = random_index(71, n_docs=300, n_segments=2)
    s = idx.searcher()
    o = idx.oracle_searcher()
    aggs = {"n": count_agg(), "s": sum_agg("price"),
            "t": terms_agg("cat", size=4)}
    qa, qb = RangeQuery("qty", lower=100), TermQuery("cat", "cat0001")
    reqs = [(qa, aggs), (qb, aggs), (qa, aggs), (qa, aggs), (qb, aggs)]
    got = s.agg_search_batch(reqs)
    assert len(got) == len(reqs)
    for (q, a), r in zip(reqs, got):
        assert r == o.agg_search(q, a)
    # duplicates are equal but independent objects (no aliased mutation)
    assert got[0] == got[2] and got[0] is not got[2]
    got[2]["n"]["value"] = -1
    assert got[0]["n"]["value"] != -1
    # only 1 submit for all-identical groups: count via program submits
    prog = s._program_for(qa, aggs)
    calls = []
    orig = prog.submit
    prog.submit = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    try:
        outs = s.agg_search_batch([(qa, aggs)] * 5)
    finally:
        prog.submit = orig
    assert len(calls) == 1 and all(r == got[0] for r in outs)
    # dedup off: same fruits
    s.config = dataclasses.replace(EngineConfig(), msearch_dedup=False)
    for (q, a), r2 in zip(reqs, s.agg_search_batch(reqs)):
        assert r2 == o.agg_search(q, a)
