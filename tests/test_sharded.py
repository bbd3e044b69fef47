"""Sharded-execution parity: the same queries/aggs over a multi-device mesh
must produce results bit-identical to the oracle (and thus to the
single-device engine). Runs on the 8-virtual-CPU-device mesh (SURVEY.md
§4.4 — the 'multi-node without a cluster' strategy)."""

import jax
import pytest

from tantivy_aggregations_tpu import (
    BooleanQuery,
    MatchAllQuery,
    RangeQuery,
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
from tantivy_aggregations_tpu.parallel.shard import make_mesh

from fixtures import basic_index, random_index


def check(idx, mesh, query, aggs):
    got = idx.searcher(mesh=mesh).agg_search(query, aggs)
    want = idx.oracle_searcher().agg_search(query, aggs)
    assert got == want, f"\nsharded: {got}\noracle:  {want}"


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_sharded_metrics(mesh):
    idx = basic_index(num_segments=2)
    check(idx, mesh, MatchAllQuery(), {
        "n": count_agg(), "s": sum_agg("price"), "st": stats_agg("qty"),
        "lo": min_agg("delta"), "hi": max_agg("delta"),
        "av": avg_agg("scores"), "sc": sum_agg("counts"),
    })


def test_sharded_full_tree(mesh):
    idx = random_index(3, n_docs=500, n_segments=4)
    for q in [MatchAllQuery(), TermQuery("cat", "cat0001"),
              BooleanQuery(must=[RangeQuery("qty", lower=100)],
                           must_not=[TermQuery("tags", "t1")])]:
        check(idx, mesh, q, {
            "n": count_agg(),
            "sp": sum_agg("price"),
            "p": percentiles_agg("price"),
            "h": histogram_agg("qty", interval=131,
                               sub_aggs={"s": sum_agg("price")}),
            "t": terms_agg("cat", size=7,
                           sub_aggs={"s": sum_agg("qty"), "n": count_agg()}),
            "tt": terms_agg("tags", size=4, sub_aggs={"a": avg_agg("scores")}),
            "f": filter_agg(RangeQuery("price", lower=0.0),
                            sub_aggs={"n": count_agg()}),
            "th": top_hits_agg(5, "delta"),
        })


def test_sharded_deletes(mesh):
    idx = basic_index(num_segments=3, with_deletes=True)
    check(idx, mesh, MatchAllQuery(), {
        "n": count_agg(), "t": terms_agg("cat", size=10),
        "h": histogram_agg("qty", interval=5, sub_aggs={"s": sum_agg("price")}),
    })


def test_sharded_nested(mesh):
    idx = random_index(5, n_docs=400, n_segments=2)
    check(idx, mesh, MatchAllQuery(), {
        "t": terms_agg("cat", size=5,
                       sub_aggs={"h": histogram_agg("qty", interval=211,
                                                    sub_aggs={"s": sum_agg("price")})})})


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_mesh_sizes(n_dev):
    idx = basic_index(num_segments=2)
    check(idx, make_mesh(n_dev), MatchAllQuery(), {
        "n": count_agg(), "s": sum_agg("price"),
        "t": terms_agg("tags", size=3),
    })
