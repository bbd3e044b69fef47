"""Terms top-k ordering by sub-metric / key / count (SURVEY.md §2.1 C10:
"top-k selection by count (or by sub-metric)"). Device selection must be
bit-identical to the oracle under every mode: dense one-hot, prefix layout,
plane fan-out, host-side selection (avg/f64), nesting, ties, and nulls."""

import numpy as np
import pytest

from tantivy_aggregations_tpu import (
    Index,
    MatchAllQuery,
    RangeQuery,
    SchemaBuilder,
    TermQuery,
    avg_agg,
    count_agg,
    histogram_agg,
    max_agg,
    min_agg,
    sum_agg,
    terms_agg,
)
from tantivy_aggregations_tpu.schema import Cardinality


def check(idx, query, aggs):
    got = idx.searcher().agg_search(query, aggs)
    want = idx.oracle_searcher().agg_search(query, aggs)
    assert got == want, f"\ndevice: {got}\noracle: {want}"
    return got


def small_index():
    schema = (SchemaBuilder()
              .add_keyword_field("cat")
              .add_u64_field("qty")
              .add_i64_field("delta")
              .add_f64_field("price")
              .add_u64_field("counts", cardinality=Cardinality.MULTI)
              .add_keyword_field("tags", cardinality=Cardinality.MULTI)
              .build())
    idx = Index.create_in_ram(schema)
    w = idx.writer()
    rows = [
        ("a", 10, -5, 1.5, [1, 2], ["x", "y"]),
        ("b", 10, 3, 2.5, [7], ["x"]),
        ("a", 5, 3, -0.5, [], ["y"]),
        ("c", 20, -9, 0.25, [4], []),
        ("b", 10, 0, 2.5, [], ["z", "x"]),
        ("d", 1, 7, 9.0, [2, 2, 2], ["y"]),
        ("c", 2, -1, -4.5, [], ["z"]),
    ]
    for i, (cat, qty, delta, price, counts, tags) in enumerate(rows):
        w.add_document({"cat": cat, "qty": qty, "delta": delta,
                        "price": price, "counts": counts, "tags": tags})
        if i == 3:
            w.commit()
    w.commit()
    return idx


@pytest.mark.parametrize("direction", ["asc", "desc"])
def test_order_by_sum_direct(direction):
    idx = small_index()
    r = check(idx, MatchAllQuery(),
              {"t": terms_agg("cat", size=3, order=("s", direction),
                              sub_aggs={"s": sum_agg("qty")})})
    sums = [b["s"]["value"] for b in r["t"]["buckets"]]
    assert sums == sorted(sums, reverse=(direction == "desc"))


def test_order_sum_ties_break_key_asc():
    idx = small_index()
    # cats a and b both sum qty = 15 and 20? compute: a: 10+5=15, b: 10+10=20,
    # c: 22, d: 1 — make a tie via delta sums instead: a: -2, b: 3, c: -10, d: 7
    r = check(idx, MatchAllQuery(),
              {"t": terms_agg("cat", size=4, order=("n", "desc"),
                              sub_aggs={"n": count_agg()})})
    # counts: a=2, b=2, c=2, d=1 -> ties break by key asc
    assert [b["key"] for b in r["t"]["buckets"]] == ["a", "b", "c", "d"]


@pytest.mark.parametrize("target,direction", [
    ("_count", "asc"), ("_key", "asc"), ("_key", "desc")])
def test_order_count_and_key_modes(target, direction):
    idx = small_index()
    r = check(idx, MatchAllQuery(),
              {"t": terms_agg("cat", size=3, order=(target, direction))})
    keys = [b["key"] for b in r["t"]["buckets"]]
    if target == "_key":
        want = sorted(keys, reverse=(direction == "desc"))
        assert keys == want


def test_order_by_min_max_with_nulls():
    idx = small_index()
    # counts is multi-valued: cats with zero values must sort LAST
    for target, direction in [("lo", "asc"), ("lo", "desc"),
                              ("hi", "asc"), ("hi", "desc")]:
        r = check(idx, MatchAllQuery(),
                  {"t": terms_agg("cat", size=4, order=(target, direction),
                                  sub_aggs={"lo": min_agg("counts"),
                                            "hi": max_agg("counts")})})
        vals = [b[target]["value"] for b in r["t"]["buckets"]]
        nn = [v for v in vals if v is not None]
        assert nn == sorted(nn, reverse=(direction == "desc"))
        assert all(v is None for v in vals[len(nn):])


def test_order_by_avg_host_path():
    idx = small_index()
    check(idx, MatchAllQuery(),
          {"t": terms_agg("cat", size=3, order=("a", "desc"),
                          sub_aggs={"a": avg_agg("qty")})})
    check(idx, MatchAllQuery(),
          {"t": terms_agg("cat", size=3, order=("a", "asc"),
                          sub_aggs={"a": avg_agg("counts")})})


def test_order_by_f64_sum_host_path():
    idx = small_index()
    check(idx, MatchAllQuery(),
          {"t": terms_agg("cat", size=3, order=("s", "desc"),
                          sub_aggs={"s": sum_agg("price")})})


def test_order_by_signed_sum_device():
    idx = small_index()
    r = check(idx, MatchAllQuery(),
              {"t": terms_agg("cat", size=4, order=("s", "asc"),
                              sub_aggs={"s": sum_agg("delta")})})
    sums = [b["s"]["value"] for b in r["t"]["buckets"]]
    assert sums == sorted(sums)


def test_order_under_filter_query():
    idx = small_index()
    check(idx, RangeQuery("qty", lower=2),
          {"t": terms_agg("cat", size=2, order=("s", "desc"),
                          sub_aggs={"s": sum_agg("qty")})})
    check(idx, TermQuery("tags", "x"),
          {"t": terms_agg("cat", size=3, order=("s", "asc"),
                          sub_aggs={"s": sum_agg("qty")})})


def test_order_nested_under_histogram():
    idx = small_index()
    check(idx, MatchAllQuery(),
          {"h": histogram_agg("qty", interval=10, sub_aggs={
              "t": terms_agg("cat", size=2, order=("s", "desc"),
                             sub_aggs={"s": sum_agg("delta")})})})


def test_order_multi_keyword_plane_fanout():
    idx = small_index()
    for direction in ("asc", "desc"):
        check(idx, MatchAllQuery(),
              {"t": terms_agg("tags", size=2, order=("s", direction),
                              sub_aggs={"s": sum_agg("qty")})})


def test_order_highcard_prefix_mode():
    """card > dense budget routes terms through the prefix layout; ordered
    selection must hold there too (device sort + host avg path)."""
    rng = np.random.default_rng(11)
    schema = (SchemaBuilder().add_keyword_field("sku")
              .add_u64_field("amount").build())
    idx = Index.create_in_ram(schema)
    w = idx.writer()
    n = 4000
    skus = [f"sku{int(i):05d}" for i in rng.integers(0, 500, n)]
    amounts = rng.integers(0, 1000, n, dtype=np.uint64)
    w.add_documents_columnar({"sku": np.asarray(skus, object),
                              "amount": amounts}, n)
    w.commit()
    prog = idx.searcher()._program_for(
        MatchAllQuery(), {"t": terms_agg("sku", size=5, order=("s", "desc"),
                                         sub_aggs={"s": sum_agg("amount")})})
    assert prog.plan[("a", "t")]["mode"] == "prefix"
    assert prog.plan[("a", "t")]["sel"] == "device"
    for direction in ("asc", "desc"):
        r = check(idx, MatchAllQuery(),
                  {"t": terms_agg("sku", size=5, order=("s", direction),
                                  sub_aggs={"s": sum_agg("amount")})})
        sums = [b["s"]["value"] for b in r["t"]["buckets"]]
        assert sums == sorted(sums, reverse=(direction == "desc"))
    # host path at high cardinality (avg order)
    check(idx, MatchAllQuery(),
          {"t": terms_agg("sku", size=5, order=("a", "desc"),
                          sub_aggs={"a": avg_agg("amount")})})


def test_order_validation():
    idx = small_index()
    with pytest.raises(ValueError):
        idx.searcher().agg_search(
            MatchAllQuery(), {"t": terms_agg("cat", order=("nope", "desc"))})
    with pytest.raises(ValueError):
        idx.searcher().agg_search(
            MatchAllQuery(),
            {"t": terms_agg("cat", order=("s", "sideways"),
                            sub_aggs={"s": sum_agg("qty")})})
    from tantivy_aggregations_tpu import percentiles_agg
    with pytest.raises(TypeError):
        idx.searcher().agg_search(
            MatchAllQuery(),
            {"t": terms_agg("cat", order=("p", "desc"),
                            sub_aggs={"p": percentiles_agg("qty")})})


def test_order_sharded_mesh():
    import jax
    from tantivy_aggregations_tpu.parallel.shard import make_mesh
    idx = small_index()
    mesh = make_mesh(4)
    s = idx.searcher(mesh=mesh)
    o = idx.oracle_searcher()
    for order in [("s", "desc"), ("s", "asc"), ("a", "desc"),
                  ("_key", "desc")]:
        aggs = {"t": terms_agg("cat", size=3, order=order,
                               sub_aggs={"s": sum_agg("qty"),
                                         "a": avg_agg("qty")})}
        assert s.agg_search(MatchAllQuery(), aggs) == \
            o.agg_search(MatchAllQuery(), aggs)
