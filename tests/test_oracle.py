"""Golden tests for the CPU oracle — hand-computed expected fruits.

These pin down the semantics spec (SURVEY.md §A) before any device code is
trusted: deletes, multi-valued contribution, empty-bucket policy, term
ordering, exact sums, avg denominators.
"""

import math

import numpy as np
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
)

from fixtures import DOCS, basic_index


@pytest.fixture(scope="module")
def oracle():
    return basic_index(num_segments=2).oracle_searcher()


def test_count_match_all(oracle):
    r = oracle.agg_search(MatchAllQuery(), {"n": count_agg()})
    assert r["n"]["value"] == 5


def test_sum_u64(oracle):
    r = oracle.agg_search(MatchAllQuery(), {"s": sum_agg("qty")})
    assert r["s"]["value"] == 3 + 7 + 0 + 11 + 3


def test_sum_f64_exact(oracle):
    r = oracle.agg_search(MatchAllQuery(), {"s": sum_agg("price")})
    assert r["s"]["value"] == math.fsum([9.99, 0.25, -3.5, 100.0, 9.99])


def test_min_max_i64(oracle):
    r = oracle.agg_search(MatchAllQuery(),
                          {"lo": min_agg("delta"), "hi": max_agg("delta")})
    assert r["lo"]["value"] == -5 and r["hi"]["value"] == 12


def test_term_query_keyword(oracle):
    r = oracle.agg_search(TermQuery("cat", "a"), {"n": count_agg(),
                                                  "s": sum_agg("qty")})
    assert r["n"]["value"] == 2
    assert r["s"]["value"] == 3 + 0


def test_term_query_multivalued_keyword(oracle):
    r = oracle.agg_search(TermQuery("tags", "red"), {"n": count_agg()})
    assert r["n"]["value"] == 3  # docs 0, 1, 3 (doc 3 has red twice: one doc)


def test_term_query_numeric(oracle):
    r = oracle.agg_search(TermQuery("qty", 3), {"n": count_agg()})
    assert r["n"]["value"] == 2


def test_range_query(oracle):
    r = oracle.agg_search(RangeQuery("qty", lower=3, upper=11,
                                     include_lower=True, include_upper=False),
                          {"n": count_agg()})
    assert r["n"]["value"] == 3  # qty 3, 7, 3


def test_boolean_query(oracle):
    q = BooleanQuery(must=[RangeQuery("qty", lower=1)],
                     must_not=[TermQuery("cat", "b")])
    r = oracle.agg_search(q, {"n": count_agg()})
    assert r["n"]["value"] == 2  # docs 0 (qty3,a) and 3 (qty11,c)


def test_boolean_should_only(oracle):
    q = BooleanQuery(should=[TermQuery("cat", "a"), TermQuery("cat", "b")])
    r = oracle.agg_search(q, {"n": count_agg()})
    assert r["n"]["value"] == 4


def test_multivalue_sum_and_avg(oracle):
    # scores: [1.5,2.5], [], [0.0], [-1.0,4.25,4.25], [7.125] -> 7 values
    r = oracle.agg_search(MatchAllQuery(), {"a": avg_agg("scores")})
    vals = [1.5, 2.5, 0.0, -1.0, 4.25, 4.25, 7.125]
    assert r["a"]["count"] == 7  # value count, not doc count (§A.4)
    assert r["a"]["sum"] == math.fsum(vals)
    assert r["a"]["value"] == math.fsum(vals) / 7


def test_stats(oracle):
    r = oracle.agg_search(MatchAllQuery(), {"st": stats_agg("counts")})
    # counts: [1,2,3],[10],[],[5,5],[2] -> 7 values, sum 28
    st = r["st"]
    assert st["count"] == 7 and st["sum"] == 28
    assert st["min"] == 1 and st["max"] == 10
    assert st["avg"] == 4.0


def test_empty_result_nulls(oracle):
    r = oracle.agg_search(TermQuery("cat", "nope"),
                          {"lo": min_agg("qty"), "a": avg_agg("qty"),
                           "p": percentiles_agg("price"),
                           "h": histogram_agg("qty", interval=5),
                           "t": terms_agg("cat")})
    assert r["lo"]["value"] is None
    assert r["a"]["value"] is None
    assert all(v is None for v in r["p"]["values"].values())
    assert r["h"]["buckets"] == []
    assert r["t"]["buckets"] == []


def test_histogram_u64_with_sub_sum(oracle):
    r = oracle.agg_search(
        MatchAllQuery(),
        {"h": histogram_agg("qty", interval=5,
                            sub_aggs={"s": sum_agg("qty"), "n": count_agg()})})
    # qty: 3,7,0,11,3 -> buckets 0:[3,0,3] 5:[7] 10:[11]
    bks = r["h"]["buckets"]
    assert [b["key"] for b in bks] == [0, 5, 10]
    assert [b["doc_count"] for b in bks] == [3, 1, 1]
    assert [b["s"]["value"] for b in bks] == [6, 7, 11]
    assert [b["n"]["value"] for b in bks] == [3, 1, 1]


def test_histogram_negative_keys_floor(oracle):
    r = oracle.agg_search(MatchAllQuery(),
                          {"h": histogram_agg("delta", interval=10)})
    # delta: -5,12,0,7,-2 -> floor(-5/10)=-1, floor(12/10)=1, 0, 0, -1
    bks = r["h"]["buckets"]
    assert [b["key"] for b in bks] == [-10, 0, 10]
    assert [b["doc_count"] for b in bks] == [2, 2, 1]


def test_histogram_f64(oracle):
    r = oracle.agg_search(MatchAllQuery(),
                          {"h": histogram_agg("price", interval=10.0)})
    # price: 9.99, 0.25, -3.5, 100.0, 9.99 -> keys 0,0,-10,100,0
    bks = r["h"]["buckets"]
    assert [b["key"] for b in bks] == [-10.0, 0.0, 100.0]
    assert [b["doc_count"] for b in bks] == [1, 3, 1]


def test_terms_keyword(oracle):
    r = oracle.agg_search(MatchAllQuery(),
                          {"t": terms_agg("cat", size=10,
                                          sub_aggs={"s": sum_agg("qty")})})
    bks = r["t"]["buckets"]
    # cat: a,b,a,c,b -> a:2 b:2 c:1; ties broken by key asc
    assert [(b["key"], b["doc_count"]) for b in bks] == [
        ("a", 2), ("b", 2), ("c", 1)]
    assert [b["s"]["value"] for b in bks] == [3, 10, 11]


def test_terms_occurrence_counting(oracle):
    # doc 3 has "red" twice -> red doc_count counts occurrences (§3.2)
    r = oracle.agg_search(MatchAllQuery(), {"t": terms_agg("tags", size=10)})
    d = {b["key"]: b["doc_count"] for b in r["t"]["buckets"]}
    assert d == {"red": 4, "blue": 2, "green": 1}


def test_terms_size_truncation_and_other(oracle):
    r = oracle.agg_search(MatchAllQuery(), {"t": terms_agg("tags", size=1)})
    assert [b["key"] for b in r["t"]["buckets"]] == ["red"]
    assert r["t"]["sum_other_doc_count"] == 3


def test_terms_numeric(oracle):
    r = oracle.agg_search(MatchAllQuery(), {"t": terms_agg("qty", size=10)})
    assert [(b["key"], b["doc_count"]) for b in r["t"]["buckets"]] == [
        (3, 2), (0, 1), (7, 1), (11, 1)]


def test_filter_agg(oracle):
    r = oracle.agg_search(
        MatchAllQuery(),
        {"f": filter_agg(TermQuery("cat", "a"),
                         sub_aggs={"s": sum_agg("price"), "n": count_agg()})})
    assert r["f"]["doc_count"] == 2
    assert r["f"]["s"]["value"] == math.fsum([9.99, -3.5])


def test_post_filter_agg(oracle):
    r = oracle.agg_search(
        TermQuery("tags", "red"),
        {"pf": post_filter_agg(RangeQuery("qty", lower=5),
                               sub_aggs={"n": count_agg()})})
    # red docs: 0,1,3 with qty 3,7,11 -> qty>=5 -> 2
    assert r["pf"]["n"]["value"] == 2


def test_percentiles_exact(oracle):
    r = oracle.agg_search(MatchAllQuery(),
                          {"p": percentiles_agg("qty", percents=(0, 50, 100))})
    # qty sorted: 0,3,3,7,11
    assert r["p"]["values"]["0.0"] == 0.0
    assert r["p"]["values"]["50.0"] == 3.0
    assert r["p"]["values"]["100.0"] == 11.0


def test_deletes():
    oracle = basic_index(num_segments=2, with_deletes=True).oracle_searcher()
    r = oracle.agg_search(MatchAllQuery(), {"n": count_agg(),
                                            "s": sum_agg("qty")})
    assert r["n"]["value"] == 4  # doc 3 (cat c) deleted
    assert r["s"]["value"] == 13


def test_delete_opstamp_ordering():
    from fixtures import basic_schema
    from tantivy_aggregations_tpu import Index
    idx = Index.create_in_ram(basic_schema())
    w = idx.writer()
    w.add_document({"qty": 1, "cat": "x"})
    w.delete_term("cat", "x")
    w.add_document({"qty": 2, "cat": "x"})  # added after delete -> survives
    w.commit()
    r = idx.oracle_searcher().agg_search(MatchAllQuery(), {"n": count_agg()})
    assert r["n"]["value"] == 1


def test_nested_terms_histogram(oracle):
    r = oracle.agg_search(
        MatchAllQuery(),
        {"t": terms_agg("cat", size=10,
                        sub_aggs={"h": histogram_agg("qty", interval=5,
                                                     sub_aggs={"n": count_agg()})})})
    bks = {b["key"]: b for b in r["t"]["buckets"]}
    # cat a: qty 3, 0 -> bucket 0 count 2
    hk = {hb["key"]: hb["doc_count"] for hb in bks["a"]["h"]["buckets"]}
    assert hk == {0: 2}
    hk_b = {hb["key"]: hb["doc_count"] for hb in bks["b"]["h"]["buckets"]}
    assert hk_b == {0: 1, 5: 1}


def test_persistence_roundtrip(tmp_path):
    from tantivy_aggregations_tpu import Index
    from fixtures import basic_schema
    idx = Index.create(str(tmp_path / "idx"), basic_schema())
    w = idx.writer()
    for d in DOCS[:3]:
        w.add_document(d)
    w.commit()
    w.delete_term("cat", "b")
    w.commit()
    r1 = idx.oracle_searcher().agg_search(MatchAllQuery(),
                                          {"n": count_agg(), "s": sum_agg("price")})
    idx2 = Index.open(str(tmp_path / "idx"))
    r2 = idx2.oracle_searcher().agg_search(MatchAllQuery(),
                                           {"n": count_agg(), "s": sum_agg("price")})
    assert r1 == r2
    assert r1["n"]["value"] == 2
