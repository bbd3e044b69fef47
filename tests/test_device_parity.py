"""Device engine vs CPU oracle: results must be exactly equal (== on the
fruit dicts — integer aggregates bit-identical, f64 aggregates exact).

This is the rebuild's core correctness gate (SURVEY.md §4.1): every agg kind,
query kind, multi-valued fields, multi-segment indexes, deletes, empty
results — device output compared with `==` against the oracle."""

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

from fixtures import basic_index, random_index


@pytest.fixture(scope="module")
def idx():
    return basic_index(num_segments=2)


@pytest.fixture(scope="module")
def searchers(idx):
    return idx.searcher(), idx.oracle_searcher()


def check(searchers, query, aggs):
    dev, orc = searchers
    got = dev.agg_search(query, aggs)
    want = orc.agg_search(query, aggs)
    assert got == want, f"\ndevice: {got}\noracle: {want}"
    return got


QUERIES = [
    MatchAllQuery(),
    TermQuery("cat", "a"),
    TermQuery("cat", "nope"),
    TermQuery("tags", "red"),
    TermQuery("qty", 3),
    TermQuery("price", 9.99),
    RangeQuery("qty", lower=3, upper=11),
    RangeQuery("delta", lower=-4, upper=10, include_upper=True),
    RangeQuery("price", lower=0.0),
    RangeQuery("scores", lower=0.0, upper=5.0),
    BooleanQuery(must=[RangeQuery("qty", lower=1)],
                 must_not=[TermQuery("cat", "b")]),
    BooleanQuery(should=[TermQuery("cat", "a"), TermQuery("cat", "c")]),
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_metrics_all_queries(searchers, qi):
    check(searchers, QUERIES[qi], {
        "n": count_agg(),
        "sq": sum_agg("qty"), "sd": sum_agg("delta"), "sp": sum_agg("price"),
        "st": stats_agg("price"),
        "lo": min_agg("delta"), "hi": max_agg("delta"),
        "av": avg_agg("scores"),  # multi-valued f64
        "sc": sum_agg("counts"),  # multi-valued u64
    })


def test_percentiles(searchers):
    check(searchers, MatchAllQuery(), {
        "p": percentiles_agg("qty"),
        "pp": percentiles_agg("price", percents=(0, 10, 50, 90, 100)),
        "pm": percentiles_agg("scores"),  # multi-valued
    })


def test_histogram_with_subs(searchers):
    check(searchers, MatchAllQuery(), {
        "h": histogram_agg("qty", interval=5,
                           sub_aggs={"s": sum_agg("price"), "n": count_agg(),
                                     "m": min_agg("delta"),
                                     "a": avg_agg("scores")}),
        "hd": histogram_agg("delta", interval=10),
        "hf": histogram_agg("price", interval=10.0),
        "ho": histogram_agg("qty", interval=7, offset=2),
        "hm": histogram_agg("counts", interval=3),  # multi-valued field
        "hts": histogram_agg("ts", interval=1_000_000),  # date
    })


def test_terms_with_subs(searchers):
    check(searchers, MatchAllQuery(), {
        "t": terms_agg("cat", size=10,
                       sub_aggs={"s": sum_agg("qty"), "n": count_agg(),
                                 "p": sum_agg("price")}),
        "tt": terms_agg("tags", size=10, sub_aggs={"s": sum_agg("scores")}),
        "tn": terms_agg("qty", size=3),
        "t1": terms_agg("tags", size=1),
    })


def test_filter_and_post_filter(searchers):
    check(searchers, TermQuery("tags", "red"), {
        "f": filter_agg(RangeQuery("qty", lower=5),
                        sub_aggs={"n": count_agg(), "s": sum_agg("price"),
                                  "h": histogram_agg("qty", interval=5)}),
        "pf": post_filter_agg(TermQuery("cat", "a"),
                              sub_aggs={"t": terms_agg("cat", size=5)}),
    })


def test_nested_terms_histogram(searchers):
    check(searchers, MatchAllQuery(), {
        "t": terms_agg("cat", size=10,
                       sub_aggs={"h": histogram_agg("qty", interval=5,
                                                    sub_aggs={"n": count_agg(),
                                                              "s": sum_agg("price")})})})


def test_nested_histogram_terms(searchers):
    check(searchers, MatchAllQuery(), {
        "h": histogram_agg("qty", interval=5,
                           sub_aggs={"t": terms_agg("cat", size=2,
                                                    sub_aggs={"s": sum_agg("delta")})})})


def test_filter_under_terms(searchers):
    check(searchers, MatchAllQuery(), {
        "t": terms_agg("cat", size=10,
                       sub_aggs={"f": filter_agg(RangeQuery("qty", lower=3),
                                                 sub_aggs={"s": sum_agg("qty")})})})


def test_top_hits(searchers):
    check(searchers, MatchAllQuery(), {"th": top_hits_agg(3, "price")})
    check(searchers, TermQuery("cat", "a"),
          {"th": top_hits_agg(5, "delta", ascending=True)})


def test_deletes_parity():
    idx = basic_index(num_segments=2, with_deletes=True)
    check((idx.searcher(), idx.oracle_searcher()), MatchAllQuery(), {
        "n": count_agg(), "s": sum_agg("price"),
        "t": terms_agg("cat", size=10),
        "h": histogram_agg("qty", interval=5),
    })


def test_empty_index_parity():
    from fixtures import basic_schema
    from tantivy_aggregations_tpu import Index
    idx = Index.create_in_ram(basic_schema())
    idx.writer().commit()
    check((idx.searcher(), idx.oracle_searcher()), MatchAllQuery(), {
        "n": count_agg(), "s": sum_agg("price"), "lo": min_agg("qty"),
        "p": percentiles_agg("price"), "t": terms_agg("cat"),
        "h": histogram_agg("qty", interval=5),
    })


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_property_random_index(seed):
    idx = random_index(seed, n_docs=300, n_segments=3)
    s = (idx.searcher(), idx.oracle_searcher())
    for q in [MatchAllQuery(), TermQuery("cat", "cat0007"),
              RangeQuery("delta", lower=-100, upper=100),
              BooleanQuery(must=[RangeQuery("qty", lower=200)],
                           must_not=[TermQuery("tags", "t3")])]:
        check(s, q, {
            "n": count_agg(),
            "sp": sum_agg("price"),
            "st": stats_agg("delta"),
            "av": avg_agg("scores"),
            "p": percentiles_agg("price"),
            "h": histogram_agg("qty", interval=97,
                               sub_aggs={"s": sum_agg("price")}),
            "t": terms_agg("cat", size=7,
                           sub_aggs={"s": sum_agg("qty"), "n": count_agg()}),
            "tt": terms_agg("tags", size=5, sub_aggs={"a": avg_agg("price")}),
            "f": filter_agg(RangeQuery("price", lower=0.0),
                            sub_aggs={"n": count_agg(), "s": sum_agg("scores")}),
        })


def test_program_cache_reuse(idx):
    """Same query/agg shapes with different params must reuse the program."""
    dev = idx.searcher()
    orc = idx.oracle_searcher()
    aggs = {"n": count_agg(), "s": sum_agg("qty")}
    for v in ["a", "b", "c", "nope"]:
        q = TermQuery("cat", v)
        assert dev.agg_search(q, aggs) == orc.agg_search(q, aggs)
    assert len(dev._programs) == 1


def test_terms_on_multivalued_numeric(searchers):
    check(searchers, MatchAllQuery(), {
        "t": terms_agg("counts", size=5, sub_aggs={"s": sum_agg("qty")}),
        "tm": terms_agg("scores", size=4)})


def test_noninteger_percentiles(searchers):
    check(searchers, MatchAllQuery(), {
        "p": percentiles_agg("price", percents=(0.5, 33.3, 99.9)),
        "pq": percentiles_agg("qty", percents=(12.5, 87.5))})
