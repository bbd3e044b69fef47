"""Extreme-value and edge-shape tests: wide (hi/lo plane) columns, u64/i64
bounds, f64 subnormals/huge magnitudes, empty segments, all-deleted
segments, single docs. Device results must stay bit-identical to the
oracle across every plane layout."""

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
    percentiles_agg,
    stats_agg,
    sum_agg,
    terms_agg,
)
from tantivy_aggregations_tpu.schema import Cardinality


def check(idx, query, aggs):
    got = idx.searcher().agg_search(query, aggs)
    want = idx.oracle_searcher().agg_search(query, aggs)
    assert got == want, f"\ndevice: {got}\noracle: {want}"
    return got


def _index(fields, docs, segments=2):
    b = SchemaBuilder()
    for name, kind in fields:
        getattr(b, f"add_{kind}_field")(name)
    idx = Index.create_in_ram(b.build())
    w = idx.writer()
    per = max(1, len(docs) // segments)
    for i, d in enumerate(docs):
        w.add_document(d)
        if (i + 1) % per == 0:
            w.commit()
    w.commit()
    return idx


U64MAX = 2**64 - 1
I64MAX = 2**63 - 1
I64MIN = -(2**63)


def test_u64_full_range():
    docs = [{"v": 0}, {"v": U64MAX}, {"v": 1}, {"v": 2**63},
            {"v": 2**63 - 1}, {"v": 12345}]
    idx = _index([("v", "u64")], docs)
    r = check(idx, MatchAllQuery(), {
        "st": stats_agg("v"), "p": percentiles_agg("v", percents=(0, 50, 100))})
    assert r["st"]["min"] == 0 and r["st"]["max"] == U64MAX
    assert r["st"]["sum"] == sum(d["v"] for d in docs)
    check(idx, RangeQuery("v", lower=2**63), {"n": count_agg()})
    check(idx, RangeQuery("v", lower=1, upper=U64MAX, include_upper=True),
          {"n": count_agg(), "s": sum_agg("v")})
    check(idx, TermQuery("v", U64MAX), {"n": count_agg()})


def test_i64_full_range():
    docs = [{"v": I64MIN}, {"v": I64MAX}, {"v": 0}, {"v": -1}, {"v": 7}]
    idx = _index([("v", "i64")], docs)
    r = check(idx, MatchAllQuery(), {"st": stats_agg("v")})
    assert r["st"]["min"] == I64MIN and r["st"]["max"] == I64MAX
    assert r["st"]["sum"] == I64MIN + I64MAX - 1 + 7
    check(idx, RangeQuery("v", lower=I64MIN, upper=0), {"n": count_agg()})
    check(idx, RangeQuery("v", lower=-1, upper=I64MAX, include_upper=True),
          {"s": sum_agg("v")})


def test_f64_extremes():
    docs = [{"v": 0.0}, {"v": -0.0}, {"v": 5e-324}, {"v": -5e-324},
            {"v": 1e308}, {"v": -1e308}, {"v": 1.5e-310}, {"v": 2.0}]
    idx = _index([("v", "f64")], docs)
    r = check(idx, MatchAllQuery(), {
        "st": stats_agg("v"),
        "p": percentiles_agg("v", percents=(0, 25, 50, 75, 100))})
    assert r["st"]["min"] == -1e308 and r["st"]["max"] == 1e308
    # signed-zero equality: term 0.0 must match both zeros
    r = check(idx, TermQuery("v", 0.0), {"n": count_agg()})
    assert r["n"]["value"] == 2
    r = check(idx, TermQuery("v", -0.0), {"n": count_agg()})
    assert r["n"]["value"] == 2
    # zero range bounds
    check(idx, RangeQuery("v", lower=0.0), {"n": count_agg()})
    check(idx, RangeQuery("v", upper=0.0, include_upper=True),
          {"n": count_agg()})
    check(idx, RangeQuery("v", lower=0.0, include_lower=False),
          {"n": count_agg()})


def test_f64_exact_sum_catastrophic():
    # values engineered so naive f64 summation loses everything
    docs = [{"v": 1e16}, {"v": 1.0}, {"v": -1e16}, {"v": 1.0},
            {"v": 1e-8}, {"v": -2.0}]
    idx = _index([("v", "f64")], docs, segments=3)
    r = check(idx, MatchAllQuery(), {"s": sum_agg("v"), "a": avg_agg("v")})
    assert r["s"]["value"] == 1e-8  # exact: (1e16-1e16)+(1+1-2)+1e-8


def test_wide_span_histogram_and_terms():
    # span > 2^31 forces the wide hi/lo plane layout
    docs = [{"v": 0}, {"v": 2**40}, {"v": 2**40 + 5}, {"v": 3 * 2**40},
            {"v": 123}, {"v": 2**40}]
    idx = _index([("v", "u64")], docs)
    check(idx, MatchAllQuery(), {
        "h": histogram_agg("v", interval=2**40,
                           sub_aggs={"s": sum_agg("v"), "n": count_agg()}),
        "t": terms_agg("v", size=10),
        "lo": min_agg("v"), "hi": max_agg("v"),
        "p": percentiles_agg("v")})
    check(idx, RangeQuery("v", lower=2**40, upper=2 * 2**40),
          {"n": count_agg(), "s": sum_agg("v")})


def test_negative_offset_histogram():
    docs = [{"v": -17}, {"v": -3}, {"v": 0}, {"v": 5}, {"v": 23}]
    idx = _index([("v", "i64")], docs)
    check(idx, MatchAllQuery(), {
        "h": histogram_agg("v", interval=7, offset=-2,
                           sub_aggs={"s": sum_agg("v")})})


def test_all_deleted_segment():
    b = SchemaBuilder().add_u64_field("v").add_keyword_field("k").build()
    idx = Index.create_in_ram(b)
    w = idx.writer()
    w.add_document({"v": 1, "k": "gone"})
    w.add_document({"v": 2, "k": "gone"})
    w.commit()
    w.add_document({"v": 3, "k": "kept"})
    w.commit()
    w2 = idx.writer()
    w2.delete_term("k", "gone")
    w2.commit()
    r = check(idx, MatchAllQuery(), {
        "n": count_agg(), "s": sum_agg("v"), "t": terms_agg("k"),
        "p": percentiles_agg("v")})
    assert r["n"]["value"] == 1 and r["s"]["value"] == 3
    assert [b_["key"] for b_ in r["t"]["buckets"]] == ["kept"]


def test_single_doc_index():
    idx = _index([("v", "f64")], [{"v": 3.25}], segments=1)
    r = check(idx, MatchAllQuery(), {
        "st": stats_agg("v"), "p": percentiles_agg("v"),
        "h": histogram_agg("v", interval=1.0)})
    assert r["st"]["avg"] == 3.25
    assert all(v == 3.25 for v in r["p"]["values"].values())


def test_f64_nan_rejected():
    b = SchemaBuilder().add_f64_field("v").build()
    idx = Index.create_in_ram(b)
    w = idx.writer()
    w.add_document({"v": float("nan")})
    w.commit()
    with pytest.raises(ValueError):
        idx.searcher().agg_search(MatchAllQuery(), {"s": sum_agg("v")})


def test_high_card_prefix_path_parity():
    # force the prefix (OrderedLayout) terms path: card > dense_nb
    rng = np.random.default_rng(7)
    n = 4000
    cats = [f"k{int(i):05d}" for i in rng.integers(0, 2000, n)]
    amounts = rng.integers(0, 1000, n)
    b = (SchemaBuilder().add_keyword_field("k").add_u64_field("a")
         .add_f64_field("p").build())
    idx = Index.create_in_ram(b)
    w = idx.writer()
    w.add_documents_columnar(
        {"k": cats, "a": amounts,
         "p": np.round(rng.standard_normal(n) * 10, 2)}, n)
    w.commit()
    aggs = {"t": terms_agg("k", size=13,
                           sub_aggs={"s": sum_agg("a"), "n": count_agg(),
                                     "f": avg_agg("p")})}
    for q in [MatchAllQuery(), RangeQuery("a", lower=100, upper=900),
              TermQuery("k", "k00042")]:
        got = idx.searcher().agg_search(q, aggs)
        want = idx.oracle_searcher().agg_search(q, aggs)
        assert got == want
    # sanity: the plan actually chose the prefix mode
    s = idx.searcher()
    prog = s._program_for(MatchAllQuery(), aggs)
    assert prog.plan[("a", "t")]["mode"] == "prefix"


def test_f64_histogram_negative_zero_boundary():
    """-0.0 == 0.0 numerically, so a zero bucket boundary must place -0.0
    in the [0, interval) bucket on BOTH engines (regression: the device's
    mono-domain boundary sat at mono(+0.0), bucketing -0.0 one bucket low;
    found by fuzz via tests/fixtures.py random_index round(-tiny, 3))."""
    b = (SchemaBuilder().add_f64_field("v")
         .add_f64_field("m", cardinality=Cardinality.MULTI)
         .add_keyword_field("g", cardinality=Cardinality.MULTI).build())
    idx = Index.create_in_ram(b)
    w = idx.writer()
    vals = [-0.0, 0.0, -1e-9, 1e-9, -10.0, 10.0, -9.999, 9.999, 0.0, -0.0]
    for i, v in enumerate(vals):
        w.add_document({"v": v, "m": [v, -v], "g": [f"t{i % 2}", "all"]})
    w.commit()
    s, o = idx.searcher(), idx.oracle_searcher()
    for t in (
        {"h": histogram_agg("v", interval=10.0)},
        {"h": histogram_agg("v", interval=10.0, offset=-20.0)},
        {"hm": histogram_agg("m", interval=10.0)},
        {"t": terms_agg("g", size=4,
                        sub_aggs={"h": histogram_agg("m", interval=10.0)})},
    ):
        got, want = s.agg_search(MatchAllQuery(), t), o.agg_search(
            MatchAllQuery(), t)
        assert got == want, (t, got, want)


def test_multi_bucket_under_multi_parent_fanout():
    """Multi-valued child bucket aggs under a short multi-valued keyword
    parent run on device through the plane fan-out (only CSR-shaped multi
    parents fall back to the host path)."""
    from fixtures import random_index
    idx = random_index(seed=23, n_docs=6000)
    s, o = idx.searcher(), idx.oracle_searcher()
    for q in (MatchAllQuery(), RangeQuery("qty", lower=10, upper=900000)):
        for t in (
            {"t": terms_agg("tags", size=8,
                            sub_aggs={"u": terms_agg("counts", size=5)})},
            {"t": terms_agg("tags", size=8,
                            sub_aggs={"h": histogram_agg("scores",
                                                         interval=25.0)})},
        ):
            prog = s._program_for(q, t)
            assert type(prog).__name__ == "Program", (q, t)  # device, not host
            assert s.agg_search(q, t) == o.agg_search(q, t), (q, t)


def test_multi_preagg_minmax_last_doc():
    """Per-doc min/max pre-aggregates of a multi-valued field must be
    exact for the LAST doc holding values (regression: a reduceat index
    clamp chopped that doc's final value out of its group, so its per-doc
    max came back as its min; fuzz-found)."""
    b = (SchemaBuilder().add_f64_field("m", cardinality=Cardinality.MULTI)
         .add_keyword_field("g").build())
    idx = Index.create_in_ram(b)
    w = idx.writer()
    w.add_document({"m": [5.0, 1.0], "g": "a"})
    w.add_document({"m": [], "g": "a"})
    w.add_document({"m": [0.3, 0.9], "g": "b"})  # last valued doc, asc tail
    w.add_document({"g": "b"})                   # trailing docs w/o values
    w.commit()
    s, o = idx.searcher(), idx.oracle_searcher()
    for t in ({"mx": max_agg("m"), "mn": min_agg("m")},
              {"t": terms_agg("g", size=2,
                              sub_aggs={"mx": max_agg("m"),
                                        "mn": min_agg("m")})}):
        got, want = s.agg_search(MatchAllQuery(), t), o.agg_search(
            MatchAllQuery(), t)
        assert got == want, (t, got, want)
