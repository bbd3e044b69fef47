"""Calendar-interval date histograms (month/quarter/year + week/day sugar):
shared spec in utils/calendar.py, bit-identical device vs oracle."""

import datetime as dt

import numpy as np
import pytest

from tantivy_aggregations_tpu import (
    Cardinality,
    Index,
    MatchAllQuery,
    RangeQuery,
    SchemaBuilder,
    count_agg,
    date_histogram_agg,
    sum_agg,
)
from tantivy_aggregations_tpu.utils import calendar as cal


def micros(y, m, d, hh=0, mm=0):
    return int(dt.datetime(y, m, d, hh, mm,
                           tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def test_civil_roundtrip():
    rng = np.random.default_rng(3)
    for z in [0, -1, 1, 719468, -719468,
              *rng.integers(-10**6, 10**6, size=500).tolist()]:
        y, m, d = cal.civil_from_days(int(z))
        assert cal.days_from_civil(y, m, d) == z


def test_bucket_start_spot_checks():
    # month: mid-March 2021 -> 2021-03-01; leap-day 2020 -> 2020-02-01
    assert cal.bucket_start_micros(micros(2021, 3, 17, 5), "month") == \
        micros(2021, 3, 1)
    assert cal.bucket_start_micros(micros(2020, 2, 29, 23), "month") == \
        micros(2020, 2, 1)
    # quarter: November -> Oct 1; year: any -> Jan 1
    assert cal.bucket_start_micros(micros(1999, 11, 30), "quarter") == \
        micros(1999, 10, 1)
    assert cal.bucket_start_micros(micros(1999, 11, 30), "year") == \
        micros(1999, 1, 1)
    # exact boundary stays in its own bucket
    assert cal.bucket_start_micros(micros(2022, 7, 1), "month") == \
        micros(2022, 7, 1)


def test_calendar_layout_contiguous():
    keys, inner = cal.calendar_layout("month", micros(2019, 11, 12),
                                      micros(2020, 3, 2))
    assert keys == [micros(2019, 11, 1), micros(2019, 12, 1),
                    micros(2020, 1, 1), micros(2020, 2, 1),
                    micros(2020, 3, 1)]
    assert inner == keys[1:]


def _date_index(n_docs=600, years=(2018, 2023), seed=9, segments=3):
    rng = np.random.default_rng(seed)
    sch = (SchemaBuilder().add_date_field("ts").add_u64_field("qty")
           .add_keyword_field("cat").build())
    idx = Index.create_in_ram(sch)
    w = idx.writer()
    lo, hi = micros(years[0], 1, 1), micros(years[1], 12, 31)
    bounds = sorted(rng.integers(0, n_docs, size=segments - 1).tolist())
    for i in range(n_docs):
        w.add_document({"ts": int(rng.integers(lo, hi)),
                        "qty": int(rng.integers(0, 1000)),
                        "cat": f"c{int(rng.integers(0, 20)):02d}"})
        if i in bounds:
            w.commit()
    w.commit()
    return idx


@pytest.mark.parametrize("interval", ["month", "quarter", "year",
                                      "week", "day", "hour"])
def test_calendar_parity(interval):
    idx = _date_index()
    aggs = {"h": date_histogram_agg("ts", calendar_interval=interval,
                                    sub_aggs={"n": count_agg(),
                                              "s": sum_agg("qty")})}
    s = idx.searcher()
    o = idx.oracle_searcher()
    for q in [MatchAllQuery(), RangeQuery("qty", lower=250, upper=900)]:
        got = s.agg_search(q, aggs)
        want = o.agg_search(q, aggs)
        assert got == want, f"{interval}\n{got}\n{want}"
    # keys are period starts, ascending, non-empty only
    ks = [b["key"] for b in got["h"]["buckets"]]
    assert ks == sorted(ks)
    if interval in ("month", "quarter", "year"):
        assert all(cal.bucket_start_micros(k, interval) == k for k in ks)


def test_calendar_nested_and_sharded():
    import jax
    from tantivy_aggregations_tpu.parallel.shard import make_mesh
    idx = _date_index(n_docs=400, years=(2020, 2022), seed=4)
    aggs = {"h": date_histogram_agg("ts", calendar_interval="quarter",
                                    sub_aggs={"s": sum_agg("qty")})}
    mesh = make_mesh(8)
    got = idx.searcher(mesh=mesh).agg_search(MatchAllQuery(), aggs)
    want = idx.oracle_searcher().agg_search(MatchAllQuery(), aggs)
    assert got == want


def test_calendar_prefix_mode():
    # 30 years of months > DENSE_NB buckets -> prefix layout
    idx = _date_index(n_docs=800, years=(1990, 2020), seed=5)
    aggs = {"h": date_histogram_agg("ts", calendar_interval="month",
                                    sub_aggs={"s": sum_agg("qty")})}
    s = idx.searcher()
    prog = s._program_for(MatchAllQuery(), aggs)
    assert prog.plan[("a", "h")]["mode"] == "prefix"
    assert prog.plan[("a", "h")]["nb"] > 256
    got = s.agg_search(MatchAllQuery(), aggs)
    want = idx.oracle_searcher().agg_search(MatchAllQuery(), aggs)
    assert got == want


def test_calendar_validation():
    idx = _date_index(n_docs=10)
    with pytest.raises(TypeError):
        idx.searcher().agg_search(MatchAllQuery(), {
            "h": date_histogram_agg("qty", calendar_interval="month")})
    with pytest.raises(ValueError):
        date_histogram_agg("ts", calendar_interval="fortnight")
    with pytest.raises(ValueError):
        idx.searcher().agg_search(MatchAllQuery(), {
            "h": date_histogram_agg("ts")})  # no interval at all
