"""Nested bucket aggs under SHORT multi-valued keyword parents (plane
fan-out): terms(tags) -> histogram / filter -> histogram, merged across
positions BEFORE top-k. Previously a documented device limit."""

import sys

import pytest

sys.path.insert(0, "tests")

from tantivy_aggregations_tpu import (
    MatchAllQuery,
    RangeQuery,
    TermQuery,
    avg_agg,
    count_agg,
    filter_agg,
    histogram_agg,
    sum_agg,
    terms_agg,
)

from test_cross_mode import build_random


@pytest.fixture(scope="module")
def idx():
    return build_random(88, n=300)


def check(idx, query, aggs):
    got = idx.searcher().agg_search(query, aggs)
    want = idx.oracle_searcher().agg_search(query, aggs)
    assert got == want, f"\ndevice: {got}\noracle: {want}"


def test_histogram_under_multi_terms(idx):
    check(idx, MatchAllQuery(),
          {"t": terms_agg("tags", size=4,
                          sub_aggs={"h": histogram_agg(
                              "u", interval=2**38,
                              sub_aggs={"s": sum_agg("i"),
                                        "n": count_agg()})})})


def test_filter_histogram_under_multi_terms(idx):
    check(idx, RangeQuery("u", lower=2**38),
          {"t": terms_agg("tags", size=3,
                          sub_aggs={"f": filter_agg(
                              RangeQuery("i", lower=0),
                              sub_aggs={"h": histogram_agg("u",
                                                           interval=2**39)}),
                              "a": avg_agg("mf")})})


def test_terms_under_multi_terms(idx):
    check(idx, MatchAllQuery(),
          {"t": terms_agg("tags", size=3,
                          sub_aggs={"t2": terms_agg("k", size=4,
                                                    sub_aggs={"s": sum_agg(
                                                        "u")})})})


def test_terms_under_multi_terms_histogram(idx):
    check(idx, RangeQuery("i", lower=0),
          {"t": terms_agg("tags", size=4,
                          sub_aggs={"h": histogram_agg(
                              "u", interval=2**39,
                              sub_aggs={"t2": terms_agg("k", size=3)})})})
