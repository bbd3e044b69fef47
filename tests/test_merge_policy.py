"""Automatic merge policy (index/merge_policy.py LogMergePolicy + the
post-commit merge loop in IndexWriter.commit / Index.maybe_merge):
tantivy's LogMergePolicy analog, SURVEY.md §2.2 T2."""

import numpy as np

from tantivy_aggregations_tpu import (Index, MatchAllQuery, SchemaBuilder,
                                      TermQuery, count_agg, sum_agg,
                                      terms_agg)
from tantivy_aggregations_tpu.index.merge_policy import LogMergePolicy


class _FakeSeg:
    def __init__(self, n):
        self._n = n

    def alive_mask(self):
        return np.ones(self._n, bool)


def test_log_policy_selection():
    pol = LogMergePolicy(min_num_segments=3)
    # 4 tiny segments (all below min_layer_size -> one level) -> merge all
    assert pol.select([_FakeSeg(10)] * 4) == (0, 4)
    # only 2 in the level -> no merge
    assert pol.select([_FakeSeg(10)] * 2) is None
    # a huge segment breaks the run and is never merged itself
    segs = [_FakeSeg(20_000_000), _FakeSeg(5), _FakeSeg(5), _FakeSeg(5)]
    assert pol.select(segs) == (1, 3)
    # different levels don't merge together: 10-doc vs 500k-doc segments
    segs = [_FakeSeg(10), _FakeSeg(500_000)] * 3
    assert pol.select(segs) is None


def _tiny_index():
    sch = (SchemaBuilder().add_keyword_field("k")
           .add_u64_field("v").build())
    return Index.create_in_ram(sch)


def test_auto_merge_on_commit():
    idx = _tiny_index()
    idx.merge_policy = LogMergePolicy(min_num_segments=4)
    w = idx.writer()
    for i in range(6):
        for j in range(3):
            w.add_document({"k": f"k{j}", "v": i * 10 + j})
        w.commit()
    # 6 commits with a 4-segment trigger: compaction kept the count low
    assert len(idx.segments) < 6
    o = idx.oracle_searcher()
    got = idx.searcher().agg_search(
        MatchAllQuery(), {"n": count_agg(), "s": sum_agg("v"),
                          "t": terms_agg("k", size=5)})
    assert got == o.agg_search(
        MatchAllQuery(), {"n": count_agg(), "s": sum_agg("v"),
                          "t": terms_agg("k", size=5)})
    assert got["n"]["value"] == 18


def test_auto_merge_drops_deletes():
    idx = _tiny_index()
    idx.merge_policy = LogMergePolicy(min_num_segments=3)
    w = idx.writer()
    for i in range(2):
        w.add_document({"k": "keep", "v": i})
        w.add_document({"k": "drop", "v": 100 + i})
        w.commit()
    w.delete_term("k", "drop")
    w.commit()  # marks deletes; 2 segments < trigger, no merge yet
    w.add_document({"k": "keep", "v": 2})
    w.commit()  # 3rd segment trips the policy; merge drops deleted docs
    assert len(idx.segments) == 1
    assert idx.segments[0].alive_mask().all()
    got = idx.searcher().agg_search(MatchAllQuery(), {"n": count_agg()})
    assert got["n"]["value"] == 3
    assert idx.searcher().agg_search(
        TermQuery("k", "drop"), {"n": count_agg()})["n"]["value"] == 0


def test_merge_policy_disabled():
    idx = _tiny_index()
    idx.merge_policy = None
    w = idx.writer()
    for i in range(10):
        w.add_document({"k": "a", "v": i})
        w.commit()
    assert len(idx.segments) == 10


def test_partial_run_merge_preserves_order():
    """Merging a contiguous run keeps untouched segments (and global doc
    order) around it."""
    idx = _tiny_index()
    idx.merge_policy = None
    w = idx.writer()
    for i in range(5):
        w.add_document({"k": f"k{i}", "v": i})
        w.commit()
    o = idx.oracle_searcher()
    want = o.agg_search(MatchAllQuery(), {"t": terms_agg("k", size=10),
                                          "s": sum_agg("v")})
    idx.merge_segments(1, 3)  # [s0, merged(s1..s3), s4]
    assert len(idx.segments) == 3
    got = idx.searcher().agg_search(
        MatchAllQuery(), {"t": terms_agg("k", size=10), "s": sum_agg("v")})
    assert got == want
    assert got == idx.oracle_searcher().agg_search(
        MatchAllQuery(), {"t": terms_agg("k", size=10), "s": sum_agg("v")})
