"""Percentiles under MULTI-VALUED bucket ancestors (round 4): the oracle
weights each doc's percentile values by the parent value's OCCURRENCE
count (§3.2 weighted recursion) — a doc belongs to several tag slots and
counts once per occurrence. The device lowering builds K per-position
composite slot planes from the parent's dense mp planes (the k-th plane
is the composite slot via position k's value, -1 where none), sums the
per-(slot, 32-block) counts over k, and rank-selects with WEIGHTED
windows (a row's weight in slot s is the number of positions mapping it
to s). Exact: integer weights, integer ranks, the same value-layout
machinery. Unsharded, integer percents (others stay on the host path).
This was the largest host-fallback bucket in the fuzz census (~8%)."""

import numpy as np
import pytest

from tantivy_aggregations_tpu import (
    BooleanQuery,
    Index,
    MatchAllQuery,
    RangeQuery,
    SchemaBuilder,
    TermQuery,
    count_agg,
    histogram_agg,
    percentiles_agg,
    sum_agg,
    terms_agg,
)
from tantivy_aggregations_tpu.schema import Cardinality


def build(n=1200, seed=9):
    schema = (SchemaBuilder()
              .add_u64_field("amount")
              .add_f64_field("price")
              .add_keyword_field("tags", cardinality=Cardinality.MULTI)
              .add_u64_field("nums", cardinality=Cardinality.MULTI)
              .add_f64_field("scores", cardinality=Cardinality.MULTI)
              .add_keyword_field("cat")
              .build())
    idx = Index.create_in_ram(schema)
    w = idx.writer()
    rng = np.random.default_rng(seed)
    vocab = [f"t{i:02d}" for i in range(14)]
    for i in range(n):
        nt = int(rng.integers(0, 4))
        doc = {"amount": int(rng.integers(0, 1000)),
               "price": float(np.round(rng.lognormal(2, 1), 2)),
               # DUPLICATE tags on purpose: occurrence weights > 1
               "tags": [vocab[int(t)] for t in rng.integers(0, 14, nt)]
               + ([vocab[int(rng.integers(0, 14))]] * 2
                  if rng.random() < 0.2 else []),
               "nums": [int(x) for x in rng.integers(0, 30,
                                                     rng.integers(0, 3))],
               "scores": [float(np.round(rng.normal(), 2))
                          for _ in range(int(rng.integers(0, 3)))],
               "cat": f"c{int(rng.integers(0, 6))}"}
        w.add_document(doc)
        if i == n // 2:
            w.commit()
    w.commit()
    return idx


@pytest.fixture(scope="module")
def idx():
    return build()


def check(idx, query, aggs):
    got = idx.searcher().agg_search(query, aggs)
    want = idx.oracle_searcher().agg_search(query, aggs)
    assert got == want, f"\nquery: {query}\ndevice: {got}\noracle: {want}"
    return got


def _plan(idx, q, aggs, path):
    prog = idx.searcher()._program_for(q, aggs)
    assert hasattr(prog, "plan"), "fell back to the host path"
    return prog.plan[path]


def test_pct_under_multi_terms_device(idx):
    """The headline shape: percentiles under a multi keyword terms agg
    plans the weighted slot_rank device path and matches the oracle's
    occurrence-weighted multisets exactly (duplicate tags included)."""
    aggs = {"t": terms_agg("tags", size=14, sub_aggs={
        "p": percentiles_agg("price", (25, 50, 75)),
        "n": count_agg()})}
    p = _plan(idx, MatchAllQuery(), aggs, ("a", "t", "p"))
    assert p["pmode"] == "slot_rank" and p.get("wslots"), p
    for q in (MatchAllQuery(), TermQuery("cat", "c2"),
              RangeQuery("amount", lower=100, upper=800),
              RangeQuery("amount", lower=10**9)):  # empty
        check(idx, q, aggs)


def test_pct_under_multi_numeric_terms(idx):
    """Multi-valued NUMERIC parent (nums): same weighted lowering."""
    aggs = {"t": terms_agg("nums", size=30, sub_aggs={
        "p": percentiles_agg("amount", (50,))})}
    p = _plan(idx, MatchAllQuery(), aggs, ("a", "t", "p"))
    assert p.get("wslots"), p
    check(idx, MatchAllQuery(), aggs)
    check(idx, TermQuery("tags", "t03"), aggs)


def test_pct_multivalued_field_under_multi_terms(idx):
    """Percentile field itself multi-valued (CSR value rows) under a
    multi terms parent: weights apply per VALUE ROW of the doc."""
    aggs = {"t": terms_agg("tags", size=14, sub_aggs={
        "p": percentiles_agg("scores", (25, 75))})}
    p = _plan(idx, MatchAllQuery(), aggs, ("a", "t", "p"))
    assert p.get("wslots"), p
    check(idx, MatchAllQuery(), aggs)


def test_pct_under_single_then_multi(idx):
    """Composite chain: single-valued terms ABOVE the multi terms —
    composite slots with the mterms factor in place."""
    aggs = {"c": terms_agg("cat", size=6, sub_aggs={
        "t": terms_agg("tags", size=14, sub_aggs={
            "p": percentiles_agg("price", (50,))})})}
    p = _plan(idx, MatchAllQuery(), aggs, ("a", "c", "t", "p"))
    assert p.get("wslots"), p
    check(idx, MatchAllQuery(), aggs)


def test_wslots_msearch_batch(idx):
    aggs = {"t": terms_agg("tags", size=14, sub_aggs={
        "p": percentiles_agg("price", (50,))})}
    s = idx.searcher()
    o = idx.oracle_searcher()
    reqs = [(RangeQuery("amount", lower=10 * j, upper=900), aggs)
            for j in range(5)]
    assert s.agg_search_batch(reqs) == [o.agg_search(q, a)
                                        for q, a in reqs]


def test_wslots_noninteger_percents_phase2(idx):
    """Non-integer percents under a multi terms parent: the wslots device
    plan with phase-2 host-resolved ranks over the (cum, wms) weighted
    intermediates — single calls and msearch batches."""
    aggs = {"t": terms_agg("tags", size=14, sub_aggs={
        "p": percentiles_agg("price", (12.5, 50.5, 99.9))})}
    p = _plan(idx, MatchAllQuery(), aggs, ("a", "t", "p"))
    assert p.get("wslots") and not p["int_percents"], p
    for q in (MatchAllQuery(), TermQuery("cat", "c1"),
              RangeQuery("amount", lower=10**9)):
        check(idx, q, aggs)
    s, o = idx.searcher(), idx.oracle_searcher()
    reqs = [(RangeQuery("amount", lower=7 * j, upper=800), aggs)
            for j in range(4)]
    assert s.agg_search_batch(reqs) == [o.agg_search(q, a)
                                        for q, a in reqs]


def test_wslots_ineligible_shapes_still_exact(idx):
    """Shapes outside the gate (sharded mesh) stay on the exact host path
    and still answer identically."""
    from tantivy_aggregations_tpu.parallel.shard import make_mesh
    aggs2 = {"t": terms_agg("tags", size=14, sub_aggs={
        "p": percentiles_agg("price", (50,))})}
    sm = idx.searcher(mesh=make_mesh(4))
    assert sm.agg_search(MatchAllQuery(), aggs2) == \
        idx.oracle_searcher().agg_search(MatchAllQuery(), aggs2)


def test_in_slot_top_hits_highcard_device():
    """Round 4: in-slot top_hits under a HIGH-CARD terms parent (flat
    slot space past the old 4096 cap) lowers on device when the parent
    top-k selection bounds the shipped fruit — bit-identical, including
    the per-slot (value, doc) ordering and empty buckets."""
    from tantivy_aggregations_tpu import top_hits_agg
    schema = (SchemaBuilder().add_u64_field("amount")
              .add_keyword_field("sku").build())
    hidx = Index.create_in_ram(schema)
    w = hidx.writer()
    rng = np.random.default_rng(3)
    w.add_documents_columnar({
        "amount": rng.integers(0, 10_000, 20_000, dtype=np.uint64),
        "sku": np.asarray([f"s{int(i):05d}"
                           for i in rng.integers(0, 6000, 20_000)],
                          object)}, 20_000)
    w.commit()
    aggs = {"t": terms_agg("sku", size=8, sub_aggs={
        "th": top_hits_agg(3, "amount"), "n": count_agg()})}
    s = hidx.searcher()
    prog = s._program_for(MatchAllQuery(), aggs)
    assert hasattr(prog, "plan"), "fell back to the host path"
    assert prog.plan[("a", "t", "th")]["in_slot"]
    for q in (MatchAllQuery(), RangeQuery("amount", lower=5000),
              RangeQuery("amount", lower=10**9)):
        got = s.agg_search(q, aggs)
        want = hidx.oracle_searcher().agg_search(q, aggs)
        assert got == want, q
    # a HOST-selecting ancestor keeps the full-slot-space bound: the same
    # tree under a facet-like full-card shape stays on the exact host path
    aggs_host = {"t": terms_agg("sku", size=8, order=("_key", "asc"),
                                sub_aggs={"th": top_hits_agg(3, "amount")})}
    got = s.agg_search(MatchAllQuery(), aggs_host)
    assert got == hidx.oracle_searcher().agg_search(MatchAllQuery(),
                                                    aggs_host)
