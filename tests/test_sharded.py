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


# ---------------------------------------------------------------------------
# Sharded FAST paths (SURVEY.md §3.5 / VERDICT r1 #7): high-cardinality
# terms and large histograms must run PREFIX mode on a mesh (per-shard
# OrderedLayouts, psum'd per-bucket partials — no scatter), and integer-
# percent percentiles must run the cross-shard bisection RANK path (no
# all-gather + sort). Results stay bit-identical to the oracle.
# ---------------------------------------------------------------------------

def test_sharded_highcard_terms_prefix(mesh):
    idx = random_index(11, n_docs=900, n_segments=3, card=600)
    aggs = {"t": terms_agg("cat", size=7,
                           sub_aggs={"s": sum_agg("qty"), "n": count_agg(),
                                     "a": avg_agg("price")})}
    s = idx.searcher(mesh=mesh)
    prog = s._program_for(MatchAllQuery(), aggs)
    assert prog.plan[("a", "t")]["mode"] == "prefix"
    for q in [MatchAllQuery(), RangeQuery("qty", lower=100, upper=800),
              BooleanQuery(must=[RangeQuery("delta", lower=-250)],
                           must_not=[TermQuery("cat", "cat0001")])]:
        got = s.agg_search(q, aggs)
        want = idx.oracle_searcher().agg_search(q, aggs)
        assert got == want, f"\nsharded: {got}\noracle:  {want}"


def test_sharded_large_histogram_prefix(mesh):
    idx = random_index(12, n_docs=700, n_segments=2)
    aggs = {"h": histogram_agg("qty", interval=2,
                               sub_aggs={"s": sum_agg("price"),
                                         "n": count_agg()})}
    s = idx.searcher(mesh=mesh)
    prog = s._program_for(MatchAllQuery(), aggs)
    assert prog.plan[("a", "h")]["mode"] == "prefix"
    assert prog.plan[("a", "h")]["nb"] > 256
    for q in [MatchAllQuery(), RangeQuery("delta", lower=0)]:
        got = s.agg_search(q, aggs)
        want = idx.oracle_searcher().agg_search(q, aggs)
        assert got == want, f"\nsharded: {got}\noracle:  {want}"


def test_sharded_percentiles_bisect(mesh):
    idx = random_index(13, n_docs=800, n_segments=3)
    # qty: narrow u64; price: wide (f64 mono span) — both bisection paths
    aggs = {"pq": percentiles_agg("qty"),
            "pp": percentiles_agg("price"),
            "pd": percentiles_agg("delta", percents=(0, 10, 50, 90, 100))}
    s = idx.searcher(mesh=mesh)
    prog = s._program_for(MatchAllQuery(), aggs)
    for k in ("pq", "pp", "pd"):
        assert prog.plan[("a", k)]["pmode"] == "rank", k
        assert prog.plan[("a", k)]["bisect"], k
    for q in [MatchAllQuery(),
              RangeQuery("qty", lower=10, upper=990),
              TermQuery("cat", "cat0003"),
              # empty result: every percentile must be None on both sides
              RangeQuery("qty", lower=5000)]:
        got = s.agg_search(q, aggs)
        want = idx.oracle_searcher().agg_search(q, aggs)
        assert got == want, f"\nsharded: {got}\noracle:  {want}"


def test_sharded_bisect_duplicates_and_edges(mesh):
    """Heavy duplicates + span edges: bisection must land on exact values
    (ties across shards, min/max ranks at 0/100)."""
    from tantivy_aggregations_tpu import SchemaBuilder, Index
    sch = SchemaBuilder().add_u64_field("v").add_i64_field("w").build()
    idx = Index.create_in_ram(sch)
    w = idx.writer()
    vals = [0, 0, 0, 7, 7, 2**33, 2**33, 2**33, 2**40, 1]
    for i, v in enumerate(vals):
        w.add_document({"v": v, "w": (-1) ** i * v})
        if i == 4:
            w.commit()
    w.commit()
    aggs = {"pv": percentiles_agg("v", percents=(0, 25, 50, 75, 100)),
            "pw": percentiles_agg("w", percents=(0, 25, 50, 75, 100))}
    s = idx.searcher(mesh=mesh)
    prog = s._program_for(MatchAllQuery(), aggs)
    assert prog.plan[("a", "pv")]["bisect"]
    assert not prog.plan[("a", "pv")]["narrow"]  # span 2^40: wide path
    for q in [MatchAllQuery(), RangeQuery("v", upper=2**33,
                                          include_upper=True)]:
        got = s.agg_search(q, aggs)
        want = idx.oracle_searcher().agg_search(q, aggs)
        assert got == want, f"\nsharded: {got}\noracle:  {want}"


def test_sharded_percentiles_noninteger_bisect(mesh):
    """Non-integer percents on a mesh: ranks resolve host-side (exact
    rationals), then a phase-2 cross-shard bisection selects values — same
    fast path as integer percents, no all-gather + sort."""
    idx = random_index(14, n_docs=600, n_segments=3)
    aggs = {"p": percentiles_agg("price", percents=(2.5, 33.3, 50.0, 97.5)),
            "pq": percentiles_agg("qty", percents=(0.1, 99.9))}
    s = idx.searcher(mesh=mesh)
    prog = s._program_for(MatchAllQuery(), aggs)
    for k in ("p", "pq"):
        assert prog.plan[("a", k)]["pmode"] == "rank", k
        assert prog.plan[("a", k)]["bisect"], k
        assert not prog.plan[("a", k)]["int_percents"], k
    o = idx.oracle_searcher()
    for q in [MatchAllQuery(), RangeQuery("qty", lower=50, upper=900),
              RangeQuery("qty", lower=10**7)]:
        got = s.agg_search(q, aggs)
        want = o.agg_search(q, aggs)
        assert got == want, f"\nsharded: {got}\noracle:  {want}"
    # msearch batch drives the batched phase-2 select
    reqs = [(MatchAllQuery(), aggs), (RangeQuery("qty", lower=50), aggs)] * 3
    outs = s.agg_search_batch(reqs)
    for (q, a), out in zip(reqs, outs):
        assert out == o.agg_search(q, a)


def test_sharded_percentiles_multivalued_bisect(mesh):
    """Multi-valued (CSR) percentile fields on a mesh take the VALUE-ROW
    rank path: every value is a row of the value-sorted layout, the query
    mask is gathered per row's owning doc, and selection is the same
    cross-shard bisection — no all-gather, no sort (VERDICT r2 #6)."""
    idx = random_index(15, n_docs=700, n_segments=3)
    aggs = {"pc": percentiles_agg("counts"),            # u64 multi (CSR)
            "ps": percentiles_agg("scores"),            # f64 multi (CSR)
            "pn": percentiles_agg("scores", percents=(2.5, 50.0, 97.5))}
    s = idx.searcher(mesh=mesh)
    prog = s._program_for(MatchAllQuery(), aggs)
    for k in ("pc", "ps", "pn"):
        assert prog.plan[("a", k)]["pmode"] == "rank", \
            f"{k} fell off the value-row rank path: {prog.plan[('a', k)]}"
        assert prog.plan[("a", k)]["bisect"], k
    o = idx.oracle_searcher()
    for q in [MatchAllQuery(), RangeQuery("qty", lower=50, upper=900),
              TermQuery("cat", "cat0002"),
              RangeQuery("qty", lower=10**7)]:  # empty: all-None fruit
        got = s.agg_search(q, aggs)
        want = o.agg_search(q, aggs)
        assert got == want, f"\nsharded: {got}\noracle:  {want}"
    # unsharded takes the same rank path (row selection, no device sort)
    s1 = idx.searcher()
    prog1 = s1._program_for(MatchAllQuery(), aggs)
    assert prog1.plan[("a", "pc")]["pmode"] == "rank"
    assert not prog1.plan[("a", "pc")]["bisect"]
    for q in [MatchAllQuery(), TermQuery("cat", "cat0002")]:
        assert s1.agg_search(q, aggs) == o.agg_search(q, aggs)


def test_sharded_slot_rank_percentiles(mesh):
    """Percentiles nested under bucket aggs on a mesh take the device
    slot_rank path with per-slot cross-shard bisection (VERDICT r2 #5) —
    no host fallback, no all-gather — and match the oracle exactly."""
    idx = random_index(16, n_docs=700, n_segments=3)
    aggs = {"t": terms_agg("cat", size=4,
                           sub_aggs={"p": percentiles_agg("price"),
                                     "pc": percentiles_agg("counts")}),
            "h": histogram_agg("qty", interval=397,
                               sub_aggs={"pq": percentiles_agg("delta")})}
    s = idx.searcher(mesh=mesh)
    prog = s._program_for(MatchAllQuery(), aggs)
    for pth in (("a", "t", "p"), ("a", "t", "pc"), ("a", "h", "pq")):
        pl = prog.plan[pth]
        assert pl["pmode"] == "slot_rank", (pth, pl)
        assert pl["slot_bisect"], pth
    o = idx.oracle_searcher()
    for q in [MatchAllQuery(), RangeQuery("qty", lower=50, upper=900),
              TermQuery("cat", "cat0001"),
              RangeQuery("qty", lower=10**7)]:  # empty buckets
        got = s.agg_search(q, aggs)
        want = o.agg_search(q, aggs)
        assert got == want, f"\nsharded: {got}\noracle:  {want}"
    # non-integer percents under buckets on a mesh (round 4): the terms
    # ancestor selects host-side (full-slot-space fruits) and phase 2
    # resolves host ranks via the per-slot cross-shard bisection — a
    # DEVICE plan, bit-identical (VERDICT r3 #4)
    na = {"t": terms_agg("cat", size=3,
                         sub_aggs={"p": percentiles_agg("price",
                                                        percents=(50.5,)),
                                   "n": count_agg()}),
          "h": histogram_agg("qty", interval=397,
                             sub_aggs={"p": percentiles_agg(
                                 "delta", percents=(33.3, 75.0))})}
    prog_na = s._program_for(MatchAllQuery(), na)
    assert prog_na.plan[("a", "t", "p")]["pmode"] == "slot_rank"
    assert prog_na.plan[("a", "t", "p")]["phase2_vals"]
    assert prog_na.plan[("a", "t")]["sel"] == "host"
    assert prog_na.plan[("a", "h", "p")]["pmode"] == "slot_rank"
    for q in [MatchAllQuery(), TermQuery("cat", "cat0001"),
              RangeQuery("qty", lower=10**7)]:  # empty buckets
        assert s.agg_search(q, na) == o.agg_search(q, na)
    # the batched phase-2 variant (vmapped per-slot bisection under the
    # msearch driver)
    reqs = [(RangeQuery("qty", lower=10 * j, upper=900), na)
            for j in range(5)]
    assert s.agg_search_batch(reqs) == [o.agg_search(q, a)
                                        for q, a in reqs]


def test_sharded_in_slot_top_hits(mesh):
    """top_hits nested under bucket aggs on a mesh: per-shard top-k +
    k-way merge of [ns, D*k] candidates (VERDICT r2 #5) — device plan,
    no host fallback, bit-identical to the oracle."""
    idx = random_index(17, n_docs=600, n_segments=3)
    aggs = {"t": terms_agg("cat", size=4,
                           sub_aggs={"th": top_hits_agg(3, "qty"),
                                     "td": top_hits_agg(2, "delta",
                                                        ascending=False)}),
            "h": histogram_agg("qty", interval=509,
                               sub_aggs={"ts": top_hits_agg(2, "price")})}
    s = idx.searcher(mesh=mesh)
    prog = s._program_for(MatchAllQuery(), aggs)
    for pth in (("a", "t", "th"), ("a", "t", "td"), ("a", "h", "ts")):
        assert prog.plan[pth]["kind"] == "top_hits", pth
        assert prog.plan[pth]["in_slot"], pth
    o = idx.oracle_searcher()
    for q in [MatchAllQuery(), RangeQuery("qty", lower=50, upper=900),
              TermQuery("cat", "cat0003"),
              RangeQuery("qty", lower=10**7)]:
        got = s.agg_search(q, aggs)
        want = o.agg_search(q, aggs)
        assert got == want, f"\nsharded: {got}\noracle:  {want}"


def test_sharded_multi_under_multi_expansion(mesh):
    """The static cross-product expansion (multi bucket child under a multi
    row-space ancestor) is built PER SHARD (value rows of both fields
    partition by owning doc's shard, so pairs never cross shards) and its
    fruits psum-merge bit-identically."""
    idx = random_index(seed=55, n_docs=3000)
    aggs = {"t": terms_agg("counts", size=8, sub_aggs={
        "c": terms_agg("tags", size=5, sub_aggs={"s": sum_agg("qty")})})}
    s = idx.searcher(mesh=mesh)
    prog = s._program_for(MatchAllQuery(), aggs)
    assert prog.plan[("a", "t", "c")].get("xpand"), \
        prog.plan[("a", "t", "c")]
    check(idx, mesh, MatchAllQuery(), aggs)
    check(idx, mesh, RangeQuery("qty", lower=100, upper=800), aggs)


def test_sharded_phrase_query(mesh):
    """PhraseQuery over sharded CSR token streams: rows of one doc never
    cross shards, so the shifted-AND stays shard-local; padding/boundary
    windows are killed by the shifted valid plane."""
    from tantivy_aggregations_tpu import Index, PhraseQuery, SchemaBuilder
    import numpy as np
    schema = (SchemaBuilder().add_text_field("body")
              .add_u64_field("qty").build())
    idx = Index.create_in_ram(schema)
    w = idx.writer()
    rng = np.random.default_rng(9)
    vocab = ["v%d" % i for i in range(8)]
    for i in range(500):
        toks = [vocab[int(t)] for t in rng.integers(0, 8,
                                                    int(rng.integers(0, 20)))]
        w.add_document({"body": " ".join(toks), "qty": int(i % 97)})
    w.commit()
    for text in ("v1 v2", "v3", "v0 v0 v1"):
        check(idx, mesh, PhraseQuery("body", text),
              {"n": count_agg(), "s": sum_agg("qty")})


def test_replicated_searcher(mesh):
    """ReplicatedSearcher (ES replica-shard analog): R independent device
    groups, round-robin msearch, results bit-identical to the oracle and
    in request order; every replica actually serves."""
    from tantivy_aggregations_tpu import ReplicatedSearcher
    from tantivy_aggregations_tpu.engine_config import EngineConfig
    idx = random_index(seed=77, n_docs=2000)
    o = idx.oracle_searcher()
    aggs = {"n": count_agg(), "s": sum_agg("qty"),
            "t": terms_agg("cat", size=5, sub_aggs={"a": avg_agg("price")})}
    aggs2 = {"h": histogram_agg("qty", interval=100)}
    for R in (2, 4, 8):
        rs = ReplicatedSearcher(idx, replicas=R,
                                config=EngineConfig(max_batch=4))
        reqs = []
        for j in range(37):  # several chunks, mixed shapes mid-stream
            q = (RangeQuery("qty", lower=j * 9) if j % 3
                 else TermQuery("cat", "cat0001"))
            reqs.append((q, aggs if j % 5 else aggs2))
        want = [o.agg_search(q, a) for q, a in reqs]
        assert rs.agg_search_batch(reqs) == want
        assert list(rs.agg_search_stream(iter(reqs), lookahead=2)) == want
        served = [len(s._programs) for s in rs.searchers]
        assert all(n > 0 for n in served), served
        # single-query API rotates replicas
        assert rs.agg_search(*reqs[0]) == want[0]
        assert rs.agg_search(*reqs[1]) == want[1]
