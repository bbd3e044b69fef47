"""Fast multi-valued query fields (VERDICT r1 missing #4): term/range doc
masks on multi fields are dense per-position plane compares plus a
scatter-or over only the overflow tail (docs with > DENSE_MULTI_K values),
and multi query fields with full plane coverage no longer force the
prefix/rank fast paths off."""

import numpy as np
import pytest

from tantivy_aggregations_tpu import (
    BooleanQuery,
    ExistsQuery,
    Index,
    MatchAllQuery,
    RangeQuery,
    SchemaBuilder,
    TermQuery,
    count_agg,
    percentiles_agg,
    sum_agg,
    terms_agg,
)
from tantivy_aggregations_tpu.index.loader import DENSE_MULTI_K
from tantivy_aggregations_tpu.schema import Cardinality


def check(idx, query, aggs, mesh=None):
    got = idx.searcher(mesh=mesh).agg_search(query, aggs)
    want = idx.oracle_searcher().agg_search(query, aggs)
    assert got == want, f"\ndevice: {got}\noracle: {want}"
    return got


def tail_index(n=500, seed=3):
    """Multi fields where some docs exceed DENSE_MULTI_K values."""
    schema = (SchemaBuilder()
              .add_u64_field("qty")
              .add_u64_field("vals", cardinality=Cardinality.MULTI)
              .add_keyword_field("tags", cardinality=Cardinality.MULTI)
              .build())
    idx = Index.create_in_ram(schema)
    w = idx.writer()
    rng = np.random.default_rng(seed)
    vocab = [f"t{i:03d}" for i in range(40)]
    for i in range(n):
        # long-tailed value counts: most docs short, some way past K
        nv = int(rng.integers(0, 4)) if rng.random() < 0.9 \
            else int(rng.integers(DENSE_MULTI_K, DENSE_MULTI_K + 12))
        doc = {"qty": int(rng.integers(0, 100)),
               "vals": [int(x) for x in rng.integers(0, 50, nv)],
               "tags": [vocab[int(t)] for t in
                        rng.integers(0, 40, nv)]}
        w.add_document(doc)
        if i == n // 2:
            w.commit()
    w.commit()
    col = idx.searcher()._get_device_index().column("vals")
    assert col.tail_w is not None  # the tail path is actually exercised
    return idx


def test_tail_term_range_exists_parity():
    idx = tail_index()
    check(idx, TermQuery("vals", 7), {"n": count_agg()})
    check(idx, RangeQuery("vals", lower=10, upper=20),
          {"n": count_agg(), "s": sum_agg("qty")})
    check(idx, TermQuery("tags", "t005"), {"n": count_agg()})
    check(idx, RangeQuery("tags", lower="t010", upper="t020"),
          {"n": count_agg()})
    check(idx, ExistsQuery("vals"), {"n": count_agg()})
    check(idx, BooleanQuery(must=[TermQuery("vals", 7)],
                            must_not=[TermQuery("tags", "t001")]),
          {"n": count_agg()})


def test_tail_values_only_in_tail():
    """A value that appears ONLY past position K of its doc must match."""
    schema = (SchemaBuilder().add_u64_field("q")
              .add_u64_field("vals", cardinality=Cardinality.MULTI).build())
    idx = Index.create_in_ram(schema)
    w = idx.writer()
    w.add_document({"q": 1, "vals": list(range(DENSE_MULTI_K)) + [999]})
    w.add_document({"q": 2, "vals": [999]})
    w.add_document({"q": 3, "vals": [1, 2]})
    w.commit()
    r = check(idx, TermQuery("vals", 999), {"n": count_agg(),
                                            "s": sum_agg("q")})
    assert r["n"]["value"] == 2 and r["s"]["value"] == 3


def test_tail_sharded_mesh():
    from tantivy_aggregations_tpu.parallel.shard import make_mesh
    idx = tail_index(n=300)
    mesh = make_mesh(4)
    check(idx, TermQuery("vals", 7), {"n": count_agg()}, mesh=mesh)
    check(idx, RangeQuery("vals", lower=10, upper=30),
          {"n": count_agg(), "s": sum_agg("qty")}, mesh=mesh)


def planeable_index(n=3000, seed=9):
    """Multi query field with FULL plane coverage (kmax <= K) + a
    high-cardinality keyword for prefix-mode terms."""
    schema = (SchemaBuilder()
              .add_u64_field("amount")
              .add_f64_field("price")
              .add_u64_field("weights", cardinality=Cardinality.MULTI)
              .add_keyword_field("sku")
              .build())
    idx = Index.create_in_ram(schema)
    w = idx.writer()
    rng = np.random.default_rng(seed)
    nv = rng.integers(0, 4, n)
    offs = np.zeros(n + 1, np.uint32)
    np.cumsum(nv, out=offs[1:])
    w.add_documents_columnar({
        "amount": rng.integers(0, 1000, n, dtype=np.uint64),
        "price": np.round(rng.lognormal(2.0, 1.0, n), 2),
        "weights": (offs, rng.integers(0, 100, int(offs[-1]),
                                       dtype=np.uint64)),
        "sku": np.asarray([f"s{int(i):05d}"
                           for i in rng.integers(0, 600, n)], object),
    }, n)
    w.commit()
    return idx


def test_multi_query_field_keeps_prefix_mode():
    """VERDICT done-criterion: a c4-shaped tree with a TermQuery on a
    multi-valued field plans PREFIX mode (not scatter)."""
    idx = planeable_index()
    aggs = {"t": terms_agg("sku", size=10,
                           sub_aggs={"s": sum_agg("amount")})}
    for q in (TermQuery("weights", 42),
              RangeQuery("weights", lower=10, upper=60)):
        prog = idx.searcher()._program_for(q, aggs)
        assert prog.plan[("a", "t")]["mode"] == "prefix", \
            prog.plan[("a", "t")]["mode"]
        check(idx, q, aggs)


def test_multi_query_field_keeps_rank_percentiles():
    idx = planeable_index()
    aggs = {"p": percentiles_agg("price")}
    q = TermQuery("weights", 42)
    prog = idx.searcher()._program_for(q, aggs)
    assert prog.plan[("a", "p")]["pmode"] == "rank"
    check(idx, q, aggs)
    check(idx, RangeQuery("weights", lower=5, upper=95), aggs)


def test_tailed_multi_query_field_degrades_gracefully():
    """With an overflow tail, the prefix path is ineligible — scatter mode,
    still exact."""
    idx = tail_index()
    aggs = {"t": terms_agg("tags", size=10)}
    check(idx, TermQuery("vals", 7), aggs)


def test_tail_chain_percentiles_gather_rank():
    """Percentiles under a NON-DENSE query chain (overflow-tail CSR query
    field) plan mask_gather rank mode — the doc mask is taken through the
    static perm∘row_doc index plane — instead of the removed 10M-row sort
    lowering; integer + non-integer percents, single- and multi-valued
    percentile fields, unsharded and sharded, all bit-equal to the oracle."""
    from tantivy_aggregations_tpu.parallel.shard import make_mesh

    idx = tail_index()
    q = TermQuery("vals", 7)
    for mesh in (None, make_mesh(8)):
        s = idx.searcher(mesh=mesh)
        for aggs in ({"p": percentiles_agg("qty")},
                     {"p": percentiles_agg("vals")},
                     {"p": percentiles_agg("qty", (33.3, 97.5))}):
            prog = s._program_for(q, aggs)
            pp = prog.plan[("a", "p")]
            assert pp["pmode"] == "rank" and pp.get("mask_gather"), pp
            assert bool(pp.get("bisect")) == (mesh is not None)
            check(idx, q, aggs, mesh=mesh)
    # msearch batch through the gather-mode program
    s = idx.searcher()
    o = idx.oracle_searcher()
    reqs = [(TermQuery("vals", v), {"p": percentiles_agg("qty")})
            for v in (7, 9, 7, 3)]
    outs = s.agg_search_batch(reqs)
    for (qq, aa), got in zip(reqs, outs):
        assert got == o.agg_search(qq, aa)
