"""Dense per-position planes for WIDE multi-valued query fields: term /
range / set-query doc masks on multi fields whose mono span exceeds the
narrow int32 domain are lexicographic (hi, lo) plane-pair compares guarded
by a value-count plane — no CSR scatter on the hot path — and wide multi
query fields with full plane coverage keep the prefix/rank fast paths on
(previously only narrow/keyword multi fields had planes; wide ones always
took the scatter-or path and forced permuted views off)."""

import numpy as np

from tantivy_aggregations_tpu import (
    BooleanQuery,
    ExistsQuery,
    Index,
    RangeQuery,
    SchemaBuilder,
    TermQuery,
    TermSetQuery,
    count_agg,
    percentiles_agg,
    sum_agg,
    terms_agg,
)
from tantivy_aggregations_tpu.index.loader import DENSE_MULTI_K
from tantivy_aggregations_tpu.schema import Cardinality

SPAN = 2**40  # forces wide (hi, lo) planes: span > NARROW_MAX_SPAN


def check(idx, query, aggs, mesh=None):
    got = idx.searcher(mesh=mesh).agg_search(query, aggs)
    want = idx.oracle_searcher().agg_search(query, aggs)
    assert got == want, f"\ndevice: {got}\noracle: {want}"
    return got


def wide_index(n=3000, seed=11):
    """u64 multi field spanning 2^40 (wide planes, kmax <= K, no tail) +
    an f64 multi field (always wide) + fields for prefix/rank aggs."""
    schema = (SchemaBuilder()
              .add_u64_field("amount")
              .add_f64_field("price")
              .add_u64_field("big", cardinality=Cardinality.MULTI)
              .add_f64_field("ratios", cardinality=Cardinality.MULTI)
              .add_keyword_field("sku")
              .build())
    idx = Index.create_in_ram(schema)
    w = idx.writer()
    rng = np.random.default_rng(seed)
    nv = rng.integers(0, 4, n)
    offs = np.zeros(n + 1, np.uint32)
    np.cumsum(nv, out=offs[1:])
    nb = int(offs[-1])
    w.add_documents_columnar({
        "amount": rng.integers(0, 1000, n, dtype=np.uint64),
        "price": np.round(rng.lognormal(2.0, 1.0, n), 2),
        # a few repeated anchor values so term queries have real hits
        "big": (offs, np.where(rng.random(nb) < 0.2,
                               np.uint64(7 * 2**33),
                               rng.integers(0, SPAN, nb, dtype=np.uint64))),
        "ratios": (offs.copy(),
                   np.round(rng.lognormal(0.0, 2.0, nb), 3)),
        "sku": np.asarray([f"s{int(i):05d}"
                           for i in rng.integers(0, 600, n)], object),
    }, n)
    w.commit()
    col = idx.searcher()._get_device_index().column("big")
    assert col.has_multi_planes_wide and not col.has_tail
    return idx


def test_wide_term_range_exists_parity():
    idx = wide_index()
    check(idx, TermQuery("big", 7 * 2**33), {"n": count_agg()})
    check(idx, TermQuery("big", 12345), {"n": count_agg()})  # likely 0 hits
    check(idx, RangeQuery("big", lower=2**35, upper=2**39),
          {"n": count_agg(), "s": sum_agg("amount")})
    check(idx, RangeQuery("big", lower=None, upper=2**34,
                          include_upper=False), {"n": count_agg()})
    check(idx, ExistsQuery("big"), {"n": count_agg()})
    check(idx, BooleanQuery(must=[RangeQuery("big", lower=2**30)],
                            must_not=[TermQuery("big", 7 * 2**33)]),
          {"n": count_agg()})


def test_wide_f64_multi_parity():
    idx = wide_index()
    check(idx, RangeQuery("ratios", lower=0.5, upper=4.0),
          {"n": count_agg(), "s": sum_agg("amount")})
    check(idx, RangeQuery("ratios", lower=-1.0, upper=0.0),
          {"n": count_agg()})
    check(idx, ExistsQuery("ratios"), {"n": count_agg()})


def test_wide_termset_parity():
    idx = wide_index()
    check(idx, TermSetQuery("big", [7 * 2**33, 999, 2**38]),
          {"n": count_agg()})
    check(idx, TermSetQuery("big", []), {"n": count_agg()})


def test_wide_multi_query_field_keeps_prefix_mode():
    """A c4-shaped tree gated by a term/range on the WIDE multi field must
    still plan PREFIX mode: the (hi, lo) planes are doc-aligned, so they
    permute into the bucket layout like any dense column."""
    idx = wide_index()
    aggs = {"t": terms_agg("sku", size=10,
                           sub_aggs={"s": sum_agg("amount")})}
    for q in (TermQuery("big", 7 * 2**33),
              RangeQuery("big", lower=2**33, upper=2**39)):
        prog = idx.searcher()._program_for(q, aggs)
        assert prog.plan[("a", "t")]["mode"] == "prefix", \
            prog.plan[("a", "t")]["mode"]
        check(idx, q, aggs)


def test_wide_multi_query_field_keeps_rank_percentiles():
    idx = wide_index()
    aggs = {"p": percentiles_agg("price")}
    q = RangeQuery("big", lower=2**33, upper=2**39)
    prog = idx.searcher()._program_for(q, aggs)
    assert prog.plan[("a", "p")]["pmode"] == "rank"
    check(idx, q, aggs)
    check(idx, TermQuery("big", 7 * 2**33), aggs)


def tail_index(n=400, seed=5):
    """Wide multi field where some docs exceed DENSE_MULTI_K values."""
    schema = (SchemaBuilder()
              .add_u64_field("qty")
              .add_u64_field("big", cardinality=Cardinality.MULTI)
              .build())
    idx = Index.create_in_ram(schema)
    w = idx.writer()
    rng = np.random.default_rng(seed)
    for i in range(n):
        nv = int(rng.integers(0, 4)) if rng.random() < 0.9 \
            else int(rng.integers(DENSE_MULTI_K, DENSE_MULTI_K + 10))
        doc = {"qty": int(rng.integers(0, 100)),
               "big": [int(x) for x in
                       rng.integers(0, SPAN, nv, dtype=np.uint64)]}
        w.add_document(doc)
        if i == n // 2:
            w.commit()
    w.commit()
    col = idx.searcher()._get_device_index().column("big")
    assert col.has_multi_planes_wide and col.has_tail
    assert col.tail_hi is not None
    return idx


def test_wide_tail_parity():
    idx = tail_index()
    check(idx, RangeQuery("big", lower=2**36, upper=2**39),
          {"n": count_agg(), "s": sum_agg("qty")})
    check(idx, ExistsQuery("big"), {"n": count_agg()})


def test_wide_tail_value_only_in_tail():
    """A value present ONLY past position K of its doc must match."""
    schema = (SchemaBuilder().add_u64_field("q")
              .add_u64_field("big", cardinality=Cardinality.MULTI).build())
    idx = Index.create_in_ram(schema)
    w = idx.writer()
    w.add_document({"q": 1,
                    "big": [i * 2**33 for i in range(DENSE_MULTI_K)]
                    + [5 * 2**40]})
    w.add_document({"q": 2, "big": [5 * 2**40]})
    w.add_document({"q": 3, "big": [2**33, 2**34]})
    w.commit()
    r = check(idx, TermQuery("big", 5 * 2**40), {"n": count_agg(),
                                                 "s": sum_agg("q")})
    assert r["n"]["value"] == 2 and r["s"]["value"] == 3
    # range matched only by tail rows
    r = check(idx, RangeQuery("big", lower=2**39), {"n": count_agg()})
    assert r["n"]["value"] == 2


def test_wide_sharded_mesh():
    from tantivy_aggregations_tpu.parallel.shard import make_mesh
    idx = wide_index(n=2000)
    mesh = make_mesh(4)
    check(idx, TermQuery("big", 7 * 2**33), {"n": count_agg()}, mesh=mesh)
    check(idx, RangeQuery("big", lower=2**35, upper=2**39),
          {"n": count_agg(), "s": sum_agg("amount")}, mesh=mesh)
    idx2 = tail_index(n=300)
    check(idx2, RangeQuery("big", lower=2**36), {"n": count_agg()},
          mesh=mesh)
