"""PhraseQuery parity (SURVEY §A.13): device mask lowering (dense
per-position plane windows AND the CSR shifted-AND stream path) vs the
oracle's spec-first implementation, including multi-value concatenation
semantics, missing tokens, doc boundaries, deletes, and agg chains."""

import numpy as np
import pytest

from tantivy_aggregations_tpu import (
    BooleanQuery,
    Index,
    MatchAllQuery,
    PhraseQuery,
    RangeQuery,
    SchemaBuilder,
    TermQuery,
    count_agg,
    histogram_agg,
    sum_agg,
    terms_agg,
)

AGGS = {"n": count_agg(), "s": sum_agg("qty")}


def build(docs, deletes=(), segments_at=()):
    schema = (SchemaBuilder()
              .add_text_field("body")
              .add_keyword_field("cat")
              .add_u64_field("qty")
              .build())
    idx = Index.create_in_ram(schema)
    w = idx.writer()
    for i, d in enumerate(docs):
        w.add_document(d)
        if i in segments_at:
            w.commit()
    w.commit()
    if deletes:
        w2 = idx.writer()
        for f, v in deletes:
            w2.delete_term(f, v)
        w2.commit()
    return idx


def check(idx, q, aggs=AGGS):
    got = idx.searcher().agg_search(q, aggs)
    want = idx.oracle_searcher().agg_search(q, aggs)
    assert got == want, f"\nquery: {q}\ndevice: {got}\noracle: {want}"
    return got


def test_phrase_basic():
    idx = build([
        {"body": "the quick brown fox", "cat": "a", "qty": 1},
        {"body": "quick the brown fox quick", "cat": "b", "qty": 2},
        {"body": "brown quick", "cat": "a", "qty": 4},
        {"body": "the quick", "cat": "b", "qty": 8},
        {"cat": "a", "qty": 16},  # no body
    ], segments_at=(1,))
    out = check(idx, PhraseQuery("body", "quick brown"))
    assert out["n"]["value"] == 1 and out["s"]["value"] == 1
    check(idx, PhraseQuery("body", "the quick brown fox"))
    check(idx, PhraseQuery("body", "brown fox quick"))  # spans doc 1 only
    check(idx, PhraseQuery("body", "quick"))            # single token
    check(idx, PhraseQuery("body", "fox quick brown"))  # no match
    check(idx, PhraseQuery("body", "quick zebra"))      # missing token
    assert check(idx, PhraseQuery("body", ""))["n"]["value"] == 0


def test_phrase_does_not_cross_doc_boundary():
    # doc0 ends with "alpha", doc1 starts with "beta": the stream-adjacent
    # rows belong to different docs and must not match "alpha beta"
    idx = build([
        {"body": "one two alpha", "qty": 1},
        {"body": "beta three", "qty": 2},
        {"body": "alpha beta", "qty": 4},
    ])
    out = check(idx, PhraseQuery("body", "alpha beta"))
    assert out["n"]["value"] == 1 and out["s"]["value"] == 4


def test_phrase_multi_value_concatenation_spec():
    # §A.13: values concatenate into one stream -> a phrase MAY match
    # across adjacent values; both engines agree
    idx = build([
        {"body": ["red green", "blue"], "qty": 1},
        {"body": ["red", "green blue"], "qty": 2},
        {"body": ["red green blue"], "qty": 4},
    ])
    out = check(idx, PhraseQuery("body", "green blue"))
    assert out["n"]["value"] == 3
    out2 = check(idx, PhraseQuery("body", "red green blue"))
    assert out2["n"]["value"] == 3


def test_phrase_long_docs_csr_stream_path():
    # force docs beyond DENSE_MULTI_K (8) tokens -> the CSR shifted-AND
    # path (no dense plane windows)
    rng = np.random.default_rng(4)
    vocab = ["w%d" % i for i in range(12)]
    docs = []
    for i in range(300):
        toks = [vocab[int(t)] for t in rng.integers(0, 12,
                                                    int(rng.integers(0, 30)))]
        docs.append({"body": " ".join(toks), "qty": int(i),
                     "cat": "c%d" % (i % 3)})
    docs.append({"body": " ".join(["w1 w2"] * 40), "qty": 7, "cat": "c0"})
    idx = build(docs, segments_at=(100, 200))
    for text in ("w1 w2", "w2 w1 w0", "w3", "w5 w5", "w0 w1 w2 w3"):
        check(idx, PhraseQuery("body", text))
    # under boolean composition + deletes + bucket aggs
    idx2 = build(docs, deletes=(("cat", "c1"),), segments_at=(150,))
    q = BooleanQuery(must=[PhraseQuery("body", "w1 w2"),
                           RangeQuery("qty", lower=10)],
                     must_not=[TermQuery("cat", "c2")])
    check(idx2, q, {"t": terms_agg("cat", size=3,
                                   sub_aggs={"s": sum_agg("qty")}),
                    "h": histogram_agg("qty", interval=50)})


def test_phrase_requires_text_field():
    idx = build([{"body": "x", "cat": "a", "qty": 1}])
    with pytest.raises(TypeError):
        idx.searcher().agg_search(PhraseQuery("cat", "a b"), AGGS)
    with pytest.raises(TypeError):
        idx.oracle_searcher().agg_search(PhraseQuery("cat", "a b"), AGGS)


def test_phrase_param_dispatch_no_recompile():
    """Same token COUNT = same program: different phrases dispatch through
    traced ordinal params (msearch batches them in one vmapped call)."""
    idx = build([
        {"body": "aa bb cc", "qty": 1},
        {"body": "bb cc dd", "qty": 2},
        {"body": "cc dd aa", "qty": 4},
    ] * 20)
    s = idx.searcher()
    o = idx.oracle_searcher()
    p1 = s._program_for(PhraseQuery("body", "aa bb"), AGGS)
    s.agg_search(PhraseQuery("body", "aa bb"), AGGS)
    p2 = s._program_for(PhraseQuery("body", "cc dd"), AGGS)
    assert p1 is p2, "same-shape phrase should reuse the compiled program"
    reqs = [(PhraseQuery("body", t), AGGS)
            for t in ("aa bb", "bb cc", "cc dd", "dd aa", "zz yy")]
    outs = s.agg_search_batch(reqs)
    for (q, a), got in zip(reqs, outs):
        assert got == o.agg_search(q, a)
