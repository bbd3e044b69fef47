"""BYTES and FACET field types (SURVEY.md §2.2 T1) — writer expansion,
persistence round-trip, queries, and facet_agg counts vs the oracle."""

import numpy as np
import pytest

from tantivy_aggregations_tpu import (
    BooleanQuery,
    Index,
    MatchAllQuery,
    PrefixQuery,
    RangeQuery,
    SchemaBuilder,
    TermQuery,
    count_agg,
    facet_agg,
    sum_agg,
    terms_agg,
)


def check(idx, query, aggs, searcher=None):
    got = (searcher or idx.searcher()).agg_search(query, aggs)
    want = idx.oracle_searcher().agg_search(query, aggs)
    assert got == want, f"\ndevice: {got}\noracle: {want}"
    return got


# -- bytes ---------------------------------------------------------------


def bytes_index():
    b = (SchemaBuilder().add_bytes_field("tag").add_u64_field("v").build())
    idx = Index.create_in_ram(b)
    w = idx.writer()
    w.add_document({"tag": b"\x00\xffbin", "v": 1})
    w.add_document({"tag": b"alpha", "v": 2})
    w.commit()
    w.add_document({"tag": "beta", "v": 3})  # str coerces utf-8
    w.add_document({"v": 4})                 # missing
    w.add_document({"tag": b"alpha", "v": 5})
    w.commit()
    return idx


def test_bytes_term_and_range():
    idx = bytes_index()
    r = check(idx, TermQuery("tag", b"alpha"), {"n": count_agg(),
                                                "s": sum_agg("v")})
    assert r["n"]["value"] == 2 and r["s"]["value"] == 7
    # str query value coerces utf-8 to the same term
    r = check(idx, TermQuery("tag", "beta"), {"n": count_agg()})
    assert r["n"]["value"] == 1
    # lexicographic range over raw bytes: \x00... < alpha < beta
    r = check(idx, RangeQuery("tag", lower=b"a", upper=b"b"),
              {"n": count_agg()})
    assert r["n"]["value"] == 2
    r = check(idx, TermQuery("tag", b"missing"), {"n": count_agg()})
    assert r["n"]["value"] == 0


def test_bytes_terms_agg_keys_are_bytes():
    idx = bytes_index()
    r = check(idx, MatchAllQuery(), {"t": terms_agg("tag", size=10)})
    keys = [bkt["key"] for bkt in r["t"]["buckets"]]
    assert all(isinstance(k, bytes) for k in keys)
    assert (b"alpha", 2) == (r["t"]["buckets"][0]["key"],
                             r["t"]["buckets"][0]["doc_count"])


def test_bytes_persist_roundtrip(tmp_path):
    b = SchemaBuilder().add_bytes_field("tag").build()
    idx = Index.create(str(tmp_path / "bidx"), b)
    w = idx.writer()
    w.add_document({"tag": bytes(range(256))})
    w.add_document({"tag": b"plain"})
    w.commit()
    idx2 = Index.open(str(tmp_path / "bidx"))
    assert idx2.segments[0].fields["tag"].terms == [bytes(range(256)),
                                                    b"plain"]
    r = check(idx2, TermQuery("tag", bytes(range(256))), {"n": count_agg()})
    assert r["n"]["value"] == 1


def test_bytes_delete_and_guards():
    idx = bytes_index()
    w = idx.writer()
    w.delete_term("tag", b"alpha")
    w.commit()
    r = check(idx, MatchAllQuery(), {"n": count_agg()})
    assert r["n"]["value"] == 3
    with pytest.raises(TypeError):
        idx.searcher().agg_search(PrefixQuery("tag", "a"),
                                  {"n": count_agg()})
    with pytest.raises(TypeError):
        idx.oracle_searcher().agg_search(PrefixQuery("tag", "a"),
                                         {"n": count_agg()})


# -- facet ---------------------------------------------------------------


def facet_index(n_segments=2):
    b = (SchemaBuilder().add_facet_field("cat").add_u64_field("v")
         .add_keyword_field("k").build())
    idx = Index.create_in_ram(b)
    w = idx.writer()
    docs = [
        {"cat": "/electronics/phones", "v": 1, "k": "a"},
        {"cat": ["/electronics/laptops", "/deals"], "v": 2, "k": "b"},
        {"cat": "/electronics/phones/android", "v": 3, "k": "a"},
        {"cat": "/books/fiction", "v": 4, "k": "b"},
        {"cat": "/books", "v": 5, "k": "a"},
        {"v": 6, "k": "b"},  # no facet
        {"cat": ["/books/fiction", "/books/history"], "v": 7, "k": "a"},
    ]
    per = max(1, len(docs) // n_segments)
    for i, d in enumerate(docs):
        w.add_document(d)
        if (i + 1) % per == 0:
            w.commit()
    w.commit()
    return idx


def test_facet_root_counts():
    idx = facet_index()
    r = check(idx, MatchAllQuery(), {"f": facet_agg("cat")})
    got = {b["key"]: b["doc_count"] for b in r["f"]["buckets"]}
    # counts are doc-inclusive of descendants
    assert got == {"/electronics": 3, "/books": 3, "/deals": 1}


def test_facet_child_counts_and_order():
    idx = facet_index()
    r = check(idx, MatchAllQuery(), {"f": facet_agg("cat", "/electronics")})
    assert [(b["key"], b["doc_count"]) for b in r["f"]["buckets"]] == [
        ("/electronics/phones", 2), ("/electronics/laptops", 1)]
    r = check(idx, MatchAllQuery(), {"f": facet_agg("cat", "/books")})
    assert [(b["key"], b["doc_count"]) for b in r["f"]["buckets"]] == [
        ("/books/fiction", 2), ("/books/history", 1)]
    # size truncation keeps (count desc, path asc) order
    r = check(idx, MatchAllQuery(), {"f": facet_agg("cat", "/books", size=1)})
    assert [b["key"] for b in r["f"]["buckets"]] == ["/books/fiction"]


def test_facet_term_query_matches_descendants():
    idx = facet_index()
    # ancestor expansion at write time: a term query on /electronics
    # matches docs faceted anywhere beneath it
    r = check(idx, TermQuery("cat", "/electronics"),
              {"n": count_agg(), "s": sum_agg("v")})
    assert r["n"]["value"] == 3 and r["s"]["value"] == 6
    r = check(idx, BooleanQuery(must=[TermQuery("cat", "/books")],
                                must_not=[TermQuery("cat", "/books/fiction")]),
              {"n": count_agg()})
    assert r["n"]["value"] == 1  # only the bare "/books" doc survives


def test_facet_filtered_and_deleted():
    idx = facet_index()
    w = idx.writer()
    w.delete_term("k", "b")
    w.commit()
    check(idx, MatchAllQuery(), {"f": facet_agg("cat")})
    check(idx, TermQuery("k", "a"), {"f": facet_agg("cat", "/books")})
    check(idx, RangeQuery("v", lower=2), {"f": facet_agg("cat")})


def test_facet_under_terms_bucket():
    idx = facet_index()
    check(idx, MatchAllQuery(),
          {"t": terms_agg("k", size=3,
                          sub_aggs={"f": facet_agg("cat")})})


def test_facet_validation():
    idx = facet_index()
    with pytest.raises(ValueError):
        idx.searcher().agg_search(MatchAllQuery(),
                                  {"f": facet_agg("cat", "bad-path")})
    with pytest.raises(TypeError):
        idx.searcher().agg_search(MatchAllQuery(), {"f": facet_agg("k")})
    w = idx.writer()
    w.add_document({"cat": "/ends/"})
    with pytest.raises(ValueError):
        w.commit()  # facet paths validate at segment build


def test_facet_doc_retrieval_shows_expansion():
    idx = facet_index(n_segments=1)
    d = idx.doc(0, 0)
    assert d["cat"] == ["/electronics", "/electronics/phones"]
