"""BM25 search operator: independent-Python differential + plan shape."""

from __future__ import annotations

import contextlib
import io
import math
import re

import pytest

from rdf_knowledge_extractor_spark.operators.search import (
    bm25_topk,
    doc_postings,
    tokenize_query,
)

DOCS = [
    (1, "Fast table scan beats slow scan; the table is fast."),
    (2, "hash merge hash merge hash partition"),
    (3, "agg row value, agg row value, agg row!"),
    (4, "a table of values: value value VALUE"),
    (5, "scan"),
    (6, "punctuation---only...!!!"),
    (7, ""),
]


def _reference_bm25(docs, queries, k=10, k1=1.2, b=0.75):
    """Independent plain-Python Okapi BM25 (no Spark code reused)."""
    tok = lambda s: [t for t in re.split("[^a-z0-9]+", s.lower()) if t]
    bags = {d: tok(t) for d, t in docs}
    lens = {d: len(ts) for d, ts in bags.items() if ts}
    n = len(lens)
    avgdl = sum(lens.values()) / n
    out = []
    for qid in sorted(queries):
        terms = sorted(set(tok(queries[qid])))
        scores = {}
        for d, ts in bags.items():
            s = 0.0
            for term in terms:
                tf = ts.count(term)
                if not tf:
                    continue
                df = sum(1 for ts2 in bags.values() if term in ts2)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * lens[d] / avgdl)
                )
            if s:
                scores[d] = s
        ranked = sorted(scores, key=lambda d: (-round(scores[d], 6), d))
        out += [
            (qid, i + 1, d, round(scores[d], 4))
            for i, d in enumerate(ranked[:k])
        ]
    return out


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_bm25_matches_independent_reference(spark):
    queries = {"q1": "fast scan", "q2": "hash merge", "q3": "value table"}
    got = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_topk(_df(spark), queries, k=3).collect()
    )
    assert got == sorted(_reference_bm25(DOCS, queries, k=3))


def test_bm25_empty_and_no_hit_queries(spark):
    # a query with no corpus hits yields zero rows for that query only
    rows = bm25_topk(_df(spark), {"q": "zzz absent"}, k=5).collect()
    assert rows == []
    with pytest.raises(ValueError):
        bm25_topk(_df(spark), {}, k=5)
    with pytest.raises(ValueError):
        bm25_topk(_df(spark), {"q": "scan"}, k=0)


def test_postings_single_parse(spark):
    rows = {
        (r.doc_id, r.term): (r.tf, r.doc_len)
        for r in doc_postings(_df(spark)).collect()
    }
    assert rows[(2, "hash")] == (3, 6)
    assert rows[(1, "scan")] == (2, 10)
    assert (6, "punctuation") in rows and rows[(6, "punctuation")][1] == 2
    assert not any(d == 7 for d, _ in rows)  # empty doc yields nothing


def test_tokenize_query_twin():
    assert tokenize_query("Fast-SCAN, 42!") == ["fast", "scan", "42"]
    assert tokenize_query("...") == []


def test_bm25_max_df_ratio_elides_ubiquitous_terms(spark):
    docs = spark.createDataFrame(
        [(i, f"common filler{'x' * (i % 2)} rare{i}") for i in range(6)],
        ["doc_id", "text"],
    )
    # 'common' is in 6/6 docs: elided under the guard
    only_common = bm25_topk(
        docs, {"q": "common"}, k=3, max_df_ratio=0.5
    ).collect()
    assert only_common == []
    # a mixed query keeps the rare term's contribution
    mixed = bm25_topk(
        docs, {"q": "common rare3"}, k=3, max_df_ratio=0.5
    ).collect()
    assert [r.doc_id for r in mixed] == [3]
    # guard off: identical to plain scoring
    plain = bm25_topk(docs, {"q": "common rare3"}, k=3).collect()
    assert plain[0].doc_id == 3 and len(plain) == 3
    with pytest.raises(ValueError):
        bm25_topk(docs, {"q": "x"}, max_df_ratio=0.0)


def test_rrf_fuse_closed_form(spark):
    from rdf_knowledge_extractor_spark.operators.search import rrf_fuse

    lex = spark.createDataFrame(
        [("q", 10, 1), ("q", 20, 2), ("q", 30, 3)],
        ["query_id", "doc_id", "rank"],
    )
    vec = spark.createDataFrame(
        [("q", 20, 1), ("q", 40, 2)], ["query_id", "doc_id", "rank"]
    )
    got = {
        r.doc_id: (r.rank, r.rrf)
        for r in rrf_fuse([lex, vec], k=3, c=60.0).collect()
    }
    # doc 20: both systems -> 1/62 + 1/61; docs 10/40 rank-1/2 singles
    assert got[20] == (1, round(1 / 62 + 1 / 61, 6))
    assert got[10] == (2, round(1 / 61, 6))
    assert got[40] == (3, round(1 / 62, 6))
    assert 30 not in got  # k=3 cuts the weakest
    with pytest.raises(ValueError):
        rrf_fuse([], k=3)
    with pytest.raises(ValueError):
        rrf_fuse([lex], k=0)


def test_bm25_plan_shape(spark):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bm25_topk(_df(spark), {"q": "scan table"}, k=2).explain(
            mode="formatted"
        )
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    # query terms, dfreq and corpus stats all arrive as broadcasts
    assert "BroadcastHashJoin" in plan
    # top-k per query is a map-side partial group limit
    assert "WindowGroupLimit" in plan
