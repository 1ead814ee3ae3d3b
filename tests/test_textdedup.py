"""Textdedup family tests — skew-safe candidate generation.

Round-4 verdict, wrong #1: the one-shuffle candidate shape collected a
bucket's ids into ONE array and expanded all i<j combinations in a
single row — a giant near-dup cluster (boilerplate/parked pages,
guaranteed at 100-TB web scale) would materialize O(c²) structs in one
task.  `_bucket_candidate_pairs` now routes oversized buckets through a
distributed self-equi-join (exact, same pairs) or drops+reports them
(the entity-linking cap model).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_knowledge_extractor_spark.operators.textdedup import (
    _bucket_candidate_pairs,
    _pair_combos,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)


def _pairs_set(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_pair_combos_index_based(spark):
    out = (
        spark.createDataFrame([([1, 2, 3, 4],)], "ids array<int>")
        .select(F.explode(_pair_combos(F.col("ids"))).alias("p"))
        .select("p.id_a", "p.id_b")
    )
    assert _pairs_set(out) == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}


def test_pair_combos_pair_and_singleton_guard(spark):
    # size==2 is the smallest caller-legal input (callers filter ≥ 2)
    out = (
        spark.createDataFrame([([7, 9],)], "ids array<int>")
        .select(F.explode(_pair_combos(F.col("ids"))).alias("p"))
        .select("p.id_a", "p.id_b")
    )
    assert _pairs_set(out) == {(7, 9)}


def _bucketed_cluster(spark, cluster_size: int, extra_buckets: int = 2):
    """One giant bucket ('hot', members 0..cluster_size-1) plus small
    control buckets ('s<i>', members {10_000+2i, 10_000+2i+1})."""
    rows = [("hot", i) for i in range(cluster_size)]
    for b in range(extra_buckets):
        rows += [(f"s{b}", 10_000 + 2 * b), (f"s{b}", 10_000 + 2 * b + 1)]
    return spark.createDataFrame(rows, "g string, id int")


def test_oversized_bucket_selfjoin_exact_5k(spark):
    # the round-4 verdict "done" criterion: a ≥5k-member duplicate
    # cluster completes under a small cap, report populated, and the
    # pair set is EXACT (self-join arm, no recall loss)
    c = 5000
    bucketed = _bucketed_cluster(spark, c)
    pairs, report = _bucket_candidate_pairs(
        bucketed, ["g"], "id", max_bucket_size=50, oversized="selfjoin"
    )
    assert pairs.count() == c * (c - 1) // 2 + 2
    rep = {(r.g, r.n) for r in report.collect()}
    assert rep == {("hot", c)}


def test_oversized_bucket_drop_reports(spark):
    bucketed = _bucketed_cluster(spark, 100)
    pairs, report = _bucket_candidate_pairs(
        bucketed, ["g"], "id", max_bucket_size=50, oversized="drop"
    )
    got = _pairs_set(pairs)
    assert got == {(10_000, 10_001), (10_002, 10_003)}
    assert [(r.g, r.n) for r in report.collect()] == [("hot", 100)]


def test_selfjoin_arm_matches_inarray_arm(spark):
    # same bucketed input, cap far above vs far below the cluster size:
    # identical pair sets (the two arms are equivalent formulations)
    bucketed = _bucketed_cluster(spark, 60, extra_buckets=3)
    routed, _ = _bucket_candidate_pairs(
        bucketed, ["g"], "id", max_bucket_size=10, oversized="selfjoin"
    )
    inarray, rep = _bucket_candidate_pairs(
        bucketed, ["g"], "id", max_bucket_size=10_000, oversized="selfjoin"
    )
    assert _pairs_set(routed) == _pairs_set(inarray)
    assert rep.count() == 0


def test_bucket_pairs_rejects_bad_mode(spark):
    import pytest

    bucketed = _bucketed_cluster(spark, 3)
    with pytest.raises(ValueError, match="oversized"):
        _bucket_candidate_pairs(bucketed, ["g"], "id", oversized="salt")


def _dup_cluster_docs(spark, n_dups: int):
    """n_dups identical docs + two singletons, long enough to shingle."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [(i, base) for i in range(n_dups)]
    rows.append((90_001, "completely different content about spark catalyst optimizer internals " * 5))
    rows.append((90_002, "another unrelated document concerning parquet footer statistics " * 5))
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_minhash_capped_cluster_end_to_end(spark):
    docs = _dup_cluster_docs(spark, 40)
    out, report = minhash_lsh_pairs(
        docs, max_bucket_size=10, with_report=True
    )
    assert _pairs_set(out) == {
        (a, b) for a in range(40) for b in range(40) if a < b
    }
    assert report.count() > 0  # every band bucket holds all 40 dups
    spark.catalog.clearCache()


def test_ngram_jaccard_capped_cluster_end_to_end(spark):
    docs = _dup_cluster_docs(spark, 30)
    out, report = ngram_jaccard_pairs(
        docs, max_bucket_size=10, with_report=True
    )
    assert _pairs_set(out) == {
        (a, b) for a in range(30) for b in range(30) if a < b
    }
    assert report.count() > 0
    spark.catalog.clearCache()


def test_simhash_capped_cluster_end_to_end(spark):
    docs = _dup_cluster_docs(spark, 30)
    out, report = simhash_pairs(docs, max_bucket_size=10, with_report=True)
    assert _pairs_set(out) == {
        (a, b) for a in range(30) for b in range(30) if a < b
    }
    assert report.count() > 0
    spark.catalog.clearCache()
