"""Similarity-search quality: LSH ANN recall vs brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_knowledge_extractor_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_cosine_topk,
)


def test_lsh_ann_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk_bruteforce(emb, queries, k=5)
    # this corpus's true top neighbors sit at cosine ≈ 0.5 (≈60° apart),
    # so per-plane collision is only ~0.67 — recall needs shallow tables
    # (few planes) and several of them; the planes/tables knobs trade
    # candidate volume for recall and must be tuned to the similarity
    # regime, exactly as at production scale
    approx = lsh_cosine_topk(emb, queries, dim=64, k=5, n_planes=4, n_tables=8)
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5, recall
    # scores it does return are exact (re-ranked), hence trustworthy
    joined = (
        approx.withColumnRenamed("sim", "sim_a")
        .join(exact, on=["query_id", "neighbor_id"])
    )
    for r in joined.collect():
        assert abs(r.sim_a - r.sim) < 1e-6


def test_bruteforce_topk_excludes_self(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") < 5), k=3)
    assert out.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in counts)


def test_cosine_pairs_bucketed_equals_exact(spark):
    """The bucketed sign-LSH path must reproduce the exact all-pairs
    answer (VERDICT #6: the shipped dedup_embedding path must be
    scale-shaped AND hash-green vs the exact oracle)."""
    import numpy as np

    from rdf_knowledge_extractor_spark.operators.similarity import (
        cosine_pairs,
        cosine_pairs_bucketed,
    )

    rng = np.random.RandomState(3)
    dim, n = 16, 120
    base = rng.normal(size=(n, dim))
    # plant 10 near-dup pairs at high cosine
    for i in range(10):
        base[n - 1 - i] = base[i] + rng.normal(scale=0.15, size=dim)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")

    for t in (0.45, 0.8):
        exact = {(r.id_a, r.id_b, r.sim) for r in cosine_pairs(emb, t).collect()}
        buck = {
            (r.id_a, r.id_b, r.sim)
            for r in cosine_pairs_bucketed(emb, t, dim=dim).collect()
        }
        assert buck == exact, f"threshold {t}: bucketed != exact"
        assert len(exact) > 0  # planted dups must be found


def test_lsh_params_scale_with_threshold():
    from rdf_knowledge_extractor_spark.operators.similarity import (
        lsh_params_for_threshold,
    )

    p_low, t_low = lsh_params_for_threshold(0.45)
    p_high, t_high = lsh_params_for_threshold(0.9)
    assert p_high > p_low  # high thresholds afford finer buckets
    assert t_high < t_low  # and need fewer tables


def test_ivf_topk_recall_vs_bruteforce(spark):
    """IVF (centroid cells + nprobe) recall against exact top-k on
    clustered data; full-probe IVF must equal brute force exactly."""
    import numpy as np

    from rdf_knowledge_extractor_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_cosine_topk,
    )

    rng = np.random.RandomState(11)
    dim, n_clusters, per = 16, 8, 40
    centers = rng.normal(size=(n_clusters, dim)) * 3
    rows = []
    for i in range(n_clusters * per):
        v = centers[i % n_clusters] + rng.normal(size=dim)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    queries = emb.filter("vec_id < 8")

    exact = cosine_topk_bruteforce(emb, queries, k=5)
    truth = {(r.query_id, r.neighbor_id) for r in exact.collect()}

    approx = ivf_cosine_topk(emb, queries, dim=dim, k=5, n_centroids=8, nprobe=3)
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"IVF recall {recall}"

    # probing every cell makes IVF exhaustive → identical to brute force
    full = ivf_cosine_topk(emb, queries, dim=dim, k=5, n_centroids=8, nprobe=8)
    full_rows = {(r.query_id, r.neighbor_id, r.sim) for r in full.collect()}
    exact_rows = {(r.query_id, r.neighbor_id, r.sim) for r in exact.collect()}
    assert full_rows == exact_rows
