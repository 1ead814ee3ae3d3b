"""Similarity search over embedding columns (array<float>).

- `cosine` — pure-Catalyst dot/norm via zip_with + aggregate (double
  math, deterministic left-fold order → bit-stable across engines).
- `cosine_topk_bruteforce` — exact top-k for a query set: broadcast
  the (small) query side against the corpus, per-query window top-k.
  This is the baseline/oracle path.
- `cosine_pairs` — all pairs above a threshold (near-dup detection).
- `lsh_cosine_topk` — the scale path: random-hyperplane (sign) LSH
  buckets shrink the candidate set, then exact re-rank.  Approximate;
  benchmarked against the brute-force baseline, not oracle-checked.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """(query_id, neighbor_id, sim) — exact top-k per query, excluding
    self-matches.  The query side is broadcast (small by contract)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), round_digits))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def cosine_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine ≥ threshold.  Exact; the
    O(n²) compare is the baseline — use lsh buckets at scale."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine(F.col("va"), F.col("vb")), round_digits))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def _hyperplane_udf(dim: int, n_planes: int = 16, seed: int = 5):
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim)).astype(np.float64)

    @F.pandas_udf(T.LongType())
    def bucket_of(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            arr = np.asarray(v, dtype=np.float64)
            signs = (planes @ arr) > 0
            val = 0
            for i, s in enumerate(signs):
                if s:
                    val |= 1 << i
            out.append(val)
        return pd.Series(out, dtype="int64")

    return bucket_of


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: `n_tables` independent sign-LSH bucketings;
    candidates = bucket collisions in any table; exact re-rank.
    Recall tunable via n_planes (bucket size) × n_tables."""
    tables = []
    for t in range(n_tables):
        bucket_of = _hyperplane_udf(dim, n_planes, seed=101 + t)
        tables.append(
            lambda df, b=bucket_of, t=t: df.withColumn("bucket", b(F.col(vec_col)))
            .withColumn("table_id", F.lit(t))
        )
    c_buck = None
    q_buck = None
    for tf in tables:
        cb = tf(corpus).select(
            "table_id", "bucket", F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        )
        qb = tf(queries).select(
            "table_id", "bucket", F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
        c_buck = cb if c_buck is None else c_buck.unionByName(cb)
        q_buck = qb if q_buck is None else q_buck.unionByName(qb)
    cands = (
        q_buck.join(c_buck, on=["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "q_vec", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn("sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )
