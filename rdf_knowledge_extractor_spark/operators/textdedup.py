"""Document-level deduplication family for training-data pipelines.

Four strategies over a corpus DataFrame(id, text):

- exact            : 64-bit content hash groupBy (operators/dedup.py)
- n-gram Jaccard   : inverted-index pair generation (explode distinct
                     shingles → self-equi-join on shingle → pair
                     co-count → Jaccard by inclusion-exclusion).  This
                     is the scale-correct alternative to the O(n²)
                     cross join: cost ∝ Σ bucket², bounded by dropping
                     stop-shingles (df > max_doc_freq).
- MinHash + LSH    : reuses the banded-MinHash UDF from entity linking
                     (operators/linking.py) over char-k-gram shingles;
                     candidates verified with exact Jaccard.
- SimHash          : 64-bit sign-sum sketch (vectorized numpy UDF);
                     candidate pairs via the pigeonhole block trick
                     (4 × 16-bit chunks ⇒ guaranteed recall for
                     hamming ≤ 3), verified with exact hamming.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rdf_knowledge_extractor_spark.functions.text_analysis import char_shingles
from rdf_knowledge_extractor_spark.operators.linking import _minhash_band_udf


def _with_shingles(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("id"), char_shingles(F.col(text_col), k).alias("shingles")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 9,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """DataFrame(id_a, id_b, jaccard) for pairs with Jaccard ≥ threshold.

    Inverted-index join: only documents sharing ≥1 shingle are paired.
    `max_doc_freq` drops shingles present in more than that many docs
    (stop-shingles) before pairing — essential at scale, where a single
    boilerplate shingle would otherwise create a quadratic bucket.
    """
    sh = _with_shingles(docs, id_col, text_col, k)
    counts = sh.select("id", F.size("shingles").alias("n"))
    inv = sh.select("id", F.explode("shingles").alias("g"))
    if max_doc_freq is not None:
        df_ok = (
            inv.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("g")
        )
        inv = inv.join(df_ok, on="g")
    a = inv.select(F.col("id").alias("id_a"), "g")
    b = inv.select(F.col("id").alias("id_b"), "g")
    inter = (
        a.join(b, on="g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ca = counts.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        inter.join(ca, on="id_a")
        .join(cb, on="id_b")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 9,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 32,
) -> DataFrame:
    """MinHash-LSH candidates verified with exact Jaccard ≥ threshold.

    At J ≥ 0.9 with 32 bands × 2 rows the candidate-recall is
    1-(1-J²)^32 ≈ 1-1e-35 — the verified output equals the exact
    pairwise answer while never materializing O(n²) pairs.
    """
    sh = _with_shingles(docs, id_col, text_col, k).persist()
    bands_of = _minhash_band_udf(num_perm, bands)
    bucketed = sh.withColumn("_bands", bands_of(F.col("shingles"))).select(
        "id", F.posexplode("_bands").alias("band_idx", "band_val")
    )
    left = bucketed.select(F.col("id").alias("id_a"), "band_idx", "band_val")
    right = bucketed.select(F.col("id").alias("id_b"), "band_idx", "band_val")
    cands = (
        left.join(right, on=["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    out = (
        cands.join(a, on="id_a")
        .join(b, on="id_b")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def _simhash_udf(k: int = 9, bits: int = 64):
    @F.pandas_udf(T.LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        out = []
        for t in texts:
            t = t or ""
            grams = {t[i : i + k] for i in range(max(len(t) - k + 1, 1))}
            acc = np.zeros(bits, dtype=np.int64)
            for g in grams:
                digest = hashlib.blake2b(g.encode("utf-8"), digest_size=bits // 8).digest()
                bitsarr = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))
                acc += np.where(bitsarr == 1, 1, -1)
            val = 0
            for i in range(bits):
                if acc[i] > 0:
                    val |= 1 << i
            # to signed 64-bit
            if val >= 1 << 63:
                val -= 1 << 64
            out.append(val)
        return pd.Series(out, dtype="int64")

    return simhash


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 9,
    max_hamming: int = 3,
) -> DataFrame:
    """DataFrame(id_a, id_b, hamming) with hamming(simhash) ≤ max_hamming.

    Pigeonhole blocking: 64 bits split into `max_hamming + 1` chunks —
    any pair within the radius must agree on ≥1 full chunk, so the
    equi-join on (chunk_idx, chunk_value) has guaranteed recall.
    """
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks
    simhash = _simhash_udf(k)
    sigs = docs.select(
        F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sig")
    ).persist()
    chunks = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftrightunsigned(F.col("sig"), i * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("chunk_val"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("ch"),
    ).select("id", "sig", "ch.chunk_idx", "ch.chunk_val")
    a = chunks.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "chunk_idx", "chunk_val")
    b = chunks.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "chunk_idx", "chunk_val")
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, on=["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
