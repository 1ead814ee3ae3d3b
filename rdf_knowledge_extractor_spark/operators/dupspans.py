"""Cross-document duplicate n-gram span detection.

The span-level complement to whole-document near-dedup (Lee et al.,
"Deduplicating Training Data Makes Language Models Better"): slide a
k-token window over every document, find windows whose gram occurs in
two or more DISTINCT documents, and report each document's share of
such shared spans.  High shared_frac flags boilerplate, mirrored
articles, and licence blocks that whole-doc MinHash misses because
the surrounding text differs.  Beyond-reference family (the reference
engine scopes itself to small KGs — /root/reference/README.md).

Scale shape (everything Catalyst, no Python):

- window grams are built JVM-side from the token array
  (`transform(sequence(…), s -> array_join(slice(a, s, k)))`) and
  exploded — fan-out is O(tokens) rows, stride 1, zero shuffle;
- gram → distinct-document count is ONE hash aggregate
  (`count_distinct(doc)` partials combine map-side);
- the join back to window positions reuses the aggregate's hash
  partitioning on its side; a hot gram (a boilerplate sentence
  repeated across millions of pages) skews only the probe side,
  which AQE skew-join splits — and the per-doc result aggregate
  re-shuffles by doc id, dissolving the hot gram's partition;
- by default grams travel as `xxhash64` keys, not strings, so the
  shuffle moves 8 bytes per window instead of the window text
  (`exact_grams=True` keeps the strings — what the DuckDB oracle
  compares against; a 64-bit collision is the only way the two can
  disagree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def doc_window_grams(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    exact_grams: bool = False,
) -> DataFrame:
    """(id_col, gram) — one row per k-token window position (stride
    1).  Docs with fewer than k tokens contribute no rows.  With
    `exact_grams=False` the gram column is its xxhash64 (long)."""
    if k < 2:
        raise ValueError(f"window size k must be >= 2, got {k}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1)),
            lambda s: F.array_join(F.slice(toks, s, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), F.explode(grams).alias("gram"))
    )
    if not exact_grams:
        out = out.select(id_col, F.xxhash64("gram").alias("gram"))
    return out


def duplicate_span_report(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    exact_grams: bool = False,
) -> DataFrame:
    """(id_col, n_windows, n_shared, shared_frac) — per document: the
    number of k-token window positions, how many of them carry a gram
    that also appears in at least one OTHER document, and the shared
    fraction (4 dp).  Every input document keeps a row; docs with
    fewer than k tokens report (0, 0, 0.0)."""
    wins = doc_window_grams(
        docs, k=k, id_col=id_col, text_col=text_col, exact_grams=exact_grams
    )
    gram_docs = wins.groupBy("gram").agg(
        F.count_distinct(id_col).alias("_ndocs")
    )
    per_doc = (
        wins.join(gram_docs, on="gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_nw"),
            F.sum(
                F.when(F.col("_ndocs") >= 2, 1).otherwise(0)
            ).alias("_ns"),
        )
    )
    return (
        docs.select(id_col).distinct()
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("_nw"), F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce(F.col("_ns"), F.lit(0)).cast("long").alias("n_shared"),
            F.round(
                F.coalesce(F.col("_ns") / F.col("_nw"), F.lit(0.0)), 4
            ).alias("shared_frac"),
        )
    )
