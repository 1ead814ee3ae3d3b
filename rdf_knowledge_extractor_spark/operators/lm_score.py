"""Corpus-trained bigram-LM perplexity scoring.

The standard cheap fluency/quality signal for web-text curation
(CCNet / Gopher pipelines score documents with a small LM and keep
the low-perplexity head): train an add-one-smoothed word-bigram model
ON the corpus itself, then score every document by its cross-entropy
under that model.  Gibberish, boilerplate and wrong-language text
score high; fluent in-distribution text scores low.  Beyond-reference
family (the reference engine scopes itself to small KGs —
/root/reference/README.md).

Model: p(w2 | w1) = (c(w1,w2) + 1) / (c(w1·) + V), where c(w1·) is
the count of w1 as a bigram *first* element (so the denominator is
exactly the sum over the numerators) and V is the corpus vocabulary
size (distinct whitespace tokens).  Per doc:
cross_entropy = (1/n)·Σ −ln p over its n bigrams; ppl = exp(H).

Scale shape (everything Catalyst, no Python):

- ONE explode produces (doc, w1, w2) bigram rows: the bigram structs
  are built JVM-side from the token array
  (`transform(sequence(…), i -> struct(a[i-1], a[i]))`) — no window
  function, no per-doc shuffle to order tokens;
- per-doc bigram multiplicities are pre-aggregated BEFORE the model
  joins (`groupBy(doc, w1, w2)`), so join input is distinct bigrams
  per doc, not token count;
- the model tables are two further hash aggregates derived from that
  table (c2 by (w1,w2), c1 by w1) — all map-side combinable;
- V is a 1-row `count_distinct` crossJoined in as a broadcast, no
  driver action;
- joins: doc-bigrams ⋈ c2 on (w1,w2) then ⋈ c1 on w1 — sort-merge on
  high-cardinality keys; a hot bigram (boilerplate) skews the probe
  side only, which AQE skew-join splits.

Determinism across engines: the per-doc sum of logs is accumulated in
IEEE doubles in both Spark and DuckDB; results are rounded to 4 dp
before comparison and the summands are O(ln V) so 1-ulp differences
stay far below the rounding grain at realistic doc lengths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _token_array(text_col: str):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def doc_bigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, w1, w2, cnt) — per-document bigram multiplicities.
    Docs with < 2 tokens contribute no rows."""
    toks = _token_array(text_col)
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(toks)),
            lambda i: F.struct(
                F.element_at(toks, i - 1).alias("w1"),
                F.element_at(toks, i).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), F.explode(pairs).alias("_bg"))
        .select(id_col, "_bg.w1", "_bg.w2")
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, n_bigrams, cross_entropy, ppl) — per-document
    cross-entropy (nats, 4 dp) and perplexity under the corpus-trained
    add-one bigram LM.  Every input document keeps a row; docs with
    fewer than 2 tokens report (0, 0.0, 1.0)."""
    db = doc_bigrams(docs, id_col=id_col, text_col=text_col)
    c2 = db.groupBy("w1", "w2").agg(F.sum("cnt").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = docs.select(
        F.explode(_token_array(text_col)).alias("_t")
    ).filter(F.length("_t") > 0).agg(
        F.count_distinct("_t").alias("_v")
    )
    neglogp = -F.log(
        (F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.col("_v"))
    )
    scored = (
        db.join(c2, on=["w1", "w2"])
        .join(c1, on="w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("_n"),
            F.sum(F.col("cnt") * neglogp).alias("_h"),
        )
    )
    return (
        docs.select(id_col).distinct()
        .join(scored, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(
                F.coalesce(F.col("_h") / F.col("_n"), F.lit(0.0)), 4
            ).alias("cross_entropy"),
            F.round(
                F.exp(F.coalesce(F.col("_h") / F.col("_n"), F.lit(0.0))), 4
            ).alias("ppl"),
        )
    )
