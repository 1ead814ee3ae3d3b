"""Corpus mixing: deterministic downsampling to target group weights.

Training-data pipelines blend sources to a recipe ("40% web, 30%
code, 30% books"); given per-group target weights this operator finds
the LARGEST corpus achievable by downsampling only (no duplication),
then takes a reproducible hash-sample of each group at exactly the
rate that realises the recipe.  Beyond-reference family (the
reference engine scopes itself to small KGs —
/root/reference/README.md).

Math: with group counts c_g and target weights s_g (only their ratios
matter), the max feasible total is T = min_g(c_g / s_g); each group
keeps n_g = s_g·T rows via rate_g = s_g·T / c_g — the scarcest group
keeps everything (rate 1), every other group is thinned to match.

Scale shape:

- group counts are ONE map-side-combinable hash aggregate whose
  result has |groups| rows — broadcast back onto the corpus (no
  driver action, no second shuffle);
- the keep decision is a stateless per-row predicate
  (md5-derived 32-bit priority < rate·2³², `curation._hash_hex8`'s
  engine-portable idiom), so the sample is reproducible across
  engines, partitionings, and retries, and composes with resumable
  stages;
- rates are computed IN-PLAN from the counts in IEEE doubles with a
  fixed parenthesization — the DuckDB oracle evaluates the identical
  expression, so thresholds match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mix_to_weights(
    docs: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of `docs` kept by the recipe (all columns preserved),
    plus the group's `mix_rate` (4 dp).  Groups absent from `weights`
    are dropped; every weight must be > 0."""
    if not weights:
        raise ValueError("weights must name at least one group")
    bad = {g: w for g, w in weights.items() if not w > 0}
    if bad:
        raise ValueError(f"weights must be > 0, got {bad}")
    share = F.create_map(
        *[x for g, w in sorted(weights.items())
          for x in (F.lit(g), F.lit(float(w)))]
    )
    counts = (
        docs.filter(F.col(group_col).isin(*weights))
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("_share", share[F.col(group_col)])
    )
    # T = min_g(c_g / s_g): a 1-row aggregate over |groups| rows
    feasible = counts.agg(
        F.min(F.col("_cnt") / F.col("_share")).alias("_t")
    )
    rates = (
        counts.crossJoin(F.broadcast(feasible))
        .withColumn(
            "_rate", (F.col("_share") * F.col("_t")) / F.col("_cnt")
        )
        .withColumn(
            "_thresh",
            F.lower(
                F.lpad(
                    F.hex(
                        F.least(
                            F.floor(F.col("_rate") * F.lit(4294967296.0)),
                            F.lit(4294967295),
                        ).cast("long")
                    ),
                    8,
                    "0",
                )
            ),
        )
        .select(group_col, "_rate", "_thresh")
    )
    return (
        docs.join(F.broadcast(rates), on=group_col)
        .filter(
            (F.col("_rate") >= 1.0)
            | (
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
                < F.col("_thresh")
            )
        )
        .drop("_thresh")
        .withColumnRenamed("_rate", "mix_rate")
        .withColumn("mix_rate", F.round("mix_rate", 4))
    )
