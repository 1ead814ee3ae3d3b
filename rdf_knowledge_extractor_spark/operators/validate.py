"""Validation operators — filter rules + diagnostic issue report.

- `apply_validation_rules`: parity with ref:src/core/extractor.rs:345-383.
  Rules compile to pure Catalyst predicates (whole-stage codegen, no
  Python):
    * require_valid_uri        → startswith(subject, 'http')  (loose test!)
    * require_known_predicates → predicate local-name ∈ schema.predicates
      (broadcast `isin` — the reference's HashMap lookup as a
      broadcast-hash semi-join)
    * unknown rules            → no-op (reference `_ => {}`)

- `validation_issues`: diagnostic strings, parity with
  ref:src/utils/serialization.rs:178-205 — note the STRICT
  http:///https:// test here vs the loose `http` test above (the
  reference is inconsistent; both are reproduced where they live).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdf_knowledge_extractor_spark.config import Configuration


def local_name(col: Column) -> Column:
    """split('/').last().split('#').last() (ref:src/core/extractor.rs:360-366)."""
    return F.element_at(F.split(F.element_at(F.split(col, "/"), -1), "#"), -1)


def apply_validation_rules(df: DataFrame, config: Configuration) -> DataFrame:
    cond = F.lit(True)
    for rule in config.validation_rules:
        if rule == "require_valid_uri":
            cond = cond & F.col("subject").startswith("http")
        elif rule == "require_known_predicates":
            known = sorted(config.rdf_schema.predicates)  # small; broadcast literal
            cond = cond & local_name(F.col("predicate")).isin(known)
        # unknown rules: no-op (ref:extractor.rs:373)
    return df.filter(cond)


def _strict_uri(col: Column) -> Column:
    return col.startswith("http://") | col.startswith("https://")


def validation_issues(df: DataFrame, idx_col: str | None = None) -> DataFrame:
    """Diagnostics DataFrame(issue: string) — one row per problem, in the
    reference's wording/order (ref:src/utils/serialization.rs:178-205).

    `idx_col` supplies the triple's ordinal i; if None, a dense global
    rank over (doc_seq, triple_seq) when present, else over an arbitrary
    stable order.  The rank is assigned by the distributed zipWithIndex
    pattern (`ordinal.zip_with_ordinal`) — NOT a partition-less window,
    which would gather the whole table into one task.
    """
    from rdf_knowledge_extractor_spark.operators.ordinal import zip_with_ordinal

    if idx_col is None:
        if "doc_seq" in df.columns and "triple_seq" in df.columns:
            order = ["doc_seq", "triple_seq"]
        else:
            df = df.withColumn("_mono", F.monotonically_increasing_id())
            order = ["_mono"]
        df = zip_with_ordinal(df, order, out_col="_i")
        idx_col = "_i"

    i = F.col(idx_col).cast("string")
    checks = [
        (
            ~_strict_uri(F.col("subject")),
            F.concat(F.lit("Triple "), i, F.lit(": Invalid subject URI: "), F.col("subject")),
        ),
        (
            ~_strict_uri(F.col("predicate")),
            F.concat(F.lit("Triple "), i, F.lit(": Invalid predicate URI: "), F.col("predicate")),
        ),
        (F.col("subject") == "", F.concat(F.lit("Triple "), i, F.lit(": Empty subject"))),
        (F.col("predicate") == "", F.concat(F.lit("Triple "), i, F.lit(": Empty predicate"))),
        (F.col("object") == "", F.concat(F.lit("Triple "), i, F.lit(": Empty object"))),
    ]
    issues = F.array(*[F.when(cond, msg) for cond, msg in checks])
    return (
        df.select(F.col(idx_col).alias("idx"), F.explode(F.filter(issues, lambda x: x.isNotNull())).alias("issue"))
        .orderBy("idx")
        .select("issue")
    )
