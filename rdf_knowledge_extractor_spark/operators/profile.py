"""Table profiling: per-column null/distinct statistics in one pass.

The first question against any 100-TB table is "what's in it" —
column fill rates and cardinalities drive partitioning, dedup-key,
and quota decisions before any pipeline is built.  Beyond-reference
family (the reference engine has fixed schemas only).

Scale shape: ONE aggregate evaluates every column's count and
exact distinct together — Catalyst compiles multiple count-distincts
into a single Expand + two-level aggregate (rows are replicated once
per distinct-column, the textbook exact-multi-distinct plan), so the
table is scanned once regardless of column count.  The wide 1-row
result is then unpivoted driver-side into (column, …) rows via
`stack` — k rows, no data movement.  For very wide tables or when
exactness is not needed, `approx=True` swaps in HyperLogLog
`approx_count_distinct` which needs no Expand at all (single
hash-agg pass; not oracle-comparable, so the driver query uses the
exact arm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    z: float = 3.5,
    exact: bool = False,
) -> DataFrame:
    """(id, group, value, robust_z) — rows whose modified z-score
    |0.6745·(v − median)| / MAD exceeds `z` within their group
    (Iglewicz–Hoaglin).  Median/MAD resist the very outliers they
    hunt, unlike mean/stddev.  Groups with MAD = 0 flag nothing
    (degenerate constant groups).

    Scale shape: two grouped percentile passes (value median, then
    MAD as the median of absolute deviations) — `exact=False` (the
    100-TB default) uses `approx_percentile`, constant memory per
    group; `exact=True` buffers per group and hash-matches DuckDB's
    `median`.  The per-group constants (≤ |groups| rows) ride back
    as broadcast joins, so the corpus is scanned twice and never
    re-shuffled."""
    pct = (
        (lambda c: F.expr(f"percentile({c}, 0.5)"))
        if exact
        else (lambda c: F.expr(f"approx_percentile({c}, 0.5, 10000)"))
    )
    med = df.groupBy(group_col).agg(pct(value_col).alias("_med"))
    dev = df.join(F.broadcast(med), on=group_col).withColumn(
        "_adev", F.abs(F.col(value_col) - F.col("_med"))
    )
    mad = dev.groupBy(group_col).agg(pct("_adev").alias("_mad"))
    return (
        dev.join(F.broadcast(mad), on=group_col)
        .withColumn(
            "robust_z",
            F.round(
                0.6745 * F.col("_adev") / F.col("_mad"), 4
            ),
        )
        .filter((F.col("_mad") > 0) & (F.col("robust_z") > z))
        .select(id_col, group_col, value_col, "robust_z")
    )


def table_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct) — one row per profiled
    column.  `n_distinct` ignores NULLs (SQL COUNT DISTINCT
    semantics, identical in DuckDB).  With `approx=True` distincts
    are HyperLogLog estimates (scan stays a single pass, no Expand)."""
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    ndv = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(
            (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"_nulls_{c}")
        )
        aggs.append(ndv(F.col(c)).alias(f"_ndv_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nulls_{c}, _ndv_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct)",
        "_n AS n_rows",
    ).select(
        "col_name",
        "n_rows",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )
