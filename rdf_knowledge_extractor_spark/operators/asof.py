"""As-of (most-recent-prior) join — an operator Spark lacks natively.

For each left row, attach the latest right row of the same key whose
timestamp is ≤ the left row's (classic event attribution: "for each
purchase, the most recent prior click by that user").

Spark-first formulation (no range join, no Python): UNION the two
sides with a side tag, then one window pass per key ordered by
(ts, side) with `last(…, ignorenulls=True)` over an unbounded-
preceding frame — the right-side payload "fills forward" onto every
subsequent left row.  Right rows at the exact left timestamp sort
BEFORE the left row, giving inclusive (≥) semantics that match
DuckDB/pandas `ASOF JOIN` (the DuckDB native ASOF is this operator's
oracle in `__spark_entry__.py`).

Scale notes (100 TB):
- ONE shuffle: the window's hash-partition by key + per-partition sort
  — same cost as any keyed sort, vs. the O(|L|·|R|) blow-up of the
  naive `l.ts >= r.ts` theta-join Spark would otherwise plan.
- a hot key serializes into one window partition (windows cannot be
  split by AQE); the standard mitigation is pre-bucketing the event
  table by key so the sort is local (`plans/bucketing.py` pattern).
- `tolerance` keeps the same plan and nulls out stale matches
  afterwards (pure projection, no extra shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    ts_col: str = "ts",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row + latest right row with
    right.ts ≤ left.ts on the same key (nulls when no prior right row,
    or none within `tolerance_sec`).

    Right-side non-key, non-ts columns must not collide with left
    columns (rename on the right first) — collisions raise."""
    keys = [on] if isinstance(on, str) else list(on)
    l_cols = [c for c in left.columns if c not in keys]
    r_payload = [c for c in right.columns if c not in keys and c != ts_col]
    clash = set(l_cols) & set(r_payload)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")

    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        *keys,
        F.col(ts_col),
        F.col(ts_col).alias("_r_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in r_payload],
    )
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged
    for c in [*r_payload, "_r_ts"]:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1).drop("_side")

    if tolerance_sec is not None:
        stale = F.col("_r_ts") < F.col(ts_col) - F.expr(
            f"INTERVAL {tolerance_sec} SECONDS"
        )
        for c in [*r_payload, "_r_ts"]:
            out = out.withColumn(c, F.when(~F.coalesce(stale, F.lit(True)), F.col(c)))
    return out
