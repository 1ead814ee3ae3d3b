"""Bucketed graph-table layout: co-located (shuffle-free) self-joins.

The BGP query pattern (`query/sparql.py`) is chained SELF-JOINS of the
triples table on shared variables — overwhelmingly on `subject`
(star-shaped patterns: `?s p1 ?a . ?s p2 ?b`).  At 100 TB each such
join would shuffle the whole table; bucketing the persisted graph by
`subject` makes every subject-keyed self-join a ZERO-EXCHANGE
sort-merge of co-located buckets, and pre-sorting within buckets drops
the sort too.

This module materializes the bucketed layout (the sandbox equivalent
of an Iceberg table with `bucket(N, subject)` partitioning) and is
verified by a plan test asserting the self-join compiles WITHOUT any
`Exchange` node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 64


def write_bucketed_graph(
    df: DataFrame,
    table_name: str = "graph_bucketed",
    buckets: int = DEFAULT_BUCKETS,
    key: str = "subject",
) -> None:
    """Persist the graph bucketed+sorted by `key` (Iceberg:
    PARTITIONED BY bucket(N, subject) + sorted write)."""
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_graph(spark: SparkSession, table_name: str = "graph_bucketed") -> DataFrame:
    return spark.table(table_name)


def subject_self_join(graph: DataFrame, pred_a: str, pred_b: str) -> DataFrame:
    """The canonical BGP shape: ?s pred_a ?a . ?s pred_b ?b — a
    subject-keyed self-join.  On a bucketed table this plans with no
    Exchange (verified in tests/test_bucketing.py)."""
    from pyspark.sql import functions as F

    a = graph.filter(F.col("predicate") == pred_a).select(
        F.col("subject"), F.col("object").alias("a")
    )
    b = graph.filter(F.col("predicate") == pred_b).select(
        F.col("subject"), F.col("object").alias("b")
    )
    return a.join(b, on="subject")
