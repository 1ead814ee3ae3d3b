"""N-Triples reader — ingests golden `.nt` files for P/R scoring.

Spark-first replacement for the reference's dead Oxigraph loader
(ref:src/knowledge_graph/oxigraph_store.rs:119-135): `spark.read.text`
plus pure-Catalyst regex extraction (whole-stage codegen; no Python).
Covers the dialect the reference's own exporters emit
(ref:src/core/extractor.rs:50-57, src/utils/serialization.rs:92-108):
`<s> <p> <o> .` or `<s> <p> "literal with \\" escapes" .`
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# <s> <p> (<o>|"o") .   — literal may contain \" escapes
_NT_RE = r'^<([^>]*)> <([^>]*)> (?:<([^>]*)>|"((?:[^"\\]|\\.)*)")\s*\.\s*$'


def read_ntriples(spark, path: str) -> DataFrame:
    """DataFrame(subject, predicate, object, object_is_uri) from a .nt file."""
    lines = spark.read.text(path).withColumnRenamed("value", "line")
    return parse_ntriples_lines(lines)


def parse_ntriples_lines(lines: DataFrame, col: str = "line") -> DataFrame:
    c = F.col(col)
    parsed = lines.select(
        F.regexp_extract(c, _NT_RE, 1).alias("subject"),
        F.regexp_extract(c, _NT_RE, 2).alias("predicate"),
        F.regexp_extract(c, _NT_RE, 3).alias("obj_uri"),
        F.regexp_extract(c, _NT_RE, 4).alias("obj_lit"),
        c.alias("_raw"),
    ).filter(F.length(F.trim(c)) > 0)
    return parsed.select(
        "subject",
        "predicate",
        F.when(F.col("obj_uri") != "", F.col("obj_uri"))
        .otherwise(F.regexp_replace(F.col("obj_lit"), r'\\"', '"'))
        .alias("object"),
        (F.col("obj_uri") != "").alias("object_is_uri"),
    )
