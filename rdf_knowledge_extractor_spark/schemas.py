"""Canonical Spark schemas for the engine.

The triple record mirrors the reference's core struct
(ref:src/core/extractor.rs:13-26) field-for-field, with two additional
ordinal columns (`doc_seq`, `triple_seq`) that materialize the
reference's implicit `Vec` insertion order — required so
first-occurrence dedup (ref:src/core/extractor.rs:327-343) has
deterministic semantics after shuffles.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ref:src/core/extractor.rs:13-26 (RdfTriple) + explicit ordinals (§1.3 SURVEY)
TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("subject", T.StringType(), False),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("object", T.StringType(), False),
        T.StructField("confidence", T.FloatType(), False),  # default 1.0
        T.StructField("source", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("doc_seq", T.LongType(), False),
        T.StructField("triple_seq", T.IntegerType(), False),
    ]
)

# BASELINE.json input_hint: Common-Crawl-style pages table
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# per-document extraction lineage (mirrors ExtractionResult,
# ref:src/core/extractor.rs:60-71, as a table instead of per-doc structs)
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_url", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("n_triples", T.LongType(), False),
        T.StructField("errors", T.ArrayType(T.StringType()), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("elapsed", T.DoubleType(), True),
        T.StructField("config_name", T.StringType(), True),
    ]
)

# ProcessedDocument (ref:src/handlers/mod.rs:240-245)
PROCESSED_DOC_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
