"""Text/file document sources with encoding sniff + handler dispatch.

Parity targets:
- TextHandler (ref:src/handlers/mod.rs:43-78): read bytes, detect
  encoding from the BOM (UTF-8 / UTF-16LE / UTF-16BE, like
  encoding_rs::Encoding::for_bom), default UTF-8, lossy decode.
- DocumentProcessor dispatch (ref:src/handlers/mod.rs:180-227):
  http(s):// prefix → URL/HTML handler; else by file extension
  (pdf | txt | text | md, unknown extensions default to txt).
- PDF handler (ref:src/handlers/mod.rs:14-41): out of contract for
  Common-Crawl pages; stubbed behind an import-try (pypdf absent in
  this container) with the Spark plumbing (binaryFile scan) real.

Spark shape: `spark.read.format("binaryFile")` scans the files
distributed; decode happens in an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BOMS = [
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
]


def decode_with_bom(data: bytes) -> str:
    """BOM-sniffed decode, UTF-8 default, lossy on errors
    (ref:src/handlers/mod.rs:53-64)."""
    if data is None:
        return ""
    data = bytes(data)
    for bom, codec in _BOMS:
        if data.startswith(bom):
            body = data if codec == "utf-8-sig" else data[len(bom):]
            return body.decode(codec, errors="replace")
    return data.decode("utf-8", errors="replace")


@F.pandas_udf(T.StringType())
def decode_text(content: pd.Series) -> pd.Series:
    return content.map(decode_with_bom)


def source_type(col):
    """Handler-dispatch key per source string
    (ref:src/handlers/mod.rs:211-227)."""
    ext = F.lower(F.element_at(F.split(col, r"\."), -1))
    return (
        F.when(col.startswith("http://") | col.startswith("https://"), F.lit("url"))
        .when(ext.isin("pdf"), F.lit("pdf"))
        .when(ext.isin("txt", "text", "md"), F.lit("txt"))
        .otherwise(F.lit("txt"))  # unknown extensions default to txt
    )


def read_text_files(spark, path_glob: str) -> DataFrame:
    """Distributed text-file source → (source, text, metadata)."""
    binary = spark.read.format("binaryFile").load(path_glob)
    return binary.select(
        F.col("path").alias("source"),
        decode_text(F.col("content")).alias("text"),
        F.create_map(
            F.lit("source"), F.col("path"),
            F.lit("type"), F.lit("text"),
            F.lit("size"), F.col("length").cast("string"),
        ).alias("metadata"),
    )


def read_pdf_files(spark, path_glob: str) -> DataFrame:
    """PDF source: binaryFile scan + pandas-UDF text extraction
    (pypdf when importable, built-in minimal extractor otherwise —
    see functions/pdf_text.py; ref:src/handlers/mod.rs:14-41)."""
    from rdf_knowledge_extractor_spark.functions.pdf_text import (
        read_pdf_files as _read,
    )

    return _read(spark, path_glob)


_DOC_SCHEMA = (
    "source string, text string, metadata map<string,string>, error string"
)


def process_documents(spark, sources: list[str], pages_df: DataFrame | None = None) -> DataFrame:
    """Dispatch a mixed source list like the reference CLI: URLs come
    from the pages table (html already crawled), files from disk.

    Inputs that cannot be processed are NOT silently dropped: they get
    an error row (text NULL, `error` set), mirroring the reference's
    per-document error recording (ExtractionResult.errors,
    ref:src/core/extractor.rs:60-71 — a failed doc still appears in the
    result with its error string)."""
    from rdf_knowledge_extractor_spark.functions.html_text import (
        html_metadata,
        html_to_text,
    )

    src_df = spark.createDataFrame([(s,) for s in sources], "source string")
    typed = src_df.withColumn("stype", source_type(F.col("source")))
    out = []
    urls = typed.filter(F.col("stype") == "url")
    if not urls.isEmpty():
        if pages_df is not None:
            matched = urls.join(
                pages_df, urls["source"] == pages_df["url"], "left"
            )
            out.append(
                matched.select(
                    F.col("source"),
                    F.when(
                        F.col("url").isNotNull(), html_to_text(F.col("html"))
                    ).alias("text"),
                    F.when(
                        F.col("url").isNotNull(), html_metadata(F.col("html"))
                    ).alias("metadata"),
                    F.when(
                        F.col("url").isNull(),
                        F.concat(F.lit("URL not present in pages table: "), F.col("source")),
                    ).alias("error"),
                )
            )
        else:
            out.append(
                urls.select(
                    "source",
                    F.lit(None).cast("string").alias("text"),
                    F.lit(None).cast("map<string,string>").alias("metadata"),
                    F.concat(
                        F.lit("URL source requires a pages table (no live fetch): "),
                        F.col("source"),
                    ).alias("error"),
                )
            )
    files = [r["source"] for r in typed.filter(F.col("stype") == "txt").collect()]
    for f in files:
        # binaryFile reports a file:/ URI; keep the caller's source string
        out.append(
            read_text_files(spark, f)
            .withColumn("source", F.lit(f))
            .withColumn("error", F.lit(None).cast("string"))
        )
    pdfs = [r["source"] for r in typed.filter(F.col("stype") == "pdf").collect()]
    for p in pdfs:
        out.append(
            read_pdf_files(spark, p)
            .withColumn("source", F.lit(p))
            .withColumn("error", F.lit(None).cast("string"))
        )
    if not out:
        return spark.createDataFrame([], _DOC_SCHEMA)
    df = out[0]
    for o in out[1:]:
        df = df.unionByName(o)
    return df
