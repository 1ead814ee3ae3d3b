"""Structured Streaming ingest: availableNow end-to-end, checkpoint
resume (no reprocessing), graph-merge sink insert-if-absent."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_knowledge_extractor_spark.sources.pages import pages_dataframe
from rdf_knowledge_extractor_spark.streaming.ingest import (
    read_pages_stream,
    start_graph_merge_sink,
    start_triples_sink,
    streaming_triples,
)


def _write_pages(spark, tmp_path, n, seed=42, subdir="in"):
    pages = pages_dataframe(spark, n, seed=seed)
    (tmp_path / subdir).mkdir(exist_ok=True)
    pages.write.mode("append").parquet(str(tmp_path / subdir))
    return pages


def test_stream_extract_to_parquet(spark, example_config, tmp_path):
    _write_pages(spark, tmp_path, 12)
    stream = read_pages_stream(spark, str(tmp_path / "in"))
    assert stream.isStreaming
    triples = streaming_triples(stream, example_config)
    q = start_triples_sink(
        triples, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    n1 = out.filter(F.col("subject").isNotNull()).count()
    assert n1 > 0
    assert out.select("source").distinct().count() == 12

    # checkpoint resume: nothing new → no reprocessing
    q2 = start_triples_sink(
        streaming_triples(read_pages_stream(spark, str(tmp_path / "in")), example_config),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).filter(
        F.col("subject").isNotNull()
    ).count() == n1

    # new files arrive → only the delta is processed
    _write_pages(spark, tmp_path, 6, seed=7)
    q3 = start_triples_sink(
        streaming_triples(read_pages_stream(spark, str(tmp_path / "in")), example_config),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q3.awaitTermination(120)
    out3 = spark.read.parquet(str(tmp_path / "out"))
    assert out3.select("source").distinct().count() == 18
    assert out3.filter(F.col("subject").isNotNull()).count() > n1


def test_stream_graph_merge_dedups(spark, example_config, tmp_path):
    _write_pages(spark, tmp_path, 8)
    graph_path = str(tmp_path / "graph")

    def run_once(ckpt):
        stream = read_pages_stream(spark, str(tmp_path / "in"))
        q = start_graph_merge_sink(
            streaming_triples(stream, example_config), graph_path, str(tmp_path / ckpt)
        )
        q.awaitTermination(120)

    run_once("c1")
    g1 = spark.read.parquet(graph_path)
    n1 = g1.count()
    assert n1 == g1.select("subject", "predicate", "object").distinct().count()

    # replay the SAME input with a FRESH checkpoint: anti-join skips all
    run_once("c2")
    assert spark.read.parquet(graph_path).count() == n1
