"""Staged pipeline: end-to-end run, checkpoint resume, lineage."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_knowledge_extractor_spark.plans.pipeline import KgPipeline
from rdf_knowledge_extractor_spark.sources.pages import pages_dataframe


def test_pipeline_run_and_resume(spark, example_config, tmp_path):
    pages = pages_dataframe(spark, 30, seed=42).drop("text")

    pipe = KgPipeline(spark, example_config, str(tmp_path), partitions=4)
    graph = pipe.run(pages)
    n1 = graph.count()
    assert n1 > 0
    assert not any(r.resumed for r in pipe.results)

    # canonicalization merged alias entities: canonical subjects only
    subjects = [r.subject for r in graph.select("subject").distinct().collect()]
    assert all(s.startswith("http://") for s in subjects)

    # lineage covers every page
    assert pipe.lineage().count() == 30

    # manifests written with per-partition rows
    manifests = {m["stage"]: m for m in pipe.stage_manifests()}
    assert set(manifests) == {
        "s1_text", "s2_extracted", "s3_triples", "s3_lineage", "s4_mapping", "s5_graph"
    }
    assert manifests["s5_graph"]["rows"] == n1
    assert sum(manifests["s5_graph"]["partition_rows"].values()) == n1

    # resume: a fresh pipeline over the same dir skips every stage
    pipe2 = KgPipeline(spark, example_config, str(tmp_path), partitions=4)
    graph2 = pipe2.run(pages)
    assert all(r.resumed for r in pipe2.results)
    assert graph2.count() == n1

    # changing a stage param invalidates the fingerprint → recompute
    pipe3 = KgPipeline(spark, example_config, str(tmp_path), partitions=8)
    pipe3.run(pages)
    assert not any(r.resumed for r in pipe3.results)


def test_pipeline_graph_is_canonicalized(spark, example_config, tmp_path):
    pages = pages_dataframe(spark, 30, seed=42).drop("text")
    pipe = KgPipeline(spark, example_config, str(tmp_path / "p"), partitions=4)
    graph = pipe.run(pages)
    # no two distinct subject URIs share a canonical key after the remap
    from rdf_knowledge_extractor_spark.operators.linking import with_canonical_key

    ent = with_canonical_key(graph.select(F.col("subject").alias("uri")).distinct())
    dup_keys = (
        ent.groupBy("key").agg(F.countDistinct("uri").alias("n")).filter("n > 1")
    )
    assert dup_keys.count() == 0
