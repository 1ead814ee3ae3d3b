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

    from rdf_knowledge_extractor_spark.plans.store import TripleStore

    run_once("c1")
    g1 = TripleStore(spark, graph_path).read()
    n1 = g1.count()
    assert n1 == g1.select("subject", "predicate", "object").distinct().count()

    # replay the SAME input with a FRESH checkpoint: fresh batch keys,
    # so the transactional store's anti-join must skip every row
    run_once("c2")
    store = TripleStore(spark, graph_path)
    assert store.read().count() == n1
    assert store.total_rows() == n1
    # two checkpoints → two distinct committed batch keys
    assert len(store.batch_ids()) == 2


def test_stateful_sessionization_applyinpandaswithstate(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): event-time
    sessions with gap close + watermark-timeout close, matching the
    batch lag/window sessionization on the same data."""
    import datetime as dt

    from rdf_knowledge_extractor_spark.streaming.stateful import (
        streaming_sessions_stateful,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: two sessions (gap > 1800s between event 2 and 3)
    for i, off in enumerate([0, 60, 120, 4000, 4100]):
        rows.append((i, base + dt.timedelta(seconds=off), 1, "click", 10.0))
    # user 2: one session
    rows.append((10, base + dt.timedelta(seconds=30), 2, "click", 5.0))
    # a far-future event advances the watermark so open sessions time out
    rows.append((99, base + dt.timedelta(days=2), 3, "click", 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    src = str(tmp_path / "events_in")
    df.coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    sessions = streaming_sessions_stateful(stream, gap_seconds=1800)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.n_events, r.total_value)
        for r in spark.sql("select * from sess_out").collect()
    }
    # user 1 session A (3 events) closes inline on the gap; session B
    # (2 events) and user 2's session close via watermark timeout
    assert (1, 3, 30.0) in got
    assert (1, 2, 20.0) in got
    assert (2, 1, 5.0) in got


def test_streaming_curate_matches_batch(spark, tmp_path):
    """The streaming curation gate = batch curate_corpus on the same
    data (unique texts ⇒ the keep-first/keep-min dedup difference is
    moot), and streaming dedup drops a duplicate-content doc."""
    from pyspark.sql import types as T

    from rdf_knowledge_extractor_spark.operators.curation import curate_corpus
    from rdf_knowledge_extractor_spark.streaming.ingest import streaming_curate

    en = (
        "the cat and the dog sat on the mat and looked at the sun of a day "
        "for a while in the park with a friend and the bird is on the tree"
    )
    rows = [(i, en + f" tail{i}", "src0") for i in range(8)]
    rows.append((100, en + " tail0", "src0"))  # exact dup of doc 0's text
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    in_dir = str(tmp_path / "docs_in")
    docs.coalesce(1).write.parquet(in_dir)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(in_dir)
    out = streaming_curate(stream, lang="en", min_words=10)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("curated_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.lang_pred, r.n_words, r.quality_score)
        for r in spark.sql("SELECT * FROM curated_stream").collect()
    }
    want = {
        (r.doc_id, r.lang_pred, r.n_words, r.quality_score)
        for r in curate_corpus(docs, lang="en", min_words=10).collect()
    }
    # batch keeps min(0, 100)=0 for the dup pair; the single-file
    # stream arrives in row order so first-arrival is also doc 0
    assert got == want
    assert len(got) == 8


def test_streaming_curate_redacts_pii(spark, tmp_path):
    """redact=True adds a PII-scrubbed text column to the surviving
    docs — the scrub is stateless Catalyst so it composes into the
    streaming gate unchanged."""
    from pyspark.sql import types as T

    from rdf_knowledge_extractor_spark.streaming.ingest import streaming_curate

    en = (
        "the cat and the dog sat on the mat and looked at the sun of a day "
        "for a while in the park and you can mail me at bob@example.com"
    )
    docs = spark.createDataFrame([(1, en, "src0")],
                                 "doc_id long, text string, source string")
    in_dir = str(tmp_path / "docs_in_pii")
    docs.coalesce(1).write.parquet(in_dir)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ])
    stream = spark.readStream.schema(schema).parquet(in_dir)
    out = streaming_curate(stream, lang="en", min_words=10, redact=True)
    q = (
        out.writeStream.format("memory")
        .queryName("curated_pii_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    [r] = spark.sql("SELECT * FROM curated_pii_stream").collect()
    assert "bob@example.com" not in r.redacted
    assert "<EMAIL>" in r.redacted


def test_streaming_attribution_equals_batch_asof(spark, tmp_path):
    """foreachBatch as-of attribution: union of micro-batch outputs ==
    the one-shot batch asof_join on the same data; replays idempotent
    (per-batch overwrite directories)."""
    from datetime import datetime

    from rdf_knowledge_extractor_spark.operators.asof import asof_join
    from rdf_knowledge_extractor_spark.streaming.ingest import (
        start_attribution_sink,
    )

    def ts(m):
        return datetime(2024, 1, 1, 0, m)

    clicks = spark.createDataFrame(
        [("u1", ts(5), 100), ("u1", ts(20), 101), ("u2", ts(8), 102)],
        "user string, ts timestamp, click_id long",
    )
    purchases = spark.createDataFrame(
        [(1, "u1", ts(10)), (2, "u1", ts(25)), (3, "u2", ts(3)), (4, "u2", ts(50))],
        "pid long, user string, ts timestamp",
    )
    src = str(tmp_path / "purchases")
    purchases.write.parquet(src)

    stream = (
        spark.readStream.schema(purchases.schema).parquet(src)
    )
    out_dir = str(tmp_path / "attributed")
    q = start_attribution_sink(
        stream, clicks, out_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = sorted(
        map(tuple, spark.read.parquet(out_dir).drop("batch").collect())
    )
    want = sorted(map(tuple, asof_join(purchases, clicks, on="user").collect()))
    assert got == want

    # resume with the same checkpoint: no new batches, output unchanged
    q2 = start_attribution_sink(
        spark.readStream.schema(purchases.schema).parquet(src),
        clicks, out_dir, str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert sorted(
        map(tuple, spark.read.parquet(out_dir).drop("batch").collect())
    ) == want


def test_streaming_neardup_filter_across_batches(spark, tmp_path):
    """First-arrival near-dup admission: batch 2's near-copy of an
    admitted batch-1 doc is rejected; novel docs pass; in-batch
    near-dups keep the min id; replaying the stream is idempotent."""
    from pyspark.sql import types as T

    from rdf_knowledge_extractor_spark.streaming.neardup import (
        start_neardup_filter_sink,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat naps "
        "in the warm afternoon sun near the old garden wall by the gate"
    )
    other = (
        "completely different content about spark structured streaming "
        "microbatches and stateful admission filters for web corpora"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir = str(tmp_path / "out")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def run_stream():
        stream = spark.readStream.schema(schema).parquet(str(in_dir))
        q = start_neardup_filter_sink(
            stream, out_dir, state_dir, ckpt, threshold=0.7
        )
        q.awaitTermination(180)

    # batch 1: doc0 + an in-batch near-copy (doc1) + a novel doc (doc2)
    spark.createDataFrame(
        [(0, base), (1, base + " extra"), (2, other)], schema
    ).coalesce(1).write.mode("append").parquet(str(in_dir))
    run_stream()
    got1 = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {0, 2}  # doc1 rejected in-batch (min id 0 kept)

    # batch 2: near-copy of admitted doc0 (reject) + novel doc (admit)
    spark.createDataFrame(
        [(10, base + " tail"), (11, other.upper() + " but lowercase differs a lot here truly")],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(in_dir))
    run_stream()
    got2 = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert 10 not in got2
    assert 11 in got2
    assert got2 >= {0, 2, 11}


def test_greedy_inbatch_admission_chain(spark):
    """round-4 advice (neardup.py:122): chain a~b, b~c with a!~c must
    admit c — its only near-dup b was itself rejected.  Also: a
    history-rejected doc never suppresses its in-batch peers."""
    from rdf_knowledge_extractor_spark.streaming.neardup import _greedy_rejections

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    rej = {r.id for r in _greedy_rejections(pairs, None).collect()}
    assert rej == {2}  # 1 admitted, 2 rejected, 3 re-admitted

    # doc 1 already rejected by history: 2 is then admitted, 3 rejected
    hist = spark.createDataFrame([(1,)], "id long")
    rej = {r.id for r in _greedy_rejections(pairs, hist).collect()}
    assert rej == {1, 3}

    # two independent pairs resolve independently
    pairs2 = spark.createDataFrame([(1, 2), (5, 6)], "id_a long, id_b long")
    rej = {r.id for r in _greedy_rejections(pairs2, None).collect()}
    assert rej == {2, 6}


def test_neardup_state_compaction_preserves_admission(spark, tmp_path):
    """round-4 brief #5: N batches -> compact -> admission decisions
    identical, state file count bounded; the max batch dir survives."""
    import os

    from pyspark.sql import types as T

    from rdf_knowledge_extractor_spark.streaming.neardup import (
        _batch_dirs,
        compact_state,
        start_neardup_filter_sink,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat naps "
        "in the warm afternoon sun near the old garden wall by the gate"
    )
    texts = {
        0: base,
        1: "totally unrelated content about parquet partition discovery "
           "and the structured streaming checkpoint commit protocol",
        2: base + " trailing near dup marker",  # near-dup of 0 -> reject
        3: "third novel document mentioning adaptive query execution "
           "and broadcast joins in distributed sql engines at scale",
    }
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir = str(tmp_path / "out")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def run_stream():
        stream = spark.readStream.schema(schema).parquet(str(in_dir))
        q = start_neardup_filter_sink(
            stream, out_dir, state_dir, ckpt, threshold=0.7
        )
        q.awaitTermination(180)

    for i in (0, 1, 2):
        spark.createDataFrame([(i, texts[i])], schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))
        run_stream()
    band_dir = os.path.join(state_dir, "bands")
    assert len(_batch_dirs(band_dir)) == 3

    reclaimed = compact_state(spark, state_dir, min_batches=2)
    assert reclaimed >= 1
    dirs = _batch_dirs(band_dir)
    assert len(dirs) == 2  # compacted set + protected max id
    assert max(dirs) == 2

    # admission against compacted state is unchanged: a near-copy of
    # doc 0 is still rejected, a novel doc still admitted
    spark.createDataFrame(
        [(10, base + " another tail"), (3, texts[3])], schema
    ).coalesce(1).write.mode("append").parquet(str(in_dir))
    run_stream()
    got = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert got == {0, 1, 3}


def test_neardup_compaction_crash_recovery(spark, tmp_path):
    """A _SUCCESS-marked tmp with no target is finished by rename; an
    unmarked tmp is rolled back."""
    import os

    from rdf_knowledge_extractor_spark.streaming.neardup import (
        _batch_dirs,
        _finish_pending_compaction,
    )

    band_dir = tmp_path / "bands"
    # complete tmp (crash after olds removed, before rename)
    done = band_dir / ".compact-tmp-deadbeef-batch=4"
    done.mkdir(parents=True)
    (done / "_SUCCESS").touch()
    (done / "part-0.parquet").write_bytes(b"x")
    # incomplete tmp (crash mid-write)
    half = band_dir / ".compact-tmp-cafebabe-batch=2"
    half.mkdir()
    (half / "part-0.parquet").write_bytes(b"y")
    (band_dir / "batch=2").mkdir()  # its olds still exist

    _finish_pending_compaction(str(band_dir))
    assert (band_dir / "batch=4" / "part-0.parquet").exists()
    assert not half.exists()
    assert set(_batch_dirs(str(band_dir))) == {2, 4}


def test_neardup_sink_recovers_pending_compaction_before_state_read(
    spark, tmp_path
):
    """Round-5 review finding: a compact_state that died after removing
    the old batch dirs but before renaming its _SUCCESS-marked tmp left
    the history invisible to the NEXT micro-batch (Spark skips
    dot-prefixed dirs), wrongly admitting near-dups.  The sink now runs
    _finish_pending_compaction on both state tables before its state
    reads, so the compacted history is seen again."""
    import os
    import shutil

    from pyspark.sql import types as T

    from rdf_knowledge_extractor_spark.streaming.neardup import (
        start_neardup_filter_sink,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat naps "
        "in the warm afternoon sun near the old garden wall by the gate"
    )
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir = str(tmp_path / "out")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def run_stream():
        stream = spark.readStream.schema(schema).parquet(str(in_dir))
        q = start_neardup_filter_sink(
            stream, out_dir, state_dir, ckpt, threshold=0.7
        )
        q.awaitTermination(180)

    spark.createDataFrame([(0, base)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    run_stream()

    # simulate the crash window: every committed batch dir of BOTH
    # tables has been compacted into a _SUCCESS-marked tmp, olds
    # removed, rename never happened
    for table in ("bands", "shingles"):
        tdir = os.path.join(state_dir, table)
        for name in os.listdir(tdir):
            if not name.startswith("batch="):
                continue
            src = os.path.join(tdir, name)
            tmp = os.path.join(tdir, f".compact-tmp-deadbeef-{name}")
            shutil.copytree(src, tmp)
            open(os.path.join(tmp, "_SUCCESS"), "w").close()
            shutil.rmtree(src)

    # a near-dup of doc 0 must still be REJECTED
    spark.createDataFrame(
        [(10, base + " trailing near dup marker")], schema
    ).coalesce(1).write.mode("append").parquet(str(in_dir))
    run_stream()
    got = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert got == {0}
