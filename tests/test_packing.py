"""Sequence packing (operators/packing.py): binned vs greedy
semantics, capacity guarantees, determinism, and the one-shuffle /
shard-parallel plan shapes."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from rdf_knowledge_extractor_spark.operators.packing import (
    pack_sequences_binned,
    pack_sequences_greedy,
    packing_report,
)


@pytest.fixture(scope="module")
def docs(spark):
    # token counts per doc (whitespace words): id -> id%7 + 1 words
    rows = [(i, " ".join(f"w{j}" for j in range(i % 7 + 1))) for i in range(40)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _greedy_reference(items, max_tokens):
    """Independent first-fit-in-order packer."""
    out, running, cur = {}, 0, 0
    for doc_id, n in items:
        if running > 0 and running + n > max_tokens:
            cur += 1
            running = 0
        out[doc_id] = cur
        running += n
    return out


def test_greedy_matches_independent_reference(docs):
    packed = pack_sequences_greedy(docs, max_tokens=10, n_shards=4)
    rows = packed.collect()
    by_shard = {}
    for r in sorted(rows, key=lambda r: r.doc_id):
        by_shard.setdefault(r.shard, []).append((r.doc_id, r.n_tokens))
    for shard, items in by_shard.items():
        expect = _greedy_reference(items, 10)
        got = {r.doc_id: r.bin for r in rows if r.shard == shard}
        assert got == expect, f"shard {shard}"


def test_greedy_capacity_never_exceeded(docs):
    report = packing_report(pack_sequences_greedy(docs, max_tokens=10, n_shards=4))
    # every doc here is <= 7 tokens < max, so NO bin may exceed 10
    assert report.filter(F.col("sum_tokens") > 10).count() == 0


def test_greedy_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, " ".join(["x"] * 50)), (2, "c d e")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in
            pack_sequences_greedy(df, max_tokens=10, n_shards=1).collect()}
    assert rows[1].bin not in (rows[0].bin, rows[2].bin)
    assert rows[0].bin != rows[2].bin  # 50-token doc closed bin 0


def test_binned_bounded_overflow(docs):
    packed = pack_sequences_binned(docs, max_tokens=10, n_shards=4)
    report = packing_report(packed)
    # overflow bound: sum_tokens < max + (longest doc = 7)
    assert report.filter(F.col("sum_tokens") >= 10 + 7).count() == 0
    # bins are dense from 0 within each shard
    for shard_bins in report.groupBy("shard").agg(
        F.collect_list("bin").alias("b")
    ).collect():
        got = sorted(shard_bins.b)
        assert got == list(range(len(got)))


def test_binned_is_exclusive_cumsum(spark):
    # shard 0, docs of 4 tokens each, max 8: cumsum_excl 0,4,8,12 ->
    # bins 0,0,1,1 (doc fitting exactly at the boundary starts the
    # next bin only after the budget is CONSUMED, not at >= max)
    df = spark.createDataFrame(
        [(i, "a b c d") for i in range(0, 16, 4)], ["doc_id", "text"]
    )
    rows = sorted(
        pack_sequences_binned(df, max_tokens=8, n_shards=1).collect(),
        key=lambda r: r.doc_id,
    )
    assert [r.bin for r in rows] == [0, 0, 1, 1]


def test_binned_one_shuffle(docs):
    packed = pack_sequences_binned(docs, max_tokens=10, n_shards=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        packed.explain()
    assert buf.getvalue().count("Exchange") == 1


def test_validation(docs):
    with pytest.raises(ValueError):
        pack_sequences_binned(docs, max_tokens=0)
    with pytest.raises(ValueError):
        pack_sequences_greedy(docs, max_tokens=10, n_shards=0)
