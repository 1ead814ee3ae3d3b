"""As-of join operator (operators/asof.py)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from rdf_knowledge_extractor_spark.operators.asof import asof_join


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),
            (2, "u1", _ts(30)),
            (3, "u2", _ts(5)),  # before any right row for u2
            (4, "u3", _ts(20)),  # tie: right row at exactly _ts(20)
        ],
        "lid long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(8), 100, 1.0),
            ("u1", _ts(25), 101, 2.0),
            ("u2", _ts(9), 102, 3.0),
            ("u3", _ts(20), 103, 4.0),
        ],
        "user string, ts timestamp, rid long, rval double",
    )
    return left, right


def test_asof_backward_inclusive(sides):
    left, right = sides
    got = {
        r.lid: (r.rid, r.rval)
        for r in asof_join(left, right, on="user", ts_col="ts").collect()
    }
    assert got[1] == (100, 1.0)  # latest right ≤ 00:10 is 00:08
    assert got[2] == (101, 2.0)  # 00:25 beats 00:08
    assert got[3] == (None, None)  # nothing at/before 00:05
    assert got[4] == (103, 4.0)  # exact-timestamp match is inclusive


def test_asof_tolerance(sides):
    left, right = sides
    got = {
        r.lid: r.rid
        for r in asof_join(
            left, right, on="user", ts_col="ts", tolerance_sec=180
        ).collect()
    }
    # 3-minute window: lid 1 (match 2 min old) and lid 4 (0 s) survive,
    # lid 2's match is 5 min stale, lid 3 has none
    assert got == {1: 100, 2: None, 3: None, 4: 103}


def test_asof_collision_raises(sides):
    left, right = sides
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rid", "lid"), on="user")


def test_asof_single_shuffle_plan(sides):
    left, right = sides
    plan = (
        asof_join(left, right, on="user", ts_col="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union + one keyed window — no join node, no range/theta join
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1
