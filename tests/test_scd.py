"""SCD type-2 interval construction: collapse, nulls, plan shape."""

from __future__ import annotations

import contextlib
import datetime as dt
import io

import pytest

from rdf_knowledge_extractor_spark.operators.scd import scd2_intervals


def _ev(spark, rows):
    base = dt.datetime(2025, 1, 1)
    return spark.createDataFrame(
        [(k, base + dt.timedelta(days=d), v) for k, d, v in rows],
        ["key", "ts", "val"],
    )


def test_intervals_closed_form(spark):
    df = _ev(spark, [
        (1, 0, "a"), (1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 5, "a"),
        (2, 0, "x"),
    ])
    rows = sorted(
        (r.key, r.valid_from.day, r.val,
         r.valid_to.day if r.valid_to else None)
        for r in scd2_intervals(df, ["key"], "ts", ["val"]).collect()
    )
    assert rows == [
        (1, 1, "a", 3),   # days 0-1 collapse; closes at the b change
        (1, 3, "b", 6),
        (1, 6, "a", None),  # reopened state, current
        (2, 1, "x", None),
    ]


def test_null_attr_is_not_a_phantom_change(spark):
    df = _ev(spark, [(1, 0, None), (1, 1, None), (1, 2, "a")])
    rows = scd2_intervals(df, ["key"], "ts", ["val"]).collect()
    assert len(rows) == 2  # NULL->NULL collapses, NULL->a changes


def test_multi_attr_and_validation(spark):
    df = _ev(spark, [(1, 0, "a")]).withColumn("extra", _F_lit0())
    out = scd2_intervals(df, ["key"], "ts", ["val", "extra"])
    assert out.columns == ["key", "valid_from", "val", "extra", "valid_to"]
    with pytest.raises(ValueError):
        scd2_intervals(df, [], "ts", ["val"])
    with pytest.raises(ValueError):
        scd2_intervals(df, ["key"], "ts", [])


def _F_lit0():
    from pyspark.sql import functions as F

    return F.lit(0)


def test_single_shuffle_plan(spark):
    df = _ev(spark, [(1, 0, "a")])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scd2_intervals(df, ["key"], "ts", ["val"]).explain(mode="formatted")
    tree = buf.getvalue().split("\n\n", 1)[0]
    # both windows share the (key x valid_from) sort order: one exchange
    assert tree.count("Exchange") == 1
    assert "CartesianProduct" not in buf.getvalue()
