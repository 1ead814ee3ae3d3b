"""Distributed triangle counting with degree-ordered orientation.

Triangle participation is the classic graph-quality signal (clustering
coefficient, community density, spam-farm detection on web link
graphs).  Beyond-reference family (the reference engine scopes itself
to small KGs — /root/reference/README.md).

Scale shape — the Suri/Vassilvitskii "orient by degree" construction
(WWW'11, "Counting Triangles and the Curse of the Last Reducer"):

- undirected edges are canonicalized + deduped (one shuffle);
- every edge is ORIENTED from its (degree, id)-smaller endpoint to
  the larger one, so each triangle {x,y,z} is found exactly once at
  its smallest vertex, and — the scale point — a degree-D hub
  generates wedges only for the ~sqrt-bounded set of HIGHER-degree
  neighbors, not all D of them: on power-law web graphs this is the
  difference between the last reducer exploding and finishing;
- wedges (u→v, u→w with v ≺ w) are closed by one join against the
  oriented edge set itself;
- per-node counts: each triangle credits its three corners via a
  3-element explode + hash aggregate.

The ≺ order is the lexicographic (degree, node) pair, carried as a
struct column so the comparison stays in whole-stage codegen; the
DuckDB oracle mirrors it with SQL row-value comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _oriented(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """(u, v, kv) — edges oriented by (degree, id); kv is v's sort
    key so wedge construction can order endpoints without a re-join."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    withdeg = (
        und.join(deg.withColumnRenamed("node", "a"), on="a")
        .withColumnRenamed("deg", "_da")
        .join(deg.withColumnRenamed("node", "b"), on="b")
        .withColumnRenamed("deg", "_db")
    )
    ka = F.struct(F.col("_da").alias("d"), F.col("a").alias("n"))
    kb = F.struct(F.col("_db").alias("d"), F.col("b").alias("n"))
    return withdeg.select(
        F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(ka < kb, kb).otherwise(ka).alias("kv"),
    )


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(x, y, z) — every triangle exactly once, corners in the
    oriented ≺ order (x = (deg,id)-smallest corner)."""
    o = _oriented(edges, src, dst)
    e1 = o.select(
        F.col("u"), F.col("v").alias("_v"), F.col("kv").alias("_kv")
    )
    e2 = o.select(
        F.col("u"), F.col("v").alias("_w"), F.col("kv").alias("_kw")
    )
    wedges = e1.join(e2, on="u").filter(F.col("_kv") < F.col("_kw"))
    closer = o.select(
        F.col("u").alias("_v"), F.col("v").alias("_w")
    )
    return wedges.join(closer, on=["_v", "_w"]).select(
        F.col("u").alias("x"), F.col("_v").alias("y"), F.col("_w").alias("z")
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, degree, n_triangles, coeff) — local clustering
    coefficient 2T/(d(d-1)) per node (Watts-Strogatz), 0 for
    degree-1 nodes.  Degree is over the canonical undirected simple
    graph.  One extra hash aggregate + a join keyed on node against
    the (sparse) triangle counts — nodes in no triangle appear with
    coeff 0."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_counts(edges, src=src, dst=dst)
    return deg.join(tri, on="node", how="left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
            "n_triangles"
        ),
        F.round(
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.coalesce(F.col("n_triangles"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1.0)),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("coeff"),
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, n_triangles) — per-node triangle participation (each
    triangle credits all three corners); nodes in no triangle are
    absent."""
    tri = triangles(edges, src=src, dst=dst)
    return (
        tri.select(
            F.explode(F.array("x", "y", "z")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
