"""Triangle counting: closed forms, canonicalization, orientation."""

from __future__ import annotations

import contextlib
import io

from rdf_knowledge_extractor_spark.operators.triangles import (
    triangle_counts,
    triangles,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_k4_has_four_triangles_three_per_node(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    tri = triangles(_edges(spark, k4)).collect()
    assert len(tri) == 4
    # each triangle reported once, corners distinct
    assert all(len({r.x, r.y, r.z}) == 3 for r in tri)
    counts = {r.node: r.n_triangles for r in
              triangle_counts(_edges(spark, k4)).collect()}
    assert counts == {0: 3, 1: 3, 2: 3, 3: 3}


def test_duplicates_reversals_self_loops_ignored(spark):
    messy = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (1, 2), (3, 3)]
    tri = triangles(_edges(spark, messy)).collect()
    assert len(tri) == 1
    assert {tri[0].x, tri[0].y, tri[0].z} == {1, 2, 3}


def test_path_and_star_have_no_triangles(spark):
    path = [(i, i + 1) for i in range(6)]
    assert triangle_counts(_edges(spark, path)).count() == 0
    star = [(0, i) for i in range(1, 8)]
    assert triangle_counts(_edges(spark, star)).count() == 0


def test_chord_ring_closed_form(spark):
    # edges (i,i+1) and (i,i+2) on 0..9: triangles exactly (i,i+1,i+2)
    n = 10
    e = [(i, i + 1) for i in range(n - 1)] + [
        (i, i + 2) for i in range(n - 2)
    ]
    tri = triangles(_edges(spark, e)).collect()
    assert len(tri) == n - 2
    got = {tuple(sorted((r.x, r.y, r.z))) for r in tri}
    assert got == {(i, i + 1, i + 2) for i in range(n - 2)}


def test_hub_wedges_stay_on_low_degree_side(spark):
    # a degree-9 hub in one triangle: orientation must point the two
    # triangle edges AWAY from the low-degree corners, so the hub
    # contributes no wedge fan (the Suri-Vassilvitskii property)
    hub = [(100, i) for i in range(9)] + [(0, 1)]
    tri = triangles(_edges(spark, hub)).collect()
    assert len(tri) == 1
    r = tri[0]
    assert r.z == 100  # hub is the (deg,id)-largest corner, never x
    assert {r.x, r.y} == {0, 1}


def test_clustering_coefficient_closed_form(spark):
    from rdf_knowledge_extractor_spark.operators.triangles import (
        clustering_coefficient,
    )

    # triangle 1-2-3 plus pendant 3-4: node 3 has deg 3, 1 triangle
    # -> coeff 2*1/(3*2) = 1/3; node 4 deg 1 -> 0
    e = [(1, 2), (2, 3), (3, 1), (3, 4)]
    got = {
        r.node: (r.degree, r.n_triangles, r.coeff)
        for r in clustering_coefficient(_edges(spark, e)).collect()
    }
    assert got == {
        1: (2, 1, 1.0),
        2: (2, 1, 1.0),
        3: (3, 1, round(1 / 3, 6)),
        4: (1, 0, 0.0),
    }


def test_plan_no_cartesian(spark):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        triangle_counts(_edges(spark, [(1, 2)])).explain(mode="formatted")
    assert "CartesianProduct" not in buf.getvalue()
