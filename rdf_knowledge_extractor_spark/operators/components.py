"""Connected components on a DataFrame edge list.

Three algorithms behind one dispatcher:

- **driver union-find** (`_components_driver`) — the ≤100k-edge arm:
  one collect + path-compressed union-find, min-label semantics; at
  this size the distributed loops' per-round driver jobs ARE the
  cost.  NULL endpoints are out of the component contract (an entity
  id is never NULL; the two distributed arms historically disagreed
  on them — labelprop emitted a NULL node, star arm dropped the
  edge — the driver arm keeps non-NULL endpoints as isolated nodes).
- **label propagation** (`connected_components_labelprop`) — min-label
  flooding; O(component diameter) rounds; kept as a directly-callable
  algorithm (and differential-test twin) but no longer dispatched —
  the driver arm covers its former small-input band.
- **alternating large-star / small-star**
  (`connected_components_star`) — Kiveris et al., "Connected
  Components in MapReduce and Beyond" (cited in PAPERS.md; SURVEY
  §2.5): each round rewires every node to the minimum of its
  neighborhood, halving tree heights — O(log n) rounds REGARDLESS of
  diameter.  This is the scale path: a 10-hop chain (web-graph-ish
  component) costs ~log₂ rounds, not 10.

Shared scale design:
- NO explicit repartition — post-shuffle parallelism is left to AQE
  (`coalescePartitions`), which right-sizes each round for the actual
  volume (explicit repartition pins tiny iterations to the full
  shuffle-partition count and drowns the loop in task overhead);
- per-round `localCheckpoint` truncates the lineage chain (the classic
  iterative-algorithm plan blow-up: job time ~30 ms, driver Catalyst
  re-analysis seconds once the tree nests a few rounds deep);
- convergence tests are single-scalar aggregates on already-
  checkpointed round outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# below this many edges the whole component computation fits the
# driver comfortably (≤ a few MB of node strings — the same
# scalar-bounded-collect class as the IVF training sample) and a
# single collect + union-find replaces the iterative loop's ~2 jobs
# per round.  At 100-TB scale the count() dispatch sends the work to
# the distributed star rounds unchanged.
_DRIVER_MAX_EDGES = 100_000


def _components_driver(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Union-find on a collected edge list — small-input fast path.

    Semantics identical to the distributed arms: component = min
    reachable node under the same ordering Spark uses (UTF-8 byte
    order ≡ code-point order, which is Python's `<` on str), isolated
    nodes appear iff present in `edges`, self-loops allowed, NULL
    endpoints ignored by the joins' equality semantics (a NULL never
    equals anything, so distributed rounds never propagate through
    it; we drop NULL-endpoint edges likewise)."""
    spark = edges.sparkSession
    rows = edges.select(src, dst).collect()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] is not root and parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r[0], r[1]
        for n in (a, b):
            if n is not None and n not in parent:
                parent[n] = n
        if a is None or b is None:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the MIN as the root so the label is the component min
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    from pyspark.sql import types as T

    node_type = edges.schema[src].dataType
    schema = T.StructType(
        [
            T.StructField("node", node_type, True),
            T.StructField("component", node_type, True),
        ]
    )
    out = [(n, find(n)) for n in parent]
    return spark.createDataFrame(out, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """DataFrame(node, component) — component = min node id (lexicographic
    for strings) reachable from `node`.  Isolated nodes appear iff they
    appear in `edges` (self-loops allowed).

    Dispatches: driver-side union-find for small edge sets,
    alternating large-star/small-star at scale (see module
    docstring)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).persist()
    n_edges = e.count()
    try:
        if n_edges == 0:
            return edges.sparkSession.createDataFrame(
                [], "node string, component string"
            )
        if n_edges <= _DRIVER_MAX_EDGES:
            return _components_driver(e, "a", "b")
        return connected_components_star(e, "a", "b", max_iter)[0]
    finally:
        e.unpersist()


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star; returns (labels, rounds).

    Per round (both phases are one shuffle each):
      large-star: every node u connects its LARGER neighbors to
                  m(u) = min(Γ(u) ∪ {u});
      small-star: every node u connects its smaller neighbors (and
                  itself) to the min of those.
    The edge set converges to stars rooted at component minima in
    O(log n) rounds (paper: O(log² n) worst case, log n observed)."""
    spark = edges.sparkSession
    universe = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # convergence fingerprint: (count, xor of pair hashes) — two scalars
    def _fp(df: DataFrame):
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    rounds = 0
    fp = _fp(e)
    for _ in range(max_iter):
        rounds += 1
        # -- large-star: symmetrize, m(u) = min(neighbors ∪ self),
        #    emit (larger neighbor, m)
        nbrs = e.select("u", "v").unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = nbrs.groupBy("u").agg(F.min("v").alias("_mv")).select(
            "u", F.least(F.col("_mv"), F.col("u")).alias("m")
        )
        large = (
            nbrs.join(m, on="u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # -- small-star: key every edge by its larger endpoint,
        #    m = min(smaller neighbors); emit (each smaller nbr, m) and (u, m)
        keyed = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m2 = keyed.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            keyed.join(m2, on="u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m2.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_fp = _fp(small)
        e = small
        if new_fp == fp:
            break
        fp = new_fp
    # converged: edges are (node, component-min) stars
    labels = (
        universe.join(e, universe["node"] == e["u"], "left")
        .select("node", F.coalesce(F.col("v"), F.col("node")).alias("component"))
    )
    universe.unpersist()
    return labels, rounds


def connected_components_labelprop(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Min-label propagation (O(diameter) rounds) — small-input fast path."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    # AQE (with canChangeCachedPlanOutputPartitioning, see session.py)
    # right-sizes the cached post-distinct layout, so every round's map
    # over `sym` is data-proportional with no manual resize
    if sym.count() == 0:
        sym.unpersist()
        return edges.sparkSession.createDataFrame([], "node string, component string")

    # round 0 seeds each node with min(itself, direct neighbors) — one
    # aggregation instead of a pure-identity start saves a full round
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("_min_nbr"))
        .select("node", F.least(F.col("node"), F.col("_min_nbr")).alias("component"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(sym["a"].alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = labels.join(neighbor_min, on="node", how="left").select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_min"), F.col("component")),
            ).alias("new_component"),
            F.col("component").alias("old_component"),
        )
        # localCheckpoint EVERY round: the run cost of the extra job is
        # milliseconds, while letting the logical plan nest join-upon-join
        # makes the driver's single-threaded Catalyst re-analysis the
        # bottleneck within a handful of rounds (measured: job time ~30 ms,
        # plan analysis seconds once the tree is a few rounds deep)
        updated = updated.localCheckpoint(eager=True)
        changed = not updated.filter(
            F.col("new_component") != F.col("old_component")
        ).isEmpty()
        labels = updated.select("node", F.col("new_component").alias("component"))
        if not changed:
            break

    sym.unpersist()
    return labels
