"""Benchmark harness — ONE JSON line on stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32).
`value` is total wall-clock seconds across headline queries; the
`extra` block carries the KG-pipeline throughput (pages/sec and
triples/sec, the BASELINE.json metric) measured over the synthetic
pages corpus at a size proportional to SF.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _loadavg() -> list[float]:
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def _steal_jiffies() -> int:
    """Cumulative CPU-steal jiffies (field 8 of /proc/stat cpu line) —
    the only guest-visible signal of host co-tenancy. NOTE: this box
    shows steal <0.5% even during 4× slowdowns, so loadavg + per-rep
    wall-clock timestamps are the primary noise evidence; steal is the
    corroborating lower bound."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[8]) if len(parts) > 8 else 0


#: steal-jiffies per wall-second above which a bench window is
#: adjudged noisy.  Calibration from the recorded official runs: clean
#: windows show ~0.7-2.1 jiffies/s (r4 official: 87 over 41.4 s; the
#: r3 confirmation run: 1219 over a ~2 min A/B), noisy windows ≥80
#: jiffies/s (9304/109.6 s, 17592/~150 s — the runs whose minhash
#: times tracked steal 3-4× over steady).  25 jiffies/s = 0.25 CPU
#: continuously stolen, comfortably between the two populations.
NOISY_STEAL_RATE = 25.0


def is_noisy(steal_delta: int, wall_sec: float, rate: float = NOISY_STEAL_RATE) -> bool:
    """True when the window's steal rate marks it co-tenant-noisy —
    a dirty window must never silently become the official number
    (round-4 verdict, brief #8)."""
    return wall_sec > 0 and steal_delta / wall_sec > rate


def _warm_up(spark, cpus: int) -> None:
    """JMH-style untimed warm-up of engine INFRASTRUCTURE only:
    the python worker pool (one numpy import per worker), the Arrow
    serialization paths (scalar long / array<long>), and the JVM JIT
    of the python-runner stage shapes (pandas-UDF + posexplode,
    mapInPandas).  Measured on this box: the first execution of an
    ArrowEvalPython stage shape costs ~5-7 s of one-time JIT that a
    long-running cluster pays once per executor lifetime — exactly the
    cost a steady-state benchmark should exclude.  The warm-up runs on
    synthetic `spark.range` data and shares NO input data, logical
    plans, or cache entries with the timed queries below; every query
    still pays its own Catalyst analysis and whole-stage codegen.

    NOTE: the module-level `import pandas as pd` is load-bearing — the
    pandas_udf string annotations below resolve against module globals
    (PEP 563 via `from __future__ import annotations`)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _w1(x: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.asarray(x) * 1)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _w2(xs: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series([np.asarray(v) + 1 for v in xs])

    base = spark.range(0, 4 * cpus, 1, cpus)
    base.select(F.sum(_w1("id"))).collect()
    arr = base.select(F.array("id", "id").alias("a"))
    arr.select(F.posexplode(_w2("a"))).count()

    def _identity(it):
        yield from it

    base.mapInPandas(_identity, "id long").count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    import __spark_entry__ as entry
    from rdf_knowledge_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    _warm_up(spark, cpus)

    qs = entry.queries()
    headline = [
        "kg_dedup_first",
        "kg_insert_new",
        "kg_stats",
        "kg_sparql_bgp",
        "kg_ntriples_strict",
        "dedup_exact",
        # dedup_ngram_jaccard (exact pairwise) is the small-SF oracle
        # baseline only — at scale the MinHash-LSH path below is the
        # representative fuzzy-dedup operator
        "dedup_minhash_lsh",
        "ann_cosine_topk",
        "text_quality",
        "events_sessions",
        "tpch_q1",
        "tpch_q3ish",
    ]

    # KG pipeline config (throughput measured inside _measure)
    from rdf_knowledge_extractor_spark.config import Configuration, RdfSchema
    from rdf_knowledge_extractor_spark.functions.extract import (
        extract_triples_stage,
        split_triples_and_lineage,
    )
    from rdf_knowledge_extractor_spark.operators.canonicalize import canonicalize_triples
    from rdf_knowledge_extractor_spark.operators.dedup import merge_results
    from rdf_knowledge_extractor_spark.operators.linking import link_entities
    from rdf_knowledge_extractor_spark.sources.pages import pages_dataframe

    n_pages = max(int(20000 * sf), 200)
    cfg = Configuration(
        name="bench",
        rdf_schema=RdfSchema(
            namespace="http://business.example.org/ontology#",
            prefix="biz",
            base_uri="http://business.example.org/resource/",
            predicates={
                p: p
                for p in ["hasName", "hasRole", "worksFor", "locatedIn", "partneredWith"]
            },
        ),
    )
    pages = pages_dataframe(spark, n_pages, seed=42, num_partitions=cpus * 2).drop("text")

    def _measure() -> dict:
        """One full measurement pass: headline queries (min-of-2) +
        pipeline throughput (min-of-2), with its own noise window.

        Two repetitions per query, report the MIN.  This VM shows ±40%
        (occasionally 4×) run-to-run wall-clock swings from host-level
        interference the guest cannot observe.  That noise is strictly
        additive, so min is the standard estimator.
        spark.catalog.clearCache() between reps drops every persisted
        intermediate — rep 2 re-reads, re-shuffles and re-executes
        every UDF; only JVM JIT stays warm, which is the steady state
        _warm_up already targets."""
        bench_t0 = time.monotonic()
        load_start, steal_start = _loadavg(), _steal_jiffies()
        reps: dict[str, list[float]] = {name: [] for name in headline}
        rep_stamps: dict[str, list[float]] = {name: [] for name in headline}
        for _rep in range(2):
            for name in headline:
                t0 = time.monotonic()
                df = qs[name](spark, sf_dir)
                n = df.count()  # force full execution
                reps[name].append(round(time.monotonic() - t0, 3))
                # offset of each rep's start from bench start: lets a
                # reader correlate a slow rep with a load spike window
                rep_stamps[name].append(round(t0 - bench_t0, 1))
                _ = n
            spark.catalog.clearCache()
        times: dict[str, float] = {name: min(r) for name, r in reps.items()}

        # same min-of-2 policy; the input is re-persisted untimed
        # before each rep (clearCache dropped it), so every rep re-runs
        # extraction, linking and canonicalization from scratch
        pipeline_runs: list[float] = []
        n_triples = 0
        for _rep in range(2):
            p = pages.persist()
            p.count()  # materialize input outside the timed window
            t0 = time.monotonic()
            # html→text→extract fused in one mapInPandas (single Arrow crossing)
            extracted = extract_triples_stage(p, cfg, client_kind="stub", html_col="html")
            triples, _ = split_triples_and_lineage(extracted)
            triples = triples.persist()
            merged = merge_results(triples)
            mapping = link_entities(merged)
            graph = canonicalize_triples(merged, mapping)
            n_triples = graph.count()
            pipeline_runs.append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
        pipeline_sec = min(pipeline_runs)
        reps["kg_pipeline_full"] = pipeline_runs
        times["kg_pipeline_full"] = round(pipeline_sec, 3)

        wall = round(time.monotonic() - bench_t0, 1)
        steal = _steal_jiffies() - steal_start
        return {
            "times": times,
            "reps": reps,
            "pipeline_sec": pipeline_sec,
            "n_triples": n_triples,
            # noise evidence (VERDICT r3 item 1b): loadavg before/after,
            # cumulative steal delta over the run, and each rep's start
            # offset (sec from bench start) so a slow rep can be
            # matched against the load window it ran in
            "noise": {
                "loadavg_start": load_start,
                "loadavg_end": _loadavg(),
                "steal_jiffies_delta": steal,
                "bench_wall_sec": wall,
                "rep_start_offsets": rep_stamps,
                "noisy": is_noisy(steal, wall),
            },
        }

    # Self-defense (round-4 brief #8): a window whose steal rate marks
    # it noisy retries ONCE; the attempt with the lower steal rate
    # becomes the official number, and every attempt's noise block is
    # kept so a dirty window can never silently become official.
    attempts = [_measure()]
    if attempts[0]["noise"]["noisy"] and os.environ.get("SPARK_GRAFT_NOISE_RETRY", "1") != "0":
        attempts.append(_measure())
    best = min(
        attempts,
        key=lambda a: a["noise"]["steal_jiffies_delta"] / max(a["noise"]["bench_wall_sec"], 1e-9),
    )

    times, pipeline_sec, n_triples = best["times"], best["pipeline_sec"], best["n_triples"]
    total = round(sum(times.values()), 3)
    result = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "extra": {
            "pipeline_pages": n_pages,
            "pipeline_triples": n_triples,
            "pages_per_sec": round(n_pages / pipeline_sec, 1),
            "triples_per_sec": round(n_triples / pipeline_sec, 1),
            "cpus": cpus,
            "query_reps": best["reps"],  # all repetitions behind each min
            "noise": best["noise"],
            "noisy": best["noise"]["noisy"],
            "noise_attempts": [a["noise"] for a in attempts],
        },
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
