"""Isolated A/B of the session codegen-sizing pair (VERDICT r3 item 1a).

Runs ONE conf combo per process (fresh JVM — codegen conf changes the
generated source, so a shared JVM would mix compile caches) over the two
workloads the pair was tuned on:

- ``dedup_minhash_lsh``  (sketch path: pandas-UDF + banded self-join)
- ``text_quality``       (wide Catalyst text-metric projection)

Protocol per combo: infra warm-up, then for each query rep0 (cold,
plan-shape JIT) + 2 steady reps with ``clearCache()`` between.  Steady
metric = min of the 2 warm reps (additive-noise estimator, same policy
as bench.py).  /proc/loadavg is recorded before/after each combo so a
co-tenant noise window is visible in the output.

Usage:
    python tools/ab_codegen.py              # run all 4 combos, print table
    python tools/ab_codegen.py --combo pair # single combo (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

COMBOS = {
    "default": {},
    "huge_only": {"spark.sql.codegen.hugeMethodLimit": "8000"},
    "split_only": {"spark.sql.codegen.methodSplitThreshold": "512"},
    "pair": {
        "spark.sql.codegen.hugeMethodLimit": "8000",
        "spark.sql.codegen.methodSplitThreshold": "512",
    },
}
QUERIES = ["dedup_minhash_lsh", "text_quality"]
DEFAULT_CONF = {
    # Spark defaults the combos override; listed so "default" truly
    # resets what session.get_spark sets
    "spark.sql.codegen.hugeMethodLimit": "65535",
    "spark.sql.codegen.methodSplitThreshold": "1024",
}


def _loadavg() -> str:
    with open("/proc/loadavg") as f:
        return f.read().split()[0]


def run_combo(name: str) -> None:
    import __spark_entry__ as entry
    from rdf_knowledge_extractor_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    conf = dict(DEFAULT_CONF)
    conf.update(COMBOS[name])
    conf["spark.local.dir"] = "/dev/shm/spark-local"
    spark = get_spark(
        app_name=f"ab-{name}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf=conf,
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bench import _warm_up

    _warm_up(spark, cpus)
    qs = entry.queries()
    out: dict[str, object] = {"combo": name, "load_before": _loadavg()}
    for q in QUERIES:
        reps = []
        for _ in range(3):
            t0 = time.monotonic()
            qs[q](spark, sf_dir).count()
            reps.append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
        out[q] = {"cold": reps[0], "steady": min(reps[1:]), "reps": reps}
    out["load_after"] = _loadavg()
    spark.stop()
    print("ABRESULT " + json.dumps(out))


def main() -> None:
    if "--combo" in sys.argv:
        run_combo(sys.argv[sys.argv.index("--combo") + 1])
        return
    results = []
    for name in COMBOS:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--combo", name],
            capture_output=True,
            text=True,
            cwd=ROOT,
        )
        line = next(
            (l for l in p.stdout.splitlines() if l.startswith("ABRESULT ")), None
        )
        if line is None:
            print(f"{name}: FAILED\n{p.stderr[-2000:]}", file=sys.stderr)
            continue
        results.append(json.loads(line[len("ABRESULT ") :]))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
