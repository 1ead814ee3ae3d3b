"""Two-parallelism scaling benchmark (BASELINE.md protocol).

Runs the identical full KG pipeline (html→text → extract → dedup →
link → canonicalize) on the same deterministic input at local[N] and
local[4N], measuring pipeline wall-clock (JVM startup and input
generation excluded) and reporting throughput + scaling efficiency
eff = (R_4N / R_N) / 4.

Usage: python tools/scaling_bench.py [n_pages] [low_cpus]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from rdf_knowledge_extractor_spark.session import get_spark
from rdf_knowledge_extractor_spark.config import Configuration, RdfSchema
from rdf_knowledge_extractor_spark.sources.pages import pages_dataframe_distributed
from rdf_knowledge_extractor_spark.functions.html_text import with_extracted_text
from rdf_knowledge_extractor_spark.functions.extract import extract_triples_stage, split_triples_and_lineage
from rdf_knowledge_extractor_spark.operators.dedup import merge_results
from rdf_knowledge_extractor_spark.operators.linking import link_entities
from rdf_knowledge_extractor_spark.operators.canonicalize import canonicalize_triples

cpus = {cpus}
n_pages = {n_pages}
spark = get_spark(app_name=f"scale-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=16,
                  extra_conf={{"spark.local.dir": "/dev/shm/spark-local"}})
spark.sparkContext.setLogLevel("ERROR")

cfg = Configuration(
    name="scaling-bench",
    rdf_schema=RdfSchema(
        namespace="http://business.example.org/ontology#", prefix="biz",
        base_uri="http://business.example.org/resource/",
        predicates={{p: p for p in
            ["hasName", "hasRole", "worksFor", "locatedIn", "partneredWith"]}},
    ),
)

# input materialized ONCE to tmpfs parquet (outside the timed window)
# and shared verbatim by both parallelism levels — the pipeline reads
# it like the production Iceberg table; no in-memory persist of the
# raw html, so no cache-eviction noise between runs
import os
input_path = f"/dev/shm/scaling_pages_{{n_pages}}"
if not os.path.exists(input_path + "/_SUCCESS"):
    pages_dataframe_distributed(spark, n_pages, seed=42,
                                num_partitions=max(cpus * 3, 48),
                                n_filler=20).write.mode("overwrite").parquet(input_path)
pages = spark.read.parquet(input_path)
n_in = pages.count()
in_bytes = pages.selectExpr("sum(length(html))").collect()[0][0]

# WARM-UP (untimed): run the full pipeline once on a tiny page set so
# the measured window sees steady state — first execution pays one-time
# JVM codegen/JIT and Python-worker spawn costs (~25 s measured) that
# are identical at every parallelism level and would otherwise read as
# a fake serial fraction
warm = pages_dataframe_distributed(spark, 300, seed=7, num_partitions=4)
wx = extract_triples_stage(warm, cfg, client_kind="stub", html_col="html")
wtr, _ = split_triples_and_lineage(wx)
wm = merge_results(wtr).persist()
wm.count()
canonicalize_triples(wm, link_entities(wm)).count()
wm.unpersist()
# warm the training-data operator plan shapes too (curate's
# detect_language case-expression alone costs ~30 s of codegen on
# first compile — identical at every parallelism level)
from pyspark.sql import functions as F
from rdf_knowledge_extractor_spark.operators.curation import (
    curate_corpus, rollup_report)
from rdf_knowledge_extractor_spark.operators.asof import asof_join
from rdf_knowledge_extractor_spark.functions.text_analysis import detect_language
from rdf_knowledge_extractor_spark.functions.html_text import with_extracted_text
wdocs = (
    with_extracted_text(warm, html_col="html", out_col="text")
    .select(
        F.col("doc_seq").alias("doc_id"), "text",
        F.substring_index(F.substring_index("url", "/", 3), "/", -1).alias("source"),
    ).persist()
)
curate_corpus(wdocs, lang="en", min_words=5).count()
rollup_report(
    wdocs.select(detect_language(F.col("text")).alias("lang"), "source",
                 F.length("text").alias("n_chars"))
).count()
wbase = wdocs.select("doc_id", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(50)).alias("user"))
asof_join(
    wbase.filter(F.pmod("doc_id", F.lit(4)) == 0).select(
        F.col("doc_id").alias("purchase_id"), "user",
        F.timestamp_seconds(F.lit(1700000000) + F.pmod(F.col("doc_id") * 53 + 7, F.lit(86400))).alias("ts")),
    wbase.select("user",
        F.timestamp_seconds(F.lit(1700000000) + F.pmod(F.col("doc_id") * 37, F.lit(86400))).alias("ts"),
        F.col("doc_id").alias("click_id")),
    on="user", ts_col="ts",
).count()
wdocs.unpersist()

def _cpu_stat():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return sum(vals), vals[7] if len(vals) > 7 else 0  # (total, steal)

stage_times = {{}}
_tot0, _steal0 = _cpu_stat()
t0 = time.monotonic()

# html→text and triple extraction run FUSED INSIDE ONE UDF
# (html_col=...): raw html crosses the Arrow boundary once, only
# triple rows cross back; the one big intermediate (extracted triples)
# goes DISK_ONLY on the tmpfs-backed local dir — stable across
# parallelism levels, no eviction noise
from pyspark import StorageLevel

t = time.monotonic()
extracted = extract_triples_stage(
    pages, cfg, client_kind="stub", html_col="html"
).persist(StorageLevel.DISK_ONLY)
extracted.count()
stage_times["s12_text_extract"] = round(time.monotonic() - t, 2)

t = time.monotonic()
triples, _ = split_triples_and_lineage(extracted)
merged = merge_results(triples).persist()
n_merged = merged.count()
stage_times["s3_dedup"] = round(time.monotonic() - t, 2)

t = time.monotonic()
mapping = link_entities(merged).persist()
mapping.count()
stage_times["s4_link"] = round(time.monotonic() - t, 2)

t = time.monotonic()
graph = canonicalize_triples(merged, mapping)
n_triples = graph.count()
stage_times["s5_canonicalize"] = round(time.monotonic() - t, 2)

# training-data operator families (round-2 verdict: the scaling gate
# must cover curation/rollup/as-of, not just extract→link) — same
# corpus, deterministic derived tables, all inside the timed window
from pyspark.sql import functions as F
from rdf_knowledge_extractor_spark.operators.curation import (
    curate_corpus, rollup_report)
from rdf_knowledge_extractor_spark.operators.asof import asof_join
from rdf_knowledge_extractor_spark.functions.text_analysis import detect_language
from rdf_knowledge_extractor_spark.functions.html_text import with_extracted_text

t = time.monotonic()
docs = (
    with_extracted_text(pages, html_col="html", out_col="text")
    .select(
        F.col("doc_seq").alias("doc_id"),
        "text",
        F.substring_index(F.substring_index("url", "/", 3), "/", -1).alias("source"),
    )
    .persist(StorageLevel.DISK_ONLY)
)
n_curated = curate_corpus(docs, lang="en", min_words=5).count()
stage_times["s6_curate"] = round(time.monotonic() - t, 2)

t = time.monotonic()
docs2 = docs.select(
    detect_language(F.col("text")).alias("lang"),
    "source",
    F.length("text").alias("n_chars"),
)
rollup_report(docs2).count()
stage_times["s7_rollup"] = round(time.monotonic() - t, 2)
docs.unpersist()

# Event tables come from COLUMNAR storage (the tmpfs parquet input),
# not the full-text row cache: in production events live in their own
# parquet/Iceberg table, and the as-of hot-key probe's extra pass then
# prunes to the key column (ReadSchema asserted in
# tests/test_asof.py::test_asof_probe_scan_prunes_to_keys).  Deriving
# them from `docs` (DISK_ONLY, text column) forced every scan —
# including the probe — to deserialize full rows.
t = time.monotonic()
base = pages.select(
    F.col("doc_seq").alias("doc_id"),
    F.pmod(F.xxhash64(F.col("doc_seq")), F.lit(5000)).alias("user"),
)
clicks = base.select(
    "user",
    F.timestamp_seconds(
        F.lit(1700000000) + F.pmod(F.col("doc_id") * 37, F.lit(86400))
    ).alias("ts"),
    F.col("doc_id").alias("click_id"),
)
purchases = base.filter(F.pmod("doc_id", F.lit(4)) == 0).select(
    F.col("doc_id").alias("purchase_id"),
    "user",
    F.timestamp_seconds(
        F.lit(1700000000) + F.pmod(F.col("doc_id") * 53 + 7, F.lit(86400))
    ).alias("ts"),
)
asof_join(purchases, clicks, on="user", ts_col="ts").count()
stage_times["s8_asof"] = round(time.monotonic() - t, 2)

elapsed = time.monotonic() - t0
_tot1, _steal1 = _cpu_stat()
steal_pct = round(100.0 * (_steal1 - _steal0) / max(_tot1 - _tot0, 1), 2)
print("RESULT " + json.dumps({{
    "steal_pct": steal_pct,
    "cpus": cpus, "n_pages": n_in, "input_bytes": int(in_bytes),
    "n_triples": n_triples, "elapsed_sec": round(elapsed, 2),
    "pages_per_sec": round(n_in / elapsed, 2),
    "triples_per_sec": round(n_triples / elapsed, 2),
    "stages": stage_times,
    "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
}}))
spark.stop()
"""


def run_one(cpus: int, n_pages: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = WORKER.format(repo=repo, cpus=cpus, n_pages=n_pages)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=repo
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main():
    """Alternating paired protocol: legs run interleaved
    (low, high, low, high, …) so each pair (low_i, high_i) sees the
    same co-tenant load window; paired efficiencies cancel slow load
    drift.  Reported: the MEDIAN of paired efficiencies (headline) and
    the best-leg efficiency (engine capability); every run listed."""
    import statistics

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    high = low * 4

    lows, highs, paired = [], [], []
    for i in range(repeats):
        lows.append(run_one(low, n_pages))
        highs.append(run_one(high, n_pages))
        paired.append(
            round(
                (highs[-1]["triples_per_sec"] / lows[-1]["triples_per_sec"])
                / (high / low),
                3,
            )
        )
        print(f"pair {i}: low={lows[-1]['elapsed_sec']}s "
              f"(steal {lows[-1].get('steal_pct')}%) "
              f"high={highs[-1]['elapsed_sec']}s "
              f"(steal {highs[-1].get('steal_pct')}%) eff={paired[-1]}",
              file=sys.stderr)
    r_low = max(lows, key=lambda r: r["triples_per_sec"])
    r_high = max(highs, key=lambda r: r["triples_per_sec"])
    r_low["all_runs_sec"] = [r["elapsed_sec"] for r in lows]
    r_high["all_runs_sec"] = [r["elapsed_sec"] for r in highs]
    eff_best = (r_high["triples_per_sec"] / r_low["triples_per_sec"]) / (high / low)
    eff_median = statistics.median(paired)
    report = {
        "metric": "scaling_efficiency",
        "value": round(eff_median, 3),
        "unit": "ratio",
        "paired_efficiencies": paired,
        "best_leg_efficiency": round(eff_best, 3),
        "low": r_low,
        "high": r_high,
        "target": 0.8,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(_markdown(report, low, high, n_pages, repeats))
    print(json.dumps(report))


def _markdown(report, low, high, n_pages, reps=3):
    rl, rh = report["low"], report["high"]

    def row(r):
        return (
            f"| local[{r['cpus']}] | {r['n_pages']} | {r['input_bytes']:,} | "
            f"{r['n_triples']} | {r['elapsed_sec']} | {r['pages_per_sec']} | "
            f"{r['triples_per_sec']} | {r['shuffle_partitions']} |"
        )

    stages = "\n".join(
        f"| {k} | {rl['stages'][k]} | {rh['stages'][k]} |" for k in rl["stages"]
    )
    return f"""# BENCH — two-parallelism scaling run (sandbox protocol)

Same job, same input ({n_pages} deterministic synthetic pages,
seed 42), two parallelism levels on one 32-core box.  Pipeline
stages: html→text UDF → micro-batched triple extraction →
first-occurrence dedup → MinHash-LSH entity linking + connected
components → canonicalize, PLUS the training-data operator families
(corpus curation gate, grouping-sets rollup report, as-of event
attribution) over tables derived from the same corpus.  Input
generation and JVM startup excluded from the timed window.

| config | pages | input bytes | triples | wall sec | pages/s | triples/s | shuffle parts |
|---|---|---|---|---|---|---|---|
{row(rl)}
{row(rh)}

**Scaling efficiency (median of paired runs)** = **{report['value']}**
(target ≥ 0.8).  Paired efficiencies (legs interleaved low/high so
each pair shares a co-tenant load window): {report['paired_efficiencies']}.
Best-leg efficiency = (R_{high} / R_{low}) / ({high}/{low}) =
({rh['triples_per_sec']} / {rl['triples_per_sec']}) / 4 =
{report['best_leg_efficiency']}.

## Per-stage wall-clock (sec)

| stage | local[{low}] | local[{high}] |
|---|---|---|
{stages}

## Config

- AQE on (coalescePartitions + skewJoin + parallelismFirst=false +
  canChangeCachedPlanOutputPartitioning), Arrow pandas UDFs on
- shuffle partitions fixed at 16 for BOTH levels (the protocol varies
  CORES, not partitioning); input pre-partitioned 48-way, written once
  to tmpfs parquet and read identically by both runs; big
  intermediates persist DISK_ONLY (no cache-eviction noise)
- N={low}, 4N={high} chosen after measuring this VM's per-core
  throughput curve (multiprocessing burn): 1.03@1, 0.98@2, 0.87@4,
  0.89@8, 0.78@16, ~0.45@32 workers — i.e. the BOX cannot deliver 4×
  from 8→32 cores for any code (hardware ceiling ≈ 0.5); the 1→4 range
  has a ≈0.9 ceiling and isolates the ENGINE's scaling behavior, which
  is what the criterion measures. On a real multi-node cluster each
  executor brings its own memory bandwidth, so single-box contention
  understates cluster scaling.
- no salting needed at this corpus (no hot head entity); skew handling
  verified separately in tests (oversized-LSH-bucket drop + AQE)
- html→text and extraction fused in ONE mapInPandas (html crosses the
  Arrow boundary once; only triple rows cross back)
- s8's event tables derive from the COLUMNAR parquet input, so every
  scan — including the as-of hot-key probe's default-on extra pass —
  prunes to the key column (asserted by
  tests/test_asof.py::test_asof_probe_scan_prunes_to_keys).  Round-5
  fix: they previously derived from the DISK_ONLY docs row cache
  (full text column), which cannot column-prune and inflated
  s8_asof to 5.34 s at local[1] — a harness artifact, not probe cost.
- sandbox noise: the VM shows ±70% run-to-run wall-clock swings
  (co-tenant CPU steal); legs are interleaved {reps}× and the MEDIAN
  of per-pair efficiencies is the headline (pairing cancels slow load
  drift); all wall-clocks: local[{low}] = {rl.get('all_runs_sec')},
  local[{high}] = {rh.get('all_runs_sec')}
"""


if __name__ == "__main__":
    main()
