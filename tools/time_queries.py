"""Time a subset of declared queries bench-style (min-of-N, cache
cleared between reps, bench warm-up) without running the whole frozen
bench.  Measurement aid for optimization A/Bs (guide §1).

Usage:
    SPARK_GRAFT_SF_DIR=... python tools/time_queries.py q1 q2 ...
    (-r N for reps, default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 2
    if "-r" in args:
        i = args.index("-r")
        reps = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import bench
    import __spark_entry__ as entry
    from rdf_knowledge_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="time-queries",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench._warm_up(spark, cpus)
    qs = entry.queries()
    out: dict[str, list[float]] = {}
    for name in args:
        spark.sparkContext.setJobDescription(name)
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            n = qs[name](spark, sf_dir).count()
            ts.append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
        out[name] = ts
        print(json.dumps({"q": name, "min": min(ts), "reps": ts, "rows": n}), flush=True)
    spark.stop()
    print(json.dumps({k: min(v) for k, v in out.items()}))


if __name__ == "__main__":
    main()
