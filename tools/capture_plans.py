"""Capture `.explain("formatted")` for every declared query and flag
plan antipatterns (guide §7.2): duplicated Python UDF evaluation,
cartesian products, unexpected exchange counts.

Usage:
  python tools/capture_plans.py <out_dir> [sf_dir] [query ...]

Writes <out_dir>/<query>.txt and prints a one-line summary per query:
  name  exchanges=N  arrowEval=N  batchEval=N  cartesian=N  flags
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from rdf_knowledge_extractor_spark.session import get_spark

    spark = get_spark(app_name="capture-plans", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            p = buf.getvalue()
        except Exception as e:  # plan-time failure is itself a finding
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
            continue
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(p)
        ex = p.count("Exchange (")
        ae = p.count("ArrowEvalPython (")
        be = p.count("BatchEvalPython (")
        cp = p.count("CartesianProduct")
        flags = []
        # two ArrowEvalPython nodes directly stacked = duplicated UDF
        if "+- ArrowEvalPython" in p and "ArrowEvalPython" in p:
            lines = p.splitlines()
            for i, ln in enumerate(lines[:-1]):
                if "ArrowEvalPython" in ln and "ArrowEvalPython" in lines[i + 1]:
                    flags.append("stacked-arrow-eval")
                    break
        if cp:
            flags.append("cartesian")
        if be:
            flags.append("batch-eval-python")
        print(f"{name:28s} exchanges={ex:2d} arrowEval={ae} batchEval={be} "
              f"cartesian={cp} {' '.join(flags)}")
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
