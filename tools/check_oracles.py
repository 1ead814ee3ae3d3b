"""Local mirror of the driver's correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` on DuckDB
at the given SF, comparing row count, column-name set, and an
order-insensitive value hash (rows canonicalized to strings with
float rounding).  Usage:

    python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_value(v):
    import datetime
    import math

    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_value(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def value_hash(rows: list[dict]) -> str:
    import hashlib

    canon = sorted(
        "|".join(f"{c}={canon_value(r[c])}" for c in sorted(r)) for r in rows
    )
    return hashlib.sha256("\n".join(canon).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from rdf_knowledge_extractor_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        except Exception:
            pass

    spark = get_spark(app_name="oracle-check", master="local[8]")
    qs, oracles = entry.queries(), entry.oracle_sql()

    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: SPARK ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle) [{t_spark:.1f}s]")
            n_weak += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
            orows = odf.to_dict("records")
        except Exception as e:
            print(f"FAIL  {name}: ORACLE ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        scols, ocols = (
            sorted(srows[0]) if srows else sorted(sdf.columns),
            sorted(orows[0]) if orows else sorted(odf.columns),
        )
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if scols != ocols:
            problems.append(f"cols {scols} != {ocols}")
        if not problems and value_hash(srows) != value_hash(orows):
            problems.append("value-hash mismatch")
            # show a few differing rows
            sset = {"|".join(f"{c}={canon_value(r[c])}" for c in sorted(r)) for r in srows}
            oset = {"|".join(f"{c}={canon_value(r[c])}" for c in sorted(r)) for r in orows}
            for x in list(sset - oset)[:2]:
                problems.append(f"  spark-only: {x[:160]}")
            for x in list(oset - sset)[:2]:
                problems.append(f"  oracle-only: {x[:160]}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"pass  {name}: rows={len(srows)} [{t_spark:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
