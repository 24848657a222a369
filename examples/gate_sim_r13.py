"""Gate-condition simulator: run named registry keys the way the
driver's correctness gate does — a DEFAULT SparkSession (local[8], no
get_spark() tuning, shuffle.partitions left at 200) at sf0.01 — time
each key, and compare against its DuckDB oracle.

Usage: python examples/gate_sim_r13.py [--repo DIR] key1 key2 ...
"""

from __future__ import annotations

import math
import os
import sys
import time


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else f"{v:.6g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> None:
    args = sys.argv[1:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args and args[0] == "--repo":
        repo = args[1]
        args = args[2:]
    sys.path.insert(0, repo)
    names = args

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("gate-sim-r13")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")
    import __spark_entry__ as m

    qs, osql = m.queries(), m.oracle_sql()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    for key in names:
        t0 = time.perf_counter()
        try:
            sdf = qs[key](spark, sf)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"{key}: ERROR {type(exc).__name__}: {exc}"[:300])
            continue
        dt = time.perf_counter() - t0
        if key not in osql:
            print(f"{key}: {dt:6.2f}s rows={len(srows)} (no oracle)")
            continue
        res = con.execute(osql[key])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok = (
            sorted(sdf.columns) == sorted(dcols)
            and len(srows) == len(drows)
            and norm(srows, sdf.columns) == norm(drows, dcols)
        )
        print(
            f"{key}: {dt:6.2f}s rows={len(srows)} "
            f"{'MATCH' if ok else 'MISMATCH'}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
