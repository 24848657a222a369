"""Driver-contract oracle check for a named subset of keys.

Usage: python examples/verify_keys.py [--sf /root/testdata/sf0.01] key1 key2 ...

Mirrors the external driver: a DEFAULT SparkSession (local[8], no
get_spark() tuning), every key's DataFrame collected and compared to
its DuckDB oracle with the strict column check.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    names = args

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    def norm(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(
            tuple(
                f"{r[i]:.6g}" if isinstance(r[i], float) else str(r[i])
                for i in order
            )
            for r in rows
        )

    qs, osql = m.queries(), m.oracle_sql()
    bad = 0
    for key in names:
        try:
            sdf = qs[key](spark, sf)
            srows = [tuple(r) for r in sdf.collect()]
            if key not in osql:
                print(key, "rows:", len(srows), "(no oracle)")
                continue
            res = con.execute(osql[key])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            cols_ok = sorted(sdf.columns) == sorted(dcols)
            ok = (
                cols_ok
                and norm(srows, sdf.columns) == norm(drows, dcols)
                and len(srows) == len(drows)
            )
            print(
                key, "rows:", len(srows),
                "MATCH" if ok else
                f"MISMATCH(cols_ok={cols_ok} oracle_rows={len(drows)})",
            )
            if not ok or len(srows) == 0:
                bad += 1
        except Exception as exc:  # noqa: BLE001
            print(key, "ERROR", f"{type(exc).__name__}: {exc}"[:300])
            bad += 1
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
