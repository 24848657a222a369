"""Dump .explain('formatted') for registry keys to plans/r12/<key>_<tag>.txt.

Usage: python examples/dump_plans_r12.py <tag> <key> [<key> ...]
Runs under a default SparkSession (driver-contract conditions) at sf0.01.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2:]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"plans-{tag}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    qs = m.queries()
    sf = "/root/testdata/sf0.01"
    os.makedirs("plans/r12", exist_ok=True)
    for key in keys:
        df = qs[key](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = f"plans/r12/{key}_{tag}.txt"
        with open(out, "w") as fh:
            fh.write(plan)
        print(out, len(plan.splitlines()), "lines")
    spark.stop()


if __name__ == "__main__":
    main()
