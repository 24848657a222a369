"""Round-13 driver-gap profiler: per-query warm timing split into
job-covered time vs driver gap time (planning/py4j/AQE between jobs).

Usage: python examples/profile_gaps_r13.py [--runs N] q1 q2 ...

For each query, after a cold run, the warm runs report:
  total     wall clock of build+noop-save
  covered   union of [submission, completion] intervals of the jobs
  gap       total - covered  (driver-side: planning, py4j, AQE replanning)
  jobs      job count
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rest(app_url: str, path: str):
    try:
        with urllib.request.urlopen(app_url + path, timeout=30) as r:
            return json.loads(r.read())
    except Exception as exc:  # noqa: BLE001
        print(f"  (ui poll failed: {exc})")
        return []


def _ms(stamp: str) -> float:
    t = time.strptime(stamp[:19], "%Y-%m-%dT%H:%M:%S")
    return time.mktime(t) + float(stamp[20:23] or 0) / 1000


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    names = args

    from pyspark.sql import SparkSession

    from bb_bigdata_log_tools_spark.registry import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("profile-gaps-r13")
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    app_url = f"{ui}/api/v1/applications/{app_id}"

    try:
        QUERIES["log_cat"](spark, sf_dir).count()
        QUERIES["log_cat_by_time"](spark, sf_dir).count()
        spark.createDataFrame([(1,)], "x int").mapInPandas(
            lambda it: it, "x int"
        ).count()
    except Exception as exc:  # noqa: BLE001
        print("warmup error:", exc)

    for name in names:
        fn = QUERIES[name]
        for run_i in range(runs):
            jobs_before = {j["jobId"] for j in rest(app_url, "/jobs")}
            spark.sparkContext.setJobDescription(f"{name}#gap{run_i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            total = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            jobs = [
                j
                for j in rest(app_url, "/jobs")
                if j["jobId"] not in jobs_before and "completionTime" in j
            ]
            ivals = sorted(
                (_ms(j["submissionTime"]), _ms(j["completionTime"]))
                for j in jobs
            )
            covered = 0.0
            cur_s, cur_e = None, None
            for s, e in ivals:
                if cur_e is None or s > cur_e:
                    if cur_e is not None:
                        covered += cur_e - cur_s
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            if cur_e is not None:
                covered += cur_e - cur_s
            print(
                f"{name} run{run_i}: total={total:6.2f}s "
                f"covered={covered:6.2f}s gap={total - covered:6.2f}s "
                f"jobs={len(jobs)}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
