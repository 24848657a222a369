"""Round-12 optimization profiler: per-query wall time + per-job
breakdown via the Spark UI REST API + formatted plan capture.

Usage:
    python examples/profile_r12.py q1 q2 ...        # profile queries
    python examples/profile_r12.py --plan-dir plans/r12 --suffix _before q1

For each query: build the DataFrame (staging side effects included),
optionally dump .explain("formatted") to <plan-dir>/<name><suffix>.txt,
run it through the noop sink (same timed action as bench.py), then list
the Spark jobs that ran with their durations/descriptions so the time
is attributable to plan pieces (guide section 1/7.1).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
import urllib.request
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rest(app_url: str, path: str):
    """Best-effort UI poll: a busy driver can starve the UI thread past
    the timeout — degrade to an empty job list, never crash the run."""
    try:
        with urllib.request.urlopen(app_url + path, timeout=30) as r:
            return json.loads(r.read())
    except Exception as exc:  # noqa: BLE001
        print(f"  (ui poll failed: {exc})")
        return []


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plan_dir = None
    suffix = ""
    runs = 1
    while args and args[0].startswith("--"):
        if args[0] == "--plan-dir":
            plan_dir = args[1]
            args = args[2:]
        elif args[0] == "--suffix":
            suffix = args[1]
            args = args[2:]
        elif args[0] == "--runs":
            runs = int(args[1])
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    names = args

    from pyspark.sql import SparkSession

    from bb_bigdata_log_tools_spark.registry import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("profile-r12")
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

    # same warm-up protocol as bench.py
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
            spark.sparkContext.setJobDescription(f"{name}#{run_i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            if plan_dir and run_i == 0:
                os.makedirs(plan_dir, exist_ok=True)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(
                    os.path.join(plan_dir, f"{name}{suffix}.txt"), "w"
                ) as f:
                    f.write(buf.getvalue())
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.perf_counter() - t1
            spark.sparkContext.setJobDescription(None)
            jobs = [
                j
                for j in rest(app_url, "/jobs")
                if j["jobId"] not in jobs_before
            ]
            jobs.sort(key=lambda j: j["jobId"])
            print(
                f"\n=== {name} run{run_i}: build={t_build:.2f}s "
                f"exec={t_exec:.2f}s total={t_build + t_exec:.2f}s "
                f"jobs={len(jobs)}"
            )
            for j in jobs:
                sub = time.strptime(
                    j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"
                )
                comp = time.strptime(
                    j.get("completionTime", j["submissionTime"])[:19],
                    "%Y-%m-%dT%H:%M:%S",
                )
                # sub-second resolution from the GMT fields
                ms = lambda s, raw: time.mktime(s) + float(raw[20:23] or 0) / 1000  # noqa: E731
                dur = ms(comp, j.get("completionTime", "")) - ms(
                    sub, j["submissionTime"]
                )
                print(
                    f"  job {j['jobId']:>4} {dur:7.2f}s "
                    f"tasks={j['numCompletedTasks']:>5} "
                    f"{j['name'][:80]}"
                )
    spark.stop()


if __name__ == "__main__":
    main()
