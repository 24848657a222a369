"""bench.py crash isolation: one throwing query must never blank the
timings of the healthy ones (the round-2 failure mode — the last query
in the list StackOverflowed the JVM-side plan and the whole artifact
was lost)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import run_bench  # noqa: E402


def test_one_throwing_query_does_not_blank_artifact(spark, sf_dir):
    def ok_query(s, d):
        return s.range(10).select(F.col("id"))

    def plan_time_boom(s, d):
        raise RuntimeError("deliberate plan-time failure")

    queries = {
        "good_a": ok_query,
        "boom_plan": plan_time_boom,
        "good_b": ok_query,
    }
    payload = run_bench(spark, sf_dir, queries, ["good_a", "boom_plan", "good_b"])
    assert set(payload["queries"]) == {"good_a", "good_b"}
    assert "boom_plan" in payload["errors"]
    assert "RuntimeError" in payload["errors"]["boom_plan"]
    assert payload["value"] == round(sum(payload["queries"].values()), 3)


def test_missing_query_names_are_skipped(spark, sf_dir):
    payload = run_bench(spark, sf_dir, {}, ["nope"])
    assert payload["queries"] == {}
    assert "errors" not in payload
