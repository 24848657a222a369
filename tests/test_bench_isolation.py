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


def test_emit_lines_every_line_small_and_parseable():
    """The driver's bounded tail capture must always contain complete
    parseable lines: summary first AND last, chunks bounded."""
    import json

    from bench import emit_lines

    payload = {
        "metric": "headline_queries_total_runtime",
        "value": 123.456,
        "unit": "sec",
        "queries": {f"q{i:03d}": round(0.1 * i, 3) for i in range(160)},
        "sf": 0.1,
        # worst case: most queries fail with long messages — errors
        # must chunk like timings, never one giant line
        "errors": {f"e{i:03d}": "RuntimeError: " + "x" * 480 for i in range(150)},
    }
    lines = emit_lines(payload)
    parsed = [json.loads(l) for l in lines]  # every line parses alone
    assert all(len(l) < 3000 for l in lines), max(len(l) for l in lines)
    assert parsed[0] == parsed[-1]
    assert parsed[0]["value"] == 123.456
    assert parsed[0]["queries"] == 160  # count, not the giant map
    assert parsed[0]["error_count"] == 150
    merged = {}
    merged_errors = {}
    for d in parsed:
        if "bench_part" in d:
            merged.update(d["queries"])
        if "bench_errors_part" in d:
            merged_errors.update(d["errors"])
    assert merged == payload["queries"]
    assert merged_errors == payload["errors"]
