"""Smoke the worked examples end-to-end on the shared session.

Round 6 found examples/log_analytics.py broken by an operator-signature
drift (`ts` projected away before log_stats_hourly) that no test
covered: the examples are documentation that executes, so they run in
CI like everything else. The sf0.1 scale-probe script is excluded —
it's a measurement protocol, not a doc.
"""

from __future__ import annotations

import importlib.util
import os
import sys

# heavy tier: excluded from the fast dev gate (pytest -m 'not slow');
# the FULL suite (no filter) is still the round/judge gate
pytestmark = __import__('pytest').mark.slow


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _load_example(name: str):
    path = os.path.join(REPO, "examples", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"examples_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_log_analytics_example(spark, capsys):
    _load_example("log_analytics").main(SF_DIR, spark=spark)
    out = capsys.readouterr().out
    assert "hour_ts" in out  # the hourly-stats table rendered
    assert spark.sparkContext._jsc is not None  # session not stopped


def test_curation_pipeline_example(spark, capsys):
    _load_example("curation_pipeline").main(SF_DIR, spark=spark)
    out = capsys.readouterr().out
    assert "decision" in out  # the corpus_curate decision list rendered
    assert spark.sparkContext._jsc is not None


def test_crawl_pipeline_example(spark, capsys):
    _load_example("crawl_pipeline").main(SF_DIR, spark=spark)
    out = capsys.readouterr().out
    assert "outlinks" in out          # extraction artifacts rendered
    assert "WET export:" in out       # kept pages shipped
    assert spark.sparkContext._jsc is not None
