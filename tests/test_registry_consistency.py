"""Registry integrity: the merged QUERIES/ORACLES dicts must not
silently shadow keys, and every auxiliary list must reference real
keys."""

from __future__ import annotations

import bb_bigdata_log_tools_spark.registry as R


def _parts():
    from bb_bigdata_log_tools_spark.registry_analytics2 import ANALYTICS2_QUERIES
    from bb_bigdata_log_tools_spark.registry_avro import AVRO_QUERIES
    from bb_bigdata_log_tools_spark.registry_boom import BOOM_QUERIES
    from bb_bigdata_log_tools_spark.registry_curation import CURATION_QUERIES
    from bb_bigdata_log_tools_spark.registry_datasetops import DATASETOPS_QUERIES
    from bb_bigdata_log_tools_spark.registry_misc import MISC_QUERIES
    from bb_bigdata_log_tools_spark.registry_pipeline import PIPELINE_QUERIES
    from bb_bigdata_log_tools_spark.registry_sinks import SINK_QUERIES
    from bb_bigdata_log_tools_spark.registry_streaming import STREAMING_QUERIES
    from bb_bigdata_log_tools_spark.registry_textprep import TEXTPREP_QUERIES

    return [
        PIPELINE_QUERIES, BOOM_QUERIES, MISC_QUERIES, ANALYTICS2_QUERIES,
        AVRO_QUERIES, CURATION_QUERIES, TEXTPREP_QUERIES, DATASETOPS_QUERIES,
        STREAMING_QUERIES, SINK_QUERIES,
    ]


def test_no_cross_part_key_shadowing():
    parts = _parts()
    seen: dict[str, int] = {}
    dupes = []
    for i, p in enumerate(parts):
        for k in p:
            if k in seen:
                dupes.append((k, seen[k], i))
            seen[k] = i
    assert not dupes, f"keys defined in multiple registry parts: {dupes}"


def test_merged_registry_complete():
    parts = _parts()
    part_keys = set().union(*[set(p) for p in parts])
    # 13 core keys live directly in registry.py
    assert part_keys <= set(R.QUERIES)
    assert len(R.QUERIES) == len(part_keys) + 13


def test_every_query_has_oracle_and_vice_versa():
    assert set(R.QUERIES) == set(R.ORACLES)


def test_window_priority_and_bench_reference_real_keys():
    import bench

    assert set(R._WINDOW_PRIORITY) <= set(R.QUERIES)
    assert set(bench.BENCH_QUERIES) <= set(R.QUERIES)
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)
    assert len(set(R._WINDOW_PRIORITY)) == len(R._WINDOW_PRIORITY)
