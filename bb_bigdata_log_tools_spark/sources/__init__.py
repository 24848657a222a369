from bb_bigdata_log_tools_spark.sources.logs import events_as_logs  # noqa: F401
