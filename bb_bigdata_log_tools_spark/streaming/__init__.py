from bb_bigdata_log_tools_spark.streaming.ops import (  # noqa: F401
    stream_grep,
    stream_hourly_stats,
    stream_sessionize,
)
