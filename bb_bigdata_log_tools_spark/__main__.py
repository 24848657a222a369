"""``python -m bb_bigdata_log_tools_spark <tool> [args]``."""

from bb_bigdata_log_tools_spark.cli import main

main()
