from bb_bigdata_log_tools_spark.plans.audit import (  # noqa: F401
    assert_broadcasts,
    assert_no_shuffle,
    executed_plan,
    optimized_plan,
    shuffle_count,
)
