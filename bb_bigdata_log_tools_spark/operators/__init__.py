from bb_bigdata_log_tools_spark.operators import (  # noqa: F401
    analytics,
    dedup,
    index,
    multimodal,
    similarity,
    textqc,
)
from bb_bigdata_log_tools_spark.operators.logops import (  # noqa: F401
    cat,
    format_and_sort,
    grep,
    multisearch,
    search,
)
