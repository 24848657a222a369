from bb_bigdata_log_tools_spark.functions.hashing import (  # noqa: F401
    md5_long,
    minhash_signature,
    shingles,
)
from bb_bigdata_log_tools_spark.functions.timestamps import (  # noqa: F401
    format_timestamp,
    parse_rfc3164,
    parse_rfc5424,
)
