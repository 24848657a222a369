"""Log-table adapters.

The engine's canonical log schema (see ``schema.py``) mirrors the
reference's flattened Boom line. Any tabular source can be adapted into
it; ``events_as_logs`` maps the synthetic ``events`` table:

========== =============================
log column events expression
========== =============================
ts         epoch millis of ``ts``
message    ``event_type || ' ' || props``
event_id   ``event_id``
create_time epoch millis of ``ts``
block_no   ``user_id``
line_no    ``event_id``
========== =============================

``EVENTS_AS_LOGS_SQL`` is the *identical* mapping in ANSI/DuckDB SQL so
oracle queries share the exact adapter definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_AS_LOGS_SQL = """
    SELECT epoch_ms(ts) AS ts,
           event_type || ' ' || coalesce(props, '') AS message,
           event_id,
           epoch_ms(ts) AS create_time,
           user_id AS block_no,
           event_id AS line_no
    FROM events
"""


def events_as_logs(events: DataFrame) -> DataFrame:
    """Adapt the events table into the canonical log-line schema."""
    return events.select(
        F.unix_millis("ts").alias("ts"),
        F.concat(
            F.col("event_type"), F.lit(" "), F.coalesce(F.col("props"), F.lit(""))
        ).alias("message"),
        F.col("event_id"),
        F.unix_millis("ts").alias("create_time"),
        F.col("user_id").alias("block_no"),
        F.col("event_id").alias("line_no"),
    )
