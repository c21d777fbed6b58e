"""Round-7 event-analytics additions built ON the session fabric.

``session_depth_histogram`` — the distribution of session depth
(events per session) with per-depth share and mean dwell time: the
product-analytics panel right after sessionization (how much of the
traffic is 1-event bounces vs deep sessions), composed from the SAME
sessionize_events oracle so the histogram can never drift from the
session table it summarizes.

Determinism: depth and duration are exact integers off the session
table; share is truncating-div ppm; mean dwell is exact sum-div.

Scale shape: one pass over the session table (itself a per-user
window + groupBy) into a groupBy(depth) with map-side combine; the
output is bounded by the maximum session depth (double-digit), and
shares come from a 1-row broadcast total.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bpaotu_spark.operators.events import sessionize_events
from bpaotu_spark.registry import ORACLES, register

import bpaotu_spark.operators.events  # noqa: F401  (registers the oracle)


def _depth_oracle() -> str:
    return f"""
WITH sess AS ({ORACLES["sessionize_events"]}),
d AS (
  SELECT CAST(n_events AS BIGINT) AS depth,
    CAST(count(*) AS BIGINT) AS n_sessions,
    CAST(sum(session_end_ms - session_start_ms) AS BIGINT) AS dwell_ms
  FROM sess GROUP BY 1
),
t AS (SELECT CAST(sum(n_sessions) AS BIGINT) AS n_total FROM d)
SELECT depth, n_sessions,
  n_sessions * 1000000 // n_total AS share_ppm,
  dwell_ms // n_sessions AS mean_dwell_ms
FROM d CROSS JOIN t
ORDER BY depth
"""


@register("session_depth_histogram", oracle=_depth_oracle())
def session_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-depth census: share and mean dwell per depth."""
    sess = sessionize_events(spark, sf_dir)
    d = sess.groupBy(F.col("n_events").cast("bigint").alias("depth")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.col("session_end_ms") - F.col("session_start_ms"))
        .cast("bigint")
        .alias("dwell_ms"),
    )
    t = d.agg(F.sum("n_sessions").cast("bigint").alias("n_total"))
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            "depth",
            "n_sessions",
            F.expr("n_sessions * 1000000 div n_total").alias("share_ppm"),
            F.expr("dwell_ms div n_sessions").alias("mean_dwell_ms"),
        )
        .orderBy("depth")
    )
