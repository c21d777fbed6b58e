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


# ---------------------------------------------------------------------------
# event_type_entropy — per-user Shannon entropy of the event-type mix,
# rolled into a quarter-nat-band census (r8). Each p·ln(1/p) term is
# micro-floored BEFORE the per-user sum, so the per-user entropy is an
# exact integer (summation-order-free across engines); band = H_micro
# div 250000. Specialists (one event type, H=0) land in band 0.
# Scale: two keyed aggregations (user×type, then user), both
# map-combined; the census axis is bounded by ln(|event types|)/0.25.
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH ut AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_t
  FROM events GROUP BY user_id, event_type
),
un AS (
  SELECT user_id, CAST(sum(n_t) AS BIGINT) AS n_u FROM ut GROUP BY user_id
),
h AS (
  SELECT ut.user_id,
    CAST(sum(CAST(floor((CAST(n_t AS DOUBLE) / n_u)
      * ln(CAST(n_u AS DOUBLE) / n_t) * 1000000) AS BIGINT)) AS BIGINT)
      AS h_micro,
    max(n_u) AS n_events
  FROM ut JOIN un ON ut.user_id = un.user_id
  GROUP BY ut.user_id
)
SELECT h_micro // 250000 AS entropy_band,
  CAST(count(*) AS BIGINT) AS n_users,
  CAST(sum(n_events) AS BIGINT) AS n_events,
  CAST(sum(h_micro) // count(*) AS BIGINT) AS mean_h_micro
FROM h GROUP BY entropy_band ORDER BY entropy_band
"""


@register("event_type_entropy", oracle=_ENTROPY_ORACLE)
def event_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type entropy census by quarter-nat band."""
    from bpaotu_spark.catalog import load_table

    ut = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_t"))
    )
    un = ut.groupBy("user_id").agg(
        F.sum("n_t").cast("bigint").alias("n_u")
    )
    h = (
        ut.join(un, "user_id")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.expr(
                    "CAST(floor((CAST(n_t AS DOUBLE) / n_u)"
                    " * ln(CAST(n_u AS DOUBLE) / n_t) * 1000000)"
                    " AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("h_micro"),
            F.max("n_u").alias("n_events"),
        )
    )
    return (
        h.groupBy(
            F.expr("h_micro div 250000").alias("entropy_band")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.expr("CAST(sum(h_micro) div count(*) AS BIGINT)").alias(
                "mean_h_micro"
            ),
        )
        .orderBy("entropy_band")
    )


# ---------------------------------------------------------------------------
# events_trending_topk — the batch twin of streaming/jobs.py's
# trending_event_types_stream (r8): top-3 event types by total value,
# the live "trending now" leaderboard the complete-mode stream serves.
# Registering the twin makes the streaming job's correctness baseline
# a first-class driver-verified key (tests/test_streaming.py diffs
# the availableNow stream against exactly this shape).
# Determinism: decimal value sums rounded at 4dp (the money
# convention), ties broken by event_type.
# ---------------------------------------------------------------------------

_TRENDING_K = 3

_TRENDING_ORACLE = f"""
WITH t AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
    CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
      AS total_value
  FROM events GROUP BY event_type
)
SELECT event_type, n_events, total_value,
  CAST(row_number() OVER (ORDER BY total_value DESC, event_type ASC)
    AS BIGINT) AS rnk
FROM t
QUALIFY rnk <= {_TRENDING_K}
"""


@register("events_trending_topk", oracle=_TRENDING_ORACLE)
def events_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types by total value (trending leaderboard)."""
    from pyspark.sql import Window

    from bpaotu_spark.catalog import load_table

    t = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("total_value"),
        )
    )
    w = Window.orderBy(
        F.col("total_value").desc(), F.col("event_type").asc()
    )
    # unpartitioned window bound: |event_types| rows
    return (
        t.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _TRENDING_K)
        .select("event_type", "n_events", "total_value", "rnk")
    )
