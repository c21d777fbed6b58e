"""Round-12 event operators.

* ``attribution_position_based`` — the U-shaped multi-touch model
  completing the attribution family (last-touch r5, time-decay r11):
  per purchase, the FIRST touch in the 7-day window earns 40%, the
  LAST 40%, middles share the remaining 20% equally; a lone touch
  takes 100%, a pair splits 50/50. Weights are exact integer ppm with
  truncating division (200000 // (n−2) per middle — the dropped
  remainder is deterministic in both engines), so the report hashes
  bit-identically.

Reference parity: the reference's interest in per-sample provenance
chains (public ``bpaotu/otu/query.py`` sample-context joins) maps to
per-conversion touch chains on the events table.

Scale shape: purchases ⋈ touches is the same user_id-keyed self-join
as the other attribution ops (exchange reuse); the rank/count windows
are PARTITIONED by purchase id (per-conversion chains bounded by the
7-day window), and the rollup key space is |sources| × 4 positions —
map-side combined to almost nothing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.operators.events import ATTR_SOURCES, ATTR_WINDOW_US
from bpaotu_spark.registry import register

_POS_CASE = """
CASE WHEN n = 1 THEN 'only'
     WHEN rn = 1 THEN 'first'
     WHEN rn = n THEN 'last'
     ELSE 'middle' END
""".strip()

_W_CASE = """
CASE WHEN n = 1 THEN 1000000
     WHEN n = 2 THEN 500000
     WHEN rn = 1 OR rn = n THEN 400000
     ELSE 200000 {div} (n - 2) END
""".strip()


@register(
    "attribution_position_based",
    oracle=f"""
WITH p AS (
  SELECT event_id AS pid, user_id, epoch_us(ts) AS p_us FROM events
  WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us, event_id AS tid
  FROM events WHERE event_type IN {ATTR_SOURCES!r}
),
j AS (
  SELECT p.pid, t.event_type AS attr_type, t.t_us, t.tid
  FROM p JOIN t ON p.user_id = t.user_id
  WHERE t.t_us < p.p_us AND p.p_us - t.t_us <= {ATTR_WINDOW_US}
),
r AS (
  SELECT pid, attr_type,
    row_number() OVER (PARTITION BY pid ORDER BY t_us, tid) AS rn,
    count(*) OVER (PARTITION BY pid) AS n
  FROM j
),
c AS (
  SELECT attr_type, {_POS_CASE} AS position,
    {_W_CASE.format(div="//")} AS w
  FROM r
)
SELECT attr_type, position,
  CAST(count(*) AS BIGINT) AS n_credits,
  CAST(sum(w) AS BIGINT) AS total_weight_ppm
FROM c GROUP BY attr_type, position
""",
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped attribution: (attr_type, position, n_credits,
    total_weight_ppm) with position in {only, first, middle, last}."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
    )
    t = ev.filter(F.col("event_type").isin(*ATTR_SOURCES)).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("attr_type"),
        F.unix_micros("ts").alias("t_us"),
        F.col("event_id").alias("tid"),
    )
    j = p.join(
        t,
        (p.user_id == t.t_user)
        & (t.t_us < p.p_us)
        & (p.p_us - t.t_us <= ATTR_WINDOW_US),
    ).select("pid", "attr_type", "t_us", "tid")
    wp = Window.partitionBy("pid")
    r = j.select(
        "attr_type",
        F.row_number().over(wp.orderBy("t_us", "tid")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    c = r.select(
        "attr_type",
        F.expr(_POS_CASE).alias("position"),
        F.expr(_W_CASE.format(div="DIV")).alias("w"),
    )
    return c.groupBy("attr_type", "position").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_credits"),
        F.sum("w").cast("bigint").alias("total_weight_ppm"),
    )
