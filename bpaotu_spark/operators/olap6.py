"""Round-8 OLAP additions III: inventory staleness and revenue
concentration.

* ``parts_slow_mover_detection`` — dead-stock census: per part, days
  since its last shipment relative to the corpus horizon, bucketed
  into 30-day staleness bands (capped at 12+) — the inventory page
  every ops team keeps next to the ABC/XYZ classes (olap5.py).
* ``orders_hhi_by_nation`` — Herfindahl-Hirschman concentration of
  customer revenue within each nation plus the top-1 customer share:
  the market-concentration twin of part_brand_hhi on the customer
  axis, the "is this market one big account" audit.

Determinism: exact cent sums; HHI is one float ratio of exact
DECIMAL(38,0) sums (Σrev², rev²); staleness bands are integer div.

Scale shape: both are one fact scan into keyed map-combined
aggregations; the staleness reference date is a 1-row broadcast; HHI
shares never materialize per-customer ratios (the squared-sum
identity keeps it two aggregates).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register


@register(
    "parts_slow_mover_detection",
    oracle="""
WITH last_ship AS (
  SELECT l_partkey AS part_id,
    max(CAST(l_shipdate AS DATE)) AS last_d,
    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS lifetime_qty
  FROM lineitem GROUP BY l_partkey
),
h AS (SELECT max(CAST(l_shipdate AS DATE)) AS horizon FROM lineitem)
SELECT least(date_diff('day', last_d, horizon) // 30, 12) AS staleness_band,
  CAST(count(*) AS BIGINT) AS n_parts,
  CAST(sum(lifetime_qty) AS BIGINT) AS lifetime_qty,
  CAST(min(date_diff('day', last_d, horizon)) AS BIGINT) AS min_days_stale,
  CAST(max(date_diff('day', last_d, horizon)) AS BIGINT) AS max_days_stale
FROM last_ship CROSS JOIN h
GROUP BY staleness_band ORDER BY staleness_band
""",
)
def parts_slow_mover_detection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dead-stock census by 30-day staleness band (capped 12+)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part_id"),
        F.col("l_shipdate").cast("date").alias("sd"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    last_ship = li.groupBy("part_id").agg(
        F.max("sd").alias("last_d"),
        F.sum("qty").cast("bigint").alias("lifetime_qty"),
    )
    h = li.agg(F.max("sd").alias("horizon"))
    x = last_ship.crossJoin(F.broadcast(h)).select(
        F.expr(
            "least(datediff(horizon, last_d) div 30,"
            " CAST(12 AS BIGINT))"
        ).alias("staleness_band"),
        "lifetime_qty",
        F.expr("CAST(datediff(horizon, last_d) AS BIGINT)").alias(
            "days_stale"
        ),
    )
    return (
        x.groupBy("staleness_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("lifetime_qty").cast("bigint").alias("lifetime_qty"),
            F.min("days_stale").cast("bigint").alias("min_days_stale"),
            F.max("days_stale").cast("bigint").alias("max_days_stale"),
        )
        .orderBy("staleness_band")
    )


@register(
    "orders_hhi_by_nation",
    oracle="""
WITH cr AS (
  SELECT c_nationkey AS nation_id, o_custkey AS cust,
    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey, o_custkey
),
n AS (
  SELECT nation_id,
    CAST(count(*) AS BIGINT) AS n_customers,
    CAST(sum(rev) AS HUGEINT) AS rev_total,
    CAST(sum(CAST(rev AS HUGEINT) * rev) AS HUGEINT) AS rev_sq,
    CAST(max(rev) AS BIGINT) AS rev_top1
  FROM cr GROUP BY nation_id
)
SELECT nation_id, n_customers,
  CAST(rev_total AS BIGINT) AS rev_total_cents,
  CAST(floor(CAST(rev_sq AS DOUBLE)
    / (CAST(rev_total AS DOUBLE) * CAST(rev_total AS DOUBLE))
    * 1000000) AS BIGINT) AS hhi_ppm,
  CAST(rev_top1 * 1000000 // CAST(rev_total AS BIGINT) AS BIGINT)
    AS top1_share_ppm
FROM n ORDER BY nation_id
""",
)
def orders_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-revenue HHI + top-1 share per nation (squared-sum
    identity: shares never materialize per customer)."""
    from bpaotu_spark.catalog import maybe_broadcast

    od = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    cr = (
        od.join(maybe_broadcast(cust), od.o_custkey == F.col("c_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("nation_id"),
            F.col("o_custkey").alias("cust"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
    )
    n = cr.groupBy("nation_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("rev").cast("decimal(38,0)").alias("rev_total"),
        F.sum(F.expr("CAST(rev AS DECIMAL(38,0)) * rev")).alias("rev_sq"),
        F.max("rev").cast("bigint").alias("rev_top1"),
    )
    return n.select(
        "nation_id",
        "n_customers",
        F.col("rev_total").cast("bigint").alias("rev_total_cents"),
        F.expr(
            "CAST(floor(CAST(rev_sq AS DOUBLE)"
            " / (CAST(rev_total AS DOUBLE) * CAST(rev_total AS DOUBLE))"
            " * 1000000) AS BIGINT)"
        ).alias("hhi_ppm"),
        F.expr(
            "CAST(rev_top1 * 1000000"
            " div CAST(rev_total AS BIGINT) AS BIGINT)"
        ).alias("top1_share_ppm"),
    ).orderBy("nation_id")
