"""Growth accounting and temporal-composition drift.

* ``new_repeat_revenue_monthly`` — the growth-accounting split every
  revenue dashboard leads with: per month, revenue and order counts
  from first-time vs repeat customers (first-time = the month of the
  customer's first order; exact integer cents, customer-keyed min
  join).
* ``month_end_lift`` — do the last 3 calendar days of a month
  outperform the rest?  Mean daily revenue in the window vs outside,
  lift in ppm (the period-close / promotions calendar signal).
* ``taxa_temporal_drift`` — bpaotu's composition-over-time check:
  per p_type abundance share in the early era vs the late era
  (split at the median order year — a deterministic calendar pivot),
  share delta ppm and rank movement (the token_rate_drift pattern on
  the taxonomy axis).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table, maybe_broadcast
from bpaotu_spark.operators.bpaotu import ABUNDANCE_CTE, abundance
from bpaotu_spark.registry import register

# ---------------------------------------------------------------------------
# new_repeat_revenue_monthly
# ---------------------------------------------------------------------------


@register(
    "new_repeat_revenue_monthly",
    oracle="""
WITH o AS (
  SELECT o_custkey,
    CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
firsts AS (
  SELECT o_custkey, min(mon) AS first_mon FROM o GROUP BY o_custkey
)
SELECT mon,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CASE WHEN mon = first_mon THEN 1 ELSE 0 END) AS BIGINT)
    AS new_cust_orders,
  CAST(sum(CASE WHEN mon = first_mon THEN cents ELSE 0 END) AS BIGINT)
    AS new_revenue_cents,
  CAST(sum(CASE WHEN mon <> first_mon THEN cents ELSE 0 END) AS BIGINT)
    AS repeat_revenue_cents,
  (CAST(sum(CASE WHEN mon = first_mon THEN cents ELSE 0 END) AS BIGINT)
    * 1000000) // CAST(sum(cents) AS BIGINT) AS new_share_ppm
FROM o JOIN firsts USING (o_custkey)
GROUP BY mon
""",
)
def new_repeat_revenue_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("mon"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    firsts = o.groupBy("o_custkey").agg(F.min("mon").alias("first_mon"))
    return (
        o.join(firsts, "o_custkey")
        .groupBy("mon")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.col("mon") == F.col("first_mon"), 1).otherwise(0)
            ).alias("new_cust_orders"),
            F.sum(
                F.when(
                    F.col("mon") == F.col("first_mon"), F.col("cents")
                ).otherwise(0)
            ).alias("new_revenue_cents"),
            F.sum(
                F.when(
                    F.col("mon") != F.col("first_mon"), F.col("cents")
                ).otherwise(0)
            ).alias("repeat_revenue_cents"),
            F.expr(
                "(sum(CASE WHEN mon = first_mon THEN cents ELSE 0 END)"
                " * 1000000) div sum(cents)"
            ).alias("new_share_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# month_end_lift
# ---------------------------------------------------------------------------


@register(
    "month_end_lift",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
tagged AS (
  SELECT cents,
    date_diff('day', d, CAST(last_day(d) AS DATE)) <= 2 AS is_month_end
  FROM daily
),
agg AS (
  SELECT
    CAST(sum(CASE WHEN is_month_end THEN cents ELSE 0 END) AS BIGINT)
      AS end_cents,
    CAST(sum(CASE WHEN is_month_end THEN 1 ELSE 0 END) AS BIGINT)
      AS end_days,
    CAST(sum(CASE WHEN NOT is_month_end THEN cents ELSE 0 END) AS BIGINT)
      AS rest_cents,
    CAST(sum(CASE WHEN NOT is_month_end THEN 1 ELSE 0 END) AS BIGINT)
      AS rest_days
  FROM tagged
)
SELECT end_days, rest_days,
  end_cents // end_days AS end_daily_cents,
  rest_cents // rest_days AS rest_daily_cents,
  ((end_cents // end_days) * 1000000) // (rest_cents // rest_days)
    AS lift_ppm
FROM agg
""",
)
def month_end_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = load_table(spark, sf_dir, "orders").groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    tagged = daily.select(
        "cents",
        (F.datediff(F.last_day("d"), F.col("d")) <= 2).alias("is_month_end"),
    )
    agg = tagged.agg(
        F.sum(F.when(F.col("is_month_end"), F.col("cents")).otherwise(0)).alias(
            "end_cents"
        ),
        F.sum(F.when(F.col("is_month_end"), 1).otherwise(0)).alias("end_days"),
        F.sum(
            F.when(~F.col("is_month_end"), F.col("cents")).otherwise(0)
        ).alias("rest_cents"),
        F.sum(F.when(~F.col("is_month_end"), 1).otherwise(0)).alias(
            "rest_days"
        ),
    )
    return agg.select(
        "end_days",
        "rest_days",
        F.expr("end_cents div end_days").alias("end_daily_cents"),
        F.expr("rest_cents div rest_days").alias("rest_daily_cents"),
        F.expr(
            "((end_cents div end_days) * 1000000)"
            " div (rest_cents div rest_days)"
        ).alias("lift_ppm"),
    )


# ---------------------------------------------------------------------------
# taxa_temporal_drift
# ---------------------------------------------------------------------------


@register(
    "taxa_temporal_drift",
    oracle=f"""
WITH {ABUNDANCE_CTE},
dated AS (
  SELECT p_type, CAST(year(o_orderdate) AS BIGINT) AS yr,
    CAST(cnt AS BIGINT) AS c
  FROM abundance
  JOIN orders ON order_id = o_orderkey
  JOIN part ON otu_id = p_partkey
),
pivot_y AS (
  SELECT CAST(floor(
    (min(yr) + max(yr)) / 2.0) AS BIGINT) AS mid FROM dated
),
era AS (
  SELECT p_type, yr <= mid AS early, CAST(sum(c) AS BIGINT) AS mass
  FROM dated, pivot_y GROUP BY p_type, yr <= mid
),
tot AS (
  SELECT early, CAST(sum(mass) AS BIGINT) AS era_mass FROM era GROUP BY early
),
share AS (
  SELECT p_type,
    CAST(sum(CASE WHEN early THEN mass * 1000000 // era_mass
      ELSE 0 END) AS BIGINT) AS early_ppm,
    CAST(sum(CASE WHEN NOT early THEN mass * 1000000 // era_mass
      ELSE 0 END) AS BIGINT) AS late_ppm
  FROM era JOIN tot USING (early)
  GROUP BY p_type
)
SELECT p_type, early_ppm, late_ppm,
  late_ppm - early_ppm AS delta_ppm,
  CAST(rank() OVER (ORDER BY early_ppm DESC, p_type) AS BIGINT)
    AS early_rank,
  CAST(rank() OVER (ORDER BY late_ppm DESC, p_type) AS BIGINT) AS late_rank
FROM share
""",
)
def taxa_temporal_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ab = abundance(spark, sf_dir)
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("otu_id"), "p_type"
    )
    dated = (
        ab.join(od, "order_id")
        .join(maybe_broadcast(part), "otu_id")
        .select("p_type", "yr", F.col("cnt").cast("bigint").alias("c"))
    )
    pivot_y = dated.agg(
        F.floor((F.min("yr") + F.max("yr")) / 2.0)
        .cast("bigint")
        .alias("mid")
    )
    era = (
        dated.crossJoin(F.broadcast(pivot_y))
        .groupBy("p_type", (F.col("yr") <= F.col("mid")).alias("early"))
        .agg(F.sum("c").alias("mass"))
    )
    tot = era.groupBy("early").agg(F.sum("mass").alias("era_mass"))
    share = (
        era.join(F.broadcast(tot), "early")
        .groupBy("p_type")
        .agg(
            F.sum(
                F.when(
                    F.col("early"),
                    F.expr("mass * 1000000 div era_mass"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("early_ppm"),
            F.sum(
                F.when(
                    ~F.col("early"),
                    F.expr("mass * 1000000 div era_mass"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("late_ppm"),
        )
    )
    # the rank windows run over |p_type| rows — a bounded vocabulary
    we = Window.orderBy(F.col("early_ppm").desc(), F.col("p_type"))
    wl = Window.orderBy(F.col("late_ppm").desc(), F.col("p_type"))
    return share.select(
        "p_type",
        "early_ppm",
        "late_ppm",
        (F.col("late_ppm") - F.col("early_ppm")).alias("delta_ppm"),
        F.rank().over(we).cast("bigint").alias("early_rank"),
        F.rank().over(wl).cast("bigint").alias("late_rank"),
    )
