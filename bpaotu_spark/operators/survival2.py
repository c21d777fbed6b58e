"""Round-9 survival addition: restricted mean survival time (RMST).

* ``restricted_mean_survival`` — area under the Kaplan-Meier reorder
  survival curve up to horizons 30/90/365 days, in micro-day units:
  the "expected days until reorder, capped at τ" number a retention
  team actually budgets with (the full mean is undefined under
  censoring; RMST is the standard restricted substitute).

Construction: identical event/censor convention and floored-micro
hazard terms as ``kaplan_meier_order_gaps`` (survival.py — r6 green);
the step function S(t) = exp(ln_s_micro/10⁶) is integrated exactly
over its own breakpoints: each segment contributes
floor(exp(ls/10⁶)·10⁶) · clamp(segment ∩ [0, τ)) micro-days, summed
as exact integers. A synthetic (dur=0, term=0) breakpoint anchors
S=1 before the first event; GROUP BY dur absorbs a real dur=0 (two
same-day orders) into that anchor. exp() is the same 1-ulp risk
class as the repo's floored-ln convention (accepted 8 rounds).

Scale shape: everything after the per-customer lead window runs on
the DISTINCT-duration table (day-count codomain, ≤ ~2.6k rows at any
SF); the horizons cross join is 3 × that.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register

_RMST_HORIZONS = (30, 90, 365)


@register(
    "restricted_mean_survival",
    oracle=f"""
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey
  FROM orders
),
mx AS (SELECT max(d) AS obs_end FROM o),
g AS (
  SELECT o_custkey,
    date_diff('day', d,
      lead(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey))
      AS dur,
    lead(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey)
      IS NOT NULL AS observed,
    d
  FROM o
),
gaps AS (
  SELECT CASE WHEN observed THEN dur
              ELSE date_diff('day', d, obs_end) END AS dur,
         observed
  FROM g, mx
  WHERE observed OR date_diff('day', d, obs_end) > 0
),
dc AS (
  SELECT CAST(dur AS BIGINT) AS dur,
    CAST(count(*) AS BIGINT) AS n_all,
    CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT) AS n_obs
  FROM gaps GROUP BY dur
),
tot AS (SELECT CAST(sum(n_all) AS BIGINT) AS n_total FROM dc),
haz AS (
  SELECT dur, n_obs,
    n_total - CAST(coalesce(sum(n_all) OVER (ORDER BY dur
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS at_risk
  FROM dc, tot
),
terms AS (
  SELECT dur,
    CAST(floor(ln(greatest(1.0 - n_obs * 1.0 / at_risk, 1e-9)) * 1000000)
      AS BIGINT) AS term_micro
  FROM haz WHERE n_obs > 0
),
pts AS (
  SELECT CAST(0 AS BIGINT) AS dur, CAST(0 AS BIGINT) AS term
  UNION ALL
  SELECT dur, term_micro FROM terms
),
agg AS (
  SELECT dur, CAST(sum(term) AS BIGINT) AS term FROM pts GROUP BY dur
),
c AS (
  SELECT dur,
    CAST(sum(term) OVER (ORDER BY dur) AS BIGINT) AS ls,
    lead(dur) OVER (ORDER BY dur) AS nxt
  FROM agg
),
hz AS (SELECT CAST(unnest([{", ".join(str(h) for h in _RMST_HORIZONS)}])
  AS BIGINT) AS horizon_days),
seg AS (
  SELECT horizon_days,
    CAST(floor(exp(CAST(ls AS DOUBLE) / 1000000) * 1000000) AS BIGINT)
      * greatest(least(coalesce(nxt, horizon_days), horizon_days) - dur,
                 0) AS contrib
  FROM c CROSS JOIN hz
)
SELECT horizon_days,
  CAST(sum(contrib) AS BIGINT) AS rmst_micro_days
FROM seg GROUP BY horizon_days ORDER BY horizon_days
""",
)
def restricted_mean_survival(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RMST of the reorder-gap KM curve at 30/90/365-day horizons
    (micro-days; exact stepwise integral of the floored-micro
    survival curve)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        "o_orderkey",
    )
    mx = o.agg(F.max("d").alias("obs_end"))
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    g = o.select(
        "o_custkey",
        F.datediff(F.lead("d").over(w), F.col("d")).alias("dur"),
        F.lead("d").over(w).isNotNull().alias("observed"),
        "d",
    )
    gaps = (
        g.crossJoin(F.broadcast(mx))
        .withColumn("cens_dur", F.datediff("obs_end", "d"))
        .filter(F.col("observed") | (F.col("cens_dur") > 0))
        .select(
            F.when(F.col("observed"), F.col("dur"))
            .otherwise(F.col("cens_dur"))
            .cast("bigint")
            .alias("dur"),
            "observed",
        )
    )
    dc = gaps.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(F.when(F.col("observed"), 1).otherwise(0)).alias("n_obs"),
    )
    tot = dc.agg(F.sum("n_all").alias("n_total"))
    # unpartitioned window bound: DISTINCT-duration table (day-count
    # codomain, ≤ ~2.6k rows at any SF), never the fact
    wv = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    haz = dc.crossJoin(F.broadcast(tot)).select(
        "dur",
        "n_obs",
        (
            F.col("n_total")
            - F.coalesce(F.sum("n_all").over(wv), F.lit(0))
        )
        .cast("bigint")
        .alias("at_risk"),
    )
    terms = haz.filter(F.col("n_obs") > 0).select(
        "dur",
        F.floor(
            F.log(
                F.greatest(
                    1.0 - F.col("n_obs") * 1.0 / F.col("at_risk"),
                    F.lit(1e-9),
                )
            )
            * 1000000
        )
        .cast("bigint")
        .alias("term"),
    )
    pts = spark.range(1).select(
        F.lit(0).cast("bigint").alias("dur"),
        F.lit(0).cast("bigint").alias("term"),
    ).unionByName(terms)
    agg = pts.groupBy("dur").agg(F.sum("term").cast("bigint").alias("term"))
    # unpartitioned window bound: distinct-duration table (see above)
    wc = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    wl = Window.orderBy("dur")
    c = agg.select(
        "dur",
        F.sum("term").over(wc).cast("bigint").alias("ls"),
        F.lead("dur").over(wl).alias("nxt"),
    )
    hz = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(h).cast("bigint") for h in _RMST_HORIZONS])
        ).alias("horizon_days")
    )
    seg = c.crossJoin(F.broadcast(hz)).select(
        "horizon_days",
        (
            F.expr(
                "CAST(floor(exp(CAST(ls AS DOUBLE) / 1000000) * 1000000)"
                " AS BIGINT)"
            )
            * F.expr(
                "greatest(least(coalesce(nxt, horizon_days),"
                " horizon_days) - dur, 0)"
            )
        ).alias("contrib"),
    )
    return (
        seg.groupBy("horizon_days")
        .agg(F.sum("contrib").cast("bigint").alias("rmst_micro_days"))
        .orderBy("horizon_days")
    )
