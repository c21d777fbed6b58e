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


# ---------------------------------------------------------------------------
# hazard_ratio_segments — Mantel-Haenszel-style hazard ratio between
# the HOUSEHOLD and FURNITURE reorder-gap survival curves: the EFFECT
# SIZE companion to logrank_reorder_test's χ² (same gap/censor
# construction, different segment pair). HR = (O₁/E₁)/(O₂/E₂) with the
# per-time expected counts floored to micro before summing (the
# logrank discipline), so HR_milli = O₁·E₂·1000 div (O₂·E₁) is exact
# integer arithmetic over the floored sums.
# Scale shape: identical to logrank — per-(dur, group) counts, a
# group-partitioned cumulative over the distinct-duration grid, one
# output row.
# ---------------------------------------------------------------------------

_HR_SEG_A = "HOUSEHOLD"
_HR_SEG_B = "FURNITURE"


@register(
    "hazard_ratio_segments",
    oracle=f"""
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey,
    CASE WHEN c_mktsegment = '{_HR_SEG_A}' THEN 1 ELSE 0 END AS grp
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('{_HR_SEG_A}', '{_HR_SEG_B}')
),
mx AS (SELECT max(d) AS obs_end FROM o),
g AS (
  SELECT o_custkey, grp,
    date_diff('day', d,
      lead(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey))
      AS dur,
    lead(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey)
      IS NOT NULL AS observed,
    d
  FROM o
),
gaps AS (
  SELECT grp,
    CAST(CASE WHEN observed THEN dur
         ELSE date_diff('day', d, obs_end) END AS BIGINT) AS dur,
    observed
  FROM g, mx
  WHERE observed OR date_diff('day', d, obs_end) > 0
),
dcg AS (
  SELECT dur, grp,
    CAST(count(*) AS BIGINT) AS n_all,
    CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT) AS n_obs
  FROM gaps GROUP BY dur, grp
),
grid AS (
  SELECT d.dur, k.grp,
    coalesce(dcg.n_all, 0) AS n_all, coalesce(dcg.n_obs, 0) AS n_obs
  FROM (SELECT DISTINCT dur FROM dcg) d
  CROSS JOIN (SELECT unnest([0, 1]) AS grp) k
  LEFT JOIN dcg ON dcg.dur = d.dur AND dcg.grp = k.grp
),
totg AS (SELECT grp, CAST(sum(n_all) AS BIGINT) AS tot FROM grid
         GROUP BY grp),
risk AS (
  SELECT grid.dur, grid.grp, grid.n_obs,
    tot - CAST(coalesce(sum(grid.n_all) OVER (PARTITION BY grid.grp
      ORDER BY grid.dur
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS at_risk
  FROM grid JOIN totg ON grid.grp = totg.grp
),
pert AS (
  SELECT dur,
    CAST(sum(n_obs) AS BIGINT) AS d_t,
    CAST(sum(CASE WHEN grp = 1 THEN n_obs ELSE 0 END) AS BIGINT) AS d1,
    CAST(sum(at_risk) AS BIGINT) AS n_t,
    CAST(sum(CASE WHEN grp = 1 THEN at_risk ELSE 0 END) AS BIGINT) AS n1
  FROM risk GROUP BY dur
),
terms AS (
  SELECT d1, d_t - d1 AS d2,
    CAST(floor(CAST(d_t AS DOUBLE) * n1 / n_t * 1000000) AS BIGINT)
      AS e1_micro,
    CAST(floor(CAST(d_t AS DOUBLE) * (n_t - n1) / n_t * 1000000)
      AS BIGINT) AS e2_micro
  FROM pert WHERE d_t > 0
)
SELECT
  CAST(sum(d1) AS BIGINT) AS o1,
  CAST(sum(d2) AS BIGINT) AS o2,
  CAST(sum(e1_micro) AS BIGINT) AS e1_micro,
  CAST(sum(e2_micro) AS BIGINT) AS e2_micro,
  CAST(CASE WHEN CAST(sum(d2) AS HUGEINT) * sum(e1_micro) = 0 THEN NULL
       ELSE CAST(sum(d1) AS HUGEINT) * sum(e2_micro) * 1000
            // (CAST(sum(d2) AS HUGEINT) * sum(e1_micro)) END AS BIGINT)
    AS hr_milli
FROM terms
""",
)
def hazard_ratio_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hazard ratio (milli) between HOUSEHOLD and FURNITURE reorder
    hazards: HR = (O₁/E₁)/(O₂/E₂) over floored-micro expected
    counts."""
    from bpaotu_spark.catalog import maybe_broadcast

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(_HR_SEG_A, _HR_SEG_B)
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .join(
            maybe_broadcast(cust.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("d"),
            "o_orderkey",
            F.when(F.col("c_mktsegment") == _HR_SEG_A, 1)
            .otherwise(0)
            .alias("grp"),
        )
    )
    mx = o.agg(F.max("d").alias("obs_end"))
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    g = o.select(
        "grp",
        F.datediff(F.lead("d").over(w), F.col("d")).alias("dur"),
        F.lead("d").over(w).isNotNull().alias("observed"),
        "d",
    )
    gaps = (
        g.crossJoin(F.broadcast(mx))
        .withColumn("cens_dur", F.datediff("obs_end", "d"))
        .filter(F.col("observed") | (F.col("cens_dur") > 0))
        .select(
            "grp",
            F.when(F.col("observed"), F.col("dur"))
            .otherwise(F.col("cens_dur"))
            .cast("bigint")
            .alias("dur"),
            "observed",
        )
    )
    dcg = gaps.groupBy("dur", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum(F.when(F.col("observed"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_obs"),
    )
    durs = dcg.select("dur").distinct()
    ks = spark.range(2).select(F.col("id").cast("int").alias("grp"))
    grid = (
        durs.crossJoin(F.broadcast(ks))
        .join(dcg, ["dur", "grp"], "left")
        .select(
            "dur",
            "grp",
            F.coalesce(F.col("n_all"), F.lit(0)).alias("n_all"),
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
        )
    )
    totg = grid.groupBy("grp").agg(
        F.sum("n_all").cast("bigint").alias("tot")
    )
    # group-partitioned cumulative over the distinct-duration grid
    # (day-count codomain — bounded at any SF)
    wv = (
        Window.partitionBy("grp")
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = (
        grid.join(F.broadcast(totg), "grp")
        .select(
            "dur",
            "grp",
            "n_obs",
            (
                F.col("tot")
                - F.coalesce(F.sum("n_all").over(wv), F.lit(0))
            )
            .cast("bigint")
            .alias("at_risk"),
        )
    )
    pert = risk.groupBy("dur").agg(
        F.sum("n_obs").cast("bigint").alias("d_t"),
        F.sum(F.expr("CASE WHEN grp = 1 THEN n_obs ELSE 0 END"))
        .cast("bigint")
        .alias("d1"),
        F.sum("at_risk").cast("bigint").alias("n_t"),
        F.sum(F.expr("CASE WHEN grp = 1 THEN at_risk ELSE 0 END"))
        .cast("bigint")
        .alias("n1"),
    )
    terms = pert.filter("d_t > 0").select(
        "d1",
        F.expr("d_t - d1").alias("d2"),
        F.expr(
            "CAST(floor(CAST(d_t AS DOUBLE) * n1 / n_t * 1000000)"
            " AS BIGINT)"
        ).alias("e1_micro"),
        F.expr(
            "CAST(floor(CAST(d_t AS DOUBLE) * (n_t - n1) / n_t"
            " * 1000000) AS BIGINT)"
        ).alias("e2_micro"),
    )
    return terms.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum("d2").cast("bigint").alias("o2"),
        F.sum("e1_micro").cast("bigint").alias("e1_micro"),
        F.sum("e2_micro").cast("bigint").alias("e2_micro"),
        # a cohort where group 2 has no deaths (or e1 floors to 0)
        # must yield a defined NULL, not a divide-by-zero / ANSI error
        F.expr(
            "CAST(CASE WHEN CAST(sum(d2) AS DECIMAL(38,0))"
            " * sum(e1_micro) = 0 THEN NULL"
            " ELSE CAST(sum(d1) AS DECIMAL(38,0)) * sum(e2_micro) * 1000"
            " div (CAST(sum(d2) AS DECIMAL(38,0)) * sum(e1_micro))"
            " END AS BIGINT)"
        ).alias("hr_milli"),
    )


# ---------------------------------------------------------------------------
# loglogistic_rank_regression — the log-logistic AFT companion to
# weibull_rank_regression over the same reorder-gap durations: the
# logit linearization ln(F/(1−F)) = β·ln(t) − β·ln(α) (vs Weibull's
# cloglog), same Benard median ranks F_i = (i−0.3)/(n+0.4) with exact
# halved tie-averaging, same weighted OLS in floored micro units.
# Adds weighted r² (ppm) so the two AFT families can be SELECTED
# between: the better linearization for this data wins — the model-
# choice step a parametric survival analysis actually performs.
#
# Scale shape: identical to the Weibull twin — one duration-count
# aggregation, one value-bounded cumulative window, one 1-row
# weighted-moment rollup (now carrying syy for r²).
# ---------------------------------------------------------------------------


@register(
    "loglogistic_rank_regression",
    oracle="""
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey
  FROM orders
),
g AS (
  SELECT date_diff('day', d,
      lead(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey))
      AS dur
  FROM o
),
dc AS (
  SELECT CAST(dur AS BIGINT) AS dur, CAST(count(*) AS BIGINT) AS cnt
  FROM g WHERE dur IS NOT NULL AND dur > 0 GROUP BY dur
),
nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM dc),
rk AS (
  SELECT dur, cnt,
    2 * CAST(coalesce(sum(cnt) OVER (ORDER BY dur ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      + cnt + 1 AS i_x2
  FROM dc
),
xy AS (
  SELECT cnt,
    CAST(floor(ln(CAST(dur AS DOUBLE)) * 1000000) AS BIGINT) AS x,
    CAST(floor(ln((CAST(5 * i_x2 - 3 AS DOUBLE) / (10 * n + 4))
      / (1.0 - CAST(5 * i_x2 - 3 AS DOUBLE) / (10 * n + 4)))
      * 1000000) AS BIGINT) AS y
  FROM rk, nn
),
mo AS (
  SELECT CAST(sum(cnt) AS HUGEINT) AS w,
    CAST(sum(CAST(cnt AS HUGEINT) * x) AS HUGEINT) AS sx,
    CAST(sum(CAST(cnt AS HUGEINT) * y) AS HUGEINT) AS sy,
    CAST(sum(CAST(cnt AS HUGEINT) * x * y) AS HUGEINT) AS sxy,
    CAST(sum(CAST(cnt AS HUGEINT) * x * x) AS HUGEINT) AS sxx,
    CAST(sum(CAST(cnt AS HUGEINT) * y * y) AS HUGEINT) AS syy
  FROM xy
)
SELECT CAST(w AS BIGINT) AS n_gaps,
  CAST(floor(CAST(w * sxy - sx * sy AS DOUBLE)
    / CAST(w * sxx - sx * sx AS DOUBLE) * 1000) AS BIGINT) AS shape_milli,
  CAST(floor(exp((CAST(sx AS DOUBLE) / CAST(w AS DOUBLE)
    - (CAST(sy AS DOUBLE) / CAST(w AS DOUBLE))
      / (CAST(w * sxy - sx * sy AS DOUBLE)
         / CAST(w * sxx - sx * sx AS DOUBLE))) / 1000000)
    * 1000) AS BIGINT) AS scale_days_milli,
  CAST(floor(CAST(w * sxy - sx * sy AS DOUBLE)
    * CAST(w * sxy - sx * sy AS DOUBLE)
    / (CAST(w * sxx - sx * sx AS DOUBLE)
       * CAST(w * syy - sy * sy AS DOUBLE)) * 1000000) AS BIGINT)
    AS r2_ppm
FROM mo
""",
)
def loglogistic_rank_regression(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Log-logistic AFT shape/scale (milli) + weighted r² (ppm) via
    logit median-rank regression over reorder gaps."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    g = o.select(F.datediff(F.lead("d").over(w), F.col("d")).alias("dur"))
    dc = (
        g.filter(F.col("dur").isNotNull() & (F.col("dur") > 0))
        .groupBy(F.col("dur").cast("bigint").alias("dur"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    nn = dc.agg(F.sum("cnt").cast("bigint").alias("n"))
    wv = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    rk = dc.select(
        "dur",
        "cnt",
        (
            2 * F.coalesce(F.sum("cnt").over(wv), F.lit(0))
            + F.col("cnt")
            + 1
        )
        .cast("bigint")
        .alias("i_x2"),
    )
    xy = rk.crossJoin(F.broadcast(nn)).select(
        "cnt",
        F.floor(F.log(F.col("dur").cast("double")) * 1000000)
        .cast("bigint")
        .alias("x"),
        F.expr(
            "CAST(floor(ln((CAST(5 * i_x2 - 3 AS DOUBLE) / (10 * n + 4))"
            " / (1.0 - CAST(5 * i_x2 - 3 AS DOUBLE) / (10 * n + 4)))"
            " * 1000000) AS BIGINT)"
        ).alias("y"),
    )
    mo = xy.agg(
        F.sum("cnt").cast("decimal(38,0)").alias("w"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * x")).alias("sx"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * y")).alias("sy"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * x * y")).alias("sxy"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * x * x")).alias("sxx"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * y * y")).alias("syy"),
    )
    return mo.select(
        F.col("w").cast("bigint").alias("n_gaps"),
        F.expr(
            "CAST(floor(CAST(w * sxy - sx * sy AS DOUBLE)"
            " / CAST(w * sxx - sx * sx AS DOUBLE) * 1000) AS BIGINT)"
        ).alias("shape_milli"),
        F.expr(
            "CAST(floor(exp((CAST(sx AS DOUBLE) / CAST(w AS DOUBLE)"
            " - (CAST(sy AS DOUBLE) / CAST(w AS DOUBLE))"
            "   / (CAST(w * sxy - sx * sy AS DOUBLE)"
            "      / CAST(w * sxx - sx * sx AS DOUBLE))) / 1000000)"
            " * 1000) AS BIGINT)"
        ).alias("scale_days_milli"),
        F.expr(
            "CAST(floor(CAST(w * sxy - sx * sy AS DOUBLE)"
            " * CAST(w * sxy - sx * sy AS DOUBLE)"
            " / (CAST(w * sxx - sx * sx AS DOUBLE)"
            "    * CAST(w * syy - sy * sy AS DOUBLE)) * 1000000) AS BIGINT)"
        ).alias("r2_ppm"),
    )
