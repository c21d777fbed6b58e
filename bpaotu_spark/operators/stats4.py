"""Round-8 classical-test additions II: blocked ranks, outliers,
sequential drift, ordered alternatives, actuarial intervals.

* ``friedman_test_weekday`` — Friedman's blocked rank test: is any
  weekday systematically richer, judged WITHIN each complete ISO week
  (the block design removes week-to-week trend that would swamp a
  plain k-sample test). Ranks tie-averaged in halves within blocks.
* ``grubbs_outlier_daily`` — Grubbs' maximum studentized deviate on
  the daily revenue series (which single day is most anomalous, and
  how many sigmas out) with a deterministic argmax day.
* ``page_hinkley_drift`` — the Page-Hinkley sequential drift detector
  over daily revenue: cumulative deviation from the running mean,
  alarm when PH rises λ above its running minimum — the classic
  change-point monitor (Page '54, Hinkley '71).
* ``jonckheere_terpstra_trend`` — ordered-alternative k-sample test:
  does order value rise monotonically across priority levels
  1-URGENT → 5-LOW? JT = Σ_{a<b} U_ab over the ordered groups, exact
  pair counts in halves. z uses the no-ties moment formula (cent
  ties are ~absent; the deviation is documented and engine-shared).
* ``life_table_actuarial`` — discrete actuarial life table on repeat
  purchase gaps: weekly intervals, n at risk, events, conditional
  q_ppm — the classical cohort companion to the Kaplan-Meier /
  Nelson-Aalen rows (survival.py).

Determinism: every statistic is exact-integer aggregation (cent
totals, rank halves via distinct-value cumulative tables partitioned
by block/group, interval counts); one float expression per output
column, floored to milli/ppm.

Scale shape: one or two fact scans each; rank windows partition by
block or group (parallel, no global sort); the JT value grid joins
per-group cumulative tables on the distinct-cents axis (value-
bounded); life table is a keyed census over bounded weekly intervals.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register

# ---------------------------------------------------------------------------
# friedman_test_weekday — chi2_F = 12/(n·k(k+1)) · Σ R_j² − 3n(k+1)
# over complete 7-day ISO-week blocks, ranks in halves (rank_x2).
# Σ R_j² with R in halves: Σ (R_x2/2)² = Σ R_x2² / 4 — keep Σ R_x2²
# exact and divide by 4 inside the float step.
# ---------------------------------------------------------------------------

_FRIEDMAN_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
wk AS (
  SELECT d, cents,
    CAST(yearweek(d) AS BIGINT) AS blk,
    CAST(isodow(d) AS BIGINT) AS wd
  FROM daily
),
full_wk AS (
  SELECT blk FROM wk GROUP BY blk HAVING count(*) = 7
),
x AS (SELECT wk.* FROM wk JOIN full_wk USING (blk)),
dv AS (
  SELECT blk, cents, CAST(count(*) AS BIGINT) AS cnt
  FROM x GROUP BY blk, cents
),
cum AS (
  SELECT blk, cents,
    2 * CAST(coalesce(sum(cnt) OVER (PARTITION BY blk ORDER BY cents ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      + cnt + 1 AS rank_x2
  FROM dv
),
r AS (
  SELECT wd, CAST(sum(rank_x2) AS BIGINT) AS r_x2
  FROM x JOIN cum ON x.blk = cum.blk AND x.cents = cum.cents
  GROUP BY wd
),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
    CAST(sum(CAST(r_x2 AS HUGEINT) * r_x2) AS HUGEINT) AS sum_r2_x4,
    (SELECT CAST(count(*) AS BIGINT) FROM full_wk) AS n_blocks
  FROM r
)
SELECT n_blocks, k,
  CAST(floor((12.0 * (CAST(sum_r2_x4 AS DOUBLE) / 4.0)
      / (CAST(n_blocks AS DOUBLE) * k * (k + 1))
    - 3.0 * CAST(n_blocks AS DOUBLE) * (k + 1)) * 1000) AS BIGINT)
    AS chi2_milli
FROM st
"""


@register("friedman_test_weekday", oracle=_FRIEDMAN_ORACLE)
def friedman_test_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman chi-square of daily revenue across weekdays, blocked
    by complete ISO weeks (rank windows partition by block)."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    # DuckDB yearweek() = ISO year*100 + ISO week; mirror exactly
    wk = daily.select(
        "d",
        "cents",
        F.expr(
            "CAST(extract(YEAROFWEEK FROM d) * 100"
            " + extract(WEEK FROM d) AS BIGINT)"
        ).alias("blk"),
        F.expr(
            "CAST(CASE WHEN dayofweek(d) = 1 THEN 7"
            " ELSE dayofweek(d) - 1 END AS BIGINT)"
        ).alias("wd"),
    )
    full_wk = (
        wk.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("ndays"))
        .filter(F.col("ndays") == 7)
        .select("blk")
    )
    x = wk.join(F.broadcast(full_wk), "blk")
    dv = x.groupBy("blk", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wv = (
        Window.partitionBy("blk")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = dv.select(
        "blk",
        "cents",
        (
            2 * F.coalesce(F.sum("cnt").over(wv), F.lit(0))
            + F.col("cnt")
            + 1
        )
        .cast("bigint")
        .alias("rank_x2"),
    )
    r = (
        x.join(cum, ["blk", "cents"])
        .groupBy("wd")
        .agg(F.sum("rank_x2").cast("bigint").alias("r_x2"))
    )
    nb = full_wk.agg(F.count(F.lit(1)).cast("bigint").alias("n_blocks"))
    st = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.expr("CAST(r_x2 AS DECIMAL(38,0)) * r_x2")).alias(
            "sum_r2_x4"
        ),
    )
    return st.crossJoin(F.broadcast(nb)).select(
        "n_blocks",
        "k",
        F.expr(
            "CAST(floor((12.0 * (CAST(sum_r2_x4 AS DOUBLE) / 4.0)"
            "    / (CAST(n_blocks AS DOUBLE) * k * (k + 1))"
            "  - 3.0 * CAST(n_blocks AS DOUBLE) * (k + 1)) * 1000)"
            " AS BIGINT)"
        ).alias("chi2_milli"),
    )


# ---------------------------------------------------------------------------
# grubbs_outlier_daily — G = max|x − x̄|/s with milli-floored mean
# (documented deviation, exact integer deviations) and the argmax day.
# ---------------------------------------------------------------------------

_GRUBBS_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(cents) AS HUGEINT) * 1000 // count(*) AS mean_milli
  FROM daily
),
dev AS (
  SELECT d, abs(cents * 1000 - mean_milli) AS dev_milli, n, mean_milli
  FROM daily CROSS JOIN m
),
ss AS (
  SELECT CAST(sum(CAST(dev_milli AS HUGEINT) * dev_milli) AS HUGEINT)
    AS ss_milli2
  FROM dev
),
top AS (
  SELECT d, dev_milli, n FROM dev
  ORDER BY dev_milli DESC, d ASC LIMIT 1
)
SELECT top.n AS n_days, top.d AS outlier_day,
  CAST(top.dev_milli AS BIGINT) AS max_dev_milli,
  CAST(floor(CAST(top.dev_milli AS DOUBLE)
    / sqrt(CAST(ss_milli2 AS DOUBLE) / (top.n - 1)) * 1000) AS BIGINT)
    AS g_milli
FROM top CROSS JOIN ss
"""


@register("grubbs_outlier_daily", oracle=_GRUBBS_ORACLE)
def grubbs_outlier_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' max studentized deviate on daily revenue (milli)."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(
            "CAST(sum(cents) AS DECIMAL(38,0)) * 1000 div count(*)"
        ).alias("mean_milli"),
    )
    dev = daily.crossJoin(F.broadcast(m)).select(
        "d",
        F.expr("abs(cents * 1000 - mean_milli)").alias("dev_milli"),
        "n",
    )
    ss = dev.agg(
        F.sum(F.expr("CAST(dev_milli AS DECIMAL(38,0)) * dev_milli")).alias(
            "ss_milli2"
        )
    )
    top = dev.orderBy(F.col("dev_milli").desc(), F.col("d").asc()).limit(1)
    return top.crossJoin(F.broadcast(ss)).select(
        F.col("n").alias("n_days"),
        F.col("d").alias("outlier_day"),
        F.col("dev_milli").cast("bigint").alias("max_dev_milli"),
        F.expr(
            "CAST(floor(CAST(dev_milli AS DOUBLE)"
            " / sqrt(CAST(ss_milli2 AS DOUBLE) / (n - 1)) * 1000)"
            " AS BIGINT)"
        ).alias("g_milli"),
    )


# ---------------------------------------------------------------------------
# page_hinkley_drift — PH_t = Σ_{s≤t}(x_s − x̄_s − δ) with x̄_s the
# running milli-mean; alarm when PH_t − min_{s≤t} PH_s > λ. δ=0, λ =
# 20% of the global mean (data-scaled, engine-shared). Cumulative
# windows run over the calendar-bounded daily series.
# ---------------------------------------------------------------------------

_PH_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
run AS (
  SELECT d, cents,
    CAST(sum(cents) OVER w AS HUGEINT) * 1000
      // CAST(count(*) OVER w AS HUGEINT) AS rmean_milli
  FROM daily
  WINDOW w AS (ORDER BY d ASC ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
ph AS (
  SELECT d,
    CAST(sum(cents * 1000 - rmean_milli) OVER
      (ORDER BY d ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS HUGEINT) AS ph_milli
  FROM run
),
lam AS (
  SELECT CAST(sum(cents) AS HUGEINT) * 1000 // count(*) // 5 AS lam_milli
  FROM daily
),
mn AS (
  SELECT d, ph_milli,
    CAST(min(ph_milli) OVER (ORDER BY d ASC ROWS BETWEEN UNBOUNDED
      PRECEDING AND CURRENT ROW) AS HUGEINT) AS run_min
  FROM ph
),
top AS (
  SELECT d, CAST(ph_milli - run_min AS BIGINT) AS rise_milli FROM mn
  ORDER BY (ph_milli - run_min) DESC, d ASC LIMIT 1
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
  top.d AS peak_day,
  top.rise_milli AS max_rise_milli,
  (SELECT CAST(count(*) AS BIGINT) FROM mn CROSS JOIN lam
    WHERE ph_milli - run_min > lam_milli) AS n_alarm_days,
  (SELECT CAST(lam_milli AS BIGINT) FROM lam) AS lambda_milli
FROM top
"""


@register("page_hinkley_drift", oracle=_PH_ORACLE)
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift monitor over daily revenue (milli-cents)."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    # unpartitioned window bound: calendar-bounded daily series
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    run = daily.select(
        "d",
        "cents",
        F.expr(
            "CAST(sum(cents) OVER (ORDER BY d ASC ROWS BETWEEN UNBOUNDED"
            " PRECEDING AND CURRENT ROW) AS DECIMAL(38,0)) * 1000"
            " div CAST(count(*) OVER (ORDER BY d ASC ROWS BETWEEN"
            " UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,0))"
        ).alias("rmean_milli"),
    )
    ph = run.select(
        "d",
        F.sum(F.expr("cents * 1000 - rmean_milli"))
        .over(w)
        .cast("decimal(38,0)")
        .alias("ph_milli"),
    )
    lam = daily.agg(
        F.expr(
            "CAST(sum(cents) AS DECIMAL(38,0)) * 1000 div count(*) div 5"
        ).alias("lam_milli")
    )
    mn = ph.select(
        "d",
        "ph_milli",
        F.min("ph_milli").over(w).cast("decimal(38,0)").alias("run_min"),
    )
    top = (
        mn.select(
            "d", F.expr("CAST(ph_milli - run_min AS BIGINT)").alias("rise_milli")
        )
        .orderBy(F.col("rise_milli").desc(), F.col("d").asc())
        .limit(1)
    )
    nd = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    alarms = (
        mn.crossJoin(F.broadcast(lam))
        .filter(F.expr("ph_milli - run_min > lam_milli"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_alarm_days"))
    )
    return (
        top.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(alarms))
        .crossJoin(F.broadcast(lam))
        .select(
            "n_days",
            F.col("d").alias("peak_day"),
            F.col("rise_milli").alias("max_rise_milli"),
            "n_alarm_days",
            F.col("lam_milli").cast("bigint").alias("lambda_milli"),
        )
    )


# ---------------------------------------------------------------------------
# jonckheere_terpstra_trend — JT = Σ_{a<b} U_ab across priority levels
# ordered 1..5; U in halves via per-group cumulative counts on the
# GLOBAL distinct-cents grid (carry-forward per group), so U_ab_x2 =
# Σ_v cnt_b(v)·(2·cumlt_a(v) + cnt_a(v)).
# ---------------------------------------------------------------------------

_JT_ORACLE = """
WITH x AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
vals AS (SELECT DISTINCT cents FROM x),
grps AS (SELECT DISTINCT g FROM x),
grid AS (
  SELECT g, cents, coalesce(cnt, 0) AS cnt
  FROM (SELECT g, cents FROM grps CROSS JOIN vals)
  LEFT JOIN (SELECT g AS gg, cents AS cc, CAST(count(*) AS BIGINT) AS cnt
             FROM x GROUP BY 1, 2)
    ON g = gg AND cents = cc
),
cum AS (
  SELECT g, cents, cnt,
    CAST(coalesce(sum(cnt) OVER (PARTITION BY g ORDER BY cents ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cumlt
  FROM grid
),
jt AS (
  SELECT CAST(sum(CAST(b.cnt AS HUGEINT)
      * (2 * a.cumlt + a.cnt)) AS HUGEINT) AS jt_x2
  FROM cum a JOIN cum b ON a.cents = b.cents AND a.g < b.g
),
ng AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g FROM x GROUP BY g),
mom AS (
  SELECT CAST(sum(n_g) AS HUGEINT) AS n,
    CAST(sum(CAST(n_g AS HUGEINT) * n_g) AS HUGEINT) AS sum_n2,
    CAST(sum(CAST(n_g AS HUGEINT) * n_g * (2 * n_g + 3)) AS HUGEINT)
      AS sum_n23
  FROM ng
)
SELECT CAST(n AS BIGINT) AS n_orders,
  (SELECT CAST(count(*) AS BIGINT) FROM grps) AS k_groups,
  CAST(jt_x2 AS BIGINT) AS jt_x2,
  CAST(floor((CAST(jt_x2 AS DOUBLE) / 2.0
      - (CAST(n AS DOUBLE) * n - CAST(sum_n2 AS DOUBLE)) / 4.0)
    / sqrt((CAST(n AS DOUBLE) * n * (2 * CAST(n AS DOUBLE) + 3)
            - CAST(sum_n23 AS DOUBLE)) / 72.0) * 1000) AS BIGINT)
    AS z_milli
FROM jt CROSS JOIN mom
"""


@register("jonckheere_terpstra_trend", oracle=_JT_ORACLE)
def jonckheere_terpstra_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """JT ordered-trend test of order value across priority levels."""
    x = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").alias(
            "g"
        ),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    vals = x.select("cents").distinct()
    grps = x.select("g").distinct()
    counts = x.groupBy("g", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    grid = (
        grps.crossJoin(vals)
        .join(counts, ["g", "cents"], "left")
        .select(
            "g", "cents", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
        )
    )
    wg = (
        Window.partitionBy("g")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grid.select(
        "g",
        "cents",
        "cnt",
        F.coalesce(F.sum("cnt").over(wg), F.lit(0))
        .cast("bigint")
        .alias("cumlt"),
    )
    ca = cum.select(
        F.col("g").alias("ga"),
        "cents",
        F.col("cnt").alias("cnt_a"),
        F.col("cumlt").alias("cumlt_a"),
    )
    cb = cum.select(
        F.col("g").alias("gb"),
        F.col("cents").alias("cents_b"),
        F.col("cnt").alias("cnt_b"),
    )
    jt = (
        ca.join(
            cb,
            (ca.cents == cb.cents_b) & (ca.ga < cb.gb),
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(cnt_b AS DECIMAL(38,0)) * (2 * cumlt_a + cnt_a)"
                )
            ).alias("jt_x2")
        )
    )
    ng = x.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("n_g"))
    mom = ng.agg(
        F.sum("n_g").cast("decimal(38,0)").alias("n"),
        F.sum(F.expr("CAST(n_g AS DECIMAL(38,0)) * n_g")).alias("sum_n2"),
        F.sum(
            F.expr("CAST(n_g AS DECIMAL(38,0)) * n_g * (2 * n_g + 3)")
        ).alias("sum_n23"),
    )
    kg = grps.agg(F.count(F.lit(1)).cast("bigint").alias("k_groups"))
    return (
        jt.crossJoin(F.broadcast(mom))
        .crossJoin(F.broadcast(kg))
        .select(
            F.col("n").cast("bigint").alias("n_orders"),
            "k_groups",
            F.col("jt_x2").cast("bigint").alias("jt_x2"),
            F.expr(
                "CAST(floor((CAST(jt_x2 AS DOUBLE) / 2.0"
                "    - (CAST(n AS DOUBLE) * n - CAST(sum_n2 AS DOUBLE))"
                "      / 4.0)"
                "  / sqrt((CAST(n AS DOUBLE) * n * (2 * CAST(n AS DOUBLE)"
                "          + 3) - CAST(sum_n23 AS DOUBLE)) / 72.0)"
                "  * 1000) AS BIGINT)"
            ).alias("z_milli"),
        )
    )


# ---------------------------------------------------------------------------
# life_table_actuarial — weekly-interval life table of repeat-purchase
# gaps: n at risk, events, conditional q in ppm, per interval; open
# interval 10+ weeks absorbs the tail (no censoring in gap data — all
# observed gaps are events; n_risk shrinks as gaps resolve earlier).
# ---------------------------------------------------------------------------

_LIFE_ORACLE = """
WITH gaps AS (
  SELECT date_diff('day',
      lag(CAST(o_orderdate AS DATE)) OVER
        (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      CAST(o_orderdate AS DATE)) AS gap
  FROM orders
),
g AS (SELECT gap FROM gaps WHERE gap IS NOT NULL),
iv AS (
  SELECT least(CAST(gap AS BIGINT) // 7, 10) AS ivl FROM g
),
d AS (
  SELECT ivl, CAST(count(*) AS BIGINT) AS n_events FROM iv GROUP BY ivl
),
r AS (
  SELECT ivl, n_events,
    CAST(sum(n_events) OVER (ORDER BY ivl DESC ROWS BETWEEN UNBOUNDED
      PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
  FROM d
)
SELECT ivl * 7 AS interval_start_days, n_risk, n_events,
  n_events * 1000000 // n_risk AS q_ppm
FROM r ORDER BY ivl
"""


@register("life_table_actuarial", oracle=_LIFE_ORACLE)
def life_table_actuarial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly actuarial life table over repeat-purchase gaps."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = od.select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap")
    ).filter(F.col("gap").isNotNull())
    iv = gaps.select(
        F.expr("least(CAST(gap AS BIGINT) div 7, CAST(10 AS BIGINT))").alias(
            "ivl"
        )
    )
    d = iv.groupBy("ivl").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    # unpartitioned window bound: ≤11 weekly-interval rows
    wr = Window.orderBy(F.col("ivl").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    r = d.select(
        "ivl",
        "n_events",
        F.sum("n_events").over(wr).cast("bigint").alias("n_risk"),
    )
    return r.select(
        (F.col("ivl") * 7).cast("bigint").alias("interval_start_days"),
        "n_risk",
        "n_events",
        F.expr("n_events * CAST(1000000 AS BIGINT) div n_risk").alias(
            "q_ppm"
        ),
    ).orderBy("interval_start_days")
