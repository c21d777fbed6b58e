"""Robust statistics and distribution audits over the sales facts.

* ``benford_first_digit`` — Benford's-law conformance of order
  totals: observed first-significant-digit shares vs the log10(1+1/d)
  expectation, delta in ppm (the classic books-cooking / synthetic-
  data tell, run as a data-quality audit).
* ``theil_inequality`` — Theil T inequality of customer revenue per
  nation plus the between/within decomposition row (T_total =
  T_between + Σ share·T_within — the decomposable inequality index,
  unlike Gini). Integer micro-nats end-to-end.
* ``trimmed_mean_by_segment`` — 5 %-trimmed mean of order totals per
  mktsegment vs the raw mean (the robust-location comparison that
  survives heavy tails; rank-selection definition, exact in both
  engines — the median_exact_by_segment pattern).
* ``daily_autocorrelation`` — lag-k autocorrelation (k = 1, 7, 14) of
  the daily order count series: the weekly-seasonality detector.
  Daily counts are integers, so all three Pearson moments are exact
  BIGINT sums; only the final quotient is floored to milli.

Scale shapes: benford/theil = map-side digit/ln extraction + small
keyed aggs; trimmed mean = segment-partitioned rank window (the
documented per-group order-statistic pattern); autocorrelation =
calendar-bounded daily series self-joined at 3 fixed lags.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register

# ---------------------------------------------------------------------------
# benford_first_digit
# ---------------------------------------------------------------------------

_BENFORD_PPM = {
    d: int(math.log10(1 + 1 / d) * 1_000_000) for d in range(1, 10)
}
_BENFORD_CASE = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()
) + " END"


@register(
    "benford_first_digit",
    oracle=f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
    1, 1) AS BIGINT) AS first_digit
  FROM orders WHERE o_totalprice >= 1
),
c AS (
  SELECT first_digit, CAST(count(*) AS BIGINT) AS n_orders FROM d
  GROUP BY first_digit
),
tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n FROM c)
SELECT first_digit, n_orders,
  (n_orders * 1000000) // n AS observed_ppm,
  CAST({_BENFORD_CASE} AS BIGINT) AS benford_ppm,
  (n_orders * 1000000) // n - CAST({_BENFORD_CASE} AS BIGINT) AS delta_ppm
FROM c, tot
""",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    d = od.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("first_digit")
    )
    c = d.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n_orders"))
    tot = c.agg(F.sum("n_orders").alias("n"))
    return c.crossJoin(F.broadcast(tot)).select(
        "first_digit",
        "n_orders",
        F.expr("(n_orders * 1000000) div n").alias("observed_ppm"),
        F.expr(f"CAST({_BENFORD_CASE} AS BIGINT)").alias("benford_ppm"),
        F.expr(
            f"(n_orders * 1000000) div n - CAST({_BENFORD_CASE} AS BIGINT)"
        ).alias("delta_ppm"),
    )


# ---------------------------------------------------------------------------
# theil_inequality — x_i = customer revenue cents; groups = nation.
# T_g = (1/n_g) Σ (x_i/μ_g)·ln(x_i/μ_g); the TOTAL row carries
# T_between = Σ s_g·ln(μ_g/μ) with s_g the group revenue share.
# Each ln() is floored to micro-nats on the identical double ratio in
# both engines; the revenue-share weights are exact integer cents.
# ---------------------------------------------------------------------------


@register(
    "theil_inequality",
    oracle="""
WITH x AS (
  SELECT c_nationkey AS nation, o_custkey,
    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey, o_custkey
),
g AS (
  SELECT nation, CAST(count(*) AS BIGINT) AS n_custs,
    CAST(sum(cents) AS BIGINT) AS g_cents
  FROM x GROUP BY nation
),
tot AS (
  SELECT CAST(sum(n_custs) AS BIGINT) AS n,
    CAST(sum(g_cents) AS BIGINT) AS t_cents
  FROM g
),
within AS (
  SELECT x.nation,
    CAST(sum(
      (x.cents * 1000000 // g.g_cents)
      * CAST(floor(ln(x.cents * 1.0 * g.n_custs / g.g_cents) * 1000000)
          AS BIGINT)
    ) AS BIGINT) // 1000000 AS theil_micro
  FROM x JOIN g ON x.nation = g.nation
  GROUP BY x.nation
),
between_t AS (
  SELECT CAST(sum(
    (g_cents * 1000000 // t_cents)
    * CAST(floor(ln(g_cents * 1.0 * n / (t_cents * n_custs)) * 1000000)
        AS BIGINT)
  ) AS BIGINT) // 1000000 AS theil_micro
  FROM g, tot
)
SELECT CAST(nation AS BIGINT) AS nation, n_custs, g_cents AS revenue_cents,
  w.theil_micro
FROM g JOIN within w USING (nation)
UNION ALL
SELECT -1, n, t_cents, b.theil_micro
FROM tot, between_t b
""",
)
def theil_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cu = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nation"),
    )
    x = (
        od.join(cu, "o_custkey")
        .groupBy("nation", "o_custkey")
        .agg(F.sum("cents").alias("cents"))
    )
    g = x.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.sum("cents").alias("g_cents"),
    )
    tot = g.agg(
        F.sum("n_custs").alias("n"), F.sum("g_cents").alias("t_cents")
    )
    within = (
        x.join(F.broadcast(g), "nation")
        .select(
            "nation",
            (
                F.expr("cents * 1000000 div g_cents")
                * F.floor(
                    F.log(
                        F.col("cents")
                        * 1.0
                        * F.col("n_custs")
                        / F.col("g_cents")
                    )
                    * 1000000
                ).cast("bigint")
            ).alias("term"),
        )
        .groupBy("nation")
        .agg(F.expr("sum(term) div 1000000").alias("theil_micro"))
    )
    nation_rows = (
        g.join(within, "nation")
        .select(
            F.col("nation").cast("bigint").alias("nation"),
            "n_custs",
            F.col("g_cents").alias("revenue_cents"),
            "theil_micro",
        )
    )
    between_row = (
        g.crossJoin(F.broadcast(tot))
        .select(
            (
                F.expr("g_cents * 1000000 div t_cents")
                * F.floor(
                    F.log(
                        F.col("g_cents")
                        * 1.0
                        * F.col("n")
                        / (F.col("t_cents") * F.col("n_custs"))
                    )
                    * 1000000
                ).cast("bigint")
            ).alias("term"),
            "n",
            "t_cents",
        )
        .groupBy("n", "t_cents")
        .agg(F.expr("sum(term) div 1000000").alias("theil_micro"))
        .select(
            F.lit(-1).cast("bigint").alias("nation"),
            F.col("n").alias("n_custs"),
            F.col("t_cents").alias("revenue_cents"),
            "theil_micro",
        )
    )
    return nation_rows.unionAll(between_row)


# ---------------------------------------------------------------------------
# trimmed_mean_by_segment
# ---------------------------------------------------------------------------


@register(
    "trimmed_mean_by_segment",
    oracle="""
WITH j AS (
  SELECT c_mktsegment,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
    o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey
),
r AS (
  SELECT c_mktsegment, cents,
    row_number() OVER (PARTITION BY c_mktsegment
                       ORDER BY cents, o_orderkey) AS rn,
    count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM j
)
SELECT c_mktsegment,
  CAST(max(n) AS BIGINT) AS n_orders,
  CAST(sum(cents) AS BIGINT) // CAST(max(n) AS BIGINT) AS mean_cents,
  CAST(sum(CASE WHEN rn > n // 20 AND rn <= n - n // 20
    THEN cents ELSE 0 END) AS BIGINT)
    // CAST(max(n) - 2 * (max(n) // 20) AS BIGINT) AS trimmed_mean_cents
FROM r GROUP BY c_mktsegment
""",
)
def trimmed_mean_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cu = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    j = od.join(F.broadcast(cu), "o_custkey")
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("c_mktsegment")
    r = j.select(
        "c_mktsegment",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return r.groupBy("c_mktsegment").agg(
        F.max("n").cast("bigint").alias("n_orders"),
        F.expr("sum(cents) div max(n)").alias("mean_cents"),
        F.expr(
            "sum(CASE WHEN rn > n div 20 AND rn <= n - n div 20"
            " THEN cents ELSE 0 END)"
            " div (max(n) - 2 * (max(n) div 20))"
        ).alias("trimmed_mean_cents"),
    )


# ---------------------------------------------------------------------------
# daily_autocorrelation
# ---------------------------------------------------------------------------

_LAGS = (1, 7, 14)


@register(
    "daily_autocorrelation",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT lag.k, a.c AS x, b.c AS y
  FROM daily a
  JOIN (SELECT unnest([{", ".join(str(k) for k in _LAGS)}]) AS k) lag ON true
  JOIN daily b ON b.d = a.d + CAST(lag.k AS INTEGER)
)
SELECT CAST(k AS BIGINT) AS lag_days,
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(floor((count(*) * sum(x * y) - sum(x) * sum(y)) * 1000
    / (sqrt(count(*) * sum(x * x) - sum(x) * sum(x))
       * sqrt(count(*) * sum(y * y) - sum(y) * sum(y)))) AS BIGINT)
    AS pearson_milli
FROM lagged GROUP BY k
""",
)
def daily_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    lags = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in _LAGS])).alias("k")
    )
    a = daily.crossJoin(F.broadcast(lags))
    b = daily.select(
        F.col("d").alias("d2"), F.col("c").alias("y")
    )
    lagged = a.join(
        b, F.expr("d2 = date_add(d, CAST(k AS INT))")
    ).select("k", F.col("c").alias("x"), "y")
    # all Pearson moments over integer daily counts are exact BIGINTs;
    # the sqrt/quotient runs once per lag on those exact sums
    return lagged.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr(
            "CAST(floor((count(*) * sum(x * y) - sum(x) * sum(y)) * 1000"
            " / (sqrt(count(*) * sum(x * x) - sum(x) * sum(x))"
            "    * sqrt(count(*) * sum(y * y) - sum(y) * sum(y))))"
            " AS BIGINT)"
        ).alias("pearson_milli"),
    ).select(
        F.col("k").cast("bigint").alias("lag_days"),
        "n_pairs",
        "pearson_milli",
    )


# ---------------------------------------------------------------------------
# event_burstiness_fano — Fano factor (variance-to-mean ratio) of the
# per-hour event counts, per event type: F ≈ 1 → Poisson arrivals,
# F >> 1 → bursty/clumped traffic (the dispersion diagnostic that
# decides whether rate alarms can assume Poisson noise). Hourly counts
# are integers, so both moments are exact BIGINT sums; the ratio is
# floored to milli once.
# ---------------------------------------------------------------------------


@register(
    "event_burstiness_fano",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
    CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_hours,
  CAST(sum(c) AS BIGINT) AS n_events,
  CAST(floor(
    (count(*) * CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE)
      - CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE))
    * 1000 / (CAST(count(*) AS DOUBLE) * CAST(sum(c) AS DOUBLE))
  ) AS BIGINT) AS fano_milli
FROM hourly GROUP BY event_type
""",
)
def event_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    return hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("c").alias("n_events"),
        F.expr(
            "CAST(floor("
            " (count(*) * CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DOUBLE)"
            "   - CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE))"
            " * 1000 / (CAST(count(*) AS DOUBLE) * CAST(sum(c) AS DOUBLE))"
            ") AS BIGINT)"
        ).alias("fano_milli"),
    )


# ---------------------------------------------------------------------------
# pareto_tail_alpha — Hill/MLE estimate of the Pareto tail exponent of
# order values above a deterministic threshold (2× the mean):
# α̂ = n_tail / Σ ln(x/xmin). The heavy-tail diagnostic behind
# capacity planning (does the top percentile dominate revenue?).
# The threshold is an exact integer-cents broadcast scalar; each
# ln(x/xmin) is floored to micro-nats before the sum.
# ---------------------------------------------------------------------------


@register(
    "pareto_tail_alpha",
    oracle="""
WITH c AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
thr AS (
  SELECT (CAST(sum(cents) AS BIGINT) // count(*)) * 2 AS xmin FROM c
),
tail AS (
  SELECT cents, xmin,
    CAST(floor(ln(cents * 1.0 / xmin) * 1000000) AS BIGINT) AS ln_ratio
  FROM c, thr WHERE cents > xmin
)
SELECT CAST(count(*) AS BIGINT) AS n_tail,
  CAST(max(xmin) AS BIGINT) AS xmin_cents,
  CAST(sum(ln_ratio) AS BIGINT) AS sum_ln_micro,
  (CAST(count(*) AS BIGINT) * 1000000000) // CAST(sum(ln_ratio) AS BIGINT)
    AS alpha_milli
FROM tail
""",
)
def pareto_tail_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    thr = c.agg(
        (F.expr("sum(cents) div count(*)") * 2).alias("xmin")
    )
    tail = (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("cents") > F.col("xmin"))
        .select(
            "xmin",
            F.floor(F.log(F.col("cents") * 1.0 / F.col("xmin")) * 1000000)
            .cast("bigint")
            .alias("ln_ratio"),
        )
    )
    return tail.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.max("xmin").cast("bigint").alias("xmin_cents"),
        F.sum("ln_ratio").alias("sum_ln_micro"),
        F.expr(
            "(count(*) * 1000000000) div sum(ln_ratio)"
        ).alias("alpha_milli"),
    )


# ---------------------------------------------------------------------------
# order_size_dispersion — the lines-per-order distribution with its
# Poisson-dispersion verdict: histogram of order sizes + mean/variance
# Fano in exact milli (clumped order composition breaks the uniform-
# work assumption task schedulers make; this is the check).
# ---------------------------------------------------------------------------


@register(
    "order_size_dispersion",
    oracle="""
WITH sz AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey
)
SELECT n_lines,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(count(*)) OVER () AS BIGINT) AS total_orders,
  (CAST(count(*) AS BIGINT) * 1000000)
    // CAST(sum(count(*)) OVER () AS BIGINT) AS share_ppm
FROM sz GROUP BY n_lines
""",
)
def order_size_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    sz = load_table(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    hist = sz.groupBy("n_lines").agg(F.count(F.lit(1)).alias("n_orders"))
    tot = hist.agg(F.sum("n_orders").alias("total_orders"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "n_lines",
        "n_orders",
        "total_orders",
        F.expr("(n_orders * 1000000) div total_orders").alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# error_budget_burn — SRE error-budget monitor on the event stream:
# daily error share (ppm of all events), the trailing-7-day share, and
# the burn flag vs a 1% SLO. Calendar-bounded windows; integer ppm.
# ---------------------------------------------------------------------------

_SLO_PPM = 10_000  # 1% error budget


@register(
    "error_budget_burn",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
    CAST(count(*) AS BIGINT) AS n_events,
    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_errors
  FROM events GROUP BY 1
),
win AS (
  SELECT d, n_events, n_errors,
    CAST(sum(n_events) OVER w AS BIGINT) AS n7_events,
    CAST(sum(n_errors) OVER w AS BIGINT) AS n7_errors
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT d, n_events, n_errors,
  (n_errors * 1000000) // n_events AS day_error_ppm,
  (n7_errors * 1000000) // n7_events AS week_error_ppm,
  (n7_errors * 1000000) // n7_events > {_SLO_PPM} AS burn_alert
FROM win
""",
)
def error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = load_table(spark, sf_dir, "events").groupBy(
        F.col("ts").cast("date").alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_errors"
        ),
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    win = daily.select(
        "d",
        "n_events",
        "n_errors",
        F.sum("n_events").over(w).cast("bigint").alias("n7_events"),
        F.sum("n_errors").over(w).cast("bigint").alias("n7_errors"),
    )
    return win.select(
        "d",
        "n_events",
        "n_errors",
        F.expr("(n_errors * 1000000) div n_events").alias("day_error_ppm"),
        F.expr("(n7_errors * 1000000) div n7_events").alias(
            "week_error_ppm"
        ),
        (
            F.expr("(n7_errors * 1000000) div n7_events") > _SLO_PPM
        ).alias("burn_alert"),
    )


# ---------------------------------------------------------------------------
# winsorized_mean_by_segment — the clamp-the-tails sibling of
# trimmed_mean_by_segment: instead of DROPPING the bottom/top 5%, each
# tail observation is replaced by the boundary order statistic
# (rank k+1 from below, rank n−k from above, k = n//20), so the
# estimator keeps n observations and a bounded tail influence — the
# robust mean of choice when the tail mass itself carries signal
# (revenue!) but single outliers must not dominate. Winsorized sum =
# mid-sum + k·low + k·high — three aggregates over one ranked pass.
#
# Exactness: floor-cents, rank ties broken on o_orderkey, floor-DIV
# means — identical in both engines.
#
# Scale shape: one broadcast dim join + one segment-partitioned rank
# window + one groupBy — same plan family as the trimmed mean.
# ---------------------------------------------------------------------------


@register(
    "winsorized_mean_by_segment",
    oracle="""
WITH j AS (
  SELECT c_mktsegment,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
    o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey
),
r AS (
  SELECT c_mktsegment, cents,
    row_number() OVER (PARTITION BY c_mktsegment
                       ORDER BY cents, o_orderkey) AS rn,
    count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM j
)
SELECT c_mktsegment,
  CAST(max(n) AS BIGINT) AS n_orders,
  CAST(max(n) // 20 AS BIGINT) AS k_winsorized_per_tail,
  CAST(max(CASE WHEN rn = n // 20 + 1 THEN cents END) AS BIGINT)
    AS low_clamp_cents,
  CAST(max(CASE WHEN rn = n - n // 20 THEN cents END) AS BIGINT)
    AS high_clamp_cents,
  CAST((sum(CASE WHEN rn > n // 20 AND rn <= n - n // 20
              THEN cents ELSE 0 END)
        + (max(n) // 20) * max(CASE WHEN rn = n // 20 + 1
                               THEN cents END)
        + (max(n) // 20) * max(CASE WHEN rn = n - n // 20
                               THEN cents END)) AS BIGINT)
    // CAST(max(n) AS BIGINT) AS winsorized_mean_cents
FROM r GROUP BY c_mktsegment
""",
)
def winsorized_mean_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """5%-winsorized mean order value per market segment:
    (c_mktsegment, n_orders, k_winsorized_per_tail, low/high clamp,
    winsorized_mean_cents) — exact floor-cents."""
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cu = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    j = od.join(F.broadcast(cu), "o_custkey")
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("c_mktsegment")
    r = j.select(
        "c_mktsegment",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return r.groupBy("c_mktsegment").agg(
        F.max("n").cast("bigint").alias("n_orders"),
        F.expr("CAST(max(n) div 20 AS BIGINT)").alias(
            "k_winsorized_per_tail"
        ),
        F.expr(
            "CAST(max(CASE WHEN rn = n div 20 + 1 THEN cents END)"
            " AS BIGINT)"
        ).alias("low_clamp_cents"),
        F.expr(
            "CAST(max(CASE WHEN rn = n - n div 20 THEN cents END)"
            " AS BIGINT)"
        ).alias("high_clamp_cents"),
        F.expr(
            "CAST((sum(CASE WHEN rn > n div 20 AND rn <= n - n div 20"
            " THEN cents ELSE 0 END)"
            " + (max(n) div 20) * max(CASE WHEN rn = n div 20 + 1"
            " THEN cents END)"
            " + (max(n) div 20) * max(CASE WHEN rn = n - n div 20"
            " THEN cents END)) AS BIGINT)"
            " div CAST(max(n) AS BIGINT)"
        ).alias("winsorized_mean_cents"),
    )
