"""Round-5 OLAP additions: operational time-series shapes.

Reference analogue: bpaotu's results pages are point-in-time SQL
(public path ``bpaotu/otu/query.py``); these operators add the
*operational* time-series queries a production deployment of the same
store runs on its ingest side — backlog tracking and robust anomaly
flags — expressed as Catalyst-friendly plans with the repo's exactness
discipline (decimal money partials, integer cents for order-statistic
arithmetic, bounded calendar windows only after full map-side
aggregation).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register

DEC = "decimal(18,6)"


# ---------------------------------------------------------------------------
# orders_open_backlog_daily — work-in-progress inventory over time: for
# every calendar day, how many orders have been placed but not yet
# fully shipped (last lineitem ship date still in the future). The
# event-sourcing "reconstruct state from deltas" shape: two map-side
# aggregated delta streams (opens by order date, closes by last ship
# date) merged onto a calendar spine with cumulative windows.
#
# Scale shape: both delta aggregations collapse the fact tables to at
# most one row per day BEFORE any window; the cumulative window runs
# on the bounded calendar spine (~2.4k rows for 7 years — the same
# value-bounded single-partition window class as moving_avg_window,
# documented there). No join touches two fact-sized inputs.
# ---------------------------------------------------------------------------


@register(
    "orders_open_backlog_daily",
    oracle="""
WITH opens AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
  FROM orders GROUP BY 1
),
closes AS (
  SELECT CAST(last_ship AS DATE) AS day, count(*) AS n
  FROM (
    SELECT l_orderkey, max(l_shipdate) AS last_ship
    FROM lineitem GROUP BY l_orderkey
  ) GROUP BY 1
),
spine AS (
  SELECT unnest(generate_series(
    (SELECT min(day) FROM opens),
    greatest((SELECT max(day) FROM opens), (SELECT max(day) FROM closes)),
    INTERVAL 1 DAY)) AS day
)
SELECT strftime(s.day, '%Y-%m-%d') AS day,
  CAST(coalesce(o.n, 0) AS BIGINT) AS n_opened,
  CAST(coalesce(c.n, 0) AS BIGINT) AS n_closed,
  CAST(sum(coalesce(o.n, 0)) OVER w - sum(coalesce(c.n, 0)) OVER w AS BIGINT)
    AS n_open
FROM spine s
LEFT JOIN opens o ON o.day = CAST(s.day AS DATE)
LEFT JOIN closes c ON c.day = CAST(s.day AS DATE)
WINDOW w AS (ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with no lineitems never close; the driver generator emits
    lineitems for every order, and both engines agree on the open tail
    either way (identical left-join semantics)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    opens = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_opened"))
    closes = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .groupBy(F.col("last_ship").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_closed"))
    )
    # calendar spine: one broadcast row of bounds → sequence+explode
    bounds = opens.agg(F.min("day").alias("lo")).crossJoin(
        F.broadcast(
            closes.select(F.col("day").alias("cday"))
            .unionByName(opens.select(F.col("day").alias("cday")))
            .agg(F.max("cday").alias("hi"))
        )
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    # unpartitioned window bound: day-grain spine (<= ~2,600 rows)
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    merged = (
        spine.join(opens, "day", "left")
        .join(closes, "day", "left")
        .na.fill({"n_opened": 0, "n_closed": 0})
    )
    return merged.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_opened").cast("bigint").alias("n_opened"),
        F.col("n_closed").cast("bigint").alias("n_closed"),
        (F.sum("n_opened").over(w) - F.sum("n_closed").over(w))
        .cast("bigint")
        .alias("n_open"),
    )


# ---------------------------------------------------------------------------
# robust_anomaly_mad — median/MAD anomaly flags on daily revenue: the
# robust twin of daily_revenue_anomaly (mean/std is distorted by the
# very outliers it hunts; median/MAD is not — Leys et al. 2013, the
# standard robust-outlier recommendation). Trailing 7-day window per
# day: med = median(revenue), MAD = median(|x - med|), flag when
# |x - med| > 3 · MAD.
#
# Exactness: revenue in integer CENTS; a 7-element median is the 4th
# order statistic of a sorted integer array — computed identically in
# both engines via sorted-list indexing (never a float quantile
# estimator, whose interpolation rules differ). Flag compare is
# integer·integer so no rounding anywhere. 2·median is used instead of
# median (odd/even windows stay integral).
#
# Scale shape: the window operates on the bounded daily series (one
# row per day after a map-combined aggregate); the 7-element
# collect_list per row is constant-size. Same value-bounded window
# class as moving_avg_window.
# ---------------------------------------------------------------------------

_MAD_K = 3  # flag threshold: |x - med| > 3 * MAD


@register(
    "robust_anomaly_mad",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
    CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))) * 100, 0) AS BIGINT)
      AS cents
  FROM orders GROUP BY 1
),
win AS (
  SELECT day, cents,
    list_sort(list(cents) OVER w) AS arr
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
),
med AS (
  -- 2*median of a sorted integer list: sum of the two middle elements
  -- (equal when odd length), so the value stays integral
  SELECT day, cents, arr, len(arr) AS n,
    arr[(len(arr) + 1) // 2] + arr[len(arr) // 2 + 1] AS med2
  FROM win
),
dev AS (
  SELECT day, cents, n, med2,
    list_sort(list_transform(arr, x -> abs(2 * x - med2))) AS devs
  FROM med
)
SELECT strftime(day, '%Y-%m-%d') AS day,
  cents AS revenue_cents,
  CAST(med2 AS BIGINT) AS med2_cents,
  CAST(devs[(n + 1) // 2] + devs[n // 2 + 1] AS BIGINT) AS mad4_cents,
  (n >= 7 AND
   2 * abs(2 * cents - med2) > {_MAD_K} * (devs[(n + 1) // 2] + devs[n // 2 + 1]))
    AS is_anomaly
FROM dev
""",
)
def robust_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """med2 = 2·median(window), mad4 = 2·median(|2x - med2|) = 4·MAD;
    the flag compares 2·|2x - med2| (= 4·|x - med|) against
    _MAD_K · mad4 (= 3 · 4·MAD) — every quantity integral, zero
    rounding. Warm-up days (window < 7) are never flagged."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.round(F.sum(F.col("o_totalprice").cast(DEC)) * 100, 0)
        .cast("bigint")
        .alias("cents")
    )
    # unpartitioned window bound: day-grain series (<= ~2,600 rows)
    w = Window.orderBy("day").rowsBetween(-6, 0)
    arr = F.array_sort(F.collect_list("cents").over(w))
    win = daily.select("day", "cents", arr.alias("arr"), F.size(arr).alias("n"))
    med2 = F.element_at("arr", ((F.col("n") + 1) / 2).cast("int")) + F.element_at(
        "arr", (F.col("n") / 2).cast("int") + 1
    )
    step = win.select("day", "cents", "arr", "n", med2.alias("med2"))
    devs = F.array_sort(
        F.transform("arr", lambda x: F.abs(2 * x - F.col("med2")))
    )
    step2 = step.select("day", "cents", "n", "med2", devs.alias("devs"))
    mad4 = F.element_at("devs", ((F.col("n") + 1) / 2).cast("int")) + F.element_at(
        "devs", (F.col("n") / 2).cast("int") + 1
    )
    return step2.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("cents").alias("revenue_cents"),
        F.col("med2").cast("bigint").alias("med2_cents"),
        mad4.cast("bigint").alias("mad4_cents"),
        (
            (F.col("n") >= 7)
            & (2 * F.abs(2 * F.col("cents") - F.col("med2")) > _MAD_K * mad4)
        ).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# revenue_seasonality_weekday — weekday seasonality index: each ISO
# weekday's average daily revenue relative to the overall daily
# average, in exact ppm. The demand-profile statistic behind staffing
# and capacity plans. DECIMAL daily sums keep the per-day revenue
# associative; the index is integer cents arithmetic end-to-end.
#
# Scale shape: one map-combined daily aggregate, then a 7-row weekday
# aggregate with a broadcast 1-row overall mean. Nothing beyond the
# first aggregate scales with the fact table.
# ---------------------------------------------------------------------------


@register(
    "revenue_seasonality_weekday",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
    CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))) * 100, 0) AS BIGINT)
      AS cents
  FROM orders GROUP BY 1
),
wd AS (
  SELECT CAST(isodow(day) AS BIGINT) AS dow,
    count(*) AS n_days,
    CAST(sum(cents) AS BIGINT) AS total_cents
  FROM daily GROUP BY 1
),
overall AS (
  SELECT CAST(sum(cents) AS BIGINT) AS all_cents,
    CAST(count(*) AS BIGINT) AS all_days
  FROM daily
)
SELECT dow, n_days, total_cents,
  -- 128-bit intermediates: cents·days·1e6 passes 2^63 from ~sf0.03 on
  -- (HUGEINT here, DECIMAL(38,0) in Spark — verified to agree exactly)
  CAST((CAST(total_cents AS HUGEINT) * all_days * 1000000)
       // (CAST(n_days AS HUGEINT) * all_cents) AS BIGINT)
    AS seasonality_ppm
FROM wd CROSS JOIN overall
""",
)
def revenue_seasonality_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.round(F.sum(F.col("o_totalprice").cast(DEC)) * 100, 0)
        .cast("bigint")
        .alias("cents")
    )
    wd = daily.groupBy(
        (F.weekday("day") + 1).cast("bigint").alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )
    overall = daily.agg(
        F.sum("cents").cast("bigint").alias("all_cents"),
        F.count(F.lit(1)).cast("bigint").alias("all_days"),
    )
    return wd.crossJoin(F.broadcast(overall)).select(
        "dow",
        "n_days",
        "total_cents",
        F.expr(
            "CAST((CAST(total_cents AS DECIMAL(38,0)) * all_days * 1000000)"
            " DIV (CAST(n_days AS DECIMAL(38,0)) * all_cents) AS BIGINT)"
        ).alias("seasonality_ppm"),
    )


# ---------------------------------------------------------------------------
# order_fulfillment_latency — order-to-last-ship latency distribution
# per order priority: day-bucketed histogram plus exact mean in
# integer days. The SLA page for the fulfillment pipeline, and the
# per-order dual of orders_open_backlog_daily's aggregate view.
#
# Scale shape: per-order max-aggregation (map-side combined) → one row
# per order; the histogram is a bounded (priority × latency-bucket)
# aggregate. The orders join is keyed on the natural key; no windows.
# ---------------------------------------------------------------------------

_LAT_BUCKET_DAYS = 30


@register(
    "order_fulfillment_latency",
    oracle=f"""
WITH last_ship AS (
  SELECT l_orderkey, max(l_shipdate) AS ls FROM lineitem GROUP BY l_orderkey
),
lat AS (
  SELECT o_orderpriority,
    date_diff('day', CAST(o_orderdate AS DATE), CAST(ls AS DATE)) AS days
  FROM orders JOIN last_ship ON o_orderkey = l_orderkey
)
SELECT o_orderpriority,
  CAST(days // {_LAT_BUCKET_DAYS} AS BIGINT) AS latency_bucket,
  count(*) AS n_orders,
  CAST(min(days) AS BIGINT) AS min_days,
  CAST(max(days) AS BIGINT) AS max_days,
  CAST(CAST(sum(days) AS BIGINT) // count(*) AS BIGINT) AS avg_days_floor
FROM lat
GROUP BY o_orderpriority, days // {_LAT_BUCKET_DAYS}
""",
)
def order_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    last_ship = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("ls"))
    lat = orders.join(
        last_ship, orders.o_orderkey == last_ship.l_orderkey
    ).select(
        "o_orderpriority",
        F.datediff(
            F.col("ls").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days"),
    )
    return lat.groupBy(
        "o_orderpriority",
        F.expr(f"CAST(days DIV {_LAT_BUCKET_DAYS} AS BIGINT)").alias(
            "latency_bucket"
        ),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("days").cast("bigint").alias("min_days"),
        F.max("days").cast("bigint").alias("max_days"),
        F.expr("CAST(sum(days) DIV count(*) AS BIGINT)").alias(
            "avg_days_floor"
        ),
    )


# ---------------------------------------------------------------------------
# supplier_lead_time_trend — per-supplier delivery-delay regression:
# slope (days of delay per year) and mean delay, from EXACT BIGINT
# moments (n, Σx, Σy, Σxy, Σx²) aggregated in one map-combined pass —
# the same sufficient-statistics discipline as corpus_length_token_corr,
# so no float is ever aggregated; the final slope converts the exact
# integers through an identical double expression tree in both
# engines, rounded 4 dp. x = days since 1995-01-01 (bounds the moment
# magnitudes), y = ship delay in days.
#
# The procurement page: suppliers whose lead time is drifting up are
# flagged long before an SLA breach. Scale: one aggregate keyed by
# supplier; no window, no join beyond the fact's own orderkey join.
# ---------------------------------------------------------------------------

_EPOCH0 = "1995-01-01"


@register(
    "supplier_lead_time_trend",
    oracle=f"""
WITH xy AS (
  SELECT l_suppkey,
    date_diff('day', DATE '{_EPOCH0}', CAST(o_orderdate AS DATE)) AS x,
    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS y
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
m AS (
  SELECT l_suppkey AS suppkey, count(*) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM xy GROUP BY 1
)
SELECT suppkey, n,
  CAST(round(CAST(sy AS DOUBLE) / n, 4) AS DOUBLE) AS avg_delay_days,
  CAST(round(365.0 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 4) AS DOUBLE)
    AS slope_days_per_year
FROM m
WHERE n >= 2 AND n * sxx != sx * sx
""",
)
def supplier_lead_time_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    xy = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_suppkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit(_EPOCH0).cast("date")
        ).alias("x"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("y"),
    )
    m = xy.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    slope = (
        F.lit(365.0)
        * (F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
        / (F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
    )
    return (
        m.filter(
            (F.col("n") >= 2)
            & (F.col("n") * F.col("sxx") != F.col("sx") * F.col("sx"))
        )
        .select(
            "suppkey",
            "n",
            F.round(F.col("sy").cast("double") / F.col("n"), 4)
            .cast("double")
            .alias("avg_delay_days"),
            F.round(slope, 4).cast("double").alias("slope_days_per_year"),
        )
    )


# ---------------------------------------------------------------------------
# repeat_purchase_intervals — distribution of days between a customer's
# consecutive orders: 30-day-bucketed histogram with exact integer
# stats. The repeat-behavior curve behind retention/CLV models —
# complements customer_rfm_segments (point-in-time scores) with the
# between-orders dynamics.
#
# Scale shape: one per-customer lag window (the same user-keyed
# partitioning every per-entity operator shuffles on), then a bounded
# histogram aggregate. Gap arithmetic is integer days.
# ---------------------------------------------------------------------------

_RP_BUCKET_DAYS = 30


@register(
    "repeat_purchase_intervals",
    oracle=f"""
WITH gaps AS (
  SELECT o_custkey,
    date_diff('day',
      lag(CAST(o_orderdate AS DATE)) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders
)
SELECT CAST(gap_days // {_RP_BUCKET_DAYS} AS BIGINT) AS gap_bucket,
  count(*) AS n_gaps,
  count(DISTINCT o_custkey) AS n_customers,
  CAST(min(gap_days) AS BIGINT) AS min_days,
  CAST(max(gap_days) AS BIGINT) AS max_days
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY 1
""",
)
def repeat_purchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return gaps.groupBy(
        F.expr(f"CAST(gap_days DIV {_RP_BUCKET_DAYS} AS BIGINT)").alias(
            "gap_bucket"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.min("gap_days").cast("bigint").alias("min_days"),
        F.max("gap_days").cast("bigint").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# daily_revenue_gapfill — the date-spine pattern: generate EVERY
# calendar day between the first and last order date, left-join the
# daily revenue, and fill gaps with zero so trailing windows are
# calendar-correct (a 7-day trailing sum over only-observed days
# silently spans more than 7 calendar days — the classic reporting
# bug this operator exists to kill).
#
# Scale shape: the spine comes from a 1-row min/max aggregate exploded
# into ~2,400 rows (calendar-bounded at ANY fact size — the same
# value-bounded-window contract as weekly_decomposition); daily
# revenue is the map-combined groupBy; the join keys the spine to it.
# Revenue is exact cents (per-row round, as revenue_cusum_changepoint).
# ---------------------------------------------------------------------------


@register(
    "daily_revenue_gapfill",
    oracle="""
WITH bounds AS (
  SELECT CAST(min(o_orderdate) AS DATE) AS d0,
         CAST(max(o_orderdate) AS DATE) AS d1
  FROM orders
), spine AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
    AS day
  FROM bounds
), rev AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      AS revenue_cents
  FROM orders GROUP BY 1
), filled AS (
  SELECT spine.day,
    coalesce(rev.revenue_cents, 0) AS revenue_cents,
    rev.day IS NULL AS is_gap
  FROM spine LEFT JOIN rev ON spine.day = rev.day
)
SELECT day, revenue_cents, is_gap,
  CAST(sum(revenue_cents) OVER (ORDER BY day
    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
    AS trailing_7d_cents
FROM filled
""",
)
def daily_revenue_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.to_date(F.min("o_orderdate")).alias("d0"),
        F.to_date(F.max("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("day")
    )
    rev = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "rc"
        )
    )
    filled = spine.join(rev, "day", "left").select(
        "day",
        F.coalesce(F.col("rc"), F.lit(0).cast("bigint")).alias(
            "revenue_cents"
        ),
        F.col("rc").isNull().alias("is_gap"),
    )
    # unpartitioned window bound: day-grain spine (<= ~2,600 rows)
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return filled.withColumn(
        "trailing_7d_cents", F.sum("revenue_cents").over(w).cast("bigint")
    )


# ---------------------------------------------------------------------------
# rare_category_collapse — feature-engineering "other"-bucket: keep the
# top-10 p_type categories by frequency (ties by name), collapse the
# tail into '__OTHER__', and report the resulting cardinality /
# coverage. The step before one-hot/target encoding on any
# high-cardinality categorical at 100 TB — the report shows exactly
# how much probability mass the collapse moves.
#
# Scale shape: one map-combined category count, a row_number over the
# |categories| frame (value-bounded window), a 1-row total broadcast.
# ---------------------------------------------------------------------------

_RARE_TOP_K = 10


@register(
    "rare_category_collapse",
    oracle=f"""
WITH c AS (
  SELECT p_type, CAST(count(*) AS BIGINT) AS n FROM part GROUP BY p_type
), rk AS (
  SELECT p_type, n,
    row_number() OVER (ORDER BY n DESC, p_type) AS rk
  FROM c
), m AS (
  SELECT CASE WHEN rk <= {_RARE_TOP_K} THEN p_type
              ELSE '__OTHER__' END AS category, n
  FROM rk
), t AS (
  SELECT CAST(sum(n) AS BIGINT) AS total FROM c
)
SELECT category,
  CAST(count(*) AS BIGINT) AS n_source_categories,
  CAST(sum(n) AS BIGINT) AS n_parts,
  CAST(sum(n) AS BIGINT) * 1000000 // total AS share_ppm
FROM m CROSS JOIN t GROUP BY category, total
""",
)
def rare_category_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    c = part.groupBy("p_type").agg(F.count(F.lit(1)).alias("n"))
    rk = c.withColumn(
        "rk",
        # unpartitioned window bound: |p_type| rows (150-value vocab)
        F.row_number().over(Window.orderBy(F.col("n").desc(), "p_type")),
    )
    m = rk.select(
        F.when(F.col("rk") <= _RARE_TOP_K, F.col("p_type"))
        .otherwise(F.lit("__OTHER__"))
        .alias("category"),
        "n",
    )
    t = c.agg(F.sum("n").alias("total"))
    return (
        m.crossJoin(F.broadcast(t))
        .groupBy("category", "total")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_source_categories"),
            F.sum("n").alias("n_parts"),
            F.expr("sum(n) * 1000000 div total").alias("share_ppm"),
        )
        .select("category", "n_source_categories", "n_parts", "share_ppm")
    )


# ---------------------------------------------------------------------------
# revenue_v_shape_patterns — sequence-pattern detection (the SQL:2016
# MATCH_RECOGNIZE shape Spark lacks) expressed as a composition:
# day-over-day sign → run-length encoding via the change-flag cumsum
# (the scd2_user_state_intervals trick on the sign column) → adjacent
# run pairing with lead(). A "V" is a strictly-down run of ≥3 days
# immediately followed by a strictly-up run of ≥3 days; the report
# gives its extent, depth, and recovery. PATTERN (DOWN{3,} UP{3,}) in
# MATCH_RECOGNIZE terms, with DOWN := x < prev(x), UP := x > prev(x).
#
# Scale shape: daily revenue is the usual map-combined cents groupBy;
# every window afterwards runs over the calendar-bounded daily series
# (≤ ~2,400 rows at ANY fact size — the weekly_decomposition /
# gapfill contract), so the unpartitioned windows are value-bounded.
# Endpoint values use min_by/max_by (DuckDB arg_min/arg_max) on the
# unique day key — no sort, engine-deterministic.
# ---------------------------------------------------------------------------

_V_MIN_RUN = 3


@register(
    "revenue_v_shape_patterns",
    oracle=f"""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY 1
), s AS (
  SELECT day, x,
    CASE WHEN x > lag(x) OVER w THEN 1
         WHEN x < lag(x) OVER w THEN -1 ELSE 0 END AS sgn,
    CASE WHEN lag(x) OVER w IS NULL THEN NULL ELSE 1 END AS has_prev
  FROM d WINDOW w AS (ORDER BY day)
), flagged AS (
  SELECT day, x, sgn,
    CASE WHEN lag(sgn) OVER (ORDER BY day) IS DISTINCT FROM sgn
         THEN 1 ELSE 0 END AS chg
  FROM s WHERE has_prev = 1
), runs AS (
  SELECT day, x, sgn,
    CAST(sum(chg) OVER (ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS run_id
  FROM flagged
), r AS (
  SELECT run_id, min(sgn) AS sgn,
    min(day) AS d0, max(day) AS d1,
    CAST(count(*) AS BIGINT) AS len,
    CAST(arg_min(x, day) AS BIGINT) AS x_first,
    CAST(arg_max(x, day) AS BIGINT) AS x_last
  FROM runs GROUP BY run_id
), paired AS (
  SELECT run_id, sgn, d0, d1, len, x_first, x_last,
    lead(sgn) OVER o AS n_sgn, lead(d1) OVER o AS n_d1,
    lead(len) OVER o AS n_len,
    lead(x_first) OVER o AS n_x_first, lead(x_last) OVER o AS n_x_last
  FROM r WINDOW o AS (ORDER BY run_id)
)
SELECT d0 AS down_start_day, d1 AS bottom_day, n_d1 AS recovery_day,
  len AS down_days, CAST(n_len AS BIGINT) AS up_days,
  x_first - x_last AS depth_cents,
  CAST(n_x_last - n_x_first AS BIGINT) AS recovery_cents
FROM paired
WHERE sgn = -1 AND len >= {_V_MIN_RUN}
  AND n_sgn = 1 AND n_len >= {_V_MIN_RUN}
""",
)
def revenue_v_shape_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("x")
    )
    # unpartitioned window bound: day-grain series (<= ~2,600 rows)
    wd = Window.orderBy("day")
    s = d.select(
        "day",
        "x",
        F.when(F.col("x") > F.lag("x").over(wd), 1)
        .when(F.col("x") < F.lag("x").over(wd), -1)
        .otherwise(0)
        .alias("sgn"),
        F.lag("x").over(wd).isNotNull().alias("has_prev"),
    ).filter("has_prev")
    chg = (
        ~F.lag("sgn").over(wd).eqNullSafe(F.col("sgn"))
    ).cast("long")
    runs = s.select(
        "day",
        "x",
        "sgn",
        F.sum(chg)
        .over(wd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run_id"),
    )
    r = runs.groupBy("run_id").agg(
        F.min("sgn").alias("sgn"),
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.count(F.lit(1)).cast("bigint").alias("len"),
        F.min_by("x", "day").cast("bigint").alias("x_first"),
        F.max_by("x", "day").cast("bigint").alias("x_last"),
    )
    # unpartitioned window bound: <= one run per day (day-grain)
    wo = Window.orderBy("run_id")
    paired = r.select(
        "sgn",
        "d0",
        "d1",
        "len",
        "x_first",
        "x_last",
        F.lead("sgn").over(wo).alias("n_sgn"),
        F.lead("d1").over(wo).alias("n_d1"),
        F.lead("len").over(wo).alias("n_len"),
        F.lead("x_first").over(wo).alias("n_x_first"),
        F.lead("x_last").over(wo).alias("n_x_last"),
    )
    return paired.filter(
        (F.col("sgn") == -1)
        & (F.col("len") >= _V_MIN_RUN)
        & (F.col("n_sgn") == 1)
        & (F.col("n_len") >= _V_MIN_RUN)
    ).select(
        F.col("d0").alias("down_start_day"),
        F.col("d1").alias("bottom_day"),
        F.col("n_d1").alias("recovery_day"),
        F.col("len").alias("down_days"),
        F.col("n_len").cast("bigint").alias("up_days"),
        (F.col("x_first") - F.col("x_last")).alias("depth_cents"),
        (F.col("n_x_last") - F.col("n_x_first"))
        .cast("bigint")
        .alias("recovery_cents"),
    )


# ---------------------------------------------------------------------------
# token_budget_apportion — largest-remainder (Hamilton) apportionment
# of a fixed token budget across languages in proportion to their
# corpus token mass: floor quotas + remainders ranked (ties by lang)
# hand out the leftover seats, so allocations are integers that sum
# EXACTLY to the budget. The quota-planning twin of
# corpus_mixture_plan — mixture_plan says what share each source
# deserves; this turns shares into an exact integer token budget the
# dataloader can consume.
#
# Scale shape: token mass per lang = one explode + map-combined
# groupBy; everything after runs on the |langs|-row frame (bounded
# windows, 1-row total broadcast).
# ---------------------------------------------------------------------------

_APPORTION_BUDGET = 1_000_000


from bpaotu_spark.functions.textops import TOKENIZE_SQL as _TOK_SQL


@register(
    "token_budget_apportion",
    oracle=f"""
WITH t AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS w
  FROM (SELECT lang, unnest(toks) AS tok
        FROM (SELECT lang, {_TOK_SQL} AS toks FROM documents))
  GROUP BY lang
), tot AS (
  SELECT CAST(sum(w) AS BIGINT) AS wt FROM t
), q AS (
  SELECT lang, w,
    CAST({_APPORTION_BUDGET} AS BIGINT) * w // wt AS floor_alloc,
    CAST({_APPORTION_BUDGET} AS BIGINT) * w % wt AS rem
  FROM t CROSS JOIN tot
), lo AS (
  SELECT CAST({_APPORTION_BUDGET} AS BIGINT)
    - CAST(sum(floor_alloc) AS BIGINT) AS leftover
  FROM q
)
SELECT lang, w AS tokens_w, floor_alloc,
  CAST(row_number() OVER (ORDER BY rem DESC, lang) AS BIGINT)
    AS remainder_rank,
  floor_alloc + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
    <= leftover THEN 1 ELSE 0 END AS final_alloc
FROM q CROSS JOIN lo
""",
)
def token_budget_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bpaotu_spark.functions.textops import tokenize

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang", F.explode(tokenize(F.col("text"))).alias("tok")
    ).groupBy("lang").agg(F.count(F.lit(1)).alias("w"))
    tot = t.agg(F.sum("w").alias("wt"))
    q = t.crossJoin(F.broadcast(tot)).select(
        "lang",
        "w",
        F.expr(
            f"CAST({_APPORTION_BUDGET} AS BIGINT) * w div wt"
        ).alias("floor_alloc"),
        F.expr(
            f"CAST({_APPORTION_BUDGET} AS BIGINT) * w % wt"
        ).alias("rem"),
    )
    lo = q.agg(
        (F.lit(_APPORTION_BUDGET).cast("bigint") - F.sum("floor_alloc"))
        .cast("bigint")
        .alias("leftover")
    )
    # unpartitioned window bound: |lang| rows (bounded language set)
    wr = Window.orderBy(F.col("rem").desc(), "lang")
    return (
        q.crossJoin(F.broadcast(lo))
        .withColumn("remainder_rank", F.row_number().over(wr).cast("bigint"))
        .select(
            "lang",
            F.col("w").alias("tokens_w"),
            "floor_alloc",
            "remainder_rank",
            (
                F.col("floor_alloc")
                + F.when(
                    F.col("remainder_rank") <= F.col("leftover"), 1
                ).otherwise(0)
            ).alias("final_alloc"),
        )
    )
