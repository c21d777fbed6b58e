"""Round-5 (continuation) additions: revenue-concentration and
user-behavior analytics.

Reference analogue: bpaotu's portal answers point-in-time questions over
its store (public path ``bpaotu/otu/query.py``); a production analytics
deployment of the same data platform runs these classic concentration /
cohort / behavioral shapes on its commerce and clickstream side. All of
them follow the repo's exactness discipline: money as DECIMAL(18,6)
partials collapsed to integer cents, shares in exact ppm via 128-bit
``DECIMAL(38,0) DIV`` (HUGEINT on the DuckDB side), order statistics by
rank selection, and windows that are either entity-partitioned or
bounded-cardinality after full map-side aggregation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table, maybe_broadcast
from bpaotu_spark.operators.events import SESSION_GAP_MS
from bpaotu_spark.registry import register

DEC = "decimal(18,6)"

# per-row money → exact decimal; group sums collapse to integer cents
_CENTS_SQL = (
    "CAST(round(sum(CAST({expr} AS DECIMAL(18,6))) * 100, 0) AS BIGINT)"
)


def _cents(col: F.Column) -> F.Column:
    return (
        F.round(F.sum(col.cast(DEC)) * 100, 0).cast("bigint")
    )


# ---------------------------------------------------------------------------
# customer_pareto_share — the 80/20 revenue-concentration curve: every
# customer ranked by lifetime revenue with exact cumulative share in
# ppm and the "top-80%" membership flag. The account-management view
# behind key-account programs.
#
# Scale shape: the oracle is the naive single global window; the Spark
# plan is the two-level prefix sum proven by packed_token_offsets —
# customers are sharded by floor(log2(cents+1)) (monotone in the sort
# key, so (shard DESC, cents DESC, custkey) IS the global order), each
# shard computes its local rank/cumsum in parallel, and only the
# ~40-row shard-total table goes through a single-partition window
# before being broadcast back. No task ever sorts the full customer
# set; the driver-green hash match vs the naive oracle proves the
# decomposition lossless.
# ---------------------------------------------------------------------------

_PARETO_PPM = 800_000  # "top 80%" cut


@register(
    "customer_pareto_share",
    oracle=f"""
WITH c AS (
  SELECT o_custkey AS custkey,
    {_CENTS_SQL.format(expr="o_totalprice")} AS revenue_cents
  FROM orders GROUP BY 1
),
t AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS total FROM c)
SELECT custkey, revenue_cents,
  CAST(row_number() OVER w AS BIGINT) AS rank,
  CAST(sum(revenue_cents) OVER w AS BIGINT) AS cum_cents,
  CAST(CAST(sum(revenue_cents) OVER w AS HUGEINT) * 1000000 // total
    AS BIGINT) AS cum_share_ppm,
  (CAST(sum(revenue_cents) OVER w AS HUGEINT) * 1000000 // total)
    <= {_PARETO_PPM} AS is_top80
FROM c, t
WINDOW w AS (ORDER BY revenue_cents DESC, custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def customer_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        _cents(F.col("o_totalprice")).alias("revenue_cents")
    )
    # shard key monotone in the sort key: equal-revenue ties stay inside
    # one shard, so shard-local (cents DESC, custkey) order concatenated
    # in shard-DESC order is exactly the oracle's global order.
    sh = c.withColumn(
        "shard", F.floor(F.log2(F.col("revenue_cents") + 1)).cast("int")
    )
    w_local = Window.partitionBy("shard").orderBy(
        F.col("revenue_cents").desc(), F.col("custkey")
    )
    local = sh.select(
        "custkey",
        "revenue_cents",
        "shard",
        F.row_number().over(w_local).alias("rn"),
        F.sum("revenue_cents")
        .over(w_local.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_local"),
    )
    # shard totals: ~40 rows — the only single-partition window
    w_shard = Window.orderBy(F.col("shard").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    totals = (
        sh.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_shard"),
            F.sum("revenue_cents").alias("s_shard"),
        )
        .select(
            "shard",
            F.coalesce(F.sum("n_shard").over(w_shard), F.lit(0)).alias("off_n"),
            F.coalesce(F.sum("s_shard").over(w_shard), F.lit(0)).alias("off_s"),
        )
    )
    grand = c.agg(F.sum("revenue_cents").cast("bigint").alias("total"))
    share = F.expr(
        "CAST(CAST(cum_cents AS DECIMAL(38,0)) * 1000000 DIV total AS BIGINT)"
    )
    return (
        local.join(F.broadcast(totals), "shard")
        .crossJoin(F.broadcast(grand))
        .select(
            "custkey",
            "revenue_cents",
            (F.col("rn") + F.col("off_n")).cast("bigint").alias("rank"),
            (F.col("cum_local") + F.col("off_s")).cast("bigint").alias("cum_cents"),
            "total",
        )
        .select(
            "custkey",
            "revenue_cents",
            "rank",
            "cum_cents",
            share.alias("cum_share_ppm"),
            (share <= F.lit(_PARETO_PPM)).alias("is_top80"),
        )
    )


# ---------------------------------------------------------------------------
# cohort_ltv_matrix — customer-lifetime-value development by acquisition
# cohort: for every (first-order month, months-since-first) cell, the
# active-customer count, period revenue, and cumulative revenue per
# cohort customer (floor cents). The revenue twin of
# cohort_retention_matrix (which counts activity only).
#
# Scale shape: first-order dates are one map-combined aggregate keyed
# by customer; the fact join is keyed on the same custkey (one
# shuffle); the cumulative window runs per cohort over months-since —
# bounded by the calendar (≤ ~84 rows per cohort). Month arithmetic is
# integer (y*12+m), never an engine-specific interval diff.
# ---------------------------------------------------------------------------


@register(
    "cohort_ltv_matrix",
    oracle="""
WITH f AS (
  SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS fd
  FROM orders GROUP BY 1
),
sz AS (
  SELECT strftime(date_trunc('month', fd), '%Y-%m') AS cohort_month,
    count(*) AS cohort_size
  FROM f GROUP BY 1
),
x AS (
  SELECT strftime(date_trunc('month', f.fd), '%Y-%m') AS cohort_month,
    (year(o.o_orderdate) * 12 + month(o.o_orderdate))
      - (year(f.fd) * 12 + month(f.fd)) AS age_months,
    o.o_custkey,
    CAST(o.o_totalprice AS DECIMAL(18,6)) AS price
  FROM orders o JOIN f ON o.o_custkey = f.o_custkey
),
g AS (
  SELECT cohort_month, CAST(age_months AS BIGINT) AS age_months,
    count(DISTINCT o_custkey) AS n_active,
    CAST(round(sum(price) * 100, 0) AS BIGINT) AS revenue_cents
  FROM x GROUP BY 1, 2
)
SELECT g.cohort_month, age_months, cohort_size, n_active, revenue_cents,
  CAST(sum(revenue_cents) OVER w AS BIGINT) AS cum_revenue_cents,
  CAST(CAST(sum(revenue_cents) OVER w AS HUGEINT) // cohort_size
    AS BIGINT) AS cum_cents_per_customer
FROM g JOIN sz ON g.cohort_month = sz.cohort_month
WINDOW w AS (PARTITION BY g.cohort_month ORDER BY age_months
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def cohort_ltv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("fd")
    )
    sz = f.groupBy(
        F.date_format(F.date_trunc("month", "fd"), "yyyy-MM").alias(
            "cohort_month"
        )
    ).agg(F.count(F.lit(1)).alias("cohort_size"))
    x = orders.join(f, "o_custkey").select(
        F.date_format(F.date_trunc("month", "fd"), "yyyy-MM").alias(
            "cohort_month"
        ),
        (
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            - (F.year("fd") * 12 + F.month("fd"))
        )
        .cast("bigint")
        .alias("age_months"),
        "o_custkey",
        F.col("o_totalprice").cast(DEC).alias("price"),
    )
    g = x.groupBy("cohort_month", "age_months").agg(
        F.countDistinct("o_custkey").alias("n_active"),
        F.round(F.sum("price") * 100, 0).cast("bigint").alias("revenue_cents"),
    )
    w = Window.partitionBy("cohort_month").orderBy("age_months").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = F.sum("revenue_cents").over(w)
    return (
        g.join(F.broadcast(sz), "cohort_month")
        .withColumn("cum_revenue_cents", cum.cast("bigint"))
        .select(
            "cohort_month",
            "age_months",
            "cohort_size",
            "n_active",
            "revenue_cents",
            "cum_revenue_cents",
            F.expr(
                "CAST(CAST(cum_revenue_cents AS DECIMAL(38,0))"
                " DIV cohort_size AS BIGINT)"
            ).alias("cum_cents_per_customer"),
        )
    )


# ---------------------------------------------------------------------------
# part_brand_hhi — supplier-concentration (Herfindahl-Hirschman) index
# per part brand: Σ share_i² over supplier revenue shares, in exact ppm
# with 128-bit intermediates (Σ cents² · 1e6 passes 2^63 as soon as a
# brand-supplier cell exceeds ~$3B). The procurement-risk scoreboard:
# brands near 1e6 ppm are single-sourced.
#
# Scale shape: one fact-side aggregate keyed (brand, suppkey) — the
# part join is dim-sized — then a brand-keyed reduce of the
# supplier-level cells. No windows, no driver materialization.
# ---------------------------------------------------------------------------


@register(
    "part_brand_hhi",
    oracle=f"""
WITH r AS (
  SELECT p_brand, l_suppkey,
    {_CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")} AS cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
)
SELECT p_brand,
  CAST(count(*) AS BIGINT) AS n_suppliers,
  CAST(sum(cents) AS BIGINT) AS total_cents,
  CAST(CAST(max(cents) AS HUGEINT) * 1000000 // sum(cents) AS BIGINT)
    AS top_share_ppm,
  CAST(sum(CAST(cents AS HUGEINT) * cents) * 1000000
       // (CAST(sum(cents) AS HUGEINT) * sum(cents)) AS BIGINT) AS hhi_ppm
FROM r
GROUP BY 1
HAVING sum(cents) > 0
""",
)
def part_brand_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    r = (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_suppkey")
        .agg(
            _cents(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("cents")
        )
    )
    return (
        r.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("cents").cast("bigint").alias("total_cents"),
            F.max("cents").alias("max_cents"),
            F.sum(
                F.col("cents").cast("decimal(38,0)") * F.col("cents")
            ).alias("sum_sq"),
        )
        .filter(F.col("total_cents") > 0)
        .select(
            "p_brand",
            "n_suppliers",
            "total_cents",
            F.expr(
                "CAST(CAST(max_cents AS DECIMAL(38,0)) * 1000000"
                " DIV total_cents AS BIGINT)"
            ).alias("top_share_ppm"),
            F.expr(
                "CAST(sum_sq * 1000000 DIV (CAST(total_cents AS DECIMAL(38,0))"
                " * total_cents) AS BIGINT)"
            ).alias("hhi_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# event_type_transitions — first-order Markov transition matrix over the
# event stream: for each (prev_type → next_type) pair of consecutive
# events of one user, the count and the exact row-conditional
# probability in ppm. The navigation-flow map behind funnel design.
#
# Scale shape: one lag window partitioned by user (the same user-keyed
# shuffle every per-entity operator pays), then a bounded
# (#types × #types) aggregate whose conditional window runs on that
# bounded set. Ties in ts are broken by event_id in both engines.
# ---------------------------------------------------------------------------


@register(
    "event_type_transitions",
    oracle="""
WITH s AS (
  SELECT event_type,
    lag(event_type) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
p AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
  CAST(CAST(n AS HUGEINT) * 1000000
       // sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS prob_ppm
FROM p
""",
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    p = s.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("prev_type")
    return (
        p.withColumn("total", F.sum("n").over(wt))
        .select(
            "prev_type",
            "next_type",
            "n",
            F.expr(
                "CAST(CAST(n AS DECIMAL(38,0)) * 1000000 DIV total AS BIGINT)"
            ).alias("prob_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# session_bounce_rate — share of single-event sessions per day, using
# the repo's session definition (gap > 30 min splits, the same
# SESSION_GAP_MS as sessionize_events). The engagement-quality daily
# that complements retention_daily.
#
# Scale shape: the session reconstruction is the standard user-keyed
# lag + running-sum pair of windows (entity-partitioned, parallel
# across users); everything after is a bounded daily aggregate.
# ---------------------------------------------------------------------------

@register(
    "session_bounce_rate",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, ts, epoch_ms(ts) AS t_ms FROM events
),
m AS (
  SELECT user_id, ts, t_ms,
    CASE WHEN lag(t_ms) OVER w IS NULL
           OR t_ms - lag(t_ms) OVER w > {SESSION_GAP_MS}
         THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
),
s AS (
  SELECT user_id, ts,
    sum(is_new) OVER (PARTITION BY user_id ORDER BY t_ms, ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS sess_no
  FROM m
),
g AS (
  SELECT user_id, sess_no, min(CAST(ts AS DATE)) AS day, count(*) AS n_events
  FROM s GROUP BY 1, 2
)
SELECT strftime(day, '%Y-%m-%d') AS day,
  count(*) AS n_sessions,
  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
  CAST(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS HUGEINT)
       * 1000000 // count(*) AS BIGINT) AS bounce_ppm
FROM g GROUP BY 1
""",
)
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second window orders by (t_ms, ts) — event_id is not needed
    there because is_new is already fixed per row and running sums over
    any stable order of equal-(t_ms) rows agree."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("ts").cast("double") * 1000).cast("bigint").alias("t_ms"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    prev = F.lag("t_ms").over(w)
    m = e.select(
        "user_id",
        "ts",
        "t_ms",
        F.when(
            prev.isNull() | ((F.col("t_ms") - prev) > SESSION_GAP_MS), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("t_ms", "ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = m.select(
        "user_id", "ts", F.sum("is_new").over(ws).alias("sess_no")
    )
    g = s.groupBy("user_id", "sess_no").agg(
        F.min(F.col("ts").cast("date")).alias("day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return g.groupBy(
        F.date_format("day", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        bounce.cast("bigint").alias("n_bounces"),
        F.expr(
            "CAST(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)"
            " AS DECIMAL(38,0)) * 1000000 DIV count(1) AS BIGINT)"
        ).alias("bounce_ppm"),
    )


# ---------------------------------------------------------------------------
# user_stickiness_monthly — the DAU/MAU stickiness ratio per calendar
# month, computed exactly: user_days (distinct user-day pairs) over
# MAU × days-in-month, in ppm. The growth-team north-star companion to
# retention_daily.
#
# Scale shape: the distinct collapses (user, day) with map-side partial
# aggregation before the month rollup; both counts then reduce a
# bounded set. No windows at all.
# ---------------------------------------------------------------------------


@register(
    "user_stickiness_monthly",
    oracle="""
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
    date_trunc('month', CAST(ts AS DATE)) AS mon
  FROM events
)
SELECT strftime(mon, '%Y-%m') AS month,
  CAST(count(*) AS BIGINT) AS user_days,
  CAST(count(DISTINCT user_id) AS BIGINT) AS mau,
  CAST(day(last_day(mon)) AS BIGINT) AS days_in_month,
  CAST(CAST(count(*) AS HUGEINT) * 1000000
       // (count(DISTINCT user_id) * day(last_day(mon))) AS BIGINT)
    AS stickiness_ppm
FROM d GROUP BY mon
""",
)
def user_stickiness_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        F.date_trunc("month", F.col("ts").cast("date")).alias("mon"),
    ).distinct()
    g = d.groupBy("mon").agg(
        F.count(F.lit(1)).alias("user_days"),
        F.countDistinct("user_id").alias("mau"),
    )
    dim = F.dayofmonth(F.last_day(F.col("mon").cast("date"))).cast("bigint")
    return g.withColumn("days_in_month", dim).select(
        F.date_format("mon", "yyyy-MM").alias("month"),
        "user_days",
        "mau",
        "days_in_month",
        F.expr(
            "CAST(CAST(user_days AS DECIMAL(38,0)) * 1000000"
            " DIV (mau * days_in_month) AS BIGINT)"
        ).alias("stickiness_ppm"),
    )


# ---------------------------------------------------------------------------
# nation_trade_flow — the full customer-nation × supplier-nation revenue
# matrix with global share ppm and the domestic flag: q7's two-nation
# drill generalized to the whole trade graph (the trade-balance page).
#
# Scale shape: one pass over the fact with all four dims broadcast
# (nation twice under different roles — the q7 idiom), one
# (25 × 25)-bounded aggregate, then a broadcast 1-row grand total.
# ---------------------------------------------------------------------------


@register(
    "nation_trade_flow",
    oracle=f"""
WITH r AS (
  SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
    {_CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")}
      AS revenue_cents
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  GROUP BY 1, 2
),
t AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS total FROM r)
SELECT cust_nation, supp_nation, revenue_cents,
  (cust_nation = supp_nation) AS is_domestic,
  CAST(CAST(revenue_cents AS HUGEINT) * 1000000 // total AS BIGINT)
    AS share_ppm
FROM r, t
""",
)
def nation_trade_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    cn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    r = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            _cents(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue_cents")
        )
    )
    t = r.agg(F.sum("revenue_cents").cast("bigint").alias("total"))
    return r.crossJoin(F.broadcast(t)).select(
        "cust_nation",
        "supp_nation",
        "revenue_cents",
        (F.col("cust_nation") == F.col("supp_nation")).alias("is_domestic"),
        F.expr(
            "CAST(CAST(revenue_cents AS DECIMAL(38,0)) * 1000000 DIV total"
            " AS BIGINT)"
        ).alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# part_size_price_corr — Pearson correlation + regression slope of part
# size vs retail price per part type, from EXACT BIGINT sufficient
# statistics (the corpus_length_token_corr / supplier_lead_time_trend
# moment discipline). Price enters as floor-dollars so the moment
# magnitudes stay in 64 bits at any scale (y ≤ ~1e4 ⇒ Σy² ≤ 1e8 per
# part; x = p_size ≤ ~50). The final r/slope convert the exact
# integers through an identical double expression tree, rounded 4 dp.
#
# Scale shape: one map-combined aggregate keyed by p_type over the
# part dim; no joins, no windows.
# ---------------------------------------------------------------------------


@register(
    "part_size_price_corr",
    oracle="""
WITH xy AS (
  SELECT p_type, CAST(p_size AS BIGINT) AS x,
    CAST(floor(CAST(p_retailprice AS DECIMAL(18,6))) AS BIGINT) AS y
  FROM part
),
m AS (
  SELECT p_type, count(*) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * y) AS BIGINT) AS sxy,
    CAST(sum(x * x) AS BIGINT) AS sxx,
    CAST(sum(y * y) AS BIGINT) AS syy
  FROM xy GROUP BY 1
)
SELECT p_type, n,
  CAST(round(
    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
    / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
         * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 4)
    AS DOUBLE) AS pearson_r,
  CAST(round(
    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 4)
    AS DOUBLE) AS slope_dollars_per_size
FROM m
WHERE n >= 2 AND n * sxx != sx * sx AND n * syy != sy * sy
""",
)
def part_size_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    xy = part.select(
        "p_type",
        F.col("p_size").cast("bigint").alias("x"),
        F.floor(F.col("p_retailprice").cast(DEC)).cast("bigint").alias("y"),
    )
    m = xy.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    cov = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    vx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    return (
        m.filter(
            (F.col("n") >= 2)
            & (F.col("n") * F.col("sxx") != F.col("sx") * F.col("sx"))
            & (F.col("n") * F.col("syy") != F.col("sy") * F.col("sy"))
        )
        .select(
            "p_type",
            "n",
            F.round(cov / F.sqrt(vx * vy), 4).cast("double").alias("pearson_r"),
            F.round(cov / vx, 4).cast("double").alias("slope_dollars_per_size"),
        )
    )


# ---------------------------------------------------------------------------
# event_value_daily_median — exact daily median and p90 of the event
# value stream in floor-microunits (order statistics by rank selection;
# floor of an identical double expression cannot diverge between
# engines, and integer order statistics sidestep percentile
# interpolation differences entirely).
#
# Scale shape: the rank window partitions by day — parallel across the
# calendar, each partition holding one day of events. med2/p90 use the
# same middle-two / ceil-rank selection as median_exact_by_segment.
# ---------------------------------------------------------------------------


@register(
    "event_value_daily_median",
    oracle="""
WITH v AS (
  SELECT CAST(ts AS DATE) AS day,
    CAST(floor(value * 1000000) AS BIGINT) AS micro, event_id
  FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT day, micro,
    row_number() OVER (PARTITION BY day ORDER BY micro, event_id) AS rn,
    count(*) OVER (PARTITION BY day) AS n
  FROM v
),
med AS (
  SELECT day,
    CAST(CASE WHEN count(*) = 1 THEN 2 * sum(micro) ELSE sum(micro) END
      AS BIGINT) AS med2_micro
  FROM r WHERE rn IN ((n + 1) // 2, (n + 2) // 2) GROUP BY day
),
p90 AS (
  SELECT day, CAST(min(micro) AS BIGINT) AS p90_micro
  FROM r WHERE rn = (9 * n + 9) // 10 GROUP BY day
),
st AS (
  SELECT day, count(*) AS n_events,
    CAST(min(micro) AS BIGINT) AS min_micro,
    CAST(max(micro) AS BIGINT) AS max_micro
  FROM v GROUP BY day
)
SELECT strftime(st.day, '%Y-%m-%d') AS day, n_events, min_micro,
  med2_micro, p90_micro, max_micro
FROM st JOIN med ON st.day = med.day JOIN p90 ON st.day = p90.day
""",
)
def event_value_daily_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    v = ev.select(
        F.col("ts").cast("date").alias("day"),
        F.floor(F.col("value") * 1000000).cast("bigint").alias("micro"),
        "event_id",
    )
    wr = Window.partitionBy("day").orderBy("micro", "event_id")
    wn = Window.partitionBy("day")
    r = v.select(
        "day",
        "micro",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = (
        r.filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
        )
        .groupBy("day")
        .agg(
            F.expr(
                "CAST(CASE WHEN count(1) = 1 THEN 2 * sum(micro)"
                " ELSE sum(micro) END AS BIGINT)"
            ).alias("med2_micro")
        )
    )
    p90 = (
        r.filter(F.col("rn") == F.floor((9 * F.col("n") + 9) / 10))
        .groupBy("day")
        .agg(F.min("micro").cast("bigint").alias("p90_micro"))
    )
    st = v.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("micro").cast("bigint").alias("min_micro"),
        F.max("micro").cast("bigint").alias("max_micro"),
    )
    return (
        st.join(med, "day")
        .join(p90, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            "min_micro",
            "med2_micro",
            "p90_micro",
            "max_micro",
        )
    )


# ---------------------------------------------------------------------------
# customer_value_band_migration — year-over-year revenue-band Markov
# matrix: customers bucketed into fixed annual-spend bands, transitions
# counted between CONSECUTIVE years only (a missing year breaks the
# chain — churn is not a band). The dynamic companion to
# customer_rfm_segments' point-in-time scores.
#
# Bands use fixed integer-cent thresholds (never quantiles) so the
# bucketing is engine-exact and stable across years at any scale.
#
# Scale shape: one (custkey, year) aggregate (map-side combined), a
# per-customer lag window (entity-partitioned), then a bounded
# (#bands × #bands) aggregate with its conditional window on that
# bounded set.
# ---------------------------------------------------------------------------

_BAND_SQL = (
    "CASE WHEN cents < 10000000 THEN 'S' WHEN cents < 30000000 THEN 'M'"
    " WHEN cents < 60000000 THEN 'L' ELSE 'XL' END"
)


@register(
    "customer_value_band_migration",
    oracle=f"""
WITH cy AS (
  SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
    {_CENTS_SQL.format(expr="o_totalprice")} AS cents
  FROM orders GROUP BY 1, 2
),
b AS (
  SELECT o_custkey, yr, {_BAND_SQL} AS band,
    lag(yr) OVER w AS prev_yr, lag({_BAND_SQL}) OVER w AS prev_band
  FROM cy
  WINDOW w AS (PARTITION BY o_custkey ORDER BY yr)
),
p AS (
  SELECT prev_band AS band_from, band AS band_to, count(*) AS n
  FROM b WHERE prev_yr = yr - 1 GROUP BY 1, 2
)
SELECT band_from, band_to, n,
  CAST(CAST(n AS HUGEINT) * 1000000
       // sum(n) OVER (PARTITION BY band_from) AS BIGINT) AS prob_ppm
FROM p
""",
)
def customer_value_band_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cy = orders.groupBy(
        "o_custkey", F.year("o_orderdate").cast("bigint").alias("yr")
    ).agg(_cents(F.col("o_totalprice")).alias("cents"))
    band = F.expr(_BAND_SQL)
    w = Window.partitionBy("o_custkey").orderBy("yr")
    b = cy.select(
        "o_custkey",
        "yr",
        band.alias("band"),
        F.lag("yr").over(w).alias("prev_yr"),
        F.lag(band).over(w).alias("prev_band"),
    )
    p = (
        b.filter(F.col("prev_yr") == F.col("yr") - 1)
        .groupBy(
            F.col("prev_band").alias("band_from"),
            F.col("band").alias("band_to"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("band_from")
    return (
        p.withColumn("total", F.sum("n").over(wt))
        .select(
            "band_from",
            "band_to",
            "n",
            F.expr(
                "CAST(CAST(n AS DECIMAL(38,0)) * 1000000 DIV total AS BIGINT)"
            ).alias("prob_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# bloom_semijoin_filter — the runtime-filter pattern audited end-to-end:
# build a Bloom filter over a filtered dimension key set (FURNITURE
# customers), probe every orders row through it, and report the exact
# confusion counts against the true semi-join. This is the technique a
# 100 TB deployment uses to kill fact-scan rows before the shuffle
# (Spark's own AQE runtime filters / `bloom_filter_agg` do it
# implicitly; this operator makes the mechanism explicit and
# measurable — the same self-audit discipline as heavy_hitters_cms and
# dedup_lsh_recall_report).
#
# Layout: 65,536 bits as 2,048 x 32-bit blocks stored in BIGINT (no
# sign-bit hazards in either engine), K=3 md5-derived hashes.
#
# Determinism: bit positions are md5-derived integers; masks combine
# with bit_or; every reported number is an exact BIGINT (fp rate in
# integer ppm).
#
# Scale shape: the filter build aggregates the (already filtered)
# dimension into <= 2,048 rows — constant-size, so the three probe
# joins all broadcast; the probe itself is map-only over the fact scan
# (no explode, no shuffle) and collapses into a single-row aggregate.
# A Bloom pass admits false positives but NEVER false negatives — the
# pytest asserts the zero-miss invariant.
# ---------------------------------------------------------------------------

from bpaotu_spark.operators.events import _md5_int32_spark, _md5_int32_sql

BLOOM_BITS = 65536
BLOOM_BLOCK_BITS = 32
BLOOM_K = 3
_BLOOM_SEGMENT = "FURNITURE"


def _bloom_seed_sql(j: int, key: str) -> str:
    return f"'{j}:' || CAST({key} AS VARCHAR)"


def _bloom_seed_spark(j: int, key: str) -> F.Column:
    return F.concat(F.lit(f"{j}:"), F.col(key).cast("string"))


@register(
    "bloom_semijoin_filter",
    oracle=f"""
WITH keys AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = '{_BLOOM_SEGMENT}'
),
bits AS (
  {" UNION ALL ".join(
      f"SELECT ({_md5_int32_sql(_bloom_seed_sql(j, 'c_custkey'))})"
      f" % {BLOOM_BITS} AS bit FROM keys"
      for j in range(BLOOM_K)
  )}
),
bloom AS (
  SELECT bit // {BLOOM_BLOCK_BITS} AS block,
         bit_or(CAST(1 AS BIGINT) << (bit % {BLOOM_BLOCK_BITS})) AS mask
  FROM bits GROUP BY 1
),
probe AS (
  SELECT o.o_orderkey,
    o.o_custkey IN (SELECT c_custkey FROM keys) AS is_member,
    {" AND ".join(
        f"coalesce(b{j}.mask & (CAST(1 AS BIGINT) << (h{j} % {BLOOM_BLOCK_BITS})), 0) <> 0"
        for j in range(BLOOM_K)
    )} AS bloom_pass
  FROM (
    SELECT o_orderkey, o_custkey,
      {", ".join(
          f"({_md5_int32_sql(_bloom_seed_sql(j, 'o_custkey'))})"
          f" % {BLOOM_BITS} AS h{j}"
          for j in range(BLOOM_K)
      )}
    FROM orders
  ) o
  {" ".join(
      f"LEFT JOIN bloom b{j} ON h{j} // {BLOOM_BLOCK_BITS} = b{j}.block"
      for j in range(BLOOM_K)
  )}
)
SELECT
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
  CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
  CAST(sum(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END)
       AS BIGINT) AS n_false_pos,
  CAST(sum(CASE WHEN is_member AND NOT bloom_pass THEN 1 ELSE 0 END)
       AS BIGINT) AS n_false_neg,
  CAST(CAST(sum(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END)
            AS BIGINT) * 1000000
       // greatest(CAST(count(*) AS BIGINT)
                   - CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT),
                   1) AS BIGINT) AS fp_rate_ppm
FROM probe
""",
)
def bloom_semijoin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == _BLOOM_SEGMENT)
        .select("c_custkey")
    )
    bits = None
    for j in range(BLOOM_K):
        b = keys.select(
            (_md5_int32_spark(_bloom_seed_spark(j, "c_custkey")) % BLOOM_BITS).alias(
                "bit"
            )
        )
        bits = b if bits is None else bits.unionAll(b)
    bloom = bits.groupBy(
        F.expr(f"CAST(bit DIV {BLOOM_BLOCK_BITS} AS BIGINT)").alias("block")
    ).agg(
        F.bit_or(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST(bit % {BLOOM_BLOCK_BITS} AS INT))"
            )
        ).alias("mask")
    )

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    probe = orders
    for j in range(BLOOM_K):
        probe = probe.withColumn(
            f"h{j}",
            _md5_int32_spark(_bloom_seed_spark(j, "o_custkey")) % BLOOM_BITS,
        )
    pass_cols = []
    for j in range(BLOOM_K):
        bj = bloom.select(
            F.col("block").alias(f"block{j}"), F.col("mask").alias(f"mask{j}")
        )
        probe = probe.join(
            F.broadcast(bj),
            F.expr(f"CAST(h{j} DIV {BLOOM_BLOCK_BITS} AS BIGINT)")
            == F.col(f"block{j}"),
            "left",
        )
        pass_cols.append(
            F.coalesce(
                F.col(f"mask{j}").bitwiseAND(
                    F.expr(
                        f"shiftleft(CAST(1 AS BIGINT),"
                        f" CAST(h{j} % {BLOOM_BLOCK_BITS} AS INT))"
                    )
                ),
                F.lit(0),
            )
            != 0
        )
    member = keys.select(F.col("c_custkey").alias("o_custkey")).withColumn(
        "is_member", F.lit(True)
    )
    probe = (
        probe.join(F.broadcast(member), "o_custkey", "left")
        .na.fill({"is_member": False})
        .withColumn(
            "bloom_pass", pass_cols[0] & pass_cols[1] & pass_cols[2]
        )
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    agg = probe.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        cnt(F.col("is_member")).alias("n_members"),
        cnt(F.col("bloom_pass")).alias("n_pass"),
        cnt(F.col("bloom_pass") & ~F.col("is_member")).alias("n_false_pos"),
        cnt(F.col("is_member") & ~F.col("bloom_pass")).alias("n_false_neg"),
    )
    return agg.select(
        "*",
        F.expr(
            "CAST(n_false_pos * 1000000 DIV greatest(n_orders - n_members, 1)"
            " AS BIGINT)"
        ).alias("fp_rate_ppm"),
    )


# ---------------------------------------------------------------------------
# revenue_ewma_daily — exponentially-weighted daily revenue smoothing
# (half-life = 1 day, 10-day support): the trend line an ops dashboard
# overlays on the raw daily series. Weights are exact powers of two
# (512 >> age), the weighted mean is integer cents via 128-bit DIV, and
# calendar gaps are handled exactly — each day's weight comes from its
# CALENDAR age, not its row offset, so a missing day simply contributes
# nothing (a rows-window would silently mis-age across gaps).
#
# Scale shape: the fact collapses to one row per day first (map-side
# combined groupBy); the 10x contribution fan-out and the re-aggregate
# run on the tiny daily series, never the fact. Same reason the
# existing calendar-bounded windows are allow-listed.
# ---------------------------------------------------------------------------

_EWMA_SUPPORT = 10  # days; weight = 2^(SUPPORT-1-age)


@register(
    "revenue_ewma_daily",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
    {_CENTS_SQL.format(expr="o_totalprice")} AS cents
  FROM orders GROUP BY 1
),
contrib AS (
  SELECT CAST(day + to_days(CAST(a AS INTEGER)) AS DATE) AS target_day,
         cents * (1 << ({_EWMA_SUPPORT} - 1 - a)) AS wc,
         (1 << ({_EWMA_SUPPORT} - 1 - a)) AS w
  FROM daily CROSS JOIN (SELECT unnest(range({_EWMA_SUPPORT})) AS a)
),
smoothed AS (
  SELECT target_day AS day,
         CAST(sum(wc) AS BIGINT) AS num, CAST(sum(w) AS BIGINT) AS den
  FROM contrib GROUP BY 1
)
SELECT d.day, d.cents AS revenue_cents,
  CAST(CAST(s.num AS HUGEINT) // s.den AS BIGINT) AS ewma_cents
FROM daily d JOIN smoothed s ON d.day = s.day
""",
)
def revenue_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(_cents(F.col("o_totalprice")).alias("cents"))
    )
    ages = F.explode(F.array(*[F.lit(a) for a in range(_EWMA_SUPPORT)]))
    contrib = daily.withColumn("a", ages).select(
        F.date_add("day", F.col("a").cast("int")).alias("target_day"),
        F.expr(f"cents * shiftleft(1, {_EWMA_SUPPORT} - 1 - a)").alias("wc"),
        F.expr(f"shiftleft(1, {_EWMA_SUPPORT} - 1 - a)").alias("w"),
    )
    smoothed = contrib.groupBy(F.col("target_day").alias("day")).agg(
        F.sum("wc").cast("bigint").alias("num"),
        F.sum("w").cast("bigint").alias("den"),
    )
    return (
        daily.join(smoothed, "day")
        .select(
            "day",
            F.col("cents").alias("revenue_cents"),
            F.expr("CAST(CAST(num AS DECIMAL(38,0)) DIV den AS BIGINT)").alias(
                "ewma_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# orders_yoy_growth — year-over-year revenue growth per customer
# nation: the trend table behind every "growth by market" report.
# Growth is exact integer ppm: (cents - prev) * 1e6 // prev, where both
# engines' integer division truncates toward zero (verified: DuckDB
# `//` and Spark `DIV` agree on negatives), so down years hash
# identically too. Consecutive years only — a gap year yields no row
# (lag is year-keyed, not row-keyed).
#
# Scale shape: the fact collapses to a (nation × year) aggregate
# (map-side combined, dims broadcast); the lag window runs per nation
# over ≤ a-few-dozen year rows.
# ---------------------------------------------------------------------------


@register(
    "orders_yoy_growth",
    oracle=f"""
WITH ny AS (
  SELECT n_name AS nation, year(o_orderdate) AS yr,
    {_CENTS_SQL.format(expr="o_totalprice")} AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
lagged AS (
  SELECT nation, yr, cents,
    lag(cents) OVER (PARTITION BY nation ORDER BY yr) AS prev,
    lag(yr) OVER (PARTITION BY nation ORDER BY yr) AS prev_yr
  FROM ny
)
SELECT nation, CAST(yr AS BIGINT) AS yr, cents,
  prev AS prev_cents,
  CAST((cents - prev) * 1000000 // prev AS BIGINT) AS yoy_growth_ppm
FROM lagged
WHERE prev IS NOT NULL AND yr = prev_yr + 1
""",
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    ny = (
        orders.join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", F.year("o_orderdate").alias("yr"))
        .agg(_cents(F.col("o_totalprice")).alias("cents"))
    )
    w = Window.partitionBy("nation").orderBy("yr")
    return (
        ny.withColumn("prev", F.lag("cents").over(w))
        .withColumn("prev_yr", F.lag("yr").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("yr") == F.col("prev_yr") + 1))
        .select(
            "nation",
            F.col("yr").cast("bigint").alias("yr"),
            "cents",
            F.col("prev").alias("prev_cents"),
            F.expr("CAST((cents - prev) * 1000000 DIV prev AS BIGINT)").alias(
                "yoy_growth_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# discount_effectiveness — revenue and volume by discount band: does a
# deeper discount actually move quantity? Classic pricing-analytics
# rollup with the exact-cents discipline; discount bands are integer
# percent points (floor(discount * 100)), so banding is exact.
#
# Scale shape: single map-side-combined aggregate over the fact scan,
# band key cardinality ≤ 11; the per-band unit economics are 128-bit
# integer divisions of the collapsed aggregates.
# ---------------------------------------------------------------------------


@register(
    "discount_effectiveness",
    oracle=f"""
WITH b AS (
  SELECT CAST(floor(l_discount * 100) AS BIGINT) AS discount_pct,
    CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 0) AS BIGINT)
      AS total_qty,
    {_CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")}
      AS revenue_cents,
    CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem GROUP BY 1
)
SELECT discount_pct, n_items, total_qty, revenue_cents,
  CAST(CAST(revenue_cents AS HUGEINT) // n_items AS BIGINT)
    AS cents_per_item,
  CAST(CAST(total_qty AS HUGEINT) * 1000000 // n_items AS BIGINT)
    AS qty_per_item_ppm
FROM b
""",
)
def discount_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy(
        F.floor(F.col("l_discount") * 100).cast("bigint").alias("discount_pct")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_quantity").cast(DEC)), 0)
        .cast("bigint")
        .alias("total_qty"),
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue_cents"
        ),
    )
    return b.select(
        "discount_pct",
        "n_items",
        "total_qty",
        "revenue_cents",
        F.expr(
            "CAST(CAST(revenue_cents AS DECIMAL(38,0)) DIV n_items AS BIGINT)"
        ).alias("cents_per_item"),
        F.expr(
            "CAST(CAST(total_qty AS DECIMAL(38,0)) * 1000000 DIV n_items"
            " AS BIGINT)"
        ).alias("qty_per_item_ppm"),
    )


# ---------------------------------------------------------------------------
# hierarchy_share_of_parent — ratio-to-parent drilldown: revenue per
# (brand, type) leaf with its share of the brand (parent) and of the
# grand total, in exact ppm. The drilldown companion to the ROLLUP
# operators (which give totals per level but not the child/parent
# ratios a treemap or Krona chart renders).
#
# Scale shape: the fact collapses to the (brand, type) aggregate first;
# parent and grand totals are RE-AGGREGATES of that collapsed table
# (never a second fact pass), joined back — brand totals by key,
# the 1-row grand total broadcast.
# ---------------------------------------------------------------------------


@register(
    "hierarchy_share_of_parent",
    oracle=f"""
WITH leaf AS (
  SELECT p_brand, p_type,
    {_CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")}
      AS revenue_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
),
brand AS (
  SELECT p_brand, CAST(sum(revenue_cents) AS BIGINT) AS brand_cents
  FROM leaf GROUP BY 1
),
total AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS total_cents FROM leaf)
SELECT leaf.p_brand, p_type, revenue_cents, brand_cents,
  CAST(CAST(revenue_cents AS HUGEINT) * 1000000 // brand_cents AS BIGINT)
    AS share_of_brand_ppm,
  CAST(CAST(revenue_cents AS HUGEINT) * 1000000 // total_cents AS BIGINT)
    AS share_of_total_ppm
FROM leaf JOIN brand ON leaf.p_brand = brand.p_brand, total
""",
)
def hierarchy_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type"
    )
    leaf = (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue_cents"
            )
        )
    )
    brand = leaf.groupBy("p_brand").agg(
        F.sum("revenue_cents").cast("bigint").alias("brand_cents")
    )
    total = leaf.agg(
        F.sum("revenue_cents").cast("bigint").alias("total_cents")
    )
    return (
        leaf.join(brand, "p_brand")
        .crossJoin(F.broadcast(total))
        .select(
            "p_brand",
            "p_type",
            "revenue_cents",
            "brand_cents",
            F.expr(
                "CAST(CAST(revenue_cents AS DECIMAL(38,0)) * 1000000"
                " DIV brand_cents AS BIGINT)"
            ).alias("share_of_brand_ppm"),
            F.expr(
                "CAST(CAST(revenue_cents AS DECIMAL(38,0)) * 1000000"
                " DIV total_cents AS BIGINT)"
            ).alias("share_of_total_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# part_price_size_skyline — 2-D skyline (Pareto front, Börzsönyi 2001):
# parts not dominated on (maximize p_size, minimize p_retailprice) —
# "no bigger part is as cheap". The multi-objective top-N every
# catalog/pricing page wants and plain ORDER BY cannot express.
#
# Dominance reduction: a part is on the skyline iff its price equals
# the minimum for its size AND every strictly larger size's minimum
# price is strictly higher. That turns the O(n²) dominance test into
# (1) a per-size min (map-combined groupBy over the fact), then (2) a
# running min over the ~50-row DISTINCT-size frame ordered by size
# descending — the only window is value-bounded (|distinct sizes|),
# same contract as anosim's distinct-distance table, and (3) a
# broadcast semi-join of the skyline sizes back to parts. Scales as
# one scan + one bounded window regardless of part count.
# ---------------------------------------------------------------------------


@register(
    "part_price_size_skyline",
    oracle="""
WITH sz AS (
  SELECT p_size, min(p_retailprice) AS m
  FROM part GROUP BY p_size
), sky AS (
  SELECT p_size, m,
    min(m) OVER (ORDER BY p_size DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_larger
  FROM sz
)
SELECT p.p_partkey, p.p_name, CAST(p.p_size AS BIGINT) AS p_size,
       p.p_retailprice
FROM part p JOIN sky ON p.p_size = sky.p_size
WHERE p.p_retailprice = sky.m
  AND (sky.best_larger IS NULL OR sky.best_larger > sky.m)
""",
)
def part_price_size_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    sz = part.groupBy("p_size").agg(F.min("p_retailprice").alias("m"))
    # unpartitioned window bound: |p_size| rows (50-value domain)
    w = (
        Window.orderBy(F.col("p_size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sky = (
        sz.withColumn("best_larger", F.min("m").over(w))
        .filter(F.col("best_larger").isNull() | (F.col("best_larger") > F.col("m")))
        .select("p_size", "m")
    )
    return (
        part.join(F.broadcast(sky), "p_size")
        .filter(F.col("p_retailprice") == F.col("m"))
        .select(
            "p_partkey",
            "p_name",
            F.col("p_size").cast("bigint").alias("p_size"),
            "p_retailprice",
        )
    )
