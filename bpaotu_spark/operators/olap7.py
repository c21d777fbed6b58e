"""Round-9 OLAP operators: inequality, order-shape, rank-select
quantiles, Lorenz concentration, and catalog breadth.

Reference parity: the reference's contextual-search result pages
(public path ``bpaotu/otu/views.py`` sample search + per-sample
summaries) are per-entity aggregates over the fact table; these extend
the engine's OLAP family with the distribution-shape summaries left on
SURVEY.md §2's analyst-expectation list.

* ``customer_order_gini`` — Gini of per-customer order counts per
  nation (the source_length_gini rank identity, exact ppm): the
  customer-concentration inequality lens.
* ``order_linecount_priority_profile`` — lines-per-order histogram by
  priority (band 1..7+) with exact per-priority share ppm: the order
  "shape" profile capacity planning reads.
* ``part_type_price_quartiles`` — exact Q1/median/Q3 of retail cents
  per part-type class via rank selection at ceil(p·n) (no
  interpolation — both engines pick the same physical row).
* ``revenue_lorenz_points`` — per-nation revenue share of the top
  1% / 5% / 10% customers (exact ppm): three Lorenz-curve points, the
  concentration summary behind customer_pareto_share.
* ``supplier_catalog_breadth`` — distinct parts supplied per supplier,
  rolled to per-nation mean (milli) / max: assortment breadth.

Determinism: everything is integer counts/cents with floor-DIV ratios;
rank selections are made unique by id tiebreaks.

Scale shape: each operator is one fact-scan aggregation shuffled on
its natural key (custkey / orderkey / suppkey), one bounded-partition
rank window (per nation / per type-class — parallel across groups),
and a bounded output. No unpartitioned windows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table, maybe_broadcast
from bpaotu_spark.registry import register

# ---------------------------------------------------------------------------
# customer_order_gini
# ---------------------------------------------------------------------------


@register(
    "customer_order_gini",
    oracle="""
WITH oc AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT n_name, x,
    row_number() OVER (PARTITION BY n_name ORDER BY x, o_custkey) AS rn
  FROM oc
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
),
g AS (
  SELECT n_name, count(*) AS n, CAST(sum(x) AS BIGINT) AS total_orders,
    sum(CAST(rn AS HUGEINT) * x) AS sr
  FROM r GROUP BY n_name
)
SELECT n_name, CAST(n AS BIGINT) AS n_customers, total_orders,
  CAST(((2 * sr - (n + 1) * CAST(total_orders AS HUGEINT)) * 1000000)
       // (CAST(n AS HUGEINT) * total_orders) AS BIGINT) AS gini_ppm
FROM g WHERE total_orders > 0 ORDER BY n_name
""",
)
def customer_order_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini (exact ppm) of per-customer order counts."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    oc = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    w = Window.partitionBy("n_name").orderBy("x", "o_custkey")
    r = (
        oc.join(maybe_broadcast(cust), oc.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("n_name", "x", "o_custkey")
        .withColumn("rn", F.row_number().over(w))
    )
    g = r.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("total_orders"),
        F.sum(F.col("rn").cast("decimal(38,0)") * F.col("x")).alias("sr"),
    )
    return (
        g.filter("total_orders > 0")
        .select(
            "n_name",
            F.col("n").cast("bigint").alias("n_customers"),
            "total_orders",
            F.expr(
                "CAST(((2 * sr - (n + 1)"
                " * CAST(total_orders AS DECIMAL(38,0))) * 1000000)"
                " DIV (CAST(n AS DECIMAL(38,0)) * total_orders)"
                " AS BIGINT)"
            ).alias("gini_ppm"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# order_linecount_priority_profile
# ---------------------------------------------------------------------------


@register(
    "order_linecount_priority_profile",
    oracle="""
WITH lc AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey
),
b AS (
  SELECT o_orderpriority AS priority,
    CAST(least(n_lines, 7) AS BIGINT) AS band
  FROM lc JOIN orders ON l_orderkey = o_orderkey
),
c AS (
  SELECT priority, band, CAST(count(*) AS BIGINT) AS n_orders
  FROM b GROUP BY priority, band
),
t AS (
  SELECT priority, CAST(sum(n_orders) AS BIGINT) AS tot FROM c
  GROUP BY priority
)
SELECT c.priority, band, n_orders,
  CAST(n_orders * 1000000 // tot AS BIGINT) AS share_ppm
FROM c JOIN t ON c.priority = t.priority
ORDER BY c.priority, band
""",
)
def order_linecount_priority_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lines-per-order histogram (band 1..7+) by order priority."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("priority")
    )
    lc = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines")
    )
    b = lc.join(orders, lc.l_orderkey == orders.o_orderkey).select(
        "priority",
        F.least(F.col("n_lines"), F.lit(7)).cast("bigint").alias("band"),
    )
    c = b.groupBy("priority", "band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    t = c.groupBy("priority").agg(
        F.sum("n_orders").cast("bigint").alias("tot")
    )
    return (
        c.join(F.broadcast(t), "priority")
        .select(
            "priority",
            "band",
            "n_orders",
            F.expr("n_orders * 1000000 div tot").alias("share_ppm"),
        )
        .orderBy("priority", "band")
    )


# ---------------------------------------------------------------------------
# part_type_price_quartiles
# ---------------------------------------------------------------------------


@register(
    "part_type_price_quartiles",
    oracle="""
WITH x AS (
  SELECT string_split(p_type, ' ')[1] AS type_class,
    CAST(floor(p_retailprice * 100) AS BIGINT) AS cents, p_partkey
  FROM part
),
r AS (
  SELECT type_class, cents,
    row_number() OVER (PARTITION BY type_class
                       ORDER BY cents, p_partkey) AS rn,
    count(*) OVER (PARTITION BY type_class) AS n
  FROM x
)
SELECT type_class, CAST(max(n) AS BIGINT) AS n_parts,
  CAST(max(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS BIGINT)
    AS q1_cents,
  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS BIGINT)
    AS median_cents,
  CAST(max(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS BIGINT)
    AS q3_cents
FROM r GROUP BY type_class ORDER BY type_class
""",
)
def part_type_price_quartiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact rank-selected Q1/median/Q3 retail cents per part-type
    class (ceil(p·n) convention — both engines pick the same row)."""
    part = load_table(spark, sf_dir, "part")
    x = part.select(
        F.split(F.col("p_type"), " ")[0].alias("type_class"),
        F.floor(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
        "p_partkey",
    )
    w = Window.partitionBy("type_class").orderBy("cents", "p_partkey")
    wc = Window.partitionBy("type_class")
    r = x.select(
        "type_class",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    return (
        r.groupBy("type_class")
        .agg(
            F.max("n").cast("bigint").alias("n_parts"),
            F.max(
                F.expr("CASE WHEN rn = (n + 3) div 4 THEN cents END")
            )
            .cast("bigint")
            .alias("q1_cents"),
            F.max(
                F.expr("CASE WHEN rn = (n + 1) div 2 THEN cents END")
            )
            .cast("bigint")
            .alias("median_cents"),
            F.max(
                F.expr("CASE WHEN rn = (3 * n + 3) div 4 THEN cents END")
            )
            .cast("bigint")
            .alias("q3_cents"),
        )
        .orderBy("type_class")
    )


# ---------------------------------------------------------------------------
# revenue_lorenz_points
# ---------------------------------------------------------------------------

_LORENZ_PCTS = (1, 5, 10)


@register(
    "revenue_lorenz_points",
    oracle="""
WITH cr AS (
  SELECT o_custkey,
    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      AS cents
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT n_name, cents,
    row_number() OVER (PARTITION BY n_name
                       ORDER BY cents DESC, o_custkey) AS rn,
    count(*) OVER (PARTITION BY n_name) AS n,
    sum(cents) OVER (PARTITION BY n_name
                     ORDER BY cents DESC, o_custkey) AS cum
  FROM cr
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
),
t AS (
  SELECT n_name, CAST(max(n) AS BIGINT) AS n_cust,
    CAST(sum(cents) AS BIGINT) AS total_cents,
    CAST(max(CASE WHEN rn = (n * 1 + 99) // 100 THEN cum END)
      AS BIGINT) AS top1_cents,
    CAST(max(CASE WHEN rn = (n * 5 + 99) // 100 THEN cum END)
      AS BIGINT) AS top5_cents,
    CAST(max(CASE WHEN rn = (n * 10 + 99) // 100 THEN cum END)
      AS BIGINT) AS top10_cents
  FROM r GROUP BY n_name
)
SELECT n_name, n_cust, total_cents,
  CAST(CAST(top1_cents AS HUGEINT) * 1000000 // total_cents AS BIGINT) AS top1_ppm,
  CAST(CAST(top5_cents AS HUGEINT) * 1000000 // total_cents AS BIGINT) AS top5_ppm,
  CAST(CAST(top10_cents AS HUGEINT) * 1000000 // total_cents AS BIGINT) AS top10_ppm
FROM t WHERE total_cents > 0 ORDER BY n_name
""",
)
def revenue_lorenz_points(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-nation revenue share (exact ppm) of the top 1/5/10 % of
    customers — three Lorenz-curve points, rank convention
    ceil(n·p/100)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cr = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    wo = Window.partitionBy("n_name").orderBy(
        F.col("cents").desc(), F.col("o_custkey")
    )
    wp = Window.partitionBy("n_name")
    r = (
        cr.join(maybe_broadcast(cust), cr.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("n_name", "cents", "o_custkey")
        .withColumn("rn", F.row_number().over(wo))
        .withColumn("n", F.count(F.lit(1)).over(wp))
        .withColumn("cum", F.sum("cents").over(wo))
    )
    t = r.groupBy("n_name").agg(
        F.max("n").cast("bigint").alias("n_cust"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        *[
            F.max(
                F.expr(
                    f"CASE WHEN rn = (n * {p} + 99) div 100 THEN cum END"
                )
            )
            .cast("bigint")
            .alias(f"top{p}_cents")
            for p in _LORENZ_PCTS
        ],
    )
    return (
        t.filter("total_cents > 0")
        .select(
            "n_name",
            "n_cust",
            "total_cents",
            *[
                F.expr(
                    f"CAST(CAST(top{p}_cents AS DECIMAL(38,0)) * 1000000"
                    " div total_cents AS BIGINT)"
                ).alias(f"top{p}_ppm")
                for p in _LORENZ_PCTS
            ],
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# supplier_catalog_breadth
# ---------------------------------------------------------------------------


@register(
    "supplier_catalog_breadth",
    oracle="""
WITH sb AS (
  SELECT l_suppkey, CAST(count(DISTINCT l_partkey) AS BIGINT)
    AS breadth
  FROM lineitem GROUP BY l_suppkey
)
SELECT n_name,
  CAST(count(*) AS BIGINT) AS n_suppliers,
  CAST(sum(breadth) * 1000 // count(*) AS BIGINT)
    AS mean_breadth_milli,
  CAST(max(breadth) AS BIGINT) AS max_breadth
FROM sb
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""",
)
def supplier_catalog_breadth(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distinct parts supplied per supplier, rolled to per-nation
    mean (milli) and max."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    sb = li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").cast("bigint").alias("breadth")
    )
    return (
        sb.join(maybe_broadcast(sup), sb.l_suppkey == sup.s_suppkey)
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.expr(
                "CAST(sum(breadth) * 1000 div count(*) AS BIGINT)"
            ).alias("mean_breadth_milli"),
            F.max("breadth").cast("bigint").alias("max_breadth"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# nation_month_revenue_zscore — per-(nation, month) revenue z-score
# against the nation's own monthly distribution: z = (x·n − Σx) /
# sqrt(n·Σx² − (Σx)²), integers inside, one float sqrt (milli-floored).
# The anomaly grid a revenue review colors.
# Scale shape: one map-combined (nation, month) agg, then a bounded
# per-nation moment agg broadcast back over the grid.
# ---------------------------------------------------------------------------


@register(
    "nation_month_revenue_zscore",
    oracle="""
WITH m AS (
  SELECT n_name, date_trunc('month', CAST(o_orderdate AS DATE)) AS mon,
    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
g AS (
  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(cents) AS HUGEINT) AS s,
    CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss
  FROM m GROUP BY n_name
)
SELECT m.n_name, CAST(mon AS DATE) AS mon,
  CASE WHEN n * ss - s * s > 0 THEN
    CAST(floor((cents * n - s) / sqrt(CAST(n * ss - s * s AS DOUBLE))
         * 1000) AS BIGINT)
  ELSE CAST(0 AS BIGINT) END AS z_milli
FROM m JOIN g ON m.n_name = g.n_name
ORDER BY m.n_name, mon
""",
)
def nation_month_revenue_zscore(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-(nation, month) revenue z-score vs the nation's own months
    (exact integer moments, one float sqrt, milli)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    m = (
        orders.join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            "n_name",
            F.date_trunc("month", F.col("o_orderdate").cast("date"))
            .cast("date")
            .alias("mon"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    g = m.groupBy(F.col("n_name").alias("gn")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("s"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0)) * cents")).alias("ss"),
    )
    return (
        m.join(F.broadcast(g), m.n_name == g.gn)
        .select(
            "n_name",
            "mon",
            F.expr(
                "CASE WHEN n * ss - s * s > 0 THEN"
                " CAST(floor((cents * n - s)"
                " / sqrt(CAST(n * ss - s * s AS DOUBLE)) * 1000)"
                " AS BIGINT) ELSE CAST(0 AS BIGINT) END"
            ).alias("z_milli"),
        )
        .orderBy("n_name", "mon")
    )


# ---------------------------------------------------------------------------
# supplier_share_volatility — variance of a supplier's monthly revenue
# SHARE (ppm of that month's total), top-20 most volatile. Months
# without sales for a supplier are not zero-filled — the statistic is
# over the supplier's ACTIVE months (documented convention).
# Scale shape: (supplier, month) agg → broadcast monthly totals →
# per-supplier exact moments; top-20 via WindowGroupLimit.
# ---------------------------------------------------------------------------

_VOLA_TOPK = 20


@register(
    "supplier_share_volatility",
    oracle=f"""
WITH sm AS (
  SELECT l_suppkey, date_trunc('month', CAST(l_shipdate AS DATE)) AS mon,
    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      AS cents
  FROM lineitem GROUP BY 1, 2
),
mt AS (
  SELECT mon, CAST(sum(cents) AS BIGINT) AS tot FROM sm GROUP BY mon
),
sh AS (
  SELECT l_suppkey, CAST(cents * 1000000 // tot AS BIGINT) AS share_ppm
  FROM sm JOIN mt USING (mon)
),
v AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_months,
    CAST(count(*) * sum(CAST(share_ppm AS HUGEINT) * share_ppm)
         - CAST(sum(share_ppm) AS HUGEINT) * sum(share_ppm) AS HUGEINT)
      AS var_num
  FROM sh GROUP BY l_suppkey HAVING count(*) > 1
),
r AS (
  SELECT l_suppkey, n_months, CAST(var_num AS BIGINT) AS var_num,
    CAST(row_number() OVER (ORDER BY var_num DESC, l_suppkey)
      AS BIGINT) AS rnk
  FROM v QUALIFY rnk <= {_VOLA_TOPK}
)
SELECT rnk, l_suppkey AS suppkey, n_months, var_num
FROM r ORDER BY rnk
""",
)
def supplier_share_volatility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-20 suppliers by variance numerator n·Σs²−(Σs)² of their
    monthly revenue-share ppm (exact integers)."""
    li = load_table(spark, sf_dir, "lineitem")
    sm = li.groupBy(
        "l_suppkey",
        F.date_trunc("month", F.col("l_shipdate").cast("date")).alias(
            "mon"
        ),
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    mt = sm.groupBy("mon").agg(F.sum("cents").cast("bigint").alias("tot"))
    sh = sm.join(F.broadcast(mt), "mon").select(
        "l_suppkey",
        F.expr("CAST(cents * 1000000 div tot AS BIGINT)").alias(
            "share_ppm"
        ),
    )
    v = (
        sh.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_months"),
            F.expr(
                "CAST(count(*) * sum(CAST(share_ppm AS DECIMAL(38,0))"
                " * share_ppm) - CAST(sum(share_ppm) AS DECIMAL(38,0))"
                " * sum(share_ppm) AS DECIMAL(38,0))"
            ).alias("var_num"),
        )
        .filter("n_months > 1")
    )
    # unpartitioned window bound: rnk <= 20 → WindowGroupLimit heaps
    w = Window.orderBy(F.col("var_num").desc(), F.col("l_suppkey"))
    return (
        v.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _VOLA_TOPK)
        .select(
            "rnk",
            F.col("l_suppkey").alias("suppkey"),
            "n_months",
            F.col("var_num").cast("bigint").alias("var_num"),
        )
        .orderBy("rnk")
    )


# ---------------------------------------------------------------------------
# reorder_regularity_census — per-customer CV² of reorder gaps
# (exact ppm: CV² = (n·Σg² − (Σg)²)/(Σg)²), censused into bands.
# CV² < 1 → more regular than Poisson; > 1 → bursty. The subscription-
# detection lens on purchase cadence.
# Scale shape: per-customer lead window (parallel across customers),
# one exact moment agg, bounded band census.
# ---------------------------------------------------------------------------


@register(
    "reorder_regularity_census",
    oracle="""
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey
  FROM orders
),
g AS (
  SELECT o_custkey,
    date_diff('day', d,
      lead(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey))
      AS gap
  FROM o QUALIFY gap IS NOT NULL
),
c AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(gap) AS BIGINT) AS sg,
    CAST(sum(CAST(gap AS HUGEINT) * gap) AS HUGEINT) AS sgg
  FROM g GROUP BY o_custkey HAVING count(*) >= 2 AND sum(gap) > 0
),
cv AS (
  SELECT o_custkey,
    CAST((n * sgg - CAST(sg AS HUGEINT) * sg) * 1000000
         // (CAST(sg AS HUGEINT) * sg) AS BIGINT) AS cv2_ppm
  FROM c
)
SELECT CAST(least(cv2_ppm // 250000, 9) AS BIGINT) AS band,
  CAST(count(*) AS BIGINT) AS n_customers,
  CAST(sum(cv2_ppm) // count(*) AS BIGINT) AS mean_cv2_ppm
FROM cv GROUP BY band ORDER BY band
""",
)
def reorder_regularity_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Band census of per-customer reorder-gap CV² (exact ppm;
    customers with ≥ 3 orders)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    g = o.select(
        "o_custkey",
        F.datediff(F.lead("d").over(w), F.col("d")).alias("gap"),
    ).filter("gap IS NOT NULL")
    c = (
        g.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("gap").cast("bigint").alias("sg"),
            F.sum(F.expr("CAST(gap AS DECIMAL(38,0)) * gap")).alias(
                "sgg"
            ),
        )
        .filter("n >= 2 AND sg > 0")
    )
    cv = c.select(
        F.expr(
            "CAST((n * sgg - CAST(sg AS DECIMAL(38,0)) * sg) * 1000000"
            " DIV (CAST(sg AS DECIMAL(38,0)) * sg) AS BIGINT)"
        ).alias("cv2_ppm")
    )
    return (
        cv.groupBy(
            F.expr(
                "CAST(least(cv2_ppm div 250000, CAST(9 AS BIGINT))"
                " AS BIGINT)"
            ).alias("band")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.expr("CAST(sum(cv2_ppm) div count(*) AS BIGINT)").alias(
                "mean_cv2_ppm"
            ),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# orders_monthly_percentile_bridge — exact p50/p90 of order totals per
# month (rank-selected at ceil(p·n), cents): the distribution-shift
# trend a pricing review reads alongside the mean (a mean can rise
# while the median falls — this surface shows which).
# Scale shape: one month-partitioned rank window (parallel across
# months), conditional-agg rank pick.
# ---------------------------------------------------------------------------


@register(
    "orders_monthly_percentile_bridge",
    oracle="""
WITH x AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mon,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
  FROM orders
),
r AS (
  SELECT mon, cents,
    row_number() OVER (PARTITION BY mon ORDER BY cents, o_orderkey)
      AS rn,
    count(*) OVER (PARTITION BY mon) AS n
  FROM x
)
SELECT CAST(mon AS DATE) AS mon, CAST(max(n) AS BIGINT) AS n_orders,
  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS BIGINT)
    AS p50_cents,
  CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN cents END) AS BIGINT)
    AS p90_cents
FROM r GROUP BY mon ORDER BY mon
""",
)
def orders_monthly_percentile_bridge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact rank-selected p50/p90 order-total cents per month."""
    x = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", F.col("o_orderdate").cast("date"))
        .cast("date")
        .alias("mon"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("mon").orderBy("cents", "o_orderkey")
    wc = Window.partitionBy("mon")
    r = x.select(
        "mon",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    return (
        r.groupBy("mon")
        .agg(
            F.max("n").cast("bigint").alias("n_orders"),
            F.max(F.expr("CASE WHEN rn = (n + 1) div 2 THEN cents END"))
            .cast("bigint")
            .alias("p50_cents"),
            F.max(
                F.expr("CASE WHEN rn = (9 * n + 9) div 10 THEN cents END")
            )
            .cast("bigint")
            .alias("p90_cents"),
        )
        .orderBy("mon")
    )


# ---------------------------------------------------------------------------
# brand_nation_penetration — per brand: how many supplier nations
# carry it, its volume, and the top nation's share (exact ppm; top
# nation picked by volume with name tie-break): the distribution-
# footprint table an assortment review reads.
# Scale shape: lineitem ⋈ broadcast(supplier dims) → (brand, nation)
# agg; per-brand rank window over ≤ |brands|·|nations| rows.
# ---------------------------------------------------------------------------


@register(
    "brand_nation_penetration",
    oracle="""
WITH bn AS (
  SELECT p_brand, n_name,
    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY p_brand, n_name
),
r AS (
  SELECT p_brand, n_name, qty,
    CAST(sum(qty) OVER (PARTITION BY p_brand) AS BIGINT) AS tot,
    row_number() OVER (PARTITION BY p_brand
                       ORDER BY qty DESC, n_name) AS rn,
    count(*) OVER (PARTITION BY p_brand) AS n_nations
  FROM bn
)
SELECT p_brand, CAST(n_nations AS BIGINT) AS n_nations,
  tot AS total_qty, n_name AS top_nation,
  CAST(qty * 1000000 // tot AS BIGINT) AS top_share_ppm
FROM r WHERE rn = 1 ORDER BY p_brand
""",
)
def brand_nation_penetration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-brand supplier-nation footprint + top nation share ppm."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    bn = (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .join(maybe_broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("p_brand", "n_name")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("qty")
        )
    )
    wp = Window.partitionBy("p_brand")
    wr = Window.partitionBy("p_brand").orderBy(
        F.col("qty").desc(), F.col("n_name")
    )
    r = bn.select(
        "p_brand",
        "n_name",
        "qty",
        F.sum("qty").over(wp).cast("bigint").alias("tot"),
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n_nations"),
    )
    return (
        r.filter("rn = 1")
        .select(
            "p_brand",
            F.col("n_nations").cast("bigint").alias("n_nations"),
            F.col("tot").alias("total_qty"),
            F.col("n_name").alias("top_nation"),
            F.expr("CAST(qty * 1000000 div tot AS BIGINT)").alias(
                "top_share_ppm"
            ),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# customer_brand_loyalty_hhi — per-customer Herfindahl index over the
# brands they buy (exact ppm: Σ share², shares on the quantity grid),
# censused into bands: HHI → 1e6 means single-brand loyalists, → 1/k
# means brand-indifferent. The customer-level twin of the brand-level
# part_brand_hhi.
# Scale shape: (customer, brand) agg → per-customer exact HHI
# (Σq_b²·10⁶ div (Σq)²) → bounded band census.
# ---------------------------------------------------------------------------


@register(
    "customer_brand_loyalty_hhi",
    oracle="""
WITH cb AS (
  SELECT o_custkey, p_brand,
    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY o_custkey, p_brand
),
h AS (
  SELECT o_custkey,
    CAST(count(*) AS BIGINT) AS n_brands,
    CAST(sum(CAST(q AS HUGEINT) * q) * 1000000
         // (CAST(sum(q) AS HUGEINT) * sum(q)) AS BIGINT) AS hhi_ppm
  FROM cb GROUP BY o_custkey
)
SELECT CAST(least(hhi_ppm // 100000, 9) AS BIGINT) AS band,
  CAST(count(*) AS BIGINT) AS n_customers,
  CAST(sum(n_brands) * 1000 // count(*) AS BIGINT)
    AS mean_brands_milli
FROM h GROUP BY band ORDER BY band
""",
)
def customer_brand_loyalty_hhi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Band census of per-customer brand HHI (exact ppm)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    cb = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("o_custkey", "p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("q")
        )
    )
    h = cb.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_brands"),
        F.expr(
            "CAST(sum(CAST(q AS DECIMAL(38,0)) * q) * 1000000"
            " DIV (CAST(sum(q) AS DECIMAL(38,0)) * sum(q)) AS BIGINT)"
        ).alias("hhi_ppm"),
    )
    return (
        h.groupBy(
            F.expr(
                "CAST(least(hhi_ppm div 100000, CAST(9 AS BIGINT))"
                " AS BIGINT)"
            ).alias("band")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.expr(
                "CAST(sum(n_brands) * 1000 div count(*) AS BIGINT)"
            ).alias("mean_brands_milli"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# priority_mix_jsd_monthly — Jensen-Shannon divergence (floored micro-
# nats) between each month's order-priority mix and the overall mix:
# the composition-drift monitor on the priority dimension (the
# source_jsd_matrix idiom applied over time). Terms are per-(month,
# priority) floored before summing — order-free across engines.
# Scale shape: two map-combined aggs (month×priority, priority) and a
# bounded months × 5-priority grid.
# ---------------------------------------------------------------------------


@register(
    "priority_mix_jsd_monthly",
    oracle="""
WITH mp AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mon,
    o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
),
mt AS (SELECT mon, CAST(sum(c) AS BIGINT) AS mtot FROM mp GROUP BY mon),
gp AS (
  SELECT pri, CAST(sum(c) AS BIGINT) AS g FROM mp GROUP BY pri
),
gt AS (SELECT CAST(sum(g) AS BIGINT) AS gtot FROM gp),
terms AS (
  SELECT mon,
    -- p = month mix, q = global mix, m = (p+q)/2; JSD = (KL(p||m) +
    -- KL(q||m))/2; every ratio is a rational of exact integers
    CAST(floor((
      (CAST(c AS DOUBLE) / mtot)
        * ln((CAST(c AS DOUBLE) / mtot)
             / ((CAST(c AS DOUBLE) / mtot
                 + CAST(g AS DOUBLE) / gtot) / 2))
      + (CAST(g AS DOUBLE) / gtot)
        * ln((CAST(g AS DOUBLE) / gtot)
             / ((CAST(c AS DOUBLE) / mtot
                 + CAST(g AS DOUBLE) / gtot) / 2))
    ) / 2 * 1000000) AS BIGINT) AS t_micro
  FROM mp
  JOIN mt USING (mon)
  JOIN gp USING (pri)
  CROSS JOIN gt
)
SELECT CAST(mon AS DATE) AS mon,
  CAST(sum(t_micro) AS BIGINT) AS jsd_micro
FROM terms GROUP BY mon ORDER BY mon
""",
)
def priority_mix_jsd_monthly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Monthly JSD (floored micro-nats) of the order-priority mix vs
    the overall mix."""
    orders = load_table(spark, sf_dir, "orders")
    mp = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("date"))
        .cast("date")
        .alias("mon"),
        F.col("o_orderpriority").alias("pri"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    mt = mp.groupBy("mon").agg(F.sum("c").cast("bigint").alias("mtot"))
    gp = mp.groupBy("pri").agg(F.sum("c").cast("bigint").alias("g"))
    gt = gp.agg(F.sum("g").cast("bigint").alias("gtot"))
    terms = (
        mp.join(F.broadcast(mt), "mon")
        .join(F.broadcast(gp), "pri")
        .crossJoin(F.broadcast(gt))
        .select(
            "mon",
            F.expr(
                "CAST(floor(("
                " (CAST(c AS DOUBLE) / mtot)"
                "   * ln((CAST(c AS DOUBLE) / mtot)"
                "        / ((CAST(c AS DOUBLE) / mtot"
                "            + CAST(g AS DOUBLE) / gtot) / 2))"
                " + (CAST(g AS DOUBLE) / gtot)"
                "   * ln((CAST(g AS DOUBLE) / gtot)"
                "        / ((CAST(c AS DOUBLE) / mtot"
                "            + CAST(g AS DOUBLE) / gtot) / 2))"
                ") / 2 * 1000000) AS BIGINT)"
            ).alias("t_micro"),
        )
    )
    return (
        terms.groupBy("mon")
        .agg(F.sum("t_micro").cast("bigint").alias("jsd_micro"))
        .orderBy("mon")
    )
