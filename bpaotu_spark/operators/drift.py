"""Distribution-drift and lifecycle operators.

* ``source_jsd_matrix`` — pairwise Jensen-Shannon divergence between
  the token distributions of every source pair (the source-similarity
  matrix a mixture planner consults before collapsing near-identical
  crawls; bounded at |sources|² pairs, token stats vocab-bounded).
  JSD = H(m) − (H(p)+H(q))/2 with m the midpoint mixture; every ln()
  floored to micro-nats on the identical rational, per-cell, before
  the vocab-keyed sum.
* ``churn_reactivation_quarterly`` — customer lifecycle states from
  order gaps: a gap > 180 days ends an episode; per quarter, how many
  customers churned (ended an episode) and how many reactivated
  (returned after a >180-day gap). Customer-partitioned lag window —
  nothing crosses customers.
* ``returnflag_drift_yearly`` — per-(year, returnflag) share of
  lineitems in ppm plus the drift vs the previous year (the
  slow-dimension version of token_rate_drift; the returns-mix
  regression alarm).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.functions.textops import TOKENIZE_SQL, tokenize
from bpaotu_spark.registry import register

# ---------------------------------------------------------------------------
# source_jsd_matrix
# ---------------------------------------------------------------------------


@register(
    "source_jsd_matrix",
    oracle=f"""
WITH tok AS (
  SELECT source, unnest({TOKENIZE_SQL}) AS w FROM documents
),
cnt AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY source, w
),
tot AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY source
),
sp AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.n AS nx, b.n AS ny
  FROM tot a JOIN tot b ON a.source < b.source
),
wa AS (
  SELECT source_a, source_b, w, c AS cx
  FROM sp JOIN cnt ON cnt.source = sp.source_a
),
wb AS (
  SELECT source_a, source_b, w, c AS cy
  FROM sp JOIN cnt ON cnt.source = sp.source_b
),
-- full outer over the pair's vocab union: a word absent on one side
-- contributes 0 to that side's term (its coalesced count is 0)
pairs AS (
  SELECT coalesce(wa.source_a, wb.source_a) AS source_a,
    coalesce(wa.source_b, wb.source_b) AS source_b,
    coalesce(cx, 0) AS cx, coalesce(cy, 0) AS cy, nx, ny
  FROM wa
  FULL JOIN wb ON wa.source_a = wb.source_a
    AND wa.source_b = wb.source_b AND wa.w = wb.w
  JOIN sp ON sp.source_a = coalesce(wa.source_a, wb.source_a)
    AND sp.source_b = coalesce(wa.source_b, wb.source_b)
),
terms AS (
  SELECT source_a, source_b,
    -- m-term: (p+q)/2 weighted by (p+q)/2, in the 2·n_x·n_y common
    -- denominator so the ratio is one exact rational per cell
    CASE WHEN cx > 0 THEN
      (cx * 1000000 // nx)
      * CAST(floor(ln(2.0 * cx * ny / (cx * 1.0 * ny + cy * 1.0 * nx))
          * 1000000) AS BIGINT)
    ELSE 0 END AS px_term,
    CASE WHEN cy > 0 THEN
      (cy * 1000000 // ny)
      * CAST(floor(ln(2.0 * cy * nx / (cx * 1.0 * ny + cy * 1.0 * nx))
          * 1000000) AS BIGINT)
    ELSE 0 END AS py_term
  FROM pairs
)
SELECT source_a, source_b,
  CAST((CAST(sum(px_term) AS HUGEINT) + sum(py_term)) // 2000000 AS BIGINT)
    AS jsd_micronats
FROM terms GROUP BY source_a, source_b
""",
)
def source_jsd_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(tokenize(F.col("text"))).alias("w")
    )
    cnt = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    # the ordered source-pair frame is |sources|² rows — a broadcast;
    # per-pair vocab rows are vocab-bounded, never corpus-bounded
    ta = tot.select(F.col("source").alias("source_a"), F.col("n").alias("nx"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("n").alias("ny"))
    sp = ta.crossJoin(tb).filter(F.col("source_a") < F.col("source_b"))
    wa = cnt.join(
        F.broadcast(sp), cnt.source == F.col("source_a")
    ).select("source_a", "source_b", "w", F.col("c").alias("cx"))
    wb = cnt.join(
        F.broadcast(sp), cnt.source == F.col("source_b")
    ).select("source_a", "source_b", "w", F.col("c").alias("cy"))
    merged = wa.join(
        wb, ["source_a", "source_b", "w"], "full"
    ).select(
        "source_a",
        "source_b",
        F.coalesce("cx", F.lit(0)).alias("cx"),
        F.coalesce("cy", F.lit(0)).alias("cy"),
    )
    pairs = merged.join(
        F.broadcast(sp.select("source_a", "source_b", "nx", "ny")),
        ["source_a", "source_b"],
    )
    terms = pairs.select(
        "source_a",
        "source_b",
        F.when(
            F.col("cx") > 0,
            F.expr("cx * 1000000 div nx")
            * F.floor(
                F.log(
                    2.0
                    * F.col("cx")
                    * F.col("ny")
                    / (
                        F.col("cx") * 1.0 * F.col("ny")
                        + F.col("cy") * 1.0 * F.col("nx")
                    )
                )
                * 1000000
            ).cast("bigint"),
        )
        .otherwise(0)
        .alias("px_term"),
        F.when(
            F.col("cy") > 0,
            F.expr("cy * 1000000 div ny")
            * F.floor(
                F.log(
                    2.0
                    * F.col("cy")
                    * F.col("nx")
                    / (
                        F.col("cx") * 1.0 * F.col("ny")
                        + F.col("cy") * 1.0 * F.col("nx")
                    )
                )
                * 1000000
            ).cast("bigint"),
        )
        .otherwise(0)
        .alias("py_term"),
    )
    return terms.groupBy("source_a", "source_b").agg(
        F.expr(
            "CAST((CAST(sum(px_term) AS DECIMAL(38,0)) + sum(py_term))"
            " DIV 2000000 AS BIGINT)"
        ).alias("jsd_micronats")
    )


# ---------------------------------------------------------------------------
# churn_reactivation_quarterly
# ---------------------------------------------------------------------------

_CHURN_GAP_DAYS = 180


@register(
    "churn_reactivation_quarterly",
    oracle=f"""
WITH g AS (
  SELECT o_custkey, o_orderdate,
    lag(o_orderdate) OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_d
  FROM orders
),
marks AS (
  SELECT o_custkey, o_orderdate,
    (prev_d IS NOT NULL
     AND date_diff('day', CAST(prev_d AS DATE), CAST(o_orderdate AS DATE))
         > {_CHURN_GAP_DAYS}) AS is_reactivation
  FROM g
),
q AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
    CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
    CAST(count(*) AS BIGINT) AS n_orders,
    CAST(count(DISTINCT o_custkey) AS BIGINT) AS active_customers,
    CAST(sum(CASE WHEN is_reactivation THEN 1 ELSE 0 END) AS BIGINT)
      AS reactivations
  FROM marks GROUP BY 1, 2
)
SELECT yr, qtr, n_orders, active_customers, reactivations,
  (reactivations * 1000000) // active_customers AS reactivation_ppm
FROM q
""",
)
def churn_reactivation_quarterly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    marks = od.select(
        "o_custkey",
        "o_orderdate",
        (
            F.lag("o_orderdate").over(w).isNotNull()
            & (
                F.datediff("o_orderdate", F.lag("o_orderdate").over(w))
                > _CHURN_GAP_DAYS
            )
        ).alias("is_reactivation"),
    )
    q = marks.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("active_customers"),
        F.sum(F.when(F.col("is_reactivation"), 1).otherwise(0)).alias(
            "reactivations"
        ),
    )
    return q.select(
        "yr",
        "qtr",
        "n_orders",
        "active_customers",
        "reactivations",
        F.expr("(reactivations * 1000000) div active_customers").alias(
            "reactivation_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# returnflag_drift_yearly
# ---------------------------------------------------------------------------


@register(
    "returnflag_drift_yearly",
    oracle="""
WITH c AS (
  SELECT CAST(year(l_shipdate) AS BIGINT) AS yr, l_returnflag,
    CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1, 2
),
tot AS (
  SELECT yr, CAST(sum(n) AS BIGINT) AS yr_total FROM c GROUP BY yr
),
share AS (
  SELECT c.yr, l_returnflag, n, (n * 1000000) // yr_total AS share_ppm
  FROM c JOIN tot ON c.yr = tot.yr
)
SELECT yr, l_returnflag, n AS n_items, share_ppm,
  share_ppm - lag(share_ppm) OVER (
    PARTITION BY l_returnflag ORDER BY yr) AS delta_ppm
FROM share
""",
)
def returnflag_drift_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy(
        F.year("l_shipdate").cast("bigint").alias("yr"), "l_returnflag"
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("yr").agg(F.sum("n").alias("yr_total"))
    share = c.join(F.broadcast(tot), "yr").select(
        "yr",
        "l_returnflag",
        "n",
        F.expr("(n * 1000000) div yr_total").alias("share_ppm"),
    )
    w = Window.partitionBy("l_returnflag").orderBy("yr")
    return share.select(
        "yr",
        "l_returnflag",
        F.col("n").alias("n_items"),
        "share_ppm",
        (F.col("share_ppm") - F.lag("share_ppm").over(w)).alias("delta_ppm"),
    )
