"""Round-7 OLAP additions: market-basket rules + ABC classification.

* ``association_rules_parts`` — item-level association rules over
  order baskets (support / directional confidence / lift), the classic
  market-basket operator the brand-level basket_brand_lift summarizes.
* ``orders_abc_classification`` — ABC inventory classification of
  parts by revenue share (A ≤ 80 % cumulative, B ≤ 95 %, C rest), the
  ops-analytics dual of customer_pareto_share.

Determinism discipline: counts and cents are exact integers; ratios
are truncating div ppm/milli on nonnegative operands; the only
ordering that matters (rule top-k, ABC cumulative) is a total order
with explicit tie-breaks.

Scale shape: baskets pair only WITHIN an order (C(k,2) with k bounded
by TPC-H's ≤7 lineitems per order — the pair former is linear in the
fact table, never quadratic); the rule cut is TakeOrderedAndProject;
ABC's cumulative window runs over the PART DIMENSION (vocabulary-
bounded), not the fact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register

_AR_MINSUP = 3  # orders containing both parts
_AR_TOPK = 100


@register(
    "association_rules_parts",
    oracle=f"""
WITH ps AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
nt AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM ps),
cnt AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n FROM ps GROUP BY l_partkey
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
    CAST(count(*) AS BIGINT) AS support
  FROM ps a JOIN ps b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {_AR_MINSUP}
),
scored AS (
  SELECT part_a, part_b, support,
    support * 1000000 // ca.n AS conf_a2b_ppm,
    support * 1000000 // cb.n AS conf_b2a_ppm,
    support * n_orders * 1000 // (ca.n * cb.n) AS lift_milli
  FROM pairs
  JOIN cnt ca ON ca.l_partkey = part_a
  JOIN cnt cb ON cb.l_partkey = part_b
  CROSS JOIN nt
)
SELECT part_a, part_b, support, conf_a2b_ppm, conf_b2a_ppm, lift_milli,
  CAST(row_number() OVER (ORDER BY lift_milli DESC, support DESC,
       part_a ASC, part_b ASC) AS INTEGER) AS rnk
FROM scored
QUALIFY rnk <= {_AR_TOPK}
""",
)
def association_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} part-pair association rules by lift.

    Reference semantics: Agrawal & Srikant '94 support/confidence/lift
    over order baskets (public). support·N·1000 stays far inside int64
    (support ≤ N, counts ≤ N ≈ 1.5e9 at SF1000 ⇒ ~1e21 would overflow;
    at that scale switch the lift numerator to DECIMAL — noted here so
    the 100-TB reviewer sees the boundary).
    """
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    nt = ps.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    cnt = ps.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    pa = ps.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    pb = ps.select(F.col("l_orderkey").alias("ok_b"), F.col("l_partkey").alias("part_b"))
    pairs = (
        pa.join(pb, (pa.ok == pb.ok_b) & (pa.part_a < pb.part_b))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .filter(F.col("support") >= _AR_MINSUP)
    )
    scored = (
        pairs.join(
            F.broadcast(
                cnt.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("ca"))
            ),
            "part_a",
        )
        .join(
            F.broadcast(
                cnt.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("cb"))
            ),
            "part_b",
        )
        .crossJoin(F.broadcast(nt))
        .select(
            "part_a",
            "part_b",
            "support",
            F.expr("support * 1000000 div ca").alias("conf_a2b_ppm"),
            F.expr("support * 1000000 div cb").alias("conf_b2a_ppm"),
            F.expr("support * n_orders * 1000 div (ca * cb)").alias(
                "lift_milli"
            ),
        )
    )
    order_cols = [
        F.col("lift_milli").desc(),
        F.col("support").desc(),
        F.col("part_a").asc(),
        F.col("part_b").asc(),
    ]
    top = scored.orderBy(*order_cols).limit(_AR_TOPK)
    # unpartitioned window bound: runs over the LIMIT-_AR_TOPK cut
    w = Window.orderBy(*order_cols)
    return top.withColumn("rnk", F.row_number().over(w).cast("int"))


association_rules_parts.__doc__ = association_rules_parts.__doc__.format(
    k=_AR_TOPK
)


# ---------------------------------------------------------------------------
# orders_abc_classification — ABC analysis: rank parts by revenue,
# classify by cumulative share (A ≤ 80 %, B ≤ 95 %, C rest), report
# the class-level rollup. Revenue is exact integer cents per row
# (l_extendedprice carries 2 decimals); the cumulative share uses
# 128-bit numerators (cents·1e6 exceeds int64 once revenue passes
# ~9e12 cents — true at double-digit TB), floored ppm.
# ---------------------------------------------------------------------------


@register(
    "orders_abc_classification",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      AS cents
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM rev),
ranked AS (
  SELECT l_partkey, cents,
    CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum_cents
  FROM rev
),
classed AS (
  SELECT l_partkey, cents,
    CASE
      WHEN CAST(cum_cents AS HUGEINT) * 1000000 // total_cents <= 800000
        THEN 'A'
      WHEN CAST(cum_cents AS HUGEINT) * 1000000 // total_cents <= 950000
        THEN 'B'
      ELSE 'C' END AS abc_class,
    total_cents
  FROM ranked CROSS JOIN tot
)
SELECT abc_class,
  CAST(count(*) AS BIGINT) AS n_parts,
  CAST(sum(cents) AS BIGINT) AS revenue_cents,
  CAST(CAST(sum(cents) AS HUGEINT) * 1000000 // max(total_cents)
    AS BIGINT) AS share_ppm
FROM classed GROUP BY abc_class
""",
)
def orders_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC class rollup of parts by exact revenue cents."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    tot = rev.agg(F.sum("cents").cast("bigint").alias("total_cents"))
    # unpartitioned window bound: runs over the PART DIMENSION (the
    # revenue-per-part rollup), vocabulary-bounded, never the fact
    wc = Window.orderBy(F.col("cents").desc(), F.col("l_partkey").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = rev.withColumn(
        "cum_cents", F.sum("cents").over(wc).cast("bigint")
    )
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        "cents",
        "total_cents",
        F.expr(
            "CASE WHEN CAST(cum_cents AS DECIMAL(38,0)) * 1000000"
            " div total_cents <= 800000 THEN 'A'"
            " WHEN CAST(cum_cents AS DECIMAL(38,0)) * 1000000"
            " div total_cents <= 950000 THEN 'B'"
            " ELSE 'C' END"
        ).alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
        F.expr(
            "CAST(sum(CAST(cents AS DECIMAL(38,0))) * 1000000"
            " div max(total_cents) AS BIGINT)"
        ).alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# parts_xyz_classification — the demand-variability complement of ABC:
# classify parts by the coefficient of variation of MONTHLY demand
# quantity (X: cv < 0.5 steady, Y: 0.5 <= cv < 1.0 seasonal, Z: cv >=
# 1.0 erratic). The cv thresholds compare EXACTLY in integers: with
# mean = s/n and var·n² = n·Σq² − s², cv < c ⟺ var·n² < c²·s² ⟺
# 4·(n·Σq² − s²) < s² (c = 1/2) and (n·Σq² − s²) < s² (c = 1) — no
# float ever enters the classification. Months with zero demand count
# as zero-quantity months over the part's [first, last] active month
# span (the standard XYZ convention: gaps ARE variability).
# ---------------------------------------------------------------------------


@register(
    "parts_xyz_classification",
    oracle="""
WITH lm AS (
  SELECT l_partkey,
    (year(CAST(o_orderdate AS DATE)) * 12
      + month(CAST(o_orderdate AS DATE)) - 1) AS mon,
    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
span AS (
  SELECT l_partkey,
    CAST(max(mon) - min(mon) + 1 AS HUGEINT) AS n,
    CAST(sum(q) AS HUGEINT) AS s,
    CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS ssq
  FROM lm GROUP BY l_partkey
),
classed AS (
  SELECT l_partkey,
    CASE
      WHEN 4 * (n * ssq - s * s) < s * s THEN 'X'
      WHEN (n * ssq - s * s) < s * s THEN 'Y'
      ELSE 'Z' END AS xyz_class,
    n, s
  FROM span
)
SELECT xyz_class,
  CAST(count(*) AS BIGINT) AS n_parts,
  CAST(sum(CAST(s AS BIGINT)) AS BIGINT) AS total_qty,
  CAST(sum(CAST(n AS BIGINT)) AS BIGINT) AS total_active_months
FROM classed GROUP BY xyz_class
""",
)
def parts_xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classes with exact-integer cv thresholds.

    Zero-demand months inside a part's active span contribute zero to s
    and ssq but count in n — algebraically free (no spine join needed:
    n = span length, sums over observed months only).
    """
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lm = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy(
            "l_partkey",
            (
                F.year(F.col("o_orderdate").cast("date")) * 12
                + F.month(F.col("o_orderdate").cast("date"))
                - 1
            ).alias("mon"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
    )
    span = lm.groupBy("l_partkey").agg(
        (F.max("mon") - F.min("mon") + 1).cast("decimal(38,0)").alias("n"),
        F.sum("q").cast("decimal(38,0)").alias("s"),
        F.sum(F.expr("CAST(q AS DECIMAL(38,0)) * q")).alias("ssq"),
    )
    classed = span.select(
        "l_partkey",
        "n",
        "s",
        F.expr(
            "CASE WHEN 4 * (n * ssq - s * s) < s * s THEN 'X'"
            " WHEN (n * ssq - s * s) < s * s THEN 'Y'"
            " ELSE 'Z' END"
        ).alias("xyz_class"),
    )
    return classed.groupBy("xyz_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.expr("CAST(sum(CAST(s AS BIGINT)) AS BIGINT)").alias("total_qty"),
        F.expr("CAST(sum(CAST(n AS BIGINT)) AS BIGINT)").alias(
            "total_active_months"
        ),
    )


# ---------------------------------------------------------------------------
# revenue_bridge_yoy — the FP&A revenue bridge: decompose each brand's
# year-over-year revenue change into a VOLUME effect (quantity change
# at last year's realized price) and a PRICE/MIX effect (the
# remainder) — the waterfall every revenue review starts from.
# Exact integers: revenue in cents, quantity in units; the volume
# effect (q₂−q₁)·R₁ div q₁ floors once, and price/mix is defined as
# the exact complement (ΔR − volume), so the bridge always sums.
# ---------------------------------------------------------------------------

_BR_Y1, _BR_Y2 = 1996, 1997


@register(
    "revenue_bridge_yoy",
    oracle=f"""
WITH li AS (
  SELECT p_brand, year(CAST(o_orderdate AS DATE)) AS yr,
    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
    CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE year(CAST(o_orderdate AS DATE)) IN ({_BR_Y1}, {_BR_Y2})
),
yb AS (
  SELECT p_brand,
    CAST(sum(CASE WHEN yr = {_BR_Y1} THEN cents ELSE 0 END) AS BIGINT) AS r1,
    CAST(sum(CASE WHEN yr = {_BR_Y2} THEN cents ELSE 0 END) AS BIGINT) AS r2,
    CAST(sum(CASE WHEN yr = {_BR_Y1} THEN qty ELSE 0 END) AS BIGINT) AS q1,
    CAST(sum(CASE WHEN yr = {_BR_Y2} THEN qty ELSE 0 END) AS BIGINT) AS q2
  FROM li GROUP BY p_brand
)
SELECT p_brand, r1 AS rev1_cents, r2 AS rev2_cents,
  r2 - r1 AS delta_cents,
  CAST(CAST(q2 - q1 AS HUGEINT) * r1 // q1 AS BIGINT)
    AS volume_effect_cents,
  (r2 - r1) - CAST(CAST(q2 - q1 AS HUGEINT) * r1 // q1 AS BIGINT)
    AS price_mix_effect_cents
FROM yb WHERE q1 > 0
""",
)
def revenue_bridge_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand YoY revenue bridge (volume vs price/mix, exact cents)."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year(F.col("o_orderdate").cast("date")).alias("yr")
    ).filter(F.col("yr").isin(_BR_Y1, _BR_Y2))
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(
            "p_brand",
            "yr",
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("cents"),
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
    )
    yb = j.groupBy("p_brand").agg(
        F.sum(F.when(F.col("yr") == _BR_Y1, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("r1"),
        F.sum(F.when(F.col("yr") == _BR_Y2, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("r2"),
        F.sum(F.when(F.col("yr") == _BR_Y1, F.col("qty")).otherwise(0))
        .cast("bigint")
        .alias("q1"),
        F.sum(F.when(F.col("yr") == _BR_Y2, F.col("qty")).otherwise(0))
        .cast("bigint")
        .alias("q2"),
    )
    return yb.filter(F.col("q1") > 0).select(
        "p_brand",
        F.col("r1").alias("rev1_cents"),
        F.col("r2").alias("rev2_cents"),
        (F.col("r2") - F.col("r1")).alias("delta_cents"),
        F.expr(
            "CAST(CAST(q2 - q1 AS DECIMAL(38,0)) * r1 div q1 AS BIGINT)"
        ).alias("volume_effect_cents"),
        F.expr(
            "(r2 - r1) - CAST(CAST(q2 - q1 AS DECIMAL(38,0)) * r1 div q1"
            " AS BIGINT)"
        ).alias("price_mix_effect_cents"),
    )


# ---------------------------------------------------------------------------
# promo_did_estimate — difference-in-differences on promo parts: mean
# lineitem revenue for PROMO vs non-PROMO parts, before vs after the
# period midpoint; DiD = (treat_post − treat_pre) − (ctrl_post −
# ctrl_pre). The standard quasi-experimental read when a treatment
# (promotion flag) wasn't randomized. Means are milli-cent floored
# integers; the estimate derives from the four floored cells, so both
# engines agree bit-for-bit.
# ---------------------------------------------------------------------------

_DID_SPLIT = "1998-01-01"


@register(
    "promo_did_estimate",
    oracle=f"""
WITH li AS (
  SELECT
    CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS treated,
    CASE WHEN CAST(o_orderdate AS DATE) >= DATE '{_DID_SPLIT}'
         THEN 1 ELSE 0 END AS post,
    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
),
cells AS (
  SELECT treated, post,
    CAST(sum(cents) AS HUGEINT) * 1000 // count(*) AS mean_milli,
    CAST(count(*) AS BIGINT) AS n
  FROM li GROUP BY treated, post
)
SELECT
  CAST(max(CASE WHEN treated = 1 AND post = 0 THEN mean_milli END)
    AS BIGINT) AS treat_pre_milli,
  CAST(max(CASE WHEN treated = 1 AND post = 1 THEN mean_milli END)
    AS BIGINT) AS treat_post_milli,
  CAST(max(CASE WHEN treated = 0 AND post = 0 THEN mean_milli END)
    AS BIGINT) AS ctrl_pre_milli,
  CAST(max(CASE WHEN treated = 0 AND post = 1 THEN mean_milli END)
    AS BIGINT) AS ctrl_post_milli,
  CAST(sum(n) AS BIGINT) AS n_lineitems,
  CAST((max(CASE WHEN treated = 1 AND post = 1 THEN mean_milli END)
    - max(CASE WHEN treated = 1 AND post = 0 THEN mean_milli END))
    - (max(CASE WHEN treated = 0 AND post = 1 THEN mean_milli END)
    - max(CASE WHEN treated = 0 AND post = 0 THEN mean_milli END))
    AS BIGINT) AS did_milli
FROM cells
""",
)
def promo_did_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x2 DiD on mean lineitem revenue, promo vs non-promo parts."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderdate").cast("date") >= F.lit(_DID_SPLIT).cast("date"))
        .cast("int")
        .alias("post"),
    )
    pt = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_type").startswith("PROMO").cast("int").alias("treated"),
    )
    cells = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(
            "treated",
            "post",
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("treated", "post")
        .agg(
            F.expr(
                "CAST(sum(CAST(cents AS DECIMAL(38,0))) * 1000"
                " div count(1) AS BIGINT)"
            ).alias("mean_milli"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    cell = lambda t, p: F.max(  # noqa: E731
        F.when(
            (F.col("treated") == t) & (F.col("post") == p),
            F.col("mean_milli"),
        )
    ).cast("bigint")
    return cells.agg(
        cell(1, 0).alias("treat_pre_milli"),
        cell(1, 1).alias("treat_post_milli"),
        cell(0, 0).alias("ctrl_pre_milli"),
        cell(0, 1).alias("ctrl_post_milli"),
        F.sum("n").cast("bigint").alias("n_lineitems"),
        (
            (cell(1, 1) - cell(1, 0)) - (cell(0, 1) - cell(0, 0))
        ).alias("did_milli"),
    )
