"""Round-12 OLAP additions.

* ``cr4_by_part_type`` — the four-firm concentration ratio per part
  type: the top-4 suppliers' share of the type's discounted revenue.
  The antitrust-style complement to the HHI family (orders_hhi /
  part_brand_hhi measure the full distribution; CR4 reads only the
  head, the number procurement teams actually quote for supply risk).

Determinism: revenue in exact micro-dollars via the repo's
DECIMAL(18,6) partial-sum idiom; top-4 rank by (revenue DESC, suppkey
ASC); share ppm by truncating integer division.

Scale shape: one fact scan -> (type, supplier) groupBy (map-side
combined), rank window PARTITIONED by type, 1 row per type.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register


@register(
    "cr4_by_part_type",
    oracle="""
WITH rev AS (
  SELECT p_type, l_suppkey,
    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
         * 1000000 AS BIGINT) AS rev_micro
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY p_type, l_suppkey
),
rk AS (
  SELECT p_type, rev_micro,
    row_number() OVER (PARTITION BY p_type
                       ORDER BY rev_micro DESC, l_suppkey ASC) AS rn
  FROM rev
)
SELECT p_type,
  CAST(count(*) AS BIGINT) AS n_suppliers,
  CAST(sum(CAST(rev_micro AS HUGEINT)) AS DOUBLE) / 1000000
    AS total_revenue,
  CAST(sum(CAST(rev_micro AS HUGEINT)) FILTER (WHERE rn <= 4)
       * 1000000
       // sum(CAST(rev_micro AS HUGEINT)) AS BIGINT) AS cr4_ppm
FROM rk GROUP BY p_type
ORDER BY p_type
""",
)
def cr4_by_part_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-firm concentration per part type: (p_type, n_suppliers,
    total_revenue, cr4_ppm)."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .groupBy("p_type", "l_suppkey")
        .agg(
            (
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,6)")
                )
                * 1000000
            )
            .cast("bigint")
            .alias("rev_micro")
        )
    )
    w = Window.partitionBy("p_type").orderBy(
        F.col("rev_micro").desc(), F.col("l_suppkey").asc()
    )
    rk = rev.withColumn("rn", F.row_number().over(w))
    return (
        rk.groupBy("p_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            (
                F.sum(F.col("rev_micro").cast("decimal(38,0)")).cast(
                    "double"
                )
                / 1000000
            ).alias("total_revenue"),
            F.expr(
                "CAST(sum(CASE WHEN rn <= 4 THEN"
                " CAST(rev_micro AS DECIMAL(38,0)) ELSE"
                " CAST(0 AS DECIMAL(38,0)) END) * 1000000"
                " DIV sum(CAST(rev_micro AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("cr4_ppm"),
        )
        .orderBy("p_type")
    )


# ---------------------------------------------------------------------------
# rapid_repeat_orders — the payables/abuse audit pair former: orders
# from the SAME customer placed within 7 days of each other, with the
# exact cents difference carried so the downstream gate can tighten to
# "same amount" (double-billing) or "near amount" (split invoices).
# The join is blocked on custkey — per-customer order counts are
# bounded (TPC-H ~10-30), so the in-block pair fan is a constant, and
# the 7-day predicate prunes inside the block.
# ---------------------------------------------------------------------------


@register(
    "rapid_repeat_orders",
    oracle="""
WITH o AS (
  SELECT o_orderkey, o_custkey,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
    CAST(o_orderdate AS DATE) AS d
  FROM orders
)
SELECT a.o_orderkey AS order_a, b.o_orderkey AS order_b,
  a.o_custkey AS custkey,
  CAST(abs(date_diff('day', a.d, b.d)) AS BIGINT) AS gap_days,
  CAST(abs(a.cents - b.cents) AS BIGINT) AS cents_diff
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
WHERE abs(date_diff('day', a.d, b.d)) <= 7
ORDER BY order_a, order_b
""",
)
def rapid_repeat_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-customer orders within 7 days: (order_a, order_b, custkey,
    gap_days, cents_diff) — the double-billing / split-invoice
    candidate pair list."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    a = o.select(
        F.col("o_orderkey").alias("order_a"),
        F.col("o_custkey").alias("custkey"),
        F.col("cents").alias("cents_a"),
        F.col("d").alias("d_a"),
    )
    b = o.select(
        F.col("o_orderkey").alias("order_b"),
        F.col("o_custkey").alias("custkey_b"),
        F.col("cents").alias("cents_b"),
        F.col("d").alias("d_b"),
    )
    return (
        a.join(
            b,
            (a.custkey == b.custkey_b)
            & (F.col("order_a") < F.col("order_b")),
        )
        .filter(F.abs(F.datediff("d_b", "d_a")) <= 7)
        .select(
            "order_a",
            "order_b",
            "custkey",
            F.abs(F.datediff("d_b", "d_a")).cast("bigint").alias("gap_days"),
            F.abs(F.col("cents_a") - F.col("cents_b"))
            .cast("bigint")
            .alias("cents_diff"),
        )
        .orderBy("order_a", "order_b")
    )
