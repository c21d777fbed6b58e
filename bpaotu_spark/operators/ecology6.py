"""Round-12 ecology additions.

* ``beta_diversity_canberra`` — the Canberra dissimilarity
  Σ_i |x_i − y_i| / (x_i + y_i) over the OTU union of each sample
  pair (Lance & Williams 1967), the heavy-rare-taxa member of the
  comparison-page distance family (each OTU contributes equally
  regardless of abundance, so rare-taxon turnover dominates — the
  complement to Bray-Curtis's abundance pooling). A one-sided OTU
  contributes exactly 1, so the pair sum decomposes into the
  shared-OTU term sum plus 1e6 × (union − shared) in ppm — only the
  SHARED frame is joined, the one-sided mass rides on per-sample
  nonzero censuses.

Reference parity: the comparison page's distance-matrix choices
(public ``bpaotu/otu/views.py`` comparison endpoints expose multiple
beta metrics over the same abundance matrix).

Determinism: per-OTU term = |x−y|·1e6 // (x+y) on nonnegative
integer counts — truncating div agrees across engines; the sum is an
exact BIGINT.

Scale shape: the kulczynski idiom — nation-blocked bounded pair
former over per-sample aggregates, never all-pairs; one keyed shared
join + per-sample censuses.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bpaotu_spark.catalog import load_table
from bpaotu_spark.operators.bpaotu import ABUNDANCE_CTE, abundance_selected
from bpaotu_spark.registry import register

_CAN_SEL = "c_mktsegment = 'AUTOMOBILE'"


@register(
    "beta_diversity_canberra",
    oracle=f"""
WITH {ABUNDANCE_CTE},
sel AS (
  SELECT c_custkey AS sample_id, c_nationkey AS block
  FROM customer WHERE {_CAN_SEL}
),
a AS (
  SELECT ab.sample_id, block, otu_id, CAST(sum(cnt) AS BIGINT) AS c
  FROM abundance ab JOIN sel ON ab.sample_id = sel.sample_id
  GROUP BY ab.sample_id, block, otu_id
),
nnz AS (
  SELECT sample_id, block, CAST(count(*) AS BIGINT) AS nz
  FROM a GROUP BY sample_id, block
),
shared AS (
  SELECT x.sample_id AS sample_a, y.sample_id AS sample_b,
    CAST(count(*) AS BIGINT) AS n_shared,
    CAST(sum(abs(x.c - y.c) * 1000000 // (x.c + y.c)) AS BIGINT)
      AS shared_term_ppm
  FROM a x JOIN a y
    ON x.otu_id = y.otu_id AND x.block = y.block
   AND x.sample_id < y.sample_id
  GROUP BY x.sample_id, y.sample_id
)
SELECT na.sample_id AS sample_a, nb.sample_id AS sample_b,
  na.nz + nb.nz - coalesce(s.n_shared, 0) AS n_union,
  coalesce(s.shared_term_ppm, 0)
    + 1000000 * (na.nz + nb.nz - 2 * coalesce(s.n_shared, 0))
    AS canberra_sum_ppm,
  (coalesce(s.shared_term_ppm, 0)
    + 1000000 * (na.nz + nb.nz - 2 * coalesce(s.n_shared, 0)))
    // (na.nz + nb.nz - coalesce(s.n_shared, 0)) AS canberra_norm_ppm
FROM nnz na
JOIN nnz nb ON na.block = nb.block AND na.sample_id < nb.sample_id
LEFT JOIN shared s
  ON s.sample_a = na.sample_id AND s.sample_b = nb.sample_id
""",
)
def beta_diversity_canberra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Canberra dissimilarity, nation-blocked:
    (sample_a, sample_b, n_union, canberra_sum_ppm,
    canberra_norm_ppm) — norm is the sum divided by the union size,
    0..1e6."""
    cust = load_table(spark, sf_dir, "customer")
    sel = cust.filter(F.expr(_CAN_SEL)).select(
        F.col("c_custkey").alias("sample_id"),
        F.col("c_nationkey").alias("block"),
    )
    a = (
        abundance_selected(spark, sf_dir, sel)
        .groupBy("sample_id", "block", "otu_id")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )
    nnz = a.groupBy("sample_id", "block").agg(
        F.count(F.lit(1)).cast("bigint").alias("nz")
    )
    ax = a.select(
        "block",
        "otu_id",
        F.col("sample_id").alias("sample_a"),
        F.col("c").alias("ca"),
    )
    ay = a.select(
        F.col("block").alias("block_y"),
        F.col("otu_id").alias("otu_y"),
        F.col("sample_id").alias("sample_b"),
        F.col("c").alias("cb"),
    )
    shared = (
        ax.join(
            ay,
            (ax.otu_id == ay.otu_y)
            & (ax.block == ay.block_y)
            & (ax.sample_a < ay.sample_b),
        )
        .groupBy("sample_a", "sample_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared"),
            F.sum(F.expr("abs(ca - cb) * 1000000 div (ca + cb)"))
            .cast("bigint")
            .alias("shared_term_ppm"),
        )
    )
    na = nnz.select(
        F.col("sample_id").alias("sample_a"),
        F.col("block"),
        F.col("nz").alias("nz_a"),
    )
    nb = nnz.select(
        F.col("sample_id").alias("sample_b"),
        F.col("block").alias("block_b"),
        F.col("nz").alias("nz_b"),
    )
    return (
        na.join(
            nb,
            (na.block == nb.block_b) & (na.sample_a < nb.sample_b),
        )
        .join(shared, ["sample_a", "sample_b"], "left")
        .select(
            "sample_a",
            "sample_b",
            F.expr(
                "nz_a + nz_b - coalesce(n_shared, CAST(0 AS BIGINT))"
            ).alias("n_union"),
            F.expr(
                "coalesce(shared_term_ppm, CAST(0 AS BIGINT))"
                " + 1000000 * (nz_a + nz_b"
                " - 2 * coalesce(n_shared, CAST(0 AS BIGINT)))"
            ).alias("canberra_sum_ppm"),
            F.expr(
                "(coalesce(shared_term_ppm, CAST(0 AS BIGINT))"
                " + 1000000 * (nz_a + nz_b"
                " - 2 * coalesce(n_shared, CAST(0 AS BIGINT))))"
                " div (nz_a + nz_b - coalesce(n_shared, CAST(0 AS BIGINT)))"
            ).alias("canberra_norm_ppm"),
        )
    )
