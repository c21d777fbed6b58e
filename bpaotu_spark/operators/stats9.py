"""Round-13 statistics additions.

* ``cliffs_delta_priority`` — Cliff's delta effect size between
  URGENT and LOW order values on the anderson_darling_binned 50-bin
  exact-cents grid: δ = (#(a>b) − #(a<b)) / (n·m), with same-bin
  pairs counted as ties (the binned estimator — documented
  deviation; the bin grid makes the pair counts one cumulative
  window over 50 rows instead of an n×m join). Sign-safe ppm
  division (|num| divided, sign reapplied) because DuckDB ``//``
  floors while Spark ``div`` truncates. Magnitude band per the
  conventional thresholds (0.147 / 0.33 / 0.474).

  Scale shape: one fact scan → 50-bin groupBy (map-side combined) →
  cumulative windows over the fixed 50-row grid → 1-row answer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.operators.stats8 import (
    _AD_A,
    _AD_B,
    _AD_BINS,
    _AD_CENTS_PER_BIN,
)
from bpaotu_spark.registry import register


_CLIFF_BANDS = (
    (147000, "negligible"),
    (330000, "small"),
    (474000, "medium"),
)


def _cliff_band_sql(col: str) -> str:
    whens = " ".join(
        f"WHEN abs({col}) < {thr} THEN '{lbl}'" for thr, lbl in _CLIFF_BANDS
    )
    return f"(CASE {whens} ELSE 'large' END)"


@register(
    "cliffs_delta_priority",
    oracle=f"""
WITH b AS (
  SELECT least(CAST(floor(o_totalprice * 100) AS BIGINT)
               // {_AD_CENTS_PER_BIN}, {_AD_BINS - 1}) AS bin,
    CAST(count(*) FILTER (WHERE o_orderpriority = '{_AD_A}') AS BIGINT)
      AS na_bin,
    CAST(count(*) FILTER (WHERE o_orderpriority = '{_AD_B}') AS BIGINT)
      AS nb_bin
  FROM orders WHERE o_orderpriority IN ('{_AD_A}', '{_AD_B}')
  GROUP BY 1
),
c AS (
  SELECT na_bin, nb_bin,
    CAST(coalesce(sum(nb_bin) OVER (ORDER BY bin
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cb_below,
    sum(na_bin) OVER () AS n, sum(nb_bin) OVER () AS m
  FROM b
),
agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n_a, CAST(max(m) AS BIGINT) AS n_b,
    CAST(sum(CAST(na_bin AS HUGEINT) * cb_below) AS BIGINT) AS n_gt,
    CAST(sum(CAST(na_bin AS HUGEINT) * (m - cb_below - nb_bin))
      AS BIGINT) AS n_lt,
    CAST(sum(CAST(na_bin AS HUGEINT) * nb_bin) AS BIGINT) AS n_tie
  FROM c
),
d AS (
  SELECT n_a, n_b, n_gt, n_lt, n_tie,
    CAST(CASE WHEN n_gt >= n_lt THEN 1 ELSE -1 END
      * (CAST(abs(n_gt - n_lt) AS HUGEINT) * 1000000
         // (CAST(n_a AS HUGEINT) * n_b)) AS BIGINT) AS delta_ppm
  FROM agg
)
SELECT n_a, n_b, n_gt, n_lt, n_tie, delta_ppm,
  {_cliff_band_sql("delta_ppm")} AS magnitude
FROM d
""",
)
def cliffs_delta_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned Cliff's delta between URGENT and LOW order values: one
    row (n_a, n_b, n_gt, n_lt, n_tie, delta_ppm, magnitude) on the
    50-bin exact-cents grid — same-bin pairs are ties by construction
    (documented deviation from the raw-value estimator)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(_AD_A, _AD_B)
    )
    b = (
        o.select(
            F.least(
                F.expr(
                    f"CAST(floor(o_totalprice * 100) AS BIGINT)"
                    f" DIV {_AD_CENTS_PER_BIN}"
                ),
                F.lit(_AD_BINS - 1).cast("bigint"),
            ).alias("bin"),
            "o_orderpriority",
        )
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("o_orderpriority") == _AD_A, 1))
            .cast("bigint")
            .alias("na_bin"),
            F.count(F.when(F.col("o_orderpriority") == _AD_B, 1))
            .cast("bigint")
            .alias("nb_bin"),
        )
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy()
    c = b.select(
        "na_bin",
        "nb_bin",
        F.coalesce(F.sum("nb_bin").over(wc), F.lit(0))
        .cast("bigint")
        .alias("cb_below"),
        F.sum("na_bin").over(wall).alias("n"),
        F.sum("nb_bin").over(wall).alias("m"),
    )
    agg = c.agg(
        F.max("n").cast("bigint").alias("n_a"),
        F.max("m").cast("bigint").alias("n_b"),
        F.sum(F.expr("CAST(na_bin AS DECIMAL(38,0)) * cb_below"))
        .cast("bigint")
        .alias("n_gt"),
        F.sum(
            F.expr("CAST(na_bin AS DECIMAL(38,0)) * (m - cb_below - nb_bin)")
        )
        .cast("bigint")
        .alias("n_lt"),
        F.sum(F.expr("CAST(na_bin AS DECIMAL(38,0)) * nb_bin"))
        .cast("bigint")
        .alias("n_tie"),
    )
    d = agg.select(
        "n_a",
        "n_b",
        "n_gt",
        "n_lt",
        "n_tie",
        F.expr(
            "CAST(CASE WHEN n_gt >= n_lt THEN 1 ELSE -1 END"
            " * (CAST(abs(n_gt - n_lt) AS DECIMAL(38,0)) * 1000000"
            "    DIV (CAST(n_a AS DECIMAL(38,0)) * n_b)) AS BIGINT)"
        ).alias("delta_ppm"),
    )
    return d.select(
        "n_a",
        "n_b",
        "n_gt",
        "n_lt",
        "n_tie",
        "delta_ppm",
        F.expr(_cliff_band_sql("delta_ppm")).alias("magnitude"),
    )
