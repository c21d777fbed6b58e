"""Round-12 statistics additions.

* ``anderson_darling_binned`` — the two-sample Anderson–Darling
  statistic on binned order values (URGENT vs LOW priority), the
  quadratic-EDF companion to ``ks_binned_two_sample``: where KS reads
  only the single largest CDF gap, AD integrates the squared gap with
  weight 1/(H(1−H)) — tail-sensitive by construction (Pettitt 1976,
  the k-sample discretized form of Scholz–Stephens 1987).

  Exactness: with integer bin counts the discretized statistic is a
  sum of rationals — per bin,

      term = (cn·m − cm·n)² · (N+M) / (n·m·ch·(T−ch))

  (cn/cm cumulative counts, N/M bin counts, ch = cn+cm, T = n+m; the
  last bin, where H = 1, is excluded as in the textbook statistic).
  Each term is floored to micro units and summed — exact integer
  arithmetic in DECIMAL(38,0)/HUGEINT, identical in both engines.
  Binding bound (r12 ADVICE item 3): the per-bin NUMERATOR
  (cn·m − cm·n)²·(N+M)·1e6 must stay inside DECIMAL(38,0) — i.e.
  |cn·m − cm·n| ≲ √(1e32/(N+M)), which skewed bins exhaust long
  before the previously-documented n·m·(n+m) < 5e37. DuckDB's
  HUGEINT errors loudly on overflow; Spark's non-ANSI decimal would
  go silently NULL — so the Spark side carries an assert_true guard
  (the morisita_horn pattern) that turns the silent divergence into
  a loud failure at the exact same threshold.

  Binning is exact-cents integer division (floor(price·100) //
  1_200_000, clamped to 50 bins) — no float boundary anywhere.

Scale shape: one fact scan → 50-bin groupBy (map-side combined) →
cumulative windows over the FIXED 50-row bin grid → 1-row answer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register

_AD_BINS = 50
_AD_CENTS_PER_BIN = 1_200_000  # $12k per bin over the ~[0, $600k) range
_AD_A = "1-URGENT"
_AD_B = "5-LOW"


@register(
    "anderson_darling_binned",
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
  SELECT bin, na_bin, nb_bin,
    sum(na_bin) OVER (ORDER BY bin) AS cn,
    sum(nb_bin) OVER (ORDER BY bin) AS cm,
    sum(na_bin) OVER () AS n, sum(nb_bin) OVER () AS m
  FROM b
),
terms AS (
  SELECT n, m,
    CAST(sum(CAST((cn * m - cm * n) AS HUGEINT) * (cn * m - cm * n)
             * (na_bin + nb_bin) * 1000000
             // (CAST(n AS HUGEINT) * m * (cn + cm) * (n + m - cn - cm)))
      AS BIGINT) AS a2_micro,
    CAST(count(*) AS BIGINT) AS n_bins_used
  FROM c WHERE cn + cm < n + m
  GROUP BY n, m
)
SELECT CAST(n AS BIGINT) AS n_a, CAST(m AS BIGINT) AS n_b,
  n_bins_used, a2_micro
FROM terms
""",
)
def anderson_darling_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample binned Anderson–Darling: (n_a, n_b, n_bins_used,
    a2_micro) over URGENT-vs-LOW order values in 50 exact-cents bins."""
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
    wc = Window.orderBy("bin")  # FIXED 50-row bin grid
    wall = Window.partitionBy()
    c = b.select(
        "bin",
        "na_bin",
        "nb_bin",
        F.sum("na_bin").over(wc).alias("cn"),
        F.sum("nb_bin").over(wc).alias("cm"),
        F.sum("na_bin").over(wall).alias("n"),
        F.sum("nb_bin").over(wall).alias("m"),
    )
    return (
        c.filter(F.expr("cn + cm < n + m"))
        .groupBy("n", "m")
        .agg(
            F.sum(
                # assert_true folded into the summed expression so
                # column pruning cannot drop it: a per-bin numerator
                # that would exceed DECIMAL(38,0) fails LOUDLY here
                # (DuckDB's HUGEINT already errors loudly) instead of
                # Spark's silent non-ANSI NULL (r12 ADVICE item 3).
                # The test runs in DOUBLE, so near 2^53 the comparison
                # is approximate — sound ONLY because the trip point
                # (9.0e37) sits a full decade of double ulps below the
                # true DECIMAL(38,0) bound (~1e38): any double rounding
                # error is absorbed by that margin, trading an exact
                # threshold for an early-but-never-late trip (r13
                # ADVICE item 5). Keep the margin if retuning.
                F.expr(
                    "CASE WHEN assert_true("
                    "  pow(abs(CAST(cn AS DOUBLE) * m - CAST(cm AS DOUBLE) * n), 2)"
                    "    * (na_bin + nb_bin) * 1.0e6 <= 9.0e37,"
                    "  'anderson_darling_binned: DECIMAL(38,0) numerator"
                    " headroom exhausted — pre-scale the bin counts') IS NULL"
                    " THEN CAST((cn * m - cm * n) AS DECIMAL(38,0))"
                    " * (cn * m - cm * n) * (na_bin + nb_bin) * 1000000"
                    " DIV (CAST(n AS DECIMAL(38,0)) * m * (cn + cm)"
                    " * (n + m - cn - cm)) END"
                )
            )
            .cast("bigint")
            .alias("a2_micro"),
            F.count(F.lit(1)).cast("bigint").alias("n_bins_used"),
        )
        .select(
            F.col("n").cast("bigint").alias("n_a"),
            F.col("m").cast("bigint").alias("n_b"),
            "n_bins_used",
            "a2_micro",
        )
    )


# ---------------------------------------------------------------------------
# kpss_level_stat — the KPSS level-stationarity statistic (Kwiatkowski
# et al. 1992, lag-0 variant) on daily revenue: eta = sum_t S_t^2 /
# (n^2 * sigma^2) with S_t the cumulative demeaned partial sums. The
# complement to the unit-root view: Mann-Kendall/theil_sen ask "is
# there a trend", KPSS asks "is the LEVEL even stationary" — the gate
# before any forecasting op (ses/holt/seasonal_naive) is trusted.
#
# Exactness: with T = sum(x) and n days, n*S_t = n*C_t - t*T and
# n*(x_t - mean) = n*x_t - T are exact integers; eta reduces to
# sum(S'_t^2) / (n * sum(D_t^2)) with S' = n*S, D = n*(x-mean). Each
# is downscaled once (S'//1e6, D//1e3) before squaring so every
# Spark DIV result stays within BIGINT through ~sf100, and the
# truncation (relative ~1e-6) is identical in both engines.
#
# Scale shape: one daily rollup, cumulative windows over the
# calendar-bounded daily frame, 1-row output.
# ---------------------------------------------------------------------------


@register(
    "kpss_level_stat",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS tt
  FROM daily
),
seq AS (
  SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t,
    CAST(sum(cents) OVER (ORDER BY d) AS BIGINT) AS c, cents
  FROM daily
),
parts AS (
  SELECT max(m.n) AS n,
    CAST(sum(CAST((n * c - t * tt) // 1000000 AS HUGEINT)
             * ((n * c - t * tt) // 1000000)) AS HUGEINT) AS s2,
    CAST(sum(CAST((n * cents - tt) // 1000 AS HUGEINT)
             * ((n * cents - tt) // 1000)) AS HUGEINT) AS d2
  FROM seq, m
)
SELECT CAST(n AS BIGINT) AS n_days,
  CAST(s2 * 1000000000 // (n * d2 + 1) AS BIGINT) AS kpss_milli
FROM parts
""",
)
def kpss_level_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity statistic on daily revenue:
    (n_days, kpss_milli) — eta in milli units (large => reject level
    stationarity)."""
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
        F.sum("cents").cast("bigint").alias("tt"),
    )
    wseq = Window.orderBy("d")  # calendar-bounded daily frame
    seq = daily.select(
        F.row_number().over(wseq).cast("bigint").alias("t"),
        F.sum("cents").over(wseq).cast("bigint").alias("c"),
        "cents",
    )
    parts = (
        seq.crossJoin(F.broadcast(m))
        .agg(
            F.max("n").alias("n"),
            F.sum(
                F.expr(
                    "CAST((CAST(n AS DECIMAL(38,0)) * c - t * tt)"
                    " DIV 1000000 AS DECIMAL(38,0))"
                    " * ((CAST(n AS DECIMAL(38,0)) * c - t * tt)"
                    " DIV 1000000)"
                )
            ).alias("s2"),
            F.sum(
                F.expr(
                    "CAST((CAST(n AS DECIMAL(38,0)) * cents - tt)"
                    " DIV 1000 AS DECIMAL(38,0))"
                    " * ((CAST(n AS DECIMAL(38,0)) * cents - tt)"
                    " DIV 1000)"
                )
            ).alias("d2"),
        )
    )
    return parts.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.expr(
            "CAST(s2 * 1000000000 DIV (n * d2 + 1) AS BIGINT)"
        ).alias("kpss_milli"),
    )
