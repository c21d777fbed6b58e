"""Ecology estimators over the abundance fact (bpaotu's domain).

Classic community-ecology statistics the reference's diversity pages
feed from the same OTU table (reference: bpaotu/otu/query.py's
abundance endpoints; the alpha-diversity family in SURVEY §2):

* ``chao1_richness`` — bias-corrected Chao1 richness estimate plus
  Good's coverage, the "how much of the community did sequencing
  actually see" pair.
* ``pielou_evenness`` — Shannon H normalized by ln(richness), the
  generalist/specialist balance of a sample.
* ``rank_abundance_curve`` — Whittaker rank-abundance profiles, the
  shape diagnostic behind every diversity index.

Determinism discipline (shared with functions/textops.py): every
natural log is floored into integer micro-nats BEFORE any sum or
division, and every ratio is integer parts-per-million / per-mille —
both engines then aggregate integers, so summation order can never
flip the driver's value hash.

Scale shape: everything below is two keyed aggregations over the
(sample, otu) partial-sum table — map-side combine applies, no
unpartitioned window, no driver collect. Per-sample OTU counts are
bounded by the part vocabulary, not the fact-table row count, so the
second aggregation's input shrinks by orders of magnitude at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bpaotu_spark.operators.bpaotu import ABUNDANCE_CTE, abundance, abundance_selected
from bpaotu_spark.registry import register


def _per_otu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(sample_id, otu_id, c): integer per-sample OTU totals."""
    return (
        abundance(spark, sf_dir)
        .groupBy("sample_id", "otu_id")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )


_PER_OTU_CTE = f"""
{ABUNDANCE_CTE},
per_otu AS (
  SELECT sample_id, otu_id, CAST(sum(cnt) AS BIGINT) AS c
  FROM abundance GROUP BY sample_id, otu_id
)
""".strip()


# ---------------------------------------------------------------------------
# chao1_richness — Chao1 = S + f1(f1-1) / (2(f2+1)) (bias-corrected
# form, defined even when doubletons are absent) and Good's coverage
# C = 1 - f1/N. f1/f2 are the singleton/doubleton OTU counts per
# sample. Emitted as chao1_milli (×1000, integer-floored) and
# coverage_ppm so the estimate is engine-exact.
# ---------------------------------------------------------------------------


@register(
    "chao1_richness",
    oracle=f"""
WITH {_PER_OTU_CTE},
st AS (
  SELECT sample_id,
    CAST(count(*) AS BIGINT) AS richness,
    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
    CAST(sum(c) AS BIGINT) AS n_total
  FROM per_otu GROUP BY sample_id
)
SELECT sample_id, richness, f1, f2, n_total,
  richness * 1000 + (f1 * (f1 - 1) * 1000) // (2 * (f2 + 1))
    AS chao1_milli,
  1000000 - (f1 * 1000000) // n_total AS coverage_ppm
FROM st
""",
)
def chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = _per_otu(spark, sf_dir).groupBy("sample_id").agg(
        F.count(F.lit(1)).alias("richness"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("f2"),
        F.sum("c").alias("n_total"),
    )
    return st.select(
        "sample_id",
        "richness",
        "f1",
        "f2",
        "n_total",
        F.expr(
            "richness * 1000 + (f1 * (f1 - 1) * 1000) div (2 * (f2 + 1))"
        ).alias("chao1_milli"),
        F.expr("1000000 - (f1 * 1000000) div n_total").alias("coverage_ppm"),
    )


# ---------------------------------------------------------------------------
# pielou_evenness — J = H / ln(S) in integer ppm. H follows
# alpha_diversity's algebraic form H = ln(T) - Σ c·ln(c) / T, but with
# the micro-nat flooring applied to each ln() term so the quotient is
# integer division of integers (alpha_diversity itself reports rounded
# doubles; this op is the hash-exact fixed-point sibling). Samples with
# a single OTU (ln S = 0) are excluded — J is undefined there, and
# both engines drop them identically.
# ---------------------------------------------------------------------------


@register(
    "pielou_evenness",
    oracle=f"""
WITH {_PER_OTU_CTE},
st AS (
  SELECT sample_id,
    CAST(count(*) AS BIGINT) AS richness,
    CAST(sum(c) AS BIGINT) AS n_total,
    CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
      AS BIGINT) AS sum_clnc_micro
  FROM per_otu GROUP BY sample_id
)
SELECT sample_id, richness, n_total,
  CAST(floor(ln(CAST(n_total AS DOUBLE)) * 1000000) AS BIGINT)
    - sum_clnc_micro // n_total AS shannon_micronats,
  (CAST(floor(ln(CAST(n_total AS DOUBLE)) * 1000000) AS BIGINT)
    - sum_clnc_micro // n_total) * 1000000
    // CAST(floor(ln(CAST(richness AS DOUBLE)) * 1000000) AS BIGINT)
    AS evenness_ppm
FROM st WHERE richness >= 2
""",
)
def pielou_evenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = (
        _per_otu(spark, sf_dir)
        .groupBy("sample_id")
        .agg(
            F.count(F.lit(1)).alias("richness"),
            F.sum("c").alias("n_total"),
            F.sum(
                F.col("c")
                * F.floor(F.log(F.col("c").cast("double")) * 1000000).cast(
                    "bigint"
                )
            ).alias("sum_clnc_micro"),
        )
        .filter(F.col("richness") >= 2)
    )
    h = (
        F.floor(F.log(F.col("n_total").cast("double")) * 1000000).cast(
            "bigint"
        )
        - F.expr("sum_clnc_micro div n_total")
    ).alias("shannon_micronats")
    return st.select("sample_id", "richness", "n_total", h).select(
        "sample_id",
        "richness",
        "n_total",
        "shannon_micronats",
        F.expr(
            "shannon_micronats * 1000000 div "
            "CAST(floor(ln(CAST(richness AS DOUBLE)) * 1000000) AS BIGINT)"
        ).alias("evenness_ppm"),
    )


# ---------------------------------------------------------------------------
# rank_abundance_curve — Whittaker plot input: per sample, OTUs ranked
# by abundance (count desc, otu_id asc for a total deterministic
# order), top 20 ranks kept, relative abundance in integer ppm. The
# window partitions by sample_id, so no data ever converges on one
# task; output is |samples| × ≤20 rows regardless of fact size.
# ---------------------------------------------------------------------------


@register(
    "rank_abundance_curve",
    oracle=f"""
WITH {_PER_OTU_CTE},
tot AS (
  SELECT sample_id, CAST(sum(c) AS BIGINT) AS n_total
  FROM per_otu GROUP BY sample_id
),
rk AS (
  SELECT sample_id, otu_id, c,
    row_number() OVER (PARTITION BY sample_id ORDER BY c DESC, otu_id)
      AS rank
  FROM per_otu
)
SELECT rk.sample_id, rank, otu_id, c AS abundance,
  (c * 1000000) // n_total AS rel_abund_ppm
FROM rk JOIN tot ON rk.sample_id = tot.sample_id
WHERE rank <= 20
""",
)
def rank_abundance_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    per = _per_otu(spark, sf_dir)
    tot = per.groupBy("sample_id").agg(F.sum("c").alias("n_total"))
    w = Window.partitionBy("sample_id").orderBy(
        F.col("c").desc(), F.col("otu_id")
    )
    # row_number() is int32 in Spark but BIGINT in DuckDB — cast up
    rk = per.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rank") <= 20)
    return rk.join(tot, "sample_id").select(
        "sample_id",
        "rank",
        "otu_id",
        F.col("c").alias("abundance"),
        F.expr("(c * 1000000) div n_total").alias("rel_abund_ppm"),
    )


# ---------------------------------------------------------------------------
# anosim_groups — ANOSIM (Clarke 1993): are two sample groups more
# dissimilar between than within?  R = (r̄_between − r̄_within) / (M/2)
# over the ranks of ALL pairwise Bray-Curtis distances (average ranks
# for ties — the classical definition). R ≈ 0 → no separation; R → 1 →
# groups fully separated. This is the comparison-page significance
# companion to beta_diversity_braycurtis / ordination_pcoa_2d.
#
# ANOSIM is inherently O(n²) in the SAMPLE count, so the sample
# selection must be bounded (here: two mktsegments × 5 nations — the
# study-design situation the statistic exists for). Distances are
# integer ppm, so ranks are engine-exact; tie groups use average ranks
# computed from the DISTINCT-distance cumulative table — the only
# unpartitioned window runs over ≤1e6 distinct ppm values, never over
# the pair table itself.
# ---------------------------------------------------------------------------

_ANOSIM_SEL = (
    "c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_nationkey < 5"
)


@register(
    "anosim_groups",
    oracle=f"""
WITH {ABUNDANCE_CTE},
sel AS (
  SELECT c_custkey AS sample_id, c_mktsegment AS grp
  FROM customer WHERE {_ANOSIM_SEL}
),
a AS (
  SELECT ab.sample_id, grp, otu_id, CAST(sum(cnt) AS BIGINT) AS c
  FROM abundance ab JOIN sel ON ab.sample_id = sel.sample_id
  GROUP BY ab.sample_id, grp, otu_id
),
tot AS (
  SELECT sample_id, grp, CAST(sum(c) AS BIGINT) AS tot
  FROM a GROUP BY sample_id, grp
),
shared AS (
  SELECT x.sample_id AS sample_a, y.sample_id AS sample_b,
         CAST(sum(least(x.c, y.c)) AS BIGINT) AS sum_min
  FROM a x JOIN a y ON x.otu_id = y.otu_id AND x.sample_id < y.sample_id
  GROUP BY x.sample_id, y.sample_id
),
pairs AS (
  SELECT ta.sample_id AS sample_a, tb.sample_id AS sample_b,
    1000000 - (2000000 * coalesce(s.sum_min, 0)) // (ta.tot + tb.tot)
      AS d_ppm,
    CASE WHEN ta.grp = tb.grp THEN 1 ELSE 0 END AS is_within
  FROM tot ta JOIN tot tb ON ta.sample_id < tb.sample_id
  LEFT JOIN shared s
    ON s.sample_a = ta.sample_id AND s.sample_b = tb.sample_id
),
dcnt AS (
  SELECT d_ppm, CAST(count(*) AS BIGINT) AS cnt
  FROM pairs GROUP BY d_ppm
),
dcum AS (
  SELECT d_ppm,
    CAST(coalesce(sum(cnt) OVER (ORDER BY d_ppm
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cum_before,
    cnt
  FROM dcnt
),
ranked AS (
  SELECT is_within, cum_before * 1000 + (cnt + 1) * 500 AS avg_rank_milli
  FROM pairs JOIN dcum USING (d_ppm)
),
st AS (
  SELECT
    CAST(count(*) AS BIGINT) AS n_pairs,
    CAST(sum(is_within) AS BIGINT) AS n_within,
    CAST(count(*) - sum(is_within) AS BIGINT) AS n_between,
    CAST(sum(CASE WHEN is_within = 1 THEN avg_rank_milli ELSE 0 END)
      AS BIGINT) AS sum_rank_w,
    CAST(sum(CASE WHEN is_within = 0 THEN avg_rank_milli ELSE 0 END)
      AS BIGINT) AS sum_rank_b
  FROM ranked
)
SELECT n_pairs, n_within, n_between,
  (sum_rank_w * 1000) // n_within AS mean_rank_within_micro,
  (sum_rank_b * 1000) // n_between AS mean_rank_between_micro,
  (((sum_rank_b * 1000) // n_between - (sum_rank_w * 1000) // n_within)
    * 2) // n_pairs AS anosim_r_ppm
FROM st
""",
)
def anosim_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # store-served pair matrix (r12 VERDICT item 1): the statistic is
    # a rank census + one aggregate over the stored pairs
    from bpaotu_spark.operators.diststore import anosim_pairs_cached

    pairs = anosim_pairs_cached(spark, sf_dir).select(
        "d_ppm",
        F.when(F.col("grp_a") == F.col("grp_b"), 1)
        .otherwise(0)
        .alias("is_within"),
    )
    dcnt = pairs.groupBy("d_ppm").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    # unpartitioned window bound: runs over the DISTINCT d_ppm table
    # (<= 1e6+1 rows by the ppm codomain), never the pair table
    wv = (
        Window.orderBy("d_ppm")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dcum = dcnt.select(
        "d_ppm",
        F.coalesce(F.sum("cnt").over(wv), F.lit(0))
        .cast("bigint")
        .alias("cum_before"),
        "cnt",
    )
    ranked = pairs.join(dcum, "d_ppm").select(
        "is_within",
        F.expr("cum_before * 1000 + (cnt + 1) * 500").alias(
            "avg_rank_milli"
        ),
    )
    st = ranked.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("is_within").alias("n_within"),
        (F.count(F.lit(1)) - F.sum("is_within")).alias("n_between"),
        F.sum(
            F.when(F.col("is_within") == 1, F.col("avg_rank_milli")).otherwise(0)
        ).alias("sum_rank_w"),
        F.sum(
            F.when(F.col("is_within") == 0, F.col("avg_rank_milli")).otherwise(0)
        ).alias("sum_rank_b"),
    )
    return st.select(
        "n_pairs",
        "n_within",
        "n_between",
        F.expr("(sum_rank_w * 1000) div n_within").alias(
            "mean_rank_within_micro"
        ),
        F.expr("(sum_rank_b * 1000) div n_between").alias(
            "mean_rank_between_micro"
        ),
        F.expr(
            "(((sum_rank_b * 1000) div n_between"
            " - (sum_rank_w * 1000) div n_within) * 2) div n_pairs"
        ).alias("anosim_r_ppm"),
    )


# ---------------------------------------------------------------------------
# hill_numbers_suite — the modern unified diversity framework (Hill
# 1973; Jost 2006): effective number of species at orders q = 0, 1, 2.
#   q=0: richness;  q=1: exp(Shannon);  q=2: inverse Simpson
#     = T² / Σc².
# q=2 is an exact rational (milli-scaled integer division, 128-bit
# numerator); q=1 reuses the micro-nat-floored Shannon and applies
# exp() once per sample on the identical integer/1e6 double — the same
# determinism class as every ln() in this package. Reference:
# the alpha-diversity family in bpaotu's comparison pages
# (bpaotu/otu/query.py analytics endpoints).
# ---------------------------------------------------------------------------


@register(
    "hill_numbers_suite",
    oracle=f"""
WITH {_PER_OTU_CTE},
st AS (
  SELECT sample_id,
    CAST(count(*) AS BIGINT) AS richness,
    CAST(sum(c) AS BIGINT) AS n_total,
    CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
      AS BIGINT) AS sum_clnc_micro,
    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sum_c2
  FROM per_otu GROUP BY sample_id
)
SELECT sample_id, richness AS hill_q0,
  CAST(floor(exp((CAST(floor(ln(CAST(n_total AS DOUBLE)) * 1000000)
    AS BIGINT) - sum_clnc_micro // n_total) / 1000000.0) * 1000)
    AS BIGINT) AS hill_q1_milli,
  CAST(CAST(n_total AS HUGEINT) * n_total * 1000 // sum_c2 AS BIGINT)
    AS hill_q2_milli
FROM st
""",
)
def hill_numbers_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = _per_otu(spark, sf_dir).groupBy("sample_id").agg(
        F.count(F.lit(1)).alias("richness"),
        F.sum("c").alias("n_total"),
        F.sum(
            F.col("c")
            * F.floor(F.log(F.col("c").cast("double")) * 1000000).cast(
                "bigint"
            )
        ).alias("sum_clnc_micro"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("sum_c2"),
    )
    return st.select(
        "sample_id",
        F.col("richness").alias("hill_q0"),
        F.expr(
            "CAST(floor(exp((CAST(floor(ln(CAST(n_total AS DOUBLE))"
            " * 1000000) AS BIGINT) - sum_clnc_micro div n_total)"
            " / 1000000.0) * 1000) AS BIGINT)"
        ).alias("hill_q1_milli"),
        F.expr(
            "CAST(CAST(n_total AS DECIMAL(38,0)) * n_total * 1000"
            " DIV sum_c2 AS BIGINT)"
        ).alias("hill_q2_milli"),
    )


# ---------------------------------------------------------------------------
# ace_richness — Chao & Lee's ACE (abundance-based coverage estimator),
# the standard companion to Chao1 on every diversity page (reference:
# the alpha-diversity family; public muccg/bpaotu query.py abundance
# endpoints). Rare OTUs are c <= 10 (the canonical cutoff):
#
#   C_ace  = 1 - F1 / N_rare
#   gamma2 = max( S_rare * sum_{i<=10} i(i-1)F_i
#                 / (C_ace * N_rare * (N_rare - 1)) - 1, 0 )
#   ACE    = S_abund + S_rare / C_ace + F1 / C_ace * gamma2
#
# Determinism: all five aggregates are exact BIGINTs; the ACE value is
# ONE per-sample scalar double expression evaluated in the identical
# parenthesization on both engines (per-row double math is IEEE-
# identical; only unordered float SUMS are forbidden), floored to
# milli. Samples where ACE is undefined (N_rare <= F1, i.e. every rare
# OTU is a singleton, or N_rare < 2) are excluded by both engines.
#
# Scale shape: same two keyed aggregations as chao1_richness — map-side
# combine over (sample, otu), then per-sample rollup; no window, no
# driver collect, no cross-sample traffic.
# ---------------------------------------------------------------------------


@register(
    "ace_richness",
    oracle=f"""
WITH {_PER_OTU_CTE},
st AS (
  SELECT sample_id,
    CAST(sum(CASE WHEN c > 10 THEN 1 ELSE 0 END) AS BIGINT) AS s_abund,
    CAST(sum(CASE WHEN c <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS s_rare,
    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
    CAST(sum(CASE WHEN c <= 10 THEN c ELSE 0 END) AS BIGINT) AS n_rare,
    CAST(sum(CASE WHEN c <= 10 THEN c * (c - 1) ELSE 0 END) AS BIGINT)
      AS sum_ii
  FROM per_otu GROUP BY sample_id
),
cv AS (
  SELECT sample_id, s_abund, s_rare, f1, n_rare,
    1.0 - CAST(f1 AS DOUBLE) / CAST(n_rare AS DOUBLE) AS c_ace,
    CAST(s_rare AS DOUBLE) * CAST(sum_ii AS DOUBLE) AS g_num,
    CAST(n_rare AS DOUBLE) * CAST(n_rare - 1 AS DOUBLE) AS g_den
  FROM st
  WHERE n_rare > f1 AND n_rare > 1
)
SELECT sample_id, s_abund, s_rare, f1, n_rare,
  CAST(floor(
    (CAST(s_abund AS DOUBLE)
     + CAST(s_rare AS DOUBLE) / c_ace
     + CAST(f1 AS DOUBLE) / c_ace
       * greatest(g_num / (c_ace * g_den) - 1.0, 0.0)
    ) * 1000) AS BIGINT) AS ace_milli
FROM cv
""",
)
def ace_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = _per_otu(spark, sf_dir).groupBy("sample_id").agg(
        F.sum(F.when(F.col("c") > 10, 1).otherwise(0)).alias("s_abund"),
        F.sum(F.when(F.col("c") <= 10, 1).otherwise(0)).alias("s_rare"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("c") <= 10, F.col("c")).otherwise(0)).alias(
            "n_rare"
        ),
        F.sum(
            F.when(F.col("c") <= 10, F.col("c") * (F.col("c") - 1)).otherwise(
                0
            )
        ).alias("sum_ii"),
    )
    cv = st.filter(
        (F.col("n_rare") > F.col("f1")) & (F.col("n_rare") > 1)
    ).select(
        "sample_id",
        F.col("s_abund").cast("bigint").alias("s_abund"),
        F.col("s_rare").cast("bigint").alias("s_rare"),
        F.col("f1").cast("bigint").alias("f1"),
        F.col("n_rare").cast("bigint").alias("n_rare"),
        F.expr(
            "1.0D - CAST(f1 AS DOUBLE) / CAST(n_rare AS DOUBLE)"
        ).alias("c_ace"),
        F.expr("CAST(s_rare AS DOUBLE) * CAST(sum_ii AS DOUBLE)").alias(
            "g_num"
        ),
        F.expr(
            "CAST(n_rare AS DOUBLE) * CAST(n_rare - 1 AS DOUBLE)"
        ).alias("g_den"),
    )
    return cv.select(
        "sample_id",
        "s_abund",
        "s_rare",
        "f1",
        "n_rare",
        F.expr(
            "CAST(floor((CAST(s_abund AS DOUBLE)"
            " + CAST(s_rare AS DOUBLE) / c_ace"
            " + CAST(f1 AS DOUBLE) / c_ace"
            "   * greatest(g_num / (c_ace * g_den) - 1.0D, 0.0D)"
            ") * 1000) AS BIGINT)"
        ).alias("ace_milli"),
    )
