"""Two-sample tests, association measures, extreme-value fits.

* ``ks_binned_two_sample`` — Kolmogorov-Smirnov D between the order-
  value distributions of two customer segments, computed on a fixed
  1000-bin equal-width grid (the streaming-friendly KS: exact CDFs
  need a global sort over all distinct values — unbounded at 100 TB —
  while the binned variant needs one 1000-group aggregation and a
  window over the BIN axis; resolution is the documented 1/1000 of
  the value range). D in exact ppm of the per-segment counts.
* ``cramers_v_association`` — Cramér's V between mktsegment and
  nation over the bounded 5×25 contingency table: χ² from exact
  integer observed counts and rational expected counts (one floored
  division per cell), V floored to milli.
* ``gumbel_moments_fit`` — method-of-moments Gumbel fit to the daily
  revenue MAXIMA series (extreme-value capacity planning): β̂ =
  s·√6/π, μ̂ = x̄ − γ·β̂ over exact integer-cents moments; the two
  irrational constants enter once, as compile-time literals.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table, maybe_broadcast
from bpaotu_spark.registry import register

# ---------------------------------------------------------------------------
# ks_binned_two_sample
# ---------------------------------------------------------------------------

_KS_BINS = 1000
_SEG_A, _SEG_B = "BUILDING", "MACHINERY"


@register(
    "ks_binned_two_sample",
    oracle=f"""
WITH j AS (
  SELECT c_mktsegment AS seg,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
),
mx AS (
  SELECT CAST(min(cents) AS BIGINT) AS lo, CAST(max(cents) AS BIGINT) AS hi
  FROM j
),
binned AS (
  SELECT seg,
    least({_KS_BINS - 1}, ((cents - lo) * {_KS_BINS}) // (hi - lo + 1))
      AS bin
  FROM j, mx
),
c AS (
  SELECT bin,
    CAST(sum(CASE WHEN seg = '{_SEG_A}' THEN 1 ELSE 0 END) AS BIGINT) AS na,
    CAST(sum(CASE WHEN seg = '{_SEG_B}' THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM binned GROUP BY bin
),
tot AS (
  SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb FROM c
),
cdf AS (
  SELECT bin,
    CAST(sum(na) OVER (ORDER BY bin) AS BIGINT) * 1000000 // ta AS fa_ppm,
    CAST(sum(nb) OVER (ORDER BY bin) AS BIGINT) * 1000000 // tb AS fb_ppm
  FROM c, tot
)
SELECT CAST(max(abs(fa_ppm - fb_ppm)) AS BIGINT) AS ks_d_ppm,
  CAST(count(*) AS BIGINT) AS n_bins_occupied,
  CAST(max(ta) AS BIGINT) AS n_a, CAST(max(tb) AS BIGINT) AS n_b
FROM cdf, tot
""",
)
def ks_binned_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cu = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin(_SEG_A, _SEG_B))
        .select(
            F.col("c_custkey").alias("o_custkey"),
            F.col("c_mktsegment").alias("seg"),
        )
    )
    j = od.join(F.broadcast(cu), "o_custkey")
    mx = j.agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    binned = j.crossJoin(F.broadcast(mx)).select(
        "seg",
        F.least(
            F.lit(_KS_BINS - 1),
            F.expr(f"((cents - lo) * {_KS_BINS}) div (hi - lo + 1)"),
        ).alias("bin"),
    )
    c = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("seg") == _SEG_A, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("seg") == _SEG_B, 1).otherwise(0)).alias("nb"),
    )
    tot = c.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    # unpartitioned window bound: one row per histogram bin
    # (value-bounded codomain), never the raw fact rows
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf = c.crossJoin(F.broadcast(tot)).select(
        "bin",
        "ta",
        "tb",
        F.expr(
            f"CAST(sum(na) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED"
            f" PRECEDING AND CURRENT ROW) AS BIGINT) * 1000000 div ta"
        ).alias("fa_ppm"),
        F.expr(
            f"CAST(sum(nb) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED"
            f" PRECEDING AND CURRENT ROW) AS BIGINT) * 1000000 div tb"
        ).alias("fb_ppm"),
    )
    return cdf.agg(
        F.max(F.abs(F.col("fa_ppm") - F.col("fb_ppm")))
        .cast("bigint")
        .alias("ks_d_ppm"),
        F.count(F.lit(1)).alias("n_bins_occupied"),
        F.max("ta").cast("bigint").alias("n_a"),
        F.max("tb").cast("bigint").alias("n_b"),
    )


# ---------------------------------------------------------------------------
# cramers_v_association
# ---------------------------------------------------------------------------


@register(
    "cramers_v_association",
    oracle="""
WITH o AS (
  SELECT c_mktsegment AS seg, CAST(c_nationkey AS BIGINT) AS nat,
    CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2
),
m AS (
  SELECT seg, CAST(sum(n) AS BIGINT) AS n_seg FROM o GROUP BY seg
),
k AS (
  SELECT nat, CAST(sum(n) AS BIGINT) AS n_nat FROM o GROUP BY nat
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_all FROM o),
-- chi2 cell terms ×1e6: (obs - exp)²/exp with exp = n_seg·n_nat/n_all,
-- algebraically (obs·n_all - n_seg·n_nat)² / (n_seg·n_nat·n_all) —
-- integer numerator (128-bit), one floored division per cell
cells AS (
  SELECT
    CAST((CAST(o.n AS HUGEINT) * n_all - CAST(n_seg AS HUGEINT) * n_nat)
      * (CAST(o.n AS HUGEINT) * n_all - CAST(n_seg AS HUGEINT) * n_nat)
      * 1000000
      // (CAST(n_seg AS HUGEINT) * n_nat * n_all) AS BIGINT) AS chi2_micro
  FROM o JOIN m USING (seg) JOIN k USING (nat), tot
),
agg AS (
  SELECT CAST(sum(chi2_micro) AS BIGINT) AS chi2_micro_sum FROM cells
)
SELECT chi2_micro_sum,
  CAST(floor(sqrt(chi2_micro_sum / 1000000.0
    / ((SELECT n_all FROM tot) * 4.0)) * 1000) AS BIGINT) AS cramers_v_milli
FROM agg
""",
)
def cramers_v_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    o = cu.groupBy(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").cast("bigint").alias("nat"),
    ).agg(F.count(F.lit(1)).alias("n"))
    m = o.groupBy("seg").agg(F.sum("n").alias("n_seg"))
    k = o.groupBy("nat").agg(F.sum("n").alias("n_nat"))
    tot = o.agg(F.sum("n").alias("n_all"))
    cells = (
        o.join(F.broadcast(m), "seg")
        .join(F.broadcast(k), "nat")
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "CAST((CAST(n AS DECIMAL(38,0)) * n_all"
                " - CAST(n_seg AS DECIMAL(38,0)) * n_nat)"
                " * (CAST(n AS DECIMAL(38,0)) * n_all"
                "    - CAST(n_seg AS DECIMAL(38,0)) * n_nat)"
                " * 1000000"
                " DIV (CAST(n_seg AS DECIMAL(38,0)) * n_nat * n_all)"
                " AS BIGINT)"
            ).alias("chi2_micro"),
            "n_all",
        )
    )
    agg = cells.groupBy("n_all").agg(
        F.sum("chi2_micro").alias("chi2_micro_sum")
    )
    # V = sqrt(chi2 / (n · min(r-1, c-1))); min(5-1, 25-1) = 4
    return agg.select(
        "chi2_micro_sum",
        F.expr(
            "CAST(floor(sqrt(chi2_micro_sum / 1000000.0 / (n_all * 4.0))"
            " * 1000) AS BIGINT)"
        ).alias("cramers_v_milli"),
    )


# ---------------------------------------------------------------------------
# gumbel_moments_fit
# ---------------------------------------------------------------------------

_SQRT6_OVER_PI = math.sqrt(6) / math.pi  # 0.7796968...
_EULER_GAMMA = 0.5772156649015329


@register(
    "gumbel_moments_fit",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(max(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mx
  FROM orders GROUP BY 1
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(mx) AS BIGINT) AS s1,
    CAST(sum(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS s2
  FROM daily
)
SELECT n AS n_days,
  s1 // n AS mean_max_cents,
  CAST(floor(sqrt(CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
    / (n * (n - 1.0))) * {_SQRT6_OVER_PI}) AS BIGINT)
    AS gumbel_beta_cents,
  s1 // n
  - CAST(floor(sqrt(CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
      / (n * (n - 1.0))) * {_SQRT6_OVER_PI} * {_EULER_GAMMA}) AS BIGINT)
    AS gumbel_mu_cents
FROM mom
""",
)
def gumbel_moments_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = load_table(spark, sf_dir, "orders").groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.max(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "mx"
        )
    )
    mom = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mx").alias("s1"),
        F.sum(F.expr("CAST(mx AS DECIMAL(38,0)) * mx")).alias("s2"),
    )
    # exact 128-bit variance numerator n·s2 − s1², cast to double ONCE
    var_num = "CAST(n * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)"
    return mom.select(
        F.col("n").alias("n_days"),
        F.expr("s1 div n").alias("mean_max_cents"),
        F.expr(
            f"CAST(floor(sqrt({var_num} / (n * (n - 1.0)))"
            f" * {_SQRT6_OVER_PI}) AS BIGINT)"
        ).alias("gumbel_beta_cents"),
        F.expr(
            f"s1 div n - CAST(floor(sqrt({var_num} / (n * (n - 1.0)))"
            f" * {_SQRT6_OVER_PI} * {_EULER_GAMMA}) AS BIGINT)"
        ).alias("gumbel_mu_cents"),
    )


# ---------------------------------------------------------------------------
# two_way_effects — two-factor effects decomposition of order value on
# mktsegment × orderpriority: cell mean = grand + A-effect + B-effect
# + interaction. The additive-model residual (interaction_cents) is
# the "does priority behave differently per segment" signal — the
# two-way ANOVA table's effect column, in exact integer cents (every
# mean one floored division of exact sums; the 5×5 cell frame is
# bounded).
# ---------------------------------------------------------------------------


@register(
    "two_way_effects",
    oracle="""
WITH y AS (
  SELECT c_mktsegment AS seg, o_orderpriority AS prio,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
),
g AS (SELECT CAST(sum(cents) AS BIGINT) // count(*) AS grand FROM y),
a AS (
  SELECT seg, CAST(sum(cents) AS BIGINT) // count(*) AS a_mean
  FROM y GROUP BY seg
),
b AS (
  SELECT prio, CAST(sum(cents) AS BIGINT) // count(*) AS b_mean
  FROM y GROUP BY prio
),
cell AS (
  SELECT seg, prio, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(cents) AS BIGINT) // count(*) AS cell_mean
  FROM y GROUP BY seg, prio
)
SELECT cell.seg, cell.prio, n, cell_mean AS cell_mean_cents,
  a_mean - grand AS seg_effect_cents,
  b_mean - grand AS prio_effect_cents,
  cell_mean - (a_mean + b_mean - grand) AS interaction_cents
FROM cell JOIN a ON cell.seg = a.seg JOIN b ON cell.prio = b.prio, g
""",
)
def two_way_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderpriority").alias("prio"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cu = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("seg"),
    )
    y = od.join(F.broadcast(cu), "o_custkey")
    g = y.agg(F.expr("sum(cents) div count(*)").alias("grand"))
    a = y.groupBy("seg").agg(F.expr("sum(cents) div count(*)").alias("a_mean"))
    b = y.groupBy("prio").agg(
        F.expr("sum(cents) div count(*)").alias("b_mean")
    )
    cell = y.groupBy("seg", "prio").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(cents) div count(*)").alias("cell_mean"),
    )
    return (
        cell.join(F.broadcast(a), "seg")
        .join(F.broadcast(b), "prio")
        .crossJoin(F.broadcast(g))
        .select(
            "seg",
            "prio",
            "n",
            F.col("cell_mean").alias("cell_mean_cents"),
            (F.col("a_mean") - F.col("grand")).alias("seg_effect_cents"),
            (F.col("b_mean") - F.col("grand")).alias("prio_effect_cents"),
            (
                F.col("cell_mean")
                - (F.col("a_mean") + F.col("b_mean") - F.col("grand"))
            ).alias("interaction_cents"),
        )
    )


# ---------------------------------------------------------------------------
# ab_test_sizing — experiment-design calculator from live variance:
# n per arm ≈ 16·σ²/δ² (the standard 80%-power / 5%-α rule-of-16)
# for a minimum detectable effect of 2% of the current mean order
# value. σ² comes from the exact 128-bit cents moments; the MDE and
# the rule constant are integer-scaled literals, so the recommended
# sample size is engine-exact.
# ---------------------------------------------------------------------------


@register(
    "ab_test_sizing",
    oracle="""
WITH c AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(cents) AS BIGINT) AS s1,
    CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS s2
  FROM c
)
SELECT n AS n_observed,
  s1 // n AS mean_cents,
  CAST((n * s2 - CAST(s1 AS HUGEINT) * s1) // (CAST(n AS HUGEINT) * (n - 1))
    AS BIGINT) AS var_cents2,
  -- delta = 2% of mean; n_arm = 16 * var / delta^2
  CAST((CAST(16 AS HUGEINT)
    * ((n * s2 - CAST(s1 AS HUGEINT) * s1) // (CAST(n AS HUGEINT) * (n - 1))))
    // (((s1 // n) * 2 // 100) * ((s1 // n) * 2 // 100)) AS BIGINT)
    AS n_per_arm
FROM mom
""",
)
def ab_test_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    mom = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0)) * cents")).alias("s2"),
    )
    var = (
        "(n * s2 - CAST(s1 AS DECIMAL(38,0)) * s1)"
        " DIV (CAST(n AS DECIMAL(38,0)) * (n - 1))"
    )
    return mom.select(
        F.col("n").alias("n_observed"),
        F.expr("s1 div n").alias("mean_cents"),
        F.expr(f"CAST({var} AS BIGINT)").alias("var_cents2"),
        F.expr(
            f"CAST((CAST(16 AS DECIMAL(38,0)) * ({var}))"
            f" DIV (((s1 div n) * 2 div 100) * ((s1 div n) * 2 div 100))"
            f" AS BIGINT)"
        ).alias("n_per_arm"),
    )


# ---------------------------------------------------------------------------
# price_lognormal_fit — per-mktsegment lognormal fit of the order-value
# distribution (the standard model for spend distributions): per order
# x = floor(ln(price)·1e6) micro-nats, then μ̂ = mean(x) and the mean
# absolute deviation around it, with σ̂ = MAD·√(π/2) (exact for a
# normal ln-price; the constant enters once as the integer ratio
# 12533/10000). MAD instead of Σx² on purpose: squared micro-nats
# overflow int64 beyond ~9M rows, while Σ|x−μ| stays ~1e6·n — exact
# integer arithmetic at any scale.
#
# Scale shape: two passes over the order fact (ln+sum, then |x−μ|
# re-aggregation) with the 5-row per-segment moment table broadcast
# back between them; customer dim is broadcast. No window, no collect.
# ---------------------------------------------------------------------------


@register(
    "price_lognormal_fit",
    oracle="""
WITH x AS (
  SELECT c_mktsegment AS segment,
    CAST(floor(ln(o_totalprice) * 1000000) AS BIGINT) AS lnp
  FROM orders JOIN customer ON o_custkey = c_custkey
),
m AS (
  SELECT segment, CAST(count(*) AS BIGINT) AS n_orders,
    CAST(sum(lnp) AS BIGINT) // count(*) AS mu_ln_micro
  FROM x GROUP BY 1
)
SELECT x.segment, n_orders, mu_ln_micro,
  CAST(sum(abs(lnp - mu_ln_micro)) AS BIGINT) // n_orders
    AS mad_ln_micro,
  CAST(sum(abs(lnp - mu_ln_micro)) AS BIGINT) // n_orders * 12533
    // 10000 AS sigma_ln_micro,
  CAST(min(lnp) AS BIGINT) AS min_ln_micro,
  CAST(max(lnp) AS BIGINT) AS max_ln_micro
FROM x JOIN m ON x.segment = m.segment
GROUP BY x.segment, n_orders, mu_ln_micro
""",
)
def price_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    x = (
        load_table(spark, sf_dir, "orders")
        .join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "segment",
            F.floor(F.log(F.col("o_totalprice")) * 1000000)
            .cast("bigint")
            .alias("lnp"),
        )
    )
    m = x.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.expr("sum(lnp) div count(*)").alias("mu_ln_micro"),
    )
    return (
        x.join(F.broadcast(m), "segment")
        .groupBy("segment", "n_orders", "mu_ln_micro")
        .agg(
            F.expr("sum(abs(lnp - mu_ln_micro)) div n_orders").alias(
                "mad_ln_micro"
            ),
            F.expr(
                "sum(abs(lnp - mu_ln_micro)) div n_orders * 12533 div 10000"
            ).alias("sigma_ln_micro"),
            F.min("lnp").cast("bigint").alias("min_ln_micro"),
            F.max("lnp").cast("bigint").alias("max_ln_micro"),
        )
    )


# ---------------------------------------------------------------------------
# segment_nation_mutual_info — mutual information between the customer
# market segment and nation (how much knowing the nation tells you
# about the segment mix): MI = Σ_ij (n_ij/N)·ln(n_ij·N / (r_i·c_j)),
# with the marginal entropies for normalization context. The
# information-theoretic companion to cramers_v_association (χ²-based
# effect size) — MI is the quantity a feature-selection pass ranks by.
#
# Integer contract (markov_entropy_rate's rule): ln() of the exact
# BIGINT ratio is floored to micro-nats PER CELL before the weighted
# sum; the final /N uses integer division (DuckDB // and Spark div
# both truncate toward zero, verified — so even the possibly-negative
# MI sum divides identically). Cell counts bound the arithmetic:
# n_ij·N ≤ 2⁶³ holds to ~3e9 customers.
#
# Scale shape: one contingency groupBy (map-combined, |segments|×
# |nations| cells), marginals re-agg the CELL table (never the fact),
# 1-row total broadcast.
# ---------------------------------------------------------------------------


@register(
    "segment_nation_mutual_info",
    oracle="""
WITH cj AS (
  SELECT c_mktsegment AS seg, n_name AS nat, CAST(count(*) AS BIGINT) AS n
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY seg, nat
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_total FROM cj
), rm AS (
  SELECT seg, CAST(sum(n) AS BIGINT) AS r FROM cj GROUP BY seg
), cm AS (
  SELECT nat, CAST(sum(n) AS BIGINT) AS c FROM cj GROUP BY nat
), terms AS (
  SELECT n,
    CAST(floor(ln(CAST(n AS DOUBLE) * n_total / (CAST(r AS DOUBLE) * c))
         * 1000000) AS BIGINT) AS lnterm_micro
  FROM cj JOIN rm USING (seg) JOIN cm USING (nat) CROSS JOIN tot
), hx AS (
  SELECT CAST(sum(r * CAST(floor(ln(CAST(n_total AS DOUBLE) / r) * 1000000)
    AS BIGINT)) AS BIGINT) // n_total AS h_seg_micronat
  FROM rm CROSS JOIN tot GROUP BY n_total
), hy AS (
  SELECT CAST(sum(c * CAST(floor(ln(CAST(n_total AS DOUBLE) / c) * 1000000)
    AS BIGINT)) AS BIGINT) // n_total AS h_nation_micronat
  FROM cm CROSS JOIN tot GROUP BY n_total
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM cj) AS n_cells,
  tot.n_total,
  CAST(sum(n * lnterm_micro) AS BIGINT) // tot.n_total AS mi_micronat,
  hx.h_seg_micronat, hy.h_nation_micronat
FROM terms CROSS JOIN tot CROSS JOIN hx CROSS JOIN hy
GROUP BY tot.n_total, hx.h_seg_micronat, hy.h_nation_micronat
""",
)
def segment_nation_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cj = (
        cust.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"), F.col("n_name").alias("nat")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cj = cj.localCheckpoint()  # cell table feeds marginals + terms
    tot = cj.agg(F.sum("n").alias("n_total"))
    rm = cj.groupBy("seg").agg(F.sum("n").alias("r"))
    cm = cj.groupBy("nat").agg(F.sum("n").alias("c"))
    terms = (
        cj.join(F.broadcast(rm), "seg")
        .join(F.broadcast(cm), "nat")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            F.floor(
                F.log(
                    F.col("n").cast("double")
                    * F.col("n_total")
                    / (F.col("r").cast("double") * F.col("c"))
                )
                * 1000000
            )
            .cast("bigint")
            .alias("lnterm_micro"),
        )
    )
    hx = (
        rm.crossJoin(F.broadcast(tot))
        .select(
            "n_total",
            (
                F.col("r")
                * F.floor(
                    F.log(F.col("n_total").cast("double") / F.col("r")) * 1000000
                ).cast("bigint")
            ).alias("t"),
        )
        .groupBy("n_total")
        .agg(F.expr("sum(t) div n_total").alias("h_seg_micronat"))
        .select("h_seg_micronat")
    )
    hy = (
        cm.crossJoin(F.broadcast(tot))
        .select(
            "n_total",
            (
                F.col("c")
                * F.floor(
                    F.log(F.col("n_total").cast("double") / F.col("c")) * 1000000
                ).cast("bigint")
            ).alias("t"),
        )
        .groupBy("n_total")
        .agg(F.expr("sum(t) div n_total").alias("h_nation_micronat"))
        .select("h_nation_micronat")
    )
    n_cells = cj.agg(F.count(F.lit(1)).alias("n_cells"))
    mi = (
        terms.crossJoin(F.broadcast(tot))
        .groupBy("n_total")
        .agg(F.expr("sum(n * lnterm_micro) div n_total").alias("mi_micronat"))
    )
    return (
        n_cells.crossJoin(mi)
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            "n_cells",
            "n_total",
            "mi_micronat",
            "h_seg_micronat",
            "h_nation_micronat",
        )
    )


# ---------------------------------------------------------------------------
# ab_cuped_adjustment — CUPED variance reduction (Deng et al., WSDM
# 2013): θ = cov(pre, post)/var(pre) over per-user value sums split at
# the data-derived temporal midpoint, plus the variance-reduction
# factor R² = corr² the adjustment buys. The modern experimentation
# companion to ab_test_sizing — CUPED's R² multiplies the required
# sample size down by (1−R²).
#
# Integer contract: per-event cents (per-row round), per-user BIGINT
# sums, n-scaled moments accumulated in 128-bit (HUGEINT /
# DECIMAL(38,0) — Σx² of user cents passes int64 in the billions of
# users), θ in milli and R² in ppm via 128-bit division — both
# engines truncate toward zero on negatives (verified), so the
# possibly-negative θ divides identically. The temporal midpoint is
# exact integer micros arithmetic.
# ---------------------------------------------------------------------------


@register(
    "ab_cuped_adjustment",
    oracle="""
WITH b AS (
  SELECT epoch_us(min(ts)) + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2
    AS mid_us
  FROM events
), u AS (
  SELECT user_id,
    CAST(coalesce(sum(CASE WHEN epoch_us(ts) < mid_us
      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS x,
    CAST(coalesce(sum(CASE WHEN epoch_us(ts) >= mid_us
      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS y
  FROM events CROSS JOIN b
  GROUP BY user_id
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM u
)
SELECT n AS n_users, sx AS sum_pre_cents, sy AS sum_post_cents,
  CASE WHEN n * sxx - CAST(sx AS HUGEINT) * sx = 0
       THEN CAST(NULL AS BIGINT)
       ELSE CAST((n * sxy - CAST(sx AS HUGEINT) * sy) * 1000
                 // (n * sxx - CAST(sx AS HUGEINT) * sx) AS BIGINT)
  END AS theta_milli,
  CASE WHEN n * sxx - CAST(sx AS HUGEINT) * sx = 0
            OR n * syy - CAST(sy AS HUGEINT) * sy = 0
       THEN CAST(NULL AS BIGINT)
       ELSE CAST(floor(
         CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         * CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         / (CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
            * CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))
         * 1000000) AS BIGINT)
  END AS var_reduction_ppm
FROM m
""",
)
def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bpaotu_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    b = ev.agg(
        (
            F.min("ts_us")
            + F.expr("(max(ts_us) - min(ts_us)) div 2")
        ).alias("mid_us")
    )
    u = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("ts_us") < F.col("mid_us"), F.col("cents"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("x"),
            F.coalesce(
                F.sum(
                    F.when(F.col("ts_us") >= F.col("mid_us"), F.col("cents"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("y"),
        )
    )
    dec = "decimal(38,0)"
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
    )
    return m.select(
        F.col("n").alias("n_users"),
        F.col("sx").alias("sum_pre_cents"),
        F.col("sy").alias("sum_post_cents"),
        F.expr(
            "CASE WHEN n * sxx - CAST(sx AS DECIMAL(38,0)) * sx = 0"
            " THEN CAST(NULL AS BIGINT)"
            " ELSE CAST((n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * 1000"
            " div (n * sxx - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)"
            " END"
        ).alias("theta_milli"),
        F.expr(
            "CASE WHEN n * sxx - CAST(sx AS DECIMAL(38,0)) * sx = 0"
            " OR n * syy - CAST(sy AS DECIMAL(38,0)) * sy = 0"
            " THEN CAST(NULL AS BIGINT)"
            " ELSE CAST(floor("
            " CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)"
            " * CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)"
            " / (CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"
            " * CAST(n * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))"
            " * 1000000) AS BIGINT)"
            " END"
        ).alias("var_reduction_ppm"),
    )


# ---------------------------------------------------------------------------
# lineitem_corr_matrix — the pairwise Pearson correlation matrix over
# the fact table's numeric measures (quantity, extended price,
# discount, tax), the optimizer/profiling statistic behind join and
# filter selectivity models (and the sanity check that synthetic data
# has the dependence structure it claims). Complements table_profile
# (per-column) and part_size_price_corr (one dim pair) with the full
# measure×measure matrix off ONE scan.
#
# Determinism: measures are integer-scaled per row (quantity, cents,
# basis points); all 14 moments accumulate exactly in BIGINT /
# 128-bit; the final correlation converts those exact integers to
# doubles (identical IEEE round-to-nearest in both engines) and
# rounds to 6 dp. One aggregate row unpivots to 6 pair rows.
# ---------------------------------------------------------------------------

_CORR_COLS = ("q", "p", "d", "t")
_CORR_NAMES = {
    "q": "l_quantity",
    "p": "l_extendedprice_cents",
    "d": "l_discount_bp",
    "t": "l_tax_bp",
}
_CORR_PAIRS = [
    (a, b)
    for i, a in enumerate(_CORR_COLS)
    for b in _CORR_COLS[i + 1 :]
]


def _corr_moment(a: str, b: str) -> str:
    return "s_" + "".join(sorted((a, b)))


def _corr_pair_sql(a: str, b: str) -> str:
    num = f"(n * {_corr_moment(a, b)} - CAST(s_{a} AS HUGEINT) * s_{b})"
    da = f"(n * {_corr_moment(a, a)} - CAST(s_{a} AS HUGEINT) * s_{a})"
    db = f"(n * {_corr_moment(b, b)} - CAST(s_{b} AS HUGEINT) * s_{b})"
    return (
        f"SELECT '{_CORR_NAMES[a]}' AS col_x, '{_CORR_NAMES[b]}' AS col_y,"
        f" n AS n_rows,"
        f" CAST(round(CAST({num} AS DOUBLE)"
        f" / (sqrt(CAST({da} AS DOUBLE)) * sqrt(CAST({db} AS DOUBLE))), 6)"
        f" AS DOUBLE) AS corr FROM m"
    )


@register(
    "lineitem_corr_matrix",
    oracle=f"""
WITH x AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS q,
    CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
    CAST(round(l_discount * 10000) AS BIGINT) AS d,
    CAST(round(l_tax * 10000) AS BIGINT) AS t
  FROM lineitem
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    {", ".join(f"CAST(sum({c}) AS BIGINT) AS s_{c}" for c in _CORR_COLS)},
    {", ".join(f"CAST(sum(CAST({a} AS HUGEINT) * {b}) AS HUGEINT) AS s_{a}{b}" for a in _CORR_COLS for b in _CORR_COLS if a <= b)}
  FROM x
)
{" UNION ALL ".join(_corr_pair_sql(a, b) for a, b in _CORR_PAIRS)}
""",
)
def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bpaotu_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    x = li.select(
        F.round("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("p"),
        F.round(F.col("l_discount") * 10000).cast("bigint").alias("d"),
        F.round(F.col("l_tax") * 10000).cast("bigint").alias("t"),
    )
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(c).alias(f"s_{c}") for c in _CORR_COLS]
    aggs += [
        F.sum(F.col(a).cast(dec) * F.col(b)).alias(f"s_{a}{b}")
        for a in _CORR_COLS
        for b in _CORR_COLS
        if a <= b
    ]
    m = x.agg(*aggs)
    frames = []
    for a, b in _CORR_PAIRS:
        num = f"(n * {_corr_moment(a, b)} - CAST(s_{a} AS DECIMAL(38,0)) * s_{b})"
        da = f"(n * {_corr_moment(a, a)} - CAST(s_{a} AS DECIMAL(38,0)) * s_{a})"
        db = f"(n * {_corr_moment(b, b)} - CAST(s_{b} AS DECIMAL(38,0)) * s_{b})"
        frames.append(
            m.select(
                F.lit(_CORR_NAMES[a]).alias("col_x"),
                F.lit(_CORR_NAMES[b]).alias("col_y"),
                F.col("n").alias("n_rows"),
                F.expr(
                    f"CAST(round(CAST({num} AS DOUBLE)"
                    f" / (sqrt(CAST({da} AS DOUBLE))"
                    f" * sqrt(CAST({db} AS DOUBLE))), 6) AS DOUBLE)"
                ).alias("corr"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


# ---------------------------------------------------------------------------
# mann_whitney_order_value — exact Mann-Whitney U (Wilcoxon rank-sum)
# between the two study segments on cent-exact order totals: the
# nonparametric two-sample test next to the binned KS row (KS compares
# CDFs on a grid; U compares the full rank order exactly). Average
# ranks for ties via the distinct-value cumulative table (the ANOSIM
# rank discipline), carried in HALVES so everything stays integer:
# avg_rank·2 = 2·cum_before + cnt_v + 1. U₁·2 = 2n₁n₂ + n₁(n₁+1) −
# R₁·2 is exact; the normal z-score uses the tie-corrected variance
# with exact-integer inputs in ONE float expression, floored milli.
#
# Scale shape: one fact scan → distinct-value counts (map-side
# combinable); the cumulative window runs over the DISTINCT cents
# table (value-bounded codomain); output is one row.
# ---------------------------------------------------------------------------


@register(
    "mann_whitney_order_value",
    oracle=f"""
WITH j AS (
  SELECT c_mktsegment AS seg,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
),
dv AS (
  SELECT cents,
    CAST(count(*) AS BIGINT) AS cnt,
    CAST(sum(CASE WHEN seg = '{_SEG_A}' THEN 1 ELSE 0 END) AS BIGINT)
      AS cnt_a
  FROM j GROUP BY cents
),
cum AS (
  SELECT cents, cnt, cnt_a,
    CAST(coalesce(sum(cnt) OVER (ORDER BY cents ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cum_before
  FROM dv
),
st AS (
  SELECT
    CAST(sum(cnt_a) AS BIGINT) AS n_a,
    CAST(sum(cnt - cnt_a) AS BIGINT) AS n_b,
    CAST(sum(cnt_a * (2 * cum_before + cnt + 1)) AS BIGINT) AS r_a_x2,
    CAST(sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS HUGEINT) AS ties
  FROM cum
)
SELECT n_a, n_b,
  2 * n_a * n_b + n_a * (n_a + 1) - r_a_x2 AS u_a_x2,
  CAST(floor(
    (CAST(2 * n_a * n_b + n_a * (n_a + 1) - r_a_x2 AS DOUBLE) / 2.0
      - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
    / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
        * (CAST(n_a + n_b + 1 AS DOUBLE)
           - CAST(ties AS DOUBLE)
             / (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b - 1 AS DOUBLE))))
    * 1000) AS BIGINT) AS z_milli
FROM st
""",
)
def mann_whitney_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-averaged Mann-Whitney U + tie-corrected z (milli)."""
    od = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = (
        od.join(
            F.broadcast(
                cust.filter(
                    F.col("c_mktsegment").isin(_SEG_A, _SEG_B)
                ).select("c_custkey", "c_mktsegment")
            ),
            od.o_custkey == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
    )
    dv = j.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(F.when(F.col("seg") == _SEG_A, 1).otherwise(0))
        .cast("bigint")
        .alias("cnt_a"),
    )
    # unpartitioned window bound: DISTINCT cents table (value-bounded)
    wv = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    cum = dv.select(
        "cents",
        "cnt",
        "cnt_a",
        F.coalesce(F.sum("cnt").over(wv), F.lit(0))
        .cast("bigint")
        .alias("cum_before"),
    )
    st = cum.agg(
        F.sum("cnt_a").cast("bigint").alias("n_a"),
        F.sum(F.col("cnt") - F.col("cnt_a")).cast("bigint").alias("n_b"),
        F.sum(F.col("cnt_a") * (2 * F.col("cum_before") + F.col("cnt") + 1))
        .cast("bigint")
        .alias("r_a_x2"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt")).alias(
            "ties_dec"
        ),
    )
    return st.select(
        "n_a",
        "n_b",
        F.expr("2 * n_a * n_b + n_a * (n_a + 1) - r_a_x2").alias("u_a_x2"),
        F.expr(
            "CAST(floor("
            " (CAST(2 * n_a * n_b + n_a * (n_a + 1) - r_a_x2 AS DOUBLE) / 2.0"
            "   - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)"
            " / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0"
            "     * (CAST(n_a + n_b + 1 AS DOUBLE)"
            "        - CAST(ties_dec AS DOUBLE)"
            "          / (CAST(n_a + n_b AS DOUBLE)"
            "             * CAST(n_a + n_b - 1 AS DOUBLE))))"
            " * 1000) AS BIGINT)"
        ).alias("z_milli"),
    )


# ---------------------------------------------------------------------------
# spearman_part_size_price — Spearman rank correlation between p_size
# and p_retailprice over the part dimension: the monotone-association
# companion to the Pearson row (part_size_price_corr) — identical on
# linear data, robust to the curved relationships Pearson understates.
# Ties (heavy in the 50-value size domain) use average ranks carried
# in HALVES from each column's distinct-value cumulative table (the
# mann_whitney discipline), so every rank is an exact integer; rho is
# Pearson over the integer rank pairs: 128-bit moments, one float
# expression, floored milli.
#
# Scale shape: two value-bounded cumulative windows (distinct sizes /
# distinct cents) + two broadcast rank-lookup joins + one map-combined
# moment aggregation; one output row.
# ---------------------------------------------------------------------------


def _rank_x2_sql(col: str, src: str) -> str:
    """CTE body: ({col}_val, rank_x2) average-rank lookup in halves."""
    return f"""
  SELECT {col} AS v,
    2 * CAST(coalesce(sum(cnt) OVER (ORDER BY {col} ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      + cnt + 1 AS rank_x2
  FROM (SELECT {col}, CAST(count(*) AS BIGINT) AS cnt
        FROM {src} GROUP BY {col})
"""


@register(
    "spearman_part_size_price",
    oracle=f"""
WITH px AS (
  SELECT CAST(p_size AS BIGINT) AS sz,
    CAST(round(p_retailprice * 100) AS BIGINT) AS cents
  FROM part
),
rs AS ({_rank_x2_sql("sz", "px")}),
rc AS ({_rank_x2_sql("cents", "px")}),
rr AS (
  SELECT rs.rank_x2 AS rx, rc.rank_x2 AS ry
  FROM px JOIN rs ON px.sz = rs.v JOIN rc ON px.cents = rc.v
),
mo AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(rx) AS HUGEINT) AS sx, CAST(sum(ry) AS HUGEINT) AS sy,
    CAST(sum(CAST(rx AS HUGEINT) * ry) AS HUGEINT) AS sxy,
    CAST(sum(CAST(rx AS HUGEINT) * rx) AS HUGEINT) AS sxx,
    CAST(sum(CAST(ry AS HUGEINT) * ry) AS HUGEINT) AS syy
  FROM rr
)
SELECT CAST(n AS BIGINT) AS n_parts,
  CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
         * CAST(n * syy - sy * sy AS DOUBLE)) * 1000) AS BIGINT)
    AS spearman_milli
FROM mo
""",
)
def spearman_part_size_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-exact Spearman rho (milli) between part size and price."""
    px = load_table(spark, sf_dir, "part").select(
        F.col("p_size").cast("bigint").alias("sz"),
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
    )

    def rank_map(col: str) -> DataFrame:
        dv = px.groupBy(col).agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        # unpartitioned window bound: DISTINCT-value table (value-
        # bounded codomain: 50 sizes / cent-grid prices)
        wv = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return dv.select(
            F.col(col).alias("v"),
            (
                2 * F.coalesce(F.sum("cnt").over(wv), F.lit(0))
                + F.col("cnt")
                + 1
            )
            .cast("bigint")
            .alias("rank_x2"),
        )

    rs = rank_map("sz").withColumnRenamed("rank_x2", "rx")
    rc = rank_map("cents").withColumnRenamed("rank_x2", "ry")
    rr = (
        px.join(F.broadcast(rs), px.sz == rs.v)
        .drop("v")
        .join(F.broadcast(rc), px.cents == rc.v)
        .select("rx", "ry")
    )
    mo = rr.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("rx").cast("decimal(38,0)").alias("sx"),
        F.sum("ry").cast("decimal(38,0)").alias("sy"),
        F.sum(F.expr("CAST(rx AS DECIMAL(38,0)) * ry")).alias("sxy"),
        F.sum(F.expr("CAST(rx AS DECIMAL(38,0)) * rx")).alias("sxx"),
        F.sum(F.expr("CAST(ry AS DECIMAL(38,0)) * ry")).alias("syy"),
    )
    return mo.select(
        F.col("n").cast("bigint").alias("n_parts"),
        F.expr(
            "CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)"
            " / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)"
            "      * CAST(n * syy - sy * sy AS DOUBLE)) * 1000) AS BIGINT)"
        ).alias("spearman_milli"),
    )


# ---------------------------------------------------------------------------
# wilcoxon_signed_rank_yoy — paired nonparametric test: did per-
# customer spend SHIFT between consecutive years? Pairs = customers
# with orders in both years; diff = cents(y2) − cents(y1), zeros
# dropped (the standard convention); |diff| ranked with tie-averaged
# ranks in HALVES (exact integers, the mann_whitney discipline);
# W⁺·2 = Σ rank_x2 over positive diffs. The normal z uses the
# tie-corrected variance n(n+1)(2n+1)/24 − Σ(t³−t)/48 with exact
# integer inputs in one float expression, floored milli. Completes
# the nonparametric pair: Mann-Whitney (independent samples) /
# Wilcoxon signed-rank (paired).
#
# Scale shape: per-(customer, year) rollup → paired diff per customer
# → distinct-|diff| cumulative window (value-bounded codomain) → one
# output row.
# ---------------------------------------------------------------------------

_WX_Y1, _WX_Y2 = 1996, 1997


@register(
    "wilcoxon_signed_rank_yoy",
    oracle=f"""
WITH cy AS (
  SELECT o_custkey,
    CAST(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = {_WX_Y1}
      THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
      AS c1,
    CAST(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = {_WX_Y2}
      THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
      AS c2,
    CAST(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = {_WX_Y1}
      THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = {_WX_Y2}
      THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM orders
  WHERE year(CAST(o_orderdate AS DATE)) IN ({_WX_Y1}, {_WX_Y2})
  GROUP BY o_custkey
),
df AS (
  SELECT c2 - c1 AS d, abs(c2 - c1) AS ad
  FROM cy WHERE n1 > 0 AND n2 > 0 AND c2 <> c1
),
dv AS (
  SELECT ad, CAST(count(*) AS BIGINT) AS cnt,
    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_pos
  FROM df GROUP BY ad
),
cum AS (
  SELECT ad, cnt, cnt_pos,
    CAST(coalesce(sum(cnt) OVER (ORDER BY ad ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cum_before
  FROM dv
),
st AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
    CAST(sum(cnt_pos) AS BIGINT) AS n_pos,
    CAST(sum(cnt_pos * (2 * cum_before + cnt + 1)) AS BIGINT) AS w_pos_x2,
    CAST(sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS HUGEINT) AS ties
  FROM cum
)
SELECT n, n_pos, w_pos_x2,
  CAST(floor(
    (CAST(w_pos_x2 AS DOUBLE) / 2.0
      - CAST(n AS DOUBLE) * (n + 1) / 4.0)
    / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24.0
        - CAST(ties AS DOUBLE) / 48.0) * 1000) AS BIGINT) AS z_milli
FROM st
""",
)
def wilcoxon_signed_rank_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired Wilcoxon signed-rank on per-customer YoY spend (1 row)."""
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year(F.col("o_orderdate").cast("date")).alias("yr"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).filter(F.col("yr").isin(_WX_Y1, _WX_Y2))
    cy = od.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("yr") == _WX_Y1, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("yr") == _WX_Y2, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("c2"),
        F.sum(F.when(F.col("yr") == _WX_Y1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("yr") == _WX_Y2, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    df = cy.filter(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("c2") != F.col("c1"))
    ).select(
        (F.col("c2") - F.col("c1")).alias("d"),
        F.abs(F.col("c2") - F.col("c1")).alias("ad"),
    )
    dv = df.groupBy("ad").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("cnt_pos"),
    )
    # unpartitioned window bound: DISTINCT |diff| table (value-bounded)
    wv = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    cum = dv.select(
        "ad",
        "cnt",
        "cnt_pos",
        F.coalesce(F.sum("cnt").over(wv), F.lit(0))
        .cast("bigint")
        .alias("cum_before"),
    )
    st = cum.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("cnt_pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("cnt_pos") * (2 * F.col("cum_before") + F.col("cnt") + 1))
        .cast("bigint")
        .alias("w_pos_x2"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt")).alias(
            "ties_dec"
        ),
    )
    return st.select(
        "n",
        "n_pos",
        "w_pos_x2",
        F.expr(
            "CAST(floor("
            " (CAST(w_pos_x2 AS DOUBLE) / 2.0"
            "   - CAST(n AS DOUBLE) * (n + 1) / 4.0)"
            " / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24.0"
            "     - CAST(ties_dec AS DOUBLE) / 48.0) * 1000) AS BIGINT)"
        ).alias("z_milli"),
    )
