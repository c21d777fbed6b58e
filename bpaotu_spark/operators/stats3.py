"""Round-7 classical-test additions: rank/variance/trend statistics.

Fills the remaining gaps in the hypothesis-test menu next to
mann_whitney / wilcoxon / spearman (stats2.py):

* ``kruskal_wallis_h`` — k-sample rank test (the >2-group extension of
  Mann-Whitney) across all five market segments, tie-corrected.
* ``anova_oneway_f`` — parametric one-way F on cent-exact order totals
  (the classical companion the rank test is robust against).
* ``brown_forsythe_f`` — variance-homogeneity test on |x − group
  median| (Levene's test with the median center), the guard assumption
  check for the ANOVA row.
* ``cochran_armitage_trend`` — dose-response trend of the return rate
  across the ordered quantity levels 1..50.
* ``kendall_tau_daily`` — Kendall tau-b concordance between daily
  revenue and daily order count over the (calendar-bounded) day grid.

Reference semantics: the public formulas (Kruskal & Wallis '52,
Brown & Forsythe '74, Armitage '55, Kendall '38) over bpaotu-style
contextual groupings (reference: bpaotu/otu/query.py's contextual
filter groups feed exactly these k-sample comparisons downstream).

Determinism discipline (repo-wide): every statistic is assembled from
EXACT integer aggregates (cent totals, rank sums carried in halves
via the distinct-value cumulative table, tie counts); the only float
arithmetic is ONE final scalar expression per output column, floored
to milli — identical token-for-token in the Spark plan and the DuckDB
oracle, so summation order can never flip the driver's value hash.
Documented deviations: anova/brown_forsythe center on milli-floored
group means (exact-integer deviations; differs from the textbook
continuous mean by < 1e-3 cents — hash-exact in exchange), and
brown_forsythe uses the LOWER median (integer, no midpoint).

Scale shape: each op is one or two fact scans into map-side-combined
keyed aggregations; cumulative windows run over DISTINCT-value tables
(value-bounded codomain, never the fact); group lookup joins broadcast
k ≤ 50 rows; kendall's pair frame is |days|² over the CALENDAR
(~2.4k days regardless of SF → ≤ ~3M pairs, broadcast self-join).
int64 boundaries (rank-sum squares, A/B trend numerators) are kept in
DECIMAL(38,0)/HUGEINT; the two `div`s that land in int64 are safe
through SF1000 and annotated where they'd need the decimal fallback.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table, maybe_broadcast
from bpaotu_spark.registry import register

# Shared CTE: (seg, cents) — one row per order, cent-exact totals,
# all five market segments (the mann_whitney two-segment j, widened).
_SEG_CENTS_CTE = """
j AS (
  SELECT c_mktsegment AS seg,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
)
""".strip()


def _seg_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return od.join(
        maybe_broadcast(cust.select("c_custkey", "c_mktsegment")),
        od.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )


# ---------------------------------------------------------------------------
# kruskal_wallis_h — H = 12/(N(N+1)) · Σ R_i²/n_i − 3(N+1), ranks
# tie-averaged in HALVES from the global distinct-value cumulative
# table (the mann_whitney discipline); per-group Σ R_i²/n_i floored
# per group: term_i = R_i_x2² div (4 n_i), kept in DECIMAL(38,0) end
# to end to mirror the oracle's HUGEINT (r7 ADVICE: Spark's `div`
# returns int64 and silently WRAPS past ~SF4 where term_i ~ n_g·N²/4
# > 9.2e18). The floor is exact: decimal division at scale 6 rounds,
# so q0 is within +1 of the true floor and one compare-and-decrement
# against sq repairs it. Boundaries, each behind a loud assert_true:
# r_x2 < 1e19 (bigint sum AND sq = r_x2² < 1e38, ~SF3000) and the
# scale-6 quotient < 1e32 (~SF80000) — past either the term goes
# NULL (non-ANSI decimal overflow) and the assert fires instead of
# returning a wrapped number. Tie correction divides by
# 1 − Σ(t³−t)/(N³−N).
# ---------------------------------------------------------------------------


@register(
    "kruskal_wallis_h",
    oracle=f"""
WITH {_SEG_CENTS_CTE},
dv AS (
  SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM j GROUP BY cents
),
cum AS (
  SELECT cents, cnt,
    2 * CAST(coalesce(sum(cnt) OVER (ORDER BY cents ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      + cnt + 1 AS rank_x2
  FROM dv
),
sv AS (
  SELECT seg, cents, CAST(count(*) AS BIGINT) AS cnt_s
  FROM j GROUP BY seg, cents
),
grp AS (
  SELECT seg, CAST(sum(cnt_s) AS BIGINT) AS n_g,
    CAST(sum(cnt_s * rank_x2) AS BIGINT) AS r_x2
  FROM sv JOIN cum USING (cents) GROUP BY seg
),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS k_groups,
    CAST(sum(n_g) AS BIGINT) AS n_total,
    CAST(sum(CAST(r_x2 AS HUGEINT) * r_x2 // (4 * n_g)) AS HUGEINT)
      AS sum_term
  FROM grp
),
tie AS (
  SELECT CAST(sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS HUGEINT)
    AS ties
  FROM dv
)
SELECT k_groups, n_total,
  CAST(floor((12.0 * CAST(sum_term AS DOUBLE)
      / (CAST(n_total AS DOUBLE) * CAST(n_total + 1 AS DOUBLE))
    - 3.0 * CAST(n_total + 1 AS DOUBLE)) * 1000) AS BIGINT) AS h_milli,
  CAST(floor((12.0 * CAST(sum_term AS DOUBLE)
      / (CAST(n_total AS DOUBLE) * CAST(n_total + 1 AS DOUBLE))
    - 3.0 * CAST(n_total + 1 AS DOUBLE))
    / (1.0 - CAST(ties AS DOUBLE)
       / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
          * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)))
    * 1000) AS BIGINT) AS h_tie_milli
FROM st CROSS JOIN tie
""",
)
def kruskal_wallis_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Kruskal-Wallis H across market segments (milli)."""
    j = _seg_cents(spark, sf_dir)
    dv = j.groupBy("cents").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    # unpartitioned window bound: DISTINCT cents table (value-bounded)
    wv = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    cum = dv.select(
        "cents",
        "cnt",
        (
            2 * F.coalesce(F.sum("cnt").over(wv), F.lit(0))
            + F.col("cnt")
            + 1
        )
        .cast("bigint")
        .alias("rank_x2"),
    )
    sv = j.groupBy("seg", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_s")
    )
    grp = (
        sv.join(cum, "cents")
        .groupBy("seg")
        .agg(
            F.sum("cnt_s").cast("bigint").alias("n_g"),
            F.sum(F.col("cnt_s") * F.col("rank_x2"))
            .cast("bigint")
            .alias("r_x2"),
        )
    )
    term = grp.select(
        "n_g",
        F.expr("CAST(r_x2 AS DECIMAL(38,0)) * r_x2").alias("sq"),
        F.expr("CAST(4 * n_g AS DECIMAL(38,0))").alias("den"),
        F.col("r_x2"),
    ).select(
        "n_g",
        # q0 ∈ {floor, floor+1} (scale-6 division then HALF_UP cast);
        # the compare-and-decrement makes it the exact HUGEINT floor.
        # Both overflow guards fold into the output CASE so column
        # pruning cannot drop them (morisita_horn convention): past
        # either boundary sq / the quotient go NULL under non-ANSI
        # decimal overflow and the assert fires instead of a silent
        # wrap.
        F.expr(
            "CASE WHEN assert_true("
            "  r_x2 < CAST(1e19 AS DECIMAL(38,0))"
            "  AND sq IS NOT NULL"
            "  AND CAST(sq / den AS DECIMAL(38,0)) IS NOT NULL,"
            "  'kruskal_wallis_h: 128-bit headroom exhausted"
            " (r_x2 >= 1e19 ~SF3000, or scale-6 quotient >= 1e32"
            " ~SF80000) — pre-scale ranks') IS NULL THEN"
            " CASE WHEN CAST(sq / den AS DECIMAL(38,0)) * den > sq"
            " THEN CAST(sq / den AS DECIMAL(38,0)) - 1"
            " ELSE CAST(sq / den AS DECIMAL(38,0)) END"
            " END"
        ).alias("term_i"),
    )
    st = term.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        F.sum("n_g").cast("bigint").alias("n_total"),
        F.sum("term_i").cast("decimal(38,0)").alias("sum_term"),
    )
    tie = dv.agg(
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt")).alias(
            "ties"
        )
    )
    h_expr = (
        "12.0 * CAST(sum_term AS DOUBLE)"
        " / (CAST(n_total AS DOUBLE) * CAST(n_total + 1 AS DOUBLE))"
        " - 3.0 * CAST(n_total + 1 AS DOUBLE)"
    )
    return st.crossJoin(F.broadcast(tie)).select(
        "k_groups",
        "n_total",
        F.expr(f"CAST(floor(({h_expr}) * 1000) AS BIGINT)").alias("h_milli"),
        F.expr(
            f"CAST(floor(({h_expr})"
            " / (1.0 - CAST(ties AS DOUBLE)"
            "    / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)"
            "       * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)))"
            " * 1000) AS BIGINT)"
        ).alias("h_tie_milli"),
    )


# ---------------------------------------------------------------------------
# anova_oneway_f — one-way F on cents across segments with
# MILLI-FLOORED group means (documented deviation): m_i_milli =
# s_i·1000 div n_i is an exact integer, so per-row deviations and both
# sums of squares are exact DECIMAL(38,0) integers; F and eta² are the
# only float step. Two fact scans (moments, then deviations against
# the ≤5-row broadcast mean table).
# ---------------------------------------------------------------------------

_ANOVA_ORACLE = f"""
WITH {_SEG_CENTS_CTE},
g AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n_g,
    CAST(sum(cents) AS HUGEINT) * 1000 // count(*) AS m_milli
  FROM j GROUP BY seg
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total,
    CAST(count(DISTINCT seg) AS BIGINT) AS k_groups,
    CAST(sum(cents) AS HUGEINT) * 1000 // count(*) AS gm_milli
  FROM j
),
ssb AS (
  SELECT CAST(sum(n_g * (m_milli - gm_milli) * (m_milli - gm_milli))
    AS HUGEINT) AS ssb
  FROM g CROSS JOIN tot
),
ssw AS (
  SELECT CAST(sum(CAST(cents * 1000 - m_milli AS HUGEINT)
      * (cents * 1000 - m_milli)) AS HUGEINT) AS ssw
  FROM j JOIN g USING (seg)
)
SELECT k_groups, n_total,
  CAST(floor(
    (CAST(ssb AS DOUBLE) / CAST(k_groups - 1 AS DOUBLE))
    / (CAST(ssw AS DOUBLE) / CAST(n_total - k_groups AS DOUBLE))
    * 1000) AS BIGINT) AS f_milli,
  CAST(ssb * 1000000 // (ssb + ssw) AS BIGINT) AS eta2_ppm
FROM tot CROSS JOIN ssb CROSS JOIN ssw
"""


@register("anova_oneway_f", oracle=_ANOVA_ORACLE)
def anova_oneway_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F (milli) + eta² (ppm) on milli-floored means."""
    j = _seg_cents(spark, sf_dir)
    g = j.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.expr(
            "CAST(sum(CAST(cents AS DECIMAL(38,0))) * 1000 div count(*)"
            " AS BIGINT)"
        ).alias("m_milli"),
    )
    tot = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.countDistinct("seg").cast("bigint").alias("k_groups"),
        F.expr(
            "CAST(sum(CAST(cents AS DECIMAL(38,0))) * 1000 div count(*)"
            " AS BIGINT)"
        ).alias("gm_milli"),
    )
    ssb = g.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.expr(
                "n_g * CAST(m_milli - gm_milli AS DECIMAL(38,0))"
                " * (m_milli - gm_milli)"
            )
        ).alias("ssb")
    )
    ssw = j.join(F.broadcast(g), "seg").agg(
        F.sum(
            F.expr(
                "CAST(cents * 1000 - m_milli AS DECIMAL(38,0))"
                " * (cents * 1000 - m_milli)"
            )
        ).alias("ssw")
    )
    return (
        tot.crossJoin(F.broadcast(ssb))
        .crossJoin(F.broadcast(ssw))
        .select(
            "k_groups",
            "n_total",
            F.expr(
                "CAST(floor("
                " (CAST(ssb AS DOUBLE) / CAST(k_groups - 1 AS DOUBLE))"
                " / (CAST(ssw AS DOUBLE) / CAST(n_total - k_groups AS DOUBLE))"
                " * 1000) AS BIGINT)"
            ).alias("f_milli"),
            F.expr("CAST(ssb * 1000000 div (ssb + ssw) AS BIGINT)").alias(
                "eta2_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# brown_forsythe_f — Levene-with-median homogeneity of variance:
# per-group LOWER median (exact integer from the per-group cumulative
# distinct-value table), per-row absolute deviations (exact cents),
# then the same milli-floored-mean one-way F on the deviations.
# ---------------------------------------------------------------------------


@register(
    "brown_forsythe_f",
    oracle=f"""
WITH {_SEG_CENTS_CTE},
dv AS (
  SELECT seg, cents, CAST(count(*) AS BIGINT) AS cnt
  FROM j GROUP BY seg, cents
),
cm AS (
  SELECT seg, cents, cnt,
    CAST(sum(cnt) OVER (PARTITION BY seg ORDER BY cents ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum_through,
    CAST(sum(cnt) OVER (PARTITION BY seg) AS BIGINT) AS n_g
  FROM dv
),
med AS (
  SELECT seg, CAST(min(cents) AS BIGINT) AS med_cents
  FROM cm WHERE cum_through >= (n_g + 1) // 2 GROUP BY seg
),
d AS (
  SELECT seg, abs(cents - med_cents) AS adev
  FROM j JOIN med USING (seg)
),
g AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n_g,
    CAST(sum(adev) AS HUGEINT) * 1000 // count(*) AS m_milli
  FROM d GROUP BY seg
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total,
    CAST(count(DISTINCT seg) AS BIGINT) AS k_groups,
    CAST(sum(adev) AS HUGEINT) * 1000 // count(*) AS gm_milli
  FROM d
),
ssb AS (
  SELECT CAST(sum(n_g * (m_milli - gm_milli) * (m_milli - gm_milli))
    AS HUGEINT) AS ssb
  FROM g CROSS JOIN tot
),
ssw AS (
  SELECT CAST(sum(CAST(adev * 1000 - m_milli AS HUGEINT)
      * (adev * 1000 - m_milli)) AS HUGEINT) AS ssw
  FROM d JOIN g USING (seg)
)
SELECT k_groups, n_total,
  CAST(floor(
    (CAST(ssb AS DOUBLE) / CAST(k_groups - 1 AS DOUBLE))
    / (CAST(ssw AS DOUBLE) / CAST(n_total - k_groups AS DOUBLE))
    * 1000) AS BIGINT) AS f_milli
FROM tot CROSS JOIN ssb CROSS JOIN ssw
""",
)
def brown_forsythe_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe F (milli): ANOVA on |cents − group lower median|."""
    j = _seg_cents(spark, sf_dir)
    dv = j.groupBy("seg", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wseg = (
        Window.partitionBy("seg")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cm = dv.select(
        "seg",
        "cents",
        F.sum("cnt").over(wseg).cast("bigint").alias("cum_through"),
        F.sum("cnt").over(Window.partitionBy("seg")).cast("bigint").alias(
            "n_g"
        ),
    )
    med = (
        cm.filter(F.expr("cum_through >= (n_g + 1) div 2"))
        .groupBy("seg")
        .agg(F.min("cents").cast("bigint").alias("med_cents"))
    )
    d = j.join(F.broadcast(med), "seg").select(
        "seg", F.abs(F.col("cents") - F.col("med_cents")).alias("adev")
    )
    g = d.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.expr(
            "CAST(sum(CAST(adev AS DECIMAL(38,0))) * 1000 div count(*)"
            " AS BIGINT)"
        ).alias("m_milli"),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.countDistinct("seg").cast("bigint").alias("k_groups"),
        F.expr(
            "CAST(sum(CAST(adev AS DECIMAL(38,0))) * 1000 div count(*)"
            " AS BIGINT)"
        ).alias("gm_milli"),
    )
    ssb = g.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.expr(
                "n_g * CAST(m_milli - gm_milli AS DECIMAL(38,0))"
                " * (m_milli - gm_milli)"
            )
        ).alias("ssb")
    )
    ssw = d.join(F.broadcast(g), "seg").agg(
        F.sum(
            F.expr(
                "CAST(adev * 1000 - m_milli AS DECIMAL(38,0))"
                " * (adev * 1000 - m_milli)"
            )
        ).alias("ssw")
    )
    return (
        tot.crossJoin(F.broadcast(ssb))
        .crossJoin(F.broadcast(ssw))
        .select(
            "k_groups",
            "n_total",
            F.expr(
                "CAST(floor("
                " (CAST(ssb AS DOUBLE) / CAST(k_groups - 1 AS DOUBLE))"
                " / (CAST(ssw AS DOUBLE) / CAST(n_total - k_groups AS DOUBLE))"
                " * 1000) AS BIGINT)"
            ).alias("f_milli"),
        )
    )


# ---------------------------------------------------------------------------
# cochran_armitage_trend — is the return rate monotone in quantity?
# Scores s_i = the integer quantity level itself (1..50). z from the
# exact-integer decomposition A = N·Σs·r − R·Σs·n,
# B = N·Σs²·n − (Σs·n)², z = A·√N / √(R(N−R)B) — A and B in
# DECIMAL(38,0)/HUGEINT, one float expression, milli floor.
# ---------------------------------------------------------------------------


@register(
    "cochran_armitage_trend",
    oracle="""
WITH g AS (
  SELECT CAST(l_quantity AS BIGINT) AS s,
    CAST(count(*) AS BIGINT) AS n_i,
    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
      AS r_i
  FROM lineitem GROUP BY 1
),
t AS (
  SELECT CAST(sum(n_i) AS BIGINT) AS n_total,
    CAST(sum(r_i) AS BIGINT) AS n_ret,
    CAST(sum(s * r_i) AS BIGINT) AS ssr,
    CAST(sum(s * n_i) AS BIGINT) AS ssn,
    CAST(sum(s * s * n_i) AS BIGINT) AS ss2n
  FROM g
),
ab AS (
  SELECT n_total, n_ret,
    CAST(n_total AS HUGEINT) * ssr - CAST(n_ret AS HUGEINT) * ssn AS a,
    CAST(n_total AS HUGEINT) * ss2n - CAST(ssn AS HUGEINT) * ssn AS b
  FROM t
)
SELECT n_total, n_ret,
  CAST(floor(CAST(a AS DOUBLE) * sqrt(CAST(n_total AS DOUBLE))
    / sqrt(CAST(n_ret AS DOUBLE) * CAST(n_total - n_ret AS DOUBLE)
           * CAST(b AS DOUBLE))
    * 1000) AS BIGINT) AS z_milli
FROM ab
""",
)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend z (milli) of return rate over quantity."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("s"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    g = li.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum("ret").cast("bigint").alias("r_i"),
    )
    t = g.agg(
        F.sum("n_i").cast("bigint").alias("n_total"),
        F.sum("r_i").cast("bigint").alias("n_ret"),
        F.sum(F.col("s") * F.col("r_i")).cast("bigint").alias("ssr"),
        F.sum(F.col("s") * F.col("n_i")).cast("bigint").alias("ssn"),
        F.sum(F.col("s") * F.col("s") * F.col("n_i"))
        .cast("bigint")
        .alias("ss2n"),
    )
    ab = t.select(
        "n_total",
        "n_ret",
        F.expr(
            "CAST(n_total AS DECIMAL(38,0)) * ssr"
            " - CAST(n_ret AS DECIMAL(38,0)) * ssn"
        ).alias("a"),
        F.expr(
            "CAST(n_total AS DECIMAL(38,0)) * ss2n"
            " - CAST(ssn AS DECIMAL(38,0)) * ssn"
        ).alias("b"),
    )
    return ab.select(
        "n_total",
        "n_ret",
        F.expr(
            "CAST(floor(CAST(a AS DOUBLE) * sqrt(CAST(n_total AS DOUBLE))"
            " / sqrt(CAST(n_ret AS DOUBLE) * CAST(n_total - n_ret AS DOUBLE)"
            "        * CAST(b AS DOUBLE))"
            " * 1000) AS BIGINT)"
        ).alias("z_milli"),
    )


# ---------------------------------------------------------------------------
# kendall_tau_daily — tau-b between daily revenue (exact cents) and
# daily order count over the calendar-day grid. The |days|² pair frame
# is CALENDAR-bounded (~2.4k days at EVERY SF → ≤ ~3M pairs), formed
# as a broadcast self-join on day < day; concordant/discordant/tie
# counts are exact integers; tau_b is one float expression (milli).
# ---------------------------------------------------------------------------


@register(
    "kendall_tau_daily",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
    CAST(count(*) AS BIGINT) AS n_orders,
    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      AS cents
  FROM orders GROUP BY 1
),
p AS (
  SELECT
    CAST(count(*) AS BIGINT) AS n_pairs,
    CAST(sum(CASE WHEN (a.cents < b.cents AND a.n_orders < b.n_orders)
                    OR (a.cents > b.cents AND a.n_orders > b.n_orders)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
    CAST(sum(CASE WHEN (a.cents < b.cents AND a.n_orders > b.n_orders)
                    OR (a.cents > b.cents AND a.n_orders < b.n_orders)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_d,
    CAST(sum(CASE WHEN a.cents = b.cents THEN 1 ELSE 0 END) AS BIGINT)
      AS tie_x,
    CAST(sum(CASE WHEN a.n_orders = b.n_orders THEN 1 ELSE 0 END)
      AS BIGINT) AS tie_y
  FROM d a JOIN d b ON a.day < b.day
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM d)
SELECT n_days, n_c AS n_concordant, n_d AS n_discordant,
  CAST(floor(CAST(n_c - n_d AS DOUBLE)
    / sqrt(CAST(n_pairs - tie_x AS DOUBLE)
           * CAST(n_pairs - tie_y AS DOUBLE))
    * 1000) AS BIGINT) AS tau_b_milli
FROM p CROSS JOIN n
""",
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b (milli) of daily revenue vs daily order count."""
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )
    )
    # Spread the |days|² BNLJ pair former across the executor threads:
    # AQE coalesces the ~2.4k-row day-grain aggregate to one partition,
    # which would put all ~3M predicate evaluations on a single task
    # (r7 VERDICT item 6) — a fixed 32-way repartition of the stream
    # side fans the nested loop out while the broadcast side stays one
    # copy per thread.
    a = d.repartition(32, "day").select(
        F.col("day").alias("day_a"),
        F.col("n_orders").alias("na"),
        F.col("cents").alias("ca"),
    )
    b = d.select(
        F.col("day").alias("day_b"),
        F.col("n_orders").alias("nb"),
        F.col("cents").alias("cb"),
    )
    p = (
        a.join(F.broadcast(b), F.col("day_a") < F.col("day_b"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(
                F.when(
                    ((F.col("ca") < F.col("cb")) & (F.col("na") < F.col("nb")))
                    | (
                        (F.col("ca") > F.col("cb"))
                        & (F.col("na") > F.col("nb"))
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_c"),
            F.sum(
                F.when(
                    ((F.col("ca") < F.col("cb")) & (F.col("na") > F.col("nb")))
                    | (
                        (F.col("ca") > F.col("cb"))
                        & (F.col("na") < F.col("nb"))
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_d"),
            F.sum(F.when(F.col("ca") == F.col("cb"), 1).otherwise(0))
            .cast("bigint")
            .alias("tie_x"),
            F.sum(F.when(F.col("na") == F.col("nb"), 1).otherwise(0))
            .cast("bigint")
            .alias("tie_y"),
        )
    )
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return p.crossJoin(F.broadcast(n)).select(
        "n_days",
        F.col("n_c").alias("n_concordant"),
        F.col("n_d").alias("n_discordant"),
        F.expr(
            "CAST(floor(CAST(n_c - n_d AS DOUBLE)"
            " / sqrt(CAST(n_pairs - tie_x AS DOUBLE)"
            "        * CAST(n_pairs - tie_y AS DOUBLE))"
            " * 1000) AS BIGINT)"
        ).alias("tau_b_milli"),
    )
