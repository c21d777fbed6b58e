"""Round-9 classical-test operators: Mann-Kendall, Bartlett, χ² GOF,
paired sign test, Cohen's kappa.

Reference parity: the reference's comparison/diversity endpoints
(public path ``bpaotu/otu/views.py``) ship distributional summaries to
the frontend; these operators extend the engine's hypothesis-test
family (Kruskal-Wallis, ANOVA, Friedman, … — SURVEY.md §2) with the
remaining standard tests an analyst expects from a stats-capable
engine.

* ``mann_kendall_trend`` — the nonparametric trend test on daily
  revenue: S = Σ_{i<j} sign(x_j − x_i) with the tie-corrected
  variance 18·Var = n(n−1)(2n+5) − Σ t(t−1)(2t+5). Everything
  integer except the final continuity-corrected z (milli-floored).
* ``bartlett_test_variances`` — Bartlett's M for variance homogeneity
  of order totals across order priorities: per-group SSE is exact
  integer (n·Σx² − (Σx)²), per-group (n−1)·ln(S²) terms are floored
  micro-nats (the repo's ln convention), and the pooled term is one
  float expression over exact integers.
* ``chi2_gof_weekday`` — uniformity χ² of order volume over the
  7 epoch-anchored weekdays, fully exact: χ²·µ = Σ(7·o − N)²·10⁶
  div (7N) — no floats at all.
* ``sign_test_paired_months`` — paired sign test on consecutive-month
  revenue deltas per nation (pos/neg/tie counts exact, z milli).
* ``quality_rater_kappa`` — Cohen's κ between two deterministic
  document-quality raters (length ≥ 200 chars vs distinct-token
  ratio ≥ 55%): the agreement audit a labeling pipeline runs on its
  heuristic filters; κ in exact ppm (sign-split integer division).

Weekday convention: ((days since 1970-01-01) % 7) — 1970-01-01 was a
Thursday; 0 = Thu. Chosen over dayofweek()/isodow() because the two
engines disagree on week-start conventions; epoch arithmetic they
share exactly.

Scale shape: each test is one map-combined aggregation over the fact
scan plus constant-size tail math. The Mann-Kendall pair join is over
the CALENDAR-bounded daily series (≤ ~2.6k rows at every SF — TPC-H
dates span 7 fixed years), broadcast-joined, ~3M pairs worst case.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table, maybe_broadcast
from bpaotu_spark.registry import register

_DAILY_CTE = """
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
)
""".strip()


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )


# ---------------------------------------------------------------------------
# mann_kendall_trend
# ---------------------------------------------------------------------------


@register(
    "mann_kendall_trend",
    oracle=f"""
WITH {_DAILY_CTE},
s AS (
  SELECT CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                       WHEN b.cents < a.cents THEN -1 ELSE 0 END)
         AS BIGINT) AS s_stat
  FROM daily a JOIN daily b ON b.d > a.d
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
ties AS (
  SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
    AS tie_term
  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY cents)
  WHERE t > 1
)
SELECT n_days, s_stat,
  CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS BIGINT)
    AS var18,
  CAST(floor(
    CASE WHEN s_stat > 0 THEN (s_stat - 1)
         WHEN s_stat < 0 THEN (s_stat + 1)
         ELSE 0 END
    / sqrt((n_days * (n_days - 1) * (2 * n_days + 5) - tie_term)
           / 18.0) * 1000) AS BIGINT) AS z_milli
FROM n CROSS JOIN s CROSS JOIN ties
""",
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on daily revenue (exact S and 18·Var,
    milli continuity-corrected z)."""
    daily = _daily(spark, sf_dir)
    a = daily.select(F.col("d").alias("da"), F.col("cents").alias("ca"))
    b = daily.select(F.col("d").alias("db"), F.col("cents").alias("cb"))
    # calendar-bounded pair join (≤ ~2.6k days at every SF)
    s = (
        a.join(F.broadcast(b), F.col("db") > F.col("da"))
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN cb > ca THEN 1 WHEN cb < ca THEN -1"
                    " ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    ties = (
        daily.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter("t > 1")
        .agg(
            F.coalesce(
                F.sum(F.expr("t * (t - 1) * (2 * t + 5)")), F.lit(0)
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    return (
        n.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .select(
            "n_days",
            "s_stat",
            F.expr(
                "CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term"
                " AS BIGINT)"
            ).alias("var18"),
            F.expr(
                "CAST(floor("
                " CASE WHEN s_stat > 0 THEN (s_stat - 1)"
                "      WHEN s_stat < 0 THEN (s_stat + 1)"
                "      ELSE 0 END"
                " / sqrt((n_days * (n_days - 1) * (2 * n_days + 5)"
                "         - tie_term) / 18.0) * 1000) AS BIGINT)"
            ).alias("z_milli"),
        )
    )


# ---------------------------------------------------------------------------
# bartlett_test_variances
# ---------------------------------------------------------------------------


@register(
    "bartlett_test_variances",
    oracle="""
WITH x AS (
  SELECT o_orderpriority AS grp,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
g AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(c) AS HUGEINT) AS s,
    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss
  FROM x GROUP BY grp
),
t AS (
  SELECT grp, n,
    -- sse stays HUGEINT: one group's SSE is ~n·var(cents) ≈ 3e18 at
    -- sf0.1 already; the cross-group sum below overflows BIGINT
    CAST((n * ss - s * s) // n AS HUGEINT) AS sse_floor,
    CAST(floor((n - 1) * ln(CAST(n * ss - s * s AS DOUBLE)
        / (CAST(n AS DOUBLE) * (n - 1))) * 1000000) AS BIGINT)
      AS term_micro
  FROM g WHERE n > 1
)
SELECT CAST(count(*) AS BIGINT) AS k_groups,
  CAST(sum(n) AS BIGINT) AS n_total,
  CAST(floor((sum(n) - count(*))
      * ln(CAST(sum(sse_floor) AS DOUBLE)
           / (CAST(sum(n) AS DOUBLE) - count(*))) * 1000000) AS BIGINT)
    - CAST(sum(term_micro) AS BIGINT) AS m_stat_micro
FROM t
""",
)
def bartlett_test_variances(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bartlett's M (uncorrected) for order-total variance homogeneity
    across order priorities — exact integer SSEs, floored-micro ln
    terms (the repo's ln convention)."""
    x = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )
    g = x.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("decimal(38,0)").alias("s"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("ss"),
    )
    t = g.filter("n > 1").select(
        "grp",
        "n",
        # DECIMAL(38,0), not BIGINT: one group's SSE ≈ 3e18 at sf0.1
        # and the cross-group sum overflows int64 (caught by the r9
        # sf0.1 bench under ANSI mode)
        F.expr("CAST((n * ss - s * s) div n AS DECIMAL(38,0))").alias(
            "sse_floor"
        ),
        F.expr(
            "CAST(floor((n - 1) * ln(CAST(n * ss - s * s AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * (n - 1))) * 1000000) AS BIGINT)"
        ).alias("term_micro"),
    )
    return t.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        F.sum("n").cast("bigint").alias("n_total"),
        (
            F.expr(
                "CAST(floor((sum(n) - count(*))"
                " * ln(CAST(sum(sse_floor) AS DOUBLE)"
                "      / (CAST(sum(n) AS DOUBLE) - count(*))) * 1000000)"
                " AS BIGINT)"
            )
            - F.sum("term_micro").cast("bigint")
        ).alias("m_stat_micro"),
    )


# ---------------------------------------------------------------------------
# chi2_gof_weekday
# ---------------------------------------------------------------------------


@register(
    "chi2_gof_weekday",
    oracle="""
WITH w AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
    % 7 AS wd
  FROM orders
),
o AS (SELECT wd, CAST(count(*) AS BIGINT) AS obs FROM w GROUP BY wd),
n AS (SELECT CAST(sum(obs) AS BIGINT) AS n_orders FROM o)
SELECT n_orders,
  CAST(CAST(sum(CAST(7 * obs - n_orders AS HUGEINT)
           * (7 * obs - n_orders)) AS HUGEINT) * 1000000
       // (7 * n_orders) AS BIGINT) AS chi2_micro,
  CAST(6 AS BIGINT) AS df
FROM o CROSS JOIN n GROUP BY n_orders
""",
)
def chi2_gof_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer χ² for weekday-uniform order volume: χ²·10⁶ =
    Σ(7·obs − N)²·10⁶ div (7N). Epoch-anchored weekday (0 = Thu)."""
    w = load_table(spark, sf_dir, "orders").select(
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') % 7"
        ).alias("wd")
    )
    o = w.groupBy("wd").agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    n = o.agg(F.sum("obs").cast("bigint").alias("n_orders"))
    return (
        o.crossJoin(F.broadcast(n))
        .groupBy("n_orders")
        .agg(
            F.expr(
                "CAST(sum(CAST(7 * obs - n_orders AS DECIMAL(38,0))"
                " * (7 * obs - n_orders))"
                " * 1000000 div (7 * n_orders) AS BIGINT)"
            ).alias("chi2_micro"),
        )
        .select("n_orders", "chi2_micro", F.lit(6).cast("bigint").alias("df"))
    )


# ---------------------------------------------------------------------------
# sign_test_paired_months
# ---------------------------------------------------------------------------


@register(
    "sign_test_paired_months",
    oracle="""
WITH m AS (
  SELECT n_name,
    date_trunc('month', CAST(o_orderdate AS DATE)) AS mon,
    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
p AS (
  SELECT n_name, cents,
    lead(cents) OVER (PARTITION BY n_name ORDER BY mon) AS nxt
  FROM m
),
c AS (
  SELECT n_name,
    CAST(sum(CASE WHEN nxt > cents THEN 1 ELSE 0 END) AS BIGINT)
      AS n_pos,
    CAST(sum(CASE WHEN nxt < cents THEN 1 ELSE 0 END) AS BIGINT)
      AS n_neg,
    CAST(sum(CASE WHEN nxt = cents THEN 1 ELSE 0 END) AS BIGINT)
      AS n_tie
  FROM p WHERE nxt IS NOT NULL GROUP BY n_name
)
SELECT n_name, n_pos, n_neg, n_tie,
  CASE WHEN n_pos + n_neg > 0 THEN
    CAST(floor((n_pos - n_neg) / sqrt(CAST(n_pos + n_neg AS DOUBLE))
         * 1000) AS BIGINT)
  ELSE 0 END AS z_milli
FROM c ORDER BY n_name
""",
)
def sign_test_paired_months(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Paired sign test on consecutive-month revenue deltas per
    nation (exact counts; z milli)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    m = (
        orders.join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.date_trunc("month", F.col("o_orderdate").cast("date")).alias(
                "mon"
            ),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    w = Window.partitionBy("n_name").orderBy("mon")
    p = m.select(
        "n_name", "cents", F.lead("cents").over(w).alias("nxt")
    ).filter("nxt IS NOT NULL")
    c = p.groupBy("n_name").agg(
        F.sum(F.expr("CASE WHEN nxt > cents THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.expr("CASE WHEN nxt < cents THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_neg"),
        F.sum(F.expr("CASE WHEN nxt = cents THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_tie"),
    )
    return c.select(
        "n_name",
        "n_pos",
        "n_neg",
        "n_tie",
        F.expr(
            "CASE WHEN n_pos + n_neg > 0 THEN"
            " CAST(floor((n_pos - n_neg)"
            " / sqrt(CAST(n_pos + n_neg AS DOUBLE)) * 1000) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("z_milli"),
    ).orderBy("n_name")


# ---------------------------------------------------------------------------
# quality_rater_kappa
# ---------------------------------------------------------------------------

_KAPPA_LEN = 200  # rater A: document length threshold (chars)
_KAPPA_PCT = 55  # rater B: distinct-token percentage threshold


@register(
    "quality_rater_kappa",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, n_chars,
    CAST(len(t) AS BIGINT) AS n_tok,
    CAST(len(list_distinct(t)) AS BIGINT) AS n_dis
  FROM (
    SELECT doc_id, n_chars,
      string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ',
        'g')), ' ') AS t
    FROM documents
  )
),
r AS (
  SELECT
    CASE WHEN n_chars >= {_KAPPA_LEN} THEN 1 ELSE 0 END AS ra,
    CASE WHEN 100 * n_dis >= {_KAPPA_PCT} * n_tok THEN 1 ELSE 0 END AS rb
  FROM toks
),
cells AS (
  SELECT
    CAST(sum(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS yes_yes,
    CAST(sum(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS yes_no,
    CAST(sum(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS no_yes,
    CAST(sum(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS no_no
  FROM r
)
SELECT yes_yes, yes_no, no_yes, no_no,
  CASE WHEN n * n = pe_num THEN CAST(0 AS BIGINT) ELSE
    CAST(CASE WHEN (yes_yes + no_no) * n - pe_num < 0 THEN -1 ELSE 1 END
      * (abs((yes_yes + no_no) * n - pe_num) * 1000000
         // (n * n - pe_num)) AS BIGINT)
  END AS kappa_ppm
FROM (
  SELECT *,
    CAST(yes_yes + yes_no + no_yes + no_no AS HUGEINT) AS n,
    CAST(yes_yes + yes_no AS HUGEINT) * (yes_yes + no_yes)
      + CAST(no_yes + no_no AS HUGEINT) * (yes_no + no_no) AS pe_num
  FROM cells
)
""",
)
def quality_rater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ (exact ppm) between the length rater (n_chars ≥ 200)
    and the lexical-diversity rater (distinct tokens ≥ 55%)."""
    from bpaotu_spark.functions.textops import tokenize

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "n_chars", tokenize(F.col("text")).alias("t")
    ).select(
        "n_chars",
        F.size("t").cast("bigint").alias("n_tok"),
        F.size(F.array_distinct("t")).cast("bigint").alias("n_dis"),
    )
    r = t.select(
        F.expr(
            f"CASE WHEN n_chars >= {_KAPPA_LEN} THEN 1 ELSE 0 END"
        ).alias("ra"),
        F.expr(
            f"CASE WHEN 100 * n_dis >= {_KAPPA_PCT} * n_tok THEN 1"
            " ELSE 0 END"
        ).alias("rb"),
    )
    cells = r.agg(
        F.sum(F.expr("CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("yes_yes"),
        F.sum(F.expr("CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("yes_no"),
        F.sum(F.expr("CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("no_yes"),
        F.sum(F.expr("CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("no_no"),
    )
    aug = cells.withColumn(
        "n",
        F.expr(
            "CAST(yes_yes + yes_no + no_yes + no_no AS DECIMAL(38,0))"
        ),
    ).withColumn(
        "pe_num",
        F.expr(
            "CAST(yes_yes + yes_no AS DECIMAL(38,0)) * (yes_yes + no_yes)"
            " + CAST(no_yes + no_no AS DECIMAL(38,0)) * (yes_no + no_no)"
        ),
    )
    return aug.select(
        "yes_yes",
        "yes_no",
        "no_yes",
        "no_no",
        F.expr(
            "CASE WHEN n * n = pe_num THEN CAST(0 AS BIGINT) ELSE"
            " CAST(CASE WHEN (yes_yes + no_no) * n - pe_num < 0"
            "   THEN -1 ELSE 1 END"
            " * (abs((yes_yes + no_no) * n - pe_num) * 1000000"
            "    div (n * n - pe_num)) AS BIGINT) END"
        ).alias("kappa_ppm"),
    )


# ---------------------------------------------------------------------------
# orders_durbin_watson — Durbin-Watson serial-correlation statistic on
# the daily revenue series: DW = Σ(eₜ−eₜ₋₁)² / Σeₜ² over mean
# residuals. DW ≈ 2 means no lag-1 autocorrelation; < 2 positive
# (momentum), > 2 negative (mean reversion) — the one-number check a
# forecasting pipeline runs before assuming i.i.d. residuals
# (complements daily_acf_lags, which reports the correlogram).
#
# Exactness: daily revenue in floor-cents (BIGINT); residuals scaled
# by n (eₜ' = n·rₜ − Σr — exact integers, the n² factor cancels in
# the ratio); squares/sums in 128-bit (n·r ~ 2e12 at sf0.1, squared
# sums ~1e28 — int64 would overflow, the bartlett lesson applied at
# design time). Output is floor-milli.
#
# Scale shape: one map-combined daily aggregate, one 1-row stat
# scalar broadcast back, one ORDER BY d window over the
# calendar-bounded daily frame (≤ ~2.6k rows at any SF).
# ---------------------------------------------------------------------------


@register(
    "orders_durbin_watson",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS r
  FROM orders GROUP BY 1
),
st AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(r) AS BIGINT) AS tot FROM daily),
e AS (
  SELECT d, CAST(n * r - tot AS BIGINT) AS ee,
    lag(CAST(n * r - tot AS BIGINT)) OVER (ORDER BY d) AS pe
  FROM daily, st
),
agg AS (
  SELECT
    CAST(sum(CAST(ee AS HUGEINT) * ee) AS HUGEINT) AS den,
    CAST(sum(CASE WHEN pe IS NULL THEN 0
              ELSE CAST(ee - pe AS HUGEINT) * (ee - pe) END)
      AS HUGEINT) AS num
  FROM e
)
SELECT (SELECT n FROM st) AS n_days,
  CAST(num * 1000 // greatest(den, 1) AS BIGINT) AS dw_milli
FROM agg
""",
)
def orders_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson on daily revenue mean-residuals: (n_days,
    dw_milli), exact floor-cents integer arithmetic throughout."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("r")
        )
    )
    st = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("bigint").alias("tot"),
    )
    w = Window.orderBy("d")
    e = (
        daily.crossJoin(F.broadcast(st))
        .select("d", F.expr("CAST(n * r - tot AS BIGINT)").alias("ee"), "n")
        .withColumn("pe", F.lag("ee").over(w))
    )
    return e.agg(
        F.max("n").alias("n_days"),
        F.expr(
            "CAST(sum(CASE WHEN pe IS NULL THEN CAST(0 AS DECIMAL(38,0))"
            " ELSE CAST(ee - pe AS DECIMAL(38,0)) * (ee - pe) END) * 1000"
            " div greatest(sum(CAST(ee AS DECIMAL(38,0)) * ee), 1)"
            " AS BIGINT)"
        ).alias("dw_milli"),
    )


# ---------------------------------------------------------------------------
# order_value_poisson_bootstrap — the distributed (Poisson) bootstrap:
# every order draws, per replicate b, a weight w ~ Poisson(1) from a
# 60-bit md5(orderkey:b) grid; Σw·x over one pass per replicate gives
# B resampled totals whose spread IS the sampling distribution of the
# statistic — the bootstrap a 100-TB pipeline can actually run (no
# resample materialization, no sequential RNG, map-side combinable,
# rerun-stable). This is the replicate table; the caller derives the
# CI from the replicate means (Chamandy et al., "Estimating Uncertainty
# for Massive Data Streams", the Poisson-bootstrap standard).
#
# Determinism: the weight is a pure INTEGER comparison of the 60-bit
# hash against Poisson(1) CDF thresholds precomputed in Python and
# embedded as literals in both engines — no doubles anywhere in the
# draw; outputs are exact cents with floor-div means.
#
# Scale shape: B=32 replicate rows per order via one explode, one
# groupBy(replicate) with map-side combine — shuffle carries 32 rows
# per task.
# ---------------------------------------------------------------------------

import math as _math

_BOOT_B = 32
_POIS_T = []
_c = 0.0
for _k in range(8):
    _c += _math.exp(-1) / _math.factorial(_k)
    _POIS_T.append(int(_math.floor(_c * (1 << 60))))  # cum-CDF * 2^60


def _pois_case(hv: str) -> str:
    """SQL: Poisson(1) draw from the 60-bit hash (integer thresholds,
    capped at 8)."""
    whens = " ".join(
        f"WHEN {hv} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"(CASE {whens} ELSE 8 END)"


_BOOT_HASH_SQL = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)"
    f" || ':' || CAST(b AS VARCHAR)), {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
    for i in range(15)
)


@register(
    "order_value_poisson_bootstrap",
    oracle=f"""
WITH reps AS (SELECT unnest(range({_BOOT_B})) AS b),
h AS (
  SELECT b, CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
    {_pois_case(f"({_BOOT_HASH_SQL})")} AS w
  FROM orders CROSS JOIN reps
)
SELECT CAST(b AS BIGINT) AS replicate_id,
  CAST(sum(w) AS BIGINT) AS n_eff,
  CAST(sum(w * cents) AS BIGINT) AS total_cents,
  CAST(sum(w * cents) // greatest(sum(w), 1) AS BIGINT) AS mean_cents
FROM h GROUP BY b ORDER BY replicate_id
""",
)
def order_value_poisson_bootstrap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """B=32 Poisson-bootstrap replicates of total/mean order value:
    (replicate_id, n_eff, total_cents, mean_cents) — exact integers;
    the replicate spread is the statistic's sampling distribution."""
    reps = spark.range(_BOOT_B).select(
        F.col("id").cast("int").alias("b")
    )
    hv = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("o_orderkey").cast("string"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
    )
    # materialize the md5-derived draw ONCE per (order, replicate) —
    # the 8-branch CASE below references it 9 times, and inlining the
    # expression re-evaluates md5+conv per branch (the nested-CASE
    # chain defeats conditional subexpression elimination; same-JVM
    # interleaved A/B at sf0.1: inline 9.8-11.6 s vs materialized
    # 5.3-5.9 s, best-of-3 each)
    whens = F.lit(8)
    for k, t in reversed(list(enumerate(_POIS_T))):
        whens = F.when(F.col("hv") < t, k).otherwise(whens)
    # widen the single-row-group scan before the 32-way replicate
    # fan-out: the md5+conv draw over |orders|·B rows is the query's
    # whole cost and otherwise runs in ONE task (guide §2.5; r15
    # scaling ratio 1.05 at 8→32 cores). The exchange carries only
    # (o_orderkey, cents); at scale the scan is already parallel and
    # widen_scan inserts nothing.
    from bpaotu_spark.catalog import widen_scan

    h = (
        widen_scan(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey",
                F.floor(F.col("o_totalprice") * 100)
                .cast("bigint")
                .alias("cents"),
            ),
            "o_orderkey",
        )
        .crossJoin(F.broadcast(reps))
        .select("b", "cents", hv.alias("hv"))
        .select("b", "cents", whens.alias("w"))
    )
    return (
        h.groupBy(F.col("b").cast("bigint").alias("replicate_id"))
        .agg(
            F.sum("w").cast("bigint").alias("n_eff"),
            F.sum(F.expr("w * cents")).cast("bigint").alias("total_cents"),
            F.expr(
                "CAST(sum(w * cents) div greatest(sum(w), 1) AS BIGINT)"
            ).alias("mean_cents"),
        )
        .orderBy("replicate_id")
    )
