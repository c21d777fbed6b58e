"""Ordered-sequence operators over the events/orders streams.

Three operators for the "state over time" query family the reference's
SQL pages cannot express but every event warehouse needs:

- :func:`window_funnel_strict` — ClickHouse-``windowFunnel``-style
  strict-order funnel: each step must occur STRICTLY after the
  previous one and the whole chain must fit in a 24 h window anchored
  at the first step. Complements ``funnel_conversion`` (unbounded
  window, ``>=`` ordering).
- :func:`scd2_user_state_intervals` — batch build of a slowly-changing
  dimension (SCD type 2) from an event log: collapse each user's
  consecutive same-type events into validity intervals
  ``[valid_from, valid_to)``, open-ended for the current state. The
  batch twin of the streaming CDC→SCD2 job in streaming/jobs.py.
- :func:`revenue_cusum_changepoint` — CUSUM changepoint scan over the
  daily revenue series (Page 1954): the date maximizing the absolute
  centered cumulative sum, per year. Division-free integer form:
  ``S'_i = n·prefix_i − i·total`` equals ``n ×`` the classical
  ``Σ(x_j − mean)``, so argmax is identical and every intermediate is
  exact BIGINT.

Scale notes: all three are single-scan plans whose only wide exchange
is keyed by the natural partition key (user_id / year); windows are
partitioned by that same key so no global sort exists. At 1000× the
CUSUM intermediates (n·prefix with cents precision) approach int64 —
move to whole-currency units there; the structure is unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register

# ---------------------------------------------------------------------------
# window_funnel_strict — signup → view → purchase, strictly ordered,
# all within 24 h of the signup.
#
# Same chained-aggregation shape as funnel_conversion: each stage is a
# per-user min() over a filtered scan joined to the previous stage's
# head — no windows over the fact, joins keyed on user_id reuse the
# groupBy exchange. The differences ARE the semantics: strict ``>``
# (same-timestamp events do not satisfy the next step) and the
# ``t1 + 24h`` deadline applied to every later step.
# ---------------------------------------------------------------------------

_FUNNEL_WINDOW_H = 24


@register(
    "window_funnel_strict",
    oracle=f"""
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(s1.t1) AS t1, min(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'view' AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL {_FUNNEL_WINDOW_H} HOUR
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND e.ts <= s2.t1 + INTERVAL {_FUNNEL_WINDOW_H} HOUR
  GROUP BY e.user_id
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_signup,
  (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_view_24h,
  (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase_24h
""",
)
def window_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order 24 h funnel counts (one row).

    ``min(t1)`` in s2 is free (t1 is constant per user) and keeps the
    deadline column available to s3 without a second join back to s1.
    """
    ev = load_table(spark, sf_dir, "events")
    deadline = F.col("t1") + F.expr(f"INTERVAL {_FUNNEL_WINDOW_H} HOURS")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("t1").alias("t1"), F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_view_24h")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchase_24h")))
    )


# ---------------------------------------------------------------------------
# scd2_user_state_intervals — event log → SCD2 validity intervals.
#
# Determinism: the per-user order is (ts, event_id) — event_id is
# unique, so the interval numbering is a total order in both engines.
# valid_to = next interval's valid_from (NULL for the open current
# state), the half-open convention every SCD2 dimension uses.
# ---------------------------------------------------------------------------


@register(
    "scd2_user_state_intervals",
    oracle="""
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN lag(event_type) OVER w IS NULL
              OR lag(event_type) OVER w <> event_type
         THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), iv AS (
  SELECT user_id, ts, event_type,
    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS interval_seq
  FROM e
), g AS (
  SELECT user_id, interval_seq, event_type AS state,
    min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
  FROM iv GROUP BY user_id, interval_seq, event_type
)
SELECT user_id, interval_seq, state, valid_from,
  lead(valid_from) OVER (PARTITION BY user_id ORDER BY interval_seq)
    AS valid_to,
  n_events
FROM g
""",
)
def scd2_user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse each user's event stream into SCD2 state intervals.

    One shuffle on user_id serves every window and the groupBy (the
    exchanges align); output is one row per state CHANGE, not per
    event — the compression SCD2 exists for. On a cluster this is the
    standard "rebuild dimension from log" batch job; the streaming
    twin maintains the same table incrementally with
    applyInPandasWithState.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type"))
    ).cast("long")
    iv = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.sum(chg)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("interval_seq"),
    )
    g = iv.groupBy(
        "user_id", "interval_seq", F.col("event_type").alias("state")
    ).agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("interval_seq")
    return g.select(
        "user_id",
        "interval_seq",
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# revenue_cusum_changepoint — per-year CUSUM scan over daily revenue.
#
# x_d = Σ round(o_totalprice·100) per day (cents; round() is a per-row
# double op, bit-identical across engines). The centered cusum is kept
# division-free as S'_i = n·prefix_i − i·total, so the argmax row and
# the reported max deviation (÷n floored back to cents) are exact
# integers end to end.
# ---------------------------------------------------------------------------


@register(
    "revenue_cusum_changepoint",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
    CAST(year(o_orderdate) AS BIGINT) AS year,
    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY 1, 2
), s AS (
  SELECT year, day,
    CAST(sum(x) OVER (PARTITION BY year ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS prefix,
    CAST(row_number() OVER (PARTITION BY year ORDER BY day) AS BIGINT)
      AS i,
    CAST(sum(x) OVER (PARTITION BY year) AS BIGINT) AS total,
    CAST(count(*) OVER (PARTITION BY year) AS BIGINT) AS n_days
  FROM d
), dev AS (
  SELECT year, day, n_days, n_days * prefix - i * total AS s_i FROM s
), pick AS (
  SELECT year, day, n_days, s_i,
    row_number() OVER (PARTITION BY year ORDER BY abs(s_i) DESC, day)
      AS rk
  FROM dev
)
SELECT year, n_days, day AS cp_date,
  abs(s_i) // n_days AS max_dev_cents,
  CAST(CASE WHEN s_i >= 0 THEN 1 ELSE -1 END AS BIGINT) AS side
FROM pick WHERE rk = 1
""",
)
def revenue_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongest revenue changepoint per year (CUSUM argmax).

    The windows are all partitioned by year over one row per day
    (≤366 rows per partition regardless of order volume) — the heavy
    lifting is the map-side-combined daily aggregation. ``side`` says
    whether revenue ran above (+1) or below (−1) the yearly mean
    before the changepoint.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.to_date("o_orderdate").alias("day"),
        F.year("o_orderdate").cast("bigint").alias("year"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("x")
    )
    wy = Window.partitionBy("year")
    worder = wy.orderBy("day")
    s = d.select(
        "year",
        "day",
        F.sum("x")
        .over(worder.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("prefix"),
        F.row_number().over(worder).cast("bigint").alias("i"),
        F.sum("x").over(wy).alias("total"),
        F.count(F.lit(1)).over(wy).alias("n_days"),
    )
    dev = s.select(
        "year",
        "day",
        "n_days",
        (F.col("n_days") * F.col("prefix") - F.col("i") * F.col("total")).alias(
            "s_i"
        ),
    )
    rk = F.row_number().over(
        Window.partitionBy("year").orderBy(F.abs(F.col("s_i")).desc(), "day")
    )
    return (
        dev.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "year",
            "n_days",
            F.col("day").alias("cp_date"),
            F.expr("abs(s_i) div n_days").alias("max_dev_cents"),
            F.when(F.col("s_i") >= 0, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("bigint")
            .alias("side"),
        )
    )


# ---------------------------------------------------------------------------
# scd2_containment_audit — temporal-containment join audit: assign
# every event back to its user's SCD2 validity interval (user-keyed
# equi join + half-open ts range predicate) and verify the interval's
# recorded n_events equals the events it actually contains. The
# consistency check every SCD2 dimension build ships with — and the
# interval-containment join shape (equi key + range residual, NOT a
# nested loop: the shuffle keys on user_id and the range predicate
# filters within the key group) that point-in-time lookups use.
# ---------------------------------------------------------------------------


@register(
    "scd2_containment_audit",
    oracle="""
WITH iv AS (
  SELECT user_id, interval_seq, state, valid_from, valid_to, n_events
  FROM (
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
        CASE WHEN lag(event_type) OVER w IS NULL
                  OR lag(event_type) OVER w <> event_type
             THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), ivs AS (
      SELECT user_id, ts, event_type,
        CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS interval_seq
      FROM e
    ), g AS (
      SELECT user_id, interval_seq, event_type AS state,
        min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
      FROM ivs GROUP BY user_id, interval_seq, event_type
    )
    SELECT user_id, interval_seq, state, valid_from,
      lead(valid_from) OVER (PARTITION BY user_id ORDER BY interval_seq)
        AS valid_to,
      n_events
    FROM g
  )
), contained AS (
  SELECT iv.user_id, iv.interval_seq,
    CAST(count(*) AS BIGINT) AS n_contained,
    CAST(count(CASE WHEN e.event_type = iv.state THEN 1 END) AS BIGINT)
      AS n_state_match
  FROM iv JOIN events e
    ON e.user_id = iv.user_id
   AND e.ts >= iv.valid_from
   AND (iv.valid_to IS NULL OR e.ts < iv.valid_to)
  GROUP BY iv.user_id, iv.interval_seq
)
SELECT
  CAST(count(*) AS BIGINT) AS n_intervals,
  CAST(sum(iv.n_events) AS BIGINT) AS n_events_recorded,
  CAST(sum(c.n_contained) AS BIGINT) AS n_events_contained,
  CAST(count(CASE WHEN c.n_contained = iv.n_events
                   AND c.n_state_match = iv.n_events THEN 1 END)
    AS BIGINT) AS n_intervals_consistent
FROM iv JOIN contained c
  ON iv.user_id = c.user_id AND iv.interval_seq = c.interval_seq
""",
)
def scd2_containment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row audit: does every interval contain exactly its events?

    Composes the registered SCD2 build (same Spark plan), joins events
    back by (user_id equi + half-open ts containment), and reports
    interval-level consistency. On consistent data
    n_intervals_consistent == n_intervals and the two event totals
    agree — the audit exists to catch when they don't.
    """
    from bpaotu_spark.registry import QUERIES

    iv = QUERIES["scd2_user_state_intervals"](spark, sf_dir)
    iv = iv.localCheckpoint()  # feeds the join AND the final totals
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    joined = ev.join(
        iv,
        (ev.user_id == iv.user_id)
        & (ev.ts >= iv.valid_from)
        & (iv.valid_to.isNull() | (ev.ts < iv.valid_to)),
    )
    contained = joined.groupBy(iv.user_id, iv.interval_seq).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_contained"),
        F.count(F.when(ev.event_type == iv.state, F.lit(1)))
        .cast("bigint")
        .alias("n_state_match"),
    )
    audit = iv.join(contained, ["user_id", "interval_seq"])
    ok = (F.col("n_contained") == F.col("n_events")) & (
        F.col("n_state_match") == F.col("n_events")
    )
    return audit.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum("n_events").cast("bigint").alias("n_events_recorded"),
        F.sum("n_contained").cast("bigint").alias("n_events_contained"),
        F.count(F.when(ok, F.lit(1)))
        .cast("bigint")
        .alias("n_intervals_consistent"),
    )


# ---------------------------------------------------------------------------
# scd2_dwell_time_stats — per-state dwell-time distribution of the
# SCD2 intervals (how long does a user stay in each state before
# switching): count, mean, and EXACT median dwell seconds per state.
# The lifecycle metric a state-machine product ships next to the SCD2
# table itself; open (current) intervals have no dwell and are counted
# separately.
#
# Scale shape: composes the registered SCD2 build; dwell stats are a
# state-keyed groupBy, and the exact median ranks within each state
# partition (|states| independent partitions — the value-bounded
# window contract).
# ---------------------------------------------------------------------------


@register(
    "scd2_dwell_time_stats",
    oracle="""
WITH iv AS (
  WITH e AS (
    SELECT user_id, ts, event_id, event_type,
      CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
           THEN 1 ELSE 0 END AS chg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ), ivs AS (
    SELECT user_id, ts, event_type,
      CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS interval_seq
    FROM e
  ), g AS (
    SELECT user_id, interval_seq, event_type AS state,
      min(ts) AS valid_from
    FROM ivs GROUP BY user_id, interval_seq, event_type
  )
  SELECT user_id, interval_seq, state, valid_from,
    lead(valid_from) OVER (PARTITION BY user_id ORDER BY interval_seq)
      AS valid_to
  FROM g
), closed AS (
  SELECT state, user_id, interval_seq,
    epoch_us(valid_to) - epoch_us(valid_from) AS dwell_us
  FROM iv WHERE valid_to IS NOT NULL
), rk AS (
  SELECT state, dwell_us,
    CAST(row_number() OVER (PARTITION BY state
      ORDER BY dwell_us, user_id, interval_seq) AS BIGINT) AS rn,
    CAST(count(*) OVER (PARTITION BY state) AS BIGINT) AS n
  FROM closed
), med AS (
  SELECT state,
    CAST(max(CASE WHEN rn = (n - 1) // 2 + 1 THEN dwell_us END)
      AS BIGINT) AS median_dwell_us
  FROM rk GROUP BY state
), st AS (
  SELECT state, CAST(count(*) AS BIGINT) AS n_closed,
    CAST(sum(dwell_us) AS BIGINT) // count(*) AS mean_dwell_us
  FROM closed GROUP BY state
), openiv AS (
  SELECT state, CAST(count(*) AS BIGINT) AS n_open
  FROM iv WHERE valid_to IS NULL GROUP BY state
)
SELECT st.state, n_closed, coalesce(o.n_open, 0) AS n_open,
  mean_dwell_us, m.median_dwell_us
FROM st JOIN med m ON st.state = m.state
LEFT JOIN openiv o ON st.state = o.state
""",
)
def scd2_dwell_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bpaotu_spark.registry import QUERIES

    iv = QUERIES["scd2_user_state_intervals"](spark, sf_dir).localCheckpoint()
    closed = iv.filter(F.col("valid_to").isNotNull()).select(
        "state",
        "user_id",
        "interval_seq",
        (
            F.unix_micros("valid_to") - F.unix_micros("valid_from")
        ).alias("dwell_us"),
    )
    ws = Window.partitionBy("state")
    rk = closed.select(
        "state",
        "dwell_us",
        F.row_number()
        .over(ws.orderBy("dwell_us", "user_id", "interval_seq"))
        .cast("bigint")
        .alias("rn"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    med = rk.groupBy("state").agg(
        F.max(
            F.when(
                F.col("rn") == F.expr("(n - 1) div 2 + 1"), F.col("dwell_us")
            )
        )
        .cast("bigint")
        .alias("median_dwell_us")
    )
    st = closed.groupBy("state").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_closed"),
        F.expr("sum(dwell_us) div count(*)").alias("mean_dwell_us"),
    )
    openiv = (
        iv.filter(F.col("valid_to").isNull())
        .groupBy("state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_open"))
    )
    return (
        st.join(med, "state")
        .join(F.broadcast(openiv), "state", "left")
        .select(
            "state",
            "n_closed",
            F.coalesce(F.col("n_open"), F.lit(0).cast("bigint")).alias(
                "n_open"
            ),
            "mean_dwell_us",
            "median_dwell_us",
        )
    )


# ---------------------------------------------------------------------------
# scd2_point_in_time_join — the feature-store PIT (point-in-time)
# join: every purchase FACT is joined to the SCD2 dimension interval
# that was valid STRICTLY BEFORE the fact's timestamp (ts − 1 µs) —
# the anti-leakage rule that makes offline features reproduce what the
# online store would have served (a plain as-of-or-equal join leaks
# the label event's own state into its features). Dimension =
# scd2_user_state_intervals (composed via its registered oracle so the
# join can never drift from the dimension it serves); fact = purchase
# events; output = the prior-state census of purchases, with facts
# whose user has NO prior interval (first-ever event) surfacing as
# state 'none' via the left join rather than silently dropping.
#
# Scale shape: equi-join on user_id with the interval predicate as a
# residual filter — intervals per user are bounded by that user's
# event count, so the join is keyed and never quadratic; the census is
# one map-combined aggregate.
# ---------------------------------------------------------------------------


@register(
    "scd2_point_in_time_join",
    oracle="""
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN lag(event_type) OVER w IS NULL
              OR lag(event_type) OVER w <> event_type
         THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), iv AS (
  SELECT user_id, ts, event_type,
    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS interval_seq
  FROM e
), g AS (
  SELECT user_id, interval_seq, event_type AS state,
    min(ts) AS valid_from
  FROM iv GROUP BY user_id, interval_seq, event_type
), dim AS (
  SELECT user_id, state,
    epoch_us(valid_from) AS f_us,
    epoch_us(lead(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY interval_seq)) AS t_us
  FROM g
), facts AS (
  SELECT user_id, event_id, epoch_us(ts) - 1 AS asof_us
  FROM events WHERE event_type = 'purchase'
), pit AS (
  SELECT facts.event_id, facts.user_id,
    coalesce(dim.state, 'none') AS prior_state
  FROM facts LEFT JOIN dim
    ON dim.user_id = facts.user_id
    AND dim.f_us <= facts.asof_us
    AND (dim.t_us IS NULL OR facts.asof_us < dim.t_us)
)
SELECT prior_state,
  CAST(count(*) AS BIGINT) AS n_purchases,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM pit GROUP BY prior_state ORDER BY prior_state
""",
)
def scd2_point_in_time_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PIT join of purchase facts to the SCD2 state valid at
    (ts − 1 µs): (prior_state, n_purchases, n_users) — the
    anti-leakage feature-join census."""
    dim = scd2_user_state_intervals(spark, sf_dir).select(
        F.col("user_id").alias("d_user"),
        "state",
        F.unix_micros("valid_from").alias("f_us"),
        F.unix_micros("valid_to").alias("t_us"),
    )
    facts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            (F.unix_micros("ts") - 1).alias("asof_us"),
        )
    )
    pit = facts.join(
        dim,
        (F.col("d_user") == F.col("user_id"))
        & (F.col("f_us") <= F.col("asof_us"))
        & (F.col("t_us").isNull() | (F.col("asof_us") < F.col("t_us"))),
        "left",
    ).select(
        "event_id",
        "user_id",
        F.coalesce("state", F.lit("none")).alias("prior_state"),
    )
    return (
        pit.groupBy("prior_state")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("prior_state")
    )
