"""Round-9 event-stream operators: Markov stationary distribution,
inactivity-gap top-k, and daily peak detection.

Reference parity: the reference has no streaming/event surface (its
portal is request-driven); these extend the engine's events family
(sessionization, funnels, transitions — SURVEY.md §2) with the
remaining stationary/extreme-value lenses an event warehouse ships.

* ``event_type_stationary_dist`` — the stationary distribution of the
  per-user event-type Markov chain (the long-run visit share the
  3-step absorption and entropy-rate operators condition on). The
  transition matrix is quantized to exact ppm integers (cnt·10⁶ div
  rowsum), and the Perron vector comes from the SAME one-batch
  fixed-point integer power iteration the PCoA eigensolver ships
  (ordination.py:_int_power_iterate): bit-identical integer
  recurrence in both engines, DuckDB twin unrolled as MATERIALIZED
  CTE rounds. Output normalized to exact ppm by sign-split division,
  with a loud sign-consistency assert (Perron direction is one-signed;
  mixed signs would mean non-convergence).
* ``events_inactivity_gaps_topk`` — global top-20 longest per-user
  inactivity gaps: the outage/abandonment extremes an SLO review
  reads. Unpartitioned rank window is bounded by WindowGroupLimit
  (rnk ≤ 20 pushes per-partition top-k heaps — no global sort).
* ``events_peak_detection_daily`` — per-type count of strict local
  maxima in the daily event-count series (value > both neighbors):
  the spike census a capacity planner trends.

Scale shape: transitions/gaps are one lag/lead window partitioned by
user_id (parallel across users); the chain matrix is |event types|²
(constant at any fact scale), so the eigensolve is a single bounded
Arrow batch exactly like PCoA's.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.operators.ordination import (
    _int_power_iterate,
    _start_vector,
)
from bpaotu_spark.operators.pipeline import hash_bucket_sql
from bpaotu_spark.registry import register

# ---------------------------------------------------------------------------
# event_type_stationary_dist
# ---------------------------------------------------------------------------

_STAT_ITERS = 40  # |types|² ppm matrix mixes in far fewer rounds

_PAIRS_CTE = """
pairs AS MATERIALIZED (
  SELECT event_type AS ft,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS tt
  FROM events
),
c AS MATERIALIZED (
  SELECT ft, tt, CAST(count(*) AS BIGINT) AS cnt
  FROM pairs WHERE tt IS NOT NULL GROUP BY ft, tt
),
rs AS MATERIALIZED (
  SELECT ft, CAST(sum(cnt) AS BIGINT) AS rsum FROM c GROUP BY ft
),
ids AS MATERIALIZED (
  SELECT event_type,
    CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS tid
  FROM (SELECT DISTINCT event_type FROM events)
),
bmat AS MATERIALIZED (
  SELECT ti.tid AS i, tf.tid AS j,
    CAST(cnt * 1000000 // rsum AS HUGEINT) AS b
  FROM c
  JOIN rs USING (ft)
  JOIN ids tf ON tf.event_type = c.ft
  JOIN ids ti ON ti.event_type = c.tt
)
""".strip()


def _stationary_oracle() -> str:
    v0 = hash_bucket_sql("CAST(tid AS VARCHAR) || ':17'", 2001)
    rounds = []
    prev = "v0"
    for k in range(1, _STAT_ITERS + 1):
        rounds.append(
            f"u{k} AS MATERIALIZED (\n"
            f"  SELECT b.i AS j, CAST(sum(b.b * v.v) AS HUGEINT) AS u\n"
            f"  FROM bmat b JOIN {prev} v ON b.j = v.j GROUP BY b.i\n"
            f"),\n"
            f"v{k} AS MATERIALIZED (\n"
            f"  SELECT j, CAST(CASE WHEN u < 0 THEN -1 ELSE 1 END\n"
            f"    * ((abs(u) * 1000000)\n"
            f"       // greatest(max(abs(u)) OVER (), 1))"
            f" AS HUGEINT) AS v\n"
            f"  FROM u{k}\n"
            f")"
        )
        prev = f"v{k}"
    return f"""
WITH {_PAIRS_CTE},
v0 AS MATERIALIZED (
  SELECT tid AS j, CAST(({v0}) - 1000 AS HUGEINT) AS v FROM ids
),
{",".join(rounds)},
s AS (SELECT CAST(sum(v) AS HUGEINT) AS sv FROM {prev})
SELECT ids.event_type,
  rs.rsum AS n_out_transitions,
  CAST((abs(v.v) * 1000000) // abs(s.sv) AS BIGINT) AS stationary_ppm
FROM {prev} v
JOIN ids ON ids.tid = v.j
JOIN rs ON rs.ft = ids.event_type
CROSS JOIN s
ORDER BY event_type
"""


@register("event_type_stationary_dist", oracle=_stationary_oracle())
def event_type_stationary_dist(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(event_type, n_out_transitions, stationary_ppm): Perron vector
    of the ppm-quantized event-type transition matrix via the
    one-batch fixed-point integer power iteration."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("ft"),
        F.lead("event_type").over(w).alias("tt"),
    ).filter("tt IS NOT NULL")
    c = pairs.groupBy("ft", "tt").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    rs = c.groupBy("ft").agg(F.sum("cnt").cast("bigint").alias("rsum"))
    ids = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.row_number()
            # |event types| is bounded (a product's event taxonomy,
            # not fact rows) — single-task sort is fine
            .over(Window.orderBy("event_type"))
            .cast("bigint")
            .alias("tid"),
        )
    )
    tf = ids.select(F.col("event_type").alias("ft"), F.col("tid").alias("j"))
    ti = ids.select(F.col("event_type").alias("tt"), F.col("tid").alias("i"))
    b = (
        c.join(F.broadcast(rs), "ft")
        .join(F.broadcast(tf), "ft")
        .join(F.broadcast(ti), "tt")
        .select(
            "i",
            "j",
            F.expr("CAST(cnt * 1000000 div rsum AS DECIMAL(38,0))").alias(
                "b"
            ),
        )
    )
    v = _int_power_iterate(b, _start_vector(b, seed=17), _STAT_ITERS)
    s = v.agg(F.sum("v").cast("bigint").alias("sv"))
    return (
        v.crossJoin(F.broadcast(s))
        .join(F.broadcast(ids), v.j == ids.tid)
        .join(F.broadcast(rs), F.col("event_type") == F.col("ft"))
        .select(
            "event_type",
            F.col("rsum").alias("n_out_transitions"),
            F.expr(
                # Perron direction is one-signed; a mixed-sign iterate
                # means the chain didn't mix in _STAT_ITERS rounds —
                # fail loudly instead of hashing a wrong distribution
                "CASE WHEN assert_true(v = 0 OR (v < 0) = (sv < 0),"
                " 'event_type_stationary_dist: mixed-sign iterate —"
                " raise _STAT_ITERS') IS NULL THEN"
                " CAST((abs(v) * 1000000) div abs(sv) AS BIGINT) END"
            ).alias("stationary_ppm"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# events_inactivity_gaps_topk
# ---------------------------------------------------------------------------

_GAPS_TOPK = 20


@register(
    "events_inactivity_gaps_topk",
    oracle=f"""
WITH g AS (
  SELECT user_id,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
    ts,
    lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_id
  FROM events
),
d AS (
  SELECT user_id, prev_ts AS gap_start, ts AS gap_end,
    epoch_us(ts) - epoch_us(prev_ts) AS gap_us, prev_id
  FROM g WHERE prev_ts IS NOT NULL
),
r AS (
  SELECT *,
    CAST(row_number() OVER (ORDER BY gap_us DESC, user_id, prev_id)
      AS BIGINT) AS rnk
  FROM d QUALIFY rnk <= {_GAPS_TOPK}
)
SELECT rnk, user_id, gap_start, gap_end,
  CAST(gap_us // 1000000 AS BIGINT) AS gap_sec
FROM r ORDER BY rnk
""",
)
def events_inactivity_gaps_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Global top-20 longest per-user inactivity gaps."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        F.lag("ts").over(w).alias("prev_ts"),
        "ts",
        F.lag("event_id").over(w).alias("prev_id"),
    ).filter("prev_ts IS NOT NULL")
    d = g.select(
        "user_id",
        F.col("prev_ts").alias("gap_start"),
        F.col("ts").alias("gap_end"),
        (F.unix_micros("ts") - F.unix_micros("prev_ts")).alias("gap_us"),
        "prev_id",
    )
    # unpartitioned window bound: rnk <= 20 → WindowGroupLimit pushes
    # per-partition top-k heaps, no global sort materializes
    wr = Window.orderBy(
        F.col("gap_us").desc(), F.col("user_id"), F.col("prev_id")
    )
    return (
        d.withColumn("rnk", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rnk") <= _GAPS_TOPK)
        .select(
            "rnk",
            "user_id",
            "gap_start",
            "gap_end",
            F.expr("CAST(gap_us div 1000000 AS BIGINT)").alias("gap_sec"),
        )
        .orderBy("rnk")
    )


# ---------------------------------------------------------------------------
# events_peak_detection_daily
# ---------------------------------------------------------------------------


@register(
    "events_peak_detection_daily",
    oracle="""
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT event_type, n,
    lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prv,
    lead(n) OVER (PARTITION BY event_type ORDER BY day) AS nxt
  FROM d
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_days,
  CAST(sum(CASE WHEN prv IS NOT NULL AND nxt IS NOT NULL
                AND n > prv AND n > nxt THEN 1 ELSE 0 END) AS BIGINT)
    AS n_peaks,
  CAST(max(n) AS BIGINT) AS max_day_count,
  CAST(sum(CASE WHEN prv IS NOT NULL AND nxt IS NOT NULL
                AND n > prv AND n > nxt THEN 1 ELSE 0 END) * 1000000
       // count(*) AS BIGINT) AS peak_share_ppm
FROM p GROUP BY event_type ORDER BY event_type
""",
)
def events_peak_detection_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Strict local-maxima census of per-type daily event counts."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    p = d.select(
        "event_type",
        "n",
        F.lag("n").over(w).alias("prv"),
        F.lead("n").over(w).alias("nxt"),
    )
    peak = (
        "CASE WHEN prv IS NOT NULL AND nxt IS NOT NULL"
        " AND n > prv AND n > nxt THEN 1 ELSE 0 END"
    )
    return (
        p.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum(F.expr(peak)).cast("bigint").alias("n_peaks"),
            F.max("n").cast("bigint").alias("max_day_count"),
        )
        .select(
            "event_type",
            "n_days",
            "n_peaks",
            "max_day_count",
            F.expr("n_peaks * 1000000 div n_days").alias(
                "peak_share_ppm"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# user_lifecycle_weekly — new / retained / resurrected / churned user
# counts per ISO week (both engines truncate weeks to Monday). The
# growth-accounting table every activation dashboard leads with.
# Churn is attributed to the week AFTER the user's last active week
# and reported only for weeks observed in the data.
# Scale shape: one per-user lag/lead window over the (user, week)
# activity table (parallel across users), then bounded per-week aggs.
# ---------------------------------------------------------------------------


@register(
    "user_lifecycle_weekly",
    oracle="""
WITH uw AS (
  SELECT DISTINCT user_id,
    CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
),
lagged AS (
  SELECT user_id, wk,
    lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
    lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk,
    min(wk) OVER (PARTITION BY user_id) AS first_wk
  FROM uw
),
stages AS (
  SELECT wk,
    CAST(sum(CASE WHEN wk = first_wk THEN 1 ELSE 0 END) AS BIGINT)
      AS n_new,
    CAST(sum(CASE WHEN prev_wk = wk - 7 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_retained,
    CAST(sum(CASE WHEN prev_wk IS NOT NULL AND prev_wk < wk - 7
             THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
  FROM lagged GROUP BY wk
),
churn AS (
  SELECT wk + 7 AS wk, CAST(count(*) AS BIGINT) AS n_churned
  FROM lagged
  WHERE next_wk IS NULL OR next_wk > wk + 7
  GROUP BY wk + 7
)
SELECT s.wk AS week_start, n_new, n_retained, n_resurrected,
  CAST(coalesce(c.n_churned, 0) AS BIGINT) AS n_churned
FROM stages s LEFT JOIN churn c ON c.wk = s.wk
ORDER BY s.wk
""",
)
def user_lifecycle_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(week_start, n_new, n_retained, n_resurrected, n_churned)
    growth-accounting table over ISO weeks."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
    ).distinct()
    wo = Window.partitionBy("user_id").orderBy("wk")
    wp = Window.partitionBy("user_id")
    lagged = uw.select(
        "user_id",
        "wk",
        F.lag("wk").over(wo).alias("prev_wk"),
        F.lead("wk").over(wo).alias("next_wk"),
        F.min("wk").over(wp).alias("first_wk"),
    )
    stages = lagged.groupBy("wk").agg(
        F.sum(F.expr("CASE WHEN wk = first_wk THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_new"),
        F.sum(
            F.expr(
                "CASE WHEN prev_wk = date_sub(wk, 7) THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("n_retained"),
        F.sum(
            F.expr(
                "CASE WHEN prev_wk IS NOT NULL"
                " AND prev_wk < date_sub(wk, 7) THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("n_resurrected"),
    )
    churn = (
        lagged.filter(
            F.expr("next_wk IS NULL OR next_wk > date_add(wk, 7)")
        )
        .groupBy(F.expr("date_add(wk, 7)").alias("wk"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
    )
    return (
        stages.join(churn, "wk", "left")
        .select(
            F.col("wk").alias("week_start"),
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0))
            .cast("bigint")
            .alias("n_churned"),
        )
        .orderBy("week_start")
    )


# ---------------------------------------------------------------------------
# events_record_days — days whose per-type event count sets a new
# all-time record (strictly exceeds every previous day for that type;
# the first day is a record by convention). The streamable variant of
# peak detection: a record needs only the PAST (running max), never
# lead(), so the streaming twin (streaming.jobs.record_days_stream)
# can emit it live with one small state cell per type.
# Scale shape: per-type daily agg, then a running-max window
# partitioned by type over the calendar-bounded daily series.
# ---------------------------------------------------------------------------


@register(
    "events_record_days",
    oracle="""
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, day, n_events,
    CAST(coalesce(max(n_events) OVER (PARTITION BY event_type
      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      0) AS BIGINT) AS prev_max
  FROM d
)
SELECT event_type, day, n_events, prev_max
FROM r WHERE n_events > prev_max
ORDER BY event_type, day
""",
)
def events_record_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, n_events, prev_max) rows for record-setting
    days (count strictly above the type's running max)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = d.withColumn(
        "prev_max",
        F.coalesce(F.max("n_events").over(w), F.lit(0)).cast("bigint"),
    )
    return (
        r.filter(F.col("n_events") > F.col("prev_max"))
        .select("event_type", "day", "n_events", "prev_max")
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# event_value_percentiles_by_type — exact rank-selected p50/p90/p99 of
# event value (cents) per event type: the SLO latency-table shape on
# the value column. ceil(p·n) convention (part_type_price_quartiles).
# Scale shape: one type-partitioned rank window (parallel across
# types), conditional-agg rank pick.
# ---------------------------------------------------------------------------


@register(
    "event_value_percentiles_by_type",
    oracle="""
WITH x AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents,
    event_id
  FROM events
),
r AS (
  SELECT event_type, cents,
    row_number() OVER (PARTITION BY event_type
                       ORDER BY cents, event_id) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM x
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS BIGINT)
    AS p50_cents,
  CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN cents END) AS BIGINT)
    AS p90_cents,
  CAST(max(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END)
    AS BIGINT) AS p99_cents
FROM r GROUP BY event_type ORDER BY event_type
""",
)
def event_value_percentiles_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact rank-selected p50/p90/p99 event-value cents per type."""
    x = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wc = Window.partitionBy("event_type")
    r = x.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    return (
        r.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.max(F.expr("CASE WHEN rn = (n + 1) div 2 THEN cents END"))
            .cast("bigint")
            .alias("p50_cents"),
            F.max(
                F.expr("CASE WHEN rn = (9 * n + 9) div 10 THEN cents END")
            )
            .cast("bigint")
            .alias("p90_cents"),
            F.max(
                F.expr(
                    "CASE WHEN rn = (99 * n + 99) div 100 THEN cents END"
                )
            )
            .cast("bigint")
            .alias("p99_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# user_hour_entropy_census — per-user Shannon entropy of activity over
# hour-of-day (floored micro-nats), censused into bands: the bot
# detector's first feature (a human's hours concentrate → low-mid
# entropy; a cron job is a point mass → ~0; a randomized scraper is
# near-uniform → ~ln 24).
# Scale shape: one (user, hour) map-combined agg, per-user entropy
# terms, bounded band census.
# ---------------------------------------------------------------------------


@register(
    "user_hour_entropy_census",
    oracle="""
WITH uh AS (
  SELECT user_id, CAST(hour(ts) AS BIGINT) AS hr,
    CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
ut AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS tot FROM uh GROUP BY 1
),
h AS (
  SELECT uh.user_id,
    CAST(sum(CAST(floor((CAST(c AS DOUBLE) / tot)
      * ln(CAST(tot AS DOUBLE) / c) * 1000000) AS BIGINT)) AS BIGINT)
      AS h_micro
  FROM uh JOIN ut ON uh.user_id = ut.user_id
  GROUP BY uh.user_id
)
SELECT CAST(least(h_micro // 500000, 6) AS BIGINT) AS band,
  CAST(count(*) AS BIGINT) AS n_users,
  CAST(sum(h_micro) // count(*) AS BIGINT) AS mean_h_micro
FROM h GROUP BY band ORDER BY band
""",
)
def user_hour_entropy_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Band census of per-user hour-of-day activity entropy
    (floored micro-nats; band width 0.5 nat, capped at 6)."""
    ev = load_table(spark, sf_dir, "events")
    uh = ev.groupBy(
        "user_id", F.hour("ts").cast("bigint").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ut = uh.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("tot")
    )
    h = (
        uh.join(ut, "user_id")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.expr(
                    "CAST(floor((CAST(c AS DOUBLE) / tot)"
                    " * ln(CAST(tot AS DOUBLE) / c) * 1000000)"
                    " AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("h_micro")
        )
    )
    return (
        h.groupBy(
            F.expr(
                "CAST(least(h_micro div 500000, CAST(6 AS BIGINT))"
                " AS BIGINT)"
            ).alias("band")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.expr("CAST(sum(h_micro) div count(*) AS BIGINT)").alias(
                "mean_h_micro"
            ),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# events_burst_alarm_windows — BATCH twin of streaming/jobs.py's
# burst_alarm_stream (same 6h window / 1h slide / ≥5 threshold): per
# (sliding window, user) event counts at or above the burst
# threshold. Registering the batch form gives the streaming layer's
# alarm semantics a driver-verified oracle row: the stream is the
# exact same plan over readStream (watermark-bounded state), so the
# batch hash-match IS the correctness evidence for the alarm logic.
#
# Oracle: a row belongs to the 6 slide-aligned windows starting at
# (floor(ms/1h) − k)·1h for k ∈ 0..5 — the same epoch-aligned grid
# Spark's window(ts, '6 hours', '1 hour') generates.
#
# Scale shape: one groupBy over a 6×-exploded event stream with
# map-side combine; output is alarm-sparse (threshold filter).
# ---------------------------------------------------------------------------

_BURST_WINDOW_MS = 6 * 3600 * 1000
_BURST_SLIDE_MS = 3600 * 1000
_BURST_THRESHOLD = 5


@register(
    "events_burst_alarm_windows",
    oracle=f"""
WITH ev AS (
  SELECT user_id, epoch_ms(ts) AS ms FROM events
),
w AS (
  SELECT user_id,
    (CAST(floor(ms / {_BURST_SLIDE_MS}) AS BIGINT) - k)
      * {_BURST_SLIDE_MS} AS window_start_ms
  FROM ev CROSS JOIN (SELECT unnest(range({_BURST_WINDOW_MS // _BURST_SLIDE_MS})) AS k)
)
SELECT window_start_ms, user_id,
  CAST(count(*) AS BIGINT) AS n_events
FROM w GROUP BY window_start_ms, user_id
HAVING count(*) >= {_BURST_THRESHOLD}
""",
)
def events_burst_alarm_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user 6h/1h sliding-window burst alarms (count ≥ 5):
    (window_start_ms, user_id, n_events) — the batch twin of
    burst_alarm_stream."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "6 hours", "1 hour").alias("w"),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .filter(F.col("n_events") >= _BURST_THRESHOLD)
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "user_id",
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# events_purchases_after_signup — BATCH twin of streaming/jobs.py's
# purchases_after_signup_stream (the stream-stream INTERVAL JOIN: the
# last major streaming shape without a driver-hash row). Same join
# semantics — purchases strictly after the signup and within 1 hour,
# per user — aggregated per signup into the conversion report
# (n_purchases, first purchase, total cents). The streaming pytest
# aggregates the stream's inner-join output identically and diffs it
# against THIS frame, so the driver hash row is correctness evidence
# for the watermarked stream-stream join itself.
#
# Scale shape: equi-join on user_id (shuffle on the key) with the
# time bound as a residual predicate; the aggregate is one map-side
# combined groupBy over join output bounded by signups × in-window
# purchases. In the stream the same bounds expire state provably.
# ---------------------------------------------------------------------------

_PAS_RANGE_MS = 3600 * 1000


@register(
    "events_purchases_after_signup",
    oracle=f"""
WITH s AS (
  SELECT event_id AS signup_id, user_id, epoch_ms(ts) AS s_ms
  FROM events WHERE event_type = 'signup'
),
p AS (
  SELECT user_id, epoch_ms(ts) AS p_ms,
    CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
)
SELECT s.signup_id, s.user_id, s.s_ms AS signup_ms,
  CAST(count(*) AS BIGINT) AS n_purchases,
  CAST(min(p.p_ms) AS BIGINT) AS first_purchase_ms,
  CAST(sum(p.cents) AS BIGINT) AS total_value_cents
FROM s JOIN p ON p.user_id = s.user_id
  AND p.p_ms > s.s_ms AND p.p_ms <= s.s_ms + {_PAS_RANGE_MS}
GROUP BY s.signup_id, s.user_id, s.s_ms
ORDER BY s.signup_id
""",
)
def events_purchases_after_signup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Purchases within 1 hour after each signup, per signup:
    (signup_id, user_id, signup_ms, n_purchases, first_purchase_ms,
    total_value_cents) — the batch twin of the watermarked
    stream-stream interval join."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.unix_millis("ts").alias("s_ms"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.unix_millis("ts").alias("p_ms"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return (
        s.join(
            p,
            (F.col("s_user") == F.col("p_user"))
            & (F.col("p_ms") > F.col("s_ms"))
            & (F.col("p_ms") <= F.col("s_ms") + _PAS_RANGE_MS),
        )
        .groupBy(
            "signup_id",
            F.col("s_user").alias("user_id"),
            F.col("s_ms").alias("signup_ms"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.min("p_ms").cast("bigint").alias("first_purchase_ms"),
            F.sum("cents").cast("bigint").alias("total_value_cents"),
        )
        .orderBy("signup_id")
    )


# ---------------------------------------------------------------------------
# events_signup_conversion_outer — the LEFT OUTER arm of the signup →
# purchase interval join: EVERY signup, with its in-window purchase
# stats or zeros. This is the batch twin of streaming/jobs.py's
# purchases_after_signup_outer_stream (watermarked left-outer
# stream-stream join — the shape whose unmatched rows only emit when
# the watermark passes signup_ts + range; the streaming pytest diffs
# its null-padded output against THIS frame for every signup old
# enough to have expired). The inner twin (events_purchases_after_
# signup) can't see non-converting signups at all — conversion RATE
# needs the outer arm.
#
# Scale shape: equi-join on user_id with the time bound residual,
# exactly like the inner twin, but LEFT: signups with no purchase
# survive as one null-padded row each, so output is bounded by
# |signups| + in-window matches. One map-side-combined groupBy.
# ---------------------------------------------------------------------------


@register(
    "events_signup_conversion_outer",
    oracle=f"""
WITH s AS (
  SELECT event_id AS signup_id, user_id, epoch_ms(ts) AS s_ms
  FROM events WHERE event_type = 'signup'
),
p AS (
  SELECT user_id, epoch_ms(ts) AS p_ms,
    CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
)
SELECT s.signup_id, s.user_id, s.s_ms AS signup_ms,
  CAST(count(p.p_ms) AS BIGINT) AS n_purchases,
  CAST(coalesce(min(p.p_ms), -1) AS BIGINT) AS first_purchase_ms,
  CAST(coalesce(sum(p.cents), 0) AS BIGINT) AS total_value_cents,
  count(p.p_ms) > 0 AS converted
FROM s LEFT JOIN p ON p.user_id = s.user_id
  AND p.p_ms > s.s_ms AND p.p_ms <= s.s_ms + {_PAS_RANGE_MS}
GROUP BY s.signup_id, s.user_id, s.s_ms
ORDER BY s.signup_id
""",
)
def events_signup_conversion_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Every signup with its 1-hour purchase stats or zeros:
    (signup_id, user_id, signup_ms, n_purchases, first_purchase_ms
    [-1 when none], total_value_cents, converted) — the batch twin of
    the left-outer watermarked stream-stream interval join."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.unix_millis("ts").alias("s_ms"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.unix_millis("ts").alias("p_ms"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return (
        s.join(
            p,
            (F.col("s_user") == F.col("p_user"))
            & (F.col("p_ms") > F.col("s_ms"))
            & (F.col("p_ms") <= F.col("s_ms") + _PAS_RANGE_MS),
            "left",
        )
        .groupBy(
            "signup_id",
            F.col("s_user").alias("user_id"),
            F.col("s_ms").alias("signup_ms"),
        )
        .agg(
            F.count("p_ms").cast("bigint").alias("n_purchases"),
            F.coalesce(F.min("p_ms"), F.lit(-1))
            .cast("bigint")
            .alias("first_purchase_ms"),
            F.coalesce(F.sum("cents"), F.lit(0))
            .cast("bigint")
            .alias("total_value_cents"),
            (F.count("p_ms") > 0).alias("converted"),
        )
        .orderBy("signup_id")
    )


# ---------------------------------------------------------------------------
# retention_halflife_fit — exponential-decay fit of the pooled lag-k
# retention curve: r_k = Σ_d |active_d ∩ active_{d+k}| /
# Σ_{d ≤ max−k} |active_d| for k = 1..14, then OLS of
# ln(r_k) (floored micro-nats) on k. Under exponential churn
# ln(r_k) ≈ −λk, and half-life = ln2/λ — the single number a
# growth team quotes where retention_daily reports the raw next-day
# pairs. Everything after the per-lag ln floor is exact integer
# arithmetic (the OLS closed form never divides until the final
# half-life ratio, computed as 693147·1000·den // (−num)).
#
# Scale shape: the distinct user-day frame self-joins per lag on
# (user, day+k) — 14 equi-joins on the DAILY frame (the daily_acf
# calendar discipline, users × days not events); one 1-row OLS
# finish. Lags with zero retained users are excluded by defined
# semantics (n_lags_used reports how many survived).
# ---------------------------------------------------------------------------

_RHL_MAX_LAG = 14
_LN2_MICRO = 693_147  # floor(ln(2) * 1e6)


@register(
    "retention_halflife_fit",
    oracle=f"""
WITH d AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
),
mx AS (SELECT max(day) AS mday FROM d),
lags AS (SELECT unnest(range(1, {_RHL_MAX_LAG + 1})) AS k),
den AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_base
  FROM lags, d CROSS JOIN mx
  WHERE d.day + to_days(CAST(k AS INTEGER)) <= mx.mday
  GROUP BY k
),
num AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_ret
  FROM lags, d a
  JOIN d b ON b.user_id = a.user_id
    AND b.day = a.day + to_days(CAST(k AS INTEGER))
  GROUP BY k
),
xy AS (
  SELECT den.k AS x,
    CAST(floor(ln(CAST(num.n_ret AS DOUBLE) / den.n_base) * 1000000)
      AS BIGINT) AS y
  FROM den JOIN num ON num.k = den.k
  WHERE num.n_ret > 0 AND den.n_base > 0
),
mo AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS HUGEINT) AS sx,
    CAST(sum(y) AS HUGEINT) AS sy,
    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM xy
)
SELECT n AS n_lags_used,
  CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
  CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
  CASE WHEN n * sxy - sx * sy >= 0 THEN CAST(-1 AS BIGINT)
    ELSE CAST({_LN2_MICRO} * CAST(1000 AS HUGEINT)
      * (n * sxx - sx * sx) // (-(n * sxy - sx * sy)) AS BIGINT)
  END AS halflife_days_milli
FROM mo
""",
)
def retention_halflife_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential retention decay: (n_lags_used, slope_num,
    slope_den, halflife_days_milli; −1 when retention does not
    decay)."""
    d = (
        load_table(spark, sf_dir, "events")
        .select(
            F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
        )
        .distinct()
        .localCheckpoint()
    )
    mx = d.agg(F.max("day").alias("mday"))
    lags = spark.range(1, _RHL_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("k")
    )
    den = (
        d.crossJoin(F.broadcast(lags))
        .crossJoin(F.broadcast(mx))
        .filter(F.expr("date_add(day, k) <= mday"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_base"))
    )
    a = d.crossJoin(F.broadcast(lags)).select(
        "user_id", F.expr("date_add(day, k)").alias("day_t"), "k"
    )
    b = d.select(
        F.col("user_id").alias("u_b"), F.col("day").alias("day_b")
    )
    num = (
        a.join(
            b,
            (F.col("user_id") == F.col("u_b"))
            & (F.col("day_t") == F.col("day_b")),
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ret"))
    )
    xy = (
        den.join(num, "k")
        .filter("n_ret > 0 AND n_base > 0")
        .select(
            F.col("k").alias("x"),
            F.expr(
                "CAST(floor(ln(CAST(n_ret AS DOUBLE) / n_base) * 1000000)"
                " AS BIGINT)"
            ).alias("y"),
        )
    )
    mo = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
    )
    return mo.select(
        F.col("n").alias("n_lags_used"),
        F.expr("CAST(n * sxy - sx * sy AS BIGINT)").alias("slope_num"),
        F.expr("CAST(n * sxx - sx * sx AS BIGINT)").alias("slope_den"),
        F.expr(
            f"CASE WHEN n * sxy - sx * sy >= 0 THEN CAST(-1 AS BIGINT) "
            f"ELSE CAST({_LN2_MICRO} * CAST(1000 AS DECIMAL(38,0))"
            f" * (n * sxx - sx * sx) DIV (-(n * sxy - sx * sy))"
            f" AS BIGINT) END"
        ).alias("halflife_days_milli"),
    )
