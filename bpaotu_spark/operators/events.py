"""Event-stream operators (batch form).

The reference has no event stream; these are the Spark-first additions
over the ``events`` table (sessionization, as-of join, funnel,
retention, JSON prop extraction, windowed aggregation). The streaming
(readStream) twins live in ``bpaotu_spark.streaming``; these batch
forms share semantics with them and carry the DuckDB oracles.

Timestamps are exported as epoch milliseconds (``unix_millis`` /
``epoch_ms``) so both engines hash identical integers regardless of
timestamp rendering.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register

SESSION_GAP_MS = 30 * 60 * 1000  # 30 minutes

DEC = "decimal(18,6)"


def _value_sum(alias: str):
    """Exact, engine-independent sum of the continuous ``value`` double.

    Double addition is order-sensitive; a sum landing near a rounding
    tie (x.xxxx5) can round differently between Spark's partition order
    and the oracle's scan order. DECIMAL(18,6) partials make the sum
    associative, hence bit-identical in both engines.
    """
    return F.round(F.sum(F.col("value").cast(DEC)), 4).cast("double").alias(alias)


_VALUE_SUM_SQL = "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)"


# ---------------------------------------------------------------------------
# sessionize_events — gap-based sessionization via lag + running sum.
# ---------------------------------------------------------------------------


@register(
    "sessionize_events",
    oracle=f"""
WITH marked AS (
  SELECT
    user_id, event_id, value,
    epoch_ms(ts) AS t_ms,
    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > {SESSION_GAP_MS}
           OR lag(epoch_ms(ts)) OVER w IS NULL
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  -- CAST: DuckDB sum(BIGINT) yields HUGEINT/decimal128, which the
  -- driver's value hasher treats differently from Spark's int64 even
  -- when the values are equal. BIGINT matches Spark's window-sum type.
  SELECT *,
    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t_ms ASC, event_id ASC
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked
)
SELECT
  user_id,
  session_id,
  count(*) AS n_events,
  min(t_ms) AS session_start_ms,
  max(t_ms) AS session_end_ms,
  {_VALUE_SUM_SQL} AS session_value
FROM sess
GROUP BY user_id, session_id
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.unix_millis("ts").alias("t_ms")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("t_ms").asc(), F.col("event_id").asc()
    )
    prev = F.lag("t_ms").over(w)
    is_new = F.when(
        prev.isNull() | ((F.col("t_ms") - prev) > SESSION_GAP_MS), F.lit(1)
    ).otherwise(F.lit(0))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(wsum)
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("t_ms").alias("session_start_ms"),
        F.max("t_ms").alias("session_end_ms"),
        _value_sum("session_value"),
    )


# ---------------------------------------------------------------------------
# events_session_window — same semantics via Spark's native session_window
# (the batch twin of the streaming sessionization job).
# ---------------------------------------------------------------------------


@register(
    "events_session_window",
    oracle=f"""
WITH marked AS (
  SELECT
    user_id, event_id, value,
    epoch_ms(ts) AS t_ms,
    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w >= {SESSION_GAP_MS}
           OR lag(epoch_ms(ts)) OVER w IS NULL
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  SELECT *,
    sum(is_new) OVER (PARTITION BY user_id ORDER BY t_ms ASC, event_id ASC
                      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT
  user_id,
  min(t_ms) AS session_start_ms,
  max(t_ms) + {SESSION_GAP_MS} AS session_end_ms,
  count(*) AS n_events,
  {_VALUE_SUM_SQL} AS session_value
FROM sess
GROUP BY user_id, session_id
""",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window: sessions close after a 30-min silence.

    Spark's session_window treats a gap exactly equal to the gap duration
    as a NEW session (window is [start, last+gap)), hence ``>=`` in the
    oracle where ``sessionize_events`` uses ``>``.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _value_sum("session_value"),
        )
        .select(
            "user_id",
            F.unix_millis(F.col("sw.start")).alias("session_start_ms"),
            F.unix_millis(F.col("sw.end")).alias("session_end_ms"),
            "n_events",
            "session_value",
        )
    )


# ---------------------------------------------------------------------------
# asof_join — for each event, the latest order (by o_orderdate) of the same
# user at-or-before the event. Spark-first: single sort-merge pass over the
# union (one shuffle on user), not an O(events × orders) join.
# ---------------------------------------------------------------------------


@register(
    "asof_join",
    oracle="""
SELECT
  e.event_id,
  e.user_id,
  epoch_ms(e.ts) AS ts_ms,
  o.o_orderkey,
  epoch_ms(o.o_orderdate) AS order_ms,
  o.o_totalprice
FROM events e
LEFT JOIN orders o
  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
QUALIFY row_number() OVER (
  PARTITION BY e.event_id
  ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST
) = 1
""",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        F.unix_millis("ts").alias("t_ms"),
        F.lit(0).alias("is_right"),
        F.col("event_id"),
        F.lit(None).cast("struct<o_orderkey:bigint,order_ms:bigint,o_totalprice:double>").alias("ord"),
    )
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("u"),
        F.unix_millis("o_orderdate").alias("t_ms"),
        F.lit(-1).alias("is_right"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.struct(
            F.col("o_orderkey"),
            F.unix_millis("o_orderdate").alias("order_ms"),
            F.col("o_totalprice"),
        ).alias("ord"),
    )
    # Order rows sort before event rows at equal timestamps (is_right -1<0) so
    # an order dated exactly at the event time matches (<= semantics); among
    # equal-dated orders the greatest o_orderkey wins (orderkey ASC, last wins).
    unioned = od.unionByName(ev)
    w = (
        Window.partitionBy("u")
        .orderBy(
            F.col("t_ms").asc(),
            F.col("is_right").asc(),
            F.coalesce(F.col("ord.o_orderkey"), F.lit(2**62)).asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("last_ord", F.last("ord", ignorenulls=True).over(w))
    return filled.filter(F.col("is_right") == 0).select(
        F.col("event_id"),
        F.col("u").alias("user_id"),
        F.col("t_ms").alias("ts_ms"),
        F.col("last_ord.o_orderkey").alias("o_orderkey"),
        F.col("last_ord.order_ms").alias("order_ms"),
        F.col("last_ord.o_totalprice").alias("o_totalprice"),
    )


# ---------------------------------------------------------------------------
# funnel_conversion — staged funnel signup → view → purchase, ordered in time.
# ---------------------------------------------------------------------------


@register(
    "funnel_conversion",
    oracle="""
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'view' AND e.ts >= s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
  GROUP BY e.user_id
)
SELECT
  (SELECT count(*) FROM s1) AS n_signup,
  (SELECT count(*) FROM s2) AS n_signup_view,
  (SELECT count(*) FROM s3) AS n_full_funnel
""",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    # No broadcast hints: s1/s2 are per-user aggregates of the event
    # fact — unbounded at scale (broadcasting them would OOM a 100 TB
    # run). The joins key on user_id, which matches the groupBy's own
    # partitioning, so each stage reuses the previous exchange; AQE
    # still auto-broadcasts when the funnel head is genuinely small.
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_signup_view")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_full_funnel")))
    )


# ---------------------------------------------------------------------------
# json_extraction — JSON prop extraction + aggregation.
# ---------------------------------------------------------------------------


@register(
    "json_extraction",
    oracle="""
SELECT
  event_type,
  CAST(round(sum(CAST(json_extract_string(props, '$.k') AS DECIMAL(18,6)))
       / count(json_extract_string(props, '$.k')), 4) AS DOUBLE) AS avg_k,
  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  count(*) AS n_events
FROM events
GROUP BY event_type
""",
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.round(F.sum(F.col("k").cast(DEC)) / F.count("k"), 4)
            .cast("double")
            .alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# retention_daily — day-over-day distinct-user retention.
# ---------------------------------------------------------------------------


@register(
    "retention_daily",
    oracle="""
WITH d AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events
)
SELECT
  strftime(a.day, '%Y-%m-%d') AS day,
  count(a.user_id) AS n_active,
  count(b.user_id) AS n_retained
FROM d a
LEFT JOIN d b ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
GROUP BY a.day
""",
)
def retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).distinct()
    b = d.select(F.col("day").alias("b_day"), F.col("user_id").alias("b_user"))
    joined = d.join(
        b,
        (F.col("b_user") == F.col("user_id"))
        & (F.col("b_day") == F.date_add(F.col("day"), 1)),
        "left",
    )
    return joined.groupBy("day").agg(
        F.count("user_id").alias("n_active"),
        F.count("b_user").alias("n_retained"),
    ).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "n_active", "n_retained"
    )


# ---------------------------------------------------------------------------
# events_windowed_agg — tumbling 1-hour window aggregation (the batch
# equivalent of the streaming watermark+window job in bpaotu_spark.streaming).
# ---------------------------------------------------------------------------


@register(
    "events_windowed_agg",
    oracle=f"""
SELECT
  epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
  event_type,
  count(*) AS n_events,
  {_VALUE_SUM_SQL} AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _value_sum("sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# range_join_bucketed — equi+range join via time bucketing: purchases
# within 1 hour after each signup, per user. The oracle is the naive
# BETWEEN join, proving the bucket rewrite is lossless.
# ---------------------------------------------------------------------------

_RANGE_S = 3600


@register(
    "range_join_bucketed",
    oracle=f"""
WITH s AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'
), p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT s.event_id, s.user_id,
  count(p.ts) AS n_purchases_1h
FROM s LEFT JOIN p
  ON s.user_id = p.user_id
 AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
GROUP BY s.event_id, s.user_id
""",
)
def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A raw equi+range join leaves Catalyst a hash join on user_id with
    the range as a post-filter — fine until one user's history is huge.
    Bucketing epoch time to the range width and joining on
    (user_id, bucket) bounds every probe to two buckets regardless of
    history length: candidates = own bucket + next, then the exact
    range refines. This is the standard rewrite for range/interval
    joins at scale (bucket width = range width ⇒ ≤2 buckets cover any
    window). Spark-side only — the oracle keeps the naive form, so the
    hash-compare proves losslessness."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        "event_id",
        "user_id",
        F.col("ts").alias("ts_s"),
        F.unix_timestamp("ts").alias("ep_s"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_p"),
        F.col("ts").alias("ts_p"),
        (F.unix_timestamp("ts").cast("bigint") / _RANGE_S).cast("bigint").alias(
            "bkt_p"
        ),
    )
    # each signup probes its own bucket and the next one
    s2 = s.select(
        "*",
        F.explode(
            F.array(
                (F.col("ep_s") / _RANGE_S).cast("bigint"),
                (F.col("ep_s") / _RANGE_S).cast("bigint") + 1,
            )
        ).alias("bkt"),
    )
    joined = s2.join(
        p,
        (s2.user_id == p.user_p)
        & (s2.bkt == p.bkt_p)
        & (p.ts_p > s2.ts_s)
        & (p.ts_p <= s2.ts_s + F.expr(f"INTERVAL {_RANGE_S} SECONDS")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        # a signup exploded to 2 buckets double-counts nothing: matches
        # land in exactly one bucket; count(ts_p) ignores the null arm.
        F.count("ts_p").alias("n_purchases_1h")
    )


# ---------------------------------------------------------------------------
# events_rollup_reuse — the continuous-aggregate / hypertable-rollup
# pattern: a persisted HOURLY pre-aggregate answers the DAILY query by
# re-aggregation. The oracle computes daily straight from raw rows, so
# the hash-compare proves the two-level rollup is exact — the property
# that lets a 100 TB lake serve dashboards from rollups without ever
# rescanning raw history (only algebraic aggs compose this way:
# sum/count/min/max re-aggregate; avg must be derived sum/count).
# ---------------------------------------------------------------------------


@register(
    "events_rollup_reuse",
    oracle="""
SELECT
  CAST(date_trunc('day', ts) AS DATE) AS day,
  event_type,
  count(*) AS n_events,
  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value,
  CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) // count(*) AS avg_value_micro,
  max(value) AS max_value
FROM events
GROUP BY 1, 2
""",
)
def events_rollup_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # DECIMAL partials: double addition is order-sensitive, so a rollup
    # summed raw→hourly→daily would differ at the ulp from raw→daily;
    # decimal partials make re-aggregation bit-exact (the same reason
    # production rollup tables store decimal/long partials).
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
        F.max("value").alias("mx"),
    )
    # (in production `hourly` is the persisted rollup table; here it is
    # recomputed inline so the operator stays self-contained)
    return (
        hourly.groupBy(
            F.date_trunc("day", "hour").cast("date").alias("day"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("sv"), 4).cast("double").alias("total_value"),
            # derived avg in exact integer micro-units: scaling the
            # decimal sum by its own scale factor is exact, and integer
            # division agrees across engines (values are non-negative —
            # Spark `div` truncates, DuckDB `//` floors; equal on >= 0).
            F.expr("CAST(sum(sv) * 1000000 AS BIGINT) div sum(n)").alias(
                "avg_value_micro"
            ),
            F.max("mx").alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# cohort_retention_matrix — the cohort analysis shape: users grouped by
# first-activity week, activity tracked by week offset.
# ---------------------------------------------------------------------------


@register(
    "cohort_retention_matrix",
    oracle="""
WITH first_week AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
    CAST(datediff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT) AS week_offset
  FROM events e JOIN first_week f ON e.user_id = f.user_id
)
SELECT
  epoch_ms(cohort_week) AS cohort_week_ms,
  week_offset,
  count(*) AS n_active_users
FROM activity
GROUP BY cohort_week, week_offset
""",
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two shuffles total: first-activity per user (map-side combined
    min), then the distinct (cohort, offset, user) set — both keyed on
    user_id so the join between them reuses the first exchange."""
    ev = load_table(spark, sf_dir, "events")
    fw = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = (
        ev.join(fw, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", "ts"), F.col("cohort_week")) / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active_users")
    ).select(
        F.unix_millis("cohort_week").alias("cohort_week_ms"),
        "week_offset",
        "n_active_users",
    )


# ---------------------------------------------------------------------------
# event_interarrival_stats — distribution of per-user inter-event gaps
# by event type: for each consecutive event pair of a user (ordered by
# ts, event_id tiebreak), the gap is attributed to the LATER event's
# type. The engagement-cadence profile behind session-gap tuning
# (cf. sessionize_events' fixed 30-min threshold).
#
# Scale shape: one lag() window PARTITIONED BY user_id — millions of
# small partitions, never a global sort; the per-type rollup is a
# 4-row aggregate with map-side combine. Gaps are exact integer
# microseconds end-to-end (epoch_us both engines); the mean is
# integer DIV; the oracle CASTs its sum back to BIGINT (HUGEINT
# discipline).
# ---------------------------------------------------------------------------


@register(
    "event_interarrival_stats",
    oracle="""
WITH g AS (
  SELECT event_type,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
    ) AS gap_us
  FROM events
)
SELECT event_type,
  count(*) AS n_gaps,
  CAST(min(gap_us) AS BIGINT) AS min_gap_us,
  CAST(max(gap_us) AS BIGINT) AS max_gap_us,
  CAST(CAST(sum(gap_us) AS BIGINT) // count(*) AS BIGINT) AS avg_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY event_type
""",
)
def event_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    us = F.unix_micros(F.col("ts"))
    g = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.expr("CAST(sum(gap_us) DIV count(*) AS BIGINT)").alias("avg_gap_us"),
    )


# ---------------------------------------------------------------------------
# events_hourly_heatmap — ISO-weekday × hour-of-day activity matrix
# (counts + decimal-exact value sums): the load-profile heatmap every
# ops dashboard renders, and the seasonality input to capacity
# planning. Bounded 7×24 output at any stream size; single
# map-side-combined aggregate. Weekday is ISO (1 = Monday) in both
# engines: Spark weekday() is 0-based Monday, DuckDB isodow is
# 1-based Monday.
# ---------------------------------------------------------------------------


@register(
    "events_hourly_heatmap",
    oracle=f"""
SELECT CAST(isodow(ts) AS BIGINT) AS dow,
  CAST(hour(ts) AS BIGINT) AS hour,
  count(*) AS n_events,
  {_VALUE_SUM_SQL} AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def events_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.weekday("ts") + 1).cast("bigint").alias("dow"),
            F.hour("ts").cast("bigint").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _value_sum("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# attribution_last_touch — marketing attribution: each purchase is
# credited to the user's most recent click/view within a 7-day
# lookback. The canonical ad-analytics query (last-touch model), and a
# different window shape from the funnel: a conditional carry-forward
# (last_value IGNORE NULLS over a struct) rather than min-over-type.
#
# Scale shape: one window pass per user partition — the same
# partitioning every other per-user events operator shuffles on
# (exchange reuse in multi-op pipelines); no self-join of the events
# fact against itself. Gap arithmetic is integer microseconds.
# ---------------------------------------------------------------------------

ATTR_SOURCES = ("click", "view")
ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000


@register(
    "attribution_last_touch",
    oracle=f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
), tagged AS (
  SELECT *,
    last_value(CASE WHEN event_type IN {ATTR_SOURCES!r}
               THEN struct_pack(ts_us := ts_us, event_id := event_id,
                                event_type := event_type) END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr
  FROM e
)
SELECT event_id AS purchase_id, user_id,
  attr.event_id AS attr_event_id,
  attr.event_type AS attr_type,
  CAST(ts_us - attr.ts_us AS BIGINT) AS gap_us
FROM tagged
WHERE event_type = 'purchase' AND attr IS NOT NULL
  AND ts_us - attr.ts_us <= {ATTR_WINDOW_US}
""",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mk = F.when(
        F.col("event_type").isin(*ATTR_SOURCES),
        F.struct(
            F.col("ts_us"), F.col("event_id"), F.col("event_type")
        ),
    )
    tagged = ev.withColumn("attr", F.last(mk, ignorenulls=True).over(w))
    return (
        tagged.filter(
            (F.col("event_type") == "purchase")
            & F.col("attr").isNotNull()
            & (F.col("ts_us") - F.col("attr.ts_us") <= ATTR_WINDOW_US)
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("attr.event_id").alias("attr_event_id"),
            F.col("attr.event_type").alias("attr_type"),
            (F.col("ts_us") - F.col("attr.ts_us")).cast("bigint").alias("gap_us"),
        )
    )


# ---------------------------------------------------------------------------
# funnel_time_to_convert — distribution of signup→first-purchase delay:
# exact min/p25/p50/p75/max of the per-user conversion gap in integer
# microseconds, via sorted-rank selection (the same engine-exact
# order-statistic discipline as median_exact_by_segment — never a
# float quantile estimator, whose interpolation differs per engine;
# quartiles here are the lower order statistic at ceil(q·n)).
#
# Scale shape: per-user min-aggregations (map-side combined) produce
# one row per converting user; the quantile selection is a window rank
# over that bounded-by-users table, then a 5-row result.
# ---------------------------------------------------------------------------


@register(
    "funnel_time_to_convert",
    oracle="""
WITH s AS (
  SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT user_id, e.ts_us AS tp
  FROM (SELECT user_id AS uid, epoch_us(ts) AS ts_us FROM events
        WHERE event_type = 'purchase') e
  JOIN s ON e.uid = s.user_id AND e.ts_us >= s.t0
),
gap AS (
  SELECT s.user_id, min(tp) - t0 AS gap_us
  FROM s JOIN p ON s.user_id = p.user_id
  GROUP BY s.user_id, t0
),
ranked AS (
  SELECT gap_us,
    row_number() OVER (ORDER BY gap_us, user_id) AS rn,
    count(*) OVER () AS n
  FROM gap
)
SELECT
  CAST(count(*) AS BIGINT) AS n_converted,
  CAST(min(gap_us) AS BIGINT) AS min_gap_us,
  CAST(min(CASE WHEN rn * 4 >= n THEN gap_us END) AS BIGINT) AS p25_gap_us,
  CAST(min(CASE WHEN rn * 2 >= n THEN gap_us END) AS BIGINT) AS p50_gap_us,
  CAST(min(CASE WHEN rn * 4 >= n * 3 THEN gap_us END) AS BIGINT) AS p75_gap_us,
  CAST(max(gap_us) AS BIGINT) AS max_gap_us
FROM ranked
""",
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t0"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("uid"), F.col("ts_us").alias("tp")
    )
    gap = (
        s.join(p, (s.user_id == p.uid) & (p.tp >= s.t0))
        .groupBy("user_id", "t0")
        .agg(F.min("tp").alias("first_purchase"))
        .select("user_id", (F.col("first_purchase") - F.col("t0")).alias("gap_us"))
    )
    # unpartitioned window: one row per CONVERTED user — user-dim
    # bounded; exact percentile rank needs the global order. At the
    # 100-TB tier swap to approx_percentile and drop the window.
    w = Window.orderBy("gap_us", "user_id")
    ranked = gap.select(
        "gap_us",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    sel = lambda cond: F.min(F.when(cond, F.col("gap_us")))  # noqa: E731
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.min("gap_us").cast("bigint").alias("min_gap_us"),
        sel(F.col("rn") * 4 >= F.col("n")).cast("bigint").alias("p25_gap_us"),
        sel(F.col("rn") * 2 >= F.col("n")).cast("bigint").alias("p50_gap_us"),
        sel(F.col("rn") * 4 >= F.col("n") * 3).cast("bigint").alias("p75_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
    )


# ---------------------------------------------------------------------------
# heavy_hitters_cms — Count-Min Sketch (Cormode-Muthukrishnan '05)
# frequency estimation over the events fact, verified against the exact
# counts. The sketch is DEPTH x WIDTH integer cells; each occurrence
# increments one cell per depth row (hash_j(user) mod WIDTH); the
# estimate is the min over the depth cells, which upper-bounds the true
# count. Output: top-20 users by exact count with their CMS estimate
# and the (always >= 0) overcount — the self-audit a sketch deployment
# runs before trusting (depth, width).
#
# Determinism: hashes are md5-derived 32-bit integers identical in both
# engines (the minhash shingle-hash discipline); every cell and
# estimate is an exact BIGINT.
#
# Scale shape: the sketch build is a map-side-combined groupBy over a
# 4x-exploded scan whose output is hard-capped at DEPTH*WIDTH = 4096
# cells — constant size regardless of fact rows, so at 100 TB the
# sketch broadcasts to the probe side. The probe joins the per-user
# table against the broadcast sketch; the top-20 cut is orderBy+limit
# (TakeOrderedAndProject — per-partition heaps, no global sort), with
# the rank column added over the already-20-row result.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024
_CMS_TOPK = 20
_HEX_DIGITS = "0123456789abcdef"


def _md5_int32_sql(expr: str) -> str:
    """DuckDB twin of F.conv(substr(md5(expr),1,8),16,10): first 8 md5
    nibbles as a 32-bit integer."""
    return (
        "("
        + " + ".join(
            f"(strpos('{_HEX_DIGITS}', substr(md5({expr}), {i + 1}, 1)) - 1)"
            f" * {16 ** (7 - i)}"
            for i in range(8)
        )
        + ")"
    )


def _md5_int32_spark(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


_CMS_SEED_SQL = "CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)"


def cms_cells(ev: DataFrame) -> DataFrame:
    """(j, bucket, cell) CMS cells for ANY frame with a user_id column.

    Shared by the batch operator and the streaming twin in
    ``bpaotu_spark.streaming.jobs`` — a CMS is a cell-wise SUM of
    per-batch sketches, so the same groupBy accumulates it
    incrementally under Structured Streaming with no extra logic.
    """
    depths = F.explode(F.array(*[F.lit(j) for j in range(CMS_DEPTH)]))
    seed = F.concat_ws(
        ":", F.col("j").cast("string"), F.col("user_id").cast("string")
    )
    return (
        ev.select("user_id")
        .withColumn("j", depths)
        .withColumn("bucket", _md5_int32_spark(seed) % CMS_WIDTH)
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cell"))
    )


@register(
    "heavy_hitters_cms",
    oracle=f"""
WITH cells AS (
  SELECT j, {_md5_int32_sql(_CMS_SEED_SQL)} % {CMS_WIDTH} AS bucket,
         CAST(count(*) AS BIGINT) AS cell
  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
  GROUP BY 1, 2
),
exact AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_count
  FROM events GROUP BY user_id
),
probe AS (
  SELECT user_id, j, {_md5_int32_sql(_CMS_SEED_SQL)} % {CMS_WIDTH} AS bucket
  FROM exact CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
),
est AS (
  SELECT user_id, min(cell) AS cms_estimate
  FROM probe JOIN cells USING (j, bucket)
  GROUP BY user_id
),
ranked AS (
  SELECT e.user_id, exact_count, cms_estimate,
         CAST(cms_estimate - exact_count AS BIGINT) AS overcount,
         CAST(row_number() OVER (ORDER BY exact_count DESC, e.user_id ASC)
              AS INTEGER) AS rnk
  FROM exact e JOIN est USING (user_id)
)
SELECT user_id, exact_count, cms_estimate, overcount, rnk
FROM ranked WHERE rnk <= {_CMS_TOPK}
""",
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    seed = F.concat_ws(
        ":", F.col("j").cast("string"), F.col("user_id").cast("string")
    )
    depths = F.explode(F.array(*[F.lit(j) for j in range(CMS_DEPTH)]))
    cells = cms_cells(ev)
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    probe = (
        exact.select("user_id")
        .withColumn("j", depths)
        .withColumn("bucket", _md5_int32_spark(seed) % CMS_WIDTH)
    )
    est = (
        probe.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cell").alias("cms_estimate"))
    )
    top = (
        exact.join(est, "user_id")
        .orderBy(F.col("exact_count").desc(), F.col("user_id").asc())
        .limit(_CMS_TOPK)
    )
    # unpartitioned window bound: runs over the LIMIT-_CMS_TOPK cut
    w = Window.orderBy(F.col("exact_count").desc(), F.col("user_id").asc())
    return top.select(
        "user_id",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count"))
        .cast("bigint")
        .alias("overcount"),
        F.row_number().over(w).cast("int").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# attribution_time_decay — multi-touch attribution: every click/view in
# the 7 days before a purchase earns credit that HALVES per day of age
# (the standard time-decay model, vs the single-winner last-touch
# above). Weights are exact integer ppm: 1000000 div 2^age_days, so the
# report hashes bit-identically.
#
# Scale shape: purchases ⋈ touches is a self-join of the events fact on
# user_id — the same shuffle key as every other per-user operator
# (exchange reuse); per-user pair counts are bounded by the 7-day
# window, and the final rollup is a 2-key groupBy with map-side
# combine.
# ---------------------------------------------------------------------------

_DAY_US = 24 * 3600 * 1_000_000


@register(
    "attribution_time_decay",
    oracle=f"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
  WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
  WHERE event_type IN {ATTR_SOURCES!r}
),
credit AS (
  SELECT t.event_type AS attr_type,
         CAST((p.ts_us - t.ts_us) // {_DAY_US} AS BIGINT) AS age_days
  FROM p JOIN t ON p.user_id = t.user_id
  WHERE t.ts_us < p.ts_us AND p.ts_us - t.ts_us <= {ATTR_WINDOW_US}
)
SELECT attr_type, age_days,
  CAST(count(*) AS BIGINT) AS n_credits,
  CAST(count(*) * (1000000 // (1 << age_days)) AS BIGINT)
    AS total_weight_ppm
FROM credit GROUP BY attr_type, age_days
""",
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("p_us")
    )
    t = ev.filter(F.col("event_type").isin(*ATTR_SOURCES)).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("attr_type"),
        F.unix_micros("ts").alias("t_us"),
    )
    credit = p.join(
        t,
        (p.user_id == t.t_user)
        & (t.t_us < p.p_us)
        & (p.p_us - t.t_us <= ATTR_WINDOW_US),
    ).select(
        "attr_type",
        F.expr(f"CAST((p_us - t_us) DIV {_DAY_US} AS BIGINT)").alias("age_days"),
    )
    n = F.count(F.lit(1))
    weight = F.expr("1000000 DIV shiftleft(1, CAST(age_days AS INT))")
    return credit.groupBy("attr_type", "age_days").agg(
        n.alias("n_credits"),
        (n * weight).cast("bigint").alias("total_weight_ppm"),
    )


# ---------------------------------------------------------------------------
# event_user_paths_topk — sequence mining: the most common 3-step
# event-type paths users take (every consecutive triple in a user's
# time-ordered stream), the "what do users do next" flow query behind
# sankey/path-analysis UIs.
#
# Scale shape: one window pass per user partition (the shared per-user
# shuffle key), then a groupBy whose key cardinality is bounded by
# |event_type|^3 (125 here) — the rollup is map-side combined into
# almost nothing, and the top-k is a broadcast-size sort.
# ---------------------------------------------------------------------------

_PATHS_TOPK = 20


@register(
    "event_user_paths_topk",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
steps AS (
  SELECT event_type
      || '>' || lead(event_type, 1) OVER w
      || '>' || lead(event_type, 2) OVER w AS path
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
  QUALIFY lead(event_type, 2) OVER w IS NOT NULL
),
counted AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n FROM steps GROUP BY path
)
SELECT path, n,
  CAST(row_number() OVER (ORDER BY n DESC, path ASC) AS INTEGER) AS rnk
FROM counted
ORDER BY n DESC, path ASC
LIMIT {_PATHS_TOPK}
""",
)
def event_user_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    steps = (
        e.select(
            F.concat_ws(
                ">",
                F.col("event_type"),
                F.lead("event_type", 1).over(w),
                F.lead("event_type", 2).over(w),
            ).alias("path"),
            F.lead("event_type", 2).over(w).alias("_t2"),
        )
        .filter(F.col("_t2").isNotNull())
        .drop("_t2")
    )
    counted = steps.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    top = counted.orderBy(F.col("n").desc(), F.col("path").asc()).limit(
        _PATHS_TOPK
    )
    # unpartitioned window bound: runs over the LIMIT-_PATHS_TOPK cut
    wr = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    return top.select("path", "n", F.row_number().over(wr).cast("int").alias("rnk"))


# ---------------------------------------------------------------------------
# events_rolling_wau — trailing-7-day active users per day (the
# DAU/WAU pair every engagement dashboard leads with). Exact sliding
# distinct, computed scalably: the fact collapses to distinct
# (day, user) first, each such row contributes to the 7 calendar days
# it covers (bounded explode of an AGGREGATE, never the fact), and the
# per-target-day count is a distinct-count keyed by day — calendar
# gaps handled exactly, same discipline as revenue_ewma_daily.
# ---------------------------------------------------------------------------

_WAU_DAYS = 7


@register(
    "events_rolling_wau",
    oracle=f"""
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM du),
contrib AS (
  SELECT CAST(day + to_days(CAST(a AS INTEGER)) AS DATE) AS target_day,
         user_id
  FROM du CROSS JOIN (SELECT unnest(range({_WAU_DAYS})) AS a)
),
wau AS (
  SELECT target_day AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
  FROM contrib GROUP BY 1
),
dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY day
)
SELECT d.day, dau.dau, wau.wau,
  CAST(CAST(dau.dau AS HUGEINT) * 1000000 // wau.wau AS BIGINT)
    AS dau_wau_ppm
FROM days d JOIN dau ON d.day = dau.day JOIN wau ON d.day = wau.day
""",
)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    du = (
        load_table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
    )
    days = du.select("day").distinct()
    ages = F.explode(F.array(*[F.lit(a) for a in range(_WAU_DAYS)]))
    contrib = du.withColumn("a", ages).select(
        F.date_add("day", F.col("a").cast("int")).alias("day"), "user_id"
    )
    wau = contrib.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    dau = du.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    return (
        days.join(dau, "day")
        .join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.expr(
                "CAST(CAST(dau AS DECIMAL(38,0)) * 1000000 DIV wau AS BIGINT)"
            ).alias("dau_wau_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# event_debounce_dedup — gap-debounce census: an event is a "bounce"
# (dropped) when it lands within the debounce window of the PREVIOUS
# event in its (user_id, event_type) stream — double-clicks, retry
# storms, at-least-once delivery echoes. The lag-based rule ("gap to
# previous event", not "gap to previous KEPT event") is the form that
# is one window function — exactly computable in a single pass, and
# the usual production choice because it needs no iterative chain.
# Reports per event_type how much of the stream a debounce filter
# would drop.
#
# Scale: one shuffle on (user_id, event_type) for the lag window —
# the same partitioning sessionization uses — then a map-side
# combinable rollup. Deterministic: ties on ts break by event_id in
# BOTH engines.
# ---------------------------------------------------------------------------

DEBOUNCE_US = 60_000_000  # 60 s


@register(
    "event_debounce_dedup",
    oracle=f"""
WITH g AS (
  SELECT event_type,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {DEBOUNCE_US}
         THEN 1 ELSE 0 END AS keep
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC)
)
SELECT event_type,
  count(*) AS n_events,
  CAST(sum(keep) AS BIGINT) AS n_kept,
  CAST(count(*) - sum(keep) AS BIGINT) AS n_dropped,
  CAST((count(*) - sum(keep)) * 1000000 // count(*) AS BIGINT)
    AS drop_ppm
FROM g GROUP BY event_type
""",
)
def event_debounce_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    prev = F.lag("ts_us").over(w)
    keep = F.when(
        prev.isNull() | ((F.col("ts_us") - prev) > DEBOUNCE_US), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        ev.withColumn("keep", keep)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("keep").cast("bigint").alias("n_kept"),
            (F.count(F.lit(1)) - F.sum("keep"))
            .cast("bigint")
            .alias("n_dropped"),
            F.expr(
                "CAST((count(*) - sum(keep)) * 1000000 div count(*)"
                " AS BIGINT)"
            ).alias("drop_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# events_sliding_window_agg — SLIDING window aggregation (30-minute
# windows every 10 minutes): the Structured Streaming surface
# `groupBy(window(ts, "30 minutes", "10 minutes"))` in its batch form,
# completing the windowing family next to the tumbling
# events_windowed_agg. Each event belongs to exactly window/slide = 3
# overlapping windows; Spark materializes that expansion inside the
# window() expression, and the oracle proves the semantics by
# expanding explicitly (3-offset grid: the latest aligned start is
# floor(t/slide)·slide, minus k·slide for k < window/slide).
#
# Scale shape: the expansion multiplies the shuffle by window/slide
# (3x) BEFORE the map-side combine collapses it to per-(window, type)
# partials — the standard cost of sliding windows; keep window/slide
# small or switch to tumbling + rollup reuse when the ratio grows.
# In streaming form the same plan runs incrementally with a watermark
# (see streaming/jobs.py).
# ---------------------------------------------------------------------------

_SLIDE_MS = 600_000  # 10 minutes
_SLIDES_PER_WINDOW = 3  # 30-minute window / 10-minute slide


@register(
    "events_sliding_window_agg",
    oracle=f"""
SELECT
  (epoch_ms(ts) // {_SLIDE_MS} - k.k) * {_SLIDE_MS} AS window_start_ms,
  event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  {_VALUE_SUM_SQL} AS sum_value
FROM events
CROSS JOIN (SELECT unnest(range({_SLIDES_PER_WINDOW})) AS k) k
GROUP BY 1, 2
""",
)
def events_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "30 minutes", "10 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            _value_sum("sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
