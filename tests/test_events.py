"""Event operators: sessionization, as-of join, funnel, retention."""

from __future__ import annotations

import pyspark.sql.functions as F

from bpaotu_spark.operators.events import SESSION_GAP_MS
from bpaotu_spark.registry import QUERIES, load_all

load_all()


def test_sessionize_gap_semantics(spark, sf_dir):
    rows = QUERIES["sessionize_events"](spark, sf_dir).collect()
    assert rows
    # sessions of one user never overlap and are separated by > gap
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for sess in by_user.values():
        sess.sort(key=lambda r: r.session_start_ms)
        for a, b in zip(sess, sess[1:]):
            assert b.session_start_ms - a.session_end_ms > SESSION_GAP_MS


def test_sessionize_agrees_with_native_session_window(spark, sf_dir):
    """The lag+cumsum form and Spark's session_window must agree on
    session membership (start/count), modulo the documented >= vs >
    boundary and the end+gap convention."""
    a = QUERIES["sessionize_events"](spark, sf_dir)
    b = QUERIES["events_session_window"](spark, sf_dir)
    # compare (user, start, n_events) multisets on boundary-free data
    sa = {(r.user_id, r.session_start_ms, r.n_events) for r in a.collect()}
    sb = {(r.user_id, r.session_start_ms, r.n_events) for r in b.collect()}
    # identical unless an event lands exactly on the 30-min boundary
    only_a, only_b = sa - sb, sb - sa
    assert len(only_a) == len(only_b)
    assert len(only_a) <= 0.01 * len(sa)


def test_asof_join_latest_at_or_before(spark, sf_dir, tables):
    out = QUERIES["asof_join"](spark, sf_dir)
    assert out.count() == tables["events"].count()  # left-ish semantics
    sample = out.filter(F.col("o_orderkey").isNotNull()).limit(50).collect()
    orders = {
        (r.o_custkey, r.o_orderkey): r
        for r in tables["orders"].collect()
    }
    import datetime as dt

    for r in sample:
        assert r.order_ms <= r.ts_ms
        # no later order of the same user at-or-before the event
        later = [
            o
            for (cust, _), o in orders.items()
            if cust == r.user_id
            and int(o.o_orderdate.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
            > r.order_ms
            and int(o.o_orderdate.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
            <= r.ts_ms
        ]
        assert not later


def test_funnel_monotone(spark, sf_dir):
    r = QUERIES["funnel_conversion"](spark, sf_dir).collect()[0]
    assert r.n_signup >= r.n_signup_view >= r.n_full_funnel >= 0


def test_retention_bounded(spark, sf_dir):
    rows = QUERIES["retention_daily"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_retained <= r.n_active


def test_windowed_agg_counts(spark, sf_dir, tables):
    rows = QUERIES["events_windowed_agg"](spark, sf_dir).collect()
    assert sum(r.n_events for r in rows) == tables["events"].count()
    assert all(r.window_start_ms % 3_600_000 == 0 for r in rows)


def test_hourly_heatmap_bounds(spark, sf_dir, tables):
    rows = QUERIES["events_hourly_heatmap"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 7 * 24
    assert sum(r.n_events for r in rows) == tables["events"].count()
    for r in rows:
        assert 1 <= r.dow <= 7 and 0 <= r.hour <= 23


def test_cms_estimate_upper_bounds_exact(spark, sf_dir):
    """CMS never undercounts: estimate >= exact for every reported user,
    and the top-20 cut is ordered by exact count."""
    rows = QUERIES["heavy_hitters_cms"](spark, sf_dir).collect()
    assert rows
    assert all(r.overcount >= 0 for r in rows)
    assert all(r.cms_estimate >= r.exact_count for r in rows)
    ordered = sorted(rows, key=lambda r: (-r.exact_count, r.user_id))
    assert [r.rnk for r in ordered] == list(range(1, len(rows) + 1))


def test_time_decay_attribution_weights(spark, sf_dir):
    """Weights halve per day of age (exact ppm), ages stay inside the
    7-day lookback, and total weight = n_credits * 10^6 >> age."""
    rows = QUERIES["attribution_time_decay"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.age_days < 7
        assert r.attr_type in ("click", "view")
        assert r.total_weight_ppm == r.n_credits * (1_000_000 >> r.age_days)


def test_user_paths_are_valid_type_triples(spark, sf_dir):
    types = {"signup", "click", "view", "purchase", "error"}
    rows = QUERIES["event_user_paths_topk"](spark, sf_dir).collect()
    assert rows and len(rows) <= 20
    for r in rows:
        parts = r.path.split(">")
        assert len(parts) == 3 and all(p in types for p in parts)
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_rolling_wau_bounds(spark, sf_dir):
    """WAU >= DAU always; WAU never exceeds the sum of the window's
    DAUs; ratio ppm <= 1e6."""
    import datetime

    rows = QUERIES["events_rolling_wau"](spark, sf_dir).collect()
    assert rows
    dau = {r.day: r.dau for r in rows}
    for r in rows:
        assert r.wau >= r.dau
        window_sum = sum(
            dau.get(r.day - datetime.timedelta(days=a), 0) for a in range(7)
        )
        assert r.wau <= window_sum
        assert 0 < r.dau_wau_ppm <= 1_000_000


def test_debounce_census_consistent(spark, sf_dir):
    """kept + dropped = total per type; at least one event always kept
    per (user, type) stream implies kept >= distinct streams > 0."""
    from bpaotu_spark.registry import QUERIES

    rows = QUERIES["event_debounce_dedup"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_kept + r.n_dropped == r.n_events
        assert r.n_kept >= 1
        assert r.drop_ppm == r.n_dropped * 1_000_000 // r.n_events
