"""Core OLAP operators: result sanity + plan-shape assertions.

Plan shape is the scale contract: dim joins must be broadcast (no
fact-side shuffle) and filters must reach the parquet scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bpaotu_spark.registry import QUERIES, load_all

load_all()


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_groups(spark, sf_dir):
    rows = QUERIES["q1_pricing_summary"](spark, sf_dir).collect()
    assert len(rows) == 6  # 3 returnflags x 2 linestatuses minus empty combos
    by_key = {(r.l_returnflag, r.l_linestatus): r for r in rows}
    for r in rows:
        assert r.sum_qty > 0 and r.count_order > 0
        assert r.sum_disc_price <= r.sum_base_price
    assert ("R", "F") in by_key


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    p = plan(QUERIES["q1_pricing_summary"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p


def test_q3_broadcasts_dims(spark, sf_dir):
    p = plan(QUERIES["q3_shipping_priority"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_q5_star_join_all_broadcast(spark, sf_dir):
    df = QUERIES["q5_local_supplier_volume"](spark, sf_dir)
    p = plan(df)
    # 5 dim joins, every one broadcast: the lineitem fact never shuffles
    # before aggregation. (formatted plans print each node twice: once in
    # the tree, once as a "(n) BroadcastHashJoin" detail header)
    import re

    assert len(re.findall(r"^\(\d+\) BroadcastHashJoin", p, re.M)) == 5
    assert "SortMergeJoin" not in p
    rows = df.collect()
    assert all(r.revenue > 0 for r in rows)


def test_topk_per_group_k(spark, sf_dir):
    rows = QUERIES["topk_per_group"](spark, sf_dir).collect()
    from collections import Counter

    per_brand = Counter(r.p_brand for r in rows)
    assert max(per_brand.values()) <= 3
    assert all(1 <= r.rnk <= 3 for r in rows)


def test_rollup_has_grand_total(spark, sf_dir):
    rows = QUERIES["rollup_hierarchy"](spark, sf_dir).collect()
    grand = [r for r in rows if r.r_name is None and r.n_name is None]
    assert len(grand) == 1
    assert grand[0].n_customers == 150


def test_cube_has_all_groupings(spark, sf_dir):
    rows = QUERIES["cube_returns"](spark, sf_dir).collect()
    # grand total + per-flag + per-status + per-pair
    grand = [r for r in rows if r.l_returnflag is None and r.l_linestatus is None]
    assert len(grand) == 1
    assert grand[0].n_items == sum(
        r.n_items for r in rows if r.l_returnflag is not None and r.l_linestatus is not None
    )


def test_pivot_wide_counts(spark, sf_dir, tables):
    rows = QUERIES["pivot_wide"](spark, sf_dir).collect()
    total = sum(r.cnt_o + r.cnt_f + r.cnt_p for r in rows)
    assert total == tables["orders"].count()


def test_histogram_covers_all_rows(spark, sf_dir, tables):
    rows = QUERIES["histogram_binning"](spark, sf_dir).collect()
    assert sum(r.n_items for r in rows) == tables["lineitem"].count()
    for r in rows:
        assert r.bin_lo == r.bin * 5000


def test_decile_stats_monotone(spark, sf_dir):
    rows = sorted(QUERIES["decile_stats"](spark, sf_dir).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert a.max_price <= b.min_price  # deciles partition the sorted order


def test_q16_anti_join_plan(spark, sf_dir):
    df = QUERIES["q16_antijoin_parts"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "LeftAnti" in plan


def test_q18_threshold_respected(spark, sf_dir):
    for r in QUERIES["q18_large_orders"](spark, sf_dir).collect():
        assert r.total_qty > 150


def test_sql_api_parity_q1(spark, sf_dir):
    """register_views + raw spark.sql must give the same result as the
    DataFrame form — the reference's users write SQL."""
    from bpaotu_spark.catalog import register_views

    register_views(spark, sf_dir)
    sql_rows = {
        tuple(r)
        for r in spark.sql(
            """
            SELECT l_returnflag, l_linestatus, count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            """
        ).collect()
    }
    df_rows = {
        (r.l_returnflag, r.l_linestatus, r.count_order)
        for r in QUERIES["q1_pricing_summary"](spark, sf_dir).collect()
    }
    assert sql_rows == df_rows


def test_basket_brand_lift_bounds(spark, sf_dir):
    """Pairs are canonical (a < b); support is a valid ppm; lift is
    positive; pair count never exceeds either brand's support."""
    rows = QUERIES["basket_brand_lift"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.brand_a < r.brand_b
        assert 0 < r.support_ppm <= 1_000_000
        assert r.lift > 0
        assert r.n_ab >= 1


def test_table_profile_one_scan_counts(spark, sf_dir, tables):
    rows = {r.col_name: r for r in QUERIES["table_profile"](spark, sf_dir).collect()}
    n = tables["customer"].count()
    assert set(rows) == {
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    }
    for r in rows.values():
        assert r.n_rows == n
        assert 0 <= r.n_nulls <= n
        assert 1 <= r.n_distinct <= n
    assert rows["c_custkey"].n_distinct == n  # key column is unique


def test_event_interarrival_positive_gaps(spark, sf_dir):
    rows = QUERIES["event_interarrival_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_gaps > 0
        assert 0 <= r.min_gap_us <= r.avg_gap_us <= r.max_gap_us


def test_daily_revenue_anomaly_zscore(spark, sf_dir):
    """z matches a driver-side recomputation from the same daily
    totals; first 7 days have no row; flag equals |z| > 2."""
    import math

    rows = QUERIES["daily_revenue_anomaly"](spark, sf_dir).collect()
    assert rows
    daily = {r.day: r.day_total for r in rows}
    days = sorted(daily)
    by_day = {r.day: r for r in rows}
    for i, d in enumerate(days):
        r = by_day[d]
        if i < 7:
            continue  # needs a full trailing week of *emitted* days
        trail = [daily[x] for x in days[i - 7 : i]]
        m = sum(trail) / 7
        var = (sum(v * v for v in trail) - sum(trail) ** 2 / 7) / 6
        if r.z is not None and var > 0:
            z = (r.day_total - m) / math.sqrt(var)
            assert abs(z - r.z) < 1e-3
            assert r.is_anomaly == (abs(r.z) > 2.0)


def test_rfm_scores_valid_and_tie_safe(spark, sf_dir):
    """Scores live in 1..5; equal metric values always share a score
    (tie-safety NTILE lacks); rfm_code recomposes the digits."""
    rows = QUERIES["customer_rfm_segments"](spark, sf_dir).collect()
    assert rows
    by_r, by_f = {}, {}
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        assert r.rfm_code == r.r_score * 100 + r.f_score * 10 + r.m_score
        assert by_r.setdefault(r.r_days, r.r_score) == r.r_score
        assert by_f.setdefault(r.f_orders, r.f_score) == r.f_score
    # both extremes of the scale appear on a non-degenerate corpus
    assert {min(by_f.values()), max(by_f.values())} <= set(range(1, 6))


def test_supplier_return_rate_bounds(spark, sf_dir, tables):
    rows = QUERIES["supplier_return_rate"](spark, sf_dir).collect()
    assert len(rows) == tables["supplier"].count()
    assert sum(r.n_lines for r in rows) == tables["lineitem"].count()
    for r in rows:
        assert 0 <= r.n_returned <= r.n_lines
        assert r.return_ppm == r.n_returned * 1_000_000 // r.n_lines


def test_orders_open_backlog_conserves_mass(spark, sf_dir, tables):
    """Backlog telescopes: final n_open = total opens - total closes;
    backlog never goes negative on the driver data (every order's
    lineitems ship after its order date)."""
    rows = QUERIES["orders_open_backlog_daily"](spark, sf_dir).collect()
    rows.sort(key=lambda r: r.day)
    n_orders = tables["orders"].count()
    assert sum(r.n_opened for r in rows) == n_orders
    assert rows[-1].n_open == sum(r.n_opened for r in rows) - sum(
        r.n_closed for r in rows
    )
    running = 0
    for r in rows:
        running += r.n_opened - r.n_closed
        assert r.n_open == running
        assert r.n_open >= 0


def test_robust_anomaly_mad_matches_numpy(spark, sf_dir):
    """Spot-check the integer order-statistic arithmetic against numpy
    medians on the trailing windows."""
    import numpy as np

    rows = QUERIES["robust_anomaly_mad"](spark, sf_dir).collect()
    rows.sort(key=lambda r: r.day)
    cents = [r.revenue_cents for r in rows]
    for i in (6, 100, len(rows) - 1):
        win = cents[max(0, i - 6) : i + 1]
        med = np.median(win)
        assert rows[i].med2_cents == int(2 * med)
        mad = np.median([abs(c - med) for c in win])
        assert rows[i].mad4_cents == int(4 * mad)
        expect = len(win) >= 7 and abs(cents[i] - med) > 3 * mad
        assert rows[i].is_anomaly == expect


def test_attribution_last_touch_semantics(spark, sf_dir, tables):
    """Every attribution points at the user's true last click/view
    before the purchase, within the window."""
    ev = sorted(
        tables["events"].collect(), key=lambda r: (r.user_id, r.ts, r.event_id)
    )
    rows = QUERIES["attribution_last_touch"](spark, sf_dir).collect()
    by_purchase = {r.purchase_id: r for r in rows}
    from collections import defaultdict

    per_user = defaultdict(list)
    for e in ev:
        per_user[e.user_id].append(e)
    window_us = 7 * 24 * 3600 * 1_000_000
    n_expected = 0
    for user, es in per_user.items():
        last_mkt = None
        for e in es:
            if e.event_type == "purchase":
                if last_mkt is not None:
                    gap = int(
                        (e.ts - last_mkt.ts).total_seconds() * 1_000_000
                    )
                    if gap <= window_us:
                        n_expected += 1
                        r = by_purchase[e.event_id]
                        assert r.attr_event_id == last_mkt.event_id
                        assert r.attr_type == last_mkt.event_type
            if e.event_type in ("click", "view"):
                last_mkt = e
    assert len(rows) == n_expected


def test_funnel_time_to_convert_quantiles(spark, sf_dir, tables):
    """Quantiles reconcile with a driver-side recomputation of the
    per-user conversion gaps."""
    row = QUERIES["funnel_time_to_convert"](spark, sf_dir).collect()[0]
    ev = tables["events"].collect()
    from collections import defaultdict

    signups, purchases = {}, defaultdict(list)
    for e in ev:
        if e.event_type == "signup":
            t = signups.get(e.user_id)
            signups[e.user_id] = min(t, e.ts) if t else e.ts
        elif e.event_type == "purchase":
            purchases[e.user_id].append(e.ts)
    gaps = sorted(
        int((min(p for p in purchases[u] if p >= t0) - t0).total_seconds() * 1e6)
        for u, t0 in signups.items()
        if any(p >= t0 for p in purchases.get(u, []))
    )
    assert row.n_converted == len(gaps)
    assert row.min_gap_us == gaps[0] and row.max_gap_us == gaps[-1]
    n = len(gaps)
    assert row.p50_gap_us == gaps[-(-n // 2) - 1]  # ceil(n/2)-th, 0-based
    assert row.p25_gap_us == gaps[-(-n // 4) - 1]
    assert row.p75_gap_us == gaps[-(-(3 * n) // 4) - 1]


def test_seasonality_mass(spark, sf_dir):
    """Weighted mean of the weekday indices equals 1e6 (by definition
    the index is centered), and days partition the calendar."""
    rows = QUERIES["revenue_seasonality_weekday"](spark, sf_dir).collect()
    assert len(rows) == 7
    total_days = sum(r.n_days for r in rows)
    total_cents = sum(r.total_cents for r in rows)
    for r in rows:
        expect = r.total_cents * total_days * 1_000_000 // (
            r.n_days * total_cents
        )
        assert r.seasonality_ppm == expect


def test_fulfillment_latency_bounds(spark, sf_dir, tables):
    rows = QUERIES["order_fulfillment_latency"](spark, sf_dir).collect()
    assert rows
    n_orders_with_lines = (
        tables["lineitem"].select("l_orderkey").distinct().count()
    )
    assert sum(r.n_orders for r in rows) == n_orders_with_lines

    # Spark DIV / DuckDB // truncate toward zero; Python // floors —
    # they differ on the negative latencies the generator produces
    # (some lineitems ship before their order date)
    def trunc_div(a, b):
        return int(a / b)

    for r in rows:
        assert r.min_days <= r.avg_days_floor <= r.max_days
        assert trunc_div(r.min_days, 30) == r.latency_bucket == trunc_div(r.max_days, 30)


def test_supplier_lead_time_trend_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = QUERIES["supplier_lead_time_trend"](spark, sf_dir).collect()
    assert rows
    # rebuild one supplier's regression from the raw join
    from bpaotu_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    target = rows[0].suppkey
    xy = (
        li.filter(F.col("l_suppkey") == target)
        .join(od, li.l_orderkey == od.o_orderkey)
        .select(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1995-01-01").cast("date"),
            ).alias("x"),
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("y"),
        )
        .collect()
    )
    xs = np.array([r.x for r in xy], float)
    ys = np.array([r.y for r in xy], float)
    slope_np = 365.0 * np.polyfit(xs, ys, 1)[0]
    got = rows[0]
    assert got.n == len(xy)
    assert abs(got.avg_delay_days - ys.mean()) < 1e-3
    assert abs(got.slope_days_per_year - slope_np) < 1e-2


def test_repeat_purchase_intervals_mass(spark, sf_dir, tables):
    """Gap count equals orders minus distinct customers (each customer
    contributes n_orders - 1 gaps); bucket bounds hold."""
    rows = QUERIES["repeat_purchase_intervals"](spark, sf_dir).collect()
    assert rows
    n_orders = tables["orders"].count()
    n_cust = tables["orders"].select("o_custkey").distinct().count()
    assert sum(r.n_gaps for r in rows) == n_orders - n_cust
    for r in rows:
        assert 0 <= r.min_days <= r.max_days
        assert r.min_days // 30 == r.gap_bucket == r.max_days // 30
        assert 1 <= r.n_customers <= r.n_gaps
