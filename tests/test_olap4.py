"""Round-5 continuation operators: result sanity + plan-shape checks.

Value correctness is covered by tools/check.py (DuckDB oracle compare)
at sf0.001 and sf0.01; these tests pin the invariants the oracle can't
see — plan shape (broadcasts, no global sort of the customer set) and
semantic properties (shares sum to 1e6, k-means determinism).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bpaotu_spark.registry import QUERIES, load_all

load_all()


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_pareto_curve_monotone_and_complete(spark, sf_dir):
    rows = QUERIES["customer_pareto_share"](spark, sf_dir).collect()
    by_rank = sorted(rows, key=lambda r: r.rank)
    assert [r.rank for r in by_rank] == list(range(1, len(rows) + 1))
    # cumulative share is monotone and ends at exactly 1e6 ppm (floor
    # division reaches the full total only on the last row)
    shares = [r.cum_share_ppm for r in by_rank]
    assert shares == sorted(shares)
    assert shares[-1] == 1_000_000
    # revenue is ranked descending
    revs = [r.revenue_cents for r in by_rank]
    assert revs == sorted(revs, reverse=True)
    # the top-80 set is a prefix of the ranking
    flags = [r.is_top80 for r in by_rank]
    assert flags == sorted(flags, reverse=True)


def test_pareto_no_global_sort_of_customers(spark, sf_dir):
    # the scale contract: ranking is shard-local; the only global Sort
    # allowed is over the ~40-row shard-totals table, which the plan
    # shows as a single-partition window AFTER an aggregate — the
    # customer-level window must be hash-partitioned by shard
    p = plan(QUERIES["customer_pareto_share"](spark, sf_dir))
    assert "hashpartitioning(shard" in p


def test_cohort_ltv_age_zero_active(spark, sf_dir):
    rows = QUERIES["cohort_ltv_matrix"](spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_month, []).append(r)
    for cells in by_cohort.values():
        cells.sort(key=lambda r: r.age_months)
        # every cohort has an age-0 cell (the first order itself)
        assert cells[0].age_months == 0
        # n_active at age 0 == cohort size; never exceeds it later
        assert cells[0].n_active == cells[0].cohort_size
        assert all(c.n_active <= c.cohort_size for c in cells)
        # cumulative revenue is non-decreasing
        cums = [c.cum_revenue_cents for c in cells]
        assert cums == sorted(cums)


def test_hhi_bounds(spark, sf_dir):
    rows = QUERIES["part_brand_hhi"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 1/n ≤ HHI ≤ 1 (ppm, floor-divided so allow the floor slack)
        assert 1_000_000 // r.n_suppliers - 1 <= r.hhi_ppm <= 1_000_000
        assert r.top_share_ppm <= 1_000_000
        assert r.hhi_ppm <= r.top_share_ppm * r.n_suppliers


def test_transitions_probabilities_sum(spark, sf_dir):
    rows = QUERIES["event_type_transitions"](spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    by_prev = defaultdict(int)
    for r in rows:
        by_prev[r.prev_type] += r.prob_ppm
    for prev, total in by_prev.items():
        # floor division loses < #next-types ppm per row
        assert 1_000_000 - len(rows) <= total <= 1_000_000, prev


def test_bounce_rate_bounds(spark, sf_dir):
    rows = QUERIES["session_bounce_rate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_bounces <= r.n_sessions
        assert 0 <= r.bounce_ppm <= 1_000_000


def test_stickiness_bounds(spark, sf_dir):
    rows = QUERIES["user_stickiness_monthly"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # user_days ≤ mau · days_in_month by construction
        assert r.user_days <= r.mau * r.days_in_month
        assert 0 < r.stickiness_ppm <= 1_000_000


def test_source_novelty_partition_of_grams(spark, sf_dir):
    rows = QUERIES["source_novelty_ngrams"](spark, sf_dir).collect()
    assert rows
    # every distinct gram has exactly one first owner, so novel counts
    # across sources partition the distinct-gram universe
    total_novel = sum(r.n_novel for r in rows)
    n_distinct = (
        QUERIES["source_novelty_ngrams"].__globals__["doc_ngrams"](
            spark, sf_dir
        )
        .select("g")
        .distinct()
        .count()
    )
    assert total_novel == n_distinct
    for r in rows:
        assert 0 <= r.n_novel <= r.n_grams


def test_norm_profile_order(spark, sf_dir):
    rows = QUERIES["embedding_norm_profile"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.min_norm2 * 2 <= r.med2_norm2 <= r.max_norm2 * 2
        assert r.min_norm2 <= r.mean_norm2_floor <= r.max_norm2


def test_kmeans_deterministic_and_partitioning(spark, sf_dir):
    df = QUERIES["kmeans_embeddings"](spark, sf_dir)
    a = sorted(
        (r.cluster_id, r.n_members, r.inertia_mega) for r in df.collect()
    )
    b = sorted(
        (r.cluster_id, r.n_members, r.inertia_mega)
        for r in QUERIES["kmeans_embeddings"](spark, sf_dir).collect()
    )
    assert a == b  # bit-identical across runs
    total = sum(n for _, n, _ in a)
    from bpaotu_spark.catalog import load_table

    assert total == load_table(spark, sf_dir, "embeddings").count()


def test_kmeans_broadcast_centroids(spark, sf_dir):
    # the assignment pass must broadcast the K-row centroid table —
    # a SortMergeJoin against the corpus would be the wrong plan.
    # Since late-r15 the Lloyd rounds run in the store BUILD
    # (_km_final_cached); the query itself reads the assignment, so
    # the shape assertion targets the build plan.
    from bpaotu_spark.ann.core import _KM_ITERS, _KM_K, _NP_Q, _km_assign, _km_update
    from bpaotu_spark.catalog import load_table
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * _NP_Q),
        ).alias("q"),
    )
    w8 = Window.orderBy("vec_id")
    c = (
        e.orderBy("vec_id")
        .limit(_KM_K)
        .select(
            (F.row_number().over(w8) - 1).cast("bigint").alias("cid"),
            F.col("q").alias("c"),
        )
    )
    for _ in range(_KM_ITERS):
        c = _km_update(_km_assign(e, c))
    p = plan(_km_assign(e, c).select("vec_id", "cid", "d2"))
    assert "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p
    # and the served query plan carries NO join at all — a pure
    # aggregate over the store read
    pq = plan(QUERIES["kmeans_embeddings"](spark, sf_dir))
    assert "Join" not in pq


def test_trade_flow_shares_and_domestic(spark, sf_dir):
    rows = QUERIES["nation_trade_flow"](spark, sf_dir).collect()
    assert rows
    assert sum(r.share_ppm for r in rows) <= 1_000_000
    assert any(r.is_domestic for r in rows) or len(rows) < 25


def test_prevalence_spectrum_partitions_otus(spark, sf_dir):
    rows = QUERIES["otu_prevalence_spectrum"](spark, sf_dir).collect()
    assert rows
    from bpaotu_spark.operators.bpaotu import abundance

    n_otus = abundance(spark, sf_dir).select("otu_id").distinct().count()
    assert sum(r.n_otus for r in rows) == n_otus
    for r in rows:
        assert 0 <= r.occupancy_decile <= 10
        assert r.min_prevalence <= r.max_prevalence


def test_length_gini_bounds(spark, sf_dir):
    rows = QUERIES["source_length_gini"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Gini of non-negative values lies in [0, 1); floor slack −1
        assert -1 <= r.gini_ppm < 1_000_000


def test_daily_median_rank_selection(spark, sf_dir):
    rows = QUERIES["event_value_daily_median"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.min_micro * 2 <= r.med2_micro <= r.max_micro * 2
        assert r.med2_micro <= r.p90_micro * 2
        assert r.p90_micro <= r.max_micro


def test_token_entropy_bounds(spark, sf_dir):
    rows = QUERIES["text_token_entropy"](spark, sf_dir).collect()
    assert rows
    import math

    for r in rows:
        assert 1 <= r.n_types <= r.n_tokens
        assert 0 < r.type_token_ppm <= 1_000_000
        # 0 ≤ H ≤ ln(n_types); micro-nat flooring slack ≤ 2n
        assert -2 * r.n_tokens <= r.nH_micronats
        assert r.nH_micronats <= r.n_tokens * (
            math.log(max(r.n_types, 1)) * 1e6 + 2
        )


def test_band_migration_rows_and_probs(spark, sf_dir):
    rows = QUERIES["customer_value_band_migration"](spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    by_from = defaultdict(int)
    for r in rows:
        assert r.band_from in {"S", "M", "L", "XL"}
        assert r.band_to in {"S", "M", "L", "XL"}
        by_from[r.band_from] += r.prob_ppm
    for total in by_from.values():
        assert 1_000_000 - 4 <= total <= 1_000_000


def test_bloom_semijoin_no_false_negatives(spark, sf_dir):
    """The Bloom pass must admit every true member (zero false
    negatives — the filter-correctness invariant) and its fp rate
    should be far below the ~2.4% expectation ceiling for
    k=3, 65536 bits at this key count."""
    r = QUERIES["bloom_semijoin_filter"](spark, sf_dir).collect()[0]
    assert r.n_false_neg == 0
    assert r.n_members <= r.n_pass <= r.n_orders
    assert r.fp_rate_ppm < 100_000


def test_ewma_between_min_max_of_window(spark, sf_dir):
    """The weighted mean lies within [min, max] of the contributing
    window, and a day with no prior days inside the support equals its
    own revenue."""
    rows = QUERIES["revenue_ewma_daily"](spark, sf_dir).collect()
    assert rows
    by_day = {r.day: r.revenue_cents for r in rows}
    import datetime

    for r in rows:
        window = [
            by_day[r.day - datetime.timedelta(days=a)]
            for a in range(10)
            if (r.day - datetime.timedelta(days=a)) in by_day
        ]
        assert min(window) <= r.ewma_cents <= max(window) + 1


def test_yoy_growth_identity(spark, sf_dir):
    """Growth ppm re-derives from the reported cents pair (truncating
    division), and every row is a consecutive-year pair."""
    rows = QUERIES["orders_yoy_growth"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.prev_cents > 0
        q, rem = divmod((r.cents - r.prev_cents) * 1_000_000, r.prev_cents)
        want = q if (r.cents - r.prev_cents) >= 0 or rem == 0 else q + 1
        assert r.yoy_growth_ppm == want  # truncation toward zero


def test_discount_bands_cover_fact(spark, sf_dir):
    """Band census covers every lineitem row; unit economics re-derive
    from the reported integers."""
    from bpaotu_spark.catalog import load_table

    rows = QUERIES["discount_effectiveness"](spark, sf_dir).collect()
    assert rows
    n = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r.n_items for r in rows) == n
    for r in rows:
        assert 0 <= r.discount_pct <= 100
        assert r.cents_per_item == r.revenue_cents // r.n_items
        assert r.qty_per_item_ppm == r.total_qty * 1_000_000 // r.n_items


def test_hierarchy_shares_sum_within_parent(spark, sf_dir):
    """Leaf shares of each brand sum to ~1e6 ppm (floor slack < number
    of leaves), and grand shares re-derive from the integers."""
    from collections import defaultdict

    rows = QUERIES["hierarchy_share_of_parent"](spark, sf_dir).collect()
    assert rows
    per_brand = defaultdict(list)
    total = sum(r.revenue_cents for r in rows)
    for r in rows:
        per_brand[r.p_brand].append(r)
        assert r.share_of_total_ppm == r.revenue_cents * 1_000_000 // total
    for rs in per_brand.values():
        s = sum(r.share_of_brand_ppm for r in rs)
        assert 1_000_000 - len(rs) < s <= 1_000_000
        assert all(
            r.brand_cents == sum(x.revenue_cents for x in rs) for r in rs
        )


def test_kmv_sketch_fallback_and_error_bound(spark, sf_dir):
    """Brands with fewer than K distinct parts report exact counts
    (estimate == exact, err 0); estimator output is always positive
    and err_ppm consistent with |est - exact|."""
    from bpaotu_spark.operators.audit import _KMV_K
    from bpaotu_spark.registry import QUERIES

    rows = QUERIES["approx_distinct_kmv"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.kmv_estimate >= 1
        if r.n_exact < _KMV_K:
            assert r.kmv_estimate == r.n_exact and r.err_ppm == 0
        else:
            assert r.err_ppm == abs(r.kmv_estimate - r.n_exact) * 1_000_000 // r.n_exact
