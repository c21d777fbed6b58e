"""Round-11 late additions: the left-outer stream-stream interval
join (watermark-expiry emission of non-converting signups), the
two-phase annealing mixture plan, and per-source quality-threshold
calibration."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from bpaotu_spark.registry import QUERIES, load_all

load_all()

_RANGE_MS = 3600 * 1000
_DELAY_MS = 2 * 3600 * 1000


def test_outer_conversion_inner_arm_matches_inner_twin(spark, sf_dir):
    """The outer twin restricted to converted=true must equal the
    inner twin row-for-row (the outer arm only ADDS null-padded
    signups)."""
    outer = {
        (r.signup_id, r.n_purchases, r.first_purchase_ms, r.total_value_cents)
        for r in QUERIES["events_signup_conversion_outer"](spark, sf_dir)
        .filter("converted")
        .collect()
    }
    inner = {
        (r.signup_id, r.n_purchases, r.first_purchase_ms, r.total_value_cents)
        for r in QUERIES["events_purchases_after_signup"](spark, sf_dir).collect()
    }
    assert outer == inner


def test_outer_stream_join_emits_expired_signups(spark, sf_dir, tmp_path):
    """The watermarked LEFT OUTER stream-stream join must emit one
    null-padded row per non-converting signup once the watermark
    passes ts_s + range — verified against the batch twin on the
    provably-expired subset, with soundness over the whole output."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from bpaotu_spark.streaming.jobs import (
        EVENTS_STREAM_SCHEMA,
        purchases_after_signup_outer_stream,
        run_to_memory,
    )

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    n, k = t.num_rows, 4
    src = tmp_path / "evstream"
    src.mkdir()
    bounds = [i * n // k for i in range(k)] + [n]
    for i in range(k):
        p = src / f"chunk{i}.parquet"
        pq.write_table(t.slice(bounds[i], bounds[i + 1] - bounds[i]), p)
        os.utime(p, (1_000_000_000 + i, 1_000_000_000 + i))

    raw = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    )
    run_to_memory(
        purchases_after_signup_outer_stream(raw), "ssj_outer", complete=False
    )
    out = spark.table("ssj_outer").collect()
    null_ids = {r.signup_id for r in out if r.ts_p is None}
    matched_ids = {r.signup_id for r in out if r.ts_p is not None}

    batch = QUERIES["events_signup_conversion_outer"](spark, sf_dir).collect()
    nonconv = {r.signup_id for r in batch if not r.converted}

    # Soundness: every null row is a genuinely non-converting signup,
    # and no signup appears both matched and null-padded.
    assert null_ids <= nonconv
    assert not (null_ids & matched_ids)

    # Completeness on the provably-expired subset: the watermark the
    # final micro-batch runs with is derived from chunks 0..k-2, so a
    # non-converting signup with
    #   ts_s + range < max_ts(chunks 0..k-2) - delay
    # MUST have been emitted (1s slack for ms truncation).
    ts_arr = t.slice(0, bounds[k - 1]).column("ts")
    anchor = pc.max(ts_arr).cast(pa.int64()).as_py()
    unit = ts_arr.type.unit
    anchor_ms = anchor // {"s": 1, "ms": 1, "us": 1_000, "ns": 1_000_000}[
        unit
    ] * (1000 if unit == "s" else 1)
    cutoff_ms = anchor_ms - _DELAY_MS - _RANGE_MS - 1000
    expired = {
        r.signup_id
        for r in batch
        if not r.converted and r.signup_ms < cutoff_ms
    }
    assert expired, "fixture must contain a safely-expired non-converting signup"
    assert expired <= null_ids

    # Inner arm: matched signups == the batch twin's converted set
    # (inner rows emit immediately; no watermark gate).
    conv = {r.signup_id for r in batch if r.converted}
    assert matched_ids == conv


def test_anneal_mixture_budget_and_eligibility(spark, sf_dir):
    """Budget conservation (floors lose < 1 token per source per
    phase), phase-2 restricted to eligible sources, and epochs_milli
    consistency."""
    rows = QUERIES["corpus_anneal_mixture"](spark, sf_dir).collect()
    assert rows
    mass = sum(r.token_mass for r in rows)
    b_total = 2 * mass
    b2 = b_total // 10
    b1 = b_total - b2
    p1 = sum(r.phase1_tokens for r in rows)
    p2 = sum(r.phase2_tokens for r in rows)
    ns = len(rows)
    assert b1 - ns <= p1 <= b1
    assert p2 <= b2
    if any(r.eligible_anneal for r in rows):
        assert b2 - ns <= p2
    for r in rows:
        if not r.eligible_anneal:
            assert r.phase2_tokens == 0
        if r.token_mass > 0:
            want = (r.phase1_tokens + r.phase2_tokens) * 1000 // r.token_mass
            assert r.epochs_milli == want
        else:
            assert r.phase1_tokens == 0 and r.phase2_tokens == 0


def test_quality_threshold_calibration_invariants(spark, sf_dir):
    """Per-source calibrated keep is >= floor(n_s/2) (ties over-keep)
    and every source shares the same global threshold; keep counts
    are consistent with their shares."""
    rows = QUERIES["quality_threshold_calibration"](spark, sf_dir).collect()
    assert rows
    t_globals = {r.t_global_milli for r in rows}
    assert len(t_globals) == 1
    for r in rows:
        assert r.n_keep_cal >= r.n_docs // 2
        assert 0 <= r.n_keep_raw <= r.n_docs
        assert r.raw_share_milli == r.n_keep_raw * 1000 // r.n_docs
        assert r.cal_share_milli == r.n_keep_cal * 1000 // r.n_docs


def test_cluster_balanced_plan_quotas_and_geometry(spark, sf_dir):
    """Quotas follow min(n_c, budget/K) with the same cluster sizes as
    kmeans_embeddings, and the selected-members mean d2 is a real
    per-cluster statistic (0 only if a cluster got quota 0)."""
    rows = QUERIES["cluster_balanced_sample_plan"](spark, sf_dir).collect()
    assert rows
    km = {
        r.cluster_id: r.n_members
        for r in QUERIES["kmeans_embeddings"](spark, sf_dir).collect()
    }
    assert {r.cluster_id: r.n_members for r in rows} == km
    n = sum(km.values())
    per = (n // 2) // 8  # budget / K
    for r in rows:
        assert r.quota == min(r.n_members, per)
        assert r.share_milli == r.quota * 1000 // r.n_members
        if r.quota > 0:
            assert r.mean_d2_sel_floor >= 0


def test_mcnemar_cells_match_kappa_and_formula(spark, sf_dir):
    """McNemar's discordant cells must equal quality_rater_kappa's
    off-diagonal cells (same raters), and both χ² variants must match
    the closed form."""
    mc = QUERIES["mcnemar_quality_raters"](spark, sf_dir).collect()[0]
    ka = QUERIES["quality_rater_kappa"](spark, sf_dir).collect()[0]
    assert mc.b_only_a == ka.yes_no
    assert mc.c_only_b == ka.no_yes
    b, c = mc.b_only_a, mc.c_only_b
    if b + c:
        assert mc.chi2_ppm == (b - c) * (b - c) * 1_000_000 // (b + c)
        d = max(abs(b - c) - 1, 0)
        assert mc.chi2_cc_ppm == d * d * 1_000_000 // (b + c)
        assert mc.chi2_cc_ppm <= mc.chi2_ppm
    else:
        assert mc.chi2_ppm == 0 and mc.chi2_cc_ppm == 0


def test_ljung_box_matches_daily_count_and_sign(spark, sf_dir):
    """Q is non-negative, n_days equals the distinct order dates, and
    m_lags is the fixed 7."""
    from bpaotu_spark.catalog import load_table

    lb = QUERIES["ljung_box_daily"](spark, sf_dir).collect()[0]
    n_days = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").cast("date"))
        .distinct()
        .count()
    )
    assert lb.n_days == n_days
    assert lb.m_lags == 7
    assert lb.q_micro >= 0


def _chunked_stream(spark, sf_dir, tmp_path, k=4):
    """Write events as k time-ordered parquet chunks and return
    (stream_df, anchor_ms) where anchor_ms is the max event time of
    chunks 0..k-2 (the watermark anchor the final batch runs with)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from bpaotu_spark.streaming.jobs import EVENTS_STREAM_SCHEMA

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    n = t.num_rows
    src = tmp_path / "evchunks"
    src.mkdir()
    bounds = [i * n // k for i in range(k)] + [n]
    for i in range(k):
        p = src / f"chunk{i}.parquet"
        pq.write_table(t.slice(bounds[i], bounds[i + 1] - bounds[i]), p)
        os.utime(p, (1_000_000_000 + i, 1_000_000_000 + i))
    ts_arr = t.slice(0, bounds[k - 1]).column("ts")
    anchor = pc.max(ts_arr).cast(pa.int64()).as_py()
    unit = ts_arr.type.unit
    anchor_ms = anchor // {"s": 1, "ms": 1, "us": 1_000, "ns": 1_000_000}[
        unit
    ] * (1000 if unit == "s" else 1)
    raw = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    )
    return raw, anchor_ms


def test_session_finalizer_event_time_timeout(spark, sf_dir, tmp_path):
    """The EventTimeTimeout session state machine must emit exactly
    the batch session_window sessions: soundness over everything it
    emits, completeness for sessions the watermark provably closed."""
    from bpaotu_spark.streaming.jobs import (
        run_to_memory,
        session_finalizer_stream,
    )

    raw, anchor_ms = _chunked_stream(spark, sf_dir, tmp_path)
    run_to_memory(session_finalizer_stream(raw), "t_sessfin", complete=False)
    got = {
        (r.user_id, r.session_start_ms, r.session_end_ms, r.n_events): r.session_value
        for r in spark.table("t_sessfin").collect()
    }

    gap_ms = 30 * 60 * 1000
    delay_ms = 2 * 3600 * 1000
    batch = {
        (r.user_id, r.session_start_ms, r.session_end_ms - gap_ms, r.n_events):
        r.session_value
        for r in QUERIES["events_session_window"](spark, sf_dir).collect()
    }

    # Soundness: every emitted session is a real batch session
    # (values float-summed in the stream vs decimal in batch: 1e-3 tol).
    assert set(got) <= set(batch)
    for kk, v in got.items():
        assert abs(v - batch[kk]) < 1e-3

    # Completeness: any batch session whose last event + gap the
    # pre-final-batch watermark already passed MUST have been emitted.
    cutoff_ms = anchor_ms - delay_ms - gap_ms - 1000
    expired = {kk for kk in batch if kk[2] < cutoff_ms}
    assert expired, "fixture must contain watermark-closed sessions"
    assert expired <= set(got)


def test_contamination_by_source_consistent_with_split_census(spark, sf_dir):
    """The union of per-source contaminated test docs must reproduce
    the split census total, and no source can touch more test docs
    than the census found contaminated overall."""
    per_src = QUERIES["contamination_by_source"](spark, sf_dir).collect()
    census = QUERIES["split_contamination_ngrams"](spark, sf_dir).collect()
    total_contaminated = sum(r.n_contaminated for r in census)
    n_test = sum(r.n_test for r in census)
    assert per_src
    for r in per_src:
        assert 0 < r.n_test_docs_hit <= total_contaminated
        assert r.n_leaked_grams > 0
        assert r.hit_share_ppm == r.n_test_docs_hit * 1_000_000 // n_test


def test_augment_connected_graph_incremental_insert(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Incremental insert must (1) keep every base edge, (2) give every
    new vector between 1 and k+1 edges, (3) leave the augmented graph
    CONNECTED over base+new nodes — without rebuilding the base graph."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from bpaotu_spark.ann.graphconn import augment_connected_graph
    from bpaotu_spark.dedup.core import star_connected_components

    monkeypatch.setenv("BPAOTU_ANN_INDEX_DIR", str(tmp_path / "idx"))

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    import pyarrow as pa

    is_new = pa.array(
        [v % 5 == 0 for v in t.column("vec_id").to_pylist()], pa.bool_()
    )
    base_t, new_t = t.filter(pc.invert(is_new)), t.filter(is_new)
    base_dir = tmp_path / "base_sf"
    base_dir.mkdir()
    pq.write_table(base_t, base_dir / "embeddings.parquet")

    new_df = spark.createDataFrame(new_t.to_pandas()).select(
        "vec_id", "embedding"
    )
    aug = augment_connected_graph(spark, str(base_dir), new_df).localCheckpoint()

    from bpaotu_spark.ann.index_store import connected_edges_cached

    base_edges = {
        (r.vec_id, r.neighbor_id)
        for r in connected_edges_cached(spark, str(base_dir)).collect()
    }
    aug_edges = {(r.vec_id, r.neighbor_id) for r in aug.collect()}
    assert base_edges <= aug_edges  # non-destructive union

    new_ids = set(new_t.column("vec_id").to_pylist())
    base_ids = set(base_t.column("vec_id").to_pylist())
    out_deg = {}
    for u, v in aug_edges - base_edges:
        if u in new_ids:
            out_deg[u] = out_deg.get(u, 0) + 1
    assert set(out_deg) == new_ids  # every new vector connected
    assert max(out_deg.values()) <= 5 + 1

    # connectivity of the augmented graph over ALL nodes
    und = aug.select(
        F.least("vec_id", "neighbor_id").alias("u"),
        F.greatest("vec_id", "neighbor_id").alias("v"),
    ).distinct()
    comp = star_connected_components(und, "u", "v")
    n_comp = comp.select("component").distinct().count()
    nodes = {r.node for r in comp.collect()}
    assert n_comp == 1
    assert nodes == base_ids | new_ids


def test_ses_mase_consistency(spark, sf_dir):
    """SES error totals are internally consistent: mase_milli is the
    exact floor ratio of the two error sums, and the smoother's error
    is positive whenever the naive one is."""
    r = QUERIES["ses_forecast_mase"](spark, sf_dir).collect()[0]
    assert r.n_days > 1
    assert r.sum_abs_err_naive_milli > 0
    assert r.sum_abs_err_ses_milli >= 0
    assert (
        r.mase_milli
        == r.sum_abs_err_ses_milli * 1000 // r.sum_abs_err_naive_milli
    )
    assert r.s_final_milli >= 0


def test_map_radius_search_blocking_is_sound(spark, sf_dir):
    """The grid-blocked hit counts must equal a brute-force distance
    scan per center (the blocking may never lose a point), and every
    returned center is one of the 8 densest cells."""
    rows = QUERIES["map_radius_search"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 8
    from bpaotu_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    pts = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.floor(F.col("c_acctbal")).cast("bigint").alias("nx"),
        F.floor(F.col("o_totalprice") / 50.0).cast("bigint").alias("ny"),
    )
    for r in rows:
        cnx, cny = r.bin_x * 1000 + 500, r.bin_y * 1000 + 500
        brute = pts.filter(
            (F.col("nx") - cnx) * (F.col("nx") - cnx)
            + (F.col("ny") - cny) * (F.col("ny") - cny)
            <= 1000 * 1000
        ).count()
        assert r.n_in_radius == brute


def test_raup_crick_null_probability_bounds(spark, sf_dir):
    """p_milli lives in the add-one MC range, identical-draw pairs
    exist (high p for strongly co-occurring samples), and the pair
    frame covers exactly the capped cohort's C(n,2) pairs."""
    rows = QUERIES["raup_crick_null"](spark, sf_dir).collect()
    n_samples = len(
        {r.sample_a for r in rows} | {r.sample_b for r in rows}
    )
    assert len(rows) == n_samples * (n_samples - 1) // 2
    lo = 1000 * 1 // 33  # 0 null hits
    for r in rows:
        assert lo <= r.p_milli <= 1000
        assert 0 <= r.shared_obs <= min(r.richness_a, r.richness_b)
        assert r.null_mean_shared_milli >= 0


def test_burrows_delta_symmetric_and_bounded(spark, sf_dir):
    """Delta covers every source pair once, every pair uses the same
    word set, and Delta >= 0 with zero only for identical profiles."""
    rows = QUERIES["stylometry_burrows_delta"](spark, sf_dir).collect()
    srcs = {r.source_a for r in rows} | {r.source_b for r in rows}
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    n_words = {r.n_words_used for r in rows}
    assert len(n_words) == 1
    for r in rows:
        assert r.delta_ppm >= 0


def test_kmv_intersection_estimator_properties(spark, sf_dir):
    """Sketch-only intersection estimates: exact fallback when both
    sources fit inside K (theta == MAXH on both sides means the sketch
    IS the set), and errors are consistent with the reported ppm."""
    rows = QUERIES["kmv_set_intersection"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_exact > 0
        assert r.kmv_estimate >= 0
        want = abs(r.kmv_estimate - r.n_exact) * 1_000_000 // r.n_exact
        assert r.err_ppm == want


def test_loglogistic_shares_gap_count_with_weibull(spark, sf_dir):
    """Both AFT fits run over the identical duration table (same
    n_gaps); r2 lives in [0, 1e6] ppm and the shape is positive
    (reorder gaps grow hazard families, never degenerate)."""
    ll = QUERIES["loglogistic_rank_regression"](spark, sf_dir).collect()[0]
    wb = QUERIES["weibull_rank_regression"](spark, sf_dir).collect()[0]
    assert ll.n_gaps == wb.n_gaps
    assert 0 <= ll.r2_ppm <= 1_000_000
    assert ll.shape_milli > 0
    assert ll.scale_days_milli > 0


def test_holt_vs_ses_same_baseline(spark, sf_dir):
    """Holt and SES run over the identical daily series (same n_days
    and same naive error sum); both MASE values are exact ratios."""
    h = QUERIES["holt_linear_mase"](spark, sf_dir).collect()[0]
    s = QUERIES["ses_forecast_mase"](spark, sf_dir).collect()[0]
    assert h.n_days == s.n_days
    assert h.sum_abs_err_naive_milli == s.sum_abs_err_naive_milli
    assert (
        h.mase_milli
        == h.sum_abs_err_holt_milli * 1000 // h.sum_abs_err_naive_milli
    )


def test_quality_score_auc_bounds_and_counts(spark, sf_dir):
    """AUC lives in [0, 1e6] ppm; pos/neg counts match the gate."""
    r = QUERIES["quality_score_auc"](spark, sf_dir).collect()[0]
    q = QUERIES["text_quality"](spark, sf_dir)
    n_pos = q.filter("passes_quality").count()
    assert r.n_pos == n_pos
    assert r.n_pos + r.n_neg == q.count()
    if r.n_pos and r.n_neg:
        assert 0 <= r.auc_ppm <= 1_000_000


def test_augmented_graph_persists_and_reserves(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The augmented index publishes under the delta tag: a second
    call must serve the identical edge set from the store (same rows),
    and the artifact must exist on disk under conn_edges+<tag>."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bpaotu_spark.ann.index_store import augmented_edges_cached

    idx = tmp_path / "idx"
    monkeypatch.setenv("BPAOTU_ANN_INDEX_DIR", str(idx))

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    is_new = pa.array(
        [v % 7 == 0 for v in t.column("vec_id").to_pylist()], pa.bool_()
    )
    import pyarrow.compute as pc

    base_t, new_t = t.filter(pc.invert(is_new)), t.filter(is_new)
    base_dir = tmp_path / "base_sf"
    base_dir.mkdir()
    pq.write_table(base_t, base_dir / "embeddings.parquet")
    new_df = spark.createDataFrame(new_t.to_pandas()).select(
        "vec_id", "embedding"
    )

    e1 = {
        (r.vec_id, r.neighbor_id)
        for r in augmented_edges_cached(
            spark, str(base_dir), new_df, "nightly-1"
        ).collect()
    }
    assert any(d.startswith("conn_edges+nightly-1-") for d in os.listdir(idx))
    e2 = {
        (r.vec_id, r.neighbor_id)
        for r in augmented_edges_cached(
            spark, str(base_dir), new_df, "nightly-1"
        ).collect()
    }
    assert e1 == e2
    new_ids = set(new_t.column("vec_id").to_pylist())
    assert new_ids <= {u for u, _ in e1}


def test_retention_halflife_consistency(spark, sf_dir):
    """The closed-form half-life must equal the exact integer ratio of
    the reported slope terms, and the lag count is within 1..14."""
    r = QUERIES["retention_halflife_fit"](spark, sf_dir).collect()[0]
    assert 1 <= r.n_lags_used <= 14
    if r.slope_num < 0:
        assert (
            r.halflife_days_milli
            == 693_147 * 1000 * r.slope_den // (-r.slope_num)
        )
        assert r.halflife_days_milli > 0
    else:
        assert r.halflife_days_milli == -1


def test_ljung_box_remainder_below_raw(spark, sf_dir):
    """Both portmanteau statistics are well-formed (non-negative,
    same lag count); the raw-vs-remainder COMPARISON is the analysis
    output, not an invariant — synthetic data need not be seasonal."""
    raw = QUERIES["ljung_box_daily"](spark, sf_dir).collect()[0]
    rem = QUERIES["ljung_box_remainder"](spark, sf_dir).collect()[0]
    assert rem.q_micro >= 0 and raw.q_micro >= 0
    assert rem.m_lags == raw.m_lags == 7


def test_periodogram_shares_and_rank(spark, sf_dir):
    """Five fixed periods, shares in [0, 1e6] ppm, rank is a
    permutation of 1..5 consistent with descending share."""
    rows = QUERIES["daily_revenue_periodogram"](spark, sf_dir).collect()
    assert {r.period_days for r in rows} == {7, 14, 30, 91, 365}
    assert sorted(r.power_rank for r in rows) == [1, 2, 3, 4, 5]
    by_rank = sorted(rows, key=lambda r: r.power_rank)
    for a, b in zip(by_rank, by_rank[1:]):
        assert a.power_share_ppm >= b.power_share_ppm
    for r in rows:
        assert 0 <= r.power_share_ppm <= 1_000_000
