"""Ecology estimators + layout audit + textops2: invariants the DuckDB
oracle compare can't see (plan shape, mathematical bounds)."""

from __future__ import annotations

import pyspark.sql.functions as F

from bpaotu_spark.registry import QUERIES, load_all

load_all()


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_chao1_bounds(spark, sf_dir):
    rows = QUERIES["chao1_richness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Chao1 never estimates fewer species than observed
        assert r.chao1_milli >= r.richness * 1000
        assert 0 <= r.coverage_ppm <= 1_000_000
        assert r.f1 >= 0 and r.f2 >= 0 and r.f1 + r.f2 <= r.richness


def test_pielou_evenness_bounds(spark, sf_dir):
    rows = QUERIES["pielou_evenness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.richness >= 2
        # J in (0, 1]: H <= ln(S) always, with micro-nat flooring the
        # ppm ratio can graze just over 1e6 only via the floored
        # denominator — allow the 1-step slack
        assert 0 < r.evenness_ppm <= 1_000_001
        assert r.shannon_micronats > 0


def test_rank_abundance_structure(spark, sf_dir):
    df = QUERIES["rank_abundance_curve"](spark, sf_dir)
    rows = df.collect()
    by_sample: dict[int, list] = {}
    for r in rows:
        by_sample.setdefault(r.sample_id, []).append(r)
    for sid, rs in by_sample.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 20
        # abundance is non-increasing along the rank axis
        cs = [r.abundance for r in rs]
        assert cs == sorted(cs, reverse=True)
    # the window is sample-partitioned — never a global sort
    assert "PARTITION BY sample_id" not in plan(df)  # formatted plans
    assert "Window" in plan(df)


def test_dsir_selects_target_lang_top(spark, sf_dir):
    rows = QUERIES["dsir_importance_select"](spark, sf_dir).collect()
    assert len(rows) == 100
    scores = [r.dsir_score_micronats for r in rows]
    assert scores == sorted(scores, reverse=True)
    # importance resampling must enrich the target domain: the 'en'
    # share of the selected set must beat its share of the raw corpus
    from bpaotu_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_total = docs.count()
    n_en = docs.filter(F.col("lang") == "en").count()
    langs = [r.lang for r in rows]
    assert langs.count("en") / len(rows) > n_en / n_total
    # TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan(
        QUERIES["dsir_importance_select"](spark, sf_dir)
    )


def test_tokenizer_fertility_sane(spark, sf_dir):
    rows = QUERIES["tokenizer_fertility"](spark, sf_dir).collect()
    assert {r.lang for r in rows} == {"en", "fr", "es", "de", "zh"}
    for r in rows:
        # BPE-ish pre-tokens can only split words further: fertility >= 1
        assert r.fertility_ppm >= 1_000_000
        assert r.chars_per_token_milli > 0


def test_zorder_prunes_and_natural_does_not(spark, sf_dir):
    rows = {r.layout: r for r in QUERIES["zorder_file_pruning"](spark, sf_dir).collect()}
    assert set(rows) == {"natural", "zorder"}
    nat, zo = rows["natural"], rows["zorder"]
    assert nat.n_files == zo.n_files == 64
    assert nat.rows_total == zo.rows_total
    # the whole point: clustering on the probe columns must prune
    # strictly better than insertion order
    assert zo.files_hit < nat.files_hit
    assert zo.scan_frac_ppm < nat.scan_frac_ppm
    # z-order bounding boxes cover the probe region at least once
    assert zo.files_hit >= 1


def test_anosim_r_in_range(spark, sf_dir):
    r = QUERIES["anosim_groups"](spark, sf_dir).collect()[0]
    assert r.n_pairs == r.n_within + r.n_between
    assert r.n_within > 0 and r.n_between > 0
    # R in [-1, 1] (ppm); mean ranks live in [1, n_pairs] micro-scale
    assert -1_000_000 <= r.anosim_r_ppm <= 1_000_000
    for mr in (r.mean_rank_within_micro, r.mean_rank_between_micro):
        assert 1_000_000 <= mr <= r.n_pairs * 1_000_000


def test_reconciliation_partitions_orders(spark, sf_dir):
    from bpaotu_spark.catalog import load_table

    rows = QUERIES["order_price_reconciliation"](spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    # every order lands in exactly one bucket
    assert sum(r.n_orders for r in rows) == n_orders
    buckets = {r.rel_err_bucket for r in rows}
    assert buckets <= set(range(-10, 11)) | {999}
    # the synthetic data deliberately violates the invariant — the
    # audit must report spread beyond the zero bucket
    assert len(buckets - {999}) > 1


def test_join_skew_audit_shape(spark, sf_dir):
    rows = {r.key_name: r for r in QUERIES["join_skew_audit"](spark, sf_dir).collect()}
    assert set(rows) == {"l_orderkey", "l_partkey", "l_suppkey"}
    for r in rows.values():
        assert r.max_mult >= 1
        assert r.avg_mult_milli >= 1000  # mean multiplicity >= 1
        assert r.skew_factor_ppm >= 1_000_000  # max >= mean always
    # suppkey is the smallest key domain -> highest mean multiplicity
    assert (
        rows["l_suppkey"].avg_mult_milli > rows["l_orderkey"].avg_mult_milli
    )


def test_curriculum_monotone_difficulty(spark, sf_dir):
    rows = QUERIES["curriculum_schedule"](spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == {"en", "fr", "es", "de", "zh"}
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.difficulty_decile)
        assert [r.difficulty_decile for r in rs] == list(range(1, 11))
        # deciles are ordered by difficulty: min logloss is non-decreasing
        mins = [r.min_logloss_micro for r in rs]
        assert mins == sorted(mins)
        # cumulative token share ends at exactly 100%
        assert rs[-1].cum_token_share_ppm == 1_000_000
        shares = [r.cum_token_share_ppm for r in rs]
        assert shares == sorted(shares)


def test_kfold_covers_all_docs(spark, sf_dir):
    from bpaotu_spark.catalog import load_table

    rows = QUERIES["kfold_assignment"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert {r.fold for r in rows} <= set(range(5))
    # shares per lang sum to ~1e6 (floor-division slack < 5 ppm·folds)
    by_lang: dict[str, int] = {}
    for r in rows:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + r.fold_share_ppm
    for tot in by_lang.values():
        assert 1_000_000 - 5 <= tot <= 1_000_000


def test_partition_balance_structure(spark, sf_dir):
    rows = {r.layout: r for r in QUERIES["partition_balance_audit"](spark, sf_dir).collect()}
    assert set(rows) == {"range", "hash"}
    assert rows["range"].n_rows == rows["hash"].n_rows
    for r in rows.values():
        assert r.buckets_used <= 32
        assert r.min_bucket <= r.max_bucket
        assert r.skew_factor_ppm >= 1_000_000  # max >= mean by definition
        # the audit's purpose: flag layouts a planner shouldn't use —
        # on this near-uniform money column both layouts must land
        # well under the 2x-mean skew alarm threshold
        assert r.skew_factor_ppm < 2_000_000


def test_triangle_clustering_bounds(spark, sf_dir):
    rows = QUERIES["knn_triangle_count"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.degree >= 2
        # each triangle uses 2 of the node's edge pairs: coeff <= 1
        assert 0 <= r.clustering_ppm <= 1_000_000
        # a node in t triangles has degree >= 2 only if t <= C(deg,2)
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2


def test_species_accumulation_monotone(spark, sf_dir):
    rows = sorted(
        QUERIES["species_accumulation_curve"](spark, sf_dir).collect(),
        key=lambda r: r.sample_id,
    )
    assert rows
    cums = [r.cum_otus for r in rows]
    assert cums == sorted(cums)
    assert sum(r.n_new_otus for r in rows) == cums[-1]
    assert rows[-1].cum_share_ppm == 1_000_000


def test_rapid_fire_consistency(spark, sf_dir):
    # burst users may or may not exist in regenerated testdata; the
    # invariants must hold either way
    for r in QUERIES["rapid_fire_users"](spark, sf_dir).collect():
        assert r.n_burst_windows > 0
        assert r.n_events >= 5
        assert r.tightest_span_us <= 21_600_000_000


def test_benford_shares_complete(spark, sf_dir):
    rows = QUERIES["benford_first_digit"](spark, sf_dir).collect()
    assert {r.first_digit for r in rows} == set(range(1, 10))
    tot = sum(r.observed_ppm for r in rows)
    assert 1_000_000 - 9 <= tot <= 1_000_000
    # expectation column carries the exact Benford constants
    by_d = {r.first_digit: r.benford_ppm for r in rows}
    assert by_d[1] == 301_029 and by_d[9] == 45_757


def test_theil_decomposition(spark, sf_dir):
    rows = QUERIES["theil_inequality"](spark, sf_dir).collect()
    nations = [r for r in rows if r.nation >= 0]
    between = [r for r in rows if r.nation == -1]
    assert len(between) == 1
    assert all(r.theil_micro >= -2 for r in rows)  # T >= 0 modulo flooring
    # the TOTAL row aggregates every customer
    assert between[0].n_custs == sum(r.n_custs for r in nations)
    assert between[0].revenue_cents == sum(r.revenue_cents for r in nations)


def test_trimmed_mean_bounds(spark, sf_dir):
    for r in QUERIES["trimmed_mean_by_segment"](spark, sf_dir).collect():
        # trimming both tails keeps the estimate inside the raw range
        # and near the raw mean on this near-symmetric distribution
        assert abs(r.trimmed_mean_cents - r.mean_cents) < r.mean_cents
        assert r.n_orders > 0


def test_daily_autocorrelation_range(spark, sf_dir):
    rows = QUERIES["daily_autocorrelation"](spark, sf_dir).collect()
    assert {r.lag_days for r in rows} == {1, 7, 14}
    for r in rows:
        assert -1000 <= r.pearson_milli <= 1000
        assert r.n_pairs > 0


def test_heaps_beta_in_range(spark, sf_dir):
    r = QUERIES["heaps_law_estimate"](spark, sf_dir).collect()[0]
    # sublinear vocabulary growth: 0 <= beta <= 1. The synthetic
    # corpus has a CLOSED ~31-word vocabulary, so beta = 0 (no growth
    # between the half and full sample) is the correct degenerate fit;
    # a natural-text corpus lands around 0.4-0.6.
    assert 0 <= r.heaps_beta_micro <= 1_000_000
    assert r.v1 <= r.v2 and r.n1 <= r.n2
    assert 0 <= r.n_hapax <= r.v2


def test_entropy_calibration_complete(spark, sf_dir):
    rows = QUERIES["entropy_dedup_calibration"](spark, sf_dir).collect()
    langs = {r.lang for r in rows}
    assert langs == {"en", "fr", "es", "de", "zh"}
    for r in rows:
        assert 1 <= r.entropy_decile <= 10
        assert 0 <= r.n_kept <= r.n_docs
        assert 0 <= r.kept_ppm <= 1_000_000


def test_twonn_dimension_positive(spark, sf_dir):
    r = QUERIES["intrinsic_dimension_twonn"](spark, sf_dir).collect()[0]
    assert r.n_nodes > 0
    assert r.sum_ln_mu_micro > 0
    # embeddings live in a bounded-dim space; the estimate must be a
    # plausible manifold dimension, not a degenerate blowup
    assert 0 < r.intrinsic_dim_milli < 1_000_000


def test_mantel_r_in_range(spark, sf_dir):
    r = QUERIES["mantel_test_gradient"](spark, sf_dir).collect()[0]
    assert r.n_pairs > 0
    assert -1000 <= r.mantel_r_milli <= 1000


def test_markov_entropy_rate_weighted(spark, sf_dir):
    rows = QUERIES["markov_entropy_rate"](spark, sf_dir).collect()
    states = [r for r in rows if r.prev_type != "__RATE__"]
    rate = [r for r in rows if r.prev_type == "__RATE__"]
    assert len(rate) == 1 and states
    # the rate is a convex combination of per-state entropies
    lo = min(r.entropy_micronats for r in states)
    hi = max(r.entropy_micronats for r in states)
    assert lo - 1 <= rate[0].entropy_micronats <= hi + 1
    assert rate[0].n_out == sum(r.n_out for r in states)
    # entropy of a K-ary chain is bounded by ln(K)
    import math

    k = len(states)
    assert all(
        0 <= r.entropy_micronats <= int(math.log(max(k, 2)) * 1e6) + 1
        for r in states
    )


def test_supply_resilience_bounds(spark, sf_dir):
    rows = QUERIES["part_supply_resilience"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.single_supplier_parts <= r.n_parts
        # one supplier implies at most one nation... the converse
        # bound: single-nation count >= single-supplier count
        assert r.single_nation_parts >= r.single_supplier_parts
        assert 0 <= r.single_supplier_ppm <= 1_000_000


def test_jsd_matrix_symmetric_bounds(spark, sf_dir):
    rows = QUERIES["source_jsd_matrix"](spark, sf_dir).collect()
    # 20 sources -> C(20,2) ordered pairs
    assert len(rows) == 190
    for r in rows:
        assert r.source_a < r.source_b
        # JSD in [0, ln 2] nats (693147 micro-nats), modulo flooring
        assert -2 <= r.jsd_micronats <= 693_148


def test_churn_quarters_cover_orders(spark, sf_dir):
    from bpaotu_spark.catalog import load_table

    rows = QUERIES["churn_reactivation_quarterly"](spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    for r in rows:
        assert 1 <= r.qtr <= 4
        assert 0 <= r.reactivations <= r.n_orders
        assert r.active_customers > 0


def test_returnflag_drift_shares(spark, sf_dir):
    rows = QUERIES["returnflag_drift_yearly"](spark, sf_dir).collect()
    by_year: dict[int, int] = {}
    for r in rows:
        by_year[r.yr] = by_year.get(r.yr, 0) + r.share_ppm
    # shares per year sum to ~1e6 (floor slack per flag)
    for tot in by_year.values():
        assert 1_000_000 - 3 <= tot <= 1_000_000
    # first year of each flag has no prior -> null delta
    firsts = [r for r in rows if r.delta_ppm is None]
    flags = {r.l_returnflag for r in rows}
    assert len(firsts) == len(flags)


def test_km_survival_monotone(spark, sf_dir):
    rows = sorted(
        QUERIES["kaplan_meier_order_gaps"](spark, sf_dir).collect(),
        key=lambda r: r.horizon_days,
    )
    assert [r.horizon_days for r in rows] == [30, 60, 90, 180, 365]
    # -ln S(t) is non-negative and non-decreasing in t
    vals = [r.neg_ln_survival_micro for r in rows]
    assert all(v >= 0 for v in vals)
    assert vals == sorted(vals)


def test_laspeyres_base_year_is_unity(spark, sf_dir):
    rows = sorted(
        QUERIES["laspeyres_price_index"](spark, sf_dir).collect(),
        key=lambda r: r.yr,
    )
    assert rows
    # in the base year p_t = p_b, so the index is exactly 1.0 (1e6
    # ppm) modulo per-part flooring of the numerator terms
    base = rows[0]
    assert 999_000 <= base.laspeyres_ppm <= 1_000_000
    for r in rows:
        assert r.n_parts_matched > 0
        assert r.laspeyres_ppm > 0


def test_cscore_bounds(spark, sf_dir):
    r = QUERIES["cscore_checkerboard"](spark, sf_dir).collect()[0]
    assert r.n_pairs > 0
    # C >= 0 always ((r-s) factors are non-negative)
    assert r.sum_cscore >= 0
    assert r.max_cscore * r.n_pairs >= r.sum_cscore


def test_weekly_decomposition_centers(spark, sf_dir):
    rows = QUERIES["weekly_decomposition"](spark, sf_dir).collect()
    assert {r.day_of_week for r in rows} == set(range(1, 8))
    for r in rows:
        assert r.min_detrended <= r.seasonal_cents <= r.max_detrended
    # the detrended series centers near zero: the seasonal means are
    # tiny relative to the raw daily scale (they're residuals of a
    # 7-day MA), so their sum across dow is bounded by the spread
    total = sum(r.seasonal_cents for r in rows)
    spread = max(r.max_detrended for r in rows) - min(
        r.min_detrended for r in rows
    )
    assert abs(total) <= spread


def test_elasticity_defined_per_type(spark, sf_dir):
    rows = QUERIES["log_log_elasticity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_lines > 0
        # a slope exists and is finite/sane (|e| < 10)
        assert -10_000 <= r.elasticity_milli <= 10_000


def test_markov_absorption_monotone(spark, sf_dir):
    rows = QUERIES["markov_absorption_3step"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # more steps can only help: h1 <= h2 <= h3 <= 1 (ppm, with
        # integer-division slack of a few ppm per composition step)
        assert r.reach_1step_ppm <= r.reach_2step_ppm + 2
        assert r.reach_2step_ppm <= r.reach_3step_ppm + 2
        assert 0 <= r.reach_3step_ppm <= 1_000_000


def test_nodf_bounds(spark, sf_dir):
    r = QUERIES["otu_nestedness_nodf"](spark, sf_dir).collect()[0]
    assert r.n_ordered_pairs > 0
    assert 0 <= r.min_overlap_ppm <= r.nodf_ppm <= r.max_overlap_ppm
    assert r.max_overlap_ppm <= 1_000_000


def test_fano_positive(spark, sf_dir):
    rows = QUERIES["event_burstiness_fano"](spark, sf_dir).collect()
    assert {r.event_type for r in rows} == {
        "signup", "click", "error", "view", "purchase",
    }
    for r in rows:
        assert r.fano_milli >= 0
        assert r.n_events >= r.n_hours  # counts >= 1 per non-empty hour


def test_pareto_alpha_sane(spark, sf_dir):
    r = QUERIES["pareto_tail_alpha"](spark, sf_dir).collect()[0]
    assert r.n_tail > 0
    assert r.sum_ln_micro > 0
    # alpha > 0 always; on this near-UNIFORM synthetic price column
    # the tail above 2x mean is razor thin, so alpha is huge — that IS
    # the diagnostic's answer ("not heavy-tailed"); a web-scale revenue
    # distribution would land in the 1-5 range (1000-5000 milli)
    assert r.alpha_milli > 300


def test_ks_d_in_range(spark, sf_dir):
    r = QUERIES["ks_binned_two_sample"](spark, sf_dir).collect()[0]
    assert 0 <= r.ks_d_ppm <= 1_000_000
    assert 0 < r.n_bins_occupied <= 1000
    assert r.n_a > 0 and r.n_b > 0
    # both segments draw from the same synthetic generator: D small
    assert r.ks_d_ppm < 500_000


def test_cramers_v_range(spark, sf_dir):
    r = QUERIES["cramers_v_association"](spark, sf_dir).collect()[0]
    assert r.chi2_micro_sum >= 0
    assert 0 <= r.cramers_v_milli <= 1000


def test_gumbel_fit_sane(spark, sf_dir):
    r = QUERIES["gumbel_moments_fit"](spark, sf_dir).collect()[0]
    assert r.n_days > 1
    assert r.gumbel_beta_cents > 0
    # mode mu sits below the mean of maxima (gamma*beta shift)
    assert r.gumbel_mu_cents < r.mean_max_cents


def test_new_repeat_split_consistent(spark, sf_dir):
    rows = sorted(
        QUERIES["new_repeat_revenue_monthly"](spark, sf_dir).collect(),
        key=lambda r: r.mon,
    )
    assert rows
    # the first month has no possible repeat customers
    assert rows[0].repeat_revenue_cents == 0
    assert rows[0].new_share_ppm == 1_000_000
    for r in rows:
        assert 0 <= r.new_share_ppm <= 1_000_000
        assert r.new_cust_orders <= r.n_orders


def test_month_end_lift_positive(spark, sf_dir):
    r = QUERIES["month_end_lift"](spark, sf_dir).collect()[0]
    assert r.end_days > 0 and r.rest_days > r.end_days
    assert r.lift_ppm > 0


def test_taxa_drift_sums(spark, sf_dir):
    rows = QUERIES["taxa_temporal_drift"](spark, sf_dir).collect()
    assert rows
    # each era's shares sum to ~1e6 across types
    for col in ("early_ppm", "late_ppm"):
        tot = sum(getattr(r, col) for r in rows)
        assert 1_000_000 - len(rows) <= tot <= 1_000_000
    ranks = sorted(r.early_rank for r in rows)
    assert ranks[0] == 1


def test_hill_numbers_ordering(spark, sf_dir):
    rows = QUERIES["hill_numbers_suite"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Hill numbers are non-increasing in q: q0 >= q1 >= q2 >= 1
        assert r.hill_q0 * 1000 >= r.hill_q1_milli - 2
        assert r.hill_q1_milli >= r.hill_q2_milli - 2
        assert r.hill_q2_milli >= 1000 - 2


def test_faith_pd_dominates_levels(spark, sf_dir):
    rows = QUERIES["faith_pd_taxonomy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # tree structure: leaves >= brand prefixes >= type prefixes
        assert r.n_leaf_edges >= r.n_brand_edges >= r.n_type_edges >= 1
        assert r.faith_pd == r.n_type_edges + r.n_brand_edges + r.n_leaf_edges


def test_bloom_advisor_geometry(spark, sf_dir):
    rows = {r.key_name: r for r in QUERIES["bloom_sizing_advisor"](spark, sf_dir).collect()}
    assert set(rows) == {"l_orderkey", "l_partkey", "l_suppkey"}
    for r in rows.values():
        # ~9.59 bits per key at 1% FPP
        assert 9 * r.n_keys <= r.m_bits <= 10 * r.n_keys
        assert r.k_hashes == 7
        assert r.m_mib_ceil >= 1


def test_two_way_effects_reconstruct(spark, sf_dir):
    rows = QUERIES["two_way_effects"](spark, sf_dir).collect()
    assert len(rows) == 25  # 5 segments x 5 priorities
    assert all(r.n > 0 for r in rows)
    # ANOVA orthogonality: the n-weighted interaction residuals sum to
    # ~zero across cells (each of the 4 floored means loses <1 cent,
    # so the weighted total drifts by at most ~4 cents per row)
    n_all = sum(r.n for r in rows)
    weighted = sum(r.n * r.interaction_cents for r in rows)
    assert abs(weighted) <= 5 * n_all


def test_beta_dispersion_covers_groups(spark, sf_dir):
    rows = {r.grp: r for r in QUERIES["beta_dispersion_groups"](spark, sf_dir).collect()}
    assert set(rows) == {"BUILDING", "MACHINERY", "__BETWEEN__"}
    for r in rows.values():
        assert 0 <= r.min_d_ppm <= r.mean_d_ppm <= r.max_d_ppm <= 1_000_000
        assert r.n_pairs > 0


def test_ab_sizing_positive(spark, sf_dir):
    r = QUERIES["ab_test_sizing"](spark, sf_dir).collect()[0]
    assert r.var_cents2 > 0
    assert r.n_per_arm > 0
    # the rule of 16: n_arm = 16 var / (0.02 mean)^2 — sanity-check
    # within integer-flooring slack
    approx = 16 * r.var_cents2 // ((r.mean_cents * 2 // 100) ** 2)
    assert abs(r.n_per_arm - approx) <= 1


def test_order_size_shares_sum(spark, sf_dir):
    rows = QUERIES["order_size_dispersion"](spark, sf_dir).collect()
    tot = sum(r.share_ppm for r in rows)
    assert 1_000_000 - len(rows) <= tot <= 1_000_000
    assert sum(r.n_orders for r in rows) == rows[0].total_orders


def test_error_budget_burn_window(spark, sf_dir):
    rows = sorted(
        QUERIES["error_budget_burn"](spark, sf_dir).collect(),
        key=lambda r: r.d,
    )
    assert rows
    for r in rows:
        assert 0 <= r.day_error_ppm <= 1_000_000
        assert 0 <= r.week_error_ppm <= 1_000_000
        assert r.burn_alert == (r.week_error_ppm > 10_000)


def test_zorder_plan_single_fact_scan(spark, sf_dir):
    p = plan(QUERIES["zorder_file_pruning"](spark, sf_dir))
    # the max() frame is a broadcast, never a shuffle join
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p


def test_unifrac_pair_bounds_and_pair_count(spark, sf_dir):
    uf = QUERIES["unifrac_unweighted"](spark, sf_dir).collect()
    wu = QUERIES["unifrac_weighted"](spark, sf_dir).collect()
    assert uf and wu
    n = round((1 + (1 + 8 * len(uf)) ** 0.5) / 2)  # invert C(n,2)
    assert n * (n - 1) == 2 * len(uf), "pair frame must be all C(n,2) pairs"
    assert len(wu) == len(uf)
    for r in uf:
        assert 0 <= r.unifrac_ppm <= 1_000_000
        assert r.n_shared_edges <= min(r.n_edges_a, r.n_edges_b)
        # identical edge sets → 0; disjoint → exactly 1e6
        if r.n_shared_edges == 0:
            assert r.unifrac_ppm == 1_000_000
    for r in wu:
        # per-edge ppm flooring can undershoot slightly, never overshoot
        assert 0 <= r.wu_ppm <= 1_000_000
        assert r.total_a > 0 and r.total_b > 0


def test_map_tiles_pyramid_mass_conservation(spark, sf_dir):
    rows = QUERIES["map_tiles_pyramid"](spark, sf_dir).collect()
    by_zoom = {}
    for r in rows:
        t = by_zoom.setdefault(r.zoom, [0, 0, 0])
        t[0] += r.n_orders
        t[1] += r.price_cents
        t[2] += 1
    assert sorted(by_zoom) == [0, 1, 2, 3]
    # every zoom level carries the SAME total mass (pure re-binning)...
    assert len({(t[0], t[1]) for t in by_zoom.values()}) == 1
    # ...over monotonically coarser grids
    assert (
        by_zoom[0][2] <= by_zoom[1][2] <= by_zoom[2][2] <= by_zoom[3][2]
    )


def test_boilerplate_hotlist_ordering(spark, sf_dir):
    rows = QUERIES["boilerplate_ngram_hotlist"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert (a.doc_freq, a.gram) < (b.doc_freq, b.gram) or (
            a.doc_freq > b.doc_freq
        )
    for r in rows:
        assert r.doc_freq >= 2
        assert len(r.gram.split(" ")) == 5
        assert 0 < r.doc_share_ppm <= 1_000_000


def test_price_lognormal_fit_moments(spark, sf_dir):
    rows = QUERIES["price_lognormal_fit"](spark, sf_dir).collect()
    assert len(rows) == 5  # one per mktsegment
    for r in rows:
        assert r.min_ln_micro <= r.mu_ln_micro <= r.max_ln_micro
        # MAD is bounded by the half-range (coarse but engine-exact)
        assert 0 <= r.mad_ln_micro <= (r.max_ln_micro - r.min_ln_micro)
        assert r.sigma_ln_micro == r.mad_ln_micro * 12533 // 10000
        assert r.n_orders > 0


def test_morisita_horn_bounds_and_symmetric_blocks(spark, sf_dir):
    """mh_ppm in [0, 1e6]; identical-composition pairs would be 0 and
    disjoint pairs exactly 1e6; pair frame respects sample_a < sample_b
    within one nation block."""
    from bpaotu_spark.registry import QUERIES

    rows = QUERIES["beta_diversity_morisita_horn"](spark, sf_dir).collect()
    assert rows, "no pairs formed"
    for r in rows:
        assert 0 <= r.mh_ppm <= 1_000_000
        assert r.sample_a < r.sample_b
