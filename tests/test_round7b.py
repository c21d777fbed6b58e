"""Invariant tests for the round-7 session-2 operator additions.

Value correctness is covered by the DuckDB oracles (tools/check.py /
the driver); these pin semantic invariants a hash compare cannot
express.
"""

from __future__ import annotations

from bpaotu_spark.registry import QUERIES, load_all

load_all()


def test_kruskal_wallis_bounds(spark, sf_dir):
    """H >= 0 up to flooring slack; tie correction only inflates H;
    k matches the five market segments."""
    r = QUERIES["kruskal_wallis_h"](spark, sf_dir).collect()[0]
    assert r.k_groups == 5
    assert r.n_total > 0
    assert r.h_milli >= -1  # flooring slack
    assert r.h_tie_milli >= r.h_milli  # ties correction divides by <= 1


def test_anova_f_and_eta2_consistent(spark, sf_dir):
    r = QUERIES["anova_oneway_f"](spark, sf_dir).collect()[0]
    assert r.k_groups == 5
    assert r.f_milli >= 0
    assert 0 <= r.eta2_ppm <= 1_000_000
    # F and eta² are two views of the same SSB/SSW split:
    # F = (eta²/(k−1)) / ((1−eta²)/(N−k)) — check to flooring slack
    eta = r.eta2_ppm / 1e6
    f_from_eta = (eta / (r.k_groups - 1)) / (
        (1 - eta) / (r.n_total - r.k_groups)
    )
    assert abs(f_from_eta * 1000 - r.f_milli) < max(
        5.0, 0.01 * abs(r.f_milli)
    )


def test_brown_forsythe_nonnegative(spark, sf_dir):
    r = QUERIES["brown_forsythe_f"](spark, sf_dir).collect()[0]
    assert r.k_groups == 5
    assert r.n_total > 0
    assert r.f_milli >= 0


def test_cochran_armitage_rate_bounds(spark, sf_dir):
    r = QUERIES["cochran_armitage_trend"](spark, sf_dir).collect()[0]
    assert 0 < r.n_ret < r.n_total
    # quantity is synthetic-uniform and independent of returnflag, so
    # the trend should be mild: |z| sanity-bounded, not sign-pinned
    assert abs(r.z_milli) < 100_000


def test_kendall_tau_bounds_and_pair_budget(spark, sf_dir):
    r = QUERIES["kendall_tau_daily"](spark, sf_dir).collect()[0]
    assert r.n_days > 0
    n_pairs = r.n_days * (r.n_days - 1) // 2
    assert r.n_concordant + r.n_discordant <= n_pairs
    assert -1000 <= r.tau_b_milli <= 1000


def test_whittaker_beta_at_least_one(spark, sf_dir):
    """beta_W >= 1 always (gamma >= every alpha), milli scale."""
    rows = QUERIES["whittaker_beta_nation"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.beta_w_milli >= 1000
        assert r.s_gamma * r.n_samples >= r.sum_richness


def test_taylor_slope_in_plausible_band(spark, sf_dir):
    """Taylor exponents live in [1, 2] for count data almost
    universally; allow generous slack around the ln-axis shifts."""
    r = QUERIES["taylor_power_law"](spark, sf_dir).collect()[0]
    assert r.n_otus > 0
    assert 500 <= r.slope_milli <= 3000


def test_occupancy_deciles_monotone_grid(spark, sf_dir):
    rows = QUERIES["occupancy_abundance_deciles"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.occ_decile <= 9
        assert r.n_otus > 0
        assert r.mean_count_milli >= 1000  # occupied cells have c >= 1
        assert 0 < r.mean_occupancy_ppm <= 1_000_000


def test_metric_agreement_bounds(spark, sf_dir):
    rows = QUERIES["metric_agreement_topk"](spark, sf_dir).collect()
    assert len(rows) == 10  # one per query vector
    for r in rows:
        assert 0 <= r.overlap_k <= 5
        assert r.overlap_ppm == r.overlap_k * 1_000_000 // 5


def test_int4_error_exceeds_nothing_and_dominates_int8(spark, sf_dir):
    """15-level quantization: every code in [0,14]; the mean error
    must be positive and bounded by half the largest step in micro."""
    rows = QUERIES["vector_quantize_int4_error"](spark, sf_dir).collect()
    assert len(rows) == 64
    for r in rows:
        assert 1 <= r.n_codes_used <= 15
        assert 0 <= r.mean_abs_err_micro <= r.max_abs_err_micro


def test_hubness_histogram_conserves_vectors_and_edges(spark, sf_dir):
    rows = QUERIES["knn_hubness_histogram"](spark, sf_dir).collect()
    assert rows
    n_vec = sum(r.n_vectors for r in rows)
    n_edges = sum(r.in_degree * r.n_vectors for r in rows)
    # every vector appears exactly once; each hands out <= K in-edges
    from bpaotu_spark.catalog import load_table

    total = load_table(spark, sf_dir, "embeddings").count()
    assert n_vec == total
    assert n_edges <= 5 * total


def test_stopword_cosine_pairs_complete(spark, sf_dir):
    rows = QUERIES["stopword_profile_cosine"](spark, sf_dir).collect()
    assert rows
    srcs = {r.source_a for r in rows} | {r.source_b for r in rows}
    n = len(srcs)
    assert len(rows) == n * (n - 1) // 2  # every unordered pair once
    for r in rows:
        assert 0 < r.cosine_ppm <= 1_000_000
        assert 1 <= r.n_shared_words <= 28


def test_burstiness_at_least_one(spark, sf_dir):
    """cf >= df always, so burstiness_milli >= 1000."""
    rows = QUERIES["term_burstiness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cf >= r.df >= 1
        assert r.burstiness_milli >= 1000
        assert r.df_vs_poisson_milli > 0


def test_ttr_bounds(spark, sf_dir):
    rows = QUERIES["ttr_head100"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0
        assert 0 < r.mean_ttr_ppm <= 1_000_000


def test_cif_monotone_and_bounded(spark, sf_dir):
    """CIFs are nondecreasing in horizon and the cause-sum stays
    below 1 (competing risks can never exceed total failure mass)."""
    rows = QUERIES["competing_risks_cif"](spark, sf_dir).collect()
    assert rows
    by_cause = {}
    for r in rows:
        by_cause.setdefault(r.cause, []).append(
            (r.horizon_days, r.cif_micro)
        )
    assert set(by_cause) == {"urgent", "routine"}
    for curve in by_cause.values():
        curve.sort()
        vals = [v for _, v in curve]
        assert vals == sorted(vals)  # nondecreasing
        assert all(0 <= v <= 1_000_000 for v in vals)
    # total incidence at each horizon <= 1
    for h in {h for h, _ in by_cause["urgent"]}:
        tot = sum(dict(by_cause[c])[h] for c in by_cause)
        assert tot <= 1_000_000


def test_session_depth_shares_sum(spark, sf_dir):
    rows = QUERIES["session_depth_histogram"](spark, sf_dir).collect()
    assert rows
    assert sum(r.share_ppm for r in rows) <= 1_000_000
    for r in rows:
        assert r.depth >= 1
        assert r.mean_dwell_ms >= 0
        if r.depth == 1:
            assert r.mean_dwell_ms == 0  # single-event sessions
