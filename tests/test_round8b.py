"""Round-8 operator invariants (sf0.001 fixtures).

The DuckDB oracle hash is the correctness gate; these tests pin the
MATHEMATICAL invariants a hash can't see (ranges, monotonicity,
cross-operator consistency, numpy agreement for the eigensolver)."""

from __future__ import annotations

import numpy as np

from bpaotu_spark.registry import QUERIES, load_all

load_all()


def _rows(name, spark, sf_dir):
    return QUERIES[name](spark, sf_dir).collect()


def test_life_table_risk_monotone(spark, sf_dir):
    rows = sorted(
        _rows("life_table_actuarial", spark, sf_dir),
        key=lambda r: r.interval_start_days,
    )
    risks = [r.n_risk for r in rows]
    assert risks == sorted(risks, reverse=True)
    assert all(0 <= r.q_ppm <= 1_000_000 for r in rows)
    # every gap resolves: events across intervals = initial at-risk
    assert sum(r.n_events for r in rows) == rows[0].n_risk


def test_quantiles_monotone_within_segment(spark, sf_dir):
    rows = _rows("quantiles_exact_by_segment", spark, sf_dir)
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.seg, []).append((r.q, r.value_cents))
    for seg, qs in by_seg.items():
        qs.sort()
        vals = [v for _, v in qs]
        assert vals == sorted(vals), seg
        assert [q for q, _ in qs] == [10, 25, 50, 75, 90]


def test_runs_test_bounds(spark, sf_dir):
    r = _rows("orders_runs_test", spark, sf_dir)[0]
    assert 1 <= r.n_runs <= r.n1 + r.n2
    assert r.n1 > 0 and r.n2 > 0


def test_acf_lag_bounds(spark, sf_dir):
    rows = _rows("daily_acf_lags", spark, sf_dir)
    assert sorted(r.lag for r in rows) == [1, 7, 14, 28]
    for r in rows:
        # |acf| <= 1 up to the cross-pair/variance count mismatch slack
        assert -1100 <= r.acf_milli <= 1100


def test_seasonality_strength_range(spark, sf_dir):
    r = _rows("seasonality_strength", spark, sf_dir)[0]
    assert 0 <= r.f_seasonal_milli <= 1000


def test_mase_positive(spark, sf_dir):
    r = _rows("seasonal_naive_mase", spark, sf_dir)[0]
    assert r.mase_milli > 0
    assert r.n7 < r.n1  # lag-7 pairs are strictly fewer


def test_page_hinkley_bounds(spark, sf_dir):
    r = _rows("page_hinkley_drift", spark, sf_dir)[0]
    assert r.max_rise_milli >= 0
    assert 0 <= r.n_alarm_days <= r.n_days


def test_grubbs_positive(spark, sf_dir):
    r = _rows("grubbs_outlier_daily", spark, sf_dir)[0]
    assert r.g_milli > 0
    assert r.max_dev_milli > 0


def test_beta_pairwise_ppm_ranges(spark, sf_dir):
    for name, col in (
        ("beta_diversity_kulczynski", "kulczynski_ppm"),
        ("beta_diversity_ochiai", "ochiai_ppm"),
    ):
        rows = _rows(name, spark, sf_dir)
        assert rows, name
        assert all(0 <= r[col] <= 1_000_000 for r in rows), name


def test_chao2_at_least_observed(spark, sf_dir):
    r = _rows("chao2_incidence", spark, sf_dir)[0]
    assert r.chao2_milli >= r.s_obs * 1000
    assert r.q1 >= 0 and r.q2 >= 0


def test_goods_coverage_bands(spark, sf_dir):
    rows = _rows("sample_coverage_goods", spark, sf_dir)
    assert all(0 <= r.coverage_band <= 9 for r in rows)
    assert all(0 <= r.mean_c_ppm <= 1_000_000 for r in rows)


def test_rank_shift_bounds(spark, sf_dir):
    r = _rows("otu_rank_shift", spark, sf_dir)[0]
    assert 0 <= r.n_common <= min(200, r.n_union)
    assert 0 <= r.shift_ppm <= 1_000_000
    assert r.footrule >= 0


def test_splice_kinds_and_counts(spark, sf_dir):
    rows = _rows("dedup_splice_pairs", spark, sf_dir)
    assert {r.kind for r in rows} <= {"pp", "ps"}
    assert all(r.n_pairs >= max(r.n_a_docs, r.n_b_docs) / 2 >= 0 for r in rows)


def test_trigram_entropy_upper_bound(spark, sf_dir):
    rows = _rows("corpus_char_trigram_entropy", spark, sf_dir)
    for r in rows:
        # H <= ln(n_distinct), with 1e-3 slack for per-term flooring
        assert -1000 <= r.h_micro <= np.log(r.n_distinct) * 1e6 + 1000


def test_script_mix_shares(spark, sf_dir):
    rows = _rows("doc_script_mix", spark, sf_dir)
    assert all(0 <= r.alpha_decile <= 9 for r in rows)
    assert all(
        0 <= r.other_share_ppm + r.digit_share_ppm <= 1_000_000
        for r in rows
    )


def test_split_kl_sane(spark, sf_dir):
    rows = _rows("split_unigram_kl", spark, sf_dir)
    for r in rows:
        # KL >= 0 up to per-term flooring slack; finite and bounded
        assert -10_000 <= r.kl_micro < 10_000_000
        assert r.n_train_tokens > r.n_held_tokens  # 80/20 split


def test_bpe_merges_descending(spark, sf_dir):
    rows = sorted(_rows("bpe_merge_candidates", spark, sf_dir),
                  key=lambda r: r.rnk)
    assert len(rows) == 20
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r.pair) == 2 for r in rows)


def test_compressibility_ratio_bounds(spark, sf_dir):
    rows = _rows("doc_fourgram_compressibility", spark, sf_dir)
    assert all(0 < r.pooled_ratio_ppm <= 1_000_000 for r in rows)


def test_range_query_monotone(spark, sf_dir):
    rows = _rows("ann_range_query_count", spark, sf_dir)
    assert len(rows) == 10
    for r in rows:
        assert r.n_small <= r.n_mid <= r.n_large
        assert r.nn_d2 >= 0


def test_multiprobe_rank1_at_least_single_probe(spark, sf_dir):
    """More probes can only improve the rank-1 candidate."""
    single = {
        r.query_id: r.cos_sim
        for r in _rows("ann_lsh_topk", spark, sf_dir)
        if r.rnk == 1
    }
    multi = {
        r.query_id: r.cos_sim
        for r in _rows("ann_lsh_multiprobe_topk", spark, sf_dir)
        if r.rnk == 1
    }
    for q, c in single.items():
        assert q in multi and multi[q] >= c - 1e-9


def test_snn_shared_bounds(spark, sf_dir):
    rows = _rows("knn_shared_neighbor_histogram", spark, sf_dir)
    assert all(1 <= r.shared <= 5 for r in rows)


def test_silhouette_census(spark, sf_dir):
    rows = _rows("label_silhouette_centroid", spark, sf_dir)
    total = sum(r.n_vecs for r in rows)
    from bpaotu_spark.catalog import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    assert total == n
    for r in rows:
        assert 0 <= r.n_misassigned <= r.n_vecs
        assert -1000 * r.n_vecs <= r.sum_s_milli <= 1000 * r.n_vecs


def test_pca_axis_matches_numpy(spark, sf_dir):
    """The fixed-point dominant axis agrees with numpy eigh on the
    SAME milli-quantized covariance."""
    from bpaotu_spark.catalog import load_table

    rows = load_table(spark, sf_dir, "embeddings").collect()
    X = np.array(
        [np.floor(np.array(r.embedding, dtype=np.float64) * 1000)
         for r in rows]
    )
    C = len(X) * (X.T @ X) - np.outer(X.sum(0), X.sum(0))
    vals, vecs = np.linalg.eigh(C)
    v = vecs[:, -1]
    if v[0] < 0:
        v = -v
    got = np.zeros(X.shape[1])
    out = _rows("embedding_pca_power_axis", spark, sf_dir)
    for r in out:
        got[r.dim - 1] = r.loading_micro / 1e6
    # sign convention: operator fixes the LOWEST-dim loading positive
    if got[0] < 0:
        got = -got
    np.testing.assert_allclose(got, v, atol=2e-2)


def test_norm_anova_ranges(spark, sf_dir):
    r = _rows("embedding_norm_vs_label_anova", spark, sf_dir)[0]
    assert r.f_milli >= 0
    assert 0 <= r.eta2_ppm <= 1_000_000


def test_hhi_ranges(spark, sf_dir):
    rows = _rows("orders_hhi_by_nation", spark, sf_dir)
    for r in rows:
        # HHI >= 1/n and <= 1; top1 share within (0, 1]
        assert 1_000_000 // max(r.n_customers, 1) <= r.hhi_ppm <= 1_000_000
        assert 0 < r.top1_share_ppm <= 1_000_000


def test_slow_mover_bands(spark, sf_dir):
    rows = _rows("parts_slow_mover_detection", spark, sf_dir)
    assert all(0 <= r.staleness_band <= 12 for r in rows)
    assert all(r.min_days_stale <= r.max_days_stale for r in rows)


def test_sentence_profile_positive(spark, sf_dir):
    rows = _rows("text_sentence_profile", spark, sf_dir)
    for r in rows:
        assert r.sents_per_doc_milli >= 1000  # >= 1 sentence per doc
        assert r.words_per_sent_milli > 0


def test_event_entropy_bands(spark, sf_dir):
    rows = _rows("event_type_entropy", spark, sf_dir)
    for r in rows:
        assert r.entropy_band >= 0
        assert r.mean_h_micro >= 0


def test_friedman_jt_defined(spark, sf_dir):
    f = _rows("friedman_test_weekday", spark, sf_dir)[0]
    if f.n_blocks == 0:
        # sf0.001's sparse calendar has no complete ISO week — both
        # engines agree on the degenerate (0, 0, NULL) row
        assert f.k == 0 and f.chi2_milli is None
    else:
        assert f.k == 7 and f.chi2_milli is not None
    j = _rows("jonckheere_terpstra_trend", spark, sf_dir)[0]
    assert j.k_groups == 5 and j.jt_x2 > 0
