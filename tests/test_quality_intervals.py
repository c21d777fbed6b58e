"""Invariants for the round-6 session-3 operators (quality + intervals).

Value correctness is covered by tools/check.py (DuckDB oracle compare);
these pin the semantic properties the hash can't see: funnel
monotonicity vs the unbounded funnel, SCD2 interval chaining, tertile
ordering, and rule-census consistency.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bpaotu_spark.registry import QUERIES, load_all

load_all()


def test_gopher_rule_census_consistent(spark, sf_dir):
    rows = QUERIES["gopher_quality_rules"](spark, sf_dir).collect()
    n_total = sum(r.n_docs for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert n_total == docs  # every doc tokenizes to >= 1 word here
    for r in rows:
        per_rule = (
            r.pass_word_count,
            r.pass_mean_word_len,
            r.pass_stopwords,
            r.pass_dominance,
            r.pass_distinct_ratio,
        )
        assert all(0 <= p <= r.n_docs for p in per_rule)
        # the conjunction can't beat its weakest conjunct
        assert r.pass_all <= min(per_rule)
        assert 0 <= r.pass_all_ppm <= 1_000_000
        assert r.pass_all_ppm == r.pass_all * 1_000_000 // r.n_docs


def test_ccnet_tertiles_partition_each_lang(spark, sf_dir):
    rows = QUERIES["ccnet_perplexity_tertiles"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_lang = {
        r.lang: r.cnt
        for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    by_lang: dict[str, dict[str, object]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}
        assert sum(b.n_docs for b in buckets.values()) == per_lang[lang]
        # ntile sizes differ by at most 1
        sizes = sorted(b.n_docs for b in buckets.values())
        assert sizes[-1] - sizes[0] <= 1
        # surprisal ordering: head <= middle <= tail (ties may straddle
        # a boundary, hence <=)
        assert buckets["head"].max_ll_micro <= buckets["middle"].min_ll_micro
        assert buckets["middle"].max_ll_micro <= buckets["tail"].min_ll_micro
        for b in buckets.values():
            assert b.min_ll_micro <= b.mean_ll_micro <= b.max_ll_micro


def test_rep_profile_bounds(spark, sf_dir):
    rows = QUERIES["doc_ngram_rep_profile"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.mean_dup5_ppm <= r.max_dup5_ppm <= 1_000_000
        assert 0 <= r.docs_with_rep <= r.n_docs
        assert r.docs_with_rep_ppm == r.docs_with_rep * 1_000_000 // r.n_docs
        if r.max_dup5_ppm > 0:
            assert r.docs_with_rep > 0


def test_window_funnel_strict_dominated_by_unbounded(spark, sf_dir):
    strict = QUERIES["window_funnel_strict"](spark, sf_dir).collect()[0]
    loose = QUERIES["funnel_conversion"](spark, sf_dir).collect()[0]
    assert strict.n_signup >= strict.n_view_24h >= strict.n_purchase_24h
    # same step-1 definition; later steps only tighten (> and 24 h cap)
    assert strict.n_signup == loose.n_signup
    assert strict.n_view_24h <= loose.n_signup_view
    assert strict.n_purchase_24h <= loose.n_full_funnel


def test_scd2_intervals_chain(spark, sf_dir):
    df = QUERIES["scd2_user_state_intervals"](spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # total events are conserved across intervals
    assert (
        df.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    )
    rows = df.filter(F.col("user_id") % 7 == 0).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for _, ivs in by_user.items():
        ivs.sort(key=lambda r: r.interval_seq)
        assert [r.interval_seq for r in ivs] == list(range(1, len(ivs) + 1))
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from  # half-open chaining
            assert a.state != b.state  # collapse really collapsed
            assert a.valid_from < a.valid_to
        assert ivs[-1].valid_to is None  # open current state


def test_cusum_one_changepoint_per_year(spark, sf_dir):
    rows = QUERIES["revenue_cusum_changepoint"](spark, sf_dir).collect()
    years = [r.year for r in rows]
    assert len(years) == len(set(years)) and rows
    for r in rows:
        assert 1 <= r.n_days <= 366
        assert r.max_dev_cents >= 0
        assert r.side in (1, -1)
        assert r.cp_date.year == r.year


def test_permanova_decomposition(spark, sf_dir):
    r = QUERIES["permanova_pseudo_f"](spark, sf_dir).collect()[0]
    assert r.n_samples >= 2 and r.k_groups == 2
    assert r.n_pairs == r.n_samples * (r.n_samples - 1) // 2
    # SS decomposition: between = total - within, both non-negative
    # (floor error can't flip signs at these magnitudes)
    assert r.ss_within_ppm2 >= 0
    assert r.ss_between_ppm2 == r.ss_total_ppm2 - r.ss_within_ppm2
    assert r.ss_between_ppm2 >= 0
    assert r.pseudo_f_milli is not None and r.pseudo_f_milli >= 0


def test_cosine_histogram_covers_all_pairs(spark, sf_dir):
    rows = QUERIES["embedding_cosine_pair_histogram"](spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    per_label = [
        r.c for r in emb.groupBy("label").agg(F.count("*").alias("c")).collect()
    ]
    expected_pairs = sum(c * (c - 1) // 2 for c in per_label)
    assert sum(r.n_pairs for r in rows) == expected_pairs
    for r in rows:
        assert 0 <= r.bin <= 19
        assert r.hi_milli - r.lo_milli == 100
        assert -1000 <= r.lo_milli <= 900
    # dedup_embedding's threshold region must be visible in the bins:
    # every pair the dedup op emits falls in a bin at/above the threshold
    n_dups = QUERIES["dedup_embedding"](spark, sf_dir).count()
    above = sum(r.n_pairs for r in rows if r.lo_milli >= 200)
    assert n_dups <= above


def test_otu_region_overlap_venn_consistent(spark, sf_dir):
    rows = QUERIES["otu_region_overlap"](spark, sf_dir).collect()
    # 5 regions -> 10 unordered pairs
    assert len(rows) == 10
    for r in rows:
        assert r.region_a < r.region_b
        assert 0 <= r.n_shared <= min(r.n_a, r.n_b)
        assert r.only_a == r.n_a - r.n_shared
        assert r.only_b == r.n_b - r.n_shared
        union = r.n_a + r.n_b - r.n_shared
        assert r.jaccard_ppm == r.n_shared * 1_000_000 // union


def test_dim_broadcast_advisor_sane(spark, sf_dir):
    rows = {r.tbl: r for r in QUERIES["dim_broadcast_advisor"](spark, sf_dir).collect()}
    assert set(rows) == {"region", "nation", "supplier", "customer", "part"}
    for r in rows.values():
        assert r.n_rows > 0 and r.est_bytes > r.n_rows  # > 1 byte/row
        assert r.bytes_per_row == r.est_bytes // r.n_rows
        # fits_10mb implies fits_64mb
        assert (not r.fits_10mb) or r.fits_64mb
    assert rows["region"].n_rows == 5
    # at test scale everything broadcasts; the advisor's value is the
    # bytes model being exact, which the oracle hash already pins
    assert rows["customer"].est_bytes > rows["nation"].est_bytes


def test_assortativity_in_range(spark, sf_dir):
    r = QUERIES["knn_degree_assortativity"](spark, sf_dir).collect()[0]
    assert r.n_edges > 0 and r.n_nodes > 1
    # the moment mean is the stub-weighted (remaining-degree) mean
    # Σd²/2E, which Cauchy-Schwarz bounds below by the plain 2E/N
    assert r.mean_degree_milli >= 2000 * r.n_edges // r.n_nodes
    if r.assortativity_milli is not None:
        assert -1000 <= r.assortativity_milli <= 1000


def test_weighted_sample_prefers_long_docs(spark, sf_dir):
    rows = QUERIES["weighted_sample_es"](spark, sf_dir).collect()
    assert len(rows) == 50
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
        range(1, 51)
    )
    keys = [r.key_nano for r in sorted(rows, key=lambda r: r.rank)]
    assert keys == sorted(keys, reverse=True)
    # inclusion ∝ length: the sampled mean length must exceed the corpus mean
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = sum(r.w for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_skyline_is_pareto_front(spark, sf_dir):
    sky = QUERIES["part_price_size_skyline"](spark, sf_dir).collect()
    assert sky
    # no skyline point dominates another (maximize size, minimize price)
    for a in sky:
        for b in sky:
            if a.p_partkey == b.p_partkey:
                continue
            dominates = (
                a.p_size >= b.p_size
                and a.p_retailprice <= b.p_retailprice
                and (a.p_size > b.p_size or a.p_retailprice < b.p_retailprice)
            )
            assert not dominates
    # and nothing outside the front dominates a front point
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    best = {r.p_size: r.m for r in part.groupBy("p_size").agg(F.min("p_retailprice").alias("m")).collect()}
    for a in sky:
        for s, m in best.items():
            assert not (s > a.p_size and m <= a.p_retailprice)


def test_mutual_info_bounds(spark, sf_dir):
    r = QUERIES["segment_nation_mutual_info"](spark, sf_dir).collect()[0]
    assert r.n_cells > 0 and r.n_total > 0
    # MI <= min(H_seg, H_nation) up to per-cell floor error (1 micro-nat
    # per cell weighted) — allow that slack
    slack = r.n_cells + 2
    assert r.mi_micronat <= min(r.h_seg_micronat, r.h_nation_micronat) + slack
    assert r.mi_micronat >= -slack
    assert r.h_seg_micronat >= 0 and r.h_nation_micronat >= 0


def test_centroid_accuracy_counts(spark, sf_dir):
    rows = QUERIES["centroid_assignment_accuracy"](spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    per_label = {
        r.label: r.c
        for r in emb.groupBy("label").agg(F.count("*").alias("c")).collect()
    }
    assert {r.label for r in rows} == set(per_label)
    for r in rows:
        assert r.n_vectors == per_label[r.label]
        assert 0 <= r.n_correct <= r.n_vectors
        assert r.accuracy_ppm == r.n_correct * 1_000_000 // r.n_vectors


def test_triplet_margin_consistent_with_labels(spark, sf_dir):
    rows = QUERIES["embedding_triplet_margin"](spark, sf_dir).collect()
    assert len(rows) == 10  # N_QUERIES
    for r in rows:
        assert -1.0 <= r.best_neg_cos <= 1.0
        assert -1.0 <= r.best_pos_cos <= 1.0
        assert r.margin_milli == __import__("math").floor(
            (r.best_pos_cos - r.best_neg_cos) * 1000
        )


def test_gapfill_spine_contiguous(spark, sf_dir):
    import datetime

    rows = QUERIES["daily_revenue_gapfill"](spark, sf_dir).collect()
    days = sorted(r.day for r in rows)
    assert (days[-1] - days[0]).days + 1 == len(days)  # no missing day
    by_day = {r.day: r for r in rows}
    for r in rows:
        assert r.is_gap == (r.revenue_cents == 0) or not r.is_gap
        lo = max(days[0], r.day - datetime.timedelta(days=6))
        expect = sum(
            by_day[d].revenue_cents
            for d in (lo + datetime.timedelta(days=i) for i in range(7))
            if d in by_day and d <= r.day
        )
        assert r.trailing_7d_cents == expect


def test_rare_category_collapse_partition(spark, sf_dir):
    rows = QUERIES["rare_category_collapse"](spark, sf_dir).collect()
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    n_types = part.select("p_type").distinct().count()
    n_parts = part.count()
    kept = [r for r in rows if r.category != "__OTHER__"]
    other = [r for r in rows if r.category == "__OTHER__"]
    assert len(kept) == min(10, n_types)
    assert sum(r.n_parts for r in rows) == n_parts
    assert sum(r.n_source_categories for r in rows) == n_types
    if other:
        assert other[0].n_source_categories == n_types - len(kept)
    assert abs(sum(r.share_ppm for r in rows) - 1_000_000) <= len(rows)


def test_bloom_fpp_measured_consistent(spark, sf_dir):
    r = QUERIES["bloom_fpp_measured"](spark, sf_dir).collect()[0]
    assert r.m_bits == 16384 and r.k_hashes == 3
    assert 0 < r.bits_set <= min(r.m_bits, r.n_members * r.k_hashes)
    assert r.load_ppm == r.bits_set * 1_000_000 // r.m_bits
    assert 0 <= r.fp_count <= r.n_probes
    assert r.fpp_measured_ppm == r.fp_count * 1_000_000 // r.n_probes
    # measured FPP should be in the same decade as theory (generous
    # bound: within 5x either way once theory is non-trivial)
    if r.fpp_theoretical_ppm >= 1000 and r.n_probes >= 1000:
        assert r.fpp_measured_ppm <= 5 * r.fpp_theoretical_ppm + 1000
        assert 5 * r.fpp_measured_ppm + 1000 >= r.fpp_theoretical_ppm


def test_scrub_apply_receipt(spark, sf_dir):
    df = QUERIES["corpus_regex_scrub_apply"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert df.count() == docs.count()
    rows = df.filter(F.col("doc_id") % 10 == 0).collect()
    for r in rows:
        # changed implies at least one match and vice versa (mask tokens
        # never equal the matched text on this corpus)
        assert r.changed == (r.n_matches > 0)
        assert len(r.masked_md5) == 32


def test_markov_eval_accuracy_bounds(spark, sf_dir):
    rows = QUERIES["markov_next_event_accuracy"](spark, sf_dir).collect()
    assert rows
    states = {r.prev_type for r in rows}
    assert states <= {"signup", "view", "click", "purchase", "error"}
    for r in rows:
        assert 0 <= r.n_correct <= r.n_test
        assert r.accuracy_ppm == r.n_correct * 1_000_000 // r.n_test
        # a 5-state chain's argmax predictor must beat 1/25 trivially
        assert r.accuracy_ppm > 40_000


def test_heldout_perplexity_exceeds_in_domain(spark, sf_dir):
    held = {
        r.lang: r
        for r in QUERIES["heldout_bigram_perplexity"](spark, sf_dir).collect()
    }
    assert held
    for r in held.values():
        assert r.n_pairs > 0 and r.n_heldout_docs > 0
        assert r.avg_cost_micronats == r.total_cost_micronats // r.n_pairs
        # add-one smoothing over a real vocab: cost must be positive and
        # below ln(V·max_c) ~ 20 nats
        assert 0 < r.avg_cost_micronats < 20_000_000


def test_filtered_topk_respects_predicate(spark, sf_dir):
    rows = QUERIES["ann_filtered_topk"](spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        # pre-filter: every returned candidate satisfies the predicate
        assert labels[r.cand_id] % 2 == r.q_label % 2
        assert r.cand_id != r.query_id
    for _, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        sims = [r.cos_sim for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_cuped_moments(spark, sf_dir):
    r = QUERIES["ab_cuped_adjustment"](spark, sf_dir).collect()[0]
    assert r.n_users > 0
    assert r.sum_pre_cents > 0 and r.sum_post_cents > 0
    assert r.theta_milli is not None
    # R² is a squared correlation: strictly inside [0, 1e6]
    assert r.var_reduction_ppm is not None
    assert 0 <= r.var_reduction_ppm <= 1_000_000


def test_corr_matrix_shape(spark, sf_dir):
    rows = QUERIES["lineitem_corr_matrix"](spark, sf_dir).collect()
    assert len(rows) == 6
    names = {
        "l_quantity",
        "l_extendedprice_cents",
        "l_discount_bp",
        "l_tax_bp",
    }
    seen = set()
    for r in rows:
        assert r.col_x in names and r.col_y in names and r.col_x != r.col_y
        seen.add((r.col_x, r.col_y))
        assert -1.0 <= r.corr <= 1.0
        assert r.n_rows > 0
    assert len(seen) == 6
    # this driver's synthetic measures are drawn independently — every
    # correlation is near zero, and the operator must SAY so exactly
    for r in rows:
        assert abs(r.corr) < 0.2


def test_v_shape_patterns_valid(spark, sf_dir):
    rows = QUERIES["revenue_v_shape_patterns"](spark, sf_dir).collect()
    for r in rows:
        assert r.down_start_day <= r.bottom_day < r.recovery_day
        assert r.down_days >= 3 and r.up_days >= 3
        # strictly-down run loses value; strictly-up run regains it
        assert r.depth_cents > 0 and r.recovery_cents > 0
        # run lengths match the calendar extent (runs are contiguous days
        # only when no zero-change days interrupt; extent is an upper bound)
        assert (r.bottom_day - r.down_start_day).days + 1 >= r.down_days


def test_apportionment_sums_to_budget(spark, sf_dir):
    rows = QUERIES["token_budget_apportion"](spark, sf_dir).collect()
    assert sum(r.final_alloc for r in rows) == 1_000_000
    total_w = sum(r.tokens_w for r in rows)
    for r in rows:
        assert r.final_alloc in (r.floor_alloc, r.floor_alloc + 1)
        # quota error strictly under one seat (largest-remainder property)
        exact = 1_000_000 * r.tokens_w / total_w
        assert abs(r.final_alloc - exact) < 1


def test_upset_cells_partition_context(spark, sf_dir):
    rows = QUERIES["contextual_filter_upset"](spark, sf_dir).collect()
    assert len(rows) <= 8
    combos = {(r.in_a, r.in_b, r.in_c) for r in rows}
    assert len(combos) == len(rows)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(r.n_samples for r in rows) == cust
    assert abs(sum(r.share_ppm for r in rows) - 1_000_000) <= len(rows)


def test_dim_quantiles_ordered(spark, sf_dir):
    rows = QUERIES["embedding_dim_quantiles"](spark, sf_dir).collect()
    assert len(rows) == 64
    for r in rows:
        assert r.p05 <= r.p50 <= r.p95
        assert r.n_values > 0


def test_scd2_containment_consistent(spark, sf_dir):
    r = QUERIES["scd2_containment_audit"](spark, sf_dir).collect()[0]
    # the build and the containment join must agree exactly on clean data
    assert r.n_intervals_consistent == r.n_intervals
    assert r.n_events_recorded == r.n_events_contained
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert r.n_events_recorded == ev


def test_calibration_buckets_sane(spark, sf_dir):
    rows = QUERIES["markov_calibration_reliability"](spark, sf_dir).collect()
    assert rows
    acc = {
        r.prev_type: r
        for r in QUERIES["markov_next_event_accuracy"](spark, sf_dir).collect()
    }
    total_test = sum(r.n_test for r in acc.values())
    assert sum(r.n_test for r in rows) == total_test
    for r in rows:
        assert 0 <= r.conf_decile <= 10
        assert 0 <= r.observed_acc_ppm <= 1_000_000
        assert 0 <= r.mean_conf_ppm <= 1_000_000
        assert r.calibration_gap_ppm == r.mean_conf_ppm - r.observed_acc_ppm
        # decile labeling consistent with the mean confidence inside it
        assert r.mean_conf_ppm // 100_000 == r.conf_decile


def test_reciprocity_bounds(spark, sf_dir):
    r = QUERIES["knn_reciprocity"](spark, sf_dir).collect()[0]
    assert 0 < r.n_directed
    assert 0 <= r.n_mutual_directed <= r.n_directed
    assert r.n_mutual_directed % 2 == 0  # mutual edges come in pairs
    assert r.n_mutual_pairs == r.n_mutual_directed // 2
    assert r.reciprocity_ppm == r.n_mutual_directed * 1_000_000 // r.n_directed


def test_dwell_time_accounting(spark, sf_dir):
    rows = QUERIES["scd2_dwell_time_stats"](spark, sf_dir).collect()
    iv = QUERIES["scd2_user_state_intervals"](spark, sf_dir)
    n_intervals = iv.count()
    n_open_total = iv.filter(F.col("valid_to").isNull()).count()
    assert sum(r.n_closed + r.n_open for r in rows) == n_intervals
    assert sum(r.n_open for r in rows) == n_open_total
    for r in rows:
        assert r.mean_dwell_us > 0 and r.median_dwell_us > 0
