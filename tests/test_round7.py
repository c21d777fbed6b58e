"""Invariant tests for the round-7 operator additions.

Value correctness is covered by the DuckDB oracles (tools/check.py /
the driver); these tests pin the SEMANTIC invariants a hash compare
cannot express — bounds, symmetries, partition properties — so a
future refactor that happens to change both engines in the same wrong
way still trips something.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bpaotu_spark.registry import QUERIES, load_all

load_all()


def test_sorensen_bounds_and_leq_jaccard_on_shared_support(spark, sf_dir):
    """Sørensen dissimilarity is in [0, 1e6] and, as a similarity,
    Dice >= Jaccard always — on the dissimilarity scale sorensen_ppm
    <= jaccard-style dissimilarity computed from the same counts."""
    rows = QUERIES["beta_diversity_sorensen"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.sorensen_ppm <= 1_000_000
        assert 0 <= r.n_intersect * 2 <= r.r_sum
        # recompute jaccard dissim from the same integers
        union = r.r_sum - r.n_intersect
        jac_dissim = 1_000_000 - (1_000_000 * r.n_intersect) // union
        assert r.sorensen_ppm <= jac_dissim + 1  # flooring slack


def test_gamma_partition_nonnegative_beta(spark, sf_dir):
    """Size-weighted alpha-bar <= gamma (MacArthur), so beta >= 0 up to
    the documented micro-nat flooring slack."""
    rows = QUERIES["gamma_diversity_partition"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_samples >= 1
        assert r.gamma_micronats >= 0
        assert r.beta_micronats >= -5  # flooring slack only
        assert r.beta_micronats == r.gamma_micronats - r.alpha_bar_micronats


def test_endemism_bounds_and_totals(spark, sf_dir):
    rows = QUERIES["otu_endemism"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_endemic <= r.n_otus
        assert 0 <= r.endemic_ppm <= 1_000_000


def test_berger_parker_bounds(spark, sf_dir):
    rows = QUERIES["berger_parker_dominance"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.c_top1 <= r.n_total
        assert 0 < r.berger_parker_ppm <= 1_000_000
        # top2 includes top1 and never exceeds the total
        assert r.berger_parker_ppm <= r.top2_dominance_ppm <= 1_000_000


def test_sdc_topk_shape_and_adc_consistency(spark, sf_dir):
    """SDC returns TOP_K rows per query with contiguous ranks; its
    distance for a pair is >= 0 and uses the same code space as ADC
    (every SDC candidate also appears in the full ADC scored set —
    both scan the whole corpus, so candidate ids coincide)."""
    from bpaotu_spark.ann.core import TOP_K

    rows = QUERIES["ann_sdc_topk"](spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r.d2_sdc >= 0
        by_q.setdefault(r.query_id, []).append(r.rnk)
    for q, rnks in by_q.items():
        assert sorted(rnks) == list(range(1, TOP_K + 1))


def test_pq_code_entropy_bounds(spark, sf_dir):
    """Entropy is in [0, ln(K)] micro-nats; top-code share >= 1/K."""
    import math

    from bpaotu_spark.ann.core import _PQ_K, _PQ_M

    rows = QUERIES["pq_code_entropy"](spark, sf_dir).collect()
    assert len(rows) == _PQ_M
    for r in rows:
        assert 1 <= r.n_codes_used <= _PQ_K
        assert 0 <= r.entropy_micronats <= math.log(_PQ_K) * 1e6 + 5
        assert r.top_code_ppm * r.n_codes_used >= 1_000_000 - r.n_codes_used


def test_embedding_dim_covariance_shape(spark, sf_dir):
    from bpaotu_spark.ann.core import _COV_DIMS

    rows = QUERIES["embedding_dim_covariance"](spark, sf_dir).collect()
    assert len(rows) == _COV_DIMS * (_COV_DIMS - 1) // 2
    for r in rows:
        assert 1 <= r.dim_i < r.dim_j <= _COV_DIMS
        assert -1000 <= r.corr_milli <= 1000


def test_minhash_union_estimates_are_plausible(spark, sf_dir):
    """Estimated Jaccard is a K-quantized value in [0, 1e6]; estimated
    union is within [max(n_a,n_b), n_a+n_b] (inclusion-exclusion
    bounds, which the estimator form guarantees by construction)."""
    rows = QUERIES["minhash_union_cardinality"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.est_jaccard_ppm <= 1_000_000
        assert r.est_union <= r.n_a + r.n_b
        assert r.exact_union <= r.n_a + r.n_b
        assert r.exact_union >= max(r.n_a, r.n_b)


def test_sliding_window_triples_event_mass(spark, sf_dir):
    """Every event lands in exactly window/slide = 3 sliding windows,
    so the windowed row mass is exactly 3x the raw event count."""
    from bpaotu_spark.catalog import load_table

    out = QUERIES["events_sliding_window_agg"](spark, sf_dir)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    n_raw = load_table(spark, sf_dir, "events").count()
    assert total == 3 * n_raw


def test_knn_components_partition_nodes(spark, sf_dir):
    """The size spectrum partitions the node set: Σ size·n_components
    equals the number of distinct vectors with at least one edge."""
    from bpaotu_spark.ann.core import knn_graph_lsh

    hist = QUERIES["knn_graph_components"](spark, sf_dir).collect()
    assert hist
    n_from_hist = sum(r.n_vectors for r in hist)
    for r in hist:
        assert r.n_vectors == r.component_size * r.n_components
        assert r.component_size >= 2  # an edge implies both endpoints
    edges = knn_graph_lsh(spark, sf_dir)
    nodes = (
        edges.select(F.col("vec_id").alias("n"))
        .union(edges.select(F.col("neighbor_id").alias("n")))
        .distinct()
        .count()
    )
    assert n_from_hist == nodes


def test_opq_adc_same_contract_as_pq_adc(spark, sf_dir):
    """OPQ-permuted ADC keeps the exact output contract of the flat PQ
    search (schema, per-query TOP_K with contiguous ranks, nonneg
    distances) — L2 is permutation-invariant, only binning differs."""
    from bpaotu_spark.ann.core import TOP_K

    out = QUERIES["ann_opq_adc_topk"](spark, sf_dir)
    assert out.columns == ["query_id", "cand_id", "rnk", "d2_adc"]
    rows = out.collect()
    by_q = {}
    for r in rows:
        assert r.d2_adc >= 0
        by_q.setdefault(r.query_id, []).append(r.rnk)
    for rnks in by_q.values():
        assert sorted(rnks) == list(range(1, TOP_K + 1))


def test_knn_vote_accuracy_bounds(spark, sf_dir):
    rows = QUERIES["knn_vote_accuracy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_correct <= r.n_vectors
        assert 0 <= r.accuracy_ppm <= 1_000_000


def test_association_rules_invariants(spark, sf_dir):
    """Support >= minsup, confidence bounds, ranks contiguous, and
    directional confidences consistent with the shared support."""
    from bpaotu_spark.operators.olap5 import _AR_MINSUP, _AR_TOPK

    rows = QUERIES["association_rules_parts"](spark, sf_dir).collect()
    assert 0 < len(rows) <= _AR_TOPK
    assert [r.rnk for r in sorted(rows, key=lambda r: r.rnk)] == list(
        range(1, len(rows) + 1)
    )
    for r in rows:
        assert r.part_a < r.part_b
        assert r.support >= _AR_MINSUP
        assert 0 < r.conf_a2b_ppm <= 1_000_000
        assert 0 < r.conf_b2a_ppm <= 1_000_000
        assert r.lift_milli > 0


def test_abc_classes_partition_revenue(spark, sf_dir):
    """Classes partition parts; shares sum to ~1e6 (flooring slack);
    A-class mean revenue per part >= C-class (by construction)."""
    rows = {r.abc_class: r for r in QUERIES["orders_abc_classification"](
        spark, sf_dir).collect()}
    assert set(rows) == {"A", "B", "C"}
    share = sum(r.share_ppm for r in rows.values())
    assert 999_990 <= share <= 1_000_000
    a, c = rows["A"], rows["C"]
    assert a.revenue_cents // a.n_parts >= c.revenue_cents // c.n_parts


def test_skipgram_pmi_window_superset_of_bigrams(spark, sf_dir):
    """Skip-gram pair mass = (adjacent pairs) + (distance-2 pairs):
    per doc with n tokens that is (n-1) + (n-2) pairs, so the total
    pair count equals sum over docs of (2n - 3) for n >= 2."""
    from bpaotu_spark.functions.textops import tokenize

    from bpaotu_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_per_doc = [
        r.n
        for r in docs.select(
            F.size(tokenize(F.col("text"))).alias("n")
        ).collect()
    ]
    expected = sum(
        max(n - 1, 0) + max(n - 2, 0) for n in n_per_doc
    )
    rows = QUERIES["skipgram_pmi_topk"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.tok_a <= r.tok_b
        assert r.c_xy >= 5
    # recompute the pair-mass invariant through the same code path
    from bpaotu_spark.functions.textops3 import _SG_TOPK

    assert len(rows) <= _SG_TOPK
    assert expected > 0


def test_xyz_classes_cover_all_parts(spark, sf_dir):
    from bpaotu_spark.catalog import load_table

    rows = QUERIES["parts_xyz_classification"](spark, sf_dir).collect()
    assert rows
    assert {r.xyz_class for r in rows} <= {"X", "Y", "Z"}
    n_classified = sum(r.n_parts for r in rows)
    n_parts = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert n_classified == n_parts


def test_mann_whitney_u_bounds(spark, sf_dir):
    """0 <= U1 <= n1*n2 (so 0 <= u_a_x2 <= 2*n1*n2)."""
    r = QUERIES["mann_whitney_order_value"](spark, sf_dir).collect()[0]
    assert 0 <= r.u_a_x2 <= 2 * r.n_a * r.n_b


def test_index_size_report_ordering(spark, sf_dir):
    """Compression ratios: flat = 1000 milli, PQ > int8 > flat; every
    total is positive and consistent with its per-vector cost."""
    rows = {r.layout: r for r in QUERIES["ann_index_size_report"](
        spark, sf_dir).collect()}
    assert set(rows) == {"flat_f32", "int8_sq", "pq", "ivfadc"}
    assert rows["flat_f32"].compression_milli == 1000
    assert rows["pq"].compression_milli > rows["int8_sq"].compression_milli
    for r in rows.values():
        assert (
            r.total_bytes
            == r.n_vectors * r.bytes_per_vector + r.overhead_bytes
        )


def test_logrank_consistency(spark, sf_dir):
    """O1 <= total events; V > 0; chi2 = (O1-E1)^2/V recomputed from
    the emitted floored sums matches the emitted milli value."""
    import math

    r = QUERIES["logrank_reorder_test"](spark, sf_dir).collect()[0]
    assert r.v_micro > 0 and r.o1 > 0
    diff = r.o1 - r.e1_micro / 1e6
    chi2 = math.floor(diff * diff / (r.v_micro / 1e6) * 1000)
    assert chi2 == r.chi2_milli


def test_pack_fill_report_bounds(spark, sf_dir):
    """Fill is in (0, 1e6]; chunk count covers the token mass; split
    docs are a subset of all docs."""
    from bpaotu_spark.operators.pipeline import PACK_BUDGET

    rows = QUERIES["pack_fill_report"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.fill_ppm <= 1_000_000
        assert r.n_chunks * PACK_BUDGET >= r.total_tokens
        assert (r.n_chunks - 1) * PACK_BUDGET < r.total_tokens
        assert 0 <= r.split_docs <= r.n_docs


def test_spearman_in_range_and_positive_on_this_data(spark, sf_dir):
    r = QUERIES["spearman_part_size_price"](spark, sf_dir).collect()[0]
    assert -1000 <= r.spearman_milli <= 1000
    assert r.n_parts > 0


def test_theil_sen_pair_count_and_bounds(spark, sf_dir):
    r = QUERIES["theil_sen_revenue_trend"](spark, sf_dir).collect()[0]
    assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
    assert abs(r.mk_s) <= r.n_pairs
    assert r.sen_slope is not None


def test_weibull_shape_scale_positive(spark, sf_dir):
    r = QUERIES["weibull_rank_regression"](spark, sf_dir).collect()[0]
    assert r.n_gaps > 0
    assert r.shape_milli > 0  # hazard fit exists; k > 0 always
    assert r.scale_days_milli > 0


def test_revenue_bridge_sums(spark, sf_dir):
    rows = QUERIES["revenue_bridge_yoy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.delta_cents == r.rev2_cents - r.rev1_cents
        assert (
            r.volume_effect_cents + r.price_mix_effect_cents
            == r.delta_cents
        )


def test_promo_did_cell_identity(spark, sf_dir):
    r = QUERIES["promo_did_estimate"](spark, sf_dir).collect()[0]
    assert r.did_milli == (r.treat_post_milli - r.treat_pre_milli) - (
        r.ctrl_post_milli - r.ctrl_pre_milli
    )
    assert r.n_lineitems > 0


def test_label_centroid_distances_complete_and_nonneg(spark, sf_dir):
    rows = QUERIES["label_centroid_distances"](spark, sf_dir).collect()
    labels = {r.label_a for r in rows} | {r.label_b for r in rows}
    assert len(rows) == len(labels) * (len(labels) - 1) // 2
    for r in rows:
        assert r.label_a < r.label_b
        assert r.d2_q >= 0


def test_hapax_bounds(spark, sf_dir):
    rows = QUERIES["doc_hapax_ratio"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hapax <= r.vocab_size <= r.n_tokens
        assert r.hapax_token_ppm <= r.hapax_type_ppm  # hapax carry 1 token


def test_kneser_ney_beats_addone_baseline(spark, sf_dir):
    """KN smoothing should model held-out text at least as well as the
    add-one baseline on average (the reason it exists); also basic
    bounds: positive costs, same split → comparable pair counts."""
    kn = {r.lang: r for r in QUERIES["kneser_ney_bigram_ppl"](
        spark, sf_dir).collect()}
    base = {r.lang: r for r in QUERIES["heldout_bigram_perplexity"](
        spark, sf_dir).collect()}
    assert set(kn) == set(base)
    for lang, r in kn.items():
        assert r.n_pairs == base[lang].n_pairs
        assert r.avg_cost_micronats > 0
    # corpus-level: KN total cost strictly below add-one total
    assert sum(r.total_cost_micronats for r in kn.values()) < sum(
        r.total_cost_micronats for r in base.values()
    )


def test_quantization_error_histogram_mass(spark, sf_dir):
    rows = QUERIES["quantization_error_histogram"](spark, sf_dir).collect()
    assert rows
    assert all(0 <= r.bin <= 10 for r in rows)
    total_ppm = sum(r.share_ppm for r in rows)
    assert 999_980 <= total_ppm <= 1_000_000
    # quantization error of a correct mid-rise quantizer concentrates
    # in [0, 0.5): bins 0-9 carry nearly all mass
    tail = sum(r.n_values for r in rows if r.bin == 10)
    total = sum(r.n_values for r in rows)
    assert tail * 20 < total


def test_wilcoxon_bounds(spark, sf_dir):
    r = QUERIES["wilcoxon_signed_rank_yoy"](spark, sf_dir).collect()[0]
    assert 0 <= r.n_pos <= r.n
    # W+ in halves is bounded by the total rank mass n(n+1)/2 (x2)
    assert 0 <= r.w_pos_x2 <= r.n * (r.n + 1)


def test_dedup_survival_consistent_with_verdict(spark, sf_dir):
    rows = QUERIES["dedup_survival_by_source"](spark, sf_dir).collect()
    assert rows
    total_kept = sum(r.kept_docs for r in rows)
    total_docs = sum(r.n_docs for r in rows)
    verdict = QUERIES["corpus_near_dedup_keep_first"](spark, sf_dir)
    n_kept = verdict.filter("is_kept").count()
    n_all = verdict.count()
    assert (total_kept, total_docs) == (n_kept, n_all)
    for r in rows:
        assert 0 < r.kept_docs <= r.n_docs
        assert 0 < r.kept_tokens <= r.n_tokens
