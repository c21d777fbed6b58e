"""Dedup family: hashing determinism, LSH recall, blocked-join plans."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bpaotu_spark.dedup.core import (
    JACCARD_THRESHOLD,
    doc_ngrams,
)
from bpaotu_spark.registry import QUERIES, load_all

load_all()


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_dedup_exact_partitions_docs(spark, sf_dir, tables):
    rows = QUERIES["dedup_exact"](spark, sf_dir).collect()
    assert len(rows) == tables["documents"].count()
    for r in rows:
        assert r.group_size >= 1
        assert r.is_duplicate == (r.doc_id != r.keeper_id)
        assert len(r.text_hash) == 32


def test_jaccard_pairs_above_threshold(spark, sf_dir):
    rows = QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    assert rows  # the synthetic corpus contains near-duplicates
    for r in rows:
        assert r.jaccard >= JACCARD_THRESHOLD
        assert r.doc_a < r.doc_b


def test_minhash_lsh_recalls_high_jaccard_pairs(spark, sf_dir):
    """Banded LSH (8 bands × 2 rows) must surface essentially every
    Jaccard ≥ 0.9 pair: per-pair miss probability (1-j²)⁸ < 4e-6."""
    jac_pairs = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
        if r.jaccard >= 0.9
    }
    lsh_pairs = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    assert jac_pairs, "corpus should contain >=0.9 pairs"
    assert jac_pairs <= lsh_pairs


def test_simhash_hamming_bound(spark, sf_dir):
    rows = QUERIES["dedup_simhash"](spark, sf_dir).collect()
    for r in rows[:200]:
        assert 0 <= r.hamming <= 3
        assert r.doc_a < r.doc_b
    # canonical pairs, no duplicates across bands
    pairs = [(r.doc_a, r.doc_b) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_embedding_dedup_blocked_no_cartesian(spark, sf_dir):
    df = QUERIES["dedup_embedding"](spark, sf_dir)
    assert "CartesianProduct" not in _plan(df)
    rows = df.collect()
    assert rows
    for r in rows:
        assert -1.0001 <= r.cos_sim <= 1.0001


def test_ngrams_are_three_words(spark, sf_dir):
    rows = doc_ngrams(spark, sf_dir).limit(100).collect()
    for r in rows:
        assert len(r.g.split(" ")) == 3


def test_cluster_cc_matches_union_find(spark, sf_dir):
    pairs = [
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in parent}
    got = {
        r.doc_id: r.cluster_id
        for r in QUERIES["dedup_cluster_cc"](spark, sf_dir).collect()
    }
    assert got == expected


def test_star_cc_deep_chain_converges_in_log_rounds(spark):
    """A 64-node chain has diameter 63 — one-hop label propagation
    would need ~63 rounds; large-star/small-star must finish within
    the O(log n) cap and still label every node with the chain min."""
    from bpaotu_spark.dedup.core import star_connected_components

    n = 64
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a BIGINT, b BIGINT"
    )
    # two extra disjoint components to prove separation
    extra = spark.createDataFrame(
        [(1000, 1001), (2000, 2001), (2001, 2002)], "a BIGINT, b BIGINT"
    )
    labels = {
        r.node: r.component
        for r in star_connected_components(
            chain.union(extra), "a", "b", max_rounds=10
        ).collect()
    }
    assert all(labels[i] == 0 for i in range(n))
    assert labels[1000] == labels[1001] == 1000
    assert labels[2000] == labels[2001] == labels[2002] == 2000
    assert len(labels) == n + 5


def test_star_cc_raises_when_rounds_exhausted(spark):
    """Exhausting max_rounds without a fixed point must be a hard error
    — returning mid-iteration edges would silently mislabel components."""
    from bpaotu_spark.dedup.core import star_connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(31)], "a BIGINT, b BIGINT"
    )
    with pytest.raises(RuntimeError, match="fixed point"):
        star_connected_components(chain, "a", "b", max_rounds=1)


def test_lsh_recall_report_consistency(spark, sf_dir):
    """n_found <= n_true per band; recall is valid ppm; the top
    Jaccard band (>= 0.9) must be fully recalled — missing a
    near-exact duplicate means the banding parameters are broken."""
    rows = QUERIES["dedup_lsh_recall_report"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_found <= r.n_true
        assert 0 <= r.recall_ppm <= 1_000_000
        assert r.recall_ppm == r.n_found * 1_000_000 // r.n_true
    top = [r for r in rows if r.jac_band >= 9]
    assert top and all(r.recall_ppm == 1_000_000 for r in top)


def test_dedup_levenshtein_blocked_and_thresholded(spark, sf_dir, tables):
    from bpaotu_spark.dedup.core import LEV_MAX_DIST, LEV_HEAD, LEV_SUFFIX

    docs = {
        r.doc_id: r for r in tables["documents"].collect()
    }
    rows = QUERIES["dedup_levenshtein"](spark, sf_dir).collect()
    if not rows:
        # testdata is regenerated per round; if the duplicate style no
        # longer shares heads, an empty result must reflect the CORPUS,
        # not an operator bug — prove no same-lang shared-head pair
        # exists before accepting emptiness
        import duckdb

        from bpaotu_spark.catalog import table_path
        from bpaotu_spark.dedup.core import LEV_HEAD

        n = duckdb.sql(
            f"""
            SELECT count(*) FROM '{table_path(sf_dir, "documents")}' a
            JOIN '{table_path(sf_dir, "documents")}' b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
             AND substr(a.text, 1, {LEV_HEAD}) = substr(b.text, 1, {LEV_HEAD})
            """
        ).fetchone()[0]
        assert n == 0, f"{n} shared-head pairs exist but operator found none"
        return
    for r in rows:
        a, b = docs[r.doc_a], docs[r.doc_b]
        assert a.lang == b.lang
        assert a.text[:LEV_HEAD] == b.text[:LEV_HEAD]  # head block
        assert 0 <= r.tail_edit_dist <= LEV_MAX_DIST

        # distance is on the tails, verified by a pure-python DP
        def lev(x, y):
            prev = list(range(len(y) + 1))
            for i, cx in enumerate(x, 1):
                cur = [i]
                for j, cy in enumerate(y, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                                   prev[j - 1] + (cx != cy)))
                prev = cur
            return prev[-1]

        assert r.tail_edit_dist == lev(
            a.text[-LEV_SUFFIX:], b.text[-LEV_SUFFIX:]
        )


def test_minhash_estimate_vs_exact_jaccard(spark, sf_dir):
    """The estimator is anchored to truth: candidate pairs carry both
    n_shared_bands >= 1 and an estimate in [0, 1e6]; for pairs that also
    appear in the exact-Jaccard output, the estimate correlates (within
    the K=16 binomial noise floor: |est - exact| < 0.35)."""
    est = {
        (r.doc_a, r.doc_b): r
        for r in QUERIES["minhash_jaccard_estimate"](spark, sf_dir).collect()
    }
    assert est
    for r in est.values():
        assert r.n_shared_bands >= 1
        assert 0 <= r.est_jaccard_ppm <= 1_000_000
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    overlap = set(est) & set(exact)
    assert overlap
    for k in overlap:
        assert abs(est[k].est_jaccard_ppm / 1e6 - exact[k]) < 0.35


def test_family_histogram_mass(spark, sf_dir, tables):
    """Histogram masses reconcile exactly with the verdict table."""
    rows = QUERIES["dedup_family_histogram"](spark, sf_dir).collect()
    n_docs = tables["documents"].count()
    assert sum(r.n_docs for r in rows) == n_docs
    verdict = QUERIES["corpus_near_dedup_keep_first"](spark, sf_dir).collect()
    n_dropped = sum(1 for v in verdict if not v.is_kept)
    assert sum(r.n_dropped for r in rows) == n_dropped
    for r in rows:
        assert r.n_docs == r.family_size * r.n_families
        assert r.n_dropped == (r.family_size - 1) * r.n_families


def test_cross_source_matrix_reconciles(spark, sf_dir, tables):
    """Matrix mass equals the pair count; cells reproduce from a
    driver-side tally of the same pairs."""
    pairs = QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    src = {r.doc_id: r.source for r in tables["documents"].collect()}
    from collections import Counter

    want = Counter(
        tuple(sorted((src[p.doc_a], src[p.doc_b])))
        for p in pairs
    )
    rows = QUERIES["dedup_cross_source_matrix"](spark, sf_dir).collect()
    got = {(r.source_a, r.source_b): r.n_dup_pairs for r in rows}
    assert got == dict(want)
    total = sum(want.values())
    for r in rows:
        assert r.share_ppm == r.n_dup_pairs * 1_000_000 // total


def test_containment_catches_what_jaccard_misses(spark, sf_dir):
    """Containment >= threshold pairs satisfy the metric identities;
    the contained side is the smaller shingle set; and jaccard <=
    containment always (union >= min set size)."""
    rows = QUERIES["dedup_containment"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.contained_id in (r.doc_a, r.doc_b)
        assert 0 < r.containment <= 1.0 + 1e-9
        assert r.jaccard <= r.containment + 1e-9


def test_tfidf_cosine_pairs_bounds(spark, sf_dir):
    """cos² in ppm is a valid squared cosine (0..1e6] and every
    reported pair clears the threshold; dot > 0."""
    rows = QUERIES["text_tfidf_cosine_pairs"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 250_000 <= r.cos2_ppm <= 1_000_000
        assert r.dot > 0
        assert r.doc_a < r.doc_b


def test_family_agreement_consistency(spark, sf_dir):
    """Union = mh + sh - both; both <= min(mh, sh); jaccard consistent."""
    from bpaotu_spark.registry import QUERIES

    [r] = QUERIES["dedup_family_agreement"](spark, sf_dir).collect()
    assert r.n_union == r.n_minhash + r.n_simhash - r.n_both
    assert r.n_both <= min(r.n_minhash, r.n_simhash)
    if r.n_union:
        assert r.agreement_jaccard_ppm == r.n_both * 1_000_000 // r.n_union
