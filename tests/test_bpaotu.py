"""bpaotu operator family: diversity math, rollup shape, matrix shape."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from bpaotu_spark.operators.bpaotu import BRANDS, abundance, _brand_alias
from bpaotu_spark.registry import QUERIES, load_all

load_all()


def test_alpha_diversity_matches_manual_shannon(spark, sf_dir):
    rows = QUERIES["alpha_diversity"](spark, sf_dir).collect()
    assert rows
    ab = (
        abundance(spark, sf_dir)
        .groupBy("sample_id", "otu_id")
        .agg(F.sum("cnt").alias("c"))
        .collect()
    )
    from collections import defaultdict

    per_sample = defaultdict(list)
    for r in ab:
        per_sample[r.sample_id].append(r.c)
    for r in rows[:50]:
        cs = per_sample[r.sample_id]
        tot = sum(cs)
        h = -sum((c / tot) * math.log(c / tot) for c in cs)
        assert abs(r.shannon - round(h, 4)) < 1e-6
        assert r.richness == len(cs)


def test_braycurtis_bounds_and_symmetric_pairs(spark, sf_dir):
    rows = QUERIES["beta_diversity_braycurtis"](spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert 0.0 <= r.bray_curtis <= 1.0
        assert r.sample_a < r.sample_b  # canonical pair order, no dupes
        assert (r.sample_a, r.sample_b) not in seen
        seen.add((r.sample_a, r.sample_b))


def test_braycurtis_no_cartesian_in_plan(spark, sf_dir):
    df = QUERIES["beta_diversity_braycurtis"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan


def test_abundance_matrix_shape_and_margins(spark, sf_dir, tables):
    df = QUERIES["abundance_matrix"](spark, sf_dir)
    assert df.columns == ["sample_id"] + [_brand_alias(b) for b in BRANDS]
    assert df.count() == tables["customer"].count()
    # matrix grand total == fact grand total
    total = df.select(
        sum(F.sum(c) for c in df.columns[1:]).alias("t")
    ).collect()[0].t
    fact_total = abundance(spark, sf_dir).agg(F.sum("cnt")).collect()[0][0]
    assert abs(total - fact_total) < 1e-6


def test_krona_rollup_depth_consistency(spark, sf_dir):
    rows = QUERIES["krona_rollup"](spark, sf_dir).collect()
    by_depth = {}
    for r in rows:
        by_depth.setdefault(r.depth, 0)
        by_depth[r.depth] += r.total_abundance
    # every rollup level sums to the same grand total
    assert len(by_depth) == 4
    vals = list(by_depth.values())
    assert all(abs(v - vals[0]) < 1e-4 for v in vals)


def test_sample_summary_respects_filter(spark, sf_dir):
    rows = QUERIES["sample_summary"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.c_acctbal > 1000.0
        assert r.richness <= r.total_abundance  # counts are >= 1 each


def test_drilldown_options_cover_filtered_taxa(spark, sf_dir, tables):
    rows = QUERIES["taxonomy_drilldown"](spark, sf_dir).collect()
    n_taxa = sum(r.n_taxa for r in rows)
    promo_with_abundance = (
        abundance(spark, sf_dir)
        .join(
            tables["part"].filter(F.col("p_type") == "PROMO"),
            F.col("otu_id") == F.col("p_partkey"),
        )
        .select("p_partkey")
        .distinct()
        .count()
    )
    assert n_taxa == promo_with_abundance


def test_rarefaction_depth_bound(spark, sf_dir):
    """Rarefied counts are proportional floors: per-sample rarefied
    totals never exceed the target depth, and a sample's dominant OTU
    keeps the largest rarefied count."""
    from bpaotu_spark.operators.bpaotu import _RAREFY_DEPTH

    rows = QUERIES["abundance_rarefaction"](spark, sf_dir).collect()
    assert rows
    per_sample = {}
    for r in rows:
        assert 0 <= r.rare_cnt <= _RAREFY_DEPTH
        per_sample.setdefault(r.sample_id, []).append(r)
    for rs in per_sample.values():
        assert sum(r.rare_cnt for r in rs) <= _RAREFY_DEPTH
        top_raw = max(rs, key=lambda r: (r.raw_cnt, r.otu_id))
        assert top_raw.rare_cnt == max(r.rare_cnt for r in rs)


def test_taxa_cooccurrence_invariants(spark, sf_dir):
    """Edges are canonical, marginals bound the intersection, and
    jaccard/lift reproduce from the counts."""
    rows = QUERIES["taxa_cooccurrence"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b
        assert 1 <= r.n_both <= min(r.n_a, r.n_b)
        assert r.jaccard_ppm == r.n_both * 1_000_000 // (r.n_a + r.n_b - r.n_both)
        assert 0 < r.jaccard_ppm <= 1_000_000


def test_rarefaction_curve_monotone(spark, sf_dir):
    """Richness grows monotonically with depth and is bounded by the
    sample's full richness; every sample appears at every depth."""
    from bpaotu_spark.operators.bpaotu import RAREFY_DEPTHS

    rows = QUERIES["rarefaction_curve"](spark, sf_dir).collect()
    assert rows
    by_sample = {}
    for r in rows:
        by_sample.setdefault(r.sample_id, {})[r.depth] = r
    for sid, per_depth in by_sample.items():
        assert set(per_depth) == set(RAREFY_DEPTHS)
        rich = [per_depth[d].richness_at_depth for d in sorted(per_depth)]
        assert rich == sorted(rich)  # monotone in depth
        assert all(
            0 <= x <= per_depth[min(per_depth)].full_richness for x in rich
        )


def test_jaccard_vs_braycurtis_pair_structure(spark, sf_dir):
    """Jaccard dissimilarity is a proper [0,1] metric on the filtered
    selection: union >= intersect, and the rounded value re-derives
    from the reported integers."""
    rows = QUERIES["beta_diversity_jaccard"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_intersect <= r.n_union
        assert abs(r.jaccard_dissim - round(1 - r.n_intersect / r.n_union, 4)) < 1e-9
        assert r.sample_a < r.sample_b


def test_sample_neighbors_topk_invariants(spark, sf_dir):
    """Per-sample neighbour lists: <= K entries, ranked by ascending
    dissimilarity with neighbor tie-break, no self-loops."""
    from collections import defaultdict

    rows = QUERIES["sample_neighbors_topk"](spark, sf_dir).collect()
    assert rows
    by_sample = defaultdict(list)
    for r in rows:
        assert r.neighbor != r.sample_id
        by_sample[r.sample_id].append(r)
    for rs in by_sample.values():
        rs.sort(key=lambda r: r.rnk)
        assert len(rs) <= 3
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        keys = [(r.bray_curtis, r.neighbor) for r in rs]
        assert keys == sorted(keys)


def test_indicator_species_ppm_bounds(spark, sf_dir):
    """A (specificity) and B (fidelity) are valid ppm shares, IndVal is
    their scaled product, and each environment reports exactly top-5 in
    descending order."""
    from collections import defaultdict

    rows = QUERIES["otu_indicator_species"](spark, sf_dir).collect()
    assert rows
    per_grp = defaultdict(list)
    for r in rows:
        assert 0 <= r.a_ppm <= 1_000_000
        assert 0 < r.b_ppm <= 1_000_000
        assert r.indval_ppm == (r.a_ppm * r.b_ppm) // 1_000_000
        per_grp[r.grp].append(r)
    assert len(per_grp) == 5
    for rs in per_grp.values():
        rs.sort(key=lambda r: r.rnk)
        vals = [r.indval_ppm for r in rs]
        assert vals == sorted(vals, reverse=True)
        assert len(rs) == 5


def test_core_microbiome_present_everywhere(spark, sf_dir):
    """Every reported core OTU really occurs in all 5 environments, and
    the ranking is by descending min prevalence."""
    rows = QUERIES["core_microbiome"](spark, sf_dir).collect()
    assert rows and len(rows) <= 20
    for r in rows:
        assert r.n_envs_present == 5
        assert 0 < r.min_prev_ppm <= r.mean_prev_ppm <= r.max_prev_ppm
    mins = [r.min_prev_ppm for r in sorted(rows, key=lambda r: r.rnk)]
    assert mins == sorted(mins, reverse=True)


def test_niche_breadth_bounds(spark, sf_dir):
    """Entropy is 0 for single-environment OTUs, evenness stays within
    [0, 1e6] (+ floor slack), and n_envs <= 5."""
    rows = QUERIES["otu_niche_breadth"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_envs <= 5
        if r.n_envs == 1:
            assert r.nH_micronats == 0 and r.evenness_ppm == 0
        assert 0 <= r.evenness_ppm <= 1_000_001
        assert r.nH_micronats >= 0
