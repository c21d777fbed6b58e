"""Round-10 additions: connected kNN graph + search over it."""

from __future__ import annotations

import pyspark.sql.functions as F


def _queries():
    from bpaotu_spark.registry import QUERIES, load_all

    load_all()
    return QUERIES


def test_knn_graph_connected_census(spark, sf_dir):
    """The construction's whole point: exactly ONE component at the
    end, every edge family non-negative, and the census is consistent
    (bridges = components_before − 1 when repairs were needed)."""
    rows = {
        r.edge_type: r
        for r in _queries()["knn_graph_connected"](spark, sf_dir).collect()
    }
    assert set(rows) == {"knn", "multiprobe", "bridge"}
    any_row = rows["knn"]
    assert any_row.n_components_final == 1
    before = any_row.n_components_before_bridges
    assert rows["bridge"].n_edges == before - 1
    assert rows["knn"].n_edges > 0
    # multiprobe links are the cross-hyperplane repairs — on sign-LSH
    # blocked data they must exist (else the probe join is broken)
    assert rows["multiprobe"].n_edges > 0


def test_connected_search_edges_symmetric_and_connected(spark, sf_dir):
    """The search substrate is symmetric (every directed edge has its
    reverse) and covers reachability from the entry node (max vec_id)
    to every vector — the property that un-caps graph-search recall."""
    from bpaotu_spark.ann.graphconn import connected_search_edges
    from bpaotu_spark.catalog import load_table
    from bpaotu_spark.dedup.core import star_connected_components

    edges = connected_search_edges(spark, sf_dir).localCheckpoint()
    fwd = edges.select("vec_id", "neighbor_id")
    rev = edges.select(
        F.col("neighbor_id").alias("vec_id"),
        F.col("vec_id").alias("neighbor_id"),
    )
    assert fwd.subtract(rev).count() == 0  # symmetric closure
    labels = star_connected_components(edges, "vec_id", "neighbor_id")
    n_nodes = load_table(spark, sf_dir, "embeddings").count()
    comp = labels.agg(F.countDistinct("component")).collect()[0][0]
    assert comp == 1
    assert labels.select("node").distinct().count() == n_nodes


def test_beam_beats_greedy_on_connected_graph(spark, sf_dir):
    """Beam-12 must find neighbours at least as close as greedy for
    every query (its frontier is a superset each hop), and at least
    one strictly better somewhere — the width-buys-recall story."""
    q = _queries()
    greedy = {
        r.query_id: r.found_d2
        for r in q["ann_greedy_graph_search"](spark, sf_dir).collect()
    }
    beam = {
        r.query_id: r.found_d2
        for r in q["ann_beam_graph_search"](spark, sf_dir).collect()
    }
    assert set(greedy) == set(beam)
    assert all(beam[k] <= greedy[k] for k in greedy)


def test_beam_recall_above_broken_graph_ceiling(spark, sf_dir):
    """On the 10-component LSH graph the r9 ceiling was ~1-2 exact
    hits out of 10; the connected graph + beam-12 must clear it."""
    found = _queries()["ann_beam_graph_search"](spark, sf_dir).collect()
    hits = sum(1 for r in found if r.exact_hit)
    assert hits >= 3, f"beam-12 exact hits {hits}/10 on connected graph"
