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


def test_audit_delta_partitions_prunes_scan(spark, sf_dir, tmp_path):
    """The incremental audit must only SCAN the partitions the merge
    touched: PartitionFilters on the physical plan, and row counts
    prove no other partition contributed."""
    import pyspark.sql.functions as F

    from bpaotu_spark.catalog import load_table
    from bpaotu_spark.io.merge import merge_upsert
    from bpaotu_spark.operators.quality2 import audit_delta_partitions

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderdate",
        F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
    )
    path = str(tmp_path / "orders_by_year")
    orders.write.partitionBy("o_year").parquet(path)

    # a merge lands a delta touching exactly ONE year partition
    max_year = orders.agg(F.max("o_year")).collect()[0][0]
    delta = orders.filter(F.col("o_year") == max_year).limit(50)
    delta = delta.withColumn("o_totalprice", F.col("o_totalprice") + 1)
    stats = merge_upsert(
        spark, path, delta, key_cols=("o_orderkey",),
        partition_cols=("o_year",),
    )
    assert stats["updated"] == 50 and stats["inserted"] == 0

    audited = audit_delta_partitions(
        spark,
        path,
        "o_year",
        [max_year],
        row_checks={"nonpositive_totalprice": "o_totalprice <= 0"},
        pk_expr="o_orderkey",
    )
    plan = (
        audited._jdf.queryExecution().executedPlan().toString()
    )
    # literal IN on the partition column reaches the scan as a
    # partition filter — untouched years are never listed or read
    assert "PartitionFilters: [" in plan and "o_year" in plan
    rows = {r.check_name: r for r in audited.collect()}
    n_partition = (
        spark.read.parquet(path)
        .filter(F.col("o_year") == max_year)
        .count()
    )
    n_table = spark.read.parquet(path).count()
    assert n_table > n_partition  # other partitions exist...
    assert rows["pk_unique"].n_rows == n_partition  # ...and were skipped
    assert rows["pk_unique"].n_violations == 0
    assert rows["nonpositive_totalprice"].n_violations == 0


def test_knn_graph_connected_bridge_path_engine_parity(spark, tmp_path):
    """On the real data multiprobe alone connects the graph (bridges
    = 0), so the bridge + quotient-CC path never runs. Exercise it:
    two clusters in sign-buckets 0000 and 1111 (Hamming distance 4 —
    no single-bit probe can cross), so connectivity REQUIRES a bridge;
    verify Spark vs the DuckDB oracle row-for-row."""
    import duckdb
    import pandas as pd

    rows = []
    for i in range(3):  # bucket 0000
        rows.append((i, [-1.0 - i, -2.0, -3.0, -4.0, float(i)], 0))
    for i in range(3):  # bucket 1111
        rows.append((3 + i, [1.0 + i, 2.0, 3.0, 4.0, float(i)], 1))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    sf = str(tmp_path)
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array(pdf.vec_id, pa.int64()),
            "embedding": pa.array(
                pdf.embedding, pa.list_(pa.float32())
            ),
            "label": pa.array(pdf.label, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{sf}/embeddings.parquet")

    from bpaotu_spark.registry import ORACLES, QUERIES, load_all

    load_all()
    got = {
        r.edge_type: (
            r.n_edges,
            r.n_components_before_bridges,
            r.n_components_final,
        )
        for r in QUERIES["knn_graph_connected"](spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(ORACLES["knn_graph_connected"]).fetchall()
    }
    assert got == want
    # the scenario's whole point: a bridge was REQUIRED and suffices
    assert got["multiprobe"][0] == 0
    assert got["bridge"] == (1, 2, 1)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed by the same key into the same bucket count
    must join with ZERO Exchange operators — the layout, not the
    shuffle service, satisfies the join's distribution requirement.
    This is the repeated-join cost eliminator at 100 TB."""
    from bpaotu_spark.catalog import load_table
    from bpaotu_spark.io.bucketed import bucketed_join, write_bucketed

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "t10_orders_b", "o_orderkey")
    write_bucketed(lineitem, "t10_lineitem_b", "l_orderkey")
    try:
        joined = bucketed_join(
            spark, "t10_orders_b", "t10_lineitem_b",
            "o_orderkey", "l_orderkey",
        )
        agg = joined.groupBy("o_orderkey").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # the co-partitioning even survives a groupBy on the key
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in agg_plan, agg_plan
        # and it is the SAME rows a plain (shuffling) join produces
        expect = orders.join(
            lineitem,
            orders.o_orderkey == lineitem.l_orderkey,
        ).count()
        assert joined.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS t10_orders_b")
        spark.sql("DROP TABLE IF EXISTS t10_lineitem_b")


def test_hnsw_layered_search_report_consistent(spark, sf_dir):
    """The layered search's report must be internally consistent:
    found distance never beats the true NN, exact_hit iff ids match,
    and the coarse layer must have delivered a valid entry (found_id
    is a real vector, never the query itself)."""
    rows = _queries()["ann_hnsw_layered_search"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.found_d2 >= r.true_d2
        assert r.exact_hit == (r.found_id == r.true_id)
        assert r.found_id != r.query_id
        assert r.dist_ratio_milli >= 1000


def test_gated_merge_upsert_composes_write_path(spark, sf_dir, tmp_path):
    """validate-delta -> merge -> re-audit touched partitions: a dirty
    delta is refused with the table untouched; a clean delta merges
    and its partitions re-audit clean."""
    import pyspark.sql.functions as F
    import pytest

    from bpaotu_spark.catalog import load_table
    from bpaotu_spark.io.gate import ExpectationsFailed
    from bpaotu_spark.io.merge import gated_merge_upsert

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
    )
    path = str(tmp_path / "gated_lake")
    orders.write.partitionBy("o_year").parquet(path)
    rules = {"nonpositive_price": "o_totalprice <= 0"}
    max_year = orders.agg(F.max("o_year")).collect()[0][0]

    dirty = (
        orders.filter(F.col("o_year") == max_year)
        .limit(10)
        .withColumn("o_totalprice", F.lit(-1.0))
    )
    before = spark.read.parquet(path).agg(
        F.sum("o_totalprice")
    ).collect()[0][0]
    with pytest.raises(ExpectationsFailed):
        gated_merge_upsert(
            spark, path, dirty, ("o_orderkey",), ("o_year",), rules
        )
    after = spark.read.parquet(path).agg(
        F.sum("o_totalprice")
    ).collect()[0][0]
    assert after == before  # refused merge leaves the lake untouched

    clean = (
        orders.filter(F.col("o_year") == max_year)
        .limit(10)
        .withColumn("o_totalprice", F.col("o_totalprice") + 5.0)
    )
    out = gated_merge_upsert(
        spark, path, clean, ("o_orderkey",), ("o_year",), rules
    )
    assert out["receipt"]["published"] is True
    assert out["merge"]["updated"] == 10
    audit = {a["check_name"]: a for a in out["post_audit"]}
    assert audit["nonpositive_price"]["n_violations"] == 0
    n_part = (
        spark.read.parquet(path)
        .filter(F.col("o_year") == max_year)
        .count()
    )
    assert audit["nonpositive_price"]["n_rows"] == n_part
