"""Round-15 optimization-pass tests (second batch): the winnow pair
former's in-row pair explode must equal the self-join form it replaced,
and the new sign-LSH embedding pair / semantic CC label artifacts must
round-trip through the store and equal a from-scratch computation."""

from __future__ import annotations

import pyspark.sql.functions as F

from bpaotu_spark.registry import QUERIES, load_all

load_all()


def test_winnow_inrow_pairs_equal_selfjoin(spark, sf_dir):
    """The capped in-row pair explode (r15) produces exactly the pair
    set of the fingerprint self-join it replaced — same (doc_a, doc_b,
    n_shared) rows, one orientation per unordered pair regardless of
    collect_list order."""
    from bpaotu_spark.dedup.core import WINNOW_DF_CAP, WINNOW_MIN_SHARED
    from bpaotu_spark.functions.textops import text_winnow_fingerprints

    new = {tuple(r) for r in QUERIES["dedup_winnow_pairs"](spark, sf_dir).collect()}

    fps = text_winnow_fingerprints(spark, sf_dir)
    dfreq = fps.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("df"))
    keep = fps.join(dfreq, "fingerprint").filter(F.col("df") <= WINNOW_DF_CAP)
    a = keep.select(F.col("fingerprint"), F.col("doc_id").alias("doc_a"))
    b = keep.select(
        F.col("fingerprint").alias("fp_b"), F.col("doc_id").alias("doc_b")
    )
    old = {
        tuple(r)
        for r in (
            a.join(b, (a.fingerprint == b.fp_b) & (a.doc_a < b.doc_b))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
        ).collect()
    }
    assert new == old
    assert len(new) > 0  # the fixture corpus must actually form pairs


def test_semantic_store_roundtrip(spark, sf_dir, tmp_path, monkeypatch):
    """emb_lsh_pairs persists and re-serves identically, and the
    store-served semantic keep-first verdict equals a from-scratch
    pair-former + star-CC run."""
    from bpaotu_spark.ann import index_store
    from bpaotu_spark.catalog import load_table
    from bpaotu_spark.dedup import sigstore
    from bpaotu_spark.dedup.core import (
        emb_lsh_pairs_build,
        star_connected_components,
    )

    monkeypatch.setenv("BPAOTU_ANN_INDEX_DIR", str(tmp_path / "idx"))
    index_store._MEM.clear()
    try:
        served_pairs = {
            tuple(r)
            for r in sigstore.emb_pairs_cached(spark, sf_dir).collect()
        }
        fresh_pairs = {
            tuple(r) for r in emb_lsh_pairs_build(spark, sf_dir).collect()
        }
        assert served_pairs == fresh_pairs

        # second read must come from the persisted artifact (memory tier
        # cleared) and still match
        index_store._MEM.clear()
        again = {
            tuple(r)
            for r in sigstore.emb_pairs_cached(spark, sf_dir).collect()
        }
        assert again == fresh_pairs

        served = {
            tuple(r)
            for r in QUERIES["corpus_semantic_dedup_keep_first"](
                spark, sf_dir
            ).collect()
        }
        pairs = emb_lsh_pairs_build(spark, sf_dir).select("vec_a", "vec_b")
        labels = star_connected_components(pairs, "vec_a", "vec_b")
        vecs = load_table(spark, sf_dir, "embeddings").select("vec_id")
        scratch = {
            tuple(r)
            for r in (
                vecs.join(labels, vecs.vec_id == labels.node, "left")
                .select(
                    "vec_id",
                    F.coalesce("component", "vec_id").alias("cluster_id"),
                )
                .withColumn(
                    "is_kept", F.col("cluster_id") == F.col("vec_id")
                )
            ).collect()
        }
        assert served == scratch
        n_dropped = sum(1 for r in served if not r[2])
        assert n_dropped >= 1  # the fixture corpus has semantic dups
    finally:
        index_store._MEM.clear()


def test_km_assign_store_roundtrip(spark, sf_dir, tmp_path, monkeypatch):
    """The persisted k-means final assignment (late-r15: the PQ-codes
    lifecycle applied to the Lloyd chain) equals a from-scratch run,
    and the disk tier re-serves it without re-running the chain."""
    from pyspark.sql import Window

    from bpaotu_spark.ann import core, index_store
    from bpaotu_spark.catalog import load_table

    monkeypatch.setenv("BPAOTU_ANN_INDEX_DIR", str(tmp_path / "idx"))
    index_store._MEM.clear()
    try:
        served = {
            tuple(r)
            for r in core._km_final_cached(spark, sf_dir).collect()
        }
        # from-scratch chain (the pre-r15 per-query shape)
        emb = load_table(spark, sf_dir, "embeddings")
        e = emb.select(
            "vec_id",
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: F.floor(x * core._NP_Q),
            ).alias("q"),
        )
        w8 = Window.orderBy("vec_id")
        c = (
            e.orderBy("vec_id")
            .limit(core._KM_K)
            .select(
                (F.row_number().over(w8) - 1).cast("bigint").alias("cid"),
                F.col("q").alias("c"),
            )
        )
        for _ in range(core._KM_ITERS):
            c = core._km_update(core._km_assign(e, c))
        scratch = {
            tuple(r)
            for r in core._km_assign(e, c)
            .select("vec_id", "cid", "d2")
            .collect()
        }
        assert served == scratch

        # disk-tier re-serve (memory tier cleared): identical rows,
        # and the Lloyd chain must NOT run again
        index_store._MEM.clear()
        calls = {"n": 0}
        real = core._km_assign

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(core, "_km_assign", counting)
        again = {
            tuple(r)
            for r in core._km_final_cached(spark, sf_dir).collect()
        }
        assert again == scratch
        assert calls["n"] == 0
    finally:
        index_store._MEM.clear()


def test_uw_pairs_bitmask_equals_edge_keyed_join(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The r15 bitmask-interior pair former (popcount of ANDed 62-bit
    vocabulary words + leaf-keyed join) produces exactly the rows of
    the all-edge-keyed self-join it replaced, on a cold store."""
    from bpaotu_spark.ann import index_store
    from bpaotu_spark.operators.diststore import unifrac_pres_cached
    from bpaotu_spark.operators.ecology2 import _uf_uw_pairs_build

    monkeypatch.setenv("BPAOTU_ANN_INDEX_DIR", str(tmp_path / "idx"))
    index_store._MEM.clear()
    try:
        new = {tuple(r) for r in _uf_uw_pairs_build(spark, sf_dir).collect()}

        # reference: the replaced shape — one self-join over ALL edges
        pres = unifrac_pres_cached(spark, sf_dir)
        sz = pres.groupBy("sample_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("ne")
        )
        x = pres.select(F.col("sample_id").alias("sa"), "edge")
        y = pres.select(F.col("sample_id").alias("sb"), "edge")
        shared = (
            x.join(y, "edge")
            .filter(F.col("sa") < F.col("sb"))
            .groupBy("sa", "sb")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        )
        a = sz.select(
            F.col("sample_id").alias("sample_a"),
            F.col("ne").alias("n_edges_a"),
        )
        b = sz.select(
            F.col("sample_id").alias("sample_b"),
            F.col("ne").alias("n_edges_b"),
        )
        old = {
            tuple(r)
            for r in a.join(
                F.broadcast(b), F.col("sample_a") < F.col("sample_b")
            )
            .join(
                shared,
                (F.col("sa") == F.col("sample_a"))
                & (F.col("sb") == F.col("sample_b")),
                "left",
            )
            .select(
                "sample_a",
                "sample_b",
                "n_edges_a",
                "n_edges_b",
                F.coalesce("n_shared", F.lit(0))
                .cast("bigint")
                .alias("n_shared_edges"),
                F.expr(
                    "((n_edges_a + n_edges_b - 2 * coalesce(n_shared, 0))"
                    " * 1000000)"
                    " div (n_edges_a + n_edges_b - coalesce(n_shared, 0))"
                ).alias("unifrac_ppm"),
            )
            .collect()
        }
        assert new == old and len(new) > 0
    finally:
        index_store._MEM.clear()


def test_conn_parts_store_round_trip(spark, sf_dir, tmp_path, monkeypatch):
    """knn_graph_connected is store-served (r15): a cold build, the
    in-process re-serve, and the disk-tier re-serve (memory cleared)
    must all return identical census rows, and the disk re-serve must
    not re-run the graph construction."""
    from bpaotu_spark.ann import graphconn, index_store

    monkeypatch.setenv("BPAOTU_ANN_INDEX_DIR", str(tmp_path / "idx"))
    index_store._MEM.clear()
    try:
        cold = {
            tuple(r)
            for r in QUERIES["knn_graph_connected"](spark, sf_dir).collect()
        }
        assert len(cold) == 3

        index_store._MEM.clear()
        calls = {"n": 0}
        real = graphconn._connected_parts

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(graphconn, "_connected_parts", counting)
        warm = {
            tuple(r)
            for r in QUERIES["knn_graph_connected"](spark, sf_dir).collect()
        }
        assert warm == cold
        assert calls["n"] == 0
    finally:
        index_store._MEM.clear()


def test_seq_dot_arrow_bit_identical_to_fold(spark, sf_dir):
    """The Arrow scorer's per-dimension sequential accumulation must
    reproduce the interpreted fold's doubles BIT-FOR-BIT on the real
    pair stream (same summation order — np.dot/np.sum would not)."""
    import struct

    from bpaotu_spark.catalog import load_table
    from bpaotu_spark.dedup.core import dot, seq_dot_arrow

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("ia") < F.col("ib")).limit(5000)
    rows = pairs.select(
        dot(F.col("va"), F.col("vb")).alias("fold"),
        seq_dot_arrow(F.col("va"), F.col("vb")).alias("arrow"),
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert struct.pack("<d", r.fold) == struct.pack("<d", r.arrow)


def test_knn_lsh_edges_store_round_trip(spark, sf_dir, tmp_path, monkeypatch):
    """knn_graph_lsh is store-served (r15): a cold build, the
    in-process re-serve, and the disk-tier re-serve must return
    identical edge rows, and the disk re-serve must not re-run the
    LSH self-join derivation."""
    from bpaotu_spark.ann import core as ann_core
    from bpaotu_spark.ann import index_store

    monkeypatch.setenv("BPAOTU_ANN_INDEX_DIR", str(tmp_path / "idx"))
    index_store._MEM.clear()
    try:
        cold = {
            tuple(r) for r in QUERIES["knn_graph_lsh"](spark, sf_dir).collect()
        }
        assert len(cold) > 0

        index_store._MEM.clear()
        calls = {"n": 0}
        real = ann_core._knn_graph_lsh_build

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(ann_core, "_knn_graph_lsh_build", counting)
        warm = {
            tuple(r) for r in QUERIES["knn_graph_lsh"](spark, sf_dir).collect()
        }
        assert warm == cold
        assert calls["n"] == 0

        # a census consumer composed on the store-served edges equals
        # itself (sanity that the family wiring still resolves)
        assert QUERIES["knn_reciprocity"](spark, sf_dir).count() == 1
    finally:
        index_store._MEM.clear()
