"""Round-15 tests: the persisted ANN ground-truth store and the
consolidate epoch promotion (generation swap)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from bpaotu_spark.registry import QUERIES, load_all

load_all()

# ---------------------------------------------------------------------------
# ANN ground-truth store (r14 VERDICT item 3): the recall-eval family
# must score against PERSISTED exact truth — built once, read many —
# and the served truth must equal a from-scratch computation (the
# registered oracles enforce the same equality driver-side).
# ---------------------------------------------------------------------------


def test_truth_store_persists_and_reserves(spark, sf_dir, tmp_path, monkeypatch):
    from bpaotu_spark.ann import index_store, truthstore

    monkeypatch.setenv("BPAOTU_ANN_INDEX_DIR", str(tmp_path / "idx"))
    index_store._MEM.clear()
    t1 = {
        tuple(r)
        for r in QUERIES["ann_bruteforce_topk"](spark, sf_dir).collect()
    }
    g1 = {
        tuple(r)
        for r in truthstore.grid_top10_cached(spark, sf_dir).collect()
    }
    s1 = {
        tuple(r)
        for r in truthstore.grid_nn_surv_cached(spark, sf_dir).collect()
    }
    for name in ("truth_topk_cos", "truth_grid_top10", "truth_grid_nn_surv"):
        assert any(
            d.startswith(f"{name}-") for d in os.listdir(tmp_path / "idx")
        ), name
    # fresh "process": truth must come from disk — the builder is
    # never re-invoked
    index_store._MEM.clear()
    from bpaotu_spark.ann import core as ann_core

    calls = {"n": 0}
    real = ann_core._bruteforce_topk_build

    def counting(spark_, sf_dir_):
        calls["n"] += 1
        return real(spark_, sf_dir_)

    monkeypatch.setattr(ann_core, "_bruteforce_topk_build", counting)
    t2 = {
        tuple(r)
        for r in QUERIES["ann_bruteforce_topk"](spark, sf_dir).collect()
    }
    g2 = {
        tuple(r)
        for r in truthstore.grid_top10_cached(spark, sf_dir).collect()
    }
    s2 = {
        tuple(r)
        for r in truthstore.grid_nn_surv_cached(spark, sf_dir).collect()
    }
    assert calls["n"] == 0
    assert (t2, g2, s2) == (t1, g1, s1)
    # the served truth EQUALS a from-scratch build (the store is an
    # optimization, never a semantic change)
    fresh = {tuple(r) for r in real(spark, sf_dir).collect()}
    assert t1 == fresh
    index_store._MEM.clear()


def test_truth_store_shapes(spark, sf_dir):
    """Truth invariants: per-query row counts, rank ranges, and the
    survivor table's tombstone exclusion."""
    from bpaotu_spark.ann.core import N_QUERIES, TOP_K
    from bpaotu_spark.ann.tombstone import _VTOMB_MOD, _VTOMB_RES
    from bpaotu_spark.ann.truthstore import (
        _TRUTH_K,
        grid_nn_surv_cached,
        grid_top10_cached,
    )

    g = grid_top10_cached(spark, sf_dir)
    per_q = {r.query_id: r.n for r in g.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert len(per_q) == N_QUERIES
    assert all(n == _TRUTH_K for n in per_q.values())
    assert g.filter(
        (F.col("trank") < 1) | (F.col("trank") > _TRUTH_K)
    ).count() == 0
    assert g.filter(F.col("cand_id") == F.col("query_id")).count() == 0
    s = grid_nn_surv_cached(spark, sf_dir).collect()
    n_surv_q = sum(
        1 for q in range(N_QUERIES) if q % _VTOMB_MOD != _VTOMB_RES
    )
    assert len(s) == n_surv_q
    assert all(r.true_id % _VTOMB_MOD != _VTOMB_RES for r in s)
    t = QUERIES["ann_bruteforce_topk"](spark, sf_dir)
    assert t.count() == N_QUERIES * TOP_K
