"""Embedding-space data curation: cluster-balanced sampling.

Public grounding: cluster-balanced corpus curation (SemDeDup, Abbas et
al. 2023; DoReMi-style balanced subsets) — after k-means clustering an
embedding corpus, draw a per-cluster quota instead of a uniform sample
so dominant modes can't crowd the training mix. The reference (public
muccg/bpaotu) has no embedding pipeline; this extends the mandated
LLM-data-pipeline surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.ann.core import (
    _KM_DOT,
    _KM_ITERS,
    _KM_K,
    _NP_Q,
    _km_final_cached,
)
from bpaotu_spark.registry import register

# ---------------------------------------------------------------------------
# cluster_balanced_sample_plan — per-cluster quota sampling over the
# deterministic k-means assignment (same K=8 / 2-Lloyd-round procedure
# as kmeans_embeddings, so cluster ids agree across operators):
#   budget  S  = ⌊n/2⌋ vectors overall
#   quota_c    = min(n_c, ⌊S/K⌋)   (equal shares, capped by size)
#   selection  = the quota_c members with the smallest
#                (md5(vec_id), vec_id) — a deterministic uniform draw
# Output per cluster: size, quota, share_milli, and mean centroid d2
# of ALL members vs the SELECTED members — the check that balanced
# sampling preserved within-cluster geometry rather than skimming a
# biased shell.
#
# Scale shape: the k-means rounds are broadcast joins against a K-row
# codebook (kmeans_embeddings' plan); the draw is one rank window
# PARTITIONED BY cluster (parallel across clusters; for cluster sizes
# where an exact integer quota stops mattering, the production
# variant thresholds on the hash directly — keep if md5 < quota/n_c —
# and drops the rank entirely). Σd2 is floored via HUGEINT/DECIMAL(38)
# so both engines agree exactly.
# ---------------------------------------------------------------------------


def _cbs_oracle() -> str:
    dot = _KM_DOT
    parts = [
        f"""
WITH e AS (
  SELECT vec_id,
    list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(floor(x * {_NP_Q}) AS BIGINT)) AS q
  FROM embeddings
),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS cid,
    q AS c
  FROM (SELECT vec_id, q FROM e ORDER BY vec_id LIMIT {_KM_K})
)"""
    ]
    for i in range(1, _KM_ITERS + 2):
        parts.append(f""",
a{i} AS (
  SELECT vec_id, q, cid, d2 FROM (
    SELECT e.vec_id, e.q, c.cid,
      CAST({dot.format(a='e.q', b='e.q')}
         - 2 * {dot.format(a='e.q', b='c.c')}
         + {dot.format(a='c.c', b='c.c')} AS BIGINT) AS d2
    FROM e CROSS JOIN c{i - 1} c) t
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
)""")
        if i <= _KM_ITERS:
            parts.append(f""",
x{i} AS (
  SELECT cid, generate_subscripts(q, 1) AS dim, unnest(q) AS qv FROM a{i}
),
m{i} AS (
  SELECT cid, dim, CAST(sum(qv) AS BIGINT) AS s,
    CAST(count(*) AS BIGINT) AS n
  FROM x{i} GROUP BY 1, 2
),
c{i} AS (
  SELECT cid, list((s - ((s % n + n) % n)) // n ORDER BY dim) AS c
  FROM m{i} GROUP BY cid
)""")
    fin = _KM_ITERS + 1
    parts.append(f""",
sel AS (
  SELECT cid, d2,
    row_number() OVER (PARTITION BY cid
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
  FROM a{fin}
),
szs AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS n_members FROM a{fin} GROUP BY cid
),
tot AS (SELECT CAST(sum(n_members) // 2 AS BIGINT) AS s_budget FROM szs),
qta AS (
  SELECT szs.cid, szs.n_members,
    CAST(least(szs.n_members, tot.s_budget // {_KM_K}) AS BIGINT) AS quota
  FROM szs CROSS JOIN tot
),
alld AS (
  SELECT cid,
    CAST(CAST(sum(d2) AS HUGEINT) // count(*) AS BIGINT) AS mean_d2_all
  FROM a{fin} GROUP BY cid
),
seld AS (
  SELECT s.cid,
    CAST(CAST(sum(s.d2) AS HUGEINT) // count(*) AS BIGINT) AS mean_d2_sel
  FROM sel s JOIN qta ON qta.cid = s.cid
  WHERE s.rn <= qta.quota GROUP BY s.cid
)
SELECT qta.cid AS cluster_id, qta.n_members, qta.quota,
  CAST(qta.quota * 1000 // qta.n_members AS BIGINT) AS share_milli,
  alld.mean_d2_all AS mean_d2_all_floor,
  CAST(coalesce(seld.mean_d2_sel, 0) AS BIGINT) AS mean_d2_sel_floor
FROM qta JOIN alld ON alld.cid = qta.cid
LEFT JOIN seld ON seld.cid = qta.cid
""")
    return "".join(parts)


@register("cluster_balanced_sample_plan", oracle=_cbs_oracle())
def cluster_balanced_sample_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-cluster quota draw over the deterministic k-means
    assignment: (cluster_id, n_members, quota, share_milli,
    mean_d2_all_floor, mean_d2_sel_floor) — the balanced-curation plan
    plus the geometry check that the md5-uniform draw preserved
    within-cluster dispersion."""
    # The final assignment fans into four consumers (sel, szs, alld,
    # and qta's reuse) — and is the SAME frame kmeans_embeddings
    # aggregates. Since r15 it is a store-served ANN-index artifact
    # (build-once/read-many, the PQ-codes lifecycle): the Lloyd rounds
    # run in build_ann_index, every query here is a read. The oracle
    # keeps recomputing the chain, so the driver verifies the store.
    final = _km_final_cached(spark, sf_dir)

    w_sel = Window.partitionBy("cid").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    sel = final.select(
        "cid", "d2", F.row_number().over(w_sel).alias("rn")
    )
    szs = final.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    tot = szs.agg(
        F.expr("CAST(sum(n_members) DIV 2 AS BIGINT)").alias("s_budget")
    )
    qta = szs.crossJoin(F.broadcast(tot)).select(
        "cid",
        "n_members",
        F.expr(
            f"CAST(least(n_members, s_budget DIV {_KM_K}) AS BIGINT)"
        ).alias("quota"),
    )
    alld = final.groupBy("cid").agg(
        F.expr(
            "CAST(sum(CAST(d2 AS DECIMAL(38,0))) DIV count(1) AS BIGINT)"
        ).alias("mean_d2_all")
    )
    seld = (
        sel.join(F.broadcast(qta.select("cid", "quota")), "cid")
        .filter(F.col("rn") <= F.col("quota"))
        .groupBy("cid")
        .agg(
            F.expr(
                "CAST(sum(CAST(d2 AS DECIMAL(38,0))) DIV count(1) AS BIGINT)"
            ).alias("mean_d2_sel")
        )
    )
    return (
        qta.join(alld, "cid")
        .join(seld, "cid", "left")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_members",
            "quota",
            F.expr("CAST(quota * 1000 DIV n_members AS BIGINT)").alias(
                "share_milli"
            ),
            F.col("mean_d2_all").alias("mean_d2_all_floor"),
            F.coalesce(F.col("mean_d2_sel"), F.lit(0))
            .cast("bigint")
            .alias("mean_d2_sel_floor"),
        )
    )
