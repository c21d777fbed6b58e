"""Tombstone deletes through the persisted ANN graph (r12 VERDICT
item 3).

Takedown removal from a navigable-small-world graph is the classical
delete problem: dropping a node's edges leaves its former in-
neighbors with reduced out-degree exactly where the graph was
navigable THROUGH the deleted node. The standard repair (HNSW
deletions, Vamana/FreshDiskANN consolidate) re-links each orphaned
neighbor to the deleted node's own out-neighborhood — a LOCAL patch:
no global rebuild, work bounded by |deleted| × degree².

``ann_graph_tombstone_repair`` runs that patch against the PERSISTED
connected-graph edges (the store artifact every graph search walks):

1. tombstones: vec_id ≡ 7 (mod 50) — a deterministic ~2% takedown
   set both engines can name (the incremental ops' convention).
2. orphans: surviving sources u of edges u → d into a tombstone.
3. donors: surviving targets w of the tombstone's own edges d → w.
4. candidates (u, w) via the shared d, minus self-links and minus
   pairs already adjacent in the surviving graph.
5. per-u ranking by (round(cos, 4) DESC, w ASC) — the insert path's
   total order — keeping the top ``_REPAIR_K``.

Output: one row per repair edge with the orphan's lost degree. The
oracle recomputes the WHOLE construction from scratch (the connected
graph's full recursive SQL + the same patch algebra), so the
store-served surgery is hash-verified against ground truth each
round.

Scale shape: the orphan/donor frames are |tombstone| × degree keyed
joins into the persisted edge list; candidate scoring touches
|tombstone| × degree² pairs; nothing rescans the corpus and the base
graph is never rebuilt. ``tombstoned_edges_cached`` publishes the
patched edge list back through the store under the base fingerprint
(the augment path's convention) so searches can walk the repaired
graph read-only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.ann.graphconn import CONNECTED_EDGES_SQL
from bpaotu_spark.catalog import load_table
from bpaotu_spark.dedup.core import dot, norm
from bpaotu_spark.registry import register

_VTOMB_MOD = 50
_VTOMB_RES = 7
_REPAIR_K = 3


def repair_edges(
    spark: SparkSession, sf_dir: str, edges: DataFrame
) -> DataFrame:
    """(src, lost_deg, rank, neighbor_id) — the local re-link patch
    for deleting the mod-50 tombstone set from the directed edge list
    ``edges`` (vec_id, neighbor_id)."""
    is_tomb = lambda c: (F.col(c) % _VTOMB_MOD) == _VTOMB_RES  # noqa: E731
    orph = edges.filter(
        is_tomb("neighbor_id") & ~is_tomb("vec_id")
    ).select(
        F.col("vec_id").alias("u"), F.col("neighbor_id").alias("d")
    )
    donors = edges.filter(
        is_tomb("vec_id") & ~is_tomb("neighbor_id")
    ).select(
        F.col("vec_id").alias("d"), F.col("neighbor_id").alias("w")
    )
    lost = orph.groupBy("u").agg(
        F.countDistinct("d").cast("bigint").alias("lost_deg")
    )
    cand = (
        orph.join(donors, "d")
        .filter(F.col("w") != F.col("u"))
        .select("u", "w")
        .distinct()
        # minus pairs already adjacent in the surviving graph
        .join(
            edges.select(
                F.col("vec_id").alias("u"), F.col("neighbor_id").alias("w")
            ),
            ["u", "w"],
            "left_anti",
        )
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ea = emb.select(
        F.col("vec_id").alias("u"),
        F.col("v").alias("va"),
        norm(F.col("v")).alias("na"),
    )
    eb = emb.select(
        F.col("vec_id").alias("w"),
        F.col("v").alias("vb"),
        norm(F.col("v")).alias("nb"),
    )
    scored = (
        cand.join(ea, "u")
        .join(eb, "w")
        .select(
            "u",
            "w",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                4,
            ).alias("cos_sim"),
        )
    )
    wk = Window.partitionBy("u").orderBy(
        F.col("cos_sim").desc(), F.col("w").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= _REPAIR_K)
        .join(F.broadcast(lost), "u")
        .select(
            F.col("u").alias("src"),
            "lost_deg",
            F.col("rank").cast("bigint").alias("rank"),
            F.col("w").alias("neighbor_id"),
        )
        .orderBy("src", "rank")
    )


def tombstoned_edges_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PATCHED directed edge list — base edges minus everything
    incident to the tombstone set, plus the repair edges (both
    directions) — published through the store under the base
    fingerprint as ``conn_edges_tomb``: build the patch once, search
    it many times (the augment path's lifecycle, for deletes)."""
    from bpaotu_spark.ann.index_store import (
        cached_frame,
        connected_edges_cached,
    )

    def build() -> DataFrame:
        edges = connected_edges_cached(spark, sf_dir)
        is_tomb = lambda c: (F.col(c) % _VTOMB_MOD) == _VTOMB_RES  # noqa: E731
        surviving = edges.filter(
            ~is_tomb("vec_id") & ~is_tomb("neighbor_id")
        )
        rep = repair_edges(spark, sf_dir, edges).select(
            F.col("src").alias("vec_id"),
            F.col("neighbor_id"),
        )
        return (
            surviving.unionByName(rep)
            .unionByName(
                rep.select(
                    F.col("neighbor_id").alias("vec_id"),
                    F.col("vec_id").alias("neighbor_id"),
                )
            )
            .distinct()
        )

    return cached_frame(spark, sf_dir, "conn_edges_tomb", build)


@register(
    "ann_graph_tombstone_repair",
    oracle=f"""
WITH RECURSIVE
{CONNECTED_EDGES_SQL},
orph AS (
  SELECT ce.vec_id AS u, ce.neighbor_id AS d
  FROM conn_edges ce
  WHERE ce.neighbor_id % {_VTOMB_MOD} = {_VTOMB_RES}
    AND ce.vec_id % {_VTOMB_MOD} != {_VTOMB_RES}
),
donors AS (
  SELECT ce.vec_id AS d, ce.neighbor_id AS w
  FROM conn_edges ce
  WHERE ce.vec_id % {_VTOMB_MOD} = {_VTOMB_RES}
    AND ce.neighbor_id % {_VTOMB_MOD} != {_VTOMB_RES}
),
lost AS (
  SELECT u, CAST(count(DISTINCT d) AS BIGINT) AS lost_deg
  FROM orph GROUP BY u
),
cand AS (
  SELECT u, w FROM (
    SELECT DISTINCT orph.u, donors.w
    FROM orph JOIN donors ON donors.d = orph.d
    WHERE donors.w != orph.u
  ) c
  WHERE NOT EXISTS (
    SELECT 1 FROM conn_edges e
    WHERE e.vec_id = c.u AND e.neighbor_id = c.w
  )
),
scored AS (
  SELECT u, w,
    round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                               CAST(a.embedding AS DOUBLE[])))
       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])))),
      4) AS cos_sim
  FROM cand
  JOIN embeddings a ON a.vec_id = cand.u
  JOIN embeddings b ON b.vec_id = cand.w
),
ranked AS (
  SELECT u, w,
    row_number() OVER (PARTITION BY u ORDER BY cos_sim DESC, w ASC) AS rn
  FROM scored
)
SELECT ranked.u AS src, lost.lost_deg,
  CAST(rn AS BIGINT) AS rank, ranked.w AS neighbor_id
FROM ranked JOIN lost ON lost.u = ranked.u
WHERE rn <= {_REPAIR_K}
ORDER BY src, rank
""",
)
def ann_graph_tombstone_repair(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tombstone the mod-50 takedown set out of the persisted
    connected graph and emit the LOCAL re-link patch: for each
    surviving node that lost an edge into a deleted node, its top-3
    repair edges drawn from the deleted nodes' own out-neighborhoods
    — (src, lost_deg, rank, neighbor_id). The oracle rebuilds the
    graph and the patch from scratch."""
    from bpaotu_spark.ann.index_store import connected_edges_cached

    edges = connected_edges_cached(spark, sf_dir)
    return repair_edges(spark, sf_dir, edges)
