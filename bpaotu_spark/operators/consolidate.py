"""Tombstone-debt census + consolidation decision (r13 VERDICT
item 4 — the FreshDiskANN consolidate trigger completing the delete
lifecycle r13 opened).

The delete path is local surgery (correct): dedup tombstones drop
rows from the persisted hash/band/simhash/bucket indexes with keeper
re-election, and graph tombstones patch edges locally. But repeated
nightly cycles ACCUMULATE debt — dead rows the scans still read,
repair edges diluting the navigable graph — and nothing measured it
or decided when a full consolidate/rebuild pays. Without the trigger
a year of takedowns silently degrades recall; FreshDiskANN
(Singh et al. 2021, §4 "consolidate") runs the compaction once the
deleted fraction crosses a threshold, which is exactly the decision
these two operators emit:

* ``index_tombstone_debt`` — per dedup index family (exact / minhash
  / simhash / embedding): total persisted rows, rows the standing
  tombstone set has killed, the dead share in ppm, and the
  consolidate verdict at the documented cutoff. The Spark side
  counts the PERSISTED artifacts; the oracle predicts the same
  counts from scratch — a drifted store fails the compare.
* ``ann_consolidation_decision`` — the graph family: edges incident
  to tombstoned nodes (the rows a consolidate would drop), the
  repair-edge share of the PATCHED graph searches actually walk
  (the dilution a rebuild would re-derive properly), and the
  decision at the documented cutoffs. Spark reads the persisted
  base + patched edge lists; the oracle rebuilds both from scratch
  (the full connected-graph SQL + the repair algebra).

Thresholds (documented, not tuned to the data): a dedup family
consolidates at ≥5% dead rows (the takedown sets are mod-16 ≈ 6.25%
for documents — above — and mod-50 = 2% for vectors — below, so the
census emits a MIXED verdict the pytest pins); the graph
consolidates at ≥10% tombstone-incident edges (FreshDiskANN's
deleted-fraction regime) or ≥5% repair-edge dilution.

Scale shape: every aggregate is a single pass over a persisted
artifact (filters + counts, map-side combined); nothing rescans the
corpus; the only joins are the oracle's own from-scratch rebuild.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bpaotu_spark.registry import register

# dedup families consolidate at >= 5% dead rows
DEBT_THRESHOLD_PPM = 50_000
# the graph consolidates at >= 10% tombstone-incident edges
# (FreshDiskANN's deleted-fraction regime) or >= 5% repair dilution
GRAPH_TOMB_THRESHOLD_PPM = 100_000
GRAPH_REPAIR_THRESHOLD_PPM = 50_000


def _family_row(
    df: DataFrame, family: str, dead: F.Column
) -> DataFrame:
    return df.agg(
        F.lit(family).alias("family"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count(F.when(dead, 1)).cast("bigint").alias("n_dead"),
    )


def debt_rows(
    spark: SparkSession,
    sf_dir: str,
    doc_mod: int,
    doc_res: int,
    vec_mod: int,
    vec_res: int,
    threshold_ppm: int,
) -> DataFrame:
    """The per-family debt census over the PERSISTED indexes, with the
    tombstone sets and cutoff as parameters (the registered operator
    pins the standing takedown conventions; the pytest raises the
    share and asserts the decision flips)."""
    from bpaotu_spark.dedup.sigstore import (
        full_band_index,
        full_hash_index,
        full_simhash_index,
    )
    from bpaotu_spark.dedup.tombstone import full_emb_bucket_index

    doc_dead = F.col("doc_id") % doc_mod == doc_res
    rows = (
        _family_row(full_hash_index(spark, sf_dir), "exact", doc_dead)
        .unionByName(
            _family_row(full_band_index(spark, sf_dir), "minhash", doc_dead)
        )
        .unionByName(
            _family_row(
                full_simhash_index(spark, sf_dir), "simhash", doc_dead
            )
        )
        .unionByName(
            _family_row(
                full_emb_bucket_index(spark, sf_dir),
                "embedding",
                F.col("vec_id") % vec_mod == vec_res,
            )
        )
    )
    return rows.select(
        "family",
        "n_rows",
        "n_dead",
        F.expr("n_dead * 1000000 div n_rows").alias("dead_ppm"),
        F.lit(threshold_ppm).cast("bigint").alias("threshold_ppm"),
        (F.expr("n_dead * 1000000 div n_rows") >= threshold_ppm).alias(
            "consolidate"
        ),
    )


def _debt_oracle() -> str:
    from bpaotu_spark.dedup.core import LSH_BANDS
    from bpaotu_spark.dedup.tombstone import _TOMB_MOD, _TOMB_RES
    from bpaotu_spark.ann.tombstone import _VTOMB_MOD, _VTOMB_RES
    from bpaotu_spark.functions.textops import TOKENIZE_SQL

    # row-count predictions from scratch: a doc owns one hash row
    # always, one simhash row iff it has >= 1 token, LSH_BANDS band
    # rows iff it has >= 1 shingle (>= 3 tokens); a vector owns one
    # bucket row always. Counting needs no hash values — the VALUE
    # integrity of the same artifacts is dedup_sig_store_stats's job.
    return f"""
WITH dd AS (
  SELECT doc_id, len({TOKENIZE_SQL}) AS nt FROM documents
),
fam AS (
  SELECT 'exact' AS family,
    CAST(count(*) AS BIGINT) AS n_rows,
    CAST(count(*) FILTER (WHERE doc_id % {_TOMB_MOD} = {_TOMB_RES})
      AS BIGINT) AS n_dead
  FROM documents
  UNION ALL
  SELECT 'minhash',
    CAST({LSH_BANDS} * count(*) FILTER (WHERE nt >= 3) AS BIGINT),
    CAST({LSH_BANDS} * count(*) FILTER (
      WHERE nt >= 3 AND doc_id % {_TOMB_MOD} = {_TOMB_RES}) AS BIGINT)
  FROM dd
  UNION ALL
  SELECT 'simhash',
    CAST(count(*) FILTER (WHERE nt >= 1) AS BIGINT),
    CAST(count(*) FILTER (
      WHERE nt >= 1 AND doc_id % {_TOMB_MOD} = {_TOMB_RES}) AS BIGINT)
  FROM dd
  UNION ALL
  SELECT 'embedding',
    CAST(count(*) AS BIGINT),
    CAST(count(*) FILTER (WHERE vec_id % {_VTOMB_MOD} = {_VTOMB_RES})
      AS BIGINT)
  FROM embeddings
)
SELECT family, n_rows, n_dead,
  n_dead * 1000000 // n_rows AS dead_ppm,
  CAST({DEBT_THRESHOLD_PPM} AS BIGINT) AS threshold_ppm,
  (n_dead * 1000000 // n_rows) >= {DEBT_THRESHOLD_PPM} AS consolidate
FROM fam
"""


@register("index_tombstone_debt", oracle=_debt_oracle())
def index_tombstone_debt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per dedup index family — (family, n_rows, n_dead,
    dead_ppm, threshold_ppm, consolidate): the standing takedown
    debt in each PERSISTED index and the consolidate verdict at the
    documented 5% cutoff. The census a maintenance scheduler reads
    nightly; the mod-16 document families sit above the cutoff and
    the mod-50 vector family below, so the verdict is mixed by
    construction."""
    from bpaotu_spark.ann.tombstone import _VTOMB_MOD, _VTOMB_RES
    from bpaotu_spark.dedup.tombstone import _TOMB_MOD, _TOMB_RES

    return debt_rows(
        spark,
        sf_dir,
        _TOMB_MOD,
        _TOMB_RES,
        _VTOMB_MOD,
        _VTOMB_RES,
        DEBT_THRESHOLD_PPM,
    )


# ---------------------------------------------------------------------------
# dedup_index_compact — EXECUTE the compaction the census recommends
# (census → decision → compact, the full FreshDiskANN consolidate
# cycle for the dedup families). For every family whose dead share
# crosses the cutoff, the survivor-only index is built and PUBLISHED
# through the store (fingerprint-keyed, like every artifact); the
# receipt row proves the compacted artifact holds exactly the
# survivors (residual_dead_rows = 0). Below-cutoff families are
# no-ops whose receipt carries the debt they keep paying.
#
# The 4-row debt pull driving the branch is a bounded-metadata
# driver collect (the CC-convergence-signature class): which
# artifacts to rebuild is a scheduling decision, not row data.
# ---------------------------------------------------------------------------


def family_surfaces(
    spark: SparkSession, sf_dir: str
) -> dict[str, tuple[DataFrame, F.Column, str, str]]:
    """Per dedup index family: (full persisted index, dead-row
    predicate, fingerprint table, compact-artifact name). The shared
    surface of the census (debt), the executor (compact) and the
    generation swap (operators/epoch.py)."""
    from bpaotu_spark.ann.tombstone import _VTOMB_MOD, _VTOMB_RES
    from bpaotu_spark.dedup.sigstore import (
        full_band_index,
        full_hash_index,
        full_simhash_index,
    )
    from bpaotu_spark.dedup.tombstone import (
        _TOMB_MOD,
        _TOMB_RES,
        full_emb_bucket_index,
    )

    doc_dead = F.col("doc_id") % _TOMB_MOD == _TOMB_RES
    vec_dead = F.col("vec_id") % _VTOMB_MOD == _VTOMB_RES
    return {
        "exact": (full_hash_index(spark, sf_dir), doc_dead, "documents",
                  "dedup_hash_compact"),
        "minhash": (full_band_index(spark, sf_dir), doc_dead, "documents",
                    "dedup_bands_compact"),
        "simhash": (full_simhash_index(spark, sf_dir), doc_dead,
                    "documents", "simhash_sig_compact"),
        "embedding": (full_emb_bucket_index(spark, sf_dir), vec_dead,
                      "embeddings", "emb_lsh_compact"),
    }


def compact_cached(
    spark: SparkSession, sf_dir: str, family: str
) -> DataFrame:
    """The survivor-only compacted index of ``family``, published
    through the store (built on first touch; the consolidate job's
    output artifact)."""
    from bpaotu_spark.ann.index_store import cached_frame

    src, dead, table, name = family_surfaces(spark, sf_dir)[family]
    return cached_frame(
        spark,
        sf_dir,
        name,
        lambda: src.filter(~dead),
        table=table,
    )


def _compact_oracle() -> str:
    from bpaotu_spark.dedup.core import LSH_BANDS
    from bpaotu_spark.dedup.tombstone import _TOMB_MOD, _TOMB_RES
    from bpaotu_spark.ann.tombstone import _VTOMB_MOD, _VTOMB_RES
    from bpaotu_spark.functions.textops import TOKENIZE_SQL

    t = DEBT_THRESHOLD_PPM
    return f"""
WITH dd AS (
  SELECT doc_id, len({TOKENIZE_SQL}) AS nt FROM documents
),
fam AS (
  SELECT 'exact' AS family,
    CAST(count(*) AS BIGINT) AS n_rows_before,
    CAST(count(*) FILTER (WHERE doc_id % {_TOMB_MOD} = {_TOMB_RES})
      AS BIGINT) AS n_dead
  FROM documents
  UNION ALL
  SELECT 'minhash',
    CAST({LSH_BANDS} * count(*) FILTER (WHERE nt >= 3) AS BIGINT),
    CAST({LSH_BANDS} * count(*) FILTER (
      WHERE nt >= 3 AND doc_id % {_TOMB_MOD} = {_TOMB_RES}) AS BIGINT)
  FROM dd
  UNION ALL
  SELECT 'simhash',
    CAST(count(*) FILTER (WHERE nt >= 1) AS BIGINT),
    CAST(count(*) FILTER (
      WHERE nt >= 1 AND doc_id % {_TOMB_MOD} = {_TOMB_RES}) AS BIGINT)
  FROM dd
  UNION ALL
  SELECT 'embedding',
    CAST(count(*) AS BIGINT),
    CAST(count(*) FILTER (WHERE vec_id % {_VTOMB_MOD} = {_VTOMB_RES})
      AS BIGINT)
  FROM embeddings
)
SELECT family,
  (n_dead * 1000000 // n_rows_before) >= {t} AS consolidated,
  n_rows_before,
  CASE WHEN (n_dead * 1000000 // n_rows_before) >= {t}
       THEN n_rows_before - n_dead ELSE n_rows_before END AS n_rows_after,
  CASE WHEN (n_dead * 1000000 // n_rows_before) >= {t}
       THEN n_dead ELSE CAST(0 AS BIGINT) END AS n_reclaimed,
  CASE WHEN (n_dead * 1000000 // n_rows_before) >= {t}
       THEN CAST(0 AS BIGINT) ELSE n_dead END AS residual_dead_rows
FROM fam
"""


@register("dedup_index_compact", oracle=_compact_oracle())
def dedup_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE the consolidate verdicts: for every dedup family above
    the cutoff, build and PUBLISH the survivor-only index through the
    store, and emit the compaction receipt — (family, consolidated,
    n_rows_before, n_rows_after, n_reclaimed, residual_dead_rows).
    residual_dead_rows counts tombstoned rows still present in the
    artifact the family's queries would now read: 0 after a
    compaction (the oracle asserts it — a stale or wrong compacted
    artifact fails the hash), and the standing debt for no-op
    families."""
    from bpaotu_spark.ann.tombstone import _VTOMB_MOD, _VTOMB_RES
    from bpaotu_spark.dedup.tombstone import _TOMB_MOD, _TOMB_RES

    families = family_surfaces(spark, sf_dir)
    # the 4-row debt census decides WHICH artifacts to rebuild — a
    # bounded-metadata driver pull (scheduling, not row data)
    debts = {
        r["family"]: r
        for r in debt_rows(
            spark,
            sf_dir,
            _TOMB_MOD,
            _TOMB_RES,
            _VTOMB_MOD,
            _VTOMB_RES,
            DEBT_THRESHOLD_PPM,
        ).collect()
    }
    receipts = []
    for family, (src, dead, table, compact_name) in families.items():
        d = debts[family]
        if d["consolidate"]:
            served = compact_cached(spark, sf_dir, family)
        else:
            served = src
        receipts.append(
            served.agg(
                F.lit(family).alias("family"),
                F.lit(bool(d["consolidate"])).alias("consolidated"),
                F.lit(int(d["n_rows"])).cast("bigint").alias(
                    "n_rows_before"
                ),
                F.count(F.lit(1)).cast("bigint").alias("n_rows_after"),
                F.lit(
                    int(d["n_dead"]) if d["consolidate"] else 0
                ).cast("bigint").alias("n_reclaimed"),
                F.count(F.when(dead, 1)).cast("bigint").alias(
                    "residual_dead_rows"
                ),
            )
        )
    out = receipts[0]
    for r in receipts[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# ann_graph_consolidate_audit — EXECUTE the graph consolidation and
# measure what it buys: the survivor-only graph is REBUILT from
# scratch (the same connected-graph construction over the
# post-takedown corpus — the FreshDiskANN consolidate job itself) and
# PUBLISHED through the store, then compared edge-for-edge against
# the locally PATCHED graph searches have been walking since the
# takedown. The receipt quantifies the patch-vs-rebuild trade:
# patched_recall_ppm = how much of the proper graph the local patch
# preserves; patched_excess_ppm = repair edges a rebuild would not
# keep. The number a maintenance team reads before paying the rebuild.
#
# Oracle: BOTH graphs from scratch — the survivor rebuild runs the
# full connected-graph SQL over a survivors CTE (each graph in its own
# nested WITH RECURSIVE subquery scope, so the two CTE chains cannot
# collide), the patched side re-derives the repair algebra.
#
# Scale shape: the rebuild is the one-time consolidate job (bucketed
# joins, never all-pairs — identical shape to the weekly base build),
# store-amortized; the audit itself is one full-outer join of two
# persisted edge lists.
# ---------------------------------------------------------------------------


def _rebuilt_oracle_sql() -> str:
    from bpaotu_spark.ann.graphconn import CONNECTED_EDGES_SQL
    from bpaotu_spark.ann.tombstone import _VTOMB_MOD, _VTOMB_RES

    survivor_sql = CONNECTED_EDGES_SQL.replace(
        "FROM embeddings", "FROM survivors"
    ).replace("JOIN embeddings", "JOIN survivors")
    return f"""WITH RECURSIVE
survivors AS (
  SELECT * FROM embeddings
  WHERE vec_id % {_VTOMB_MOD} != {_VTOMB_RES}
),
{survivor_sql}
SELECT vec_id, neighbor_id FROM conn_edges"""


def _consolidate_audit_oracle() -> str:
    from bpaotu_spark.ann.graphconn import CONNECTED_EDGES_SQL
    from bpaotu_spark.ann.tombstone import _patch_ctes

    return f"""
WITH rebuilt AS (
  SELECT * FROM ({_rebuilt_oracle_sql()})
),
patched_d AS (
  SELECT * FROM (
    WITH RECURSIVE
    {CONNECTED_EDGES_SQL},
    {_patch_ctes()}
    SELECT DISTINCT vec_id, neighbor_id FROM patched
  )
),
u AS (
  SELECT coalesce(r.vec_id, p.vec_id) AS vec_id,
    (r.vec_id IS NOT NULL) AS in_r, (p.vec_id IS NOT NULL) AS in_p
  FROM rebuilt r FULL OUTER JOIN patched_d p
    ON r.vec_id = p.vec_id AND r.neighbor_id = p.neighbor_id
)
SELECT
  CAST(count(*) FILTER (WHERE in_r) AS BIGINT) AS n_edges_rebuilt,
  CAST(count(*) FILTER (WHERE in_p) AS BIGINT) AS n_edges_patched,
  CAST(count(*) FILTER (WHERE in_r AND in_p) AS BIGINT) AS n_common,
  CAST(count(*) FILTER (WHERE in_p AND NOT in_r) AS BIGINT)
    AS n_patched_only,
  CAST(count(*) FILTER (WHERE in_r AND NOT in_p) AS BIGINT)
    AS n_rebuilt_only,
  CAST(count(*) FILTER (WHERE in_r AND in_p) AS BIGINT) * 1000000
    // CAST(count(*) FILTER (WHERE in_r) AS BIGINT)
    AS patched_recall_ppm,
  CAST(count(*) FILTER (WHERE in_p AND NOT in_r) AS BIGINT) * 1000000
    // CAST(count(*) FILTER (WHERE in_p) AS BIGINT)
    AS patched_excess_ppm
FROM u
"""


def rebuilt_edges_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The survivor-only connected graph, REBUILT from scratch over
    the post-takedown corpus and published through the store as
    ``conn_edges_rebuilt`` — the consolidate job's output, and the
    serving base after the epoch promotion (operators/epoch.py)."""
    from bpaotu_spark.ann.index_store import cached_frame
    from bpaotu_spark.ann.graphconn import connected_search_edges
    from bpaotu_spark.ann.tombstone import _VTOMB_MOD, _VTOMB_RES

    return cached_frame(
        spark,
        sf_dir,
        "conn_edges_rebuilt",
        lambda: connected_search_edges(
            spark,
            sf_dir,
            alive=F.col("vec_id") % _VTOMB_MOD != _VTOMB_RES,
        ),
    )


@register(
    "ann_graph_consolidate_audit", oracle=_consolidate_audit_oracle()
)
def ann_graph_consolidate_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One row — (n_edges_rebuilt, n_edges_patched, n_common,
    n_patched_only, n_rebuilt_only, patched_recall_ppm,
    patched_excess_ppm): the survivor-only graph REBUILD (published
    through the store as ``conn_edges_rebuilt`` — executing the
    consolidation) compared edge-for-edge against the PATCHED graph
    the takedown pipeline has been serving. Both sides re-derived
    from scratch by the oracle."""
    from bpaotu_spark.ann.tombstone import tombstoned_edges_cached

    rebuilt = rebuilt_edges_cached(spark, sf_dir)
    patched = tombstoned_edges_cached(spark, sf_dir)
    r = rebuilt.select("vec_id", "neighbor_id").withColumn(
        "in_r", F.lit(1)
    )
    p = patched.select("vec_id", "neighbor_id").withColumn(
        "in_p", F.lit(1)
    )
    u = r.join(p, ["vec_id", "neighbor_id"], "full_outer").select(
        F.coalesce("in_r", F.lit(0)).alias("in_r"),
        F.coalesce("in_p", F.lit(0)).alias("in_p"),
    )
    return u.agg(
        F.sum("in_r").cast("bigint").alias("n_edges_rebuilt"),
        F.sum("in_p").cast("bigint").alias("n_edges_patched"),
        F.sum(F.col("in_r") * F.col("in_p"))
        .cast("bigint")
        .alias("n_common"),
        F.sum(F.col("in_p") * (1 - F.col("in_r")))
        .cast("bigint")
        .alias("n_patched_only"),
        F.sum(F.col("in_r") * (1 - F.col("in_p")))
        .cast("bigint")
        .alias("n_rebuilt_only"),
        F.expr(
            "CAST(sum(in_r * in_p) * 1000000 DIV sum(in_r) AS BIGINT)"
        ).alias("patched_recall_ppm"),
        F.expr(
            "CAST(sum(in_p * (1 - in_r)) * 1000000 DIV sum(in_p)"
            " AS BIGINT)"
        ).alias("patched_excess_ppm"),
    )


def _graph_debt_oracle() -> str:
    from bpaotu_spark.ann.graphconn import CONNECTED_EDGES_SQL
    from bpaotu_spark.ann.tombstone import (
        _patch_ctes,
        _VTOMB_MOD,
        _VTOMB_RES,
    )

    return f"""
WITH RECURSIVE
{CONNECTED_EDGES_SQL},
{_patch_ctes()},
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_edges_base,
    CAST(count(*) FILTER (
      WHERE vec_id % {_VTOMB_MOD} = {_VTOMB_RES}
         OR neighbor_id % {_VTOMB_MOD} = {_VTOMB_RES}) AS BIGINT)
      AS n_tomb_incident
  FROM conn_edges
),
pat AS (
  -- r10 gotcha: under WITH RECURSIVE a non-self-referential member's
  -- top-level UNION gets UNION-ALL semantics, so patched carries
  -- duplicate (u,w)/(w,u) repair rows — count the DISTINCT edge set,
  -- which is what the Spark artifact stores
  SELECT CAST(count(*) AS BIGINT) AS n_edges_patched
  FROM (SELECT DISTINCT vec_id, neighbor_id FROM patched)
)
SELECT n_edges_base, n_tomb_incident,
  n_tomb_incident * 1000000 // n_edges_base AS tomb_share_ppm,
  n_edges_patched,
  n_edges_patched - (n_edges_base - n_tomb_incident) AS n_repair_edges,
  (n_edges_patched - (n_edges_base - n_tomb_incident)) * 1000000
    // n_edges_patched AS repair_share_ppm,
  ((n_tomb_incident * 1000000 // n_edges_base)
     >= {GRAPH_TOMB_THRESHOLD_PPM}
   OR (n_edges_patched - (n_edges_base - n_tomb_incident)) * 1000000
     // n_edges_patched >= {GRAPH_REPAIR_THRESHOLD_PPM}) AS consolidate
FROM base, pat
"""


@register("ann_consolidation_decision", oracle=_graph_debt_oracle())
def ann_consolidation_decision(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One row — (n_edges_base, n_tomb_incident, tomb_share_ppm,
    n_edges_patched, n_repair_edges, repair_share_ppm, consolidate):
    the graph family's standing tombstone debt. Spark reads the
    PERSISTED base edge list and the PERSISTED patched edge list
    (repair edges = patched − surviving, exact because repair edges
    are never already-adjacent pairs and the base list is symmetric);
    the oracle rebuilds the graph AND the patch from scratch, so a
    stale or corrupted edge artifact fails the compare. Consolidate
    fires at ≥10% incident edges or ≥5% repair dilution — the
    FreshDiskANN consolidate trigger."""
    from bpaotu_spark.ann.index_store import connected_edges_cached
    from bpaotu_spark.ann.tombstone import (
        tombstoned_edges_cached,
        _VTOMB_MOD,
        _VTOMB_RES,
    )

    edges = connected_edges_cached(spark, sf_dir)
    patched = tombstoned_edges_cached(spark, sf_dir)
    tomb = (F.col("vec_id") % _VTOMB_MOD == _VTOMB_RES) | (
        F.col("neighbor_id") % _VTOMB_MOD == _VTOMB_RES
    )
    base = edges.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges_base"),
        F.count(F.when(tomb, 1)).cast("bigint").alias("n_tomb_incident"),
    )
    pat = patched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges_patched")
    )
    # two 1-row aggregates — bounded broadcast crossJoin
    return base.crossJoin(pat).select(
        "n_edges_base",
        "n_tomb_incident",
        F.expr("n_tomb_incident * 1000000 div n_edges_base").alias(
            "tomb_share_ppm"
        ),
        "n_edges_patched",
        F.expr(
            "n_edges_patched - (n_edges_base - n_tomb_incident)"
        ).alias("n_repair_edges"),
        F.expr(
            "(n_edges_patched - (n_edges_base - n_tomb_incident))"
            " * 1000000 div n_edges_patched"
        ).alias("repair_share_ppm"),
        F.expr(
            f"(n_tomb_incident * 1000000 div n_edges_base)"
            f" >= {GRAPH_TOMB_THRESHOLD_PPM}"
            f" OR (n_edges_patched - (n_edges_base - n_tomb_incident))"
            f" * 1000000 div n_edges_patched"
            f" >= {GRAPH_REPAIR_THRESHOLD_PPM}"
        ).alias("consolidate"),
    )
