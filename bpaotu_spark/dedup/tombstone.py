"""Tombstone deletes through the persisted dedup index (r12 VERDICT
item 3).

Takedown/opt-out removal is a first-class training-pipeline
operation: a deleted document's rows must leave the STANDING index —
band rows, hash rows — and every family whose keeper died must
re-elect, all WITHOUT rebuilding the index from the corpus. The
reference's importer handles re-ingest by truncate-and-reload
(public ``bpaotu/otu/importer.py``); at 100 TB that is not an option,
so deletion is delta-bounded index surgery:

* ``dedup_tombstone_exact`` — the per-deleted-doc audit over the
  persisted full (doc_id, md5) hash table: group size before the
  delete, whether the deleted doc WAS its group's keeper (min
  doc_id), and the re-elected keeper among survivors (NULL when the
  group dies). Work is bounded by the tombstone set: the deleted
  docs' hashes are the only groups touched (broadcast semi-join into
  the index — a lookup, not a scan).
* ``dedup_tombstone_minhash`` — bucket lifecycle of the delete
  against the persisted full MinHash band table: for every (band,
  key) bucket holding a deleted doc, the before/after sizes, the
  re-elected bucket representative, the surviving candidate-pair
  count, and the lifecycle status. Note the REVIVED state: the
  bucket-size cap is evaluated on post-delete sizes exactly as a
  from-scratch run on the survivor corpus would, so a bucket the
  capped index never paired can come back in range when members are
  deleted — the correctness subtlety a naive "drop rows" delete
  misses.

Both oracles are the FROM-SCRATCH computation (full corpus minus
nothing — the before/after states are both derived), so the driver
verifies the surgery against ground truth every round.

The tombstone set is deterministic (doc_id ≡ 3 mod 16, ~6%) so both
engines can name it without a side channel — same convention as the
incremental inserts' mod-8 drop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bpaotu_spark.catalog import load_table
from bpaotu_spark.dedup.core import (
    LSH_BANDS,
    LSH_BUCKET_CAP,
    NGRAMS_SQL,
    _band_key_sql,
    _SHINGLE_X_SQL,
    _sig_exprs_sql,
    minhash_bands,
)
from bpaotu_spark.registry import register

_TOMB_MOD = 16
_TOMB_RES = 3  # doc_id ≡ 3 (mod 16): the deterministic takedown set


# the full-corpus hash/band/simhash indexes moved to dedup/sigstore.py
# in r14 (one signature store shared by batch, incremental, and
# tombstone paths); re-exported here for the existing import surface
from bpaotu_spark.dedup.sigstore import (  # noqa: F401
    full_band_index,
    full_hash_index,
    full_simhash_index,
)


@register(
    "dedup_tombstone_exact",
    oracle=f"""
WITH h AS (
  SELECT doc_id, md5(text) AS h FROM documents
),
tomb AS (
  SELECT doc_id, h FROM h WHERE doc_id % {_TOMB_MOD} = {_TOMB_RES}
),
grp AS (
  SELECT h.h,
    CAST(count(*) AS BIGINT) AS group_size_before,
    min(h.doc_id) AS old_keeper,
    min(CASE WHEN h.doc_id % {_TOMB_MOD} != {_TOMB_RES}
             THEN h.doc_id END) AS new_keeper
  FROM h JOIN (SELECT DISTINCT h FROM tomb) t ON t.h = h.h
  GROUP BY h.h
)
SELECT tomb.doc_id AS deleted_id,
  grp.group_size_before,
  (grp.old_keeper = tomb.doc_id) AS was_keeper,
  grp.new_keeper
FROM tomb JOIN grp ON grp.h = tomb.h
ORDER BY deleted_id
""",
)
def dedup_tombstone_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete the mod-16 tombstone set from the persisted exact-hash
    index: one row per deleted doc — (deleted_id, group_size_before,
    was_keeper, new_keeper) with the keeper re-elected among the
    group's survivors (NULL when the group dies with the delete)."""
    idx = full_hash_index(spark, sf_dir)
    tomb = idx.filter(F.col("doc_id") % _TOMB_MOD == _TOMB_RES)
    # only the deleted docs' hash groups are touched: broadcast the
    # (bounded) tombstone hash set into the index — a lookup
    aff = tomb.select("h").distinct()
    grp = (
        idx.join(F.broadcast(aff), "h")
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("group_size_before"),
            F.min("doc_id").alias("old_keeper"),
            F.min(
                F.when(
                    F.col("doc_id") % _TOMB_MOD != _TOMB_RES,
                    F.col("doc_id"),
                )
            ).alias("new_keeper"),
        )
    )
    return (
        tomb.join(grp, "h")
        .select(
            F.col("doc_id").alias("deleted_id"),
            "group_size_before",
            (F.col("old_keeper") == F.col("doc_id")).alias("was_keeper"),
            "new_keeper",
        )
        .orderBy("deleted_id")
    )


@register(
    "dedup_tombstone_minhash",
    oracle=f"""
WITH {NGRAMS_SQL},
xs AS (
  SELECT doc_id, {_SHINGLE_X_SQL} AS x FROM ng
),
sig AS (
  SELECT doc_id,
    {_sig_exprs_sql()}
  FROM xs GROUP BY doc_id
),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {_band_key_sql(b)} AS key FROM sig" for b in range(LSH_BANDS))}
),
aff AS (
  SELECT DISTINCT band, key FROM bands
  WHERE doc_id % {_TOMB_MOD} = {_TOMB_RES}
),
st AS (
  SELECT bands.band, bands.key,
    CAST(count(*) AS BIGINT) AS m_before,
    CAST(count(CASE WHEN doc_id % {_TOMB_MOD} != {_TOMB_RES} THEN 1 END)
      AS BIGINT) AS m_after,
    min(doc_id) AS old_rep,
    min(CASE WHEN doc_id % {_TOMB_MOD} != {_TOMB_RES} THEN doc_id END)
      AS new_rep
  FROM bands JOIN aff ON aff.band = bands.band AND aff.key = bands.key
  GROUP BY bands.band, bands.key
)
SELECT band, key, m_before, m_after, old_rep, new_rep,
  (new_rep IS NULL OR new_rep != old_rep) AS rep_changed,
  CASE WHEN m_after < 2 THEN 'dead'
       WHEN m_after > {LSH_BUCKET_CAP} THEN 'capped'
       WHEN m_before > {LSH_BUCKET_CAP} THEN 'revived'
       ELSE 'active' END AS status,
  CASE WHEN m_after BETWEEN 2 AND {LSH_BUCKET_CAP}
       THEN m_after * (m_after - 1) // 2 ELSE 0 END AS n_pairs_after
FROM st
ORDER BY band, key
""",
)
def dedup_tombstone_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete the mod-16 tombstone set from the persisted MinHash band
    index: one row per affected (band, key) bucket — before/after
    sizes, re-elected representative, lifecycle status (dead /
    active / capped / REVIVED — a formerly over-cap bucket coming
    back into pairing range) and the surviving candidate-pair count.
    Only buckets holding a deleted doc are touched (broadcast lookup
    into the persisted index, never a rebuild)."""
    idx = full_band_index(spark, sf_dir)
    aff = (
        idx.filter(F.col("doc_id") % _TOMB_MOD == _TOMB_RES)
        .select("band", "key")
        .distinct()
    )
    st = (
        idx.join(F.broadcast(aff), ["band", "key"])
        .groupBy("band", "key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m_before"),
            F.count(
                F.when(F.col("doc_id") % _TOMB_MOD != _TOMB_RES, 1)
            )
            .cast("bigint")
            .alias("m_after"),
            F.min("doc_id").alias("old_rep"),
            F.min(
                F.when(
                    F.col("doc_id") % _TOMB_MOD != _TOMB_RES,
                    F.col("doc_id"),
                )
            ).alias("new_rep"),
        )
    )
    return st.select(
        "band",
        "key",
        "m_before",
        "m_after",
        "old_rep",
        "new_rep",
        (
            F.col("new_rep").isNull() | (F.col("new_rep") != F.col("old_rep"))
        ).alias("rep_changed"),
        F.expr(
            f"CASE WHEN m_after < 2 THEN 'dead'"
            f" WHEN m_after > {LSH_BUCKET_CAP} THEN 'capped'"
            f" WHEN m_before > {LSH_BUCKET_CAP} THEN 'revived'"
            f" ELSE 'active' END"
        ).alias("status"),
        F.expr(
            f"CASE WHEN m_after BETWEEN 2 AND {LSH_BUCKET_CAP}"
            " THEN m_after * (m_after - 1) DIV 2"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("n_pairs_after"),
    ).orderBy("band", "key")


# ---------------------------------------------------------------------------
# dedup_maintenance_cycle — the NIGHTLY CYCLE end to end: apply
# tonight's insert (the doc_id ≡ 0 mod 8 drop) AND tonight's takedown
# (the doc_id ≡ 3 mod 16 tombstones, all inside the standing corpus
# by construction) to the exact-hash index in ONE pass, and emit the
# canonical-map DELTA — the rows a downstream consumer must upsert.
# This is the operation a production corpus actually schedules: both
# the r12 incremental-insert surface and the r13 tombstone surface,
# composed, with keeper elections resolved across BOTH changes (an
# inserted doc with a smaller id can take a keepership at the same
# moment a deleted keeper releases one).
#
# Output: one row per doc of the post-cycle corpus whose canonical
# assignment is CREATED ('inserted') or CHANGED ('rekeyed') by the
# cycle — everything untouched stays out of the delta, which is what
# bounds the write volume at 100 TB.
#
# Scale shape: the drop hashes fresh (delta work); the standing
# membership rows are probed only for the affected hash groups
# (broadcast of tomb ∪ drop hashes — a lookup); elections are
# per-group aggregates over those bounded groups.
# ---------------------------------------------------------------------------

_CYC_NEW_MOD = 8  # dedup/incremental.py's drop convention


@register(
    "dedup_maintenance_cycle",
    oracle=f"""
WITH h AS (
  SELECT doc_id, md5(text) AS h FROM documents
),
base AS (
  SELECT doc_id, h FROM h WHERE doc_id % {_CYC_NEW_MOD} != 0
),
newd AS (
  SELECT doc_id, h FROM h WHERE doc_id % {_CYC_NEW_MOD} = 0
),
aff AS (
  SELECT h FROM base WHERE doc_id % {_TOMB_MOD} = {_TOMB_RES}
  UNION SELECT h FROM newd
),
old_k AS (
  SELECT base.h, min(doc_id) AS old_keeper
  FROM base JOIN aff USING (h) GROUP BY base.h
),
finalm AS (
  SELECT base.doc_id, base.h FROM base JOIN aff USING (h)
  WHERE base.doc_id % {_TOMB_MOD} != {_TOMB_RES}
  UNION ALL
  SELECT newd.doc_id, newd.h FROM newd
),
new_k AS (
  SELECT h, min(doc_id) AS canonical_id FROM finalm GROUP BY h
)
SELECT f.doc_id, k.canonical_id,
  CASE WHEN f.doc_id % {_CYC_NEW_MOD} = 0 THEN 'inserted'
       ELSE 'rekeyed' END AS change
FROM finalm f
JOIN new_k k ON k.h = f.h
LEFT JOIN old_k o ON o.h = f.h
WHERE f.doc_id % {_CYC_NEW_MOD} = 0
   OR o.old_keeper IS NULL
   OR k.canonical_id != o.old_keeper
ORDER BY f.doc_id
""",
)
def dedup_maintenance_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tonight's insert + tonight's takedown through the exact-hash
    index in one pass: (doc_id, canonical_id, change ∈ {inserted,
    rekeyed}) — the canonical-map delta the cycle must upsert. Only
    the affected hash groups are touched (broadcast lookup into the
    persisted membership table)."""
    idx = full_hash_index(spark, sf_dir)
    base = idx.filter(F.col("doc_id") % _CYC_NEW_MOD != 0)
    # the drop hashes fresh — in production it is not in the standing
    # index yet; the persisted artifact just happens to cover it
    newd = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _CYC_NEW_MOD == 0)
        .select("doc_id", F.md5("text").alias("h"))
    )
    aff = (
        base.filter(F.col("doc_id") % _TOMB_MOD == _TOMB_RES)
        .select("h")
        .union(newd.select("h"))
        .distinct()
    )
    old_k = (
        base.join(F.broadcast(aff), "h")
        .groupBy("h")
        .agg(F.min("doc_id").alias("old_keeper"))
    )
    finalm = (
        base.join(F.broadcast(aff), "h")
        .filter(F.col("doc_id") % _TOMB_MOD != _TOMB_RES)
        .select("doc_id", "h")
        .unionByName(newd.select("doc_id", "h"))
    )
    new_k = finalm.groupBy("h").agg(F.min("doc_id").alias("canonical_id"))
    return (
        finalm.join(new_k, "h")
        .join(old_k, "h", "left")
        .filter(
            (F.col("doc_id") % _CYC_NEW_MOD == 0)
            | F.col("old_keeper").isNull()
            | (F.col("canonical_id") != F.col("old_keeper"))
        )
        .select(
            "doc_id",
            "canonical_id",
            F.when(F.col("doc_id") % _CYC_NEW_MOD == 0, "inserted")
            .otherwise("rekeyed")
            .alias("change"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# dedup_tombstone_simhash / dedup_tombstone_embedding — the takedown
# pass over the OTHER two standing near-dup indexes (completing the
# matrix: every index family that has an incremental INSERT — exact,
# minhash, simhash, embedding — now also has a DELETE):
#
# * simhash: per affected (b, band_val) band bucket of the persisted
#   full signature table, before/after sizes, re-elected
#   representative and the surviving CANDIDATE-pair count (simhash
#   pairs still gate on Hamming<=max downstream; the bucket census is
#   the index-maintenance view). No bucket cap in this family, so the
#   lifecycle states are dead/active only.
# * embedding: per affected sign-LSH bucket of the persisted vector
#   index (the VECTOR tombstone set, vec_id ≡ 7 mod 50 — the ANN
#   graph's takedown convention, so one takedown order drives both
#   the graph repair and the dedup-bucket surgery).
#
# Both oracles recompute from scratch; both Spark sides touch only
# buckets holding a deleted member (broadcast lookup into the
# persisted index).
# ---------------------------------------------------------------------------


def _simhash_tomb_oracle() -> str:
    from bpaotu_spark.dedup.core import (
        SIMHASH_BANDS,
        SIMHASH_BITS,
        _feature_hash_sql,
    )
    from bpaotu_spark.functions.textops import TOKENIZE_SQL

    return f"""
WITH t AS (
  SELECT doc_id, {TOKENIZE_SQL} AS toks FROM documents
), feat AS (
  SELECT DISTINCT doc_id, unnest(toks) AS tok FROM t
), fh AS (
  SELECT doc_id, {_feature_hash_sql()} AS h FROM feat
), bits AS (
  SELECT doc_id, j,
    sum(CASE WHEN (h // (1 << j)) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM fh, (SELECT unnest(range({SIMHASH_BITS})) AS j)
  GROUP BY doc_id, j
), sh AS (
  SELECT doc_id,
    CAST(sum(CASE WHEN v > 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
), banded AS (
  SELECT doc_id, b, (simhash >> (b * 8)) % 256 AS band_val
  FROM sh, (SELECT unnest(range({SIMHASH_BANDS})) AS b)
),
aff AS (
  SELECT DISTINCT b, band_val FROM banded
  WHERE doc_id % {_TOMB_MOD} = {_TOMB_RES}
),
st AS (
  SELECT banded.b, banded.band_val,
    CAST(count(*) AS BIGINT) AS m_before,
    CAST(count(CASE WHEN doc_id % {_TOMB_MOD} != {_TOMB_RES} THEN 1 END)
      AS BIGINT) AS m_after,
    min(doc_id) AS old_rep,
    min(CASE WHEN doc_id % {_TOMB_MOD} != {_TOMB_RES} THEN doc_id END)
      AS new_rep
  FROM banded JOIN aff
    ON aff.b = banded.b AND aff.band_val = banded.band_val
  GROUP BY banded.b, banded.band_val
)
SELECT CAST(b AS BIGINT) AS b, CAST(band_val AS BIGINT) AS band_val,
  m_before, m_after, old_rep, new_rep,
  (new_rep IS NULL OR new_rep != old_rep) AS rep_changed,
  CASE WHEN m_after < 2 THEN 'dead' ELSE 'active' END AS status,
  CASE WHEN m_after >= 2 THEN m_after * (m_after - 1) // 2
       ELSE 0 END AS n_cand_pairs_after
FROM st
ORDER BY b, band_val
"""


def _emb_tomb_oracle() -> str:
    from bpaotu_spark.dedup.core import _emb_bucket_sql

    return f"""
WITH idx AS (
  SELECT e.vec_id, {_emb_bucket_sql('e')} AS bucket FROM embeddings e
),
aff AS (
  SELECT DISTINCT bucket FROM idx
  WHERE vec_id % {_VEC_TOMB_MOD} = {_VEC_TOMB_RES}
),
st AS (
  SELECT idx.bucket,
    CAST(count(*) AS BIGINT) AS m_before,
    CAST(count(CASE WHEN vec_id % {_VEC_TOMB_MOD} != {_VEC_TOMB_RES}
      THEN 1 END) AS BIGINT) AS m_after,
    min(vec_id) AS old_rep,
    min(CASE WHEN vec_id % {_VEC_TOMB_MOD} != {_VEC_TOMB_RES}
      THEN vec_id END) AS new_rep
  FROM idx JOIN aff USING (bucket)
  GROUP BY idx.bucket
)
SELECT bucket, m_before, m_after, old_rep, new_rep,
  (new_rep IS NULL OR new_rep != old_rep) AS rep_changed,
  CASE WHEN m_after < 2 THEN 'dead' ELSE 'active' END AS status,
  CASE WHEN m_after >= 2 THEN m_after * (m_after - 1) // 2
       ELSE 0 END AS n_cand_pairs_after
FROM st
ORDER BY bucket
"""





@register("dedup_tombstone_simhash", oracle=_simhash_tomb_oracle())
def dedup_tombstone_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete the mod-16 tombstone set from the persisted SimHash
    index: one row per affected (b, band_val) band bucket —
    (b, band_val, m_before, m_after, old_rep, new_rep, rep_changed,
    status, n_cand_pairs_after)."""
    from bpaotu_spark.dedup.core import simhash_banded

    idx = simhash_banded(full_simhash_index(spark, sf_dir)).select(
        "doc_id", "b", "band_val"
    )
    aff = (
        idx.filter(F.col("doc_id") % _TOMB_MOD == _TOMB_RES)
        .select("b", "band_val")
        .distinct()
    )
    st = (
        idx.join(F.broadcast(aff), ["b", "band_val"])
        .groupBy("b", "band_val")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m_before"),
            F.count(
                F.when(F.col("doc_id") % _TOMB_MOD != _TOMB_RES, 1)
            )
            .cast("bigint")
            .alias("m_after"),
            F.min("doc_id").alias("old_rep"),
            F.min(
                F.when(
                    F.col("doc_id") % _TOMB_MOD != _TOMB_RES,
                    F.col("doc_id"),
                )
            ).alias("new_rep"),
        )
    )
    return st.select(
        F.col("b").cast("bigint").alias("b"),
        F.col("band_val").cast("bigint").alias("band_val"),
        "m_before",
        "m_after",
        "old_rep",
        "new_rep",
        (
            F.col("new_rep").isNull() | (F.col("new_rep") != F.col("old_rep"))
        ).alias("rep_changed"),
        F.expr(
            "CASE WHEN m_after < 2 THEN 'dead' ELSE 'active' END"
        ).alias("status"),
        F.expr(
            "CASE WHEN m_after >= 2"
            " THEN m_after * (m_after - 1) DIV 2"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("n_cand_pairs_after"),
    ).orderBy("b", "band_val")


_VEC_TOMB_MOD = 50
_VEC_TOMB_RES = 7  # the ann/tombstone.py takedown convention


def full_emb_bucket_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, bucket) over the FULL corpus — the standing sign-LSH
    membership rows, persisted through the index store (shared by the
    takedown pass and the tombstone-debt census)."""
    from bpaotu_spark.ann.index_store import cached_frame
    from bpaotu_spark.dedup.core import _emb_bucket

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("v"),
        )
        return emb.select(
            "vec_id", _emb_bucket(F.col("v")).alias("bucket")
        )

    return cached_frame(
        spark, sf_dir, "emb_lsh_all", build, table="embeddings"
    )


@register("dedup_tombstone_embedding", oracle=_emb_tomb_oracle())
def dedup_tombstone_embedding(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delete the mod-50 VECTOR tombstone set from the persisted
    sign-LSH bucket index: one row per affected bucket —
    (bucket, m_before, m_after, old_rep, new_rep, rep_changed,
    status, n_cand_pairs_after)."""
    idx = full_emb_bucket_index(spark, sf_dir)
    aff = (
        idx.filter(F.col("vec_id") % _VEC_TOMB_MOD == _VEC_TOMB_RES)
        .select("bucket")
        .distinct()
    )
    st = (
        idx.join(F.broadcast(aff), "bucket")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m_before"),
            F.count(
                F.when(
                    F.col("vec_id") % _VEC_TOMB_MOD != _VEC_TOMB_RES, 1
                )
            )
            .cast("bigint")
            .alias("m_after"),
            F.min("vec_id").alias("old_rep"),
            F.min(
                F.when(
                    F.col("vec_id") % _VEC_TOMB_MOD != _VEC_TOMB_RES,
                    F.col("vec_id"),
                )
            ).alias("new_rep"),
        )
    )
    return st.select(
        "bucket",
        "m_before",
        "m_after",
        "old_rep",
        "new_rep",
        (
            F.col("new_rep").isNull() | (F.col("new_rep") != F.col("old_rep"))
        ).alias("rep_changed"),
        F.expr(
            "CASE WHEN m_after < 2 THEN 'dead' ELSE 'active' END"
        ).alias("status"),
        F.expr(
            "CASE WHEN m_after >= 2"
            " THEN m_after * (m_after - 1) DIV 2"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("n_cand_pairs_after"),
    ).orderBy("bucket")





# ---------------------------------------------------------------------------
# dedup_maintenance_cycle_minhash — the nightly cycle over the BAND
# index (the MinHash twin of dedup_maintenance_cycle): insert the
# mod-8 drop's band rows AND remove the mod-16 tombstones' in one
# pass against the persisted BASE band index, emitting the bucket
# delta. Both cap transitions appear: REVIVED (delete pulls an
# over-cap bucket back into pairing range) and NEWLY_CAPPED (insert
# pushes a bucket over the cap — the inverse subtlety; a from-scratch
# run on the post-cycle corpus would skip those buckets, and so must
# the incremental pair former).
#
# Scale shape: drop band rows are delta work; only buckets touched by
# the drop or a tombstone are probed (broadcast lookup), as in both
# parent ops.
# ---------------------------------------------------------------------------


@register(
    "dedup_maintenance_cycle_minhash",
    oracle=f"""
WITH {NGRAMS_SQL},
xs AS (
  SELECT doc_id, {_SHINGLE_X_SQL} AS x FROM ng
),
sig AS (
  SELECT doc_id,
    {_sig_exprs_sql()}
  FROM xs GROUP BY doc_id
),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {_band_key_sql(b)} AS key FROM sig" for b in range(LSH_BANDS))}
),
aff AS (
  SELECT DISTINCT band, key FROM bands
  WHERE doc_id % {_CYC_NEW_MOD} = 0
     OR doc_id % {_TOMB_MOD} = {_TOMB_RES}
),
st AS (
  SELECT bands.band, bands.key,
    CAST(count(CASE WHEN doc_id % {_CYC_NEW_MOD} != 0 THEN 1 END)
      AS BIGINT) AS m_before,
    CAST(count(CASE WHEN doc_id % {_TOMB_MOD} != {_TOMB_RES} THEN 1 END)
      AS BIGINT) AS m_after,
    min(CASE WHEN doc_id % {_CYC_NEW_MOD} != 0 THEN doc_id END)
      AS old_rep,
    min(CASE WHEN doc_id % {_TOMB_MOD} != {_TOMB_RES} THEN doc_id END)
      AS new_rep
  FROM bands JOIN aff ON aff.band = bands.band AND aff.key = bands.key
  GROUP BY bands.band, bands.key
)
SELECT band, key, m_before, m_after, old_rep, new_rep,
  CASE WHEN m_after < 2 THEN 'dead'
       WHEN m_after > {LSH_BUCKET_CAP} AND
            (m_before BETWEEN 2 AND {LSH_BUCKET_CAP}) THEN 'newly_capped'
       WHEN m_after > {LSH_BUCKET_CAP} THEN 'capped'
       WHEN m_before > {LSH_BUCKET_CAP} THEN 'revived'
       ELSE 'active' END AS status,
  CASE WHEN m_after BETWEEN 2 AND {LSH_BUCKET_CAP}
       THEN m_after * (m_after - 1) // 2 ELSE 0 END AS n_pairs_after
FROM st
ORDER BY band, key
""",
)
def dedup_maintenance_cycle_minhash(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Insert the mod-8 drop and delete the mod-16 tombstones through
    the band index in one pass: per touched (band, key) bucket the
    before/after sizes, re-elected representative, lifecycle status
    (incl. newly_capped — insert pushing a bucket over the pair cap)
    and the post-cycle candidate-pair count."""
    from bpaotu_spark.dedup.incremental import base_band_index

    base_bands, _ = base_band_index(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # the drop's band rows are delta work (its docs are not in the
    # standing index); tombstones are base rows by construction
    drop_bands = minhash_bands(
        docs.filter(F.col("doc_id") % _CYC_NEW_MOD == 0)
    ).localCheckpoint()
    allb = base_bands.select("doc_id", "band", "key").unionByName(
        drop_bands.select("doc_id", "band", "key")
    )
    aff = (
        drop_bands.select("band", "key")
        .unionByName(
            base_bands.filter(
                F.col("doc_id") % _TOMB_MOD == _TOMB_RES
            ).select("band", "key")
        )
        .distinct()
    )
    st = (
        allb.join(F.broadcast(aff), ["band", "key"])
        .groupBy("band", "key")
        .agg(
            F.count(
                F.when(F.col("doc_id") % _CYC_NEW_MOD != 0, 1)
            )
            .cast("bigint")
            .alias("m_before"),
            F.count(
                F.when(F.col("doc_id") % _TOMB_MOD != _TOMB_RES, 1)
            )
            .cast("bigint")
            .alias("m_after"),
            F.min(
                F.when(
                    F.col("doc_id") % _CYC_NEW_MOD != 0, F.col("doc_id")
                )
            ).alias("old_rep"),
            F.min(
                F.when(
                    F.col("doc_id") % _TOMB_MOD != _TOMB_RES,
                    F.col("doc_id"),
                )
            ).alias("new_rep"),
        )
    )
    return st.select(
        "band",
        "key",
        "m_before",
        "m_after",
        "old_rep",
        "new_rep",
        F.expr(
            f"CASE WHEN m_after < 2 THEN 'dead'"
            f" WHEN m_after > {LSH_BUCKET_CAP} AND"
            f"  (m_before BETWEEN 2 AND {LSH_BUCKET_CAP}) THEN 'newly_capped'"
            f" WHEN m_after > {LSH_BUCKET_CAP} THEN 'capped'"
            f" WHEN m_before > {LSH_BUCKET_CAP} THEN 'revived'"
            f" ELSE 'active' END"
        ).alias("status"),
        F.expr(
            f"CASE WHEN m_after BETWEEN 2 AND {LSH_BUCKET_CAP}"
            " THEN m_after * (m_after - 1) DIV 2"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("n_pairs_after"),
    ).orderBy("band", "key")
