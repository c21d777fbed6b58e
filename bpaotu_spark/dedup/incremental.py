"""Persisted + incremental MinHash/LSH dedup index (r11 VERDICT #3).

The daily operation of a growing training corpus is NOT re-deduping
100 TB from scratch — it is inserting tonight's drop into a standing
index and emitting only the NEW candidate pairs (new-vs-old and
new-vs-new). This module gives the MinHash band buckets the same
build-once / search-many lifecycle the ANN graph got in r11
(``ann/index_store``): the base corpus's ``(doc_id, band, key)`` band
table and its ``(band, key, m)`` bucket-size summary are published
through the store, and ``augment_dedup_index`` joins a delta against
them without recomputing a single base signature.

Reference parity: the reference ingests data drops through a
validating importer against standing tables (public
``bpaotu/otu/importer.py``); this is the dedup-index form of that
append workflow.

Exactness contract: the incremental pair set EQUALS the from-scratch
``dedup_minhash_lsh`` on the unioned corpus restricted to pairs that
involve at least one new document. That holds by construction because
(a) MinHash signatures are per-document (a doc's band keys never
depend on other docs), and (b) the bucket-size cap is evaluated on
the UNION sizes ``m_base + m_new`` exactly as a from-scratch run
would. The DuckDB oracle for the registered operator IS the
from-scratch computation, so the driver verifies the equality every
round; the pytest asserts it against the batch operator too.

Scale shape: the delta's band keys are the only thing shuffled — the
base index is touched by two broadcast-equi-joins keyed on (band,
key), i.e. index lookups, not scans-with-shuffle. Bucket fan-out is
bounded by LSH_BUCKET_CAP in both the base and the delta, the same
never-all-pairs discipline as the batch operator. Nothing is
collected driver-side.
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

# tonight's drop: documents with doc_id ≡ 0 (mod 8) — a deterministic
# ~12.5% delta both engines can name
_NEW_MOD = 8


def base_band_index(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The standing index: the BASE corpus's band table and its
    bucket-size summary, both persisted through the index store
    (fingerprinted on the documents table, so regenerated data can
    never serve a stale index). The weekly build job; reads after the
    first call."""
    from bpaotu_spark.ann.index_store import cached_frame

    def build_bands() -> DataFrame:
        base = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .filter(F.col("doc_id") % _NEW_MOD != 0)
        )
        return minhash_bands(base)

    bands = cached_frame(
        spark, sf_dir, "dedup_bands_b8", build_bands, table="documents"
    )
    sizes = cached_frame(
        spark,
        sf_dir,
        "dedup_bandsz_b8",
        lambda: bands.groupBy("band", "key").agg(
            F.count(F.lit(1)).alias("m_base")
        ),
        table="documents",
    )
    return bands, sizes


def augment_dedup_index(
    spark: SparkSession,
    base_bands: DataFrame,
    base_sizes: DataFrame,
    new_docs: DataFrame,
) -> DataFrame:
    """Insert ``new_docs`` (doc_id, text; ids disjoint from the base)
    into the standing index and emit ONLY the new candidate pairs:
    ``(doc_a, doc_b, n_shared_bands, n_new_in_pair)`` where at least
    one side is new. The base index is probed by broadcast equi-joins
    on the delta's (band, key) set — delta-bounded work regardless of
    base size."""
    new_bands = minhash_bands(
        new_docs.select("doc_id", "text")
    ).localCheckpoint()
    new_sizes = new_bands.groupBy("band", "key").agg(
        F.count(F.lit(1)).alias("m_new")
    )
    # union bucket sizes — exactly what a from-scratch run would gate on
    keys = (
        new_sizes.join(base_sizes, ["band", "key"], "left")
        .select(
            "band",
            "key",
            (
                F.col("m_new") + F.coalesce(F.col("m_base"), F.lit(0))
            ).alias("m"),
        )
        .filter(F.col("m").between(2, LSH_BUCKET_CAP))
        .select("band", "key")
        .localCheckpoint()  # two consumers below; keys are delta-bounded
    )
    kept_new = new_bands.join(F.broadcast(keys), ["band", "key"])
    kept_old = base_bands.join(F.broadcast(keys), ["band", "key"])
    new_old = (
        kept_new.select("band", "key", F.col("doc_id").alias("n_id"))
        .join(
            kept_old.select("band", "key", F.col("doc_id").alias("o_id")),
            ["band", "key"],
        )
        .select(
            F.least("n_id", "o_id").alias("doc_a"),
            F.greatest("n_id", "o_id").alias("doc_b"),
        )
    )
    # new-vs-new: bucket-collect inside the capped delta buckets — the
    # same explode shape as the batch operator, never a self-join
    new_new = (
        kept_new.groupBy("band", "key")
        .agg(F.collect_list("doc_id").alias("ds"))
        .select(F.explode("ds").alias("doc_a"), "ds")
        .select("doc_a", F.explode("ds").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
    pairs = (
        new_old.unionByName(new_new)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    new_ids = new_bands.select("doc_id").distinct()
    na = new_ids.select(F.col("doc_id").alias("doc_a")).withColumn(
        "a_new", F.lit(1).cast("bigint")
    )
    nb = new_ids.select(F.col("doc_id").alias("doc_b")).withColumn(
        "b_new", F.lit(1).cast("bigint")
    )
    return (
        pairs.join(F.broadcast(na), "doc_a", "left")
        .join(F.broadcast(nb), "doc_b", "left")
        .select(
            "doc_a",
            "doc_b",
            "n_shared_bands",
            (
                F.coalesce(F.col("a_new"), F.lit(0))
                + F.coalesce(F.col("b_new"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_new_in_pair"),
        )
    )


@register(
    "dedup_incremental_minhash",
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
bsz AS (
  SELECT band, key, count(*) AS m FROM bands GROUP BY band, key
),
kept AS (
  SELECT bands.doc_id, bands.band, bands.key
  FROM bands JOIN bsz USING (band, key)
  WHERE m BETWEEN 2 AND {LSH_BUCKET_CAP}
),
full_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
  FROM kept a JOIN kept b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_shared_bands,
  CAST((CASE WHEN doc_a % {_NEW_MOD} = 0 THEN 1 ELSE 0 END)
     + (CASE WHEN doc_b % {_NEW_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_new_in_pair
FROM full_pairs
WHERE doc_a % {_NEW_MOD} = 0 OR doc_b % {_NEW_MOD} = 0
""",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nightly incremental dedup: insert the doc_id ≡ 0 (mod 8) drop
    into the persisted base band index and emit only the new-vs-old ∪
    new-vs-new candidate pairs — verified against the from-scratch
    union computation (the oracle) every round."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base_bands, base_sizes = base_band_index(spark, sf_dir)
    new_docs = docs.filter(F.col("doc_id") % _NEW_MOD == 0)
    return augment_dedup_index(spark, base_bands, base_sizes, new_docs)
