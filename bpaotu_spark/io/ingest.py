"""Bulk ingest: raw taxonomy + contextual + abundance CSVs → validated
parquet lake, with reject handling.

The reference's importer (public path ``bpaotu/otu/importer.py``) bulk
loads taxonomy files, sample contextual metadata, and abundance
matrices into PostgreSQL, rejecting rows that reference unknown taxa or
samples and logging why. The Spark-first analogue:

- dimension CSVs (taxonomy, samples) load first and become broadcast
  validation sets;
- the fact CSV (abundance triplets) left-joins both dims and every row
  gets a ``reject_reason`` (NULL = valid): unknown taxon, unknown
  sample, missing/non-positive count — checked in that order, first
  failure wins, matching the reference's first-error-per-row logging;
- valid rows land in ``<out>/abundance`` parquet; rejects land in
  ``<out>/rejects`` parquet WITH their reason, so a re-run after fixing
  the source is a pure re-ingest (idempotent overwrite);
- dims land as parquet alongside (``<out>/taxonomy``, ``<out>/samples``).

Scale shape: the two dim joins broadcast (taxonomy and sample lists
are dimension-sized); the fact stream is a single pass — read, two
broadcast probes, one writer fan-out by validity. No shuffle at all
unless the caller asks for partitioned output (then one exchange on
the partition key). The validity split uses two filtered writes off
one cached pass rather than an RDD-side multi-sink.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bpaotu_spark.io.readers import read_csv, write_parquet

TAXONOMY_SCHEMA = "otu_id BIGINT, rank1 STRING, rank2 STRING, rank3 STRING"
SAMPLES_SCHEMA = "sample_id BIGINT, site STRING, env STRING"
ABUNDANCE_SCHEMA = "sample_id BIGINT, otu_id BIGINT, cnt DOUBLE"


def ingest_abundance(
    spark: SparkSession,
    taxonomy_csv: str,
    samples_csv: str,
    abundance_csv: str,
    out_dir: str,
    partition_by: tuple[str, ...] = (),
) -> dict[str, int]:
    """Run the full ingest; returns row counts per output table."""
    taxonomy = read_csv(spark, taxonomy_csv, schema=TAXONOMY_SCHEMA)
    samples = read_csv(spark, samples_csv, schema=SAMPLES_SCHEMA)
    fact = read_csv(spark, abundance_csv, schema=ABUNDANCE_SCHEMA)

    known_taxa = taxonomy.select("otu_id").distinct().withColumn(
        "_taxon_ok", F.lit(True)
    )
    known_samples = samples.select("sample_id").distinct().withColumn(
        "_sample_ok", F.lit(True)
    )

    checked = (
        fact.join(F.broadcast(known_taxa), "otu_id", "left")
        .join(F.broadcast(known_samples), "sample_id", "left")
        .withColumn(
            "reject_reason",
            F.when(F.col("_taxon_ok").isNull(), F.lit("unknown_taxon"))
            .when(F.col("_sample_ok").isNull(), F.lit("unknown_sample"))
            .when(
                F.col("cnt").isNull() | (F.col("cnt") <= 0),
                F.lit("bad_count"),
            ),
        )
        .select("sample_id", "otu_id", "cnt", "reject_reason")
    )
    # one source pass feeds both sinks; at lake scale this persist is a
    # short-lived shuffle-file reuse, not a driver collect
    checked = checked.persist()
    try:
        valid = checked.filter(F.col("reject_reason").isNull()).drop(
            "reject_reason"
        )
        rejects = checked.filter(F.col("reject_reason").isNotNull())

        write_parquet(taxonomy, f"{out_dir}/taxonomy")
        write_parquet(samples, f"{out_dir}/samples")
        write_parquet(valid, f"{out_dir}/abundance", partition_by=partition_by)
        write_parquet(rejects, f"{out_dir}/rejects")

        return {
            "taxonomy": taxonomy.count(),
            "samples": samples.count(),
            "abundance": valid.count(),
            "rejects": rejects.count(),
        }
    finally:
        checked.unpersist()
