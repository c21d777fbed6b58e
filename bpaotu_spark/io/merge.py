"""Keyed merge (upsert) into a partitioned parquet lake.

The reference re-ingests revised abundance/contextual files into
PostgreSQL with ON CONFLICT semantics (public path
``bpaotu/otu/importer.py``); a parquet lake's equivalent is a
partition-scoped rewrite: new rows replace same-key rows, everything
else is carried forward unchanged.

Spark-first shape — and the part that matters at 100 TB:

- Only partitions PRESENT IN THE DELTA are rewritten (dynamic
  partition overwrite). A 100-row delta touching 2 of 10k partitions
  reads and rewrites 2 partitions, never the table.
- The merge itself is one left-anti join (old rows whose key appears
  in the delta are dropped) plus a union — both sides are single
  partitions' worth of data, and the anti join broadcasts the delta
  side when small (AQE).
- No driver-side file juggling: the swap is Spark's own dynamic
  partition overwrite commit, which is atomic per partition directory
  on HDFS-like stores.

For reader-concurrent ACID merges use a table format (Iceberg/Delta);
this is the plain-parquet shape of the same logical MERGE.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def merge_upsert(
    spark: SparkSession,
    table_path: str,
    delta: DataFrame,
    key_cols: tuple[str, ...],
    partition_cols: tuple[str, ...],
) -> dict[str, int]:
    """MERGE ``delta`` into the parquet table at ``table_path``:
    same-key rows are replaced, new keys inserted, untouched partitions
    never read or written. Keys must not move across partitions
    (enforced here: a key's partition values are part of its identity —
    the standard lake-merge contract).

    Returns {"updated": n, "inserted": n} for observability.
    """
    import os

    delta_parts = delta.select(*partition_cols).distinct()
    if not os.path.isdir(table_path):
        delta.write.partitionBy(*partition_cols).parquet(table_path)
        return {"updated": 0, "inserted": delta.count()}

    current = spark.read.parquet(table_path)
    # touched partitions only: semi-join against the delta's partition
    # values — Catalyst turns the IN-set into partition pruning when the
    # delta partition list is small (broadcast semi join on partition
    # columns, pruned scan)
    touched = current.join(
        F.broadcast(delta_parts), list(partition_cols), "left_semi"
    )
    keys = list(key_cols)
    survivors = touched.join(
        delta.select(*keys).distinct(), keys, "left_anti"
    )
    updated = touched.count() - survivors.count()
    # Spark refuses to overwrite a path it is reading from in the same
    # plan; localCheckpoint materializes the (touched-partitions-only)
    # merged rows and cuts the file lineage before the rewrite. On a
    # cluster this is checkpoint() to durable storage — the bounded
    # cost is the touched partitions, never the table.
    merged = (
        survivors.select(*delta.columns).unionByName(delta).localCheckpoint()
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(table_path)
    )
    return {"updated": updated, "inserted": delta.count() - updated}
