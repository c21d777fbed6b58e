"""Bucketed tables — the shuffle-elimination layout for repeated
fact-fact joins.

At 100 TB the single most expensive recurring cost is re-shuffling
lineitem and orders on the order key for every join. Spark's bucketed
tables (``bucketBy`` + ``sortBy`` on ``saveAsTable``) persist the
hash-partitioning INTO the layout: two tables bucketed by the same
key into the same bucket count co-locate matching keys file-for-file,
so a join between them needs NO Exchange on either side — the scan
itself satisfies the join's distribution requirement (and ``sortBy``
lets SortMergeJoin skip its sorts too).

The reference's PostgreSQL gets this from btree indexes + the planner;
a parquet lake has to OPT IN via layout. This module is that opt-in:

- ``write_bucketed`` — save a DataFrame as a bucketed (+optionally
  sorted) managed table.
- ``bucketed_join_ready`` — load two bucketed tables and join on the
  bucket key; a pytest asserts the physical plan contains ZERO
  Exchange operators (the proof the layout pays for itself).

Sizing guidance baked into the default: bucket count should be set
once per table family (both sides MUST match) and sized so one bucket
of the BIG table is a few hundred MB — at 100 TB lineitem that is
several thousand buckets; here 8 keeps local tests instant. Buckets
too few → giant tasks; too many → small-file storm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    sort: bool = True,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a managed bucketed table (overwrite)."""
    writer = df.write.format(fmt).mode("overwrite").bucketBy(
        n_buckets, bucket_col
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key_left: str,
    key_right: str,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. With equal
    bucket counts on both sides the plan has no Exchange (and with
    sortBy, no Sort): the layout already satisfies the join's
    distribution requirement.

    The MERGE hint keeps the planner on the sort-merge path: on a
    test-sized table it would otherwise broadcast the small side and
    mark the scans "Bucketed: false (disabled by query planner)" —
    correct locally, but the 100-TB deployment this layout exists for
    has no broadcastable side, and the hinted plan is the one that
    ships there (SMJ with zero Exchange and zero Sort)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(
        right, left[key_left] == right[key_right], "inner"
    )
