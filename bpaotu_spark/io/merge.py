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


def scd2_merge(
    spark: SparkSession,
    table_path: str,
    delta: DataFrame,
    key_col: str,
    attr_cols: tuple[str, ...],
    ts_col: str,
    n_buckets: int = 16,
) -> dict[str, int]:
    """Slowly-changing-dimension (type 2) MERGE into a parquet lake:
    every key keeps its full version history as ``[valid_from_us,
    valid_to_us)`` intervals with exactly one open (``is_current``) row.

    Contract per delta row (key, attrs, effective ts):

    - attrs differ from the key's open row → the open row CLOSES at the
      delta's timestamp and a new open version is appended;
    - attrs identical → no-op (re-applying the same delta is
      idempotent);
    - unseen key → first open version.

    The reference's importer re-ingests revised contextual metadata
    wholesale (public path ``bpaotu/otu/importer.py``); SCD2 is the
    lake-native upgrade that keeps the prior versions queryable
    (as-of joins against ``valid_from_us``/``valid_to_us``).

    Scale shape: the dimension is stored partitioned by a key-hash
    bucket; only buckets present in the delta are read (partition-
    pruned semi join) and rewritten (dynamic partition overwrite) — a
    small delta touches a few buckets, never the table. Attr
    comparison is one md5 over the concatenated attrs, computed
    identically for stored and incoming rows; delta timestamps are
    integer epoch-µs so interval arithmetic is exact.
    """
    import os

    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    sep = "\x1f"
    attr_hash = F.md5(F.concat_ws(sep, *[F.col(c) for c in attr_cols]))

    incoming = (
        delta.select(
            key_col,
            *attr_cols,
            F.col(ts_col).cast("bigint").alias("valid_from_us"),
        )
        .withColumn("bucket", bucket)
        .withColumn("attr_hash", attr_hash)
    )
    open_row = lambda df: df.select(  # noqa: E731
        key_col,
        *attr_cols,
        "valid_from_us",
        F.lit(None).cast("bigint").alias("valid_to_us"),
        F.lit(True).alias("is_current"),
        "bucket",
        "attr_hash",
    )

    if not os.path.isdir(table_path):
        first = open_row(incoming)
        first.write.partitionBy("bucket").parquet(table_path)
        return {"closed": 0, "inserted": first.count(), "unchanged": 0}

    dim = spark.read.parquet(table_path)
    touched = dim.join(
        F.broadcast(incoming.select("bucket").distinct()), "bucket", "left_semi"
    )
    inc = incoming.select(
        F.col(key_col).alias("_k"),
        F.col("attr_hash").alias("_h"),
        F.col("valid_from_us").alias("_ts"),
    )
    # classify the touched rows against the delta (open rows only can
    # close; history rows always carry). The `_ts >` term is the
    # LATE-ARRIVAL GUARD: a delta not strictly newer than the open
    # version is stale (out-of-order or replayed) and must not close
    # anything — this is what makes whole-batch replays in any order
    # no-ops, not just same-delta re-application.
    joined = touched.join(inc, touched[key_col] == inc["_k"], "left")
    changes = (
        F.col("_k").isNotNull()
        & F.col("is_current")
        & (F.col("attr_hash") != F.col("_h"))
        & (F.col("_ts") > F.col("valid_from_us"))
    )
    closed = joined.filter(changes).select(
        key_col,
        *attr_cols,
        "valid_from_us",
        F.col("_ts").alias("valid_to_us"),
        F.lit(False).alias("is_current"),
        "bucket",
        "attr_hash",
    )
    carried = joined.filter(~F.coalesce(changes, F.lit(False))).select(
        *dim.columns
    )
    # new open versions: unseen keys, plus keys whose open row the
    # guard above actually closed (identical attrs OR stale timestamp
    # → the delta row drops, making replays no-ops)
    cur_open = touched.filter(F.col("is_current")).select(
        F.col(key_col).alias("_k"),
        F.col("attr_hash").alias("_h"),
        F.col("valid_from_us").alias("_open_from"),
    )
    jf = incoming.join(cur_open, incoming[key_col] == cur_open["_k"], "left")
    fresh = jf.filter(
        F.col("_k").isNull()
        | (
            (F.col("attr_hash") != F.col("_h"))
            & (F.col("valid_from_us") > F.col("_open_from"))
        )
    ).select(*incoming.columns)
    n_closed = closed.count()
    n_fresh = fresh.count()
    merged = (
        carried.unionByName(closed).unionByName(open_row(fresh)).localCheckpoint()
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(table_path)
    )
    return {
        "closed": n_closed,
        "inserted": n_fresh,
        "unchanged": incoming.count() - n_fresh,
    }


def gated_merge_upsert(
    spark: SparkSession,
    table_path: str,
    delta: DataFrame,
    key_cols: tuple[str, ...],
    partition_cols: tuple[str, ...],
    rules: dict[str, str],
    max_violations: int = 0,
) -> dict:
    """The composed write path: VALIDATE the delta → MERGE it →
    RE-AUDIT only the touched partitions.

    1. The delta is evaluated against ``rules`` (violating-row
       predicates, gated_write semantics) in one aggregate pass; any
       rule over ``max_violations`` refuses the merge with
       :class:`~bpaotu_spark.io.gate.ExpectationsFailed` carrying the
       receipt — bad data never reaches the lake, and the table is
       untouched.
    2. On pass, :func:`merge_upsert` lands the delta (touched
       partitions only).
    3. The same rules re-run over ONLY the touched partitions via
       :func:`~bpaotu_spark.operators.quality2.audit_delta_partitions`
       — the written state is verified, at per-delta cost, after the
       swap (catches merge-logic bugs, not just bad input).

    Returns ``{"receipt": ..., "merge": {"updated", "inserted"},
    "post_audit": [...]}``. At 100 TB every step is bounded by the
    delta: one delta scan to validate, touched-partition rewrite, one
    pruned scan to re-audit.
    """
    import pyspark.sql.functions as F2  # noqa: N812

    from bpaotu_spark.io.gate import ExpectationsFailed
    from bpaotu_spark.operators.quality2 import audit_delta_partitions

    # Arity check BEFORE any effect: a two-column caller must fail
    # while the lake is still untouched, not after the merge landed.
    if len(partition_cols) != 1:
        raise ValueError(
            "gated_merge_upsert post-audit supports exactly one "
            f"partition column, got {partition_cols}"
        )
    # Pin the delta once so the validation aggregate, the merge, and
    # the touched-partition discovery all see the SAME rows even if
    # the input is non-deterministic (sample/limit upstream) — the
    # audited-vs-published divergence gated_write's observe closes.
    delta = delta.localCheckpoint(eager=True)

    aggs = [F2.count(F2.lit(1)).cast("bigint").alias("__n_rows__")]
    for name, pred in rules.items():
        aggs.append(
            F2.coalesce(
                F2.sum(F2.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END")),
                F2.lit(0),
            )
            .cast("bigint")
            .alias(name)
        )
    row = delta.agg(*aggs).collect()[0]
    receipt = {
        "n_rows": int(row["__n_rows__"]),
        "max_violations": max_violations,
        "rules": [
            {
                "rule": name,
                "predicate": pred,
                "n_violations": int(row[name]),
            }
            for name, pred in rules.items()
        ],
    }
    ok = all(
        r["n_violations"] <= max_violations for r in receipt["rules"]
    )
    receipt["published"] = ok
    if not ok:
        raise ExpectationsFailed(receipt)
    stats = merge_upsert(
        spark, table_path, delta, key_cols, partition_cols
    )
    pcol = partition_cols[0]
    touched = [
        r[0] for r in delta.select(pcol).distinct().collect()
    ]
    post = audit_delta_partitions(
        spark, table_path, pcol, touched, rules
    ).collect()
    return {
        "receipt": receipt,
        "merge": stats,
        "post_audit": [
            {
                "check_name": r.check_name,
                "n_rows": r.n_rows,
                "n_violations": r.n_violations,
            }
            for r in post
        ],
    }
