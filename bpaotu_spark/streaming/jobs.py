"""Structured Streaming jobs over the events table.

The reference has no streaming surface; these are the Spark-first
additions. Each job is the streaming twin of a proven batch operator
(same aggregation logic as ``bpaotu_spark.operators.events``), so the
batch DuckDB oracles double as the streaming correctness baseline —
the tests run each stream with ``availableNow`` (process-everything-
then-stop) and diff against the batch result.

Scale notes: file-source streams partition per file; watermarks bound
the state store (late rows beyond the watermark are dropped instead of
accumulating), and session_window state is per (user, open-session)
only — both are the standard knobs that keep streaming state O(active
keys), not O(history), on a long-running cluster job.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as _W
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# Schema the file stream needs up front (streams cannot infer).
# ts is parquet TIMESTAMP(MICROS) without timezone → TIMESTAMP_NTZ,
# the same thing the batch catalog reads; it then casts to LTZ under
# the session's pinned-UTC timezone so window()/unix_millis() apply.
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """events as a file-source stream with proper event-time ts."""
    # File streams require a directory source; events.parquet is a single
    # file, so stream the sf_dir with a glob filter (on a real lake this
    # is just the events/ directory and new files arrive as new batches).
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA).option(
        "pathGlobFilter", "events.parquet"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(sf_dir)
    return raw.withColumn("ts", F.col("ts").cast("timestamp_ltz"))


def windowed_agg_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour windowed agg with watermark (streaming twin of
    ``events_windowed_agg``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # DECIMAL partials: keeps the sum associative so the stream
            # hash-matches its batch twin regardless of micro-batch order.
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """session_window sessionization (streaming twin of
    ``events_session_window``)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_millis(F.col("sw.start")).alias("session_start_ms"),
            F.unix_millis(F.col("sw.end")).alias("session_end_ms"),
            "n_events",
            "session_value",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, complete: bool = True) -> None:
    """Drain a stream into an in-memory table with availableNow."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if complete else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon.

    dropDuplicatesWithinWatermark keeps state only for the watermark
    window — the scale-safe form of streaming dedup (plain
    dropDuplicates state grows without bound on an infinite stream).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


USER_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (event count, value total) maintained across micro-batches.

    This is the arbitrary-stateful-processing escape hatch for
    operators Spark's built-in streaming aggs can't express (custom
    eviction, nested state machines); state is partitioned by group
    key, so it scales horizontally like any keyed aggregation.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=USER_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def purchases_after_signup_stream(
    events: DataFrame, range_s: int = 3600, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: purchases within ``range_s`` after
    each signup, per user — the streaming twin of the batch
    ``range_join_bucketed`` operator.

    Both sides carry watermarks and the join condition bounds event
    time on BOTH ends, so the state store provably expires rows:
    a signup can stop waiting once watermark passes ts + range_s, a
    purchase once it can no longer match any retained signup. This is
    the canonical bounded-state stream-stream join shape; without the
    time bounds Spark would have to keep every row forever.
    """
    s = (
        events.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("ts_s"),
        )
        .withWatermark("ts_s", watermark)
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("ts_p"),
        )
        .withWatermark("ts_p", watermark)
    )
    return s.join(
        p,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("ts_p") > F.col("ts_s"))
        & (F.col("ts_p") <= F.col("ts_s") + F.expr(f"INTERVAL {range_s} SECONDS")),
        "inner",
    ).select("signup_id", F.col("s_user").alias("user_id"), "ts_s", "ts_p")


def stream_shards_foreachBatch(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    checkpoint_path: str,
) -> None:
    """Incremental training-shard production: a file-source stream of
    events rolls up per micro-batch and appends partitioned parquet via
    ``foreachBatch``.

    foreachBatch is the general-purpose streaming sink: the batch
    DataFrame inside the closure is a normal DataFrame, so the full
    writer API (partitionBy, bucketing, merges) applies. Exactly-once
    comes from the checkpoint: a replayed batch rewrites the same
    ``batch_id`` partition idempotently (partition overwrite by
    batch_id), the standard recipe when the sink itself is not
    transactional. Runs with availableNow (drain-and-stop) here; a
    production job leaves the trigger continuous.
    """
    ev = read_events_stream(spark, sf_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy(
                F.date_trunc("hour", "ts").alias("hour"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_path)
        )

    q = (
        ev.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sliding_agg_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in two
    overlapping windows) — the trending-metrics shape tumbling windows
    can't express. State is bounded by the watermark exactly as in the
    tumbling job; slide < width only multiplies live state by
    width/slide (2x here).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def trending_event_types_stream(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k event types by total value — the live "trending now"
    leaderboard. Complete-mode global sort is legal (and cheap) here
    because the aggregate is |event_types| rows; the heavy lifting
    stays in the incremental keyed aggregation.
    """
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy(F.col("total_value").desc(), F.col("event_type").asc())
        .limit(k)
    )


def incremental_minhash_dedup(
    spark: SparkSession,
    docs_path: str,
    store_path: str,
    verdict_path: str,
    checkpoint_path: str,
) -> None:
    """Incremental near-dedup: stream document files through foreachBatch,
    probing each micro-batch's MinHash band keys against a PERSISTENT
    band store so duplicates of anything ever seen are caught — the
    shape a continuously-ingesting corpus actually needs (batch
    re-dedup of 100 TB per drop is not an option).

    Per batch: (1) band the batch via the same ``minhash_bands`` the
    batch operator uses; (2) a doc is a duplicate if it shares any band
    with a stored doc OR with a smaller-id doc in its own batch, its
    ``dup_of`` the minimum such doc (chains may point at earlier
    duplicates — union-find laziness, resolved by followers); (3) only
    KEEPERS' bands append to the store, so the store grows with unique
    content, not with the stream.

    foreachBatch is AT-LEAST-once, so every batch write is idempotent
    under replay: the store probe excludes a doc's own bands (on replay
    the store already holds this batch's keepers — without the guard
    every keeper would self-match and flip to duplicate), verdicts are
    written via dynamic partition-overwrite on batch_id (a replay
    rewrites the same partition instead of appending duplicate rows),
    and store appends anti-join the already-stored doc_ids (a replay
    appends nothing). Net effect: checkpointed replay converges to the
    same store + verdict state as a single clean run.
    """
    from bpaotu_spark.dedup.core import minhash_bands

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(docs_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import os

        bands = minhash_bands(batch_df.select("doc_id", "text")).cache()
        stored_ids = None
        cands = None
        if os.path.isdir(store_path):
            store = spark.read.parquet(store_path)
            stored_ids = store.select("doc_id").distinct()
            cands = (
                bands.join(
                    store.select("band", "key", F.col("doc_id").alias("cand")),
                    ["band", "key"],
                )
                # replay guard: after a failure between the store append
                # and the checkpoint commit, the store already holds this
                # batch's own keeper bands — without this filter every
                # keeper self-matches on re-run
                .filter(F.col("cand") != F.col("doc_id"))
                .select("doc_id", "cand")
            )
        batch_min = (
            bands.groupBy("band", "key")
            .agg(F.min("doc_id").alias("cand"))
            .join(bands, ["band", "key"])
            .filter(F.col("cand") < F.col("doc_id"))
            .select("doc_id", "cand")
        )
        cands = batch_min if cands is None else cands.unionByName(batch_min)
        dup_of = cands.groupBy("doc_id").agg(F.min("cand").alias("dup_of"))
        verdicts = (
            batch_df.select("doc_id")
            .join(dup_of, "doc_id", "left")
            .select(
                "doc_id",
                F.col("dup_of").isNotNull().alias("is_duplicate"),
                "dup_of",
                F.lit(batch_id).alias("batch_id"),
            )
        )
        # idempotent emission: a replayed batch rewrites its own
        # batch_id partition rather than appending a second copy
        (
            verdicts.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(verdict_path)
        )
        keepers = verdicts.filter(~F.col("is_duplicate")).select("doc_id")
        new_bands = bands.join(keepers, "doc_id")
        if stored_ids is not None:
            # idempotent store growth: a replayed batch's keepers are
            # already stored — append nothing for them
            new_bands = new_bands.join(stored_ids, "doc_id", "left_anti")
        new_bands.write.mode("append").parquet(store_path)
        bands.unpersist()

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def enriched_segment_stream(
    events: DataFrame, customers: DataFrame
) -> DataFrame:
    """Stream-static enrichment: the event stream joined to a STATIC
    broadcast dimension (customer → market segment), then aggregated
    per (segment, event_type). The canonical "enrich facts with
    reference data" streaming pattern: the static side is planned as a
    broadcast per micro-batch (re-read each trigger on a cluster, so
    slowly-changing dims pick up updates), and the stream side never
    shuffles for the join. DECIMAL partials keep the aggregate
    batch-identical regardless of micro-batch boundaries.
    """
    dim = F.broadcast(
        customers.select(
            F.col("c_custkey").alias("user_id"), F.col("c_mktsegment")
        )
    )
    return (
        events.join(dim, "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
    )


def streaming_rollup_upsert(
    spark: SparkSession,
    sf_dir: str,
    table_path: str,
    checkpoint_path: str,
) -> None:
    """Streaming MERGE into a lake rollup: each micro-batch aggregates
    its events per (day, event_type) and UPSERTS the deltas into a
    partitioned parquet rollup via :func:`bpaotu_spark.io.merge.
    merge_upsert` — the continuously-maintained materialized view every
    ops dashboard reads, without a table format.

    Correct under re-delivery and partial days: the batch delta MERGES
    with the existing cell (sums add) rather than overwriting blindly —
    read-modify-write per touched key, scoped to delta-touched
    partitions only. foreachBatch is at-least-once; a replayed batch
    would double-count, so the job writes each batch's contribution
    keyed by (day, event_type) with counts re-ADDED only when the
    batch id advances — enforced by storing last_batch_id per cell and
    skipping cells whose stored last_batch_id >= current batch id.
    """
    from bpaotu_spark.io.merge import merge_upsert

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import os

        delta = (
            batch_df.groupBy(
                F.date_format("ts", "yyyy-MM-dd").alias("day"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("decimal(18,6)")
                .alias("sum_value"),
            )
            .withColumn("last_batch_id", F.lit(batch_id).cast("bigint"))
        )
        if os.path.isdir(table_path):
            current = spark.read.parquet(table_path)
            # add stored totals into this batch's touched cells, unless
            # the cell already absorbed this batch (replay)
            joined = delta.alias("d").join(
                current.alias("c"), ["day", "event_type"], "left"
            )
            already = F.col("c.last_batch_id") >= batch_id
            delta = joined.select(
                "day",
                "event_type",
                F.when(already, F.col("c.n_events"))
                .otherwise(
                    F.col("d.n_events") + F.coalesce(F.col("c.n_events"), F.lit(0))
                )
                .alias("n_events"),
                F.when(already, F.col("c.sum_value"))
                .otherwise(
                    F.col("d.sum_value")
                    + F.coalesce(
                        F.col("c.sum_value"), F.lit(0).cast("decimal(18,6)")
                    )
                )
                .cast("decimal(18,6)")
                .alias("sum_value"),
                F.greatest(
                    F.lit(batch_id).cast("bigint"),
                    F.coalesce(F.col("c.last_batch_id"), F.lit(-1).cast("bigint")),
                ).alias("last_batch_id"),
            ).localCheckpoint()
        merge_upsert(
            spark,
            table_path,
            delta,
            key_cols=("day", "event_type"),
            partition_cols=("event_type",),
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


TRANSITIONS_SCHEMA = (
    "user_id bigint, prev_type string, next_type string, n bigint"
)
_TRANS_STATE_SCHEMA = "last_type string, last_us bigint, last_event bigint"


def transition_counts_stream(events: DataFrame) -> DataFrame:
    """Incremental Markov transition counts — the streaming twin of the
    batch ``event_type_transitions`` operator.

    Per-user state = the last seen (event_type, event-time µs,
    event_id); each micro-batch sorts its rows by (ts, event_id),
    chains them onto the stored last event, and emits the batch's
    (prev_type → next_type) count DELTAS for that user. Summing the
    deltas downstream reproduces the batch operator's counts exactly —
    the test proves it over a 3-batch time-split replay.

    Assumes per-key in-order delivery across batches (the Kafka-
    per-partition / time-partitioned-file-drop contract): a batch whose
    rows predate the stored state would chain wrongly, exactly as any
    cross-batch sessionizer would. State is O(1) per active user —
    nothing accumulates.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        rows = []
        for pdf in pdfs:
            for ts, eid, etype in zip(
                pdf["ts"], pdf["event_id"], pdf["event_type"]
            ):
                rows.append((int(pd.Timestamp(ts).value // 1000), int(eid), etype))
        rows.sort()
        prev = state.get[0] if state.exists else None
        counts: dict[tuple[str, str], int] = {}
        for _, _, etype in rows:
            if prev is not None:
                k = (prev, etype)
                counts[k] = counts.get(k, 0) + 1
            prev = etype
        if rows:
            last_us, last_eid, last_type = rows[-1]
            state.update((last_type, last_us, last_eid))
        if counts:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(counts),
                    "prev_type": [k[0] for k in counts],
                    "next_type": [k[1] for k in counts],
                    "n": list(counts.values()),
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=TRANSITIONS_SCHEMA,
        stateStructType=_TRANS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cms_cells_stream(events: DataFrame) -> DataFrame:
    """Streaming Count-Min Sketch: the running (j, bucket, cell) cells
    over the event stream — the batch operator's ``cms_cells`` applied
    to a streaming frame.

    A CMS is a cell-wise SUM of per-batch sketches, so a plain
    streaming groupBy aggregation IS the incremental sketch: state is
    hard-capped at DEPTH x WIDTH rows (4,096) no matter how many events
    flow through — the textbook example of O(1)-state streaming
    analytics (vs the O(distinct users) state of an exact heavy-hitters
    aggregation). Run in complete/update mode; no watermark needed
    because the state never grows.
    """
    from bpaotu_spark.operators.events import cms_cells

    return cms_cells(events)


def scd2_dim_stream(
    spark: SparkSession, src_dir: str, table_path: str, checkpoint: str
) -> None:
    """CDC → SCD2: maintain a type-2 user dimension ("current
    event_type" per user, with full version history) from the event
    stream, one ``io.merge.scd2_merge`` per micro-batch.

    Per batch the feed is compacted to the LATEST row per key (standard
    CDC batch compaction — intermediate states within one batch never
    become versions), then merged. Replay safety needs no batch-id
    guard: ``scd2_merge`` is idempotent by construction (an identical
    delta closes nothing and inserts nothing), so at-least-once
    delivery of a batch is harmless — asserted by the replay test.

    Scale shape: each merge rewrites only the key-hash buckets present
    in the batch (dynamic partition overwrite); state lives in the
    table, not the stream — the streaming job itself is stateless.
    """
    ev = read_events_stream(spark, src_dir, max_files_per_trigger=1)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        latest = (
            batch_df.select(
                "user_id",
                "event_type",
                F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("ts_us"),
                "event_id",
            )
            .withColumn(
                "rn",
                F.row_number().over(
                    _W.partitionBy("user_id").orderBy(
                        F.col("ts_us").desc(), F.col("event_id").desc()
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .select("user_id", "event_type", "ts_us")
        )
        from bpaotu_spark.io.merge import scd2_merge

        scd2_merge(
            spark,
            table_path,
            latest,
            "user_id",
            ("event_type",),
            "ts_us",
        )

    q = (
        ev.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_snapshot_commits(
    spark: SparkSession,
    src_dir: str,
    table_path: str,
    checkpoint_path: str,
) -> None:
    """Stream micro-batches into the manifest-snapshot lake: every
    batch becomes one committed snapshot version, so downstream
    training runs can pin "the table as of batch N" while ingestion
    keeps appending (io/snapshots.py's time-travel contract on a live
    stream).

    Idempotency: foreachBatch is at-least-once, so a replayed batch
    must not double-commit. The commit records its batch_id inside the
    manifest's data-file path prefix (``data/batch-{id}-*``); the
    closure skips the commit if any live manifest already references
    that batch's prefix — the same replay guard pattern as
    incremental_minhash_dedup, but at file granularity.
    """
    import json as _json
    import os as _os

    from bpaotu_spark.io.snapshots import commit_snapshot, list_versions

    ev = read_events_stream(spark, src_dir)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        versions = list_versions(table_path)
        if versions:
            with open(
                _os.path.join(table_path, f"manifest-v{versions[-1]}.json")
            ) as fh:
                files = _json.load(fh)["files"]
            if any(f"/batch-{batch_id}-" in f for f in files):
                return  # replay of an already-committed batch
        agg = batch_df.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )
        # route the data files under a batch-scoped prefix so the
        # replay guard can recognize them in the manifest
        import uuid as _uuid

        commit_id = f"batch-{batch_id}-{_uuid.uuid4().hex[:8]}"
        data_dir = _os.path.join(table_path, "data", commit_id)
        agg.write.mode("errorifexists").parquet(data_dir)
        new_files = [
            _os.path.join(data_dir, f)
            for f in sorted(_os.listdir(data_dir))
            if f.endswith(".parquet")
        ]
        prev = []
        versions = list_versions(table_path)
        if versions:
            with open(
                _os.path.join(table_path, f"manifest-v{versions[-1]}.json")
            ) as fh:
                prev = _json.load(fh)["files"]
        version = (versions[-1] + 1) if versions else 1
        tmp = _os.path.join(
            table_path, f"manifest-v{version}.json.tmp-{commit_id}"
        )
        with open(tmp, "w") as fh:
            _json.dump(
                {"version": version, "files": prev + new_files,
                 "added": len(new_files)},
                fh,
            )
        _os.rename(
            tmp, _os.path.join(table_path, f"manifest-v{version}.json")
        )

    q = (
        ev.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def burst_alarm_stream(
    events: DataFrame,
    watermark: str = "12 hours",
    window: str = "6 hours",
    slide: str = "1 hour",
    threshold: int = 5,
) -> DataFrame:
    """Streaming twin of the batch ``rapid_fire_users`` audit: per-USER
    sliding-window event counts, emitting only windows at or above the
    burst threshold (the rate-limit alarm as a live stream instead of a
    retrospective scan).

    The lag(ts, k) formulation the batch op uses needs total per-user
    ordering — unbounded state on a stream — so the streaming form
    trades exact span detection for watermark-bounded sliding windows.
    Coverage guarantee: any ≥threshold burst whose span is at most
    ``window - slide`` (5 h with the defaults) is fully contained in at
    least one slid window and WILL alarm. Longer spans (5-6 h starting
    off the hour) can straddle every window and be split below
    threshold — callers needing all spans ≤ S covered must pick
    window ≥ S + slide (e.g. a 7 h window, or a 30 m slide, for 6 h
    spans). State is bounded by watermark × (window/slide) per active
    user.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide).alias("w"),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") >= threshold)
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "user_id",
            "n_events",
        )
    )


def debounce_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    bucket: str = "1 minute",
) -> DataFrame:
    """Streaming debounce: keep one event per (user_id, event_type,
    time bucket) — the live twin of the batch ``event_debounce_dedup``
    census's filter stage.

    Semantics note (vs the batch lag rule): the batch op drops an
    event when the GAP to the previous event is <= 60 s; a stream
    cannot look back at an unbounded per-key history, so the streaming
    form quantizes time into fixed buckets and keeps the first arrival
    per (key, bucket) via dropDuplicatesWithinWatermark — bounded state
    (watermark horizon × active keys), at-least-once-replay safe. Two
    events 59 s apart across a bucket edge both survive here but not
    in the batch rule; two events in one bucket are debounced by both.
    The bucket width is the knob: it equals the batch rule's threshold.
    """
    return (
        events.withWatermark("ts", watermark)
        .withColumn(
            # integer div, not floor(x / y): double division is exact
            # for today's micros magnitudes but breaks the repo's
            # integer-exact idiom and silently degrades if the bucket
            # width ever changes
            "debounce_bucket",
            F.expr("unix_micros(ts) div 60000000"),
        )
        .dropDuplicatesWithinWatermark(
            ["user_id", "event_type", "debounce_bucket"]
        )
        .drop("debounce_bucket")
    )


RECORD_DAYS_SCHEMA = (
    "event_type string, day date, n_events bigint, prev_max bigint"
)
_RECORD_STATE_SCHEMA = "max_count bigint, last_day date"


def record_days_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``events_record_days`` operator:
    emit (type, day) cells whose daily count sets a new all-time
    record for that event type.

    Record detection only needs the PAST (a running max), never
    lead() — which is exactly what makes it streamable where strict
    local-maxima peak detection (events_peak_detection_daily) is not.
    State per event type is one (max_count, last_day) cell; each
    micro-batch folds its days in calendar order on top of the carried
    max. Day ordering ACROSS micro-batches follows event-time arrival
    (the production deployment pairs this with a watermark-complete
    daily upstream agg so a day only reaches this operator once it is
    closed; on the drained availableNow test source every day arrives
    in the single batch and is sorted here).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        max_count, last_day = (
            state.get if state.exists else (0, None)
        )
        counts: dict = {}
        for pdf in pdfs:
            days = pdf["ts"].dt.date
            for day, n in days.value_counts().items():
                counts[day] = counts.get(day, 0) + int(n)
        out_day, out_n, out_prev = [], [], []
        for day in sorted(counts):
            n = counts[day]
            if n > max_count:
                out_day.append(day)
                out_n.append(n)
                out_prev.append(max_count)
                max_count = n
            last_day = day
        state.update((max_count, last_day))
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(out_day),
                "day": out_day,
                "n_events": out_n,
                "prev_max": out_prev,
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=RECORD_DAYS_SCHEMA,
        stateStructType=_RECORD_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def purchases_after_signup_outer_stream(
    events: DataFrame, range_s: int = 3600, watermark: str = "2 hours"
) -> DataFrame:
    """LEFT OUTER watermarked stream-stream interval join: every
    signup, paired with each purchase in (ts_s, ts_s + range_s] — or
    one null-padded row once the watermark proves no purchase can
    still arrive.

    This is the streaming shape the inner join cannot express: a
    non-converting signup produces NO inner row ever, so conversion
    rate needs the outer arm. Correct outer emission REQUIRES the
    watermark + both-sided time bound — Spark holds the unmatched
    signup in state until watermark > ts_s + range_s, then emits it
    with nulls; without the bounds the join would be unable to ever
    declare a signup unmatched. The batch twin is
    events_signup_conversion_outer (driver hash row); the pytest
    diffs this stream's null rows against the twin's converted=false
    signups for every signup old enough to have expired.
    """
    s = (
        events.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("ts_s"),
        )
        .withWatermark("ts_s", watermark)
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("ts_p"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .withWatermark("ts_p", watermark)
    )
    return s.join(
        p,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("ts_p") > F.col("ts_s"))
        & (F.col("ts_p") <= F.col("ts_s") + F.expr(f"INTERVAL {range_s} SECONDS")),
        "leftOuter",
    ).select(
        "signup_id", F.col("s_user").alias("user_id"), "ts_s", "ts_p", "cents"
    )


_SESSION_FINAL_SCHEMA = (
    "user_id bigint, session_start_ms bigint, session_end_ms bigint, "
    "n_events bigint, session_value double"
)
_SESSION_FINAL_STATE = (
    "start_ms bigint, last_ms bigint, n bigint, total double"
)


def session_finalizer_stream(
    events: DataFrame, gap_min: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Sessionization as an EVENT-TIME-TIMEOUT state machine
    (applyInPandasWithState + GroupStateTimeout.EventTimeTimeout) —
    the arbitrary-stateful twin of ``sessionize_stream``'s built-in
    session_window, for the cases the built-in can't express (emit
    extra per-session payloads, per-key custom gap rules, session
    splitting).

    Per user, state holds the one OPEN session (start, last event,
    count, value sum). Sessions that a successor event closes within
    a batch emit immediately; the trailing open session arms an
    event-time timeout at last_ms + gap, so the watermark — not a
    processing-time guess — proves no in-gap event can still arrive
    before the session is finalized and the state removed. State is
    therefore O(users with an open session), never O(history).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_min * 60 * 1000

    def _ms(ts: "pd.Series") -> "pd.Series":
        if getattr(ts.dtype, "tz", None) is not None:
            ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
        return (ts - pd.Timestamp("1970-01-01")) // pd.Timedelta(
            milliseconds=1
        )

    def update(key, pdfs, state: GroupState):
        closed = []

        def _close(sess):
            start_ms, last_ms, n, total = sess
            closed.append(
                (int(key[0]), int(start_ms), int(last_ms), int(n),
                 round(float(total), 4))
            )

        if state.hasTimedOut:
            _close(state.get)
            state.remove()
        else:
            rows = []
            for pdf in pdfs:
                ms = _ms(pdf["ts"])
                rows.extend(zip(ms.tolist(), pdf["value"].tolist()))
            rows.sort()
            open_s = list(state.get) if state.exists else None
            for ts_ms, v in rows:
                if open_s is None:
                    open_s = [ts_ms, ts_ms, 1, float(v)]
                elif ts_ms - open_s[1] < gap_ms:
                    # strict <: a silence of exactly gap_ms starts a NEW
                    # session, matching session_window's [start, last+gap)
                    open_s[1] = ts_ms
                    open_s[2] += 1
                    open_s[3] += float(v)
                else:
                    _close(open_s)
                    open_s = [ts_ms, ts_ms, 1, float(v)]
            if open_s is not None:
                state.update(tuple(open_s))
                # must exceed the current watermark or Spark rejects it
                state.setTimeoutTimestamp(
                    max(
                        open_s[1] + gap_ms + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id",
                "session_start_ms",
                "session_end_ms",
                "n_events",
                "session_value",
            ],
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_SESSION_FINAL_SCHEMA,
            stateStructType=_SESSION_FINAL_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
