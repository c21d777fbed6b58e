"""Table-maintenance jobs: small-file compaction.

A 100 TB lake accretes small files from streaming micro-batches and
fine-grained task parallelism (the foreachBatch shard writer in
:mod:`bpaotu_spark.streaming.jobs` is exactly such a producer); scan
throughput then dies on per-file open/footer overhead and driver-side
listing. Compaction rewrites each partition's file set into
size-targeted files, preserving content exactly.

Reference analogue: the reference's PostgreSQL store has VACUUM; a
parquet lake's equivalent is this rewrite. Spark-first shape: the
rewrite is one distributed read + repartition + write per partition
directory — no driver-side file juggling, and partition directories
not selected are left untouched (same pruning contract as the
training-shard reader).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # lake-standard 128 MiB files


def plan_compaction(
    spark: SparkSession, path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> dict[str, tuple[int, int]]:
    """Inventory {partition_dir: (n_files, total_bytes)} under a parquet
    root, flagging directories worth rewriting (≥2 files below target).

    Listing happens driver-side over directory METADATA only (no data
    read) — the same cost every scan's split planning already pays.
    """
    out: dict[str, tuple[int, int]] = {}
    for root, _dirs, files in os.walk(path):
        pq = [f for f in files if f.endswith(".parquet")]
        if not pq:
            continue
        total = sum(os.path.getsize(os.path.join(root, f)) for f in pq)
        out[root] = (len(pq), total)
    return out


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 2,
) -> dict[str, int]:
    """Rewrite each leaf partition directory whose file count is ≥
    ``min_files`` into ``ceil(total_bytes / target_bytes)`` files.

    Content-preserving by construction: the rewrite is read → coalesce
    → write of the SAME rows (no shuffle — coalesce only merges input
    splits), then an atomic-as-possible swap of the directory. Returns
    {partition_dir: files_after} for the rewritten directories.

    Scale shape: each directory's rewrite is an independent Spark job
    over just that directory's bytes; a 1000-partition backlog runs as
    1000 bounded jobs (or, on a real lake, as one job per partition
    submitted from a scheduler) — never one global repartition of the
    whole table, which would shuffle 100 TB to fix file counts.
    """
    report: dict[str, int] = {}
    for part_dir, (n_files, total) in plan_compaction(spark, path).items():
        if n_files < min_files:
            continue
        n_out = max(1, -(-total // target_bytes))  # ceil
        if n_out >= n_files:
            continue  # already at/below target granularity
        df = spark.read.parquet(part_dir)
        tmp = part_dir + "._compact_tmp"
        # Swap order is loss-proof: (1) write the compacted set to a tmp
        # dir; (2) move it into the live dir under DOT-PREFIXED names
        # (hidden from parquet readers); (3) delete the old files;
        # (4) unhide the new ones. A crash at any point leaves at least
        # one complete copy of the data on disk — the old files survive
        # through step 2, the hidden new ones are complete from step 2
        # on (recover by stripping the '.' prefix). Readers concurrent
        # with steps 3-4 can still observe a partially-visible file set;
        # true reader-concurrent compaction needs a table format with
        # atomic commits (Iceberg/Delta) — this is the HDFS-style
        # best-effort for plain parquet directories.
        try:
            df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
            hidden: list[tuple[str, str]] = []
            for i, f in enumerate(sorted(os.listdir(tmp))):
                if f.endswith(".parquet"):
                    hid = os.path.join(part_dir, f".compacted-{i:05d}.parquet")
                    os.rename(os.path.join(tmp, f), hid)
                    hidden.append((hid, os.path.join(part_dir, f"compacted-{i:05d}.parquet")))
        finally:
            if os.path.isdir(tmp):
                for f in os.listdir(tmp):
                    fp = os.path.join(tmp, f)
                    if os.path.isfile(fp):
                        os.remove(fp)
                os.rmdir(tmp)
        for f in os.listdir(part_dir):
            if (f.endswith(".parquet") or f.startswith("_")) and not f.startswith("."):
                fp = os.path.join(part_dir, f)
                if os.path.isfile(fp):
                    os.remove(fp)
        for hid, live in hidden:
            os.rename(hid, live)
        # stale checksum files for the deleted originals would fail a
        # future same-name write under Hadoop's LocalFileSystem
        for f in os.listdir(part_dir):
            if f.startswith(".") and f.endswith(".crc"):
                os.remove(os.path.join(part_dir, f))
        report[part_dir] = len(hidden)
    return report
