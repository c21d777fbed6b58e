"""Round-9 engine-audit operators: shuffle-partition sizing and a
Count-Min width sweep.

Reference parity: the reference importer (public path
``bpaotu/otu/importer.py``) sizes its bulk loads by row counts; these
extend the engine's audit family (join_skew_audit,
partition_balance_audit, bloom_sizing_advisor — SURVEY.md §2) with the
two remaining capacity-planning tables.

* ``shuffle_partition_advisor`` — per-fact-table exact byte census
  (fixed column widths + Σ length(varchar) + element-counted arrays)
  and the shuffle-partition counts it implies at 128 MB / 32 MB
  targets. This is the number `spark.sql.shuffle.partitions` should
  be set to BEFORE the first heavy join on each table — the advisor
  the session factory's static default can't be.
* ``cms_width_error_sweep`` — Count-Min Sketch estimate-vs-exact
  error at widths 64/256/1024 (depth 4, the heavy_hitters_cms hash
  family): total/max/mean overcount per width — the width-selection
  curve read before deploying a sketch (error ∝ N/width; the sweep
  verifies the constant on THIS key distribution).

Determinism: byte widths are schema constants; varchar/array sizes are
exact sums; CMS hashes are md5-derived 32-bit integers identical in
both engines; every estimate and overcount is an exact BIGINT.

Scale shape: the advisor is one map-combined aggregate per table scan
(no shuffle beyond the 1-row agg); the CMS build is a map-side-combined
groupBy hard-capped at depth·width cells per width (constant at any
fact scale — broadcasts to the probe), and the probe joins the
per-user exact counts against the broadcast cells.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bpaotu_spark.catalog import load_table
from bpaotu_spark.operators.events import (
    _md5_int32_spark,
    _md5_int32_sql,
)
from bpaotu_spark.registry import register

# ---------------------------------------------------------------------------
# shuffle_partition_advisor
# ---------------------------------------------------------------------------

# per-table exact row-byte expressions: 8 bytes per int64/double/
# timestamp, 4 per int32/float, + exact varchar lengths, + 4·len per
# float array. In-memory columnar estimate — the quantity shuffle
# sizing actually cares about (not parquet-encoded bytes).
_TABLE_BYTES = {
    "lineitem": "3*8 + 4 + 4*8 + length(l_returnflag)"
    " + length(l_linestatus) + 8",
    "orders": "8 + 8 + length(o_orderstatus) + 8 + 8"
    " + length(o_orderpriority)",
    "events": "8 + 8 + 8 + length(event_type) + 8 + length(props)",
    "documents": "8 + length(text) + length(lang) + length(source) + 8",
    "embeddings": "8 + 4 + 4 * len(embedding)",
}
# Spark twin: len() → size() on arrays
_TABLE_BYTES_SPARK = {
    k: v.replace("len(embedding)", "size(embedding)")
    for k, v in _TABLE_BYTES.items()
}

_MB128 = 128 * 1024 * 1024
_MB32 = 32 * 1024 * 1024


def _advisor_branch_sql(table: str) -> str:
    return f"""
  SELECT '{table}' AS table_name,
    CAST(count(*) AS BIGINT) AS n_rows,
    CAST(sum({_TABLE_BYTES[table]}) AS BIGINT) AS est_bytes,
    CAST(greatest((sum({_TABLE_BYTES[table]}) + {_MB128} - 1)
      // {_MB128}, 1) AS BIGINT) AS partitions_128mb,
    CAST(greatest((sum({_TABLE_BYTES[table]}) + {_MB32} - 1)
      // {_MB32}, 1) AS BIGINT) AS partitions_32mb
  FROM {table}
""".strip()


@register(
    "shuffle_partition_advisor",
    oracle="WITH u AS (\n"
    + "\nUNION ALL\n".join(
        _advisor_branch_sql(t) for t in sorted(_TABLE_BYTES)
    )
    + "\n)\nSELECT * FROM u ORDER BY table_name",
)
def shuffle_partition_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact in-memory byte census per fact table + the shuffle
    partition counts it implies at 128 MB / 32 MB targets."""
    out = None
    for t in sorted(_TABLE_BYTES):
        df = load_table(spark, sf_dir, t)
        expr = _TABLE_BYTES_SPARK[t]
        branch = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.expr(expr)).cast("bigint").alias("est_bytes"),
        ).select(
            F.lit(t).alias("table_name"),
            "n_rows",
            "est_bytes",
            F.expr(
                f"CAST(greatest((est_bytes + {_MB128} - 1)"
                f" div {_MB128}, 1) AS BIGINT)"
            ).alias("partitions_128mb"),
            F.expr(
                f"CAST(greatest((est_bytes + {_MB32} - 1)"
                f" div {_MB32}, 1) AS BIGINT)"
            ).alias("partitions_32mb"),
        )
        out = branch if out is None else out.unionByName(branch)
    return out.orderBy("table_name")


# ---------------------------------------------------------------------------
# cms_width_error_sweep
# ---------------------------------------------------------------------------

_SWEEP_WIDTHS = (64, 256, 1024)
_SWEEP_DEPTH = 4

_SEED_SQL = "CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)"


def _sweep_cte(width: int) -> str:
    seed = _md5_int32_sql(_SEED_SQL)
    return f"""
cells{width} AS (
  SELECT j, {seed} % {width} AS bucket, CAST(count(*) AS BIGINT) AS cell
  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
  GROUP BY 1, 2
),
probe{width} AS (
  SELECT user_id, exact_count, j, {seed} % {width} AS bucket
  FROM exact CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
),
est{width} AS (
  SELECT user_id, exact_count, CAST(min(cell) AS BIGINT) AS cms_estimate
  FROM probe{width} JOIN cells{width} USING (j, bucket)
  GROUP BY user_id, exact_count
),
sum{width} AS (
  SELECT CAST({width} AS BIGINT) AS width,
    CAST(count(*) AS BIGINT) AS n_keys,
    CAST(sum(cms_estimate - exact_count) AS BIGINT) AS total_overcount,
    CAST(max(cms_estimate - exact_count) AS BIGINT) AS max_overcount,
    CAST(sum(cms_estimate - exact_count) * 1000 // count(*) AS BIGINT)
      AS mean_overcount_milli
  FROM est{width}
)""".strip()


@register(
    "cms_width_error_sweep",
    oracle="WITH exact AS (\n"
    "  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_count\n"
    "  FROM events GROUP BY user_id\n),\n"
    + ",\n".join(_sweep_cte(w) for w in _SWEEP_WIDTHS)
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT * FROM sum{w}" for w in _SWEEP_WIDTHS
    )
    + "\nORDER BY width",
)
def cms_width_error_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS overcount vs exact per width 64/256/1024 (depth 4) on
    per-user event counts — the width-selection curve."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    depth = spark.range(_SWEEP_DEPTH).select(F.col("id").alias("j"))
    seed = F.concat_ws(
        ":", F.col("j").cast("string"), F.col("user_id").cast("string")
    )
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    )
    out = None
    for width in _SWEEP_WIDTHS:
        cells = (
            ev.crossJoin(F.broadcast(depth))
            .select("j", (_md5_int32_spark(seed) % width).alias("bucket"))
            .groupBy("j", "bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cell"))
        )
        probe = (
            exact.crossJoin(F.broadcast(depth))
            .select(
                "user_id",
                "exact_count",
                "j",
                (_md5_int32_spark(seed) % width).alias("bucket"),
            )
            .join(F.broadcast(cells), ["j", "bucket"])
            .groupBy("user_id", "exact_count")
            .agg(F.min("cell").cast("bigint").alias("cms_estimate"))
        )
        branch = probe.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.expr("cms_estimate - exact_count"))
            .cast("bigint")
            .alias("total_overcount"),
            F.max(F.expr("cms_estimate - exact_count"))
            .cast("bigint")
            .alias("max_overcount"),
        ).select(
            F.lit(width).cast("bigint").alias("width"),
            "n_keys",
            "total_overcount",
            "max_overcount",
            F.expr(
                "CAST(total_overcount * 1000 div n_keys AS BIGINT)"
            ).alias("mean_overcount_milli"),
        )
        out = branch if out is None else out.unionByName(branch)
    return out.orderBy("width")
