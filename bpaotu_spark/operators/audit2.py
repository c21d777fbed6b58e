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
from bpaotu_spark.functions.textops import TOKENIZE_SQL
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


# ---------------------------------------------------------------------------
# kmv_set_intersection — theta-sketch-style SET ALGEBRA on KMV
# sketches (Dasgupta et al., "Theta Sketch Framework"): estimate the
# distinct-token INTERSECTION between every pair of sources from two
# K=64 KMV sketches, and score the estimate against the exact
# intersection. approx_distinct_kmv proves the per-set estimator;
# this proves the algebra a dedup/overlap deployment actually uses —
# |A ∩ B| from sketches alone: θ = min(θ_A, θ_B), count the common
# hashes below θ, scale by MAXH/θ. Deterministic md5 grid, so the
# whole sketch pipeline is oracle-checkable, estimate AND error.
#
# Scale shape: one tokenize scan → distinct (source, token) →
# per-source top-K window (the sketch — K rows per source); the
# pairwise stage touches only sketches (|sources|·K rows, broadcast),
# while the exact intersection is a vocabulary-bounded token
# self-join, the same class as the contamination semi-joins.
# ---------------------------------------------------------------------------

_TSK_K = 64
_TSK_MAXH = 1 << 60


def _tsk_hash_sql(col: str) -> str:
    return " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({col}), {i + 1}, 1)) - 1)"
        f" * {16 ** (14 - i)}"
        for i in range(15)
    )


@register(
    "kmv_set_intersection",
    oracle=f"""
WITH t AS (
  SELECT DISTINCT source, unnest({TOKENIZE_SQL}) AS tok FROM documents
),
h AS (
  SELECT source, tok, CAST({_tsk_hash_sql("tok")} AS BIGINT) AS hv FROM t
),
rk AS (
  SELECT source, hv,
    row_number() OVER (PARTITION BY source ORDER BY hv ASC) AS rn
  FROM h
),
theta AS (
  SELECT source,
    CAST(coalesce(max(CASE WHEN rn = {_TSK_K} THEN hv END),
                  {_TSK_MAXH}) AS BIGINT) AS th
  FROM rk GROUP BY source
),
sk AS (SELECT source, hv FROM rk WHERE rn <= {_TSK_K}),
common AS (
  SELECT a.source AS source_a, b.source AS source_b,
    ta.th AS th_a, tb.th AS th_b,
    CAST(count(*) FILTER (WHERE a.hv < least(ta.th, tb.th)) AS BIGINT)
      AS n_common_below
  FROM sk a JOIN sk b ON a.hv = b.hv AND a.source < b.source
  JOIN theta ta ON ta.source = a.source
  JOIN theta tb ON tb.source = b.source
  GROUP BY a.source, b.source, ta.th, tb.th
),
exact AS (
  SELECT x.source AS source_a, y.source AS source_b,
    CAST(count(*) AS BIGINT) AS n_exact
  FROM t x JOIN t y ON x.tok = y.tok AND x.source < y.source
  GROUP BY x.source, y.source
)
SELECT e.source_a, e.source_b, e.n_exact,
  CAST(coalesce(c.n_common_below * CAST({_TSK_MAXH} AS HUGEINT)
       // least(c.th_a, c.th_b), 0) AS BIGINT) AS kmv_estimate,
  CAST(abs(coalesce(c.n_common_below * CAST({_TSK_MAXH} AS HUGEINT)
       // least(c.th_a, c.th_b), 0) - e.n_exact) * 1000000
       // e.n_exact AS BIGINT) AS err_ppm
FROM exact e LEFT JOIN common c
  ON c.source_a = e.source_a AND c.source_b = e.source_b
ORDER BY e.source_a, e.source_b
""",
)
def kmv_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch intersection between source token sets:
    (source_a, source_b, n_exact, kmv_estimate, err_ppm) — the
    estimate uses ONLY the two K=64 sketches."""
    from pyspark.sql import Window

    from bpaotu_spark.functions.textops import tokenize

    docs = load_table(spark, sf_dir, "documents")
    t = (
        docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .distinct()
        .localCheckpoint()
    )
    h = t.select(
        "source",
        "tok",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("hv"),
    )
    w = Window.partitionBy("source").orderBy(F.col("hv").asc())
    rk = h.withColumn("rn", F.row_number().over(w))
    theta = rk.groupBy("source").agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == _TSK_K, F.col("hv"))),
            F.lit(_TSK_MAXH),
        )
        .cast("bigint")
        .alias("th")
    )
    sk = rk.filter(F.col("rn") <= _TSK_K).select("source", "hv")
    a = sk.select(F.col("source").alias("source_a"), "hv")
    b = sk.select(F.col("source").alias("source_b"), F.col("hv").alias("hvb"))
    ta = theta.select(F.col("source").alias("source_a"), F.col("th").alias("th_a"))
    tb = theta.select(F.col("source").alias("source_b"), F.col("th").alias("th_b"))
    common = (
        a.join(
            F.broadcast(b),
            (F.col("hv") == F.col("hvb"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .groupBy("source_a", "source_b", "th_a", "th_b")
        .agg(
            F.count(
                F.when(F.col("hv") < F.least("th_a", "th_b"), F.lit(1))
            )
            .cast("bigint")
            .alias("n_common_below")
        )
    )
    x = t.select(F.col("source").alias("source_a"), "tok")
    y = t.select(F.col("source").alias("source_b"), F.col("tok").alias("tokb"))
    exact = (
        x.join(
            y,
            (F.col("tok") == F.col("tokb"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )
    # LEFT join: a source pair with real token overlap but zero shared
    # sketch hashes must still appear — with kmv_estimate 0 and
    # err_ppm 1e6 — instead of vanishing exactly where the K=64
    # sketch fails (r11 ADVICE item 5).
    est = (
        f"CAST(coalesce(n_common_below * CAST({_TSK_MAXH} AS DECIMAL(38,0))"
        f" DIV least(th_a, th_b), 0) AS BIGINT)"
    )
    return (
        exact.join(F.broadcast(common), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "n_exact",
            F.expr(est).alias("kmv_estimate"),
            F.expr(
                f"CAST(abs({est} - n_exact) * 1000000 DIV n_exact AS BIGINT)"
            ).alias("err_ppm"),
        )
        .orderBy("source_a", "source_b")
    )
