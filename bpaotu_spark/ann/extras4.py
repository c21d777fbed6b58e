"""Round-12 ANN/cluster-quality additions.

* ``label_davies_bouldin`` — the Davies–Bouldin cluster-quality index
  (Davies & Bouldin 1979) over the labeled embeddings, in its squared
  form (s² and d² instead of their roots — a recognized surrogate
  that orders clusterings identically when ratios are compared within
  the same scale): R_ij = (s_i² + s_j²)/d²_ij, per-label worst
  partner R_max, DB = mean over labels of R_max. The companion to
  ``label_silhouette_centroid`` (per-point view) — DB reads only the
  K centroids and scatters, the form that stays cheap at any corpus
  size.

  Exactness: embeddings quantize to the milli grid (floor(x·1000),
  the ann_range_query convention); with integer member counts the
  whole statistic is rational —

      s_i²  = A_i / n_i³          A_i  = Σ_m Σ_d (q·n_i − S_id)²
      d²_ij = B_ij / (n_i·n_j)²   B_ij = Σ_d (S_id·n_j − S_jd·n_i)²

  each floored ONCE to micro units (A·1e6 // n³, B·1e6 // (n_i n_j)²)
  so every Spark DIV result stays within BIGINT through ~sf100, then
  R_ppm = (s2q_i + s2q_j)·1e6 // (d2q_ij + 1) — identical truncating
  arithmetic in both engines.

Scale shape: one posexplode → (label, dim) groupBy for the centroid
sums (map-side combined), one keyed join back for the scatter, a
K×K×D pair frame over the bounded label dimension, 1 row per label.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register

_DBQ = 1000  # milli quantization (ann_range_query_count convention)


@register(
    "label_davies_bouldin",
    oracle=f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
xq AS (
  SELECT vec_id, label, generate_subscripts(v, 1) AS dim,
    CAST(floor(unnest(v) * {_DBQ}) AS BIGINT) AS q
  FROM e
),
nmembers AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY label
),
sums AS (
  SELECT label, dim, CAST(sum(q) AS BIGINT) AS s
  FROM xq GROUP BY label, dim
),
scatter AS (
  SELECT xq.label,
    CAST(sum(CAST(q * n - s AS HUGEINT) * (q * n - s)) AS HUGEINT) AS a
  FROM xq
  JOIN nmembers USING (label)
  JOIN sums ON sums.label = xq.label AND sums.dim = xq.dim
  GROUP BY xq.label
),
s2 AS (
  SELECT scatter.label, n,
    CAST(a * 1000000 // (CAST(n AS HUGEINT) * n * n) AS BIGINT) AS s2q
  FROM scatter JOIN nmembers USING (label)
),
bpair AS (
  SELECT si.label AS label_a, sj.label AS label_b,
    CAST(sum(CAST(si.s * nj.n - sj.s * ni.n AS HUGEINT)
             * (si.s * nj.n - sj.s * ni.n)) AS HUGEINT) AS b
  FROM sums si
  JOIN sums sj ON si.dim = sj.dim AND si.label != sj.label
  JOIN nmembers ni ON ni.label = si.label
  JOIN nmembers nj ON nj.label = sj.label
  GROUP BY si.label, sj.label
),
r AS (
  SELECT label_a, label_b,
    CAST((CAST(sa.s2q AS HUGEINT) + sb.s2q) * 1000000
      // (b * 1000000 // (CAST(sa.n AS HUGEINT) * sb.n
                          * sa.n * sb.n) + 1) AS BIGINT) AS r_ppm
  FROM bpair
  JOIN s2 sa ON sa.label = label_a
  JOIN s2 sb ON sb.label = label_b
),
best AS (
  SELECT label_a, label_b, r_ppm FROM (
    SELECT label_a, label_b, r_ppm,
      row_number() OVER (PARTITION BY label_a
                         ORDER BY r_ppm DESC, label_b ASC) AS rn
    FROM r
  ) WHERE rn = 1
),
db AS (
  SELECT CAST(sum(r_ppm) // count(*) AS BIGINT) AS db_index_ppm FROM best
)
SELECT CAST(best.label_a AS BIGINT) AS label, s2.n AS n_members,
  s2.s2q AS s2_micro, CAST(best.label_b AS BIGINT) AS nearest_label,
  best.r_ppm AS r_max_ppm, db.db_index_ppm
FROM best JOIN s2 ON s2.label = best.label_a CROSS JOIN db
ORDER BY label
""",
)
def label_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies–Bouldin (squared form) over the labeled embeddings:
    (label, n_members, s2_micro, nearest_label, r_max_ppm,
    db_index_ppm) — worst-partner separation per label plus the
    corpus-level index."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    xq = e.select(
        "vec_id",
        "label",
        F.posexplode("v").alias("pos", "val"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.floor(F.col("val") * _DBQ).cast("bigint").alias("q"),
    )
    nmembers = e.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    sums = xq.groupBy("label", "dim").agg(
        F.sum("q").cast("bigint").alias("s")
    )
    scatter = (
        xq.join(F.broadcast(nmembers), "label")
        .join(sums, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.sum(
                F.expr("CAST(q * n - s AS DECIMAL(38,0)) * (q * n - s)")
            ).alias("a")
        )
    )
    s2 = scatter.join(F.broadcast(nmembers), "label").select(
        "label",
        "n",
        F.expr(
            "CAST(a * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * n * n)"
            " AS BIGINT)"
        ).alias("s2q"),
    )
    si = sums.select(
        F.col("label").alias("label_a"), "dim", F.col("s").alias("s_a")
    )
    sj = sums.select(
        F.col("label").alias("label_b"),
        F.col("dim").alias("dim_b"),
        F.col("s").alias("s_b"),
    )
    ni = nmembers.select(
        F.col("label").alias("label_a"), F.col("n").alias("n_a")
    )
    nj = nmembers.select(
        F.col("label").alias("label_b"), F.col("n").alias("n_b")
    )
    bpair = (
        si.join(
            sj,
            (F.col("dim") == F.col("dim_b"))
            & (F.col("label_a") != F.col("label_b")),
        )
        .join(F.broadcast(ni), "label_a")
        .join(F.broadcast(nj), "label_b")
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(
                F.expr(
                    "CAST(s_a * n_b - s_b * n_a AS DECIMAL(38,0))"
                    " * (s_a * n_b - s_b * n_a)"
                )
            ).alias("b"),
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
        )
    )
    sa = s2.select(F.col("label").alias("label_a"), F.col("s2q").alias("s2a"))
    sb = s2.select(F.col("label").alias("label_b"), F.col("s2q").alias("s2b"))
    r = (
        bpair.join(F.broadcast(sa), "label_a")
        .join(F.broadcast(sb), "label_b")
        .select(
            "label_a",
            "label_b",
            F.expr(
                "CAST((CAST(s2a AS DECIMAL(38,0)) + s2b) * 1000000"
                " DIV (b * 1000000 DIV (CAST(n_a AS DECIMAL(38,0)) * n_b"
                " * n_a * n_b) + 1) AS BIGINT)"
            ).alias("r_ppm"),
        )
    )
    wb = Window.partitionBy("label_a").orderBy(
        F.col("r_ppm").desc(), F.col("label_b").asc()
    )
    best = (
        r.withColumn("rn", F.row_number().over(wb))
        .filter("rn = 1")
        .select("label_a", "label_b", "r_ppm")
        .localCheckpoint()  # two consumers: the db mean and the output
    )
    db = best.agg(
        F.expr("CAST(sum(r_ppm) DIV count(*) AS BIGINT)").alias(
            "db_index_ppm"
        )
    )
    return (
        best.join(s2, best.label_a == s2.label)
        .crossJoin(F.broadcast(db))
        .select(
            F.col("label_a").cast("bigint").alias("label"),
            F.col("n").alias("n_members"),
            F.col("s2q").alias("s2_micro"),
            F.col("label_b").cast("bigint").alias("nearest_label"),
            F.col("r_ppm").alias("r_max_ppm"),
            "db_index_ppm",
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# label_calinski_harabasz — the Calinski–Harabasz variance-ratio
# criterion (Calinski & Harabasz 1974) over the labeled embeddings:
# CH = (B/(k−1)) / (W/(n−k)) with B the between-cluster and W the
# within-cluster sum of squares. Completes the classic cluster-index
# trio (silhouette r9, Davies–Bouldin above) — CH is the one that
# grows with quality, the default "how many clusters" criterion.
#
# Exactness: on the milli grid, per label
#   W_i = A_i / n_i²                (A_i as in label_davies_bouldin)
#   B_i = Σ_d (S_id·n − T_d·n_i)² / (n_i·n²)
# each floored ONCE to milli; CH_milli = B·(n−k)·1000 // ((k−1)·W+1).
# Every Spark DIV result is within BIGINT through ~sf100.
#
# Scale shape: the same (label, dim) centroid sums as the DB index,
# plus one 1-row global-centroid frame; 1-row output.
# ---------------------------------------------------------------------------


@register(
    "label_calinski_harabasz",
    oracle=f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
xq AS (
  SELECT vec_id, label, generate_subscripts(v, 1) AS dim,
    CAST(floor(unnest(v) * {_DBQ}) AS BIGINT) AS q
  FROM e
),
nmembers AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_i FROM e GROUP BY label
),
gstats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(count(DISTINCT label) AS BIGINT) AS k
  FROM e
),
sums AS (
  SELECT label, dim, CAST(sum(q) AS BIGINT) AS s
  FROM xq GROUP BY label, dim
),
tdims AS (
  SELECT dim, CAST(sum(s) AS BIGINT) AS t FROM sums GROUP BY dim
),
w_i AS (
  SELECT xq.label,
    CAST(sum(CAST(q * n_i - s AS HUGEINT) * (q * n_i - s)) * 1000
      // (CAST(max(n_i) AS HUGEINT) * max(n_i)) AS HUGEINT) AS w_milli
  FROM xq
  JOIN nmembers USING (label)
  JOIN sums ON sums.label = xq.label AND sums.dim = xq.dim
  GROUP BY xq.label
),
b_i AS (
  SELECT sums.label,
    CAST(sum(CAST(s * n - t * n_i AS HUGEINT) * (s * n - t * n_i)) * 1000
      // (CAST(max(n_i) AS HUGEINT) * max(n) * max(n)) AS HUGEINT)
      AS b_milli
  FROM sums
  JOIN nmembers USING (label)
  JOIN tdims ON tdims.dim = sums.dim
  CROSS JOIN gstats
  GROUP BY sums.label
),
fin AS (
  SELECT (SELECT n FROM gstats) AS n, (SELECT k FROM gstats) AS k,
    (SELECT CAST(sum(b_milli) AS HUGEINT) FROM b_i) AS b_milli,
    (SELECT CAST(sum(w_milli) AS HUGEINT) FROM w_i) AS w_milli
)
SELECT CAST(n AS BIGINT) AS n_vectors, CAST(k AS BIGINT) AS k_labels,
  CAST(b_milli AS BIGINT) AS b_milli, CAST(w_milli AS BIGINT) AS w_milli,
  CAST(b_milli * (n - k) * 1000 // ((k - 1) * w_milli + 1) AS BIGINT)
    AS ch_milli
FROM fin
""",
)
def label_calinski_harabasz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calinski–Harabasz variance ratio over the labeled embeddings:
    (n_vectors, k_labels, b_milli, w_milli, ch_milli)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    xq = e.select(
        "label", F.posexplode("v").alias("pos", "val")
    ).select(
        "label",
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.floor(F.col("val") * _DBQ).cast("bigint").alias("q"),
    )
    nmembers = e.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i")
    )
    glob = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("label").cast("bigint").alias("k"),
    )
    sums = xq.groupBy("label", "dim").agg(
        F.sum("q").cast("bigint").alias("s")
    )
    tglob = sums.groupBy("dim").agg(F.sum("s").cast("bigint").alias("t"))
    w_i = (
        xq.join(F.broadcast(nmembers), "label")
        .join(sums, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.expr(
                "CAST(sum(CAST(q * n_i - s AS DECIMAL(38,0))"
                " * (q * n_i - s)) * 1000"
                " DIV (CAST(max(n_i) AS DECIMAL(38,0)) * max(n_i))"
                " AS DECIMAL(38,0))"
            ).alias("w_milli")
        )
    )
    b_i = (
        sums.join(F.broadcast(nmembers), "label")
        .join(F.broadcast(tglob), "dim")
        .crossJoin(F.broadcast(glob))
        .groupBy("label")
        .agg(
            F.expr(
                "CAST(sum(CAST(s * n - t * n_i AS DECIMAL(38,0))"
                " * (s * n - t * n_i)) * 1000"
                " DIV (CAST(max(n_i) AS DECIMAL(38,0)) * max(n) * max(n))"
                " AS DECIMAL(38,0))"
            ).alias("b_milli")
        )
    )
    btot = b_i.agg(F.sum("b_milli").alias("b_milli"))
    wtot = w_i.agg(F.sum("w_milli").alias("w_milli"))
    return (
        glob.crossJoin(F.broadcast(btot))
        .crossJoin(F.broadcast(wtot))
        .select(
            F.col("n").alias("n_vectors"),
            F.col("k").alias("k_labels"),
            F.col("b_milli").cast("bigint").alias("b_milli"),
            F.col("w_milli").cast("bigint").alias("w_milli"),
            F.expr(
                "CAST(b_milli * (n - k) * 1000"
                " DIV ((k - 1) * w_milli + 1) AS BIGINT)"
            ).alias("ch_milli"),
        )
    )
