"""Round-7 ANN/embedding-QA additions.

Three diagnostics a production vector pipeline runs next to the index
builders in ann/core.py:

* ``metric_agreement_topk`` — does the metric choice matter? Per-query
  overlap between the cosine top-k and the (unnormalized) Euclidean
  top-k. On L2-normalized embeddings the two rankings coincide; the
  overlap gap is exactly the norm-variance effect, the standard check
  before choosing an index metric (public: the faiss wiki's
  METRIC_INNER_PRODUCT vs METRIC_L2 guidance).
* ``vector_quantize_int4_error`` — per-dimension reconstruction-error
  audit for int4 (nibble) scalar quantization, the half-byte sibling
  of vector_quantize_int8 / quantization_error_histogram: 8× smaller
  than float32, and this op measures what that costs per dimension.
* ``knn_hubness_histogram`` — in-degree distribution of the kNN graph
  (Radovanović '10 hubness): a few "hub" vectors absorbing most
  neighbor slots is the classic high-dimensional failure mode; the
  histogram plus mean-norm-by-degree exposes it and its norm bias.

Determinism discipline: distances are rounded to 6 dp before ranking
with vec_id tie-breaks (the ann/core contract); per-row float errors
are micro-floored to integers BEFORE any aggregation; every ratio is
truncating div on nonnegative integers.

Scale shape: metric agreement broadcasts the bounded query set (two
scored passes, no self-join); int4 audit is posexplode → 64-group agg
→ broadcast stats join → one keyed agg; hubness reuses the salted
sign-LSH kNN edges (bucket-blocked, never all-pairs) and aggregates
on the degree axis (value-bounded ≤ corpus).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.ann.core import (
    _ORACLE_COMMON,
    _COS,
    N_QUERIES,
    TOP_K,
    dot,
)
from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import ORACLES, register

_D2 = (
    "list_dot_product(qv, qv) + list_dot_product(cv, cv)"
    " - 2 * list_dot_product(qv, cv)"
)


@register(
    "metric_agreement_topk",
    oracle=f"""
{_ORACLE_COMMON},
cs AS (
  SELECT query_id, cand_id,
    row_number() OVER (PARTITION BY query_id
      ORDER BY round({_COS}, 6) DESC, cand_id ASC) AS rnk
  FROM q JOIN c ON query_id != cand_id
  QUALIFY rnk <= {TOP_K}
),
es AS (
  SELECT query_id, cand_id,
    row_number() OVER (PARTITION BY query_id
      ORDER BY round({_D2}, 6) ASC, cand_id ASC) AS rnk
  FROM q JOIN c ON query_id != cand_id
  QUALIFY rnk <= {TOP_K}
)
SELECT cs.query_id,
  CAST(count(es.cand_id) AS BIGINT) AS overlap_k,
  CAST(count(es.cand_id) AS BIGINT) * 1000000 // {TOP_K} AS overlap_ppm
FROM cs LEFT JOIN es
  ON cs.query_id = es.query_id AND cs.cand_id = es.cand_id
GROUP BY cs.query_id
ORDER BY cs.query_id
""",
)
def metric_agreement_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-vs-Euclidean top-k overlap per query (ppm)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"))
    pairs = c.join(
        F.broadcast(q), F.col("query_id") != F.col("cand_id")
    ).select(
        "query_id",
        "cand_id",
        F.round(
            dot(F.col("qv"), F.col("cv"))
            / (
                F.sqrt(dot(F.col("qv"), F.col("qv")))
                * F.sqrt(dot(F.col("cv"), F.col("cv")))
            ),
            6,
        ).alias("cos_r"),
        F.round(
            dot(F.col("qv"), F.col("qv"))
            + dot(F.col("cv"), F.col("cv"))
            - 2 * dot(F.col("qv"), F.col("cv")),
            6,
        ).alias("d2_r"),
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("cand_id").asc()
    )
    we = Window.partitionBy("query_id").orderBy(
        F.col("d2_r").asc(), F.col("cand_id").asc()
    )
    cs = (
        pairs.withColumn("rnk", F.row_number().over(wc))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id")
    )
    es = (
        pairs.withColumn("rnk", F.row_number().over(we))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            F.col("query_id").alias("query_id_e"),
            F.col("cand_id").alias("cand_id_e"),
        )
    )
    return (
        cs.join(
            es,
            (F.col("query_id") == F.col("query_id_e"))
            & (F.col("cand_id") == F.col("cand_id_e")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("cand_id_e").cast("bigint").alias("overlap_k"),
            F.expr(
                f"CAST(count(cand_id_e) AS BIGINT) * 1000000 div {TOP_K}"
            ).alias("overlap_ppm"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# vector_quantize_int4_error — mid-rise int4 reconstruction audit:
# q = clamp(floor((val−mn)·14/(mx−mn)), 14) − 7 per the int8 layout,
# recon = mn + (q+7+0.5)·(mx−mn)/15; per-row |recon−val| micro-floored
# to an integer, then per-dim mean via exact div + distinct-code
# census. The int8 twin keeps 255 levels; this one keeps 15 — the
# audit quantifies the 8×-compression cost dimension by dimension.
# ---------------------------------------------------------------------------


@register(
    "vector_quantize_int4_error",
    oracle="""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
x AS (
  SELECT vec_id, generate_subscripts(v, 1) AS dim, unnest(v) AS val FROM e
),
s AS (
  SELECT dim, min(val) AS mn, max(val) AS mx FROM x GROUP BY dim
),
qz AS (
  SELECT x.dim, val,
    CASE WHEN mx > mn
      THEN CAST(least(floor(((val - mn) * 14) / (mx - mn)), 14) AS BIGINT)
      ELSE 0 END AS qc,
    mn, mx
  FROM x JOIN s ON x.dim = s.dim
),
er AS (
  SELECT dim, qc,
    CAST(floor(abs(mn + (CAST(qc AS DOUBLE) + 0.5) * (mx - mn) / 15.0
      - val) * 1000000) AS BIGINT) AS err_micro
  FROM qz
)
SELECT dim, CAST(count(*) AS BIGINT) AS n_vals,
  CAST(count(DISTINCT qc) AS BIGINT) AS n_codes_used,
  CAST(sum(err_micro) AS BIGINT) // count(*) AS mean_abs_err_micro,
  CAST(max(err_micro) AS BIGINT) AS max_abs_err_micro
FROM er GROUP BY dim ORDER BY dim
""",
)
def vector_quantize_int4_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-dimension int4 (15-level mid-rise) reconstruction error."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    x = emb.select("vec_id", F.posexplode("v").alias("pos", "val")).select(
        "vec_id", (F.col("pos") + 1).cast("bigint").alias("dim"), "val"
    )
    s = x.groupBy("dim").agg(
        F.min("val").alias("mn"), F.max("val").alias("mx")
    )
    # Degenerate (constant) dimension guard (r7 ADVICE): with mx = mn
    # Spark's non-ANSI `/` yields NULL while DuckDB's IEEE path yields
    # NaN, and least(NULL, 14) vs least(NaN, 14) diverge — both
    # engines now take the same explicit qc = 0 branch.
    qz = x.join(F.broadcast(s), "dim").select(
        "dim",
        "val",
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.floor(
                    ((F.col("val") - F.col("mn")) * 14)
                    / (F.col("mx") - F.col("mn"))
                ),
                F.lit(14),
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("qc"),
        "mn",
        "mx",
    )
    er = qz.select(
        "dim",
        "qc",
        F.floor(
            F.abs(
                F.col("mn")
                + (F.col("qc").cast("double") + 0.5)
                * (F.col("mx") - F.col("mn"))
                / 15.0
                - F.col("val")
            )
            * 1000000
        )
        .cast("bigint")
        .alias("err_micro"),
    )
    return (
        er.groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vals"),
            F.countDistinct("qc").cast("bigint").alias("n_codes_used"),
            F.expr("CAST(sum(err_micro) AS BIGINT) div count(*)").alias(
                "mean_abs_err_micro"
            ),
            F.max("err_micro").cast("bigint").alias("max_abs_err_micro"),
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# knn_hubness_histogram — in-degree census of the kNN graph. Each
# vector hands out _KNN_K out-edges; hubness skew shows up as a long
# in-degree tail. Zero-in-degree vectors (never anyone's neighbor —
# the "anti-hubs") are kept via the corpus left join. mean_norm_micro
# per degree exposes the norm bias that drives hub formation.
# ---------------------------------------------------------------------------


def _hubness_oracle() -> str:
    return f"""
WITH knn AS ({ORACLES["knn_graph_lsh"]}),
indeg AS (
  SELECT neighbor_id, CAST(count(*) AS BIGINT) AS in_degree
  FROM knn GROUP BY neighbor_id
),
nv AS (
  SELECT vec_id,
    CAST(floor(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      CAST(embedding AS DOUBLE[]))) * 1000000) AS BIGINT) AS norm_micro
  FROM embeddings
),
d AS (
  SELECT nv.vec_id, coalesce(in_degree, 0) AS in_degree, norm_micro
  FROM nv LEFT JOIN indeg ON nv.vec_id = indeg.neighbor_id
)
SELECT in_degree, CAST(count(*) AS BIGINT) AS n_vectors,
  CAST(sum(norm_micro) AS BIGINT) // count(*) AS mean_norm_micro
FROM d GROUP BY in_degree ORDER BY in_degree
"""


@register("knn_hubness_histogram", oracle=_hubness_oracle())
def knn_hubness_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-graph in-degree histogram with mean vector norm per degree."""
    from bpaotu_spark.ann.core import knn_graph_lsh

    knn = knn_graph_lsh(spark, sf_dir)
    indeg = knn.groupBy("neighbor_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("in_degree")
    )
    nv = (
        load_table(spark, sf_dir, "embeddings")
        # materialize the cast once so the unrolled dot references a
        # plain attribute rather than 128 copies of the array cast
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .select(
            "vec_id",
            F.floor(F.sqrt(dot(F.col("v"), F.col("v"))) * 1000000)
            .cast("bigint")
            .alias("norm_micro"),
        )
    )
    d = nv.join(
        indeg, nv.vec_id == indeg.neighbor_id, "left"
    ).select(
        F.coalesce(F.col("in_degree"), F.lit(0)).alias("in_degree"),
        "norm_micro",
    )
    return (
        d.groupBy("in_degree")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.expr("CAST(sum(norm_micro) AS BIGINT) div count(*)").alias(
                "mean_norm_micro"
            ),
        )
        .orderBy("in_degree")
    )
