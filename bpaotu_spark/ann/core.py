"""Approximate-nearest-neighbor search over an embedding column.

The reference's BLAST sequence-similarity search (public path
``bpaotu/otu/views.py`` blast endpoints) re-expressed as vector search:

- **brute-force** — exact cosine top-k per query vector: broadcast the
  (small) query set against the corpus, one pass, window top-k. The
  correctness baseline; O(|Q|·|corpus|) but embarrassingly parallel
  and shuffle-free until the final per-query top-k.
- **sign-LSH** — axis-sign bucket blocking (the first SIGN_DIMS
  dimensions' signs form the bucket key): candidates only join within
  a bucket, trading recall for a |corpus|/2^SIGN_DIMS-sized candidate
  set per query. The scale path for 100 TB corpora; deterministic (no
  random hyperplanes) so the DuckDB oracle reproduces it exactly.

Ranking determinism: cosine is rounded to 6 dp before ordering and
ties break on vec_id, so the top-k cut is engine-independent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.dedup.core import dot, norm
from bpaotu_spark.registry import register

TOP_K = 5
N_QUERIES = 10  # demo query set: vec_id < 10
SIGN_DIMS = 4   # 2^4 = 16 buckets

_COS = (
    "list_dot_product(qv, cv)"
    " / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))"
)


def _queries_and_corpus(spark: SparkSession, sf_dir: str):
    # Norms are precomputed per vector so the pair stage runs ONE fold
    # (the dot) per candidate; cos = dot/(nq*nc) matches the oracle's
    # arithmetic exactly.
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("nq"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("nc"),
    )
    return queries, corpus


def _topk(scored: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "cand_id",
            "rnk",
            F.round("cos_r", 4).cast("double").alias("cos_sim"),
        )
    )


_ORACLE_COMMON = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id AS cand_id, v AS cv FROM e
)
""".strip()


@register(
    "ann_bruteforce_topk",
    oracle=f"""
{_ORACLE_COMMON},
scored AS (
  SELECT query_id, cand_id, round({_COS}, 6) AS cos_r
  FROM q JOIN c ON query_id != cand_id
)
SELECT query_id, cand_id,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_r DESC, cand_id ASC) AS INTEGER) AS rnk,
  CAST(round(cos_r, 4) AS DOUBLE) AS cos_sim
FROM scored
QUALIFY rnk <= {TOP_K}
""",
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    queries, corpus = _queries_and_corpus(spark, sf_dir)
    scored = (
        corpus.join(F.broadcast(queries), F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "cos_r",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nc")), 6),
        )
    )
    return _topk(scored)


def _bucket_sql(col: str) -> str:
    bits = " || ".join(
        f"(CASE WHEN {col}[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
        for i in range(SIGN_DIMS)
    )
    return f"({bits})"


def _bucket_spark(col: F.Column) -> F.Column:
    return F.concat(
        *[
            F.when(col[i] >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(SIGN_DIMS)
        ]
    )


@register(
    "ann_lsh_topk",
    oracle=f"""
{_ORACLE_COMMON},
qb AS (SELECT query_id, qv, {_bucket_sql('qv')} AS bucket FROM q),
cb AS (SELECT cand_id, cv, {_bucket_sql('cv')} AS bucket FROM c),
scored AS (
  SELECT query_id, cand_id, round({_COS}, 6) AS cos_r
  FROM qb JOIN cb ON qb.bucket = cb.bucket AND query_id != cand_id
)
SELECT query_id, cand_id,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_r DESC, cand_id ASC) AS INTEGER) AS rnk,
  CAST(round(cos_r, 4) AS DOUBLE) AS cos_sim
FROM scored
QUALIFY rnk <= {TOP_K}
""",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    queries, corpus = _queries_and_corpus(spark, sf_dir)
    qb = queries.withColumn("bucket", _bucket_spark(F.col("qv")))
    cb = corpus.withColumn("bucket_c", _bucket_spark(F.col("cv")))
    scored = (
        cb.join(
            F.broadcast(qb),
            (F.col("bucket") == F.col("bucket_c"))
            & (F.col("query_id") != F.col("cand_id")),
        )
        .withColumn(
            "cos_r",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nc")), 6),
        )
    )
    return _topk(scored)
