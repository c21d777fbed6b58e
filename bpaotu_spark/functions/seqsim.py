"""BLAST-shaped sequence similarity: query documents vs corpus, ranked
by shared-k-mer identity.

Reference analogue: the reference's BLAST search endpoints (public path
``bpaotu/otu/blast.py``, wired through ``views.py``) take one query
sequence, seed-match it against the OTU sequence database, and return
ranked hits. Re-expressed Spark-first over the ``documents`` table:

- **seeding** — the query's distinct word-3-gram set (tiny) is
  broadcast against the corpus's inverted shingle index, exactly
  BLAST's "find exact seed matches first" stage. No corpus-side
  broadcast, no all-pairs product: candidates exist only where at
  least one seed matches, so the join output is bounded by the
  inverted-index co-membership, the same shape that lets BLAST skip
  almost all of the database.
- **scoring** — identity = |shared seeds| / |query seeds|, emitted in
  exact integer parts-per-million (integer division agrees across
  engines on non-negative values; a rounded double quotient would not
  — Spark rounds HALF_UP, DuckDB half-even).
- **ranking** — top-N per query ordered by hit count with doc-id
  tie-break: a total order, so the cut is engine-independent.

At 100 TB the plan is: one shuffle to build/refresh the shingle index
(or read it pre-bucketed by ``g`` from the lake), a broadcast seed
join, and one aggregation shuffle on (query_id, cand_id) whose
cardinality is bounded by seed co-occurrence — the corpus is never
re-shuffled per query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.dedup.core import NGRAMS_SQL, doc_ngrams
from bpaotu_spark.registry import register

N_QUERIES = 5   # demo query set: doc_id < 5 (mirrors ann/core.py's set)
TOP_N = 10


@register(
    "blast_kmer_similarity",
    oracle=f"""
WITH {NGRAMS_SQL},
q AS (
  SELECT doc_id AS query_id, g FROM ng WHERE doc_id < {N_QUERIES}
),
qsz AS (
  SELECT query_id, count(*) AS q_size FROM q GROUP BY query_id
),
hits AS (
  SELECT q.query_id, c.doc_id AS cand_id, count(*) AS n_hits
  FROM q JOIN ng c ON q.g = c.g AND c.doc_id != q.query_id
  GROUP BY 1, 2
)
SELECT query_id, cand_id,
  CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY n_hits DESC, cand_id ASC
  ) AS INTEGER) AS rnk,
  n_hits,
  (n_hits * 1000000) // q_size AS identity_ppm
FROM hits JOIN qsz USING (query_id)
QUALIFY rnk <= {TOP_N}
""",
)
def blast_kmer_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ng = doc_ngrams(spark, sf_dir)
    q = ng.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "g"
    )
    qsz = q.groupBy("query_id").agg(F.count(F.lit(1)).alias("q_size"))
    hits = (
        ng.join(F.broadcast(q), "g")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", F.col("doc_id").alias("cand_id"))
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_hits").desc(), F.col("cand_id").asc()
    )
    return (
        hits.join(F.broadcast(qsz), "query_id")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_N)
        .select(
            "query_id",
            "cand_id",
            "rnk",
            "n_hits",
            F.expr("n_hits * CAST(1000000 AS BIGINT) div q_size").alias(
                "identity_ppm"
            ),
        )
    )
