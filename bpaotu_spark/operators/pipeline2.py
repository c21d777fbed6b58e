"""Training-pipeline compositions, continued (curriculum, folds, balance).

* ``curriculum_schedule`` — curriculum-learning plan: rank documents
  by language-model difficulty (unigram logloss, the
  ``text_unigram_logloss`` oracle embedded as a CTE so the two ops can
  never drift), decile them within each language, and emit the
  per-(lang, decile) token budget with cumulative share — the "train
  easy→hard" schedule input.
* ``kfold_assignment`` — deterministic hash-based 5-fold split
  stratified per language (md5-derived fold, the train_test_split
  discipline), with per-fold balance counts. Folds are a pure
  function of doc_id — stable across reruns and engines.
* ``partition_balance_audit`` — equal-width RANGE partitioning vs
  HASH partitioning on the orders table: per-layout bucket-size
  spread (max/mean ppm, empty buckets). The planner input for
  repartitionByRange vs repartition(hash) — ranges preserve order
  locality but skew with the value distribution; hash balances but
  destroys locality. Same audit pattern as zorder_file_pruning.

Scale shapes: curriculum = the logloss pipeline (vocab-bounded LM
stats) + one lang-partitioned ntile window + one 50-group agg; kfold =
pure map-side md5 + one 25-group agg; balance audit = one broadcast
min/max frame + one explode(2) + one 64-group agg.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

import bpaotu_spark.functions.textops  # noqa: F401  (registers the embedded logloss oracle)
from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import ORACLES, register

# ---------------------------------------------------------------------------
# curriculum_schedule
# ---------------------------------------------------------------------------


def _curriculum_oracle() -> str:
    return f"""
WITH ll AS ({ORACLES["text_unigram_logloss"]}),
ranked AS (
  SELECT d.lang, ll.doc_id, ll.n_tokens, ll.avg_logloss_micronats,
    ntile(10) OVER (PARTITION BY d.lang
                    ORDER BY ll.avg_logloss_micronats, ll.doc_id)
      AS difficulty_decile
  FROM ll JOIN documents d ON ll.doc_id = d.doc_id
),
dec AS (
  SELECT lang, CAST(difficulty_decile AS BIGINT) AS difficulty_decile,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
    CAST(min(avg_logloss_micronats) AS BIGINT) AS min_logloss_micro,
    CAST(max(avg_logloss_micronats) AS BIGINT) AS max_logloss_micro
  FROM ranked GROUP BY lang, difficulty_decile
),
tot AS (
  SELECT lang, CAST(sum(total_tokens) AS BIGINT) AS lang_tokens
  FROM dec GROUP BY lang
)
SELECT dec.lang, difficulty_decile, n_docs, total_tokens,
  min_logloss_micro, max_logloss_micro,
  (CAST(sum(total_tokens) OVER (PARTITION BY dec.lang
     ORDER BY difficulty_decile) AS BIGINT) * 1000000) // lang_tokens
    AS cum_token_share_ppm
FROM dec JOIN tot ON dec.lang = tot.lang
"""


@register("curriculum_schedule", oracle=_curriculum_oracle())
def curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bpaotu_spark.functions.textops import text_unigram_logloss

    ll = text_unigram_logloss(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        "avg_logloss_micronats", "doc_id"
    )
    ranked = ll.join(docs, "doc_id").withColumn(
        "difficulty_decile", F.ntile(10).over(w).cast("bigint")
    )
    dec = ranked.groupBy("lang", "difficulty_decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("avg_logloss_micronats").alias("min_logloss_micro"),
        F.max("avg_logloss_micronats").alias("max_logloss_micro"),
    )
    tot = dec.groupBy("lang").agg(F.sum("total_tokens").alias("lang_tokens"))
    wc = Window.partitionBy("lang").orderBy("difficulty_decile")
    return (
        dec.join(tot, "lang")
        .withColumn(
            "cum_tokens", F.sum("total_tokens").over(wc).cast("bigint")
        )
        .select(
            "lang",
            "difficulty_decile",
            "n_docs",
            "total_tokens",
            "min_logloss_micro",
            "max_logloss_micro",
            F.expr("(cum_tokens * 1000000) div lang_tokens").alias(
                "cum_token_share_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# kfold_assignment
# ---------------------------------------------------------------------------

_K_FOLDS = 5


@register(
    "kfold_assignment",
    oracle=f"""
WITH f AS (
  SELECT lang,
    CAST(strpos('0123456789abcdef',
      substr(md5(CAST(doc_id AS VARCHAR) || ':fold'), 1, 1)) - 1
      AS BIGINT) % {_K_FOLDS} AS fold,
    n_chars
  FROM documents
),
pf AS (
  SELECT lang, fold,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM f GROUP BY lang, fold
),
tot AS (
  SELECT lang, CAST(sum(n_docs) AS BIGINT) AS lang_docs FROM pf GROUP BY lang
)
SELECT pf.lang, fold, n_docs, n_chars,
  (n_docs * 1000000) // lang_docs AS fold_share_ppm
FROM pf JOIN tot ON pf.lang = tot.lang
""",
)
def kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        "lang",
        (
            (
                F.instr(
                    F.lit("0123456789abcdef"),
                    F.substring(
                        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":fold"))),
                        1,
                        1,
                    ),
                )
                - 1
            ).cast("bigint")
            % _K_FOLDS
        ).alias("fold"),
        "n_chars",
    )
    pf = f.groupBy("lang", "fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    tot = pf.groupBy("lang").agg(F.sum("n_docs").alias("lang_docs"))
    return pf.join(tot, "lang").select(
        "lang",
        "fold",
        "n_docs",
        "n_chars",
        F.expr("(n_docs * 1000000) div lang_docs").alias("fold_share_ppm"),
    )


# ---------------------------------------------------------------------------
# partition_balance_audit
# ---------------------------------------------------------------------------

_N_BUCKETS = 32


@register(
    "partition_balance_audit",
    oracle=f"""
WITH mx AS (
  SELECT CAST(floor(min(o_totalprice) * 100) AS BIGINT) AS lo,
         CAST(floor(max(o_totalprice) * 100) AS BIGINT) AS hi
  FROM orders
),
coded AS (
  SELECT
    least({_N_BUCKETS - 1},
      ((CAST(floor(o_totalprice * 100) AS BIGINT) - lo) * {_N_BUCKETS})
        // (hi - lo + 1)) AS range_bucket,
    CAST(strpos('0123456789abcdef',
      substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1 AS BIGINT) * 2
      + CAST(strpos('0123456789abcdef',
          substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1)) - 1 AS BIGINT) // 8
      AS hash_bucket
  FROM orders, mx
),
tagged AS (
  SELECT 'range' AS layout, range_bucket AS bucket FROM coded
  UNION ALL
  SELECT 'hash', hash_bucket FROM coded
),
bs AS (
  SELECT layout, bucket, CAST(count(*) AS BIGINT) AS n
  FROM tagged GROUP BY layout, bucket
)
SELECT layout,
  CAST(count(*) AS BIGINT) AS buckets_used,
  CAST(sum(n) AS BIGINT) AS n_rows,
  CAST(max(n) AS BIGINT) AS max_bucket,
  CAST(min(n) AS BIGINT) AS min_bucket,
  (CAST(max(n) AS BIGINT) * 1000000 * count(*)) // CAST(sum(n) AS BIGINT)
    AS skew_factor_ppm
FROM bs GROUP BY layout
""",
)
def partition_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    mx = od.agg(
        F.floor(F.min("o_totalprice") * 100).cast("bigint").alias("lo"),
        F.floor(F.max("o_totalprice") * 100).cast("bigint").alias("hi"),
    )
    hexpos = lambda i: (  # noqa: E731
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("o_orderkey").cast("string")), i, 1),
        )
        - 1
    ).cast("bigint")
    coded = od.crossJoin(F.broadcast(mx)).select(
        F.least(
            F.lit(_N_BUCKETS - 1),
            F.expr(
                f"((CAST(floor(o_totalprice * 100) AS BIGINT) - lo)"
                f" * {_N_BUCKETS}) div (hi - lo + 1)"
            ),
        ).alias("range_bucket"),
        (hexpos(1) * 2 + F.expr(
            "CAST(instr('0123456789abcdef',"
            " substr(md5(CAST(o_orderkey AS STRING)), 2, 1)) - 1 AS BIGINT)"
            " div 8"
        )).alias("hash_bucket"),
    )
    tagged = coded.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("range").alias("layout"),
                    F.col("range_bucket").alias("bucket"),
                ),
                F.struct(
                    F.lit("hash").alias("layout"),
                    F.col("hash_bucket").alias("bucket"),
                ),
            )
        ).alias("t")
    ).select("t.layout", "t.bucket")
    bs = tagged.groupBy("layout", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    return bs.groupBy("layout").agg(
        F.count(F.lit(1)).alias("buckets_used"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_bucket"),
        F.min("n").alias("min_bucket"),
        F.expr(
            "(max(n) * 1000000 * count(*)) div sum(n)"
        ).alias("skew_factor_ppm"),
    )


# ---------------------------------------------------------------------------
# weighted_sample_es — distributed weighted sampling WITHOUT
# replacement (Efraimidis–Spirakis 2006): per item draw u ~ U(0,1],
# rank by ln(u)/w (equivalently u^(1/w)) and take the top-k — each
# item's inclusion probability is proportional to its weight w, with
# NO sequential pass and no driver-side reservoir: the top-k is a
# TakeOrderedAndProject (per-partition heaps + 50-row driver merge),
# which IS the distributed reservoir. Weight = n_chars (sample long
# documents proportionally more — the standard length-weighted corpus
# draw; lang_temperature_sample is the separate α-temperature
# LANGUAGE-level resampler).
#
# Determinism: u = (60-bit md5(doc_id) + 1) / 2^60 — the same fixed
# hash grid as approx_distinct_kmv — and the ORDER key is the floored
# nano-scaled integer ln(u)/w (ties broken by doc_id), so a last-ulp
# libm divergence between engines cannot flip ranks.
# ---------------------------------------------------------------------------

_ES_K = 50

_ES_HASH_SQL = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),"
    f" {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
    for i in range(15)
)


@register(
    "weighted_sample_es",
    oracle=f"""
WITH h AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
    CAST({_ES_HASH_SQL} AS BIGINT) AS hv
  FROM documents WHERE n_chars > 0
), k AS (
  SELECT doc_id, source, w,
    CAST(floor(ln(CAST(hv + 1 AS DOUBLE) / {float(1 << 60)})
               / CAST(w AS DOUBLE) * 1000000000)
      AS BIGINT) AS key_nano
  FROM h
), rk AS (
  SELECT doc_id, source, w, key_nano,
    CAST(row_number() OVER (ORDER BY key_nano DESC, doc_id)
      AS BIGINT) AS rank
  FROM k
)
SELECT rank, doc_id, source, w, key_nano FROM rk
WHERE rank <= {_ES_K}
""",
)
def weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted top-k corpus draw, one row per sampled doc.

    The global ORDER BY + LIMIT pair compiles to
    TakeOrderedAndProject — no global sort materializes; the ranking
    window after the cut runs over k rows.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    h = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("bigint").alias("w"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("hv"),
    )
    k = h.select(
        "doc_id",
        "source",
        "w",
        F.floor(
            F.log((F.col("hv") + 1).cast("double") / float(1 << 60))
            / F.col("w").cast("double")
            * 1000000000
        )
        .cast("bigint")
        .alias("key_nano"),
    )
    top = k.orderBy(F.col("key_nano").desc(), "doc_id").limit(_ES_K)
    # unpartitioned window bound: runs over the LIMIT-_ES_K cut only
    w_rank = Window.orderBy(F.col("key_nano").desc(), "doc_id")
    return top.withColumn(
        "rank", F.row_number().over(w_rank).cast("bigint")
    ).select("rank", "doc_id", "source", "w", "key_nano")
