"""Corpus-curation operators, continued (DSIR selection, fertility).

Extends functions/textops.py with two published training-data
techniques (SURVEY §2's LLM-data-pipeline family):

* ``dsir_importance_select`` — Data Selection via Importance
  Resampling (Xie et al. 2023): score every document by the unigram
  log-likelihood ratio between a target-domain LM and the raw-corpus
  LM, keep the top-k. The standard way to bias a 100 TB crawl toward
  a target distribution without a trained classifier.
* ``tokenizer_fertility`` — per-language tokens-per-word and
  chars-per-token, the tokenizer-efficiency audit run before
  committing a vocabulary (fertility >> 1 languages dominate training
  cost per byte of text).

Same determinism discipline as textops.py: ln() floored to integer
micro-nats before any aggregation, ratios as integer ppm / milli.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bpaotu_spark.catalog import load_table
from bpaotu_spark.functions.textops import BPE_RE, TOKENIZE_SQL, tokenize
from bpaotu_spark.registry import register

# ---------------------------------------------------------------------------
# dsir_importance_select — target = the English slice (the largest
# lang), raw = the whole corpus. Per word w with add-one smoothing
# over the shared vocabulary V:
#     lr_micro(w) = floor(ln((ct_t+1)/(T_t+V)) · 1e6)
#                 - floor(ln((ct_r+1)/(T_r+V)) · 1e6)
# doc score = Σ_w tf_w · lr_micro(w); top 100 docs kept (score desc,
# doc_id asc — a total order, so the cut is deterministic).
#
# Scale shape: one explode → (doc, word) tf with map-side combine;
# word-level LM stats re-aggregate the DISTINCT-word table (vocab-
# bounded, not corpus-bounded); the top-k is TakeOrdered (per-
# partition heaps + driver merge of 100-row heads), never a global
# sort. The 1-row totals frame broadcasts onto the vocab table.
# ---------------------------------------------------------------------------

_DSIR_TARGET = "en"
_DSIR_K = 100


@register(
    "dsir_importance_select",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, {TOKENIZE_SQL} AS toks FROM documents
), tok AS (
  SELECT doc_id, lang, unnest(toks) AS w FROM t
), tf AS (
  SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, lang, w
), wstat AS (
  SELECT w,
    CAST(sum(CASE WHEN lang = '{_DSIR_TARGET}' THEN tf ELSE 0 END)
      AS BIGINT) AS ct_t,
    CAST(sum(tf) AS BIGINT) AS ct_r
  FROM tf GROUP BY w
), tot AS (
  SELECT CAST(sum(ct_t) AS BIGINT) AS big_t,
         CAST(sum(ct_r) AS BIGINT) AS big_r,
         CAST(count(*) AS BIGINT) AS vocab
  FROM wstat
), lr AS (
  SELECT w,
    CAST(floor(ln((ct_t + 1) * 1.0 / (big_t + vocab)) * 1000000) AS BIGINT)
    - CAST(floor(ln((ct_r + 1) * 1.0 / (big_r + vocab)) * 1000000) AS BIGINT)
      AS lr_micro
  FROM wstat, tot
)
SELECT doc_id, lang,
  CAST(sum(tf) AS BIGINT) AS n_tokens,
  CAST(sum(tf * lr_micro) AS BIGINT) AS dsir_score_micronats
FROM tf JOIN lr USING (w)
GROUP BY doc_id, lang
ORDER BY dsir_score_micronats DESC, doc_id
LIMIT {_DSIR_K}
""",
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", "lang", F.explode(tokenize(F.col("text"))).alias("w")
        )
        .groupBy("doc_id", "lang", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # word-level LM stats: input is the distinct (doc, word) table;
    # the second groupBy touches vocab-sized data only
    wstat = tf.groupBy("w").agg(
        F.sum(
            F.when(F.col("lang") == _DSIR_TARGET, F.col("tf")).otherwise(0)
        ).alias("ct_t"),
        F.sum("tf").alias("ct_r"),
    )
    tot = wstat.agg(
        F.sum("ct_t").alias("big_t"),
        F.sum("ct_r").alias("big_r"),
        F.count(F.lit(1)).alias("vocab"),
    )
    lr = wstat.crossJoin(F.broadcast(tot)).select(
        "w",
        (
            F.floor(
                F.log((F.col("ct_t") + 1) * 1.0 / (F.col("big_t") + F.col("vocab")))
                * 1000000
            ).cast("bigint")
            - F.floor(
                F.log((F.col("ct_r") + 1) * 1.0 / (F.col("big_r") + F.col("vocab")))
                * 1000000
            ).cast("bigint")
        ).alias("lr_micro"),
    )
    scored = (
        tf.join(lr, "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("lr_micro")).alias(
                "dsir_score_micronats"
            ),
        )
    )
    return scored.orderBy(
        F.col("dsir_score_micronats").desc(), F.col("doc_id")
    ).limit(_DSIR_K)


# ---------------------------------------------------------------------------
# tokenizer_fertility — per language: whitespace words, BPE-ish
# pre-tokens, fertility = pre-tokens per word (ppm) and chars per
# pre-token (milli). Pure map-side expressions + one 5-group
# aggregation; nothing here grows with corpus size except the scan.
# ---------------------------------------------------------------------------


@register(
    "tokenizer_fertility",
    oracle=f"""
WITH d AS (
  SELECT lang,
    CAST(len({TOKENIZE_SQL}) AS BIGINT) AS n_words,
    CAST(len(regexp_extract_all(lower(text), '{BPE_RE}')) AS BIGINT)
      AS n_bpe,
    CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_words) AS BIGINT) AS total_words,
  CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
  CAST(sum(n_chars) AS BIGINT) AS total_chars,
  (CAST(sum(n_bpe) AS BIGINT) * 1000000) // CAST(sum(n_words) AS BIGINT)
    AS fertility_ppm,
  (CAST(sum(n_chars) AS BIGINT) * 1000) // CAST(sum(n_bpe) AS BIGINT)
    AS chars_per_token_milli
FROM d GROUP BY lang
""",
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.size(tokenize(F.col("text"))).cast("bigint").alias("n_words"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_RE), 0))
        .cast("bigint")
        .alias("n_bpe"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_bpe").alias("total_bpe_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.expr("(sum(n_bpe) * 1000000) div sum(n_words)").alias(
            "fertility_ppm"
        ),
        F.expr("(sum(n_chars) * 1000) div sum(n_bpe)").alias(
            "chars_per_token_milli"
        ),
    )
