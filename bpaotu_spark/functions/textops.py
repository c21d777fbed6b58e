"""Text column expressions — tokenization, n-grams, language ID, quality,
token counting, fingerprinting.

All pure ``pyspark.sql.functions`` (JVM-side, whole-stage-codegen
eligible) — no Python UDFs anywhere in the hot path. Each Spark
expression has an ANSI-SQL twin defined alongside it so operator
oracles share one definition (same drift-proofing idea as
:mod:`bpaotu_spark.plans.filters`).

Reference analogue: the reference's text handling is search
normalization in ``bpaotu/otu/query.py`` (OTU name search); the
language-ID / quality / fingerprint operators are the mandated
LLM-pipeline extensions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register

# -- shared tokenization (Spark + SQL twins) --------------------------------

TOKENIZE_SQL = (
    "string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')"
)


def tokenize(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics, split on whitespace."""
    return F.split(F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")), " ")


def word_ngrams(toks: Column, n: int) -> Column:
    """All n-word grams of a token array (empty array when too short)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


# BPE-ish token regex: letter runs, digit runs, or single non-space symbol —
# the classic pre-tokenizer split that upper-bounds BPE token count.
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

# Distinct-stopword language profiles. Scoring = how many of the profile's
# stopwords appear in the document (set semantics — deterministic, order-free).
LANG_PROFILES = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en": ("the", "a", "of", "and", "is", "to", "in", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "les", "de", "et", "un", "est", "que"),
}

STOPWORDS_EN = LANG_PROFILES["en"] + ("it", "for", "on", "with", "as")


def _sql_strlist(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _profile_score(toks: Column, words) -> Column:
    return F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(w) for w in words])
        )
    )


def _profile_score_sql(words) -> str:
    return f"len(list_intersect(list_distinct(toks), {_sql_strlist(words)}))"


# ---------------------------------------------------------------------------
# text_langid — stopword-profile language ID. Deterministic argmax with
# lexicographic tie-break on the language code.
# ---------------------------------------------------------------------------


@register(
    "text_langid",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang AS labeled_lang, {TOKENIZE_SQL} AS toks FROM documents
), scored AS (
  SELECT doc_id, labeled_lang,
    {', '.join(f"{_profile_score_sql(ws)} AS score_{lg}" for lg, ws in sorted(LANG_PROFILES.items()))}
  FROM t
)
SELECT doc_id, labeled_lang,
  {', '.join(f'score_{lg}' for lg in sorted(LANG_PROFILES))},
  (SELECT lang FROM (
     VALUES {', '.join(f"('{lg}', score_{lg})" for lg in sorted(LANG_PROFILES))}
   ) AS v(lang, s)
   ORDER BY s DESC, lang ASC LIMIT 1) AS predicted_lang
FROM scored
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    out = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[
            _profile_score(toks, ws).alias(f"score_{lg}")
            for lg, ws in sorted(LANG_PROFILES.items())
        ],
    )
    # argmax over (score, -lang): sort an array of (score, negated-rank) pairs.
    pairs = F.array(
        *[
            F.struct(
                F.col(f"score_{lg}").alias("s"),
                # lexicographically smaller language wins ties -> invert for
                # a single descending sort on the struct
                F.lit(len(LANG_PROFILES) - i).alias("pri"),
                F.lit(lg).alias("lang"),
            )
            for i, lg in enumerate(sorted(LANG_PROFILES))
        ]
    )
    best = F.sort_array(pairs, asc=False)[0]["lang"]
    return out.withColumn("predicted_lang", best)


# ---------------------------------------------------------------------------
# text_quality — length / punctuation / stopword quality signals.
# ---------------------------------------------------------------------------


@register(
    "text_quality",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, {TOKENIZE_SQL} AS toks FROM documents
)
SELECT
  doc_id,
  length(text) AS n_chars,
  len(toks) AS n_words,
  CAST(round(length(text) * 1.0 / len(toks), 4) AS DOUBLE) AS chars_per_word,
  CAST(round(len(list_filter(toks, x -> list_contains({_sql_strlist(STOPWORDS_EN)}, x)))
             * 1.0 / len(toks), 4) AS DOUBLE) AS stopword_ratio,
  CAST(round((length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))
             * 1.0 / length(text), 4) AS DOUBLE) AS punct_ratio,
  (len(toks) BETWEEN 10 AND 100000
   AND len(list_filter(toks, x -> list_contains({_sql_strlist(STOPWORDS_EN)}, x)))
       * 1.0 / len(toks) > 0.01) AS passes_quality
FROM t
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    d = docs.select("doc_id", "text", toks.alias("toks"))
    n_words = F.size("toks")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_stop = F.size(F.filter("toks", lambda x: F.array_contains(stop_arr, x)))
    n_chars = F.length("text")
    n_kept = F.length(F.regexp_replace("text", "[^a-z0-9 ]", ""))
    stop_ratio = n_stop * F.lit(1.0) / n_words
    return d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(n_chars * 1.0 / n_words, 4).cast("double").alias("chars_per_word"),
        F.round(stop_ratio, 4).cast("double").alias("stopword_ratio"),
        F.round((n_chars - n_kept) * 1.0 / n_chars, 4)
        .cast("double")
        .alias("punct_ratio"),
        (n_words.between(10, 100000) & (stop_ratio > 0.01)).alias("passes_quality"),
    )


# ---------------------------------------------------------------------------
# text_token_count — whitespace words + BPE-ish regex token count.
# ---------------------------------------------------------------------------


@register(
    "text_token_count",
    oracle=f"""
SELECT
  doc_id,
  len({TOKENIZE_SQL}) AS n_words,
  len(regexp_extract_all(lower(text), '{BPE_RE}')) AS n_bpeish_tokens,
  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_chars_div4
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokenize(F.col("text"))).alias("n_words"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_RE), 0)).alias(
            "n_bpeish_tokens"
        ),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("n_chars_div4"),
    )


# ---------------------------------------------------------------------------
# text_fingerprint — canonical-token-set md5 (the classic "fingerprint"
# clustering key: near-identical docs with reordered words collide).
# ---------------------------------------------------------------------------


@register(
    "text_fingerprint",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {TOKENIZE_SQL} AS toks FROM documents
)
SELECT
  doc_id,
  md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint,
  len(list_distinct(toks)) AS n_distinct_tokens
FROM t
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    canon = F.concat_ws(" ", F.sort_array(F.array_distinct(toks)))
    return docs.select(
        "doc_id",
        F.md5(canon).alias("fingerprint"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )
