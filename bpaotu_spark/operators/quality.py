"""Corpus quality-filter census operators (LLM-pipeline extension).

Three operators modeled on the published web-corpus curation recipes —
the rule families a 100 TB training-data pipeline runs between raw
crawl and tokenizer:

- :func:`gopher_quality_rules` — the heuristic rule census of Gopher
  (Rae et al. 2021, "Scaling Language Models", Appendix A1.1): word
  count bounds, mean-word-length bounds, stopword presence, top-token
  dominance, distinct-token ratio. Reported as per-source pass rates,
  the way a curation run decides which sources need manual review.
- :func:`ccnet_perplexity_tertiles` — CCNet's (Wenzek et al. 2020)
  head/middle/tail split: rank documents within each language by LM
  surprisal and cut into tertiles. Here the LM is the corpus's own
  unigram model (same integer micro-nat convention as
  ``text_unigram_logloss``) instead of CCNet's external KenLM — the
  bucketing semantics (per-language ntile over a total order) are the
  point, not the LM.
- :func:`doc_ngram_rep_profile` — RefinedWeb/Gopher repetition
  signals: the fraction of a document's word-5-gram positions whose
  gram occurs more than once WITHIN the document (self-repetition;
  cross-document duplication is ``dedup_ngram_coverage``'s job).

Reference parity note: muccg/bpaotu has no corpus ops — this family is
the mandated training-pipeline extension, cited to the public papers
above.

Scale shape (all three): explode → (doc, token/gram) groupBy with
map-side combine, per-doc re-agg on the doc key, then a per-source
rollup over one row per document. No self-joins, no windows over the
fact except doc-partitioned ones; every stat is integer-exact
(ppm / micro-nat floored BEFORE aggregation) so the DuckDB oracle
hashes bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.functions.textops import TOKENIZE_SQL, tokenize
from bpaotu_spark.registry import register

# ---------------------------------------------------------------------------
# gopher_quality_rules — Gopher Appendix-A1.1 rule census per source.
#
# Rule constants follow the paper where the synthetic corpus makes them
# meaningful (min 50 words, mean word length in [3, 10], >=2 stopword
# types, top-token share <= 20%, distinct ratio >= 50%). Every rule is
# an integer comparison (cross-multiplied, never divided) so both
# engines agree exactly.
# ---------------------------------------------------------------------------

_GOPHER_MIN_WORDS = 50
_GOPHER_MAX_WORDS = 100_000
_GOPHER_STOPWORDS = ("the", "a", "of", "and", "to", "is", "in", "that")
_STOP_SQL = ", ".join(f"'{w}'" for w in _GOPHER_STOPWORDS)


@register(
    "gopher_quality_rules",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, {TOKENIZE_SQL} AS toks FROM documents
), x AS (
  SELECT doc_id, source, unnest(toks) AS w FROM t
), cnt AS (
  SELECT doc_id, source, w, CAST(count(*) AS BIGINT) AS c
  FROM x GROUP BY doc_id, source, w
), per AS (
  SELECT doc_id, source,
    CAST(sum(c) AS BIGINT) AS n_words,
    CAST(count(*) AS BIGINT) AS n_distinct,
    CAST(max(c) AS BIGINT) AS top_c,
    CAST(sum(len(w) * c) AS BIGINT) AS sum_len,
    CAST(count(CASE WHEN w IN ({_STOP_SQL}) THEN 1 END) AS BIGINT)
      AS stop_hits
  FROM cnt GROUP BY doc_id, source
), r AS (
  SELECT source,
    CASE WHEN n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
         THEN 1 ELSE 0 END AS r_wc,
    CASE WHEN 3 * n_words <= sum_len AND sum_len <= 10 * n_words
         THEN 1 ELSE 0 END AS r_mwl,
    CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS r_stop,
    CASE WHEN 5 * top_c <= n_words THEN 1 ELSE 0 END AS r_dom,
    CASE WHEN 2 * n_distinct >= n_words THEN 1 ELSE 0 END AS r_dr
  FROM per
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(r_wc) AS BIGINT) AS pass_word_count,
  CAST(sum(r_mwl) AS BIGINT) AS pass_mean_word_len,
  CAST(sum(r_stop) AS BIGINT) AS pass_stopwords,
  CAST(sum(r_dom) AS BIGINT) AS pass_dominance,
  CAST(sum(r_dr) AS BIGINT) AS pass_distinct_ratio,
  CAST(sum(r_wc * r_mwl * r_stop * r_dom * r_dr) AS BIGINT) AS pass_all,
  CAST(sum(r_wc * r_mwl * r_stop * r_dom * r_dr) AS BIGINT) * 1000000
    // CAST(count(*) AS BIGINT) AS pass_all_ppm
FROM r GROUP BY source
""",
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source pass counts for five Gopher-style quality rules.

    One explode, two keyed groupBys (token key then doc key, both
    map-side combined), and a per-source rollup over |docs| rows —
    linear in corpus size, no joins. ``stop_hits`` counts distinct
    stopword TYPES (set semantics, from the per-token group), matching
    Gopher's ">= 2 of the stop words" phrasing.
    """
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select(
        "doc_id", "source", F.explode(tokenize(F.col("text"))).alias("w")
    )
    cnt = x.groupBy("doc_id", "source", "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    stop = F.col("w").isin(*_GOPHER_STOPWORDS)
    per = cnt.groupBy("doc_id", "source").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.max("c").alias("top_c"),
        F.sum(F.length("w").cast("bigint") * F.col("c")).alias("sum_len"),
        F.count(F.when(stop, F.lit(1))).cast("bigint").alias("stop_hits"),
    )
    r_wc = (
        (F.col("n_words") >= _GOPHER_MIN_WORDS)
        & (F.col("n_words") <= _GOPHER_MAX_WORDS)
    ).cast("long")
    r_mwl = (
        (3 * F.col("n_words") <= F.col("sum_len"))
        & (F.col("sum_len") <= 10 * F.col("n_words"))
    ).cast("long")
    r_stop = (F.col("stop_hits") >= 2).cast("long")
    r_dom = (5 * F.col("top_c") <= F.col("n_words")).cast("long")
    r_dr = (2 * F.col("n_distinct") >= F.col("n_words")).cast("long")
    r = per.select(
        "source",
        r_wc.alias("r_wc"),
        r_mwl.alias("r_mwl"),
        r_stop.alias("r_stop"),
        r_dom.alias("r_dom"),
        r_dr.alias("r_dr"),
        (r_wc * r_mwl * r_stop * r_dom * r_dr).alias("r_all"),
    )
    return r.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("r_wc").alias("pass_word_count"),
        F.sum("r_mwl").alias("pass_mean_word_len"),
        F.sum("r_stop").alias("pass_stopwords"),
        F.sum("r_dom").alias("pass_dominance"),
        F.sum("r_dr").alias("pass_distinct_ratio"),
        F.sum("r_all").alias("pass_all"),
        F.expr(
            "sum(r_all) * CAST(1000000 AS BIGINT) div count(*)"
        ).alias("pass_all_ppm"),
    )


# ---------------------------------------------------------------------------
# ccnet_perplexity_tertiles — per-language head/middle/tail by unigram
# surprisal (CCNet bucketing over this repo's own integer LM).
#
# Total order inside each language = (avg micro-nat surprisal, doc_id),
# so ntile(3) assigns identical buckets in both engines regardless of
# partitioning. The ntile window runs over |docs| rows partitioned by
# language — never over the token fact.
# ---------------------------------------------------------------------------

_CCNET_BUCKET_SQL = (
    "CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END"
)


@register(
    "ccnet_perplexity_tertiles",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, {TOKENIZE_SQL} AS toks FROM documents
), x AS (
  SELECT doc_id, lang, unnest(toks) AS token FROM t
), tf AS (
  SELECT doc_id, lang, token, CAST(count(*) AS BIGINT) AS tf
  FROM x GROUP BY doc_id, lang, token
), vocab AS (
  SELECT token, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY token
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total FROM x
), cost AS (
  SELECT token,
    CAST(floor(-ln(c * 1.0 / n_total) * 1000000) AS BIGINT) AS cost_micro
  FROM vocab CROSS JOIN n
), perdoc AS (
  SELECT tf.doc_id, lang,
    CAST(sum(tf * cost_micro) AS BIGINT) // CAST(sum(tf) AS BIGINT)
      AS ll_micro
  FROM tf JOIN cost USING (token) GROUP BY tf.doc_id, lang
), bucketed AS (
  SELECT lang, ll_micro,
    ntile(3) OVER (PARTITION BY lang ORDER BY ll_micro, doc_id) AS nt
  FROM perdoc
)
SELECT lang, {_CCNET_BUCKET_SQL} AS bucket,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(min(ll_micro) AS BIGINT) AS min_ll_micro,
  CAST(max(ll_micro) AS BIGINT) AS max_ll_micro,
  CAST(sum(ll_micro) AS BIGINT) // count(*) AS mean_ll_micro
FROM bucketed GROUP BY lang, bucket
""",
)
def ccnet_perplexity_tertiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail corpus split per language.

    The unigram cost table is the same construction as
    ``text_unigram_logloss`` (floored micro-nats from the global token
    distribution); the CCNet part is the per-language ntile(3) over
    the per-doc surprisal order. Scale: the widest shuffle is the
    (doc, token) tf groupBy; the ntile window sees one row per doc.
    """
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select(
        "doc_id", "lang", F.explode(tokenize(F.col("text"))).alias("token")
    )
    tf = x.groupBy("doc_id", "lang", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    vocab = x.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    n = x.agg(F.count(F.lit(1)).alias("n_total"))
    cost = vocab.crossJoin(F.broadcast(n)).select(
        "token",
        F.floor(-F.log(F.col("c") * 1.0 / F.col("n_total")) * 1000000)
        .cast("bigint")
        .alias("cost_micro"),
    )
    perdoc = (
        tf.join(cost, "token")
        .groupBy("doc_id", "lang")
        .agg(
            F.expr(
                "sum(tf * cost_micro) div sum(tf)"
            ).alias("ll_micro")
        )
    )
    w = Window.partitionBy("lang").orderBy("ll_micro", "doc_id")
    bucketed = perdoc.withColumn("nt", F.ntile(3).over(w).cast("bigint"))
    return bucketed.groupBy(
        "lang", F.expr(_CCNET_BUCKET_SQL).alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("ll_micro").alias("min_ll_micro"),
        F.max("ll_micro").alias("max_ll_micro"),
        F.expr("sum(ll_micro) div count(*)").alias("mean_ll_micro"),
    )


# ---------------------------------------------------------------------------
# doc_ngram_rep_profile — within-document duplicate word-5-gram share
# per source (RefinedWeb "dup_5gram_frac"-family repetition signal).
#
# A gram POSITION counts as duplicated when its 5-gram occurs >= 2
# times in the same document, so the measure is coverage of repeated
# spans, not distinct-gram share. Documents shorter than 5 tokens have
# no gram positions and drop out in both engines (inner semantics) —
# same contract as dedup_ngram_coverage.
# ---------------------------------------------------------------------------

_REP_N = 5


@register(
    "doc_ngram_rep_profile",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, {TOKENIZE_SQL} AS toks FROM documents
), g AS (
  SELECT doc_id, source,
    tok || ' ' || lead(tok,1) OVER w || ' ' || lead(tok,2) OVER w
        || ' ' || lead(tok,3) OVER w || ' ' || lead(tok,4) OVER w AS g
  FROM (SELECT doc_id, source, unnest(toks) AS tok,
               generate_subscripts(toks,1) AS pos FROM t)
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(tok,4) OVER w IS NOT NULL
), c AS (
  SELECT doc_id, source, g, CAST(count(*) AS BIGINT) AS c
  FROM g GROUP BY doc_id, source, g
), per AS (
  SELECT doc_id, source,
    CAST(sum(c) AS BIGINT) AS n_pos,
    CAST(coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) AS BIGINT)
      AS dup_pos
  FROM c GROUP BY doc_id, source
), cov AS (
  SELECT source, (dup_pos * 1000000) // n_pos AS cov_ppm FROM per
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(cov_ppm) AS BIGINT) // count(*) AS mean_dup5_ppm,
  CAST(max(cov_ppm) AS BIGINT) AS max_dup5_ppm,
  CAST(count(CASE WHEN cov_ppm > 0 THEN 1 END) AS BIGINT)
    AS docs_with_rep,
  CAST(count(CASE WHEN cov_ppm > 0 THEN 1 END) AS BIGINT) * 1000000
    // CAST(count(*) AS BIGINT) AS docs_with_rep_ppm
FROM cov GROUP BY source
""",
)
def doc_ngram_rep_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source within-doc 5-gram repetition census.

    Spark side builds grams with posexplode + lead (codegen'd; the
    interpreted transform/sequence/slice form benched ~10x slower in
    doc_ngrams), counts positions per (doc, gram), and rolls up to one
    row per source. The only fact-sized shuffles are keyed by doc_id.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.posexplode(tokenize(F.col("text"))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, _REP_N)]
    g = (
        toks.select(
            "doc_id",
            "source",
            F.concat_ws(" ", F.col("tok"), *leads).alias("g"),
            leads[-1].isNotNull().alias("full"),
        )
        .filter("full")
        .select("doc_id", "source", "g")
    )
    c = g.groupBy("doc_id", "source", "g").agg(F.count(F.lit(1)).alias("c"))
    per = c.groupBy("doc_id", "source").agg(
        F.sum("c").alias("n_pos"),
        F.coalesce(
            F.sum(F.when(F.col("c") >= 2, F.col("c"))), F.lit(0)
        ).alias("dup_pos"),
    )
    cov = per.select(
        "source", F.expr("(dup_pos * 1000000) div n_pos").alias("cov_ppm")
    )
    return cov.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("sum(cov_ppm) div count(*)").alias("mean_dup5_ppm"),
        F.max("cov_ppm").alias("max_dup5_ppm"),
        F.count(F.when(F.col("cov_ppm") > 0, F.lit(1)))
        .cast("bigint")
        .alias("docs_with_rep"),
        F.expr(
            "count(CASE WHEN cov_ppm > 0 THEN 1 END)"
            " * CAST(1000000 AS BIGINT) div count(*)"
        ).alias("docs_with_rep_ppm"),
    )
