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
from pyspark.sql import Column, DataFrame, SparkSession, Window

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
    """All n-word grams of a token array (empty array when too short).

    The short-doc branch must be an explicit ``when``: without it,
    ``sequence(1, size - (n-1))`` with size < n produces a DESCENDING
    sequence (e.g. ``sequence(1, 0)`` = ``[1, 0]``) and ``slice(toks,
    0, n)`` raises INVALID_PARAMETER_VALUE.START on PySpark 4.x.
    """
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


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
    # bigint: DuckDB len() is BIGINT; matching width keeps the driver's
    # typed hash aligned (F.size is int32).
    return F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(w) for w in words])
        )
    ).cast("bigint")


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
        # bigint: DuckDB length()/len() are BIGINT; match their width
        n_chars.cast("bigint").alias("n_chars"),
        n_words.cast("bigint").alias("n_words"),
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
        F.size(tokenize(F.col("text"))).cast("bigint").alias("n_words"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_RE), 0))
        .cast("bigint")
        .alias("n_bpeish_tokens"),
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
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
    )


# ---------------------------------------------------------------------------
# text_repetition_ratio — within-document repetition signals (the
# Gopher/MassiveText quality-filter family: heavily repetitive docs are
# low-quality or machine-generated and get dropped before training).
# Signals: distinct-token ratio, most-frequent-token share, and
# most-frequent-bigram share. All ratios are emitted in exact integer
# parts-per-million — a rounded double quotient would flip at 4dp ties
# between Spark (HALF_UP) and DuckDB (half-even); integer division on
# non-negative values agrees everywhere.
#
# Scale shape: one explode + one (doc_id, token) groupBy — the shuffle
# key includes the token, so hot documents spread across reducers; the
# per-doc re-aggregation is a second small shuffle on doc_id alone.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# text_winnow_fingerprints — winnowing document fingerprints (the
# MOSS algorithm): hash every K-token gram, slide a W-gram window, and
# select the minimum hash of each full window. Guarantees any shared
# run of >= K+W-1 tokens between two documents shares a fingerprint,
# with a (distinct-selection) density of ~2/(W+1) — the local-copy
# detection primitive that survives insertions/deletions where the
# whole-document fingerprint (text_fingerprint) breaks.
#
# Determinism: fingerprints are md5-hex prefixes, so the window min is
# a lexicographic string min — binary collation in both engines; no
# numeric conversion anywhere.
#
# Scale shape: posexplode → two doc_id-partitioned sequential windows
# (gram assembly via lead, window min) — doc-sized partitions, maximal
# parallelism at corpus scale; the final distinct is a (doc_id, fp)
# hash aggregate with map-side combine.
# ---------------------------------------------------------------------------

_WINNOW_K = 3  # tokens per gram
_WINNOW_W = 4  # grams per window

# Shared CTE chain ending in fps(doc_id, fingerprint) — reused by the
# dedup_winnow_pairs oracle so both operators share one definition.
WINNOW_FPS_SQL = f"""t AS (
  SELECT doc_id, {TOKENIZE_SQL} AS toks FROM documents
), tok AS (
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS pos FROM t
), gram AS (
  SELECT doc_id, pos,
    substr(md5(w || ' ' || (lead(w, 1) OVER win) || ' ' || (lead(w, 2) OVER win)), 1, 8) AS fp,
    (lead(w, {_WINNOW_K - 1}) OVER win) IS NOT NULL AS is_full
  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
), g AS (
  SELECT doc_id, pos, fp FROM gram WHERE is_full
), wmin AS (
  SELECT doc_id,
    min(fp) OVER fwd AS winmin,
    count(*) OVER fwd AS wcount
  FROM g
  WINDOW fwd AS (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING)
), fps AS (
  SELECT DISTINCT doc_id, winmin AS fingerprint
  FROM wmin WHERE wcount = {_WINNOW_W}
)"""


@register(
    "text_winnow_fingerprints",
    oracle=f"""
WITH {WINNOW_FPS_SQL}
SELECT doc_id, fingerprint FROM fps
""",
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("pos", "w")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    gram = tok.select(
        "doc_id",
        "pos",
        F.substring(
            F.md5(
                F.concat_ws(
                    " ", "w", F.lead("w", 1).over(win), F.lead("w", 2).over(win)
                )
            ),
            1,
            8,
        ).alias("fp"),
        F.lead("w", _WINNOW_K - 1).over(win).isNotNull().alias("full"),
    ).filter("full")
    fwd = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, _WINNOW_W - 1)
    )
    wmin = gram.select(
        "doc_id",
        F.min("fp").over(fwd).alias("winmin"),
        F.count(F.lit(1)).over(fwd).alias("wcount"),
    )
    return (
        wmin.filter(F.col("wcount") == _WINNOW_W)
        .select("doc_id", F.col("winmin").alias("fingerprint"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# text_unigram_logloss — CCNet-style language-model quality score: the
# per-token cross-entropy of each document under the corpus's own
# unigram LM. Boilerplate/gibberish scores far from the corpus mode and
# gets dropped by a threshold the caller picks.
#
# Determinism: ln() runs only on the VOCABULARY table (one value per
# distinct token, ~|V| rows), immediately floored into exact integer
# micro-nats; every per-document number is then integer arithmetic
# (sum of tf * cost), so double summation order can never flip the
# hash. The ulp-level ln() engine skew matters only within 1 ulp of a
# micro-nat boundary — ~1e-8 per vocab entry.
#
# Scale shape: explode → (doc, token) tf groupBy (map-side combine);
# vocab is a token-keyed agg of tf (bounded by |V|, not corpus size);
# the corpus total is a 1-row broadcast; cost joins back to tf on the
# token key (high-cardinality, even) and re-aggregates on doc_id.
# ---------------------------------------------------------------------------


@register(
    "text_unigram_logloss",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {TOKENIZE_SQL} AS toks FROM documents
), x AS (
  SELECT doc_id, unnest(toks) AS token FROM t
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM x GROUP BY doc_id, token
), vocab AS (
  SELECT token, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY token
), n AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_total FROM vocab
), cost AS (
  SELECT token,
    CAST(floor(-ln(c * 1.0 / n_total) * 1000000) AS BIGINT) AS cost_micro
  FROM vocab CROSS JOIN n
)
SELECT
  tf.doc_id,
  CAST(sum(tf) AS BIGINT) AS n_tokens,
  CAST(sum(tf * cost_micro) AS BIGINT) AS total_cost_micronats,
  CAST(sum(tf * cost_micro) AS BIGINT) // CAST(sum(tf) AS BIGINT)
    AS avg_logloss_micronats
FROM tf JOIN cost USING (token)
GROUP BY tf.doc_id
""",
)
def text_unigram_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("token"))
    tf = x.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # LM training is inherently a second pass over the corpus, but the
    # vocab aggregates straight off the scan (one shuffle keyed by
    # token) and the corpus total is a map-only scan — re-deriving
    # either from `tf` would re-run the explode+groupBy subtree, since
    # Catalyst does not dedupe repeated lineage references.
    vocab = x.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    n = docs.agg(
        F.sum(F.size(tokenize(F.col("text"))).cast("bigint")).alias("n_total")
    )
    cost = (
        vocab.crossJoin(F.broadcast(n))
        .select(
            "token",
            F.floor(-F.log(F.col("c") * 1.0 / F.col("n_total")) * 1000000)
            .cast("bigint")
            .alias("cost_micro"),
        )
    )
    return (
        tf.join(cost, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("cost_micro")).alias("total_cost_micronats"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "total_cost_micronats",
            F.expr("total_cost_micronats div n_tokens").alias(
                "avg_logloss_micronats"
            ),
        )
    )


# ---------------------------------------------------------------------------
# bm25_search — Okapi BM25 relevance of every document against a fixed
# query-term set, top-50. The data-selection primitive of targeted
# corpus curation ("give me the docs most relevant to X").
#
# Determinism: the query is a compile-time constant, so per-term scores
# are per-row double expressions with IDENTICAL operator order in both
# dialects, summed in fixed literal order (no order-sensitive agg);
# round(4dp) + doc_id tie-break gives the top-k cut a total order
# (same contract as tfidf_top_terms).
#
# Scale shape: map-only scoring — tf comes from array filters on the
# token array (no explode), the df/avgdl statistics are one broadcast
# row, and the top-50 is orderBy+limit, which Spark executes as
# TakeOrderedAndProject (per-partition heaps + driver merge of 50-row
# heads, never a global sort).
# ---------------------------------------------------------------------------

BM25_QUERY = ("spark", "merge", "window")
BM25_K1, BM25_B = 1.2, 0.75
_BM25_K = 50


def _bm25_term_sql(t: str) -> str:
    tf = f"len(list_filter(toks, x -> x = '{t}'))"
    idf = f"ln(1 + (n_docs - df_{t} + 0.5) / (df_{t} + 0.5))"
    return (
        f"({idf} * {tf} / ({tf} + {BM25_K1} * "
        f"(1 - {BM25_B} + {BM25_B} * dl / avgdl)))"
    )


@register(
    "bm25_search",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {TOKENIZE_SQL} AS toks FROM documents
), d AS (
  SELECT doc_id, toks, len(toks) AS dl FROM t
), stats AS (
  SELECT
    count(*) AS n_docs,
    CAST(sum(dl) AS BIGINT) * 1.0 / count(*) AS avgdl,
    {', '.join(f"CAST(sum(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}" for t in BM25_QUERY)}
  FROM d
), scored AS (
  SELECT doc_id,
    {' + '.join(f"len(list_filter(toks, x -> x = '{t}'))" for t in BM25_QUERY)} AS n_hits,
    CAST(round({' + '.join(_bm25_term_sql(t) for t in BM25_QUERY)}, 4) AS DOUBLE) AS score
  FROM d CROSS JOIN stats
)
SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits, score,
  CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rnk
FROM scored
WHERE n_hits > 0
ORDER BY score DESC, doc_id ASC
LIMIT {_BM25_K}
""",
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", tokenize(F.col("text")).alias("toks")
    ).withColumn("dl", F.size("toks"))

    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("bigint") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(
                F.when(F.array_contains("toks", t), 1).otherwise(0)
            ).cast("bigint").alias(f"df_{t}")
            for t in BM25_QUERY
        ],
    )

    def term_tf(t: str):
        return F.size(F.filter("toks", lambda x: x == F.lit(t)))

    def term_score(t: str):
        tf = term_tf(t)
        idf = F.log(
            1 + (F.col("n_docs") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
        )
        return idf * tf / (
            tf + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )

    n_hits = term_tf(BM25_QUERY[0])
    score = term_score(BM25_QUERY[0])
    for t in BM25_QUERY[1:]:
        n_hits = n_hits + term_tf(t)
        score = score + term_score(t)

    scored = (
        d.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            n_hits.cast("bigint").alias("n_hits"),
            F.round(score, 4).cast("double").alias("score"),
        )
        .filter(F.col("n_hits") > 0)
    )
    topk = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(_BM25_K)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    # the no-partition window runs on the already-cut 50-row head only
    return topk.withColumn("rnk", F.row_number().over(w))


@register(
    "text_repetition_ratio",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {TOKENIZE_SQL} AS toks FROM documents
), tok AS (
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS pos FROM t
), uni AS (
  SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w
), unistats AS (
  -- CAST: sum(BIGINT) is HUGEINT in DuckDB; BIGINT matches Spark and
  -- keeps the // quotients below integer64 in both engines.
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         count(*) AS n_distinct, max(c) AS top_c
  FROM uni GROUP BY doc_id
), big AS (
  SELECT doc_id, w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM tok
  QUALIFY g IS NOT NULL
), bigc AS (
  SELECT doc_id, g, count(*) AS c FROM big GROUP BY doc_id, g
), bigstats AS (
  SELECT doc_id, max(c) AS top_big_c, CAST(sum(c) AS BIGINT) AS n_bigrams
  FROM bigc GROUP BY doc_id
)
SELECT
  u.doc_id,
  n_tokens,
  (n_distinct * 1000000) // n_tokens AS distinct_ppm,
  (top_c * 1000000) // n_tokens AS top_token_ppm,
  (top_big_c * 1000000) // n_bigrams AS top_bigram_ppm
FROM unistats u JOIN bigstats b ON u.doc_id = b.doc_id
""",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("pos", "w")
    )
    uni = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    unistats = uni.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    from pyspark.sql import Window

    wseq = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.select(
            "doc_id", F.concat_ws(" ", "w", F.lead("w", 1).over(wseq)).alias("g"),
            F.lead("w", 1).over(wseq).isNotNull().alias("full"),
        )
        .filter("full")
    )
    bigstats = (
        big.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_big_c"), F.sum("c").alias("n_bigrams"))
    )
    return (
        unistats.join(bigstats, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.expr("n_distinct * CAST(1000000 AS BIGINT) div n_tokens").alias(
                "distinct_ppm"
            ),
            F.expr("top_c * CAST(1000000 AS BIGINT) div n_tokens").alias(
                "top_token_ppm"
            ),
            F.expr("top_big_c * CAST(1000000 AS BIGINT) div n_bigrams").alias(
                "top_bigram_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# bigram_pmi — corpus collocation mining by pointwise mutual
# information: PMI(x,y) = ln( p(xy) / (p(x)·p(y)) ) with p(xy) from
# the bigram distribution and p(x), p(y) from the unigram one. High
# PMI + minimum support finds the corpus's multi-word units — the
# phrases a tokenizer-training or boilerplate-analysis step should
# treat as single symbols.
#
# Determinism: the ln() argument is built with the identical
# left-associative DOUBLE expression tree in both engines (promote
# once, multiply in the same order), then rounded to 4 dp — the same
# contract alpha_diversity's Shannon term uses. The top-K cut orders
# by (pmi DESC, bigram ASC) AFTER rounding, so the cut is
# engine-independent.
#
# Scale shape: unigram and bigram counts both get map-side combine;
# the support filter (c_xy >= _PMI_MIN_COUNT) prunes the bigram table
# BEFORE the two unigram-count joins (standard shuffle joins on the
# token key — the vocabulary is zipfian but bounded); totals join as
# broadcast 1-row scalars; the final window runs over the LIMIT-K
# result only.
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOPK = 50


@register(
    "bigram_pmi",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {TOKENIZE_SQL} AS toks FROM documents
), uni AS (
  SELECT unnest(toks) AS x FROM t
), c1 AS (
  SELECT x, count(*) AS c FROM uni GROUP BY x
), n1 AS (
  SELECT count(*) AS n FROM uni
), big AS (
  SELECT tok || ' ' || lead(tok, 1) OVER w AS g
  FROM (SELECT doc_id, unnest(toks) AS tok,
               generate_subscripts(toks, 1) AS pos FROM t)
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(tok, 1) OVER w IS NOT NULL
), c2 AS (
  SELECT g, count(*) AS c FROM big GROUP BY g
), n2 AS (
  SELECT count(*) AS n FROM big
), scored AS (
  SELECT c2.g AS bigram,
    CAST(c2.c AS BIGINT) AS c_xy,
    CAST(round(ln(CAST(c2.c AS DOUBLE) * n1.n * n1.n
                  / (CAST(n2.n AS DOUBLE) * cx.c * cy.c)), 4) AS DOUBLE)
      AS pmi
  FROM c2
  JOIN c1 cx ON cx.x = string_split(c2.g, ' ')[1]
  JOIN c1 cy ON cy.x = string_split(c2.g, ' ')[2]
  CROSS JOIN n1 CROSS JOIN n2
  WHERE c2.c >= {_PMI_MIN_COUNT}
)
SELECT bigram, c_xy, pmi,
  CAST(row_number() OVER (ORDER BY pmi DESC, bigram ASC) AS BIGINT) AS rank
FROM (SELECT * FROM scored ORDER BY pmi DESC, bigram ASC LIMIT {_PMI_TOPK})
""",
)
def bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokenize(F.col("text")).alias("toks"))
    uni = t.select(F.explode(F.col("toks")).alias("x"))
    c1 = uni.groupBy("x").agg(F.count(F.lit(1)).alias("c"))
    n1 = uni.agg(F.count(F.lit(1)).alias("n1"))
    big = t.select(
        F.explode(word_ngrams(F.col("toks"), 2)).alias("g")
    )
    c2 = big.groupBy("g").agg(F.count(F.lit(1)).alias("c_xy"))
    n2 = big.agg(F.count(F.lit(1)).alias("n2"))
    cand = (
        c2.filter(F.col("c_xy") >= _PMI_MIN_COUNT)
        .withColumn("xtok", F.split(F.col("g"), " ")[0])
        .withColumn("ytok", F.split(F.col("g"), " ")[1])
        .join(
            c1.select(F.col("x").alias("xtok"), F.col("c").alias("c_x")),
            "xtok",
        )
        .join(
            c1.select(F.col("x").alias("ytok"), F.col("c").alias("c_y")),
            "ytok",
        )
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
    )
    # Same left-associative double tree as the oracle: (((cxy·n1)·n1) /
    # ((n2·cx)·cy)) — element order matters for IEEE bit-equality.
    pmi = F.round(
        F.log(
            F.col("c_xy").cast("double") * F.col("n1") * F.col("n1")
            / (F.col("n2").cast("double") * F.col("c_x") * F.col("c_y"))
        ),
        4,
    ).cast("double")
    top = (
        cand.select(F.col("g").alias("bigram"), "c_xy", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("bigram").asc())
        .limit(_PMI_TOPK)
    )
    # unpartitioned window bound: runs over the LIMIT-_PMI_TOPK cut
    w = Window.orderBy(F.col("pmi").desc(), F.col("bigram").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


# ---------------------------------------------------------------------------
# langid_confusion — the language-ID quality report: confusion matrix
# of labeled vs predicted language over the corpus. Composes the
# text_langid classifier (same registered expression — the oracle
# wraps text_langid's oracle as a subquery, so the two can never
# drift) into the per-pair counts a curation run reviews before
# trusting the classifier's routing decisions.
#
# Scale shape: classification is the map-only langid expression; the
# rollup is a ≤ |langs|² -row aggregate with map-side combine.
# ---------------------------------------------------------------------------


@register(
    "langid_confusion",
    oracle=None,  # assigned below: wraps text_langid's oracle verbatim
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = text_langid(spark, sf_dir)
    return (
        pred.groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "is_correct", F.col("labeled_lang") == F.col("predicted_lang")
        )
    )


from bpaotu_spark.registry import ORACLES as _ORACLES  # noqa: E402

_ORACLES["langid_confusion"] = f"""
SELECT labeled_lang, predicted_lang,
  count(*) AS n_docs,
  labeled_lang = predicted_lang AS is_correct
FROM ({_ORACLES["text_langid"]}) p
GROUP BY labeled_lang, predicted_lang
"""


# ---------------------------------------------------------------------------
# source_quality_report — per-source curation scoreboard: document
# count and quality-gate pass rate for every (source, lang) cell.
# The report a pipeline reviews before deciding which crawls/feeds to
# keep, downweight, or drop. Composes the registered text_quality
# gate (oracle embeds its oracle — zero drift) joined back to the
# document routing columns; counts only (BIGINT, never HUGEINT),
# pass rate as integer ppm.
#
# Scale shape: the gate is the map-only quality expression; the join
# back to documents is keyed on doc_id (1:1); the rollup is a
# |sources|x|langs| aggregate with map-side combine.
# ---------------------------------------------------------------------------


def _source_quality_oracle() -> str:
    from bpaotu_spark.registry import ORACLES

    return f"""
WITH q AS ({ORACLES["text_quality"]})
SELECT d.source, d.lang,
  count(*) AS n_docs,
  count(*) FILTER (WHERE q.passes_quality) AS n_pass,
  count(*) FILTER (WHERE q.passes_quality) * 1000000 // count(*) AS pass_ppm
FROM q JOIN documents d ON q.doc_id = d.doc_id
GROUP BY d.source, d.lang
"""


@register("source_quality_report", oracle=_source_quality_oracle())
def source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = text_quality(spark, sf_dir).select("doc_id", "passes_quality")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    )
    return (
        q.join(docs, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("passes_quality"), F.lit(1))).alias(
                "n_pass"
            ),
        )
        .withColumn(
            "pass_ppm", F.expr("CAST(n_pass * 1000000 DIV n_docs AS BIGINT)")
        )
    )


# ---------------------------------------------------------------------------
# corpus_length_token_corr — Pearson correlation between document
# character length and token count (plus the regression slope): the
# sanity statistic behind using cheap n_chars as a proxy for token
# budget in sampling/packing decisions. If r is low, chars-based
# heuristics are lying to you.
#
# Exactness: both variables are INTEGERS, so all five sufficient
# statistics (Σx, Σy, Σxy, Σx², Σy²) are exact BIGINT sums — no
# float summation-order skew at any scale; the oracle CASTs each
# HUGEINT sum back to BIGINT. The final r/slope convert the exact
# integers through the identical double expression tree, rounded 4 dp.
# One map-side-combined aggregate — a single scan, one 1-row result.
# ---------------------------------------------------------------------------

_CORR_R = (
    "round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    " * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 4)"
)
_CORR_SLOPE = (
    "round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 4)"
)


@register(
    "corpus_length_token_corr",
    oracle=f"""
WITH d AS (
  SELECT CAST(length(text) AS BIGINT) AS x,
         CAST(len({TOKENIZE_SQL}) AS BIGINT) AS y
  FROM documents
), s AS (
  SELECT count(*) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * y) AS BIGINT) AS sxy,
    CAST(sum(x * x) AS BIGINT) AS sxx,
    CAST(sum(y * y) AS BIGINT) AS syy
  FROM d
)
SELECT n AS n_docs,
  CAST({_CORR_R} AS DOUBLE) AS pearson_r,
  CAST({_CORR_SLOPE} AS DOUBLE) AS tokens_per_char_slope
FROM s
""",
)
def corpus_length_token_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        F.length("text").cast("bigint").alias("x"),
        F.size(tokenize(F.col("text"))).cast("bigint").alias("y"),
    )
    s = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return s.select(
        F.col("n").alias("n_docs"),
        F.expr(_CORR_R).cast("double").alias("pearson_r"),
        F.expr(_CORR_SLOPE).cast("double").alias("tokens_per_char_slope"),
    )


# ---------------------------------------------------------------------------
# text_bigram_logloss — the bigram-LM upgrade of text_unigram_logloss:
# per-doc cross-entropy under the corpus bigram model
# P(w2 | w1) = c(w1 w2) / c(w1 ·), in exact integer micro-nats (same
# floor(-ln·1e6) discipline — both engines evaluate ln on the identical
# rational, so the floored integer matches bit-exactly). Docs shorter
# than 2 tokens have no bigrams and drop out in both engines. The
# unigram-vs-bigram logloss gap per doc is the classic fluency signal
# (high gap = token salad; low gap = natural phrase structure).
#
# Scale shape: one explode keyed by bigram (shuffle 1), prefix counts
# derived by re-aggregating the bigram counts (shuffle 2 on w1 — input
# one row per DISTINCT bigram, far smaller than the corpus), then a
# per-doc aggregation. No window, no driver collect.
# ---------------------------------------------------------------------------

_BIGRAMS_SQL = f"""
btoks AS (
  SELECT doc_id, {TOKENIZE_SQL} AS t FROM documents
), big AS (
  SELECT doc_id, tok || ' ' || lead(tok, 1) OVER w AS g
  FROM (SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
        FROM btoks)
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(tok, 1) OVER w IS NOT NULL
)
""".strip()


@register(
    "text_bigram_logloss",
    oracle=f"""
WITH {_BIGRAMS_SQL},
tf AS (
  SELECT doc_id, g, count(*) AS tf FROM big GROUP BY doc_id, g
),
bc AS (
  SELECT g, count(*) AS c FROM big GROUP BY g
),
pc AS (
  SELECT string_split(g, ' ')[1] AS w1, CAST(sum(c) AS BIGINT) AS cp
  FROM bc GROUP BY 1
),
cost AS (
  SELECT g,
    CAST(floor(-ln(c * 1.0 / cp) * 1000000) AS BIGINT) AS cost_micro
  FROM bc JOIN pc ON string_split(g, ' ')[1] = w1
)
SELECT tf.doc_id,
  CAST(sum(tf) AS BIGINT) AS n_bigrams,
  CAST(sum(tf * cost_micro) AS BIGINT) AS total_cost_micronats,
  CAST(sum(tf * cost_micro) AS BIGINT) // CAST(sum(tf) AS BIGINT)
    AS avg_logloss_micronats
FROM tf JOIN cost USING (g)
GROUP BY tf.doc_id
""",
)
def text_bigram_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from bpaotu_spark.catalog import widen_scan

    # tokenize+explode is the heavy pre-shuffle work and the
    # single-row-group scan runs it in ONE task (guide §2.5; r15
    # scaling ratio 1.06) — widen first, no-op on a parallel scan
    x = widen_scan(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", F.explode(word_ngrams(tokenize(F.col("text")), 2)).alias("g")
    )
    # tf is materialized ONCE and every LM statistic derives from it:
    # bc = Σ_doc tf (algebraically the corpus bigram count) and pc from
    # bc — without the checkpoint, tf/bc were two consumers of the
    # exploded-bigram subtree and Catalyst re-ran the full tokenize→
    # explode per consumer (measured 7.0s → 5.8s at sf0.1; the
    # remaining cost is the single inherent bigram explode+shuffle).
    # tf is the distinct (doc, bigram) table — far smaller than the
    # occurrence stream being exploded.
    tf = (
        x.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    bc = tf.groupBy("g").agg(F.sum("tf").alias("c"))
    # prefix counts re-aggregate the (small) distinct-bigram table, not
    # the corpus: c(w1 ·) = Σ_g c(g) over bigrams starting with w1
    pc = bc.groupBy(
        F.split("g", " ")[0].alias("w1")
    ).agg(F.sum("c").cast("bigint").alias("cp"))
    cost = bc.join(pc, F.split(bc.g, " ")[0] == pc.w1).select(
        "g",
        F.floor(-F.log(F.col("c") * 1.0 / F.col("cp")) * 1000000)
        .cast("bigint")
        .alias("cost_micro"),
    )
    return (
        tf.join(cost, "g")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("cost_micro")).alias(
                "total_cost_micronats"
            ),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "total_cost_micronats",
            F.expr("total_cost_micronats div n_bigrams").alias(
                "avg_logloss_micronats"
            ),
        )
    )


# ---------------------------------------------------------------------------
# text_token_entropy — per-document token-distribution entropy (the
# vocabulary-richness signal: templated/boilerplate text has low
# entropy, natural prose sits near the corpus mode) plus the type-token
# ratio. Emitted as n·H in integer micro-nats:
#     n·H = n·ln(n) − Σ_c tf_c·ln(tf_c)
# with every ln() floored into micro-nats BEFORE any aggregation — the
# text_unigram_logloss discipline — so all sums are integer and
# summation order can never flip the hash. ln() runs once per DISTINCT
# count value (a tiny table: counts ≤ max tf), never per row.
#
# Scale shape: explode → (doc, token) tf groupBy (map-side combine);
# the ln lookup joins on the count value (bounded key space); one
# doc-keyed re-aggregation. No windows.
# ---------------------------------------------------------------------------


@register(
    "text_token_entropy",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {TOKENIZE_SQL} AS toks FROM documents
), x AS (
  SELECT doc_id, unnest(toks) AS token FROM t
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM x GROUP BY doc_id, token
), lncost AS (
  SELECT tf AS cval,
    CAST(floor(ln(CAST(tf AS DOUBLE)) * 1000000) AS BIGINT) AS ln_micro
  FROM (SELECT DISTINCT tf FROM tf)
), per_doc AS (
  SELECT doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
    CAST(count(*) AS BIGINT) AS n_types,
    CAST(sum(tf.tf * ln_micro) AS BIGINT) AS sum_c_lnc
  FROM tf JOIN lncost ON tf.tf = lncost.cval
  GROUP BY doc_id
), nln AS (
  SELECT n_tokens AS nval,
    CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
      AS lnn_micro
  FROM (SELECT DISTINCT n_tokens FROM per_doc)
)
SELECT doc_id, n_tokens, n_types,
  CAST(n_tokens * lnn_micro - sum_c_lnc AS BIGINT) AS nH_micronats,
  CAST(CAST(n_types AS HUGEINT) * 1000000 // n_tokens AS BIGINT)
    AS type_token_ppm
FROM per_doc JOIN nln ON per_doc.n_tokens = nln.nval
""",
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("token"))
    tf = x.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    lncost = (
        tf.select("tf").distinct().select(
            F.col("tf").alias("cval"),
            F.floor(F.log(F.col("tf").cast("double")) * 1000000)
            .cast("bigint")
            .alias("ln_micro"),
        )
    )
    per_doc = (
        tf.join(F.broadcast(lncost), tf.tf == lncost.cval)
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum(F.col("tf") * F.col("ln_micro"))
            .cast("bigint")
            .alias("sum_c_lnc"),
        )
    )
    nln = per_doc.select("n_tokens").distinct().select(
        F.col("n_tokens").alias("nval"),
        F.floor(F.log(F.col("n_tokens").cast("double")) * 1000000)
        .cast("bigint")
        .alias("lnn_micro"),
    )
    return (
        per_doc.join(F.broadcast(nln), per_doc.n_tokens == nln.nval)
        .select(
            "doc_id",
            "n_tokens",
            "n_types",
            (F.col("n_tokens") * F.col("lnn_micro") - F.col("sum_c_lnc"))
            .cast("bigint")
            .alias("nH_micronats"),
            F.expr(
                "CAST(CAST(n_types AS DECIMAL(38,0)) * 1000000"
                " DIV n_tokens AS BIGINT)"
            ).alias("type_token_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# corpus_perplexity_filter — the CCNet-style perplexity gate: bucket
# every document into per-language loss deciles under the corpus
# unigram LM (composing the registered text_unigram_logloss oracle as a
# CTE — zero drift), keep deciles 1-9, drop the worst 10%. The report
# is the per-(lang, decile) census a curation run reviews before
# committing the gate.
#
# Determinism: decile = ntile(10) over (lang ORDER BY
# avg_logloss_micronats, doc_id) — integer loss + doc_id tie-break is a
# total order, and ntile's bucket-size rule (first n mod 10 buckets one
# larger) is the SQL standard in both engines.
#
# Scale shape: the decile assignment is a per-language sorted window —
# languages proceed in parallel but one language is one sort. That is
# inherent to EXACT deciles; the 100 TB deployment swaps the ntile for
# approx-quantile boundaries broadcast to a map-only filter (the same
# report shape), keeping this exact form as its calibration oracle on
# a sample.
# ---------------------------------------------------------------------------

_PPL_KEEP_DECILES = 9

_ORACLES["corpus_perplexity_filter"] = f"""
WITH ll AS ({_ORACLES["text_unigram_logloss"]}),
j AS (
  SELECT ll.doc_id, d.lang, ll.avg_logloss_micronats
  FROM ll JOIN documents d ON ll.doc_id = d.doc_id
),
deciled AS (
  SELECT lang, avg_logloss_micronats,
    CAST(ntile(10) OVER (PARTITION BY lang
         ORDER BY avg_logloss_micronats ASC, doc_id ASC) AS INTEGER) AS decile
  FROM j
)
SELECT lang, decile,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(min(avg_logloss_micronats) AS BIGINT) AS min_logloss_micronats,
  CAST(max(avg_logloss_micronats) AS BIGINT) AS max_logloss_micronats,
  decile <= {_PPL_KEEP_DECILES} AS kept
FROM deciled GROUP BY lang, decile
"""


@register("corpus_perplexity_filter", oracle=_ORACLES["corpus_perplexity_filter"])
def corpus_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ll = text_unigram_logloss(spark, sf_dir).select(
        "doc_id", "avg_logloss_micronats"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = ll.join(docs, "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.col("avg_logloss_micronats").asc(), F.col("doc_id").asc()
    )
    return (
        j.withColumn("decile", F.ntile(10).over(w).cast("int"))
        .groupBy("lang", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("avg_logloss_micronats")
            .cast("bigint")
            .alias("min_logloss_micronats"),
            F.max("avg_logloss_micronats")
            .cast("bigint")
            .alias("max_logloss_micronats"),
        )
        .withColumn("kept", F.col("decile") <= _PPL_KEEP_DECILES)
    )


# ---------------------------------------------------------------------------
# token_rate_drift — distribution-drift monitor between two corpus
# slices (here: even vs odd doc_id, standing in for yesterday's batch
# vs today's): per-token occurrence rates in each slice and the top-20
# tokens by absolute rate delta. The pipeline-monitoring primitive that
# catches a source change / scraper regression before it poisons
# training data.
#
# Determinism: rates are floored integer per-million-token units
# BEFORE the delta, so the ranking is pure integer arithmetic.
#
# Scale shape: one map-side-combined (slice, token) aggregate off the
# token explode, a token-keyed pivot via conditional sums, broadcast
# 1-row slice totals, and a TakeOrdered top-20 — no windows over
# unbounded partitions.
# ---------------------------------------------------------------------------

_DRIFT_TOPK = 20
_DRIFT_MIN_COUNT = 5  # ignore tokens too rare to measure in either slice

_ORACLES["token_rate_drift"] = f"""
WITH toks AS (
  SELECT doc_id % 2 AS slice, unnest({TOKENIZE_SQL}) AS token
  FROM documents
),
tc AS (
  SELECT token,
    CAST(sum(CASE WHEN slice = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN slice = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM toks GROUP BY token
),
tot AS (
  SELECT CAST(sum(n_a) AS BIGINT) AS na_tot, CAST(sum(n_b) AS BIGINT) AS nb_tot
  FROM tc
),
rates AS (
  SELECT token, n_a, n_b,
    CAST(CAST(n_a AS HUGEINT) * 1000000 // na_tot AS BIGINT) AS rate_a_ppm,
    CAST(CAST(n_b AS HUGEINT) * 1000000 // nb_tot AS BIGINT) AS rate_b_ppm
  FROM tc, tot
  WHERE n_a + n_b >= {_DRIFT_MIN_COUNT}
)
SELECT token, n_a, n_b, rate_a_ppm, rate_b_ppm,
  CAST(abs(rate_a_ppm - rate_b_ppm) AS BIGINT) AS drift_ppm,
  CAST(row_number() OVER (ORDER BY abs(rate_a_ppm - rate_b_ppm) DESC,
       token ASC) AS INTEGER) AS rnk
FROM rates
ORDER BY drift_ppm DESC, token ASC
LIMIT {_DRIFT_TOPK}
"""


@register("token_rate_drift", oracle=_ORACLES["token_rate_drift"])
def token_rate_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % 2).alias("slice"),
        F.explode(tokenize(F.col("text"))).alias("token"),
    )
    tc = toks.groupBy("token").agg(
        F.sum(F.when(F.col("slice") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("slice") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    tot = tc.agg(
        F.sum("n_a").cast("bigint").alias("na_tot"),
        F.sum("n_b").cast("bigint").alias("nb_tot"),
    )
    rates = (
        tc.filter(F.col("n_a") + F.col("n_b") >= _DRIFT_MIN_COUNT)
        .crossJoin(F.broadcast(tot))
        .select(
            "token",
            "n_a",
            "n_b",
            F.expr(
                "CAST(CAST(n_a AS DECIMAL(38,0)) * 1000000 DIV na_tot"
                " AS BIGINT)"
            ).alias("rate_a_ppm"),
            F.expr(
                "CAST(CAST(n_b AS DECIMAL(38,0)) * 1000000 DIV nb_tot"
                " AS BIGINT)"
            ).alias("rate_b_ppm"),
        )
    )
    drift = F.abs(F.col("rate_a_ppm") - F.col("rate_b_ppm")).cast("bigint")
    top = (
        rates.withColumn("drift_ppm", drift)
        .orderBy(F.col("drift_ppm").desc(), F.col("token").asc())
        .limit(_DRIFT_TOPK)
    )
    # unpartitioned window bound: runs over the LIMIT-_DRIFT_TOPK cut
    w = Window.orderBy(F.col("drift_ppm").desc(), F.col("token").asc())
    return top.withColumn("rnk", F.row_number().over(w).cast("int"))


# ---------------------------------------------------------------------------
# heldout_bigram_perplexity — the real LM-eval loop in miniature:
# TRAIN an add-one-smoothed bigram model on a deterministic ~80% md5
# split of the corpus, SCORE the held-out 20% with it, and report
# per-language held-out cost in micro-nats. Distinct from
# text_bigram_logloss (which self-scores the full corpus with its own
# statistics — a compression measure, not an eval): here unseen
# bigrams and unseen history words genuinely occur and the smoothing
# (c2+1)/(c1+V) has to absorb them, which is exactly what a
# decontaminated eval measures.
#
# Scale shape: one explode per split half; train counts are (doc,
# token)-keyed map-combined groupBys; scoring is two LEFT joins keyed
# on the bigram and the history word (high-cardinality, even), V is a
# broadcast 1-row scalar; per-language rollup at the end. All costs
# floored to integer micro-nats per pair before any aggregation.
# ---------------------------------------------------------------------------

_HOLDOUT_TRAIN_BUCKETS = 13  # md5 first hex digit < 13 → ~81% train


_SPLIT_SQL = (
    "(strpos('0123456789abcdef',"
    " substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)"
)


@register(
    "heldout_bigram_perplexity",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, {TOKENIZE_SQL} AS toks,
    {_SPLIT_SQL} < {_HOLDOUT_TRAIN_BUCKETS} AS is_train
  FROM documents
), x AS (
  SELECT doc_id, lang, is_train, tok,
    lead(tok) OVER w AS nxt
  FROM (SELECT doc_id, lang, is_train, unnest(toks) AS tok,
               generate_subscripts(toks, 1) AS pos FROM t)
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), uni AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c1 FROM x
  WHERE is_train GROUP BY tok
), bi AS (
  SELECT tok, nxt, CAST(count(*) AS BIGINT) AS c2 FROM x
  WHERE is_train AND nxt IS NOT NULL GROUP BY tok, nxt
), v AS (
  SELECT CAST(count(*) AS BIGINT) AS vsize FROM uni
), scored AS (
  SELECT h.lang, h.doc_id,
    CAST(floor(-ln(CAST(coalesce(bi.c2, 0) + 1 AS DOUBLE)
      / CAST(coalesce(uni.c1, 0) + vsize AS DOUBLE)) * 1000000)
      AS BIGINT) AS cost_micro
  FROM x h
  LEFT JOIN bi ON h.tok = bi.tok AND h.nxt = bi.nxt
  LEFT JOIN uni ON h.tok = uni.tok
  CROSS JOIN v
  WHERE NOT h.is_train AND h.nxt IS NOT NULL
)
SELECT lang,
  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_heldout_docs,
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(sum(cost_micro) AS BIGINT) AS total_cost_micronats,
  CAST(sum(cost_micro) AS BIGINT) // CAST(count(*) AS BIGINT)
    AS avg_cost_micronats
FROM scored GROUP BY lang
""",
)
def heldout_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        tokenize(F.col("text")).alias("toks"),
        (
            (
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
                    16,
                    10,
                ).cast("int")
            )
            < _HOLDOUT_TRAIN_BUCKETS
        ).alias("is_train"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    x = docs.select(
        "doc_id", "lang", "is_train", F.posexplode("toks").alias("pos", "tok")
    ).select(
        "doc_id",
        "lang",
        "is_train",
        "tok",
        F.lead("tok").over(w).alias("nxt"),
    )
    x = x.localCheckpoint()  # one tokenize pass feeds train AND heldout
    uni = (
        x.filter("is_train").groupBy("tok").agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = (
        x.filter(F.col("is_train") & F.col("nxt").isNotNull())
        .groupBy("tok", "nxt")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    v = uni.agg(F.count(F.lit(1)).alias("vsize"))
    h = x.filter(~F.col("is_train") & F.col("nxt").isNotNull())
    scored = (
        h.join(bi, ["tok", "nxt"], "left")
        .join(uni, "tok", "left")
        .crossJoin(F.broadcast(v))
        .select(
            "lang",
            "doc_id",
            F.floor(
                -F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("vsize")).cast(
                        "double"
                    )
                )
                * 1000000
            )
            .cast("bigint")
            .alias("cost_micro"),
        )
    )
    return scored.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_heldout_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("cost_micro").alias("total_cost_micronats"),
        F.expr("sum(cost_micro) div count(*)").alias("avg_cost_micronats"),
    )


# ---------------------------------------------------------------------------
# kneser_ney_bigram_ppl — interpolated Kneser-Ney held-out perplexity
# (Kneser & Ney '95; Chen & Goodman '98 the canonical smoothing for
# n-gram LMs): discount D = 3/4 (binary-exact) off every seen bigram,
# redistributed over the CONTINUATION distribution
# p_cont(w) ∝ N1+(·w) — "how many contexts does w complete" — which is
# what separates KN from the add-one baseline
# (heldout_bigram_perplexity): frequent-but-context-bound words (e.g.
# "Francisco") stop stealing mass. Deviations, documented: p_cont is
# add-one smoothed over (B + V) so held-out-only words keep nonzero
# mass, and unseen contexts back off to p_cont directly. Same doc-
# parity split as the baseline op, so the two rows are comparable
# per-language.
#
# Determinism: every model quantity is an exact integer count; the
# per-pair cost is ONE float expression (D exact in binary) floored to
# micro-nats; sums are integer. Scale shape: counts are map-side
# combinable; scoring is three broadcast-sized lookups (bigram table,
# context table, continuation table) + a 1-row constant.
# ---------------------------------------------------------------------------


@register(
    "kneser_ney_bigram_ppl",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, {TOKENIZE_SQL} AS toks,
    {_SPLIT_SQL} < {_HOLDOUT_TRAIN_BUCKETS} AS is_train
  FROM documents
), x AS (
  SELECT doc_id, lang, is_train, tok,
    lead(tok) OVER w AS nxt
  FROM (SELECT doc_id, lang, is_train, unnest(toks) AS tok,
               generate_subscripts(toks, 1) AS pos FROM t)
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), bi AS (
  SELECT tok, nxt, CAST(count(*) AS BIGINT) AS c2 FROM x
  WHERE is_train AND nxt IS NOT NULL GROUP BY tok, nxt
), ctx AS (
  SELECT tok, CAST(sum(c2) AS BIGINT) AS cv,
    CAST(count(*) AS BIGINT) AS n1p_v
  FROM bi GROUP BY tok
), cont AS (
  SELECT nxt AS w, CAST(count(*) AS BIGINT) AS n1p_w FROM bi GROUP BY nxt
), consts AS (
  SELECT CAST(count(*) AS BIGINT) AS b,
    CAST(count(DISTINCT tok) AS BIGINT) AS vsize
  FROM bi
), scored AS (
  SELECT h.lang, h.doc_id,
    CAST(floor(-ln(
      CASE WHEN coalesce(ctx.cv, 0) > 0 THEN
        (greatest(CAST(coalesce(bi.c2, 0) AS DOUBLE) - 0.75, 0.0)
         + 0.75 * ctx.n1p_v
           * (CAST(coalesce(cont.n1p_w, 0) + 1 AS DOUBLE) / (b + vsize)))
        / CAST(ctx.cv AS DOUBLE)
      ELSE
        CAST(coalesce(cont.n1p_w, 0) + 1 AS DOUBLE) / (b + vsize)
      END) * 1000000) AS BIGINT) AS cost_micro
  FROM x h
  LEFT JOIN bi ON h.tok = bi.tok AND h.nxt = bi.nxt
  LEFT JOIN ctx ON h.tok = ctx.tok
  LEFT JOIN cont ON h.nxt = cont.w
  CROSS JOIN consts
  WHERE NOT h.is_train AND h.nxt IS NOT NULL
)
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(sum(cost_micro) AS BIGINT) AS total_cost_micronats,
  CAST(sum(cost_micro) AS BIGINT) // CAST(count(*) AS BIGINT)
    AS avg_cost_micronats
FROM scored GROUP BY lang
""",
)
def kneser_ney_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        tokenize(F.col("text")).alias("toks"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
                16,
                10,
            ).cast("int")
            < _HOLDOUT_TRAIN_BUCKETS
        ).alias("is_train"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    x = docs.select(
        "doc_id", "lang", "is_train", F.posexplode("toks").alias("pos", "tok")
    ).select(
        "doc_id",
        "lang",
        "is_train",
        "tok",
        F.lead("tok").over(w).alias("nxt"),
    )
    x = x.localCheckpoint()  # one tokenize pass feeds train AND heldout
    bi = (
        x.filter(F.col("is_train") & F.col("nxt").isNotNull())
        .groupBy("tok", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    )
    bi = bi.localCheckpoint()  # feeds ctx, cont, consts, and scoring
    ctx = bi.groupBy("tok").agg(
        F.sum("c2").cast("bigint").alias("cv"),
        F.count(F.lit(1)).cast("bigint").alias("n1p_v"),
    )
    cont = bi.groupBy(F.col("nxt").alias("w_")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n1p_w")
    )
    consts = bi.agg(
        F.count(F.lit(1)).cast("bigint").alias("b"),
        F.countDistinct("tok").cast("bigint").alias("vsize"),
    )
    h = x.filter(~F.col("is_train") & F.col("nxt").isNotNull())
    scored = (
        h.join(bi.withColumnRenamed("c2", "c2_"), ["tok", "nxt"], "left")
        .join(ctx, "tok", "left")
        .join(cont, h.nxt == F.col("w_"), "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "lang",
            F.expr(
                "CAST(floor(-ln("
                " CASE WHEN coalesce(cv, 0) > 0 THEN"
                "  (greatest(CAST(coalesce(c2_, 0) AS DOUBLE) - 0.75, 0.0)"
                "   + 0.75 * n1p_v"
                "     * (CAST(coalesce(n1p_w, 0) + 1 AS DOUBLE)"
                "        / (b + vsize)))"
                "  / CAST(cv AS DOUBLE)"
                " ELSE"
                "  CAST(coalesce(n1p_w, 0) + 1 AS DOUBLE) / (b + vsize)"
                " END) * 1000000) AS BIGINT)"
            ).alias("cost_micro"),
        )
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("cost_micro").cast("bigint").alias("total_cost_micronats"),
        F.expr(
            "CAST(sum(cost_micro) AS BIGINT)"
            " div CAST(count(1) AS BIGINT)"
        ).alias("avg_cost_micronats"),
    )
