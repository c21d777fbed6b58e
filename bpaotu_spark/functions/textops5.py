"""Round-8 corpus-forensics additions.

Three checks a training-data pipeline runs between dedup and packing:

* ``dedup_splice_pairs`` — prefix/suffix splice census: documents
  whose leading 64 chars equal another document's trailing 64 chars
  are candidate splices/continuations (the cross-shard contamination
  shape that exact-dup md5 and shingle Jaccard both miss when the
  overlap is a small fraction of each doc). Blocked on md5 of the
  64-char edge (never all-pairs), verified on the raw strings,
  reported as a bounded per-source-pair census.
* ``corpus_char_trigram_entropy`` — per-language character-trigram
  Shannon entropy: the classic language-model-free fluency/garbage
  signal (gibberish and binary-ish text collapse the trigram
  distribution). Per-term micro-floor BEFORE the sum keeps the
  aggregate an exact integer (summation-order-free).
* ``doc_script_mix`` — per-document character-class composition
  (letters / digits / whitespace / other) via global regexp strips,
  rolled into a per-language alpha-share-decile census — the cheap
  mixed-script / boilerplate-table detector run before tokenizer
  work is spent.

Scale shape: splice blocking joins on a 32-hex key (shuffle on the
hash, bounded buckets); trigram explode is map-side (sequence +
substring stays inside whole-stage codegen — no higher-order lambda);
script mix is one map-only pass + a keyed census aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register

_EDGE = 24  # edge width (chars): shared openings fire at this width


@register(
    "dedup_splice_pairs",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source, text FROM documents WHERE length(text) >= {_EDGE}
),
pre AS (
  SELECT doc_id, source, substr(text, 1, {_EDGE}) AS edge,
    md5(substr(text, 1, {_EDGE})) AS h
  FROM d
),
suf AS (
  SELECT doc_id, source,
    substr(text, length(text) - {_EDGE} + 1, {_EDGE}) AS edge,
    md5(substr(text, length(text) - {_EDGE} + 1, {_EDGE})) AS h
  FROM d
),
pairs AS (
  SELECT 'ps' AS kind, p.doc_id AS doc_a, s.doc_id AS doc_b,
    p.source AS source_a, s.source AS source_b
  FROM pre p JOIN suf s ON p.h = s.h AND p.doc_id != s.doc_id
  WHERE p.edge = s.edge
  UNION ALL
  SELECT 'pp' AS kind, a.doc_id, b.doc_id, a.source, b.source
  FROM pre a JOIN pre b ON a.h = b.h AND a.doc_id < b.doc_id
  WHERE a.edge = b.edge
)
SELECT kind, source_a, source_b,
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(count(DISTINCT doc_a) AS BIGINT) AS n_a_docs,
  CAST(count(DISTINCT doc_b) AS BIGINT) AS n_b_docs
FROM pairs
GROUP BY kind, source_a, source_b
ORDER BY kind, source_a, source_b
""",
)
def dedup_splice_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-overlap census per source pair: 'ps' = one doc's leading
    edge equals another's trailing edge (splice/continuation), 'pp' =
    two docs share their opening edge (boilerplate header family)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= _EDGE
    )
    pre = d.select(
        F.col("doc_id").alias("pre_doc"),
        F.col("source").alias("pre_source"),
        F.substring("text", 1, _EDGE).alias("pre_edge"),
        F.md5(F.substring("text", 1, _EDGE)).alias("h"),
    )
    suf_edge = F.expr(
        f"substring(text, length(text) - {_EDGE} + 1, {_EDGE})"
    )
    suf = d.select(
        F.col("doc_id").alias("suf_doc"),
        F.col("source").alias("suf_source"),
        suf_edge.alias("suf_edge"),
        F.md5(suf_edge).alias("h"),
    )
    ps = (
        pre.join(suf, "h")
        .filter(
            (F.col("pre_doc") != F.col("suf_doc"))
            & (F.col("pre_edge") == F.col("suf_edge"))
        )
        .select(
            F.lit("ps").alias("kind"),
            F.col("pre_doc").alias("doc_a"),
            F.col("suf_doc").alias("doc_b"),
            F.col("pre_source").alias("source_a"),
            F.col("suf_source").alias("source_b"),
        )
    )
    pre_b = pre.select(
        F.col("pre_doc").alias("b_doc"),
        F.col("pre_source").alias("b_source"),
        F.col("pre_edge").alias("b_edge"),
        "h",
    )
    pp = (
        pre.join(pre_b, "h")
        .filter(
            (F.col("pre_doc") < F.col("b_doc"))
            & (F.col("pre_edge") == F.col("b_edge"))
        )
        .select(
            F.lit("pp").alias("kind"),
            F.col("pre_doc").alias("doc_a"),
            F.col("b_doc").alias("doc_b"),
            F.col("pre_source").alias("source_a"),
            F.col("b_source").alias("source_b"),
        )
    )
    return (
        ps.unionByName(pp)
        .groupBy("kind", "source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.countDistinct("doc_a").cast("bigint").alias("n_a_docs"),
            F.countDistinct("doc_b").cast("bigint").alias("n_b_docs"),
        )
        .orderBy("kind", "source_a", "source_b")
    )


@register(
    "corpus_char_trigram_entropy",
    oracle="""
WITH g AS (
  SELECT lang, substr(text, CAST(i AS INTEGER), 3) AS g
  FROM (
    SELECT lang, text,
      unnest(generate_series(1, greatest(length(text) - 2, 0))) AS i
    FROM documents
  )
),
c AS (
  SELECT lang, g, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY lang, g
),
n AS (
  SELECT lang, CAST(sum(cnt) AS BIGINT) AS n,
    CAST(count(*) AS BIGINT) AS n_distinct
  FROM c GROUP BY lang
)
SELECT c.lang,
  max(n.n) AS n_trigrams,
  max(n.n_distinct) AS n_distinct,
  CAST(sum(CAST(floor((CAST(cnt AS DOUBLE) / n.n)
    * ln(CAST(n.n AS DOUBLE) / cnt) * 1000000) AS BIGINT)) AS BIGINT)
    AS h_micro
FROM c JOIN n ON c.lang = n.lang
GROUP BY c.lang
ORDER BY c.lang
""",
)
def corpus_char_trigram_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language char-trigram Shannon entropy (micro-nats; each
    p·ln(1/p) term floored to an integer BEFORE the sum, so the
    aggregate is summation-order-free across engines)."""
    docs = load_table(spark, sf_dir, "documents")
    # CASE guard, not greatest(...,0): Spark sequence(1, 0) yields a
    # DESCENDING [1, 0] (DuckDB generate_series(1, 0) yields nothing),
    # so an unguarded short doc would emit two phantom n-grams.
    from bpaotu_spark.catalog import widen_scan

    # trigram explode on a single-row-group scan (guide §2.5)
    g = widen_scan(docs.select("doc_id", "lang", "text"), "doc_id").select(
        "lang",
        F.expr(
            "explode(CASE WHEN length(text) >= 3"
            " THEN sequence(1, length(text) - 2) ELSE array() END)"
        ).alias("i"),
        "text",
    ).select("lang", F.expr("substring(text, i, 3)").alias("g"))
    c = g.groupBy("lang", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    n = c.groupBy("lang").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
    )
    return (
        c.join(F.broadcast(n), "lang")
        .groupBy("lang")
        .agg(
            F.max("n").alias("n_trigrams"),
            F.max("n_distinct").alias("n_distinct"),
            F.sum(
                F.expr(
                    "CAST(floor((CAST(cnt AS DOUBLE) / n)"
                    " * ln(CAST(n AS DOUBLE) / cnt) * 1000000) AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("h_micro"),
        )
        .orderBy("lang")
    )


@register(
    "doc_script_mix",
    oracle="""
WITH cls AS (
  SELECT doc_id, lang,
    CAST(length(text) AS BIGINT) AS n_all,
    CAST(length(text)
      - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT)
      AS n_alpha,
    CAST(length(text)
      - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
      AS n_digit,
    CAST(length(text)
      - length(regexp_replace(text, '[ ]', '', 'g')) AS BIGINT)
      AS n_space
  FROM documents WHERE length(text) > 0
),
b AS (
  SELECT lang,
    least((n_alpha * 10) // n_all, 9) AS alpha_decile,
    n_all, n_alpha, n_digit,
    n_all - n_alpha - n_digit - n_space AS n_other
  FROM cls
)
SELECT lang, alpha_decile,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_other) * 1000000 // sum(n_all) AS BIGINT) AS other_share_ppm,
  CAST(sum(n_digit) * 1000000 // sum(n_all) AS BIGINT) AS digit_share_ppm
FROM b GROUP BY lang, alpha_decile ORDER BY lang, alpha_decile
""",
)
def doc_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language character-class census by alpha-share decile
    (global regexp strips; Spark regexp_replace is global by default,
    the oracle passes the 'g' flag explicitly)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    cls = docs.select(
        "lang",
        F.length("text").cast("bigint").alias("n_all"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[A-Za-z]", ""))
        )
        .cast("bigint")
        .alias("n_alpha"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[0-9]", ""))
        )
        .cast("bigint")
        .alias("n_digit"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[ ]", ""))
        )
        .cast("bigint")
        .alias("n_space"),
    )
    b = cls.select(
        "lang",
        F.expr("least((n_alpha * 10) div n_all, CAST(9 AS BIGINT))").alias(
            "alpha_decile"
        ),
        "n_all",
        "n_digit",
        F.expr("n_all - n_alpha - n_digit - n_space").alias("n_other"),
    )
    return (
        b.groupBy("lang", "alpha_decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr(
                "CAST(sum(n_other) * 1000000 div sum(n_all) AS BIGINT)"
            ).alias("other_share_ppm"),
            F.expr(
                "CAST(sum(n_digit) * 1000000 div sum(n_all) AS BIGINT)"
            ).alias("digit_share_ppm"),
        )
        .orderBy("lang", "alpha_decile")
    )


# ---------------------------------------------------------------------------
# Round-8 batch 2: split drift, compressibility proxy, BPE seed merges.
# ---------------------------------------------------------------------------

from bpaotu_spark.functions.textops import TOKENIZE_SQL, tokenize  # noqa: E402
from bpaotu_spark.operators.pipeline import (  # noqa: E402
    hash_bucket,
    hash_bucket_sql,
)

_KL_TRAIN_LT = 80  # md5 bucket < 80 → train (the train_test_split line)


@register(
    "split_unigram_kl",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, unnest({TOKENIZE_SQL}) AS w FROM documents
),
t AS (
  SELECT lang, w,
    CASE WHEN {hash_bucket_sql('doc_id', 100)} < {_KL_TRAIN_LT}
      THEN 'train' ELSE 'held' END AS split
  FROM toks WHERE w != ''
),
c AS (
  SELECT lang, w,
    CAST(count(*) FILTER (WHERE split = 'train') AS BIGINT) AS c_t,
    CAST(count(*) FILTER (WHERE split = 'held') AS BIGINT) AS c_h
  FROM t GROUP BY lang, w
),
n AS (
  SELECT lang, CAST(sum(c_t) AS BIGINT) AS n_t,
    CAST(sum(c_h) AS BIGINT) AS n_h,
    CAST(count(*) AS BIGINT) AS v
  FROM c GROUP BY lang
)
SELECT c.lang, max(n.n_t) AS n_train_tokens, max(n.n_h) AS n_held_tokens,
  CAST(sum(CASE WHEN c_h > 0 THEN
    CAST(floor((CAST(c_h AS DOUBLE) / n.n_h)
      * ln((CAST(c_h AS DOUBLE) / n.n_h)
           / (CAST(c_t + 1 AS DOUBLE) / (n.n_t + n.v))) * 1000000)
      AS BIGINT) ELSE 0 END) AS BIGINT) AS kl_micro
FROM c JOIN n ON c.lang = n.lang
GROUP BY c.lang ORDER BY c.lang
""",
)
def split_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(held-out ‖ add-one-smoothed train) per language over the
    md5-split unigram distributions — the split-drift gate run before
    trusting held-out perplexity numbers. Per-term micro-floor before
    the sum keeps the aggregate exact."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(tokenize(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    t = toks.select(
        "lang",
        "w",
        F.when(
            hash_bucket(F.col("doc_id"), 100) < _KL_TRAIN_LT, "train"
        )
        .otherwise("held")
        .alias("split"),
    )
    c = t.groupBy("lang", "w").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("bigint")
        .alias("c_t"),
        F.sum(F.when(F.col("split") == "held", 1).otherwise(0))
        .cast("bigint")
        .alias("c_h"),
    )
    n = c.groupBy("lang").agg(
        F.sum("c_t").cast("bigint").alias("n_t"),
        F.sum("c_h").cast("bigint").alias("n_h"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    return (
        c.join(F.broadcast(n), "lang")
        .groupBy("lang")
        .agg(
            F.max("n_t").alias("n_train_tokens"),
            F.max("n_h").alias("n_held_tokens"),
            F.sum(
                F.expr(
                    "CASE WHEN c_h > 0 THEN"
                    " CAST(floor((CAST(c_h AS DOUBLE) / n_h)"
                    "   * ln((CAST(c_h AS DOUBLE) / n_h)"
                    "        / (CAST(c_t + 1 AS DOUBLE) / (n_t + v)))"
                    "   * 1000000) AS BIGINT) ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("kl_micro"),
        )
        .orderBy("lang")
    )


@register(
    "doc_fourgram_compressibility",
    oracle="""
WITH g AS (
  SELECT doc_id, lang, substr(text, CAST(i AS INTEGER), 4) AS g
  FROM (
    SELECT doc_id, lang, text,
      unnest(generate_series(1, greatest(length(text) - 3, 0))) AS i
    FROM documents
  )
),
d AS (
  SELECT doc_id, lang,
    CAST(count(*) AS BIGINT) AS n_total,
    CAST(count(DISTINCT g) AS BIGINT) AS n_distinct
  FROM g GROUP BY doc_id, lang
),
r AS (
  SELECT lang, n_distinct * 1000000 // n_total AS ratio_ppm,
    n_total, n_distinct
  FROM d
)
SELECT lang, least(ratio_ppm // 100000, 9) AS band,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_distinct) * 1000000 // sum(n_total) AS BIGINT)
    AS pooled_ratio_ppm
FROM r GROUP BY lang, band ORDER BY lang, band
""",
)
def doc_fourgram_compressibility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distinct/total char-4gram ratio per doc (a compressor-free
    compressibility proxy: repetitive text → low ratio), censused by
    per-language ratio band."""
    docs = load_table(spark, sf_dir, "documents")
    from bpaotu_spark.catalog import widen_scan

    # the 4-gram explode is the heavy pre-shuffle work on a
    # single-row-group scan (guide §2.5; r15 scaling ratio 1.08)
    g = widen_scan(docs.select("doc_id", "lang", "text"), "doc_id").select(
        "doc_id",
        "lang",
        F.expr(
            "explode(CASE WHEN length(text) >= 4"
            " THEN sequence(1, length(text) - 3) ELSE array() END)"
        ).alias("i"),
        "text",
    ).select("doc_id", "lang", F.expr("substring(text, i, 4)").alias("g"))
    d = g.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.countDistinct("g").cast("bigint").alias("n_distinct"),
    )
    r = d.select(
        "lang",
        F.expr("n_distinct * 1000000 div n_total").alias("ratio_ppm"),
        "n_total",
        "n_distinct",
    )
    return (
        r.groupBy(
            "lang",
            F.expr("least(ratio_ppm div 100000, CAST(9 AS BIGINT))").alias(
                "band"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr(
                "CAST(sum(n_distinct) * 1000000 div sum(n_total)"
                " AS BIGINT)"
            ).alias("pooled_ratio_ppm"),
        )
        .orderBy("lang", "band")
    )


_BPE_TOP = 20


@register(
    "bpe_merge_candidates",
    oracle=f"""
WITH p AS (
  SELECT substr(text, CAST(i AS INTEGER), 2) AS pair
  FROM (
    SELECT text,
      unnest(generate_series(1, greatest(length(text) - 1, 0))) AS i
    FROM documents
  )
),
c AS (
  SELECT pair, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY pair
),
r AS (
  SELECT pair, n,
    CAST(row_number() OVER (ORDER BY n DESC, pair ASC) AS BIGINT) AS rnk
  FROM c
  QUALIFY rnk <= {_BPE_TOP}
)
SELECT rnk, pair, n FROM r ORDER BY rnk
""",
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{top} adjacent character-pair merge candidates — the first
    BPE merge step's corpus census (byte-level convention: whitespace
    pairs count too). Deterministic (count desc, pair asc) cut via
    TakeOrdered-style window limit.""".format(top=_BPE_TOP)
    docs = load_table(spark, sf_dir, "documents")
    p = docs.select(
        F.expr(
            "explode(CASE WHEN length(text) >= 2"
            " THEN sequence(1, length(text) - 1) ELSE array() END)"
        ).alias("i"),
        "text",
    ).select(F.expr("substring(text, i, 2)").alias("pair"))
    c = p.groupBy("pair").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    # unpartitioned window bound: WindowGroupLimit pushes rnk <= 20
    # into per-partition top-k heaps (no global sort materializes)
    return (
        c.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _BPE_TOP)
        .select("rnk", "pair", "n")
        .orderBy("rnk")
    )


# ---------------------------------------------------------------------------
# text_sentence_profile — per-language sentence-structure census:
# sentences counted as '[.!?]+' runs (regexp_count / regexp_extract_all
# agree on run semantics), words from the shared tokenizer; pooled
# words-per-sentence as one exact div. Docs with no terminator count
# as single-sentence (greatest(...,1)) in both engines.
# ---------------------------------------------------------------------------


@register(
    "text_sentence_profile",
    oracle=f"""
WITH s AS (
  SELECT lang,
    greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1)
      AS n_sents,
    CAST(len(list_filter({TOKENIZE_SQL}, t -> t != '')) AS BIGINT)
      AS n_words
  FROM documents WHERE length(text) > 0
)
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_sents) AS BIGINT) AS n_sentences,
  CAST(sum(n_sents) * 1000 // count(*) AS BIGINT) AS sents_per_doc_milli,
  CAST(sum(n_words) * 1000 // sum(n_sents) AS BIGINT)
    AS words_per_sent_milli
FROM s GROUP BY lang ORDER BY lang
""",
)
def text_sentence_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-length census per language (milli units)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    s = docs.select(
        "lang",
        F.greatest(
            F.expr("CAST(regexp_count(text, '[.!?]+') AS BIGINT)"),
            F.lit(1).cast("bigint"),
        ).alias("n_sents"),
        F.size(F.filter(tokenize(F.col("text")), lambda t: t != ""))
        .cast("bigint")
        .alias("n_words"),
    )
    return (
        s.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_sents").cast("bigint").alias("n_sentences"),
            F.expr(
                "CAST(sum(n_sents) * 1000 div count(*) AS BIGINT)"
            ).alias("sents_per_doc_milli"),
            F.expr(
                "CAST(sum(n_words) * 1000 div sum(n_sents) AS BIGINT)"
            ).alias("words_per_sent_milli"),
        )
        .orderBy("lang")
    )
