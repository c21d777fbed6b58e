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
from pyspark.sql import DataFrame, SparkSession

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
    g = docs.select(
        "lang",
        F.expr(
            "explode(sequence(1, greatest(length(text) - 2, 0)))"
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
