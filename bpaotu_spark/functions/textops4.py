"""Round-7 corpus-quality additions: style profiles and burstiness.

* ``stopword_profile_cosine`` — pairwise source similarity over the
  function-word (stopword) distribution. Function words are
  topic-free, so this cosine reads REGISTER/STYLE similarity between
  sources — the classic stylometry signal (Mosteller & Wallace '64)
  and a cheap pre-mixture duplicate-source detector.
* ``term_burstiness`` — Church & Gale '95: content words are BURSTY
  (high collection-frequency / document-frequency ratio, far fewer
  docs than a Poisson scatter would hit). Per top-cf term: cf, df,
  cf/df, and df vs the Poisson expectation N·(1−e^(−cf/N)).
* ``ttr_head100`` — per-language lexical diversity: type-token ratio
  over each document's first 100 tokens (fixed window kills the
  length bias that makes raw TTR incomparable), per-language mean.

Determinism discipline: counts are exact integers; cosine / the
Poisson ratio are ONE float expression over exact integer aggregates,
floored to ppm/milli; per-doc TTR is exact integer ppm before the
per-language mean (truncating div).

Scale shape: all three are explode → keyed aggregation with map-side
combine. The stopword profile join carries |sources| × 32 rows; the
pair former is |sources|² (bounded, broadcast). term_burstiness cuts
top-50 via TakeOrderedAndProject (no global sort). ttr is a per-row
expression + one groupBy(lang).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bpaotu_spark.catalog import load_table
from bpaotu_spark.functions.textops import (
    LANG_PROFILES,
    TOKENIZE_SQL,
    _sql_strlist,
    tokenize,
)
from bpaotu_spark.registry import register

# union of the four language stopword profiles — the function-word axis
_FUNC_WORDS = tuple(
    sorted({w for ws in LANG_PROFILES.values() for w in ws})
)

_BURST_TOPK = 50


@register(
    "stopword_profile_cosine",
    oracle=f"""
WITH t AS (
  SELECT source, unnest({TOKENIZE_SQL}) AS w FROM documents
),
c AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c
  FROM t WHERE list_contains({_sql_strlist(_FUNC_WORDS)}, w)
  GROUP BY source, w
),
nrm AS (
  SELECT source, CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss
  FROM c GROUP BY source
),
dots AS (
  SELECT a.source AS source_a, b.source AS source_b,
    CAST(count(*) AS BIGINT) AS n_shared_words,
    CAST(sum(CAST(a.c AS HUGEINT) * b.c) AS HUGEINT) AS dp
  FROM c a JOIN c b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_shared_words,
  CAST(floor(CAST(dp AS DOUBLE)
    / (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE)))
    * 1000000) AS BIGINT) AS cosine_ppm
FROM dots
JOIN nrm na ON na.source = source_a
JOIN nrm nb ON nb.source = source_b
ORDER BY source_a, source_b
""",
)
def stopword_profile_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source cosine over the function-word distribution."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.explode(tokenize(F.col("text"))).alias("w")
    )
    c = (
        t.filter(F.col("w").isin(*_FUNC_WORDS))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    nrm = c.groupBy("source").agg(
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("ss")
    )
    a = c.select(
        F.col("source").alias("source_a"),
        F.col("w").alias("w_a"),
        F.col("c").alias("ca"),
    )
    b = c.select(
        F.col("source").alias("source_b"),
        F.col("w").alias("w_b"),
        F.col("c").alias("cb"),
    )
    dots = (
        a.join(
            b,
            (F.col("w_a") == F.col("w_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared_words"),
            F.sum(F.expr("CAST(ca AS DECIMAL(38,0)) * cb")).alias("dp"),
        )
    )
    na = nrm.select(
        F.col("source").alias("source_a"), F.col("ss").alias("ssa")
    )
    nb = nrm.select(
        F.col("source").alias("source_b"), F.col("ss").alias("ssb")
    )
    return (
        dots.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared_words",
            F.expr(
                "CAST(floor(CAST(dp AS DOUBLE)"
                " / (sqrt(CAST(ssa AS DOUBLE)) * sqrt(CAST(ssb AS DOUBLE)))"
                " * 1000000) AS BIGINT)"
            ).alias("cosine_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "term_burstiness",
    oracle=f"""
WITH t AS (
  SELECT doc_id, unnest({TOKENIZE_SQL}) AS w FROM documents
),
tf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cf,
    CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM t WHERE w <> '' GROUP BY w
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
top AS (
  SELECT w, cf, df,
    row_number() OVER (ORDER BY cf DESC, w ASC) AS rn
  FROM tf QUALIFY rn <= {_BURST_TOPK}
)
SELECT w AS word, cf, df,
  cf * 1000 // df AS burstiness_milli,
  CAST(floor(CAST(df AS DOUBLE)
    / (CAST(n_docs AS DOUBLE)
       * (1.0 - exp(-(CAST(cf AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
    * 1000) AS BIGINT) AS df_vs_poisson_milli
FROM top CROSS JOIN nd
ORDER BY cf DESC, word ASC
""",
)
def term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale burstiness of the top-cf terms (exact cf/df)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    tf = t.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("cf"),
        F.countDistinct("doc_id").cast("bigint").alias("df"),
    )
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    # TakeOrderedAndProject local top-K — never a global sort
    top = tf.orderBy(F.col("cf").desc(), F.col("w").asc()).limit(
        _BURST_TOPK
    )
    return (
        top.crossJoin(F.broadcast(nd))
        .select(
            F.col("w").alias("word"),
            "cf",
            "df",
            F.expr("cf * 1000 div df").alias("burstiness_milli"),
            F.expr(
                "CAST(floor(CAST(df AS DOUBLE)"
                " / (CAST(n_docs AS DOUBLE)"
                "    * (1.0 - exp(-(CAST(cf AS DOUBLE)"
                "                   / CAST(n_docs AS DOUBLE)))))"
                " * 1000) AS BIGINT)"
            ).alias("df_vs_poisson_milli"),
        )
        .orderBy(F.col("cf").desc(), F.col("word").asc())
    )


@register(
    "ttr_head100",
    oracle=f"""
WITH t AS (
  SELECT lang, {TOKENIZE_SQL} AS toks FROM documents
),
d AS (
  SELECT lang,
    CAST(len(list_distinct(toks[1:100])) AS BIGINT) * 1000000
      // least(CAST(len(toks) AS BIGINT), 100) AS ttr_ppm
  FROM t WHERE len(toks) >= 1 AND toks[1] <> ''
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(ttr_ppm) AS BIGINT) // count(*) AS mean_ttr_ppm
FROM d GROUP BY lang ORDER BY lang
""",
)
def ttr_head100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language mean type-token ratio over each doc's first 100
    tokens (fixed-window TTR, length-bias-free)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("lang", tokenize(F.col("text")).alias("toks"))
    d = t.filter(
        (F.size("toks") >= 1) & (F.element_at("toks", 1) != "")
    ).select(
        "lang",
        (
            F.size(F.array_distinct(F.slice("toks", 1, 100)))
            .cast("bigint")
            * 1000000
        ).alias("num"),
        F.least(F.size("toks").cast("bigint"), F.lit(100).cast("bigint"))
        .alias("den"),
    ).select("lang", F.expr("num div den").alias("ttr_ppm"))
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr("CAST(sum(ttr_ppm) AS BIGINT) div count(*)").alias(
                "mean_ttr_ppm"
            ),
        )
        .orderBy("lang")
    )
