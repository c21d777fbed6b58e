"""Corpus scaling-law and calibration operators.

* ``heaps_law_estimate`` — Heaps'/Herdan's law V = K·N^β fit from two
  nested corpus samples (the even-doc_id half vs the full corpus):
  β̂ = ln(V₂/V₁)/ln(N₂/N₁), plus the hapax-legomena census. The
  vocabulary-growth forecast every tokenizer/vocab decision rests on.
* ``entropy_dedup_calibration`` — does templated (low-entropy) text
  near-duplicate more?  Per-language entropy deciles (the
  ``text_token_entropy`` oracle embedded as a CTE) crossed with
  near-dup keeper verdicts (the ``corpus_near_dedup_keep_first``
  oracle) — the curation-threshold calibration table, drift-free by
  construction because both inputs ARE the registered oracles.
* ``intrinsic_dimension_twonn`` — Two-NN intrinsic-dimension estimate
  (Facco et al. 2017): μᵢ = d₂/d₁ over the two nearest neighbors
  from the kNN graph, ÎD = n / Σ ln μᵢ. The embedding-manifold
  health check before choosing an index (IVF list count, PQ bits).

Determinism: every ln() floored to micro-nats pre-aggregation;
ratios integer ppm/milli.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

import bpaotu_spark.ann.core  # noqa: F401  (registers knn_graph_lsh)
import bpaotu_spark.dedup.core  # noqa: F401  (registers near-dedup oracle)
from bpaotu_spark.catalog import load_table
from bpaotu_spark.functions.textops import TOKENIZE_SQL, tokenize, word_ngrams
from bpaotu_spark.registry import ORACLES, register

# ---------------------------------------------------------------------------
# heaps_law_estimate
# ---------------------------------------------------------------------------


@register(
    "heaps_law_estimate",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKENIZE_SQL}) AS w FROM documents
),
half AS (
  SELECT CAST(count(*) AS BIGINT) AS n1,
    CAST(count(DISTINCT w) AS BIGINT) AS v1
  FROM tok WHERE doc_id % 2 = 0
),
full_c AS (
  SELECT CAST(count(*) AS BIGINT) AS n2,
    CAST(count(DISTINCT w) AS BIGINT) AS v2
  FROM tok
),
hapax AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hapax FROM (
    SELECT w FROM tok GROUP BY w HAVING count(*) = 1
  )
)
SELECT n1, v1, n2, v2, n_hapax,
  (n_hapax * 1000000) // v2 AS hapax_share_ppm,
  CAST(floor(ln(v2 * 1.0 / v1) / ln(n2 * 1.0 / n1) * 1000000) AS BIGINT)
    AS heaps_beta_micro
FROM half, full_c, hapax
""",
)
def heaps_law_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("w")
    )
    half = tok.filter(F.col("doc_id") % 2 == 0).agg(
        F.count(F.lit(1)).alias("n1"),
        F.countDistinct("w").alias("v1"),
    )
    full_c = tok.agg(
        F.count(F.lit(1)).alias("n2"),
        F.countDistinct("w").alias("v2"),
    )
    hapax = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") == 1)
        .agg(F.count(F.lit(1)).alias("n_hapax"))
    )
    return (
        half.crossJoin(F.broadcast(full_c))
        .crossJoin(F.broadcast(hapax))
        .select(
            "n1",
            "v1",
            "n2",
            "v2",
            "n_hapax",
            F.expr("(n_hapax * 1000000) div v2").alias("hapax_share_ppm"),
            F.expr(
                "CAST(floor(ln(v2 * 1.0 / v1) / ln(n2 * 1.0 / n1)"
                " * 1000000) AS BIGINT)"
            ).alias("heaps_beta_micro"),
        )
    )


# ---------------------------------------------------------------------------
# entropy_dedup_calibration
# ---------------------------------------------------------------------------


def _calibration_oracle() -> str:
    return f"""
WITH ent AS ({ORACLES["text_token_entropy"]}),
dd AS ({ORACLES["corpus_near_dedup_keep_first"]}),
ranked AS (
  SELECT d.lang, ent.doc_id,
    CAST(ntile(10) OVER (PARTITION BY d.lang
      ORDER BY ent.nH_micronats * 1000000 // ent.n_tokens, ent.doc_id)
      AS BIGINT) AS entropy_decile,
    dd.is_kept
  FROM ent
  JOIN documents d ON ent.doc_id = d.doc_id
  JOIN dd ON ent.doc_id = dd.doc_id
)
SELECT lang, entropy_decile,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  (CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
    // count(*) AS kept_ppm
FROM ranked GROUP BY lang, entropy_decile
"""


@register("entropy_dedup_calibration", oracle=_calibration_oracle())
def entropy_dedup_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bpaotu_spark.dedup.core import corpus_near_dedup_keep_first
    from bpaotu_spark.functions.textops import text_token_entropy

    ent = text_token_entropy(spark, sf_dir)
    dd = corpus_near_dedup_keep_first(spark, sf_dir).select(
        "doc_id", "is_kept"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.expr("nH_micronats * 1000000 div n_tokens"), F.col("doc_id")
    )
    ranked = (
        ent.join(docs, "doc_id")
        .join(dd, "doc_id")
        .withColumn("entropy_decile", F.ntile(10).over(w).cast("bigint"))
    )
    return ranked.groupBy("lang", "entropy_decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("is_kept"), 1).otherwise(0)).alias("n_kept"),
        F.expr(
            "(sum(CASE WHEN is_kept THEN 1 ELSE 0 END) * 1000000)"
            " div count(*)"
        ).alias("kept_ppm"),
    )


# ---------------------------------------------------------------------------
# intrinsic_dimension_twonn
# ---------------------------------------------------------------------------


def _twonn_oracle() -> str:
    return f"""
WITH knn AS ({ORACLES["knn_graph_lsh"]}),
nn AS (
  SELECT vec_id,
    max(CASE WHEN rnk = 1 THEN 1.0 - cos_sim END) AS d1,
    max(CASE WHEN rnk = 2 THEN 1.0 - cos_sim END) AS d2
  FROM knn WHERE rnk <= 2 GROUP BY vec_id
),
mu AS (
  SELECT vec_id,
    CAST(floor(ln(d2 / d1) * 1000000) AS BIGINT) AS ln_mu_micro
  FROM nn WHERE d1 > 0 AND d2 >= d1
)
SELECT CAST(count(*) AS BIGINT) AS n_nodes,
  CAST(sum(ln_mu_micro) AS BIGINT) AS sum_ln_mu_micro,
  (CAST(count(*) AS BIGINT) * 1000000000) // CAST(sum(ln_mu_micro) AS BIGINT)
    AS intrinsic_dim_milli
FROM mu
"""


@register("intrinsic_dimension_twonn", oracle=_twonn_oracle())
def intrinsic_dimension_twonn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bpaotu_spark.ann.core import knn_graph_lsh

    knn = knn_graph_lsh(spark, sf_dir).filter(F.col("rnk") <= 2)
    nn = knn.groupBy("vec_id").agg(
        F.max(F.when(F.col("rnk") == 1, 1.0 - F.col("cos_sim"))).alias("d1"),
        F.max(F.when(F.col("rnk") == 2, 1.0 - F.col("cos_sim"))).alias("d2"),
    )
    mu = nn.filter((F.col("d1") > 0) & (F.col("d2") >= F.col("d1"))).select(
        F.floor(F.log(F.col("d2") / F.col("d1")) * 1000000)
        .cast("bigint")
        .alias("ln_mu_micro")
    )
    return mu.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("ln_mu_micro").alias("sum_ln_mu_micro"),
    ).select(
        "n_nodes",
        "sum_ln_mu_micro",
        F.expr("(n_nodes * 1000000000) div sum_ln_mu_micro").alias(
            "intrinsic_dim_milli"
        ),
    )


# ---------------------------------------------------------------------------
# boilerplate_ngram_hotlist — the global boilerplate detector: top-100
# word 5-grams by DOCUMENT frequency (distinct docs containing the
# gram, not occurrences — occurrence counts reward one spammy doc,
# document frequency finds the template shared ACROSS docs), with the
# corpus-share in ppm. The hotlist is what a curation pipeline turns
# into a strip-list before near-dedup (boilerplate inflates Jaccard
# similarity between otherwise-unrelated pages).
#
# Scale shape: explode → distinct (doc, gram) → gram-keyed df count
# (map-side combine) → HAVING df ≥ 2 (a gram in one document is by
# definition not boilerplate — prunes the huge unique tail before the
# top-k) → distributed top-k (TakeOrderedAndProject, never a global
# sort) with a deterministic (df DESC, gram ASC) tiebreak. The only
# window runs over the 100-row result to emit ranks.
# ---------------------------------------------------------------------------

_HOTLIST_K = 100
_HOTLIST_N = 5


@register(
    "boilerplate_ngram_hotlist",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {TOKENIZE_SQL} AS toks FROM documents
),
g AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
      tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
          || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w
        AS gram
    FROM (SELECT doc_id, unnest(toks) AS tok,
                 generate_subscripts(toks, 1) AS pos
          FROM t)
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    QUALIFY lead(tok, {_HOTLIST_N - 1}) OVER w IS NOT NULL
  )
),
df AS (
  SELECT gram, CAST(count(*) AS BIGINT) AS doc_freq
  FROM g GROUP BY gram HAVING count(*) >= 2
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
top AS (
  SELECT gram, doc_freq FROM df
  ORDER BY doc_freq DESC, gram LIMIT {_HOTLIST_K}
)
SELECT CAST(row_number() OVER (ORDER BY doc_freq DESC, gram) AS BIGINT)
    AS rank,
  gram, doc_freq,
  (doc_freq * 1000000) // n_docs AS doc_share_ppm
FROM top, n
""",
)
def boilerplate_ngram_hotlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from bpaotu_spark.catalog import widen_scan

    # the 5-gram tokenize+explode is the heavy pre-shuffle work on a
    # single-row-group scan (guide §2.5) — widen first
    grams = widen_scan(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        F.explode(
            word_ngrams(tokenize(F.col("text")), _HOTLIST_N)
        ).alias("gram"),
    )
    # count(DISTINCT doc_id) per gram plans ONE exchange (partial
    # (gram, doc_id) dedup map-side, then a gram-keyed shuffle) where
    # the old distinct()-then-groupBy shape shuffled the full 5-gram
    # occurrence stream twice (guide §2.4) — doc_freq values identical
    df = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").cast("bigint").alias("doc_freq"))
        .filter(F.col("doc_freq") >= 2)
    )
    # orderBy+limit compiles to TakeOrderedAndProject — each task keeps
    # its local top-100, the driver merges 100·n_tasks rows, never a
    # global sort of the gram table
    top = df.orderBy(F.col("doc_freq").desc(), "gram").limit(_HOTLIST_K)
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    # unpartitioned window bound: runs over the LIMIT-_HOTLIST_K cut
    w = Window.orderBy(F.col("doc_freq").desc(), "gram")
    return (
        top.crossJoin(F.broadcast(n))
        .select(
            F.row_number().over(w).cast("bigint").alias("rank"),
            "gram",
            "doc_freq",
            F.expr("(doc_freq * 1000000) div n_docs").alias(
                "doc_share_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# corpus_regex_scrub_report — the PII/pattern scrub census a curation
# pipeline runs BEFORE redaction: per (source, pattern), how many docs
# match, how many total matches, how many characters the redaction
# would remove, and the flagged-char share of the source in ppm.
# Patterns cover the standard PII screens (email, IPv4, long digit
# runs — expected zero on clean corpora, so they double as
# false-positive negative controls) plus a corpus-hitting token
# pattern proving the counting machinery end-to-end. Patterns stay in
# the common Java-regex ∩ RE2 dialect so Spark (Java) and DuckDB (RE2)
# agree: character classes, bounded repetition, \\b, alternation — no
# backreferences or lookaround.
#
# Scale shape: ONE scan of documents computes every pattern's counters
# as column expressions (stack() unpivots after), then a map-side
# combinable groupBy(source, pattern) — no shuffle beyond the final
# per-source rollup, no Python in the row path (regexp_count /
# regexp_replace are JVM codegen).
# ---------------------------------------------------------------------------

_SCRUB_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("digit_run", r"\d{6,}"),
    ("engine_token", r"\b(spark|query|table)\b"),
)


def _scrub_oracle() -> str:
    branches = []
    for name, pat in _SCRUB_PATTERNS:
        branches.append(f"""
SELECT source, '{name}' AS pattern,
  CAST(count(*) FILTER (
    WHERE len(regexp_extract_all(text, '{pat}')) > 0) AS BIGINT)
    AS docs_matched,
  CAST(sum(len(regexp_extract_all(text, '{pat}'))) AS BIGINT)
    AS total_matches,
  CAST(sum(length(text)
    - length(regexp_replace(text, '{pat}', '', 'g'))) AS BIGINT)
    AS chars_flagged,
  CAST(CAST(sum(length(text)
      - length(regexp_replace(text, '{pat}', '', 'g'))) AS HUGEINT)
    * 1000000 // sum(length(text)) AS BIGINT) AS flagged_share_ppm
FROM documents GROUP BY source""")
    return " UNION ALL ".join(branches)


@register("corpus_regex_scrub_report", oracle=_scrub_oracle())
def corpus_regex_scrub_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, pattern) scrub census: docs matched, match count,
    chars a redaction would remove, flagged-char ppm share."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    cols = [F.col("source"), F.length("text").alias("nch")]
    stack_args = []
    for name, pat in _SCRUB_PATTERNS:
        cols.append(
            F.regexp_count(F.col("text"), F.lit(pat)).alias(f"c_{name}")
        )
        cols.append(
            (
                F.length("text")
                - F.length(F.regexp_replace(F.col("text"), pat, ""))
            ).alias(f"f_{name}")
        )
        stack_args.append(f"'{name}', c_{name}, f_{name}")
    per_doc = docs.select(*cols)
    stacked = per_doc.selectExpr(
        "source",
        "nch",
        f"stack({len(_SCRUB_PATTERNS)}, {', '.join(stack_args)})"
        " AS (pattern, n_matches, n_flagged)",
    )
    return (
        stacked.groupBy("source", "pattern")
        .agg(
            F.expr("count_if(n_matches > 0)").alias("docs_matched"),
            F.sum("n_matches").cast("bigint").alias("total_matches"),
            F.sum("n_flagged").cast("bigint").alias("chars_flagged"),
            F.expr(
                "CAST(CAST(sum(n_flagged) AS DECIMAL(38,0)) * 1000000"
                " div sum(nch) AS BIGINT)"
            ).alias("flagged_share_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# corpus_regex_scrub_apply — the redaction TRANSFORM the census above
# plans for: apply every scrub pattern (same Java∩RE2 dialect) in a
# fixed literal order, replacing matches with typed mask tokens, and
# emit the per-doc receipt (match counts on the ORIGINAL text, masked
# md5 + length, changed flag). Counting on the original keeps the
# receipt independent of replacement order; the apply itself is
# sequential in the declared pattern order — identical in both
# engines.
#
# Scale shape: map-only (regexp_replace/regexp_count are JVM codegen,
# one scan, zero shuffles beyond the parquet read).
# ---------------------------------------------------------------------------

_SCRUB_MASKS = (
    ("email", "<EMAIL>"),
    ("ipv4", "<IP>"),
    ("digit_run", "<NUM>"),
    ("engine_token", "<TOK>"),
)


def _scrub_apply_sql() -> str:
    masked = "text"
    pat_by_name = dict(_SCRUB_PATTERNS)
    for name, mask in _SCRUB_MASKS:
        masked = f"regexp_replace({masked}, '{pat_by_name[name]}', '{mask}', 'g')"
    counts = " + ".join(
        f"len(regexp_extract_all(text, '{pat_by_name[name]}'))"
        for name, _ in _SCRUB_MASKS
    )
    return f"""
SELECT doc_id, source,
  CAST({counts} AS BIGINT) AS n_matches,
  md5({masked}) AS masked_md5,
  CAST(length({masked}) AS BIGINT) AS masked_len,
  {masked} <> text AS changed
FROM documents
""".strip()


@register("corpus_regex_scrub_apply", oracle=_scrub_apply_sql())
def corpus_regex_scrub_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pat_by_name = dict(_SCRUB_PATTERNS)
    masked = F.col("text")
    for name, mask in _SCRUB_MASKS:
        masked = F.regexp_replace(masked, pat_by_name[name], mask)
    n_matches = None
    for name, _ in _SCRUB_MASKS:
        c = F.regexp_count(F.col("text"), F.lit(pat_by_name[name]))
        n_matches = c if n_matches is None else n_matches + c
    return docs.select(
        "doc_id",
        "source",
        n_matches.cast("bigint").alias("n_matches"),
        F.md5(masked).alias("masked_md5"),
        F.length(masked).cast("bigint").alias("masked_len"),
        (masked != F.col("text")).alias("changed"),
    )


# ---------------------------------------------------------------------------
# skipgram_pmi_topk — PMI over a ±2 skip-gram co-occurrence window
# (Church & Hanks '90 windowed association, the word2vec-negative-
# sampling statistic): unordered token pairs at distance 1 OR 2,
# canonicalized (least, greatest), scored ln(c_xy·N² / (P·c_x·c_y)).
# Distinct from the adjacent ORDERED bigram_pmi row: the window form
# surfaces collocations the strict-adjacency form misses. Same
# round-to-4dp double PMI discipline as bigram_pmi (exact-integer
# inputs, one identical float expression per row, rounded once).
#
# Scale shape: pair generation is two lead() projections over the
# token stream (linear, doc-partitioned window); counts are map-side
# combinable; the top-k is a LIMIT cut (TakeOrderedAndProject), never
# a global sort of the pair vocabulary.
# ---------------------------------------------------------------------------

_SG_MIN_COUNT = 5
_SG_TOPK = 50


@register(
    "skipgram_pmi_topk",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {TOKENIZE_SQL} AS toks FROM documents
), uni AS (
  SELECT unnest(toks) AS x FROM t
), c1 AS (
  SELECT x, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY x
), n1 AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM uni
), pos AS (
  SELECT doc_id, unnest(toks) AS tok,
         generate_subscripts(toks, 1) AS pos FROM t
), pairs AS (
  SELECT least(tok, nxt) AS tok_a, greatest(tok, nxt) AS tok_b
  FROM (
    SELECT tok, lead(tok, 1) OVER w AS nxt FROM pos
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE nxt IS NOT NULL
  UNION ALL
  SELECT least(tok, nxt), greatest(tok, nxt)
  FROM (
    SELECT tok, lead(tok, 2) OVER w AS nxt FROM pos
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE nxt IS NOT NULL
), c2 AS (
  SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS c_xy
  FROM pairs GROUP BY tok_a, tok_b
), n2 AS (
  SELECT CAST(count(*) AS BIGINT) AS p FROM pairs
), scored AS (
  SELECT tok_a, tok_b, c_xy,
    CAST(round(ln(CAST(c_xy AS DOUBLE) * n1.n * n1.n
                  / (CAST(n2.p AS DOUBLE) * ca.c * cb.c)), 4) AS DOUBLE)
      AS pmi
  FROM c2
  JOIN c1 ca ON ca.x = tok_a
  JOIN c1 cb ON cb.x = tok_b
  CROSS JOIN n1 CROSS JOIN n2
  WHERE c_xy >= {_SG_MIN_COUNT}
)
SELECT tok_a, tok_b, c_xy, pmi,
  CAST(row_number() OVER (ORDER BY pmi DESC, tok_a ASC, tok_b ASC)
    AS INTEGER) AS rnk
FROM (SELECT * FROM scored ORDER BY pmi DESC, tok_a ASC, tok_b ASC
      LIMIT {_SG_TOPK})
""",
)
def skipgram_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokenize(F.col("text")).alias("toks"))
    uni = t.select(F.explode("toks").alias("x"))
    c1 = uni.groupBy("x").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    n1 = uni.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    pos = t.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    pairs = None
    for d in (1, 2):
        nxt = F.lead("tok", d).over(wd)
        p = (
            pos.select(
                F.least(F.col("tok"), nxt).alias("tok_a"),
                F.greatest(F.col("tok"), nxt).alias("tok_b"),
                nxt.isNotNull().alias("ok"),
            )
            .filter("ok")
            .drop("ok")
        )
        pairs = p if pairs is None else pairs.unionAll(p)
    c2 = pairs.groupBy("tok_a", "tok_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_xy")
    )
    n2 = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("p"))
    scored = (
        c2.filter(F.col("c_xy") >= _SG_MIN_COUNT)
        .join(
            F.broadcast(
                c1.select(F.col("x").alias("tok_a"), F.col("c").alias("c_a"))
            ),
            "tok_a",
        )
        .join(
            F.broadcast(
                c1.select(F.col("x").alias("tok_b"), F.col("c").alias("c_b"))
            ),
            "tok_b",
        )
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "tok_a",
            "tok_b",
            "c_xy",
            F.round(
                F.log(
                    F.col("c_xy").cast("double")
                    * F.col("n")
                    * F.col("n")
                    / (
                        F.col("p").cast("double")
                        * F.col("c_a")
                        * F.col("c_b")
                    )
                ),
                4,
            )
            .cast("double")
            .alias("pmi"),
        )
    )
    order_cols = [
        F.col("pmi").desc(),
        F.col("tok_a").asc(),
        F.col("tok_b").asc(),
    ]
    top = scored.orderBy(*order_cols).limit(_SG_TOPK)
    # unpartitioned window bound: runs over the LIMIT-_SG_TOPK cut
    w = Window.orderBy(*order_cols)
    return top.withColumn("rnk", F.row_number().over(w).cast("int"))


# ---------------------------------------------------------------------------
# doc_hapax_ratio — hapax legomena census per source: the share of
# vocabulary types seen exactly ONCE within the source (and the token
# mass they carry). A high hapax share with flat token counts signals
# productive/noisy vocabulary (OCR junk, code identifiers); the drop
# in hapax share as a corpus grows is the other face of the Heaps
# exponent (heaps_law_estimate). One (source, token) count aggregation
# + one source rollup — map-side combinable throughout.
# ---------------------------------------------------------------------------


@register(
    "doc_hapax_ratio",
    oracle=f"""
WITH t AS (
  SELECT source, unnest({TOKENIZE_SQL}) AS tok FROM documents
),
tc AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM t GROUP BY source, tok
)
SELECT source,
  CAST(count(*) AS BIGINT) AS vocab_size,
  CAST(sum(c) AS BIGINT) AS n_tokens,
  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
    * 1000000 // count(*) AS hapax_type_ppm,
  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
    * 1000000 // CAST(sum(c) AS BIGINT) AS hapax_token_ppm
FROM tc GROUP BY source
""",
)
def doc_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source", F.explode(tokenize(F.col("text"))).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return (
        tc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hapax"),
        )
        .select(
            "source",
            "vocab_size",
            "n_tokens",
            "n_hapax",
            F.expr("n_hapax * 1000000 div vocab_size").alias(
                "hapax_type_ppm"
            ),
            F.expr("n_hapax * 1000000 div n_tokens").alias(
                "hapax_token_ppm"
            ),
        )
    )
