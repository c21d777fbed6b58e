"""Round-12 quality-composition additions.

* ``quality_filters_agreement`` — do the two quality filters agree?
  Every curation pipeline runs SEVERAL signals (rule census +
  LM-surprisal bucketing); before gating on both, you measure their
  agreement so you know whether the second filter adds information or
  noise. This op joins the per-doc Gopher all-rules verdict
  (gopher_quality_rules' exact construction) with the per-doc CCNet
  tertile (ccnet_perplexity_tertiles' construction, token surprisal
  via the ENGINE-EXACT fixed-point log of ``functions/intlog.py``
  instead of libm ln — r12 ADVICE item 1, so no floating floor
  boundary feeds the ntile) and reports
  the 2×3 contingency (share ppm) plus Cohen's kappa between
  gopher-pass and head-tertile membership — all-integer:
  kappa = (N·agree − pe_num) / (N² − pe_num) with
  pe_num = a1·b1 + a0·b0, rendered in milli with truncating div.

Scale shape: both per-doc frames are one-row-per-doc aggregates of
the same (doc, token) groupBy; the join is doc-keyed; the kappa
scalars ride a broadcast 1-row cross; the ntile window is partitioned
by language.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.functions.textops import TOKENIZE_SQL, tokenize
from bpaotu_spark.operators.quality import (
    _CCNET_BUCKET_SQL,
    _GOPHER_MAX_WORDS,
    _GOPHER_MIN_WORDS,
    _GOPHER_STOPWORDS,
    _STOP_SQL,
)
from bpaotu_spark.functions.intlog import (
    _FRAC_BITS,
    ln_ratio_micro_col,
    ln_ratio_micro_ctes,
)
from bpaotu_spark.registry import register

# token surprisal as ENGINE-EXACT integer arithmetic (r12 ADVICE
# item 1): the fixed-point log2 surrogate replaces floor(-ln(c/N)·1e6)
# so no libm call sits under the floor boundary in either engine
_LN_CTES = ln_ratio_micro_ctes("lc", "vn", "n_total", "c", "token")
_LN_LAST = f"lc{_FRAC_BITS + 1}"


@register(
    "quality_filters_agreement",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, {TOKENIZE_SQL} AS toks FROM documents
), x AS (
  SELECT doc_id, lang, unnest(toks) AS w FROM t
), cnt AS (
  SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS c
  FROM x GROUP BY doc_id, lang, w
), per AS (
  SELECT doc_id, lang,
    CAST(sum(c) AS BIGINT) AS n_words,
    CAST(count(*) AS BIGINT) AS n_distinct,
    CAST(max(c) AS BIGINT) AS top_c,
    CAST(sum(len(w) * c) AS BIGINT) AS sum_len,
    CAST(count(CASE WHEN w IN ({_STOP_SQL}) THEN 1 END) AS BIGINT)
      AS stop_hits
  FROM cnt GROUP BY doc_id, lang
), gf AS (
  SELECT doc_id,
    CASE WHEN n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
          AND 3 * n_words <= sum_len AND sum_len <= 10 * n_words
          AND stop_hits >= 2 AND 5 * top_c <= n_words
          AND 2 * n_distinct >= n_words
         THEN 1 ELSE 0 END AS gpass
  FROM per
), vocab AS (
  SELECT w AS token, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY w
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total FROM x
), vn AS (
  SELECT token, c, n_total FROM vocab CROSS JOIN n
),
{_LN_CTES},
cost AS (
  SELECT token, ln_micro AS cost_micro FROM {_LN_LAST}
), perdoc AS (
  SELECT cnt.doc_id, lang,
    CAST(sum(c * cost_micro) AS BIGINT) // CAST(sum(c) AS BIGINT)
      AS ll_micro
  FROM cnt JOIN cost ON cost.token = cnt.w
  GROUP BY cnt.doc_id, lang
), bucketed AS (
  SELECT doc_id,
    ntile(3) OVER (PARTITION BY lang ORDER BY ll_micro, doc_id) AS nt
  FROM perdoc
), j AS (
  SELECT gpass, nt, CASE WHEN nt = 1 THEN 1 ELSE 0 END AS head
  FROM gf JOIN bucketed ON bucketed.doc_id = gf.doc_id
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS nn,
    CAST(sum(CASE WHEN gpass = head THEN 1 ELSE 0 END) AS BIGINT) AS agree,
    CAST(sum(gpass) AS BIGINT) AS a1,
    CAST(sum(head) AS BIGINT) AS b1
  FROM j
), kp AS (
  SELECT nn,
    CAST((nn * agree - (a1 * b1 + (nn - a1) * (nn - b1))) * 1000
      // greatest(nn * nn - (a1 * b1 + (nn - a1) * (nn - b1)), 1)
      AS BIGINT) AS kappa_head_milli
  FROM tot
)
SELECT (gpass = 1) AS gopher_pass, {_CCNET_BUCKET_SQL} AS bucket,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(*) * 1000000 // max(nn) AS BIGINT) AS share_ppm,
  CAST(max(kappa_head_milli) AS BIGINT) AS kappa_head_milli
FROM j CROSS JOIN kp
GROUP BY gpass, nt
""",
)
def quality_filters_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×3 contingency of (gopher all-rules pass) × (CCNet tertile)
    with Cohen's kappa between gopher-pass and head membership:
    (gopher_pass, bucket, n_docs, share_ppm, kappa_head_milli)."""
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select(
        "doc_id", "lang", F.explode(tokenize(F.col("text"))).alias("w")
    )
    # cnt fans into per (the Gopher census) and perdoc (the surprisal
    # score), and the j frame below is referenced twice — without a
    # barrier the token explode ran ~8x (16 parquet scans in the before
    # plan). Checkpoint cnt once; vocab and n_total then derive from
    # cnt exactly (sum(c) == count(*) over the exploded stream), so the
    # explode runs once per query.
    cnt = (
        x.groupBy("doc_id", "lang", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    stop = F.col("w").isin(*_GOPHER_STOPWORDS)
    per = cnt.groupBy("doc_id", "lang").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.max("c").alias("top_c"),
        F.sum(F.length("w").cast("bigint") * F.col("c")).alias("sum_len"),
        F.count(F.when(stop, F.lit(1))).cast("bigint").alias("stop_hits"),
    )
    gf = per.select(
        "doc_id",
        (
            (F.col("n_words") >= _GOPHER_MIN_WORDS)
            & (F.col("n_words") <= _GOPHER_MAX_WORDS)
            & (3 * F.col("n_words") <= F.col("sum_len"))
            & (F.col("sum_len") <= 10 * F.col("n_words"))
            & (F.col("stop_hits") >= 2)
            & (5 * F.col("top_c") <= F.col("n_words"))
            & (2 * F.col("n_distinct") >= F.col("n_words"))
        )
        .cast("long")
        .alias("gpass"),
    )
    vocab = cnt.groupBy(F.col("w").alias("token")).agg(
        F.sum("c").cast("bigint").alias("c")
    )
    n = cnt.agg(F.sum("c").cast("bigint").alias("n_total"))
    cost = ln_ratio_micro_col(
        vocab.crossJoin(F.broadcast(n)), "n_total", "c"
    ).select("token", F.col("ln_micro").alias("cost_micro"))
    perdoc = (
        cnt.join(cost, cnt.w == cost.token)
        .groupBy("doc_id", "lang")
        .agg(F.expr("sum(c * cost_micro) div sum(c)").alias("ll_micro"))
    )
    wl = Window.partitionBy("lang").orderBy("ll_micro", "doc_id")
    bucketed = perdoc.select(
        "doc_id", F.ntile(3).over(wl).cast("bigint").alias("nt")
    )
    j = (
        gf.join(bucketed, "doc_id")
        .select(
            "gpass",
            "nt",
            F.when(F.col("nt") == 1, F.lit(1))
            .otherwise(F.lit(0))
            .alias("head"),
        )
        .localCheckpoint()  # read twice: the kappa scalar + the 2x3 grid
    )
    tot = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("nn"),
        F.sum(
            F.when(F.col("gpass") == F.col("head"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("agree"),
        F.sum("gpass").cast("bigint").alias("a1"),
        F.sum("head").cast("bigint").alias("b1"),
    )
    kp = tot.select(
        "nn",
        F.expr(
            "CAST((nn * agree - (a1 * b1 + (nn - a1) * (nn - b1))) * 1000"
            " DIV greatest(nn * nn - (a1 * b1 + (nn - a1) * (nn - b1)),"
            " CAST(1 AS BIGINT)) AS BIGINT)"
        ).alias("kappa_head_milli"),
    )
    return (
        j.crossJoin(F.broadcast(kp))
        .groupBy("gpass", "nt")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr(
                "CAST(count(*) * 1000000 DIV max(nn) AS BIGINT)"
            ).alias("share_ppm"),
            F.max("kappa_head_milli").cast("bigint").alias(
                "kappa_head_milli"
            ),
        )
        .select(
            (F.col("gpass") == 1).alias("gopher_pass"),
            F.expr(_CCNET_BUCKET_SQL).alias("bucket"),
            "n_docs",
            "share_ppm",
            "kappa_head_milli",
        )
    )
