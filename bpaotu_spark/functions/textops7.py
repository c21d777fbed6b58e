"""Round-12 text additions (queued for the r13 driver window).

* ``sentence_dedup_census`` — exact dedup at SENTENCE grain: the
  RefinedWeb/CCNet "line dedup" signal one level below document
  dedup. Documents split on terminator runs ('[.!?]+' — the
  text_sentence_profile convention); sentences are trimmed and only
  those >= 20 chars count (the published line-dedup length floor, so
  headers/fragments don't flood the census). Per source: instance
  count, distinct count, within-source duplicate share, and the
  cross-source boilerplate share (distinct sentences that also appear
  in ANOTHER source — navigation chrome, license blocks, templates).

Determinism: pure string ops (split/trim/length) evaluate identically
in both engines; all shares are exact ppm integer divisions.

Scale shape: explode → (source, sentence) groupBy (map-side combined)
→ per-sentence source census over the distinct-sentence frame → one
row per source. Never pairwise — the sentence STRING is the join key,
exactly the exact-dedup hash-groupBy discipline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register

_SENT_MIN_CHARS = 20


@register(
    "sentence_dedup_census",
    oracle=f"""
WITH raw AS (
  SELECT source, trim(s) AS sent
  FROM (
    SELECT source, unnest(regexp_split_to_array(text, '[.!?]+')) AS s
    FROM documents
  )
  WHERE length(trim(s)) >= {_SENT_MIN_CHARS}
),
per AS (
  SELECT source, sent, CAST(count(*) AS BIGINT) AS m
  FROM raw GROUP BY source, sent
),
srcs AS (
  SELECT sent, CAST(count(*) AS BIGINT) AS n_sources
  FROM per GROUP BY sent
)
SELECT per.source,
  CAST(sum(m) AS BIGINT) AS n_instances,
  CAST(count(*) AS BIGINT) AS n_distinct,
  CAST((sum(m) - count(*)) * 1000000 // sum(m) AS BIGINT)
    AS dup_within_ppm,
  CAST(count(CASE WHEN n_sources >= 2 THEN 1 END) AS BIGINT)
    AS n_cross_source,
  CAST(count(CASE WHEN n_sources >= 2 THEN 1 END) * 1000000
       // count(*) AS BIGINT) AS cross_source_ppm
FROM per JOIN srcs USING (sent)
GROUP BY per.source
ORDER BY per.source
""",
)
def sentence_dedup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-grain dedup census per source: (source, n_instances,
    n_distinct, dup_within_ppm, n_cross_source, cross_source_ppm)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    raw = (
        docs.select(
            "source", F.explode(F.split("text", r"[.!?]+")).alias("s")
        )
        .select("source", F.trim("s").alias("sent"))
        .filter(F.length("sent") >= _SENT_MIN_CHARS)
    )
    per = raw.groupBy("source", "sent").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    srcs = per.groupBy("sent").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources")
    )
    return (
        per.join(srcs, "sent")
        .groupBy("source")
        .agg(
            F.sum("m").cast("bigint").alias("n_instances"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.expr(
                "CAST((sum(m) - count(*)) * 1000000 DIV sum(m) AS BIGINT)"
            ).alias("dup_within_ppm"),
            F.count(F.when(F.col("n_sources") >= 2, 1))
            .cast("bigint")
            .alias("n_cross_source"),
            F.expr(
                "CAST(count(CASE WHEN n_sources >= 2 THEN 1 END)"
                " * 1000000 DIV count(*) AS BIGINT)"
            ).alias("cross_source_ppm"),
        )
        .orderBy("source")
    )
