"""Round-9 data-quality expectations audit.

Reference parity: the reference importer (public path
``bpaotu/otu/importer.py``) validates taxonomy/sample/abundance rows on
ingest (the engine's ``io/ingest.py`` mirrors it with per-row
``reject_reason``); this operator is the POST-load twin — the
dbt-test-style constraint sweep a lake runs on landed tables.

* ``data_expectations_audit`` — one row per (table, check): primary-key
  uniqueness (composite keys integer-encoded identically in both
  engines), referential integrity (anti-join counts), domain/range
  rules (non-positive money, discount/tax outside [0,1]), and
  denormalization consistency (documents.n_chars vs length(text),
  embeddings dimension vs the table max). Output is the go/no-go
  table a pipeline gate reads; every count is exact.

Scale shape: each table contributes ONE map-combined aggregate pass
computing all its per-row checks at once (the unpivot to check rows is
driver-side literal stacking, not a shuffle); the two FK checks are
anti-joins on the natural keys — the same shuffle any FK validation
costs, prunable to delta partitions in an incremental deployment.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register

# (table, check, violation-predicate SQL) — predicate counts ROWS in
# violation; pk/fk checks are handled structurally below.
_ROW_CHECKS = {
    "orders": (
        ("nonpositive_totalprice", "o_totalprice <= 0"),
        ("null_orderdate", "o_orderdate IS NULL"),
    ),
    "lineitem": (
        ("nonpositive_quantity", "l_quantity <= 0"),
        ("discount_out_of_range", "l_discount < 0 OR l_discount > 1"),
        ("tax_out_of_range", "l_tax < 0 OR l_tax > 1"),
    ),
    "events": (
        ("empty_event_type", "length(event_type) = 0"),
        ("null_ts", "ts IS NULL"),
    ),
    "documents": (
        ("n_chars_mismatch", "n_chars != length(text)"),
        ("empty_lang", "length(lang) = 0"),
    ),
}


def _oracle() -> str:
    branches = []
    # pk uniqueness
    for table, key in (
        ("customer", "c_custkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        # composite key integer-encoded (linenumber is 1..7 in TPC-H)
        ("lineitem", "l_orderkey * 10 + l_linenumber"),
    ):
        branches.append(
            f"SELECT '{table}' AS table_name,"
            f" 'pk_unique' AS check_name,"
            f" CAST(count(*) AS BIGINT) AS n_rows,"
            f" CAST(count(*) - count(DISTINCT {key}) AS BIGINT)"
            f" AS n_violations FROM {table}"
        )
    # fk integrity
    branches.append(
        "SELECT 'orders', 'fk_customer_exists',"
        " CAST((SELECT count(*) FROM orders) AS BIGINT),"
        " CAST((SELECT count(*) FROM orders"
        "  ANTI JOIN customer ON o_custkey = c_custkey) AS BIGINT)"
    )
    branches.append(
        "SELECT 'lineitem', 'fk_orders_exists',"
        " CAST((SELECT count(*) FROM lineitem) AS BIGINT),"
        " CAST((SELECT count(*) FROM lineitem"
        "  ANTI JOIN orders ON l_orderkey = o_orderkey) AS BIGINT)"
    )
    # row-predicate checks
    for table, checks in _ROW_CHECKS.items():
        for name, pred in checks:
            branches.append(
                f"SELECT '{table}', '{name}',"
                f" CAST(count(*) AS BIGINT),"
                f" CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END)"
                f" AS BIGINT) FROM {table}"
            )
    # embeddings dimension consistency vs the table max
    branches.append(
        "SELECT 'embeddings', 'dim_consistent',"
        " CAST(count(*) AS BIGINT),"
        " CAST(sum(CASE WHEN len(embedding) !="
        " (SELECT max(len(embedding)) FROM embeddings)"
        " THEN 1 ELSE 0 END) AS BIGINT) FROM embeddings"
    )
    return (
        "WITH u AS (\n"
        + "\nUNION ALL\n".join(branches)
        + "\n)\nSELECT * FROM u ORDER BY table_name, check_name"
    )


@register("data_expectations_audit", oracle=_oracle())
def data_expectations_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dbt-test-style constraint sweep: (table_name, check_name,
    n_rows, n_violations) over pk/fk/domain/consistency rules."""

    def row(table: str, check: str, n_rows, n_viol) -> DataFrame:
        return n_viol.select(
            F.lit(table).alias("table_name"),
            F.lit(check).alias("check_name"),
            F.col("n_rows"),
            F.col("n_violations"),
        )

    frames = []
    # pk uniqueness (one agg pass per table)
    for table, key in (
        ("customer", "c_custkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        ("lineitem", "l_orderkey * 10 + l_linenumber"),
    ):
        df = load_table(spark, sf_dir, table)
        agg = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (
                F.count(F.lit(1)) - F.countDistinct(F.expr(key))
            )
            .cast("bigint")
            .alias("n_violations"),
        )
        frames.append(row(table, "pk_unique", None, agg))
    # fk integrity via anti-joins
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orphans_o = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_anti"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    tot_o = orders.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    frames.append(
        row(
            "orders",
            "fk_customer_exists",
            None,
            tot_o.crossJoin(F.broadcast(orphans_o)).select(
                "n_rows", F.col("v").alias("n_violations")
            ),
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    okeys = orders.select("o_orderkey")
    orphans_l = li.join(
        okeys, li.l_orderkey == okeys.o_orderkey, "left_anti"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    tot_l = li.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    frames.append(
        row(
            "lineitem",
            "fk_orders_exists",
            None,
            tot_l.crossJoin(F.broadcast(orphans_l)).select(
                "n_rows", F.col("v").alias("n_violations")
            ),
        )
    )
    # row-predicate checks (one agg pass per table covering its rules)
    for table, checks in _ROW_CHECKS.items():
        df = load_table(spark, sf_dir, table)
        for name, pred in checks:
            agg = df.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END"))
                .cast("bigint")
                .alias("n_violations"),
            )
            frames.append(row(table, name, None, agg))
    # embeddings dimension consistency
    emb = load_table(spark, sf_dir, "embeddings")
    dmax = emb.agg(F.max(F.size("embedding")).alias("dmax"))
    agg = emb.crossJoin(F.broadcast(dmax)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(
            F.expr(
                "CASE WHEN size(embedding) != dmax THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("n_violations"),
    )
    frames.append(row("embeddings", "dim_consistent", None, agg))

    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("table_name", "check_name")
