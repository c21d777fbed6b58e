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

    # r15: ONE aggregate pass per table computing the pk check and
    # every row-predicate rule as parallel sum columns, unpivoted
    # in-row into (check_name, n_rows, n_violations) — the before plan
    # scanned each table once PER CHECK (orders 5x, lineitem 6x).
    # Values are identical: each check's n_violations is the same
    # count/sum it was in its own pass.
    frames = []

    def unpivot(table: str, one_row: DataFrame, names: list[str]) -> DataFrame:
        structs = [
            F.struct(
                F.lit(name).alias("check_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"v_{i}").cast("bigint").alias("n_violations"),
            )
            for i, name in enumerate(names)
        ]
        return one_row.select(
            F.explode(F.array(*structs)).alias("p")
        ).select(
            F.lit(table).alias("table_name"),
            "p.check_name",
            "p.n_rows",
            "p.n_violations",
        )

    for table, key in (
        ("customer", "c_custkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        ("lineitem", "l_orderkey * 10 + l_linenumber"),
    ):
        df = load_table(spark, sf_dir, table)
        checks = _ROW_CHECKS.get(table, ())
        aggs = [
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (F.count(F.lit(1)) - F.countDistinct(F.expr(key)))
            .cast("bigint")
            .alias("v_0"),
        ]
        names = ["pk_unique"]
        for name, pred in checks:
            aggs.append(
                F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END"))
                .cast("bigint")
                .alias(f"v_{len(names)}")
            )
            names.append(name)
        frames.append(unpivot(table, df.agg(*aggs), names))
    # fk integrity via anti-joins (the anti-join is its own pass; the
    # parent-side n_rows rides the broadcast of a 1-row aggregate)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orphans_o = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_anti"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    tot_o = orders.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    frames.append(
        tot_o.crossJoin(F.broadcast(orphans_o)).select(
            F.lit("orders").alias("table_name"),
            F.lit("fk_customer_exists").alias("check_name"),
            "n_rows",
            F.col("v").alias("n_violations"),
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    okeys = orders.select("o_orderkey")
    orphans_l = li.join(
        okeys, li.l_orderkey == okeys.o_orderkey, "left_anti"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    tot_l = li.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    frames.append(
        tot_l.crossJoin(F.broadcast(orphans_l)).select(
            F.lit("lineitem").alias("table_name"),
            F.lit("fk_orders_exists").alias("check_name"),
            "n_rows",
            F.col("v").alias("n_violations"),
        )
    )
    # embeddings dimension consistency (needs the corpus max first, so
    # it is inherently a second pass over embeddings)
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
    frames.append(
        agg.select(
            F.lit("embeddings").alias("table_name"),
            F.lit("dim_consistent").alias("check_name"),
            "n_rows",
            "n_violations",
        )
    )

    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("table_name", "check_name")


# ---------------------------------------------------------------------------
# Incremental (delta-scoped) expectations audit — the 100-TB shape of
# the sweep above: after a merge lands, only the rows the merge
# touched are re-audited, so the lake pays per-delta audit cost, not
# per-table. Two pieces:
#
# * ``audit_delta_partitions`` — the library function a scheduler
#   calls after ``io.merge.merge_upsert``: given the merge's touched
#   partition values, audit ONLY those partitions. The filter is a
#   literal IN on the partition column of a partitioned parquet
#   table, so Catalyst turns it into PartitionFilters — untouched
#   partitions are never listed, opened, or scanned (pytest asserts
#   this on the physical plan).
# * ``expectations_audit_delta`` — the registered, oracle-backed
#   query twin on the flat test tables: the "delta" is the latest
#   order year (what a nightly merge would land) plus its lineitems
#   (semi-join — the child rows that merge touched). Delta-side
#   checks re-run pk/domain rules; the FK checks validate the DELTA
#   against the FULL parent (the only cross-delta obligation — parent
#   dims are broadcast-sized or bloom-prunable at scale).
#
# Scale shape: every check is one map-combined aggregate over the
# pruned delta scan; FK anti-joins ship only delta rows through the
# shuffle. Nothing rescans the 100-TB table for a 100-row delta.
# ---------------------------------------------------------------------------


def audit_delta_partitions(
    spark: SparkSession,
    table_path: str,
    partition_col: str,
    partition_values: list,
    row_checks: dict[str, str],
    pk_expr: str | None = None,
) -> DataFrame:
    """Audit ONLY the given partitions of a partitioned parquet table:
    returns (check_name, n_rows, n_violations). The partition filter
    is a literal IN, so the scan prunes to the touched partitions."""
    delta = spark.read.parquet(table_path).filter(
        F.col(partition_col).isin(partition_values)
    )
    frames = []
    if pk_expr is not None:
        frames.append(
            delta.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                (F.count(F.lit(1)) - F.countDistinct(F.expr(pk_expr)))
                .cast("bigint")
                .alias("n_violations"),
            ).select(
                F.lit("pk_unique").alias("check_name"),
                "n_rows",
                "n_violations",
            )
        )
    for name, pred in row_checks.items():
        frames.append(
            delta.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.coalesce(
                    F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END")),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("n_violations"),
            ).select(
                F.lit(name).alias("check_name"), "n_rows", "n_violations"
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _delta_oracle() -> str:
    branches = [
        # delta orders: pk + domain + FK vs full customer dim
        "SELECT 'orders' AS table_name, 'pk_unique' AS check_name,"
        " CAST(count(*) AS BIGINT) AS n_rows,"
        " CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)"
        " AS n_violations FROM dord",
        "SELECT 'orders', 'nonpositive_totalprice',"
        " CAST(count(*) AS BIGINT),"
        " CAST(coalesce(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0"
        " END), 0) AS BIGINT) FROM dord",
        "SELECT 'orders', 'null_orderdate', CAST(count(*) AS BIGINT),"
        " CAST(coalesce(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0"
        " END), 0) AS BIGINT) FROM dord",
        "SELECT 'orders', 'fk_customer_exists',"
        " CAST((SELECT count(*) FROM dord) AS BIGINT),"
        " CAST((SELECT count(*) FROM dord"
        "  ANTI JOIN customer ON o_custkey = c_custkey) AS BIGINT)",
        # delta lineitems: pk + domain + FK vs full orders
        "SELECT 'lineitem', 'pk_unique', CAST(count(*) AS BIGINT),"
        " CAST(count(*) - count(DISTINCT l_orderkey * 10 +"
        " l_linenumber) AS BIGINT) FROM dli",
        "SELECT 'lineitem', 'nonpositive_quantity',"
        " CAST(count(*) AS BIGINT),"
        " CAST(coalesce(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0"
        " END), 0) AS BIGINT) FROM dli",
        "SELECT 'lineitem', 'discount_out_of_range',"
        " CAST(count(*) AS BIGINT),"
        " CAST(coalesce(sum(CASE WHEN l_discount < 0 OR l_discount > 1"
        " THEN 1 ELSE 0 END), 0) AS BIGINT) FROM dli",
        "SELECT 'lineitem', 'fk_orders_exists',"
        " CAST((SELECT count(*) FROM dli) AS BIGINT),"
        " CAST((SELECT count(*) FROM dli"
        "  ANTI JOIN orders ON l_orderkey = o_orderkey) AS BIGINT)",
    ]
    return (
        "WITH yy AS (SELECT max(year(CAST(o_orderdate AS DATE)))"
        " AS y FROM orders),\n"
        "dord AS (SELECT * FROM orders, yy"
        " WHERE year(CAST(o_orderdate AS DATE)) = y),\n"
        "dli AS (SELECT l.* FROM lineitem l"
        " SEMI JOIN dord ON l.l_orderkey = dord.o_orderkey),\n"
        "u AS (\n" + "\nUNION ALL\n".join(branches) + "\n)\n"
        "SELECT * FROM u ORDER BY table_name, check_name"
    )


@register("expectations_audit_delta", oracle=_delta_oracle())
def expectations_audit_delta(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta-scoped constraint sweep: audits only the latest order
    year (the partition a nightly merge lands) and its lineitems;
    (table_name, check_name, n_rows, n_violations)."""

    def row(table: str, check: str, agg: DataFrame) -> DataFrame:
        return agg.select(
            F.lit(table).alias("table_name"),
            F.lit(check).alias("check_name"),
            "n_rows",
            "n_violations",
        )

    orders = load_table(spark, sf_dir, "orders")
    yy = orders.agg(
        F.max(F.year(F.col("o_orderdate").cast("date"))).alias("y")
    )
    do = orders.crossJoin(F.broadcast(yy)).filter(
        F.year(F.col("o_orderdate").cast("date")) == F.col("y")
    ).localCheckpoint()  # the delta is consumed by 5 checks below
    dl = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            do.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .localCheckpoint()
    )

    def count_agg(df: DataFrame, pred: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.coalesce(
                F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END")),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_violations"),
        )

    def pk_agg(df: DataFrame, key: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (F.count(F.lit(1)) - F.countDistinct(F.expr(key)))
            .cast("bigint")
            .alias("n_violations"),
        )

    def fk_agg(child: DataFrame, parent: DataFrame, cond) -> DataFrame:
        orphans = child.join(parent, cond, "left_anti").agg(
            F.count(F.lit(1)).cast("bigint").alias("v")
        )
        return (
            child.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
            .crossJoin(F.broadcast(orphans))
            .select("n_rows", F.col("v").alias("n_violations"))
        )

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    okeys = orders.select(F.col("o_orderkey").alias("pk_orderkey"))
    frames = [
        row("orders", "pk_unique", pk_agg(do, "o_orderkey")),
        row(
            "orders",
            "nonpositive_totalprice",
            count_agg(do, "o_totalprice <= 0"),
        ),
        row(
            "orders", "null_orderdate", count_agg(do, "o_orderdate IS NULL")
        ),
        row(
            "orders",
            "fk_customer_exists",
            fk_agg(do, cust, F.col("o_custkey") == F.col("c_custkey")),
        ),
        row(
            "lineitem",
            "pk_unique",
            pk_agg(dl, "l_orderkey * 10 + l_linenumber"),
        ),
        row(
            "lineitem",
            "nonpositive_quantity",
            count_agg(dl, "l_quantity <= 0"),
        ),
        row(
            "lineitem",
            "discount_out_of_range",
            count_agg(dl, "l_discount < 0 OR l_discount > 1"),
        ),
        row(
            "lineitem",
            "fk_orders_exists",
            fk_agg(
                dl, okeys, F.col("l_orderkey") == F.col("pk_orderkey")
            ),
        ),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("table_name", "check_name")
