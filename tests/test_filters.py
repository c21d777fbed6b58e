"""ContextualFilter / TaxonomyFilter builder semantics (unit-level)."""

from __future__ import annotations

import pytest

from bpaotu_spark.plans.filters import ContextualFilter, Pred
from bpaotu_spark.plans.taxonomy import RankFix, TaxonomyFilter


def test_pred_validates_operator():
    with pytest.raises(ValueError):
        Pred("x", "like")  # type: ignore[arg-type]
    with pytest.raises(ValueError):
        Pred("x", "between", 3)
    with pytest.raises(ValueError):
        Pred("x", "in", "notalist")


def test_pred_sql_escapes_quotes_and_like_wildcards():
    assert Pred("f", "eq", "O'Brien").sql() == "f = 'O''Brien'"
    assert Pred("f", "contains", "10%_x").sql() == r"f LIKE '%10\%\_x%' ESCAPE '\'"
    assert Pred("f", "contains", "a'b").sql() == r"f LIKE '%a''b%' ESCAPE '\'"


def test_filter_modes_spark_vs_local(spark):
    df = spark.createDataFrame(
        [(1, "aa", 5.0), (2, "ab", -1.0), (3, None, 2.0)], "id int, s string, v double"
    )
    both = ContextualFilter.of([Pred("s", "contains", "a"), Pred("v", "gt", 0.0)], "and")
    assert [r.id for r in df.filter(both.column()).collect()] == [1]
    either = ContextualFilter.of([Pred("s", "isnull"), Pred("v", "lt", 0.0)], "or")
    assert sorted(r.id for r in df.filter(either.column()).collect()) == [2, 3]
    empty = ContextualFilter.of([], "and")
    assert df.filter(empty.column()).count() == 3


def test_filter_pushes_to_parquet_scan(spark, sf_dir, tables):
    cf = ContextualFilter.of(
        [Pred("c_acctbal", "gt", 0.0), Pred("c_mktsegment", "eq", "BUILDING")], "and"
    )
    df = tables["customer"].filter(cf.column())
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters:" in plan
    assert "GreaterThan(c_acctbal,0.0)" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_taxonomy_next_rank_and_sql():
    tf = TaxonomyFilter(("k", "p", "c"), (RankFix(0, "Bacteria"),))
    assert tf.next_rank() == "p"
    assert tf.sql() == "k = 'Bacteria'"
    tf2 = TaxonomyFilter(("k", "p", "c"), (RankFix(0, "Bacteria"), RankFix(1, "Firmicutes")))
    assert tf2.next_rank() == "c"
    with pytest.raises(ValueError):
        TaxonomyFilter(("k",), (RankFix(0, "x"),)).next_rank()
    # negated fixes narrow the set but do not advance the drill depth
    tf3 = TaxonomyFilter(("k", "p"), (RankFix(0, "x", negated=True),))
    assert tf3.next_rank() == "k"


def test_operators_survive_empty_selection(spark, sf_dir):
    """A ContextualFilter that matches nothing must flow through the
    abundance operators as an empty result, not an error."""
    import pyspark.sql.functions as F

    from bpaotu_spark.catalog import load_table
    from bpaotu_spark.operators.bpaotu import abundance
    from bpaotu_spark.plans.filters import ContextualFilter, Pred

    nothing = ContextualFilter.of(
        [Pred("c_mktsegment", "eq", "NO_SUCH_SEGMENT")], "and"
    )
    cust = load_table(spark, sf_dir, "customer").filter(nothing.column())
    assert cust.count() == 0
    sel = cust.select(F.col("c_custkey").alias("sample_id"))
    ab = abundance(spark, sf_dir).join(F.broadcast(sel), "sample_id")
    agg = ab.groupBy("otu_id").agg(F.sum("cnt").alias("total"))
    assert agg.count() == 0


def test_filter_on_all_null_column(spark):
    """Null-heavy columns: isnull/notnull and comparison predicates must
    emit the same rows in both engines (SQL three-valued logic)."""
    import duckdb
    import pandas as pd

    from bpaotu_spark.plans.filters import ContextualFilter, Pred

    pdf = pd.DataFrame({"num_col": [None] * 4, "str_col": [None] * 4}).astype(
        {"num_col": "float64", "str_col": "object"}
    )
    sdf = spark.createDataFrame(pdf)
    for p in (
        Pred("num_col", "isnull"),
        Pred("num_col", "notnull"),
        Pred("num_col", "lt", 5.0),
        Pred("str_col", "contains", "x"),
    ):
        f = ContextualFilter.of([p], "and")
        got = sdf.filter(f.column()).count()
        duck = duckdb.connect()
        duck.register("t", pdf)
        want = duck.execute(f"SELECT count(*) FROM t WHERE {f.sql()}").fetchone()[0]
        assert got == want, p
