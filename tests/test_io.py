"""Sources/sinks: round-trips, partitioned write + pruning, export shapes."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from bpaotu_spark.io.readers import (
    read_csv,
    read_jdbc,
    read_json,
    write_csv,
    write_json,
    write_parquet,
)
from bpaotu_spark.registry import QUERIES, load_all

load_all()


def test_parquet_partitioned_write_and_pruning(spark, sf_dir, tables, tmp_path):
    out = str(tmp_path / "cust_parted")
    write_parquet(tables["customer"], out, partition_by=("c_mktsegment",))
    segs = [d for d in os.listdir(out) if d.startswith("c_mktsegment=")]
    assert len(segs) == 5
    back = spark.read.parquet(out).filter(F.col("c_mktsegment") == "BUILDING")
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    # partition filter handled by pruning, not data filters
    assert "PartitionFilters: [isnotnull(c_mktsegment" in plan
    assert back.count() == tables["customer"].filter(
        F.col("c_mktsegment") == "BUILDING"
    ).count()


def test_csv_roundtrip(spark, tables, tmp_path):
    out = str(tmp_path / "nation_csv")
    write_csv(tables["nation"], out, single_file=True)
    back = read_csv(spark, out)
    assert back.count() == 25
    assert sorted(back.columns) == sorted(tables["nation"].columns)


def test_json_roundtrip(spark, tables, tmp_path):
    out = str(tmp_path / "region_json")
    write_json(tables["region"], out)
    back = read_json(spark, out)
    assert {r.r_name for r in back.collect()} == {
        r.r_name for r in tables["region"].collect()
    }


def test_export_long_abundance_to_csv(spark, sf_dir, tmp_path):
    """The reference's CSV export path: filtered long-form abundance."""
    df = QUERIES["export_long_abundance"](spark, sf_dir)
    out = str(tmp_path / "export_csv")
    write_csv(df, out, single_file=True)
    back = read_csv(spark, out)
    assert back.count() == df.count()


def test_jdbc_fails_with_clear_error(spark):
    with pytest.raises(RuntimeError, match="JDBC driver jar"):
        read_jdbc(spark, "jdbc:postgresql://nowhere/db", "tbl")
