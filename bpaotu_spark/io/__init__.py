"""Sources and sinks: parquet/CSV/JSON readers and writers, JDBC stub."""

from bpaotu_spark.io.readers import (
    read_csv,
    read_jdbc,
    read_json,
    write_csv,
    write_json,
    write_parquet,
)

__all__ = [
    "read_csv",
    "read_jdbc",
    "read_json",
    "write_csv",
    "write_json",
    "write_parquet",
]
