"""Sources and sinks: parquet/CSV/JSON readers and writers, JDBC +
DB-API database connectivity."""

from bpaotu_spark.io.readers import (
    read_csv,
    read_dbapi,
    read_jdbc,
    read_json,
    write_csv,
    write_dbapi,
    write_json,
    write_parquet,
)

__all__ = [
    "read_csv",
    "read_dbapi",
    "read_jdbc",
    "read_json",
    "write_csv",
    "write_dbapi",
    "write_json",
    "write_parquet",
]
