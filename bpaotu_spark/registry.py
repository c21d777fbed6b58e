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
