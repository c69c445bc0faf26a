"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-Q1-shaped JX groupby) on
sf0.001. ``queries()``/``oracle_sql()`` expose the full operator catalog in
``mysql_to_s3_spark.queries`` — one entry per implemented SURVEY.md §2
operator, each with a DuckDB oracle whose column aliases match the Spark
result exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mysql_to_s3_spark import queries as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.build("groupby_tpch_q1")(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _catalog.build(name) for name in _catalog.names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query, same column aliases as the
    Spark result. Entries without SQL-expressible semantics are omitted
    (driver records a rows-only check)."""
    return {name: sql for name in _catalog.names() if (sql := _catalog.oracle(name)) is not None}
