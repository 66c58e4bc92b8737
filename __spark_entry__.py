"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`mongo_olap_spark.queries` — the declared-query
manifest (SURVEY.md §2.4). ``entry`` runs the flagship cube build
(TPC-H-Q1-shaped pre-aggregation on lineitem) at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mongo_olap_spark.queries import QUERIES

    return QUERIES["q_cube_build"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from mongo_olap_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query in :func:`queries`."""
    from mongo_olap_spark.queries import ORACLE

    return dict(ORACLE)
