"""The declared-query manifest (SURVEY.md §2.4).

Every implemented operator gets a ``q_*`` entry: a callable
``(spark, sf_dir) -> DataFrame`` in :data:`QUERIES` and, when the
semantics are ANSI-SQL-expressible, a DuckDB oracle string in
:data:`ORACLE`. Column names are aliased identically on both sides
(the driver sorts columns by name before hashing values).

Numeric policy: every aggregated double goes through the exact-decimal
sum (functions.expressions.dsum/davg) on the Spark side and its
``dsum_sql``/``davg_sql`` twin in the oracle, so value hashes match
bit-for-bit regardless of partitioning or engine summation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(qid: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn):
        QUERIES[qid] = fn
        if oracle is not None:
            ORACLE[qid] = oracle
        return fn

    return deco


# Importing the modules populates the registry.
from mongo_olap_spark.queries import core  # noqa: E402,F401
from mongo_olap_spark.queries import relational  # noqa: E402,F401
from mongo_olap_spark.queries import windows  # noqa: E402,F401
from mongo_olap_spark.queries import extensions  # noqa: E402,F401
from mongo_olap_spark.queries import incremental  # noqa: E402,F401
from mongo_olap_spark.queries import accumulators  # noqa: E402,F401
from mongo_olap_spark.queries import misc  # noqa: E402,F401
from mongo_olap_spark.queries import pipelines  # noqa: E402,F401
