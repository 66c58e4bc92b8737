"""Mongo-fidelity null/missing matrix (round-5 task 9).

One table-driven test asserting the engine's documented missing≡null
rule (SURVEY.md §1.2) across the match operators and the expression
library, with the MongoDB-documented expected matches inline.

Mongo collection of record:
    {_id: 1, x: 5}      -- value present
    {_id: 2, x: null}   -- explicit null
    {_id: 3}            -- field missing

Engine mapping: both null and missing become SQL NULL, so rows 2 and 3
are indistinguishable. Where Mongo distinguishes them ($exists, $type)
the engine's documented delta is asserted here too and recorded in
USAGE.md.
"""

from __future__ import annotations

import pytest

from mongo_olap_spark.plans.pipeline_compiler import (
    PipelineError,
    compile_match,
    compile_pipeline,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, 5), (2, None), (3, None)], "_id int, x int"
    )


def ids(df) -> set[int]:
    return {r["_id"] for r in df.collect()}


#: (match document, Mongo's matching _ids given missing≡null).
#: Every row here is Mongo-documented behavior that the engine
#: reproduces EXACTLY under the missing≡null rule.
MATCH_MATRIX = [
    ({"x": 5}, {1}),
    ({"x": None}, {2, 3}),            # equality-to-null matches missing
    ({"x": {"$eq": 5}}, {1}),
    ({"x": {"$eq": None}}, {2, 3}),
    ({"x": {"$ne": 5}}, {2, 3}),      # $ne matches null AND missing
    ({"x": {"$ne": None}}, {1}),
    ({"x": {"$gt": 3}}, {1}),         # comparisons never match null
    ({"x": {"$gte": 5}}, {1}),
    ({"x": {"$lt": 99}}, {1}),
    ({"x": {"$in": [5]}}, {1}),
    ({"x": {"$in": [None]}}, {2, 3}),     # null member matches missing
    ({"x": {"$in": [5, None]}}, {1, 2, 3}),
    ({"x": {"$in": [7]}}, set()),
    ({"x": {"$nin": [5]}}, {2, 3}),   # $nin matches missing like $ne
    ({"x": {"$nin": [None]}}, {1}),   # null member excludes null+missing
    ({"x": {"$nin": [5, None]}}, set()),
    ({"x": {"$not": {"$gt": 3}}}, {2, 3}),  # $not matches non-matching docs
    ({"$expr": {"$eq": ["$x", None]}}, {2, 3}),  # agg $eq is null-safe
    ({"$expr": {"$ne": ["$x", None]}}, {1}),
    # aggregation comparisons use BSON TOTAL order: null sorts below
    # every number, so null < 99 is TRUE (unlike the $match query
    # language above, where comparisons never match null)
    ({"$expr": {"$lt": ["$x", 99]}}, {1, 2, 3}),
    ({"$expr": {"$gt": ["$x", None]}}, {1}),
    ({"$expr": {"$lte": ["$x", None]}}, {2, 3}),
    ({"$expr": {"$gte": ["$x", None]}}, {1, 2, 3}),
]

#: Documented DELTAS from Mongo: under missing≡null the engine cannot
#: tell row 2 (explicit null) from row 3 (missing). Mongo would return
#: the `mongo` column; the engine returns `engine`.
DELTA_MATRIX = [
    ({"x": {"$exists": True}}, {1, 2}, {1}),
    ({"x": {"$exists": False}}, {3}, {2, 3}),
]


@pytest.mark.parametrize("query,want", MATCH_MATRIX,
                         ids=[repr(q) for q, _ in MATCH_MATRIX])
def test_match_null_matrix(docs, query, want):
    assert ids(docs.filter(compile_match(query))) == want
    # the same document through the full pipeline path
    assert ids(compile_pipeline(docs, [{"$match": query}])) == want


@pytest.mark.parametrize("query,mongo,engine", DELTA_MATRIX,
                         ids=[repr(q) for q, _, _ in DELTA_MATRIX])
def test_match_exists_documented_delta(docs, query, mongo, engine):
    got = ids(docs.filter(compile_match(query)))
    assert got == engine
    # the delta is exactly {row 2 vs row 3} — nothing else drifts
    assert got.symmetric_difference(mongo) <= {2, 3}


def test_type_match_refuses_by_name(docs):
    # $type is schema-static in Spark (a column has ONE type) — the
    # engine refuses it loudly instead of guessing
    with pytest.raises(PipelineError, match=r"\$type"):
        docs.filter(compile_match({"x": {"$type": "null"}}))


def test_expression_null_matrix(spark, docs):
    out = compile_pipeline(
        docs,
        [{"$project": {
            "_id": 1,
            "filled": {"$ifNull": ["$x", -1]},
            "is_null_eq": {"$eq": ["$x", None]},
            "cmp_null": {"$gt": ["$x", 3]},
            "cond": {"$cond": [{"$gt": ["$x", 3]}, "big", "small"]},
        }}],
    )
    got = {r["_id"]: r for r in out.collect()}
    assert [got[i]["filled"] for i in (1, 2, 3)] == [5, -1, -1]
    assert [got[i]["is_null_eq"] for i in (1, 2, 3)] == [False, True, True]
    # Mongo: comparison with null in $cond's predicate is falsy ->
    # "small"; Spark's when() treats the null predicate as not-matched,
    # the same outcome
    assert [got[i]["cond"] for i in (1, 2, 3)] == ["big", "small", "small"]


def test_expression_library_null_helpers(spark):
    from pyspark.sql import functions as F

    from mongo_olap_spark.functions.expressions import (
        mongo_exists,
        mongo_if_null,
        mongo_ne,
    )

    df = spark.createDataFrame([(5,), (None,)], "x int")
    rows = df.select(
        mongo_ne(F.col("x"), F.lit(5)).alias("ne"),
        mongo_exists(F.col("x")).alias("ex"),
        mongo_if_null(F.col("x"), F.lit(-1)).alias("iffed"),
    ).collect()
    assert [(r["ne"], r["ex"], r["iffed"]) for r in rows] == [
        (False, True, 5), (True, False, -1)]
