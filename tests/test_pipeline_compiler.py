"""Pipeline-compiler tests: JSON Mongo pipelines → DataFrame plans.

Each test compiles a pipeline and checks the result against the
equivalent hand-written DataFrame query on the same testdata — the
compiler must add nothing and lose nothing relative to writing the
plan by hand. A plan test asserts no Python nodes appear (compiled
pipelines are pure Column expressions).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_olap_spark.functions.expressions import davg, dsum
from mongo_olap_spark.plans.pipeline_compiler import (
    PipelineError,
    compile_expr,
    compile_match,
    compile_pipeline,
)
from mongo_olap_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return load_table(spark, sf_dir, "customer")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_match_group_sort(events):
    out = compile_pipeline(
        events,
        [
            {"$match": {"value": {"$gt": 50}, "event_type": {"$ne": None}}},
            {"$group": {
                "_id": "$event_type",
                "n": {"$sum": 1},
                "total": {"$sum": "$value"},
                "avg": {"$avg": "$value"},
            }},
            {"$sort": {"_id": 1}},
        ],
    )
    exp = (
        events.filter((F.col("value") > 50) & F.col("event_type").isNotNull())
        .groupBy(F.col("event_type").alias("_id"))
        .agg(
            F.sum(F.lit(1)).alias("n"),
            dsum("value", "total"),
            davg("value", "avg"),
        )
        .orderBy("_id")
    )
    assert _rows(out) == _rows(exp)


def test_project_expressions_and_addfields(events):
    out = compile_pipeline(
        events,
        [
            {"$addFields": {"v2": {"$multiply": ["$value", 2]}}},
            {"$project": {
                "event_id": 1,
                "day": {"$dateTrunc": {"date": "$ts", "unit": "day"}},
                "big": {"$cond": {"if": {"$gte": ["$v2", 100]},
                                   "then": "yes", "else": "no"}},
            }},
        ],
    )
    exp = events.select(
        "event_id",
        F.date_trunc("day", "ts").alias("day"),
        F.when(F.col("value") * 2 >= 100, "yes").otherwise("no").alias("big"),
    )
    assert _rows(out) == _rows(exp)


def test_unwind_preserve_and_index(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None)], "id int, xs array<string>"
    )
    out = compile_pipeline(
        df,
        [{"$unwind": {"path": "$xs", "preserveNullAndEmptyArrays": True,
                      "includeArrayIndex": "i"}}],
    )
    assert _rows(out) == sorted(
        [(1, 0, "a"), (1, 1, "b"), (2, None, None), (3, None, None)]
    )


def test_first_last_require_sort(events):
    with pytest.raises(PipelineError, match="requires a preceding"):
        compile_pipeline(
            events,
            [{"$group": {"_id": "$event_type", "f": {"$first": "$value"}}}],
        )
    out = compile_pipeline(
        events,
        [
            {"$sort": {"ts": 1}},
            {"$group": {"_id": "$user_id", "first_v": {"$first": "$value"}}},
        ],
    )
    exp = events.groupBy(F.col("user_id").alias("_id")).agg(
        F.expr("min_by(value, struct(ts))").alias("first_v")
    )
    assert _rows(out) == _rows(exp)


def test_lookup_packs_arrays_without_row_multiplication(orders, customer):
    out = compile_pipeline(
        orders,
        [
            {"$lookup": {"from": "customer", "localField": "o_custkey",
                         "foreignField": "c_custkey", "as": "cust"}},
            {"$project": {"o_orderkey": 1, "n_cust": {"$size": "$cust"}}},
        ],
        collections={"customer": customer},
    )
    assert out.count() == orders.count()  # $lookup never multiplies rows
    # every order matches exactly one customer in the testbed
    assert out.filter(F.col("n_cust") != 1).count() == 0


def test_union_with_nested_pipeline(events):
    out = compile_pipeline(
        events.limit(5).select("event_id", "value"),
        [{"$unionWith": {
            "coll": "events",
            "pipeline": [
                {"$match": {"value": {"$gt": 99}}},
                {"$project": {"event_id": 1, "value": 1}},
            ],
        }}],
        collections={"events": events},
    )
    n_gt = events.filter(F.col("value") > 99).count()
    assert out.count() == 5 + n_gt


def test_match_language_surface(events):
    q = {
        "$or": [
            {"value": {"$gte": 99.5}},
            {"$and": [{"event_type": {"$in": ["click", "view"]}},
                      {"value": {"$lt": 0.5}}]},
        ]
    }
    out = events.filter(compile_match(q))
    exp = events.filter(
        (F.col("value") >= 99.5)
        | (F.col("event_type").isin("click", "view") & (F.col("value") < 0.5))
    )
    assert out.count() == exp.count() > 0


def test_expr_operator_coverage(spark):
    df = spark.createDataFrame([(7, 2, "Hello World")], "a int, b int, s string")
    got = df.select(
        compile_expr({"$add": ["$a", "$b", 1]}).alias("add"),
        compile_expr({"$divide": ["$a", 0]}).alias("div0"),
        compile_expr({"$mod": ["$a", "$b"]}).alias("mod"),
        compile_expr({"$substrCP": ["$s", 0, 5]}).alias("sub"),
        compile_expr({"$indexOfCP": ["$s", "World"]}).alias("idx"),
        compile_expr({"$toLower": "$s"}).alias("low"),
        compile_expr({"$ifNull": ["$missing_like_null", "dflt"]}.copy()
                     if False else {"$ifNull": [None, "dflt"]}).alias("ifn"),
        compile_expr({"$switch": {
            "branches": [{"case": {"$gt": ["$a", 5]}, "then": "big"}],
            "default": "small"}}).alias("sw"),
        compile_expr({"$in": ["2", {"$split": ["1 2 3", " "]}]}).alias("yep"),
        compile_expr({"$in": ["9", {"$split": ["1 2 3", " "]}]}).alias("nope"),
    ).collect()[0]
    assert got["add"] == 10
    assert got["div0"] is None
    assert got["mod"] == 1
    assert got["sub"] == "Hello"
    assert got["idx"] == 6
    assert got["low"] == "hello world"
    assert got["ifn"] == "dflt"
    assert got["sw"] == "big"
    assert got["nope"] is False and got["yep"] is True


def test_unsupported_raises(events):
    with pytest.raises(PipelineError, match="unsupported stage"):
        compile_pipeline(events, [{"$indexStats": {}}])
    with pytest.raises(PipelineError, match="unsupported expression operator"):
        compile_expr({"$function": {}})


def test_compiled_pipeline_has_no_python_nodes(events):
    out = compile_pipeline(
        events,
        [
            {"$match": {"value": {"$gt": 50}}},
            {"$addFields": {"day": {"$dateTrunc": {"date": "$ts", "unit": "day"}}}},
            {"$group": {"_id": "$day", "n": {"$sum": 1}}},
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    # the value filter must reach the scan
    assert "PushedFilters" in plan
