"""Mongo-semantics expression helpers (SURVEY.md §2.2 deltas): ANSI
Spark errors where Mongo yields null, 0- vs 1-based indexing, $ne
matching nulls, array predicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_olap_spark.functions import expressions as ex


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, 10.0, 2.0, "hello world", ["a", "b", "c"]),
         (2, 5.0, 0.0, "spark", ["x"]),
         (3, None, 4.0, None, [])],
        "id int, a double, b double, s string, arr array<string>",
    )


def test_mongo_divide_null_on_zero(df):
    out = {r.id: r.q for r in df.select("id", ex.mongo_divide(F.col("a"), F.col("b")).alias("q")).collect()}
    assert out[1] == 5.0
    assert out[2] is None  # 5/0 → null, not ANSI error
    assert out[3] is None


def test_mongo_mod_null_on_zero(df):
    out = {r.id: r.m for r in df.select("id", ex.mongo_mod(F.col("a"), F.col("b")).alias("m")).collect()}
    assert out[1] == 0.0
    assert out[2] is None


def test_mongo_substr_zero_based(df):
    out = df.filter("id = 1").select(ex.mongo_substr(F.col("s"), 0, 5).alias("x")).first()
    assert out.x == "hello"  # Mongo $substrCP is 0-based
    out2 = df.filter("id = 1").select(ex.mongo_substr(F.col("s"), 6, 5).alias("x")).first()
    assert out2.x == "world"


def test_mongo_index_of(df):
    out = df.filter("id = 1").select(ex.mongo_index_of(F.col("s"), "world").alias("i")).first()
    assert out.i == 6  # 0-based
    out2 = df.filter("id = 1").select(ex.mongo_index_of(F.col("s"), "zzz").alias("i")).first()
    assert out2.i == -1  # absent → −1 like Mongo


def test_mongo_ne_matches_null(df):
    # Mongo $ne: {s: {$ne: "spark"}} matches docs where s is missing/null
    got = {r.id for r in df.filter(ex.mongo_ne(F.col("s"), F.lit("spark"))).collect()}
    assert got == {1, 3}


def test_mongo_exists(df):
    got = {r.id for r in df.filter(ex.mongo_exists(F.col("s"))).collect()}
    assert got == {1, 2}


def test_mongo_cond_switch_ifnull(df):
    out = df.select(
        "id",
        ex.mongo_cond(F.col("a") > 6, F.lit("big"), F.lit("small")).alias("c"),
        ex.mongo_if_null(F.col("a"), F.lit(-1.0)).alias("n"),
        ex.mongo_switch(
            [(F.col("id") == 1, F.lit("one")), (F.col("id") == 2, F.lit("two"))],
            F.lit("other"),
        ).alias("sw"),
    ).collect()
    by_id = {r.id: r for r in out}
    assert by_id[1].c == "big" and by_id[2].c == "small"
    assert by_id[3].n == -1.0
    assert [by_id[i].sw for i in (1, 2, 3)] == ["one", "two", "other"]


def test_mongo_to_int_on_error_null(spark):
    df = spark.createDataFrame([("12",), ("nope",)], "s string")
    out = [r.i for r in df.select(ex.mongo_to_int(F.col("s")).alias("i")).collect()]
    assert out == [12, None]  # Mongo $convert onError:null


def test_elem_match_and_all(df):
    got = {r.id for r in df.filter(ex.mongo_elem_match(F.col("arr"), lambda x: x == "b")).collect()}
    assert got == {1}
    got2 = {r.id for r in df.filter(ex.mongo_all(F.col("arr"), ["a", "c"])).collect()}
    assert got2 == {1}


def test_dsum_bit_stable_under_partitioning(spark):
    vals = [(float(i) * 0.1,) for i in range(10001)]
    df = spark.createDataFrame(vals, "x double")
    a = df.repartition(1).agg(ex.dsum("x", "s")).first().s
    b = df.repartition(97).agg(ex.dsum("x", "s")).first().s
    assert a == b  # exact decimal path: no summation-order drift


def test_cosine_null_safe_on_zero_vector(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>")
    out = df.select(ex.cosine(F.col("a"), F.col("b")).alias("c")).first()
    assert out.c is None  # try_divide → null, not error/NaN
