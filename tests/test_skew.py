"""Salting operators: result-identical to the unsalted plan, with the
join/aggregation keys actually spread over (key, salt)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_olap_spark.operators.skew import SALT_COL, salted_collect_set, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of fact rows share one hot key
    facts = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    return facts.cache(), dim.cache()


def test_salted_join_matches_plain_join(spark, skewed):
    facts, dim = skewed
    plain = {tuple(r) for r in facts.join(dim, ["k"]).collect()}
    salted = {tuple(r) for r in salted_join(facts, dim, ["k"], n_salt=8).collect()}
    assert salted == plain


def test_salted_join_left_preserves_unmatched(spark, skewed):
    facts, dim = skewed
    sparse_dim = dim.filter(F.col("k") % 2 == 0)
    plain = {tuple(r) for r in facts.join(sparse_dim, ["k"], "left").collect()}
    salted = {
        tuple(r) for r in salted_join(facts, sparse_dim, ["k"], how="left", n_salt=8).collect()
    }
    assert salted == plain


def test_salted_join_shuffles_on_key_and_salt(spark, skewed):
    facts, dim = skewed
    plan = (
        salted_join(facts, dim, ["k"], n_salt=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert SALT_COL in plan  # the exchange keys include the salt


def test_salted_join_rejects_row_multiplying_types(spark, skewed):
    facts, dim = skewed
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(facts, dim, ["k"], how="full")


def test_salted_collect_set_matches_plain(spark, skewed):
    facts, _ = skewed
    df = facts.withColumn("v", (F.col("fact_id") % 37).cast("long"))
    plain = {
        (r.k, tuple(r.values))
        for r in df.groupBy("k")
        .agg(F.array_sort(F.collect_set("v")).alias("values"))
        .collect()
    }
    salted = {
        (r.k, tuple(r.values))
        for r in salted_collect_set(df, ["k"], "v", n_salt=8).collect()
    }
    assert salted == plain
