"""Lattice materialization: every materialized level equals direct
aggregation; non-materialized subsets roll up from the finest
materialized superset; unservable subsets error."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_olap_spark.cube.lattice import (
    LEVEL_COL,
    build_cube_lattice,
    level_mask,
    materialized_levels,
    query_lattice,
)
from mongo_olap_spark.functions.expressions import davg, dsum
from mongo_olap_spark.queries.core import EVENTS_CUBE


def rows_set(df):
    return {tuple(r) for r in df.collect()}


def direct(events, subset):
    src = events.withColumn("day", F.date_trunc("day", "ts"))
    return src.groupBy(*subset).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "total_value"),
        davg("value", "avg_value"),
    )


@pytest.fixture(scope="module")
def lattice(spark, events):
    # materialize the full cube lattice: all 4 subsets of 2 dims
    cells = build_cube_lattice(
        spark,
        EVENTS_CUBE,
        events,
        levels=[("event_type", "day"), ("event_type",), ("day",), ()],
    ).cache()
    cells.count()
    return cells


def test_all_levels_present(lattice):
    assert sorted(materialized_levels(lattice)) == [0, 1, 2, 3]


@pytest.mark.parametrize(
    "subset", [("event_type", "day"), ("event_type",), ("day",), ()]
)
def test_each_level_equals_direct(spark, events, lattice, subset):
    got = query_lattice(lattice, EVENTS_CUBE, group_by=list(subset))
    assert rows_set(got) == rows_set(direct(events, subset))


def test_exact_hit_needs_no_shuffle(spark, lattice, tmp_path):
    # materialized-at-rest shape: read cells from parquet so the plan
    # shows only query-time work
    lattice.write.mode("overwrite").parquet(str(tmp_path / "cells"))
    stored = spark.read.parquet(str(tmp_path / "cells"))
    plan = (
        query_lattice(stored, EVENTS_CUBE, group_by=["event_type"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # row-wise finalize, no aggregation
    assert "HashAggregate" not in plan


def test_missing_level_rolls_up_from_superset(spark, events):
    cells = build_cube_lattice(
        spark, EVENTS_CUBE, events, levels=[("event_type", "day"), ()]
    )
    got = query_lattice(cells, EVENTS_CUBE, group_by=["day"])  # not materialized
    assert rows_set(got) == rows_set(direct(events, ("day",)))


def test_unservable_without_any_superset(spark, events):
    cells = build_cube_lattice(spark, EVENTS_CUBE, events, levels=[("event_type",)])
    with pytest.raises(ValueError, match="no materialized level"):
        query_lattice(cells, EVENTS_CUBE, group_by=["day"])


def test_level_mask_bit_order():
    assert level_mask(EVENTS_CUBE, ["event_type", "day"]) == 0
    assert level_mask(EVENTS_CUBE, ["event_type"]) == 1  # day dropped → LSB
    assert level_mask(EVENTS_CUBE, ["day"]) == 2
    assert level_mask(EVENTS_CUBE, []) == 3


def test_single_scan_plan(spark, events):
    cells = build_cube_lattice(spark, EVENTS_CUBE, events)
    plan = cells._jdf.queryExecution().executedPlan().toString()
    # one Expand + one aggregate pair — not one scan per level
    assert plan.count("FileScan parquet") <= 1 or plan.count("Scan ExistingRDD") <= 1
    assert "Expand" in plan
