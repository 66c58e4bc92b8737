"""Cube-layer invariants (SURVEY.md §5.3/§5.4).

The load-bearing property: pre-aggregation must be invisible — any
rollup of cube cells to a dimension subset equals direct aggregation
of the source, bit-for-bit (exact decimal partials make this an
equality test, not an approximate one).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from mongo_olap_spark.cube import CubeCatalog, CubeSpec, Dimension, Measure, build_cube, query_cube
from mongo_olap_spark.functions.expressions import davg, dsum
from mongo_olap_spark.queries.core import EVENTS_CUBE, PRICING_CUBE
from mongo_olap_spark.sources.tables import load_table


def rows_set(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize(
    "subset", [(), ("event_type",), ("day",), ("event_type", "day")]
)
def test_rollup_equals_direct_aggregation(spark, events, subset):
    cells = build_cube(spark, EVENTS_CUBE, events)
    rolled = query_cube(cells, EVENTS_CUBE, group_by=list(subset))

    direct_src = events.withColumn("day", F.date_trunc("day", "ts"))
    direct = direct_src.groupBy(*subset).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "total_value"),
        davg("value", "avg_value"),
    )
    assert rows_set(rolled) == rows_set(direct)


def test_minmax_measures_roll_up(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    spec = CubeSpec(
        name="li_minmax",
        source="lineitem",
        dimensions=(Dimension("l_returnflag"), Dimension("l_linestatus")),
        measures=(
            Measure("n", "count"),
            Measure("lo_price", "min", "l_extendedprice"),
            Measure("hi_price", "max", "l_extendedprice"),
        ),
    )
    cells = build_cube(spark, spec, li)
    rolled = query_cube(cells, spec, group_by=["l_returnflag"])
    direct = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("lo_price"),
        F.max("l_extendedprice").alias("hi_price"),
    )
    assert rows_set(rolled) == rows_set(direct)


def test_query_cube_slice_matches_filtered_source(spark, events):
    cells = build_cube(spark, EVENTS_CUBE, events)
    sliced = query_cube(
        cells, EVENTS_CUBE, group_by=["event_type"], where="event_type IN ('view','click')"
    )
    direct = (
        events.filter(F.col("event_type").isin("view", "click"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"), davg("value", "avg_value"))
    )
    assert rows_set(sliced) == rows_set(direct)


def test_query_cube_rejects_unknown_dimension(spark, events):
    cells = build_cube(spark, EVENTS_CUBE, events)
    with pytest.raises(ValueError, match="group_by not in cube dims"):
        query_cube(cells, EVENTS_CUBE, group_by=["user_id"])


def test_spec_json_roundtrip():
    s = CubeSpec.from_json(PRICING_CUBE.to_json())
    assert s == PRICING_CUBE


def test_spec_validation():
    with pytest.raises(ValueError, match="duplicate"):
        CubeSpec(
            name="x",
            source="t",
            dimensions=(Dimension("a"),),
            measures=(Measure("a", "count"),),
        )
    with pytest.raises(ValueError, match="granularity"):
        Dimension("d", granularity="fortnight")
    with pytest.raises(ValueError, match="op must be"):
        Measure("m", "median", "x")


def test_catalog_lifecycle(spark, events, tmp_path):
    cat = CubeCatalog(spark, str(tmp_path / "cubes"))
    cells = cat.create(EVENTS_CUBE, events)
    assert cat.list_cubes() == ["events_daily"]
    assert cat.get_spec("events_daily") == EVENTS_CUBE
    # partitioned by the day dimension on disk: one manifest entry +
    # one physical directory per day key
    assert cat.partition_dim(EVENTS_CUBE) == "day"
    manifest = cat.manifest("events_daily")
    assert len(manifest["partitions"]) > 1
    for entry in manifest["partitions"].values():
        assert (tmp_path / "cubes" / "events_daily" / entry["path"]).is_dir()
    # statistics recorded at write time agree with an actual count
    assert cat.cell_count("events_daily") == cells.count()
    # round-trip: rollup from disk == direct
    rolled = query_cube(cells, EVENTS_CUBE, group_by=["event_type"])
    assert rolled.count() == events.select("event_type").distinct().count()
    cat.refresh("events_daily", events.limit(100))
    assert cat.cells("events_daily").count() <= 100
    cat.drop("events_daily")
    assert cat.list_cubes() == []


def test_all_dim_subsets_consistent(spark, events):
    """Exhaustive §5.4 property at smoke scale: every dim subset."""
    cells = build_cube(spark, EVENTS_CUBE, events).cache()
    src = events.withColumn("day", F.date_trunc("day", "ts"))
    for r in range(len(EVENTS_CUBE.dim_names) + 1):
        for subset in itertools.combinations(EVENTS_CUBE.dim_names, r):
            rolled = query_cube(cells, EVENTS_CUBE, group_by=list(subset))
            direct = src.groupBy(*subset).agg(
                F.count(F.lit(1)).alias("n"),
                dsum("value", "total_value"),
                davg("value", "avg_value"),
            )
            assert rows_set(rolled) == rows_set(direct), subset


def test_hybrid_query_bit_identical_to_full_build(spark, sf_dir):
    """Cells from the historical half + raw tail must answer exactly
    like a cube built over the whole source (lambda serving is
    invisible to correctness)."""
    from pyspark.sql import functions as F

    from mongo_olap_spark.cube import build_cube, query_cube
    from mongo_olap_spark.cube.query import hybrid_query
    from mongo_olap_spark.queries.core import EVENTS_CUBE
    from mongo_olap_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-21 00:00:00").cast("timestamp")
    cells = build_cube(spark, EVENTS_CUBE, e.filter(F.col("ts") < cut))
    hybrid = hybrid_query(cells, EVENTS_CUBE, e.filter(F.col("ts") >= cut))
    full = query_cube(build_cube(spark, EVENTS_CUBE, e), EVENTS_CUBE)
    assert hybrid.exceptAll(full).count() == 0
    assert full.exceptAll(hybrid).count() == 0
