"""Structured Streaming maintenance: a real readStream (file source)
drives CubeMaintainer; final cube state must equal the batch build of
the net state; batch replay must be idempotent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_olap_spark.cube import CubeCatalog, build_cube, query_cube
from mongo_olap_spark.queries.core import EVENTS_CUBE
from mongo_olap_spark.streaming.cdc import CDC_SCHEMA, cdc_from_events, net_events
from mongo_olap_spark.streaming.pipeline import CubeMaintainer, update_mode_aggregation


def rows_set(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture(scope="module")
def cdc_dir(spark, events, tmp_path_factory):
    """CDC stream laid out as multiple files (micro-batch boundaries)."""
    path = tmp_path_factory.mktemp("cdc")
    cdc = cdc_from_events(events)
    # day-partitioned files → file-source streams them in several batches
    cdc.withColumn("d", F.dayofmonth("stream_ts")).repartition("d").drop("d").write.mode(
        "overwrite"
    ).parquet(str(path / "stream"))
    return str(path / "stream")


def test_streaming_maintenance_matches_batch(spark, events, cdc_dir, tmp_path):
    cat = CubeCatalog(spark, str(tmp_path / "cubes"))
    # start from the empty cube
    cat.create(EVENTS_CUBE, events.limit(0))
    maint = CubeMaintainer(cat, EVENTS_CUBE)

    stream = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 3)  # force several micro-batches
        .parquet(cdc_dir)
    )
    q = maint.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    final = query_cube(cat.cells(EVENTS_CUBE.name), EVENTS_CUBE)
    expected = query_cube(build_cube(spark, EVENTS_CUBE, net_events(events)), EVENTS_CUBE)
    assert rows_set(final) == rows_set(expected)


def test_batch_replay_is_idempotent(spark, events, tmp_path):
    cat = CubeCatalog(spark, str(tmp_path / "cubes"))
    cat.create(EVENTS_CUBE, events.limit(0))
    maint = CubeMaintainer(cat, EVENTS_CUBE)
    batch = cdc_from_events(events).filter(F.col("op") == "insert").limit(100)
    maint.apply_batch(batch, 0)
    once = rows_set(cat.cells(EVENTS_CUBE.name))
    maint.apply_batch(batch, 0)  # replay of the same epoch
    assert rows_set(cat.cells(EVENTS_CUBE.name)) == once
    maint.apply_batch(batch, 1)  # a genuinely new batch does apply
    assert rows_set(cat.cells(EVENTS_CUBE.name)) != once


def test_multi_cube_single_pass(spark, events, cdc_dir, tmp_path):
    """One CDC stream maintains two cubes; both land on batch truth."""
    from mongo_olap_spark.cube import CubeSpec, Dimension, Measure
    from mongo_olap_spark.streaming.pipeline import MultiCubeMaintainer

    hourly = CubeSpec(
        name="events_hourly_user",
        source="events",
        dimensions=(Dimension("user_bucket", path="user_id % 10"),),
        measures=(Measure("n", "count"), Measure("total_value", "sum", "value")),
    )
    cat = CubeCatalog(spark, str(tmp_path / "cubes"))
    cat.create(EVENTS_CUBE, events.limit(0))
    cat.create(hourly, events.limit(0))
    maint = MultiCubeMaintainer(cat, [EVENTS_CUBE, hourly])
    stream = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(cdc_dir)
    )
    q = maint.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    net = net_events(events)
    for spec in (EVENTS_CUBE, hourly):
        got = query_cube(cat.cells(spec.name), spec)
        want = query_cube(build_cube(spark, spec, net), spec)
        assert rows_set(got) == rows_set(want), spec.name


def test_update_mode_aggregation_smoke(spark, events, cdc_dir):
    stream = spark.readStream.schema(CDC_SCHEMA).parquet(cdc_dir)
    q = update_mode_aggregation(
        spark, stream.filter(F.col("op") == "insert"), EVENTS_CUBE, query_name="um_test"
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM um_test")
    # update-mode sink holds per-cell rows; cells must cover all days
    assert got.select("day").distinct().count() == events.select(
        F.date_trunc("day", "ts")
    ).distinct().count()
