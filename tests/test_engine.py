"""OlapEngine facade: the full reference-service lifecycle in one test
session — define from JSON config, populate, query (direct + routed),
apply CDC, stream, drop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_olap_spark.cube import build_cube, query_cube
from mongo_olap_spark.engine import OlapEngine
from mongo_olap_spark.queries.core import EVENTS_CUBE
from mongo_olap_spark.streaming.cdc import cdc_from_events, net_events


def rows_set(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture()
def engine(spark, tmp_path):
    return OlapEngine(spark, str(tmp_path / "olap"))


def test_lifecycle_from_json_config(engine, events):
    # a client defines the cube as a JSON document (the reference's
    # config-driven surface)
    engine.create_cube(EVENTS_CUBE.to_json(), events)
    assert engine.list_cubes() == ["events_daily"]

    direct = engine.query(cube="events_daily", group_by=["event_type"])
    expected = query_cube(
        build_cube(engine.spark, EVENTS_CUBE, events), EVENTS_CUBE, group_by=["event_type"]
    )
    assert rows_set(direct) == rows_set(expected)

    routed = engine.query(
        source="events", group_by=["event_type"], measures=["n", "total_value"]
    )
    assert {r["event_type"] for r in routed.collect()} == {
        r["event_type"] for r in expected.collect()
    }

    engine.drop_cube("events_daily")
    assert engine.list_cubes() == []


def test_cdc_batches_through_facade(engine, events):
    engine.create_cube(EVENTS_CUBE, events.limit(0))
    cdc = cdc_from_events(events)
    engine.apply_cdc("events_daily", cdc.filter(F.col("op") == "insert"), 0)
    engine.apply_cdc("events_daily", cdc.filter(F.col("op") == "delete"), 1)
    got = engine.query(cube="events_daily")
    expected = query_cube(
        build_cube(engine.spark, EVENTS_CUBE, net_events(events)), EVENTS_CUBE
    )
    assert rows_set(got) == rows_set(expected)


def test_streaming_through_facade(engine, events, tmp_path):
    engine.create_cube(EVENTS_CUBE, events.limit(0))
    cdc_dir = str(tmp_path / "cdc")
    cdc_from_events(events).write.mode("overwrite").parquet(cdc_dir)
    from mongo_olap_spark.streaming.cdc import CDC_SCHEMA

    stream = engine.spark.readStream.schema(CDC_SCHEMA).parquet(cdc_dir)
    q = engine.start_maintenance("events_daily", stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    got = engine.query(cube="events_daily")
    expected = query_cube(
        build_cube(engine.spark, EVENTS_CUBE, net_events(events)), EVENTS_CUBE
    )
    assert rows_set(got) == rows_set(expected)


def test_query_validation(engine, events):
    engine.create_cube(EVENTS_CUBE, events)
    with pytest.raises(ValueError, match="group_by not in cube dims"):
        engine.query(cube="events_daily", group_by=["user_id"])
    with pytest.raises(ValueError, match="cube= or source="):
        engine.query(group_by=["x"])

def test_hybrid_serving_through_facade(engine, events):
    """A cube built on the historical half plus a raw tail must answer
    exactly like a fully-caught-up cube (lambda serving)."""
    cut = F.lit("2024-01-21 00:00:00").cast("timestamp")
    engine.create_cube(EVENTS_CUBE, events.filter(F.col("ts") < cut))
    got = engine.query(cube="events_daily", tail=events.filter(F.col("ts") >= cut))
    expected = query_cube(build_cube(engine.spark, EVENTS_CUBE, events), EVENTS_CUBE)
    assert rows_set(got) == rows_set(expected)
    with pytest.raises(ValueError, match="hybrid query"):
        engine.query(cube="events_daily", tail=events, where="day IS NOT NULL")


def test_time_range_serving_prunes_partitions(engine, events):
    """A time-sliced cube query must (a) read only the matching
    partition dirs driver-side and (b) answer exactly like a full-scan
    filter."""
    from datetime import datetime

    engine.create_cube(EVENTS_CUBE, events)
    lo, hi = datetime(2024, 1, 10), datetime(2024, 1, 15)

    pruned = engine.catalog.cells_in_range("events_daily", lo, hi)
    n_parts = len(engine.catalog.manifest("events_daily")["partitions"])
    n_files = pruned.inputFiles()
    assert len(n_files) < n_parts  # strictly fewer dirs than the cube has
    assert pruned.count() > 0

    got = engine.query(
        cube="events_daily", group_by=["event_type"], time_range=(lo, hi)
    )
    expected = engine.query(
        cube="events_daily",
        group_by=["event_type"],
        where="day >= '2024-01-10' AND day < '2024-01-15'",
    )
    assert rows_set(got) == rows_set(expected)


def test_time_range_accepts_key_strings_and_fences_tail(engine, events):
    """ADVICE r2: string bounds in the partition-key format must slice
    exactly like datetimes (previously the dotted string cast to NULL
    against the timestamp dim and silently matched nothing), and
    tail= + time_range= must refuse instead of silently ignoring tail."""
    from datetime import datetime

    engine.create_cube(EVENTS_CUBE, events)
    lo, hi = datetime(2024, 1, 10), datetime(2024, 1, 15)
    want = rows_set(engine.query(
        cube="events_daily", group_by=["event_type"], time_range=(lo, hi)
    ))
    assert want  # the slice is non-empty, so a silent empty would show
    got = engine.query(
        cube="events_daily",
        group_by=["event_type"],
        time_range=("2024-01-10T00.00.00", "2024-01-15T00.00.00"),
    )
    assert rows_set(got) == want

    with pytest.raises(ValueError, match="cannot parse bound"):
        engine.query(cube="events_daily", time_range=("not-a-date", None))
    with pytest.raises(ValueError, match="cannot combine"):
        engine.query(
            cube="events_daily", tail=events, time_range=(lo, hi)
        )


def test_materialize_pipeline_into_store(engine, events):
    v = engine.materialize_pipeline(
        events,
        [
            {"$group": {"_id": "$event_type", "n": {"$sum": 1}}},
            {"$out": "type_counts"},
        ],
    )
    assert v == 1
    got = engine.store.read("type_counts")
    assert got.count() == events.select("event_type").distinct().count()
    # incremental refresh through $merge: re-materialize only one type
    engine.materialize_pipeline(
        events.filter(F.col("event_type").isNotNull()),
        [
            {"$group": {"_id": "$event_type", "n": {"$sum": 1}}},
            {"$merge": {"into": "type_counts", "on": "_id"}},
        ],
    )
    assert engine.store.version("type_counts") == 2
    assert engine.store.read("type_counts").count() == got.count()
