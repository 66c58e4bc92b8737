"""Streaming window surface: tumbling/sliding/session windows and
watermark late-data semantics (SURVEY.md §2.2 streaming table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_olap_spark.streaming.cdc import CDC_SCHEMA, cdc_from_events


@pytest.fixture(scope="module")
def stream_dir(spark, events, tmp_path_factory):
    path = tmp_path_factory.mktemp("wstream")
    cdc = cdc_from_events(events).filter(F.col("op") == "insert")
    cdc.withColumn("d", F.dayofmonth("stream_ts")).repartition("d").drop("d").write.mode(
        "overwrite"
    ).parquet(str(path / "s"))
    return str(path / "s")


def _run(spark, stream_df, name):
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


def test_sliding_window_stream_matches_batch(spark, events, stream_dir):
    stream = spark.readStream.schema(CDC_SCHEMA).parquet(stream_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = _run(spark, agg, "slide_test")
    batch = events.groupBy(F.window("ts", "1 day", "6 hours").alias("w")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # append mode emits only windows closed by the watermark; every
    # emitted window must match the batch computation exactly
    got_rows = {(r.w.start, r.w.end): r.n for r in got.collect()}
    batch_rows = {(r.w.start, r.w.end): r.n for r in batch.collect()}
    assert got_rows
    for k, v in got_rows.items():
        assert batch_rows[k] == v
    # each event lands in 4 sliding windows (1d / 6h)
    assert sum(batch_rows.values()) == events.count() * 4


def test_session_window_stream(spark, events, stream_dir):
    stream = spark.readStream.schema(CDC_SCHEMA).parquet(stream_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = _run(spark, agg, "session_test")
    # closed sessions must match the batch sessionization count for the
    # same (user, start): compare against q_sessionize's session starts
    from mongo_olap_spark.queries import QUERIES

    batch = QUERIES["q_sessionize"](spark, "/root/testdata/sf0.001")
    batch_rows = {(r.user_id, r.session_start): r.n_events for r in batch.collect()}
    got_rows = {(r.user_id, r.w.start): r.n for r in got.collect()}
    assert got_rows
    mismatches = {k: (v, batch_rows.get(k)) for k, v in got_rows.items() if batch_rows.get(k) != v}
    assert not mismatches, dict(list(mismatches.items())[:5])


def test_watermark_drops_late_rows(spark, tmp_path):
    """Rows older than the watermark when their window is already
    closed are dropped — documented allowed-lateness behavior."""
    import pandas as pd

    rows = [
        ("2024-01-01 00:05:00", 1.0),
        ("2024-01-01 02:00:00", 1.0),  # watermark → 01:50 (next batch)
        ("2024-01-01 03:00:00", 1.0),  # watermark → 02:50; [00:00) evicted
        ("2024-01-01 00:10:00", 1.0),  # late beyond watermark → dropped
        ("2024-01-01 04:00:00", 1.0),
    ]
    import os
    import time

    base = time.time() - 3600
    for i, (ts, v) in enumerate(rows):
        pdf = pd.DataFrame({"ts": [pd.Timestamp(ts)], "value": [v]})
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"f{i}")
        )
        # the file stream orders batches by modification time — make it
        # strictly increasing so files replay in event order
        for root, _, files in os.walk(tmp_path / f"f{i}"):
            for fname in files:
                os.utime(os.path.join(root, fname), (base + i * 10, base + i * 10))
    # feed files one per micro-batch in event order
    stream = (
        spark.readStream.schema("ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "f*"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    got = {
        r.w.start.isoformat(): r.n
        for r in spark.sql("SELECT * FROM late_test").collect()
    }
    # files stream in event order (mtimes), so the watermark passes the
    # [00:00,01:00) window (and its state is evicted) before the late
    # 00:10 row arrives → Spark drops it and the window stays final
    assert dropped == 1, q.recentProgress
    assert got.get("2024-01-01T00:00:00") == 1, got


def test_custom_stateful_sessionize_matches_batch(spark, events, stream_dir, tmp_path):
    """applyInPandasWithState sessionization: every emitted session is
    final and must exactly match the batch sessionizer's output for
    sessions the watermark has closed; no session is emitted twice."""
    from pyspark.sql import Window as W

    from mongo_olap_spark.streaming.sessionize import streaming_sessionize

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stream_dir)
    )
    q = (
        streaming_sessionize(stream, gap_seconds=1800, watermark="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_custom")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM sess_custom")
    rows = {tuple(r) for r in got.collect()}
    assert len(rows) == got.count()  # exactly-once per closed session

    # batch truth: same gap rule over the full table
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, 0)
    marked = events.withColumn(
        "new_session",
        F.when(
            (F.col("ts").cast("long") - F.lag("ts").over(w).cast("long") > 1800)
            | F.lag("ts").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    batch = (
        marked.withColumn("sid", F.sum("new_session").over(wrun))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
    )
    batch_rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.session_value, 6))
        for r in batch.collect()
    }
    got_rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.session_value, 6))
        for r in got.collect()
    }
    # every emitted session is a true batch session …
    assert got_rows <= batch_rows, sorted(got_rows - batch_rows)[:3]
    # … and the stream emitted the large majority (only sessions still
    # open at the final watermark may be withheld)
    assert len(got_rows) >= 0.8 * len(batch_rows), (len(got_rows), len(batch_rows))


def test_stream_dedup_within_watermark_drops_replays(spark, events, tmp_path):
    """A replayed suffix of the change stream must not double-apply:
    dropDuplicatesWithinWatermark keyed on (op, event_id) suppresses
    the re-delivered rows while keeping state bounded."""
    from mongo_olap_spark.streaming.cdc import dedup_changes

    cdc = cdc_from_events(events).filter(F.col("op") == "insert").limit(200)
    # transport replays the most recent half of what it already sent
    replayed = cdc.orderBy(F.desc("stream_ts")).limit(100)
    path = str(tmp_path / "dupstream")
    cdc.unionAll(replayed).write.mode("overwrite").parquet(path)

    stream = spark.readStream.schema(CDC_SCHEMA).parquet(path)
    got = _run(spark, dedup_changes(stream, delay="30 days"), "dedup_stream")
    assert got.count() == 200
    assert got.select("event_id").distinct().count() == 200


def test_stream_stream_interval_join(spark, events, tmp_path):
    """Stream-stream equi join with an event-time interval bound: each
    delete matches its own insert 12h earlier; watermarks on both
    sides keep the join state bounded."""
    cdc = cdc_from_events(events)
    ins_path, del_path = str(tmp_path / "ins"), str(tmp_path / "del")
    cdc.filter(F.col("op") == "insert").write.mode("overwrite").parquet(ins_path)
    cdc.filter(F.col("op") == "delete").write.mode("overwrite").parquet(del_path)
    expected = cdc.filter(F.col("op") == "delete").count()

    ins = (
        spark.readStream.schema(CDC_SCHEMA)
        .parquet(ins_path)
        .selectExpr("event_id AS i_id", "stream_ts AS i_ts")
        .withWatermark("i_ts", "1 hour")
    )
    dels = (
        spark.readStream.schema(CDC_SCHEMA)
        .parquet(del_path)
        .selectExpr("event_id AS d_id", "stream_ts AS d_ts")
        .withWatermark("d_ts", "1 hour")
    )
    joined = ins.join(
        dels,
        F.expr(
            "i_id = d_id AND d_ts BETWEEN i_ts AND i_ts + interval 13 hours"
        ),
    )
    got = _run(spark, joined, "ss_join")
    assert got.count() == expected


def test_stream_dedup_keeps_distinct_changes_to_same_doc(spark, events, tmp_path):
    """ADVICE r2: keying dedup on (op, doc id) conflated two legitimate
    distinct changes to one document inside the watermark. With the
    per-change ``change_id`` (resume-token analogue) the guard drops
    only true replays."""
    from mongo_olap_spark.streaming.cdc import dedup_changes

    base = cdc_from_events(events).filter(F.col("op") == "insert").limit(50)
    # second legitimate change to each doc: same (op, event_id),
    # different change_id and stream position
    second = base.withColumn(
        "change_id", F.col("change_id") + 1_000_000
    ).withColumn("stream_ts", F.col("stream_ts") + F.expr("interval 5 minutes"))
    replay = base  # exact replay of the first delivery
    path = str(tmp_path / "two_changes")
    base.unionAll(second).unionAll(replay).write.mode("overwrite").parquet(path)

    stream = spark.readStream.schema(CDC_SCHEMA).parquet(path)
    got = _run(spark, dedup_changes(stream, delay="30 days"), "dedup_changes2")
    # both distinct changes survive; the replay is dropped
    assert got.count() == 100
    per_doc = got.groupBy("event_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_doc] == [2]


def test_batch_sessionize_subsecond_gap_boundary(spark, tmp_path):
    """A gap of 1800.5 s must OPEN a new session (full-precision
    comparison), and a gap of exactly 1800.0 s must NOT. Pins the
    round-9 sf1 finding: casting timestamps to long truncated the
    fractional second, so gaps in (1800, 1801) s wrongly stayed
    in-session while the full-precision oracle split them."""
    import pandas as pd

    from mongo_olap_spark.queries import QUERIES

    t0 = pd.Timestamp("2024-01-01 00:00:00.000000")
    rows = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 2, 2],
            "event_type": ["a"] * 4,
            "value": [1.0] * 4,
            # user 1: gap 1800.5 s -> two sessions
            # user 2: gap exactly 1800.0 s -> one session
            "ts": [
                t0,
                t0 + pd.Timedelta(seconds=1800.5),
                t0,
                t0 + pd.Timedelta(seconds=1800.0),
            ],
        }
    )
    path = str(tmp_path / "events.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(rows), path)
    out = QUERIES["q_sessionize"](spark, str(tmp_path)).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, set()).add(r.session_id)
    assert len(per_user[1]) == 2, out
    assert len(per_user[2]) == 1, out
