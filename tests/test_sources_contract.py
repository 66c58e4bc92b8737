"""Contract tests for the source adapter seam (sources/adapters.py):
every CollectionSource/ChangeStreamSource implementation passes the
SAME assertions, so a future Mongo-connector adapter is proven by the
suite the moment it satisfies the interface."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from mongo_olap_spark.sources.adapters import (
    FileChangeStreamSource,
    JsonlCollectionSource,
    MongoCollectionSource,
    ParquetCollectionSource,
    cdc_columns,
)
from mongo_olap_spark.streaming.cdc import cdc_from_events

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def jsonl_dir(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("coll")
    docs = [
        {"_id": i, "user": {"name": f"u{i}", "tags": ["a", "b"][: i % 3]}}
        for i in range(20)
    ]
    (p / "part-0.jsonl").write_text("\n".join(json.dumps(d) for d in docs))
    return str(p)


@pytest.fixture(scope="module")
def cdc_dir(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("cdcsrc")
    events = __import__(
        "mongo_olap_spark.sources.tables", fromlist=["load_table"]
    ).load_table(spark, SF, "events")
    cdc_from_events(events).write.mode("overwrite").parquet(str(p))
    return str(p)


def collection_sources(jsonl_dir):
    return [
        ParquetCollectionSource(SF, "orders"),
        JsonlCollectionSource(jsonl_dir),
    ]


def test_collection_contract(spark, jsonl_dir):
    for src in collection_sources(jsonl_dir):
        df1, df2 = src.snapshot(spark), src.snapshot(spark)
        # lazy: building the snapshot plans no job; schema is stable
        assert not df1.isStreaming
        assert df1.schema == df2.schema
        assert df1.count() > 0
        # filters push into the scan (the engine relies on this for
        # partition pruning at 100 TB — a snapshot that materializes
        # eagerly would defeat Catalyst)
        first_col = df1.columns[0]
        plan = (
            df1.filter(F.col(first_col).isNotNull())
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Scan" in plan


def test_change_stream_contract(spark, cdc_dir):
    src = FileChangeStreamSource(cdc_dir)
    stream = src.change_stream(spark)
    assert stream.isStreaming
    # the full CDC shape, not a subset — maintenance, replay dedup and
    # retraction all key on these columns
    assert [c for c in cdc_columns() if c not in stream.columns] == []
    # ops are the Mongo vocabulary subset the fixture emits, mult signs
    # agree with op semantics, change ids are unique per change
    q = (
        stream.writeStream.outputMode("append").format("memory")
        .queryName("contract_cdc").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM contract_cdc")
    assert got.filter(~F.col("op").isin("insert", "update", "delete")).count() == 0
    assert got.filter(
        (F.col("op") == "insert") & (F.col("mult") != 1)
        | (F.col("op") == "delete") & (F.col("mult") != -1)
    ).count() == 0
    n = got.count()
    assert got.select("change_id").distinct().count() == n > 0


def test_mongo_skeleton_refuses_with_deploy_recipe(spark):
    src = MongoCollectionSource("mongodb://db:27017", "app", "events")
    with pytest.raises(RuntimeError, match='format\\("mongodb"\\)'):
        src.snapshot(spark)
    with pytest.raises(RuntimeError, match="change_stream"):
        src.change_stream(spark)
    assert src.name == "app.events"


def test_read_text_corpus(spark, tmp_path):
    from mongo_olap_spark.sources.collections import read_text_corpus

    (tmp_path / "a.txt").write_text("hello world\n\nsecond line\n")
    (tmp_path / "b.txt").write_text("other file\n")
    df = read_text_corpus(spark, str(tmp_path / "*.txt"))
    rows = df.collect()
    assert len(rows) == 3  # blank line dropped
    texts = {r["text"] for r in rows}
    assert texts == {"hello world", "second line", "other file"}
    assert len({r["doc_id"] for r in rows}) == 3  # unique ids
    again = {r["doc_id"] for r in read_text_corpus(
        spark, str(tmp_path / "*.txt")).repartition(4).collect()}
    assert again == {r["doc_id"] for r in rows}  # stable across reads


def test_read_binary_collection_feeds_decode(spark, tmp_path):
    from mongo_olap_spark.operators import multimodal as mm
    from mongo_olap_spark.sources.collections import read_binary_collection

    pixels = bytes(range(48))
    (tmp_path / "img.ppm").write_bytes(b"P6\n4 4\n255\n" + pixels)
    df = read_binary_collection(spark, str(tmp_path / "*.ppm"))
    row = df.collect()[0]
    assert row["media_meta"]["mime"] == "image/x-portable-pixmap"
    assert row["media_meta"]["modality"] == "image"
    assert row["n_bytes"] == 11 + 48
    # real file -> injectable codec -> pixel stats, end to end
    stats = mm.image_stats(mm.decode_image(df, codec=mm.ppm_codec)).collect()[0]
    assert (stats["width"], stats["height"], stats["channels"]) == (4, 4, 3)
    assert stats["mean_pixel"] == sum(range(48)) / 48
