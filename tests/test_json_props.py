"""Dynamic-schema props handling: inference, typed parse, corrupt input."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mongo_olap_spark.sources.json_props import infer_props_schema, with_typed_props


def test_infer_on_events(spark, events):
    schema = infer_props_schema(events, "props")
    assert isinstance(schema, T.StructType)
    assert "k" in schema.fieldNames()
    assert isinstance(schema["k"].dataType, T.LongType)


def test_typed_parse_matches_get_json_object(spark, events):
    schema = infer_props_schema(events, "props")
    typed = with_typed_props(events, schema)
    mismatch = typed.filter(
        ~F.col("props_t.k").eqNullSafe(
            F.get_json_object("props", "$.k").cast("long")
        )
    ).count()
    assert mismatch == 0


def test_heterogeneous_and_corrupt_rows(spark):
    df = spark.createDataFrame(
        [('{"k": 1}',), ('{"k": 2, "extra": "x"}',), ("not json",), (None,)],
        "props string",
    )
    schema = infer_props_schema(df, "props")
    assert set(schema.fieldNames()) >= {"k"}
    typed = with_typed_props(df, schema)
    rows = typed.select("props_t").collect()
    # corrupt/null rows parse to null struct, never raise
    assert rows[2].props_t is None or rows[2].props_t.k is None
    assert rows[3].props_t is None
