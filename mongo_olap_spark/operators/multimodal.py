"""Multimodal columns: image/audio/video as opaque binary + metadata.

The Spark-side contract (the real deliverable at 100 TB):

- payload travels as a ``binary`` column next to a typed metadata
  struct (modality, mime, width/height/duration, source uri) — never
  exploded into Python objects on the driver;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: one Python worker per partition, whole
  columns per batch, output schema declared up front so Catalyst can
  plan around the stage;
- partition sizing: binary payloads dominate task memory, so media
  pipelines repartition by byte budget (``target_bytes_per_partition``)
  instead of row count before the Python stage.

The actual codecs (PIL/ffmpeg/…) are NOT in this container, so
``decode_image`` raises ``NotImplementedError`` behind a clearly
marked seam, and ``extract_features`` ships a deterministic fake
(byte-length + xxhash-derived values) that exercises the identical
plumbing: schema, Arrow batching, partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata struct DDL carried beside every binary payload
MEDIA_META_DDL = (
    "modality STRING, mime STRING, width INT, height INT, "
    "duration_s DOUBLE, source_uri STRING"
)

FEATURE_SCHEMA = "doc_id BIGINT, n_bytes BIGINT, feature0 DOUBLE, feature1 DOUBLE"


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testbed adapter: fake a media payload from a text column (UTF-8
    bytes) + a metadata struct. Real deployments read payloads with
    ``spark.read.format('binaryFile')`` or pointers into object
    storage; everything downstream is identical."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("text").alias("modality"),
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
            F.concat(F.lit("testdata://documents/"), F.col("doc_id")).alias("source_uri"),
        ),
    )


def repartition_by_bytes(
    df: DataFrame, size_col, *, target_bytes_per_partition: int = 128 << 20
) -> DataFrame:
    """Right-size partitions for a heavy Python stage: estimate total
    payload bytes, choose partition count so each holds ~target bytes.
    (At 100 TB this is the difference between OOM and smooth Arrow
    batches; cheap at small scale.)"""
    total = df.agg(F.sum(size_col).cast("long").alias("b")).collect()[0]["b"] or 0
    n = max(1, int(total // target_bytes_per_partition) + 1)
    return df.repartition(n)


def decode_image(payload_batch):
    """Decode seam — requires an image codec (PIL / libvips), which is
    not installed in this container. The Arrow plumbing around this
    seam is real and tested via extract_features()."""
    raise NotImplementedError(
        "image decode requires PIL/libvips; not available in this environment"
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake feature extractor over the binary payload,
    run as Arrow-batched mapInPandas — the exact shape a real
    embedding/decode stage uses. feature0/feature1 derive only from
    payload bytes, so results are stable across partitionings."""
    import pandas as pd  # local import: executors only

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len).astype("int64")
            # cheap deterministic "features": byte checksum folds
            f0 = payloads.map(lambda b: sum(b[:64]) / 255.0 if len(b) else 0.0)
            f1 = payloads.map(lambda b: (len(b) % 997) / 997.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n_bytes,
                    "feature0": f0.astype("float64"),
                    "feature1": f1.astype("float64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(fn, schema=FEATURE_SCHEMA)
