"""Document-collection sources: JSON-lines (and CSV) ingestion.

The reference domain's sources are collections of JSON documents;
the engine's native testbed is parquet. This module closes the
ingestion gap: a *collection* is a directory of JSON-lines files
whose documents become typed rows — nested objects as structs,
arrays as arrays — so the dot-path projection (§2.2 S2) and $unwind
(S6) operators work on real document shapes unchanged.

Scale rules (100 TB ingestion):

- **Always pass an explicit schema in production.** Schema inference
  reads the data once before the real scan — at scale that doubles
  the job. ``infer_collection_schema`` bounds the inference scan to a
  row sample and returns a schema you persist alongside the
  collection (the same policy as sources/json_props.py for dynamic
  property bags).
- JSON decoding is JVM-side (Jackson inside the scan operator — no
  Python in the path) but still ~5-10× the CPU of a parquet scan:
  land raw JSON into parquet/Delta early, keep JSON only at the edge.
- ``mode="PERMISSIVE"`` + ``columnNameOfCorruptRecord`` quarantines
  malformed documents into a side column instead of failing the job —
  count them, don't crash on them (corrupt-record ratio is a data
  quality metric at the edge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: quarantine column for malformed documents
CORRUPT_COL = "_corrupt_document"


def infer_collection_schema(
    spark: SparkSession, path: str, *, sample_rows: int = 10_000
) -> StructType:
    """Schema of a JSON-lines collection from a bounded row sample —
    never a full scan. Persist the result; re-infer only on migration.

    Stays JVM-side: the sampled lines feed DataFrameReader.json as a
    Dataset<String> through py4j instead of a Python RDD, so inference
    spawns no Python workers (and is immune to driver/worker
    interpreter skew)."""
    from mongo_olap_spark.connect import is_connect

    if is_connect(spark):
        raise NotImplementedError(
            "infer_collection_schema needs the classic session's "
            "Dataset<String> reader (_jvm) — under Spark Connect pass "
            "schema= to read_collection (ship explicit schemas to "
            "production anyway), or infer once on a classic session "
            "and persist the result"
        )
    sampled = spark.read.text(path).limit(sample_rows)
    jvm = spark._jvm
    # text() already yields the single 'value' column, so the Dataset
    # converts to Dataset<String> directly (py4j can't call the
    # varargs select(String...))
    jds = getattr(sampled._jdf, "as")(jvm.org.apache.spark.sql.Encoders.STRING())
    return StructType.fromJson(
        __import__("json").loads(spark._jsparkSession.read().json(jds).schema().json())
    )


def read_collection(
    spark: SparkSession,
    path: str,
    *,
    schema: StructType | None = None,
    sample_rows: int = 10_000,
) -> DataFrame:
    """Typed rows from a JSON-lines collection. With no explicit
    schema, a bounded sample infers one (dev convenience — ship the
    explicit schema to production)."""
    if schema is None:
        schema = infer_collection_schema(spark, path, sample_rows=sample_rows)
    if CORRUPT_COL not in schema.fieldNames():
        schema = schema.add(CORRUPT_COL, "string")
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def corrupt_ratio(df: DataFrame, probe_col: str | None = None) -> DataFrame:
    """Edge data-quality metric in one pass: total docs, corrupt docs,
    and docs where ``probe_col`` (default: the first data column)
    parsed non-null.

    The probe column is load-bearing twice over: it is the useful
    "did my key field actually parse" signal, and it keeps the scan
    legal — Spark refuses raw-JSON queries whose referenced columns
    are ONLY the internal corrupt column (SPARK-26716).
    """
    if probe_col is None:
        probe_col = next(c for c in df.columns if c != CORRUPT_COL)
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.col(CORRUPT_COL)).alias("n_corrupt"),
        F.count(F.col(probe_col)).alias("n_probe_parsed"),
    )


def read_orc_table(spark: SparkSession, path: str) -> DataFrame:
    """ORC ingestion — columnar like parquet (schema in the footer,
    predicate pushdown and column pruning native), so no inference
    policy is needed; exists so collections landed by ORC-based
    warehouses (Hive-era lakes) read without conversion."""
    return spark.read.orc(path)


def write_orc_table(df: DataFrame, path: str, *, partition_by: tuple = ()) -> None:
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_csv_table(
    spark: SparkSession,
    path: str,
    *,
    schema: StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV ingestion with the same explicit-schema-first policy (CSV
    inference is a full scan; never rely on it at scale)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_text_corpus(
    spark: SparkSession, path: str, *, min_chars: int = 1
) -> DataFrame:
    """Raw text files → document collection: one document per LINE
    with a deterministic ``doc_id`` (xxhash64 of source file + line
    index — stable across re-reads and downstream repartitioning;
    line indices within one file derive from read-split order, so
    changing ``spark.sql.files.maxPartitionBytes`` between reads can
    renumber a multi-split file), the source file as ``source``, and
    blank/short lines dropped. The ingestion shape
    every text-pipeline operator (dedup, quality, chunking) consumes;
    at 100 TB ``spark.read.text`` splits large files by HDFS block, so
    parallelism tracks bytes, not file count."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    lines = (
        spark.read.text(path)
        .withColumn("source", F.input_file_name())
        .withColumn(
            "line_no",
            F.row_number().over(
                W.partitionBy("source").orderBy(F.monotonically_increasing_id())
            ),
        )
    )
    return (
        lines.filter(F.length(F.trim("value")) >= min_chars)
        .select(
            F.xxhash64("source", "line_no").alias("doc_id"),
            F.col("value").alias("text"),
            "source",
            "line_no",
        )
    )


def read_binary_collection(spark: SparkSession, path: str) -> DataFrame:
    """Binary media files → the multimodal payload shape
    (operators/multimodal.py): Spark's built-in ``binaryFile`` source
    yields (path, modificationTime, length, content); mapped here to
    ``doc_id`` (stable hash of the path), ``payload``, and the typed
    ``media_meta`` struct with the mime guessed from the extension.
    Feed straight into ``decode_image``/``extract_features`` — the
    real-ingest twin of the testbed's synthesized payloads."""
    from pyspark.sql import functions as F

    mime = (
        F.when(F.lower(F.col("path")).endswith(".ppm"), "image/x-portable-pixmap")
        .when(F.lower(F.col("path")).endswith(".bmp"), "image/bmp")
        .when(F.lower(F.col("path")).endswith(".png"), "image/png")
        .when(F.lower(F.col("path")).rlike(r"\.jpe?g$"), "image/jpeg")
        .when(F.lower(F.col("path")).endswith(".wav"), "audio/wav")
        .when(F.lower(F.col("path")).endswith(".mp4"), "video/mp4")
        .otherwise("application/octet-stream")
    )
    return spark.read.format("binaryFile").load(path).select(
        F.xxhash64("path").alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.split(mime, "/").getItem(0).alias("modality"),
            mime.alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
            F.col("path").alias("source_uri"),
        ).alias("media_meta"),
        F.col("length").alias("n_bytes"),
    )
