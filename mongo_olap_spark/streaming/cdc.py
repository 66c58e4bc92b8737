"""CDC fixture: a change-stream-shaped view over the ``events`` table.

The reference domain consumes MongoDB change streams
(``operationType ∈ insert/update/replace/delete``, ``documentKey``,
``fullDocument``, ordered, resumable). This environment has no
MongoDB, so the deterministic testbed mapping (FIXTURES.md §b,
refined) is:

- every event row yields an ``insert`` at stream time = its own ``ts``;
- rows with ``event_id % 10 == 9`` additionally yield a ``delete`` of
  the same document 12 hours later — so the *net* state is
  ``events WHERE event_id % 10 <> 9``, which gives IVM tests and the
  driver's SQL oracle a closed-form truth.

Shape notes: ``stream_ts`` is the change-stream position (clusterTime
— ordering/watermark column); the document's own fields, including its
``ts``, ride inline (a delete retracts from the cell its *document*
maps to, so deletes must carry the pre-image fields — MongoDB's
``fullDocumentBeforeChange``). A real deployment swaps this module for
``spark.readStream.format("mongodb")`` mapped to the same shape;
everything downstream (delta_cells → merge_cells) is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: document columns carried through the stream (the cube projection input)
DOC_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")

CDC_SCHEMA = (
    "op STRING, stream_ts TIMESTAMP, change_id BIGINT, event_id BIGINT, "
    "ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, "
    "props STRING, mult INT"
)


def cdc_from_events(events: DataFrame) -> DataFrame:
    """Expand an events DataFrame into the deterministic CDC stream,
    ordered by ``stream_ts``.

    ``change_id`` is the fixture's resume-token analogue: unique per
    CHANGE, not per document (two changes to one doc get two ids), so
    replay dedup can key on it without conflating distinct changes.
    """
    inserts = events.select(
        F.lit("insert").alias("op"),
        F.col("ts").alias("stream_ts"),
        (F.col("event_id") * 2).alias("change_id"),
        *DOC_COLS,
        F.lit(1).alias("mult"),
    )
    deletes = events.filter(F.col("event_id") % 10 == 9).select(
        F.lit("delete").alias("op"),
        (F.col("ts") + F.expr("interval 12 hours")).alias("stream_ts"),
        (F.col("event_id") * 2 + 1).alias("change_id"),
        *DOC_COLS,
        F.lit(-1).alias("mult"),
    )
    return inserts.unionByName(deletes)


def net_events(events: DataFrame) -> DataFrame:
    """The ground-truth surviving documents after the CDC stream."""
    return events.filter(F.col("event_id") % 10 != 9)


def dedup_changes(
    stream: DataFrame,
    *,
    keys: tuple[str, ...] | None = None,
    event_time: str = "stream_ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Exactly-once ingestion guard: drop replayed change events.

    At-least-once transports (resumed change streams, Kafka re-reads)
    can deliver the same change twice; applying a duplicate insert
    double-counts a cell. ``dropDuplicatesWithinWatermark`` keys the
    state store on the change identity and expires state once the
    watermark passes ``delay`` — bounded state, unlike a plain
    ``dropDuplicates`` whose state grows forever on a stream. The
    transport must re-deliver duplicates within ``delay`` of the
    original (true for checkpoint-resume replays, which re-send a
    suffix of the recent stream).

    Key choice: when the stream carries a per-change unique id
    (``change_id`` here; resume token/_id for a real change stream),
    dedup keys on THAT, so two legitimate distinct changes to the same
    document inside the window are never conflated. The
    ``(op, event_id)`` fallback for id-less transports assumes at most
    one change per (op, document) within ``delay`` — documented
    because it is a real restriction, not a safe default.

    Works on batch DataFrames too (falls back to plain
    dropDuplicates semantics there — Spark handles both).
    """
    if keys is None:
        keys = ("change_id",) if "change_id" in stream.columns else ("op", "event_id")
    if stream.isStreaming:
        return stream.withWatermark(event_time, delay).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return stream.dropDuplicates(list(keys))
