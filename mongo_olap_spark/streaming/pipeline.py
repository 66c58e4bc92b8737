"""Continuous cube maintenance: Structured Streaming → signed-delta merge.

``CubeMaintainer`` keeps a catalog cube fresh from a CDC stream via
``foreachBatch``:

    readStream(cdc) → foreachBatch(batch):
        deltas = delta_cells(spec, batch)            # signed partials
        merged = merge_cells(current_cells, deltas)  # §4.3 MERGE
        [recompute_cells(...) for min/max cubes hit by deletes]
        swap cell table; record batch id

Exactly-once: Spark's checkpoint gives at-least-once foreachBatch
delivery; idempotency comes from the ``__batch_id`` high-watermark —
a replayed batch id is skipped. (This is the public foreachBatch-MERGE
idiom; with Delta/Iceberg the swap becomes a transactional MERGE and
the watermark a txn property.)

Path A (no deletes in the domain) is also provided:
``update_mode_aggregation`` — plain streaming groupBy/agg with
watermarking, using Spark's own state store. It cannot retract, which
is exactly why Path B above exists (SURVEY.md §4.3).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_olap_spark.cube.build import delta_cells
from mongo_olap_spark.cube.catalog import CubeCatalog
from mongo_olap_spark.cube.ivm import affected_cells, merge_cells, recompute_cells
from mongo_olap_spark.cube.spec import CubeSpec


class CubeMaintainer:
    """Drives incremental maintenance of one catalog cube from a
    CDC-shaped stream (columns: doc fields + ``mult`` ±1)."""

    def __init__(
        self,
        catalog: CubeCatalog,
        spec: CubeSpec,
        *,
        source_for_repair: DataFrame | None = None,
    ):
        self.catalog = catalog
        self.spec = spec
        self.source_for_repair = source_for_repair
        self._state_path = os.path.join(catalog.root, spec.name, "maintainer.json")

    # -- idempotency watermark -------------------------------------------
    def _last_batch(self) -> int:
        try:
            with open(self._state_path) as f:
                return json.load(f)["last_batch_id"]
        except (OSError, KeyError, ValueError):
            return -1

    def _record_batch(self, batch_id: int) -> None:
        os.makedirs(os.path.dirname(self._state_path), exist_ok=True)
        with open(self._state_path, "w") as f:
            json.dump({"last_batch_id": batch_id}, f)

    # -- the micro-batch body ---------------------------------------------
    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id <= self._last_batch():
            return  # replayed batch — idempotent skip
        spec = self.spec
        deltas = delta_cells(spec, batch)
        cells = self.catalog.cells(spec.name)
        merged = merge_cells(cells, deltas, spec)

        if not spec.delete_safe:
            has_deletes = batch.filter(F.col("mult") < 0).limit(1).count() > 0
            if has_deletes:
                if self.source_for_repair is None:
                    raise ValueError(
                        f"cube {spec.name} has min/max measures; deletes require "
                        "source_for_repair for cell recomputation"
                    )
                touched = affected_cells(spec, delta_cells(spec, batch.filter(F.col("mult") < 0)))
                merged = recompute_cells(spec, self.source_for_repair, merged, touched)

        # materialize before overwriting the table we just read
        # (parquet has no MVCC; Delta MERGE removes this at deployment)
        merged = merged.localCheckpoint(eager=True)
        self.catalog.overwrite_cells(spec.name, merged)
        self._record_batch(batch_id)

    # -- stream wiring ------------------------------------------------------
    def start(self, cdc_stream: DataFrame, checkpoint_dir: str, **trigger):
        """Attach to a streaming DataFrame; returns the StreamingQuery.
        ``checkpoint_dir`` is the resume token of the reference domain."""
        if not trigger:
            trigger = {"availableNow": True}
        return (
            cdc_stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**trigger)
            .start()
        )


class MultiCubeMaintainer:
    """Maintain SEVERAL cubes over one CDC stream in one pass.

    The reference runs one change-stream consumer per collection and
    fans the event out to every cube defined on it. Engine-side: a
    single ``foreachBatch`` caches the micro-batch once, then applies
    each cube's ``delta_cells → merge_cells`` — one stream read, one
    checkpoint (one resume token), N cube updates. At scale this is
    N× cheaper than N maintainers: the CDC scan and its parse cost are
    paid once, and the per-cube work is just the (tiny) delta agg.
    """

    def __init__(self, catalog: CubeCatalog, specs: list[CubeSpec], *,
                 sources_for_repair: dict[str, DataFrame] | None = None):
        repair = sources_for_repair or {}
        self.children = [
            CubeMaintainer(catalog, s, source_for_repair=repair.get(s.name))
            for s in specs
        ]

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        batch = batch.cache()
        try:
            for child in self.children:
                child.apply_batch(batch, batch_id)
        finally:
            batch.unpersist()

    def start(self, cdc_stream: DataFrame, checkpoint_dir: str, **trigger):
        if not trigger:
            trigger = {"availableNow": True}
        return (
            cdc_stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**trigger)
            .start()
        )


def update_mode_aggregation(
    spark: SparkSession,
    cdc_stream: DataFrame,
    spec: CubeSpec,
    *,
    watermark: str = "1 hour",
    query_name: str = "cube_update",
):
    """Path A: insert-only maintenance with Spark's native streaming
    aggregation state (update output mode → in-memory sink for tests).
    Late rows beyond the watermark are dropped (documented lateness)."""
    from mongo_olap_spark.cube.build import cell_aggs

    dims = [d.expr() for d in spec.dimensions]
    agg = (
        cdc_stream.withWatermark("stream_ts", watermark)
        .groupBy(*dims)
        .agg(*cell_aggs(spec))
    )
    return (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
