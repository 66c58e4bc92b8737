"""Continuous cube maintenance: Structured Streaming → signed-delta merge.

``CubeMaintainer`` keeps a catalog cube fresh from a CDC stream via
``foreachBatch``:

    readStream(cdc) → foreachBatch(batch):
        deltas = delta_cells(spec, batch)            # signed partials
        merged = merge_cells(touched_cells, deltas)  # §4.3 MERGE
        [recompute_cells(...) for min/max cubes hit by deletes]
        commit touched partitions + batch id (one atomic manifest flip)

**Partition-scoped**: with a time-partitioned cell table, only the
partitions the delta touches are read, merged, and rewritten — the
per-batch write cost is O(|touched cells|), not O(|all cells|);
untouched partitions are carried by manifest reference and their
files never move (asserted byte-identical in tests).

Exactly-once: Spark's checkpoint gives at-least-once foreachBatch
delivery; idempotency comes from the batch-id high-watermark stored
*inside the manifest* — data and watermark commit with one atomic
rename, so a crash anywhere leaves either the old snapshot+watermark
(batch replays onto unchanged state) or the new pair (replay skipped).
(This is the public foreachBatch-MERGE idiom; with Delta/Iceberg the
manifest flip becomes a transactional MERGE and the watermark a txn
property.)

Path A (no deletes in the domain) is also provided:
``update_mode_aggregation`` — plain streaming groupBy/agg with
watermarking, using Spark's own state store. It cannot retract, which
is exactly why Path B above exists (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_olap_spark.cube.build import delta_cells
from mongo_olap_spark.cube.catalog import CubeCatalog, partition_key_col
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
        stream_id: str = "default",
    ):
        self.catalog = catalog
        self.spec = spec
        self.source_for_repair = source_for_repair
        #: identifies THIS maintainer's checkpoint in the manifest's
        #: per-stream watermark map — two maintainers on one cube must
        #: use distinct stream_ids or their (checkpoint-scoped) batch
        #: ids would collide in a single shared watermark
        self.stream_id = stream_id

    # -- the micro-batch body ---------------------------------------------
    def apply_batch(self, batch: DataFrame, batch_id: int) -> bool:
        """Apply one micro-batch. Returns True when the batch was
        applied, False when the watermark skipped it as a replay — so a
        caller (the service's apply_cdc, ADVICE r13) can report a
        skipped replay honestly instead of claiming rows were applied."""
        if batch_id <= self.catalog.last_batch_id(self.spec.name, self.stream_id):
            return False  # replayed batch — idempotent skip
        spec = self.spec
        levels = self.catalog.lattice_levels(spec.name)
        if levels is not None:
            return self._apply_batch_lattice(batch, batch_id, levels)
        deltas = delta_cells(spec, batch)
        pdim = self.catalog.partition_dim(spec)

        if pdim is not None:
            # partition-scoped: resolve the (few) touched partition keys
            # driver-side, read ONLY those partitions' files, and commit
            # only them — O(|touched|) per batch. The key strings come
            # from the same expression the writer uses, so they agree
            # byte-for-byte with the manifest keys.
            deltas = deltas.cache()
            touched_keys = [
                r[0] for r in deltas.select(partition_key_col(pdim)).distinct().collect()
            ]
            read_version = self.catalog.current_version(spec.name)
            cells = self.catalog.cells_for_partitions(spec.name, touched_keys)
        else:
            touched_keys = None
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

        # no checkpoint/MVCC dance: the commit writes NEW immutable
        # files and flips the manifest pointer (data + watermark in one
        # atomic rename); the files `merged` reads stay in place
        if touched_keys is not None:
            self.catalog.commit_partitions(
                spec.name,
                merged,
                touched_keys,
                batch_id=batch_id,
                stream_id=self.stream_id,
                read_version=read_version,
            )
            deltas.unpersist()
        else:
            self.catalog.overwrite_cells(
                spec.name, merged, batch_id=batch_id, stream_id=self.stream_id
            )
        return True

    def _apply_batch_lattice(
        self, batch: DataFrame, batch_id: int, levels: list[tuple[str, ...]]
    ) -> bool:
        """Incremental maintenance of a multi-level (grouping-sets)
        cube: ONE signed grouping-sets aggregation of the micro-batch
        delivers deltas for every materialized level; the merge keys on
        (dims, __level). Partition-scoping still applies — levels that
        aggregate the time dim away live in the NULL time partition,
        which is small by construction (coarse levels have few cells).

        min/max lattice cubes reject deletes: per-level cell recompute
        is a rebuild in disguise — use a plain cube + lattice rebuild,
        or a delete-safe measure set, for that workload."""
        from mongo_olap_spark.cube.lattice import LEVEL_COL, delta_cells_lattice

        spec = self.spec
        if not spec.delete_safe:
            has_deletes = batch.filter(F.col("mult") < 0).limit(1).count() > 0
            if has_deletes:
                raise ValueError(
                    f"lattice cube {spec.name} has min/max measures; deletes are "
                    "not incrementally maintainable per level — refresh instead"
                )
        deltas = delta_cells_lattice(spec, batch, levels)
        pdim = self.catalog.partition_dim(spec)
        if pdim is not None:
            deltas = deltas.cache()
            touched_keys = [
                r[0] for r in deltas.select(partition_key_col(pdim)).distinct().collect()
            ]
            read_version = self.catalog.current_version(spec.name)
            cells = self.catalog.cells_for_partitions(spec.name, touched_keys)
        else:
            touched_keys = None
            cells = self.catalog.cells(spec.name)
        merged = merge_cells(cells, deltas, spec, extra_keys=(LEVEL_COL,))
        if touched_keys is not None:
            self.catalog.commit_partitions(
                spec.name,
                merged,
                touched_keys,
                batch_id=batch_id,
                stream_id=self.stream_id,
                read_version=read_version,
            )
            deltas.unpersist()
        else:
            self.catalog.overwrite_cells(
                spec.name, merged, batch_id=batch_id, stream_id=self.stream_id
            )
        return True

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


#: stage types that are pure per-document transforms — safe on an
#: unbounded stream with no state, no watermark, no output-mode
#: constraints. Everything else either needs state ($group/$sort/
#: $setWindowFields/...) or a bounded side ($lookup's packed foreign
#: side is fine batch-side, but the STREAM side of a stream-static
#: join has its own semantics — routed through the cube surface).
_STREAM_SAFE_STAGES = {
    "$match", "$project", "$addFields", "$set", "$unset", "$unwind",
    "$replaceRoot", "$replaceWith", "$redact",
}


def apply_change_stream_pipeline(stream: DataFrame, pipeline: list) -> DataFrame:
    """Mongo change-stream pipelines, Spark-first (round 6).

    ``collection.watch(pipeline)`` accepts a restricted stage list —
    per-document transforms over the change events. That is exactly
    the stateless subset of the aggregation compiler, so this applies
    the SAME ``compile_pipeline`` to an unbounded streaming DataFrame:
    every stage compiles to a projection/filter/explode on the stream,
    preserving incremental execution (no state store, any output
    mode). Stateful stages refuse by name toward the right surface —
    continuous aggregation is the cube maintainer (`CubeMaintainer` /
    `update_mode_aggregation`), not a pipeline stage on the stream.
    """
    from mongo_olap_spark.plans.pipeline_compiler import (
        PipelineError,
        compile_pipeline,
    )

    if not stream.isStreaming:
        raise PipelineError(
            "apply_change_stream_pipeline expects a streaming DataFrame; "
            "use compile_pipeline for batch sources"
        )
    for stage in pipeline:
        [(name, _)] = stage.items()
        if name not in _STREAM_SAFE_STAGES:
            raise PipelineError(
                f"{name} is not a change-stream stage: only per-document "
                f"transforms ({sorted(_STREAM_SAFE_STAGES)}) run on an "
                "unbounded stream. For continuous aggregation use "
                "CubeMaintainer (signed-delta MERGE) or "
                "update_mode_aggregation (Path A)"
            )
    return compile_pipeline(stream, pipeline)
