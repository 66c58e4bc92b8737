"""Cube catalog: create/list/drop/refresh + parquet cell storage.

The reference stores cube state back into MongoDB collections and
tracks a resume token per cube. Here: cells are parquet tables under a
catalog root, one directory per cube, partitioned by the coarsest time
dimension when present (partition pruning for time-sliced queries and
cheap partition-scoped rewrite during incremental maintenance); specs
are JSON sidecars; the streaming resume position is the Spark
checkpoint dir (streaming/pipeline.py).

Scale notes: overwrite-on-refresh writes are atomic per Spark's file
committer; at real scale the same class swaps parquet for Delta/
Iceberg (MERGE, snapshot isolation) behind this interface — callers
only see DataFrames.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from mongo_olap_spark.cube.build import build_cube
from mongo_olap_spark.cube.spec import CubeSpec


class CubeCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths ----------------------------------------------------------
    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _spec_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "cube.json")

    def _cells_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "cells")

    def _schema_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "cells_schema.json")

    # -- catalog ops (reference: create/list/drop cube) ------------------
    def list_cubes(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.exists(self._spec_path(d))
        )

    def get_spec(self, name: str) -> CubeSpec:
        with open(self._spec_path(name)) as f:
            return CubeSpec.from_json(f.read())

    def drop(self, name: str) -> None:
        shutil.rmtree(self._dir(name), ignore_errors=True)

    def create(self, spec: CubeSpec, source: DataFrame) -> DataFrame:
        """Define + initially populate a cube; returns the cell table."""
        os.makedirs(self._dir(spec.name), exist_ok=True)
        with open(self._spec_path(spec.name), "w") as f:
            f.write(spec.to_json())
        cells = build_cube(self.spark, spec, source)
        self._write_cells(spec, cells)
        return self.cells(spec.name)

    def create_lattice(
        self, spec: CubeSpec, source: DataFrame, levels: list[tuple[str, ...]] | None = None
    ) -> DataFrame:
        """Define + populate a multi-level (grouping-sets) cube in one
        pass; queries against materialized levels need no re-aggregation
        (cube/lattice.py)."""
        from mongo_olap_spark.cube.lattice import build_cube_lattice

        os.makedirs(self._dir(spec.name), exist_ok=True)
        with open(self._spec_path(spec.name), "w") as f:
            f.write(spec.to_json())
        names = spec.dim_names
        levels = levels or [tuple(names[:i]) for i in range(len(names), -1, -1)]
        with open(os.path.join(self._dir(spec.name), "lattice.json"), "w") as f:
            json.dump({"levels": [list(lv) for lv in levels]}, f)
        cells = build_cube_lattice(self.spark, spec, source, levels=levels)
        self._write_cells(spec, cells)
        return self.cells(spec.name)

    def lattice_levels(self, name: str) -> list[tuple[str, ...]] | None:
        """The materialized dim subsets of a lattice cube, or None for
        a plain (single-level) cube."""
        path = os.path.join(self._dir(name), "lattice.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return [tuple(lv) for lv in json.load(f)["levels"]]

    def refresh(self, name: str, source: DataFrame) -> DataFrame:
        """Full rebuild (the fallback when incremental isn't applicable)."""
        spec = self.get_spec(name)
        cells = build_cube(self.spark, spec, source)
        self._write_cells(spec, cells)
        return self.cells(name)

    def cells(self, name: str) -> DataFrame:
        """Current cell table. An empty cube (no parquet files yet —
        e.g. created from an empty source before streaming starts)
        reads as an empty DataFrame with the recorded cell schema."""
        from pyspark.sql.types import StructType

        with open(self._schema_path(name)) as f:
            schema = StructType.fromJson(json.load(f))
        path = self._cells_path(name)
        has_data = os.path.isdir(path) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
        )
        if not has_data:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(path)

    # -- storage ---------------------------------------------------------
    def partition_dim(self, spec: CubeSpec) -> str | None:
        """Coarsest time dimension = the physical partition key."""
        order = {"year": 0, "quarter": 1, "month": 2, "week": 3, "day": 4, "hour": 5, "minute": 6}
        timed = [d for d in spec.dimensions if d.granularity]
        if not timed:
            return None
        return min(timed, key=lambda d: order[d.granularity]).name

    def _write_cells(self, spec: CubeSpec, cells: DataFrame) -> None:
        with open(self._schema_path(spec.name), "w") as f:
            json.dump(cells.schema.jsonValue(), f)
        writer = cells.write.mode("overwrite")
        pdim = self.partition_dim(spec)
        if pdim is not None:
            writer = writer.partitionBy(pdim)
        writer.parquet(self._cells_path(spec.name))

    def overwrite_cells(self, name: str, cells: DataFrame) -> None:
        self._write_cells(self.get_spec(name), cells)
