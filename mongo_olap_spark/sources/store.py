"""Versioned parquet collection store — the write target for $out /
$merge pipeline stages.

The reference materializes pipeline output into named collections;
here a *stored collection* is a directory of immutable versioned
snapshots plus an atomically-swapped ``_LATEST`` pointer:

    <root>/<name>/v3/…parquet        (immutable snapshot)
    <root>/<name>/_LATEST            ("3", rename-committed)

Readers resolve ``_LATEST`` once and then read an immutable directory,
so a concurrent writer can never expose partial state — the same
snapshot-manifest discipline as ``CubeCatalog`` (cube/catalog.py), in
miniature. Old versions stay readable until ``vacuum``.

Scale notes: a write is one parquet job into a fresh dir + one 8-byte
pointer rename — no read-modify-write of live data, no locks. $merge
rewrites one new snapshot from (existing ⋈ incoming); at 100 TB you'd
key the collection by a partition column and rewrite only touched
partitions (the cube catalog's commit_partitions shows that shape);
the store keeps whole-snapshot semantics because $merge targets are
serving collections, orders of magnitude smaller than sources.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class ParquetCollectionStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _pointer(self, name: str) -> str:
        return os.path.join(self._dir(name), "_LATEST")

    def version(self, name: str) -> int | None:
        try:
            with open(self._pointer(name)) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def exists(self, name: str) -> bool:
        return self.version(name) is not None

    def read(self, name: str, *, version: int | None = None) -> DataFrame:
        v = self.version(name) if version is None else version
        if v is None:
            raise FileNotFoundError(f"collection {name!r} has no committed version")
        return self.spark.read.parquet(os.path.join(self._dir(name), f"v{v}"))

    def write(self, name: str, df: DataFrame) -> int:
        """Commit ``df`` as the next snapshot; readers flip atomically."""
        v = (self.version(name) or 0) + 1
        path = os.path.join(self._dir(name), f"v{v}")
        df.write.mode("errorifexists").parquet(path)
        tmp = self._pointer(name) + ".tmp"
        os.makedirs(self._dir(name), exist_ok=True)
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer(name))  # atomic pointer swap
        return v

    def vacuum(self, name: str) -> list[str]:
        """Delete snapshots older than _LATEST; returns removed dirs."""
        import shutil

        live = self.version(name)
        removed = []
        if live is None:
            return removed
        for entry in os.listdir(self._dir(name)):
            if entry.startswith("v") and entry[1:].isdigit() and int(entry[1:]) < live:
                p = os.path.join(self._dir(name), entry)
                shutil.rmtree(p)
                removed.append(p)
        return removed
