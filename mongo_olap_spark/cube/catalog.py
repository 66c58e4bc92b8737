"""Cube catalog: create/list/drop/refresh + snapshot-manifest cell storage.

The reference stores cube state back into MongoDB collections and
tracks a resume token per cube. Here: cells are parquet files under a
catalog root, one directory per cube, with a **manifest pointer**
providing snapshot isolation without a table format dependency
(a mini Delta/Iceberg, same commit protocol):

    <root>/<cube>/
      cube.json            # spec
      cells_schema.json    # cell schema (read with explicit schema)
      lattice.json         # materialized levels (lattice cubes)
      data/w<version>/     # immutable write directories
        __p=<key>/…parquet #   one dir per time partition (or flat)
      manifest.json        # THE snapshot pointer — atomic os.replace

A manifest lists, per partition key, the directory holding that
partition's current files, plus driver-side statistics (row counts,
lattice level counts) and the streaming idempotency watermark
(``last_batch_id``). Commits write new data into a fresh ``w<N>`` dir
and flip ``manifest.json`` with one atomic rename:

- **readers never see partial state** — a reader that resolved the
  old manifest keeps reading the old (immutable, not-yet-vacuumed)
  files; one that resolves the new manifest sees the complete commit
  including the watermark (no torn cells/watermark pair → replayed
  micro-batches are exactly-once, not just at-least-once);
- **incremental maintenance is partition-scoped** — a commit may
  replace only the partitions a delta touched; untouched partitions
  are carried over *by reference* (their files are not rewritten —
  per-batch write cost is O(|touched|), not O(|all cells|));
- **routing is metadata-only** — per-partition row counts come from
  parquet footers at write time, so the router's cost proxy is a
  driver-side dict lookup, never a Spark job.

Partition keys are engine-formatted strings (``yyyy-MM-ddTHH.mm.ss``
or ``__NULL__``) — filesystem-safe by construction, so the directory
name equals the key and nothing ever parses Spark's escaping.

Old write dirs are retained until ``vacuum()`` (time-travel-free GC).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_olap_spark.cube.build import build_cube
from mongo_olap_spark.cube.spec import CubeSpec
from mongo_olap_spark.cube.table_format import TableFormatAdapter

#: manifest key for the single pseudo-partition of an unpartitioned cube
FLAT_KEY = "__all__"
#: partition-key string for a NULL time dimension value
NULL_KEY = "__NULL__"
#: filesystem-safe timestamp format (no colons/spaces — never escaped)
_KEY_FMT = "yyyy-MM-dd'T'HH.mm.ss"

#: bounded optimistic retries before a writer gives up rebasing
_MAX_COMMIT_RETRIES = 50


class CommitConflict(Exception):
    """Another writer committed the version this writer targeted."""


def _merge_batch_ids(prev: dict | None, batch_id, stream_id: str) -> dict:
    """Watermark fields for a new manifest: update THIS stream's entry,
    carry every other stream's from ``prev`` (on CAS rebase, prev is
    the winner's manifest, so concurrent streams never clobber each
    other). The legacy scalar mirrors the default stream."""
    prev = prev or {}
    ids = dict(prev.get("last_batch_ids") or {})
    if "default" not in ids and prev.get("last_batch_id", -1) != -1:
        ids["default"] = prev["last_batch_id"]
    if batch_id is not None:
        ids[stream_id] = batch_id
    return {
        "last_batch_ids": ids,
        "last_batch_id": ids.get("default", prev.get("last_batch_id", -1)),
    }


def _conflict_backoff(attempt: int) -> None:
    """Randomized backoff between CAS rebases (contention spreader)."""
    import random
    import time

    time.sleep(random.uniform(0, 0.02 * (attempt + 1)))


def partition_key_col(pdim: str | Column) -> Column:
    """The engine's partition-key string for a time-dimension column."""
    c = F.col(pdim) if isinstance(pdim, str) else pdim
    return F.coalesce(F.date_format(c, _KEY_FMT), F.lit(NULL_KEY))


def _dir_level_rows(path: str) -> dict[str, int]:
    """Per-lattice-level row counts for a partition dir: a driver-side
    pyarrow read of ONLY the level column (cells are small relative to
    their source; one int column of one partition is trivial)."""
    import numpy as np
    import pyarrow.parquet as pq

    from mongo_olap_spark.cube.lattice import LEVEL_COL

    counts: dict[str, int] = {}
    for dirpath, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                col = pq.read_table(
                    os.path.join(dirpath, f), columns=[LEVEL_COL]
                )[LEVEL_COL]
                for v, n in zip(*np.unique(col.to_numpy(), return_counts=True)):
                    counts[str(int(v))] = counts.get(str(int(v)), 0) + int(n)
    return counts


def _dir_meta(path: str, cols: set[str]) -> tuple[int, dict[str, list]]:
    """Row count AND per-column min/max for one partition directory
    from a SINGLE pass over the parquet footers (each footer open can
    be an object-store round trip — reading rows and stats separately
    would double every commit's metadata cost). Only JSON-native stat
    types (int/float/str) are recorded; columns whose footers carry no
    usable statistics are simply absent, which the pruner treats as
    'cannot skip'."""
    import pyarrow.parquet as pq

    total = 0
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    unusable: set[str] = set()
    for dirpath, _, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(dirpath, f)).metadata
            total += md.num_rows
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for j in range(row_group.num_columns):
                    col = row_group.column(j)
                    name = col.path_in_schema
                    if name not in cols:
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        continue
                    lo, hi = st.min, st.max
                    if isinstance(lo, bytes):
                        try:
                            lo, hi = lo.decode("utf-8"), hi.decode("utf-8")
                        except UnicodeDecodeError:
                            continue
                    if not isinstance(lo, (int, float, str)) or name in unusable:
                        continue
                    try:
                        mins[name] = lo if name not in mins else min(mins[name], lo)
                        maxs[name] = hi if name not in maxs else max(maxs[name], hi)
                    except TypeError:
                        # files disagree on the column's stat type
                        # (str in one footer, numeric in another):
                        # stats for this column are unusable — drop
                        # them so the pruner keeps the partition
                        mins.pop(name, None)
                        maxs.pop(name, None)
                        unusable.add(name)
    return total, {c: [mins[c], maxs[c]] for c in mins if c not in unusable}


def _sum_level_rows(entries: dict[str, dict]) -> dict[str, int]:
    totals: dict[str, int] = {}
    for e in entries.values():
        for lv, n in e.get("level_rows", {}).items():
            totals[lv] = totals.get(lv, 0) + n
    return totals


class CubeCatalog(TableFormatAdapter):
    """Parquet + snapshot-manifest implementation of the cube store's
    table-format contract (see cube/table_format.py — instance #1 of
    the Delta/Iceberg swap seam; the MERGE-semantics contract suite in
    tests/test_table_format_contract.py runs against the ABC only)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths ----------------------------------------------------------
    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _spec_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "cube.json")

    def _schema_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "cells_schema.json")

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "manifest.json")

    # -- manifest -------------------------------------------------------
    def _hist_path(self, name: str, version: int) -> str:
        return os.path.join(self._dir(name), "manifests", f"v{version}.json")

    def manifest(self, name: str, version: int | None = None) -> dict | None:
        """The current snapshot manifest, or a historical one by
        version (time travel — valid until ``vacuum`` reclaims the
        files that snapshot references).

        Concurrency: the versioned file under ``manifests/`` is the
        commit of record (created exclusively — the CAS); the unversioned
        ``manifest.json`` is a pointer cache. If a writer crashed between
        the two steps, the cache lags — readers walk forward to the
        newest committed version and repair the cache best-effort, so a
        half-finished commit is never lost and never blocks the next
        writer."""
        if version is not None:
            try:
                with open(self._hist_path(name, version)) as f:
                    return json.load(f)
            except (OSError, ValueError):
                return None
        try:
            with open(self._manifest_path(name)) as f:
                m = json.load(f)
        except (OSError, ValueError):
            m = None
        cur = 0 if m is None else m["version"]
        healed = False
        while True:
            nxt = self.manifest(name, cur + 1)
            if nxt is None:
                break
            m, cur, healed = nxt, cur + 1, True
        if healed:
            self._write_pointer(name, m)
        return m

    def _write_pointer(self, name: str, manifest: dict) -> None:
        """Best-effort refresh of the ``manifest.json`` cache (unique
        temp name: concurrent repairers must not share a temp file).
        Stale overwrites are harmless — readers walk forward anyway."""
        import threading

        path = self._manifest_path(name)
        tmp = f"{path}.tmp-{os.getpid()}-{threading.get_ident()}"
        try:
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=1)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
        except OSError:
            pass

    def _commit_manifest(self, name: str, manifest: dict) -> None:
        """Version-fenced commit (compare-and-swap).

        The manifest is written to a writer-unique temp file and
        published by ``os.link`` to ``manifests/v<version>.json`` —
        link is atomic and fails with EEXIST if ANY other writer
        already committed that version, so exactly one writer wins
        each version; losers get ``CommitConflict`` and must re-read
        the current manifest, rebase, and retry. The pointer cache is
        refreshed after the fact (crash-safe: see ``manifest``)."""
        import threading

        hist_dir = os.path.join(self._dir(name), "manifests")
        os.makedirs(hist_dir, exist_ok=True)
        target = self._hist_path(name, manifest["version"])
        tmp = f"{target}.tmp-{os.getpid()}-{threading.get_ident()}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, target)
        except FileExistsError:
            raise CommitConflict(
                f"{name}: version {manifest['version']} was committed by a "
                "concurrent writer"
            ) from None
        finally:
            os.unlink(tmp)
        self._write_pointer(name, manifest)

    # -- catalog ops (reference: create/list/drop cube) ------------------
    def list_cubes(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.exists(self._spec_path(d))
        )

    def get_spec(self, name: str, version: int | None = None) -> CubeSpec:
        """The cube's spec — current, or as of a pinned snapshot
        ``version`` (r15 spec evolution): every snapshot commit embeds
        its spec in the manifest, so a time-travel read resolves the
        spec that WROTE those cells, not whatever the cube evolved to
        since. Manifests from before r15 (or a version=None current
        read) fall back to the spec.json file."""
        if version is not None:
            m = self.manifest(name, version)
            if m is None:
                raise ValueError(
                    f"cube {name!r} has no committed snapshot version "
                    f"{version} (available: {self.list_versions(name)})")
            if m.get("spec"):
                return CubeSpec.from_json(m["spec"])
            # pre-embedding manifest: the spec.json FILE is only a safe
            # stand-in if the spec never changed after this version. An
            # evolve() leaves detectable evidence — its manifest is
            # marked ("evolved": true, r16) and intermediate manifests
            # may embed a spec that disagrees with the file — and
            # resolving version N against a post-evolve measure set is
            # exactly the mismatch spec embedding was added to prevent,
            # so refuse loudly on either signal.
            with open(self._spec_path(name)) as f:
                current = f.read()
            newer = [self.manifest(name, v)
                     for v in self.list_versions(name) if v > version]
            embedded = {json.dumps(json.loads(n["spec"]), sort_keys=True)
                        for n in newer if n and n.get("spec")}
            cur_key = json.dumps(json.loads(current), sort_keys=True)
            evolved_later = any(n.get("evolved") for n in newer if n)
            if evolved_later or embedded - {cur_key}:
                raise ValueError(
                    f"cube {name!r}: snapshot version {version} predates "
                    f"spec embedding and the cube's spec CHANGED in a "
                    f"later version (evolve) — the current spec.json "
                    f"does not describe these cells. Pin a version "
                    f"whose manifest embeds its spec, or refresh().")
            # the two manifest signals above miss ONE corner: an
            # evolve committed by r15-era code (no "evolved" mark) on
            # top of a pre-embedding version, where every embedded
            # spec equals the rewritten spec.json. But evolve only
            # ever ADDS or DROPS measures — it always changes the
            # cell storage columns — and the pinned version's parquet
            # footers record the columns that were actually written,
            # so a column-set mismatch against the current spec is
            # PROOF the spec changed after this version. One driver-
            # side footer read of one partition file.
            cand = CubeSpec.from_json(current)
            parts = m.get("partitions") or {}
            part = next(iter(parts.values()), None) \
                if isinstance(parts, dict) else (parts or [None])[0]
            if part:
                path = os.path.join(self._dir(name), part["path"])
                actual = {f.name for f in
                          self.spark.read.parquet(path).schema.fields}
                expected = set(cand.dim_names)
                for ms in cand.measures:
                    expected.update(ms.storage_cols())
                # lattice/bookkeeping columns (__level, …) are not
                # spec-derived; ignore them on the actual side
                actual = {c for c in actual if not c.startswith("__")}
                if actual != expected:
                    raise ValueError(
                        f"cube {name!r}: snapshot version {version} "
                        f"predates spec embedding and its cell columns "
                        f"{sorted(actual)} do not match the current "
                        f"spec's {sorted(expected)} — the spec changed "
                        f"after this version (an evolve committed by a "
                        f"pre-marking engine). Pin a version whose "
                        f"manifest embeds its spec, or refresh().")
            import warnings
            warnings.warn(
                f"cube {name!r}: snapshot version {version} predates "
                f"spec embedding; serving it with the current spec.json "
                f"(no later spec change detected; cell columns match)",
                stacklevel=2)
            return cand
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
        self._write_snapshot(spec, cells)
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
        self._write_snapshot(spec, cells, lattice=True)
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
        self._write_snapshot(spec, cells, lattice=self.lattice_levels(name) is not None)
        return self.cells(name)

    def evolve(self, name: str, *, add: tuple = (), drop: tuple = (),
               source: DataFrame | None = None) -> DataFrame:
        """Add/drop measures on a LIVE cube without rebuilding the
        surviving measures (r15, VERDICT r14 task 4 — the config-driven
        reference implicitly does this when a cube config changes).

        - **drop**: a projection of the current cell table — the
          dropped measures' storage columns disappear; nothing is
          re-aggregated.
        - **add**: ONE source scan pruned to the new measures' input
          columns (+ dims) aggregates the new partials, then a
          cells-sized null-safe join grafts them onto the existing
          cells. Existing partials are carried by the join, never
          recomputed — the cost is O(source scan of the new columns) +
          O(cells), not a full rebuild of every measure.

        The evolved table commits as a NEW snapshot version whose
        manifest embeds the NEW spec; every older snapshot stays
        pinned with the spec that wrote it (``get_spec(version=…)``),
        so time travel across the evolution answers with the
        HISTORICAL measure set. IVM picks the new spec up on its next
        batch (``commit_partitions`` re-reads the spec).

        Contract: ``source`` must be the source state the cube
        currently reflects (same contract as :meth:`refresh`). The
        read→commit window is CAS-guarded (r16): a concurrent CDC
        commit makes a drop-only evolve REBASE onto the winner's
        cells, and an add-measure evolve REFUSE with
        ``CommitConflict`` (its backfill no longer matches the cube
        state) — it is never silently overwritten. The service still
        runs evolve under its exclusive write lock, which avoids the
        refusal path entirely.
        """
        from dataclasses import replace as _dc_replace

        from mongo_olap_spark.cube.build import _measure_aggs

        spec = self.get_spec(name)
        if self.lattice_levels(name) is not None:
            raise ValueError(
                f"evolve: cube {name!r} is a lattice — evolving a "
                f"grouping-sets cube means re-declaring its levels; "
                f"use create_lattice/refresh instead")
        add, drop = tuple(add), tuple(drop)
        if not add and not drop:
            raise ValueError("evolve: nothing to do (empty add and drop)")
        have = {m.name for m in spec.measures}
        unknown = [d for d in drop if d not in have]
        if unknown:
            raise ValueError(
                f"evolve: cube {name!r} has no measure(s) {unknown} "
                f"to drop (measures: {sorted(have)})")
        taken = have | {d.name for d in spec.dimensions}
        clash = [m.name for m in add if m.name in taken]
        if clash:
            raise ValueError(
                f"evolve: added measure name(s) {clash} collide with "
                f"existing dims/measures of cube {name!r}")
        kept = tuple(m for m in spec.measures if m.name not in set(drop))
        new_spec = _dc_replace(spec, measures=kept + add)  # validates
        if add and source is None:
            raise ValueError(
                "evolve: adding measures requires source= (the "
                "backfill scan for the new partials)")
        dropped_cols = [c for d in drop
                        for c in spec.measure(d).storage_cols()]
        # r16 (VERDICT r15 task 4): the read→commit window is guarded
        # by a version CAS (expected_prev_version) instead of relying
        # on the caller to quiesce writes. On drift: a DROP-only
        # evolve rebases — re-read the winner's cells and re-project
        # (always sound: projection commutes with any concurrent
        # merge). An ADD cannot rebase, because its backfill was
        # aggregated from a `source` snapshot that no longer matches
        # the advanced cube state — grafting it would mis-state the
        # new measures for whatever the winner changed — so it
        # refuses loudly; never does either path silently drop the
        # concurrent batch (the pre-r16 behavior).
        for attempt in range(_MAX_COMMIT_RETRIES):
            base = (self.manifest(name) or {}).get("version", 0)
            cells = self.cells(name)
            new_cells = cells.drop(*dropped_cols) if dropped_cols else cells
            if add:
                df = source
                if spec.filter_sql:
                    df = df.filter(spec.filter_sql)
                dims = [d.expr() for d in spec.dimensions]
                aggs = [a for m in add for a in _measure_aggs(m)]
                backfill = df.groupBy(*dims).agg(*aggs)
                bf_cols = [c for m in add for c in m.storage_cols()]
                if spec.dimensions:
                    cond = None
                    for dn in spec.dim_names:
                        # null-safe: NULL dim values are real group keys
                        c = new_cells[dn].eqNullSafe(backfill[dn])
                        cond = c if cond is None else (cond & c)
                    new_cells = new_cells.join(backfill, cond, "left").select(
                        *[new_cells[c] for c in new_cells.columns],
                        *[backfill[c] for c in bf_cols])
                else:
                    new_cells = new_cells.crossJoin(backfill.select(*bf_cols))
                for m in add:
                    for c in m.storage_cols():
                        if c.endswith("_cnt"):
                            # a join miss (group gone from the source)
                            # is an empty group for the new measure:
                            # count 0, sums stay NULL — build_cube's
                            # empty shape
                            new_cells = new_cells.withColumn(
                                c, F.coalesce(F.col(c),
                                              F.lit(0).cast("long")))
                        elif c.endswith("_tkn"):
                            # topk mass: a join-miss group has ZERO
                            # mass — NULL is reserved for "mass
                            # unknown" (pre-certificate legacy cells)
                            # and would make the serve refuse a
                            # freshly-evolved cube as legacy
                            new_cells = new_cells.withColumn(
                                c, F.coalesce(F.col(c),
                                              F.lit(0).cast("long")))
                        elif c.endswith("_tk"):
                            # topk map: empty map, matching the shape
                            # build_cube emits for a group with no
                            # non-null values
                            dt = new_cells.schema[c].dataType
                            new_cells = new_cells.withColumn(
                                c, F.coalesce(
                                    F.col(c),
                                    F.expr("map()").cast(dt)))
            try:
                self._write_snapshot(new_spec, new_cells,
                                     extra={"evolved": True},
                                     expected_prev_version=base)
                break
            except CommitConflict:
                if add:
                    raise CommitConflict(
                        f"evolve: cube {name!r} advanced past version "
                        f"{base} while adding measures — the backfill "
                        f"source no longer matches the cube state. "
                        f"Quiesce writes (the service's evolve_cube "
                        f"runs under its exclusive lock) and retry "
                        f"with a fresh source.") from None
                _conflict_backoff(attempt)
        else:
            raise CommitConflict(
                f"evolve: {name}: gave up after {_MAX_COMMIT_RETRIES} "
                f"rebases")
        with open(self._spec_path(name), "w") as f:
            f.write(new_spec.to_json())
        return self.cells(name)

    # -- reads ----------------------------------------------------------
    def _cell_schema(self, name: str):
        from pyspark.sql.types import StructType

        with open(self._schema_path(name)) as f:
            return StructType.fromJson(json.load(f))

    def cells(self, name: str, *, version: int | None = None) -> DataFrame:
        """Current cell table (the manifest's snapshot), or a past
        snapshot by ``version`` — files are immutable, so a historical
        manifest is readable until ``vacuum`` reclaims what only it
        references. An empty cube reads as an empty DataFrame with the
        recorded cell schema."""
        return self._read_partitions(name, None, version=version)

    def cells_for_partitions(self, name: str, keys: list[str]) -> DataFrame:
        """The snapshot restricted to the given partition keys —
        file-level pruning (only those directories are listed/read),
        the read half of partition-scoped maintenance."""
        return self._read_partitions(name, keys)

    def cells_in_range(self, name: str, lo=None, hi=None) -> DataFrame:
        """File-level pruning for a time-range slice ``[lo, hi)``.

        Partition keys are fixed-width ``yyyy-MM-dd'T'HH.mm.ss``
        strings, so lexicographic order IS time order and the range
        compare runs driver-side over manifest keys — only matching
        partition directories are ever listed or read. A time slice
        over a year-partitioned decade of cells touches one partition
        dir, not all of them; this is the cube-side analogue of
        parquet partition pruning. NULL-dim cells are excluded (a time
        range cannot match them). ``lo``/``hi`` take datetimes or
        preformatted key strings; None leaves that bound open.
        """
        def fmt(x):
            return x if (x is None or isinstance(x, str)) else x.strftime(
                "%Y-%m-%dT%H.%M.%S"
            )

        lo, hi = fmt(lo), fmt(hi)
        m = self.manifest(name) or {}
        if FLAT_KEY in m.get("partitions", {}):
            # unpartitioned cube: nothing to prune — scan + filter
            return self.cells(name)
        keys = [
            k
            for k in m.get("partitions", {})
            if k != NULL_KEY
            and (lo is None or k >= lo)
            and (hi is None or k < hi)
        ]
        return self._read_partitions(name, keys)

    def cells_in_dim_range(self, name: str, dim: str, lo=None, hi=None) -> DataFrame:
        """Data skipping on a NON-time dimension: drop partitions whose
        recorded [min, max] for ``dim`` cannot intersect ``[lo, hi]``
        (closed bounds; None leaves that side open). Partitions without
        statistics for the column are kept — skipping is an
        optimization, never a filter — so callers still apply the
        actual predicate to the returned cells. This is the manifest
        analogue of parquet row-group pruning, one level up: at scale
        it means a sliced query lists only the partition directories
        whose footer stats can match."""
        m = self.manifest(name) or {}
        keys = []
        for key, entry in m.get("partitions", {}).items():
            st = entry.get("stats", {}).get(dim)
            if st is not None:
                smin, smax = st
                try:
                    if lo is not None and smax < lo:
                        continue
                    if hi is not None and smin > hi:
                        continue
                except TypeError:
                    # stats type doesn't compare with the caller's
                    # bounds (e.g. string stats vs numeric bounds):
                    # degrade to "cannot skip", never to an error
                    pass
            keys.append(key)
        return self._read_partitions(name, keys)

    def _read_partitions(
        self, name: str, keys: list[str] | None, *, version: int | None = None
    ) -> DataFrame:
        m = self.manifest(name, version)
        # r15: a snapshot reads with the schema that WROTE it — after
        # an evolve() the current schema.json gains/loses measure
        # columns, and reading an old snapshot through it would null
        # out added columns and (worse) silently prune dropped ones a
        # historical spec still references. Manifests from before r15
        # fall back to the file.
        if m and m.get("schema"):
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(m["schema"])
        else:
            schema = self._cell_schema(name)
        parts = (m or {}).get("partitions", {})
        if keys is not None:
            parts = {k: v for k, v in parts.items() if k in set(keys)}
        paths = [os.path.join(self._dir(name), p["path"]) for p in parts.values()]
        if not paths:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*paths)

    # -- statistics (metadata-only routing) ------------------------------
    def cell_count(self, name: str) -> int | None:
        """Total cells from manifest statistics — no Spark job."""
        m = self.manifest(name)
        if m is None:
            return None
        return sum(p["rows"] for p in m.get("partitions", {}).values())

    def level_counts(self, name: str) -> dict[int, int] | None:
        """Per-lattice-level cell counts (level mask → rows), recorded
        at create/refresh time; None for plain cubes."""
        m = self.manifest(name)
        if m is None or m.get("level_counts") is None:
            return None
        return {int(k): v for k, v in m["level_counts"].items()}

    def last_batch_id(self, name: str, stream_id: str = "default") -> int:
        """Per-STREAM idempotency watermark. Spark batch ids are scoped
        to one streaming checkpoint, so with several maintainers on one
        cube (the concurrent-writer topology the CAS supports) a single
        shared watermark would let writer B's id clobber writer A's —
        replays double-apply or pending batches get wrongly skipped.
        The manifest therefore keeps ``last_batch_ids: {stream: id}``;
        the legacy ``last_batch_id`` field mirrors the default stream."""
        m = self.manifest(name)
        if m is None:
            return -1
        ids = m.get("last_batch_ids") or {}
        if stream_id in ids:
            return ids[stream_id]
        if stream_id == "default":
            return m.get("last_batch_id", -1)
        return -1

    def current_version(self, name: str) -> int:
        """The committed snapshot version (0 = no manifest yet) — the
        read-set fence a partition-scoped writer passes back to
        ``commit_partitions`` as ``read_version``."""
        m = self.manifest(name)
        return 0 if m is None else m["version"]

    def list_versions(self, name: str) -> list[int]:
        """Committed snapshot versions with a readable manifest,
        ascending — the time-travel surface. A listed version's DATA
        may still have been reclaimed by ``vacuum`` (only the CURRENT
        manifest pins files); ``OlapEngine.query(as_of=…)`` checks the
        referenced directories before serving, so a reclaimed snapshot
        refuses instead of reading a partial cube."""
        d = os.path.join(self._dir(name), "manifests")
        if not os.path.isdir(d):
            return []
        out = []
        for f in os.listdir(d):
            if f.startswith("v") and f.endswith(".json") and f[1:-5].isdigit():
                out.append(int(f[1:-5]))
        return sorted(out)

    # -- storage ---------------------------------------------------------
    def partition_dim(self, spec: CubeSpec) -> str | None:
        """Coarsest time dimension = the physical partition key."""
        order = {"year": 0, "quarter": 1, "month": 2, "week": 3, "day": 4, "hour": 5, "minute": 6}
        timed = [d for d in spec.dimensions if d.granularity]
        if not timed:
            return None
        return min(timed, key=lambda d: order[d.granularity]).name

    def _next_write_dir(self, name: str, version: int) -> str:
        """Writer-unique write directory. The random suffix keeps two
        concurrent writers (who may both target version N before one
        loses the CAS) from overwriting each other's data files — the
        manifest references the directory by name, so names never need
        to match the version that finally wins."""
        import uuid

        rel = os.path.join("data", f"w{version}-{uuid.uuid4().hex[:8]}")
        os.makedirs(os.path.join(self._dir(name), "data"), exist_ok=True)
        return rel

    def _write_data(
        self, spec: CubeSpec, cells: DataFrame, rel_dir: str, *, lattice: bool = False
    ) -> dict[str, dict]:
        """Write a cell DataFrame into ``rel_dir``; returns the new
        partition entries {key: {path, rows[, level_rows]}} (rows from
        parquet footers; lattice level counts from a driver-side read
        of the level column only — no Spark job either way)."""
        abs_dir = os.path.join(self._dir(spec.name), rel_dir)
        pdim = self.partition_dim(spec)
        stat_cols = set(spec.dim_names)
        if pdim is None:
            cells.write.mode("overwrite").parquet(abs_dir)
            rows, stats = _dir_meta(abs_dir, stat_cols)
            if not rows:
                return {}
            entry = {"path": rel_dir, "rows": rows}
            if stats:
                entry["stats"] = stats
            if lattice:
                entry["level_rows"] = _dir_level_rows(abs_dir)
            return {FLAT_KEY: entry}
        # one directory per engine-formatted key; __p never reaches the
        # data files (partition column) while the real time dim column
        # stays in the data, so reads need no dirname parsing.
        # repartition on the key first: each partition dir gets one
        # file per owning task instead of one per shuffle partition —
        # cell tables are small relative to their sources, and without
        # this a k-day cube writes k × shuffle_partitions tiny files
        # (measured 5× slower create + slower reads/footer stats).
        (
            cells.withColumn("__p", partition_key_col(pdim))
            .repartition(F.col("__p"))
            .write.mode("overwrite")
            .partitionBy("__p")
            .parquet(abs_dir)
        )
        entries: dict[str, dict] = {}
        for d in os.listdir(abs_dir):
            if d.startswith("__p="):
                key = d[len("__p="):]
                rel = os.path.join(rel_dir, d)
                pabs = os.path.join(self._dir(spec.name), rel)
                rows, stats = _dir_meta(pabs, stat_cols)
                entries[key] = {"path": rel, "rows": rows}
                if stats:
                    entries[key]["stats"] = stats
                if lattice:
                    entries[key]["level_rows"] = _dir_level_rows(pabs)
        return entries

    def _write_snapshot(
        self,
        spec: CubeSpec,
        cells: DataFrame,
        *,
        lattice: bool = False,
        batch_id: int | None = None,
        stream_id: str = "default",
        extra: dict | None = None,
        expected_prev_version: int | None = None,
    ) -> None:
        """Full snapshot: all partitions from this write. Data is
        written once (writer-unique dir); only the cheap manifest CAS
        rebases and retries on a concurrent commit. ``extra`` merges
        additional manifest keys (evolve marks its commit so pinned
        reads of pre-embedding versions can detect a later spec
        change).

        ``expected_prev_version`` (r16): a full snapshot whose cells
        were DERIVED from a prior version (evolve reads the current
        cells) must not blind-rebase — retrying the same cells on top
        of a concurrent commit would silently drop that commit's
        batch. With the expectation set, a version drift raises
        ``CommitConflict`` to the caller, who re-reads and recomputes
        (a true rebase) or surfaces the refusal."""
        prev = self.manifest(spec.name)
        if (expected_prev_version is not None
                and (prev or {}).get("version", 0) != expected_prev_version):
            raise CommitConflict(
                f"{spec.name}: expected to commit on top of version "
                f"{expected_prev_version} but the cube is at "
                f"{(prev or {}).get('version', 0)} — a concurrent "
                f"writer committed; re-read and recompute")
        rel_dir = self._next_write_dir(spec.name, (prev or {}).get("version", 0) + 1)
        entries = self._write_data(spec, cells, rel_dir, lattice=lattice)
        level_counts = _sum_level_rows(entries) if lattice else None
        for attempt in range(_MAX_COMMIT_RETRIES):
            try:
                self._commit_manifest(
                    spec.name,
                    {
                        "version": (prev or {}).get("version", 0) + 1,
                        "partitions": entries,
                        "level_counts": level_counts,
                        # r15: spec AND cell schema travel WITH the
                        # snapshot, so time travel across a later
                        # evolve() resolves the spec that wrote these
                        # cells and reads them with their own schema
                        "spec": spec.to_json(),
                        "schema": cells.schema.jsonValue(),
                        **_merge_batch_ids(prev, batch_id, stream_id),
                        **(extra or {}),
                    },
                )
                # the schema FILE is only the fallback for pre-r15
                # manifests without an embedded schema; write it after
                # the commit lands so a refused CAS (evolve racing a
                # CDC pump) cannot leave it describing columns that
                # were never committed
                with open(self._schema_path(spec.name), "w") as f:
                    json.dump(cells.schema.jsonValue(), f)
                return
            except CommitConflict:
                if expected_prev_version is not None:
                    # these cells were computed against the expected
                    # base; committing them on a different head would
                    # drop the winner's batch — the caller rebases
                    raise
                _conflict_backoff(attempt)
                prev = self.manifest(spec.name)
        raise CommitConflict(
            f"{spec.name}: gave up after {_MAX_COMMIT_RETRIES} rebases"
        )

    def commit_partitions(
        self,
        name: str,
        cells: DataFrame,
        touched_keys: list[str],
        *,
        batch_id: int | None = None,
        stream_id: str = "default",
        read_version: int | None = None,
    ) -> None:
        """Partition-scoped commit: ``cells`` holds the new content of
        the touched partitions ONLY; every other partition is carried
        over by reference (files untouched on disk). A touched key with
        no surviving cells simply leaves the new manifest (eviction).
        The idempotency watermark commits atomically with the data.

        Concurrent writers: the data write happens ONCE into a
        writer-unique directory; on a manifest CAS conflict the commit
        rebases — untouched partitions are re-carried from the WINNER's
        manifest, so a second engine committing disjoint partitions
        loses neither side's cells (two-writer race test in
        tests/test_streaming.py). Rebase is only sound when the
        concurrent commits touched DISJOINT partitions: pass
        ``read_version`` (the ``current_version`` observed when the old
        cells were read) and the commit refuses — instead of silently
        merging against stale cells — if a winner modified one of this
        writer's touched partitions in between."""
        spec = self.get_spec(name)
        lattice = self.lattice_levels(name) is not None
        rel_dir = self._next_write_dir(
            name, (self.manifest(name) or {}).get("version", 0) + 1
        )
        new_entries = self._write_data(spec, cells, rel_dir, lattice=lattice)
        unexpected = set(new_entries) - set(touched_keys)
        if unexpected:
            raise ValueError(
                f"commit_partitions: write produced partitions outside the "
                f"declared touched set: {sorted(unexpected)}"
            )
        for attempt in range(_MAX_COMMIT_RETRIES):
            prev = self.manifest(name) or {
                "version": 0,
                "partitions": {},
                "level_counts": None,
            }
            if read_version is not None and prev["version"] != read_version:
                base = self.manifest(name, read_version) or {"partitions": {}}
                for k in touched_keys:
                    if prev["partitions"].get(k) != base["partitions"].get(k):
                        raise CommitConflict(
                            f"{name}: partition {k!r} changed under this writer "
                            f"(read at v{read_version}, now v{prev['version']}) — "
                            "re-read the cells and re-merge"
                        )
            partitions = {
                k: v
                for k, v in prev["partitions"].items()
                if k not in set(touched_keys)
            }
            partitions.update(new_entries)
            # lattice stats stay exact under maintenance: every entry
            # carries per-level rows, so the totals are a dict sum
            # (falls back to the previous totals only for
            # pre-lattice-stats legacy entries)
            if lattice and all("level_rows" in e for e in partitions.values()):
                level_counts = _sum_level_rows(partitions)
            else:
                level_counts = prev.get("level_counts")
            manifest = {
                "version": prev["version"] + 1,
                "partitions": partitions,
                "level_counts": level_counts,
                **({"spec": prev["spec"]} if prev.get("spec")
                   else {"spec": spec.to_json()}),
                **({"schema": prev["schema"]} if prev.get("schema")
                   else {"schema": self._cell_schema(name).jsonValue()}),
                **_merge_batch_ids(prev, batch_id, stream_id),
            }
            try:
                self._commit_manifest(name, manifest)
                return
            except CommitConflict:
                _conflict_backoff(attempt)
        raise CommitConflict(f"{name}: gave up after {_MAX_COMMIT_RETRIES} rebases")

    def overwrite_cells(
        self,
        name: str,
        cells: DataFrame,
        *,
        batch_id: int | None = None,
        stream_id: str = "default",
    ) -> None:
        """Full-snapshot replacement (refresh semantics). The batch
        watermark, when given, commits atomically with the data."""
        spec = self.get_spec(name)
        self._write_snapshot(
            spec,
            cells,
            lattice=self.lattice_levels(name) is not None,
            batch_id=batch_id,
            stream_id=stream_id,
        )

    def compact(self, name: str) -> int:
        """Rewrite the current snapshot into one fresh write directory
        and drop everything it superseded.

        Streaming maintenance leaves the live snapshot scattered over
        many per-batch write dirs (each partition points at whichever
        dir last touched it); readers are correct but pay manifest
        breadth and lose locality, and the data tree accumulates
        orphans between vacuums. Compaction = overwrite_cells with the
        cube's own current content (same decimal partials — cells are
        re-written, never re-aggregated, so the result is
        bit-identical), preserving the idempotency watermark, then
        vacuum. Returns the number of directories reclaimed.

        Scale: one job over O(|cells|) — cheap next to any source
        scan; schedule it like any table-maintenance task (the same
        role OPTIMIZE/rewrite_data_files plays for Delta/Iceberg).
        """
        cells = self.cells(name).localCheckpoint()  # read fully before overwrite
        self.overwrite_cells(name, cells, batch_id=self.last_batch_id(name))
        return len(self.vacuum(name))

    def vacuum(self, name: str, *, min_age_s: float = 0) -> list[str]:
        """Delete write directories no longer referenced by the current
        manifest. Safe any time readers re-resolve the manifest per
        query; with long-lived readers OR concurrent writers, pass
        ``min_age_s``: directories younger than the grace window are
        kept even when unreferenced, which protects a concurrent
        writer's just-written-but-not-yet-committed data (and a
        long-lived reader's pinned snapshot) — the same retention
        discipline Delta's VACUUM applies. ``min_age_s=0`` is only
        safe from the single maintenance owner."""
        import time

        now = time.time()
        m = self.manifest(name)
        if m is None:
            return []
        live = {
            os.path.normpath(p["path"]) for p in m["partitions"].values()
        }
        data_dir = os.path.join(self._dir(name), "data")
        removed: list[str] = []
        if not os.path.isdir(data_dir):
            return removed
        for w in os.listdir(data_dir):
            wrel = os.path.join("data", w)
            wabs = os.path.join(data_dir, w)
            if wrel in live:
                continue  # a flat snapshot still referenced whole
            try:
                if min_age_s > 0 and now - os.path.getmtime(wabs) < min_age_s:
                    continue  # grace window: possibly an in-flight writer
            except OSError:
                continue
            # partition-granular: reclaim unreferenced __p dirs, then
            # the write dir itself once nothing live remains inside
            for d in os.listdir(wabs):
                prel = os.path.join(wrel, d)
                if d.startswith("__p=") and prel not in live:
                    shutil.rmtree(os.path.join(wabs, d), ignore_errors=True)
                    removed.append(prel)
            if not any(d.startswith("__p=") for d in os.listdir(wabs)):
                shutil.rmtree(wabs, ignore_errors=True)
                removed.append(wrel)
        # historical manifests whose snapshot referenced a reclaimed
        # path are no longer readable — drop them so time travel never
        # resolves to missing files
        hist_dir = os.path.join(self._dir(name), "manifests")
        if removed and os.path.isdir(hist_dir):
            gone = set(removed)
            for f in os.listdir(hist_dir):
                with open(os.path.join(hist_dir, f)) as fh:
                    hm = json.load(fh)
                refs = {os.path.normpath(p["path"]) for p in hm["partitions"].values()}
                if refs & gone or any(
                    any(r.startswith(g + os.sep) for g in gone) for r in refs
                ):
                    os.unlink(os.path.join(hist_dir, f))
        return removed
