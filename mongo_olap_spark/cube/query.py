"""Cube querying: slice/dice + rollup to a dimension subset.

The reference answers ``{cube, groupBy ⊆ dims, filters on dims,
measures}`` from the materialized cells instead of the raw collection.
Cells store decomposed partials, so second-level aggregation is:

    sum  → SUM(partial_sum)
    count→ SUM(partial_cnt)
    avg  → SUM(partial_sum) / SUM(partial_cnt)   (derived, never stored)
    min  → MIN(partial_min) ; max → MAX(partial_max)

Because sums are exact DECIMAL partials, a rollup is *bit-identical*
to direct aggregation of the source — the pre-aggregation is invisible
to correctness (property-tested in tests/test_cube.py).

Scale notes: a cube query scans O(|cells|), shuffles O(|rollup
groups|); with the cell table partitioned on the coarse time dim,
time-range slices prune partitions before the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mongo_olap_spark.cube.spec import CubeSpec


def measure_rollup_exprs(
    spec: CubeSpec, measures: list[str] | None = None
) -> list[Column]:
    """Second-level aggregate expressions over cell partials.

    Output column names are the measure names (``avg`` measures emit
    ``<name>`` as the derived double).
    """
    out: list[Column] = []
    for m in spec.measures if measures is None else [spec.measure(x) for x in measures]:
        n = m.name
        if m.op == "count":
            out.append(F.sum(f"{n}_cnt").cast("long").alias(n))
        elif m.op == "sum":
            out.append(F.sum(f"{n}_sum").cast("double").alias(n))
        elif m.op == "avg":
            out.append(
                (F.sum(f"{n}_sum").cast("double") / F.sum(f"{n}_cnt")).alias(n)
            )
        elif m.op == "min":
            out.append(F.min(f"{n}_min").alias(n))
        elif m.op == "max":
            out.append(F.max(f"{n}_max").alias(n))
    return out


def query_cube(
    cells: DataFrame,
    spec: CubeSpec,
    group_by: list[str] | None = None,
    where: Column | str | None = None,
    measures: list[str] | None = None,
) -> DataFrame:
    """Answer an aggregate query from cube cells.

    ``group_by`` must be a subset of the cube's dimensions; ``where``
    may reference dimension columns only (it filters *cells*). When
    ``group_by`` is None, all dims are kept (pure slice — still
    re-aggregated so the output carries measure columns, not partials).
    """
    dims = spec.dim_names
    group_by = dims if group_by is None else group_by
    unknown = set(group_by) - set(dims)
    if unknown:
        raise ValueError(f"group_by not in cube dims: {sorted(unknown)}")
    df = cells
    if where is not None:
        df = df.filter(where)
    return df.groupBy(*group_by).agg(*measure_rollup_exprs(spec, measures))


def hybrid_query(
    cells: DataFrame,
    spec: CubeSpec,
    tail: DataFrame,
    group_by: list[str] | None = None,
    measures: list[str] | None = None,
) -> DataFrame:
    """Lambda-style serving: one answer from historical cells + the
    raw tail the cube has not absorbed yet.

    The reference keeps cubes fresh asynchronously, so at query time
    the materialized state lags the source by the un-applied tail
    (events past the maintenance watermark) [REF: fill — SURVEY.md §0].
    Rather than forcing the client to choose stale-but-fast (cells) or
    fresh-but-slow (source scan), aggregate the tail into cell-shaped
    partials (same ``cell_aggs`` as the builder), union with the stored
    cells, and roll up once. Because sums are exact DECIMAL partials,
    the merged answer is bit-identical to aggregating the full source.

    Scale notes: the cells side scans O(|cells|) (partition-pruned on
    the time dim); the tail side scans only the post-watermark slice —
    at 100 TB that is minutes of data, not the corpus. One shuffle
    total: both sides produce partials keyed on the same dims, the
    union re-aggregates with a single exchange.
    """
    from mongo_olap_spark.cube.build import build_cube

    tail_cells = build_cube(tail.sparkSession, spec, tail)
    cols = spec.dim_names + [c for m in spec.measures for c in m.storage_cols()]
    combined = cells.select(*cols).unionByName(tail_cells.select(*cols))
    return query_cube(combined, spec, group_by=group_by, measures=measures)
