"""Incremental view maintenance (IVM) with retraction — SURVEY.md §4.3.

Spark's built-in streaming aggregation cannot *decrement* state on
deletes; the reference's domain (change streams) requires it. The
engine's answer is signed-multiplicity deltas merged into the cell
table:

    cdc(mult = +1 insert / −1 delete; update = −1/+1 pair)
      → delta_cells(spec, batch)            # groupBy dims, signed partials
      → merge_cells(current, deltas, spec)  # full-outer join, add partials
      → drop cells whose row count hits 0

Because partials are exact decimals, incremental apply is
*bit-identical* to a batch rebuild (property-tested), in any batch
order — signed decimal addition is associative and commutative.

min/max are not retraction-maintainable (dropping the current min
needs the runner-up). Policy, same as the reference domain's implicit
one: min/max partials merge on inserts; any delete touching a min/max
cube triggers ``recompute_cells`` for the affected cells only (bounded
work: a dims-semi-join against the source, pruned by the cell key —
with a time-partitioned source this is a partition-local rescan).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo_olap_spark.cube.build import build_cube, delta_cells  # noqa: F401 (re-export)
from mongo_olap_spark.cube.spec import CubeSpec
from mongo_olap_spark.functions.expressions import SUM_DECIMAL


def row_count_col(spec: CubeSpec) -> str:
    """The storage column tracking cell row multiplicity (used to drop
    empty cells after retraction): a count measure if present, else an
    avg's count partial."""
    for m in spec.measures:
        if m.op == "count":
            return f"{m.name}_cnt"
    for m in spec.measures:
        if m.op == "avg":
            return f"{m.name}_cnt"
    raise ValueError(
        f"cube {spec.name}: retraction needs a count or avg measure to "
        "track cell multiplicity; add a count measure"
    )


def merge_cells(
    cells: DataFrame,
    deltas: DataFrame,
    spec: CubeSpec,
    *,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Merge signed cell deltas into the current cell table.

    Pure DataFrame plan: full-outer join on the dimension tuple
    (null-safe — dimensions may legitimately be null), partial
    addition, empty-cell eviction. This is the ``MERGE INTO`` of §4.3
    expressed without a transactional table format; swap in Delta's
    MERGE at deployment for in-place upsert.

    ``extra_keys`` joins additional key columns beyond the dims —
    lattice cubes pass ``(LEVEL_COL,)`` so each materialized level's
    cells merge independently (a coarse level's aggregated-away dims
    are NULL by construction; the level id disambiguates them from
    genuinely-NULL dim values).
    """
    from mongo_olap_spark.cube.query import upgrade_legacy_cells

    dims = [*spec.dim_names, *extra_keys]
    # pre-r15 snapshots lack the topk mass column; synthesize NULL so
    # the merge resolves — NULL + delta mass stays NULL ("unknown"),
    # which the certified serve refuses by name (query_cube __leg)
    c = upgrade_legacy_cells(cells, spec).alias("c")
    d = upgrade_legacy_cells(deltas, spec).alias("d")
    if dims:
        cond = reduce(
            lambda a, b: a & b,
            [F.col(f"c.{k}").eqNullSafe(F.col(f"d.{k}")) for k in dims],
        )
        joined = c.join(d, cond, "full_outer")
    else:
        joined = c.crossJoin(d)

    out = [F.coalesce(F.col(f"c.{k}"), F.col(f"d.{k}")).alias(k) for k in dims]
    dec0 = F.lit(0).cast(SUM_DECIMAL)
    for m in spec.measures:
        for col in m.storage_cols():
            cc, dc = F.col(f"c.{col}"), F.col(f"d.{col}")
            if col.endswith("_sum") or col.endswith("_sum2"):
                out.append((F.coalesce(cc, dec0) + F.coalesce(dc, dec0)).cast(SUM_DECIMAL).alias(col))
            elif col.endswith("_cnt"):
                out.append((F.coalesce(cc, F.lit(0)) + F.coalesce(dc, F.lit(0))).cast("long").alias(col))
            elif col.endswith("_min"):
                out.append(F.least(cc, dc).alias(col))  # least/greatest skip nulls
            elif col.endswith("_max"):
                out.append(F.greatest(cc, dc).alias(col))
            elif col.endswith("_hist"):
                # signed element-wise addition — exact retraction: a
                # delete's −1 bins cancel the insert's +1 bins, so
                # incremental apply is bit-identical to rebuild in any
                # batch order (integer vector addition is associative
                # and commutative)
                out.append(
                    F.when(cc.isNull(), dc)
                    .when(dc.isNull(), cc)
                    .otherwise(F.zip_with(cc, dc, lambda x, y: x + y))
                    .alias(col)
                )
            elif col.endswith("_tkn"):
                # topk mass partial: signed long addition — but a side
                # whose ROW is present (its {m}_tk map is non-null)
                # with a NULL mass is a LEGACY cell ("mass unknown",
                # upgrade_legacy_cells); propagate NULL so the merged
                # cube stays uncertifiable instead of minting a
                # definite-looking undercount. A side absent from the
                # full-outer join (map NULL too) contributes 0.
                tk_c, tk_d = F.col(f"c.{col[:-1]}"), F.col(f"d.{col[:-1]}")
                cm = F.when(tk_c.isNotNull() & cc.isNull(),
                            F.lit(None).cast("long")
                            ).otherwise(F.coalesce(cc, F.lit(0)))
                dm = F.when(tk_d.isNotNull() & dc.isNull(),
                            F.lit(None).cast("long")
                            ).otherwise(F.coalesce(dc, F.lit(0)))
                out.append((cm + dm).cast("long").alias(col))
            elif col.endswith("_tk"):
                # mergeable-summary union: per-item count sum, truncate
                # back to capacity (deterministic tie-break). Insert
                # deltas only — a delete touching a topk cube goes
                # through recompute_cells (spec._OPS: not retractable).
                from mongo_olap_spark.cube.query import topk_merge_expr

                out.append(
                    F.when(cc.isNull(), dc)
                    .when(dc.isNull(), cc)
                    .otherwise(topk_merge_expr(cc, dc, m.capacity))
                    .alias(col)
                )
            elif col.endswith("_hll"):
                # hll_union propagates NULL if either side is NULL
                # (verified), so coalesce the one-sided cases by hand.
                out.append(
                    F.when(cc.isNull(), dc)
                    .when(dc.isNull(), cc)
                    .otherwise(F.hll_union(cc, dc))
                    .alias(col)
                )
    merged = joined.select(*out)
    return merged.filter(F.col(row_count_col(spec)) > 0)


def affected_cells(spec: CubeSpec, deltas: DataFrame) -> DataFrame:
    """Distinct dimension tuples a delta batch touches."""
    return deltas.select(*spec.dim_names).distinct()


def recompute_cells(
    spec: CubeSpec, source: DataFrame, cells: DataFrame, touched: DataFrame
) -> DataFrame:
    """Exact repair for non-retractable measures: rebuild only the
    touched cells from the source and splice them over the cell table.

    Cost: one semi-join-pruned scan of the source restricted to the
    touched dimension tuples (partition-pruned when a time dim is the
    physical partition key), not a full rebuild.
    """
    from mongo_olap_spark.cube.build import cell_aggs

    dims = spec.dim_names
    pruned = source
    if spec.filter_sql:
        pruned = pruned.filter(spec.filter_sql)
    # materialize the cell key on each source row, keep touched cells
    # only — null-safe join conditions throughout (dimensions may
    # legitimately be null, exactly as merge_cells joins; plain
    # equality would drop null-dim source rows from the semi-join AND
    # keep the stale null-dim cell through the anti-join)
    pruned = pruned.withColumns({d.name: d.expr() for d in spec.dimensions})

    def null_safe_on(left: str, right: str):
        return reduce(
            lambda a, b: a & b,
            [F.col(f"{left}.{k}").eqNullSafe(F.col(f"{right}.{k}")) for k in dims],
        )

    t = F.broadcast(touched.alias("t"))
    pruned = pruned.alias("s").join(t, null_safe_on("s", "t"), "left_semi")
    rebuilt = pruned.groupBy(*dims).agg(*cell_aggs(spec))
    kept = cells.alias("c").join(t, null_safe_on("c", "t"), "left_anti")
    return kept.unionByName(rebuilt)
