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

from mongo_olap_spark.cube.spec import CubeSpec, Measure

#: unique token prefixing every in-plan topk exactness-certificate
#: raise_error message. Callers that catch the raise to select an
#: exact-source fallback (q_cube_topn) MUST match this token, not the
#: prose — an unrelated error whose message happens to mention "topk
#: measure" must propagate, not silently trigger a full source
#: recompute (optimization r17, VERDICT r16 item 5).
TOPK_CERT_SENTINEL = "[TOPK-CERT-E417]"


def hist_sum_expr(col: str, nbins: int) -> Column:
    """Roll histogram cells up to a group: element-wise sum of the
    bin vectors, expressed as nbins + 2 plain ``sum(element_at(...))``
    aggregates wrapped back into an array — JVM-side, map-side
    combined, O(groups · nbins) state, never a source rescan. One
    ``F.expr`` string, not per-bin Column calls (py4j plan-time cost —
    see build._hist_agg)."""
    elems = ", ".join(
        f"coalesce(sum(element_at(`{col}`, {i + 1})), 0L)" for i in range(nbins + 2)
    )
    return F.expr(f"array({elems})")


def hist_quantile_expr(hist: Column, q: float, m: Measure) -> Column:
    """Quantile estimate from a (rolled-up) histogram vector.

    Deterministic inverse-CDF with linear interpolation inside the
    target bin: find the first bin whose cumulative count reaches
    ``q · total`` (skipping empty bins), interpolate by the overshoot
    fraction. Underflow/overflow mass clamps to lo/hi — the sketch
    cannot resolve inside unbounded tails. NULL when the histogram is
    empty. Pure expression tree (aggregate/transform HOFs over a
    ~nbins-long array) — no UDF, O(nbins²) scalar ops per output row.
    """
    lo, hi, nb = float(m.lo), float(m.hi), int(m.nbins)
    if not (0.0 < q <= 1.0):
        raise ValueError(f"quantile q must be in (0, 1], got {q}")
    w = (hi - lo) / nb
    zero = F.lit(0).cast("long")
    total = F.aggregate(hist, zero, lambda a, x: a + x)
    target = F.lit(float(q)) * total.cast("double")
    # cums[i+1] = count of the first i bins (leading 0 ⇒ 1-based prev)
    cums = F.aggregate(
        hist,
        F.array(zero),
        lambda acc, x: F.concat(acc, F.array(F.element_at(acc, -1) + x)),
    )
    # first 1-based bin index whose cumulative reaches the target rank
    # and that actually holds mass (empty bins cannot contain the
    # quantile; minimality ⇒ prev cumulative < target, so frac ∈ (0, 1])
    flags = F.transform(
        F.sequence(F.lit(1), F.lit(nb + 2)),
        lambda i: (F.element_at(cums, (i + 1).cast("int")).cast("double") >= target)
        & (F.element_at(hist, i.cast("int")) > 0),
    )
    i = F.array_position(flags, F.lit(True))
    prev = F.element_at(cums, i.cast("int")).cast("double")
    cnt = F.element_at(hist, i.cast("int")).cast("double")
    left = F.lit(lo) + (i.cast("double") - 2.0) * F.lit(w)
    frac = F.greatest(F.lit(0.0), F.least(F.lit(1.0), (target - prev) / cnt))
    return (
        F.when(total <= 0, F.lit(None).cast("double"))
        .when(i == 0, F.lit(None).cast("double"))
        .when(i == 1, F.lit(lo))  # underflow mass → range edge
        .when(i == nb + 2, F.lit(hi))  # overflow mass → range edge
        .otherwise(left + F.lit(w) * frac)
    )


def topk_truncate_expr(m: Column, max_items: int) -> Column:
    """Cap a frequent-items map at ``max_items`` entries, evicting the
    smallest counts (ties broken by item asc — deterministic, so
    truncation is reproducible across merge orders). No-op (and no
    sort) when the map is already within capacity."""
    ent = F.array_sort(
        F.map_entries(m),
        lambda a, b: F.when(a["value"] > b["value"], -1)
        .when(a["value"] < b["value"], 1)
        .when(a["key"] < b["key"], -1)
        .when(a["key"] > b["key"], 1)
        .otherwise(0)
        .cast("int"),
    )
    return F.when(
        F.size(m) > max_items, F.map_from_entries(F.slice(ent, 1, max_items))
    ).otherwise(m)


def topk_merge_expr(a: Column, b: Column, max_items: int) -> Column:
    """Scalar merge of two frequent-items maps: per-item count sum
    (``map_zip_with`` — JVM-side, no UDF), then truncate back to
    capacity. This is the mergeable-summaries union (Agarwal et al.,
    PODS'12): associative up to truncation, exact while the union
    cardinality stays ≤ max_items."""
    zero = F.lit(0).cast("long")
    merged = F.map_zip_with(
        a, b, lambda k, x, y: F.coalesce(x, zero) + F.coalesce(y, zero)
    )
    return topk_truncate_expr(merged, max_items)


def topk_union_agg(col: str, max_items: int) -> Column:
    """Roll frequent-items cells up to a group: fold the per-cell maps
    with :func:`topk_merge_expr`. Expressed as ``collect_list`` (a
    partial-mergeable aggregate) + an ``aggregate`` HOF fold — all
    JVM-side. Per-group transient state is O(cells_in_group ·
    max_items) entries; for rollups where that product is large,
    prefer the exact two-level route (:func:`topk_rollup`), which
    streams through a window instead of folding per group."""
    lst = F.collect_list(col)
    merged = F.aggregate(
        F.slice(lst, F.lit(2), F.greatest(F.size(lst) - 1, F.lit(0))),
        F.element_at(lst, 1),
        lambda acc, mm: topk_merge_expr(acc, mm, max_items),
    )
    # collect_list skips NULL maps; an all-empty group folds to {}.
    # size(lst) == 0 (no cells at all) yields NULL — callers coalesce.
    return F.when(F.size(lst) == 0, F.lit(None)).otherwise(merged)


def topk_entries_expr(m_col: Column, k: int) -> Column:
    """Top-k entries of a frequent-items map as an ordered
    ``array<struct<item, count>>`` (count desc, item asc — the same
    deterministic order truncation uses)."""
    ent = F.array_sort(
        F.map_entries(m_col),
        lambda a, b: F.when(a["value"] > b["value"], -1)
        .when(a["value"] < b["value"], 1)
        .when(a["key"] < b["key"], -1)
        .when(a["key"] > b["key"], 1)
        .otherwise(0)
        .cast("int"),
    )
    return F.transform(
        F.slice(ent, 1, k),
        lambda e: F.struct(e["key"].alias("item"), e["value"].alias("count")),
    )


_DISPERSION_OPS = ("var_pop", "var_samp", "stddev_pop", "stddev_samp")


def dispersion_expr(op: str, s: Column, s2: Column, cnt: Column) -> Column:
    """Variance/stddev derived from (Σx, Σx², n) partials — the
    single-pass E[x²] − mean² form, clamped at 0 against floating
    cancellation. ``s``/``s2`` are DECIMAL partials (already summed for
    a rollup, or row-wise for a lattice finalize); every float step is
    a fixed IEEE expression, so an oracle mirroring the same formula
    over the same exact partials is bit-identical. Sample forms divide
    by n − 1 and are NULL for n < 2 (Mongo $stdDevSamp semantics); an
    all-null group yields NULL naturally (empty SUM is NULL)."""
    n = cnt.cast("double")
    sd = s.cast("double")
    s2d = s2.cast("double")
    mean = sd / n
    if op in ("var_pop", "stddev_pop"):
        # the n >= 1 gate is explicit because greatest() SKIPS nulls —
        # clamping an all-null group's NULL variance would turn it 0.0
        v = F.when(cnt < 1, F.lit(None).cast("double")).otherwise(
            F.greatest(s2d / n - mean * mean, F.lit(0.0))
        )
    else:
        v = F.when(cnt < 2, F.lit(None).cast("double")).otherwise(
            F.greatest((s2d - n * (mean * mean)) / (n - F.lit(1.0)), F.lit(0.0))
        )
    return F.sqrt(v) if op.startswith("stddev") else v


def dispersion_sql(op: str, name: str, *, rollup: bool = True) -> str:
    """The ANSI twin of :func:`dispersion_expr` over the same storage
    columns — mirrored operation-for-operation so DuckDB reproduces
    the exact IEEE result (used by oracle queries and tests)."""
    wrap = (lambda c: f"SUM({c})") if rollup else (lambda c: c)
    s = f"CAST({wrap(f'{name}_sum')} AS DOUBLE)"
    s2 = f"CAST({wrap(f'{name}_sum2')} AS DOUBLE)"
    n = f"CAST({wrap(f'{name}_cnt')} AS DOUBLE)"
    mean = f"({s} / {n})"
    if op in ("var_pop", "stddev_pop"):
        v = (
            f"CASE WHEN {n} < 1 THEN NULL ELSE "
            f"greatest({s2} / {n} - {mean} * {mean}, 0.0) END"
        )
    else:
        v = (
            f"CASE WHEN {n} < 2 THEN NULL ELSE "
            f"greatest(({s2} - {n} * ({mean} * {mean})) / ({n} - 1.0), 0.0) END"
        )
    return f"sqrt({v})" if op.startswith("stddev") else v


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
        elif m.op == "distinct":
            # union the cell sketches, estimate once per rollup group —
            # O(groups) KB-sized register merges, never a source rescan
            out.append(F.hll_sketch_estimate(F.hll_union_agg(f"{n}_hll")).alias(n))
        elif m.op == "quantile":
            # element-wise-sum the cell bin vectors, estimate once per
            # rollup group at the measure's declared quantile
            out.append(
                hist_quantile_expr(
                    hist_sum_expr(f"{n}_hist", int(m.nbins)), m.default_q, m
                ).alias(n)
            )
        elif m.op == "topk":
            # fold the cell maps, emit the measure's default top-k as
            # ordered (item, count) structs. NOTE: the fold truncates
            # to capacity at every merge step, so it is exact only
            # while the UNION cardinality stays <= max_items;
            # query_cube serves topk through the explode route instead
            # (exact whenever the CELLS are exact — the r14 sf10 gate
            # caught a wide rollup silently leaving the exact regime
            # here). This expression remains for partial regrouping
            # (cell-shaped outputs must stay bounded maps).
            out.append(
                topk_entries_expr(
                    topk_union_agg(f"{n}_tk", m.capacity), m.default_k
                ).alias(n)
            )
        elif m.op in _DISPERSION_OPS:
            out.append(
                dispersion_expr(
                    m.op, F.sum(f"{n}_sum"), F.sum(f"{n}_sum2"), F.sum(f"{n}_cnt")
                ).alias(n)
            )
    return out


def upgrade_legacy_cells(cells: DataFrame, spec: CubeSpec) -> DataFrame:
    """Resolve cell tables written before a storage column existed.

    The only storage column ever added after GA is the topk mass
    partial ``{m}_tkn`` (r15's exactness certificate). Snapshots
    persisted before it lack the column, so any plan that selects
    ``m.storage_cols()`` — the serve's certificate, IVM's merge,
    combine/hybrid regrouping — would die with an unresolved-column
    AnalysisException. Synthesize NULL instead: NULL is "mass
    unknown", which downstream treats as UNCERTIFIABLE (the certified
    serve refuses loudly, never silently passes) while the
    ``on_inexact='sketch'`` route and all non-topk measures keep
    working on legacy state unchanged. Any other missing storage
    column is a real schema mismatch and still fails naturally.
    """
    missing = [
        c
        for m in spec.measures
        if m.op == "topk"
        for c in m.storage_cols()
        if c.endswith("_tkn") and c not in cells.columns
    ]
    for c in missing:
        cells = cells.withColumn(c, F.lit(None).cast("long"))
    return cells


def query_cube(
    cells: DataFrame,
    spec: CubeSpec,
    group_by: list[str] | None = None,
    where: Column | str | None = None,
    measures: list[str] | None = None,
    on_inexact: str = "error",
) -> DataFrame:
    """Answer an aggregate query from cube cells.

    ``group_by`` must be a subset of the cube's dimensions; ``where``
    may reference dimension columns only (it filters *cells*). When
    ``group_by`` is None, all dims are kept (pure slice — still
    re-aggregated so the output carries measure columns, not partials).

    ``topk`` (frequent-items map) measures are served through the
    explode route — maps explode to postings, a hash aggregate sums
    per (group, item) with map-side combine, a windowed rank keeps k,
    and the ordered entries reassemble per group — NOT by folding the
    maps with mid-merge truncation. The fold is exact only while the
    union cardinality stays <= the measure's capacity; the explode
    route is exact whenever the CELLS are exact (per-cell cardinality
    <= capacity), a strictly larger regime, and it is merge-order
    deterministic. Scale: the fold holds O(cells_in_group * capacity)
    entries in ONE aggregation buffer per group (a skew hazard at 1000
    executors); the explode route shuffles the same mass as DISTRIBUTED
    rows and its rank filter compiles to a partial WindowGroupLimit.
    The r14 sf10 gate caught the fold undercounting a wide rollup
    (150k distinct users folded through a 65536-entry map).

    ``on_inexact`` (r15): the serve certifies the exact regime by MASS
    CONSERVATION — each topk cell stores the true non-null row mass
    (``{m}_tkn``, maintained by build/IVM alongside the map); the
    merged map's Σcounts must equal Σmass per group. The sf100 probe
    found the regime exit is not graceful truncation: a saturated
    ``approx_top_k`` (Datasketches frequent-items) PURGES and can
    return an EMPTY result — served silently, that is a wrong answer
    with no signal. Default ``'error'`` raises at execution naming the
    measure and the remedies (raise max_items; materialize the exact
    two-level ``topk_rollup`` cube — the route the router already
    uses for $topN; or opt into ``on_inexact='sketch'`` for the
    documented bounded-error serve).
    """
    if on_inexact not in ("error", "sketch"):
        raise ValueError(
            f"on_inexact must be 'error' or 'sketch', got {on_inexact!r}")
    dims = spec.dim_names
    group_by = dims if group_by is None else group_by
    unknown = set(group_by) - set(dims)
    if unknown:
        raise ValueError(f"group_by not in cube dims: {sorted(unknown)}")
    df = upgrade_legacy_cells(cells, spec)
    if where is not None:
        df = df.filter(where)
    req = spec.measures if measures is None else [spec.measure(x) for x in measures]
    topks = [m for m in req if m.op == "topk"]
    if not topks:
        return df.groupBy(*group_by).agg(*measure_rollup_exprs(spec, measures))

    from pyspark.sql import Window

    others = [m.name for m in req if m.op != "topk"]
    if others:
        base = df.groupBy(*group_by).agg(*measure_rollup_exprs(spec, others))
    else:
        # still one row per group: aggregate a throwaway count
        base = df.groupBy(*group_by).agg(F.count(F.lit(1)).alias("__g")) \
                 .drop("__g")
    for m in topks:
        col = f"{m.name}_tk"
        posts = df.select(*group_by, F.explode(col).alias("__i", "__c"))
        counted = posts.groupBy(*group_by, "__i").agg(
            F.sum("__c").cast("long").alias("__cnt"))
        part = [F.col(c) for c in group_by] if group_by else [F.lit(1)]
        w = Window.partitionBy(*part).orderBy(
            F.col("__cnt").desc(), F.col("__i").asc())
        ranked = (counted.withColumn("__r", F.row_number().over(w))
                  .filter(F.col("__r") <= m.default_k))
        arr = ranked.groupBy(*group_by).agg(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col("__r").alias("r"),
                             F.col("__i").alias("item"),
                             F.col("__cnt").alias("count")))),
                lambda e: F.struct(e["item"].alias("item"),
                                   e["count"].alias("count")),
            ).alias(m.name))
        if group_by:
            base = base.join(arr, list(group_by), "left")
        else:
            base = base.crossJoin(arr)
        # a group whose maps were all empty has no postings: surface
        # the same empty array the fold route emitted, not NULL
        base = base.withColumn(
            m.name,
            F.coalesce(F.col(m.name),
                       F.array().cast(arr.schema[m.name].dataType)))
        if on_inexact == "error":
            # mass conservation: the merged map's Σcounts must equal
            # the cells' true row mass, or the sketch purged somewhere
            # (exact-regime exit). Guard rides the measure column so
            # column pruning can never drop it.
            got = counted.groupBy(*group_by).agg(
                F.sum("__cnt").cast("long").alias(f"__got_{m.name}"))
            # __leg counts cells with a MAP but no mass — legacy
            # snapshots written before the r15 mass column
            # (upgrade_legacy_cells synthesizes NULL = "mass
            # unknown"). A group touching even one such cell is
            # UNCERTIFIABLE: its Σmass undercounts, so refuse by name
            # instead of reporting a bogus mass loss. The map-non-null
            # conjunct matters (same convention as combine_cells /
            # merge_cells): an evolve(add=topk) join-miss row written
            # by pre-fix code carries NULL map AND NULL mass — that is
            # an EMPTY group (no postings, zero mass), not a legacy
            # cell, and must serve an empty array rather than refuse.
            mass = F.col(f"{m.name}_tkn")
            tk_cell = F.col(f"{m.name}_tk")
            want = df.groupBy(*group_by).agg(
                F.sum(mass).cast("long").alias(f"__want_{m.name}"),
                F.sum(F.when(tk_cell.isNotNull() & mass.isNull(), 1)
                      .otherwise(0))
                .cast("long").alias(f"__leg_{m.name}"))
            if group_by:
                base = (base.join(got, list(group_by), "left")
                        .join(want, list(group_by), "left"))
            else:
                base = base.crossJoin(got).crossJoin(want)
            legacy = (F.coalesce(F.col(f"__leg_{m.name}"), F.lit(0))
                      > F.lit(0))
            mismatch = (F.coalesce(F.col(f"__got_{m.name}"), F.lit(0))
                        != F.coalesce(F.col(f"__want_{m.name}"), F.lit(0)))
            base = base.withColumn(
                m.name,
                F.when(legacy, F.raise_error(F.lit(
                    f"{TOPK_CERT_SENTINEL} topk measure {m.name!r}: "
                    f"cells written before "
                    f"the exactness certificate (no {m.name}_tkn mass "
                    f"column) cannot certify the exact regime. "
                    f"refresh()/rebuild the cube to mint the mass "
                    f"column, or pass on_inexact='sketch' for the "
                    f"documented bounded-error serve.")))
                .when(mismatch, F.raise_error(F.concat(
                    F.lit(f"{TOPK_CERT_SENTINEL} topk measure "
                          f"{m.name!r}: frequent-items "
                          f"map lost mass ("),
                    F.coalesce(F.col(f"__got_{m.name}"), F.lit(0)),
                    F.lit(" of "),
                    F.coalesce(F.col(f"__want_{m.name}"), F.lit(0)),
                    F.lit(f" rows) — a cell's cardinality exceeded "
                          f"max_items={m.capacity} and approx_top_k "
                          f"purged (it can return EMPTY, not merely "
                          f"truncated). Raise max_items, materialize "
                          f"the exact two-level topk_rollup cube, or "
                          f"pass on_inexact='sketch' for the "
                          f"bounded-error serve."))))
                .otherwise(F.col(m.name)))
            base = base.drop(f"__got_{m.name}", f"__want_{m.name}",
                             f"__leg_{m.name}")
    return base.select(*group_by, *[m.name for m in req])


def distinct_rollup(
    cells: DataFrame,
    spec: CubeSpec,
    group_by: list[str],
    distinct_dim: str,
    *,
    alias: str | None = None,
    where: Column | str | None = None,
    measures: list[str] | None = None,
) -> DataFrame:
    """EXACT count-distinct served from cube state — the two-level
    decomposition: a cube whose dimensions include the counted column
    (``distinct_dim``) holds one live cell per (group, value); the
    distinct count is the number of live cells per group.

    Unlike the HLL ``distinct`` measure (bounded state, approximate,
    insert-only-mergeable), this is exact AND fully retractable: the
    signed count partial evicts a cell when its multiplicity hits 0,
    so deletes maintain incrementally with no rescan. The trade is
    state size — O(Σ per-group cardinality) cells instead of O(groups)
    sketches; choose by cardinality (USAGE.md).

    Scale: the rollup scans O(|cells|) and shuffles O(|groups|) —
    cells are already one-per-(group, value), so ``count(*)`` needs no
    distinct aggregation and no Expand.
    """
    dims = spec.dim_names
    if distinct_dim not in dims:
        raise ValueError(f"distinct_dim {distinct_dim!r} not a cube dimension")
    unknown = set(group_by) - set(dims)
    if unknown:
        raise ValueError(f"group_by not in cube dims: {sorted(unknown)}")
    if distinct_dim in group_by:
        raise ValueError(f"distinct_dim {distinct_dim!r} cannot also be grouped")
    df = cells
    if where is not None:
        df = df.filter(where)
    out = alias or f"{distinct_dim}_distinct"
    # NULL never counts toward COUNT(DISTINCT col) in SQL/Mongo alike
    if set(group_by) | {distinct_dim} == set(dims):
        # cells are exactly one per (group, value): a plain count, no
        # distinct aggregation, no Expand
        agg = F.count(F.when(F.col(distinct_dim).isNotNull(), 1)).cast("long").alias(out)
    else:
        # extra dims remain (e.g. a day dim): the same value owns one
        # cell per extra-dim combination — dedupe over the cell table
        # (still O(|cells|), far smaller than the source)
        agg = F.countDistinct(distinct_dim).cast("long").alias(out)
    # other measures roll up in the SAME aggregate — one shuffle total
    extra = measure_rollup_exprs(spec, measures) if measures else []
    return df.groupBy(*group_by).agg(agg, *extra)


def quantile_estimates(
    cells: DataFrame,
    spec: CubeSpec,
    measure: str,
    qs: list[float],
    group_by: list[str] | None = None,
    *,
    where: Column | str | None = None,
    aliases: list[str] | None = None,
) -> DataFrame:
    """Several quantiles of ONE histogram measure in one rollup — the
    whole point of storing the distribution rather than a scalar: the
    same ~nbins-long vector answers any q at query time. One shuffle
    (the rollup), then N estimator expressions over the rolled vector;
    no extra state, no extra pass per quantile."""
    m = spec.measure(measure)
    if m.op != "quantile":
        raise ValueError(f"measure {measure!r} is not a quantile (histogram) measure")
    dims = spec.dim_names
    group_by = dims if group_by is None else group_by
    unknown = set(group_by) - set(dims)
    if unknown:
        raise ValueError(f"group_by not in cube dims: {sorted(unknown)}")
    if aliases is None:
        aliases = [f"{m.name}_q{str(q).replace('.', '_')}" for q in qs]
    if len(aliases) != len(qs):
        raise ValueError("aliases must match qs")
    df = cells
    if where is not None:
        df = df.filter(where)
    rolled = df.groupBy(*group_by).agg(
        hist_sum_expr(f"{m.name}_hist", int(m.nbins)).alias("__h")
    )
    return rolled.select(
        *group_by,
        *[
            hist_quantile_expr(F.col("__h"), float(q), m).alias(a)
            for q, a in zip(qs, aliases)
        ],
    )


def quantile_rollup(
    cells: DataFrame,
    spec: CubeSpec,
    group_by: list[str],
    value_dim: str,
    q: float | list[float] | tuple[float, ...],
    *,
    alias: str | None = None,
    where: Column | str | None = None,
) -> DataFrame:
    """EXACT quantile served from cube state — the two-level
    decomposition (the quantile twin of :func:`distinct_rollup`): a
    cube whose dimensions include the measured column holds one live
    cell per (group, value) with a count partial; the discrete
    (type-1, inverse empirical CDF) quantile is the smallest value
    whose cumulative multiplicity reaches ``ceil(q · total)``.

    Exact AND fully retractable (count partials evict cells at
    multiplicity 0). The trade vs the histogram ``quantile`` measure is
    state size — O(Σ per-group cardinality) cells instead of a fixed
    bin vector; choose by cardinality, same decision as exact-vs-HLL
    distinct (USAGE.md). NULL values never participate, matching SQL
    percentile semantics.

    Scale: one window pass over O(|cells|) (already one row per
    (group, value) — no source rescan, no Expand) plus one final agg
    shuffling O(|groups|).

    ``q`` may also be a LIST of quantile fractions (r10, the Mongo
    ``$percentile`` multi-p shape): the output column is then an
    ARRAY of the type-1 quantiles in the given p order, computed from
    the SAME single window pass — each extra p adds one conditional
    ``min`` to the final aggregate, not a pass or a shuffle.
    """
    from pyspark.sql import Window

    from mongo_olap_spark.cube.ivm import row_count_col

    qs = list(q) if isinstance(q, (list, tuple)) else None
    if qs is not None:
        if not qs:
            raise ValueError("quantile q list must be non-empty")
        for x in qs:
            if not (0.0 < float(x) <= 1.0):
                raise ValueError(f"quantile q must be in (0, 1], got {x}")
    elif not (0.0 < q <= 1.0):
        raise ValueError(f"quantile q must be in (0, 1], got {q}")
    dims = spec.dim_names
    if value_dim not in dims:
        raise ValueError(f"value_dim {value_dim!r} not a cube dimension")
    unknown = set(group_by) - set(dims)
    if unknown:
        raise ValueError(f"group_by not in cube dims: {sorted(unknown)}")
    if value_dim in group_by:
        raise ValueError(f"value_dim {value_dim!r} cannot also be grouped")
    if set(group_by) | {value_dim} != set(dims):
        raise ValueError(
            "exact quantile needs cells keyed exactly by group_by + value_dim "
            f"(extra dims would double-count multiplicities): cube has {dims}"
        )
    df = cells
    if where is not None:
        df = df.filter(where)
    cnt = row_count_col(spec)
    df = df.filter(F.col(value_dim).isNotNull())
    wcum = Window.partitionBy(*group_by).orderBy(value_dim)
    wtot = Window.partitionBy(*group_by)
    if qs is not None:
        out = alias or f"{value_dim}_percentile"
        ranked = df.withColumn("__cum", F.sum(cnt).over(wcum)).withColumn(
            "__tot", F.sum(cnt).over(wtot))
        # one conditional min per p over the same windowed frame —
        # the same rank snap as the scalar path (ADVICE r9)
        picks = [
            F.min(
                F.when(
                    F.col("__cum")
                    >= F.ceil(F.round(F.lit(float(x)) * F.col("__tot"), 9)),
                    F.col(value_dim),
                )
            ).alias(f"__q{i}")
            for i, x in enumerate(qs)
        ]
        return (
            ranked.groupBy(*group_by)
            .agg(*picks)
            .select(
                *group_by,
                F.array(*[F.col(f"__q{i}") for i in range(len(qs))]).alias(out),
            )
        )
    out = alias or f"{value_dim}_q{str(q).replace('.', '_')}"
    return (
        df.withColumn("__cum", F.sum(cnt).over(wcum))
        .withColumn("__tot", F.sum(cnt).over(wtot))
        # snap near-integer q·n products before ceil (ADVICE r9): IEEE
        # doubles put e.g. 0.7*10 at 7.000000000000001, which would
        # ceil to rank 8 instead of the stated ceil(q·n)=7 — round to 9
        # digits first (quantile fractions are never finer than that)
        .filter(F.col("__cum") >= F.ceil(F.round(F.lit(float(q)) * F.col("__tot"), 9)))
        .groupBy(*group_by)
        .agg(F.min(value_dim).alias(out))
    )


def dispersion_estimates(
    cells: DataFrame,
    spec: CubeSpec,
    measure: str,
    ops: list[str],
    group_by: list[str] | None = None,
    *,
    where: Column | str | None = None,
    aliases: list[str] | None = None,
    measures: list[str] | None = None,
) -> DataFrame:
    """Several dispersion forms (var_pop/var_samp/stddev_pop/
    stddev_samp) of ONE measure in one rollup — the point of storing
    decomposed (Σx, Σx², n) partials: the same three columns answer
    every form at query time. One shuffle; other measures roll up in
    the SAME aggregate."""
    m = spec.measure(measure)
    if m.op not in _DISPERSION_OPS:
        raise ValueError(f"measure {measure!r} is not a dispersion measure")
    bad = [o for o in ops if o not in _DISPERSION_OPS]
    if bad:
        raise ValueError(f"unknown dispersion ops: {bad}")
    dims = spec.dim_names
    group_by = dims if group_by is None else group_by
    unknown = set(group_by) - set(dims)
    if unknown:
        raise ValueError(f"group_by not in cube dims: {sorted(unknown)}")
    if aliases is None:
        aliases = [f"{m.name}_{o}" for o in ops]
    if len(aliases) != len(ops):
        raise ValueError("aliases must match ops")
    df = cells
    if where is not None:
        df = df.filter(where)
    n = m.name
    extra = measure_rollup_exprs(spec, measures) if measures else []
    return df.groupBy(*group_by).agg(
        *[
            dispersion_expr(
                o, F.sum(f"{n}_sum"), F.sum(f"{n}_sum2"), F.sum(f"{n}_cnt")
            ).alias(a)
            for o, a in zip(ops, aliases)
        ],
        *extra,
    )


def topk_estimates(
    cells: DataFrame,
    spec: CubeSpec,
    measure: str,
    k: int | None = None,
    group_by: list[str] | None = None,
    *,
    where: Column | str | None = None,
    alias: str | None = None,
) -> DataFrame:
    """Top-k from a frequent-items MAP measure via explode + re-count —
    the scale path for WIDE rollups, where the agg-expression route
    (:func:`topk_union_agg`, used by query_cube) folds
    O(cells_in_group · max_items) transient state per group. Here the
    maps explode to postings rows, a hash aggregate sums per (group,
    item) with map-side combine, and a windowed rank keeps k — the
    rank filter compiles to a partial WindowGroupLimit, so the second
    exchange carries O(groups · k). Two shuffles, every operator
    native, no per-group fold.

    Same answer as the fold route while merges stay in the exact
    regime (union cardinality ≤ max_items); in the truncated regime
    the two routes differ only in which tail items survive — heavy
    items agree within the mergeable-summary bound. Emits one row per
    (group, kept item): group dims + ``alias`` item + ``<alias>_cnt``
    + 1-based ``rank`` (count desc, item asc — the family's
    deterministic order).
    """
    from pyspark.sql import Window

    m = spec.measure(measure)
    if m.op != "topk":
        raise ValueError(f"measure {measure!r} is not a topk (map) measure")
    k = m.default_k if k is None else int(k)
    if k < 1:
        raise ValueError(f"top-k needs k >= 1, got {k}")
    dims = spec.dim_names
    group_by = dims if group_by is None else group_by
    unknown = set(group_by) - set(dims)
    if unknown:
        raise ValueError(f"group_by not in cube dims: {sorted(unknown)}")
    df = cells
    if where is not None:
        df = df.filter(where)
    out = alias or f"{m.name}_item"
    posts = df.select(
        *group_by, F.explode(f"{m.name}_tk").alias(out, "__c")
    )
    counted = posts.groupBy(*group_by, out).agg(
        F.sum("__c").cast("long").alias(f"{out}_cnt")
    )
    w = Window.partitionBy(*group_by).orderBy(
        F.col(f"{out}_cnt").desc(), F.col(out).asc()
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def topk_rollup(
    cells: DataFrame,
    spec: CubeSpec,
    group_by: list[str],
    value_dim: str,
    k: int,
    *,
    alias: str | None = None,
    count_alias: str | None = None,
    rank_alias: str = "rank",
    where: Column | str | None = None,
) -> DataFrame:
    """EXACT top-k most frequent values served from cube state — the
    two-level decomposition (the heavy-hitters twin of
    :func:`distinct_rollup`): a cube whose dimensions include the
    ranked column holds one live cell per (group, value) with a count
    partial; the top-k is a windowed rank over those cells.

    Exact AND fully retractable (count partials evict cells at
    multiplicity 0 — unlike the ``topk`` map measure, whose truncation
    forfeits retraction). The trade is state size — O(Σ per-group
    cardinality) cells instead of a bounded map; choose by cardinality,
    the same decision as exact-vs-HLL distinct (USAGE.md).

    Ties break deterministically: count desc, value asc — the same
    order the sketch route's ``topk_entries_expr`` emits.

    Output: one row per (group, kept value): group dims + the value
    (``alias``, default the dim name) + its count (``count_alias``) +
    its 1-based ``rank``. NULL values never rank (SQL COUNT semantics).

    Scale: when cells are keyed exactly by group_by + value_dim, the
    rank-filter compiles to WindowGroupLimit — each partition keeps
    only its local top-k before the shuffle, so the exchange carries
    O(groups · k), not O(cells). Extra dims re-aggregate first (one
    extra shuffle over O(|cells|), still never a source rescan).
    """
    from pyspark.sql import Window

    from mongo_olap_spark.cube.ivm import row_count_col

    if int(k) < 1:
        raise ValueError(f"top-k needs k >= 1, got {k}")
    dims = spec.dim_names
    if value_dim not in dims:
        raise ValueError(f"value_dim {value_dim!r} not a cube dimension")
    unknown = set(group_by) - set(dims)
    if unknown:
        raise ValueError(f"group_by not in cube dims: {sorted(unknown)}")
    if value_dim in group_by:
        raise ValueError(f"value_dim {value_dim!r} cannot also be grouped")
    df = cells
    if where is not None:
        df = df.filter(where)
    df = df.filter(F.col(value_dim).isNotNull())
    cnt = row_count_col(spec)
    out_v = alias or value_dim
    out_c = count_alias or f"{out_v}_cnt"
    if set(group_by) | {value_dim} == set(dims):
        # cells are exactly one per (group, value): rank directly
        ranked = df.select(*group_by, F.col(value_dim).alias(out_v), F.col(cnt).cast("long").alias(out_c))
    else:
        # extra dims remain: sum multiplicities over them first (still
        # O(|cells|), far smaller than the source)
        ranked = (
            df.groupBy(*group_by, F.col(value_dim).alias(out_v))
            .agg(F.sum(cnt).cast("long").alias(out_c))
        )
    w = Window.partitionBy(*group_by).orderBy(F.col(out_c).desc(), F.col(out_v).asc())
    return (
        ranked.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= int(k))
    )


def extremes_rollup(
    cells: DataFrame,
    spec: CubeSpec,
    group_by: list[str],
    value_dim: str,
    k: int,
    *,
    largest: bool = False,
    alias: str | None = None,
    where: Column | str | None = None,
) -> DataFrame:
    """EXACT k smallest/largest values per group served from cube
    state — Mongo ``$minN``/``$maxN`` accumulator parity (C23), the
    order-statistics sibling of :func:`topk_rollup`: a cube whose
    dimensions include the measured column holds one live cell per
    (group, value) with a count partial; the k extreme VALUES (with
    duplicates, exactly as $minN/$maxN return them) expand from the
    ≤ k boundary cells.

    Exact AND fully retractable (count partials evict cells at
    multiplicity 0 — unlike raw min/max measures, which need the
    repair path: the runner-up is always live here). NULL values never
    participate (Mongo skips missing/null in $minN/$maxN).

    Output: one row per group with ``alias`` = an ordered
    ``array<value>`` of length ≤ k (ascending for min-N, descending
    for max-N).

    Scale: the cum-count cutoff compiles through a window over
    O(|cells|) rows (already one per (group, value)); only the ≤ k
    qualifying cells per group reach the final aggregate, whose
    ``collect_list`` is therefore bounded at k structs per group —
    never a source rescan, never an unbounded list.
    """
    from pyspark.sql import Window

    from mongo_olap_spark.cube.ivm import row_count_col

    if int(k) < 1:
        raise ValueError(f"extremes need k >= 1, got {k}")
    dims = spec.dim_names
    if value_dim not in dims:
        raise ValueError(f"value_dim {value_dim!r} not a cube dimension")
    unknown = set(group_by) - set(dims)
    if unknown:
        raise ValueError(f"group_by not in cube dims: {sorted(unknown)}")
    if value_dim in group_by:
        raise ValueError(f"value_dim {value_dim!r} cannot also be grouped")
    df = cells
    if where is not None:
        df = df.filter(where)
    df = df.filter(F.col(value_dim).isNotNull())
    cnt = row_count_col(spec)
    out = alias or (f"{value_dim}_max{k}" if largest else f"{value_dim}_min{k}")
    if set(group_by) | {value_dim} != set(dims):
        # extra dims remain: one value owns several cells — re-aggregate
        # multiplicities first (still O(|cells|))
        df = df.groupBy(*group_by, value_dim).agg(F.sum(cnt).alias("__m"))
        mcol = "__m"
    else:
        mcol = cnt
    order = F.col(value_dim).desc() if largest else F.col(value_dim).asc()
    w = Window.partitionBy(*group_by).orderBy(order)
    df = (
        df.withColumn("__cum", F.sum(mcol).over(w))
        .withColumn("__take", F.least(F.col(mcol).cast("long"), F.lit(int(k)) - (F.col("__cum") - F.col(mcol))).cast("int"))
        .filter(F.col("__take") > 0)
    )
    # ≤ k qualifying cells per group: the collect_list is bounded at k
    structs = F.collect_list(F.struct(F.col(value_dim).alias("v"), F.col("__take").alias("t")))
    sorted_structs = F.array_sort(
        structs,
        lambda a, b: F.when(a["v"] < b["v"], -1 if not largest else 1)
        .when(a["v"] > b["v"], 1 if not largest else -1)
        .otherwise(0)
        .cast("int"),
    )
    flat = F.aggregate(
        sorted_structs,
        F.expr(f"CAST(array() AS ARRAY<{cells.schema[value_dim].dataType.simpleString()}>)"),
        lambda acc, s: F.concat(acc, F.array_repeat(s["v"], s["t"])),
    )
    return df.groupBy(*group_by).agg(flat.alias(out))


def top_by_rollup(
    cells: DataFrame,
    spec: CubeSpec,
    group_by: list[str],
    sort_dim: str,
    payload_dim: str,
    k: int,
    *,
    largest: bool = False,
    present_desc: bool = False,
    alias: str | None = None,
    where: Column | str | None = None,
) -> DataFrame:
    """EXACT ``$topN``/``$bottomN`` (Mongo 5.2 ordered accumulators
    with ``sortBy`` + ``output``) served from cube state — C24, the
    payload-carrying sibling of :func:`extremes_rollup`: a cube whose
    dimensions include BOTH the sort column and the output column
    holds one live cell per (group, sort value, payload) with a count
    partial; the k first/last payloads expand from the ≤ k boundary
    cells, ordered by (sort value, payload) — ties on the sort key
    break by payload ascending, a DETERMINISTIC refinement of Mongo's
    unstable document order (documented delta; Mongo itself warns
    $topN ties are unspecified without a tiebreak field).

    Exact AND fully retractable (count partials evict cells at
    multiplicity 0). NULL sort values never participate (Mongo sorts
    missing first — the engine's SQL-facing policy is to skip them,
    same as extremes/quantile; filter nulls into a sentinel upstream
    if Mongo's null-first order is wanted). NULL payloads DO
    participate (a null output field is a legitimate $topN result).

    Output: one row per group with ``alias`` = array of up to k
    payloads presented in sortBy order — matching Mongo, whose $topN
    returns the first k and $bottomN the LAST k, each presented in
    sortBy order (ADVICE r9: previously largest=True emitted the
    array descending, an ordering delta vs Mongo). ``largest``
    selects which END of the sort the k cells come from;
    ``present_desc`` presents the array in DESCENDING sort order —
    the shape of a Mongo desc sortBy ($topN desc = largest=True +
    present_desc; $bottomN desc = largest=False + present_desc).
    Within a sort-key tie the selection preference and presentation
    both mirror the pipeline compiler's deterministic refinement
    (first-k takes smaller payloads first, last-k larger; ties always
    PRESENT payload-ascending, nulls first), so routed and compiled
    answers agree bit-for-bit, not just up to Mongo's unspecified tie
    order.

    Scale: same shape as extremes_rollup — window cum-count over
    O(|cells|), ≤ k boundary cells per group reach the bounded final
    collect.
    """
    from pyspark.sql import Window

    from mongo_olap_spark.cube.ivm import row_count_col

    if int(k) < 1:
        raise ValueError(f"top_by needs k >= 1, got {k}")
    dims = spec.dim_names
    for c, what in ((sort_dim, "sort_dim"), (payload_dim, "payload_dim")):
        if c not in dims:
            raise ValueError(f"{what} {c!r} not a cube dimension")
        if c in group_by:
            raise ValueError(f"{what} {c!r} cannot also be grouped")
    if sort_dim == payload_dim:
        raise ValueError("sort_dim and payload_dim must differ (use extremes_rollup)")
    unknown = set(group_by) - set(dims)
    if unknown:
        raise ValueError(f"group_by not in cube dims: {sorted(unknown)}")
    df = cells
    if where is not None:
        df = df.filter(where)
    df = df.filter(F.col(sort_dim).isNotNull())
    cnt = row_count_col(spec)
    out = alias or f"{payload_dim}_{'top' if largest else 'bottom'}{k}"
    if set(group_by) | {sort_dim, payload_dim} != set(dims):
        df = df.groupBy(*group_by, sort_dim, payload_dim).agg(F.sum(cnt).alias("__m"))
        mcol = "__m"
    else:
        mcol = cnt
    # the window (selection) order: sort end by `largest`; the payload
    # tie-break direction mirrors how the compile path's struct sort
    # reaches the same boundary cells — first-k slices prefer SMALLER
    # payloads within a tie, last-k slices LARGER ones. With the
    # presentation key below this makes routed == compiled exactly.
    s_order = F.col(sort_dim).desc() if largest else F.col(sort_dim).asc()
    if largest == present_desc:
        p_order = F.col(payload_dim).asc_nulls_first()
    else:
        p_order = F.col(payload_dim).desc_nulls_last()
    w = Window.partitionBy(*group_by).orderBy(s_order, p_order)
    df = (
        df.withColumn("__cum", F.sum(mcol).over(w))
        .withColumn(
            "__take",
            F.least(
                F.col(mcol).cast("long"), F.lit(int(k)) - (F.col("__cum") - F.col(mcol))
            ).cast("int"),
        )
        .filter(F.col("__take") > 0)
    )
    # presentation comparator (-1 when a sorts BEFORE b): sort key
    # follows sortBy direction (``present_desc``); payload ties always
    # present ascending with nulls first — the same deterministic
    # refinement as the compile path's struct sort.
    s_lt = 1 if present_desc else -1
    structs = F.collect_list(
        F.struct(
            F.col(sort_dim).alias("s"),
            F.col(payload_dim).alias("p"),
            F.col("__take").alias("t"),
        )
    )

    def _cmp(a, b):
        pa, pb = a["p"], b["p"]
        return (
            F.when(a["s"] < b["s"], s_lt)
            .when(a["s"] > b["s"], -s_lt)
            .when(pa.isNull() & pb.isNull(), 0)
            .when(pa.isNull(), -1)
            .when(pb.isNull(), 1)
            .when(pa < pb, -1)
            .when(pa > pb, 1)
            .otherwise(0)
            .cast("int")
        )

    sorted_structs = F.array_sort(structs, _cmp)
    flat = F.aggregate(
        sorted_structs,
        F.expr(
            f"CAST(array() AS ARRAY<{cells.schema[payload_dim].dataType.simpleString()}>)"
        ),
        lambda acc, s: F.concat(acc, F.array_repeat(s["p"], s["t"])),
    )
    return df.groupBy(*group_by).agg(flat.alias(out))


def combine_cells(spec: CubeSpec, *frames: DataFrame) -> DataFrame:
    """Merge several cell tables of the SAME spec into one valid cell
    table — second-level partial merges keyed on the dimension tuple,
    producing STORAGE columns again (not finalized measures).

    This is the serving-side complement of ivm.merge_cells (which is
    join-based and signed, for CDC): here a plain union + one hash
    aggregate re-merges overlapping cells, so the result feeds ANY
    consumer that expects a cell table — including the exact two-level
    routes (distinct_rollup / quantile_rollup / topk_rollup /
    extremes_rollup / top_by_rollup), whose semantics require ONE live
    cell per (group, value) and would double-count under a naive
    union. Lambda serving for those routes is therefore::

        fresh = combine_cells(spec, cells, build_cube(spark, spec, tail))
        distinct_rollup(fresh, spec, ...)

    One shuffle on the dims; every merge expression is the same
    re-aggregable partial the builder emits (decimal sums, min/max,
    hll_union_agg, element-wise histogram sums, frequent-items fold),
    so the combined table is bit-compatible with a from-scratch build
    for the retractable families and merge-equal for the sketches.
    """
    if not frames:
        raise ValueError("combine_cells needs at least one frame")
    cols = spec.dim_names + [c for m in spec.measures for c in m.storage_cols()]
    up = [upgrade_legacy_cells(f, spec) for f in frames]
    df = up[0].select(*cols)
    for f in up[1:]:
        df = df.unionByName(f.select(*cols))
    aggs: list[Column] = []
    for m in spec.measures:
        for col in m.storage_cols():
            if col.endswith("_sum") or col.endswith("_sum2"):
                aggs.append(F.sum(col).alias(col))
            elif col.endswith("_cnt"):
                aggs.append(F.sum(col).cast("long").alias(col))
            elif col.endswith("_min"):
                aggs.append(F.min(col).alias(col))
            elif col.endswith("_max"):
                aggs.append(F.max(col).alias(col))
            elif col.endswith("_hll"):
                aggs.append(F.hll_union_agg(col).alias(col))
            elif col.endswith("_hist"):
                aggs.append(hist_sum_expr(col, int(m.nbins)).alias(col))
            elif col.endswith("_tkn"):
                # a legacy cell (row present — non-null {m}_tk map —
                # but NULL mass) poisons the group's mass to NULL
                # ("unknown") instead of letting F.sum skip it and
                # mint a definite-looking undercount
                leg = F.when(F.col(col[:-1]).isNotNull()
                             & F.col(col).isNull(), 1).otherwise(0)
                aggs.append(
                    F.when(F.sum(leg) > 0, F.lit(None).cast("long"))
                    .otherwise(F.sum(col).cast("long")).alias(col))
            elif col.endswith("_tk"):
                # the fold truncates at each merge step; single-map
                # groups are already within capacity by construction
                aggs.append(topk_union_agg(col, m.capacity).alias(col))
            else:
                raise AssertionError(col)
    return df.groupBy(*spec.dim_names).agg(*aggs)


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
    combined = (upgrade_legacy_cells(cells, spec).select(*cols)
                .unionByName(tail_cells.select(*cols)))
    return query_cube(combined, spec, group_by=group_by, measures=measures)
