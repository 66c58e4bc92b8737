"""Workload-driven cube advisor: which cubes should exist?

The reference domain is config-driven — an operator writes cube
definitions by hand and hopes they match the query traffic. This
module closes that loop: given a *workload* (aggregate requests with
weights — e.g. frequencies from a query log), it recommends the cube
set that maximizes routed benefit under a cell-count budget.

This is the classic materialized-view-selection problem on the
aggregation lattice; the algorithm is the greedy of Harinarayan,
Rajaraman & Ullman, "Implementing Data Cubes Efficiently" (SIGMOD'96):
pick, one at a time, the candidate view with the best
benefit-per-unit-state, where a query's cost is the size of the
smallest selected view that can answer it (else the source). The
greedy is within (1 − 1/e) ≈ 63% of optimal benefit — good enough
that nobody runs the exponential exact search.

Candidate views are the workload's own signatures plus their merges
(pairwise and the per-(source, filter) union): a merged cube carries
the union of dimensions at the finest requested time granularity and
the union of measures, so one state answers several queries — the
trade the greedy weighs against its larger cell count.

Cell counts are *estimated* in ONE Spark job per source: every
candidate's `approx_count_distinct(struct(dims))` is computed in a
single pass (HLL±5% per candidate, all map-side). At 100 TB pass
`sample_fraction` to bound the scan; estimates stay useful because
only the *relative* sizes drive the greedy.

Routing compatibility is exact, not estimated: a candidate serves a
query iff the real `CubeRouter` serving test says so — the advisor
can never recommend a cube the router would then refuse to use
(guarded by test).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_olap_spark.cube.spec import _GRANULARITIES, CubeSpec, Dimension, Measure
from mongo_olap_spark.plans.router import AggregateRequest

_GRAN_ORDER = {g: i for i, g in enumerate(_GRANULARITIES)}  # later = finer


@dataclass(frozen=True)
class WorkloadQuery:
    """One workload entry: an aggregate request + its weight (query
    frequency / importance — the unit the greedy maximizes)."""

    request: AggregateRequest
    weight: float = 1.0


@dataclass
class Advice:
    """Advisor output: the recommended specs, where each workload query
    routes (query index → cube name, None = source scan), estimated
    cells per recommended cube, and the covered share of total weight."""

    cubes: list[CubeSpec]
    assignment: dict[int, str | None]
    est_cells: dict[str, int]
    covered_weight: float
    total_weight: float

    @property
    def coverage(self) -> float:
        return self.covered_weight / self.total_weight if self.total_weight else 1.0


def _slug(s: str) -> str:
    out = re.sub(r"[^A-Za-z0-9_]+", "_", s).strip("_") or "x"
    return out if out[0].isalpha() or out[0] == "_" else f"c_{out}"


# -- signatures -------------------------------------------------------------

@dataclass(frozen=True)
class _Sig:
    """Canonical cube shape: dims as {path: granularity|None} with the
    finest granularity per time path, measures as {(op, path)}."""

    source: str
    filter_sql: str | None
    dims: frozenset  # of (path, granularity|None)
    measures: frozenset  # of (op, path|None)


def _signature(req: AggregateRequest) -> _Sig:
    dims: dict[str, str | None] = {}
    for g in req.group_by:
        path, gran = g if isinstance(g, tuple) else (g, None)
        cur = dims.get(path, "absent")
        if cur == "absent":
            dims[path] = gran
        elif cur is None or gran is None:
            dims[path] = None  # raw value requested somewhere: keep raw
        elif _GRAN_ORDER[gran] > _GRAN_ORDER[cur]:
            dims[path] = gran  # keep the finest bucket
    meas = set()
    for m in req.measures:
        if isinstance(m, str):
            raise ValueError(
                f"advisor needs (name, op[, path]) measures, got bare name {m!r} "
                "— a name alone doesn't determine the accumulator to materialize"
            )
        name, op, *rest = m
        meas.add((op, rest[0] if rest else None))
    return _Sig(req.source, req.filter_sql or None, frozenset(dims.items()), frozenset(meas))


def _merge(a: _Sig, b: _Sig) -> _Sig:
    """Union of two signatures of the same (source, filter) group —
    finest granularity wins per path; raw beats bucketed."""
    assert (a.source, a.filter_sql) == (b.source, b.filter_sql)
    dims: dict[str, str | None] = dict(a.dims)
    for path, gran in b.dims:
        if path not in dims:
            dims[path] = gran
        elif dims[path] is None or gran is None:
            dims[path] = None
        elif _GRAN_ORDER[gran] > _GRAN_ORDER[dims[path]]:
            dims[path] = gran
    return _Sig(a.source, a.filter_sql, frozenset(dims.items()), a.measures | b.measures)


def _sig_to_spec(sig: _Sig, name: str) -> CubeSpec:
    dims, seen = [], set()
    for path, gran in sorted(sig.dims, key=lambda x: (x[0], x[1] or "")):
        dn = _slug(path) if gran is None else f"{_slug(path)}_{gran}"
        while dn in seen:
            dn += "_"
        seen.add(dn)
        dims.append(Dimension(dn, path=path, granularity=gran))
    meas = []
    for op, path in sorted(sig.measures, key=lambda x: (x[0], x[1] or "")):
        mn = f"{op}_docs" if path is None else f"{op}_{_slug(path)}"
        while mn in seen:
            mn += "_"
        seen.add(mn)
        meas.append(Measure(mn, op, path))
    if not meas:
        # a groupBy with no accumulators (pure distinct): a count
        # measure costs nothing extra and keeps the spec/IVM invariants
        # (row multiplicity tracking) intact
        meas.append(Measure("count_docs", "count"))
    return CubeSpec(
        name=name, source=sig.source, filter_sql=sig.filter_sql,
        dimensions=tuple(dims), measures=tuple(meas),
    )


# -- cell estimation --------------------------------------------------------

def estimate_cells(
    source: DataFrame,
    specs: list[CubeSpec],
    *,
    sample_fraction: float | None = None,
    rsd: float = 0.05,
) -> list[int]:
    """Estimated cell count for every spec over one source, in ONE
    aggregation job: per-spec ``approx_count_distinct(struct(dims))``
    (HLL, map-side combined — a single scan however many specs).

    Specs with a pre-aggregation filter count over the filtered rows
    via a conditional struct (NULL rows don't feed the sketch), so the
    one job still covers mixed-filter candidates.
    """
    if not specs:
        return []
    df = source
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=7)
    aggs = []
    for i, s in enumerate(specs):
        tup = F.struct(*[d.expr() for d in s.dimensions]) if s.dimensions else F.lit(1)
        if s.filter_sql:
            tup = F.when(F.expr(s.filter_sql), tup)
        aggs.append(F.approx_count_distinct(tup, rsd).alias(f"c{i}"))
    [row] = df.agg(*aggs).collect()
    scale = 1.0 / sample_fraction if sample_fraction else 1.0
    # sampled distinct counts under-extrapolate for near-unique dims;
    # the linear scale keeps *relative* candidate ordering, which is
    # all the greedy consumes (documented trade)
    return [max(1, int(row[f"c{i}"] * scale)) for i in range(len(specs))]


# -- the greedy -------------------------------------------------------------

def advise(
    workload: list[WorkloadQuery | AggregateRequest],
    sources: dict[str, DataFrame],
    *,
    cell_budget: int | None = None,
    sample_fraction: float | None = None,
    max_candidates: int = 64,
    router_check=None,
) -> Advice:
    """Recommend cubes for a workload under an optional total-cell
    budget. ``sources`` maps request source names to DataFrames (used
    for cardinality estimation only — nothing is materialized here).

    ``router_check(spec, request) -> bool`` overrides the serving test
    (default: the real CubeRouter predicate via a throwaway catalog-less
    check); inject for tests.
    """
    wl = [w if isinstance(w, WorkloadQuery) else WorkloadQuery(w) for w in workload]
    total_w = sum(w.weight for w in wl)

    # 1. signatures + merged candidates, grouped by (source, filter)
    sigs = [_signature(w.request) for w in wl]
    groups: dict[tuple, list[_Sig]] = {}
    for s in sigs:
        groups.setdefault((s.source, s.filter_sql), [])
        if s not in groups[(s.source, s.filter_sql)]:
            groups[(s.source, s.filter_sql)].append(s)
    cands: list[_Sig] = []
    for members in groups.values():
        cands.extend(members)
        if len(members) > 1:
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    m = _merge(members[i], members[j])
                    if m not in cands:
                        cands.append(m)
            top = members[0]
            for s in members[1:]:
                top = _merge(top, s)
            if top not in cands:
                cands.append(top)
    cands = cands[:max_candidates]

    # 2. specs + cell estimates (one estimation job per source)
    specs = [_sig_to_spec(sig, f"adv_{i}") for i, sig in enumerate(cands)]
    est: dict[str, int] = {}
    by_source: dict[str, list[int]] = {}
    for i, s in enumerate(specs):
        by_source.setdefault(s.source, []).append(i)
    for src, idxs in by_source.items():
        if src not in sources:
            raise ValueError(f"workload references source {src!r} not in sources")
        counts = estimate_cells(
            sources[src], [specs[i] for i in idxs], sample_fraction=sample_fraction
        )
        for i, c in zip(idxs, counts):
            est[specs[i].name] = c
    src_rows = {name: df.count() for name, df in sources.items()}

    # 3. serving matrix — the REAL router predicate, so recommendations
    # are routable by construction
    if router_check is None:
        router_check = _default_router_check
    serves = [
        [router_check(spec, w.request) for w in wl]
        for spec in specs
    ]

    # 4. HRU greedy: benefit per unit state, re-evaluated each pick
    cost = [src_rows[w.request.source] for w in wl]  # current per-query cost
    picked: list[int] = []
    spent = 0
    while True:
        best, best_score, best_benefit = None, 0.0, 0.0
        for ci, spec in enumerate(specs):
            if ci in picked:
                continue
            cells = est[spec.name]
            if cell_budget is not None and spent + cells > cell_budget:
                continue
            benefit = sum(
                w.weight * (cost[qi] - cells)
                for qi, w in enumerate(wl)
                if serves[ci][qi] and cost[qi] > cells
            )
            score = benefit / max(cells, 1)
            if benefit > 0 and score > best_score:
                best, best_score, best_benefit = ci, score, benefit
        if best is None:
            break
        picked.append(best)
        spent += est[specs[best].name]
        for qi in range(len(wl)):
            if serves[best][qi]:
                cost[qi] = min(cost[qi], est[specs[best].name])

    # 5. assignment: each query → cheapest picked cube serving it
    assignment: dict[int, str | None] = {}
    covered = 0.0
    for qi, w in enumerate(wl):
        serving = [ci for ci in picked if serves[ci][qi]]
        if serving:
            ci = min(serving, key=lambda c: est[specs[c].name])
            assignment[qi] = specs[ci].name
            covered += w.weight
        else:
            assignment[qi] = None
    chosen = [specs[ci] for ci in picked]
    return Advice(
        cubes=chosen,
        assignment=assignment,
        est_cells={s.name: est[s.name] for s in chosen},
        covered_weight=covered,
        total_weight=total_w,
    )


def _default_router_check(spec: CubeSpec, req: AggregateRequest) -> bool:
    """The real CubeRouter serving predicate against a throwaway
    in-memory catalog holding only ``spec`` — metadata-only, no jobs."""
    from mongo_olap_spark.plans.router import CubeRouter

    class _OneSpec:
        def list_cubes(self):
            return [spec.name]

        def get_spec(self, name):
            return spec

        def lattice_levels(self, name):
            return None

        def cell_count(self, name):
            return 1

    ok, _, _, _ = CubeRouter(_OneSpec())._serves(spec, req)
    return ok
