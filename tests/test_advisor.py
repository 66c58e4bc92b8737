"""Cube advisor (plans/advisor.py): HRU-greedy view selection.

The load-bearing property: every cube the advisor recommends is
*actually routable* — registering the recommended specs and routing
the original workload through the real CubeRouter must land every
covered query on a cube, and the routed answer must equal direct
aggregation of the source.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_olap_spark.cube import CubeCatalog, build_cube
from mongo_olap_spark.plans.advisor import (
    Advice,
    WorkloadQuery,
    _signature,
    _merge,
    _sig_to_spec,
    advise,
    approx_request,
    estimate_cells,
)
from mongo_olap_spark.plans.router import AggregateRequest, CubeRouter
from mongo_olap_spark.sources.tables import load_table


def _req(**kw):
    return AggregateRequest(**{"source": "events", **kw})


R_TYPE_DAY = _req(
    group_by=("event_type", ("ts", "day")),
    measures=(("n", "count"), ("total", "sum", "value")),
)
R_TYPE = _req(group_by=("event_type",), measures=(("n", "count"),))
R_MONTH = _req(group_by=(("ts", "month"),), measures=(("avg_v", "avg", "value"),))
R_USER = _req(group_by=("user_id",), measures=(("n", "count"),))


# -- signatures -------------------------------------------------------------

def test_signature_keeps_finest_granularity_and_dedupes():
    a = _signature(R_TYPE_DAY)
    b = _signature(R_MONTH)
    m = _merge(a, b)
    assert dict(m.dims)["ts"] == "day"  # day is finer than month
    assert ("avg", "value") in m.measures and ("count", None) in m.measures
    spec = _sig_to_spec(m, "adv")
    assert spec.source == "events"
    gran = {d.source_path: d.granularity for d in spec.dimensions}
    assert gran["ts"] == "day"


def test_signature_raw_beats_bucketed():
    raw = _req(group_by=("ts",), measures=(("n", "count"),))
    m = _merge(_signature(raw), _signature(R_MONTH))
    assert dict(m.dims)["ts"] is None


def test_signature_rejects_bare_measure_names():
    with pytest.raises(ValueError, match="bare name"):
        _signature(_req(group_by=(), measures=("n",)))


def test_sig_to_spec_adds_count_for_measureless_group():
    sig = _signature(_req(group_by=("event_type",), measures=()))
    spec = _sig_to_spec(sig, "adv")
    assert [m.op for m in spec.measures] == ["count"]


# -- estimation -------------------------------------------------------------

def test_estimate_cells_one_job_and_sane(spark, events):
    sigs = [_signature(r) for r in (R_TYPE_DAY, R_TYPE)]
    specs = [_sig_to_spec(s, f"adv_{i}") for i, s in enumerate(sigs)]
    est = estimate_cells(events, specs)
    actual = [build_cube(spark, s, events).count() for s in specs]
    for e, a in zip(est, actual):
        assert a * 0.7 <= e <= a * 1.3  # HLL rsd 5% plus slack


def test_estimate_cells_respects_prefilter(spark, events):
    filtered = _req(
        group_by=("event_type",),
        measures=(("n", "count"),),
        filter_sql="value > 1000000",  # matches ~nothing
    )
    spec = _sig_to_spec(_signature(filtered), "adv_f")
    [est] = estimate_cells(events, [spec])
    assert est <= 2  # ~no rows pass the filter → ~no cells


# -- the greedy + end-to-end routability ------------------------------------

def test_advise_merges_same_grain_queries(spark, events):
    """Two queries over the same dims but different measures: the
    merged cube (union of measures, same cell count) strictly
    dominates two single-query cubes — the greedy must pick exactly
    one cube carrying all three accumulators."""
    a = _req(
        group_by=("event_type", ("ts", "day")),
        measures=(("n", "count"), ("total", "sum", "value")),
    )
    b = _req(group_by=("event_type", ("ts", "day")), measures=(("avg_v", "avg", "value"),))
    adv = advise([a, b], {"events": events})
    assert adv.coverage == 1.0
    assert len(adv.cubes) == 1
    assert {m.op for m in adv.cubes[0].measures} == {"count", "sum", "avg"}


def test_advise_prefers_per_query_minimal_state_unbudgeted(spark, events):
    """Queries with different grains each get their own smallest cube
    when state is free — query-scan cost is what the greedy minimizes
    (HRU benefit), so a coarse query never pays a fine cube's scan."""
    adv = advise([R_TYPE_DAY, R_TYPE, R_MONTH], {"events": events})
    assert adv.coverage == 1.0
    # every query is assigned the cheapest serving cube: the month
    # query must land on a 1-cell month cube, not the day-grain one
    month_cube = adv.assignment[2]
    assert adv.est_cells[month_cube] <= 2


def test_advise_end_to_end_routable_and_correct(spark, events, tmp_path):
    """Register the recommendation, route the workload through the real
    router, and check every covered answer equals direct aggregation."""
    wl = [R_TYPE_DAY, R_TYPE, R_MONTH, R_USER]
    adv = advise(wl, {"events": events})
    assert adv.coverage == 1.0

    catalog = CubeCatalog(spark, str(tmp_path))
    for spec in adv.cubes:
        catalog.create(spec, events)
    router = CubeRouter(catalog)

    for qi, req in enumerate(wl):
        decision = router.route(req)
        assert decision.cube is not None, f"query {qi} not routed: {decision.reason}"
        got = router.execute(req)
        # direct: group the source the same way
        gb = [
            F.col(g).alias(g) if isinstance(g, str)
            else F.date_trunc(g[1], F.col(g[0])).alias(f"{g[0]}_{g[1]}")
            for g in req.group_by
        ]
        aggs = []
        for name, op, *rest in req.measures:
            path = rest[0] if rest else None
            if op == "count":
                aggs.append(F.count(F.lit(1)).cast("long").alias(name))
            elif op == "sum":
                aggs.append(F.sum(path).alias(name))
            elif op == "avg":
                aggs.append(F.avg(path).alias(name))
        want = events.groupBy(*gb).agg(*aggs)
        nkeys = len(gb)
        key = lambda r: str(tuple(r)[:nkeys])  # noqa: E731 — exact group keys
        got_rows = sorted(got.select(*want.columns).collect(), key=key)
        want_rows = sorted(want.collect(), key=key)
        assert len(got_rows) == len(want_rows), f"query {qi} row count"
        for g, w in zip(got_rows, want_rows):
            for gv, wv in zip(g, w):
                if isinstance(wv, float):
                    assert float(gv) == pytest.approx(wv, rel=1e-9)
                else:
                    assert gv == wv, f"query {qi}: {g} != {w}"


def test_advise_budget_is_respected(spark, events):
    wl = [R_TYPE_DAY, R_USER]
    unbounded = advise(wl, {"events": events})
    assert sum(unbounded.est_cells.values()) > 10
    tight = advise(wl, {"events": events}, cell_budget=10)
    assert sum(tight.est_cells.values()) <= 10


def test_advise_weights_steer_selection(spark, events):
    """Under a budget that fits only one cube, the heavy query wins."""
    wl = [WorkloadQuery(R_USER, weight=100.0), WorkloadQuery(R_TYPE_DAY, weight=1.0)]
    # budget sized to the user cube only (15 users at sf0.001)
    adv = advise(wl, {"events": events}, cell_budget=30)
    assert adv.assignment[0] is not None
    [spec] = adv.cubes
    assert any(d.source_path == "user_id" for d in spec.dimensions)


def test_advise_skips_unprofitable_cube(spark, events):
    """A cube as big as the source (group by unique event_id) has no
    benefit — the greedy must not pick it."""
    r = _req(group_by=("event_id",), measures=(("n", "count"),))
    adv = advise([r], {"events": events})
    assert adv.cubes == [] and adv.assignment[0] is None and adv.coverage == 0.0


def test_advise_separates_incompatible_filters(spark, events):
    a = _req(group_by=("event_type",), measures=(("n", "count"),))
    b = _req(group_by=("event_type",), measures=(("n", "count"),), filter_sql="value > 0")
    adv = advise([a, b], {"events": events})
    assert adv.coverage == 1.0
    assert len(adv.cubes) == 2  # pre-filters differ → cannot share state
    filters = {s.filter_sql for s in adv.cubes}
    assert filters == {None, "value > 0"}


# -- engine integration ------------------------------------------------------

def test_engine_advise_cubes_from_pipelines(spark, events, tmp_path):
    """Pipeline workload → advice → apply → the same pipelines now
    route to the advised cube and answer identically to compilation
    over the raw source."""
    from mongo_olap_spark.engine import OlapEngine

    engine = OlapEngine(spark, str(tmp_path))
    p_day = [{"$group": {
        "_id": {"event_type": "$event_type",
                "day": {"$dateTrunc": {"date": "$ts", "unit": "day"}}},
        "n": {"$sum": 1},
        "total": {"$sum": "$value"},
    }}]
    p_type = [{"$group": {"_id": {"event_type": "$event_type"},
                          "n": {"$sum": 1}}}]
    advice = engine.advise_cubes(
        [("events", p_day, 10.0), ("events", p_type, 5.0)],
        {"events": events},
        apply=True,
    )
    assert advice.coverage == 1.0
    assert set(engine.list_cubes()) == {s.name for s in advice.cubes}

    for pipe, exp_df in (
        (
            p_day,
            events.groupBy(
                F.col("event_type"), F.date_trunc("day", "ts").alias("day")
            ).agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("value").alias("total"),
            ),
        ),
        (
            p_type,
            events.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n")),
        ),
    ):
        exp = engine.explain(source="events", pipeline=pipe)
        assert exp["route"]["target"] == "cube"
        routed = engine.query_pipeline("events", pipe)  # no source_df: cube-only
        rk = sorted(routed.select(*exp_df.columns).collect(), key=str)
        dk = sorted(exp_df.collect(), key=str)
        assert len(rk) == len(dk)
        for a, b in zip(rk, dk):
            for av, bv in zip(a, b):
                if isinstance(bv, float):
                    assert float(av) == pytest.approx(bv, rel=1e-9)
                else:
                    assert av == bv


# -- ADVICE r8 fixes ---------------------------------------------------------

def test_extrapolate_distinct_saturation_aware():
    """Low-cardinality (saturated) candidates must not be linearly
    inflated: 5 distinct values seen across 1000 sampled rows at
    fraction 0.01 is ~5 distinct, not ~500 (ADVICE r8)."""
    from mongo_olap_spark.plans.advisor import _extrapolate_distinct

    sat = _extrapolate_distinct(5, 1000, 100.0)
    assert 5 <= sat <= 6
    # near-unique sample: every sampled row a new value → extrapolate
    # toward the linear bound
    uniq = _extrapolate_distinct(1000, 1000, 100.0)
    assert uniq >= 50_000
    # middle ground stays monotone between the two regimes
    mid = _extrapolate_distinct(500, 1000, 100.0)
    assert sat < mid < uniq
    assert _extrapolate_distinct(0, 0, 100.0) == 1


def test_estimate_cells_sampled_does_not_inflate_saturated(spark, events):
    """End-to-end: sampling half the events table must still estimate
    ~5 cells for the event_type cube (5 types), not ~10."""
    from mongo_olap_spark.plans.advisor import estimate_cells_and_rows

    spec = _sig_to_spec(_signature(R_TYPE), "t")
    cells, rows = estimate_cells_and_rows(events, [spec], sample_fraction=0.5)
    assert cells[0] <= 8
    n = events.count()
    assert 0.5 * n <= rows[0] <= 1.6 * n  # linear count extrapolation


def test_advise_truncation_warns_and_keeps_own_signatures(spark, events):
    """max_candidates caps MERGED candidates only: every query keeps
    its own signature (coverage never silently zero), the dropped
    count is surfaced on Advice, and a warning fires (ADVICE r8)."""
    dims = ["event_type", "user_id"]
    wl = [
        _req(group_by=(d, ("ts", g)), measures=(("n", "count"),))
        for d in dims
        for g in ("day", "month")
    ]
    with pytest.warns(UserWarning, match="dropping"):
        adv = advise(wl, {"events": events}, max_candidates=len(wl))
    assert adv.dropped_candidates > 0
    # every query still has at least its own signature considered →
    # full coverage remains possible
    assert adv.coverage == 1.0
    no_drop = advise(wl, {"events": events}, max_candidates=64)
    assert no_drop.dropped_candidates == 0


def test_advise_filtered_query_costed_at_filtered_rows(spark, events):
    """A heavily filtered query's scan cost is its qualifying rows, so
    a cube whose cell count exceeds them is unprofitable and must not
    be recommended (ADVICE r8: full-source costing overstated the
    benefit)."""
    # ~1/5 of events are errors; group by near-unique event_id so the
    # candidate cube has ≈ qualifying-row cells → zero benefit
    r = _req(
        group_by=("event_id",),
        measures=(("n", "count"),),
        filter_sql="event_type = 'error'",
    )
    adv = advise([r], {"events": events})
    assert adv.cubes == [] and adv.assignment[0] is None


def test_advise_maintenance_weight_prunes_marginal_cubes(spark, events):
    """With upkeep charged per unit state, a low-benefit candidate is
    dropped while a high-benefit one survives; at an extreme rate
    nothing is worth materializing; at 0 behavior is plain HRU."""
    # high benefit: event_type (5 cells serving 1000-row scans);
    # marginal: (user_id, day) (~450 cells at sf0.001 — saves ~2x its
    # state in scan rows, so a modest upkeep rate kills only it)
    hi = _req(group_by=("event_type",), measures=(("n", "count"),))
    lo = _req(group_by=("user_id", ("ts", "day")), measures=(("n", "count"),))
    plain = advise([hi, lo], {"events": events})
    assert plain.assignment[0] is not None and plain.assignment[1] is not None

    moderate = advise([hi, lo], {"events": events}, maintenance_weight=2.0)
    assert moderate.assignment[0] is not None  # 5-cell cube still wins
    assert moderate.assignment[1] is None      # upkeep outcosts savings

    extreme = advise([hi, lo], {"events": events}, maintenance_weight=1e6)
    assert extreme.cubes == []


def test_advise_serve_overhead_floor_prunes_small_wins(spark, events):
    """r15 (calibration probe): a cube serve pays a fixed floor the
    rows-saved proxy ignores (ADVISOR_CALIB.json measured routed
    SLOWER than direct for 4/5 queries at local sf1). With the floor
    charged in row units, a cube that cannot beat its own serve
    overhead is never recommended; at 0 behavior is plain HRU."""
    hi = _req(group_by=("event_type",), measures=(("n", "count"),))
    lo = _req(group_by=("user_id", ("ts", "day")),
              measures=(("n", "count"),))
    plain = advise([hi, lo], {"events": events})
    assert plain.assignment[0] is not None and plain.assignment[1] is not None

    # sf0.001 events = 1000 rows: the marginal (user_id, day) cube
    # saves ~550 rows/query — a 600-row floor kills it, while the
    # 5-cell event_type cube (saves ~995) survives
    mid = advise([hi, lo], {"events": events}, serve_overhead_rows=600)
    assert mid.assignment[0] is not None
    assert mid.assignment[1] is None

    # a floor above every possible saving recommends nothing
    none = advise([hi, lo], {"events": events}, serve_overhead_rows=10_000)
    assert none.cubes == []


# ---------------------------------------------------------------------------
# C19/C20 two-level decomposition in the workload (r9)
# ---------------------------------------------------------------------------

def test_signature_decomposes_exact_distinct_and_quantile():
    """count_distinct / quantile_exact measures become raw dimensions
    + a count measure — the exact state shape the router serves them
    from."""
    sig = _signature(_req(
        group_by=("event_type",),
        measures=(("n_users", "count_distinct", "user_id"),),
    ))
    assert ("user_id", None) in sig.dims
    assert sig.measures == frozenset({("count", None)})
    sig = _signature(_req(
        group_by=("event_type",),
        measures=(("p50", "quantile_exact", "value", 0.5),),
    ))
    assert ("value", None) in sig.dims
    assert sig.measures == frozenset({("count", None)})


def test_signature_refuses_sketch_quantile_with_recipe():
    with pytest.raises(ValueError, match="quantile_exact"):
        _signature(_req(
            group_by=("event_type",),
            measures=(("p50", "quantile", "value"),),
        ))


def test_advise_declines_unprofitable_two_level_quantile(spark, events):
    """value is near-unique at sf0.001: the (group, value) cube has
    ~one cell per source row, so the greedy correctly declines it —
    the decomposition must not bypass the profitability margin."""
    adv = advise([_req(
        group_by=("event_type",),
        measures=(("p50", "quantile_exact", "value", 0.5),),
    )], {"events": events})
    assert adv.coverage == 0.0


def test_advise_exact_quantile_end_to_end(spark, events, tmp_path):
    """An advisor recommendation for a quantile_exact workload over a
    low-cardinality column routes and answers correctly through the
    real router."""
    req = _req(
        group_by=("event_type",),
        measures=(("p50", "quantile_exact", "user_id", 0.5),),
    )
    adv = advise([req], {"events": events})
    assert adv.coverage == 1.0
    catalog = CubeCatalog(spark, str(tmp_path))
    for spec in adv.cubes:
        catalog.create(spec, events)
    router = CubeRouter(catalog)
    decision = router.route(req)
    assert decision.cube is not None, decision.reason
    got = {r.event_type: r.p50 for r in router.execute(req).collect()}

    from pyspark.sql import Window

    e = events.filter(F.col("user_id").isNotNull())
    want = {
        r.event_type: r.p50
        for r in (
            e.withColumn("__cum", F.count(F.lit(1)).over(
                Window.partitionBy("event_type").orderBy("user_id")))
            .withColumn("__tot", F.count(F.lit(1)).over(
                Window.partitionBy("event_type")))
            .filter(F.col("__cum") >= F.ceil(F.lit(0.5) * F.col("__tot")))
            .groupBy("event_type")
            .agg(F.min("user_id").alias("p50"))
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# C21 two-level decomposition in the workload (r9)
# ---------------------------------------------------------------------------

def test_signature_decomposes_topn_and_refuses_sketch_topk():
    """topn measures become raw dimensions + a count measure — the
    exact state shape the router serves them from; the 'topk' sketch
    refuses with a recipe (capacity is a domain decision)."""
    sig = _signature(_req(
        group_by=("event_type",),
        measures=(("top_user", "topn", "user_id", 3),),
    ))
    assert ("user_id", None) in sig.dims
    assert sig.measures == frozenset({("count", None)})
    with pytest.raises(ValueError, match="topn"):
        _signature(_req(
            group_by=("event_type",),
            measures=(("top_user", "topk", "user_id"),),
        ))


def test_advise_exact_topn_end_to_end(spark, events, tmp_path):
    """An advisor recommendation for a topn workload over a
    low-cardinality column routes and answers correctly through the
    real router."""
    req = _req(
        group_by=("event_type",),
        measures=(("top_user", "topn", "user_id", 3),),
    )
    adv = advise([req], {"events": events})
    assert adv.coverage == 1.0
    catalog = CubeCatalog(spark, str(tmp_path))
    for spec in adv.cubes:
        catalog.create(spec, events)
    router = CubeRouter(catalog)
    decision = router.route(req)
    assert decision.cube is not None, decision.reason
    got = {
        (r.event_type, r.rank): (r.top_user, r.top_user_cnt)
        for r in router.execute(req).collect()
    }

    from pyspark.sql import Window

    e = events.filter(F.col("user_id").isNotNull())
    counted = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("cnt").desc(), F.col("user_id").asc()
    )
    want = {
        (r.event_type, r.rank): (r.user_id, r.cnt)
        for r in counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3).collect()
    }
    assert got == want


def test_four_exact_families_share_one_two_level_cube(spark, events, tmp_path):
    """VERDICT r9 task 6: count_distinct, quantile_exact, topn, and
    min_n on the same (group dims, path) decompose to the SAME
    two-level state — the advisor must recommend ONE cube for the
    mixed workload (no per-family duplication), maintenance must not
    be charged per family, and the real router must then answer all
    four from it."""
    from mongo_olap_spark.cube import CubeCatalog
    from mongo_olap_spark.plans import CubeRouter

    wl = [
        AggregateRequest(source="events", group_by=("event_type",),
                         measures=(("nu", "count_distinct", "user_id"),)),
        AggregateRequest(source="events", group_by=("event_type",),
                         measures=(("p50", "quantile_exact", "user_id", 0.5),)),
        AggregateRequest(source="events", group_by=("event_type",),
                         measures=(("top", "topn", "user_id", 3),)),
        AggregateRequest(source="events", group_by=("event_type",),
                         measures=(("lo", "min_n", "user_id", 2),)),
    ]
    adv = advise(wl, {"events": events})
    assert len(adv.cubes) == 1, [c.name for c in adv.cubes]
    spec = adv.cubes[0]
    assert {d.source_path for d in spec.dimensions} == {"event_type", "user_id"}
    assert [(m.op, m.path) for m in spec.measures] == [("count", None)]
    assert set(adv.assignment.values()) == {spec.name}
    assert adv.coverage == 1.0

    # maintenance_weight charges the SHARED state once, not per family:
    # the single merged candidate must survive a weight under which
    # 4x-duplicated state would be rejected. benefit≈4 queries x est
    # source rows; pick a weight where benefit > w*cells but
    # benefit/4 < w*cells would NOT hold for a single query... simply
    # assert the recommendation is unchanged at a moderate weight.
    n_cells = adv.est_cells[spec.name]
    w = 2.0 / n_cells  # upkeep ~2 queries' worth for the whole cube
    adv2 = advise(wl, {"events": events}, maintenance_weight=w)
    assert len(adv2.cubes) == 1 and adv2.coverage == 1.0

    # end-to-end: the recommended cube serves all four families
    cat = CubeCatalog(spark, str(tmp_path / "fam_cubes"))
    cat.create(spec, events)
    router = CubeRouter(cat)
    for req in wl:
        d = router.route(req)
        assert d.cube == spec.name, (req.measures, d.reason)
        assert router.execute(req).count() > 0


def test_engine_advise_cubes_special_family_pipelines(spark, events, tmp_path):
    """r10: the workload ingestion accepts the special-family pipeline
    shapes (the same translation query_pipeline uses) — a $median and
    an $addToSet+$size pipeline on the same path advise ONE two-level
    cube, and after apply=True both pipelines route to it."""
    from mongo_olap_spark.engine import OlapEngine
    from mongo_olap_spark.plans.pipeline_compiler import PipelineError

    engine = OlapEngine(spark, str(tmp_path / "adv_special"))
    p_med = [{"$group": {"_id": {"et": "$event_type"},
              "med": {"$median": {"input": "$user_id",
                                  "method": "approximate"}}}}]
    p_cd = [{"$group": {"_id": {"et": "$event_type"},
             "us": {"$addToSet": "$user_id"}}},
            {"$project": {"nu": {"$size": "$us"}}}]
    advice = engine.advise_cubes(
        [("events", p_med, 3.0), ("events", p_cd, 2.0)],
        {"events": events},
        apply=True,
    )
    assert advice.coverage == 1.0
    assert len(advice.cubes) == 1, [c.name for c in advice.cubes]
    spec = advice.cubes[0]
    assert {d.source_path for d in spec.dimensions} == {"event_type", "user_id"}
    assert [(m.op, m.path) for m in spec.measures] == [("count", None)]

    for pipe in (p_med, p_cd):
        exp = engine.explain(source="events", pipeline=pipe)
        assert exp["route"]["target"] == "cube", exp

    got = {r["et"]: r["med"]
           for r in engine.query_pipeline("events", p_med).collect()}
    assert len(got) == events.select("event_type").distinct().count()

    # a genuinely non-advisable pipeline still raises the cube error
    with pytest.raises(PipelineError):
        engine.advise_cubes(
            [("events", [{"$group": {"_id": {"et": "$event_type"},
                                     "v": {"$push": "$value"}}}])],
            {"events": events},
        )


# ---------------------------------------------------------------------------
# r13 (VERDICT r12 task 5): budget pressure on special-family queries
# — when the exact two-level cube busts the cell budget, the advice
# carries a FLAGGED bounded-state sketch alternative with its error
# envelope; never auto-picked.
# ---------------------------------------------------------------------------

def test_sketch_alternative_under_budget_pressure(spark, events):
    wl = [AggregateRequest(
        source="events", group_by=("event_type",),
        measures=(("nu", "count_distinct", "user_id"),))]
    # a budget well under the (event_type, user_id) two-level cell
    # count: the exact candidate cannot be afforded
    adv = advise(wl, {"events": events}, cell_budget=10)
    assert adv.assignment[0] is None and adv.cubes == []
    assert len(adv.sketch_alternatives) == 1
    alt = adv.sketch_alternatives[0]
    assert alt.query_index == 0
    assert alt.exact_cells > 10  # why it was priced out
    spec = alt.spec
    assert {d.source_path for d in spec.dimensions} == {"event_type"}
    ops = {m.op for m in spec.measures}
    assert "distinct" in ops
    (dm,) = [m for m in spec.measures if m.op == "distinct"]
    assert dm.path == "user_id" and dm.lgk == 12
    assert any("HLL" in e and "%" in e for e in alt.error_envelope)
    # bounded state: O(groups), far under the exact candidate
    assert alt.est_cells < alt.exact_cells
    # the flagged spec is genuinely creatable and queryable
    cells = build_cube(spark, spec, events)
    assert cells.count() == events.select("event_type").distinct().count()


def test_sketch_alternative_quantile_and_topn(spark, events):
    wl = [
        AggregateRequest(source="events", group_by=("event_type",),
                         measures=(("p50", "quantile_exact", "value", 0.5),)),
        AggregateRequest(source="events", group_by=("event_type",),
                         measures=(("top", "topn", "user_id", 3),)),
    ]
    adv = advise(wl, {"events": events}, cell_budget=10)
    alts = {a.query_index: a for a in adv.sketch_alternatives}
    assert set(alts) == {0, 1}
    qm = [m for m in alts[0].spec.measures if m.op == "quantile"][0]
    assert qm.nbins == 256 and "PLACEHOLDER" in " ".join(alts[0].error_envelope)
    tm = [m for m in alts[1].spec.measures if m.op == "topk"][0]
    assert tm.path == "user_id" and tm.k == 3
    assert any("max_items" in e for e in alts[1].error_envelope)


def test_no_sketch_alternative_for_min_n(spark, events):
    # $minN has no bounded mergeable summary in the measure vocabulary
    # — offering one would be a silent approximation; the advice stays
    # empty-handed (and honest) for that query
    wl = [AggregateRequest(
        source="events", group_by=("event_type",),
        measures=(("lo", "min_n", "user_id", 2),))]
    adv = advise(wl, {"events": events}, cell_budget=10)
    assert adv.assignment[0] is None
    assert adv.sketch_alternatives == []


def test_no_sketch_alternative_when_budget_suffices(spark, events):
    wl = [AggregateRequest(
        source="events", group_by=("event_type",),
        measures=(("nu", "count_distinct", "user_id"),))]
    adv = advise(wl, {"events": events}, cell_budget=10_000_000)
    assert adv.assignment[0] is not None
    assert adv.sketch_alternatives == []


def test_no_sketch_alternative_without_budget(spark, events):
    # only BUDGET pressure triggers the flag — with no budget the
    # exact candidate is always recommendable
    wl = [AggregateRequest(
        source="events", group_by=("event_type",),
        measures=(("nu", "count_distinct", "user_id"),))]
    adv = advise(wl, {"events": events})
    assert adv.sketch_alternatives == []


# ---------------------------------------------------------------------------
# r14 (VERDICT r13 task 6 + ADVICE r13): opting INTO a flagged sketch
# alternative — the spec carries the request's own ops, materializes,
# routes, and serves within its declared envelope.
# ---------------------------------------------------------------------------

def test_sketch_alternative_preserves_dispersion_op(spark, events):
    # ADVICE r13: var/stddev variants share (Σx, Σx², n) storage but
    # the flagged spec must carry the REQUEST's op so the advertised
    # alternative serves the priced-out query as-is, no rename needed
    wl = [AggregateRequest(
        source="events", group_by=("event_type",),
        measures=(("nu", "count_distinct", "user_id"),
                  ("sd", "stddev_samp", "value")))]
    adv = advise(wl, {"events": events}, cell_budget=10)
    (alt,) = adv.sketch_alternatives
    (sd,) = [m for m in alt.spec.measures if m.name == "sd"]
    assert sd.op == "stddev_samp" and sd.path == "value"


def test_apply_sketch_alternative_distinct_routes_and_serves(
        spark, events, tmp_path):
    from mongo_olap_spark.engine import OlapEngine

    engine = OlapEngine(spark, str(tmp_path))
    req = AggregateRequest(
        source="events", group_by=("event_type",),
        measures=(("nu", "count_distinct", "user_id"),))
    adv = advise([req], {"events": events}, cell_budget=10)
    assert adv.assignment[0] is None  # priced out
    (alt,) = adv.sketch_alternatives

    created = engine.apply_sketch_alternative(alt, events)
    assert created.name in engine.list_cubes()

    # the EXACT ask still refuses to degrade (load-bearing invariant) —
    # opting in means asking the sketch op explicitly
    assert engine.router.route(req).cube is None
    approx = approx_request(req)
    assert approx.measures == (("nu", "distinct", "user_id"),)
    decision = engine.router.route(approx)
    assert decision.cube == created.name, decision.reason

    # ...and serves within the declared HLL envelope (lgk=12 →
    # rsd ≈ 1.6%; assert 3σ ≈ 5%)
    got = {r["event_type"]: r["nu"]
           for r in engine.query(source="events",
                                 group_by=["event_type"],
                                 measures=list(approx.measures),
                                 source_df=events).collect()}
    exact = {r["event_type"]: r["nu"]
             for r in events.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("nu")).collect()}
    assert set(got) == set(exact)
    for et, e in exact.items():
        assert abs(got[et] - e) <= max(1, 0.05 * e), (et, got[et], e)


def test_apply_sketch_alternative_quantile_auto_ranges(
        spark, events, tmp_path):
    from mongo_olap_spark.engine import OlapEngine

    engine = OlapEngine(spark, str(tmp_path))
    req = AggregateRequest(
        source="events", group_by=("event_type",),
        measures=(("p50", "quantile_exact", "value", 0.5),))
    adv = advise([req], {"events": events}, cell_budget=10)
    (alt,) = adv.sketch_alternatives
    (qm0,) = [m for m in alt.spec.measures if m.op == "quantile"]
    assert (qm0.lo, qm0.hi) == (0.0, 1.0)  # the advertised placeholder

    created = engine.apply_sketch_alternative(alt, events)
    (qm,) = [m for m in created.measures if m.op == "quantile"]
    [row] = events.agg(F.min("value").alias("lo"),
                       F.max("value").alias("hi")).collect()
    # auto-filled from the true column domain — no mass clamps
    assert qm.lo == float(row["lo"]) and qm.hi == float(row["hi"])

    approx = approx_request(req)
    assert approx.measures == (("p50", "quantile", "value"),)
    decision = engine.router.route(approx)
    assert decision.cube == created.name, decision.reason
    # the requested p=0.5 rode onto the sketch measure's default q
    assert qm.q == 0.5
    got = {r["event_type"]: r["p50"]
           for r in engine.query(source="events",
                                 group_by=["event_type"],
                                 measures=list(approx.measures),
                                 source_df=events).collect()}
    exact = {r["event_type"]: r["p50"]
             for r in events.groupBy("event_type")
             .agg(F.expr("percentile(value, 0.5)").alias("p50")).collect()}
    bin_width = (qm.hi - qm.lo) / qm.nbins
    for et, e in exact.items():
        assert abs(got[et] - e) <= bin_width + 1e-9, (et, got[et], e)


def test_apply_sketch_alternative_explicit_ranges(spark, events, tmp_path):
    from mongo_olap_spark.engine import OlapEngine

    engine = OlapEngine(spark, str(tmp_path))
    req = AggregateRequest(
        source="events", group_by=("event_type",),
        measures=(("p50", "quantile_exact", "value", 0.5),))
    adv = advise([req], {"events": events}, cell_budget=10)
    (alt,) = adv.sketch_alternatives
    created = engine.apply_sketch_alternative(
        alt, events, quantile_ranges={"p50": (-10.0, 10.0)})
    (qm,) = [m for m in created.measures if m.op == "quantile"]
    assert (qm.lo, qm.hi) == (-10.0, 10.0)
