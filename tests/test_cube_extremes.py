"""Order-statistics accumulators from cube state (C23) — Mongo
$minN/$maxN parity: the k smallest/largest values per group
(duplicates kept) expanded from the ≤ k boundary cells of the
two-level state. Exact, fully retractable (the runner-up is always a
live cell, unlike raw min/max measures), bounded collects (≤ k
structs per group)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mongo_olap_spark.cube import CubeSpec, Dimension, Measure, build_cube
from mongo_olap_spark.cube.build import delta_cells
from mongo_olap_spark.cube.ivm import merge_cells
from mongo_olap_spark.cube.query import extremes_rollup
from mongo_olap_spark.plans import AggregateRequest, CubeRouter
from mongo_olap_spark.queries.core import VALUE_EXACT_Q_CUBE


def reference(events, k, largest, *group_by):
    e = events.filter(F.col("value").isNotNull())
    order = F.col("value").desc() if largest else F.col("value").asc()
    w = Window.partitionBy(*group_by).orderBy(order)
    rows = e.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return {
        tuple(r[g] for g in group_by): r["a"]
        for r in rows.groupBy(*group_by)
        .agg(F.sort_array(F.collect_list("value"), asc=not largest).alias("a"))
        .collect()
    }


@pytest.mark.parametrize("largest", [False, True])
def test_extremes_match_raw_rows(spark, events, largest):
    cells = build_cube(spark, VALUE_EXACT_Q_CUBE, events)
    got = {
        (r["event_type"],): r["x"]
        for r in extremes_rollup(
            cells, VALUE_EXACT_Q_CUBE, ["event_type"], "value", 7,
            largest=largest, alias="x",
        ).collect()
    }
    assert got == reference(events, 7, largest, "event_type")


def test_duplicates_kept_across_boundary(spark):
    """$minN keeps duplicate values; a dup straddling the k cutoff
    takes only the remaining slots."""
    spec = CubeSpec(
        name="dups",
        source="t",
        dimensions=(Dimension("g"), Dimension("v")),
        measures=(Measure("n", "count"),),
    )
    df = spark.createDataFrame(
        [("x", 1.0)] + [("x", 2.0)] * 4 + [("x", 3.0)], "g string, v double"
    )
    cells = build_cube(spark, spec, df)
    out = extremes_rollup(cells, spec, ["g"], "v", 3, alias="m").collect()
    assert out[0]["m"] == [1.0, 2.0, 2.0]  # only 2 of the 4 dups fit


def test_extremes_fully_retractable(spark, events):
    doomed = events.orderBy("event_id").limit(60).cache()
    survivors = events.join(doomed.select("event_id"), "event_id", "left_anti").cache()
    cells = build_cube(spark, VALUE_EXACT_Q_CUBE, events)
    deltas = delta_cells(VALUE_EXACT_Q_CUBE, doomed.withColumn("mult", F.lit(-1)))
    merged = merge_cells(cells, deltas, VALUE_EXACT_Q_CUBE)
    got = {
        (r["event_type"],): r["x"]
        for r in extremes_rollup(
            merged, VALUE_EXACT_Q_CUBE, ["event_type"], "value", 5, alias="x"
        ).collect()
    }
    assert got == reference(survivors, 5, False, "event_type")


def test_grand_total_and_extra_dims(spark, events):
    cells = build_cube(spark, VALUE_EXACT_Q_CUBE, events)
    got = extremes_rollup(cells, VALUE_EXACT_Q_CUBE, [], "value", 4, alias="x").collect()
    assert len(got) == 1
    assert got[0]["x"] == reference(events, 4, False)[()]
    # extra dims: one value owns several cells — multiplicities re-agg
    three = CubeSpec(
        name="val_day",
        source="events",
        dimensions=(
            Dimension("event_type"),
            Dimension("day", path="ts", granularity="day"),
            Dimension("value"),
        ),
        measures=(Measure("n", "count"),),
    )
    cells3 = build_cube(spark, three, events)
    got3 = {
        (r["event_type"],): r["x"]
        for r in extremes_rollup(
            cells3, three, ["event_type"], "value", 5, alias="x"
        ).collect()
    }
    assert got3 == reference(events, 5, False, "event_type")


def test_extremes_rejects_bad_args(spark, events):
    cells = build_cube(spark, VALUE_EXACT_Q_CUBE, events)
    with pytest.raises(ValueError, match="k >= 1"):
        extremes_rollup(cells, VALUE_EXACT_Q_CUBE, ["event_type"], "value", 0)
    with pytest.raises(ValueError, match="not a cube dimension"):
        extremes_rollup(cells, VALUE_EXACT_Q_CUBE, ["event_type"], "nope", 3)
    with pytest.raises(ValueError, match="cannot also be grouped"):
        extremes_rollup(cells, VALUE_EXACT_Q_CUBE, ["value"], "value", 3)


def test_router_minn_maxn_route_and_refusals(spark, events, tmp_path):
    from mongo_olap_spark.cube import CubeCatalog

    cat = CubeCatalog(spark, str(tmp_path / "mn_cubes"))
    cat.create(VALUE_EXACT_Q_CUBE, events)
    router = CubeRouter(cat)
    req = AggregateRequest(
        source="events",
        group_by=("event_type",),
        measures=(("lows", "min_n", "value", 5),),
    )
    d = router.route(req)
    assert d.cube == VALUE_EXACT_Q_CUBE.name
    assert d.extremes == ("lows", "value", 5, False)
    got = {(r["event_type"],): r["lows"] for r in router.execute(req).collect()}
    assert got == reference(events, 5, False, "event_type")
    # max_n flips the order flag
    d2 = router.route(AggregateRequest(
        source="events", group_by=("event_type",),
        measures=(("highs", "max_n", "value", 2),),
    ))
    assert d2.extremes == ("highs", "value", 2, True)
    # refusals: combined with another measure; measured col grouped; k<1
    assert router.route(AggregateRequest(
        source="events", group_by=("event_type",),
        measures=(("lows", "min_n", "value", 5), ("n", "count")),
    )).cube is None
    assert router.route(AggregateRequest(
        source="events", group_by=("event_type", "value"),
        measures=(("lows", "min_n", "value", 5),),
    )).cube is None
    assert router.route(AggregateRequest(
        source="events", group_by=("event_type",),
        measures=(("lows", "min_n", "value", 0),),
    )).cube is None


def test_router_minn_source_fallback(spark, events, tmp_path):
    from mongo_olap_spark.cube import CubeCatalog

    cat = CubeCatalog(spark, str(tmp_path / "mn_cubes2"))
    cat.create(VALUE_EXACT_Q_CUBE, events)
    router = CubeRouter(cat)
    req = AggregateRequest(
        source="events",
        group_by=("user_id",),
        measures=(("highs", "max_n", "value", 3),),
    )
    assert router.route(req).cube is None
    got = {
        (r["user_id"],): r["highs"]
        for r in router.execute(req, source_df=events).collect()
    }
    assert got == reference(events, 3, True, "user_id")


# ---------------------------------------------------------------------------
# C24 — $topN/$bottomN with sortBy + output (top_by_rollup)
# ---------------------------------------------------------------------------

def topby_reference(events, k, largest, *group_by):
    e = events.filter(F.col("value").isNotNull())
    if largest:
        order = [F.col("value").desc(), F.col("user_id").desc()]
    else:
        order = [F.col("value").asc(), F.col("user_id").asc()]
    w = Window.partitionBy(*group_by).orderBy(*order)
    rows = e.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    out = {
        tuple(r[g] for g in group_by): [x["u"] for x in sorted(
            (row for row in r["raw"]), key=lambda x: x["rn"])]
        for r in rows.groupBy(*group_by)
        .agg(F.collect_list(F.struct("rn", F.col("user_id").alias("u"))).alias("raw"))
        .collect()
    }
    if largest:
        # Mongo presents $bottomN's selected documents in ASCENDING
        # sortBy order (the rn order above is descending)
        out = {g: list(reversed(v)) for g, v in out.items()}
    return out


@pytest.mark.parametrize("largest", [False, True])
def test_top_by_matches_raw_rows(spark, events, largest):
    from mongo_olap_spark.cube.query import top_by_rollup

    spec = CubeSpec(
        name="tb",
        source="events",
        dimensions=(Dimension("event_type"), Dimension("value"), Dimension("user_id")),
        measures=(Measure("n", "count"),),
    )
    cells = build_cube(spark, spec, events)
    got = {
        (r["event_type"],): r["who"]
        for r in top_by_rollup(
            cells, spec, ["event_type"], "value", "user_id", 4,
            largest=largest, alias="who",
        ).collect()
    }
    assert got == topby_reference(events, 4, largest, "event_type")


def test_top_by_retractable_and_null_payload(spark):
    from mongo_olap_spark.cube.query import top_by_rollup

    spec = CubeSpec(
        name="tb2",
        source="t",
        dimensions=(Dimension("g"), Dimension("sv"), Dimension("p")),
        measures=(Measure("n", "count"),),
    )
    df = spark.createDataFrame(
        [("g", 1.0, None), ("g", 2.0, 7), ("g", 2.0, 5), ("g", 3.0, 8)],
        "g string, sv double, p int",
    )
    cells = build_cube(spark, spec, df)
    out = top_by_rollup(cells, spec, ["g"], "sv", "p", 3, alias="m").collect()
    # null payload participates; sv tie (2.0) breaks by payload asc
    assert out[0]["m"] == [None, 5, 7]
    # retract the null-payload row: the runner-up takes its place
    doomed = df.limit(1)
    deltas = delta_cells(spec, doomed.withColumn("mult", F.lit(-1)))
    merged = merge_cells(cells, deltas, spec)
    out2 = top_by_rollup(merged, spec, ["g"], "sv", "p", 3, alias="m").collect()
    assert out2[0]["m"] == [5, 7, 8]


def test_top_by_rejects_bad_args(spark, events):
    from mongo_olap_spark.cube.query import top_by_rollup

    spec = CubeSpec(
        name="tb3",
        source="events",
        dimensions=(Dimension("event_type"), Dimension("value"), Dimension("user_id")),
        measures=(Measure("n", "count"),),
    )
    cells = build_cube(spark, spec, events)
    with pytest.raises(ValueError, match="must differ"):
        top_by_rollup(cells, spec, ["event_type"], "value", "value", 3)
    with pytest.raises(ValueError, match="not a cube dimension"):
        top_by_rollup(cells, spec, ["event_type"], "value", "nope", 3)
    with pytest.raises(ValueError, match="k >= 1"):
        top_by_rollup(cells, spec, ["event_type"], "value", "user_id", 0)


def test_router_topby_route_and_fallback(spark, events, tmp_path):
    from mongo_olap_spark.cube import CubeCatalog

    spec = CubeSpec(
        name="tb_route",
        source="events",
        dimensions=(Dimension("event_type"), Dimension("value"), Dimension("user_id")),
        measures=(Measure("n", "count"),),
    )
    cat = CubeCatalog(spark, str(tmp_path / "tb_cubes"))
    cat.create(spec, events)
    router = CubeRouter(cat)
    req = AggregateRequest(
        source="events",
        group_by=("event_type",),
        measures=(("who", "top_by", "value", "user_id", 4),),
    )
    d = router.route(req)
    assert d.cube == spec.name and d.topby == ("who", "value", "user_id", 4, False, False)
    got = {(r["event_type"],): r["who"] for r in router.execute(req).collect()}
    assert got == topby_reference(events, 4, False, "event_type")
    # bottom_by flips to the LAST k in sort order
    d2 = router.route(AggregateRequest(
        source="events", group_by=("event_type",),
        measures=(("who", "bottom_by", "value", "user_id", 2),),
    ))
    assert d2.topby == ("who", "value", "user_id", 2, True, False)
    # refusal: payload not a dimension of the cube
    assert router.route(AggregateRequest(
        source="events", group_by=("event_type",),
        measures=(("who", "top_by", "value", "props", 2),),
    )).cube is None
    # source fallback through the same two-level shape
    req3 = AggregateRequest(
        source="events", group_by=(("ts", "day"),),
        measures=(("who", "bottom_by", "value", "user_id", 3),),
    )
    assert router.route(req3).cube is None
    got3 = {
        (r["ts_day"],): r["who"]
        for r in router.execute(req3, source_df=events).collect()
    }
    want3 = topby_reference(
        events.withColumn("ts_day", F.date_trunc("day", "ts")), 3, True, "ts_day"
    )
    assert got3 == want3


# ---------------------------------------------------------------------------
# combine_cells — lambda serving for the exact two-level routes
# ---------------------------------------------------------------------------

def test_combine_cells_serves_two_level_routes_fresh(spark, events):
    """Union-then-re-merge keeps ONE live cell per (group, value), so
    every exact route answers correctly over cells + un-absorbed tail."""
    from mongo_olap_spark.cube.query import (
        combine_cells,
        distinct_rollup,
        quantile_rollup,
        topk_rollup,
    )

    head = events.filter(F.col("event_id") % 3 != 0)
    tail = events.filter(F.col("event_id") % 3 == 0)
    spec = CubeSpec(
        name="hy",
        source="events",
        dimensions=(Dimension("event_type"), Dimension("value")),
        measures=(Measure("n", "count"),),
    )
    stale = build_cube(spark, spec, head)
    fresh = combine_cells(spec, stale, build_cube(spark, spec, tail))
    full = build_cube(spark, spec, events)
    # the combined cell table is row-identical to a from-scratch build
    assert {tuple(r) for r in fresh.collect()} == {tuple(r) for r in full.collect()}
    # and the exact routes answer fresh
    rows = lambda df: {
        tuple(tuple(v) if isinstance(v, list) else v for v in r) for r in df.collect()
    }
    assert rows(
        quantile_rollup(fresh, spec, ["event_type"], "value", 0.5, alias="p50")
    ) == rows(quantile_rollup(full, spec, ["event_type"], "value", 0.5, alias="p50"))
    assert rows(
        extremes_rollup(fresh, spec, ["event_type"], "value", 5, alias="m")
    ) == rows(extremes_rollup(full, spec, ["event_type"], "value", 5, alias="m"))
    assert rows(
        topk_rollup(fresh, spec, ["event_type"], "value", 3, count_alias="c")
    ) == rows(topk_rollup(full, spec, ["event_type"], "value", 3, count_alias="c"))
    u = CubeSpec(
        name="hy2",
        source="events",
        dimensions=(Dimension("event_type"), Dimension("user_id")),
        measures=(Measure("n", "count"),),
    )
    fresh_u = combine_cells(
        u, build_cube(spark, u, head), build_cube(spark, u, tail)
    )
    assert rows(
        distinct_rollup(fresh_u, u, ["event_type"], "user_id", alias="d")
    ) == rows(
        distinct_rollup(build_cube(spark, u, events), u, ["event_type"], "user_id", alias="d")
    )


def test_combine_cells_all_measure_families(spark, events):
    """The re-merge produces a valid cell table for every storage kind
    — rolled answers over the combined table equal a from-scratch
    build's (bitwise for the retractable families)."""
    from mongo_olap_spark.cube.query import combine_cells, query_cube
    from mongo_olap_spark.queries.core import USERS_TOPK_CUBE

    spec = CubeSpec(
        name="hy3",
        source="events",
        dimensions=(Dimension("event_type"),),
        measures=(
            Measure("n", "count"),
            Measure("total", "sum", "value"),
            Measure("avg_v", "avg", "value"),
            Measure("lo", "min", "value"),
            Measure("hi", "max", "value"),
            Measure("users", "distinct", "user_id", lgk=14),
            Measure("p50", "quantile", "value", lo=0.0, hi=1000.0, nbins=50),
            Measure("vv", "var_pop", "value"),
        ),
    )
    head = events.filter(F.col("event_id") % 2 == 0)
    tail = events.filter(F.col("event_id") % 2 == 1)
    fresh = combine_cells(
        spec, build_cube(spark, spec, head), build_cube(spark, spec, tail)
    )
    full = build_cube(spark, spec, events)
    got = {r["event_type"]: r for r in query_cube(fresh, spec).collect()}
    want = {r["event_type"]: r for r in query_cube(full, spec).collect()}
    assert set(got) == set(want)
    for k in want:
        for m in ["n", "total", "avg_v", "lo", "hi", "users", "p50", "vv"]:
            assert got[k][m] == pytest.approx(want[k][m], rel=1e-9), (k, m)
    # frequent-items maps merge too (exact regime at test cardinality)
    tk_fresh = combine_cells(
        USERS_TOPK_CUBE,
        build_cube(spark, USERS_TOPK_CUBE, head),
        build_cube(spark, USERS_TOPK_CUBE, tail),
    )
    from mongo_olap_spark.cube.query import query_cube as qc

    norm = lambda df: {
        r["event_type"]: [(e["item"], e["count"]) for e in r["top_users"]]
        for r in qc(df, USERS_TOPK_CUBE, group_by=["event_type"], measures=["top_users"]).collect()
    }
    assert norm(tk_fresh) == norm(build_cube(spark, USERS_TOPK_CUBE, events))
