"""Dispersion measures from cube state (C22) — variance/stddev
(pop + samp) stored as decomposed (Σx, Σx², n) exact DECIMAL partials.

The family's headline properties, all pinned here:
- fully retractable: signed decimal partials make incremental apply
  (deletes included) BIT-IDENTICAL to rebuild in any batch order —
  same strength as sum/avg/histogram, which HLL/min-max/topk lack;
- bit-stable: cell state identical under any source partitioning;
- one storage shape answers all four forms at query time
  (dispersion_estimates), and the router family-binds any requested
  form to any stored form;
- Mongo semantics: sample forms are NULL for n < 2; all-null groups
  are NULL throughout.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mongo_olap_spark.cube import CubeSpec, Dimension, Measure, build_cube, query_cube
from mongo_olap_spark.cube.build import delta_cells
from mongo_olap_spark.cube.ivm import merge_cells
from mongo_olap_spark.cube.lattice import build_cube_lattice, query_lattice
from mongo_olap_spark.cube.query import dispersion_estimates, hybrid_query
from mongo_olap_spark.queries.core import VALUE_DISPERSION_CUBE


def cells_set(df):
    return {tuple(r) for r in df.collect()}


def spark_native(events, op, *group_by):
    fn = {
        "var_pop": F.var_pop,
        "var_samp": F.var_samp,
        "stddev_pop": F.stddev_pop,
        "stddev_samp": F.stddev_samp,
    }[op]
    return events.groupBy(*group_by).agg(fn("value").alias("x"))


@pytest.mark.parametrize("op", ["var_pop", "var_samp", "stddev_pop", "stddev_samp"])
def test_rollup_matches_spark_native(spark, events, op):
    """The decomposed E[x²]−mean² result agrees with Spark's native
    (Welford-path) aggregate to float tolerance — the semantic check;
    the oracle gate separately pins bit-equality against the mirrored
    DuckDB formula."""
    spec = CubeSpec(
        name="disp",
        source="events",
        dimensions=(Dimension("event_type"),),
        measures=(Measure("m", op, "value"),),
    )
    cells = build_cube(spark, spec, events)
    got = {r["event_type"]: r["m"] for r in query_cube(cells, spec).collect()}
    want = {r["event_type"]: r["x"] for r in spark_native(events, op, "event_type").collect()}
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-9, abs=1e-9), (k, got[k], v)


def test_state_bit_identical_under_partitioning(spark, events):
    a = build_cube(spark, VALUE_DISPERSION_CUBE, events.repartition(1))
    b = build_cube(spark, VALUE_DISPERSION_CUBE, events.repartition(13, "user_id"))
    assert cells_set(a) == cells_set(b)


def test_insert_merge_equals_rebuild_bitwise(spark, events):
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)
    cells = build_cube(spark, VALUE_DISPERSION_CUBE, half1)
    deltas = delta_cells(VALUE_DISPERSION_CUBE, half2.withColumn("mult", F.lit(1)))
    merged = merge_cells(cells, deltas, VALUE_DISPERSION_CUBE)
    rebuilt = build_cube(spark, VALUE_DISPERSION_CUBE, events)
    assert cells_set(merged) == cells_set(rebuilt)


def test_is_fully_retractable_bitwise(spark, events):
    """Deletes maintain incrementally — merged state after −1 deltas is
    bit-identical to a from-scratch rebuild of the survivors, with NO
    recompute_cells repair pass."""
    assert VALUE_DISPERSION_CUBE.delete_safe
    assert VALUE_DISPERSION_CUBE.measure("var_value").delete_safe
    doomed = events.orderBy("event_id").limit(50).cache()
    survivors = events.join(doomed.select("event_id"), "event_id", "left_anti").cache()
    cells = build_cube(spark, VALUE_DISPERSION_CUBE, events)
    deltas = delta_cells(VALUE_DISPERSION_CUBE, doomed.withColumn("mult", F.lit(-1)))
    merged = merge_cells(cells, deltas, VALUE_DISPERSION_CUBE)
    want = build_cube(spark, VALUE_DISPERSION_CUBE, survivors)
    assert cells_set(merged) == cells_set(want)


def test_sample_forms_null_below_two_and_all_null_groups(spark):
    spec = CubeSpec(
        name="disp_edge",
        source="t",
        dimensions=(Dimension("g"),),
        measures=(
            Measure("n", "count"),
            Measure("v", "var_samp", "x"),
            Measure("s", "stddev_samp", "x"),
            Measure("vp", "var_pop", "x"),
        ),
    )
    df = spark.createDataFrame(
        [("one", 5.0), ("nulls", None), ("nulls", None), ("two", 1.0), ("two", 3.0)],
        "g string, x double",
    )
    cells = build_cube(spark, spec, df)
    out = {r["g"]: r for r in query_cube(cells, spec).collect()}
    assert out["one"]["v"] is None and out["one"]["s"] is None  # n=1
    assert out["one"]["vp"] == 0.0  # pop variance of a single value
    assert out["nulls"]["v"] is None and out["nulls"]["vp"] is None  # n=0
    assert out["two"]["v"] == pytest.approx(2.0)  # ((1-2)²+(3-2)²)/(2-1)
    assert out["two"]["s"] == pytest.approx(math.sqrt(2.0))
    assert out["two"]["vp"] == pytest.approx(1.0)


def test_dispersion_estimates_multi_form_one_pass(spark, events):
    cells = build_cube(spark, VALUE_DISPERSION_CUBE, events)
    out = dispersion_estimates(
        cells,
        VALUE_DISPERSION_CUBE,
        "var_value",
        ["var_pop", "var_samp", "stddev_pop", "stddev_samp"],
        group_by=["event_type"],
        measures=["n"],
    )
    rows = {r["event_type"]: r for r in out.collect()}
    for op in ["var_pop", "var_samp", "stddev_pop", "stddev_samp"]:
        want = {r["event_type"]: r["x"] for r in spark_native(events, op, "event_type").collect()}
        for k, v in want.items():
            assert rows[k][f"var_value_{op}"] == pytest.approx(v, rel=1e-9), (op, k)


def test_dispersion_estimates_rejects_bad_args(spark, events):
    cells = build_cube(spark, VALUE_DISPERSION_CUBE, events)
    with pytest.raises(ValueError, match="not a dispersion measure"):
        dispersion_estimates(cells, VALUE_DISPERSION_CUBE, "n", ["var_pop"])
    with pytest.raises(ValueError, match="unknown dispersion ops"):
        dispersion_estimates(cells, VALUE_DISPERSION_CUBE, "var_value", ["median"])
    with pytest.raises(ValueError, match="aliases must match"):
        dispersion_estimates(
            cells, VALUE_DISPERSION_CUBE, "var_value", ["var_pop"], aliases=["a", "b"]
        )


def test_lattice_finalize_and_rollup(spark, events):
    levels = [("event_type", "day"), ("event_type",), ()]
    cells = build_cube_lattice(spark, VALUE_DISPERSION_CUBE, events, levels)
    hit = query_lattice(cells, VALUE_DISPERSION_CUBE, ["event_type"], measures=["var_value"])
    want = {r["event_type"]: r["x"] for r in spark_native(events, "var_pop", "event_type").collect()}
    got = {r["event_type"]: r["var_value"] for r in hit.collect()}
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-9)


def test_hybrid_query_merges_tail(spark, events):
    head = events.filter(F.col("event_id") % 3 != 0)
    tail = events.filter(F.col("event_id") % 3 == 0)
    cells = build_cube(spark, VALUE_DISPERSION_CUBE, head)
    got = hybrid_query(
        cells, VALUE_DISPERSION_CUBE, tail, group_by=["event_type"], measures=["var_value"]
    )
    want = {r["event_type"]: r["x"] for r in spark_native(events, "var_pop", "event_type").collect()}
    for r in got.collect():
        assert r["var_value"] == pytest.approx(want[r["event_type"]], rel=1e-9)


def test_spec_validation_and_json_roundtrip():
    m = Measure("v", "stddev_samp", "x")
    assert m.delete_safe
    assert m.storage_cols() == ["v_sum", "v_sum2", "v_cnt"]
    spec = CubeSpec(
        name="c",
        source="s",
        dimensions=(Dimension("g"),),
        measures=(Measure("n", "count"), Measure("v", "var_samp", "x")),
    )
    assert CubeSpec.from_json(spec.to_json()) == spec


def test_router_family_binding(spark, events, tmp_path):
    """A stddev_pop request is served by a var_pop cube on the same
    path: identical storage, the requested finalizer runs over it."""
    from mongo_olap_spark.cube import CubeCatalog
    from mongo_olap_spark.plans import AggregateRequest, CubeRouter

    cat = CubeCatalog(spark, str(tmp_path / "disp_cubes"))
    cat.create(VALUE_DISPERSION_CUBE, events)
    router = CubeRouter(cat)
    req = AggregateRequest(
        source="events",
        group_by=("event_type",),
        measures=(("sd", "stddev_pop", "value"), ("n", "count")),
    )
    d = router.route(req)
    assert d.cube == VALUE_DISPERSION_CUBE.name
    assert d.measure_renames["sd"] == ("disp", "var_value", "stddev_pop")
    got = {r["event_type"]: (r["sd"], r["n"]) for r in router.execute(req).collect()}
    want = {r["event_type"]: r["x"] for r in spark_native(events, "stddev_pop", "event_type").collect()}
    n_want = {r["event_type"]: r["c"] for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("c")).collect()}
    for k in want:
        assert got[k][0] == pytest.approx(want[k], rel=1e-9)
        assert got[k][1] == n_want[k]


def test_router_exact_op_binding_and_fallback(spark, events, tmp_path):
    from mongo_olap_spark.cube import CubeCatalog
    from mongo_olap_spark.plans import AggregateRequest, CubeRouter

    cat = CubeCatalog(spark, str(tmp_path / "disp_cubes2"))
    cat.create(VALUE_DISPERSION_CUBE, events)
    router = CubeRouter(cat)
    # exact op binds by (op, path) under a different requested name
    req = AggregateRequest(
        source="events",
        group_by=("event_type",),
        measures=(("my_var", "var_pop", "value"),),
    )
    d = router.route(req)
    assert d.cube == VALUE_DISPERSION_CUBE.name and d.measure_renames["my_var"] == "var_value"
    # no serving cube (group by a dim the cube lacks) — source fallback
    # builds the same decomposed shape
    req2 = AggregateRequest(
        source="events",
        group_by=("user_id",),
        measures=(("sd", "stddev_samp", "value"),),
    )
    assert router.route(req2).cube is None
    got = {r["user_id"]: r["sd"] for r in router.execute(req2, source_df=events).collect()}
    want = {r["user_id"]: r["x"] for r in spark_native(events, "stddev_samp", "user_id").collect()}
    for k, v in want.items():
        if v is None:
            assert got[k] is None
        else:
            assert got[k] == pytest.approx(v, rel=1e-9)
