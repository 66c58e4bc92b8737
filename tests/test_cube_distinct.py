"""Count-distinct from cube state — the HLL-sketch measure (bounded
state, insert-mergeable, approximate) and the exact two-level
decomposition (distinct column as a dimension; fully retractable).

Exactness note: a Datasketches HLL sketch is EXACT while in sparse
(list/set) mode — the sf0.001 fixture's 15 users sit far below the
promotion threshold, so estimate == exact here is a real equality
test, not a tolerance check. High-cardinality behavior (bounded
relative error) is probed separately.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_olap_spark.cube import CubeSpec, Dimension, Measure, build_cube, query_cube
from mongo_olap_spark.cube.build import delta_cells
from mongo_olap_spark.cube.ivm import merge_cells, recompute_cells
from mongo_olap_spark.cube.lattice import build_cube_lattice, query_lattice
from mongo_olap_spark.cube.query import distinct_rollup, hybrid_query
from mongo_olap_spark.queries.core import USERS_EXACT_CUBE, USERS_HLL_CUBE


def rows_set(df):
    return {tuple(r) for r in df.collect()}


def exact_users(events, *group_by):
    return events.groupBy(*group_by).agg(
        F.count_distinct("user_id").cast("long").alias("users")
    )


# ---------------------------------------------------------------------------
# HLL distinct measure
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("subset", [(), ("event_type",), ("day",), ("event_type", "day")])
def test_hll_rollup_equals_exact_at_sparse_cardinality(spark, events, subset):
    cells = build_cube(spark, USERS_HLL_CUBE, events)
    rolled = query_cube(cells, USERS_HLL_CUBE, group_by=list(subset), measures=["users"])
    direct = exact_users(events.withColumn("day", F.date_trunc("day", "ts")), *subset)
    assert rows_set(rolled) == rows_set(direct)


def test_hll_estimate_invariant_under_partitioning(spark, events):
    """Sketch estimates must not depend on how the source was split —
    register maxima are merge-order independent."""
    a = query_cube(
        build_cube(spark, USERS_HLL_CUBE, events.repartition(1)),
        USERS_HLL_CUBE, group_by=["event_type"], measures=["users"],
    )
    b = query_cube(
        build_cube(spark, USERS_HLL_CUBE, events.repartition(13, "user_id")),
        USERS_HLL_CUBE, group_by=["event_type"], measures=["users"],
    )
    assert rows_set(a) == rows_set(b)


def test_hll_insert_merge_equals_rebuild(spark, events):
    """Incremental inserts (delta sketches unioned into cells) answer
    identically to a batch rebuild."""
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)
    cells = build_cube(spark, USERS_HLL_CUBE, half1)
    deltas = delta_cells(USERS_HLL_CUBE, half2.withColumn("mult", F.lit(1)))
    merged = merge_cells(cells, deltas, USERS_HLL_CUBE)
    rebuilt = build_cube(spark, USERS_HLL_CUBE, events)
    for gb in ([], ["event_type"]):
        assert rows_set(
            query_cube(merged, USERS_HLL_CUBE, group_by=gb, measures=["users"])
        ) == rows_set(query_cube(rebuilt, USERS_HLL_CUBE, group_by=gb, measures=["users"]))


def test_hll_not_delete_safe_and_recompute_repairs(spark, events):
    """distinct is flagged non-retractable; a delete repairs via the
    bounded recompute path and lands exactly on the reduced source."""
    assert not USERS_HLL_CUBE.delete_safe
    doomed = events.orderBy("event_id").limit(40).cache()
    survivors = events.join(doomed.select("event_id"), "event_id", "left_anti").cache()

    cells = build_cube(spark, USERS_HLL_CUBE, events)
    deltas = delta_cells(USERS_HLL_CUBE, doomed.withColumn("mult", F.lit(-1)))
    merged = merge_cells(cells, deltas, USERS_HLL_CUBE)
    touched = deltas.select(*USERS_HLL_CUBE.dim_names).distinct()
    repaired = recompute_cells(USERS_HLL_CUBE, survivors, merged, touched)

    want = build_cube(spark, USERS_HLL_CUBE, survivors)
    assert rows_set(
        query_cube(repaired, USERS_HLL_CUBE, measures=["n", "users"])
    ) == rows_set(query_cube(want, USERS_HLL_CUBE, measures=["n", "users"]))


def test_hll_merge_handles_one_sided_cells(spark, events):
    """A delta creating a brand-new cell (no current sketch) and a cell
    the delta never touches (no delta sketch) must both survive the
    merge — hll_union propagates NULL, so merge_cells coalesces."""
    first_day = events.orderBy("ts").limit(1).cache()
    rest = events.join(first_day.select("event_id"), "event_id", "left_anti")
    cells = build_cube(spark, USERS_HLL_CUBE, rest)
    deltas = delta_cells(USERS_HLL_CUBE, first_day.withColumn("mult", F.lit(1)))
    merged = merge_cells(cells, deltas, USERS_HLL_CUBE)
    want = build_cube(spark, USERS_HLL_CUBE, events)
    assert rows_set(query_cube(merged, USERS_HLL_CUBE, measures=["users"])) == rows_set(
        query_cube(want, USERS_HLL_CUBE, measures=["users"])
    )


def test_hll_lattice_finalize_and_rollup(spark, events):
    levels = [("event_type", "day"), ("event_type",), ()]
    cells = build_cube_lattice(spark, USERS_HLL_CUBE, events, levels=levels)
    src = events.withColumn("day", F.date_trunc("day", "ts"))
    for gb in (["event_type", "day"], ["event_type"], []):
        got = query_lattice(cells, USERS_HLL_CUBE, group_by=gb, measures=["users"])
        assert rows_set(got) == rows_set(exact_users(src, *gb))
    # a non-materialized level rolls up from the finest superset
    got = query_lattice(cells, USERS_HLL_CUBE, group_by=["day"], measures=["users"])
    assert rows_set(got) == rows_set(exact_users(src, "day"))


def test_hll_hybrid_query_merges_tail(spark, events):
    head = events.filter(F.col("event_id") % 3 != 0)
    tail = events.filter(F.col("event_id") % 3 == 0)
    cells = build_cube(spark, USERS_HLL_CUBE, head)
    got = hybrid_query(cells, USERS_HLL_CUBE, tail, group_by=["event_type"], measures=["users"])
    assert rows_set(got) == rows_set(exact_users(events, "event_type"))


def test_hll_high_cardinality_bounded_error(spark):
    """Past sparse mode the estimate carries the documented HLL error
    (~1.04/sqrt(2^lgk)); assert a 3-sigma envelope at 200k distinct."""
    n, lgk = 200_000, 14
    df = spark.range(n).select(F.col("id").cast("string").alias("u"), (F.col("id") % 4).alias("g"))
    spec = CubeSpec(
        name="hc", source="x",
        dimensions=(Dimension("g"),),
        measures=(Measure("n", "count"), Measure("users", "distinct", "u", lgk=lgk)),
    )
    cells = build_cube(spark, spec, df)
    [row] = query_cube(cells, spec, group_by=[], measures=["users"]).collect()
    rse = 1.04 / (2 ** (lgk / 2))
    assert abs(row.users - n) <= 3 * rse * n


def test_distinct_spec_validation_and_json_roundtrip():
    with pytest.raises(ValueError, match="lgk"):
        Measure("u", "sum", "x", lgk=12)
    with pytest.raises(ValueError, match="lgk"):
        Measure("u", "distinct", "x", lgk=3)
    with pytest.raises(ValueError, match="lgk"):
        Measure("u", "distinct", "x", lgk=22)
    assert CubeSpec.from_json(USERS_HLL_CUBE.to_json()) == USERS_HLL_CUBE
    assert CubeSpec.from_json(USERS_EXACT_CUBE.to_json()) == USERS_EXACT_CUBE


# ---------------------------------------------------------------------------
# Exact two-level decomposition
# ---------------------------------------------------------------------------

def test_exact_distinct_rollup_matches_source(spark, events):
    cells = build_cube(spark, USERS_EXACT_CUBE, events)
    got = distinct_rollup(cells, USERS_EXACT_CUBE, ["event_type"], "user_id", alias="users")
    assert rows_set(got) == rows_set(exact_users(events, "event_type"))


def test_exact_distinct_with_extra_dims_dedupes(spark, events):
    """When the cube carries extra dims (day), the same user owns one
    cell per day — the rollup must still count each user once."""
    spec = CubeSpec(
        name="users_by_day", source="events",
        dimensions=(
            Dimension("event_type"),
            Dimension("day", path="ts", granularity="day"),
            Dimension("user_id"),
        ),
        measures=(Measure("n", "count"),),
    )
    cells = build_cube(spark, spec, events)
    got = distinct_rollup(cells, spec, ["event_type"], "user_id", alias="users")
    assert rows_set(got) == rows_set(exact_users(events, "event_type"))


def test_exact_distinct_is_fully_retractable(spark, events):
    """Delete every event of one user: their cells hit multiplicity 0,
    evict, and the distinct count drops — no rescan, pure merge."""
    assert USERS_EXACT_CUBE.delete_safe
    [victim] = events.select("user_id").distinct().orderBy("user_id").limit(1).collect()
    doomed = events.filter(F.col("user_id") == victim.user_id)
    survivors = events.filter(F.col("user_id") != victim.user_id)

    cells = build_cube(spark, USERS_EXACT_CUBE, events)
    deltas = delta_cells(USERS_EXACT_CUBE, doomed.withColumn("mult", F.lit(-1)))
    merged = merge_cells(cells, deltas, USERS_EXACT_CUBE)
    got = distinct_rollup(merged, USERS_EXACT_CUBE, ["event_type"], "user_id", alias="users")
    assert rows_set(got) == rows_set(exact_users(survivors, "event_type"))


def test_distinct_rollup_rejects_bad_args(spark, events):
    cells = build_cube(spark, USERS_EXACT_CUBE, events)
    with pytest.raises(ValueError, match="not a cube dimension"):
        distinct_rollup(cells, USERS_EXACT_CUBE, ["event_type"], "nope")
    with pytest.raises(ValueError, match="cannot also be grouped"):
        distinct_rollup(cells, USERS_EXACT_CUBE, ["user_id"], "user_id")
    with pytest.raises(ValueError, match="group_by not in cube dims"):
        distinct_rollup(cells, USERS_EXACT_CUBE, ["nope"], "user_id")
