"""Window-operator semantics that the DuckDB oracle can't express:
$expMovingAvg (recursive — checked against a pure-Python reference
recursion) and edge behavior of $linearFill."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_olap_spark.queries.windows import (
    EMA_ALPHA,
    exp_moving_avg,
    q_fill_linear,
    q_window_ema,
)
from mongo_olap_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_ema_matches_reference_recursion(spark):
    """ema_1 = v_1; ema_i = α·v_i + (1−α)·ema_{i−1} — Mongo's
    $expMovingAvg contract, per partition in (ts, event_id) order."""
    got = q_window_ema(spark, SF).collect()
    rows = (
        load_table(spark, SF, "events")
        .select("user_id", "ts", "event_id", "value")
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    expected = {}
    ema = None
    last_user = object()
    for r in rows:
        if r.user_id != last_user:
            ema, last_user = None, r.user_id
        ema = r.value if ema is None else EMA_ALPHA * r.value + (1 - EMA_ALPHA) * ema
        expected[(r.user_id, r.event_id)] = ema
    assert len(got) == len(expected)
    # the operator rounds to 6 dp; a reference value sitting exactly on
    # a rounding boundary may land one grid step away — allow that, and
    # nothing more (semantic errors produce O(1) differences)
    for r in got:
        assert abs(r.ema - expected[(r.user_id, r.event_id)]) < 2e-6, (
            r.user_id,
            r.event_id,
        )


def test_ema_is_partition_sorted_arrow_stream(spark):
    plan = (
        q_window_ema(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one shuffle on the key, then a per-partition Arrow stream (cost
    # per batch, not per group — many small keys stay cheap)
    assert "MapInPandas" in plan
    assert "Exchange hashpartitioning" in plan
    assert "BatchEvalPython" not in plan  # never row-at-a-time Python


def test_ema_alpha_bounds(spark):
    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate([10, 20, 30, 40])],
        ["k", "i", "v"],
    )
    out = exp_moving_avg(df, "k", ["i"], "v", alpha=1.0).orderBy("i").collect()
    assert [r.ema for r in out] == [10.0, 20.0, 30.0, 40.0]  # α=1 tracks v


def test_linear_fill_anchors_and_interior(spark):
    rows = q_fill_linear(spark, SF).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r.day)
        vals = [r.v_lin for r in rs]
        known = [i for i, v in enumerate(vals) if v is not None]
        if len(known) < 2:
            continue
        lo, hi = known[0], known[-1]
        # interior gaps are filled (no nulls between the anchors) …
        assert all(v is not None for v in vals[lo : hi + 1])
        # … and edges outside the anchors stay null ($linearFill contract)
        assert all(v is None for v in vals[:lo] + vals[hi + 1 :])
