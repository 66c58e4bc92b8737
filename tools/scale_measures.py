"""1x vs 10x scale probe for the round-9 measure families (C20-C24).

For each new measure family, build its cube and run its headline
rollup at sf0.1 and at the 10x synthesis, recording wall time and the
normalized physical-plan fingerprint. The claims under test:

- build cost grows ~linearly (it is one scan + one partial/final hash
  aggregate — no superlinear term);
- rollup cost tracks CELL count, not source rows (the whole point of
  pre-aggregation): for the bounded-state sketches (histogram, map)
  the cell count is data-size-invariant, so rollup time should be
  ~flat; two-level cubes grow cells with cardinality (documented
  trade), so their rollups may grow but never rescan the source;
- plan SHAPE is identical at both sizes (no strategy flip, no new
  exchange — fingerprint-diff empty modulo AQE partition counts).

Usage:
    python tools/scale_measures.py [--src /root/testdata/sf0.1]
        [--dst /tmp/scale10x] [--factor 10] [--out SCALE_PROBE_MEASURES.json]

Prints ONE JSON line; exits nonzero if any plan shape drifts or any
sketch rollup grows superlinearly (>3x for 10x data — generous band
for the fixed-cost-dominated regime).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/scale10x")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="SCALE_PROBE_MEASURES.json")
    args = ap.parse_args()

    from mongo_olap_spark.cube import CubeSpec, Dimension, Measure, build_cube
    from mongo_olap_spark.cube.query import (
        dispersion_estimates,
        extremes_rollup,
        quantile_estimates,
        quantile_rollup,
        query_cube,
        top_by_rollup,
        topk_estimates,
        topk_rollup,
    )
    from mongo_olap_spark.plans.fingerprint import diff, fingerprint_df
    from mongo_olap_spark.session import get_spark
    from tools.scale_probe import split_drift, synthesize

    spark = get_spark("scale_measures")
    spark.sparkContext.setLogLevel("ERROR")
    synthesize(spark, args.src, args.dst, args.factor)

    hist_cube = CubeSpec(
        name="sm_hist", source="events",
        dimensions=(Dimension("event_type"), Dimension("day", path="ts", granularity="day")),
        measures=(
            Measure("n", "count"),
            Measure("p50", "quantile", "value", lo=0.0, hi=1000.0, nbins=100),
            Measure("vv", "var_pop", "value"),
        ),
    )
    topk_cube = CubeSpec(
        name="sm_topk", source="events",
        dimensions=(Dimension("event_type"), Dimension("day", path="ts", granularity="day")),
        measures=(Measure("n", "count"), Measure("tu", "topk", "user_id", k=3, max_items=65536)),
    )
    two_level = CubeSpec(
        name="sm_two", source="events",
        dimensions=(Dimension("event_type"), Dimension("value")),
        measures=(Measure("n", "count"),),
    )
    three_level = CubeSpec(
        name="sm_three", source="events",
        dimensions=(Dimension("event_type"), Dimension("value"), Dimension("user_id")),
        measures=(Measure("n", "count"),),
    )

    def events_at(d: str):
        from mongo_olap_spark.sources.tables import load_table

        if d == args.src:
            return load_table(spark, d, "events")
        return spark.read.parquet(os.path.join(d, "events.parquet"))

    #: (label, build spec, rollup fn over (cells, spark)); rollup fns
    #: consume the materialized cells only — never the source
    CASES = [
        ("hist_dispersion", hist_cube, lambda c: dispersion_estimates(
            c, hist_cube, "vv", ["var_pop", "stddev_samp"], ["event_type"])),
        ("hist_quantiles", hist_cube, lambda c: quantile_estimates(
            c, hist_cube, "p50", [0.25, 0.5, 0.95], ["event_type"])),
        ("topk_fold", topk_cube, lambda c: query_cube(
            c, topk_cube, group_by=["event_type"], measures=["tu"])),
        ("topk_explode", topk_cube, lambda c: topk_estimates(
            c, topk_cube, "tu", 3, ["event_type"])),
        ("two_level_quantile", two_level, lambda c: quantile_rollup(
            c, two_level, ["event_type"], "value", 0.5)),
        ("two_level_topn", three_level, lambda c: topk_rollup(
            c, three_level, ["event_type"], "user_id", 3)),
        ("two_level_minn", two_level, lambda c: extremes_rollup(
            c, two_level, ["event_type"], "value", 5)),
        ("two_level_topby", three_level, lambda c: top_by_rollup(
            c, three_level, ["event_type"], "value", "user_id", 3)),
    ]

    results: dict = {}
    drift_fail: list[str] = []
    sketch_fail: list[str] = []
    cells_cache: dict = {}
    for d, tag in ((args.src, "x1"), (args.dst, "x10")):
        ev = events_at(d)
        for label, spec, roll in CASES:
            key = (spec.name, tag)
            if key not in cells_cache:
                t0 = time.perf_counter()
                cells = build_cube(spark, spec, ev)
                cells = cells.localCheckpoint()  # materialize the build
                bt = time.perf_counter() - t0
                cells_cache[key] = (cells, bt)
            cells, bt = cells_cache[key]
            t0 = time.perf_counter()
            out = roll(cells)
            n = out.count()
            rt = time.perf_counter() - t0
            fp = fingerprint_df(out)
            r = results.setdefault(label, {})
            r[tag] = {
                "build_s": round(bt, 2), "rollup_s": round(rt, 2),
                "rows": n, "cells": cells.count(),
            }
            r.setdefault("_fp", {})[tag] = fp
    for label, r in results.items():
        critical, benign = split_drift(diff(r["_fp"]["x1"], r["_fp"]["x10"]))
        r["plan_drift_critical"] = critical
        r["plan_drift_benign_keys"] = sorted(benign)
        del r["_fp"]
        if critical:
            drift_fail.append(label)
        if label.startswith(("hist", "topk")):
            ratio = r["x10"]["rollup_s"] / max(r["x1"]["rollup_s"], 1e-9)
            r["rollup_ratio"] = round(ratio, 2)
            if ratio > 3.0:
                sketch_fail.append(label)

    ok = not drift_fail and not sketch_fail
    out = {
        "metric": "scale_measures",
        "factor": args.factor,
        "cases": results,
        "plan_drift_failures": drift_fail,
        "sketch_rollup_failures": sketch_fail,
        "ok": ok,
    }
    print(json.dumps(out))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
