"""Advisor calibration probe (r15, VERDICT r14 task 6).

The HRU greedy ranks candidate cubes by PREDICTED benefit — weighted
rows-not-scanned: ``Σ weight × (qualifying_source_rows − cube_cells)``
(plans/advisor.py step 4). The latency probes measure REAL serve
costs, so the two can now be compared: for each workload query this
tool measures the direct (source-scan) latency and the routed
(cube-serve) latency around a real ``engine.create_cube``, derives
the implied seconds-per-row constant ``k_i = measured_saving_sec /
predicted_saving_rows`` per query, and reports the calibration error
(the spread of ``k_i`` — the greedy's ranking is faithful iff rows
saved is a consistent linear proxy for seconds saved across queries
of one source).

Outputs one JSON document per scale to ``ADVISOR_CALIB.json`` and
prints the verdict. Methodology notes:

- Latencies are repeat-min of 3 ``collect()`` runs (same policy as
  BENCH_self); the FIRST run of each side is discarded as warmup.
- The predicted side uses the advisor's own numbers: ``est_cells``
  from the advice and the exact qualifying row count (the greedy's
  ``flt_rows`` initialization) — no private re-implementation.
- The benefit model is deliberately unitless (rows): calibration
  asks whether the RANKING is right, not whether rows are seconds.
  A systematic per-source constant is fine (HRU only compares
  candidates on one workload); a WIDE spread within one source would
  mean the scan-cost proxy misranks — that is the defect to look for.

Usage:
    python tools/advisor_calib.py [sf_dir ...]
        (default: /root/testdata/sf0.1 /tmp/sf1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _timed(df, repeats: int = 3) -> float:
    """repeat-min collect latency, first (warmup) run discarded."""
    df.collect()
    times = []
    for _ in range(repeats):
        t0 = time.time()
        df.collect()
        times.append(time.time() - t0)
    return min(times)


def workload():
    from mongo_olap_spark.plans.router import AggregateRequest

    return [
        AggregateRequest(source="events", group_by=("event_type",),
                         measures=(("n", "count", None),
                                   ("total", "sum", "value"))),
        AggregateRequest(source="events", group_by=(("ts", "day"),),
                         measures=(("n", "count", None),
                                   ("avg_v", "avg", "value"))),
        AggregateRequest(source="events",
                         group_by=("event_type", ("ts", "day")),
                         measures=(("total", "sum", "value"),)),
        AggregateRequest(source="events", group_by=("user_id",),
                         measures=(("n", "count", None),)),
        AggregateRequest(source="events", group_by=(("ts", "hour"),),
                         measures=(("n", "count", None),
                                   ("total", "sum", "value")),
                         filter_sql="event_type = 'purchase'"),
    ]


def calibrate(spark, sf_dir: str) -> dict:
    from mongo_olap_spark.engine import OlapEngine
    from mongo_olap_spark.plans.advisor import advise
    from mongo_olap_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    wl = workload()
    advice = advise(wl, {"events": events})

    root = tempfile.mkdtemp(prefix="advisor_calib_")
    engine = OlapEngine(spark, root)

    # measure DIRECT latency first (no cubes exist yet → source route)
    def run(req):
        return engine.query(
            source=req.source, group_by=list(req.group_by),
            measures=[m if isinstance(m, str) else tuple(m)
                      for m in req.measures],
            source_df=(events.filter(req.filter_sql)
                       if req.filter_sql else events))

    direct_s = [_timed(run(req)) for req in wl]

    # materialize the advice, then measure ROUTED latency
    for spec in advice.cubes:
        if spec.name in set(advice.assignment.values()):
            engine.create_cube(spec, events)
    routed_s = [_timed(run(req)) for req in wl]

    rows = []
    ks = []
    for qi, req in enumerate(wl):
        cube = advice.assignment.get(qi)
        qualifying = (events.filter(req.filter_sql) if req.filter_sql
                      else events).count()
        pred_rows = (qualifying - advice.est_cells[cube]) if cube else 0
        meas = direct_s[qi] - routed_s[qi]
        k = (meas / pred_rows * 1e6) if cube and pred_rows > 0 else None
        if k is not None:
            ks.append(k)
        rows.append({
            "query": qi,
            "group_by": [list(g) if isinstance(g, tuple) else g
                         for g in req.group_by],
            "cube": cube,
            "qualifying_rows": qualifying,
            "est_cells": advice.est_cells.get(cube) if cube else None,
            "pred_saving_rows": pred_rows if cube else None,
            "direct_s": round(direct_s[qi], 4),
            "routed_s": round(routed_s[qi], 4),
            "measured_saving_s": round(meas, 4),
            "k_us_per_row": round(k, 4) if k is not None else None,
        })

    # ranking fidelity: does predicted-saving order match measured?
    served = [r for r in rows if r["cube"]]
    pred_order = sorted(served, key=lambda r: -r["pred_saving_rows"])
    meas_order = sorted(served, key=lambda r: -r["measured_saving_s"])
    rank_agree = [a["query"] for a in pred_order] == [
        a["query"] for a in meas_order]
    # implied fixed serve floor: the routed latency a cube pays before
    # any cell is aggregated (manifest + partition listing + small-file
    # reads). Approximated by the smallest routed latency — every serve
    # pays at least it. Suggested serve_overhead_rows converts it to
    # the advisor's row units via the direct-scan per-row rate.
    scan_rates = [r["direct_s"] / r["qualifying_rows"] for r in rows
                  if r["qualifying_rows"]]
    per_row_s = statistics.median(scan_rates) if scan_rates else None
    floor_s = min((r["routed_s"] for r in served), default=None)
    out = {
        "sf_dir": sf_dir,
        "events_rows": events.count(),
        "coverage": round(advice.coverage, 4),
        "queries": rows,
        "k_median_us_per_row": round(statistics.median(ks), 4) if ks else None,
        "k_spread_max_over_min": (round(max(ks) / min(ks), 2)
                                  if len(ks) > 1 and min(ks) > 0 else None),
        "rank_agreement": rank_agree,
        "routed_all_faster": all(r["measured_saving_s"] > 0
                                 for r in served),
        "fixed_serve_floor_s": round(floor_s, 4) if floor_s else None,
        "suggested_serve_overhead_rows": (
            int(floor_s / per_row_s) if floor_s and per_row_s else None),
    }
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1"]
    from mongo_olap_spark.session import get_spark

    spark = get_spark("advisor-calib")
    results = []
    for d in dirs:
        if not os.path.isdir(d):
            print(f"skip {d}: missing")
            continue
        r = calibrate(spark, d)
        results.append(r)
        print(json.dumps(r))
    with open(os.path.join(REPO, "ADVISOR_CALIB.json"), "w") as f:
        json.dump({"runs": results}, f, indent=1)
    print("wrote ADVISOR_CALIB.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
