"""Two-decade perf ladder: sf1 → sf10 → sf100 in ONE idle session (r16).

The sf100 story so far is correctness-shaped (probe r15, full gate
r16 session 1); this is the matching THROUGHPUT artifact: the same
headline queries timed at three scales in one JVM, with the AQE-final
plan fingerprint recorded at every rung. Invariants mirror
tools/decade_probe.py:

- **zero plan drift** across BOTH decades (join strategy, exchange
  kinds, window modes, Python stage counts identical modulo partition
  counts) — a broadcast→SMJ flip or a new exchange appearing only at
  sf100 is exactly the class of silent regression a 1000-executor
  deployment would hit first;
- **growth factors** wall(sf10)/wall(sf1) and wall(sf100)/wall(sf10)
  reported per query; the r10 rule applies — a mover above the flag
  threshold is investigated by OUTPUT first (semantic growth is not a
  plan defect) and documented, not auto-failed.

Query set: one representative per plan family that is feasible at
full sf100 with bounded output — cube build/serve/certified-topk/
sketch-quantile, IVM, banded dedup (minhash + simhash), bucketed ANN,
map-only text, the BPE Arrow encode + count-shuffle pack, and the
compiler's expression-heavy pipeline. The Θ(n²)/pair-output shapes
(ngram census, range band, leakage CC) are excluded for the same
reasons tools/decade_probe.py documents — their cost IS the answer
size, and their sf100 behavior is already pinned by the r16 gate's
stratum + census phases.

Usage:
    python tools/perf_ladder.py [--sf1 /tmp/sf1] [--sf10 /tmp/sf10]
        [--sf100 /tmp/sf100] [--out SCALE_PROBE_LADDER.json]
        [--queries q_a,q_b]

Run IDLE. Exits nonzero on critical plan drift.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROW_CAP = 100_000  # bench.py's bounded-collect protocol
FLAG_FACTOR = 15.0  # >15x across a 10x decade → investigate

DEFAULT_QUERIES = [
    # cube family: build, metadata-routed serve, certified topk,
    # sketch quantile, IVM insert cadence
    "q_cube_build", "q_route_cube", "q_cube_topn", "q_cube_quantile",
    "q_incr_insert",
    # dedup at census scale (banded paths; pair-output shapes excluded)
    "q_dedup_minhash", "q_dedup_simhash",
    # bucketed ANN
    "q_knn_lsh",
    # text: map-only scoring + tokenizer-grade encode/pack
    "q_lang_id", "q_token_count", "q_pack_bpe",
    # pipeline compiler expression surface
    "q_pipeline_expr_agg",
]

RUNGS = ("sf1", "sf10", "sf100")


def run_one(spark, fn, sf_dir):
    from mongo_olap_spark.plans.fingerprint import fingerprint_df

    spark.catalog.clearCache()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    t0 = time.perf_counter()
    df = fn(spark, sf_dir).limit(ROW_CAP)
    n = len(df.collect())
    dt = time.perf_counter() - t0
    return dt, n, fingerprint_df(df)  # post-action => AQE-final shape


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default="/tmp/sf1")
    ap.add_argument("--sf10", default="/tmp/sf10")
    ap.add_argument("--sf100", default="/tmp/sf100")
    ap.add_argument("--out", default="SCALE_PROBE_LADDER.json")
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    import __spark_entry__ as ent
    from mongo_olap_spark.session import get_spark
    from mongo_olap_spark.plans.fingerprint import diff
    from tools.scale_probe import split_drift

    qids = args.queries.split(",") if args.queries else DEFAULT_QUERIES
    registry = ent.queries()
    missing = [q for q in qids if q not in registry]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 2

    dirs = {"sf1": args.sf1, "sf10": args.sf10, "sf100": args.sf100}
    for label, d in dirs.items():
        if not os.path.isdir(d):
            print(f"{label} dir missing: {d}", file=sys.stderr)
            return 2

    spark = get_spark("perf-ladder", shuffle_partitions=32)

    # JVM/codegen warmup (measurement-protocol warmup-share caveat)
    from mongo_olap_spark.sources.tables import load_table
    load_table(spark, args.sf1, "events").groupBy(
        "event_type").count().collect()
    spark.catalog.clearCache()

    results: dict = {}
    drift_fail = False
    for qid in qids:
        fn = registry[qid]
        per = {}
        for label in RUNGS:
            wall, rows, fp = run_one(spark, fn, dirs[label])
            per[label] = {"wall_s": round(wall, 2), "rows": rows, "fp": fp}
            print(f"{qid:22s} {label:5s} {wall:9.2f}s  rows={rows}",
                  flush=True)
        f1 = per["sf10"]["wall_s"] / max(per["sf1"]["wall_s"], 1e-9)
        f2 = per["sf100"]["wall_s"] / max(per["sf10"]["wall_s"], 1e-9)
        flags = []
        for lo, hi, f in (("sf1", "sf10", f1), ("sf10", "sf100", f2)):
            d = diff(per[lo]["fp"], per[hi]["fp"])
            critical, benign = split_drift(d)
            if critical:
                drift_fail = True
                flags.append({"decade": f"{lo}->{hi}", "drift": critical})
                print(f"  DRIFT {lo}->{hi}: {critical}", flush=True)
            if f > FLAG_FACTOR:
                flags.append({"decade": f"{lo}->{hi}", "factor": round(f, 2)})
                print(f"  FLAG  {lo}->{hi}: {f:.1f}x", flush=True)
        results[qid] = {
            "walls": {r: per[r]["wall_s"] for r in RUNGS},
            "rows": {r: per[r]["rows"] for r in RUNGS},
            "factor_sf1_sf10": round(f1, 2),
            "factor_sf10_sf100": round(f2, 2),
            "flags": flags,
        }

    out = {
        "protocol": "one idle JVM, clearCache+gc between queries, "
                    "bounded collect (cap 100k rows), AQE-final "
                    "fingerprints at every rung",
        "rungs": {r: dirs[r] for r in RUNGS},
        "flag_factor": FLAG_FACTOR,
        "queries": results,
        "drift_fail": drift_fail,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}; drift_fail={drift_fail}", flush=True)
    return 1 if drift_fail else 0


if __name__ == "__main__":
    sys.exit(main())
