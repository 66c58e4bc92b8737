"""sf1 → sf10 next-decade scale probe (r13, VERDICT r12 task 3).

Rounds 5–10 proved the 0.1→1 decade (BASELINE.md). This probes the
NEXT one: the ~15 data-bound shapes run at sf1 and at sf10 (both
synthesized by ``tools/synth_sf1.py`` — same seed, mult 10 and 100),
recording per-query wall time, output rows, and the normalized
physical-plan fingerprint at both scales. Invariants:

- **zero plan drift**: the AQE-final plan shape (join strategies,
  exchange kinds, window modes, Python stage counts) is IDENTICAL at
  both sizes modulo partition counts — no broadcast→SMJ flip, no new
  exchange appearing at scale;
- **growth factor**: wall(sf10)/wall(sf1) reported per query; the
  r10 rule applies — a mover above the flag threshold is investigated
  by OUTPUT first (semantic growth is not a plan defect), and
  documented in BASELINE.md.

Deliberately excluded, with reasons the r10 sweep established:

- ``q_pipeline_lookup_range``: the 2% band's output is ∝ |L|·|R| —
  40.4M pairs at sf1 → ~4G at sf10. Producing the answer IS the cost;
  the adaptive-bucket plan was proven shape-stable through sf1 and
  its bucket count derives from a plan-time row count, so the plan
  cannot drift silently. Running it would measure answer
  materialization, not the engine.
- ``q_dedup_embedding``: the EXACT all-pairs route is Θ(n²) by
  definition (documented small-corpus-only); at 2M vectors that is
  4·10¹² sims. The probe instead measures the documented scale path —
  ``embedding_near_dup_pairs(strategy="bucketed")`` — at both sizes.

Usage:
    python tools/decade_probe.py [--sf1 /tmp/sf1] [--sf10 /tmp/sf10]
        [--out SCALE_PROBE_DECADE.json] [--queries q_a,q_b]

Run IDLE. Prints one line per (query, scale); exits nonzero on plan
drift. Wall-time flags are reported, not fatal (the r10 protocol:
investigate, attribute, document).
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

#: the data-bound shapes: text suite, dedup suite, ANN, decontaminate,
#: HOF width, cube build + routed serve, sketch cube, IVM cadence
DEFAULT_QUERIES = [
    # text suite
    "q_lang_id", "q_repetition", "q_unigram_logprob", "q_text_clean",
    "q_token_count", "q_pipeline_expr_agg",
    # dedup suite
    "q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram",
    "q_dedup_spans", "q_dup_groups", "q_dedup_keep",
    # ANN + decontamination
    "q_knn_lsh", "q_decontaminate",
    # cube build + routed serve + sketch state + IVM
    "q_route_cube", "q_cube_quantile", "q_incr_insert", "q_incr_delete",
]


def _run_query(spark, fn, sf_dir):
    from mongo_olap_spark.plans.fingerprint import fingerprint_df

    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    rows = df.limit(ROW_CAP).collect()
    wall = time.perf_counter() - t0
    fp = fingerprint_df(df)
    return wall, len(rows), fp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default="/tmp/sf1")
    ap.add_argument("--sf10", default="/tmp/sf10")
    ap.add_argument("--out", default="SCALE_PROBE_DECADE.json")
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    from mongo_olap_spark.session import get_spark
    from tools.scale_probe import split_drift

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as ent

    qids = (args.queries.split(",") if args.queries else DEFAULT_QUERIES)
    registry = ent.queries()
    missing = [q for q in qids if q not in registry]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 2

    spark = get_spark("decade-probe", shuffle_partitions=32)
    from mongo_olap_spark.plans.fingerprint import diff

    # JVM/codegen warmup so the first measured query isn't billed the
    # session bring-up (measurement-protocol warmup-share caveat)
    from mongo_olap_spark.sources.tables import load_table
    load_table(spark, args.sf1, "events").groupBy("event_type").count().collect()
    spark.catalog.clearCache()

    results: dict = {}
    drift_fail = False
    for qid in qids:
        fn = registry[qid]
        per = {}
        for label, sf_dir in (("sf1", args.sf1), ("sf10", args.sf10)):
            wall, rows, fp = _run_query(spark, fn, sf_dir)
            per[label] = {"wall_s": round(wall, 2), "rows": rows, "fp": fp}
            print(f"{qid:24s} {label:5s} {wall:8.2f}s  rows={rows}",
                  flush=True)
            spark.catalog.clearCache()
        factor = per["sf10"]["wall_s"] / max(per["sf1"]["wall_s"], 1e-9)
        real, benign = split_drift(diff(per["sf1"]["fp"], per["sf10"]["fp"]))
        entry = {
            "sf1_s": per["sf1"]["wall_s"], "sf10_s": per["sf10"]["wall_s"],
            "factor": round(factor, 2),
            "rows_sf1": per["sf1"]["rows"], "rows_sf10": per["sf10"]["rows"],
            "plan_drift": real, "benign_drift": benign,
            "flagged": factor > FLAG_FACTOR,
        }
        if real:
            drift_fail = True
            print(f"  !! PLAN DRIFT {qid}: {real}", flush=True)
        if entry["flagged"]:
            print(f"  ?? {qid} grew {factor:.1f}x — investigate output "
                  "first (r10 protocol)", flush=True)
        results[qid] = entry

    # the bucketed embedding scale path, measured directly
    from mongo_olap_spark.operators import similarity as sim
    from mongo_olap_spark.plans.fingerprint import fingerprint_df
    per = {}
    for label, sf_dir in (("sf1", args.sf1), ("sf10", args.sf10)):
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        t0 = time.perf_counter()
        df = sim.embedding_near_dup_pairs(emb, threshold=0.9,
                                          strategy="bucketed")
        rows = df.limit(ROW_CAP).collect()
        wall = time.perf_counter() - t0
        per[label] = {"wall_s": round(wall, 2), "rows": len(rows),
                      "fp": fingerprint_df(df)}
        print(f"{'embedding_bucketed':24s} {label:5s} {wall:8.2f}s  "
              f"rows={len(rows)}", flush=True)
        spark.catalog.clearCache()
    factor = per["sf10"]["wall_s"] / max(per["sf1"]["wall_s"], 1e-9)
    real, benign = split_drift(diff(per["sf1"]["fp"], per["sf10"]["fp"]))
    results["embedding_bucketed"] = {
        "sf1_s": per["sf1"]["wall_s"], "sf10_s": per["sf10"]["wall_s"],
        "factor": round(factor, 2),
        "rows_sf1": per["sf1"]["rows"], "rows_sf10": per["sf10"]["rows"],
        "plan_drift": real, "benign_drift": benign,
        "flagged": factor > FLAG_FACTOR,
    }
    if real:
        drift_fail = True

    payload = {
        "sf1": args.sf1, "sf10": args.sf10,
        "flag_factor": FLAG_FACTOR,
        "queries": results,
        "excluded": {
            "q_pipeline_lookup_range":
                "band output ∝ |L|·|R| (40.4M pairs at sf1 → ~4G at "
                "sf10) — semantic growth, plan proven shape-stable "
                "through sf1 with plan-time-derived bucket count",
            "q_dedup_embedding":
                "exact all-pairs Θ(n²) by definition (documented "
                "small-corpus-only); the bucketed scale path is "
                "measured above instead",
        },
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    n_flag = sum(1 for r in results.values() if r["flagged"])
    print(json.dumps({
        "metric": "decade_probe", "queries": len(results),
        "plan_drift": drift_fail, "flagged": n_flag, "out": args.out}))
    return 1 if drift_fail else 0


if __name__ == "__main__":
    sys.exit(main())
