"""10x scale-proof harness (round-5 task 1).

All correctness evidence runs at sf<=0.1; this tool manufactures the
missing scale evidence. It synthesizes a ~FACTOR x dataset from sf0.1
by key-offset replication (driver-side constants + one crossJoin with a
broadcast replica spine — the synthesis itself is a linear Spark job,
no collect), then runs the most expensive queries plus the cube
build/IVM/route path at BOTH scales and checks three invariants:

  (a) wall-time scales <= ~linearly (ratio <= FACTOR * SLACK),
  (b) the AQE-final plan fingerprint (join strategies, exchange
      kinds/counts, window modes, Python stage counts) is UNCHANGED —
      no broadcast flipping to sort-merge, no new single-partition
      exchange appearing at scale,
  (c) Python-driver peak RSS stays flat (results are bounded collects)
      — the JVM's VmHWM delta is reported for context (in local mode
      the "driver" JVM hosts all 32 executors, so its working set
      legitimately grows with the scan; the flat-driver claim is about
      driver-side algorithm state, which lives in Python here).

Replication preserves join structure (each foreign key is offset by the
same per-table constant as its primary key) and deliberately BREAKS
cross-replica text/vector similarity (hash-salted word substitution,
deterministic vector noise) so near-dup and ANN workloads stay
representative: within-replica duplicate structure is preserved
exactly, across replicas similarity drops below banding thresholds —
otherwise every doc would gain 9 planted near-dups and candidate pairs
would grow quadratically, which is a property of the synthetic data,
not of the engine.

Usage:
    python tools/scale_probe.py [--factor 10] [--src /root/testdata/sf0.1]
        [--dst /tmp/scale10x] [--queries q_a,q_b] [--resynth]
        [--out SCALE_PROBE.json]

Prints one JSON line per query and a final summary; exits nonzero if
any invariant fails.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

ROW_CAP = 100_000  # bench.py's bounded-collect protocol
SLACK = 1.6  # allowed super-linearity (n log n + fixed overhead jitter)

#: the 10 most expensive queries from BENCH_r04 + the cube
#: build / IVM / routing path + the span-dedup window family.
DEFAULT_QUERIES = [
    "q_dup_groups", "q_knn_lsh", "q_json_struct", "q_join_lookup",
    "q_lang_id", "q_pipeline_strings", "q_sessionize", "q_ivf_knn",
    "q_pipeline_deriv", "q_dedup_minhash",
    "q_cube_build", "q_incr_update", "q_route_cube", "q_route_hybrid",
    "q_star_join", "q_dedup_spans",
    # round-5 additions: the bucketized-range-join and ordered-match-
    # array paths of the correlated $lookup compiler
    "q_pipeline_lookup_range", "q_pipeline_lookup_topn",
    # round-5: the anti-join/union densify (data must NOT shuffle at
    # scale) and the anchored-bin dateTrunc group keys
    "q_pipeline_densify_numeric", "q_pipeline_trunc_bins",
]


# ---------------------------------------------------------------- synth
def _next_pow10(n: int) -> int:
    p = 10
    while p <= n:
        p *= 10
    return p


def synthesize(spark: SparkSession, src: str, dst: str, factor: int) -> None:
    """Write a factor-x replica of the testbed into dst.

    Key offsets are powers of ten above each table's max key, applied
    identically to primary and foreign sides so every join path
    (lineitem->orders->customer->nation->region, l_partkey->part,
    l_suppkey->supplier) holds within each replica and never across
    replicas. region/nation stay fixed — TPC-H scales every other
    table and so do we.
    """
    from mongo_olap_spark.sources.tables import load_table

    marker = os.path.join(dst, "_SYNTH_OK.json")
    want = {"src": src, "factor": factor}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == want:
                print(f"# synth: reusing {dst}", file=sys.stderr)
                return

    t0 = time.perf_counter()
    os.makedirs(dst, exist_ok=True)
    tabs = {n: load_table(spark, src, n) for n in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")}

    # one tiny driver-side pass for the offset constants
    off = {}
    for tab, key in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                     ("part", "p_partkey"), ("orders", "o_orderkey"),
                     ("events", "event_id"), ("documents", "doc_id"),
                     ("embeddings", "vec_id")]:
        off[key] = _next_pow10(tabs[tab].agg(F.max(key)).first()[0])
    off["user_id"] = _next_pow10(
        tabs["events"].agg(F.max("user_id")).first()[0])
    dim = tabs["embeddings"].select(F.size("embedding")).first()[0]

    spine = F.broadcast(
        spark.range(factor).select(F.col("id").cast("int").alias("__r")))

    def rep(df: DataFrame, *shifts: tuple[str, str]) -> DataFrame:
        out = df.crossJoin(spine)
        for col, key in shifts:
            out = out.withColumn(
                col, F.col(col) + F.col("__r").cast("long") * off[key])
        return out

    salted = F.transform(
        F.split("text", " "),
        lambda w: F.when(
            (F.col("__r") > 0) & (F.pmod(F.hash(w), F.lit(3)) == 0),
            F.concat(w, F.lit("_"), F.col("__r").cast("string")),
        ).otherwise(w),
    )
    out_tabs: dict[str, DataFrame] = {
        "region": tabs["region"],
        "nation": tabs["nation"],
        "customer": rep(tabs["customer"], ("c_custkey", "c_custkey")),
        "supplier": rep(tabs["supplier"], ("s_suppkey", "s_suppkey")),
        "part": rep(tabs["part"], ("p_partkey", "p_partkey")),
        "orders": rep(tabs["orders"], ("o_orderkey", "o_orderkey"),
                      ("o_custkey", "c_custkey")),
        "lineitem": rep(tabs["lineitem"], ("l_orderkey", "o_orderkey"),
                        ("l_partkey", "p_partkey"),
                        ("l_suppkey", "s_suppkey")),
        "events": rep(tabs["events"], ("event_id", "event_id"),
                      ("user_id", "user_id")),
        # text: hash-salted word substitution — same words perturb the
        # same way within a replica (within-replica near-dup structure
        # preserved), differently across replicas ((2/3)^5 ~ 13% shared
        # 5-gram shingles -> below every banding threshold)
        "documents": rep(tabs["documents"], ("doc_id", "doc_id"))
        .withColumn("text", F.concat_ws(" ", salted))
        .withColumn("n_chars", F.length("text").cast("long")),
        # vectors: per-replica component permutation (odd stride, so it
        # is a bijection on the power-of-two dim) + hash sign flips —
        # norm-preserving and distribution-identical, but replica
        # copies are fully decorrelated (cosine ~ N(0, 1/sqrt(dim)))
        # instead of being 10 planted near-neighbors per vector
        "embeddings": rep(tabs["embeddings"], ("vec_id", "vec_id"))
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: F.when(F.col("__r") == 0, x).otherwise(
                    (F.element_at(
                        F.col("embedding"),
                        (F.pmod(i * (2 * F.col("__r") + 1)
                                + 7 * F.col("__r"), F.lit(dim)) + 1
                         ).cast("int"))
                     * F.when(
                         F.pmod(F.hash(i * 31 + F.col("__r") * 53),
                                F.lit(2)) == 0, -1.0).otherwise(1.0)
                     ).cast("float")),
            ),
        ),
    }
    # realistic layout: 10x data arrives as ~10x the files, clustered
    # on the natural key (repartitionByRange preserves the clustering
    # a real writer would produce; plain crossJoin output would leave
    # e.g. documents as ONE file — a 2-split scan that serializes a
    # 32-core box and measures nothing)
    sort_key = {
        "customer": "c_custkey", "supplier": "s_suppkey",
        "part": "p_partkey", "orders": "o_orderkey",
        "lineitem": "l_orderkey", "events": "ts",
        "documents": "doc_id", "embeddings": "vec_id",
    }
    for name, df in out_tabs.items():
        out = df.drop("__r")
        if name in sort_key:
            out = out.repartitionByRange(32, sort_key[name])
        out.write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet"))
    with open(marker, "w") as f:
        json.dump(want, f)
    print(f"# synth: wrote {factor}x to {dst} "
          f"in {time.perf_counter() - t0:.1f}s", file=sys.stderr)


# ---------------------------------------------------------------- probe
def _jvm_pid(spark: SparkSession):
    proc = getattr(spark.sparkContext._gateway, "proc", None)
    return getattr(proc, "pid", None)


def _vm_hwm_kb(pid) -> int | None:
    if pid is None:
        return None
    try:
        with open(f"/proc/{pid}/status") as f:
            for ln in f:
                if ln.startswith("VmHWM"):
                    return int(ln.split()[1])
    except OSError:
        return None
    return None


def _py_rss_kb() -> int:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss


#: operators whose APPEARANCE (or growth) at 10x is a scale bug no
#: matter what: quadratic joins, serialization points, Python stages
#: materializing out of nowhere. Everything else — notably
#: BroadcastHashJoin flipping to SortMergeJoin — is AQE doing its job
#: when a SCALED side crosses the broadcast threshold (a 10x-larger
#: customer table should not stay broadcast); those flips are recorded
#: as benign drift. Fixed-dim broadcasts (region/nation) are guarded
#: at 1x by tests/test_plan_fingerprints.py instead.
CRITICAL_OPS = (
    "CartesianProduct", "BroadcastNestedLoopJoin",
    "exchange:SinglePartition", "MapInPandas", "FlatMapGroupsInPandas",
    "ArrowEvalPython", "BatchEvalPython",
)


def split_drift(fp_diff: dict) -> tuple[dict, dict]:
    critical = {k: v for k, v in fp_diff.items()
                if k in CRITICAL_OPS and v[1] > v[0]}
    benign = {k: v for k, v in fp_diff.items() if k not in critical}
    return critical, benign


def run_one(spark, fn, sf_dir: str) -> tuple[float, dict]:
    from mongo_olap_spark.plans.fingerprint import fingerprint_df

    # bench.py's hygiene: cached state and GC debt from the previous
    # query must not bill to this one's wall clock
    spark.catalog.clearCache()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    t0 = time.perf_counter()
    df = fn(spark, sf_dir).limit(ROW_CAP)
    df.collect()
    dt = time.perf_counter() - t0
    return dt, fingerprint_df(df)  # post-action => AQE-final shape


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/scale10x")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--repeat", type=int, default=1,
                    help="min-of-N timing at each scale")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import __spark_entry__ as ent
    from mongo_olap_spark.plans.fingerprint import diff
    from mongo_olap_spark.session import get_spark
    from mongo_olap_spark.sources.tables import load_table

    spark = get_spark("scale_probe")
    synthesize(spark, args.src, args.dst, args.factor)

    qs = ent.queries()
    names = [q for q in args.queries.split(",") if q]
    unknown = [q for q in names if q not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    # page-cache warmup at both scales so first-touch I/O isn't billed
    for d in (args.src, args.dst):
        for t in ("lineitem", "orders", "events", "documents",
                  "embeddings", "customer", "part", "supplier"):
            load_table(spark, d, t).write.format("noop").mode(
                "overwrite").save()

    jvm = _jvm_pid(spark)
    results, failures = [], []
    for qid in names:
        times, fps = {}, {}
        for scale, d in [("1x", args.src), (f"{args.factor}x", args.dst)]:
            best, fp = None, None
            for _ in range(max(args.repeat, 1)):
                dt, f_ = run_one(spark, qs[qid], d)
                best = dt if best is None else min(best, dt)
                fp = f_
            times[scale], fps[scale] = best, fp
        t1, t10 = times["1x"], times[f"{args.factor}x"]
        ratio = t10 / t1 if t1 > 0 else float("inf")
        critical, benign = split_drift(diff(fps["1x"], fps[f"{args.factor}x"]))
        row = {
            "query": qid, "t_1x_s": round(t1, 3),
            f"t_{args.factor}x_s": round(t10, 3), "ratio": round(ratio, 2),
            "critical_drift": critical, "benign_drift": benign,
            "py_rss_mb": _py_rss_kb() // 1024,
            "jvm_hwm_mb": (_vm_hwm_kb(jvm) or 0) // 1024,
        }
        ok_time = ratio <= args.factor * SLACK
        ok_plan = not critical
        row["ok"] = ok_time and ok_plan
        if not row["ok"]:
            failures.append(
                f"{qid}: " + ("; ".join(filter(None, [
                    None if ok_time else f"ratio {ratio:.1f} > "
                    f"{args.factor * SLACK:.0f}",
                    None if ok_plan else f"critical drift {critical}"]))))
        results.append(row)
        print(json.dumps(row))

    rss = _py_rss_kb() // 1024
    summary = {
        "factor": args.factor, "n": len(results),
        "failed": len(failures), "failures": failures,
        "py_peak_rss_mb": rss,
        "jvm_peak_hwm_mb": (_vm_hwm_kb(jvm) or 0) // 1024,
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"queries": results, "summary": summary}, f, indent=1)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
