"""Band-join blocking scale probe (r10): adaptive vs fixed buckets
across the sf0.1 → sf1 decade.

The r10 sf1 bench exposed the fixed 64-bucket band blocking as
quadratic: over-coverage candidate pairs are |L|·|R|/B, so with B
constant a 10x decade costs 100x. The fix sizes B to the foreign
side (TARGET_ROWS_PER_BUCKET). This probe MEASURES the claim on the
q_pipeline_lookup_range shape (customer-decile acctbal band into
orders totalprice):

- candidate pairs per left row (bucket-equality join BEFORE the exact
  band residual — the pure over-coverage metric) under the adaptive
  and the old fixed-64 blocking, at both scales;
- the adaptive plan's normalized fingerprint at both scales (zero
  drift expected — same operators, different literal array width).

ok = adaptive pairs-per-left-row grows < 3x across the 10x decade
(the fixed-64 baseline grows ~10x) AND no critical plan drift.

Usage: python tools/scale_rangejoin.py [--out SCALE_PROBE_RANGEJOIN.json]
Run idle. One JSON line; nonzero exit on failure.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def probe(spark, sf_dir: str) -> dict:
    from mongo_olap_spark.operators.rangejoin import (
        BUCKET_COL,
        banded_range_join,
        bucket_boundaries,
    )
    from mongo_olap_spark.plans.fingerprint import fingerprint_df
    from mongo_olap_spark.sources.tables import load_table

    c = load_table(spark, sf_dir, "customer").filter("c_custkey % 10 = 0")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    L = c.select(
        "c_custkey",
        (F.col("c_acctbal") * 10).alias("lo"),
        (F.col("c_acctbal") * 10.2).alias("hi"),
    )
    n_left = L.count()
    out = {"sf_dir": sf_dir, "left_rows": n_left, "right_rows": o.count()}

    for mode, nb in (("adaptive", None), ("fixed64", 64)):
        bounds = bucket_boundaries(o, "o_totalprice", nb)
        # pure over-coverage: bucket-equality candidates BEFORE the
        # exact band residual (the residual is what trims them back)
        from mongo_olap_spark.operators.rangejoin import _bucket_of

        lb = _bucket_of(F.col("lo"), bounds)
        hb = _bucket_of(F.col("hi"), bounds)
        Lx = L.withColumn(BUCKET_COL, F.explode(F.sequence(lb, hb)))
        Rx = o.withColumn(BUCKET_COL, _bucket_of(F.col("o_totalprice"), bounds))
        pairs = Lx.join(Rx, BUCKET_COL).count()
        out[mode] = {
            "buckets": len(bounds) + 1,
            "candidate_pairs": pairs,
            "pairs_per_left_row": round(pairs / max(n_left, 1), 1),
        }

    # true matches + the adaptive plan fingerprint (AQE-final)
    bounds = bucket_boundaries(o, "o_totalprice")
    cond = (o["o_totalprice"] >= L["lo"]) & (o["o_totalprice"] < L["hi"])
    j = banded_range_join(L, o, L["lo"], L["hi"], o["o_totalprice"],
                          cond, bounds=bounds, how="inner")
    agg = j.groupBy("c_custkey").agg(F.count(F.lit(1)).alias("n"))
    out["true_matches"] = agg.agg(F.sum("n")).collect()[0][0]
    out["fingerprint"] = fingerprint_df(agg)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/sf1")
    ap.add_argument("--out", default="SCALE_PROBE_RANGEJOIN.json")
    args = ap.parse_args()

    from mongo_olap_spark.plans.fingerprint import diff
    from mongo_olap_spark.session import get_spark

    spark = get_spark("scale_rangejoin")
    spark.sparkContext.setLogLevel("ERROR")

    small = probe(spark, args.small)
    big = probe(spark, args.big)

    ratio_adaptive = (big["adaptive"]["pairs_per_left_row"]
                      / max(small["adaptive"]["pairs_per_left_row"], 0.1))
    ratio_fixed = (big["fixed64"]["pairs_per_left_row"]
                   / max(small["fixed64"]["pairs_per_left_row"], 0.1))
    drift = diff(small["fingerprint"], big["fingerprint"])
    ok = ratio_adaptive < 3.0 and not drift

    result = {
        "metric": "rangejoin_blocking_scale",
        "small": small,
        "big": big,
        "overcoverage_growth_adaptive": round(ratio_adaptive, 2),
        "overcoverage_growth_fixed64": round(ratio_fixed, 2),
        "plan_drift": drift,
        "ok": ok,
    }
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
