"""Isolate one query's computation cost (guide §1.4): time the noop
sink (full computation, no driver transfer) vs collect (bench
methodology) over N repeats, and print per-repeat seconds.

Usage:
    python tools/profile_query.py q_a[,q_b,...] [repeats]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    qids = sys.argv[1].split(",")
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as ent
    from mongo_olap_spark.session import get_spark
    from mongo_olap_spark.sources.tables import load_table

    spark = get_spark("profile")
    qs = ent.queries()
    # same warmup as bench.py: JVM/codegen + page-cache first touch
    qs["q_cube_build"](spark, sf_dir).limit(1).collect()
    for t in ("documents", "embeddings", "events", "orders", "lineitem",
              "customer", "supplier", "part", "nation", "region"):
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    for qid in qids:
        spark.sparkContext.setJobDescription(f"profile:{qid}")
        for mode in ("noop", "collect"):
            times = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                df = qs[qid](spark, sf_dir)
                if mode == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.limit(100_000).collect()
                times.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
            print(f"{qid:32s} {mode:8s} min={min(times):7.3f}  runs={times}",
                  flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
