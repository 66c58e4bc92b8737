"""Job-count + wall-time probe for driver-loop queries (guide §1.2:
count the jobs). The CC / BFS loops run Spark actions at query-
construction time, so their round structure never shows in the final
plan — this probe counts the Spark jobs an end-to-end run submits
(job-group + statusTracker — the UI is disabled in the test session)
as the round-count evidence.

Usage:
    python tools/cc_probe.py q_dup_groups[,q_more] [repeats]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    qids = sys.argv[1].split(",")
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as ent
    from mongo_olap_spark.session import get_spark
    from mongo_olap_spark.sources.tables import load_table

    spark = get_spark("cc_probe")
    qs = ent.queries()
    qs["q_cube_build"](spark, sf_dir).limit(1).collect()
    for t in ("documents", "events", "orders", "supplier"):
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    tracker = spark.sparkContext.statusTracker()
    for qid in qids:
        for rep in range(repeats):
            spark.catalog.clearCache()
            group = f"ccprobe-{qid}-{rep}"
            spark.sparkContext.setJobGroup(group, qid)
            t0 = time.perf_counter()
            df = qs[qid](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobGroup(None, None)
            n_jobs = len(tracker.getJobIdsForGroup(group))
            print(f"{qid:28s} rep={rep} noop={dt:7.3f}s jobs={n_jobs}",
                  flush=True)


if __name__ == "__main__":
    main()
