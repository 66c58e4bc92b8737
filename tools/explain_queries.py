"""Capture .explain("formatted") for declared queries (guide §1 / §7.2).

Usage:
    python tools/explain_queries.py <out_dir> [_suffix] [q1,q2,...]

Writes <out_dir>/<qid><suffix>.txt with the formatted physical plan of
every requested query (default: all declared queries) at
$SPARK_GRAFT_SF_DIR (default sf0.1). Plans are captured WITHOUT
executing the query (no actions), except that queries which run
plan-time metadata jobs (cube routing, BPE vocab training) still pay
those — same as any compile.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else ""
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as ent
    from mongo_olap_spark.session import get_spark

    spark = get_spark("explain")
    qs = ent.queries()
    for qid in sorted(qs):
        if only and qid not in only:
            continue
        try:
            df = qs[qid](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture failures visibly, don't die
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{qid}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
