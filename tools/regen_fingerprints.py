"""Regenerate tests/plan_fingerprints.json (round-5 task 8).

Runs each guarded query at sf0.001, executes it (so the fingerprint is
the AQE-final physical shape), and writes the normalized fingerprint
(plans/fingerprint.py) keyed by query id. Run this ONLY when a plan
change is intentional — the point of the checked-in file is that an
accidental broadcast→sort-merge flip or a new exchange fails
tests/test_plan_fingerprints.py with a diff.

    python tools/regen_fingerprints.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests",
                   "plan_fingerprints.json")

#: guarded queries: expensive and/or join-strategy-sensitive, with
#: DATA-SIZE-STABLE plans (no convergence loops whose unrolled depth
#: depends on the corpus — q_dup_groups/q_graph_lookup are out for
#: that reason).
GUARDED = [
    "q_cube_build", "q_star_join", "q_join_left", "q_join_lookup",
    "q_pipeline_group", "q_pipeline_window", "q_window_frame",
    "q_dedup_exact", "q_dedup_minhash", "q_knn", "q_sessionize",
    "q_json_extract",
    # r9 cube-route additions: q_cube_topn_exact pins the PARTIAL
    # WindowGroupLimit (map-side top-k — losing it turns the exchange
    # from O(groups·k) into O(cells)); stddev pins the single-aggregate
    # dispersion rollup; extremes pins the bounded boundary-cell shape
    "q_cube_topn_exact", "q_cube_stddev", "q_cube_extremes",
    # r14 additions: q_split pins the zero-shuffle assignment (md5 +
    # CASE in one codegen span — one exchange for the 3-group agg,
    # no Python stage); q_multimodal_frames pins the single
    # chained-mapInPandas fan-out (a second Python stage or an
    # exchange appearing between synth and stats fails the diff)
    "q_split", "q_multimodal_frames",
]


def main() -> None:
    import __spark_entry__ as ent
    from mongo_olap_spark.plans.fingerprint import fingerprint_df
    from mongo_olap_spark.session import get_spark

    spark = get_spark("regen_fingerprints", shuffle_partitions=8)
    qs = ent.queries()
    out = {}
    for qid in GUARDED:
        df = qs[qid](spark, SF_DIR).limit(100_000)
        df.collect()
        out[qid] = fingerprint_df(df)
        print(qid, out[qid])
    with open(os.path.abspath(OUT), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {len(out)} fingerprints to {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
