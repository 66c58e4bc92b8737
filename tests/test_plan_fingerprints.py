"""Plan-fingerprint regression guards (round-5 task 8).

Each guarded query's AQE-final physical shape — join strategies,
exchange kinds/counts, window modes, Python stage counts — must match
the checked-in fingerprint. An edit that flips a broadcast join to
sort-merge, adds a shuffle, or sneaks a Python stage into a codegen
path fails HERE with the exact diff, before it costs anything at
scale. Intentional plan changes: re-run tools/regen_fingerprints.py
and commit the new file alongside the change that caused it.

Plus hard invariants no guarded query may ever violate, regardless of
what the checked-in file says: no cartesian product, no broadcast
nested loop, no single-partition exchange.
"""

from __future__ import annotations

import json
import os

import pytest

from __spark_entry__ import queries
from mongo_olap_spark.plans.fingerprint import diff, fingerprint_df

FP_PATH = os.path.join(os.path.dirname(__file__), "plan_fingerprints.json")
with open(FP_PATH) as f:
    EXPECTED: dict[str, dict] = json.load(f)

QS = queries()
ROW_CAP = 100_000

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin",
             "exchange:SinglePartition")

#: documented exceptions: q_knn's exact-kNN baseline IS a broadcast
#: nested loop by design — a handful of query vectors broadcast
#: against the streaming corpus (the scale path is q_knn_lsh/
#: q_ivf_knn). The fingerprint still pins its BNLJ COUNT, so a
#: second one appearing fails the diff.
ALLOWED = {"q_knn": {"BroadcastNestedLoopJoin"}}


def _final_fingerprint(spark, qid: str, sf_dir: str) -> dict:
    # another test's cached tables would splice InMemoryTableScan
    # subtrees into the plan and change operator counts — fingerprints
    # are defined over the cold plan
    spark.catalog.clearCache()
    df = QS[qid](spark, sf_dir).limit(ROW_CAP)
    df.collect()  # AQE-final shape
    return fingerprint_df(df)


@pytest.mark.parametrize("qid", sorted(EXPECTED))
def test_plan_fingerprint_unchanged(spark, sf_dir, qid):
    got = _final_fingerprint(spark, qid, sf_dir)
    d = diff(EXPECTED[qid], got)
    assert not d, (
        f"{qid}: physical plan shape drifted (expected→got): {d}. "
        "If intentional, regenerate with tools/regen_fingerprints.py "
        "and commit the diff."
    )
    for op in FORBIDDEN:
        if op in ALLOWED.get(qid, ()):
            continue
        assert got.get(op, 0) == 0, f"{qid}: forbidden operator {op}"


def test_star_join_dims_stay_broadcast(spark, sf_dir):
    """The specific claim SCALE.md leans on: the six-table star join
    drives its dimension joins as broadcasts, never sort-merge, at the
    scale where dims fit the threshold."""
    got = _final_fingerprint(spark, "q_star_join", sf_dir)
    assert got.get("BroadcastHashJoin", 0) >= 3
    assert got.get("SortMergeJoin", 0) == 0
