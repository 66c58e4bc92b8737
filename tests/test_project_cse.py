"""Optimization r16: intra-$project CSE + expression-level let.

A $project computing several aggregate-expression forms over the same
$map operand used to re-evaluate the (interpreted, HOF-excluded-from-
subexpression-elimination) array once per output column; the compiler
now hoists repeated closed subtrees into one hidden column, and
$median/$percentile bind their sorted array once (_let1). These tests
pin (a) result equivalence against hand-built columns and (b) the
plan property that the shared operand is evaluated exactly once.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_olap_spark.plans.pipeline_compiler import (
    _cse_candidates,
    _free_vars,
    compile_pipeline,
)

LL = {"$map": {"input": {"$split": ["$text", " "]}, "as": "t",
               "in": {"$strLenCP": "$$t"}}}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "a bb ccc dddd"), (2, "x yy"), (3, "lone"), (4, None)],
        "doc_id long, text string",
    )


def test_project_cse_results_unchanged(docs):
    out = compile_pipeline(
        docs,
        [{"$project": {
            "doc_id": 1,
            "max_len": {"$max": LL},
            "min_len": {"$min": LL},
            "sum_len": {"$sum": LL},
            "med_len": {"$median": {"input": LL, "method": "approximate"}},
            "p90_len": {"$arrayElemAt": [
                {"$percentile": {"input": LL, "p": [0.9],
                                 "method": "approximate"}},
                {"$literal": 0}]},
        }}],
    )
    got = {r["doc_id"]: r for r in out.collect()}
    # doc 1: lens [1,2,3,4] -> max 4, min 1, sum 10, median 2.5,
    # p90 = 1 + 0.9*3 = 3.7 (closest-ranks linear interpolation)
    assert got[1]["max_len"] == 4 and got[1]["min_len"] == 1
    assert got[1]["sum_len"] == 10
    assert got[1]["med_len"] == pytest.approx(2.5)
    assert got[1]["p90_len"] == pytest.approx(3.7)
    # doc 3: single token -> degenerate percentiles equal the value
    assert got[3]["med_len"] == pytest.approx(4.0)
    # doc 4: null text -> null everything (split(null) is null)
    assert got[4]["max_len"] is None and got[4]["med_len"] is None


def test_project_cse_shares_the_operand(docs):
    out = compile_pipeline(
        docs,
        [{"$project": {
            "doc_id": 1,
            "max_len": {"$max": LL},
            "min_len": {"$min": LL},
            "med_len": {"$median": {"input": LL, "method": "approximate"}},
        }}],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the $map operand is evaluated once (hidden column), not once per
    # output column (probe: its split() appears once); the sorted
    # array inside $median is bound via _let1, so the sort appears
    # once, not ~5x. (_let1 itself adds a transform node, so count the
    # operand's split, not transforms.)
    assert plan.count("split(text") == 1
    assert plan.count("array_sort") == 1


def test_cse_skips_open_terms():
    # a subtree referencing an enclosing lambda's variable must NOT be
    # hoisted; its canonical form is open ($$v free)
    open_term = {"$concat": ["$$v", {"$toUpper": "$$v"}, "suffix-pad"]}
    assert _free_vars(open_term) == {"v"}
    assert _cse_candidates([open_term, open_term]) == []
    # the same shape with the binder INSIDE the subtree is closed
    closed = {"$map": {"input": "$xs", "as": "v", "in": open_term}}
    assert _free_vars(closed) == set()
    assert len(_cse_candidates([closed, closed])) == 1


def test_cse_never_walks_literals():
    lit = {"$literal": {"$max": [1, 2, 3, "definitely-long-enough-x"]}}
    assert _cse_candidates([lit, lit]) == []


def test_project_cse_inside_lambda_still_correct(docs):
    # the hoisted column is referenced from INSIDE another lambda —
    # legal in Spark (outer columns are visible to HOF bodies)
    out = compile_pipeline(
        docs,
        [{"$project": {
            "doc_id": 1,
            "sum_len": {"$sum": LL},
            "twice": {"$map": {"input": LL, "as": "x",
                               "in": {"$multiply": ["$$x", 2]}}},
        }}],
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["sum_len"] == 10
    assert got[1]["twice"] == [2, 4, 6, 8]


def test_cse_key_not_recomputed_at_compile_time(docs, monkeypatch):
    """Optimization r17: the compile-time scope looks occurrences up
    by node identity — _cse_key (O(subtree) JSON canonicalization)
    runs ONLY during the single candidates walk, never again while the
    scope is installed. The old per-visit lookup was O(spec²) at plan
    time on machine-generated specs."""
    import mongo_olap_spark.plans.pipeline_compiler as pc

    project = {
        "doc_id": 1,
        "max_len": {"$max": LL},
        "min_len": {"$min": LL},
        "sum_len": {"$sum": LL},
    }
    values = [v for v in project.values() if v not in (1, True)]

    calls = {"n": 0}
    orig = pc._cse_key

    def counting(spec):
        calls["n"] += 1
        return orig(spec)

    monkeypatch.setattr(pc, "_cse_key", counting)
    pc._cse_candidates(values)
    walk_only = calls["n"]
    assert walk_only > 0

    calls["n"] = 0
    compile_pipeline(docs, [{"$project": project}])
    # full compile = exactly the one candidates walk, nothing more
    assert calls["n"] == walk_only


def test_cse_thousand_node_project_compiles_near_linear(docs):
    """A machine-generated $project with ~1000 operator nodes must
    compile without quadratic canonicalization blowup (loose absolute
    bound — the py4j column construction dominates a healthy run)."""
    import time

    project = {"doc_id": 1}
    for i in range(120):
        # two occurrences each of 60 distinct 4-node subtrees → every
        # one is a hoist candidate; ~1000 dict nodes total
        sub = {"$add": [{"$strLenCP": {"$ifNull": ["$text", f"pad-{i % 60}"]}},
                        i % 60]}
        project[f"c{i}"] = sub
    t0 = time.perf_counter()
    out = compile_pipeline(docs, [{"$project": project}])
    dt = time.perf_counter() - t0
    assert dt < 30.0, f"$project compile took {dt:.1f}s"
    row = {r["doc_id"]: r for r in out.collect()}[1]
    assert row["c0"] == 13 and row["c61"] == 13 + 1
