"""Normalized physical-plan fingerprints.

A fingerprint is the part of an executed plan that must NOT drift as
data grows or code changes: join strategies, exchange counts and
partitioning kinds, window modes, aggregate implementations, and
Python/Arrow stage counts. Everything volatile — expression ids, plan
ids, statistics, file paths, partition counts — is deliberately
excluded, so the same logical query at sf0.1 and at 10x sf0.1 should
produce the SAME fingerprint; a broadcast join flipping to sort-merge,
or a new single-partition exchange appearing, shows up as a dict diff.

Used by tools/scale_probe.py (1x vs 10x plan-shape invariance) and
tests/test_plan_fingerprints.py (regression guard for the top queries).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: physical operators whose *count* is the plan's shape. Order matters
#: for matching: longer/more specific names first so e.g.
#: BroadcastNestedLoopJoin is not double-counted as a broadcast join.
_OPERATORS = [
    "BroadcastNestedLoopJoin",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "CartesianProduct",
    "WindowGroupLimit",
    "WindowExec",
    "Window",
    "ObjectHashAggregate",
    "SortAggregate",
    "HashAggregate",
    "TakeOrderedAndProject",
    "BroadcastExchange",
    "Exchange",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "ArrowEvalPython",
    "BatchEvalPython",
    "Generate",
    "Expand",
]

#: partitioning kinds inside Exchange nodes — a SinglePartition
#: exchange is the classic does-not-scale smell.
_PARTITIONINGS = ["SinglePartition", "hashpartitioning", "rangepartitioning"]


def plan_string(df: DataFrame) -> str:
    """The executed physical plan as text. Under AQE this reflects the
    final (re-planned) tree once the query has actually run — callers
    that want the AQE-final shape should execute the DataFrame first
    (any action) and fingerprint the same instance afterwards."""
    if not hasattr(df, "_jdf"):
        raise NotImplementedError(
            "plan fingerprints need the classic session's _jdf "
            "(executed-plan text); under Spark Connect use "
            "df.explain('formatted') for plan inspection — "
            "fingerprinting is test tooling, not product surface"
        )
    return df._jdf.queryExecution().executedPlan().toString()


def fingerprint(plan: str) -> dict[str, int]:
    """Count the shape-bearing operators in a plan string.

    ``Window`` is counted via a word-boundary match so windowed
    *expressions* mentioning e.g. ``windowspecdefinition`` don't
    inflate it; Exchange partitioning kinds are counted from the
    Exchange lines only.
    """
    counts: dict[str, int] = {}
    # ReusedExchange nodes echo the reused child's "Exchange ..." text;
    # drop those lines so exchange counts reflect real shuffles only
    # (AQE legitimately varies reuse with data size).
    lines = [ln for ln in plan.splitlines() if "ReusedExchange" not in ln]
    residual = "\n".join(lines)
    for op in _OPERATORS:
        if op == "Window":
            n = len(re.findall(r"^[\s:+*\-()0-9]*\bWindow\b", residual, re.M))
        elif op == "Exchange":
            n = len(re.findall(r"\bExchange (?:hash|range|Single)", residual))
        else:
            n = residual.count(op)
            residual = residual.replace(op, "\x00" * len(op))
        if n:
            counts[op] = n
    for kind in _PARTITIONINGS:
        n = sum(1 for ln in lines if re.search(rf"\bExchange .*{kind}", ln))
        if n:
            counts[f"exchange:{kind}"] = n
    return counts


def fingerprint_df(df: DataFrame) -> dict[str, int]:
    return fingerprint(plan_string(df))


def diff(a: dict[str, int], b: dict[str, int]) -> dict[str, tuple[int, int]]:
    """Keys whose counts differ, as {key: (a_count, b_count)}."""
    out = {}
    for k in sorted(set(a) | set(b)):
        if a.get(k, 0) != b.get(k, 0):
            out[k] = (a.get(k, 0), b.get(k, 0))
    return out
