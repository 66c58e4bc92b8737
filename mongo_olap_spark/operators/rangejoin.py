"""Bucketized band join — the scale path for correlated range
predicates (round-5 task 3).

``left.lo <= right.val AND right.val <= left.hi`` compiled naively is
a BroadcastNestedLoopJoin: every left row probes every right row. When
the bands are narrow relative to the value range, quantile buckets turn
it into an equi-join: boundaries from ``approxQuantile`` on the right
value column partition the domain; each right row gets ONE bucket id,
each left row explodes to the (few) bucket ids its band overlaps, and
the join runs as a hash join on the bucket id with the exact band
predicate as a residual filter. Shuffle volume is
O(|right| + |left| * avg_buckets_per_band) — the same rewrite
q_join_theta hand-crafts for calendar quarters, generalized to
data-driven boundaries. (A half-open band spans ~half the buckets, so
callers with one-sided predicates should expect — and inherently pay
for — output proportional to |left| x |right|; that cost is in the
semantics, not the plan.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "__range_bucket"


#: adaptive bucket sizing (r10): the bucket count must GROW with the
#: foreign side or the join degenerates — with B fixed, over-coverage
#: work is |L|·|R|/B, i.e. quadratic across a data decade (measured:
#: q_pipeline_lookup_range went 2.3 s at sf0.1 → 93 s at sf1 on the
#: fixed 64). Targeting a constant per-bucket row count makes it
#: |L|·target — linear. The cap bounds the boundary-array literal the
#: per-row rank scan walks (codegen'd, ~BUCKET_CAP comparisons/row).
TARGET_ROWS_PER_BUCKET = 2_000
BUCKET_FLOOR = 64
BUCKET_CAP = 4_096


def bucket_boundaries(
    right: DataFrame, val_col: str, num_buckets: int | None = None
) -> list:
    """Interior quantile boundaries of right[val_col] (sorted, deduped).
    One or two bounded Spark jobs at plan-build time (a column-pruned
    count when ``num_buckets`` is None, then the quantile sketch) — the
    same eager-boundary pattern operators/ranking.py uses for
    $bucketAuto. Boundary accuracy affects only bucket BALANCE, never
    correctness: the exact band predicate rides as a residual."""
    if num_buckets is None:
        n = right.count()
        num_buckets = max(
            BUCKET_FLOOR, min(BUCKET_CAP, n // TARGET_ROWS_PER_BUCKET)
        )
    qs = [i / num_buckets for i in range(1, num_buckets)]
    cast = right.select(F.col(val_col).cast("double").alias("v"))
    bounds = cast.approxQuantile("v", qs, min(0.001, 0.25 / num_buckets))
    return sorted({b for b in bounds if b is not None})


def _bucket_of(value: Column, bounds: list) -> Column:
    """Index of the bucket containing ``value``: count of boundaries at
    or below it — the array-literal rank idiom (codegen-safe at any
    boundary count, no CASE chain)."""
    blit = F.array(*[F.lit(float(b)) for b in bounds])
    v = value.cast("double")
    return F.size(F.filter(blit, lambda b: b <= v))


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    lo: Column,
    hi: Column,
    val: Column,
    cond: Column,
    *,
    bounds: list,
    how: str = "inner",
) -> DataFrame:
    """Rows of ``left`` x ``right`` satisfying ``cond``, which must be
    confined to the band ``lo <= val <= hi`` (strict variants are fine
    — the bucket overlap over-covers, the exact ``cond`` residual
    trims). ``lo``/``hi`` are columns of left, ``val`` of right,
    ``bounds`` from :func:`bucket_boundaries`. Returns the joined
    frame with both sides' columns (bucket key dropped).

    ``how="left"``: every left row survives, but bucket-exploded left
    rows appear once PER OVERLAPPED BUCKET when unmatched — callers
    re-aggregating by a left row id (the correlated-$lookup group-back)
    absorb the duplicates; other callers should dedupe or use inner.
    The explode is ``explode_outer`` so a null band (null lo/hi —
    comparisons with null match nothing, the row still belongs in a
    left join's output) keeps its row.
    """
    if not bounds:
        # degenerate domain (constant column): single bucket, plain join
        return left.join(right, cond, how)
    lb, hb = _bucket_of(lo, bounds), _bucket_of(hi, bounds)
    L = left.withColumn(BUCKET_COL, F.explode_outer(F.sequence(lb, hb)))
    R = right.withColumn(BUCKET_COL, _bucket_of(val, bounds))
    return (
        L.join(R, (L[BUCKET_COL] == R[BUCKET_COL]) & cond, how)
        .drop(BUCKET_COL)
    )
