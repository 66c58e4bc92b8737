"""Deterministic corpus splits (r14): train/val/test assignment and
its leakage-safe variant.

The last step before a training-data pipeline hands a corpus to a
trainer is fold assignment, and it has two hard requirements at
100 TB:

- **Deterministic and engine-portable**: re-running the pipeline (or
  auditing it from another engine) must reproduce the same
  assignment row-for-row. The draw is the first 8 hex chars of
  ``md5(salt || key)`` — a uniform 32-bit value with identical
  semantics in Spark, DuckDB, and anything else with md5 — compared
  against precomputed hex thresholds. No RNG state, no
  ``Math.random``, no partition-order dependence (``F.rand`` is
  per-partition-seeded and NOT stable under repartitioning).
- **Leakage-safe**: near-duplicate documents must land in the SAME
  fold, or held-out evaluation leaks training text. The group-aware
  variant hashes the dup-group id (connected components over the
  near-dup pair graph — ``operators/dedup.connected_components``)
  instead of the document id, so every member of a group moves
  together.

Scale shape: the plain split is a zero-shuffle projection (md5 +
CASE inside whole-stage codegen). The leakage-safe split inherits
the dedup pipeline's shuffles (banded pair generation + min-label
propagation) and adds only a broadcast-or-shuffle join of the
(doc_id, group_id) map back to the corpus — no new quadratic term,
no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["split_column", "deterministic_split", "leakage_safe_split"]


def _thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """(name, 8-hex upper bound) per fold, in declaration order; the
    last fold is the open-ended remainder (no bound needed)."""
    if not fractions:
        raise ValueError("fractions must name at least one fold")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    out, cum = [], 0.0
    for name, frac in fractions.items():
        cum += frac
        out.append((name, format(min(int(cum * 2**32), 2**32 - 1), "08x")))
    return out


def split_column(key: Column | str, fractions: dict[str, float],
                 salt: str = "", on_null: str = "error") -> Column:
    """Fold-name column for ``key`` under ``fractions`` (name →
    fraction, summing to 1; dict order defines the threshold order,
    so the same dict always yields the same assignment).

    NULL keys refuse loudly by default (ADVICE r14): ``md5(concat(
    salt, NULL))`` is NULL, so every ``when()`` guard is NULL and the
    otherwise-chain would silently pool every null-keyed row into the
    LAST declared fold — typically 'test' — skewing the fractions.
    ``on_null='error'`` raises at execution time naming the problem;
    ``on_null='null'`` assigns NULL (the row surfaces, callers filter
    or repair explicitly)."""
    if on_null not in ("error", "null"):
        raise ValueError(f"on_null must be 'error' or 'null', got {on_null!r}")
    c = F.col(key) if isinstance(key, str) else key
    h = F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8)
    bounds = _thresholds(fractions)
    expr = F.lit(bounds[-1][0])  # remainder fold
    for name, ub in reversed(bounds[:-1]):
        expr = F.when(h < ub, name).otherwise(expr)
    if on_null == "error":
        null_arm = F.raise_error(F.lit(
            "split_column: NULL split key — every null-keyed row would "
            "silently land in the last declared fold; pass a non-null "
            "key (coalesce it) or on_null='null'"))
    else:
        null_arm = F.lit(None).cast("string")
    return F.when(c.isNull(), null_arm).otherwise(expr)


def deterministic_split(df: DataFrame, key: str,
                        fractions: dict[str, float], salt: str = "",
                        out: str = "split",
                        on_null: str = "error") -> DataFrame:
    """``df`` + a ``split`` column assigned by ``key`` alone — stable
    under repartitioning, re-runs, and engine changes."""
    return df.withColumn(out, split_column(key, fractions, salt, on_null))


def leakage_safe_split(corpus: DataFrame, groups: DataFrame,
                       fractions: dict[str, float], salt: str = "",
                       out: str = "split") -> DataFrame:
    """Group-aware assignment: every doc in a near-dup group lands in
    the same fold because the hash draws on ``group_id``, not
    ``doc_id``. ``groups`` is the (doc_id, group_id) map from
    connected components over the near-dup pairs; docs absent from it
    (singletons, if the map only covers dup members) fall back to
    their own id as the group id."""
    g = groups.select("doc_id", "group_id")
    joined = corpus.join(g, "doc_id", "left")
    gid = F.coalesce(F.col("group_id"), F.col("doc_id"))
    return (joined
            .withColumn(out, split_column(gid, fractions, salt))
            .drop("group_id"))
