"""Skew handling beyond AQE: explicit salting.

AQE's skew-join splitting handles most skew transparently (enabled in
session.py) — but it only splits *sort-merge join* partitions, post
shuffle, and cannot help when (a) the skewed key's rows must meet a
dim side that is too big to broadcast, or (b) a hot group key funnels
an unbounded accumulator (collect_set/collect_list) into one reducer.
These helpers are the classic manual remedies, kept deterministic so
task retries reproduce identical output:

- :func:`salted_join` — fact side gets a hash-derived salt in
  [0, n_salt); the dim side is replicated n_salt× (explode of a
  literal range, NOT a crossJoin — stays a narrow op); the join keys
  become (key, salt), spreading each hot key over n_salt reducers.
  Cost: dim shuffle volume × n_salt — worth it exactly when the hot
  fact key dwarfs the dim table.
- :func:`salted_collect_set` — two-stage distinct accumulation:
  groupBy(key, salt) collects bounded partial sets, then a second
  groupBy(key) merges them. A hot key costs n_salt bounded buffers
  instead of one unbounded one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _salt_expr(cols: list[str], n_salt: int, seed: int) -> Column:
    """Deterministic per-row salt: hash of the given columns. Rows
    identical in ``cols`` share a salt — correctness never depends on
    the salt value, determinism makes retries/exactly-once sinks
    reproducible (F.rand() would not)."""
    return F.pmod(F.xxhash64(F.lit(seed), *[F.col(c) for c in cols]), F.lit(n_salt))


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: list[str],
    *,
    n_salt: int = 16,
    how: str = "inner",
    salt_on: list[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the fact side salted and the dim side replicated.

    ``salt_on`` defaults to every non-join fact column — maximal
    spread; pass a high-cardinality subset (an id) to cheapen the hash.
    Join types: inner / left (fact-preserving). Right/full would need
    the *dim* side de-duplicated after replication — refuse instead of
    silently multiplying rows.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_cols = salt_on or [c for c in facts.columns if c not in on]
    if not salt_cols:
        raise ValueError("salted_join: no columns to derive the salt from")
    f = facts.withColumn(SALT_COL, _salt_expr(salt_cols, n_salt, seed))
    d = dim.withColumn(
        SALT_COL,
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(n_salt - 1).cast("long"))
        ),
    )
    return f.join(d, [*on, SALT_COL], how).drop(SALT_COL)


def salted_collect_set(
    df: DataFrame,
    keys: list[str],
    value: str,
    *,
    n_salt: int = 16,
    out: str = "values",
    seed: int = 42,
) -> DataFrame:
    """Distinct values per key without an unbounded single-reducer
    buffer: partial sets per (key, salt), merged per key."""
    salted = df.withColumn(SALT_COL, _salt_expr([value], n_salt, seed))
    partial = salted.groupBy(*keys, SALT_COL).agg(
        F.collect_set(value).alias("_part")
    )
    return partial.groupBy(*keys).agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("_part")))
        ).alias(out)
    )
