"""Cube definitions.

The reference domain's core abstraction: a *cube* is a named
pre-aggregation of a source collection into **dimensions** (group-by
paths, time paths bucketed to a granularity) × **measures**
(re-aggregable accumulators). The reference configures these as JSON
documents; here a ``CubeSpec`` is a plain dataclass that is also
round-trippable to JSON (``to_json``/``from_json``) so a config-driven
deployment works the same way.

Design decision carried over from the domain (SURVEY.md §1.1): a cube
cell must be **re-aggregable** — any rollup of cells to a dimension
subset must equal direct aggregation of the source. Hence:

- ``avg`` is never stored; it is *decomposed* to (sum, count) at spec
  level and derived at query time (sum/count);
- sums are stored as exact DECIMAL partials (see functions.expressions
  — bit-stable under any re-partitioning / incremental merge order);
- min/max are stored as-is (re-aggregable under inserts; NOT
  maintainable under deletes — flagged via ``delete_safe``);
- ``distinct`` (count-distinct) is stored as a **mergeable HLL sketch**
  (Apache DataSketches via Spark's native ``hll_sketch_agg``): rollup
  unions sketches, estimate at query time. Exact count-distinct is not
  re-aggregable at all (distinct sets don't add), so the sketch IS the
  scale answer — a 100 TB source rolls up through ~KB of register
  state per cell instead of re-scanning. Inserts merge (set union is
  monotone); deletes are not retractable (like min/max) — flagged via
  ``delete_safe`` and repaired by the bounded cell-rescan path.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

_GRANULARITIES = ("year", "quarter", "month", "week", "day", "hour", "minute")

#: measure ops and whether a delete (retraction) can be applied
#: incrementally to the stored partial.
_OPS = {
    "count": True,
    "sum": True,
    "avg": True,  # stored as (sum, count) — both signed-mergeable
    "min": False,
    "max": False,
    "distinct": False,  # HLL sketch — union-mergeable, not retractable
    # fixed-bin histogram sketch: signed integer bins merge element-wise,
    # so unlike min/max/distinct this sketch IS retractable — quantile
    # estimates survive CDC deletes with no cell rescan.
    "quantile": True,
    # dispersion family (Mongo $stdDevPop/$stdDevSamp parity): stored as
    # decomposed (Σx, Σx², count) exact DECIMAL partials — signed-
    # mergeable like sum/avg, so fully retractable AND bit-stable under
    # any re-partitioning or batch order. The variance itself is derived
    # at query time (E[x²] − mean², clamped at 0) — never stored.
    "var_pop": True,
    "var_samp": True,
    "stddev_pop": True,
    "stddev_samp": True,
    # bounded frequent-items map (top-k / heavy hitters): merging two
    # summaries sums per-item counts then truncates back to max_items —
    # the standard mergeable-summary scheme (Agarwal et al., "Mergeable
    # Summaries", PODS'12). Truncation discards evicted items' history,
    # so deletes are not retractable (same repair policy as min/max/HLL:
    # bounded cell rescan). EXACT whenever per-cell cardinality stays
    # under max_items (no eviction ever happens).
    "topk": False,
}

#: valid lgConfigK range for Spark's hll_sketch_agg (Datasketches HLL).
_LGK_RANGE = (4, 21)

#: topk summary capacity: default and the hard cap Spark's
#: approx_top_k imposes on maxItemsTracked.
_DEFAULT_MAX_ITEMS = 10_000
_MAX_ITEMS_CAP = 1_000_000


def _ident(name: str) -> str:
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(f"invalid identifier: {name!r}")
    return name


@dataclass(frozen=True)
class Dimension:
    """Group-by key. ``path`` is a source column path or any SQL scalar
    expression (the $project-before-$group capability);
    ``granularity`` bucketizes a timestamp path (year/…/minute)."""

    name: str
    path: str | None = None  # defaults to name
    granularity: str | None = None

    def __post_init__(self):
        _ident(self.name)
        if self.granularity is not None and self.granularity not in _GRANULARITIES:
            raise ValueError(f"granularity must be one of {_GRANULARITIES}")

    @property
    def source_path(self) -> str:
        return self.path or self.name

    def expr(self) -> Column:
        c = F.expr(self.source_path)
        if self.granularity:
            c = F.date_trunc(self.granularity, c)
        return c.alias(self.name)

    def sql(self) -> str:
        """ANSI-SQL twin of :meth:`expr` (DuckDB-compatible)."""
        if self.granularity:
            return f"CAST(date_trunc('{self.granularity}', {self.source_path}) AS TIMESTAMP) AS {self.name}"
        return f"{self.source_path} AS {self.name}"


@dataclass(frozen=True)
class Measure:
    """An accumulator: op ∈ count/sum/avg/min/max over a source path
    (count needs no path). Storage columns per op:

    - count → ``<name>_cnt``
    - sum   → ``<name>_sum`` (DECIMAL partial)
    - avg   → ``<name>_sum`` + ``<name>_cnt`` (decomposed)
    - min   → ``<name>_min`` ; max → ``<name>_max``
    - distinct → ``<name>_hll`` (binary HLL sketch; ``lgk`` sets the
      sketch's lgConfigK — 2^lgk registers; None = Spark default)
    - quantile → ``<name>_hist`` (array<long> of ``nbins + 2`` signed
      bin counts over [``lo``, ``hi``); index 0 = underflow, nbins+1 =
      overflow; ``q`` is the default query-time quantile ∈ (0, 1]).
      Error is bounded by one bin width (hi − lo) / nbins for mass
      inside [lo, hi); out-of-range mass clamps to the range edge.
    - var_pop / var_samp / stddev_pop / stddev_samp →
      ``<name>_sum`` + ``<name>_sum2`` + ``<name>_cnt`` (decomposed
      Σx, Σx², n — exact DECIMAL partials; x² is squared in DOUBLE
      before the decimal cast, since the square of a decimal(38,6)
      overflows the type). Variance derives at query time as
      E[x²] − mean² (clamped at 0), sample forms divide by n−1 and
      are NULL for n < 2 (Mongo $stdDevSamp semantics).
    - topk → ``<name>_tk`` (map<item, long> of the cell's up-to-
      ``max_items`` most frequent values with their counts; ``k`` is
      the default query-time top-k ≤ max_items). NULL values never
      count (SQL COUNT semantics). Counts are EXACT while per-cell
      cardinality ≤ max_items; beyond that the summary truncates on
      merge (count desc, item asc tie-break — deterministic) and
      frequencies follow the mergeable-summary error bound.
    """

    name: str
    op: str
    path: str | None = None
    lgk: int | None = None  # distinct only: hll_sketch_agg lgConfigK
    lo: float | None = None  # quantile only: histogram range [lo, hi)
    hi: float | None = None
    nbins: int | None = None  # quantile only: fixed linear bin count
    q: float | None = None  # quantile only: default quantile (0.5)
    k: int | None = None  # topk only: default query-time top-k
    max_items: int | None = None  # topk only: summary capacity (default 10000)

    def __post_init__(self):
        _ident(self.name)
        if self.op not in _OPS:
            raise ValueError(f"op must be one of {sorted(_OPS)}")
        if self.op != "count" and not (self.path or self.name):
            raise ValueError(f"measure {self.name}: op {self.op} needs a path")
        if self.op == "quantile":
            if self.lo is None or self.hi is None or self.nbins is None:
                raise ValueError(
                    f"measure {self.name}: op 'quantile' needs lo, hi, nbins "
                    "(the fixed histogram range is part of the spec — pick it "
                    "from the column's domain)"
                )
            if not float(self.lo) < float(self.hi):
                raise ValueError(f"measure {self.name}: quantile needs lo < hi")
            if not (1 <= int(self.nbins) <= 4096):
                raise ValueError(f"measure {self.name}: nbins must be in [1, 4096]")
            if self.q is not None and not (0.0 < float(self.q) <= 1.0):
                raise ValueError(f"measure {self.name}: q must be in (0, 1]")
        elif any(v is not None for v in (self.lo, self.hi, self.nbins, self.q)):
            raise ValueError(
                f"measure {self.name}: lo/hi/nbins/q are only valid for op 'quantile'"
            )
        if self.op == "topk":
            if self.k is None:
                raise ValueError(
                    f"measure {self.name}: op 'topk' needs k (the default "
                    "query-time top-k; callers may still ask for any k' ≤ "
                    "max_items at query time)"
                )
            if not (1 <= int(self.k) <= _MAX_ITEMS_CAP):
                raise ValueError(f"measure {self.name}: k must be in [1, {_MAX_ITEMS_CAP}]")
            mi = _DEFAULT_MAX_ITEMS if self.max_items is None else int(self.max_items)
            if not (int(self.k) <= mi <= _MAX_ITEMS_CAP):
                raise ValueError(
                    f"measure {self.name}: max_items must be in [k, {_MAX_ITEMS_CAP}]"
                )
        elif self.k is not None or self.max_items is not None:
            raise ValueError(
                f"measure {self.name}: k/max_items are only valid for op 'topk'"
            )
        if self.lgk is not None:
            if self.op != "distinct":
                raise ValueError(f"measure {self.name}: lgk is only valid for op 'distinct'")
            if not (_LGK_RANGE[0] <= self.lgk <= _LGK_RANGE[1]):
                raise ValueError(
                    f"measure {self.name}: lgk must be in [{_LGK_RANGE[0]}, {_LGK_RANGE[1]}]"
                )

    @property
    def source_path(self) -> str:
        return self.path or self.name

    @property
    def delete_safe(self) -> bool:
        return _OPS[self.op]

    def storage_cols(self) -> list[str]:
        n = self.name
        return {
            "count": [f"{n}_cnt"],
            "sum": [f"{n}_sum"],
            "avg": [f"{n}_sum", f"{n}_cnt"],
            "min": [f"{n}_min"],
            "max": [f"{n}_max"],
            "distinct": [f"{n}_hll"],
            "quantile": [f"{n}_hist"],
            # r15: the map travels with its MASS (signed count of
            # non-null source rows) — serve-time mass conservation is
            # the exact-regime certificate (sf100 found approx_top_k
            # returning EMPTY once frequent-items purges: a silent
            # wrong answer without the check)
            "topk": [f"{n}_tk", f"{n}_tkn"],
            # the whole dispersion family shares one storage shape; a
            # single set of partials answers var/stddev, pop/samp alike
            "var_pop": [f"{n}_sum", f"{n}_sum2", f"{n}_cnt"],
            "var_samp": [f"{n}_sum", f"{n}_sum2", f"{n}_cnt"],
            "stddev_pop": [f"{n}_sum", f"{n}_sum2", f"{n}_cnt"],
            "stddev_samp": [f"{n}_sum", f"{n}_sum2", f"{n}_cnt"],
        }[self.op]

    @property
    def default_q(self) -> float:
        """Query-time quantile when none is asked for (median)."""
        return 0.5 if self.q is None else float(self.q)

    @property
    def capacity(self) -> int:
        """topk summary capacity (max tracked items per cell)."""
        return _DEFAULT_MAX_ITEMS if self.max_items is None else int(self.max_items)

    @property
    def default_k(self) -> int:
        """Query-time top-k when none is asked for."""
        return int(self.k) if self.k is not None else 5


@dataclass(frozen=True)
class CubeSpec:
    """A cube: source table name + dims + measures (+ optional
    pre-aggregation filter, the ``$match`` stage of the population
    pipeline)."""

    name: str
    source: str
    dimensions: tuple[Dimension, ...] = field(default_factory=tuple)
    measures: tuple[Measure, ...] = field(default_factory=tuple)
    filter_sql: str | None = None  # WHERE clause on the source, ANSI SQL

    def __post_init__(self):
        _ident(self.name)
        names = [d.name for d in self.dimensions] + [m.name for m in self.measures]
        if len(set(names)) != len(names):
            raise ValueError(f"cube {self.name}: duplicate dim/measure names")
        if not self.measures:
            raise ValueError(f"cube {self.name}: at least one measure required")

    @property
    def dim_names(self) -> list[str]:
        return [d.name for d in self.dimensions]

    @property
    def delete_safe(self) -> bool:
        """True iff every measure partial supports signed (retraction)
        merge — i.e. the cube can be maintained under CDC deletes."""
        return all(m.delete_safe for m in self.measures)

    def measure(self, name: str) -> Measure:
        for m in self.measures:
            if m.name == name:
                return m
        raise KeyError(f"cube {self.name}: no measure {name!r}")

    # -- JSON config round-trip (the reference domain is config-driven) --

    def to_json(self) -> str:
        return json.dumps(
            {
                "name": self.name,
                "source": self.source,
                "filter_sql": self.filter_sql,
                "dimensions": [
                    {"name": d.name, "path": d.path, "granularity": d.granularity}
                    for d in self.dimensions
                ],
                "measures": [
                    {"name": m.name, "op": m.op, "path": m.path}
                    | ({"lgk": m.lgk} if m.lgk is not None else {})
                    | (
                        {"lo": m.lo, "hi": m.hi, "nbins": m.nbins}
                        | ({"q": m.q} if m.q is not None else {})
                        if m.op == "quantile"
                        else {}
                    )
                    | (
                        {"k": m.k}
                        | ({"max_items": m.max_items} if m.max_items is not None else {})
                        if m.op == "topk"
                        else {}
                    )
                    for m in self.measures
                ],
            },
            indent=2,
        )

    @staticmethod
    def from_json(s: str) -> "CubeSpec":
        d = json.loads(s)
        return CubeSpec(
            name=d["name"],
            source=d["source"],
            filter_sql=d.get("filter_sql"),
            dimensions=tuple(Dimension(**x) for x in d.get("dimensions", [])),
            measures=tuple(Measure(**x) for x in d.get("measures", [])),
        )
