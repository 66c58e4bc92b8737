"""Geospatial proximity: haversine distance + $geoNear semantics.

MongoDB's $geoNear stage (2dsphere) returns documents sorted by
spherical distance from a query point, with the distance in a named
field and optional ``maxDistance``/``query`` pre-filters. The engine
expresses the same thing as pure Column arithmetic — distance is one
codegen expression over two double columns, the filter pushes into the
scan, and the sort is a regular (optionally top-k) sort, so the plan
scales like any filter+sort rather than needing a geo index: at 100 TB
the win of an index is pruning, which here comes from partition/
file-level min-max pruning on the lat/lon columns when the layout
clusters them (standard lakehouse practice), not from an R-tree.

Determinism note: sin/cos differ in the last ulp between the JVM and
libm, so cross-engine comparisons must round distances (the oracle
uses 1 mm) — double ARITHMETIC is bit-stable, transcendentals are not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: mean Earth radius in meters (the usual spherical-model constant)
EARTH_RADIUS_M = 6_371_000.0


def haversine_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in meters between two (degree) points —
    a single whole-stage-codegen expression, no UDF."""
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlmb / 2)
        * F.sin(dlmb / 2)
    )
    return F.lit(2 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def geo_near(
    df: DataFrame,
    lat: float,
    lon: float,
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
    distance_col: str = "distance_m",
    max_distance_m: float | None = None,
    limit: int | None = None,
) -> DataFrame:
    """$geoNear: distance-annotated documents, nearest first.

    ``max_distance_m`` filters BEFORE the sort (predicate stays next to
    the scan); ``limit`` makes the sort a top-k (TakeOrdered — no
    global sort at scale). Ties break on the distance only, matching
    Mongo; callers needing total determinism add their own key.
    """
    d = haversine_m(F.col(lat_col), F.col(lon_col), F.lit(float(lat)), F.lit(float(lon)))
    out = df.withColumn(distance_col, d)
    if max_distance_m is not None:
        out = out.filter(F.col(distance_col) <= float(max_distance_m))
    out = out.orderBy(distance_col)
    if limit is not None:
        out = out.limit(limit)
    return out
