"""$facet: several sub-pipelines over the same input, one pass over
the source.

The input is cached once; each facet is an independent DataFrame the
caller can collect separately (Mongo returns them as one document —
callers wanting that shape union the labeled results, as q_facet
does). Caching matters at scale: without it every facet re-scans the
source; with it the scan is amortized across facets.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def facet(
    df: DataFrame, **pipelines: Callable[[DataFrame], DataFrame]
) -> dict[str, DataFrame]:
    cached = df.cache()
    return {name: fn(cached) for name, fn in pipelines.items()}
