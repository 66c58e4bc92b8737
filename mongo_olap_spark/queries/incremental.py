"""C11–C13 — incremental cube maintenance as oracle-checkable queries.

The trick that makes IVM *fully* SQL-checkable: the CDC fixture has a
closed-form net state (streaming/cdc.py), and correct incremental
maintenance is invisible — the maintained cube must equal a direct
aggregation of the net source. So the oracle is plain GROUP BY SQL
over the appropriate WHERE, while the Spark side actually runs
build → delta → signed merge.

q_incr_insert: base cube from the first 20 days, then the remaining
days applied as insert deltas. Oracle: aggregate over ALL events.

q_incr_delete: base cube from all inserts, then the CDC deletes
(event_id % 10 == 9) applied as −1 retractions (cells hitting zero
rows are evicted). Oracle: aggregate over surviving events only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_olap_spark.cube import build_cube, query_cube
from mongo_olap_spark.cube.build import delta_cells
from mongo_olap_spark.cube.ivm import merge_cells
from mongo_olap_spark.functions.expressions import davg_sql, dsum_sql
from mongo_olap_spark.queries import register
from mongo_olap_spark.queries.core import EVENTS_CUBE
from mongo_olap_spark.sources.tables import load_table
from mongo_olap_spark.streaming.cdc import cdc_from_events

_SPLIT_TS = "2024-01-21 00:00:00"


@register(
    "q_incr_insert",
    oracle=f"""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n,
           {dsum_sql('value')} AS total_value,
           {davg_sql('value')} AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_incr_insert(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    base = e.filter(F.col("ts") < F.lit(_SPLIT_TS).cast("timestamp"))
    tail = e.filter(F.col("ts") >= F.lit(_SPLIT_TS).cast("timestamp"))
    cells = build_cube(spark, EVENTS_CUBE, base)
    deltas = delta_cells(EVENTS_CUBE, tail.withColumn("mult", F.lit(1)))
    merged = merge_cells(cells, deltas, EVENTS_CUBE)
    return query_cube(merged, EVENTS_CUBE)


@register(
    "q_incr_delete",
    oracle=f"""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n,
           {dsum_sql('value')} AS total_value,
           {davg_sql('value')} AS avg_value
    FROM events
    WHERE event_id % 10 <> 9
    GROUP BY 1, 2
    """,
)
def q_incr_delete(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    cdc = cdc_from_events(e)
    cells = build_cube(spark, EVENTS_CUBE, cdc.filter(F.col("op") == "insert"))
    deltas = delta_cells(EVENTS_CUBE, cdc.filter(F.col("op") == "delete"))
    merged = merge_cells(cells, deltas, EVENTS_CUBE)
    return query_cube(merged, EVENTS_CUBE)


# ---------------------------------------------------------------------------
# §4.1 aggregate routing, end-to-end under the oracle: define two cubes
# (daily fine / monthly coarse), route a monthly request — the router
# must pick the coarse cube from manifest statistics alone — and serve
# it by rollup. Correct routing is *invisible*: the answer must equal a
# direct aggregation of the source, which is exactly what the oracle
# states. A routing regression (wrong cube, stale cells, broken
# re-bucketing) breaks the hash.
# ---------------------------------------------------------------------------

@register(
    "q_route_cube",
    oracle=f"""
    SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
           COUNT(*) AS n,
           {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY 1
    """,
)
def q_route_cube(spark, sf_dir):
    import os
    import tempfile

    from mongo_olap_spark.cube import CubeCatalog, CubeSpec, Dimension, Measure
    from mongo_olap_spark.plans import AggregateRequest, CubeRouter

    root = os.path.join(
        tempfile.gettempdir(), "mongo_olap_route", sf_dir.strip("/").replace("/", "_")
    )
    cat = CubeCatalog(spark, root)
    e = load_table(spark, sf_dir, "events")
    monthly = CubeSpec(
        name="events_monthly_route",
        source="events",
        dimensions=(Dimension("month", path="ts", granularity="month"),),
        measures=(Measure("n", "count"), Measure("total_value", "sum", "value")),
    )
    cat.drop(EVENTS_CUBE.name)
    cat.drop(monthly.name)
    cat.create(EVENTS_CUBE, e)
    cat.create(monthly, e)
    router = CubeRouter(cat)
    req = AggregateRequest(
        source="events", group_by=(("ts", "month"),), measures=("n", "total_value")
    )
    decision = router.route(req)
    # both cubes serve a monthly rollup; manifest stats must pick the
    # smaller — fail loudly rather than silently serving the fine cube
    assert decision.cube == monthly.name, decision
    return router.execute(req)


# ---------------------------------------------------------------------------
# C19 routed: a countDistinct-shaped request is served from the exact
# two-level cube (counted column as a dimension) via the ROUTER — the
# user asks, the router finds the cube, distinct_rollup answers from
# live cells. Correct routing is invisible: the answer must equal
# COUNT(DISTINCT ...) over the source, which is the oracle. (r8 gap:
# distinct_rollup existed but only as a direct API call.)
# ---------------------------------------------------------------------------

@register(
    "q_route_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_route_distinct(spark, sf_dir):
    import os
    import tempfile

    from mongo_olap_spark.cube import CubeCatalog, CubeSpec, Dimension, Measure
    from mongo_olap_spark.plans import AggregateRequest, CubeRouter

    root = os.path.join(
        tempfile.gettempdir(), "mongo_olap_route_cd", sf_dir.strip("/").replace("/", "_")
    )
    cat = CubeCatalog(spark, root)
    e = load_table(spark, sf_dir, "events")
    exact = CubeSpec(
        name="events_users_exact_route",
        source="events",
        dimensions=(Dimension("event_type"), Dimension("user_id")),
        measures=(Measure("n", "count"),),
    )
    cat.drop(exact.name)
    cat.create(exact, e)
    router = CubeRouter(cat)
    req = AggregateRequest(
        source="events",
        group_by=("event_type",),
        measures=(("n_users", "count_distinct", "user_id"), ("n", "count")),
    )
    decision = router.route(req)
    assert decision.cube == exact.name, decision
    out = router.execute(req)
    return out.select("event_type", "n_users", "n")


# ---------------------------------------------------------------------------
# C20 routed: a percentile-shaped request ('quantile_exact') is served
# from the exact two-level cube (measured column as a dimension) via
# the ROUTER — quantile_rollup reads the discrete inverse-CDF off live
# cells. Correct routing is invisible: the answer must equal the
# discrete (type-1) median over the source, which is the oracle.
# ---------------------------------------------------------------------------

@register(
    "q_route_quantile",
    oracle="""
    WITH v AS (
      SELECT event_type, value, COUNT(*) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, value
    ),
    w AS (
      SELECT event_type, value,
             SUM(c) OVER (PARTITION BY event_type ORDER BY value) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS tot
      FROM v
    )
    SELECT event_type, MIN(value) AS p50
    FROM w WHERE cum >= CEIL(ROUND(0.5 * tot, 9))
    GROUP BY event_type
    """,
)
def q_route_quantile(spark, sf_dir):
    import os
    import tempfile

    from mongo_olap_spark.cube import CubeCatalog, CubeSpec, Dimension, Measure
    from mongo_olap_spark.plans import AggregateRequest, CubeRouter

    root = os.path.join(
        tempfile.gettempdir(), "mongo_olap_route_qe", sf_dir.strip("/").replace("/", "_")
    )
    cat = CubeCatalog(spark, root)
    e = load_table(spark, sf_dir, "events")
    exact = CubeSpec(
        name="events_value_exact_route",
        source="events",
        dimensions=(Dimension("event_type"), Dimension("value")),
        measures=(Measure("n", "count"),),
    )
    cat.drop(exact.name)
    cat.create(exact, e)
    router = CubeRouter(cat)
    req = AggregateRequest(
        source="events",
        group_by=("event_type",),
        measures=(("p50", "quantile_exact", "value", 0.5),),
    )
    decision = router.route(req)
    assert decision.cube == exact.name, decision
    return router.execute(req).select("event_type", "p50")


# ---------------------------------------------------------------------------
# C21 routed: a topN-shaped request ('topn') is served from the exact
# two-level cube (ranked column as a dimension) via the ROUTER —
# topk_rollup ranks live cells with a windowed row_number
# (WindowGroupLimit: the exchange carries O(groups · k), not
# O(cells)). Correct routing is invisible: the answer must equal a
# windowed top-3 over the source, which is the oracle.
# ---------------------------------------------------------------------------

@register(
    "q_route_topn",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id, COUNT(*) AS cnt
      FROM events WHERE user_id IS NOT NULL
      GROUP BY event_type, user_id
    ),
    r AS (
      SELECT event_type, user_id AS top_user, cnt AS top_user_cnt,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY cnt DESC, user_id ASC
             ) AS rank
      FROM c
    )
    SELECT event_type, top_user, top_user_cnt, rank FROM r WHERE rank <= 3
    """,
)
def q_route_topn(spark, sf_dir):
    import os
    import tempfile

    from mongo_olap_spark.cube import CubeCatalog, CubeSpec, Dimension, Measure
    from mongo_olap_spark.plans import AggregateRequest, CubeRouter

    root = os.path.join(
        tempfile.gettempdir(), "mongo_olap_route_tn", sf_dir.strip("/").replace("/", "_")
    )
    cat = CubeCatalog(spark, root)
    e = load_table(spark, sf_dir, "events")
    exact = CubeSpec(
        name="events_users_topn_route",
        source="events",
        dimensions=(Dimension("event_type"), Dimension("user_id")),
        measures=(Measure("n", "count"),),
    )
    cat.drop(exact.name)
    cat.create(exact, e)
    router = CubeRouter(cat)
    req = AggregateRequest(
        source="events",
        group_by=("event_type",),
        measures=(("top_user", "topn", "user_id", 3),),
    )
    decision = router.route(req)
    assert decision.cube == exact.name, decision
    out = router.execute(req)
    return out.select(
        "event_type", "top_user", "top_user_cnt",
        F.col("rank").cast("long").alias("rank"),
    )


# ---------------------------------------------------------------------------
# C23 routed: a $minN-shaped request ('min_n') is served from the
# exact two-level cube via the ROUTER — extremes_rollup expands the k
# smallest values (duplicates kept) from the ≤ k boundary cells.
# Correct routing is invisible: the answer must equal a windowed
# bottom-5 list over the source, which is the oracle.
# ---------------------------------------------------------------------------

@register(
    "q_route_minn",
    oracle="""
    WITH v AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    lo AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value ASC) AS rnk
      FROM v
    )
    SELECT event_type, rnk, value FROM lo WHERE rnk <= 5
    """,
)
def q_route_minn(spark, sf_dir):
    import os
    import tempfile

    from mongo_olap_spark.cube import CubeCatalog, CubeSpec, Dimension, Measure
    from mongo_olap_spark.plans import AggregateRequest, CubeRouter

    root = os.path.join(
        tempfile.gettempdir(), "mongo_olap_route_mn", sf_dir.strip("/").replace("/", "_")
    )
    cat = CubeCatalog(spark, root)
    e = load_table(spark, sf_dir, "events")
    exact = CubeSpec(
        name="events_value_minn_route",
        source="events",
        dimensions=(Dimension("event_type"), Dimension("value")),
        measures=(Measure("n", "count"),),
    )
    cat.drop(exact.name)
    cat.create(exact, e)
    router = CubeRouter(cat)
    req = AggregateRequest(
        source="events",
        group_by=("event_type",),
        measures=(("low_values", "min_n", "value", 5),),
    )
    decision = router.route(req)
    assert decision.cube == exact.name, decision
    out = router.execute(req)
    # the routed API returns the $minN-shaped array; flatten to
    # (rank, value) rows for the oracle compare
    ex = out.select("event_type", F.posexplode("low_values").alias("pos", "value"))
    return ex.select(
        "event_type", (F.col("pos") + 1).cast("long").alias("rnk"), "value"
    )


# ---------------------------------------------------------------------------
# C24 routed: a $topN-with-sortBy-shaped request ('top_by') is served
# from the exact two-level cube via the ROUTER — top_by_rollup expands
# the payloads of the k first cells in (sort, payload) order. Ties on
# the sort key break by payload ascending (deterministic — Mongo's own
# $topN tie order is unspecified), which is exactly what the oracle's
# two-key window states.
# ---------------------------------------------------------------------------

@register(
    "q_route_topby",
    oracle="""
    WITH v AS (
      SELECT event_type, value, user_id FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT event_type, user_id,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY value ASC, user_id ASC
             ) AS rnk
      FROM v
    )
    SELECT event_type, rnk, user_id AS cheapest_user FROM r WHERE rnk <= 3
    """,
)
def q_route_topby(spark, sf_dir):
    import os
    import tempfile

    from mongo_olap_spark.cube import CubeCatalog, CubeSpec, Dimension, Measure
    from mongo_olap_spark.plans import AggregateRequest, CubeRouter

    root = os.path.join(
        tempfile.gettempdir(), "mongo_olap_route_tb", sf_dir.strip("/").replace("/", "_")
    )
    cat = CubeCatalog(spark, root)
    e = load_table(spark, sf_dir, "events")
    exact = CubeSpec(
        name="events_topby_route",
        source="events",
        dimensions=(
            Dimension("event_type"),
            Dimension("value"),
            Dimension("user_id"),
        ),
        measures=(Measure("n", "count"),),
    )
    cat.drop(exact.name)
    cat.create(exact, e)
    router = CubeRouter(cat)
    req = AggregateRequest(
        source="events",
        group_by=("event_type",),
        measures=(("cheapest_user", "top_by", "value", "user_id", 3),),
    )
    decision = router.route(req)
    assert decision.cube == exact.name, decision
    out = router.execute(req)
    ex = out.select("event_type", F.posexplode("cheapest_user").alias("pos", "u"))
    return ex.select(
        "event_type",
        (F.col("pos") + 1).cast("long").alias("rnk"),
        F.col("u").alias("cheapest_user"),
    )


# ---------------------------------------------------------------------------
# §4.1' lambda serving: the maintained cube lags the source by an
# un-applied tail; hybrid_query answers from cells + tail partials in
# one shuffle. Correct hybrid serving is invisible — the answer must
# equal a direct aggregation of the WHOLE source, which is the oracle.
# ---------------------------------------------------------------------------

@register(
    "q_route_hybrid",
    oracle=f"""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n,
           {dsum_sql('value')} AS total_value,
           {davg_sql('value')} AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_route_hybrid(spark, sf_dir):
    from mongo_olap_spark.cube.query import hybrid_query

    e = load_table(spark, sf_dir, "events")
    historical = e.filter(F.col("ts") < F.lit(_SPLIT_TS).cast("timestamp"))
    tail = e.filter(F.col("ts") >= F.lit(_SPLIT_TS).cast("timestamp"))
    cells = build_cube(spark, EVENTS_CUBE, historical)
    return hybrid_query(cells, EVENTS_CUBE, tail)


# ---------------------------------------------------------------------------
# C13 — IVM update: a change-stream update is a −1 retraction of the
# pre-image plus a +1 insert of the post-image through the SAME signed
# merge as inserts/deletes. Closed-form truth: every event_id % 10 == 5
# doubles its value, so the oracle aggregates the post-update state
# directly — correct update maintenance is invisible.
# ---------------------------------------------------------------------------

@register(
    "q_incr_update",
    oracle=f"""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n,
           {dsum_sql("CASE WHEN event_id % 10 = 5 THEN value * 2 ELSE value END")} AS total_value,
           {davg_sql("CASE WHEN event_id % 10 = 5 THEN value * 2 ELSE value END")} AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_incr_update(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    cells = build_cube(spark, EVENTS_CUBE, e)
    upd = e.filter(F.col("event_id") % 10 == 5)
    pre = upd.withColumn("mult", F.lit(-1))
    post = upd.withColumn("value", F.col("value") * 2).withColumn("mult", F.lit(1))
    deltas = delta_cells(EVENTS_CUBE, pre.unionByName(post))
    merged = merge_cells(cells, deltas, EVENTS_CUBE)
    return query_cube(merged, EVENTS_CUBE)
