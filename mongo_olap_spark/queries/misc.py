"""Remaining pipeline stages (SURVEY.md §2.2): $sample (deterministic
hash-order variant), $replaceRoot, the date-expression surface,
sessionization (gap-based), $graphLookup (iterative self-join to
fixpoint — oracle: recursive CTE), $facet, and a sliding-window
aggregation (streaming-surface op run on the batch table; rows-only).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mongo_olap_spark.functions.expressions import dsum, dsum_sql
from mongo_olap_spark.queries import register
from mongo_olap_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# S17 — $sample. Mongo's is nondeterministic; the engine's testable
# variant is hash-ordered pseudo-random sampling (stable across engines
# and runs — md5 of the key). df.sample(fraction, seed) also exists but
# its row set is partitioning-dependent, i.e. not portable.
# ---------------------------------------------------------------------------

@register(
    "q_sample",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
    LIMIT 100
    """,
)
def q_sample(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.md5(F.col("o_orderkey").cast("string")), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# S16 — $replaceRoot / $replaceWith: build a subdocument, promote it.
# ---------------------------------------------------------------------------

@register(
    "q_replace_root",
    oracle="""
    SELECT o_orderkey AS okey,
           CAST(year(o_orderdate) AS INT) AS oyear,
           o_totalprice AS price
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def q_replace_root(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    nested = o.filter(F.col("o_orderstatus") == "F").select(
        F.struct(
            F.col("o_orderkey").alias("okey"),
            F.year("o_orderdate").alias("oyear"),
            F.col("o_totalprice").alias("price"),
        ).alias("doc")
    )
    return nested.select("doc.*")


# ---------------------------------------------------------------------------
# Date-expression surface ($year…$dateDiff / $dateAdd / $dateToString)
# ---------------------------------------------------------------------------

@register(
    "q_datetime",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS INT)      AS y,
           CAST(month(ts) AS INT)     AS mo,
           CAST(dayofmonth(ts) AS INT) AS d,
           CAST(hour(ts) AS INT)      AS h,
           CAST(minute(ts) AS INT)    AS mi,
           CAST(dayofweek(ts) + 1 AS INT) AS dow,   -- DuckDB 0=Sun; Spark 1=Sun
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(week(ts) AS INT)      AS iso_week,
           strftime(ts, '%Y-%m-%d')   AS day_str,
           ts + INTERVAL 7 DAY        AS plus_week,
           CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS INT) AS days_since_start
    FROM events
    WHERE event_id < 500
    """,
)
def q_datetime(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return e.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.dayofweek("ts").alias("dow"),
        F.dayofyear("ts").alias("doy"),
        F.weekofyear("ts").alias("iso_week"),
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
        F.expr("ts + interval 7 days").alias("plus_week"),
        F.expr(
            "timestampdiff(DAY, timestamp '2024-01-01 00:00:00', ts)"
        ).cast("int").alias("days_since_start"),
    )


# ---------------------------------------------------------------------------
# Sessionization: gap > 30 min starts a new session (lag + cumsum —
# the batch twin of streaming session_window; one shuffle on user_id).
# ---------------------------------------------------------------------------

@register(
    "q_sessionize",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS INT) AS session_id,
           COUNT(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           {dsum_sql('value')} AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    # ONE window ordering for both the lag and the running sum — two
    # specs differing only in tiebreak cost a second sort (VERDICT r1
    # What's-wrong #6); the oracle CTE carries the same (ts, event_id)
    # order so results stay hash-exact
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, 0)
    # unix_micros, NOT cast("long"): the long cast truncates sub-second
    # precision, so a gap in (1800.0, 1801.0) s reads as exactly 1800
    # and wrongly stays in-session while the oracle's full-precision
    # INTERVAL comparison opens a new one (10-session miss at sf1 —
    # round-9 finding; sf0.01/sf0.1 passed only because no gap landed
    # in the fractional boundary zone)
    prev = F.lag(F.col("ts")).over(w)
    marked = e.withColumn(
        "new_session",
        F.when(
            (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 1800 * 1_000_000)
            | prev.isNull(),
            1,
        ).otherwise(0),
    )
    sessions = marked.withColumn("session_id", F.sum("new_session").over(wrun).cast("int"))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        dsum("value", "session_value"),
    )


# ---------------------------------------------------------------------------
# S9 — $graphLookup: bounded-depth transitive closure by iterative
# self-join (Spark has no recursive SQL; the driver loop IS the public
# pattern — each iteration is one broadcast-able equi join). Edge table:
# supplier chain s → s−1 (deterministic, testdata-derived). Oracle:
# DuckDB recursive CTE.
# ---------------------------------------------------------------------------

@register(
    "q_graph_lookup",
    oracle="""
    WITH RECURSIVE hops AS (
      SELECT s_suppkey AS start_key, s_suppkey AS node, 0 AS depth
      FROM supplier WHERE s_suppkey % 10 = 0
      UNION ALL
      SELECT h.start_key, e.dst, h.depth + 1
      FROM hops h
      JOIN (SELECT s_suppkey AS src, s_suppkey - 1 AS dst
            FROM supplier WHERE s_suppkey > 0) e ON e.src = h.node
      WHERE h.depth < 3
    )
    SELECT start_key, node, CAST(depth AS INT) AS depth
    FROM hops WHERE depth > 0
    """,
)
def q_graph_lookup(spark, sf_dir):
    from mongo_olap_spark.operators.graph import graph_lookup

    s = load_table(spark, sf_dir, "supplier")
    edges = (
        s.filter(F.col("s_suppkey") > 0)
        .select(F.col("s_suppkey").alias("src"), (F.col("s_suppkey") - 1).alias("dst"))
    )
    starts = s.filter(F.col("s_suppkey") % 10 == 0).select(
        F.col("s_suppkey").alias("start_key")
    )
    return graph_lookup(starts, edges, max_depth=3)


# ---------------------------------------------------------------------------
# S15 — $facet: several sub-pipelines over one cached input, results
# labeled and unioned (each facet is independently a plain aggregate,
# so the union is oracle-checkable).
# ---------------------------------------------------------------------------

@register(
    "q_facet",
    oracle=f"""
    SELECT 'by_type' AS facet, event_type AS key,
           COUNT(*) AS n, {dsum_sql('value')} AS total
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'by_day', strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d'),
           COUNT(*), {dsum_sql('value')}
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'overall', 'all', COUNT(*), {dsum_sql('value')} FROM events
    """,
)
def q_facet(spark, sf_dir):
    # aggregate facets = grouping sets: ONE scan + one aggregate, no
    # cache to manage (operators/facet.py keeps the cached-input path
    # for heterogeneous facets only)
    from mongo_olap_spark.operators.facet import grouping_sets_facets

    e = load_table(spark, sf_dir, "events").withColumn(
        "day_key", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    return grouping_sets_facets(
        e,
        {"by_type": ["event_type"], "by_day": ["day_key"], "overall": []},
        F.count(F.lit(1)).alias("n"),
        dsum("value", "total"),
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot — the OLAP-layer reshape pair (Mongo emulates pivot
# with $group+$arrayToObject; Spark has it natively). Oracle states the
# pivot as conditional aggregation, the engine uses .pivot() — same
# semantics, Catalyst plans one aggregate either way.
# ---------------------------------------------------------------------------

@register(
    "q_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
           {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
        .withColumnsRenamed({"O": "qty_O", "F": "qty_F"})
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT o_orderkey, 'price' AS metric, o_totalprice AS value FROM orders WHERE o_orderkey < 1000
    UNION ALL
    SELECT o_orderkey, 'year', CAST(year(o_orderdate) AS DOUBLE) FROM orders WHERE o_orderkey < 1000
    """,
)
def q_unpivot(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    wide = o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.year("o_orderdate").cast("double").alias("year"),
    )
    return wide.unpivot(
        "o_orderkey", ["price", "year"], "metric", "value"
    )


# ---------------------------------------------------------------------------
# $text-style search: conjunctive term match + term-frequency score
# over an inverted index (tokenize → explode → postings). No FTS
# engine: the relational shape IS the scale path (postings shuffle
# once; scoring is an aggregate).
# ---------------------------------------------------------------------------

@register(
    "q_text_search",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    hits AS (
      SELECT doc_id,
             SUM(CASE WHEN tok = 'spark' THEN 1 ELSE 0 END) AS tf_spark,
             SUM(CASE WHEN tok = 'join' THEN 1 ELSE 0 END)  AS tf_join
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(tf_spark AS INT) AS tf_spark,
           CAST(tf_join AS INT)  AS tf_join,
           CAST(tf_spark + tf_join AS INT) AS score
    FROM hits
    WHERE tf_spark > 0 AND tf_join > 0
    """,
)
def q_text_search(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    hits = toks.groupBy("doc_id").agg(
        F.sum(F.when(F.col("tok") == "spark", 1).otherwise(0)).cast("int").alias("tf_spark"),
        F.sum(F.when(F.col("tok") == "join", 1).otherwise(0)).cast("int").alias("tf_join"),
    )
    return (
        hits.filter((F.col("tf_spark") > 0) & (F.col("tf_join") > 0))
        .withColumn("score", (F.col("tf_spark") + F.col("tf_join")).cast("int"))
    )


# ---------------------------------------------------------------------------
# Sliding-window aggregation (streaming surface op on the batch table;
# window() emits overlapping buckets → rows-only, verified in pytest)
# ---------------------------------------------------------------------------

@register("q_sliding_window")
def q_sliding_window(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# S21 — $redact: conditional document-tree pruning. Formerly a declared
# non-goal; implemented round 2 as a plan-time recursive walk
# (operators/redact.py) that emits one nested CASE/struct expression —
# redact costs a projection, not a per-document interpreter. The query
# nests events into doc{meta{level, inner{level, tag}}, payload{level,
# value}} and applies the ACL-style level gate (prune >= 2, keep == 0,
# else descend); the oracle replays the same decisions as scalar CASE
# arithmetic. KEEP is observable: meta.level == 0 stops the descent, so
# inner survives even when inner.level would prune.
# ---------------------------------------------------------------------------

@register(
    "q_redact",
    oracle="""
    SELECT event_id,
           CASE WHEN user_id % 3 = 2 THEN NULL
                WHEN user_id % 3 = 0 THEN event_type
                WHEN event_id % 3 = 2 THEN NULL
                ELSE event_type END AS tag,
           CASE WHEN CAST(floor(value) AS BIGINT) % 3 >= 2 THEN NULL
                ELSE value END AS pay_value
    FROM events
    """,
)
def q_redact(spark, sf_dir):
    from mongo_olap_spark.operators.redact import level_gate, redact_document

    e = load_table(spark, sf_dir, "events")
    doc = F.struct(
        F.struct(
            (F.col("user_id") % 3).alias("level"),
            F.struct(
                (F.col("event_id") % 3).alias("level"),
                F.col("event_type").alias("tag"),
            ).alias("inner"),
        ).alias("meta"),
        F.struct(
            (F.floor("value").cast("bigint") % 3).alias("level"),
            F.col("value").alias("value"),
        ).alias("payload"),
    )
    nested = e.select("event_id", doc.alias("doc"))
    redacted = redact_document(nested, "doc", level_gate(prune_at=2, keep_at=0))
    return redacted.select(
        "event_id",
        F.col("doc.meta.inner.tag").alias("tag"),
        F.col("doc.payload.value").alias("pay_value"),
    )


# ---------------------------------------------------------------------------
# $sample, stratified: fixed-size per-stratum sample. Same portability
# policy as q_sample — md5-hash order, not rand(): the row set is a
# pure function of the data, so it is identical across engines,
# partitionings, and runs. Scale: one shuffle on the stratum key; the
# per-stratum window never materializes more than its partition.
# ---------------------------------------------------------------------------

@register(
    "q_sample_stratified",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ) WHERE rn <= 50
    """,
)
def q_sample_stratified(spark, sf_dir):
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 50)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# cohort retention: first-seen day × active day matrix — the classic
# event-analytics rollup the reference's cube domain serves. The
# cohort dim is a per-user aggregate joined back (broadcast — users
# ≪ events), then one count-distinct grouping.
# ---------------------------------------------------------------------------

@register(
    "q_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS cohort
      FROM events GROUP BY user_id
    )
    SELECT f.cohort,
           CAST(date_trunc('day', e.ts) AS TIMESTAMP) AS active_day,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q_retention(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort")
    )
    return (
        e.join(F.broadcast(first_seen), "user_id")
        .groupBy("cohort", F.date_trunc("day", "ts").alias("active_day"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# anomaly pick: per-user top-3 deviations from the user's median.
# Rank-based rather than z-threshold on purpose: |v − median| is one
# exactly-rounded subtraction from engine-identical inputs, so the
# ordering (and the oracle hash) is deterministic — a float z-score
# THRESHOLD would make row membership depend on last-bit float
# differences between engines.
# ---------------------------------------------------------------------------

@register(
    "q_anomaly",
    oracle="""
    SELECT user_id, event_id, value FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY abs(value - med) DESC, event_id) AS rn
      FROM (
        SELECT user_id, event_id, value,
               quantile_cont(value, 0.5) OVER (PARTITION BY user_id) AS med
        FROM events
      )
    ) WHERE rn <= 3
    """,
)
def q_anomaly(spark, sf_dir):
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    wmed = Window.partitionBy("user_id")
    wrank = Window.partitionBy("user_id").orderBy(
        F.abs(F.col("value") - F.col("med")).desc(), F.col("event_id")
    )
    return (
        e.select(
            "user_id", "event_id", "value",
            F.expr("percentile(value, 0.5)").over(wmed).alias("med"),
        )
        .withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "value")
    )


# ---------------------------------------------------------------------------
# ordered funnel: users reaching view → click → purchase in timestamp
# order. One groupBy(user) with conditional-min stage times, one tiny
# final aggregate — no joins, no window, two shuffles total.
# ---------------------------------------------------------------------------

@register(
    "q_funnel",
    oracle="""
    WITH stage AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS n_view,
           COUNT(*) FILTER (WHERE t_click > t_view) AS n_click_after_view,
           COUNT(*) FILTER (WHERE t_purchase > t_click AND t_click > t_view)
             AS n_full_funnel
    FROM stage
    """,
)
def q_funnel(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")

    def stage_min(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts"))).alias(f"t_{t}")

    stages = e.groupBy("user_id").agg(
        stage_min("view"), stage_min("click"), stage_min("purchase")
    )
    return stages.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias(
            "n_click_after_view"
        ),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("n_full_funnel"),
    )


# ---------------------------------------------------------------------------
# $geoNear (2dsphere). The testdata has no geo columns, so both
# engines synthesize deterministic lat/lon from c_custkey with EXACT
# double arithmetic (integer-derived, bit-identical across engines).
# The haversine itself uses sin/cos, which differ in the last ulp
# between the JVM and libm — so both sides compare the distance
# rounded to 1 mm, and the nearest-100 cut rides a distance whose
# neighbors differ by kilometers, far beyond ulp noise.
# ---------------------------------------------------------------------------

@register(
    "q_geo_near",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey % 170) - 85 + 0.25                   AS lat,
             ((c_custkey * 7) % 360) - 180 + 0.5             AS lon
      FROM customer
    ),
    annotated AS (
      SELECT c_custkey, lat, lon,
             round(2 * 6371000.0 * asin(sqrt(
               pow(sin(radians(lat - 40.0) / 2), 2)
               + cos(radians(40.0)) * cos(radians(lat))
                 * pow(sin(radians(lon - (-74.0)) / 2), 2)
             )), 3) AS distance_m
      FROM pts
    )
    SELECT c_custkey, lat, lon, distance_m
    FROM annotated
    WHERE distance_m <= 5000000
    ORDER BY distance_m, c_custkey
    LIMIT 100
    """,
)
def q_geo_near(spark, sf_dir):
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") % 170) - 85 + 0.25).alias("lat"),
        (((F.col("c_custkey") * 7) % 360) - 180 + 0.5).alias("lon"),
    )
    near = compile_pipeline(
        c,
        [
            {"$geoNear": {
                "near": {"type": "Point", "coordinates": [-74.0, 40.0]},
                "key": ["lon", "lat"],
                "distanceField": "distance_m",
                "maxDistance": 5_000_000,
            }},
        ],
    )
    # 1 mm grid for cross-engine comparability (see module comment);
    # the limit's tie-break on c_custkey keeps the cut deterministic
    return (
        near.withColumn("distance_m", F.round("distance_m", 3))
        .orderBy("distance_m", "c_custkey")
        .limit(100)
    )


@register(
    "q_pipeline_graph_depth",
    oracle="""
    WITH RECURSIVE starts AS
      (SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 0),
    walk AS (
      SELECT s.s_suppkey AS start_key, s.s_suppkey AS val, 0 AS depth
      FROM starts s
      UNION
      SELECT w.start_key, u.s_suppkey - 1, w.depth + 1
      FROM walk w JOIN supplier u
        ON u.s_suppkey = w.val AND u.s_suppkey % 7 <> 3
      WHERE w.depth < 4
    ),
    vals AS (SELECT start_key, val, MIN(depth) AS d FROM walk GROUP BY 1, 2)
    SELECT v.start_key, u.s_suppkey AS hit, CAST(v.d AS BIGINT) AS d
    FROM vals v JOIN supplier u
      ON u.s_suppkey = v.val AND u.s_suppkey % 7 <> 3
    """,
)
def q_pipeline_graph_depth(spark, sf_dir):
    """$graphLookup STAGE with round-5 depthField and
    restrictSearchWithMatch over the supplier chain s -> s-1:
    restricted docs neither match nor relay the walk, and each
    matched doc carries its retrieval depth. Oracle: recursive CTE
    over the same restricted doc set."""
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    s = load_table(spark, sf_dir, "supplier")
    starts = s.filter(F.col("s_suppkey") % 10 == 0).select(
        F.col("s_suppkey").alias("start_key")
    )
    docs = s.withColumn("prev", F.col("s_suppkey") - 1)
    out = compile_pipeline(
        starts,
        [
            {"$graphLookup": {
                "from": "supplier_chain", "startWith": "$start_key",
                "connectFromField": "prev", "connectToField": "s_suppkey",
                "as": "m", "maxDepth": 4, "depthField": "d",
                "restrictSearchWithMatch": {
                    "$expr": {"$ne": [{"$mod": ["$s_suppkey", 7]}, 3]}},
            }},
            {"$unwind": "$m"},
            {"$project": {"start_key": 1, "hit": "$m.s_suppkey",
                          "d": "$m.d"}},
        ],
        collections={"supplier_chain": docs},
    )
    return out.select("start_key", "hit", "d")


@register(
    "q_pipeline_collstats",
    oracle="SELECT CAST(COUNT(*) AS BIGINT) AS count FROM lineitem",
)
def q_pipeline_collstats(spark, sf_dir):
    """$collStats {count} (r6): first-stage metadata aggregate — Spark
    plans a partial count per scan task + single-row final, no wide
    shuffle; the scan reads zero columns (count-star pushdown)."""
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    li = load_table(spark, sf_dir, "lineitem")
    return compile_pipeline(li, [{"$collStats": {"count": {}}}])


@register(
    "q_pipeline_redact",
    oracle="""
    SELECT event_id,
           CASE WHEN user_id % 3 = 2 THEN NULL
                WHEN user_id % 3 = 0 THEN event_type
                WHEN event_id % 3 = 2 THEN NULL
                ELSE event_type END AS tag,
           CASE WHEN CAST(floor(value) AS BIGINT) % 3 >= 2 THEN NULL
                ELSE value END AS pay_value
    FROM events
    """,
)
def q_pipeline_redact(spark, sf_dir):
    """$redact as a PIPELINE STAGE (r6): the same ACL-gated document
    tree as q_redact, but built and pruned entirely inside
    compile_pipeline — the gate is a Mongo $cond over $$PRUNE/$$KEEP/
    $$DESCEND with `$level` resolving per node (missing at the root
    and at doc level -> null -> falsy -> DESCEND). Emits the identical
    nested-CASE projection plan as the operator form: one codegen
    stage, no shuffle. Oracle replays the decisions as scalar CASE."""
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    e = load_table(spark, sf_dir, "events")
    gate = {"$cond": [
        {"$gte": ["$level", {"$literal": 2}]}, "$$PRUNE",
        {"$cond": [{"$eq": ["$level", {"$literal": 0}]}, "$$KEEP",
                   "$$DESCEND"]},
    ]}
    return compile_pipeline(
        e,
        [
            {"$project": {"event_id": 1, "doc": {
                "meta": {
                    "level": {"$mod": ["$user_id", {"$literal": 3}]},
                    "inner": {
                        "level": {"$mod": ["$event_id", {"$literal": 3}]},
                        "tag": "$event_type",
                    },
                },
                "payload": {
                    "level": {"$mod": [{"$toLong": {"$floor": "$value"}},
                                       {"$literal": 3}]},
                    "value": "$value",
                },
            }}},
            {"$redact": gate},
            {"$project": {"event_id": 1, "tag": "$doc.meta.inner.tag",
                          "pay_value": "$doc.payload.value"}},
        ],
    )


# ---------------------------------------------------------------------------
# Aggregate-command collation option (r8): {locale: "en", strength: 2}
# compiles case-insensitive $match membership, $group keys (lower()
# image, binary-MIN representative) and $sort keys. The case variance
# is derived OUTSIDE the pipeline (half the rows lowercased) so the
# collation rewrite has real work to do; the DuckDB twin spells the
# lower()-image algebra explicitly.
# ---------------------------------------------------------------------------

@register(
    "q_collation",
    oracle=f"""
    WITH base AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                    ELSE c_mktsegment END AS seg,
               c_acctbal
        FROM customer
    ),
    g AS (
        SELECT min(seg) AS _id,
               CAST(COUNT(*) AS BIGINT) AS n,
               {dsum_sql('c_acctbal')} AS bal
        FROM base
        WHERE lower(seg) IN ('building', 'automobile')
        GROUP BY lower(seg)
    )
    SELECT _id, n, bal FROM g ORDER BY lower(_id), _id
    """,
)
def q_collation(spark, sf_dir):
    """Case-insensitive collation end-to-end: CI $in membership →
    CI $group (4 raw case-variants collapse to 2 CI classes, each
    surfacing its binary-minimum representative) → CI $sort. Scale
    note: the rewrite adds one lower() per compared key inside the
    same whole-stage-codegen span — no extra shuffle, no UDF."""
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.when(F.col("c_custkey") % 2 == 0, F.lower("c_mktsegment"))
        .otherwise(F.col("c_mktsegment")).alias("seg"),
        "c_acctbal",
    )
    return compile_pipeline(
        base,
        [
            {"$match": {"seg": {"$in": ["building", "AUTOMOBILE"]}}},
            {"$group": {"_id": "$seg", "n": {"$sum": 1},
                        "bal": {"$sum": "$c_acctbal"}}},
            {"$sort": {"_id": 1}},
        ],
        collation={"locale": "en", "strength": 2},
    )


# ---------------------------------------------------------------------------
# X7' (r9): CI collation through $lookup equality keys — the join runs
# on the lower() image of BOTH key sides when both are string-typed.
# Each case-varied local segment matches BOTH case forms in the dim
# table (binary equality would match at most one), then flows through
# the CI $group/$sort path. The DuckDB twin spells the lower()-image
# join explicitly.
# ---------------------------------------------------------------------------

@register(
    "q_collation_lookup",
    oracle="""
    WITH base AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                    ELSE c_mktsegment END AS seg
        FROM customer
    ),
    segs AS (SELECT DISTINCT c_mktsegment AS s FROM customer),
    dim AS (
        SELECT upper(s) AS fseg, CAST(length(s) AS BIGINT) AS weight FROM segs
        UNION ALL
        SELECT lower(s), CAST(length(s) AS BIGINT) FROM segs
    ),
    j AS (
        SELECT base.seg, dim.weight
        FROM base JOIN dim ON lower(base.seg) = lower(dim.fseg)
    ),
    g AS (
        SELECT min(seg) AS _id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(weight) AS BIGINT) AS w
        FROM j GROUP BY lower(seg)
    )
    SELECT _id, n, w FROM g ORDER BY lower(_id), _id
    """,
)
def q_collation_lookup(spark, sf_dir):
    """CI $lookup → $unwind → CI $group → CI $sort, end-to-end under
    one aggregate-command collation. Scale note: the rewrite lowers
    each key inside the same hash-join keys — no extra shuffle; the
    pre-aggregated foreign side still broadcasts."""
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.when(F.col("c_custkey") % 2 == 0, F.lower("c_mktsegment"))
        .otherwise(F.col("c_mktsegment")).alias("seg"),
    )
    segs = c.select(F.col("c_mktsegment").alias("s")).distinct()
    dim = segs.select(
        F.upper("s").alias("fseg"), F.length("s").cast("long").alias("weight")
    ).unionByName(
        segs.select(
            F.lower("s").alias("fseg"), F.length("s").cast("long").alias("weight")
        )
    )
    return compile_pipeline(
        base,
        [
            {"$lookup": {"from": "segdim", "localField": "seg",
                         "foreignField": "fseg", "as": "m"}},
            {"$unwind": "$m"},
            {"$group": {"_id": "$seg", "n": {"$sum": 1},
                        "w": {"$sum": "$m.weight"}}},
            {"$sort": {"_id": 1}},
        ],
        collections={"segdim": dim},
        collation={"locale": "en", "strength": 2},
    )


# ---------------------------------------------------------------------------
# X7'' (r10): CI collation through $expr-$in and $bucket. The $match
# compiles its $in through the lower()-image rewrite (_ci_expr_in);
# $bucket brackets the lower() image of the group key against lowered
# string boundaries while emitting the boundary literals AS GIVEN.
# Boundaries ["a","b","M"] lower to a,b,m: the automobile class lands
# in [a,b), building in [b,m), machinery falls to the default — each
# class with BOTH its case variants (binary bracketing would split
# them). The DuckDB twin spells the lowered comparisons explicitly.
# ---------------------------------------------------------------------------

@register(
    "q_collation_bucket",
    oracle=f"""
    WITH base AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                    ELSE c_mktsegment END AS seg,
               c_acctbal
        FROM customer
    ),
    f AS (
        SELECT * FROM base
        WHERE lower(seg) IN ('building', 'automobile', 'machinery')
    )
    SELECT CASE WHEN lower(seg) >= 'a' AND lower(seg) < 'b' THEN 'a'
                WHEN lower(seg) >= 'b' AND lower(seg) < 'm' THEN 'b'
                ELSE 'rest' END AS _id,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dsum_sql('c_acctbal')} AS bal
    FROM f
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_collation_bucket(spark, sf_dir):
    """CI $match($expr $in) → CI $bucket → CI $sort under one
    aggregate-command collation. Scale note: both rewrites add one
    lower() per compared value inside the same whole-stage-codegen
    span as the binary plan — no extra shuffle, no UDF; the bucket
    CASE chain is constant-width."""
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.when(F.col("c_custkey") % 2 == 0, F.lower("c_mktsegment"))
        .otherwise(F.col("c_mktsegment")).alias("seg"),
        "c_acctbal",
    )
    return compile_pipeline(
        base,
        [
            {"$match": {"$expr": {"$in": [
                "$seg", ["BUILDING", "automobile", "MACHINERY"]]}}},
            {"$bucket": {
                "groupBy": "$seg",
                "boundaries": ["a", "b", "M"],
                "default": "rest",
                "output": {"n": {"$sum": 1}, "bal": {"$sum": "$c_acctbal"}},
            }},
            {"$sort": {"_id": 1}},
        ],
        collation={"locale": "en", "strength": 2},
    )


# ---------------------------------------------------------------------------
# X7'' (r10): CI collation through $bucketAuto — equi-height buckets in
# lower()-image order with the binary key as the deterministic
# within-class tie-break (binary order would rank every uppercase
# variant before any lowercase one); _id.min/_id.max surface each
# bucket's CI extrema via min_by/max_by over the (lower(v), v) pair.
# The DuckDB twin is the unpartitioned ntile over the same total order
# (scalable_ntile is bit-identical to it by construction).
# ---------------------------------------------------------------------------

@register(
    "q_collation_bucket_auto",
    oracle="""
    WITH base AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                    ELSE c_mktsegment END AS seg
        FROM customer
    ),
    r AS (
        SELECT seg, ntile(4) OVER (ORDER BY lower(seg), seg) AS b
        FROM base
    )
    SELECT first(seg ORDER BY lower(seg), seg) AS lo,
           last(seg ORDER BY lower(seg), seg) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM r
    GROUP BY b
    """,
)
def q_collation_bucket_auto(spark, sf_dir):
    """CI $bucketAuto under an aggregate-command collation; the struct
    _id is flattened to lo/hi for the oracle compare. Scale note: the
    CI order rides the same range-partitioned two-pass global rank as
    binary $bucketAuto (operators/ranking.py) — the range split keys
    on the lower() image so a CI class never straddles a range; no
    single-partition window, no extra shuffle beyond the rank's own."""
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.when(F.col("c_custkey") % 2 == 0, F.lower("c_mktsegment"))
        .otherwise(F.col("c_mktsegment")).alias("seg"),
    )
    out = compile_pipeline(
        base,
        [{"$bucketAuto": {"groupBy": "$seg", "buckets": 4}}],
        collation={"locale": "en", "strength": 2},
    )
    return out.select(
        F.col("_id.min").alias("lo"),
        F.col("_id.max").alias("hi"),
        F.col("count").cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# X7'' (r10): CI collation through $setWindowFields — a string
# partitionBy partitions by the lower() image (both case variants of a
# segment share one window partition), $rank over a string sortBy ties
# per CI class, and $documentNumber keeps the (lower, binary)
# deterministic refinement. The DuckDB twin spells the lowered
# partition/order keys explicitly.
# ---------------------------------------------------------------------------

@register(
    "q_collation_window",
    oracle="""
    WITH base AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                    ELSE c_mktsegment END AS seg,
               c_name
        FROM customer
    )
    SELECT seg, c_name,
           CAST(SUM(1) OVER (PARTITION BY lower(seg)) AS BIGINT) AS class_n,
           CAST(RANK() OVER (ORDER BY lower(seg)) AS BIGINT) AS seg_rank,
           CAST(ROW_NUMBER() OVER (ORDER BY lower(seg), seg, lower(c_name), c_name)
                AS BIGINT) AS doc_no
    FROM base
    """,
)
def q_collation_window(spark, sf_dir):
    """CI $setWindowFields end-to-end: class-partitioned $count, $rank
    tying per CI class, $documentNumber refined deterministically.
    Scale note: the rewrite lowers the keys inside the SAME window
    exchange — no extra shuffle; rank windows here are unpartitioned
    by the query's own choice (global segment ranking), which the
    engine's unpartitioned-window policy already surfaces."""
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.when(F.col("c_custkey") % 2 == 0, F.lower("c_mktsegment"))
        .otherwise(F.col("c_mktsegment")).alias("seg"),
        "c_name",
    )
    out = compile_pipeline(
        base,
        [{"$setWindowFields": {
            "partitionBy": "$seg",
            "output": {"class_n": {"$count": {}}},
        }},
         {"$setWindowFields": {
             "sortBy": {"seg": 1},
             "output": {"seg_rank": {"$rank": {}}},
         }},
         {"$setWindowFields": {
             "sortBy": {"seg": 1, "c_name": 1},
             "output": {"doc_no": {"$documentNumber": {}}},
         }}],
        collation={"locale": "en", "strength": 2},
    )
    return out.select(
        "seg", "c_name",
        F.col("class_n").cast("long").alias("class_n"),
        F.col("seg_rank").cast("long").alias("seg_rank"),
        F.col("doc_no").cast("long").alias("doc_no"),
    )


# ---------------------------------------------------------------------------
# X7'' (r13): strength-1 collation — diacritic+case-insensitive primary
# fold end-to-end. Accented case variants are synthesized from the
# segment column (translate to á/é/í/ó/ú on one residue class, upper
# on another), then $match($in) / $group / $sort run at strength 1:
# all variants of a segment collapse into ONE primary class. The
# DuckDB twin spells the fold as lower(strip_accents(...)) — identical
# on this repertoire (pure combining-mark accents, no expansions or
# undecomposable letters).
# ---------------------------------------------------------------------------

@register(
    "q_collation_diacritics",
    oracle="""
    WITH base AS (
        SELECT CASE
                 WHEN c_custkey % 3 = 0
                   THEN translate(lower(c_mktsegment), 'aeiou', 'áéíóú')
                 WHEN c_custkey % 3 = 1 THEN lower(c_mktsegment)
                 ELSE c_mktsegment
               END AS seg,
               c_acctbal
        FROM customer
    ),
    g AS (
        SELECT min(seg) AS _id,
               CAST(COUNT(*) AS BIGINT) AS n,
               __DSUM__ AS bal
        FROM base
        WHERE lower(strip_accents(seg)) IN ('building', 'machinery')
        GROUP BY lower(strip_accents(seg))
    )
    SELECT _id, n, bal FROM g
    ORDER BY lower(strip_accents(_id)), _id
    """.replace("__DSUM__", dsum_sql('c_acctbal')),
)
def q_collation_diacritics(spark, sf_dir):
    """Strength-1 collation end-to-end: diacritic-folded $in membership
    → primary-class $group (accented/upper/lower variants collapse to
    one class each, surfacing the binary-minimum representative) →
    primary-order $sort. Scale note: the fold image is
    lower→replace→translate — pure built-in string expressions inside
    the same whole-stage-codegen span as the strength-2 lower() image;
    no UDF, no extra shuffle, no new exchange."""
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.when(F.col("c_custkey") % 3 == 0,
               F.translate(F.lower("c_mktsegment"), "aeiou", "áéíóú"))
        .when(F.col("c_custkey") % 3 == 1, F.lower("c_mktsegment"))
        .otherwise(F.col("c_mktsegment")).alias("seg"),
        "c_acctbal",
    )
    return compile_pipeline(
        base,
        [
            {"$match": {"seg": {"$in": ["BÚILDÍNG", "machinery"]}}},
            {"$group": {"_id": "$seg", "n": {"$sum": 1},
                        "bal": {"$sum": "$c_acctbal"}}},
            {"$sort": {"_id": 1}},
        ],
        collation={"locale": "en", "strength": 1},
    )


# ---------------------------------------------------------------------------
# X7''' (r14, VERDICT r13 task 5): collation locale breadth — the
# DUCET primary fold is locale-AGNOSTIC, so every UNTAILORED Latin-
# script locale (accept-list) gets strength 1/2 honestly; this entry
# exercises `{locale: "de", strength: 1}` end-to-end with German
# umlaut/case variants (ä/ö/ü decompose to base+combining mark → fold
# to a/o/u; ß expands to ss — both DUCET-exact for untailored de).
# Tailored locales (da/sv/tr/…) refuse by name — pytested.
# ---------------------------------------------------------------------------

@register(
    "q_collation_locale_de",
    oracle="""
    WITH base AS (
        SELECT CASE
                 WHEN c_custkey % 4 = 0
                   THEN translate(lower(c_mktsegment), 'aou', 'äöü')
                     || '-ss'
                 WHEN c_custkey % 4 = 1 THEN upper(c_mktsegment) || '-ß'
                 WHEN c_custkey % 4 = 2 THEN lower(c_mktsegment) || '-ss'
                 ELSE c_mktsegment || '-SS'
               END AS seg,
               c_acctbal
        FROM customer
    ),
    folded AS (
        SELECT seg, c_acctbal,
               strip_accents(replace(lower(seg), 'ß', 'ss')) AS img
        FROM base
    ),
    g AS (
        SELECT min(seg) AS _id,
               CAST(COUNT(*) AS BIGINT) AS n,
               __DSUM__ AS bal
        FROM folded
        WHERE img IN ('household-ss', 'automobile-ss')
        GROUP BY img
    )
    SELECT _id, n, bal FROM g
    ORDER BY strip_accents(replace(lower(_id), 'ß', 'ss')), _id
    """.replace("__DSUM__", dsum_sql('c_acctbal')),
)
def q_collation_locale_de(spark, sf_dir):
    """Strength-1 collation under ``{locale: "de"}`` (r14): German
    data shapes — umlauts (combining-mark decompositions) and ß (DUCET
    ss expansion) — fold into one primary class per segment through
    the SAME locale-agnostic seams as 'en'; 'de' is on the untailored
    accept-list because CLDR's standard German collation is the root
    order (the phonebook tailoring ä=ae is a DIFFERENT collation and
    would refuse). Plan shape identical to q_collation_diacritics:
    fold = lower→replace→translate inside whole-stage codegen."""
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.when(F.col("c_custkey") % 4 == 0,
               F.concat(F.translate(F.lower("c_mktsegment"),
                                    "aou", "äöü"), F.lit("-ss")))
        .when(F.col("c_custkey") % 4 == 1,
              F.concat(F.upper("c_mktsegment"), F.lit("-ß")))
        .when(F.col("c_custkey") % 4 == 2,
              F.concat(F.lower("c_mktsegment"), F.lit("-ss")))
        .otherwise(F.concat(F.col("c_mktsegment"), F.lit("-SS")))
        .alias("seg"),
        "c_acctbal",
    )
    return compile_pipeline(
        base,
        [
            {"$match": {"seg": {"$in": ["HÖÜSEHÖLD-ß", "automobile-ss"]}}},
            {"$group": {"_id": "$seg", "n": {"$sum": 1},
                        "bal": {"$sum": "$c_acctbal"}}},
            {"$sort": {"_id": 1}},
        ],
        collation={"locale": "de", "strength": 1},
    )


# ---------------------------------------------------------------------------
# X7'''' (r14 continued): TAILORED locale end-to-end — Danish is the
# hardest accepted tailoring (æ/ø/å inserted after z in the OPPOSITE
# order of Swedish, ä/ö folding into æ/ø as secondaries, and the
# 'aa' digraph tertiary-equal to å). The fold rides the same image
# seams: lower → locale replaces → [s1: root fold]; the oracle twin
# applies the identical replace chain in SQL, PUA key chars inlined.
# ---------------------------------------------------------------------------

@register(
    "q_collation_locale_da",
    oracle="""
    WITH base AS (
        SELECT CASE
                 WHEN c_custkey % 4 = 0 THEN 'å-' || lower(c_mktsegment)
                 WHEN c_custkey % 4 = 1 THEN 'AA-' || upper(c_mktsegment)
                 WHEN c_custkey % 4 = 2 THEN 'Aa-' || lower(c_mktsegment)
                 ELSE 'æ-' || c_mktsegment
               END AS seg,
               c_acctbal
        FROM customer
    ),
    folded AS (
        SELECT seg, c_acctbal,
               replace(replace(replace(lower(seg),
                       'aa', '__K4__'), 'å', '__K4__'),
                       'æ', '__K0__') AS img
        FROM base
    ),
    g AS (
        SELECT min(seg) AS _id,
               CAST(COUNT(*) AS BIGINT) AS n,
               __DSUM__ AS bal
        FROM folded
        WHERE img IN ('__K4__-building', '__K4__-machinery',
                      '__K0__-automobile')
        GROUP BY img
    )
    SELECT _id, n, bal FROM g
    ORDER BY replace(replace(replace(lower(_id),
             'aa', '__K4__'), 'å', '__K4__'), 'æ', '__K0__'), _id
    """.replace("__DSUM__", dsum_sql('c_acctbal'))
       # PUA anchor-suffix keys (U+E004 / U+E000) written as explicit
    # escapes so the codepoints are visible in diffs and cannot be
    # stripped by an editor/formatter that normalizes non-printing
    # characters (ADVICE r14).
    .replace("__K4__", "z" + chr(0xE004)).replace("__K0__", "z" + chr(0xE000)),
)
def q_collation_locale_da(spark, sf_dir):
    """Strength-2 collation under ``{locale: "da"}`` (r14 tailored
    accept-list): Danish data shapes — the å letter, its 'aa' digraph
    spelling (tertiary-equal: Aarhus ≡ Århus at strength 2), and æ as
    a primary letter after z. The three å-spelling arms fold into ONE
    group per segment; the match literals exercise digraph
    ('aa-building'), precomposed ('Å-MACHINERY') and æ forms; the
    sort surfaces the tailored order (æ-groups before å-groups, both
    after any ASCII segment). Plan shape: the tailored image is
    lower → two F.replace calls — still one whole-stage-codegen span,
    no UDF, no extra exchange vs the untailored strength-2 plan."""
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.when(F.col("c_custkey") % 4 == 0,
               F.concat(F.lit("å-"), F.lower("c_mktsegment")))
        .when(F.col("c_custkey") % 4 == 1,
              F.concat(F.lit("AA-"), F.upper("c_mktsegment")))
        .when(F.col("c_custkey") % 4 == 2,
              F.concat(F.lit("Aa-"), F.lower("c_mktsegment")))
        .otherwise(F.concat(F.lit("æ-"), F.col("c_mktsegment")))
        .alias("seg"),
        "c_acctbal",
    )
    return compile_pipeline(
        base,
        [
            {"$match": {"seg": {"$in": ["aa-building", "Å-MACHINERY",
                                        "æ-AUTOMOBILE"]}}},
            {"$group": {"_id": "$seg", "n": {"$sum": 1},
                        "bal": {"$sum": "$c_acctbal"}}},
            {"$sort": {"_id": 1}},
        ],
        collation={"locale": "da", "strength": 2},
    )


# ---------------------------------------------------------------------------
# X7''''' (r15, VERDICT r14 task 3): tr accepted — the dotted/dotless-i
# case tailoring rides a PRE-LOWER replace pair (İ→i, I→ı), then the
# same primary-remap image as es/da (ç/ğ/ı/ö/ş/ü after c/g/h/o/s/u).
# The oracle twin applies the identical pre-replace → lower → replace
# chain in SQL, PUA key chars built with chr() so they stay visible.
# ---------------------------------------------------------------------------

# strength-2 tr image keys (anchor + PUA suffix), hand-derived:
_TR_KI = "h" + chr(0xE000)   # ı → after h
_TR_KS = "s" + chr(0xE000)   # ş → after s
_TR_FOLD_SQL = (
    "replace(replace(replace(replace(replace(replace("
    "lower(replace(replace({col}, 'İ', 'i'), 'I', 'ı')),"
    " 'ç', 'c' || chr(57344)), 'ğ', 'g' || chr(57344)),"
    " 'ı', 'h' || chr(57344)), 'ö', 'o' || chr(57344)),"
    " 'ş', 's' || chr(57344)), 'ü', 'u' || chr(57344))"
)


@register(
    "q_collation_locale_tr",
    oracle="""
    WITH base AS (
        SELECT CASE
                 WHEN c_custkey % 4 = 0 THEN 'ışık-' || lower(c_mktsegment)
                 WHEN c_custkey % 4 = 1 THEN 'IŞIK-' || lower(c_mktsegment)
                 WHEN c_custkey % 4 = 2 THEN 'izmir-' || lower(c_mktsegment)
                 ELSE 'İZMİR-' || lower(c_mktsegment)
               END AS seg,
               c_acctbal
        FROM customer
    ),
    folded AS (
        SELECT seg, c_acctbal, __FOLD_SEG__ AS img FROM base
    ),
    g AS (
        SELECT min(seg) AS _id,
               CAST(COUNT(*) AS BIGINT) AS n,
               __DSUM__ AS bal
        FROM folded
        WHERE img IN ('__ISIK__-building', 'izmir-automobile')
        GROUP BY img
    )
    SELECT _id, n, bal FROM g
    ORDER BY __FOLD_ID__, _id
    """.replace("__DSUM__", dsum_sql('c_acctbal'))
       .replace("__FOLD_SEG__", _TR_FOLD_SQL.format(col="seg"))
       .replace("__FOLD_ID__", _TR_FOLD_SQL.format(col="_id"))
       .replace("__ISIK__", _TR_KI + _TR_KS + _TR_KI + "k"),
)
def q_collation_locale_tr(spark, sf_dir):
    """Strength-2 collation under ``{locale: "tr"}`` (r15 accepted
    tailoring): Turkish data shapes — the dotless-i case pairs
    (ışık ≡ IŞIK but ≢ isik; izmir ≡ İZMİR) that kept tr refused
    through r14, folded by the pre-lower İ→i / I→ı replaces, plus the
    primary letters ş (after s) and ı (after h). Segments stay
    lowercase in every arm ON PURPOSE: Turkish case-folds EVERY
    uppercase I (AUTOMOBILE ≡ automobıle, NOT automobile), so an
    upper(segment) arm would be a DIFFERENT primary class — the first
    cut of this query tripped exactly that, and both engines agreed
    it should (the faithful behavior). The match literals exercise
    both uppercase spellings; the sort surfaces the tailored
    order (the ı-group's h-anchored image before the i-group). Plan
    shape: two extra F.replace calls ahead of lower() — still one
    whole-stage-codegen span, no UDF, no extra exchange."""
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.when(F.col("c_custkey") % 4 == 0,
               F.concat(F.lit("ışık-"), F.lower("c_mktsegment")))
        .when(F.col("c_custkey") % 4 == 1,
              F.concat(F.lit("IŞIK-"), F.lower("c_mktsegment")))
        .when(F.col("c_custkey") % 4 == 2,
              F.concat(F.lit("izmir-"), F.lower("c_mktsegment")))
        .otherwise(F.concat(F.lit("İZMİR-"), F.lower("c_mktsegment")))
        .alias("seg"),
        "c_acctbal",
    )
    return compile_pipeline(
        base,
        [
            {"$match": {"seg": {"$in": ["IŞIK-building",
                                        "İZMİR-automobile"]}}},
            {"$group": {"_id": "$seg", "n": {"$sum": 1},
                        "bal": {"$sum": "$c_acctbal"}}},
            {"$sort": {"_id": 1}},
        ],
        collation={"locale": "tr", "strength": 2},
    )


# ---------------------------------------------------------------------------
# S7 — $lookup with BOTH sides array-valued (r7 doc-granularity dedup
# branch, r8: first oracle-gated query — a regression there was
# previously invisible to CORRECTNESS). Semantics: a foreign doc
# matches when its array shares ANY element with the local array, and
# appears ONCE however many elements overlap.
# ---------------------------------------------------------------------------

@register(
    "q_lookup_both_arrays",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               [doc_id % 25, (doc_id * 7) % 25] AS tags
        FROM documents
    ),
    nf AS (
        SELECT n_name,
               [n_nationkey % 25, (n_nationkey + 7) % 25] AS ftags
        FROM nation
    ),
    j AS (
        SELECT d.doc_id, nf.n_name
        FROM d LEFT JOIN nf
          ON len(list_intersect(d.tags, nf.ftags)) > 0
    )
    SELECT doc_id,
           CAST(COUNT(n_name) AS INT) AS n,
           array_to_string(list_sort(list(n_name)), ',') AS names_csv
    FROM j GROUP BY doc_id
    """,
)
def q_lookup_both_arrays(spark, sf_dir):
    """Both-sides-array $lookup (multikey ∩ multikey): local ``tags``
    and foreign ``ftags`` are arrays; a foreign doc matches on set
    intersection and is deduped back to doc granularity. Compiled as
    deduped explode of BOTH sides → hash equi-join on the element →
    doc-level dedup → repack; the 25-row foreign side broadcasts.
    Output is order-stable ($sortArray + CSV fold) for the value hash."""
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    n = load_table(spark, sf_dir, "nation").select(
        "n_name",
        F.array(F.col("n_nationkey") % 25,
                (F.col("n_nationkey") + 7) % 25).alias("ftags"),
    )
    names = {"$sortArray": {"input": {"$map": {
        "input": "$m", "as": "x", "in": "$$x.n_name"}}, "sortBy": 1}}
    return compile_pipeline(
        d,
        [
            {"$project": {"doc_id": 1, "tags": [
                {"$mod": ["$doc_id", {"$literal": 25}]},
                {"$mod": [{"$multiply": ["$doc_id", {"$literal": 7}]},
                          {"$literal": 25}]},
            ]}},
            {"$lookup": {"from": "nation_tagged", "localField": "tags",
                         "foreignField": "ftags", "as": "m"}},
            {"$project": {"doc_id": 1, "n": {"$size": "$m"},
                          "names_csv": {"$reduce": {
                              "input": names,
                              "initialValue": "",
                              "in": {"$cond": [
                                  {"$eq": ["$$value", ""]}, "$$this",
                                  {"$concat": ["$$value", ",", "$$this"]},
                              ]}}}}},
        ],
        collections={"nation_tagged": n},
    )


# ---------------------------------------------------------------------------
# source mixing (r14): WEIGHTED per-source sampling — the data-mixing
# step of a training corpus pipeline ("keep 100% of src0-4, 50% of
# src5-9, 25% of src10-14, 6.25% of the rest"). Same portability
# policy as q_sample: the keep-decision is md5(doc_id)'s first 8 hex
# digits compared against a per-source hex threshold — fixed-width
# lowercase hex compares lexicographically == numerically in BOTH
# engines, so the sampled row set is a pure function of the data
# (identical across engines, partitionings, and runs; 'g0000000' sorts
# above every hex digit = keep-all). Scale: map-only — one pure row
# predicate over a pruned 2-column scan, zero shuffle, zero state; at
# 100 TB this parallelizes embarrassingly and pushes the projection
# into the parquet reader.
# ---------------------------------------------------------------------------

@register(
    "q_mix_weights",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h,
             CASE CAST(substr(source, 4, 10) AS INT) // 5
               WHEN 0 THEN 'g0000000'
               WHEN 1 THEN '80000000'
               WHEN 2 THEN '40000000'
               ELSE '10000000' END AS thr
      FROM documents
    ) WHERE h < thr
    """,
)
def q_mix_weights(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    grp = F.floor(F.substring("source", 4, 10).cast("int") / 5)
    thr = (
        F.when(grp == 0, "g0000000")   # rate 1.0 (keep all)
        .when(grp == 1, "80000000")    # rate 0.5
        .when(grp == 2, "40000000")    # rate 0.25
        .otherwise("10000000")         # rate 0.0625
    )
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    return d.filter(h < thr).select("doc_id", "source")


# ---------------------------------------------------------------------------
# X7'''''' (r16, VERDICT r15 task 6 — fourth tailoring wave): hr
# accepted — the dž/lj/nj primary DIGRAPHS ride the same
# longest-source-first compiled replaces as cs "ch"/da "aa", and the
# Unicode compatibility digraph codepoints (ǆ/ǉ/ǌ, every case form
# lower()s onto them) alias onto the two-char keys. is/sk landed in
# the same wave (pure primary remaps — pytest-pinned; this query
# pins the digraph machinery end-to-end against the SQL twin).
# ---------------------------------------------------------------------------

# strength-2 hr image: digraphs first (so 'ž' cannot eat the ž of
# 'dž'), then the compat codepoints, then the single-letter primaries
_HR_FOLD_SQL = (
    "replace(replace(replace(replace(replace(replace(replace(replace("
    "replace(replace(replace(lower({col}),"
    " 'dž', 'd' || chr(57344)), 'lj', 'l' || chr(57344)),"
    " 'nj', 'n' || chr(57344)), 'ǆ', 'd' || chr(57344)),"
    " 'ǉ', 'l' || chr(57344)), 'ǌ', 'n' || chr(57344)),"
    " 'č', 'c' || chr(57344)), 'ć', 'c' || chr(57345)),"
    " 'đ', 'd' || chr(57345)), 'š', 's' || chr(57344)),"
    " 'ž', 'z' || chr(57344))"
)


@register(
    "q_collation_locale_hr",
    oracle="""
    WITH base AS (
        SELECT CASE
                 WHEN c_custkey % 4 = 0 THEN 'njiva-' || lower(c_mktsegment)
                 WHEN c_custkey % 4 = 1 THEN 'ǊIVA-' || upper(c_mktsegment)
                 WHEN c_custkey % 4 = 2 THEN 'noć-' || lower(c_mktsegment)
                 ELSE 'luka-' || lower(c_mktsegment)
               END AS seg,
               c_acctbal
        FROM customer
    ),
    folded AS (
        SELECT seg, c_acctbal, __FOLD_SEG__ AS img FROM base
    ),
    g AS (
        SELECT min(seg) AS _id,
               CAST(COUNT(*) AS BIGINT) AS n,
               __DSUM__ AS bal
        FROM folded
        WHERE img IN ('n' || chr(57344) || 'iva-building',
                      'noc' || chr(57345) || '-automobile')
        GROUP BY img
    )
    SELECT _id, n, bal FROM g
    ORDER BY __FOLD_ID__, _id
    """.replace("__DSUM__", dsum_sql('c_acctbal'))
       .replace("__FOLD_SEG__", _HR_FOLD_SQL.format(col="seg"))
       .replace("__FOLD_ID__", _HR_FOLD_SQL.format(col="_id")),
)
def q_collation_locale_hr(spark, sf_dir):
    """Strength-2 collation under ``{locale: "hr"}`` (r16 fourth
    tailoring wave): Croatian digraph shapes — the two-char letter nj
    and its single-codepoint compatibility spelling (ǌiva ≡ njiva;
    the ǊIVA arm exercises the U+01CA case form through lower()),
    plus ć as a primary after č's class. The sort surfaces the
    load-bearing digraph order: 'noć-…' sorts BEFORE 'njiva-…'
    because nj is a primary letter AFTER n's whole single-letter
    range (counterintuitive to a binary compare, which would put
    'nj' < 'no'). Plan shape: the tailored image is lower → a chain
    of F.replace calls — one whole-stage-codegen span, no UDF, no
    extra exchange vs the untailored strength-2 plan."""
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.when(F.col("c_custkey") % 4 == 0,
               F.concat(F.lit("njiva-"), F.lower("c_mktsegment")))
        .when(F.col("c_custkey") % 4 == 1,
              F.concat(F.lit("ǊIVA-"), F.upper("c_mktsegment")))
        .when(F.col("c_custkey") % 4 == 2,
              F.concat(F.lit("noć-"), F.lower("c_mktsegment")))
        .otherwise(F.concat(F.lit("luka-"), F.lower("c_mktsegment")))
        .alias("seg"),
        "c_acctbal",
    )
    return compile_pipeline(
        base,
        [
            {"$match": {"seg": {"$in": ["ǌiva-building",
                                        "noć-automobile"]}}},
            {"$group": {"_id": "$seg", "n": {"$sum": 1},
                        "bal": {"$sum": "$c_acctbal"}}},
            {"$sort": {"_id": 1}},
        ],
        collation={"locale": "hr", "strength": 2},
    )


# ---------------------------------------------------------------------------
# X7''''''' (r16, fifth tailoring wave): vi accepted — primary vowel
# letters + the GENERATED precomposed vowel+tone table (secondary tone
# suffixes in TCVN order). The twin folds exactly the codepoints the
# arms use (ệ = ê-primary + nặng-tone; ị = i + nặng-tone), PUA keys as
# chr() escapes: ê-image suffix = chr(57360) (U+E010), nặng suffix =
# chr(57349) (U+E005).
# ---------------------------------------------------------------------------

_VI_FOLD_SQL = (
    "replace(replace(lower({col}),"
    " 'ệ', 'e' || chr(57360) || chr(57349)),"
    " 'ị', 'i' || chr(57349))"
)


@register(
    "q_collation_locale_vi",
    oracle="""
    WITH base AS (
        SELECT CASE
                 WHEN c_custkey % 4 = 0 THEN 'việt-' || lower(c_mktsegment)
                 WHEN c_custkey % 4 = 1 THEN 'VIỆT-' || lower(c_mktsegment)
                 WHEN c_custkey % 4 = 2 THEN 'vịet-' || lower(c_mktsegment)
                 ELSE 'viet-' || lower(c_mktsegment)
               END AS seg,
               c_acctbal
        FROM customer
    ),
    folded AS (
        SELECT seg, c_acctbal, __FOLD_SEG__ AS img FROM base
    ),
    g AS (
        SELECT min(seg) AS _id,
               CAST(COUNT(*) AS BIGINT) AS n,
               __DSUM__ AS bal
        FROM folded
        WHERE img IN ('vie' || chr(57360) || chr(57349) || 't-building',
                      'viet-automobile',
                      'vi' || chr(57349) || 'et-machinery')
        GROUP BY img
    )
    SELECT _id, n, bal FROM g
    ORDER BY __FOLD_ID__, _id
    """.replace("__DSUM__", dsum_sql('c_acctbal'))
       .replace("__FOLD_SEG__", _VI_FOLD_SQL.format(col="seg"))
       .replace("__FOLD_ID__", _VI_FOLD_SQL.format(col="_id")),
)
def q_collation_locale_vi(spark, sf_dir):
    """Strength-2 collation under ``{locale: "vi"}`` (r16 fifth
    tailoring wave): Vietnamese data shapes — ệ is the PRIMARY letter
    ê carrying the nặng tone (việt ≡ VIỆT through lower(), but ≢
    viet at any strength: ê is a distinct letter), while ị is the
    untailored base i plus a tone (vịet ≢ viet at strength 2, ≡ at
    strength 1). The match literals exercise the uppercase spelling,
    the plain-ASCII word, and the tone-on-untailored-base form as
    three DISTINCT strength-2 classes; the sort is plain binary order
    over the images on both engines: viet-… ("viet") < việt-…
    ("vie"+U+E010+U+E005+"t") < vịet-… ("vi"+U+E005+"et"), because
    'e' < U+E005 decides at position 2. NOTE the documented
    single-level model deviation: full CLDR/ICU vi compares all
    primaries first (viet < vịet by tones, both < việt since e < ê),
    i.e. it SWAPS the last two — the engine's strength-2 compare is
    one-level image order, deviating in mixed-suffix contexts exactly
    as untailored é/e does (pipeline_compiler.py "two documented
    model limits"); tests/test_collation.py pins the engine order so
    this docstring cannot drift from behavior. Plan shape: two
    F.replace calls after lower() — one codegen span, no UDF, no
    extra exchange."""
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.when(F.col("c_custkey") % 4 == 0,
               F.concat(F.lit("việt-"), F.lower("c_mktsegment")))
        .when(F.col("c_custkey") % 4 == 1,
              F.concat(F.lit("VIỆT-"), F.lower("c_mktsegment")))
        .when(F.col("c_custkey") % 4 == 2,
              F.concat(F.lit("vịet-"), F.lower("c_mktsegment")))
        .otherwise(F.concat(F.lit("viet-"), F.lower("c_mktsegment")))
        .alias("seg"),
        "c_acctbal",
    )
    return compile_pipeline(
        base,
        [
            {"$match": {"seg": {"$in": ["VIỆT-building",
                                        "viet-automobile",
                                        "vịet-machinery"]}}},
            {"$group": {"_id": "$seg", "n": {"$sum": 1},
                        "bal": {"$sum": "$c_acctbal"}}},
            {"$sort": {"_id": 1}},
        ],
        collation={"locale": "vi", "strength": 2},
    )
