"""S19/S20 — $setWindowFields surface + $densify/$fill (SURVEY.md §2.2).

rank/dense_rank/row_number, frame aggregates (running + moving),
$shift (lag/lead), as-of enrichment (the window-based as-of join), and
gap-fill: day spine via sequence+explode, counts imputed to 0, values
carried forward with last(ignorenulls) — LOCF.

Frame sums go through the exact-decimal cast so running totals are
bit-stable regardless of how the engine evaluates the frame
(sequential scan vs segment tree).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mongo_olap_spark.functions.expressions import SUM_DECIMAL, dsum, dsum_sql
from mongo_olap_spark.queries import register
from mongo_olap_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# $rank / $denseRank / $documentNumber
# ---------------------------------------------------------------------------

@register(
    "q_window_rank",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, rnk, drnk
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
             dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
      FROM customer
    )
    WHERE rnk <= 5
    """,
)
def q_window_rank(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


# ---------------------------------------------------------------------------
# Frame aggregates: running total + moving window ({documents: [a, b]})
# ---------------------------------------------------------------------------

@register(
    "q_window_frame",
    oracle="""
    SELECT event_id, user_id, value,
           CAST(sum(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value,
           CAST(sum(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS moving3_value
    FROM events
    """,
)
def q_window_frame(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    vdec = F.col("value").cast(SUM_DECIMAL)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.sum(vdec).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("double").alias("running_value"),
        F.sum(vdec).over(w.rowsBetween(-2, 0)).cast("double").alias("moving3_value"),
    )


# ---------------------------------------------------------------------------
# $shift — lag/lead
# ---------------------------------------------------------------------------

@register(
    "q_window_lag",
    oracle="""
    SELECT event_id, user_id, ts, value,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM events
    """,
)
def q_window_lag(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


# ---------------------------------------------------------------------------
# As-of join (event enrichment): for each purchase, the most recent
# prior click by the same user. Spark has no native ASOF JOIN — the
# scalable pattern is union + conditional LOCF over one window (one
# shuffle on user_id, no range-join explosion). Oracle: DuckDB ASOF.
# ---------------------------------------------------------------------------

@register(
    "q_asof",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_asof(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    tagged = e.filter(F.col("event_type").isin("purchase", "click"))
    # click rows carry their own ts; purchases pick up the last one ≤ ts.
    # Order clicks *before* purchases at equal ts (ASOF is inclusive).
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.when(F.col("event_type") == "click", 0).otherwise(1))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    enriched = tagged.withColumn(
        "last_click_ts",
        F.last(F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True).over(w),
    )
    return enriched.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "last_click_ts"
    )


# ---------------------------------------------------------------------------
# $densify + $fill — day spine + zero-impute + LOCF
# ---------------------------------------------------------------------------

@register(
    "q_fill",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             COUNT(*) AS n,
             {dsum_sql('value')} AS total_value
      FROM events
      WHERE value >= 95
      GROUP BY 1, 2
    ),
    bounds AS (
      SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
             CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS d1
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
    ),
    grid AS (
      SELECT t.event_type, s.day
      FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN spine s
    )
    SELECT g.event_type, g.day,
           COALESCE(d.n, 0) AS n,
           last_value(d.total_value IGNORE NULLS)
             OVER (PARTITION BY g.event_type ORDER BY g.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total_locf
    FROM grid g LEFT JOIN daily d ON g.event_type = d.event_type AND g.day = d.day
    """,
)
def q_fill(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("value") >= 95)
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
    )
    bounds = e.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    types = e.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(spine))
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        grid.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("total_value", ignorenulls=True).over(w).alias("total_locf"),
        )
    )
