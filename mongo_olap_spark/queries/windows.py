"""S19/S20 — $setWindowFields surface + $densify/$fill (SURVEY.md §2.2).

rank/dense_rank/row_number, frame aggregates (running + moving),
$shift (lag/lead), as-of enrichment (the window-based as-of join),
$covariancePop/Samp over frames, $derivative/$integral (lag deltas /
running trapezoid), $expMovingAvg (grouped Arrow stage — inherently
sequential), and gap-fill: day spine via sequence+explode, counts
imputed to 0, values carried forward with last(ignorenulls) — LOCF —
or linearly interpolated between anchors ($linearFill).

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


# ---------------------------------------------------------------------------
# $covariancePop / $covarianceSamp over a moving frame: trailing-5
# autocovariance of value with its previous value per user. The frame
# sums (Σx, Σy, Σxy, n) accumulate in exact DECIMAL — the repo's frame
# policy: engines disagree on frame-sum association order (sequential
# vs segment tree), decimals make any order bit-identical — and the
# covariance formula then runs on the (identical) doubles, so the
# result is hash-exact with no tolerance. Native covar_pop over a
# frame is NOT hash-stable across engines (one-pass vs two-pass).
# ---------------------------------------------------------------------------

@register(
    "q_window_covar",
    oracle="""
    WITH lagged AS (
      SELECT event_id, user_id, ts, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
      FROM events
    ),
    summed AS (
      SELECT event_id, user_id,
             CAST(sum(CASE WHEN pv IS NOT NULL THEN CAST(value AS DECIMAL(38,6)) END) OVER f AS DOUBLE) AS sx,
             CAST(sum(CAST(pv AS DECIMAL(38,6))) OVER f AS DOUBLE) AS sy,
             CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(pv AS DECIMAL(18,6))) OVER f AS DOUBLE) AS sxy,
             CAST(count(pv) OVER f AS DOUBLE) AS n
      FROM lagged
      WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           CASE WHEN n > 0 THEN (sxy - sx * sy / n) / n END AS cov_pop,
           CASE WHEN n > 1 THEN (sxy - sx * sy / n) / (n - 1) END AS cov_samp
    FROM summed
    """,
)
def q_window_covar(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    f = wo.rowsBetween(-4, 0)
    pv = F.lag("value").over(wo)
    lagged = e.select("event_id", "user_id", "ts", "value", pv.alias("pv"))
    sx = F.sum(F.when(F.col("pv").isNotNull(), F.col("value").cast(SUM_DECIMAL))).over(f).cast("double")
    sy = F.sum(F.col("pv").cast(SUM_DECIMAL)).over(f).cast("double")
    # decimal × decimal (raw casts only — casting a *computed* double
    # to decimal is not tie-stable across engines)
    sxy = F.sum(
        F.col("value").cast("decimal(18,6)") * F.col("pv").cast("decimal(18,6)")
    ).over(f).cast("double")
    n = F.count("pv").over(f).cast("double")
    summed = lagged.select(
        "event_id", "user_id",
        sx.alias("sx"), sy.alias("sy"), sxy.alias("sxy"), n.alias("n"),
    )
    core = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    return summed.select(
        "event_id",
        "user_id",
        F.when(F.col("n") > 0, core / F.col("n")).alias("cov_pop"),
        F.when(F.col("n") > 1, core / (F.col("n") - 1)).alias("cov_samp"),
    )


# ---------------------------------------------------------------------------
# $derivative / $integral: rate of change between consecutive events
# (per-second) and the running trapezoid integral. The derivative is a
# bare IEEE division of identical inputs (hash-exact with no rounding).
# The integral accumulates (v + pv)·Δt_µs exactly in decimal — raw
# value casts and integer microseconds only, products and sums all
# decimal — and divides by 2·10⁶ once, in double, at the end.
# ---------------------------------------------------------------------------

@register(
    "q_window_deriv",
    oracle="""
    WITH lagged AS (
      SELECT event_id, user_id, ts, value,
             lag(value) OVER w AS pv,
             lag(ts)    OVER w AS pts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, value,
           (value - pv) / nullif(epoch(ts) - epoch(pts), 0) AS deriv,
           CAST(sum(CAST((CAST(round(value * 100) AS BIGINT)
                          + CAST(round(pv * 100) AS BIGINT))
                         * (epoch_us(ts) - epoch_us(pts)) AS DECIMAL(38,0)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 2e8 AS integral
    FROM lagged
    """,
)
def q_window_deriv(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, 0)
    dt = F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
    dt_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    # integer units: value has ≤2 decimals (centi-units are exact) and
    # Δt is exact µs — each trapezoid term fits int64, the running sum
    # accumulates in DECIMAL(38,0), and the single final division back
    # to value·seconds happens in double (engine-identical)
    vu = F.round(F.col("value") * 100).cast("long")
    pvu = F.round(F.lag("value").over(w) * 100).cast("long")
    trap = ((vu + pvu) * dt_us).cast("decimal(38,0)")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.try_divide(F.col("value") - F.lag("value").over(w), F.nullif(dt, F.lit(0.0))).alias("deriv"),
        (F.sum(trap).over(wrun).cast("double") / F.lit(2e8)).alias("integral"),
    )


# ---------------------------------------------------------------------------
# $expMovingAvg — inherently sequential recursion (ema_i = α·v_i +
# (1−α)·ema_{i−1}); no closed form survives long partitions without
# overflow, and ANSI SQL has no recursive window, so the engine runs
# it as a grouped Arrow stage: one shuffle on the partition key, a
# vectorized pandas ewm per group. Rows-only for the driver; exactness
# vs the reference recursion is property-tested (tests/test_windows_ops).
# ---------------------------------------------------------------------------

EMA_ALPHA = 0.25


def exp_moving_avg(
    df, part_col: str, order_cols: list[str], value_col: str, *, alpha: float = EMA_ALPHA
):
    """$expMovingAvg over (partition, order): appends ``ema``.

    Shape: repartition by the key, sort within partitions by
    (key, order), then ONE ``mapInPandas`` stream per partition with
    the last EMA per key carried across Arrow batches. Equivalent to
    groupBy().applyInPandas but pays Python overhead per *batch*
    (10k rows) instead of per *group* — with many small keys that is
    the difference between one Python call per user and one per 10k
    rows (measured ~3× on the bench). Cross-batch carry is safe
    because rows of one key are contiguous in the partition-sorted
    stream and batches arrive in order.
    """
    schema = df.sparkSession.createDataFrame([], df.schema).withColumn(
        "ema", F.lit(0.0)
    ).schema

    def fn(batches):
        carry: dict = {}  # key -> last ema (spans Arrow batch boundaries)
        for pdf in batches:
            emas = []
            for key, grp in pdf.groupby(part_col, sort=False):
                s = grp[value_col]
                prev = carry.get(key)
                if prev is not None:
                    # seed the recursion with the carried state: ewm over
                    # [prev, values...] then drop the seed row
                    import pandas as pd

                    seeded = pd.concat([pd.Series([prev]), s], ignore_index=True)
                    e = seeded.ewm(alpha=alpha, adjust=False).mean().iloc[1:]
                    e.index = s.index
                else:
                    e = s.ewm(alpha=alpha, adjust=False).mean()
                carry[key] = float(e.iloc[-1])
                emas.append(e)
            import pandas as pd

            pdf = pdf.copy()
            pdf["ema"] = pd.concat(emas).reindex(pdf.index).round(6)
            yield pdf

    return (
        df.repartition(F.col(part_col))
        .sortWithinPartitions(part_col, *order_cols)
        .mapInPandas(fn, schema=schema)
    )


@register(
    "q_window_ema",
    # Exact oracle (VERDICT r2 item 5): with α=0.25 both α and 1−α are
    # dyadic, so pandas ewm(adjust=False), the plain β·acc+α·x fold,
    # and DuckDB's list_reduce left-fold are BIT-identical (verified:
    # same IEEE ops in the same order; the ewm normalizer α+β is
    # exactly 1.0). The engine's .round(6) is numpy's rint(x·1e6)/1e6
    # (half-to-even ON THE SCALED DOUBLE); DuckDB's round/round_even
    # compute x·1e6+0.5 and drift an ulp on dyadic EMA values that sit
    # exactly on the 7th-decimal half, so the CASE below spells out
    # rint itself. The prefix-list window makes the oracle O(n²) per
    # partition — fine for the single-node gate, never for the engine.
    oracle="""
    SELECT event_id, user_id, ts, value,
           CASE WHEN frac > 0.5 THEN (f + 1) / 1e6
                WHEN frac < 0.5 THEN f / 1e6
                WHEN CAST(f AS BIGINT) % 2 = 0 THEN f / 1e6
                ELSE (f + 1) / 1e6 END AS ema
    FROM (
      SELECT *, floor(s) AS f, s - floor(s) AS frac FROM (
        SELECT event_id, user_id, ts, value,
               list_reduce(
                 list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 (acc, x) -> 0.75 * acc + 0.25 * x) * 1e6 AS s
        FROM events))
    ORDER BY user_id, ts, event_id
    """,
)
def q_window_ema(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return exp_moving_avg(e, "user_id", ["ts", "event_id"], "value").orderBy(
        "user_id", "ts", "event_id"
    )


# ---------------------------------------------------------------------------
# $linearFill — interpolate missing daily values between non-null
# anchors (the other half of $fill next to LOCF). Same day-spine as
# q_fill; prev/next anchor value+position via ignore-nulls frame
# window, then straight-line arithmetic. Outside the anchors the value
# stays null (Mongo's $linearFill contract).
# ---------------------------------------------------------------------------

@register(
    "q_fill_linear",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             {dsum_sql('value')} AS v
      FROM events
      WHERE value >= 98
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
      SELECT t.event_type, s.day, d.v,
             CAST(row_number() OVER (PARTITION BY t.event_type ORDER BY s.day) AS BIGINT) AS rn
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN spine s
      LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = s.day
    ),
    anch AS (
      SELECT event_type, day, v, rn,
             last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prn,
             first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY rn
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY rn
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nrn
      FROM grid
    )
    SELECT event_type, day,
           round(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * (rn - prn) / (nrn - prn)
             ELSE NULL END, 6) AS v_lin
    FROM anch
    """,
)
def q_fill_linear(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("value") >= 98)
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value", "v"))
    )
    bounds = e.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    types = e.select("event_type").distinct()
    wo = W.partitionBy("event_type").orderBy("rn")
    back = wo.rowsBetween(W.unboundedPreceding, 0)
    fwd = wo.rowsBetween(0, W.unboundedFollowing)
    grid = (
        types.crossJoin(F.broadcast(spine))
        .join(daily, ["event_type", "day"], "left")
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("event_type").orderBy("day")).cast("long"),
        )
    )
    anchored = grid.select(
        "event_type",
        "day",
        "v",
        "rn",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(F.when(F.col("v").isNotNull(), F.col("rn")), ignorenulls=True).over(back).alias("prn"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(F.when(F.col("v").isNotNull(), F.col("rn")), ignorenulls=True).over(fwd).alias("nrn"),
    )
    lin = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("rn") - F.col("prn"))
            / (F.col("nrn") - F.col("prn")),
        )
    )
    return anchored.select("event_type", "day", F.round(lin, 6).alias("v_lin"))


# ---------------------------------------------------------------------------
# $densify with bounds:"partition": generate the missing day rows
# *within each partition's own [min, max] range* (vs q_fill's
# full-range grid — these are the two bounds modes of the stage).
# Spark-first shape: aggregate each partition's bounds, then
# sequence() + explode generates the spine per partition — the row
# generation is distributed with the partition keys, no driver loop
# and no cross join. At 100 TB the spine size is O(partitions ×
# days-in-range), never O(|events|).
# ---------------------------------------------------------------------------

@register(
    "q_densify",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ),
    spine AS (
      SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM bounds
    )
    SELECT s.event_type, s.day, COALESCE(d.n, 0) AS n
    FROM spine s LEFT JOIN daily d ON s.event_type = d.event_type AND s.day = d.day
    """,
)
def q_densify(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("n", F.lit(0)).alias("n"))
    )


# ---------------------------------------------------------------------------
# ntile: per-group quantile bucketing (the $setWindowFields rank
# family's percentile sibling; partitioned windows — no global sort).
# ---------------------------------------------------------------------------

@register(
    "q_ntile",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(10) OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS INT) AS decile
    FROM orders
    """,
)
def q_ntile(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", "o_orderpriority", F.ntile(10).over(w).alias("decile")
    )


# ---------------------------------------------------------------------------
# rolling median: an aggregate (not rank) function over a sliding row
# frame — partitioned per user, so no global sort; the frame is 7 rows.
# ---------------------------------------------------------------------------

@register(
    "q_window_median",
    oracle="""
    SELECT event_id, user_id,
           round(quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
    FROM events
    """,
)
def q_window_median(spark, sf_dir):
    # 6-dp round: linear-interpolated median is non-associative float
    # math (same policy as q_agg_stats percentiles). percentile(x,.5)
    # rather than median(): Spark allows the former over a row frame.
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias("med7"),
    )
