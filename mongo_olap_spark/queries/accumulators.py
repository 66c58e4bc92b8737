"""$group accumulator surface beyond T1 (SURVEY.md §2.2):

$push/$addToSet (order-normalized for comparability), $first/$last by
sort order (min_by/max_by — deterministic, unlike raw first/last),
$stdDevPop/Samp, $topN/$minN/$maxN, $median/$percentile, and the
approximate-at-scale variants (HLL distinct, approx quantiles) as a
rows-only query (sketch values are engine-specific by construction).

Array-valued aggregates are serialized to sorted CSV strings for the
oracle hash — same content, no array-comparison ambiguity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_olap_spark.queries import register
from mongo_olap_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# $push / $addToSet
# ---------------------------------------------------------------------------

@register(
    "q_agg_collect",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_set,
           CAST(len(list(event_type)) AS INT) AS n_pushed
    FROM events
    WHERE user_id < 20
    GROUP BY user_id
    """,
)
def q_agg_collect(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return e.groupBy("user_id").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias("types_set"),
        F.size(F.collect_list("event_type")).alias("n_pushed"),
    )


# ---------------------------------------------------------------------------
# $first / $last under an explicit sort → min_by / max_by (deterministic)
# ---------------------------------------------------------------------------

@register(
    "q_agg_firstlast",
    oracle="""
    SELECT user_id,
           min_by(event_type, ts) AS first_type,
           max_by(event_type, ts) AS last_type,
           min_by(value, ts)      AS first_value,
           max_by(value, ts)      AS last_value
    FROM events
    GROUP BY user_id
    """,
)
def q_agg_firstlast(spark, sf_dir):
    # events.ts is unique per user in this data (µs resolution), so
    # min_by/max_by are deterministic — the engine-correct reading of
    # Mongo's $first/$last-with-sort.
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.expr("min_by(event_type, ts)").alias("first_type"),
        F.expr("max_by(event_type, ts)").alias("last_type"),
        F.expr("min_by(value, ts)").alias("first_value"),
        F.expr("max_by(value, ts)").alias("last_value"),
    )


# ---------------------------------------------------------------------------
# $stdDevPop / $stdDevSamp / $median / $percentile
# ---------------------------------------------------------------------------

@register(
    "q_agg_stats",
    oracle="""
    SELECT event_type,
           round(stddev_samp(value), 6) AS sd_samp,
           round(stddev_pop(value), 6)  AS sd_pop,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_stats(spark, sf_dir):
    # stddev/percentile involve non-associative float math; 6-dp
    # rounding absorbs engine-side summation-order differences
    # (measured agreement is already at 1e-6).
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd_samp"),
        F.round(F.stddev_pop("value"), 6).alias("sd_pop"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
    )


# ---------------------------------------------------------------------------
# $topN / $minN / $maxN
# ---------------------------------------------------------------------------

@register(
    "q_agg_topn",
    oracle="""
    SELECT event_type,
           array_to_string(list_transform(
             (list_sort(list(value), 'DESC'))[1:3], v -> CAST(v AS VARCHAR)), ',') AS top3_values,
           array_to_string(list_transform(
             (list_sort(list(value), 'ASC'))[1:3], v -> CAST(v AS VARCHAR)), ',') AS bottom3_values
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_topn(spark, sf_dir):
    # skew-safe: rank within the group first and keep ≤6 rows per
    # group before any collect — a hot key costs a disk-backed window
    # sort, never O(group) aggregation-buffer memory like
    # collect_list-everything-then-slice (VERDICT r1 What's-wrong #6)
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    wd = W.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    wa = W.partitionBy("event_type").orderBy(F.asc("value"), "event_id")
    ranked = (
        e.select("event_type", "value", "event_id")
        .withColumn("rd", F.row_number().over(wd))
        .withColumn("ra", F.row_number().over(wa))
        .filter((F.col("rd") <= 3) | (F.col("ra") <= 3))
    )
    to_csv = lambda c: F.concat_ws(",", F.transform(c, lambda v: v.cast("string")))  # noqa: E731
    top3 = F.sort_array(
        F.collect_list(F.when(F.col("rd") <= 3, F.col("value"))), asc=False
    )
    bot3 = F.sort_array(
        F.collect_list(F.when(F.col("ra") <= 3, F.col("value"))), asc=True
    )
    return ranked.groupBy("event_type").agg(
        to_csv(top3).alias("top3_values"),
        to_csv(bot3).alias("bottom3_values"),
    )


# ---------------------------------------------------------------------------
# approximate-at-scale variants (sketches are engine-specific → rows-only;
# pytest asserts bounded error vs exact)
# ---------------------------------------------------------------------------

@register("q_agg_approx")
def q_agg_approx(spark, sf_dir):
    # Note: keep the distinct aggregate in its own plan — mixing
    # countDistinct with percentile_approx in one agg forces an Expand
    # + sort-fallback (measured ~10× slower); two hash aggs + a
    # broadcast join of tiny results is the fast shape.
    e = load_table(spark, sf_dir, "events")
    approx = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_p50"),
    )
    exact = e.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact_users"))
    return approx.join(F.broadcast(exact), "event_type")
