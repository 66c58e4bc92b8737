"""T2 — MongoDB aggregation-pipeline relational surface (SURVEY.md §2.2).

$lookup in both shapes (flattened left join and match-count), semi/
anti joins ($lookup + $match on matches), theta/range join (pipeline
$lookup), $unionWith, intersect/except extras, $sortByCount, $bucket /
$bucketAuto, and native grouping-sets/cube/rollup (the multi-level
cube materialization the reference emulates with repeated $group).

Join strategy notes (100 TB): every dimension join here broadcasts the
dim side explicitly (region/nation/supplier stay tiny at any SF), so
no shuffle of the fact table; fact⋈fact equi joins use the default
sort-merge which AQE converts to broadcast when runtime stats allow.
The range join is expressed as broadcast-nested-loop against a
28-row derived calendar — O(|facts| × 28) comparisons map-side, no
shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_olap_spark.functions.expressions import dsum, dsum_sql
from mongo_olap_spark.queries import register
from mongo_olap_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# S7 — $lookup (flattened equi left join) + downstream $group
# ---------------------------------------------------------------------------

@register(
    "q_join_left",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_join_left(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# S7 — $lookup match-count shape (matches-as-array cardinality + $size)
# ---------------------------------------------------------------------------

@register(
    "q_join_lookup",
    oracle=f"""
    SELECT o_orderkey,
           COUNT(l_orderkey) AS n_items,
           COALESCE({dsum_sql('l_quantity')}, CAST(0 AS DOUBLE)) AS total_qty
    FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey
    """,
)
def q_join_lookup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(
            F.count("l_orderkey").alias("n_items"),
            F.coalesce(dsum("l_quantity"), F.lit(0.0)).alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# $lookup + $match "has/has-no matches" → semi / anti joins
# ---------------------------------------------------------------------------

@register(
    "q_lookup_multikey",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             list_distinct([doc_id % 25, (doc_id * 7) % 25]) AS tags
      FROM documents
    ),
    e AS (SELECT doc_id, unnest(tags) AS k FROM p),
    j AS (SELECT e.doc_id, n.n_name
          FROM e LEFT JOIN nation n ON e.k = n.n_nationkey)
    SELECT doc_id,
           CAST(COUNT(n_name) AS INT) AS n,
           array_to_string(list_sort(list(n_name)), ',') AS names_csv
    FROM j GROUP BY doc_id
    """,
)
def q_lookup_multikey(spark, sf_dir):
    """Round-6 multikey $lookup: an ARRAY-valued localField matches
    foreign docs whose key equals ANY distinct element (Mongo's
    multikey contract), compiled as distinct-arrays -> deduped explode
    -> hash equi-join -> repack — no row ids, no nested loop, and the
    25-row nation side broadcasts. Output is order-stable ($sortArray
    + CSV fold) so the driver's value hash is deterministic."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    n = load_table(spark, sf_dir, "nation")
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

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
            {"$lookup": {"from": "nation", "localField": "tags",
                         "foreignField": "n_nationkey", "as": "m"}},
            {"$project": {"doc_id": 1, "n": {"$size": "$m"},
                          "names_csv": {"$reduce": {
                              "input": names,
                              "initialValue": "",
                              "in": {"$cond": [
                                  {"$eq": ["$$value", ""]}, "$$this",
                                  {"$concat": ["$$value", ",", "$$this"]},
                              ]}}}}},
        ],
        collections={"nation": n},
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
)
def q_join_semi(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_join_anti",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
    )
    """,
)
def q_join_anti(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select("p_partkey", "p_name")


# ---------------------------------------------------------------------------
# S8 — pipeline $lookup (theta/range join): orders → quarter calendar.
# Plan shape: 28-row calendar broadcast, BNL range probe, no shuffle of
# the fact side. The oracle states the semantics directly (date_trunc).
# ---------------------------------------------------------------------------

@register(
    "q_join_theta",
    oracle=f"""
    SELECT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS total_price
    FROM orders
    GROUP BY 1
    """,
)
def q_join_theta(spark, sf_dir):
    # Range join, bucketized: derive the bucket key (quarter) on the
    # fact side, broadcast-equi-join the calendar, keep the range
    # predicate as a residual check. Turns an O(|facts|·|ranges|) BNL
    # into a map-side hash probe — the only range-join shape that
    # survives 100 TB (same rewrite a range-join hint would do).
    o = load_table(spark, sf_dir, "orders")
    quarters = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(timestamp '1995-01-01 00:00:00',"
                " timestamp '2001-10-01 00:00:00', interval 3 months)"
            )
        ).alias("quarter")
    ).withColumn("q_end", F.expr("quarter + interval 3 months"))
    keyed = o.withColumn("quarter", F.date_trunc("quarter", "o_orderdate"))
    joined = keyed.join(F.broadcast(quarters), "quarter").filter(
        (F.col("o_orderdate") >= F.col("quarter")) & (F.col("o_orderdate") < F.col("q_end"))
    )
    return joined.groupBy("quarter").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_price"),
    )


# ---------------------------------------------------------------------------
# S10 — $unionWith (bag union, schema aligned by name)
# ---------------------------------------------------------------------------

@register(
    "q_union",
    oracle="""
    SELECT c_custkey AS entity_key, c_name AS entity_name, 'customer' AS kind, c_acctbal AS acctbal
    FROM customer
    UNION ALL
    SELECT s_suppkey, s_name, 'supplier', s_acctbal FROM supplier
    """,
)
def q_union(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("kind"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionByName(s)


@register(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q_intersect(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q_except",
    oracle="""
    SELECT source FROM documents WHERE lang = 'en'
    EXCEPT
    SELECT source FROM documents WHERE lang = 'zh'
    """,
)
def q_except(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    en = d.filter(F.col("lang") == "en").select("source")
    zh = d.filter(F.col("lang") == "zh").select("source")
    return en.subtract(zh)  # EXCEPT (set semantics), not EXCEPT ALL


# ---------------------------------------------------------------------------
# S12 — $sortByCount
# ---------------------------------------------------------------------------

@register(
    "q_sortbycount",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY n DESC, event_type
    """,
)
def q_sortbycount(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
    )


# ---------------------------------------------------------------------------
# S13 — $bucket (manual range buckets)
# ---------------------------------------------------------------------------

_BUCKET_CASE_SQL = """
    CASE WHEN o_totalprice < 50000  THEN '[0,50k)'
         WHEN o_totalprice < 150000 THEN '[50k,150k)'
         WHEN o_totalprice < 300000 THEN '[150k,300k)'
         ELSE '[300k,inf)' END
"""


@register(
    "q_bucket",
    oracle=f"""
    SELECT {_BUCKET_CASE_SQL} AS price_bucket,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS total_price
    FROM orders
    GROUP BY 1
    """,
)
def q_bucket(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("price_bucket", F.expr(_BUCKET_CASE_SQL))
        .groupBy("price_bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price"))
    )


# ---------------------------------------------------------------------------
# S14 — $bucketAuto (equi-height buckets via ntile)
# ---------------------------------------------------------------------------

@register(
    "q_bucket_auto",
    oracle="""
    SELECT bucket, COUNT(*) AS n,
           min(o_totalprice) AS lo, max(o_totalprice) AS hi
    FROM (
      SELECT o_totalprice,
             ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    GROUP BY bucket
    """,
)
def q_bucket_auto(spark, sf_dir):
    # Equi-height buckets WITHOUT the single-partition global-sort
    # window: exact global rank via range-partitioned two-pass
    # (operators/ranking.py), then ntile membership by arithmetic.
    # Bit-identical to ntile(8) OVER (ORDER BY ...), bounded tasks.
    from mongo_olap_spark.operators.ranking import scalable_ntile

    o = load_table(spark, sf_dir, "orders")
    return (
        scalable_ntile(o, 8, ["o_totalprice", "o_orderkey"], bucket_col="bucket")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# Grouping sets / CUBE / ROLLUP — native multi-level cube materialization
# (the reference emulates these with repeated $group passes; Spark and
# the oracle both compute them in one pass). Dimension NULLs produced
# by the grouping sets are disambiguated with sentinels (source dims
# are non-null here).
# ---------------------------------------------------------------------------

@register(
    "q_cube_grouping",
    oracle=f"""
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(date_trunc('day', ts) AS TIMESTAMP),
                    TIMESTAMP '1900-01-01 00:00:00') AS day,
           COUNT(*) AS n,
           {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY CUBE (event_type, CAST(date_trunc('day', ts) AS TIMESTAMP))
    """,
)
def q_cube_grouping(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    return (
        e.cube("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("day", F.lit("1900-01-01 00:00:00").cast("timestamp")).alias("day"),
            "n",
            "total_value",
        )
    )


@register(
    "q_rollup",
    oracle=f"""
    SELECT COALESCE(r_name, 'ALL') AS r_name,
           COALESCE(n_name, 'ALL') AS n_name,
           COUNT(*) AS n_customers,
           {dsum_sql('c_acctbal')} AS total_acctbal
    FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_rollup(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal", "total_acctbal"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            "n_customers",
            "total_acctbal",
        )
    )


# ---------------------------------------------------------------------------
# Star-join flagship (TPC-H Q5 shape): revenue per nation for one
# region-year, six tables. The scale story is the join taxonomy:
# nation/region are broadcast (no shuffle), the date filter pushes into
# the orders scan before its join, and the three big-table joins
# (lineitem-orders-customer-supplier) shuffle on their keys where AQE
# can re-plan/coalesce at runtime. Revenue accumulates through the
# decimal-exact dsum so the result is hash-identical to the oracle
# regardless of join order or partitioning.
# ---------------------------------------------------------------------------

@register(
    "q_star_join",
    oracle=f"""
    SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_star_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = F.broadcast(
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(asia_nations, s.s_nationkey == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )
