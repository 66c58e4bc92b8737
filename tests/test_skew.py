"""Salting operators: result-identical to the unsalted plan, with the
join/aggregation keys actually spread over (key, salt)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_olap_spark.operators.skew import SALT_COL, salted_collect_set, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of fact rows share one hot key
    facts = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    return facts.cache(), dim.cache()


def test_salted_join_matches_plain_join(spark, skewed):
    facts, dim = skewed
    plain = {tuple(r) for r in facts.join(dim, ["k"]).collect()}
    salted = {tuple(r) for r in salted_join(facts, dim, ["k"], n_salt=8).collect()}
    assert salted == plain


def test_salted_join_left_preserves_unmatched(spark, skewed):
    facts, dim = skewed
    sparse_dim = dim.filter(F.col("k") % 2 == 0)
    plain = {tuple(r) for r in facts.join(sparse_dim, ["k"], "left").collect()}
    salted = {
        tuple(r) for r in salted_join(facts, sparse_dim, ["k"], how="left", n_salt=8).collect()
    }
    assert salted == plain


def test_salted_join_shuffles_on_key_and_salt(spark, skewed):
    facts, dim = skewed
    plan = (
        salted_join(facts, dim, ["k"], n_salt=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert SALT_COL in plan  # the exchange keys include the salt


def test_salted_join_rejects_row_multiplying_types(spark, skewed):
    facts, dim = skewed
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(facts, dim, ["k"], how="full")


def test_salted_collect_set_matches_plain(spark, skewed):
    facts, _ = skewed
    df = facts.withColumn("v", (F.col("fact_id") % 37).cast("long"))
    plain = {
        (r.k, tuple(r.values))
        for r in df.groupBy("k")
        .agg(F.array_sort(F.collect_set("v")).alias("values"))
        .collect()
    }
    salted = {
        (r.k, tuple(r.values))
        for r in salted_collect_set(df, ["k"], "v", n_salt=8).collect()
    }
    assert salted == plain


def test_aqe_splits_planted_hot_key_join(spark):
    """VERDICT r2 #8 / r3 task 5: the engine's join path must leave AQE
    free to split skewed partitions at runtime. Plant a 100:1 hot key
    in a q_join_lookup-shaped fact->dim join whose dim side is NOT
    broadcastable, scale the skew thresholds to test data size, and
    assert (a) the final adaptive plan actually engaged the skew-join
    split and (b) the answer is the exact join cardinality. This
    complements the salting tests above: salting is the explicit
    operator for engines without AQE; this guard proves our default
    plans stay AQE-splittable (no manual pinned partitioning)."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        n_facts, n_keys, dim_rows_per_key = 50_000, 500, 20
        hot = 99  # 99% of facts share key 7
        # sha2 payloads, NOT constant padding: the skew decision reads
        # COMPRESSED shuffle sizes, and a constant pad (or the bare
        # int key that survives after column pruning) compresses below
        # any realistic threshold, hiding the skew from AQE
        facts = spark.range(n_facts).select(
            F.when(F.col("id") % 100 < hot, F.lit(7))
            .otherwise(F.col("id") % n_keys)
            .alias("k"),
            F.col("id").alias("fact_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        dim = spark.range(n_keys * dim_rows_per_key).select(
            (F.col("id") % n_keys).alias("k"),
            F.col("id").alias("dim_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("dpad"),
        )
        # aggregate ON the join result and inspect that same DataFrame
        # after execution (AQE finalizes the plan per query execution —
        # a separate .count() would leave `joined` isFinalPlan=false);
        # the agg must CONSUME the payloads or column pruning drops
        # them from the shuffle and the partitions dip under threshold
        joined = facts.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("pad") + F.length("dpad")).alias("payload_bytes"),
        )
        row = joined.collect()[0]

        n_cold = {}
        for i in range(n_facts):
            if i % 100 >= hot:
                n_cold[i % n_keys] = n_cold.get(i % n_keys, 0) + 1
        n_hot_facts = n_facts - sum(n_cold.values())
        want = (
            (n_hot_facts + n_cold.get(7, 0)) * dim_rows_per_key
            + sum(v * dim_rows_per_key for kk, v in n_cold.items() if kk != 7)
        )
        assert row["n"] == want
        assert row["payload_bytes"] == want * 128  # two 64-hex digests/row

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE skew split did not engage:\n{plan}"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_span_dedup_hot_chunk_stays_bounded(spark):
    """Round-5 task 6: a pathological corpus where ONE 10-word chunk
    appears in half the documents (license-header skew). The keep-first
    window must plan as map-side WindowGroupLimit so the hot key is
    pre-pruned to one row per input partition before the exchange —
    and the result keeps the hot chunk exactly once, in its global
    first occurrence."""
    import time

    from mongo_olap_spark.operators.dedup import dedup_spans

    n = 4000
    hot = " ".join(f"h{i}" for i in range(10))
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.when(F.col("id") % 2 == 0, F.lit(hot)).otherwise(F.lit("")),
            F.concat_ws(" ", F.array(
                *[F.concat(F.lit(f"u{j}x"), F.col("id")) for j in range(10)]
            )),
        ).alias("text"),
    ).withColumn("text", F.ltrim("text")).repartition(8)

    t0 = time.perf_counter()
    out = dedup_spans(docs, span_words=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    wall = time.perf_counter() - t0

    plan = out._jdf.queryExecution().executedPlan().toString()
    # partial (map-side) + final WindowGroupLimit around the exchange
    assert plan.count("WindowGroupLimit") >= 2, plan
    # hot chunk survives exactly once, in doc 0 (global first)
    assert rows[0]["clean_text"].startswith(hot)
    carriers = [d for d, r in rows.items() if hot in r["clean_text"]]
    assert carriers == [0]
    # every doc keeps its unique chunk; even docs (minus doc 0) lost one
    assert rows[2]["n_kept"] == 1 and rows[1]["n_kept"] == 1
    assert rows[0]["n_kept"] == 2
    assert len(rows) == n
    # tripwire, not a benchmark: the hot key must not serialize the job
    assert wall < 60, f"span dedup took {wall:.0f}s on a planted hot key"


# ---------------------------------------------------------------------------
# Chain-topology dup components (r8, r6-verdict task): a 10,000-member
# CHAIN is the adversarial depth case for label propagation — every
# doc near-dups only its neighbors, so the component's diameter equals
# its size. The pointer-jump (path-halving) step must converge it in
# O(log n) rounds, well inside the default max_iter budget; plain
# min-label propagation would need 10,000 rounds and refuse.
# ---------------------------------------------------------------------------

def test_connected_components_10k_chain_converges(spark):
    from mongo_olap_spark.operators import dedup as dd

    n = 10_000
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    nodes = spark.range(n + 5).select(F.col("id").alias("node"))
    out = dd.connected_components(pairs, nodes).collect()
    assert len(out) == n + 5
    # the whole chain labels to its minimum member...
    assert all(r.group_id == 0 for r in out if r.node < n)
    # ...and the 5 singletons stay their own groups
    assert all(r.group_id == r.node for r in out if r.node >= n)


def test_connected_components_two_deep_chains_stay_separate(spark):
    # two disjoint 500-chains (offset ids) must NOT merge, and each
    # must still resolve to its own minimum under pointer jumping
    from mongo_olap_spark.operators import dedup as dd

    a = spark.range(499).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    b = spark.range(499).select(
        (F.col("id") + 10_000).alias("id_a"),
        (F.col("id") + 10_001).alias("id_b"))
    pairs = a.unionByName(b)
    nodes = spark.range(500).select(F.col("id").alias("node")).unionByName(
        spark.range(500).select((F.col("id") + 10_000).alias("node")))
    got = {r.node: r.group_id
           for r in dd.connected_components(pairs, nodes).collect()}
    assert all(got[i] == 0 for i in range(500))
    assert all(got[10_000 + i] == 10_000 for i in range(500))
