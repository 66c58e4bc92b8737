"""Physical-plan regression guards: the properties that make these
queries survive 100 TB are asserted on the plan text, so a future
refactor that silently loses a pushdown / broadcast / top-k shape
fails CI rather than the cluster."""

from __future__ import annotations

import pytest

from mongo_olap_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, qid: str) -> str:
    return QUERIES[qid](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_cube_build_is_partial_final_single_exchange(spark):
    plan = plan_of(spark, "q_cube_build")
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert plan.count("Exchange hashpartitioning") == 1
    # column pruning: untouched wide columns never reach the scan
    assert "l_comment" not in plan and "l_orderkey" not in plan


def test_filter_pushed_to_parquet(spark):
    plan = plan_of(spark, "q_filter")
    assert "PushedFilters" in plan
    # the shipdate range reaches the scan, not a post-scan Filter only
    scan_line = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "l_shipdate" in scan_line


def test_dim_join_broadcasts(spark):
    plan = plan_of(spark, "q_agg_sum")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # nation must never shuffle customer


def test_topk_uses_take_ordered(spark):
    plan = plan_of(spark, "q_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no global sort for a limit-10


def test_range_join_is_not_nested_loop(spark):
    plan = plan_of(spark, "q_join_theta")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # bucketized equi probe


def test_semi_anti_join_shapes(spark):
    semi = plan_of(spark, "q_join_semi")
    anti = plan_of(spark, "q_join_anti")
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_no_rowwise_python_udf_in_native_queries(spark):
    # every query except the explicitly-Arrow stages stays JVM-side:
    # no BatchEvalPython (row-at-a-time UDF) anywhere, and Arrow
    # evaluation only in the declared BLAS/codec stages
    ARROW_OK = (
        "q_multimodal",
        "q_multimodal_decode",  # injected codec + pixel stats, both Arrow by design
        "q_multimodal_resize",  # r14: decode → NN resize → stats, Arrow chain
        "q_multimodal_frames",  # r14: frame-sample fan-out + per-frame stats
        "q_dedup_embedding",
        "q_dedup_simhash",  # r13: per-bucket vectorized Hamming verify
        # (Arrow by design — the banded candidate JOIN materialized
        # O(bucket²) shuffle rows on skewed band keys and died at sf10)
        "q_ivf_knn",
        "q_window_ema",
        "q_pack_bpe",  # r15: BPE encode is the declared Arrow stage
        # r16: the subword tail / token-space queries ride the same
        # declared Arrow encode stage
        "q_pipeline_llm_pack",
        "q_chunk_bpe",
        "q_vocab_bpe",
    )
    for qid in QUERIES:
        plan = plan_of(spark, qid)
        assert "BatchEvalPython" not in plan, qid
        if qid not in ARROW_OK:
            assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan, qid


def test_srp_signature_is_codegen_aggregate(spark):
    # VERDICT r1 #1: the SRP projection must be plain codegen'd
    # aggregates (explode + partial sum), never an interpreted
    # per-element lambda fold re-hashing constant planes per row
    from mongo_olap_spark.operators.similarity import srp_signatures
    from mongo_olap_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    plan = (
        srp_signatures(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "lambdafunction" not in plan.lower()
    assert "partial_sum" in plan  # map-side combine before the id shuffle


def test_embedding_near_dup_bucketed_path_no_driver_collect(spark):
    # VERDICT r1 #2: the scale strategy must be bucketed applyInPandas
    # (per-band BLAS verify), not a driver-side corpus collect. Plan
    # construction alone must not touch the data.
    from mongo_olap_spark.operators import similarity as sim
    from mongo_olap_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    df = sim.embedding_near_dup_pairs(emb, threshold=0.3, strategy="bucketed")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # per-bucket BLAS verify
    assert "lambdafunction" not in plan.lower()


def test_lattice_build_single_scan(spark):
    from mongo_olap_spark.cube.lattice import build_cube_lattice
    from mongo_olap_spark.queries.core import EVENTS_CUBE
    from mongo_olap_spark.sources.tables import load_table

    # no-op filter defeats the shared session's cache-plan matching
    # (other tests cache the identical lattice build, and Spark would
    # substitute the whole subtree, hiding the build plan under test)
    e = load_table(spark, SF, "events").filter("event_id >= -1")
    plan = (
        build_cube_lattice(spark, EVENTS_CUBE, e)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one source scan (file scan, or a cache scan if events is cached —
    # whose lineage string still shows the original FileScan)
    inmem = plan.count("InMemoryTableScan")
    n_scans = inmem if inmem else plan.count("FileScan parquet")
    assert n_scans == 1, plan
    assert "Expand" in plan  # grouping sets expansion, not per-level scans

def test_star_join_broadcasts_dims_and_pushes_date_filter(spark, sf_dir):
    """The six-table star join must broadcast the nation×region dim
    (no shuffle for small sides) and push the orders date filter into
    the scan, not evaluate it post-join."""
    from mongo_olap_spark.queries import QUERIES

    plan = (
        QUERIES["q_star_join"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan or "o_orderdate" in plan


def test_chunk_and_logprob_have_no_python_nodes(spark, sf_dir):
    from mongo_olap_spark.queries import QUERIES

    for qid in ("q_chunk", "q_unigram_logprob", "q_repetition", "q_text_clean"):
        plan = (
            QUERIES[qid](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan, qid
        assert "lambdafunction" not in plan.lower(), qid


def test_unigram_logprob_broadcasts_freq_table(spark, sf_dir):
    from mongo_olap_spark.queries import QUERIES

    plan = (
        QUERIES["q_unigram_logprob"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_shingle_posts_codegen_no_lambda(spark, sf_dir):
    """The shingle posting builder must stay lambda-free (slice +
    arrays_zip + xxhash64 — all native, no per-element lambda), emit
    int64 keys, and build shingles MAP-SIDE: no window/exchange before
    the distinct (the r16 rewrite removed the posexplode + lead-window
    build that shuffled every token row)."""
    from mongo_olap_spark.operators.dedup import shingle_posts
    from mongo_olap_spark.sources.tables import load_table

    posts = shingle_posts(load_table(spark, sf_dir, "documents"))
    assert dict(posts.dtypes)["h"] == "bigint"
    plan = posts._jdf.queryExecution().executedPlan().toString()
    assert "lambdafunction" not in plan.lower()
    assert "Python" not in plan
    # map-side build: exactly ONE exchange (the distinct), no window
    assert "Window" not in plan
    assert plan.count("Exchange") == 1


def test_decontaminate_probes_broadcast_index(spark):
    # the benchmark set must broadcast: corpus postings probe it
    # map-side; a SortMergeJoin here would shuffle the whole corpus
    plan = plan_of(spark, "q_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dup_groups_has_no_cartesian(spark):
    plan = plan_of(spark, "q_dup_groups")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucket_auto_no_single_partition_window(spark):
    """VERDICT r2 #1: $bucketAuto must never plan an unpartitioned
    window (Exchange SinglePartition moves the whole collection into
    one task). The scalable ntile ranks inside range partitions; the
    only global state is O(P) scalars collected to the driver."""
    plan = plan_of(spark, "q_bucket_auto")
    assert "Exchange SinglePartition" not in plan, plan
    assert "ntile(8)" not in plan  # bucket membership is rank arithmetic

    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline
    from mongo_olap_spark.sources.tables import load_table

    o = load_table(spark, SF, "orders")
    df = compile_pipeline(
        o, [{"$bucketAuto": {"groupBy": "$o_totalprice", "buckets": 4}}]
    )
    cplan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in cplan, cplan
    assert "ntile(4)" not in cplan


def test_scalable_ntile_matches_window_ntile(spark):
    """Bit-identical bucket membership vs the single-partition window,
    including the ragged case (N % n != 0) and tie values."""
    from pyspark.sql import Window as W, functions as F
    from mongo_olap_spark.operators.ranking import scalable_ntile

    rows = [(i % 7, i) for i in range(1003)]  # ties in v, unique k
    df = spark.createDataFrame(rows, ["v", "k"])
    got = {
        (r["v"], r["k"]): r["b"]
        for r in scalable_ntile(df, 8, ["v", "k"], bucket_col="b").collect()
    }
    want = {
        (r["v"], r["k"]): r["b"]
        for r in df.withColumn(
            "b", F.ntile(8).over(W.orderBy("v", "k"))
        ).collect()
    }
    assert got == want


def test_embedding_near_dup_band_sizing_guards(spark):
    # ADVICE r13: threshold ≤ −1 gives SRP collision probability 0 —
    # the band-count formula would divide by log(1−0)=0; refuse loudly
    import pytest as _pytest

    from mongo_olap_spark.operators import similarity as sim
    from mongo_olap_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    with _pytest.raises(ValueError, match="collision probability 0"):
        sim.embedding_near_dup_pairs(emb, threshold=-1.0,
                                     strategy="bucketed")
    # a low threshold whose ≥95%-recall band count exceeds the 32-band
    # clamp must SURFACE the shortfall, not ship it silently
    with _pytest.warns(UserWarning, match="32-band clamp binds"):
        df = sim.embedding_near_dup_pairs(emb, threshold=0.05,
                                          strategy="bucketed")
        assert df.columns == ["id_a", "id_b", "sim"]
