"""Spark Connect portability contract (r8, r6-verdict task 7).

The gRPC client stack is absent from this container, so these tests
certify the SEAM, not a live server: detection, the broadcast/closure
bridge, the refusals' recipes, and — the drift guard — that every
classic-only API site in the package is owned by the audited support
matrix. The opt-in live smoke at the bottom runs wherever
``pyspark[connect]`` is actually installed.
"""

from __future__ import annotations

import os
import re
import types

import pytest

from mongo_olap_spark import connect as C


class _FakeConnectSession:
    """Structurally what the engine relies on: sparkContext raises."""

    @property
    def sparkContext(self):
        raise AttributeError("Spark Connect has no SparkContext")


def test_is_connect_classic(spark):
    assert C.is_connect(spark) is False


def test_is_connect_fake_connect():
    assert C.is_connect(_FakeConnectSession()) is True


def test_bvalue_classic_is_broadcast(spark):
    bc = bvalue = C.bvalue(spark, {"k": 1})
    assert bvalue.value == {"k": 1}
    from pyspark.broadcast import Broadcast

    assert isinstance(bc, Broadcast)
    bc.unpersist()


def test_bvalue_connect_is_closure_capture():
    bv = C.bvalue(_FakeConnectSession(), (1, 2, 3))
    assert isinstance(bv, C._ClosureValue)
    assert bv.value == (1, 2, 3)


def test_similarity_broadcast_path_works_via_closure(spark, monkeypatch):
    # force the Connect branch of bvalue on a classic session: the
    # corpus matrix rides the UDF closure instead of sc.broadcast, and
    # the operator's results must be identical
    from mongo_olap_spark.operators import similarity as sim

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0])],
        "id long, vec array<double>",
    )
    want = {
        (r.id_a, r.id_b)
        for r in sim.embedding_near_dup_pairs(
            emb, id_col="id", vec_col="vec", threshold=0.99,
            strategy="broadcast",
        ).select("id_a", "id_b").collect()
    }
    monkeypatch.setattr(C, "is_connect", lambda s: True)
    got = {
        (r.id_a, r.id_b)
        for r in sim.embedding_near_dup_pairs(
            emb, id_col="id", vec_col="vec", threshold=0.99,
            strategy="broadcast",
        ).select("id_a", "id_b").collect()
    }
    assert got == want == {(1, 2)}


def test_collection_schema_inference_refuses_under_connect():
    from mongo_olap_spark.sources.collections import infer_collection_schema

    with pytest.raises(NotImplementedError, match="schema="):
        infer_collection_schema(_FakeConnectSession(), "/tmp/nope.jsonl")


def test_plan_fingerprint_refuses_without_jdf():
    from mongo_olap_spark.plans.fingerprint import plan_string

    with pytest.raises(NotImplementedError, match="classic"):
        plan_string(types.SimpleNamespace())


def test_matrix_statuses_and_refusal_recipe():
    matrix = C.connect_compatibility()
    assert matrix, "empty support matrix"
    for comp, (status, how) in matrix.items():
        assert status in ("works", "fallback", "refuses"), comp
        assert how
    try:
        import grpc  # noqa: F401

        pytest.skip("gRPC stack present: refusal path not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="pyspark\\[connect\\]"):
        C.get_spark_connect()


# the drift guard: every classic-only API usage in the package must
# live in a file the audit owns — adding a new `sparkContext`/`_jvm`/
# `.rdd` call anywhere else fails here until the matrix covers it
_CLASSIC_TOKENS = re.compile(
    r"sparkContext|_jvm|_jsc|_jdf|\.rdd\b")
_AUDITED_FILES = {
    "connect.py",             # the bridge itself
    "session.py",             # guarded setLogLevel
    "plans/fingerprint.py",   # refuses (test tooling)
    "sources/collections.py",  # refuses with schema= recipe
    "sources/json_props.py",  # rdd path with documented fallback
    "sources/tables.py",      # spread_small_scan layout probe: audited
                              # fallback (no-op under Connect)
    # localCheckpoint is Connect API since Spark 4.0 — these only
    # match the token scan via comments/docstrings:
    "operators/dedup.py",
    "operators/graph.py",
    "operators/ranking.py",
    "cube/catalog.py",
}


def test_no_unaudited_classic_api_usage():
    pkg = os.path.join(os.path.dirname(__file__), "..", "mongo_olap_spark")
    pkg = os.path.abspath(pkg)
    offenders = []
    for dirpath, _, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, pkg).replace(os.sep, "/")
            with open(path, encoding="utf-8") as f:
                if _CLASSIC_TOKENS.search(f.read()) and rel not in _AUDITED_FILES:
                    offenders.append(rel)
    assert not offenders, (
        f"classic-only Spark API used outside the Connect audit: "
        f"{offenders} — bridge it via mongo_olap_spark.connect or add "
        f"it to CONNECT_MATRIX + _AUDITED_FILES with a recipe"
    )


# ---------------------------------------------------------------------------
# opt-in live smoke: runs only where pyspark[connect] is installed
# (grpcio + protobuf importable). Starts an in-process local Connect
# server via builder.remote("local[2]") and runs the T1 core + a
# compiled pipeline through it.
# ---------------------------------------------------------------------------

def test_connect_live_smoke():
    pytest.importorskip("grpc")
    pytest.importorskip("google.protobuf")
    from pyspark.sql import SparkSession

    remote = (
        SparkSession.builder.remote("local[2]")
        .appName("connect_smoke").getOrCreate()
    )
    try:
        assert C.is_connect(remote) is True
        df = remote.createDataFrame(
            [("a", 1), ("a", 2), ("b", 3)], "k string, v int")
        from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

        out = compile_pipeline(
            df,
            [{"$match": {"v": {"$gte": 2}}},
             {"$group": {"_id": "$k", "n": {"$sum": 1}}},
             {"$sort": {"_id": 1}}],
        ).collect()
        assert [(r._id, r.n) for r in out] == [("a", 1), ("b", 1)]
    finally:
        remote.stop()
