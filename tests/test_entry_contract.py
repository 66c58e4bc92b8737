"""Driver-contract conformance: entry() smoke, queries()/oracle_sql()
key discipline, and a full oracle comparison at smoke scale (the
sf0.01 run lives in tools/check_oracle.py; this keeps pytest fast)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as ent
from mongo_olap_spark.sources.tables import TABLES


def test_entry_returns_rows(spark):
    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(df.columns)


def test_oracle_keys_subset_of_queries():
    qs, osql = ent.queries(), ent.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 40


def test_queries_return_dataframes_at_smoke_scale(spark, sf_dir):
    qs = ent.queries()
    for qid, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, qid


@pytest.mark.slow
def test_oracle_match_at_smoke_scale(spark, sf_dir):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import compare, duck_conn

    con = duck_conn(sf_dir)
    failures = []
    for qid, sql in ent.oracle_sql().items():
        sdf = ent.queries()[qid](spark, sf_dir).toPandas()
        ddf = con.execute(sql).df()
        ok, msg = compare(qid, sdf, ddf)
        if not ok:
            failures.append((qid, msg))
    assert not failures, failures


def test_all_tables_loadable(spark, sf_dir):
    from mongo_olap_spark.sources.tables import load_table

    for t in TABLES:
        assert load_table(spark, sf_dir, t).count() > 0
