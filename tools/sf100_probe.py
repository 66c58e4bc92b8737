"""sf100 probe of the regime-sensitive families (r15, VERDICT r14
task 1 — "push the scale ladder one more decade").

The sf10 full gate proved exact-regime exits only surface at the
largest tested scale (q_cube_topn's fold-serve undercounted there and
nowhere smaller). This probe runs ONE decade up — 100M events / 600M
lineitem / 5M docs, /tmp/sf100 via ``synth_sf1.py --mult 1000`` — the
families whose EXACTNESS depends on a cardinality regime, each by the
strongest affordable instrument:

- **Phase A — direct DuckDB oracle at FULL sf100**: the routed/cube
  families (C19 exact two-level distinct, C21 top-k cells-exact
  serve, C24 minN/maxN/topN boundary expansion, quantile/stddev
  routing, the IVM closed-form CDC trio) plus the small-output
  window/densify queries. Their outputs are cell- or group-sized, so
  the ordinary pandas compare holds at any input scale.
- **Phase W — decimal-digest twins at FULL sf100**: the O(N)-output
  window suite (frame/lag/covar/deriv/median/ntile/asof/sessionize).
  100M-row outputs cannot round-trip through pandas, so BOTH engines
  reduce the SAME result to a per-bucket digest — COUNT plus the
  repo's portable decimal sums (``dsum`` / ``dsum_sql``: exact
  decimal accumulation, engine-portable double at the end) of every
  numeric column, bucketed by the first integer column % 101 — and
  the digests compare with the ordinary gate. Equal digests over 101
  buckets x every column pin the full 100M-row result up to
  permutation within identical multisets of per-bucket sums.
- **Phase C — planted census at FULL sf100** (tools/planted_census.py
  unchanged): per-pair text re-verification, planted+constructed
  recall, sequential union-find closure, independent simhash bander.

Usage:
    python tools/sf100_probe.py [sf100_dir] [out_txt]
        (defaults: /tmp/sf100  SCALE_PROBE_SF100.txt)
"""

from __future__ import annotations

import datetime
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

#: phase A — small-output regime-sensitive queries, full direct oracle
PHASE_A = [
    # C6/C14-C16 cube core at 600M lineitem rows
    "q_cube_build", "q_cube_slice", "q_cube_rollup", "q_cube_lattice",
    "q_cube_grouping", "q_cube_stddev", "q_cube_extremes",
    # C19 count-distinct: exact two-level regime + HLL (rows-only)
    "q_cube_distinct_exact", "q_cube_distinct", "q_route_distinct",
    "q_pipeline_route_countdistinct",
    # C20 quantiles: exact + sketch routing
    "q_cube_quantile_exact", "q_cube_quantile", "q_route_quantile",
    "q_pipeline_route_median", "q_pipeline_route_percentile",
    "q_pipeline_route_percentile_multi",
    # C21 top-k: the family the sf10 gate caught (explode-route serve)
    "q_cube_topn", "q_cube_topn_exact", "q_route_topn", "q_route_topby",
    "q_pipeline_route_topn_desc", "q_topk", "q_agg_topn",
    # C23/C24 order statistics + boundary expansion
    "q_route_minn", "q_pipeline_route_maxn_fallback",
    # dispersion + hybrid routing
    "q_pipeline_route_stddev", "q_pipeline_route_mixed", "q_route_cube",
    "q_route_hybrid",
    # C11-C13 IVM closed-form CDC oracles at 100M events
    "q_incr_insert", "q_incr_delete", "q_incr_update",
    # small-output window-family queries
    "q_window_rank", "q_fill", "q_fill_linear", "q_densify",
    "q_funnel", "q_retention",
]

#: phase W — O(N)-output window suite, digest twins
PHASE_W = [
    "q_window_frame", "q_window_lag", "q_window_covar",
    "q_window_deriv", "q_window_median", "q_ntile", "q_asof",
    # ~1 session per event at sf100 (sparse per-user streams): a
    # 100M-row output — digest it, don't pandas it
    "q_sessionize",
]

FAILED: list[str] = []


def _report(log, name: str, ok: bool, msg: str, t0: float) -> None:
    status = "ok" if ok else "FAIL"
    if not ok:
        FAILED.append(name)
    line = f"{status:5s} {name:28s} {msg}  ({time.time()-t0:.1f}s)"
    print(line, flush=True)
    log.write(line + "\n")
    log.flush()


def digest_spark(df):
    """Per-bucket decimal digest of an arbitrary result DataFrame."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from mongo_olap_spark.functions.expressions import dsum

    key = next(f.name for f in df.schema.fields
               if isinstance(f.dataType, (T.LongType, T.IntegerType)))
    aggs = [F.count(F.lit(1)).alias("n")]
    for f in df.schema.fields:
        c, nm = F.col(f.name), f.name
        if isinstance(f.dataType, (T.LongType, T.IntegerType)):
            aggs.append(dsum(c.cast("double"), f"s_{nm}"))
        elif isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            # FLOOR(x*1e6), not ROUND(x,6): both engines hold
            # bitwise-identical doubles, so multiply+floor is
            # deterministic and portable, while ROUND diverges
            # (Spark HALF_UPs the shortest decimal repr, DuckDB
            # rounds the binary value — observed 1e-6 deltas on
            # q_window_deriv at sf0.01). NaN -> NULL on both sides;
            # c_{nm} pins the non-null count.
            fin = F.nanvl(c, F.lit(None).cast("double"))
            aggs.append(dsum(F.floor(fin * 1e6).cast("double"), f"s_{nm}"))
            aggs.append(F.count(fin).alias(f"c_{nm}"))
        elif isinstance(f.dataType, T.TimestampType):
            aggs.append(F.min(c).alias(f"lo_{nm}"))
            aggs.append(F.max(c).alias(f"hi_{nm}"))
        elif isinstance(f.dataType, T.StringType):
            aggs.append(F.min(c).alias(f"lo_{nm}"))
            aggs.append(F.max(c).alias(f"hi_{nm}"))
    return (df.groupBy(F.pmod(F.col(key), F.lit(101)).alias("g"))
            .agg(*aggs))


def digest_sql(oracle: str, schema) -> str:
    """DuckDB twin of :func:`digest_spark` over the SAME oracle SQL,
    driven by the SPARK schema so both digests agree column-for-
    column. dsum_sql routes decimal->varchar->double (the correctly-
    rounded path — see functions/expressions.py)."""
    from pyspark.sql import types as T

    from mongo_olap_spark.functions.expressions import dsum_sql

    key = next(f.name for f in schema.fields
               if isinstance(f.dataType, (T.LongType, T.IntegerType)))
    cols = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for f in schema.fields:
        nm = f.name
        if isinstance(f.dataType, (T.LongType, T.IntegerType)):
            cols.append(
                dsum_sql(f'CAST("{nm}" AS DOUBLE)') + f' AS s_{nm}')
        elif isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            fin = (f'CASE WHEN isnan("{nm}") THEN NULL '
                   f'ELSE "{nm}" END')
            cols.append(
                dsum_sql(f"FLOOR(({fin}) * 1000000.0)") + f" AS s_{nm}")
            cols.append(f"CAST(COUNT({fin}) AS BIGINT) AS c_{nm}")
        elif isinstance(f.dataType, T.TimestampType):
            cols.append(f'MIN("{nm}") AS lo_{nm}')
            cols.append(f'MAX("{nm}") AS hi_{nm}')
        elif isinstance(f.dataType, T.StringType):
            cols.append(f'MIN("{nm}") AS lo_{nm}')
            cols.append(f'MAX("{nm}") AS hi_{nm}')
    return (f"WITH __q AS ({oracle}) "
            f"SELECT CAST((\"{key}\" % 101 + 101) % 101 AS BIGINT) AS g, "
            + ", ".join(cols) + " FROM __q GROUP BY 1")


def run_phase_w(sf_dir: str, log) -> None:
    import __spark_entry__ as ent
    from check_oracle import compare, duck_conn  # type: ignore

    from mongo_olap_spark.session import get_spark

    spark = get_spark("sf100-probe", shuffle_partitions=64)
    con = duck_conn(sf_dir)
    qs, oracles = ent.queries(), ent.oracle_sql()
    for qid in PHASE_W:
        t0 = time.time()
        try:
            df = qs[qid](spark, sf_dir)
            sdf = digest_spark(df).toPandas()
            ddf = con.execute(digest_sql(oracles[qid], df.schema)).df()
            ok, msg = compare(qid, sdf, ddf)
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"error: {exc}"
        _report(log, f"digest:{qid}", ok,
                f"{msg} [101-bucket decimal digest of the full "
                f"result]" if ok else msg, t0)
    spark.stop()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    out = sys.argv[2] if len(sys.argv) > 2 else "SCALE_PROBE_SF100.txt"
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%FT%TZ")
    rc = 0
    with open(os.path.join(REPO, out), "w") as log:
        log.write(f"=== sf100 regime-sensitive probe @ {stamp} "
                  f"(data: {sf_dir}; 100M events / 600M lineitem / "
                  f"5M docs) ===\n\n")
        log.write(f"--- phase A: direct DuckDB oracle at FULL sf100 "
                  f"({len(PHASE_A)} routed/cube/IVM/window queries) ---\n")
        proc = subprocess.run(
            [sys.executable, "tools/check_oracle.py", sf_dir,
             ",".join(PHASE_A)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True)
        log.write(proc.stdout)
        log.flush()
        rc |= proc.returncode

        log.write(f"\n--- phase W: digest twins at FULL sf100 "
                  f"({len(PHASE_W)} O(N)-output window queries; both "
                  f"engines reduce the same result to per-bucket "
                  f"decimal digests) ---\n")
        run_phase_w(sf_dir, log)

        log.write("\n--- phase C: planted census + differential twins "
                  "at FULL sf100 (tools/planted_census.py) ---\n")
        proc = subprocess.run(
            [sys.executable, "tools/planted_census.py", sf_dir],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True)
        log.write(proc.stdout)
        rc |= proc.returncode

        if FAILED:
            rc |= 1
        log.write(f"\nrc={rc}\n")
    print(f"wrote {out} rc={rc}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
