"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet, then compares row count, schema
(column names), and order-insensitive values (exact for
ints/strings/timestamps; exact-by-default for floats with the max
absolute delta reported, since the engine's decimal-sum policy is
supposed to make aggregates bit-identical).

Usage: python tools/check_oracle.py [sf_dir] [q_filter ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# filters: space- or comma-separated query ids; `--only` accepted as a
# no-op token (round-6: a misspelled filter used to match nothing and
# still print "115/115 passed" — unknown names now refuse loudly)
ONLY: set[str] = set()
EXCLUDE: set[str] = set()
_args = list(sys.argv[2:])
while "--exclude" in _args:
    i = _args.index("--exclude")
    EXCLUDE.update(_args[i + 1].replace(",", " ").split())
    del _args[i:i + 2]
for _a in _args:
    ONLY.update(x for x in _a.replace(",", " ").split() if x != "--only")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> tuple[bool, str]:
    if len(sdf) != len(ddf):
        return False, f"row count spark={len(sdf)} duck={len(ddf)}"
    if sorted(sdf.columns) != sorted(ddf.columns):
        return False, f"columns spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
    s, d = normalize(sdf), normalize(ddf)
    max_delta = 0.0
    for c in s.columns:
        sc, dc = s[c], d[c]
        if sc.dtype.kind == "f" or dc.dtype.kind == "f":
            sn, dn = sc.astype(float), dc.astype(float)
            both_nan = sn.isna() & dn.isna()
            diff = (sn - dn).abs()
            diff[both_nan] = 0.0
            if diff.isna().any():
                return False, f"col {c}: NaN mismatch"
            md = float(diff.max()) if len(diff) else 0.0
            max_delta = max(max_delta, md)
            if md != 0.0 and md > 1e-9 * max(1.0, float(dn.abs().max())):
                return False, f"col {c}: max |Δ|={md}"
        else:
            eq = (sc.astype(object).where(~sc.isna(), None).reset_index(drop=True)
                  == dc.astype(object).where(~dc.isna(), None).reset_index(drop=True))
            nulls = sc.isna().reset_index(drop=True) & dc.isna().reset_index(drop=True)
            if not bool((eq | nulls).all()):
                bad = (~(eq | nulls)).idxmax()
                return False, f"col {c}: first mismatch row {bad}: spark={sc.iloc[bad]!r} duck={dc.iloc[bad]!r}"
    tag = "exact" if max_delta == 0.0 else f"max|Δ|={max_delta:.2e}"
    return True, f"{len(sdf)} rows, {tag}"


def main():
    import __spark_entry__ as ent
    from mongo_olap_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duck_conn(SF_DIR)
    qs, oracles = ent.queries(), ent.oracle_sql()
    if ONLY:
        unknown = ONLY - set(qs)
        if unknown:
            print(f"unknown query filter(s): {sorted(unknown)}")
            sys.exit(2)
    if EXCLUDE:
        unknown = EXCLUDE - set(qs)
        if unknown:
            print(f"unknown --exclude filter(s): {sorted(unknown)}")
            sys.exit(2)
    selected = {k: v for k, v in qs.items()
                if (not ONLY or k in ONLY) and k not in EXCLUDE}
    failures = []
    for qid, fn in sorted(selected.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(qid)
            print(f"FAIL  {qid:24s} spark error: {exc}")
            continue
        if qid not in oracles:
            print(f"skip  {qid:24s} rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[qid]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(qid)
            print(f"FAIL  {qid:24s} duckdb error: {exc}")
            continue
        ok, msg = compare(qid, sdf, ddf)
        status = "ok" if ok else "FAIL"
        if not ok:
            failures.append(qid)
        print(f"{status:5s} {qid:24s} {msg}  ({time.time()-t0:.1f}s)")
    tag = f" (filtered from {len(qs)})" if ONLY or EXCLUDE else ""
    print(f"\n{len(selected) - len(failures)}/{len(selected)} passed{tag}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
