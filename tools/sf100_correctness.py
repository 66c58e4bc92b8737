"""FULL-manifest correctness at sf100 (r16, VERDICT r15 task 1).

The r15 probe (tools/sf100_probe.py) covered the 39 regime-sensitive
direct twins + 8 digest twins + the planted census; the other ~105
manifest queries had never run at sf100. Both prior scale-ups (sf10
r14, sf100-probe r15) caught silent exact-regime exits nothing
smaller could show, so this extends the r14 three-phase protocol to
EVERY registered query at /tmp/sf100 (100M events / 600M lineitem /
5M docs, ``synth_sf1.py --mult 1000 --seed 2026``), each by the
strongest affordable instrument, named in the transcript:

- **Phase A — direct DuckDB oracle at FULL sf100** (DIRECT): every
  query whose output stays pandas-sized at sf100 (≤ ~2M rows,
  measured at sf1 × 100) runs the ordinary driver-identical twin.
- **Phase W — decimal-digest twins at FULL sf100** (DIGEST): the
  O(N)-output queries. Both engines reduce the SAME result to a
  101-bucket digest — COUNT + exact decimal sums of every numeric
  column (floats via FLOOR(x·1e6): portable, never ROUND), min/max of
  strings/timestamps — bucketed on the first integer column (or an
  md5 of the first string column when a query emits no integer:
  engine-portable by construction). Equal digests pin the full
  result up to permutation within identical per-bucket multiset sums.
- **Phase B — stratum oracle** (HEAVY): the six queries whose twins
  are infeasible even as digests (ngram pair mass, 40M-pair range
  band) run the exact twin on a deterministic 1% keyspace stratum —
  sf1-equivalent sizes, the largest scale those twins are known
  feasible at. Full-scale behavior of the dedup family is then
  re-pinned by phase C.
- **Phase R — rows-only execution** (ROWS_ONLY): the 11 queries with
  no ANSI twin by documented design EXECUTE at full sf100 (count +
  wall time recorded); their correctness evidence is the documented
  envelope/property pytests plus, for the dedup family, phase C.
- **Phase C — planted census at FULL sf100**: per-pair text
  re-verification, planted+constructed recall floors, sequential
  union-find closure, independent simhash bander
  (tools/planted_census.py, unchanged).

Every query in the manifest must appear in exactly one category; a
query added to the manifest after this file's snapshot fails the run
loudly (rc=3) so an addendum run can cover it — no silent gaps.

Usage:
    python tools/sf100_correctness.py [sf100_dir] [out_txt] [--phase A|W|B|R|C ...]
        (defaults: /tmp/sf100  CORRECTNESS_r16_sf100.txt  all phases)
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

#: twins infeasible at sf100 even as digests (ngram pair mass / CC /
#: 40M-pair band output) — 1% stratum = sf1-equivalent (same list as
#: tools/sf10_correctness.py HEAVY, where the 10% stratum = sf1)
HEAVY = [
    "q_dedup_ngram", "q_dup_groups", "q_dedup_keep",
    "q_dedup_embedding", "q_pipeline_lookup_range",
    "q_split_leakage_safe",
]

#: (table, key column, modulus) — deterministic 1% keyspace strata;
#: customer uses %1000 because q_pipeline_lookup_range's own $match
#: keeps c_custkey%10==0 (composition yields the sf1-equivalent 15k)
STRATA = [
    ("documents", "doc_id", 100),
    ("embeddings", "vec_id", 100),
    ("customer", "c_custkey", 1000),
    ("orders", "o_orderkey", 100),
]

#: O(N)-output queries (sf1 output × 100 > ~2M rows): digest twins.
DIGEST = [
    "q_anomaly", "q_asof", "q_chunk", "q_collation_window",
    "q_dedup_exact", "q_dedup_spans", "q_explode", "q_filter",
    "q_fingerprint", "q_join_anti", "q_join_lookup", "q_join_semi",
    "q_lookup_both_arrays", "q_lookup_multikey", "q_mix_weights",
    "q_multimodal", "q_multimodal_decode", "q_multimodal_frames",
    "q_multimodal_resize", "q_ntile", "q_pack", "q_pipeline_array",
    "q_pipeline_dates", "q_pipeline_deriv", "q_pipeline_expr_agg",
    "q_pipeline_lookup", "q_pipeline_lookup_expr",
    "q_pipeline_lookup_topn", "q_pipeline_moving", "q_pipeline_redact",
    "q_pipeline_strings", "q_pipeline_timezones", "q_pipeline_window",
    "q_pipeline_window_fill", "q_project", "q_quality_filter",
    "q_quality_score", "q_redact", "q_repetition", "q_replace_root",
    "q_sessionize", "q_text_clean", "q_token_count", "q_union",
    "q_unigram_logprob", "q_window_covar", "q_window_deriv",
    "q_window_ema", "q_window_frame", "q_window_lag", "q_window_median",
]

#: no ANSI twin by documented design — execute at full scale
ROWS_ONLY = [
    "q_agg_approx", "q_bpe_vocab", "q_cube_distinct", "q_cube_quantile",
    "q_dedup_minhash", "q_dedup_simhash", "q_ivf_knn", "q_knn_lsh",
    "q_lang_id", "q_pack_bpe", "q_sliding_window",
    # r16 additions (BPE tail / token-space — layout pytests carry
    # correctness; the oracle-gated spine is q_pipeline_llm, direct)
    "q_pipeline_llm_pack", "q_chunk_bpe", "q_vocab_bpe",
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


def categorize() -> tuple[list[str], dict[str, list[str]]]:
    """Split the live manifest; returns (direct, categories) and the
    list of UNCATEGORIZED queries (manifest grew after this snapshot)."""
    import __spark_entry__ as ent

    qs, oracles = ent.queries(), ent.oracle_sql()
    cats = {"digest": DIGEST, "heavy": HEAVY, "rows_only": ROWS_ONLY}
    assigned = set(DIGEST) | set(HEAVY) | set(ROWS_ONLY)
    missing_oracle = [q for q in qs if q not in oracles
                      and q not in ROWS_ONLY and q not in HEAVY]
    direct = sorted(q for q in qs if q in oracles and q not in assigned)
    unknown = sorted((set(assigned) - set(qs)) | set(missing_oracle))
    return direct, {"direct": direct, **cats, "unknown": unknown}


def run_digests(sf_dir: str, log, only: list[str]) -> None:
    import __spark_entry__ as ent
    from check_oracle import compare, duck_conn  # type: ignore
    from sf100_probe import digest_spark, digest_sql  # type: ignore

    from mongo_olap_spark.session import get_spark

    spark = get_spark("sf100-gate", shuffle_partitions=64)
    con = duck_conn(sf_dir)
    qs, oracles = ent.queries(), ent.oracle_sql()
    for qid in only:
        t0 = time.time()
        try:
            df = qs[qid](spark, sf_dir)
            sdf = digest_spark(df).toPandas()
            ddf = con.execute(digest_sql(oracles[qid], df.schema)).df()
            ok, msg = compare(qid, sdf, ddf)
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"error: {exc}"
        _report(log, f"digest:{qid}", ok,
                f"{msg} [101-bucket decimal digest of the full result]"
                if ok else msg, t0)
    spark.stop()


def run_rows_only(sf_dir: str, log) -> None:
    import __spark_entry__ as ent

    from mongo_olap_spark.session import get_spark

    spark = get_spark("sf100-rowsonly", shuffle_partitions=64)
    qs = ent.queries()
    for qid in ROWS_ONLY:
        t0 = time.time()
        try:
            n = qs[qid](spark, sf_dir).count()
            ok, msg = True, (f"{n} rows executed at full sf100 "
                             f"[rows-only by design; envelope/property "
                             f"pytests + census carry correctness]")
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"error: {exc}"
        _report(log, f"exec:{qid}", ok, msg, t0)
    spark.stop()


def build_stratum(sf100: str, strat_dir: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    all_tables = ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split()
    os.makedirs(strat_dir, exist_ok=True)
    filtered = {t for t, _, _ in STRATA}
    for t, key, mod in STRATA:
        dst = os.path.join(strat_dir, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        f = pq.ParquetFile(os.path.join(sf100, f"{t}.parquet"))
        writer = None
        for batch in f.iter_batches(batch_size=1_000_000):
            tab = pa.Table.from_batches([batch])
            keys = tab.column(key).to_numpy(zero_copy_only=False)
            part = tab.filter(pa.array(np.mod(keys, mod) == 0))
            if writer is None:
                writer = pq.ParquetWriter(dst, part.schema)
            writer.write_table(part)
        if writer is not None:
            writer.close()
    for t in all_tables:
        if t in filtered:
            continue
        dst = os.path.join(strat_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(sf100, f"{t}.parquet"), dst)


def run_sub(cmd: list[str], log) -> int:
    proc = subprocess.run(cmd, cwd=REPO, stdout=subprocess.PIPE,
                          stderr=subprocess.DEVNULL, text=True)
    log.write(proc.stdout)
    log.flush()
    return proc.returncode


def main() -> int:
    args = [a for a in sys.argv[1:]]
    phases = {"A", "W", "B", "R", "C"}
    if "--phase" in args:
        i = args.index("--phase")
        phases = set(args[i + 1].replace(",", "").upper())
        del args[i:i + 2]
    sf_dir = args[0] if len(args) > 0 else "/tmp/sf100"
    out = args[1] if len(args) > 1 else "CORRECTNESS_r16_sf100.txt"
    strat_dir = sf_dir.rstrip("/") + "_strat"
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%FT%TZ")
    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          cwd=REPO, capture_output=True,
                          text=True).stdout.strip()
    direct, cats = categorize()
    rc = 0
    mode = "a" if len(phases) < 5 else "w"
    with open(os.path.join(REPO, out), mode) as log:
        log.write(f"=== sf100 FULL-MANIFEST correctness @ {stamp} "
                  f"HEAD {head} (data: {sf_dir}; 100M events / 600M "
                  f"lineitem / 5M docs) phases={sorted(phases)} ===\n")
        log.write(f"coverage: direct={len(cats['direct'])} "
                  f"digest={len(cats['digest'])} heavy(stratum)="
                  f"{len(cats['heavy'])} rows_only={len(cats['rows_only'])}"
                  f" uncategorized={len(cats['unknown'])}\n\n")
        if cats["unknown"]:
            log.write(f"UNCATEGORIZED (manifest changed after snapshot; "
                      f"needs an addendum run): {cats['unknown']}\n\n")
            rc |= 3

        if "A" in phases:
            log.write(f"--- phase A: direct DuckDB oracle at FULL sf100 "
                      f"({len(direct)} small-output queries) ---\n")
            rc |= run_sub([sys.executable, "tools/check_oracle.py",
                           sf_dir, ",".join(direct)], log)

        if "R" in phases:
            log.write(f"\n--- phase R: rows-only execution at FULL sf100 "
                      f"({len(ROWS_ONLY)} queries, no ANSI twin by "
                      f"design) ---\n")
            run_rows_only(sf_dir, log)

        if "B" in phases:
            log.write(f"\n--- phase B: stratum DuckDB oracle (1% keyspace "
                      f"strata = sf1-equivalent sizes) for {len(HEAVY)} "
                      f"heavy twins ---\n")
            t0 = time.time()
            build_stratum(sf_dir, strat_dir)
            log.write(f"(stratum build: {time.time()-t0:.0f}s)\n")
            rc |= run_sub([sys.executable, "tools/check_oracle.py",
                           strat_dir, ",".join(HEAVY)], log)

        if "W" in phases:
            log.write(f"\n--- phase W: digest twins at FULL sf100 "
                      f"({len(DIGEST)} O(N)-output queries) ---\n")
            run_digests(sf_dir, log, DIGEST)

        if "C" in phases:
            log.write("\n--- phase C: planted census + differential "
                      "twins at FULL sf100 (tools/planted_census.py) "
                      "---\n")
            rc |= run_sub([sys.executable, "tools/planted_census.py",
                           sf_dir], log)

        if FAILED:
            rc |= 1
        log.write(f"\nrc={rc}\n")
    print(f"wrote {out} rc={rc}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
