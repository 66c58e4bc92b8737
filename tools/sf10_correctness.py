"""Full-manifest correctness at sf10 (r14, VERDICT r13 task 1).

r13 stopped at a 30-query sf10 subset because the DuckDB twins of the
dedup family are infeasible at 500k docs. This orchestrator closes
the gap: EVERY registered query gets a hard check at sf10, each by
the strongest affordable instrument, with the instrument named in the
transcript:

- **Phase A — full oracle**: every query except the five heavy ones
  runs the ordinary DuckDB twin at full sf10
  (``check_oracle.py /tmp/sf10 --exclude …``).
- **Phase B — stratum oracle**: the five heavy queries run the SAME
  DuckDB twin on a 10% hash stratum (documents doc_id%10,
  embeddings vec_id%10, customer c_custkey%100 ∘ the query's own %10
  match, orders o_orderkey%10 — sf1-equivalent row counts, the
  largest scale the twins are known feasible at). Both engines read
  the same filtered parquet, so the check is exact, just on a
  deterministic 10% of the keyspace.
- **Phase C — planted census at FULL sf10** (tools/planted_census.py):
  the stratum leaves full-scale behavior of the dedup family
  unchecked; the census closes that with per-pair text
  re-verification (full-output precision), constructed+planted truth
  recall, a sequential union-find closure oracle for the group
  queries, and a numpy brute force equality for simhash — all at the
  complete 500k-doc corpus.

Usage:
    python tools/sf10_correctness.py [sf10_dir] [out_txt]
        (defaults: /tmp/sf10  CORRECTNESS_r14_sf10.txt)
"""

from __future__ import annotations

import datetime
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: queries whose DuckDB twin is infeasible at full sf10 — each gets
#: the stratum oracle (phase B) and, for the dedup family, the
#: full-scale census (phase C)
HEAVY = [
    "q_dedup_ngram", "q_dup_groups", "q_dedup_keep",
    "q_dedup_embedding", "q_pipeline_lookup_range",
    "q_split_leakage_safe",  # r14: rides the same ngram pair mass
]

#: (table, key column, modulus) — 10% deterministic keyspace strata;
#: customer uses %100 because q_pipeline_lookup_range's own $match
#: keeps c_custkey%10==0, so %100 yields the sf1-equivalent 15k
STRATA = [
    ("documents", "doc_id", 10),
    ("embeddings", "vec_id", 10),
    ("customer", "c_custkey", 100),
    ("orders", "o_orderkey", 10),
]

ALL_TABLES = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()


def build_stratum(sf10: str, strat_dir: str) -> None:
    os.makedirs(strat_dir, exist_ok=True)
    filtered = {t for t, _, _ in STRATA}
    for t, key, mod in STRATA:
        tab = pq.read_table(os.path.join(sf10, f"{t}.parquet"))
        # numpy modulo: pyarrow.compute has no mod kernel in this
        # version; a numpy mask keeps the pyarrow writer (and so the
        # exact source schema) either way
        keys = tab.column(key).to_numpy(zero_copy_only=False)
        mask = pa.array(np.mod(keys, mod) == 0)
        pq.write_table(tab.filter(mask),
                       os.path.join(strat_dir, f"{t}.parquet"))
    for t in ALL_TABLES:
        if t in filtered:
            continue
        dst = os.path.join(strat_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(sf10, f"{t}.parquet"), dst)


def run(cmd: list[str], log) -> int:
    proc = subprocess.run(cmd, cwd=REPO, stdout=subprocess.PIPE,
                          stderr=subprocess.DEVNULL, text=True)
    log.write(proc.stdout)
    log.flush()
    return proc.returncode


def main() -> int:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    out = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_r14_sf10.txt"
    strat_dir = sf10.rstrip("/") + "_strat"
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%FT%TZ")
    rc = 0
    with open(os.path.join(REPO, out), "w") as log:
        log.write(f"=== sf10 FULL-MANIFEST correctness @ {stamp} "
                  f"(data: {sf10}) ===\n\n")
        log.write("--- phase A: full DuckDB oracle at sf10 "
                  f"(all queries except {len(HEAVY)} heavy twins) ---\n")
        rc |= run([sys.executable, "tools/check_oracle.py", sf10,
                   "--exclude", ",".join(HEAVY)], log)

        log.write("\n--- phase B: stratum DuckDB oracle (10% keyspace "
                  "strata; sf1-equivalent sizes — the largest scale "
                  "these twins are feasible at) ---\n")
        build_stratum(sf10, strat_dir)
        rc |= run([sys.executable, "tools/check_oracle.py", strat_dir,
                   ",".join(HEAVY)], log)

        log.write("\n--- phase C: planted census + differential twins "
                  "at FULL sf10 (tools/planted_census.py) ---\n")
        rc |= run([sys.executable, "tools/planted_census.py", sf10], log)

        log.write(f"\nrc={rc}\n")
    print(f"wrote {out} rc={rc}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
