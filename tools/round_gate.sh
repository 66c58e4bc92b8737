#!/usr/bin/env bash
# End-of-round protocol gate (r9, r8-verdict task 2).
#
# Emits the three artifacts every round-end snapshot must carry, then
# prints a summary block to paste into the snapshot commit message:
#
#   CORRECTNESS_full_r{N}.txt   full oracle transcript at sf0.01 AND sf0.1
#   BENCH_self_r{N}.json        idle bench (BENCH_REPEAT=3)
#   PYTEST_r{N}.txt             full-suite tally on the final tree
#
# Run as the LAST action of the round, IDLE (no concurrent Spark work):
#   bash tools/round_gate.sh 9
#
# Exits nonzero if any gate fails — a failing gate must be fixed or
# explained in writing before the snapshot commit, never committed as
# a bare rc marker (r8 lesson).

set -u
N="${1:?usage: round_gate.sh <round-number>}"
cd "$(dirname "$0")/.."

fail=0

echo "=== round_gate r${N}: $(date -u +%FT%TZ) ===" | tee "CORRECTNESS_full_r${N}.txt"

echo "--- oracle @ sf0.01 ---" | tee -a "CORRECTNESS_full_r${N}.txt"
python tools/check_oracle.py /root/testdata/sf0.01 2>/dev/null \
    | tee -a "CORRECTNESS_full_r${N}.txt"
[ "${PIPESTATUS[0]}" -eq 0 ] || fail=1

echo "--- oracle @ sf0.1 ---" | tee -a "CORRECTNESS_full_r${N}.txt"
python tools/check_oracle.py /root/testdata/sf0.1 2>/dev/null \
    | tee -a "CORRECTNESS_full_r${N}.txt"
[ "${PIPESTATUS[0]}" -eq 0 ] || fail=1

echo "--- idle bench (BENCH_REPEAT=3) ---"
# keep the FULL per-query JSON line (bench prints it before the compact
# headline; tail -1 alone used to capture only the headline and lose
# the per-query detail the next round's drift attribution needs)
BENCH_REPEAT=3 python bench.py 2>/dev/null | grep '"queries"' | tail -1 \
    > "BENCH_self_r${N}.json" || fail=1
# r11 failure mode: the bench leg produced nothing and a 0-byte file
# was committed anyway. An empty artifact is a failed gate, full stop.
[ -s "BENCH_self_r${N}.json" ] || { echo "EMPTY BENCH_self_r${N}.json"; fail=1; }
python - <<PYEOF || fail=1
import json
d = json.load(open("BENCH_self_r${N}.json"))
print(json.dumps({"metric": "total", "value": d["value"], "unit": "sec",
                  "n_queries": len(d["queries"]), "sf": d["sf"]}))
PYEOF

echo "--- pytest (full suite, final tree) ---"
# `| tail` eats pytest's exit code, which is how r12's red test slipped
# past the gate — use pipefail-equivalent via PIPESTATUS and also grep
# the tally line for "failed"/"error" so a red suite fails the gate.
python -m pytest tests/ -q 2>&1 | tail -3 | tee "PYTEST_r${N}.txt"
[ "${PIPESTATUS[0]}" -eq 0 ] || { echo "PYTEST RED"; fail=1; }
[ -s "PYTEST_r${N}.txt" ] || { echo "EMPTY PYTEST_r${N}.txt"; fail=1; }
grep -qE '[0-9]+ (failed|error)' "PYTEST_r${N}.txt" && { echo "PYTEST RED"; fail=1; }

echo
echo "=== round_gate r${N} summary ==="
echo "sf0.01:  $(grep -o '[0-9]*/[0-9]* passed' "CORRECTNESS_full_r${N}.txt" | head -1)"
echo "sf0.1:   $(grep -o '[0-9]*/[0-9]* passed' "CORRECTNESS_full_r${N}.txt" | tail -1)"
echo "bench:   $(python - <<EOF
import json
try:
    d = json.load(open("BENCH_self_r${N}.json"))
    print(f"{d['value']}s total / {len(d.get('queries', {}))} queries (idle, repeat=3)")
except Exception as e:
    print(f"UNREADABLE: {e}")
EOF
)"
echo "pytest:  $(tail -1 "PYTEST_r${N}.txt")"
echo "gate rc: ${fail}"
exit "${fail}"
