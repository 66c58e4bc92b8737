"""Render the sf0.1 → sf1 per-query scaling table (round-9 verdict
task 2): reads two bench JSONs (same code, same day, both idle,
BENCH_REPEAT=3) and prints a markdown table sorted by scaling ratio,
flagging queries whose wall time grew more than FLAG_RATIO× across the
10× data decade. Sub-second queries are dominated by fixed per-query
overhead (session round trips, plan time), so the flag only fires
above MIN_SECONDS at sf1 — a 0.2 s → 0.9 s "4.5×" is overhead noise,
not a scaling problem.

Usage:
    python tools/scaling_table.py BENCH_self_r10.json BENCH_self_r10_sf1.json
"""

from __future__ import annotations

import json
import sys

FLAG_RATIO = 15.0   # >15x across a 10x decade = investigate (verdict r9)
MIN_SECONDS = 2.0   # ignore ratio noise below this sf1 wall time


def main() -> int:
    small, big = sys.argv[1], sys.argv[2]
    a = json.load(open(small))
    b = json.load(open(big))
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    rows = []
    for q in shared:
        ratio = qb[q] / qa[q] if qa[q] > 0 else float("inf")
        flag = ratio > FLAG_RATIO and qb[q] >= MIN_SECONDS
        rows.append((ratio, q, qa[q], qb[q], flag))
    rows.sort(reverse=True)
    print(f"| query | sf{a['sf']} s | sf{b['sf']} s | ratio | flag |")
    print("|---|---|---|---|---|")
    for ratio, q, ta, tb, flag in rows:
        print(f"| {q} | {ta:.2f} | {tb:.2f} | {ratio:.1f}x |"
              f" {'INVESTIGATE' if flag else ''} |")
    tot_a = sum(qa[q] for q in shared)
    tot_b = sum(qb[q] for q in shared)
    flagged = [q for r, q, _, _, f in rows if f]
    print(f"\ntotals over {len(shared)} shared queries: "
          f"{tot_a:.1f}s -> {tot_b:.1f}s = {tot_b / tot_a:.1f}x "
          f"across a 10x data decade; flagged: {flagged or 'none'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
