"""Planted-truth census + differential twins at FULL scale (r14,
VERDICT r13 task 1).

The dedup family's DuckDB twins are infeasible at sf10 (the oracle
gate runs them on a 10% hash stratum — sf1-scale, known feasible).
This module closes the remaining gap AT FULL SCALE with checks that
do not need a SQL twin:

- the dedup queries construct their own duplicated corpus
  (``doc_id % 7`` exact copies at +1M, ``doc_id % 11`` 3-word-
  truncated near copies at +2M — queries/extensions.py) — constructed
  ground truth that must be found at ANY scale;
- the r14 synthesizer additionally records every planted duplication
  in ``planted_pairs.parquet`` (tools/synth_sf1.py);
- every OUTPUT pair's statistic is recomputed from the raw texts in
  plain Python sets — no Spark expressions, no engine code path —
  so full-scale precision is exact, not sampled;
- ``q_dup_groups`` / ``q_dedup_keep`` are re-derived with a
  sequential union-find over the verified pair list — a COMPLETE
  independent closure oracle (the engine runs distributed min-label
  propagation; agreement pins the whole fixpoint);
- ``q_dedup_simhash``'s banded+bucket-verified output is compared
  bit-for-bit against an INDEPENDENT numpy sort-based bander
  (complete for hamming ≤ 3 by the same pigeonhole theorem, zero
  shared code with the engine, O(n log n + candidates) instead of
  the first attempt's 4-hour O(n²) brute force — SCALE.md r14), and
  the census bander is itself cross-checked against a seeded
  16k-row FULL-quadratic brute force (signatures come from the
  engine's simhash64 column — the differential subject is the
  banding/shuffle machinery, which is what can break at scale; the
  hash itself is pinned by pytest at small scale).

Each check prints an ``ok``/``FAIL`` line in the oracle-transcript
format; exit code 1 on any failure.

Usage:
    python tools/planted_census.py [sf_dir]     # default /tmp/sf10
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow.parquet as pq

FAILED = []


def _report(name: str, ok: bool, msg: str, t0: float) -> None:
    status = "ok" if ok else "FAIL"
    if not ok:
        FAILED.append(name)
    print(f"{status:5s} {name:24s} {msg}  ({time.time()-t0:.1f}s)", flush=True)


def _trigrams(text: str) -> frozenset:
    toks = text.split(" ")
    if len(toks) < 3:
        return frozenset({text})
    return frozenset(" ".join(toks[i:i + 3]) for i in range(len(toks) - 2))


def _jaccard(a: frozenset, b: frozenset) -> float:
    isect = len(a & b)
    return isect / (len(a) + len(b) - isect)


def _load_docs(sf_dir: str):
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text", "source"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    srcs = t.column("source").to_pylist()
    return dict(zip(ids, texts)), dict(zip(ids, srcs))


def _dup_off(base_texts: dict) -> int:
    """The constructed-copy id offset — the SAME closed form the
    engine's corpus constructors use (queries/extensions._dup_offset):
    next power of 10 above max(doc_id), floored at the legacy 1M
    (r15: sf100's 5M base ids collided with the fixed +1M/+2M bands
    and every census truth aliased real documents)."""
    return max(1_000_000, 10 ** len(str(max(base_texts))))


def _planted(sf_dir: str):
    p = os.path.join(sf_dir, "planted_pairs.parquet")
    if not os.path.exists(p):
        return []
    t = pq.read_table(p)
    return list(zip(t.column("dup_id").to_pylist(),
                    t.column("orig_id").to_pylist(),
                    t.column("kind").to_pylist()))


def census_ngram(spark, sf_dir, base_texts, base_srcs):
    """q_dedup_ngram at full scale: per-pair precision + recall vs
    constructed (%7 copies) and synthesizer-planted truth."""
    import __spark_entry__ as ent

    t0 = time.time()
    out = ent.queries()["q_dedup_ngram"](spark, sf_dir).toPandas()
    pairs = {(int(a), int(b)): float(j)
             for a, b, j in zip(out["id_a"], out["id_b"], out["jaccard"])}

    # corpus text/source lookup incl. the +off exact copies
    off = _dup_off(base_texts)

    def text(i):
        return base_texts[i - off] if i >= off else base_texts[i]

    def src(i):
        return base_srcs[i - off] if i >= off else base_srcs[i]

    tri_cache: dict = {}

    def tri(i):
        if i not in tri_cache:
            tri_cache[i] = _trigrams(text(i))
        return tri_cache[i]

    # precision: EVERY output pair recomputed from raw text
    bad = sum(
        1 for (a, b), j in pairs.items()
        if src(a) != src(b) or abs(_jaccard(tri(a), tri(b)) - j) > 1e-9
        or j < 0.5
    )
    # recall 1: constructed exact copies (same source by construction)
    cons = [(d, d + off) for d in base_texts if d % 7 == 0]
    miss_c = sum(1 for p in cons
                 if p not in pairs or abs(pairs[p] - 1.0) > 1e-12)
    # recall 2: synthesizer-planted same-source pairs with true J>=0.5
    miss_p = n_p = 0
    for dup, orig, kind in _planted(sf_dir):
        if base_srcs[dup] != base_srcs[orig]:
            continue  # the query's semantics join within source
        a, b = (orig, dup) if orig < dup else (dup, orig)
        tj = _jaccard(tri(a), tri(b))
        if tj < 0.5:
            continue
        n_p += 1
        if (a, b) not in pairs or abs(pairs[(a, b)] - tj) > 1e-9:
            miss_p += 1
    ok = bad == 0 and miss_c == 0 and miss_p == 0
    _report("census:q_dedup_ngram", ok,
            f"{len(pairs)} pairs all text-verified; recall "
            f"{len(cons)}/{len(cons)} constructed + {n_p - miss_p}/{n_p} "
            f"planted" if ok else
            f"bad={bad} miss_constructed={miss_c} miss_planted={miss_p}",
            t0)
    return pairs


def census_groups(spark, sf_dir, pairs, base_texts):
    """q_dup_groups + q_dedup_keep: sequential union-find over the
    text-verified pair list == the engine's distributed min-label
    fixpoint — a complete independent closure oracle.

    NOTE: q_dup_groups runs over _full_dup_corpus (exact +1M copies
    AND near +2M truncations), so its edge set is the ngram pairs of
    THAT corpus — recomputed here the same way census_ngram verifies,
    then closed with union-find."""
    import __spark_entry__ as ent

    t0 = time.time()
    g_out = ent.queries()["q_dup_groups"](spark, sf_dir).toPandas()
    engine_group = dict(zip((int(x) for x in g_out["doc_id"]),
                            (int(x) for x in g_out["group_id"])))

    # re-derive the full corpus edge list: the groups query uses the
    # FULL dup corpus (+1M exact, +2M near) — run the engine's pair
    # stage and text-verify every edge before trusting it
    from mongo_olap_spark.queries.extensions import (
        _full_dup_corpus,
        _ngram_pairs,
    )

    e_out = _ngram_pairs(_full_dup_corpus(spark, sf_dir)).toPandas()

    off = _dup_off(base_texts)

    def text(i):
        if i >= 2 * off:
            toks = base_texts[i - 2 * off].split(" ")
            return " ".join(toks[:max(len(toks) - 3, 1)])
        if i >= off:
            return base_texts[i - off]
        return base_texts[i]

    tri_cache: dict = {}

    def tri(i):
        if i not in tri_cache:
            tri_cache[i] = _trigrams(text(i))
        return tri_cache[i]

    edges = []
    bad_e = 0
    for a, b, j in zip(e_out["id_a"], e_out["id_b"], e_out["jaccard"]):
        a, b = int(a), int(b)
        if abs(_jaccard(tri(a), tri(b)) - float(j)) > 1e-9:
            bad_e += 1
        edges.append((a, b))
    # recall of the constructed truth inside the full corpus: every %7
    # exact copy and every %11 truncation with J>=0.5 must be an edge
    eset = set(edges)
    miss = sum(1 for d in base_texts if d % 7 == 0
               and (d, d + off) not in eset)
    for d in base_texts:
        if d % 11 == 0:
            a, b = d, d + 2 * off
            if _jaccard(tri(a), tri(b)) >= 0.5 and (a, b) not in eset:
                miss += 1

    # sequential union-find (path compression + union by min label)
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = list(engine_group)
    expect = {n: find(n) for n in nodes}
    mismatch = sum(1 for n in nodes if expect[n] != engine_group[n])
    ok = bad_e == 0 and miss == 0 and mismatch == 0
    _report("census:q_dup_groups", ok,
            f"{len(nodes)} nodes, {len(edges)} text-verified edges; "
            f"union-find == engine fixpoint" if ok else
            f"bad_edges={bad_e} miss_truth={miss} group_mismatch={mismatch}",
            t0)

    # q_dedup_keep: survivor = longest text desc, then smallest id
    t0 = time.time()
    k_out = ent.queries()["q_dedup_keep"](spark, sf_dir).toPandas()
    from collections import defaultdict

    members = defaultdict(list)
    for n in nodes:
        members[expect[n]].append(n)
    exp_keep = {}
    for gid, ms in members.items():
        exp_keep[gid] = (min(ms, key=lambda i: (-len(text(i)), i)), len(ms))
    got = {int(g): (int(k), int(m))
           for g, k, m in zip(k_out["group_id"], k_out["keep_id"],
                              k_out["n_members"])}
    ok2 = got == exp_keep
    diffs = {g for g in set(got) | set(exp_keep)
             if got.get(g) != exp_keep.get(g)}
    _report("census:q_dedup_keep", ok2,
            f"{len(got)} groups, survivor rule re-derived" if ok2 else
            f"{len(diffs)} group(s) disagree, e.g. "
            f"{sorted(diffs)[:3]}", t0)


def census_minhash(spark, sf_dir, base_texts):
    """q_dedup_minhash: per-pair precision from raw texts + recall
    over constructed near pairs against the banding collision model
    p = 1 − (1 − J⁴)⁴ (16 hashes, 4 bands) with a 5σ floor."""
    import __spark_entry__ as ent

    t0 = time.time()
    out = ent.queries()["q_dedup_minhash"](spark, sf_dir).toPandas()
    pairs = {(int(a), int(b)): float(j)
             for a, b, j in zip(out["id_a"], out["id_b"], out["jaccard"])}

    off = _dup_off(base_texts)

    def text(i):
        if i >= 2 * off:
            toks = base_texts[i - 2 * off].split(" ")
            return " ".join(toks[:max(len(toks) - 3, 1)])
        return base_texts[i]

    tri_cache: dict = {}

    def tri(i):
        if i not in tri_cache:
            tri_cache[i] = _trigrams(text(i))
        return tri_cache[i]

    bad = sum(1 for (a, b), j in pairs.items()
              if abs(_jaccard(tri(a), tri(b)) - j) > 1e-9 or j < 0.5)
    # recall vs the constructed %11 near pairs, banding-model floor
    exp_p = []
    found = 0
    for d in base_texts:
        if d % 11 != 0:
            continue
        a, b = d, d + 2 * off
        tj = _jaccard(tri(a), tri(b))
        if tj < 0.5:
            continue
        p = 1.0 - (1.0 - tj ** 4) ** 4
        exp_p.append(p)
        if (a, b) in pairs:
            found += 1
    mean = sum(exp_p)
    sigma = max(sum(p * (1 - p) for p in exp_p), 1e-9) ** 0.5
    floor = mean - 5 * sigma
    ok = bad == 0 and found >= floor
    _report("census:q_dedup_minhash", ok,
            f"{len(pairs)} pairs text-verified; recall {found}/"
            f"{len(exp_p)} >= model floor {floor:.0f} "
            f"(E={mean:.0f}±{sigma:.0f})" if ok else
            f"bad={bad} found={found} floor={floor:.0f}", t0)


def census_simhash(spark, sf_dir):
    """q_dedup_simhash vs an INDEPENDENT single-process bander.

    r14 lesson (SCALE.md): the first phase-C attempt brute-forced ALL
    ~1.9e11 signature pairs — quadratic, ~4 h at sf10, and it would be
    400 h at the next decade. A full-scale census must itself carry the
    scale-safe shape. The pigeonhole theorem the engine relies on
    (hamming ≤ 3 over 64 bits ⇒ at least one of 4 disjoint 16-bit
    bands identical — 3 flipped bits cannot touch 4 disjoint bands) is
    mathematics, not code; what can break at scale is the engine's
    Spark-side banding/shuffle/in-bucket-verify machinery. So the
    census re-derives the complete pair set with:

    - an independent numpy SORT-based bander (argsort per band,
      group-boundary split, chunked XOR + SWAR popcount inside each
      group) — no Spark, no shared code with operators/dedup.py;
      cost O(n log n + candidate pairs), linear-ish in the corpus;
    - a seeded 16k-row FULL-quadratic brute force whose qualifying
      pairs must be exactly the census bander's pairs restricted to
      the sample — this validates the census bander itself (band
      extraction, triangle bookkeeping) with zero banding assumptions.

    The engine's ``sig`` column is the differential INPUT (the hash
    function is pinned bit-exact by pytest at small scale); the
    differential SUBJECT is everything downstream of it.
    """
    import __spark_entry__ as ent

    from mongo_olap_spark.operators.dedup import simhash_signatures
    from mongo_olap_spark.queries.extensions import _near_dup_corpus

    t0 = time.time()
    out = ent.queries()["q_dedup_simhash"](spark, sf_dir).toPandas()
    got = {(int(a), int(b)) for a, b in zip(out["id_a"], out["id_b"])}

    sig_pd = simhash_signatures(_near_dup_corpus(spark, sf_dir)).toPandas()
    ids = sig_pd[sig_pd.columns[0]].to_numpy(np.int64)
    sigs = sig_pd["sig"].to_numpy(np.int64).view(np.uint64)
    order = np.argsort(ids)
    ids, sigs = ids[order], sigs[order]
    n = len(ids)

    # SWAR popcount (numpy 1.x has no bitwise_count)
    c1 = np.uint64(0x5555555555555555)
    c2 = np.uint64(0x3333333333333333)
    c4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    cm = np.uint64(0x0101010101010101)

    def pop64(v):
        v = v - ((v >> np.uint64(1)) & c1)
        v = (v & c2) + ((v >> np.uint64(2)) & c2)
        v = (v + (v >> np.uint64(4))) & c4
        return (v * cm) >> np.uint64(56)

    # --- independent bander: 4 disjoint 16-bit bands, sort-grouped ---
    expect = set()
    cand_pairs = 0
    for band in range(4):
        key = ((sigs >> np.uint64(16 * band))
               & np.uint64(0xFFFF)).astype(np.uint32)
        korder = np.argsort(key, kind="stable")
        ks = key[korder]
        bounds = np.flatnonzero(
            np.concatenate(([True], ks[1:] != ks[:-1], [True])))
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = int(e - s)
            if m < 2:
                continue
            cand_pairs += m * (m - 1) // 2
            idx = korder[s:e]
            bsig = sigs[idx]
            for cs in range(0, m, 2048):
                ce = min(cs + 2048, m)
                ham = pop64(bsig[cs:ce, None] ^ bsig[None, cs:])
                sq = ce - cs
                ham[:, :sq][np.tril_indices(sq)] = 64
                rr, cc = np.nonzero(ham <= 3)
                for r, c in zip(rr, cc):
                    a = int(ids[idx[cs + r]])
                    b = int(ids[idx[cs + c]])
                    expect.add((a, b) if a < b else (b, a))

    ok = got == expect
    extra, miss = len(got - expect), len(expect - got)
    _report("census:q_dedup_simhash", ok,
            f"engine == independent bander over {n} sigs "
            f"({cand_pairs} candidates, {len(expect)} qualifying)"
            if ok else f"extra={extra} missing={miss}", t0)

    # --- brute-force cross-check of the census bander itself ---
    t0 = time.time()
    rng = np.random.default_rng(2026)
    take = min(16384, n)
    sel = np.sort(rng.choice(n, size=take, replace=False))
    s_ids, s_sigs = ids[sel], sigs[sel]
    brute = set()
    for cs in range(0, take, 2048):
        ce = min(cs + 2048, take)
        ham = pop64(s_sigs[cs:ce, None] ^ s_sigs[None, cs:])
        sq = ce - cs
        ham[:, :sq][np.tril_indices(sq)] = 64
        rr, cc = np.nonzero(ham <= 3)
        for r, c in zip(rr, cc):
            a = int(s_ids[cs + r])
            b = int(s_ids[cs + c])
            brute.add((a, b) if a < b else (b, a))
    in_sample = set(s_ids.tolist())
    banded_sub = {(a, b) for a, b in expect
                  if a in in_sample and b in in_sample}
    ok2 = brute == banded_sub
    _report("census:simhash_brute_xcheck", ok2,
            f"bander == full quadratic on {take}-row sample "
            f"({len(brute)} pairs)" if ok2 else
            f"brute={len(brute)} banded_sub={len(banded_sub)} "
            f"sym_diff={len(brute ^ banded_sub)}", t0)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    from mongo_olap_spark.session import get_spark

    spark = get_spark("planted-census", shuffle_partitions=32)
    base_texts, base_srcs = _load_docs(sf_dir)
    pairs = census_ngram(spark, sf_dir, base_texts, base_srcs)
    census_groups(spark, sf_dir, pairs, base_texts)
    census_minhash(spark, sf_dir, base_texts)
    census_simhash(spark, sf_dir)
    n_ok = 6 - len(FAILED)
    print(f"\n{n_ok}/6 census checks passed")
    return 1 if FAILED else 0


if __name__ == "__main__":
    sys.exit(main())
