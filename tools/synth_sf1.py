"""Seeded sf1 synthesizer (round-9 task 1 — the last unmeasured decade).

The driver ships sf0.001/sf0.01/sf0.1 only (`TESTDATA.md`); the r7/r8
"oracle at sf1" task needs a 10x-sf0.1 dataset that (a) has the EXACT
parquet schemas of the driver tables (verified against the sf0.1
footers) and (b) mimics their value domains closely enough that every
declared query returns non-trivial results. The oracle gate itself is
self-consistent — Spark and DuckDB read the SAME parquet — so the
generator does not need to reproduce the driver's RNG, only its
shapes:

- region/nation: copied verbatim from the source sf dir (fixed dims).
- supplier/customer/part: 10x keys, same name formats
  (``Supplier#%09d``), same category sets (mktsegments, Brand#1..25,
  p_type, adjective+noun p_name vocabulary), same value ranges.
- orders/lineitem: 10x; lines-per-order via uniform random orderkey
  assignment (matches the observed ~Poisson(4) profile with ~2% of
  orders empty), date-normalized timestamps over the same spans,
  same discount/tax grids.
- events: event_id-ordered ascending timestamps over 2024-01-01..30,
  same event_type set, Exp(50) values, ``{"k": N}`` props.
- documents: word-soup text drawn from the sf0.1 vocabulary
  (extracted at run time, not hardcoded), 10..100 words/doc, same
  lang/source sets and weights, ~0.3% planted exact-dup texts plus
  ~0.2% near-dups (one word substituted) so the dedup operators have
  structure to find.
- embeddings: unit-norm float32[64] gaussian directions (the sf0.1
  vectors are isotropic — intra-label cosine ~= inter-label ~= 0),
  uniform label 0..9.

Everything is driven by one ``numpy.random.default_rng(seed)``;
identical invocations produce byte-identical parquet. Large tables
stream out in chunks through ``pyarrow.parquet.ParquetWriter`` so the
generator stays under a few GiB of RSS at any multiplier.

Usage:
    python tools/synth_sf1.py [out_dir] [--mult M] [--seed S] [--src DIR]

Defaults: out_dir=/tmp/sf1, mult=10 (10x sf0.1 = "sf1"), seed=2026,
src=/root/testdata/sf0.1.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC_DEFAULT = "/root/testdata/sf0.1"

MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJ = ["new", "blue", "old", "cold", "small", "large", "hot", "red"]
P_NOUN = ["gizmo", "widget", "anvil", "bolt", "plate", "rod", "ring", "gear"]
ORDERSTATUS = ["O", "F", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUS = ["O", "F"]
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.145, 0.145]

DAY_US = 86_400_000_000  # microseconds per day


def _dates_us(rng, n, lo: str, hi: str) -> np.ndarray:
    """Date-normalized timestamp[us] values uniform over [lo, hi]."""
    lo_d = np.datetime64(lo, "D").astype("int64")
    hi_d = np.datetime64(hi, "D").astype("int64")
    days = rng.integers(lo_d, hi_d + 1, n)
    return days * DAY_US


def _write(out_dir, name, schema, cols):
    t = pa.Table.from_arrays([pa.array(c, type=f.type) for c, f in zip(cols, schema)], schema=schema)
    pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
    return len(t)


def synth(out_dir: str, mult: float, seed: int, src: str) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    counts = {}
    t0 = time.time()

    # --- fixed dims: copy verbatim ---
    for name in ("region", "nation"):
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
        counts[name] = len(t)

    n_supp = int(1000 * mult)
    n_cust = int(15000 * mult)
    n_part = int(20000 * mult)
    n_orders = int(150000 * mult)
    n_lines = int(600000 * mult)
    n_events = int(100000 * mult)
    n_docs = int(5000 * mult)
    n_vecs = int(2000 * mult)

    # --- supplier ---
    schema = pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                        ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())])
    counts["supplier"] = _write(out_dir, "supplier", schema, [
        np.arange(n_supp, dtype=np.int64),
        [f"Supplier#{i:09d}" for i in range(n_supp)],
        rng.integers(0, 25, n_supp).astype(np.int32),
        np.round(rng.uniform(-1000, 10000, n_supp), 2),
    ])

    # --- customer ---
    schema = pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                        ("c_mktsegment", pa.string())])
    counts["customer"] = _write(out_dir, "customer", schema, [
        np.arange(n_cust, dtype=np.int64),
        [f"Customer#{i:09d}" for i in range(n_cust)],
        rng.integers(0, 25, n_cust).astype(np.int32),
        np.round(rng.uniform(-1000, 10000, n_cust), 2),
        [MKTSEGMENTS[i] for i in rng.integers(0, len(MKTSEGMENTS), n_cust)],
    ])

    # --- part ---
    schema = pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                        ("p_brand", pa.string()), ("p_type", pa.string()),
                        ("p_size", pa.int32()), ("p_retailprice", pa.float64())])
    adj = rng.integers(0, len(P_ADJ), n_part)
    noun = rng.integers(0, len(P_NOUN), n_part)
    counts["part"] = _write(out_dir, "part", schema, [
        np.arange(n_part, dtype=np.int64),
        [f"{P_ADJ[a]} {P_NOUN[b]}" for a, b in zip(adj, noun)],
        [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        [P_TYPES[i] for i in rng.integers(0, len(P_TYPES), n_part)],
        rng.integers(1, 51, n_part).astype(np.int32),
        np.round(900.0 + (np.arange(n_part) % 1000) * 0.1, 2),
    ])

    # --- orders ---
    schema = pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                        ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
                        ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string())])
    if mult <= 100:
        # monolithic path — byte-identical to every committed sf1/sf10
        # transcript; do not change the draw order here
        counts["orders"] = _write(out_dir, "orders", schema, [
            np.arange(n_orders, dtype=np.int64),
            rng.integers(0, n_cust, n_orders),
            [ORDERSTATUS[i] for i in rng.integers(0, 3, n_orders)],
            np.round(rng.uniform(1000, 500000, n_orders), 2),
            _dates_us(rng, n_orders, "1995-01-01", "2001-08-01"),
            [PRIORITIES[i] for i in rng.integers(0, 5, n_orders)],
        ])
    else:
        # r15 sf100 path: 150M rows do not fit as python string lists —
        # stream in chunks through ParquetWriter with vectorized string
        # pools (same value domains; chunked draw order differs from
        # the monolithic path, which only matters for NEW multipliers)
        status_pool = np.array(ORDERSTATUS)
        prio_pool = np.array(PRIORITIES)
        with pq.ParquetWriter(os.path.join(out_dir, "orders.parquet"), schema) as w:
            done = 0
            while done < n_orders:
                n = min(5_000_000, n_orders - done)
                cols = [
                    np.arange(done, done + n, dtype=np.int64),
                    rng.integers(0, n_cust, n),
                    status_pool[rng.integers(0, 3, n)],
                    np.round(rng.uniform(1000, 500000, n), 2),
                    _dates_us(rng, n, "1995-01-01", "2001-08-01"),
                    prio_pool[rng.integers(0, 5, n)],
                ]
                w.write_table(pa.Table.from_arrays(
                    [pa.array(c, type=f.type) for c, f in zip(cols, schema)],
                    schema=schema))
                done += n
        counts["orders"] = n_orders

    # --- lineitem (chunked) ---
    schema = pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
                        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
                        ("l_shipdate", pa.timestamp("us"))])
    chunk = 1_000_000
    with pq.ParquetWriter(os.path.join(out_dir, "lineitem.parquet"), schema) as w:
        done = 0
        while done < n_lines:
            n = min(chunk, n_lines - done)
            cols = [
                rng.integers(0, n_orders, n),
                rng.integers(0, n_part, n),
                rng.integers(0, n_supp, n),
                rng.integers(1, 8, n).astype(np.int32),
                rng.integers(1, 51, n).astype(np.float64),
                np.round(rng.uniform(900, 105000, n), 2),
                np.round(rng.integers(0, 11, n) * 0.01, 2),
                np.round(rng.integers(0, 9, n) * 0.01, 2),
                [RETURNFLAGS[i] for i in rng.integers(0, 3, n)],
                [LINESTATUS[i] for i in rng.integers(0, 2, n)],
                _dates_us(rng, n, "1995-01-02", "2001-11-04"),
            ]
            w.write_table(pa.Table.from_arrays(
                [pa.array(c, type=f.type) for c, f in zip(cols, schema)], schema=schema))
            done += n
    counts["lineitem"] = n_lines

    # --- events (ts ascending by event_id, matching the driver tables) ---
    schema = pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                        ("user_id", pa.int64()), ("event_type", pa.string()),
                        ("value", pa.float64()), ("props", pa.string())])
    t_lo = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    t_hi = np.datetime64("2024-01-31T00:00:00", "us").astype("int64")
    ts = np.sort(rng.integers(t_lo, t_hi, n_events))
    if mult <= 100:
        # monolithic path — byte-identical to committed sf1/sf10
        counts["events"] = _write(out_dir, "events", schema, [
            np.arange(n_events, dtype=np.int64),
            ts,
            rng.integers(0, int(1500 * mult), n_events),
            [EVENT_TYPES[i] for i in rng.integers(0, 5, n_events)],
            np.round(rng.exponential(50.0, n_events), 2),
            [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_events)],
        ])
    else:
        # r15 sf100 path: 100M rows, chunked; props built with
        # np.char so no per-row python json.dumps (same '{"k": N}'
        # wire format — json.dumps({"k": 5}) == '{"k": 5}')
        etype_pool = np.array(EVENT_TYPES)
        with pq.ParquetWriter(os.path.join(out_dir, "events.parquet"), schema) as w:
            done = 0
            while done < n_events:
                n = min(5_000_000, n_events - done)
                ks = rng.integers(0, 100, n)
                cols = [
                    np.arange(done, done + n, dtype=np.int64),
                    ts[done:done + n],
                    rng.integers(0, int(1500 * mult), n),
                    etype_pool[rng.integers(0, 5, n)],
                    np.round(rng.exponential(50.0, n), 2),
                    np.char.add(np.char.add('{"k": ', ks.astype("U3")), "}"),
                ]
                w.write_table(pa.Table.from_arrays(
                    [pa.array(c, type=f.type) for c, f in zip(cols, schema)],
                    schema=schema))
                done += n
        counts["events"] = n_events

    # --- documents (vocab extracted from the source sf dir) ---
    #
    # r14 (VERDICT r13 task 2 — Heaps-law realism): the driver's
    # documents table carries a FIXED 31-word vocabulary, so scaling
    # the corpus at fixed vocab inflates every word's df linearly and
    # the exact-Jaccard candidate mass Σdf² quadratically — an
    # adversarial density no real corpus exhibits. Real text grows
    # vocabulary with corpus size (Heaps' law, V ∝ n^β, β≈0.5), which
    # is what keeps posting lists sub-linear. The synthesizer now
    # grows the vocabulary as V = V0·mult^0.5 (V0 = the source vocab;
    # mult=1 reproduces the old fixed-vocab shape exactly), extending
    # with deterministic pseudo-words, so sf1→sf10 df growth matches
    # real-text scaling and the decade probe measures the engine, not
    # the synthesizer's density artifact.
    src_docs = pq.read_table(os.path.join(src, "documents.parquet"), columns=["text"])
    vocab = sorted({w for t in src_docs.column("text").to_pylist()[:2000] for w in t.split(" ")})
    v_target = max(len(vocab), int(round(len(vocab) * (mult ** 0.5))))
    syll = ["ba", "ce", "di", "fo", "gu", "ka", "le", "mi", "no", "pu",
            "ra", "se", "ti", "vo", "wu", "za"]
    seen_w = set(vocab)
    while len(vocab) < v_target:
        w = "".join(syll[j] for j in rng.integers(0, len(syll), 4))
        if w not in seen_w:
            seen_w.add(w)
            vocab.append(w)
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string()), ("source", pa.string()), ("n_chars", pa.int64())])
    lens = rng.integers(10, 101, n_docs)
    texts: list[str] = []
    # planted-truth manifest (r14, VERDICT r13 task 1): every planted
    # duplication is RECORDED (dup_id, orig_id, kind) so full-scale
    # correctness can assert recall against ground truth where the
    # DuckDB twin is infeasible — see tools/planted_census.py
    planted: list[tuple[int, int, str]] = []
    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < 0.003:  # exact dup of an earlier doc
            j = int(rng.integers(0, i))
            texts.append(texts[j])
            planted.append((i, j, "exact"))
        elif i > 10 and r < 0.005:  # near dup: one word substituted
            j = int(rng.integers(0, i))
            words = texts[j].split(" ")
            words[int(rng.integers(0, len(words)))] = vocab[int(rng.integers(0, len(vocab)))]
            texts.append(" ".join(words))
            planted.append((i, j, "near"))
        else:
            idx = rng.integers(0, len(vocab), lens[i])
            texts.append(" ".join(vocab[j] for j in idx))
    counts["documents"] = _write(out_dir, "documents", schema, [
        np.arange(n_docs, dtype=np.int64),
        texts,
        [LANGS[i] for i in rng.choice(len(LANGS), n_docs, p=LANG_W)],
        [f"src{i}" for i in rng.integers(0, 20, n_docs)],
        np.array([len(t) for t in texts], dtype=np.int64),
    ])
    plant_schema = pa.schema([("dup_id", pa.int64()), ("orig_id", pa.int64()),
                              ("kind", pa.string())])
    counts["planted_pairs"] = _write(out_dir, "planted_pairs", plant_schema, [
        np.array([p[0] for p in planted], dtype=np.int64),
        np.array([p[1] for p in planted], dtype=np.int64),
        [p[2] for p in planted],
    ])

    # --- embeddings ---
    schema = pa.schema([("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
                        ("label", pa.int32())])
    E = rng.standard_normal((n_vecs, 64))
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    counts["embeddings"] = _write(out_dir, "embeddings", schema, [
        np.arange(n_vecs, dtype=np.int64),
        list(E.astype(np.float32)),
        rng.integers(0, 10, n_vecs).astype(np.int32),
    ])

    counts["elapsed_sec"] = round(time.time() - t0, 1)
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="/tmp/sf1")
    ap.add_argument("--mult", type=float, default=10.0,
                    help="row multiplier relative to sf0.1 (10 => sf1)")
    ap.add_argument("--seed", type=int, default=2026)
    ap.add_argument("--src", default=SRC_DEFAULT)
    args = ap.parse_args()
    counts = synth(args.out_dir, args.mult, args.seed, args.src)
    print(json.dumps({"out_dir": args.out_dir, "mult": args.mult, "seed": args.seed, **counts}))


if __name__ == "__main__":
    sys.exit(main())
