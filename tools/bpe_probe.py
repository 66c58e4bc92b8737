"""BPE production-shape probe (r16, VERDICT r15 task 2).

Two questions the r15 demonstration-scale evidence (n_merges=100)
left open, each answered with a measurement, not an assertion:

1. **Trainer at a production operating point** — ≥32k merges over
   ≥1M distinct words. r15's selection was an O(|pairs|) dict scan
   per merge (plausibly driver-hours at this point); r16 moved it to
   a lazy-delete heap. This probe times the real train and ALSO
   times the counterfactual: one full min()-scan over the live pair
   dict, multiplied by the merge count, which is what the r15 code
   would have spent on selection alone.
2. **Encode cache across Arrow batches** — r15's word cache lived
   inside the pandas_udf body and reset per ~10k-row batch; r16
   hoisted it to module (worker-process) scope. The probe encodes a
   multi-batch corpus and reads the measured hit rate off the
   worker-side counters (operators/bpe.encode_cache_stats).

The synthetic vocabulary is deterministic (seeded generator,
syllable-composed words, Zipf counts) so the probe is reproducible;
it exercises exactly the trainer's input contract — a (word, count)
list — which is what the distributed corpus pass produces at any
scale (Heaps-law bounded).

Usage:
    python tools/bpe_probe.py [n_words] [n_merges] [out_json]
        (defaults: 1_200_000  32_768  SCALE_PROBE_BPE.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SYLLABLES = [
    "ba", "be", "bi", "bo", "bu", "ca", "ce", "ci", "co", "cu",
    "da", "de", "di", "do", "du", "fa", "fe", "fi", "fo", "fu",
    "ga", "ge", "gi", "go", "gu", "ka", "ke", "ki", "ko", "ku",
    "la", "le", "li", "lo", "lu", "ma", "me", "mi", "mo", "mu",
    "na", "ne", "ni", "no", "nu", "pa", "pe", "pi", "po", "pu",
    "ra", "re", "ri", "ro", "ru", "sa", "se", "si", "so", "su",
    "ta", "te", "ti", "to", "tu", "va", "ve", "vi", "vo", "vu",
    "an", "en", "in", "on", "un", "ar", "er", "ir", "or", "ur",
    "st", "th", "ch", "sh", "ng", "ly", "ed", "es", "tion", "ment",
]


def synth_vocab(n_words: int, seed: int = 2026) -> list[tuple[str, int]]:
    """Deterministic (word, count) table: syllable-composed words
    (so adjacent-pair structure is real, not uniform noise) with
    Zipf-1.0 counts over the rank order."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n_syl = rng.integers(2, 6, size=n_words)
    picks = rng.integers(0, len(SYLLABLES), size=int(n_syl.sum()))
    words: list[str] = []
    seen: set[str] = set()
    pos = 0
    i = 0
    while len(words) < n_words:
        if i >= len(n_syl):
            # rare collision overflow: extend deterministically
            n_syl = rng.integers(2, 6, size=n_words // 10 + 16)
            picks = rng.integers(0, len(SYLLABLES),
                                 size=int(n_syl.sum()))
            pos, i = 0, 0
        k = int(n_syl[i])
        w = "".join(SYLLABLES[j] for j in picks[pos:pos + k])
        pos += k
        i += 1
        if w in seen:
            w = f"{w}{len(words) % 97}"  # deterministic de-collision
            if w in seen:
                continue
        seen.add(w)
        words.append(w)
    # Zipf: count of rank r (1-based) = ceil(C / r); C sized so the
    # tail still clears min_count=2
    C = 3 * n_words
    return [(w, max(2, C // (r + 1))) for r, w in enumerate(words)]


def probe_trainer(n_words: int, n_merges: int) -> dict:
    from mongo_olap_spark.operators.bpe import train_bpe

    t0 = time.time()
    vocab_in = synth_vocab(n_words)
    synth_s = time.time() - t0
    print(f"synth: {n_words} words in {synth_s:.1f}s", flush=True)

    t0 = time.time()
    vocab = train_bpe(vocab_in, n_merges=n_merges, min_count=2)
    train_s = time.time() - t0
    got = len(vocab.merges)
    print(f"train: {got} merges in {train_s:.1f}s "
          f"({got / train_s:.1f} merges/s)", flush=True)

    # r15 counterfactual, measured not estimated: the SAME accounting
    # structure with min()-scan selection (the r15 implementation's
    # shape), run head-to-head at a reduced merge count. Doubles as an
    # independent determinism cross-check — both must learn the
    # IDENTICAL merge list.
    cmp_merges = min(2048, n_merges)
    t0 = time.time()
    heap_small = train_bpe(vocab_in, n_merges=cmp_merges, min_count=2)
    heap_small_s = time.time() - t0
    t0 = time.time()
    scan_small, live_pairs = _train_bpe_minscan(vocab_in, cmp_merges)
    scan_small_s = time.time() - t0
    assert heap_small.merges == scan_small, (
        "heap selection diverged from the min()-scan reference")
    speedup = scan_small_s / heap_small_s if heap_small_s else None
    return {
        "n_words": n_words,
        "n_merges_requested": n_merges,
        "n_merges_learned": got,
        "train_sec": round(train_s, 2),
        "merges_per_sec": round(got / train_s, 2),
        "head_to_head_merges": cmp_merges,
        "heap_sec_at_cmp": round(heap_small_s, 2),
        "minscan_sec_at_cmp": round(scan_small_s, 2),
        "minscan_identical_merges": True,
        "live_pair_dict_after_cmp": live_pairs,
        "measured_speedup_at_cmp": round(speedup, 2) if speedup else None,
        "note": ("minscan = the r15 selection shape (full dict scan "
                 "per merge) on identical accounting; the speedup "
                 "GROWS with n_merges because the live pair dict "
                 "grows as merges mint new symbols"),
    }


def _train_bpe_minscan(word_freqs, n_merges: int,
                       min_count: int = 2):
    """The r15 trainer's selection shape — full min() scan over the
    live pair dict each merge — on the same deterministic accounting.
    Probe-only reference; returns (merge list, final live dict size)."""
    from mongo_olap_spark.operators.bpe import _merge_all

    ordered = sorted(word_freqs, key=lambda kv: (-kv[1], kv[0]))
    words = [tuple(bytes([b]) for b in w.encode("utf-8"))
             for w, _ in ordered]
    counts = [c for _, c in ordered]
    pair_counts: dict = {}
    where: dict = {}

    def _account(idx, sign):
        w, c = words[idx], counts[idx]
        for i in range(len(w) - 1):
            p = (w[i], w[i + 1])
            nc = pair_counts.get(p, 0) + sign * c
            if nc:
                pair_counts[p] = nc
            else:
                pair_counts.pop(p, None)
            if sign > 0:
                where.setdefault(p, set()).add(idx)

    for idx in range(len(words)):
        _account(idx, +1)
    merges: list = []
    seen: set = set()
    while len(merges) < n_merges and pair_counts:
        pair, cnt = min(pair_counts.items(),
                        key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        if pair not in seen:
            merges.append(pair)
            seen.add(pair)
        for idx in sorted(where.get(pair, ())):
            w = words[idx]
            if not any(w[i] == pair[0] and w[i + 1] == pair[1]
                       for i in range(len(w) - 1)):
                continue
            _account(idx, -1)
            words[idx] = _merge_all(w, pair)
            _account(idx, +1)
        where.pop(pair, None)
        pair_counts.pop(pair, None)
    return merges, len(pair_counts)


def probe_encode_cache(sf_dir: str) -> dict:
    from mongo_olap_spark.operators.bpe import (
        encode_cache_stats, encode_tokens_column, train_bpe_on,
        vocab_cache_key)
    from mongo_olap_spark.session import get_spark
    from mongo_olap_spark.sources.tables import load_table

    from pyspark.sql import functions as F

    spark = get_spark("bpe-cache-probe", shuffle_partitions=8)
    docs = load_table(spark, sf_dir, "documents")
    vocab = train_bpe_on(docs, "text", n_merges=200)
    t0 = time.time()
    # aggregate OVER the tokens column: a bare count() would let
    # Catalyst prune the UDF column and never run the encode at all
    enc = encode_tokens_column(docs, vocab, "text", "tokens")
    row = enc.agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.size("tokens")).alias("toks")).collect()[0]
    n, total_tokens = int(row["n"]), int(row["toks"] or 0)
    enc_s = time.time() - t0
    stats = encode_cache_stats(spark)
    key = vocab_cache_key(vocab)
    mine = stats["by_vocab"].get(key, {})
    spark.stop()
    return {
        "sf_dir": sf_dir,
        "docs_encoded": n,
        "tokens_emitted": total_tokens,
        "encode_sec": round(enc_s, 2),
        "workers_probed": stats["workers_probed"],
        "cache_hits": mine.get("hits"),
        "cache_misses": mine.get("misses"),
        "hit_rate": (round(mine["hit_rate"], 4)
                     if mine.get("hit_rate") is not None else None),
    }


def main() -> int:
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 32_768
    out = sys.argv[3] if len(sys.argv) > 3 else "SCALE_PROBE_BPE.json"
    result = {
        "trainer": probe_trainer(n_words, n_merges),
        "encode_cache": probe_encode_cache(
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")),
    }
    with open(os.path.join(REPO, out), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
