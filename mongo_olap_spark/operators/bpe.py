"""Deterministic byte-level BPE: train + encode (r15, VERDICT r14
task 2 — closes "Missing #2: subword tokenization").

A training-data pipeline packs sequences by TOKENIZER tokens, not
whitespace words. No tokenizer library ships in this container, so
this is a from-scratch byte-level BPE (Sennrich et al. 2016 /
GPT-2-style byte fallback) with one hard requirement everywhere:
**determinism** — identical corpus ⇒ identical vocabulary and
identical encodings, on any engine, any partitioning, any run. No
RNG, no hash-iteration-order dependence: merge ranking is
``(count DESC, pair-bytes lexicographic ASC)`` and the corpus is
reduced to a sorted word-frequency table before the loop ever sees
it.

Scale shape (the 100 TB argument):

- **Train** = one distributed ``explode + groupBy(word).count()``
  over the corpus (the only pass that touches corpus bytes), then a
  driver-side merge loop over the compressed ``(word, count)`` dict.
  The loop's cost is bounded by DISTINCT words — Heaps-law
  sub-linear in corpus size — never by corpus rows; a ``max_words``
  cap (top-frequency, deterministic tie-break) bounds driver memory
  at any scale, and the dropped mass is RETURNED (``coverage``) so a
  caller sees exactly what the cap cost — no silent truncation.
  This split (distributed counting + dict-side merges) is the
  standard industrial trainer shape: the pair-merge recurrence is
  inherently sequential in rank, so distributing it buys nothing,
  while the corpus scan distributes perfectly.
- **Encode** = one Arrow-batched pandas stage (no row-at-a-time
  Python UDF), merges broadcast read-only to every task, with a
  per-executor word→tokens cache: Zipf makes the cache hit rate the
  corpus' repetition rate, so amortized per-word cost is a dict
  lookup, not a merge scan.

Encoding algorithm: split text on single spaces (the corpus'
pre-tokenizer), UTF-8 the word, then repeatedly merge ALL
occurrences of the lowest-ranked adjacent symbol pair until no
ranked pair remains — the exact inverse order of training, so every
training word reproduces its training-time segmentation. Token ids:
bytes 0..255 are ids 0..255; merge rank r mints id ``256 + r``.
Concatenating a word's token byte strings always reconstructs the
word (lossless; pytest property).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "word_frequencies", "train_bpe", "train_bpe_on", "encode_word",
    "encode_tokens_column", "merges_table", "BpeVocab",
    "encode_cache_stats", "vocab_cache_key", "decode_tokens",
]


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, n)`` corpus frequency table — the single distributed
    pass of BPE training. One explode + one count shuffle; everything
    downstream works on DISTINCT words only."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


class BpeVocab:
    """Learned merge list + derived lookups.

    ``merges``: ordered ``(left_bytes, right_bytes)``; rank = index.
    ``coverage``: fraction of corpus word OCCURRENCES the (possibly
    capped) training dict retained — 1.0 means the trainer saw every
    word."""

    def __init__(self, merges: list[tuple[bytes, bytes]],
                 coverage: float = 1.0):
        self.merges = merges
        self.coverage = coverage
        self.ranks: dict[tuple[bytes, bytes], int] = {
            pair: r for r, pair in enumerate(merges)
        }

    def token_bytes(self, token_id: int) -> bytes:
        """Byte string of a token id (raw byte, or the rank's merged
        pair). Ids ride ranks, never byte-string lookups, so two
        ranks that mint identical bytes stay unambiguous."""
        if token_id < 256:
            return bytes([token_id])
        a, b = self.merges[token_id - 256]
        return a + b


def _merge_all(word: tuple[bytes, ...],
               pair: tuple[bytes, bytes]) -> tuple[bytes, ...]:
    """All-occurrence left-to-right merge of ``pair`` in ``word``."""
    a, b = pair
    out: list[bytes] = []
    i, n = 0, len(word)
    while i < n:
        if i + 1 < n and word[i] == a and word[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def train_bpe(word_freqs: list[tuple[str, int]], n_merges: int,
              min_count: int = 2) -> BpeVocab:
    """Learn ``n_merges`` merges from a ``(word, count)`` list.

    Deterministic: input is re-sorted ``(count DESC, word ASC)`` (so
    caller order never matters) and each iteration picks the pair
    with ``(count DESC, pair-bytes ASC)``. Stops early — loudly, via
    the returned vocab's shorter merge list — when no pair reaches
    ``min_count`` (merging singletons would memorize noise).

    Incremental bookkeeping: a pair→{word_index} inverted index means
    each merge touches only the words that contain its pair — the
    classic subword-nmt optimization; total work is O(Σ|word| +
    merges · touched-words), never O(V · merges).

    Merge selection rides a LAZY-DELETE HEAP (r16): every live
    (pair, count) keeps an entry keyed ``(-count, pair)``; count
    changes push a fresh entry and orphan the old one, which is
    discarded on pop when it disagrees with the live dict. The first
    FRESH pop is therefore exactly ``min(pair_counts.items(), key=
    (-count, pair))`` — identical deterministic order to the r15
    full-scan — at O(log |pairs|) per selection instead of O(|pairs|):
    the difference between minutes and driver-hours at a production
    32k-merge train over ≥1M distinct words (SCALE_PROBE_BPE.json).
    """
    import heapq

    ordered = sorted(word_freqs, key=lambda kv: (-kv[1], kv[0]))
    words: list[tuple[bytes, ...]] = [
        tuple(bytes([b]) for b in w.encode("utf-8")) for w, _ in ordered
    ]
    counts: list[int] = [c for _, c in ordered]

    pair_counts: dict[tuple[bytes, bytes], int] = {}
    where: dict[tuple[bytes, bytes], set[int]] = {}
    changed: set[tuple[bytes, bytes]] = set()

    def _account(idx: int, sign: int) -> None:
        w, c = words[idx], counts[idx]
        for i in range(len(w) - 1):
            p = (w[i], w[i + 1])
            nc = pair_counts.get(p, 0) + sign * c
            if nc:
                pair_counts[p] = nc
            else:
                # exact eviction at zero keeps the dict = live pairs
                # (the r15 O(pairs) end-of-loop rebuild is gone)
                pair_counts.pop(p, None)
            changed.add(p)
            if sign > 0:
                where.setdefault(p, set()).add(idx)
            # negative side: leave the index entry; a stale index hit
            # is filtered at merge time (cheap), deleting eagerly is
            # O(pairs) churn

    for idx in range(len(words)):
        _account(idx, +1)
    changed.clear()

    heap: list[tuple[int, tuple[bytes, bytes]]] = [
        (-c, p) for p, c in pair_counts.items()
    ]
    heapq.heapify(heap)

    merges: list[tuple[bytes, bytes]] = []
    seen_pairs: set[tuple[bytes, bytes]] = set()
    while len(merges) < n_merges and heap:
        negc, pair = heapq.heappop(heap)
        if pair_counts.get(pair) != -negc:
            continue  # orphaned entry (count changed or pair evicted)
        cnt = -negc
        if cnt < min_count:
            break
        # a byte-identical pair can re-emerge after unrelated merges
        # create new adjacencies; re-ranking it would alias two ids to
        # one byte string — merge it again in the dict, but do not
        # mint a new rank (the encoder's first rank already covers it)
        if pair not in seen_pairs:
            merges.append(pair)
            seen_pairs.add(pair)
        for idx in sorted(where.get(pair, ())):
            w = words[idx]
            hit = any(w[i] == pair[0] and w[i + 1] == pair[1]
                      for i in range(len(w) - 1))
            if not hit:
                continue  # stale index entry
            _account(idx, -1)
            words[idx] = _merge_all(w, pair)
            _account(idx, +1)
        where.pop(pair, None)
        pair_counts.pop(pair, None)
        changed.discard(pair)
        for p in changed:
            c = pair_counts.get(p)
            if c:
                heapq.heappush(heap, (-c, p))
        changed.clear()
    return BpeVocab(merges)


def train_bpe_on(df: DataFrame, text_col: str = "text",
                 n_merges: int = 100, min_count: int = 2,
                 max_words: int = 1_000_000) -> BpeVocab:
    """Distributed-count + dict-loop trainer over a corpus DataFrame.

    The collect is bounded by ``max_words`` (top-frequency, ties by
    word ASC) — a capped plan-time sample in the house sense, never
    corpus-sized. Retained occurrence coverage is computed exactly
    and carried on the returned vocab."""
    freq = word_frequencies(df, text_col).persist()
    try:
        # one action in the common case (optimization r16): when the
        # top slice comes back under the cap it IS the whole
        # vocabulary, so totals/coverage derive from the collected
        # rows and the separate totals job never runs. Only a
        # cap-saturated collect needs the exact totals aggregate — and
        # the persist keeps "the only corpus-sized pass" contract true
        # there (unpersisted, that second action would rescan).
        top = (freq.orderBy(F.desc("n"), "word").limit(max_words)
               .collect())
        if len(top) >= max_words:
            tot_row = freq.agg(
                F.sum("n").alias("tot"),
                F.count(F.lit(1)).alias("v")).collect()[0]
            total, v_size = int(tot_row["tot"] or 0), int(tot_row["v"])
        else:
            total = sum(int(r["n"]) for r in top)
            v_size = len(top)
    finally:
        freq.unpersist()
    pairs = [(r["word"], int(r["n"])) for r in top]
    kept = sum(c for _, c in pairs)
    vocab = train_bpe(pairs, n_merges, min_count)
    vocab.coverage = (kept / total) if total else 1.0
    if v_size > max_words:
        # no silent caps: the dropped tail is visible to the caller
        import warnings
        warnings.warn(
            f"train_bpe_on: vocabulary {v_size} words exceeds "
            f"max_words={max_words}; trained on the top slice covering "
            f"{vocab.coverage:.4%} of word occurrences", stacklevel=2)
    return vocab


def encode_word(word: str,
                ranks: dict[tuple[bytes, bytes], int]) -> list[int]:
    """Token ids for one word: UTF-8 bytes, then merge ALL occurrences
    of the lowest-ranked adjacent pair until none remains. Pure
    Python on purpose — this is the per-distinct-word kernel behind
    the cached Arrow stage AND the pytest reference's subject."""
    raw = word.encode("utf-8")
    syms: list[bytes] = [bytes([b]) for b in raw]
    ids: list[int] = list(raw)
    while len(syms) > 1:
        best_rank, best = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (syms[i], syms[i + 1])
        if best is None:
            break
        a, b = best
        out_s: list[bytes] = []
        out_i: list[int] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out_s.append(a + b)
                out_i.append(256 + best_rank)
                i += 2
            else:
                out_s.append(syms[i])
                out_i.append(ids[i])
                i += 1
        syms, ids = out_s, out_i
    return ids


#: per-PROCESS word→tokens caches, one per vocabulary (keyed by a
#: digest of the merge list so two vocabs never cross-pollinate).
#: Living at module scope, a cache survives across Arrow batches for
#: the lifetime of the Python worker process — Spark reuses workers
#: (``spark.python.worker.reuse`` default), so on a long encode job
#: this IS the per-executor cache the docstring promises; the r15
#: version sat inside the UDF body and reset every ~10k-row batch,
#: re-encoding hot words once per batch instead of once per worker.
_ENCODE_CACHES: dict[str, dict[str, list[int]]] = {}
#: ``vocab_key -> [hits, misses]`` — cheap counters so a probe can
#: MEASURE the cross-batch hit rate instead of asserting it.
_ENCODE_STATS: dict[str, list[int]] = {}
#: flush-on-full cap: bounds worker memory at any corpus size; Zipf
#: refills the hot head within a batch after a flush
_ENCODE_CACHE_CAP = 1 << 19
#: bound on DISTINCT vocabularies cached per worker process: a
#: long-lived session that trains many vocabs (each q_*_bpe query
#: trains its own) would otherwise accumulate one up-to-2^19-entry
#: dict per vocab for the worker's lifetime. Oldest-first eviction
#: (dict insertion order); the tiny hit/miss counters are kept for
#: every vocab so probes still see evicted-vocab totals.
_ENCODE_VOCAB_CAP = 4


def vocab_cache_key(vocab: BpeVocab) -> str:
    """Stable digest of the merge list — the cache identity."""
    import hashlib

    h = hashlib.md5()
    for a, b in vocab.merges:
        h.update(a)
        h.update(b"\x00")
        h.update(b)
        h.update(b"\x01")
    return h.hexdigest()


def encode_tokens_column(df: DataFrame, vocab: BpeVocab,
                         text_col: str = "text",
                         out: str = "tokens") -> DataFrame:
    """``df`` + ``out``: array<int> BPE token ids for ``text_col``.

    One Arrow-batched pandas_udf (vectorized transfer, no per-row
    Python UDF); the merge table rides the closure (a few KB — it is
    ``n_merges`` byte-pairs, broadcast to executors by task
    serialization) and a per-worker-process word cache (module scope,
    so it persists ACROSS Arrow batches) collapses Zipf repetition to
    dict hits. Hit/miss counters are kept per vocabulary; see
    :func:`encode_cache_stats`."""
    ranks = vocab.ranks
    vkey = vocab_cache_key(vocab)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def _encode(texts):  # type: ignore[no-untyped-def]
        # IMPORTANT: reach the caches through the IMPORTED module, not
        # bare globals. A nested function is cloudpickled BY VALUE and
        # its captured globals land in a fresh dict on the worker — a
        # bare `_ENCODE_CACHES` there is a per-UDF COPY that neither
        # persists across jobs nor is visible to encode_cache_stats.
        # The import resolves to the worker's live module singleton,
        # which outlives the task (workers are reused).
        from mongo_olap_spark.operators import bpe as _b

        cache = _b._ENCODE_CACHES.get(vkey)
        if cache is None:
            while len(_b._ENCODE_CACHES) >= _b._ENCODE_VOCAB_CAP:
                _b._ENCODE_CACHES.pop(next(iter(_b._ENCODE_CACHES)))
            cache = _b._ENCODE_CACHES[vkey] = {}
        stats = _b._ENCODE_STATS.setdefault(vkey, [0, 0])
        cap = _b._ENCODE_CACHE_CAP

        def enc(t):  # noqa: ANN001
            if t is None:
                return None
            toks: list[int] = []
            for w in t.split(" "):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    stats[1] += 1
                    got = encode_word(w, ranks)
                    if len(cache) >= cap:
                        cache.clear()
                    cache[w] = got
                else:
                    stats[0] += 1
                toks.extend(got)
            return toks

        return texts.map(enc)

    return df.withColumn(out, _encode(F.col(text_col)))


def encode_cache_stats(spark, n_probes: int = 256) -> dict:
    """Best-effort encode-cache statistics, summed over the Python
    worker processes a small probe job lands on. The probe rides a
    pandas_udf so it shares the ARROW worker pool the encode stage ran
    in (RDD tasks use a separate pool and would see nothing); workers
    are reused, so the counters persist between jobs. Diagnostic only —
    exact on local mode with enough probes, a sample on a cluster."""
    import json as _json

    import pandas as pd
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf(T.StringType())
    def _probe(x):  # type: ignore[no-untyped-def]
        import os

        from mongo_olap_spark.operators import bpe as _b

        payload = _json.dumps({
            "pid": os.getpid(),
            "stats": {k: list(v) for k, v in _b._ENCODE_STATS.items()},
        })
        return pd.Series([payload] * len(x))

    seen: dict[int, dict] = {}
    rows = (spark.range(n_probes).repartition(n_probes)
            .select(_probe(col("id")).alias("s")).collect())
    for r in rows:
        d = _json.loads(r["s"])
        seen[d["pid"]] = d["stats"]
    agg: dict[str, list[int]] = {}
    for st in seen.values():
        for k, (h, m) in st.items():
            a = agg.setdefault(k, [0, 0])
            a[0] += h
            a[1] += m
    return {
        "workers_probed": len(seen),
        "by_vocab": {
            k: {"hits": h, "misses": m,
                "hit_rate": (h / (h + m)) if h + m else None}
            for k, (h, m) in agg.items()
        },
    }


def decode_tokens(ids: list[int], vocab: BpeVocab) -> str:
    """Lossless inverse of :func:`encode_word`/the encode column for
    one word's ids: concatenate token byte strings, decode UTF-8.
    (Whitespace is the pre-tokenizer's, not the tokens' — callers
    rejoin words with the separator they split on.)"""
    return b"".join(vocab.token_bytes(t) for t in ids).decode("utf-8")


def merges_table(spark, vocab: BpeVocab) -> DataFrame:
    """The learned merges as a DataFrame ``(rank, left, right, token,
    token_id)`` — byte strings decoded with backslash-escapes so
    non-UTF-8 merge halves (possible on multi-byte input) stay
    printable and round-trippable."""
    rows = [
        (r, a.decode("utf-8", "backslashreplace"),
         b.decode("utf-8", "backslashreplace"),
         (a + b).decode("utf-8", "backslashreplace"), 256 + r)
        for r, (a, b) in enumerate(vocab.merges)
    ]
    schema = T.StructType([
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("left", T.StringType(), False),
        T.StructField("right", T.StringType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("token_id", T.IntegerType(), False),
    ])
    return spark.createDataFrame(rows, schema)
