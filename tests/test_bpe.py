"""Deterministic byte-level BPE (r15): the engine's trainer/encoder
against an INDEPENDENT naive reference.

The reference here recomputes every pair count from scratch each
iteration (O(V^2)) and encodes by literally replaying the merge list
in rank order — deliberately the dumbest correct implementation, so
it shares no bookkeeping (inverted index, incremental counts, caches)
with the engine. Agreement is hash-exact: same merge list, same token
stream, same ids.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_olap_spark.operators import bpe


# ---------------------------------------------------------------------------
# naive reference (no shared state with operators/bpe.py)
# ---------------------------------------------------------------------------

def ref_train(word_freqs, n_merges, min_count=2):
    """Recompute-all-pairs-every-iteration trainer."""
    words = {}
    for w, c in word_freqs:
        t = tuple(bytes([b]) for b in w.encode("utf-8"))
        words[t] = words.get(t, 0) + c
    merges = []
    while len(merges) < n_merges:
        pairs = {}
        for w, c in words.items():
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        live = {p: c for p, c in pairs.items() if c >= min_count}
        if not live:
            break
        best = min(live.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        # an already-merged byte-pair that re-emerged merges again
        # under its ORIGINAL rank — applied, but not re-ranked
        if best not in merges:
            merges.append(best)
        words = _ref_apply(words, best)
    return merges


def _ref_apply(words, pair):
    out = {}
    a, b = pair
    for w, c in words.items():
        nw, i = [], 0
        while i < len(w):
            if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                nw.append(a + b)
                i += 2
            else:
                nw.append(w[i])
                i += 1
        t = tuple(nw)
        out[t] = out.get(t, 0) + c
    return out


def ref_encode(word, merges):
    """Replay merges in rank order (all occurrences per rank),
    repeated to fixpoint — a ranked pair can in principle re-appear
    after its rank's pass when a later merge mints a byte-equal
    symbol; the fixpoint loop matches the engine's greedy min-rank
    semantics without sharing its implementation."""
    syms = [bytes([b]) for b in word.encode("utf-8")]
    ids = list(word.encode("utf-8"))
    changed = True
    while changed:
        changed = False
        for rank, (a, b) in enumerate(merges):
            ns, ni, i = [], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    ni.append(256 + rank)
                    i += 2
                    changed = True
                else:
                    ns.append(syms[i])
                    ni.append(ids[i])
                    i += 1
            syms, ids = ns, ni
    return ids


# ---------------------------------------------------------------------------
# trainer equivalence
# ---------------------------------------------------------------------------

CORPUS = [
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
    ("low", 3), ("newer", 4), ("wide", 2), ("new", 7), ("est", 1),
]


def test_train_matches_naive_reference():
    got = bpe.train_bpe(CORPUS, n_merges=12).merges
    want = ref_train(CORPUS, n_merges=12)
    assert got == want
    assert len(got) > 0


def test_train_order_invariant():
    import random
    shuffled = CORPUS[:]
    random.Random(7).shuffle(shuffled)
    assert (bpe.train_bpe(CORPUS, 10).merges
            == bpe.train_bpe(shuffled, 10).merges)


def test_train_tie_break_lexicographic():
    # "ab" and "cd" both occur 3x: (a,b) < (c,d) lexicographically
    merges = bpe.train_bpe([("ab", 3), ("cd", 3)], n_merges=1).merges
    assert merges == [(b"a", b"b")]


def test_train_min_count_stops_early():
    v = bpe.train_bpe([("abc", 1)], n_merges=10, min_count=2)
    assert v.merges == []


def test_train_multibyte_utf8():
    corpus = [("héllo", 4), ("hé", 3), ("über", 2)]
    assert (bpe.train_bpe(corpus, 8).merges
            == ref_train(corpus, 8))


# ---------------------------------------------------------------------------
# encoder equivalence + lossless roundtrip
# ---------------------------------------------------------------------------

def test_encode_matches_reference_and_roundtrips():
    v = bpe.train_bpe(CORPUS, n_merges=12)
    for w in ["low", "lowest", "newest", "news", "zzz", "wider",
              "héllo", ""]:
        got = bpe.encode_word(w, v.ranks)
        assert got == ref_encode(w, v.merges), w
        # lossless: concatenated token bytes == utf-8 word bytes
        assert b"".join(v.token_bytes(t) for t in got) == w.encode(
            "utf-8"), w


def test_decode_tokens_inverse():
    v = bpe.train_bpe(CORPUS, n_merges=12)
    for w in ["newest", "zürich", "", "low"]:
        assert bpe.decode_tokens(bpe.encode_word(w, v.ranks), v) == w


def test_encode_training_words_compress():
    v = bpe.train_bpe(CORPUS, n_merges=12)
    # frequent training words must actually merge below byte length
    assert len(bpe.encode_word("newest", v.ranks)) < len("newest")


def test_hypothesis_roundtrip_random_words():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    v = bpe.train_bpe(CORPUS, n_merges=12)

    @settings(max_examples=200, deadline=None)
    @given(st.text(min_size=0, max_size=24))
    def check(w):
        w = w.replace(" ", "")
        got = bpe.encode_word(w, v.ranks)
        assert got == ref_encode(w, v.merges)
        assert b"".join(v.token_bytes(t) for t in got) == w.encode("utf-8")

    check()


# ---------------------------------------------------------------------------
# distributed stages
# ---------------------------------------------------------------------------

SF = "/root/testdata/sf0.001"


def test_train_bpe_on_matches_local_counts(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("text")
    vocab = bpe.train_bpe_on(d, n_merges=40)
    # independent local word count
    local = {}
    for r in d.collect():
        for w in r.text.split(" "):
            if w:
                local[w] = local.get(w, 0) + 1
    want = ref_train(sorted(local.items()), n_merges=40)
    assert vocab.merges == want
    assert vocab.coverage == 1.0


def test_encode_column_matches_reference_and_is_stable(spark):
    d = (spark.read.parquet(f"{SF}/documents.parquet")
         .select("doc_id", "text").limit(200))
    vocab = bpe.train_bpe_on(d.select("text"), n_merges=40)
    enc = {r.doc_id: r.tokens for r in
           bpe.encode_tokens_column(d, vocab).collect()}
    enc_rep = {r.doc_id: r.tokens for r in
               bpe.encode_tokens_column(d.repartition(7), vocab).collect()}
    assert enc == enc_rep  # partitioning-invariant
    for r in d.collect():
        want = []
        for w in r.text.split(" "):
            if w:
                want.extend(ref_encode(w, vocab.merges))
        assert enc[r.doc_id] == want, r.doc_id


def test_max_words_cap_reports_coverage(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("text")
    with pytest.warns(UserWarning, match="coverage|covering"):
        vocab = bpe.train_bpe_on(d, n_merges=5, max_words=10)
    assert 0 < vocab.coverage < 1.0


def test_q_pack_bpe_layout_invariants(spark):
    from mongo_olap_spark.queries import QUERIES

    rows = QUERIES["q_pack_bpe"](spark, SF).collect()
    assert rows
    by_src = {}
    for r in rows:
        assert 0 <= r.bin_offset < 2048
        assert r.n_tokens > 0
        by_src.setdefault(r.source, []).append(r)
    # contiguous stream per source: offsets reconstruct the prefix sum
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.doc_id)
        run = 0
        for r in rs:
            assert r.bin_id * 2048 + r.bin_offset == run
            run += r.n_tokens


def test_q_bpe_vocab_shape(spark):
    from mongo_olap_spark.queries import QUERIES

    rows = QUERIES["q_bpe_vocab"](spark, SF).collect()
    assert len(rows) > 0
    assert [r.rank for r in rows] == list(range(len(rows)))
    for r in rows:
        assert r.token == r.left + r.right
        assert r.token_id == 256 + r.rank


def test_q_pipeline_llm_pack_layout_and_fold_purity(spark):
    """The composite pipeline's pack stage: (a) q_pack_bpe layout
    invariants hold (contiguous prefix-sum stream per source), (b) the
    packed doc set is EXACTLY the spine's train fold — no val/test doc
    ever reaches the tokenizer or the bins (leakage check)."""
    from mongo_olap_spark.queries import QUERIES
    from mongo_olap_spark.queries.extensions import _llm_spine

    rows = QUERIES["q_pipeline_llm_pack"](spark, SF).collect()
    assert rows
    by_src = {}
    for r in rows:
        assert 0 <= r.bin_offset < 2048
        assert r.n_tokens > 0
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.doc_id)
        run = 0
        for r in rs:
            assert r.bin_id * 2048 + r.bin_offset == run
            run += r.n_tokens
    spine = _llm_spine(spark, SF).select("doc_id", "split").collect()
    train_ids = {r.doc_id for r in spine if r.split == "train"}
    packed_ids = {r.doc_id for r in rows}
    assert packed_ids == train_ids


def test_q_chunk_bpe_reconstructs_token_stream(spark):
    """Token-space chunking: per doc, chunk indices are contiguous,
    n_tok = min(size, total - idx*stride), and each chunk's id-sum
    equals the reference slice of an independent encode — content, not
    just counts."""
    from mongo_olap_spark.queries import QUERIES

    size, stride = 32, 24
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text")
    vocab = bpe.train_bpe_on(d.select("text"), n_merges=120)
    ref = {}
    for r in d.collect():
        ids = []
        for w in r.text.split(" "):
            if w:
                ids.extend(ref_encode(w, vocab.merges))
        ref[r.doc_id] = ids

    rows = QUERIES["q_chunk_bpe"](spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {d_ for d_, ids in ref.items() if ids}
    for doc_id, rs in by_doc.items():
        ids = ref[doc_id]
        total = len(ids)
        rs.sort(key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rs] == list(range(len(rs)))
        assert len(rs) == (total - 1) // stride + 1
        for r in rs:
            start = r.chunk_idx * stride
            want = ids[start:start + size]
            assert r.n_tok == len(want)
            assert r.tok_sum == sum(want)


def test_q_vocab_bpe_coverage_matches_reference(spark):
    """Token-id vocabulary: frequencies equal an independent encode's
    id counts; coverage is the cumulative share in (n DESC, id ASC)
    order and ends at 1.0 when every id fits in the top-k."""
    from collections import Counter

    from mongo_olap_spark.queries import QUERIES

    d = spark.read.parquet(f"{SF}/documents.parquet").select("text")
    vocab = bpe.train_bpe_on(d, n_merges=120)
    counts: Counter = Counter()
    for r in d.collect():
        for w in r.text.split(" "):
            if w:
                counts.update(ref_encode(w, vocab.merges))

    rows = QUERIES["q_vocab_bpe"](spark, SF).collect()
    got = {r.token_id: r.n for r in rows}
    assert got == dict(counts) or all(
        counts[t] == n for t, n in got.items())
    cov = [r.coverage for r in rows]
    assert all(b > a for a, b in zip(cov, cov[1:]))
    if len(rows) == len(counts):  # every id fits in top-k
        assert abs(cov[-1] - 1.0) < 1e-9
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_q_chunk_bpe_empty_doc_emits_no_rows(spark, tmp_path):
    """r16 review fix: a doc whose every word is empty encodes to zero
    tokens, and F.sequence(0, floor(-1/stride)) DESCENDS ([0, -1] —
    Spark defaults step to -1 when start > stop), which used to mint
    two bogus chunk rows with n_tok=0. Zero-token docs must emit no
    chunks at all."""
    import pandas as pd

    from mongo_olap_spark.queries import QUERIES

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a real document with several words here ok", "", "   "],
        "lang": ["en"] * 3,
        "source": ["src0"] * 3,
        "n_chars": [43, 0, 3],
    })
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    rows = QUERIES["q_chunk_bpe"](spark, str(tmp_path)).collect()
    assert {r.doc_id for r in rows} == {1}
    assert all(r.n_tok > 0 for r in rows)
    assert all(r.chunk_idx >= 0 for r in rows)
