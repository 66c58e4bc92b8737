"""T3 operator unit tests: planted-duplicate recall for the LSH paths,
language-ID on real multilingual samples, hash determinism, LSH-kNN
recall vs the exact oracle, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_olap_spark.operators import dedup as dd
from mongo_olap_spark.operators import multimodal as mm
from mongo_olap_spark.operators import similarity as sim
from mongo_olap_spark.operators import text as tx
from mongo_olap_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def _planted_near_dups(docs):
    toks = F.split("text", " ")
    near = (
        docs.filter(F.col("doc_id") % 11 == 0)
        .withColumn("doc_id", F.col("doc_id") + 2_000_000)
        .withColumn(
            "text",
            F.concat_ws(" ", F.slice(toks, 1, F.greatest(F.size(toks) - 3, F.lit(1)))),
        )
    )
    return docs.select("doc_id", "text", "source").unionByName(
        near.select("doc_id", "text", "source")
    )


def test_minhash_finds_all_planted_pairs(spark, docs):
    corpus = _planted_near_dups(docs)
    planted = {
        (r.doc_id, r.doc_id + 2_000_000)
        for r in docs.filter(F.col("doc_id") % 11 == 0).select("doc_id").collect()
    }
    pairs = dd.minhash_near_dup_pairs(corpus, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    missing = planted - got
    # banding (16 hashes, 4 bands) at jaccard ~0.9 → recall ~1; allow 1 miss
    assert len(missing) <= 1, f"missed planted pairs: {sorted(missing)[:5]}"
    for r in pairs.collect():
        assert r.jaccard >= 0.5


def test_simhash_close_on_perturbed_docs(spark, docs):
    corpus = _planted_near_dups(docs)
    planted = {
        (r.doc_id, r.doc_id + 2_000_000)
        for r in docs.filter(F.col("doc_id") % 11 == 0).select("doc_id").collect()
    }
    pairs = dd.simhash_near_dup_pairs(corpus, max_hamming=10, num_bands=8)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    found = planted & got
    # SimHash is coarser than MinHash; expect the large majority found
    assert len(found) >= 0.7 * len(planted)


def test_simhash_deterministic(spark, docs):
    a = docs.select(dd.simhash64("text").alias("s")).collect()
    b = docs.select(dd.simhash64("text").alias("s")).collect()
    assert a == b


def test_simhash_first_band_emission_exactly_once(spark, docs):
    """Optimization r17 pin: first-colliding-band emission must yield
    each qualifying pair EXACTLY once (no dropDuplicates in the plan),
    and the pair set must equal the brute-force reference — all
    (id_a < id_b) within max_hamming sharing ≥ 1 band."""
    corpus = _planted_near_dups(docs.limit(150))
    max_hamming, num_bands = 10, 8
    got_rows = dd.simhash_near_dup_pairs(
        corpus, max_hamming=max_hamming, num_bands=num_bands
    ).collect()
    got = [(r.id_a, r.id_b) for r in got_rows]
    assert len(got) == len(set(got)), "pair emitted from more than one band"

    sigs = {r.id: r.sig for r in dd.simhash_signatures(corpus).collect()}
    bits = 64 // num_bands
    mask = (1 << bits) - 1

    def bands(s):
        return [(s >> (b * bits)) & mask for b in range(num_bands)]

    ids = sorted(sigs)
    want = set()
    for i, a in enumerate(ids):
        ba = bands(sigs[a])
        for b_ in ids[i + 1:]:
            x = sigs[a] ^ sigs[b_]
            if bin(x & ((1 << 64) - 1)).count("1") <= max_hamming and any(
                p == q for p, q in zip(ba, bands(sigs[b_]))
            ):
                want.add((a, b_))
    assert set(got) == want
    # hamming column must agree with the signature distance
    for r in got_rows:
        x = (sigs[r.id_a] ^ sigs[r.id_b]) & ((1 << 64) - 1)
        assert r.hamming == bin(x).count("1")


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([("a b",), ("x",)], ["text"])
    out = df.select(dd.word_shingles("text", 3).alias("sh")).collect()
    assert out[0].sh == ["a b"]
    assert out[1].sh == ["x"]


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------

def test_knn_lsh_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < 20)
    exact = sim.knn_exact(queries, emb, k=10)
    approx = sim.knn_lsh(queries, emb, k=10, bits=16, num_bands=8)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # 8 bands × 2 bits is permissive banding — recall should be high
    assert recall >= 0.8, f"LSH recall {recall:.2f}"


def test_ivf_beats_srp_at_equal_budget(spark, sf_dir):
    """VERDICT r1 next-steps #7: the learned-centroid quantizer must
    deliver ≥ SRP's recall at (at most) SRP's candidate budget.
    Measured on this corpus: SRP 16-bit/8-band examines ~0.90 of all
    pairs for 0.965 recall; IVF nprobe=14/16 examines ~0.88 for ~0.99."""
    emb = load_table(spark, sf_dir, "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id) for r in sim.knn_exact(queries, emb, k=10).collect()}
    srp = {(r.query_id, r.neighbor_id) for r in sim.knn_lsh(queries, emb, k=10, bits=16, num_bands=8).collect()}
    ivf = {(r.query_id, r.neighbor_id) for r in sim.ivf_knn(queries, emb, k=10, n_centroids=16, nprobe=14).collect()}
    srp_recall = len(exact & srp) / len(exact)
    ivf_recall = len(exact & ivf) / len(exact)
    assert ivf_recall >= srp_recall, (ivf_recall, srp_recall)


def test_ivf_centroids_deterministic_and_unit(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    import numpy as np

    a = sim.ivf_train_centroids(emb, n_centroids=8)
    b = sim.ivf_train_centroids(emb, n_centroids=8)
    assert np.array_equal(a, b)  # hash-ordered sample + fixed init
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)  # spherical


def test_knn_self_excluded_and_k_bounded(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.knn_exact(emb.filter(F.col("vec_id") < 3), emb, k=5).collect()
    assert all(r.query_id != r.neighbor_id for r in out)
    assert all(1 <= r.rank <= 5 for r in out)
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, 6)) for v in per_q.values())


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------

def test_lang_id_on_real_samples(spark):
    samples = [
        ("the cat sat on the mat and it is happy", "en"),
        ("el perro corre en la calle y se va por un rato", "es"),
        ("der hund ist nicht mit den kindern zu hause", "de"),
        ("le chat est dans la maison et il mange pour une heure", "fr"),
        ("zzz qqq www", "und"),
    ]
    df = spark.createDataFrame(samples, ["text", "expected"])
    out = df.select("expected", tx.lang_id("text").alias("got")).collect()
    for r in out:
        assert r.got == r.expected, r


def test_rolling_hash_order_sensitive(spark):
    df = spark.createDataFrame([("aa bbb c",), ("c bbb aa",)], ["text"])
    h = [r.h for r in df.select(tx.rolling_hash("text").alias("h")).collect()]
    assert h[0] != h[1]  # order matters
    again = [r.h for r in df.select(tx.rolling_hash("text").alias("h")).collect()]
    assert h == again  # deterministic


def test_quality_score_bounds(spark, docs):
    out = docs.select(tx.quality_score("text").alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).collect()[0]
    assert 0.0 <= out.lo <= out.hi <= 1.0


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

def test_multimodal_features_stable_under_repartition(spark, docs):
    payloads = mm.attach_binary_payload(docs.select("doc_id", "text"))
    a = {tuple(r) for r in mm.extract_features(payloads).collect()}
    b = {tuple(r) for r in mm.extract_features(payloads.repartition(7)).collect()}
    assert a == b
    assert len(a) == docs.count()


def test_multimodal_metadata_struct(spark, docs):
    payloads = mm.attach_binary_payload(docs.select("doc_id", "text"))
    row = payloads.select("media_meta.modality", "media_meta.source_uri").first()
    assert row.modality == "text"
    assert row.source_uri.startswith("testdata://documents/")


def test_decode_image_default_codec_refuses_without_pil():
    """codec=None means 'use a real library codec' — absent PIL, the
    seam must raise the documented NotImplementedError, not a random
    ImportError from inside an executor."""
    with pytest.raises(NotImplementedError, match="inject a codec"):
        mm.decode_image(None)


def test_ppm_codec_roundtrip():
    pixels = bytes(range(48))
    payload = b"P6\n# a comment\n4 4\n255\n" + pixels
    w, h, c, px = mm.ppm_codec(payload)
    assert (w, h, c) == (4, 4, 3)
    assert px == pixels
    with pytest.raises(ValueError, match="truncated"):
        mm.ppm_codec(b"P6\n4 4\n255\n" + pixels[:10])
    with pytest.raises(ValueError, match="not a binary PPM"):
        mm.ppm_codec(b"BM123")


def test_decode_to_feature_end_to_end_ppm(spark, docs):
    """decode -> feature with the injected PPM codec, no PIL anywhere:
    every decoded mean must equal the synthesized pixel model's closed
    form, and the answer must be partitioning-invariant."""
    d = docs.select("doc_id")
    stats = mm.image_stats(mm.decode_image(mm.synth_ppm_payload(d), codec=mm.ppm_codec))
    rows = stats.collect()
    assert len(rows) == docs.count()
    for r in rows:
        m = r["doc_id"] % 256
        want = (48 * m + 1128 - 256 * max(m - 208, 0)) / 48.0
        assert (r["width"], r["height"], r["channels"]) == (4, 4, 3)
        assert r["mean_pixel"] == want, r
    again = mm.image_stats(
        mm.decode_image(mm.synth_ppm_payload(d.repartition(7)), codec=mm.ppm_codec)
    )
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in rows}


def test_decode_with_injected_bmp_codec(spark):
    """A handcrafted 24-bit BMP decodes through the same seam: padding
    stripped, rows flipped to top-down, BGR swapped to RGB. The codec
    is a SECOND pure-Python format (after PPM), proving the seam is
    codec-agnostic. Defined inside the test: cloudpickle then ships it
    by value — executors cannot import the tests module."""
    import struct

    def bmp_codec(payload):
        if payload[:2] != b"BM":
            raise ValueError("not a BMP payload")
        pixel_off = struct.unpack_from("<I", payload, 10)[0]
        width, height = struct.unpack_from("<ii", payload, 18)
        assert struct.unpack_from("<H", payload, 28)[0] == 24
        row_size = (width * 3 + 3) & ~3
        out = bytearray()
        for y in range(height):  # BMP stores rows bottom-up
            row = payload[pixel_off + (height - 1 - y) * row_size :][: width * 3]
            for x in range(width):  # BGR -> RGB
                b, g, r = row[3 * x : 3 * x + 3]
                out += bytes((r, g, b))
        return width, height, 3, bytes(out)

    def make_bmp(width, height, rgb_rows):
        row_size = (width * 3 + 3) & ~3
        raster = bytearray()
        for y in range(height - 1, -1, -1):  # bottom-up
            row = bytearray()
            for r, g, b in rgb_rows[y]:
                row += bytes((b, g, r))
            row += b"\0" * (row_size - len(row))
            raster += row
        header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
        info = struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 0, 0, 0, 0
        )
        return header + info + raster

    rgb_rows = [
        [(255, 0, 0), (0, 255, 0)],
        [(0, 0, 255), (10, 20, 30)],
    ]
    payload = make_bmp(2, 2, rgb_rows)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    out = mm.decode_image(df, codec=bmp_codec).collect()[0]
    assert (out["width"], out["height"], out["channels"]) == (2, 2, 3)
    assert bytes(out["pixels"]) == bytes(
        v for row in rgb_rows for px in row for v in px
    )


def test_repartition_by_bytes(spark, docs):
    payloads = mm.attach_binary_payload(docs.select("doc_id", "text"))
    sized = payloads.withColumn("n", F.length("payload"))
    out = mm.repartition_by_bytes(sized, "n", target_bytes_per_partition=10_000)
    assert out.rdd.getNumPartitions() >= 2
    assert out.count() == docs.count()


# ---------------------------------------------------------------------------
# $redact (operators/redact.py)
# ---------------------------------------------------------------------------

def test_redact_prune_keep_descend(spark):
    from mongo_olap_spark.operators.redact import level_gate, redact_document

    rows = [
        # (id, meta_level, inner_level) — inner.tag = "t<id>"
        (1, 0, 2),  # KEEP at meta: inner survives even though inner would prune
        (2, 1, 2),  # DESCEND at meta, PRUNE at inner
        (3, 1, 1),  # DESCEND both: tag survives
        (4, 2, 0),  # PRUNE at meta: whole subtree null
    ]
    df = spark.createDataFrame(rows, "id int, ml int, il int").select(
        "id",
        F.struct(
            F.col("ml").alias("level"),
            F.struct(
                F.col("il").alias("level"),
                F.concat(F.lit("t"), F.col("id")).alias("tag"),
            ).alias("inner"),
        ).alias("doc"),
    )
    out = redact_document(df, "doc", level_gate(prune_at=2, keep_at=0))
    got = {r["id"]: r["tag"] for r in out.select("id", "doc.inner.tag").collect()}
    assert got == {1: "t1", 2: None, 3: "t3", 4: None}


def test_redact_array_of_structs(spark):
    from mongo_olap_spark.operators.redact import level_gate, redact_document

    df = spark.createDataFrame([(1,)], "id int").select(
        "id",
        F.array(
            F.struct(F.lit(1).alias("level"), F.lit("a").alias("v")),
            F.struct(F.lit(2).alias("level"), F.lit("b").alias("v")),
        ).alias("docs"),
    )
    out = redact_document(df, "docs", level_gate(prune_at=2, keep_at=0))
    [row] = out.collect()
    assert [e["v"] if e else None for e in row["docs"]] == ["a", None]


def test_redact_plan_is_expression_only(spark):
    """The redact walk must compile to a plain Project — no Python
    evaluation node in the physical plan."""
    from mongo_olap_spark.operators.redact import level_gate, redact_document

    df = spark.range(10).select(
        "id", F.struct(F.lit(1).alias("level"), F.col("id").alias("v")).alias("doc")
    )
    out = redact_document(df, "doc", level_gate())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan


# ---------------------------------------------------------------------------
# repetition + cleaning (operators/text.py round-2 additions)
# ---------------------------------------------------------------------------

def test_repetition_fractions(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x x x x"), (3, "solo")], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["w"], r["b"])
        for r in df.select(
            "doc_id",
            tx.dup_word_fraction("text").alias("w"),
            tx.dup_ngram_fraction("text", 2).alias("b"),
        ).collect()
    }
    # doc 1: 5 tokens 3 distinct; 4 bigrams (a b, b a, a b, b c) 3 distinct
    assert got[1] == (pytest.approx(0.4), pytest.approx(0.25))
    # doc 2: 4 tokens 1 distinct; 3 bigrams 1 distinct
    assert got[2] == (pytest.approx(0.75), pytest.approx(2 / 3))
    # doc 3: single token -> no bigrams -> null
    assert got[3] == (pytest.approx(0.0), None)


def test_scrub_pii_masks_and_preserves(spark):
    df = spark.createDataFrame(
        [(1, "mail me at bob.smith+x@corp.io or +1 (555) 123-4567 id 123456789 ok")],
        "id int, text string",
    )
    [row] = df.select(tx.clean_text("text").alias("t")).collect()
    assert "<email>" in row["t"] and "<phone>" in row["t"] and "<num>" in row["t"]
    assert "bob" not in row["t"] and "555" not in row["t"]
    assert row["t"].startswith("mail me at")


# ---------------------------------------------------------------------------
# connected components (dup-group resolution)
# ---------------------------------------------------------------------------

def test_connected_components_chain_and_singletons(spark):
    # chain 1-2-3-4 (diameter 3), pair 10-11, singletons 20 and 21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 20, 21]], "node long"
    )
    got = {
        (r.node, r.group_id)
        for r in dd.connected_components(pairs, nodes).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 21),
    }


def test_connected_components_merges_across_shared_member(spark):
    # two pair-clusters sharing node 5 collapse into one component
    pairs = spark.createDataFrame(
        [(5, 7), (5, 9), (9, 3)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in [3, 5, 7, 9]], "node long")
    got = {
        (r.node, r.group_id)
        for r in dd.connected_components(pairs, nodes).collect()
    }
    assert got == {(3, 3), (5, 3), (7, 3), (9, 3)}


def test_connected_components_refuses_unconverged(spark):
    # a 5-chain needs ~4 rounds; max_iter=1 must refuse, not mislabel
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "node long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        dd.connected_components(pairs, nodes, max_iter=1).collect()


def test_connected_components_hot_node_star(spark):
    # a viral duplicate: one node adjacent to 2000 others (the skew
    # case for the edges-join); must converge in 2 rounds + checks
    # and label every spoke with the hub's component minimum
    pairs = spark.createDataFrame(
        [(1000, i) for i in range(1, 500)] + [(i, 5000 + i) for i in range(1, 500)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in range(1, 500)] + [(1000,)] + [(5000 + i,) for i in range(1, 500)],
        "node long",
    )
    got = dd.connected_components(pairs, nodes)
    assert got.filter(F.col("group_id") != 1).count() == 0
    assert got.count() == 999


def test_corpus_matrix_arrow_path_memory_and_identity(spark):
    """Round-5 task 5: _corpus_matrix collects via Arrow buffers, not
    python Row objects. Identity: the matrix equals the row-wise
    values. Memory: transient driver growth stays within a small
    multiple of the matrix bytes (the Row path held several-x at
    100k rows; Arrow ~= 1x)."""
    import resource

    import numpy as np

    from mongo_olap_spark.operators import similarity as sim

    n, dim = 100_000, 64
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: ((F.col("id") * 31 + i * 17) % 97).cast("float"),
        ).alias("embedding"),
    )
    matrix_bytes = n * dim * 8  # float64
    sim._MATRIX_CACHE.clear()
    before_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    ids, unit = sim._corpus_matrix(df, "vec_id", "embedding")
    grew_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss - before_kb
    assert grew_kb * 1024 < 3 * matrix_bytes, (
        f"transient growth {grew_kb // 1024} MB > 3x matrix "
        f"{matrix_bytes // 2**20} MB — Row-object overhead is back?"
    )
    assert ids.shape == (n,) and unit.shape == (n, dim)
    # identity vs a 3-row direct computation (row order is whatever
    # the scan produced — sort by id before comparing)
    order = np.argsort(ids)
    ids_s, unit_s = ids[order], unit[order]
    want = np.array(
        [[((vid * 31 + i * 17) % 97) for i in range(1, dim + 1)]
         for vid in (0, 1, n - 1)], dtype=np.float64)
    want = want / np.linalg.norm(want, axis=1, keepdims=True)
    assert list(ids_s[[0, 1, n - 1]]) == [0, 1, n - 1]
    assert np.allclose(unit_s[[0, 1, n - 1]], want, atol=1e-12)
    sim._MATRIX_CACHE.clear()


def test_corpus_matrix_ragged_fallback(spark):
    """A ragged vector column must not silently mis-reshape — the
    fallback path raises numpy's inhomogeneous-shape error instead of
    returning a garbled matrix."""
    import pytest as _pytest

    from mongo_olap_spark.operators import similarity as sim

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    sim._MATRIX_CACHE.clear()
    with _pytest.raises(ValueError):
        sim._corpus_matrix(df, "vec_id", "embedding")
    sim._MATRIX_CACHE.clear()


def test_mix_weights_deterministic_and_rate_faithful(spark):
    # q_mix_weights (r14): the weighted source-mixing sample must be a
    # pure function of the data — identical across runs and
    # partitionings — and its per-group keep rate must track the
    # declared weight within binomial noise.
    from mongo_olap_spark.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    a = {(r["doc_id"], r["source"])
         for r in QUERIES["q_mix_weights"](spark, sf).collect()}
    b = {(r["doc_id"], r["source"])
         for r in QUERIES["q_mix_weights"](spark, sf).repartition(17).collect()}
    assert a == b and a

    import collections
    per_grp = collections.Counter(int(s[3:]) // 5 for _, s in a)
    totals = collections.Counter(
        int(r["source"][3:]) // 5
        for r in spark.read.parquet(f"{sf}/documents.parquet")
                      .select("source").collect())
    rates = {0: 1.0, 1: 0.5, 2: 0.25, 3: 0.0625}
    for g, rate in rates.items():
        n, k = totals[g], per_grp.get(g, 0)
        sd = (n * rate * (1 - rate)) ** 0.5
        assert abs(k - n * rate) <= max(4 * sd, 4), (g, k, n * rate)
    # group 0 is keep-all: exact, not statistical
    assert per_grp[0] == totals[0]


# ---------------------------------------------------------------------------
# r14: deterministic + leakage-safe splits (operators/splits.py)
# ---------------------------------------------------------------------------

def test_split_fractions_validate():
    import pytest as _pytest

    from mongo_olap_spark.operators.splits import _thresholds

    with _pytest.raises(ValueError, match="sum to 1"):
        _thresholds({"train": 0.5, "test": 0.4})
    with _pytest.raises(ValueError, match="non-negative"):
        _thresholds({"train": 1.5, "test": -0.5})
    with _pytest.raises(ValueError, match="at least one"):
        _thresholds({})
    # bounds are cumulative 8-hex, last fold open-ended
    b = _thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    assert b[0] == ("train", "cccccccc") and b[1] == ("val", "e6666666")


def test_split_deterministic_and_fractional(spark):
    import collections

    from mongo_olap_spark.operators.splits import deterministic_split

    df = spark.range(20_000).withColumnRenamed("id", "k")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.k: r.split for r in
         deterministic_split(df, "k", fr, salt="s").collect()}
    b = {r.k: r.split for r in
         deterministic_split(df.repartition(13), "k", fr,
                             salt="s").collect()}
    assert a == b  # stable under repartitioning (no RNG state)
    n = collections.Counter(a.values())
    for fold, frac in fr.items():
        exp = 20_000 * frac
        sd = (20_000 * frac * (1 - frac)) ** 0.5
        assert abs(n[fold] - exp) <= 5 * sd, (fold, n[fold], exp)
    # a different salt reshuffles assignments
    c = {r.k: r.split for r in
         deterministic_split(df, "k", fr, salt="t").collect()}
    assert c != a


def test_leakage_safe_split_groups_stay_together(spark):
    from mongo_olap_spark.operators.splits import leakage_safe_split

    corpus = spark.range(3_000).select(F.col("id").alias("doc_id"))
    # groups of 3: docs 3g, 3g+1, 3g+2 share group id 3g
    groups = corpus.select(
        "doc_id", (F.col("doc_id") - F.col("doc_id") % 3).alias("group_id"))
    out = leakage_safe_split(corpus, groups,
                             {"train": 0.8, "val": 0.1, "test": 0.1},
                             salt="ls")
    per_group = (out.join(groups, "doc_id")
                 .groupBy("group_id")
                 .agg(F.countDistinct("split").alias("n"))
                 .agg(F.max("n")).collect()[0][0])
    assert per_group == 1  # NO group straddles folds


def test_leakage_safe_split_singleton_fallback(spark):
    from mongo_olap_spark.operators.splits import (
        leakage_safe_split,
        split_column,
    )

    corpus = spark.range(100).select(F.col("id").alias("doc_id"))
    # group map only covers even ids; odd ids must fall back to doc_id
    groups = corpus.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", F.lit(0).cast("long").alias("group_id"))
    fr = {"a": 0.5, "b": 0.5}
    got = {r.doc_id: r.split for r in
           leakage_safe_split(corpus, groups, fr, salt="x").collect()}
    want_odd = {r.doc_id: r.s for r in
                corpus.filter(F.col("doc_id") % 2 == 1).select(
                    "doc_id",
                    split_column("doc_id", fr, salt="x").alias("s"))
                .collect()}
    evens = {got[k] for k in got if k % 2 == 0}
    assert len(evens) == 1                      # all share group 0's fold
    for k, s in want_odd.items():
        assert got[k] == s                      # singletons hash their id


def test_q_split_leakage_safe_property(spark):
    # end-to-end: over the REAL dup corpus, no ngram dup group spans
    # two folds, and every corpus doc is assigned exactly once
    from mongo_olap_spark.queries import QUERIES

    out = QUERIES["q_split_leakage_safe"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == len({r.doc_id for r in rows})
    by_group = {}
    for r in rows:
        by_group.setdefault(r.group_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_group.values())


# ---------------------------------------------------------------------------
# r14: multimodal resize + frame-sample (operators/multimodal.py)
# ---------------------------------------------------------------------------

def test_resize_image_nearest_neighbor_exact(spark):
    import numpy as np

    from mongo_olap_spark.operators import multimodal as mm

    d = spark.range(5).select(F.col("id").alias("doc_id"))
    decoded = mm.decode_image(mm.synth_ppm_payload(d), codec=mm.ppm_codec)
    out = {r.doc_id: r for r in mm.resize_image(decoded, 2, 2).collect()}
    for did in range(5):
        src = np.array([(did + i) % 256 for i in range(48)],
                       np.uint8).reshape(4, 4, 3)
        want = src[[0, 2]][:, [0, 2]].tobytes()
        r = out[did]
        assert (r.width, r.height, r.channels) == (2, 2, 3)
        assert bytes(r.pixels) == want


def test_resize_image_upsample(spark):
    # NN upsample 4x4 -> 8x8 repeats each source pixel 2x2
    import numpy as np

    from mongo_olap_spark.operators import multimodal as mm

    d = spark.range(1).select(F.col("id").alias("doc_id"))
    decoded = mm.decode_image(mm.synth_ppm_payload(d), codec=mm.ppm_codec)
    r = mm.resize_image(decoded, 8, 8).collect()[0]
    src = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    want = src[(np.arange(8) * 4) // 8][:, (np.arange(8) * 4) // 8]
    assert bytes(r.pixels) == want.tobytes()
    assert (r.width, r.height) == (8, 8)


def test_sample_frames_slicing_and_fanout(spark):
    from mongo_olap_spark.operators import multimodal as mm

    d = spark.range(3).select(F.col("id").alias("doc_id"))
    frames = mm.sample_frames(
        mm.synth_video_payload(d, n_frames=5),
        width=4, height=4, channels=3, every_k=2).collect()
    # 5 frames, every 2nd -> indices 0, 2, 4 per doc
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    for did, rows in by_doc.items():
        assert sorted(r.frame_idx for r in rows) == [0, 2, 4]
        for r in rows:
            want = bytes((did + 48 * r.frame_idx + i) % 256
                         for i in range(48))
            assert bytes(r.pixels) == want


def test_split_null_key_refuses_loudly(spark):
    """ADVICE r14: NULL keys must not silently pool into the last
    declared fold — default refuses at execution time; on_null='null'
    surfaces them as NULL assignments."""
    import pytest as _pytest
    from pyspark.sql import Row

    from mongo_olap_spark.operators.splits import (deterministic_split,
                                                   split_column)

    df = spark.createDataFrame([Row(k="a"), Row(k=None), Row(k="b")])
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    with _pytest.raises(Exception, match="NULL split key"):
        deterministic_split(df, "k", fr).collect()
    rows = {r.k: r.split for r in
            df.withColumn("split",
                          split_column("k", fr, on_null="null")).collect()}
    assert rows[None] is None
    assert rows["a"] is not None and rows["b"] is not None
    with _pytest.raises(ValueError, match="on_null"):
        split_column("k", fr, on_null="bogus")


def test_dup_offset_scale_aware(spark, tmp_path):
    """r15 (found by the sf100 census): the constructed-copy id bands
    must clear the base id space at ANY scale — next power of 10 above
    max(doc_id), floored at the legacy 1M (so every scale the driver
    ships keeps its historical ids)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mongo_olap_spark.queries.extensions import (_dup_corpus,
                                                     _dup_offset)

    def mk(name, max_id):
        d = str(tmp_path / name)
        import os
        os.makedirs(d, exist_ok=True)
        ids = [0, 7, max_id]
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([f"t {i} x" for i in ids]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s0"] * 3),
            "n_chars": pa.array([5] * 3, pa.int64()),
        }), f"{d}/documents.parquet")
        return d

    small = mk("small", 499)
    assert _dup_offset(spark, small) == 1_000_000  # legacy floor
    big = mk("big", 4_999_999)
    assert _dup_offset(spark, big) == 10_000_000
    # and the constructed corpus never collides with base ids
    ids = [r.doc_id for r in _dup_corpus(spark, big).collect()]
    base = {0, 7, 4_999_999}
    copies = set(ids) - base
    assert copies and all(i > 4_999_999 for i in copies)
    assert len(ids) == len(set(ids))  # no aliasing


def test_sample_frames_partial_frame_refuses(spark):
    """ADVICE r14: a payload that is not a whole number of frames is a
    caller-side dimension mismatch — raise, never truncate."""
    import pytest as _pytest

    from mongo_olap_spark.operators import multimodal as mm

    d = spark.range(1).select(F.col("id").alias("doc_id"))
    vids = mm.synth_video_payload(d, n_frames=2)  # 2*48 bytes at 4x4x3
    with _pytest.raises(Exception, match="not a multiple"):
        # claim 5x4x3=60-byte frames over a 96-byte payload
        mm.sample_frames(vids, width=5, height=4, channels=3,
                         every_k=1).collect()


def test_sample_frames_every_k_one_keeps_all(spark):
    from mongo_olap_spark.operators import multimodal as mm

    d = spark.range(2).select(F.col("id").alias("doc_id"))
    n = mm.sample_frames(
        mm.synth_video_payload(d, n_frames=4),
        width=4, height=4, channels=3, every_k=1).count()
    assert n == 8
