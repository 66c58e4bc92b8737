"""T3 — LLM-training-data pipeline operators (SURVEY.md §2.3).

Dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
search (exact brute-force + SRP-LSH), text analysis (token counts,
quality score, language ID, fingerprints), JSON prop extraction, and
the multimodal binary-column plumbing.

The on-disk ``documents`` table has no duplicates (all 500 texts are
distinct), so dedup queries build a *deterministic* duplicated corpus
inline — exact copies for ``doc_id % 7 == 0`` (ids +off) and
near-copies with the last 3 words dropped for ``doc_id % 11 == 0``
(ids +2·off), where off = next power of 10 above max(doc_id), floored
at 1_000_000 (the historical constant — unchanged at every scale up
to sf10; sf100's 5M ids needed +10M — see _dup_offset).
Both engines construct the identical corpus, so the
oracle checks the full dedup semantics, not just plumbing.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mongo_olap_spark.functions.expressions import davg_sql
from mongo_olap_spark.operators import dedup as dd
from mongo_olap_spark.operators import multimodal as mm
from mongo_olap_spark.operators import similarity as sim
from mongo_olap_spark.operators import text as tx
from mongo_olap_spark.queries import register
from mongo_olap_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# duplicated-corpus constructors (Spark + SQL twins)
# ---------------------------------------------------------------------------

#: r15 (found by the sf100 census): the constructed-copy id bands were
#: FIXED +1M/+2M — sf100's 5M base doc_ids collided with them, so a
#: "copy" could alias a real document and every census truth broke.
#: The offset is now the next power of 10 above max(doc_id), floored
#: at the legacy 1_000_000 so every scale the driver ships (and
#: sf1/sf10, max id 499_999) keeps the EXACT historical ids — all
#: committed transcripts remain valid; sf100 gets +10M/+20M. Both
#: engines compute the identical closed form (decimal digit count is
#: integer-exact on both sides).

_OFF_SQL = ("(SELECT GREATEST(1000000, CAST(POWER(10, LENGTH(CAST("
            "COALESCE(MAX(doc_id), 0) AS VARCHAR))) AS BIGINT)) "
            "FROM documents)")

_OFF_CACHE: dict[str, int] = {}


def _dup_offset(spark, sf_dir) -> int:
    got = _OFF_CACHE.get(sf_dir)
    if got is None:
        mx = (load_table(spark, sf_dir, "documents")
              .agg(F.max("doc_id")).first()[0])
        got = max(1_000_000, 10 ** len(str(int(mx or 0))))
        _OFF_CACHE[sf_dir] = got
    return got


def _dup_corpus(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    off = _dup_offset(spark, sf_dir)
    exact_copies = d.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(off)
    )
    return d.unionByName(exact_copies)


_DUP_CORPUS_SQL = f"""
    SELECT doc_id, text, source FROM documents
    UNION ALL
    SELECT doc_id + {_OFF_SQL}, text, source FROM documents WHERE doc_id % 7 = 0
"""


def _near_dup_corpus(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    off = _dup_offset(spark, sf_dir)
    toks = F.split("text", " ")
    near = (
        d.filter(F.col("doc_id") % 11 == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(2 * off))
        .withColumn(
            "text",
            F.concat_ws(" ", F.slice(toks, 1, F.greatest(F.size(toks) - 3, F.lit(1)))),
        )
    )
    return d.unionByName(near)


# ---------------------------------------------------------------------------
# X1 — exact dedup (hash-groupBy on content fingerprint)
# ---------------------------------------------------------------------------

@register(
    "q_dedup_exact",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_SQL})
    SELECT md5(text) AS fingerprint,
           min(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM corpus
    GROUP BY 1
    """,
)
def q_dedup_exact(spark, sf_dir):
    corpus = _dup_corpus(spark, sf_dir)
    # group on md5(text), not raw text: shuffle rows stay small at 100 TB
    return corpus.groupBy(F.md5("text").alias("fingerprint")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# X2 — near-dup dedup: MinHash+LSH and SimHash (rows-only: the banding
# internals aren't ANSI SQL; pytest checks planted-pair recall)
# ---------------------------------------------------------------------------

@register("q_dedup_minhash")
def q_dedup_minhash(spark, sf_dir):
    corpus = _near_dup_corpus(spark, sf_dir)
    return dd.minhash_near_dup_pairs(corpus, threshold=0.5).orderBy("id_a", "id_b")


@register("q_dedup_simhash")
def q_dedup_simhash(spark, sf_dir):
    # 4 bands × 16-bit keys: selective buckets (65k keys) and a
    # pigeonhole guarantee for hamming ≤ 3 — the scale-sane setting.
    corpus = _near_dup_corpus(spark, sf_dir)
    return dd.simhash_near_dup_pairs(corpus, max_hamming=3, num_bands=4).orderBy(
        "id_a", "id_b"
    )


# ---------------------------------------------------------------------------
# X2' — n-gram Jaccard with blocking, exact (oracle-checkable twin of
# the verification stage the LSH paths use)
# ---------------------------------------------------------------------------

@register(
    "q_dedup_ngram",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_SQL}),
    sh AS (
      SELECT doc_id, source,
             list_distinct(list_transform(
               range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
               i -> concat_ws(' ', string_split(text,' ')[i],
                                   string_split(text,' ')[i+1],
                                   string_split(text,' ')[i+2])
             )) AS shingles
      FROM corpus
    )
    , post AS (
      SELECT doc_id, source, unnest(shingles) AS g FROM sh
    ),
    sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
    inter AS (
      -- postings equi-join: equivalent to the all-pairs
      -- list_intersect form (|A ∪ B| = n_a + n_b − |A ∩ B| with
      -- distinct shingles, so the jaccard double is bit-identical)
      -- but O(shared postings) instead of O(docs²) — see the CC
      -- oracle note
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS isect
      FROM post a JOIN post b
        ON a.source = b.source AND a.g = b.g AND b.doc_id > a.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           CAST(isect AS DOUBLE) / (sa.n + sb.n - isect) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = inter.id_a
    JOIN sizes sb ON sb.doc_id = inter.id_b
    WHERE CAST(isect AS DOUBLE) / (sa.n + sb.n - isect) >= 0.5
    """,
)
def q_dedup_ngram(spark, sf_dir):
    # Inverted-index shingle join — the scalable exact-Jaccard shape:
    # explode distinct shingles, self-join on the shingle (pairs only
    # materialize when they share ≥1 shingle — required by j ≥ 0.5),
    # count shared postings, derive jaccard from set sizes. Shuffle is
    # O(postings), never O(block²) like an all-pairs block join.
    # Postings are built by dd.shingle_posts (map-side slice +
    # arrays_zip windows, codegen end-to-end) and carry xxhash64 int64 keys, not
    # shingle strings: the self-join shuffles 8-byte keys instead of
    # 20-40-byte strings — measured ~4x faster posting build at sf0.1
    # and a halved-plus exchange at 100 TB. Hash collisions
    # (~n²/2⁶⁴ < 1e-6 corpus-wide) could only overcount n_shared.
    corpus = _dup_corpus(spark, sf_dir)
    return _ngram_pairs(corpus)


def _ngram_pairs(corpus, threshold: float = 0.5):
    """Exact Jaccard near-dup pairs over an inverted shingle index
    (the q_dedup_ngram plan, factored for reuse by group resolution).

    The plan is a postings self-join + streaming count aggregate: the
    join's row count is the candidate mass Σ_g df(g)², and every row
    flows through a map-side-combined hash aggregate — nothing
    per-pair is ever materialized (the r13 probe tried the
    prefix-filter + array-verify alternative (SSJoin/PPJoin) and the
    per-candidate ARRAY join wrote ~230 GB of shuffle at sf10; the
    streaming count shape is strictly better here because candidates
    sharing ≥1 rare shingle are the dominant mass, not hot-shingle
    skew — the hottest prefix shingle at 500k docs has df=51).

    r13 probe attribution — the growth law: the candidate mass is quadratic in
      corpus density at FIXED vocabulary (df ∝ n ⇒ Σ df² ∝ n²/|grams|
      — measured 19.1M at 50k docs → 1.57G at 500k = 82× across the
      10× decade; wall grew 28×, sub-linear in the mass). This is the
      cost of EXACT Jaccard semantics, not a plan defect; real
      corpora grow vocabulary with size (Heaps' law) and sit far
      below this synthetic fixed-vocab bound, and the documented
      unbounded-corpus path is MinHash LSH (q_dedup_minhash: 3.2×
      across the same decade). A length filter (t·|A| ≤ |B| ≤ |A|/t)
      was tried and REMOVED: attaching n_sh to every posting row cost
      3× at sf1 while the join's row production — not the aggregate —
      is the bottleneck, so it bought nothing at sf10."""
    posts = dd.shingle_posts(corpus, ("doc_id", "source"), "text", 3)
    nsh = posts.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = posts.alias("a"), posts.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("b.doc_id") > F.col("a.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    # set sizes ride a tiny per-doc dim joined onto the few surviving
    # pairs (broadcast), not every posting row
    jac = F.col("n_shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    )
    return (
        shared.join(
            F.broadcast(nsh.withColumnsRenamed({"doc_id": "id_a", "n_sh": "n_a"})), "id_a"
        )
        .join(
            F.broadcast(nsh.withColumnsRenamed({"doc_id": "id_b", "n_sh": "n_b"})), "id_b"
        )
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# X3 — similarity search: exact kNN (oracle) + SRP-LSH (rows-only)
# ---------------------------------------------------------------------------

@register(
    "q_knn",
    oracle="""
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT query_id, neighbor_id, sim,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) AS INT) AS rank
      FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[])), 5) AS sim
        FROM embeddings q, embeddings c
        WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
      )
    ) WHERE rank <= 10
    """,
)
def q_knn(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return sim.knn_exact(queries, emb, k=10)


@register(
    "q_dedup_embedding",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 5) AS sim
    FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 5) >= 0.3
    """,
)
def q_dedup_embedding(spark, sf_dir):
    # Embedding-cosine near-dup: vectorized (BLAS) pair scan against a
    # broadcast unit-normalized corpus matrix — see
    # operators.similarity.embedding_near_dup_pairs for the 100 TB
    # blocking strategy (SRP-LSH buckets feeding the same verifier).
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.embedding_near_dup_pairs(emb, threshold=0.3)


@register("q_knn_lsh")
def q_knn_lsh(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return sim.knn_lsh(queries, emb, k=10, bits=16, num_bands=8).orderBy(
        "query_id", "rank"
    )


@register("q_ivf_knn")
def q_ivf_knn(spark, sf_dir):
    # IVF coarse quantizer: half the candidate budget of the SRP
    # setting above (nprobe/n_centroids = 0.5 vs SRP's measured ~0.9
    # collision rate on this corpus) — the learned-centroid rung of
    # the ANN ladder. Recall-vs-budget head-to-head is pytest-gated
    # (tests/test_operators.py::test_ivf_beats_srp_at_equal_budget).
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return sim.ivf_knn(
        queries, emb, k=10, n_centroids=16, nprobe=8
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# X4 — text analysis
# ---------------------------------------------------------------------------

@register(
    "q_text_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           {davg_sql('n_chars')} AS avg_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY lang
    """,
)
def q_text_stats(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    from mongo_olap_spark.functions.expressions import davg

    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tx.token_count("text").cast("long")).alias("total_tokens"),
        davg("n_chars", "avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "q_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '{tx.BPE_REGEX}')) AS INT) AS n_bpe_tokens
    FROM documents
    """,
)
def q_token_count(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.token_count("text").alias("n_ws_tokens"),
        tx.bpe_token_count("text").cast("int").alias("n_bpe_tokens"),
    )


_QUALITY_SQL = """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           (CAST(length(text) AS DOUBLE) - (len(string_split(text, ' ')) - 1))
             / len(string_split(text, ' ')) AS avg_token_len,
           CAST(len(list_filter(string_split(text, ' '),
                t -> list_contains(['the','of','and','a','to','in','is','it','that','for'], t)))
                AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio
    FROM documents
"""


@register("q_quality_score", oracle=_QUALITY_SQL)
def q_quality_score(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.token_count("text").alias("n_tokens"),
        tx.avg_token_len("text").alias("avg_token_len"),
        tx.stopword_ratio("text").alias("stopword_ratio"),
    )


@register("q_lang_id")
def q_lang_id(spark, sf_dir):
    # r17: per-doc trigram scoring is the cost; a one-file corpus
    # scans as ONE task and serializes it (sf1: c8 == c32 == 8.1 s).
    # spread_small_scan floors the map parallelism at core count when
    # (and only when) the scan layout is narrower — no-op at scale.
    from mongo_olap_spark.sources.tables import spread_small_scan

    d = spread_small_scan(
        load_table(spark, sf_dir, "documents"), "doc_id")
    return d.select(
        "doc_id",
        "lang",
        tx.lang_id("text").alias("lang_pred"),
        tx.quality_score("text").alias("quality"),
        tx.rolling_hash("text").alias("rhash"),
    ).orderBy("doc_id")


@register(
    "q_fingerprint",
    oracle="""
    SELECT doc_id, md5(text) AS fp_md5 FROM documents
    """,
)
def q_fingerprint(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", tx.fingerprint_md5("text").alias("fp_md5"))


# ---------------------------------------------------------------------------
# X6 — JSON prop extraction (dynamic-schema columns)
# ---------------------------------------------------------------------------

@register(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS n_with_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_extract(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


#: Inferred props schemas by dataset dir (define-time persistence
#: stand-in; see q_json_struct).
_PROPS_SCHEMA_CACHE: dict = {}


@register(
    "q_json_struct",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           {davg_sql("CAST(json_extract_string(props, '$.k') AS BIGINT)")} AS avg_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    GROUP BY event_type
    """,
)
def q_json_struct(spark, sf_dir):
    # Typed dynamic-schema path: infer the props schema once (cube-
    # define time in a real deployment — persisted with the spec), then
    # from_json ONCE into a struct; downstream predicates/aggregates
    # run on typed columns (prunable, no per-access JSON re-parsing
    # like get_json_object incurs).
    from mongo_olap_spark.functions.expressions import davg
    from mongo_olap_spark.sources.json_props import infer_props_schema, with_typed_props

    e = load_table(spark, sf_dir, "events")
    schema = _PROPS_SCHEMA_CACHE.get(sf_dir)
    if schema is None:
        # one inference job per dataset per process — the in-process
        # stand-in for "persisted with the cube spec at define time"
        schema = infer_props_schema(e, "props")
        _PROPS_SCHEMA_CACHE[sf_dir] = schema
    typed = with_typed_props(e, schema)
    k = F.col("props_t.k").cast("long")
    return (
        typed.filter(k > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            davg(k, "avg_k"),
        )
    )


# ---------------------------------------------------------------------------
# X5 — multimodal binary plumbing (Arrow-batched mapInPandas stage with
# deterministic fake features; oracle checks the full path)
# ---------------------------------------------------------------------------

@register(
    "q_multimodal",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(range(1, least(length(text), 64) + 1),
                                        i -> unicode(text[i]))) AS DOUBLE) / 255.0 AS feature0,
           CAST(octet_length(encode(text)) % 997 AS DOUBLE) / 997.0 AS feature1
    FROM documents
    """,
)
def q_multimodal(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    payloads = mm.attach_binary_payload(d)
    return mm.extract_features(payloads)


# The decode seam end-to-end: JVM-side synthesized 4x4 P6 payloads
# (pixel i = (doc_id + i) % 256) -> injectable ppm_codec decode ->
# pixel-stat feature stage, both Arrow mapInPandas. The oracle
# recomputes the decoded mean from the pixel model's closed form:
# with r = doc_id % 256, pixels are r..r+47 wrapping at 256, so
# sum = 48r + 1128 - 256 * max(r - 208, 0).
@register(
    "q_multimodal_decode",
    oracle="""
    SELECT doc_id,
           4 AS width, 4 AS height, 3 AS channels,
           (48 * (doc_id % 256) + 1128
              - 256 * greatest((doc_id % 256) - 208, 0)) / 48.0 AS mean_pixel
    FROM documents
    """,
)
def q_multimodal_decode(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    decoded = mm.decode_image(mm.synth_ppm_payload(d), codec=mm.ppm_codec)
    return mm.image_stats(decoded)


# ---------------------------------------------------------------------------
# X4 — repetition metrics (Gopher-style quality signals): fraction of
# duplicate words and duplicate bigrams per document. Spark side is
# pure array expressions (split / slice / arrays_zip / array_distinct)
# — no explode, no shuffle, no lambda HOF — so the whole metric
# pipelines inside the parquet scan at any scale. The oracle replays
# the same counts via unnest + lead (DuckDB can't list_distinct struct
# lists).
# ---------------------------------------------------------------------------

@register(
    "q_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    base AS (
      SELECT doc_id, len(t) AS n, len(list_distinct(t)) AS nd FROM toks
    ),
    flat AS (
      SELECT doc_id, unnest(t) AS tok, unnest(generate_series(1, len(t))) AS ord
      FROM toks
    ),
    big AS (
      SELECT doc_id,
             tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS bg
      FROM flat
    ),
    bstats AS (
      SELECT doc_id, count(bg) AS nb, count(DISTINCT bg) AS nbd
      FROM big GROUP BY doc_id
    )
    SELECT b.doc_id,
           1 - CAST(nd AS DOUBLE) / CAST(n AS DOUBLE) AS dup_word_frac,
           CASE WHEN nb >= 1
                THEN 1 - CAST(nbd AS DOUBLE) / CAST(nb AS DOUBLE) END AS dup_bigram_frac
    FROM base b JOIN bstats USING (doc_id)
    """,
)
def q_repetition(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.dup_word_fraction("text").alias("dup_word_frac"),
        tx.dup_ngram_fraction("text", 2).alias("dup_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# X4 — corpus cleaning / PII scrub: the standard pre-training redaction
# + normalization pass (mask emails, phone-shaped runs, long digit
# runs; lowercase; collapse whitespace). The query plants PII-shaped
# strings derived from the table itself (both engines build the same
# input) so the scrub provably fires; md5 of the cleaned text makes the
# comparison hash-exact. The regexes use only Java/RE2-identical
# constructs (operators/text.py PII_PATTERNS).
# ---------------------------------------------------------------------------

_CLEAN_INPUT_SQL = (
    "text || ' Reach user' || CAST(doc_id AS VARCHAR) || '@example.com  or call"
    " +1 555 014-2 id ' || lpad(CAST(doc_id AS VARCHAR), 9, '7')"
)

@register(
    "q_text_clean",
    oracle=f"""
    WITH raw AS (SELECT doc_id, {_CLEAN_INPUT_SQL} AS t FROM documents),
    scrubbed AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(t,
                   '[a-z0-9._%+\\-]+@[a-z0-9.\\-]+\\.[a-z][a-z]+', '<EMAIL>', 'g'),
                 '[0-9]{{6,}}', '<NUM>', 'g'),
               '\\+?[0-9][0-9 ()\\-]{{5,}}[0-9]', '<PHONE>', 'g') AS t
      FROM raw
    ),
    clean AS (
      SELECT doc_id, trim(regexp_replace(lower(t), '\\s+', ' ', 'g')) AS t
      FROM scrubbed
    )
    SELECT doc_id, md5(t) AS clean_md5, length(t) AS clean_len FROM clean
    """,
)
def q_text_clean(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" Reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com  or call +1 555 014-2 id "),
        F.lpad(F.col("doc_id").cast("string"), 9, "7"),
    )
    clean = tx.clean_text(raw)
    return d.select(
        "doc_id",
        F.md5(clean).alias("clean_md5"),
        F.length(clean).alias("clean_len"),
    )


# ---------------------------------------------------------------------------
# X4 — token-window chunking: split each document into fixed-size token
# windows (size 32, stride 24 — overlapping), the standard
# training-sample generation step. Spark-first shape: the chunk index
# is generated with sequence() + explode and the window is slice() on
# the token array — all native expressions, distributed with the rows;
# output row count is O(total_tokens / stride), never a driver loop.
# ---------------------------------------------------------------------------

@register(
    "q_chunk",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    c AS (
      SELECT doc_id, toks,
             unnest(generate_series(0,
               CAST(floor((len(toks) - 1) / 24) AS BIGINT))) AS chunk_idx
      FROM t
    )
    SELECT doc_id, chunk_idx,
           array_to_string(toks[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ')
             AS chunk,
           least(32, len(toks) - chunk_idx * 24) AS n_tok
    FROM c
    """,
)
def q_chunk(spark, sf_dir, size: int = 32, stride: int = 24):
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    with_idx = d.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.floor((n - 1) / stride))
        ).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    return with_idx.select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(" ", F.slice("toks", (start + 1).cast("int"), size)).alias("chunk"),
        F.least(F.lit(size), F.size("toks") - start).cast("int").alias("n_tok"),
    )


# ---------------------------------------------------------------------------
# X4 — corpus unigram log-probability scoring (the simplest LM quality
# filter): build the corpus vocabulary frequency table, broadcast it
# back onto the token stream, sum per-doc log p(tok). Two aggregations
# + one broadcast join — the frequency table is O(vocab), tiny relative
# to the corpus, so the doc-side pass is shuffle-free until the final
# per-doc reduce. Per-token log-probs are rounded to 9 decimals and
# accumulated in DECIMAL so the sum is order- and engine-independent.
# ---------------------------------------------------------------------------

@register(
    "q_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM freq)
    SELECT doc_id,
           CAST(sum(CAST(round(ln(CAST(c AS DOUBLE) / t), 9)
                         AS DECIMAL(38,9))) AS DOUBLE) AS logprob,
           CAST(count(*) AS BIGINT) AS n_tok
    FROM toks JOIN freq USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def q_unigram_logprob(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.agg(F.sum("c").cast("double").alias("t"))
    logp = F.round(F.log(F.col("c").cast("double") / F.col("t")), 9).cast(
        "decimal(38,9)"
    )
    return (
        toks.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum(logp).cast("double").alias("logprob"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )


# ---------------------------------------------------------------------------
# X2'' — dup-GROUP resolution: pairs → connected components → canonical
# doc per group. The full dedup story a training-data pipeline needs:
# after pair generation, transitively close (A~B, B~C ⇒ one group) and
# keep one survivor per group. Oracle: DuckDB recursive CTE computes
# the same transitive closure — fully SQL-checkable, planted dups and
# all.
# ---------------------------------------------------------------------------

_FULL_DUP_CORPUS_SQL = f"""
    SELECT doc_id, text, source FROM documents
    UNION ALL
    SELECT doc_id + {_OFF_SQL}, text, source FROM documents WHERE doc_id % 7 = 0
    UNION ALL
    SELECT doc_id + 2 * {_OFF_SQL},
           array_to_string(list_slice(string_split(text, ' '), 1,
             greatest(len(string_split(text, ' ')) - 3, 1)), ' ') AS text,
           source
    FROM documents WHERE doc_id % 11 = 0
"""

_CC_ORACLE_PREFIX = f"""
    WITH RECURSIVE corpus AS ({_FULL_DUP_CORPUS_SQL}),
    sh AS (
      SELECT doc_id, source,
             list_distinct(list_transform(
               range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
               i -> concat_ws(' ', string_split(text,' ')[i],
                                   string_split(text,' ')[i+1],
                                   string_split(text,' ')[i+2])
             )) AS shingles
      FROM corpus
    ),
    post AS (
      SELECT doc_id, source, unnest(shingles) AS g FROM sh
    ),
    sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
    inter AS (
      -- postings equi-join, not all-pairs: a pair only materializes
      -- when the docs share a shingle (required by j >= 0.5 anyway).
      -- Equivalent to the nested-loop list_intersect formulation —
      -- |A ∪ B| = n_a + n_b − |A ∩ B| exactly (shingles are distinct)
      -- — but O(shared postings) instead of O(docs²): the sf1 gate's
      -- nested-loop form needed hours, this runs in seconds and the
      -- same rewrite speeds the sf0.01 driver gate
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS isect
      FROM post a JOIN post b
        ON a.source = b.source AND a.g = b.g AND b.doc_id > a.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = inter.id_a
      JOIN sizes sb ON sb.doc_id = inter.id_b
      WHERE CAST(isect AS DOUBLE) / (sa.n + sb.n - isect) >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM corpus
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
    ),
    groups AS (
      SELECT node AS doc_id, min(r) AS group_id FROM reach GROUP BY node
    )
"""


def _full_dup_corpus(spark, sf_dir):
    """Base docs + exact copies (+1M ids) + truncated near-copies
    (+2M ids) — exact and near dups chain into one component."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    off = _dup_offset(spark, sf_dir)
    exact = d.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(off)
    )
    toks = F.split("text", " ")
    near = (
        d.filter(F.col("doc_id") % 11 == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(2 * off))
        .withColumn(
            "text",
            F.concat_ws(" ", F.slice(toks, 1, F.greatest(F.size(toks) - 3, F.lit(1)))),
        )
    )
    return d.unionByName(exact).unionByName(near)


@register(
    "q_dup_groups",
    oracle=_CC_ORACLE_PREFIX + "SELECT doc_id, group_id FROM groups",
)
def q_dup_groups(spark, sf_dir):
    corpus = _full_dup_corpus(spark, sf_dir)
    pairs = _ngram_pairs(corpus)
    return dd.connected_components(
        pairs, corpus.select(F.col("doc_id").alias("node"))
    ).withColumnRenamed("node", "doc_id")


@register(
    "q_dedup_keep",
    oracle=_CC_ORACLE_PREFIX
    + """
    SELECT group_id, keep_id, n_members FROM (
      SELECT g.group_id, c.doc_id AS keep_id,
             row_number() OVER (PARTITION BY g.group_id
                                ORDER BY len(c.text) DESC, c.doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY g.group_id) AS n_members
      FROM groups g JOIN corpus c ON g.doc_id = c.doc_id
    ) WHERE rn = 1
    """,
)
def q_dedup_keep(spark, sf_dir):
    # canonical survivor per dup group: longest text, then smallest id
    # (deterministic). The group dim is tiny relative to the corpus, so
    # the join shuffles |corpus| rows once; the window partitions are
    # dup groups (bounded), never a hot key. r16: the survivor rule
    # only reads LENGTHS, so the corpus side is projected to
    # (doc_id, length(text)) BEFORE the join — the exchange (or the
    # broadcast the local planner picks) carries 16-byte rows, never
    # the text payload (guide §2.3: shuffle metadata, not payloads).
    from pyspark.sql import Window

    corpus = _full_dup_corpus(spark, sf_dir)
    pairs = _ngram_pairs(corpus)
    groups = dd.connected_components(
        pairs, corpus.select(F.col("doc_id").alias("node"))
    ).withColumnRenamed("node", "doc_id")
    lens = corpus.select("doc_id", F.length("text").alias("_tlen"))
    joined = groups.join(lens, "doc_id")
    w = Window.partitionBy("group_id").orderBy(
        F.col("_tlen").desc(), F.col("doc_id")
    )
    return (
        joined.select(
            "group_id",
            F.col("doc_id").alias("keep_id"),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("group_id")).alias("n_members"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# X4' — composed quality filter: keep/drop with per-rule reasons (the
# decision layer a training-data pipeline runs over the raw signals)
# ---------------------------------------------------------------------------

@register(
    "q_quality_filter",
    oracle=f"""
    WITH q AS ({_QUALITY_SQL})
    SELECT doc_id,
           COALESCE(array_to_string(
             list_filter([CASE WHEN n_tokens < 30 THEN 'too_short' END,
                          CASE WHEN stopword_ratio < 0.03 THEN 'low_stopword' END,
                          CASE WHEN avg_token_len > 8 THEN 'long_tokens' END],
                         x -> x IS NOT NULL), ','), '') AS reasons,
           (n_tokens >= 30 AND stopword_ratio >= 0.03 AND avg_token_len <= 8) AS keep
    FROM q
    """,
)
def q_quality_filter(spark, sf_dir):
    # reasons serialized to a csv string (repo comparer policy for
    # array columns — see q_agg_collect); empty string = keep
    d = load_table(spark, sf_dir, "documents")
    flags = tx.quality_flags("text")
    return d.select(
        "doc_id",
        F.array_join(flags, ",").alias("reasons"),
        (F.size(flags) == 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# X4'' — benchmark decontamination: flag training docs sharing ≥ K
# distinct 5-gram shingles with any doc of an eval/benchmark set. The
# testbed plants the leak deterministically: the "benchmark" is a
# verbatim copy (+3M ids) of every doc_id % 50 == 0 — both engines
# build the identical eval set, so the oracle checks the detection
# semantics end-to-end.
#
# Scale shape: the benchmark set is SMALL (thousands of eval items vs
# a 100 TB corpus), so its postings broadcast; the corpus-side posting
# stream probes the broadcast map-side — the ONLY shuffle is the pair
# aggregation over matching postings, O(|matches|), never O(|corpus|²)
# and never a corpus-wide shuffle.
# ---------------------------------------------------------------------------

_SHINGLE5_SQL = """
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split(text,' ')) - 4, 1) + 1),
               i -> concat_ws(' ', string_split(text,' ')[i],
                                   string_split(text,' ')[i+1],
                                   string_split(text,' ')[i+2],
                                   string_split(text,' ')[i+3],
                                   string_split(text,' ')[i+4])
             )) AS shingles
      FROM {src}
"""


@register(
    "q_decontaminate",
    oracle=f"""
    WITH sh AS ({_SHINGLE5_SQL.format(src="documents")}),
    -- postings equi-join, not all-pairs: per-doc shingle lists are
    -- list_distinct, so COUNT(*) of equal-shingle pairs equals
    -- len(list_intersect) (verified equal at sf0.01/sf0.1; 6x faster
    -- at sf0.1, the gap grows quadratically with corpus size)
    p AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    ev AS (
      SELECT doc_id + 3000000 AS eval_id, unnest(shingles) AS s
      FROM sh WHERE doc_id % 50 = 0
    )
    SELECT p.doc_id, ev.eval_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM p JOIN ev ON p.s = ev.s
    GROUP BY p.doc_id, ev.eval_id
    HAVING COUNT(*) >= 3
    """,
)
def q_decontaminate(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    evals = d.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 3_000_000
    )
    posts = dd.shingle_posts(d, ("doc_id",), "text", 5)
    ev_posts = (
        dd.shingle_posts(evals, ("doc_id",), "text", 5)
        .withColumnsRenamed({"doc_id": "eval_id", "h": "eh"})
    )
    return (
        posts.join(F.broadcast(ev_posts), F.col("h") == F.col("eh"))
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
    )


# ---------------------------------------------------------------------------
# X4''' — vocabulary build: top-k tokens by corpus frequency with
# cumulative coverage share (the tokenizer-training precursor). One
# explode + one count shuffle + one tiny window over k rows.
# ---------------------------------------------------------------------------

@register(
    "q_vocab",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    freq AS (
      SELECT token, COUNT(*) AS n FROM tok GROUP BY token
    ),
    tot AS (SELECT SUM(n) AS total FROM freq)
    SELECT token, n,
           CAST(SUM(n) OVER (ORDER BY n DESC, token
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / (SELECT total FROM tot) AS coverage
    FROM freq
    ORDER BY n DESC, token
    LIMIT 200
    """,
)
def q_vocab(spark, sf_dir):
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # corpus-total joined as a 1-row broadcast literal, not a collect
    total = freq.agg(F.sum("n").alias("total"))
    # top-k FIRST (TakeOrderedAndProject — never a global sort), THEN
    # the cumulative window over just k rows: rank-i coverage only
    # depends on the rows above it, so limiting before the unpartitioned
    # window is answer-identical and keeps the single-reducer frame at
    # k rows instead of the whole vocabulary
    top = freq.orderBy(F.desc("n"), "token").limit(200)
    w = W.orderBy(F.desc("n"), "token").rowsBetween(W.unboundedPreceding, 0)
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "token",
            "n",
            (F.sum("n").over(w).cast("double") / F.col("total")).alias("coverage"),
        )
        .orderBy(F.desc("n"), "token")
    )


# ---------------------------------------------------------------------------
# X4'''' — sequence packing layout: concat-and-chunk the corpus into
# fixed token-budget training bins. Each doc's start offset in the
# per-source token stream is a window prefix-sum; bin id and offset
# within the bin are arithmetic on it — fully deterministic, no
# bin-state iteration, one shuffle on the stream key.
# ---------------------------------------------------------------------------

@register(
    "q_pack",
    oracle="""
    SELECT doc_id, source, n_tokens,
           CAST(FLOOR(start_tok / 2048) AS BIGINT) AS bin_id,
           CAST(start_tok % 2048 AS BIGINT) AS bin_offset
    FROM (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - CAST(len(string_split(text, ' ')) AS BIGINT) AS start_tok
      FROM documents
    )
    """,
)
def q_pack(spark, sf_dir, bin_tokens: int = 2048):
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    n = tx.token_count("text").cast("long")
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    start = (F.sum(n).over(w) - n).alias("start_tok")
    return d.select("doc_id", "source", n.alias("n_tokens"), start).select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(F.col("start_tok") / bin_tokens).alias("bin_id"),
        (F.col("start_tok") % bin_tokens).alias("bin_offset"),
    )


# ---------------------------------------------------------------------------
# X1b — span-level exact dedup (C4/RefinedWeb-style repeated-span
# removal). Documents are cut into fixed 10-word chunks; every chunk
# that already occurred anywhere in the corpus (first occurrence =
# smallest (doc_id, position)) is dropped; surviving chunks reassemble
# the cleaned document. Scale shape: chunking is pure array exprs in
# the scan; the dedup is ONE shuffle keyed on the chunk text (small:
# 10 words), the rebuild ONE shuffle on doc_id; full-copy documents
# lose every chunk and vanish — same as paragraph dedup at 100 TB.
# ---------------------------------------------------------------------------

SPAN_WORDS = 10


@register(
    "q_dedup_spans",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_SQL}),
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM corpus
    ),
    idxs AS (
      SELECT doc_id, t,
             unnest(generate_series(0, CAST(ceil(len(t) / {SPAN_WORDS}.0) AS INT) - 1))
               AS idx
      FROM toks
    ),
    chunks AS (
      SELECT doc_id, idx,
             array_to_string(t[(idx * {SPAN_WORDS} + 1):((idx + 1) * {SPAN_WORDS})], ' ')
               AS chunk
      FROM idxs
    ),
    kept AS (
      SELECT doc_id, idx, chunk,
             row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
      FROM chunks
    )
    SELECT doc_id,
           string_agg(chunk, ' ' ORDER BY idx) AS clean_text,
           CAST(COUNT(*) AS INT) AS n_kept
    FROM kept WHERE rn = 1
    GROUP BY doc_id
    """,
)
def q_dedup_spans(spark, sf_dir):
    return dd.dedup_spans(_dup_corpus(spark, sf_dir), span_words=SPAN_WORDS)


# ---------------------------------------------------------------------------
# X3b — $vectorSearch (Atlas surface) compiled through the pipeline
# language: exact ENN over the embeddings collection, query vector =
# vec_id 0 (collected driver-side: one row, the literal the stage
# expects). Score is Atlas's normalized cosine (1+cos)/2 rounded 5dp.
# ---------------------------------------------------------------------------

@register(
    "q_vector_search",
    oracle="""
    SELECT c.vec_id,
           round((1 + list_cosine_similarity(
                    CAST(c.embedding AS DOUBLE[]),
                    CAST((SELECT embedding FROM embeddings WHERE vec_id = 0)
                         AS DOUBLE[]))) / 2, 5) AS score
    FROM embeddings c
    WHERE c.vec_id <> 0
    ORDER BY score DESC, c.vec_id
    LIMIT 20
    """,
)
def q_vector_search(spark, sf_dir):
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return compile_pipeline(
        emb.select("vec_id", "embedding"),
        [
            {"$vectorSearch": {
                "path": "embedding",
                "queryVector": qv,
                "limit": 20,
                "exact": True,
                "filter": {"vec_id": {"$ne": 0}},
                "tieBreaker": "vec_id",
            }},
            {"$project": {"vec_id": 1, "score": 1}},
        ],
    )


# ---------------------------------------------------------------------------
# X4''' (r14): deterministic corpus splits — the fold-assignment step
# a training pipeline runs last. Plain split: engine-portable md5
# draw per doc (zero shuffle); leakage-safe split: the draw hashes
# the near-dup GROUP id so no dup pair straddles train/test.
# ---------------------------------------------------------------------------

_SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
#: 0.8·2^32 and 0.9·2^32 as 8-hex bounds — the same constants
#: operators/splits._thresholds derives; inlined for the SQL twin
_SPLIT_CASE_SQL = """CASE
      WHEN substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8)
           < 'cccccccc' THEN 'train'
      WHEN substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8)
           < 'e6666666' THEN 'val'
      ELSE 'test' END"""


@register(
    "q_split",
    oracle=f"""
    WITH s AS (
      SELECT {_SPLIT_CASE_SQL.format(salt='v1', key='doc_id')} AS split,
             text
      FROM documents
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(text)) AS BIGINT) AS n_chars
    FROM s GROUP BY split
    """,
)
def q_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment over the
    documents table, summarized per fold. The assignment column is a
    pure projection (md5 + CASE in one codegen span — no RNG state,
    stable under repartitioning, reproducible from ANY engine with
    md5); the summary is one keyed shuffle over 3 groups. At 100 TB
    the assignment adds zero shuffle to whatever pipeline it ends."""
    from mongo_olap_spark.operators.splits import deterministic_split

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    s = deterministic_split(d, "doc_id", _SPLIT_FRACTIONS, salt="v1")
    return s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
    )


@register(
    "q_split_leakage_safe",
    oracle=_CC_ORACLE_PREFIX + f"""
    SELECT doc_id, group_id,
           {_SPLIT_CASE_SQL.format(salt='ls1', key='group_id')} AS split
    FROM groups
    """,
)
def q_split_leakage_safe(spark, sf_dir):
    """Leakage-safe fold assignment: near-duplicate documents (ngram-
    Jaccard dup groups over the constructed dup corpus) always land in
    the SAME fold — the md5 draw hashes the group id, not the doc id,
    so held-out evaluation can never see a near-copy of a training
    document. Inherits the dedup pipeline's banded shuffles; the
    assignment itself adds only the (doc_id → group_id) map join.
    Differentially pinned: the same union-find closure the sf10
    census re-derives, plus a pytest that NO group spans two folds.

    Plan note: connected components already emits every corpus node
    with its group id, so the split column applies DIRECTLY to that
    frame (operators/splits.split_column — the same expression
    leakage_safe_split composes). The first cut instead joined the
    corpus to the groups frame and then re-joined groups for the
    group_id column — executing the whole pairs+CC subplan twice
    (7.7 s → ~3.9 s at sf0.1; the general operator, whose group map
    may be partial, keeps its join + singleton fallback and is
    pytested on its own)."""
    from mongo_olap_spark.operators.splits import split_column

    corpus = _full_dup_corpus(spark, sf_dir)
    pairs = _ngram_pairs(corpus)
    groups = dd.connected_components(
        pairs, corpus.select(F.col("doc_id").alias("node"))
    ).withColumnRenamed("node", "doc_id")
    return groups.select(
        "doc_id", "group_id",
        split_column("group_id", _SPLIT_FRACTIONS, salt="ls1")
        .alias("split"))


# ---------------------------------------------------------------------------
# X5' (r14): the remaining multimodal checklist stages — resize and
# frame-sample — with closed-form oracles over the synthetic rasters
# (pixel i of doc's buffer = (doc_id + i) % 256, so every resampled
# statistic is ANSI-recomputable).
# ---------------------------------------------------------------------------

@register(
    "q_multimodal_resize",
    # 4×4 → 2×2 nearest-neighbor: source rows/cols (i·4)//2 = {0, 2};
    # kept raster indices (y·4+x)·3+c for y,x ∈ {0,2}, c ∈ 0..2
    oracle="""
    SELECT doc_id,
           2 AS width, 2 AS height, 3 AS channels,
           list_sum(list_transform(
             [0,1,2, 6,7,8, 24,25,26, 30,31,32],
             i -> (doc_id + i) % 256)) / 12.0 AS mean_pixel
    FROM documents
    """,
)
def q_multimodal_resize(spark, sf_dir):
    """Decode → RESIZE → feature, all Arrow-batched: the 4×4 synthetic
    PPM downsamples to 2×2 by nearest neighbor (a real numpy gather —
    the stage a production pipeline swaps for LANCZOS), then the mean-
    pixel feature runs over the resized buffer. The oracle recomputes
    the exact 12 surviving pixel values from the closed-form raster."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    decoded = mm.decode_image(mm.synth_ppm_payload(d), codec=mm.ppm_codec)
    return mm.image_stats(mm.resize_image(decoded, 2, 2))


@register(
    "q_multimodal_frames",
    # 4 frames of 48 bytes; every_k=2 keeps frames {0, 2}; frame f's
    # bytes are (doc_id + 48f + i) % 256 for i in 0..47
    oracle="""
    SELECT doc_id, f AS frame_idx,
           list_sum(list_transform(range(0, 48),
             i -> (doc_id + 48 * f + i) % 256)) / 48.0 AS mean_pixel
    FROM documents, (SELECT unnest([0, 2]) AS f)
    """,
)
def q_multimodal_frames(spark, sf_dir):
    """Raw-video FRAME-SAMPLE → per-frame feature: a 4-frame raw
    buffer keeps every 2nd frame (one output row per kept frame —
    the fan-out stage; `repartition_by_bytes` precedes it at scale),
    then per-frame mean pixel. The ffmpeg demux this stands in for is
    the documented environment block; the framing math, fan-out
    schema, and Arrow batching are fully exercised and oracle-exact."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    frames = mm.sample_frames(
        mm.synth_video_payload(d, n_frames=4),
        width=4, height=4, channels=3, every_k=2)
    return mm.frame_stats(frames)


# ---------------------------------------------------------------------------
# X4''''' (r15): tokenizer-grade packing — deterministic byte-level
# BPE (operators/bpe.py) trained on the corpus itself, then the same
# prefix-sum packing layout as q_pack but over BPE TOKEN counts. No
# ANSI oracle exists for the merge recurrence (it is inherently
# iterative), so both queries are rows-only at the driver; the hard
# evidence is pytest: an INDEPENDENT naive O(V^2) reference trainer
# and a per-word reference encoder reproduce the engine's merges and
# token streams hash-exactly (tests/test_bpe.py), plus lossless
# roundtrip and repartition-stability properties.
# ---------------------------------------------------------------------------

_BPE_MERGES = 120


@register("q_bpe_vocab")
def q_bpe_vocab(spark, sf_dir):
    """Learned BPE merge table over the documents corpus: one
    distributed word-frequency agg (the only corpus-sized pass), then
    the deterministic dict-side merge loop — (count DESC, pair ASC)
    ranking, no RNG — emitting (rank, left, right, token, token_id).
    Scale shape: driver work is bounded by DISTINCT words (Heaps-law
    sub-linear), not corpus rows; the max_words cap reports retained
    coverage instead of truncating silently."""
    from mongo_olap_spark.operators import bpe

    d = load_table(spark, sf_dir, "documents").select("text")
    vocab = bpe.train_bpe_on(d, n_merges=_BPE_MERGES)
    return bpe.merges_table(spark, vocab).orderBy("rank")


@register("q_pack_bpe")
def q_pack_bpe(spark, sf_dir, bin_tokens: int = 2048):
    """Sequence packing by TOKENIZER tokens: the corpus' own BPE vocab
    (same deterministic trainer as q_bpe_vocab) encodes every doc in
    one Arrow-batched stage (per-executor word cache — Zipf collapses
    repeats to dict hits), then the q_pack prefix-sum layout assigns
    (bin_id, bin_offset) per doc within its source stream. The window
    is the only shuffle beyond training's word count; the encode stage
    is map-only. This is the production packing shape: bins hold
    exactly bin_tokens BPE tokens, not whitespace words."""
    from pyspark.sql import Window as W

    from mongo_olap_spark.operators import bpe

    d = load_table(spark, sf_dir, "documents")
    vocab = bpe.train_bpe_on(d.select("text"), n_merges=_BPE_MERGES)
    enc = bpe.encode_tokens_column(d, vocab, "text", out="tokens")
    # materialize ONLY the token count before the window: the first
    # cut referenced size(tokens) inside the window frame and Catalyst
    # shuffled the full token ARRAYS through the exchange — at 100 TB
    # that is the corpus riding a shuffle whose consumer needs one
    # long per doc (seen in .explain: tokens#... in the Exchange input)
    slim = enc.select(
        "doc_id", "source", F.size("tokens").cast("long").alias("n_tokens"))
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, 0)
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_tok")
    return slim.select("doc_id", "source", "n_tokens", start).select(
        "doc_id", "source", "n_tokens",
        F.floor(F.col("start_tok") / bin_tokens).alias("bin_id"),
        (F.col("start_tok") % bin_tokens).alias("bin_offset"),
    )


# ---------------------------------------------------------------------------
# X4'''' (r16, VERDICT r15 task 3): the END-TO-END LLM training-data
# pipeline — clean → exact-dedup(keep) → decontaminate → quality
# filter → mix → split — as ONE declared query, proving the operators
# COMPOSE (the thing a real user does first). The deterministic spine
# is fully ANSI-expressible, so the whole chain is oracle-gated
# hash-exact; the subword tail (BPE-encode → pack) is the companion
# q_pipeline_llm_pack below (rows-only by design, layout-invariant
# pytest — same policy as q_pack_bpe).
#
# Scale shape, stage by stage (the 100 TB argument):
#   clean        map-only projection (regex scrub + normalize)
#   dedup keep   ONE keyed shuffle on md5(clean_text); survivor =
#                smallest doc_id per hash group (row_number window)
#   decontam     eval postings BROADCAST (benchmarks are small);
#                shingling windows the exploded token stream per doc
#                (one token-stream shuffle); the probe is map-side
#                and the pair agg is O(|matches|) — never O(corpus²)
#   quality      map-only array expressions
#   mix          map-only md5-threshold sampling, zero shuffle
#   split        map-only md5 fold draw, zero shuffle
#   summary      one 12-group agg
# Net: TWO corpus-sized shuffles (the dedup key over rows, the
# shingle window over tokens) + an O(matches) agg for the whole
# pipeline — everything else rides map-side in codegen spans.
# ---------------------------------------------------------------------------

#: PII scrub → lower → collapse-whitespace → trim, DuckDB twin of
#: operators/text.clean_text (same construct set as q_text_clean)
_CLEAN_SQL = """trim(regexp_replace(lower(
      regexp_replace(
        regexp_replace(
          regexp_replace({col},
            '[a-z0-9._%+\\-]+@[a-z0-9.\\-]+\\.[a-z][a-z]+', '<EMAIL>', 'g'),
          '[0-9]{{6,}}', '<NUM>', 'g'),
        '\\+?[0-9][0-9 ()\\-]{{5,}}[0-9]', '<PHONE>', 'g')
    ), '\\s+', ' ', 'g'))"""

_SHINGLE5_T_SQL = """
      SELECT {id} AS sid, list_distinct(list_transform(
               range(1, greatest(len(string_split(t, ' ')) - 4, 1) + 1),
               i -> concat_ws(' ', string_split(t, ' ')[i],
                                   string_split(t, ' ')[i+1],
                                   string_split(t, ' ')[i+2],
                                   string_split(t, ' ')[i+3],
                                   string_split(t, ' ')[i+4])
             )) AS shingles
      FROM {src}
"""

_LLM_SPINE_SQL = f"""
    WITH clean AS (
      SELECT doc_id, source, {_CLEAN_SQL.format(col='text')} AS t
      FROM documents
    ),
    ded AS (
      SELECT doc_id, source, t FROM (
        SELECT doc_id, source, t,
               row_number() OVER (PARTITION BY md5(t)
                                  ORDER BY doc_id) AS rn
        FROM clean
      ) WHERE rn = 1
    ),
    sh AS ({_SHINGLE5_T_SQL.format(id='doc_id', src='clean')}),
    evsh AS ({_SHINGLE5_T_SQL.format(
        id='doc_id', src="clean WHERE doc_id % 50 = 0")}),
    p AS (SELECT sid AS doc_id, unnest(shingles) AS s FROM sh),
    ev AS (SELECT sid AS eval_id, unnest(shingles) AS s FROM evsh),
    contaminated AS (
      SELECT DISTINCT doc_id FROM (
        SELECT p.doc_id, ev.eval_id FROM p JOIN ev ON p.s = ev.s
        GROUP BY p.doc_id, ev.eval_id HAVING COUNT(*) >= 3)
    ),
    surv AS (
      SELECT * FROM ded
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    q AS (
      SELECT doc_id, source, t,
             len(string_split(t, ' ')) AS n_tokens,
             (CAST(length(t) AS DOUBLE) - (len(string_split(t, ' ')) - 1))
               / len(string_split(t, ' ')) AS avg_token_len,
             CAST(len(list_filter(string_split(t, ' '),
                  x -> list_contains(['the','of','and','a','to','in',
                                      'is','it','that','for'], x)))
                  AS DOUBLE) / len(string_split(t, ' ')) AS stopword_ratio
      FROM surv
    ),
    kept AS (
      SELECT * FROM q
      WHERE n_tokens >= 30 AND stopword_ratio >= 0.03
        AND avg_token_len <= 8
    ),
    mixed AS (
      SELECT *, CAST(substr(source, 4, 10) AS INT) // 5 AS source_grp
      FROM kept
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
            CASE CAST(substr(source, 4, 10) AS INT) // 5
              WHEN 0 THEN 'g0000000'
              WHEN 1 THEN '80000000'
              WHEN 2 THEN '40000000'
              ELSE '10000000' END
    ),
    final AS (
      SELECT *, {_SPLIT_CASE_SQL.format(salt='llm1', key='doc_id')} AS split
      FROM mixed
    )
"""


def _llm_spine(spark, sf_dir):
    """The Spark side of the deterministic pipeline spine: one row per
    surviving training document with (doc_id, source, t, source_grp,
    split). Shared by q_pipeline_llm (oracle-gated summary) and
    q_pipeline_llm_pack (BPE tail)."""
    from mongo_olap_spark.operators.splits import split_column

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    clean = d.select("doc_id", "source", tx.clean_text("text").alias("t"))
    # exact-dedup keep: survivor = smallest doc_id per cleaned-text
    # hash group (one keyed shuffle; the window partitions are dup
    # groups — bounded, never a hot key)
    wn = W.partitionBy(F.md5("t")).orderBy("doc_id")
    ded = (clean.withColumn("rn", F.row_number().over(wn))
           .filter(F.col("rn") == 1).drop("rn"))
    # decontaminate vs the (small, broadcast) benchmark set: the eval
    # copy is every doc_id % 50 == 0 of the CLEANED corpus, matched on
    # ≥3 shared distinct 5-gram shingles (q_decontaminate semantics).
    # Posts come from CLEAN, not DED: a dup twin has identical
    # shingles (identical cleaned text), so the contaminated-id set
    # restricted to dedup survivors is the same either way, and
    # probing pre-dedup keeps the dedup window subplan from executing
    # TWICE (Spark re-executes a DataFrame re-joined into its own
    # lineage — the first cut showed both WindowGroupLimit chains in
    # the physical plan; at 100 TB that is the corpus shuffled twice)
    posts = dd.shingle_posts(clean, ("doc_id",), "t", 5)
    evals = clean.filter(F.col("doc_id") % 50 == 0)
    ev_posts = (dd.shingle_posts(evals, ("doc_id",), "t", 5)
                .withColumnsRenamed({"doc_id": "eval_id", "h": "eh"}))
    contaminated = (
        posts.join(F.broadcast(ev_posts), F.col("h") == F.col("eh"))
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
        .select("doc_id").distinct())
    surv = ded.join(contaminated, "doc_id", "left_anti")
    kept = surv.filter(F.size(tx.quality_flags("t")) == 0)
    grp = F.floor(F.substring("source", 4, 10).cast("int") / 5)
    thr = (
        F.when(grp == 0, "g0000000")   # rate 1.0 (keep all)
        .when(grp == 1, "80000000")    # rate 0.5
        .when(grp == 2, "40000000")    # rate 0.25
        .otherwise("10000000")         # rate 0.0625
    )
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    mixed = kept.filter(h < thr).withColumn(
        "source_grp", grp.cast("long"))
    return mixed.withColumn(
        "split", split_column("doc_id", _SPLIT_FRACTIONS, salt="llm1"))


@register(
    "q_pipeline_llm",
    oracle=_LLM_SPINE_SQL + """
    SELECT split, CAST(source_grp AS BIGINT) AS source_grp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(t)) AS BIGINT) AS n_chars,
           CAST(SUM(n_tokens) AS BIGINT) AS n_toks
    FROM final GROUP BY split, source_grp
    """,
)
def q_pipeline_llm(spark, sf_dir):
    final = _llm_spine(spark, sf_dir)
    return final.groupBy("split", "source_grp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("t")).cast("long").alias("n_chars"),
        F.sum(tx.token_count("t").cast("long")).cast("long")
        .alias("n_toks"),
    )


@register("q_pipeline_llm_pack")
def q_pipeline_llm_pack(spark, sf_dir, bin_tokens: int = 2048):
    """The pipeline's subword tail: BPE-train on the surviving TRAIN
    fold only (no eval/test leakage into the tokenizer), Arrow-encode,
    pack into fixed bins per source stream (q_pack_bpe layout). Rows-
    only by design — the BPE merge recurrence has no ANSI twin; the
    spine feeding it IS oracle-gated (q_pipeline_llm) and the packed
    layout invariants are pytested (tests/test_bpe.py)."""
    from mongo_olap_spark.operators import bpe

    # localCheckpoint: the surviving train fold feeds TWO consumers —
    # the BPE-train action (word frequencies, runs now) and the
    # returned encode+pack plan (runs at the caller's action). Without
    # it the whole clean→dedup→decontaminate→quality→mix→split spine
    # (two corpus-sized shuffles) executes twice; materializing the
    # fold once costs one local write + read of the surviving rows
    # (~40% of the corpus) instead (guide §5 localCheckpoint; measured
    # 2.32 s → ~1.5 s at sf0.1). Same trade at 100 TB: a checkpoint
    # write of survivors vs re-running every spine shuffle.
    train = _llm_spine(spark, sf_dir).filter(
        F.col("split") == "train").select("doc_id", "source", "t"
                                          ).localCheckpoint()
    vocab = bpe.train_bpe_on(train.select("t"), "t",
                             n_merges=_BPE_MERGES)
    enc = bpe.encode_tokens_column(train, vocab, "t", out="tokens")
    slim = enc.select(
        "doc_id", "source",
        F.size("tokens").cast("long").alias("n_tokens"))
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, 0)
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
        "start_tok")
    return slim.select("doc_id", "source", "n_tokens", start).select(
        "doc_id", "source", "n_tokens",
        F.floor(F.col("start_tok") / bin_tokens).alias("bin_id"),
        (F.col("start_tok") % bin_tokens).alias("bin_offset"),
    )


# ---------------------------------------------------------------------------
# X12' (r16, VERDICT r15 task 5): training samples in TOKEN-ID space —
# chunking and vocabulary coverage re-based on BPE tokens, so the
# sample-generation path is subword end-to-end (q_chunk/q_vocab keep
# their whitespace variants for the ANSI oracle). Rows-only by design;
# layout invariants pytested like q_pack_bpe.
# ---------------------------------------------------------------------------

@register("q_chunk_bpe")
def q_chunk_bpe(spark, sf_dir, size: int = 32, stride: int = 24):
    """Fixed-size token-id windows (size 32, stride 24, overlapping)
    over the BPE-encoded corpus — the training-sample generator in
    token space. One Arrow encode stage, then native sequence() +
    explode + slice on the id array: the chunk fan-out is distributed
    with the rows, never a driver loop. Each chunk carries a decimal
    checksum of its ids so the pytest can pin chunk CONTENT (slice
    alignment), not just counts."""
    from mongo_olap_spark.operators import bpe

    d = load_table(spark, sf_dir, "documents")
    vocab = bpe.train_bpe_on(d.select("text"), n_merges=_BPE_MERGES)
    enc = bpe.encode_tokens_column(d, vocab, "text", out="toks")
    n = F.size("toks")
    # guard n == 0 (a doc whose every word is empty encodes to zero
    # tokens): sequence(0, floor(-1/stride)) = sequence(0, -1) would
    # DESCEND ([0, -1] — Spark defaults step to -1 when start > stop)
    # and emit two bogus chunk rows; an empty array explodes to none
    idx = F.when(
        n > 0,
        F.sequence(F.lit(0).cast("long"), F.floor((n - 1) / stride)),
    ).otherwise(F.array().cast("array<long>"))
    with_idx = enc.select(
        "doc_id", "toks",
        F.explode(idx).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    chunk = F.slice("toks", (start + 1).cast("int"), size)
    return with_idx.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).cast("int").alias("n_tok"),
        F.aggregate(chunk, F.lit(0).cast("long"),
                    lambda acc, x: acc + x.cast("long"))
        .alias("tok_sum"),
    )


@register("q_vocab_bpe")
def q_vocab_bpe(spark, sf_dir, k: int = 200):
    """Vocabulary coverage over TOKEN IDS: frequency of each BPE token
    id across the encoded corpus with cumulative coverage share — the
    token-space twin of q_vocab (which counts whitespace words). The
    explode rides int32 ids, not strings; one count shuffle + one tiny
    window over k rows."""
    from pyspark.sql import Window as Wk

    from mongo_olap_spark.operators import bpe

    d = load_table(spark, sf_dir, "documents")
    vocab = bpe.train_bpe_on(d.select("text"), n_merges=_BPE_MERGES)
    enc = bpe.encode_tokens_column(d, vocab, "text", out="toks")
    freq = (enc.select(F.explode("toks").alias("token_id"))
            .groupBy("token_id").agg(F.count(F.lit(1)).alias("n")))
    tot = freq.agg(F.sum("n").alias("total"))
    wk = Wk.orderBy(F.desc("n"), "token_id").rowsBetween(
        Wk.unboundedPreceding, 0)
    return (freq.crossJoin(F.broadcast(tot))
            .select("token_id", "n",
                    (F.sum("n").over(wk).cast("double")
                     / F.col("total").cast("double")).alias("coverage"))
            .orderBy(F.desc("n"), "token_id").limit(k))
