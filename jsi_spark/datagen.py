"""Deterministic synthetic docs + media_dim generation (FIXTURES.md §1-2).

Generated ENTIRELY with JVM-side expressions over ``spark.range`` —
xxhash64-derived pseudo-randomness, no Python per row — so the same
generator scales from the 1e3-row pytest tier to the 1e7+ bench tier and
produces identical content at any parallelism (partitioning never changes
values, only layout).

Injected violation classes (deterministic rates, FIXTURES.md §1):
- bogus span ``kind``              (enum)
- NULL ``text`` on a text span     (if/then required)
- NULL ``media_ref`` on media span (if/else required)
- negative ``offset``              (minimum)
- malformed ``doc_id``             (pattern)
- duplicate doc_id incl. one HOT key (corpus uniqueness + skew)
- dangling ``media_ref``           (referential)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsi_spark.plans.docs_schema import SPAN_KINDS

# per-mille violation rates
RATE_BOGUS_KIND = 8
RATE_NULL_TEXT = 6
RATE_NULL_MEDIA = 5
RATE_NEG_OFFSET = 5
RATE_BAD_DOC_ID = 6
RATE_DUP_DOC_ID = 10
RATE_HOT_DOC_ID = 4       # all collide on ONE doc_id → hot-key skew
RATE_DANGLING_REF = 10

HOT_DOC_ID = "doc-000000000"


def _u(cols, salt: str, seed: int):
    """Deterministic uniform in [0, 1000) from xxhash64."""
    return F.pmod(F.xxhash64(*cols, F.lit(salt), F.lit(seed)), F.lit(1000))


def gen_docs(spark: SparkSession, n_docs: int, n_media: int = 1000,
             seed: int = 42, partitions: int | None = None) -> DataFrame:
    df = spark.range(0, n_docs,
                     numPartitions=partitions) if partitions else \
        spark.range(n_docs)
    i = F.col("id")

    u_doc = _u([i], "doc", seed)
    doc_id = (
        F.when(u_doc < RATE_HOT_DOC_ID, F.lit(HOT_DOC_ID))
        .when(u_doc < RATE_HOT_DOC_ID + RATE_DUP_DOC_ID,
              F.format_string("doc-%09d", F.pmod(i, F.lit(97)) + 1))
        .when(u_doc < RATE_HOT_DOC_ID + RATE_DUP_DOC_ID + RATE_BAD_DOC_ID,
              F.format_string("DOC_%d", i))
        .otherwise(F.format_string("doc-%09d", i + 1000)))

    n_spans = (F.pmod(F.xxhash64(i, F.lit("nspans"), F.lit(seed)),
                      F.lit(31)) + 1).cast("int")

    def span(j):
        h = F.xxhash64(i, j, F.lit("span"), F.lit(seed))
        uk = F.pmod(h, F.lit(1000))
        kind = F.when(uk < RATE_BOGUS_KIND, F.lit("bogus")).otherwise(
            F.element_at(F.array(*[F.lit(k) for k in SPAN_KINDS]),
                         (F.pmod(h, F.lit(4)) + 1).cast("int")))
        is_text = kind == "text"
        u_t = _u([i, j], "text", seed)
        text = (F.when(~is_text, F.lit(None).cast("string"))
                .when(u_t < RATE_NULL_TEXT, F.lit(None).cast("string"))
                .otherwise(F.concat(
                    F.lit("tok"),
                    F.pmod(F.xxhash64(i, j, F.lit("w0"), F.lit(seed)),
                           F.lit(5000)).cast("string"),
                    F.lit(" tok"),
                    F.pmod(F.xxhash64(i, j, F.lit("w1"), F.lit(seed)),
                           F.lit(5000)).cast("string"))))
        u_m = _u([i, j], "media", seed)
        media_id = F.pmod(F.xxhash64(i, j, F.lit("mref"), F.lit(seed)),
                          F.lit(n_media))
        media_ref = (
            F.when(is_text, F.lit(None).cast("string"))
            .when(u_m < RATE_NULL_MEDIA, F.lit(None).cast("string"))
            .when(u_m < RATE_NULL_MEDIA + RATE_DANGLING_REF,
                  F.concat(F.lit("m"), (media_id + n_media).cast("string")))
            .otherwise(F.concat(F.lit("m"), media_id.cast("string"))))
        u_o = _u([i, j], "offset", seed)
        offset = (F.when(u_o < RATE_NEG_OFFSET, F.lit(-1))
                  .otherwise(j * 10 + F.pmod(h, F.lit(7)))).cast("int")
        return F.struct(kind.alias("kind"), text.alias("text"),
                        media_ref.alias("media_ref"), offset.alias("offset"))

    spans = F.transform(F.sequence(F.lit(0), n_spans - 1), span)
    return df.select(doc_id.alias("doc_id"), spans.alias("spans"))


def gen_media_dim(spark: SparkSession, n_media: int = 1000,
                  seed: int = 42) -> DataFrame:
    df = spark.range(n_media)
    i = F.col("id")
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"),
                                F.lit("video")),
                        (F.pmod(F.xxhash64(i, F.lit(seed)), F.lit(3)) + 1)
                        .cast("int"))
    return df.select(
        F.concat(F.lit("m"), i.cast("string")).alias("media_ref"),
        kind.alias("media_kind"),
        F.format_string("s3://media-bucket/%012d.bin", i).alias("uri"),
        (F.pmod(F.xxhash64(i, F.lit("sz"), F.lit(seed)), F.lit(10_000_000))
         + 1024).alias("bytes"))


def reference_spans(docs: DataFrame) -> DataFrame:
    """Exploded (doc_id, pos, kind, text, media_ref) tuples — the
    'reference expectations' side of the span-sequence-equality invariant
    (FIXTURES.md §6). Derived once, then persisted by tests as the golden
    copy the engine output is diffed against."""
    return docs.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select("doc_id", "pos", F.col("span.kind").alias("kind"),
             F.col("span.text").alias("text"),
             F.col("span.media_ref").alias("media_ref"))


# -- documents/embeddings-shaped corpora for dedup/ANN scale stress -----------------

# base stems in the driver testdata's documents.parquet style; the
# working vocabulary is stems × numeric suffixes (512 words): the
# testdata's literal 31-word vocab makes every long doc's DISTINCT-word
# set near-identical, so SimHash fingerprints collide pathologically
# (54k candidate pairs in a 5k-doc corpus) — real web text has ≥1e5
# vocab and docs are separable; 512 preserves that separation while
# keeping shingles collidable for the planted near-dup class.
DOC_STEMS = [
    "spark", "line", "column", "order", "small", "sort", "fast", "value",
    "scan", "batch", "part", "query", "agg", "table", "hash", "vector",
    "stream", "filter", "big", "merge", "group", "join", "key", "slow",
    "customer", "the", "a", "index", "page", "cache", "block", "shard",
]
DOC_VOCAB = [f"{w}{i}" if i else w for i in range(16) for w in DOC_STEMS]

# per-mille duplicate-structure rates (documents)
RATE_DOC_TEMPLATE = 5      # hot template cluster: ONE shared text
RATE_DOC_EXACT = 10        # exact duplicate of one of 199 base texts
RATE_DOC_NEAR = 20         # near duplicate: base text, one word swapped

# per-mille duplicate-structure rates (embeddings)
RATE_VEC_IDENTICAL = 3     # hot cluster: ONE shared vector
RATE_VEC_NEAR = 22         # near duplicate: base vector, one coord bumped


def gen_text_corpus(spark: SparkSession, n_docs: int, seed: int = 7,
                    partitions: int | None = None) -> DataFrame:
    """documents.parquet-shaped corpus (doc_id, text, lang, source,
    n_chars) with CONTROLLED duplicate structure, generated entirely
    JVM-side (xxhash64 pseudo-randomness — identical values at any
    parallelism). Duplicate classes, chosen per row:

    - template cluster (~0.5%): every row shares ONE text — the
      boilerplate hot bucket the LSH ``max_bucket_size`` cap must drop
      (a 100 TB corpus always has one: license headers, nav chrome).
    - exact dups (~1%): text of one of 199 base docs, verbatim.
    - near dups (~2%): base text of one of 211 docs with a single word
      substituted at a doc-specific position (high Jaccard, not 1.0).
    - unique (rest): fresh word sequence per doc, 8-96 words.
    """
    df = spark.range(0, n_docs, numPartitions=partitions) \
        if partitions else spark.range(n_docs)
    i = F.col("id")
    vocab = F.array(*[F.lit(w) for w in DOC_VOCAB])
    nv = len(DOC_VOCAB)

    u = _u([i], "dupclass", seed)
    t_exact = RATE_DOC_TEMPLATE + RATE_DOC_EXACT
    t_near = t_exact + RATE_DOC_NEAR
    content_seed = (
        F.when(u < RATE_DOC_TEMPLATE, F.lit(-1).cast("long"))
        .when(u < t_exact, F.pmod(i, F.lit(199)))
        .when(u < t_near, F.pmod(i, F.lit(211)) + 1000)
        .otherwise(i + 100_000))
    is_near = (u >= t_exact) & (u < t_near)

    n_words = (F.pmod(F.xxhash64(content_seed, F.lit("nw"), F.lit(seed)),
                      F.lit(89)) + 8)
    # 1-based substitution position for the near-dup variant; the swap
    # word derives from the DOC id so variants differ from each other
    swap_pos = F.pmod(F.xxhash64(i, F.lit("pos"), F.lit(seed)), n_words) + 1
    swap_word = F.element_at(
        vocab, (F.pmod(F.xxhash64(i, F.lit("vw"), F.lit(seed)),
                       F.lit(nv)) + 1).cast("int"))
    words = F.transform(
        F.sequence(F.lit(1), n_words.cast("int")),
        lambda j: F.when(is_near & (j == swap_pos), swap_word).otherwise(
            F.element_at(
                vocab,
                (F.pmod(F.xxhash64(content_seed, j, F.lit(seed)),
                        F.lit(nv)) + 1).cast("int"))))
    text = F.array_join(words, " ")

    u_lang = _u([i], "lang", seed)
    lang = (F.when(u_lang < 400, F.lit("en"))
            .when(u_lang < 550, F.lit("de"))
            .when(u_lang < 700, F.lit("zh"))
            .when(u_lang < 850, F.lit("fr"))
            .otherwise(F.lit("es")))
    return df.select(
        i.alias("doc_id"), text.alias("text"), lang.alias("lang"),
        F.format_string("src%d", F.pmod(i, F.lit(20))).alias("source"),
        F.length(text).cast("long").alias("n_chars"))


def gen_vec_corpus(spark: SparkSession, n_vecs: int, dim: int = 64,
                   seed: int = 11,
                   partitions: int | None = None) -> DataFrame:
    """embeddings.parquet-shaped corpus (vec_id, embedding:array<float>,
    label) with controlled near-duplicate structure, JVM-side:

    - identical cluster (~0.3%): ONE shared vector (cos = 1.0) — the
      hot sign-LSH bucket the ``max_bucket_size`` cap must drop.
    - near dups (~2.2%): base vector of one of 499 rows with a single
      coordinate bumped +0.05 (cos ≈ 0.999).
    - unique (rest): iid uniform[-1, 1) coords from xxhash64.
    """
    df = spark.range(0, n_vecs, numPartitions=partitions) \
        if partitions else spark.range(n_vecs)
    i = F.col("id")
    u = _u([i], "vclass", seed)
    t_near = RATE_VEC_IDENTICAL + RATE_VEC_NEAR
    vec_seed = (
        F.when(u < RATE_VEC_IDENTICAL, F.lit(-1).cast("long"))
        .when(u < t_near, F.pmod(i, F.lit(499)))
        .otherwise(i + 100_000))
    is_near = (u >= RATE_VEC_IDENTICAL) & (u < t_near)
    bump_coord = F.pmod(F.xxhash64(i, F.lit("bc"), F.lit(seed)),
                        F.lit(dim))
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.pmod(F.xxhash64(vec_seed, j, F.lit(seed)), F.lit(2001))
            .cast("double") / 1000.0 - 1.0
            + F.when(is_near & (j == bump_coord), F.lit(0.05))
            .otherwise(F.lit(0.0))).cast("float"))
    return df.select(i.alias("vec_id"), emb.alias("embedding"),
                     F.pmod(i, F.lit(10)).cast("int").alias("label"))
