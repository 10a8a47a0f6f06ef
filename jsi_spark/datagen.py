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
