"""Corpus-level uniqueness: the table-scale analog of ``uniqueItems``
(reference: lib/jsi/schema/elements/array_validation.rb:57-81 lifted per
SURVEY.md §2.4; north_rule "uniqueness via salted repartition +
hash-aggregate to defuse hot doc_id skew").

Two-phase salted aggregation: a single hot key (e.g. a doc_id shared by
millions of rows) would otherwise hash every duplicate onto ONE reducer.
Phase 1 groups by (key, salt) — the hot key spreads over ``salt_buckets``
reducers and partially aggregates to ≤ salt_buckets rows; phase 2 groups
the (now tiny) partials by key alone. AQE skew-join/agg is the backstop,
the explicit salt is the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key: str = "doc_id",
                   salt_buckets: int = 64) -> DataFrame:
    """Keys appearing more than once: (key, dup_count). Deterministic,
    shuffle-bounded: phase-1 output ≤ distinct_keys × salt_buckets rows."""
    salted = df.select(
        F.col(key),
        F.pmod(F.xxhash64(F.monotonically_increasing_id(),
                          F.spark_partition_id()),
               F.lit(salt_buckets)).alias("_salt"))
    phase1 = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return (phase1.groupBy(key)
            .agg(F.sum("_c").alias("dup_count"))
            .filter(F.col("dup_count") > 1))


def uniqueness_violations(df: DataFrame, key: str = "doc_id",
                          salt_buckets: int = 64) -> DataFrame:
    """Violation rows (FIXTURES.md §5 shape) for duplicated keys; joins
    duplicates back (broadcast — the duplicate set is small relative to
    the corpus) to recover every offending row."""
    dups = duplicate_keys(df, key, salt_buckets)
    return (df.join(F.broadcast(dups), key, "inner")
            .select(F.col(key).alias("doc_id"),
                    F.lit("uniqueItems").alias("keyword"),
                    F.lit(f"/{key}").alias("ptr"),
                    F.lit(None).cast("int").alias("span_index"),
                    F.lit("validation.keyword.uniqueItems.not_unique")
                    .alias("message_key")))
