"""Referential integrity: the table-scale analog of ``$ref`` resolution
against a registry (reference: lib/jsi/ref.rb:50-176, lifted per
SURVEY.md §2.4; north_rule "referential checks via broadcast or
sort-merge join on media_ref dimension tables").

Plan shape matters at 100 TB:
- project ONLY (doc_id, span_index, media_ref) out of the span array
  before the join — the wide text column never enters the exchange;
- broadcast the dim when it fits (map-side anti join, zero shuffle of
  the fact side); sort-merge otherwise, with a map-side distinct of the
  fact keys first so the exchange carries distinct refs, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def span_refs(docs: DataFrame) -> DataFrame:
    """(doc_id, span_index, media_ref) for spans that carry a ref.
    Filters inside the array BEFORE exploding (explode multiplies rows;
    filter-first keeps the blowup to actual ref spans)."""
    with_refs = docs.select(
        "doc_id",
        F.filter(
            F.transform(
                "spans",
                lambda s, i: F.struct(i.alias("span_index"),
                                      s["media_ref"].alias("media_ref"))),
            lambda e: e["media_ref"].isNotNull()).alias("refs"))
    return (with_refs
            .select("doc_id", F.explode("refs").alias("r"))
            .select("doc_id", F.col("r.span_index").alias("span_index"),
                    F.col("r.media_ref").alias("media_ref")))


def dangling_refs(docs: DataFrame, media_dim: DataFrame,
                  broadcast_dim: bool = True) -> DataFrame:
    """Refs pointing nowhere: (doc_id, span_index, media_ref)."""
    refs = span_refs(docs)
    dim = media_dim.select("media_ref")
    if broadcast_dim:
        dim = F.broadcast(dim)
        return refs.join(dim, "media_ref", "left_anti")
    # sort-merge path: shuffle distinct refs only, then rejoin
    distinct_dangling = (refs.select("media_ref").distinct()
                         .join(dim, "media_ref", "left_anti"))
    return refs.join(F.broadcast(distinct_dangling), "media_ref", "inner")


def referential_violations(docs: DataFrame, media_dim: DataFrame,
                           broadcast_dim: bool = True) -> DataFrame:
    """Violation rows (FIXTURES.md §5): dangling media_ref per span."""
    return dangling_refs(docs, media_dim, broadcast_dim).select(
        "doc_id",
        F.lit("$ref").alias("keyword"),
        F.concat(F.lit("/spans/"), F.col("span_index").cast("string"),
                 F.lit("/media_ref")).alias("ptr"),
        F.col("span_index").cast("int").alias("span_index"),
        F.lit("validation.keyword.$ref.invalid").alias("message_key"))
