"""Structured Streaming validation surface.

Keyword validation is stateless row-local work, so the streaming lift
reuses the compiled typed Column plan unchanged (one Project over the
micro-batch scan — the same plan test_plans pins for batch) and adds
the streaming-specific pieces:

- :func:`validated_stream` — partition bucket + verdict columns on a
  streaming DataFrame;
- :func:`violation_stream` — violation rows for failing docs only
  (append-mode friendly: no aggregation state);
- :func:`windowed_verdicts` — event-time-windowed pass/fail counts
  with a watermark, so late documents are folded in until the watermark
  closes the window and state stays bounded;
- :func:`write_snapshot_sink` — foreachBatch writer into a
  :class:`~jsi_spark.io.tableio.SnapshotTable` recording the micro-batch
  id in snapshot meta: on restart-and-replay the batch is recognized
  and skipped, giving exactly-once appends on top of at-least-once
  delivery (the streaming analog of the resumable pipeline's per-part
  idempotency).

The reference is a single-process library with no streaming story —
this module exists because the north_rule's 10^12-doc validation runs
are continuous ingest in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsi_spark.exec.columnar import TypedValidator
from jsi_spark.exec.verdicts import with_part
from jsi_spark.io.tableio import SnapshotTable


def validated_stream(docs: DataFrame, validator: TypedValidator,
                     n_buckets: int = 32) -> DataFrame:
    """Streaming docs → + (part, valid). Pure column work: the plan in
    each micro-batch is identical to the batch hot path."""
    return with_part(docs, n_buckets).withColumn(
        "valid", validator.valid_column())


def violation_stream(checked: DataFrame,
                     validator: TypedValidator) -> DataFrame:
    """Violation rows for failing docs (filter-first, stateless —
    usable in append output mode)."""
    return (checked.filter(~F.col("valid"))
            .select("doc_id", "part",
                    F.explode(validator.violations_column()).alias("v"))
            .select("doc_id", "part",
                    F.col("v.keyword").alias("keyword"),
                    F.col("v.ptr").alias("ptr"),
                    F.col("v.span_index").alias("span_index"),
                    F.col("v.message_key").alias("message_key")))


def windowed_verdicts(docs: DataFrame, validator: TypedValidator,
                      event_time_col: str, window: str = "1 minute",
                      watermark: str = "2 minutes") -> DataFrame:
    """Per-event-time-window verdict counts. The watermark admits docs
    arriving up to ``watermark`` late into their window and lets Spark
    drop window state once the watermark passes — bounded state at any
    ingest volume."""
    checked = docs.withColumn("valid", validator.valid_column())
    return (checked
            .withWatermark(event_time_col, watermark)
            .groupBy(F.window(F.col(event_time_col), window))
            .agg(F.count(F.lit(1)).alias("docs"),
                 F.sum(F.col("valid").cast("long")).alias("passed"),
                 F.sum((~F.col("valid")).cast("long")).alias("failed")))


def dedup_stream(docs: DataFrame, event_time_col: str,
                 key_cols: tuple = ("doc_id",),
                 watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, dropping
    re-deliveries that arrive within ``watermark`` of each other
    (``dropDuplicatesWithinWatermark`` — state for a key is evicted
    once the watermark passes it, so state stays bounded no matter how
    long the stream runs; an unbounded ``dropDuplicates`` would OOM at
    10^12-doc ingest)."""
    return (docs.withWatermark(event_time_col, watermark)
            .dropDuplicatesWithinWatermark(list(key_cols)))


def snapshot_batch_writer(table: SnapshotTable):
    """foreachBatch handler committing each micro-batch to ``table``
    with the batch id in snapshot meta — a replayed batch id (restart
    after a crash between sink write and checkpoint commit) is detected
    and skipped, so at-least-once delivery becomes exactly-once
    appends."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        already = any(s.get("meta", {}).get("stream_batch_id") == batch_id
                      for s in table.manifest()["snapshots"])
        if already:
            return
        table.commit([table.stage_batch(batch_df)],
                     {"stream_batch_id": batch_id})

    return handle


def write_snapshot_sink(df: DataFrame, table: SnapshotTable,
                        checkpoint_dir: str):
    """writeStream into a SnapshotTable via
    :func:`snapshot_batch_writer`. Returns the DataStreamWriter (caller
    picks the trigger and calls start())."""
    return (df.writeStream.foreachBatch(snapshot_batch_writer(table))
            .option("checkpointLocation", checkpoint_dir))
