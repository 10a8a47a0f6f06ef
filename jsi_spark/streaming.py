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


def streaming_source_cap(docs: DataFrame, source_col: str = "source",
                         id_col: str = "doc_id",
                         cap: int = 1000) -> DataFrame:
    """Streaming per-source admission quota — the continuous-ingest
    analog of :func:`jsi_spark.ops.sampling.stratified_cap` — as a
    CUSTOM STATEFUL operator over ``applyInPandasWithState``: the
    running admitted-count per source survives across micro-batches
    (and across restarts, via the state store), so a source that filled
    its quota an hour ago stays closed no matter how many batches
    later its docs arrive.

    Semantics: within each micro-batch a source's rows are admitted in
    ascending ``id_col`` order (deterministic under replay of the same
    batch); across batches, arrival order decides — first batch to
    present rows wins quota, which is the point of a streaming cap.
    For a single-batch run this reduces to ``row_number() OVER
    (PARTITION BY source ORDER BY id) <= cap`` — the oracle the driver
    gate checks.

    Scale: state is ONE long per source key (millions of sources =
    megabytes); the only shuffle is the groupBy on ``source_col``, the
    same key the batch op shuffles on. A hot source concentrates its
    micro-batch rows on one task, but the work is bounded by the batch
    — and once the cap fills, each later batch reduces to a
    concat+len+no-op per group. Project to (id, source) before calling
    for a payload-free shuffle, then semi-join admitted ids back."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = docs.schema

    def admit(key, pdfs, state):
        admitted = state.get[0] if state.exists else 0
        if admitted < cap:
            # the group's micro-batch rows may span several Arrow
            # chunks; admission order is defined over the WHOLE batch
            chunks = [p for p in pdfs if len(p)]
            if chunks:
                pdf = (pd.concat(chunks, ignore_index=True)
                       .sort_values(id_col, kind="mergesort",
                                    ignore_index=True))
                take = pdf.iloc[:cap - admitted]
                admitted += len(take)
                if len(take):
                    yield take
        state.update((admitted,))

    return (docs.groupBy(source_col)
            .applyInPandasWithState(admit, out_schema, "admitted long",
                                    "append", GroupStateTimeout.NoTimeout))


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


def windowed_bin_counts(docs: DataFrame, ts_col: str, value_col: str,
                        edges: list, window: str = "1 day",
                        watermark: str = "1 day") -> DataFrame:
    """Streaming histogram state for drift monitoring: watermarked
    event-time windows × fixed bin edges → running counts
    (win_start, bucket, n). State is bounded by windows-in-horizon ×
    (len(edges)+2) buckets — independent of event volume — and the
    count agg is map-side partial like any hash aggregate. Score the
    drained/queried state with exec.drift.psi_per_window; fixed edges
    (vs quantile-trained) keep the binning identical across the whole
    stream lifetime, which windowed PSI requires."""
    from jsi_spark.exec.drift import bin_column

    return (docs
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("w"),
                     bin_column(F.col(value_col), edges).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").cast("long").alias("win_start"),
                    "bucket", "n"))
