"""Streaming validation: micro-batch verdicts equal the batch plan,
violation rows are append-safe, windowed verdicts respect watermarked
event time, and the SnapshotTable sink is exactly-once per batch id."""

import os

import pytest
from pyspark.sql import functions as F

from jsi_spark.compile.compiler import compile_schema
from jsi_spark.datagen import gen_docs
from jsi_spark.exec.columnar import typed_validator
from jsi_spark.io.tableio import SnapshotTable
from jsi_spark.plans.docs_schema import DOCS_JSON_SCHEMA, DOCS_SCHEMA
from jsi_spark.streaming import (
    validated_stream, violation_stream, windowed_verdicts,
    write_snapshot_sink,
)

N = 800


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_src") / "docs")
    gen_docs(spark, N, n_media=50, seed=7).repartition(4) \
        .write.parquet(d)
    return d


@pytest.fixture(scope="module")
def tv():
    return typed_validator(compile_schema(DOCS_JSON_SCHEMA), DOCS_SCHEMA)


def _run_available_now(writer, tmp):
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_verdicts_match_batch(spark, docs_dir, tv, tmp_path):
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_dir)
    out = SnapshotTable(str(tmp_path), "checked")
    writer = write_snapshot_sink(validated_stream(stream, tv), out,
                                 str(tmp_path / "ckpt"))
    _run_available_now(writer, tmp_path)
    got = out.read(spark)
    batch = validated_stream(spark.read.parquet(docs_dir), tv)
    assert got.count() == N
    g = {(r.doc_id, r.valid) for r in got.select("doc_id", "valid")
         .collect()}
    b = {(r.doc_id, r.valid) for r in batch.select("doc_id", "valid")
         .collect()}
    assert g == b
    # exactly-once: every snapshot carries a distinct stream batch id
    ids = [s["meta"]["stream_batch_id"]
           for s in out.manifest()["snapshots"]]
    assert len(ids) == len(set(ids))


def test_stream_violtill_rows_match_batch(spark, docs_dir, tv, tmp_path):
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_dir)
    checked = validated_stream(stream, tv)
    out = SnapshotTable(str(tmp_path), "viols")
    writer = write_snapshot_sink(violation_stream(checked, tv), out,
                                 str(tmp_path / "ckpt_v"))
    _run_available_now(writer, tmp_path)
    got = out.read(spark)
    bchecked = validated_stream(spark.read.parquet(docs_dir), tv)
    want = violation_stream(bchecked, tv)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_windowed_verdicts_with_watermark(spark, docs_dir, tv,
                                          tmp_path):
    """Event-time windows close as the watermark passes them (append
    mode emits only finalized windows). All source files are taken in
    ONE micro-batch (single-batch watermark start = -inf, so nothing is
    'late' within it); a far-future sentinel doc advances the watermark
    past every 1-minute window so availableNow flushes them all."""
    import shutil

    src = str(tmp_path / "win_src")
    shutil.copytree(docs_dir, src)
    sentinel_dir = str(tmp_path / "sentinel")
    gen_docs(spark, 1, n_media=5, seed=1).withColumn(
        "doc_id", F.lit("doc-999999999")).write.parquet(sentinel_dir)
    for f in os.listdir(sentinel_dir):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(sentinel_dir, f),
                        os.path.join(src, "zz-" + f))
    ts = F.when(F.col("doc_id") == "doc-999999999",
                F.to_timestamp(F.lit("2026-01-01 01:00:00"))) \
        .otherwise(F.to_timestamp(F.lit("2026-01-01 00:00:00"))
                   + F.make_interval(
                       secs=F.pmod(F.xxhash64("doc_id"),
                                   F.lit(180)).cast("double")))
    stream = (spark.readStream.schema(DOCS_SCHEMA)
              .option("maxFilesPerTrigger", 1000).parquet(src)
              .withColumn("ts", ts))
    win = windowed_verdicts(stream, tv, "ts", window="1 minute",
                            watermark="2 minutes")
    q = (win.writeStream.outputMode("append").format("memory")
         .queryName("winv").option("checkpointLocation",
                                   str(tmp_path / "ckpt_w"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM winv").collect()
    # 3 one-minute windows of real docs (sentinel's window stays open)
    assert len(rows) == 3, rows
    assert sum(r.docs for r in rows) == N
    assert all(r.docs == r.passed + r.failed for r in rows)
    assert any(r.failed > 0 for r in rows)


def test_snapshot_sink_replay_is_idempotent(spark, tmp_path):
    """Drive the real foreachBatch handler with a duplicate batch id —
    the crash-between-sink-write-and-checkpoint-commit replay case."""
    from jsi_spark.streaming import snapshot_batch_writer

    t = SnapshotTable(str(tmp_path), "replay")
    df = spark.range(5)
    h = snapshot_batch_writer(t)
    h(df, 0)
    h(df, 0)          # replayed micro-batch: must not double-commit
    h(df, 1)
    assert t.read(spark).count() == 10
    assert len(t.manifest()["snapshots"]) == 2


def test_streaming_source_cap_state_across_restarts(spark, tmp_path):
    """The applyInPandasWithState quota: a source that filled part of
    its cap in an earlier run admits only the remainder after a
    RESTART (state recovered from the state store under the
    checkpoint), and within a batch admission is by ascending doc_id."""
    from jsi_spark.streaming import streaming_source_cap

    src = str(tmp_path / "cap_src")
    os.makedirs(src)
    schema = "doc_id long, source string"
    ckpt = str(tmp_path / "ckpt_cap")
    out = SnapshotTable(str(tmp_path), "capped")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        writer = write_snapshot_sink(
            streaming_source_cap(stream, source_col="source",
                                 id_col="doc_id", cap=40), out, ckpt)
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(120)
        assert not q.isActive

    # wave 1: 30 docs per source (under cap — all admitted)
    wave1 = [(i, f"s{i % 2}") for i in range(60)]
    spark.createDataFrame(wave1, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    run_once()
    # wave 2 arrives later: 30 more per source; only 10 fit per source
    wave2 = [(i, f"s{i % 2}") for i in range(100, 160)]
    spark.createDataFrame(wave2, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    run_once()

    got = out.read(spark)
    per = {r.source: r.n for r in
           got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {"s0": 40, "s1": 40}
    s0 = sorted(r.doc_id for r in got.filter("source = 's0'").collect())
    # every wave-1 doc (arrived first) + the 10 smallest wave-2 ids
    assert s0 == list(range(0, 60, 2)) + list(range(100, 120, 2))


def test_dedup_stream_drops_redeliveries(spark, tv, tmp_path):
    """Duplicate doc_ids delivered across micro-batches within the
    watermark are dropped; state is watermark-bounded."""
    from jsi_spark.streaming import dedup_stream

    src = str(tmp_path / "dedup_src")
    os.makedirs(src)
    base = gen_docs(spark, 100, n_media=10, seed=3).withColumn(
        "ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    base.coalesce(1).write.mode("append").parquet(src)
    # re-deliver half the docs (same ids) — a second file, later batch
    base.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0) \
        .coalesce(1).write.mode("append").parquet(src)

    schema = base.schema
    stream = spark.readStream.schema(schema).parquet(src)
    deduped = dedup_stream(stream, "ts", watermark="10 minutes")
    # plan pin: the watermark-bounded stateful dedup operator, not an
    # unbounded dropDuplicates (whose state grows forever at 10^12-doc
    # ingest)
    lp = deduped._jdf.queryExecution().logical().toString()
    assert "DeduplicateWithinWatermark" in lp, lp[:400]
    assert "EventTimeWatermark" in lp, lp[:400]
    out = SnapshotTable(str(tmp_path), "deduped")
    writer = write_snapshot_sink(deduped, out, str(tmp_path / "ckpt_d"))
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = out.read(spark)
    assert got.count() == 100
    assert got.select("doc_id").distinct().count() == 100


def test_psi_per_window_matches_hand_computation(spark):
    """PSI of each window vs the earliest window on a literal counts
    table — hand-computed expectation, including a bucket missing on
    one side (coalesced to share 0)."""
    import math

    from jsi_spark.exec.drift import EPS, psi_per_window
    counts = spark.createDataFrame(
        [(0, 0, 50), (0, 1, 50),            # baseline: 0.5 / 0.5 / 0
         (100, 0, 20), (100, 1, 60), (100, 2, 20)],  # drifted + new bin
        "win_start long, bucket int, n long")
    got = {r.win_start: r.psi for r in psi_per_window(counts).collect()}
    assert got[0] == 0.0
    p, q = [0.2, 0.6, 0.2], [0.5, 0.5, 0.0]
    want = sum((pi - qi) * math.log((pi + EPS) / (qi + EPS))
               for pi, qi in zip(p, q))
    assert got[100] == round(want, 6)


def test_windowed_bin_counts_streaming_state_shape(spark, tmp_path):
    """The streaming histogram aggregates counts per (window, bucket) —
    state rows = windows x occupied buckets, independent of event
    volume — and drains to the same counts a batch groupBy produces."""
    from jsi_spark.exec.drift import bin_column
    from jsi_spark.streaming import windowed_bin_counts

    src = str(tmp_path / "psi_src")
    os.makedirs(src)
    rows = [(i, f"2026-01-0{1 + i % 3} 12:00:00", float(i % 7) * 30.0)
            for i in range(600)]
    batch = (spark.createDataFrame(rows, "i long, ts_s string, value double")
             .select(F.to_timestamp("ts_s").alias("ts"), "value"))
    batch.coalesce(1).write.mode("append").parquet(src)
    edges = [30.0, 60.0, 120.0]
    stream = spark.readStream.schema("ts timestamp, value double") \
        .parquet(src)
    counts = windowed_bin_counts(stream, "ts", "value", edges,
                                 window="1 day", watermark="1 day")
    lp = counts._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" in lp, lp[:400]
    name = "pwb_test"
    q = (counts.writeStream.outputMode("complete").format("memory")
         .queryName(name)
         .option("checkpointLocation", str(tmp_path / "ckpt_p"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table(name).collect())
    want = sorted(tuple(r) for r in (
        batch.groupBy(F.window("ts", "1 day").alias("w"),
                      bin_column(F.col("value"), edges).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("long").alias("win_start"),
                "bucket", "n")).collect())
    assert got == want and len(got) == 3 * 4  # 3 days x 4 occupied bins


def test_stream_queries_invariant_to_ambient_session_timezone(spark):
    """Harness-invariance (round-4 verdict #1): the driver's gate runs
    the entry queries under ITS OWN SparkSession, whose
    spark.sql.session.timeZone may not be UTC. The two streaming
    queries whose output embeds epoch win_start values
    (stream_validation, stream_psi_drift) must pin UTC internally so
    the NTZ→instant cast and window().start do not drift with the
    ambient tz. Run both under a deliberately non-UTC ambient session
    and assert exact parity with the tz-free DuckDB oracles; also
    assert the ambient tz is restored afterwards."""
    import duckdb

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("testdata not present")
    oracles = E.oracle_sql()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")

    def norm(v):
        if isinstance(v, bool):
            return str(v).lower()
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)

    def key(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(tuple(norm(r[i]) for i in order) for r in rows)

    ambient = "America/New_York"  # non-UTC, DST-bearing
    spark.conf.set("spark.sql.session.timeZone", ambient)
    try:
        for name in ("stream_validation", "stream_psi_drift"):
            df = E.queries()[name](spark, sf)
            srows, scols = [tuple(r) for r in df.collect()], df.columns
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            assert len(srows) == len(orows), name
            assert key(srows, scols) == key(orows, ocols), name
            # and the query restored the ambient session tz
            assert (spark.conf.get("spark.sql.session.timeZone")
                    == ambient), name
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
