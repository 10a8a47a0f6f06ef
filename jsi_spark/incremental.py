"""Incremental (delta) validation: validate ONLY corpus snapshots
appended since the last run — history is never re-scanned.

The batch pipeline (jsi_spark.pipeline.ValidationPipeline) validates a
whole corpus; at 10^12 docs a full pass is an event, not a routine. The
production routine is: data arrives as table APPENDS (Iceberg
snapshots), and each append must be validated on landing. This module
lifts the same stages to that shape (north_rule: "resumable from
checkpoint with per-partition lineage + metrics tables"; the reference
re-validates a document when it changes — lib/jsi/base/mutability.rb's
jsi_mutating re-derivation — this is the corpus-scale analog: only what
changed is re-examined).

100 TB design:
- **Only new batches are scanned.** A daily append of 10^9 docs is
  validated in minutes while the 10^12-doc history stays cold; cost is
  O(delta), not O(corpus).
- **Cross-snapshot uniqueness via a compact id-index table** holding
  (doc_id, part) for every consumed doc: the delta semi-joins the
  index. The index is ~1-2% of corpus bytes (no text). In production
  both sides are bucketed by doc_id so the join is a shuffle-free
  sort-merge; here Spark picks broadcast/SMJ by size. Intra-delta
  duplicates use the same salted two-phase agg as the batch pass.
- **Referential and keyword checks are delta-local** (the media dim is
  a dimension join, identical to the batch pass).
- **Drift is measured against the FIRST snapshot's persisted baseline**
  (drift_baseline.json, written by the earliest run): each delta's
  n_spans distribution gets a PSI against it — exactly the "is today's
  append shaped like the corpus start" question drift monitoring asks.
- **Idempotent per (output table, input snapshot).** Each output table
  append carries meta {"source_snapshot": sid}; a crashed run re-runs
  only the table×snapshot cells that never committed, so restarts never
  double-append. The id-index append is LAST — a snapshot counts as
  consumed only once its ids are indexed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsi_spark.exec.verdicts import partition_verdicts
from jsi_spark.io.checkpoint import _now
from jsi_spark.io.tableio import SnapshotTable
from jsi_spark.pipeline import (VIOLATION_OUT_COLS, LINEAGE_SCHEMA,
                                ValidationPipeline)

CROSS_DUP_KEY = "validation.corpus.duplicate_doc_id.cross_snapshot"

OUT_TABLES = ("violations", "verdicts", "metrics", "lineage", "id_index")


class IncrementalValidator:
    """Consumes a corpus :class:`SnapshotTable` snapshot-by-snapshot."""

    def __init__(self, corpus: SnapshotTable, out_dir: str,
                 schema: dict | None = None, n_buckets: int = 32,
                 salt_buckets: int = 64, broadcast_dim: bool = True,
                 pipeline: ValidationPipeline | None = None,
                 cache_delta: bool = True):
        self.corpus = corpus
        self.out_dir = out_dir
        self.cache_delta = cache_delta
        # a prebuilt pipeline skips recompiling the schema (the typed
        # validator's Column tree costs driver seconds to build and is
        # reusable across any corpus with the same struct)
        self.pipeline = pipeline or ValidationPipeline(
            schema, n_buckets=n_buckets, salt_buckets=salt_buckets,
            broadcast_dim=broadcast_dim)
        self.tables = {n: SnapshotTable(out_dir, n) for n in OUT_TABLES}

    # -- snapshot bookkeeping ---------------------------------------------------

    def _sources(self, table: str) -> set[str]:
        return {s["meta"]["source_snapshot"]
                for s in self.tables[table].manifest()["snapshots"]
                if "source_snapshot" in s.get("meta", {})}

    def consumed(self) -> set[str]:
        """Snapshots fully processed — ids indexed (the LAST commit)."""
        return self._sources("id_index")

    def pending(self) -> list[dict]:
        """Data snapshots not yet consumed. Maintenance snapshots
        (compaction REPLACEs) are skipped — they rewrite already-
        validated rows into fewer files and carry nothing new."""
        done = self.consumed()
        return [s for s in self.corpus.manifest()["snapshots"]
                if s["snapshot_id"] not in done
                and s.get("meta", {}).get("operation") != "replace"]

    def _snapshot_df(self, spark: SparkSession, snap: dict) -> DataFrame:
        return spark.read.parquet(
            *[os.path.join(self.corpus.dir, b) for b in snap["batches"]])

    # -- one delta ---------------------------------------------------------------

    def cross_snapshot_dups(self, checked: DataFrame,
                            spark: SparkSession) -> DataFrame:
        """Delta doc_ids already present in ANY consumed snapshot, as
        violation rows. Semi-join against the id index — never the
        corpus itself."""
        idx = self.tables["id_index"].read(spark)
        base = (checked.select("doc_id", "part")
                if idx is None else
                checked.select("doc_id", "part")
                .join(idx.select("doc_id").distinct(), "doc_id",
                      "left_semi"))
        if idx is None:  # first snapshot: nothing to collide with
            base = base.limit(0)
        return base.select(
            "doc_id", F.lit("uniqueness").alias("keyword"),
            F.lit("/doc_id").alias("ptr"),
            F.lit(None).cast("int").alias("span_index"),
            F.lit(CROSS_DUP_KEY).alias("message_key"), "part")

    def _process(self, spark: SparkSession, snap: dict,
                 media_dim: DataFrame) -> None:
        sid = snap["snapshot_id"]
        started = _now()
        delta = self._snapshot_df(spark, snap)
        checked = self.pipeline.checked(delta)
        if self.cache_delta:
            # the four output stages (violations / metrics / verdicts /
            # id-index) would otherwise each re-scan the snapshot and
            # re-evaluate the validator tree. The cache is bounded by
            # the APPEND size, not the corpus — the knob exists for
            # deltas that outgrow cluster memory (recompute instead)
            from pyspark.storagelevel import StorageLevel
            checked = checked.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            self._stages(spark, sid, started, checked, media_dim)
        finally:
            if self.cache_delta:
                checked.unpersist()

    def _stages(self, spark: SparkSession, sid: str, started: str,
                checked: DataFrame, media_dim: DataFrame) -> None:
        # The four audit outputs are independent of each other; submit
        # them CONCURRENTLY (same rationale as bench.full_pass: a
        # sequential submit strands executors in every stage tail, and
        # the persisted delta's partitions are computed exactly once —
        # the block manager serializes per-block computation across
        # jobs). id_index stays strictly LAST: it is the consumed
        # marker, so a crash mid-way re-runs only unfinished cells.
        def _violations():
            viol = (self.pipeline.local_violations(checked)
                    .unionByName(self.pipeline.corpus_violations(
                        checked, media_dim))
                    .unionByName(self.cross_snapshot_dups(checked, spark)))
            self.tables["violations"].append(
                viol.select(*VIOLATION_OUT_COLS),
                {"source_snapshot": sid})

        def _metrics():
            metr = self.pipeline.metrics(checked).unionByName(
                self.pipeline.drift_metrics(checked, self.out_dir))
            self.tables["metrics"].append(metr, {"source_snapshot": sid})

        def _verdicts():
            verd = partition_verdicts(checked).withColumn(
                "snapshot_id", F.lit(sid))
            self.tables["verdicts"].append(verd, {"source_snapshot": sid})

        def _lineage():
            parts = list(range(self.pipeline.n_buckets))
            rows = [(f"inc-{sid}", p, sid, "committed", started, _now())
                    for p in parts]
            self.tables["lineage"].append(
                spark.createDataFrame(rows, LINEAGE_SCHEMA),
                {"source_snapshot": sid})

        from concurrent.futures import ThreadPoolExecutor
        todo = [(name, fn) for name, fn in
                [("violations", _violations), ("metrics", _metrics),
                 ("verdicts", _verdicts), ("lineage", _lineage)]
                if sid not in self._sources(name)]
        if todo:
            with ThreadPoolExecutor(max_workers=len(todo)) as pool:
                futs = [pool.submit(fn) for _, fn in todo]
                for f in futs:
                    f.result()

        # LAST: indexing the delta's ids marks the snapshot consumed
        if sid not in self._sources("id_index"):
            self.tables["id_index"].append(
                checked.select("doc_id", "part"),
                {"source_snapshot": sid})

    # -- public API ----------------------------------------------------------------

    def run_once(self, spark: SparkSession,
                 media_dim: DataFrame) -> dict:
        """Validate every pending snapshot, oldest first. Returns the
        snapshot ids consumed by THIS call."""
        consumed = []
        for snap in self.pending():
            self._process(spark, snap, media_dim)
            consumed.append(snap["snapshot_id"])
        return {"consumed": consumed,
                "tables": {k: v.dir for k, v in self.tables.items()}}

    def merged_verdicts(self, spark: SparkSession) -> DataFrame | None:
        """Corpus-wide per-part verdicts folded over every consumed
        snapshot — equals the batch pipeline's verdicts over the union
        corpus (keyword verdicts are row-local, so they add)."""
        v = self.tables["verdicts"].read(spark)
        if v is None:
            return None
        return (v.groupBy("part")
                .agg(F.sum("docs").alias("docs"),
                     F.sum("passed").alias("passed"),
                     F.sum("failed").alias("failed"))
                .withColumn("pass", F.col("failed") == 0))

    def violations(self, spark: SparkSession,
                   source_snapshot: str | None = None) -> DataFrame | None:
        """All violation rows, or only those found while validating one
        input snapshot (per-append audit — the common read)."""
        t = self.tables["violations"]
        if source_snapshot is None:
            return t.read(spark)
        batches = [b for s in t.manifest()["snapshots"]
                   if s["meta"].get("source_snapshot") == source_snapshot
                   for b in s["batches"]]
        if not batches:
            return None
        return spark.read.parquet(
            *[os.path.join(t.dir, b) for b in batches])
