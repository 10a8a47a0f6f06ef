"""Resumable training-data ops pipeline: registered stages (dedup →
cluster → quota-cap → decontaminate …) with snapshot-committed outputs,
per-bucket commits, and lineage rows — the LLM-pipeline counterpart of
``jsi_spark.pipeline.ValidationPipeline``.

Checkpoint/resume contract (north_rule: "resumable from checkpoint with
per-partition lineage + metrics tables"):

- each stage's OUTPUT corpus is committed to its own
  :class:`~jsi_spark.io.tableio.SnapshotTable` (on a cluster: an
  Iceberg table), in per-bucket chunks — bucket = pmod(xxhash64(id),
  n_buckets), so chunk membership is deterministic across restarts;
- a stage whose table already has every bucket committed is SKIPPED on
  resume: its committed table becomes the next stage's input, so a
  crash after stage k never recomputes stages 1..k (lineage, not
  recompute);
- within a stage, already-committed buckets are skipped and only
  pending buckets run — a crash mid-stage resumes at bucket, not
  stage, granularity;
- every bucket commit appends a lineage row (run_id, stage, part,
  snapshot_id, status, timestamps) to the ``lineage`` table.

Stage contract: ``fn(spark, df) -> DataFrame`` returns the SURVIVING
corpus with the same schema as its input (filter-shaped ops). The
factories below adapt ops/dedup.py / ops/sampling.py to this shape.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsi_spark.exec.verdicts import with_part
from jsi_spark.io.checkpoint import _now
from jsi_spark.io.tableio import SnapshotTable
from jsi_spark.pipeline import _parts_done

LINEAGE_SCHEMA = ("run_id string, stage string, part int, "
                  "snapshot_id string, status string, "
                  "started_at string, finished_at string")


# -- stage factories (corpus -> surviving corpus) ----------------------------

def dedup_exact_stage(content_col: str = "text",
                      id_col: str = "doc_id"):
    """Drop exact duplicates, keeping the lowest-id doc per content
    group (ops.dedup.exact_duplicates — hash-projected shuffle)."""
    from jsi_spark.ops.dedup import exact_duplicates

    def stage(spark: SparkSession, df: DataFrame) -> DataFrame:
        keep = (exact_duplicates(df, content_col, id_col)
                .filter(F.col("is_canonical")).select(id_col))
        return df.join(keep, id_col, "left_semi")
    return stage


def near_dup_cluster_stage(threshold: float = 0.5,
                           content_col: str = "text",
                           id_col: str = "doc_id"):
    """Drop near-duplicates: MinHash-LSH candidate pairs → connected
    components → keep one doc (the min-id cluster label) per cluster.
    Docs in no cluster survive untouched."""
    from jsi_spark.ops.dedup import (
        duplicate_clusters, minhash_near_duplicates)

    def stage(spark: SparkSession, df: DataFrame) -> DataFrame:
        pairs = minhash_near_duplicates(
            df, id_col=id_col, content_col=content_col,
            threshold=threshold)
        losers = (duplicate_clusters(pairs)
                  .filter(F.col("id") != F.col("cluster_id"))
                  .select(F.col("id").alias(id_col)))
        return df.join(losers, id_col, "left_anti")
    return stage


def quota_cap_stage(cap: int, stratum_col: str = "source",
                    id_col: str = "doc_id"):
    """Keep at most ``cap`` docs per stratum (ops.sampling's
    deterministic md5-rank cap — skew-safe)."""
    from jsi_spark.ops.sampling import stratified_cap

    def stage(spark: SparkSession, df: DataFrame) -> DataFrame:
        return stratified_cap(df, stratum_col=stratum_col,
                              id_col=id_col, cap=cap)
    return stage


def decontaminate_stage(probe: DataFrame, min_hits: int = 1,
                        content_col: str = "text",
                        id_col: str = "doc_id"):
    """Drop docs sharing ≥ ``min_hits`` word n-grams with the benchmark
    probe set (ops.dedup.benchmark_overlap — probe broadcast, corpus
    map-side)."""
    from jsi_spark.ops.dedup import benchmark_overlap

    def stage(spark: SparkSession, df: DataFrame) -> DataFrame:
        hits = (benchmark_overlap(df, probe, id_col=id_col,
                                  content_col=content_col)
                .filter(F.col("n_hits") >= min_hits)
                .select(id_col))
        return df.join(hits, id_col, "left_anti")
    return stage


def semantic_dedup_stage(emb: DataFrame, threshold: float = 0.35,
                         id_col: str = "doc_id",
                         vec_col: str = "embedding",
                         n_vecs: int | None = None,
                         max_cell_size: int = 1000):
    """Drop semantic near-duplicates (SemDeDup, arXiv:2303.09540):
    k-means cells over the document embeddings + within-cell cosine
    drop list, keeping the lowest-id doc of each duplicate relation.
    ``emb`` is the embedding side-table keyed by ``id_col``; it is
    semi-joined to the CURRENT corpus first, so drops computed here
    reflect upstream stages' survivors. ``n_vecs`` feeds the
    corpus-scaled n_centroids rule — pass it from snapshot metadata
    (SnapshotTable row counts / parquet footers) in production; the
    ``None`` fallback counts the side-table (one job over the
    embedding projection, not the corpus)."""
    from jsi_spark.ops.similarity import (
        ivf_centroids, semantic_dedup, semantic_n_centroids,
    )

    def stage(spark: SparkSession, df: DataFrame) -> DataFrame:
        cur = emb.join(df.select(id_col), id_col, "left_semi")
        n = n_vecs if n_vecs is not None else cur.count()
        cents = ivf_centroids(cur, n_centroids=semantic_n_centroids(n),
                              id_col=id_col, vec_col=vec_col)
        drops = semantic_dedup(cur, cents, threshold=threshold,
                               id_col=id_col, vec_col=vec_col,
                               max_cell_size=max_cell_size,
                               strategy="grouped").select(id_col)
        return df.join(drops, id_col, "left_anti")
    return stage


# -- runner -------------------------------------------------------------------

class OpsPipeline:
    def __init__(self, n_buckets: int = 32, id_col: str = "doc_id"):
        self.n_buckets = n_buckets
        self.id_col = id_col
        self.stages: list[tuple[str, object]] = []

    def add_stage(self, name: str, fn) -> "OpsPipeline":
        """Register ``fn(spark, df) -> df`` under ``name`` (also the
        plugin surface: anything honoring the stage contract chains —
        custom ops, compile/plugins keyword-driven filters, …)."""
        self.stages.append((name, fn))
        return self

    def _table(self, out_dir: str, i: int, name: str) -> SnapshotTable:
        return SnapshotTable(out_dir, f"stage-{i:02d}-{name}")

    def run(self, spark: SparkSession, docs: DataFrame, out_dir: str,
            parts_per_job: int | None = None,
            fail_after_commits: int | None = None) -> dict:
        """Execute (or resume) the registered stages over ``docs``.
        ``parts_per_job`` chunks bucket commits (default: all pending in
        one commit); ``fail_after_commits`` simulates a crash after N
        bucket-chunk commits for the kill/restart test. Returns stage
        tables + lineage; the final corpus is the last stage's table."""
        run_id = f"opsrun-{uuid.uuid4().hex[:12]}"
        lineage = SnapshotTable(out_dir, "lineage")
        n_commits = 0
        current = docs
        result: dict = {"run_id": run_id, "stages": {}}
        for i, (name, fn) in enumerate(self.stages):
            table = self._table(out_dir, i, name)
            done = _parts_done(table)
            pending = sorted(set(range(self.n_buckets)) - done)
            if pending:
                out = with_part(fn(spark, current), self.n_buckets,
                                self.id_col)
                chunk = parts_per_job or len(pending)
                for j in range(0, len(pending), chunk):
                    if (fail_after_commits is not None
                            and n_commits >= fail_after_commits):
                        raise RuntimeError(
                            "simulated crash for resume test")
                    todo = pending[j:j + chunk]
                    started = _now()
                    batch = table.stage_batch(
                        out.filter(F.col("part").isin(todo)))
                    snap = table.commit([batch], {"parts": todo})
                    lineage.append(spark.createDataFrame(
                        [(run_id, name, p, snap, "committed", started,
                          _now()) for p in todo], LINEAGE_SCHEMA))
                    n_commits += 1
            # next stage reads the COMMITTED output (resume never
            # recomputes an upstream stage)
            current = table.read(spark).drop("part")
            result["stages"][name] = table.dir
        result["lineage"] = lineage.dir
        result["rows"] = current.count()
        return result
