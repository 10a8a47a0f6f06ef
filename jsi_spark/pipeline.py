"""The full validation pass: compile once → per-partition keyword
validation → corpus constraints → verdicts / violations / metrics /
lineage tables, resumable from checkpoint.

This is the Spark re-expression of ``jsi_validate`` (reference:
lib/jsi/schema.rb:864-890) lifted to corpus scale per north_rule:
driver compiles the schema; executors run vectorized Column plans;
the only shuffles are (1) per-part verdict/metric hash aggs (tiny),
(2) the salted uniqueness agg, (3) the referential anti-join (map-side
when the dim broadcasts). Violations expand on FAILING rows only —
the Result::Valid/Result::Full two-pass split
(lib/jsi/validation/result.rb:185-199) done with a filter.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsi_spark.compile.compiler import CompiledSchema, compile_schema
from jsi_spark.exec.columnar import TypedValidator
from jsi_spark.exec.drift import EPS, bin_column, quantile_edges
from jsi_spark.exec.referential import referential_violations
from jsi_spark.exec.stats import column_stats
from jsi_spark.exec.uniqueness import uniqueness_violations
from jsi_spark.exec.verdicts import partition_verdicts, with_part
from jsi_spark.io.checkpoint import RunState, _now
from jsi_spark.io.tableio import SnapshotTable
from jsi_spark.plans.docs_schema import DOCS_JSON_SCHEMA, DOCS_SCHEMA

VIOLATION_OUT_COLS = ("doc_id", "keyword", "ptr", "span_index",
                      "message_key", "part")

LINEAGE_SCHEMA = ("run_id string, part int, snapshot_id string, "
                  "status string, started_at string, finished_at string")


def _parts_done(table: SnapshotTable) -> set[int]:
    done: set[int] = set()
    for s in table.manifest()["snapshots"]:
        done.update(s.get("meta", {}).get("parts", []))
    return done


class ValidationPipeline:
    def __init__(self, schema: dict | CompiledSchema | None = None,
                 n_buckets: int = 32, salt_buckets: int = 64,
                 drift_bins: int = 10, broadcast_dim: bool = True):
        schema = schema if schema is not None else DOCS_JSON_SCHEMA
        self.compiled = (schema if isinstance(schema, CompiledSchema)
                         else compile_schema(schema))
        self.validator = TypedValidator(self.compiled, DOCS_SCHEMA)
        self.n_buckets = n_buckets
        self.salt_buckets = salt_buckets
        self.drift_bins = drift_bins
        self.broadcast_dim = broadcast_dim

    # -- row-local stage (per partition bucket, checkpointable) -----------------

    def checked(self, docs: DataFrame) -> DataFrame:
        return with_part(docs, self.n_buckets).withColumn(
            "valid", self.validator.valid_column())

    def local_violations(self, checked: DataFrame) -> DataFrame:
        """Violation rows for keyword failures — filter-first: the
        violation expression tree never runs on passing rows."""
        return (checked.filter(~F.col("valid"))
                .select("doc_id", "part",
                        F.explode(self.validator.violations_column())
                        .alias("v"))
                .select("doc_id", F.col("v.keyword").alias("keyword"),
                        F.col("v.ptr").alias("ptr"),
                        F.col("v.span_index").alias("span_index"),
                        F.col("v.message_key").alias("message_key"),
                        "part"))

    def metrics(self, checked: DataFrame) -> DataFrame:
        flat = checked.select(
            "part", "doc_id",
            F.size("spans").alias("n_spans"),
            F.col("valid").cast("long").alias("valid_l"))
        return (column_stats(flat, ["doc_id", "n_spans", "valid_l"],
                             group_by="part")
                .withColumn("psi", F.lit(None).cast("double")))

    # -- corpus stage (global) ----------------------------------------------------

    def corpus_violations(self, docs_p: DataFrame,
                          media_dim: DataFrame) -> DataFrame:
        uniq = uniqueness_violations(docs_p, "doc_id", self.salt_buckets) \
            .join(docs_p.select("doc_id", "part").distinct(), "doc_id") \
            .select(*VIOLATION_OUT_COLS)
        ref = with_part(
            referential_violations(docs_p, media_dim, self.broadcast_dim),
            self.n_buckets).select(*VIOLATION_OUT_COLS)
        return uniq.unionByName(ref)

    def drift_metrics(self, docs_p: DataFrame, out_dir: str) -> DataFrame:
        """PSI of the n_spans distribution vs the first run's baseline
        snapshot (stored beside the tables). First run: PSI = 0.0 by
        construction and the baseline is persisted."""
        spark = docs_p.sparkSession
        flat = docs_p.select(F.size("spans").cast("double").alias("x"))
        baseline_path = os.path.join(out_dir, "drift_baseline.json")
        if os.path.exists(baseline_path):
            with open(baseline_path) as f:
                base = json.load(f)
            edges, ref_shares = base["edges"], base["shares"]
        else:
            edges = quantile_edges(flat, "x", self.drift_bins)
            ref_shares = None
        rows = (flat.select(bin_column(F.col("x"), edges).alias("b"))
                .groupBy("b").count().collect())
        total = sum(r["count"] for r in rows) or 1
        shares = {int(r["b"]): r["count"] / total for r in rows}
        cur = [shares.get(i, 0.0) for i in range(-1, len(edges) + 1)]
        if ref_shares is None:
            ref_shares = cur
            with open(baseline_path, "w") as f:
                json.dump({"edges": edges, "shares": cur}, f)
        psi_val = sum((p - q) * math.log((p + EPS) / (q + EPS))
                      for p, q in zip(cur, ref_shares))
        return spark.createDataFrame(
            [(-1, "n_spans_psi", None, None, None, None, None, None,
              float(psi_val))],
            "part int, column string, n_rows long, null_count long, "
            "distinct_hll long, min_val string, max_val string, "
            "kll_quantiles array<double>, psi double")

    # -- orchestration --------------------------------------------------------------

    def run(self, spark: SparkSession, docs: DataFrame,
            media_dim: DataFrame, out_dir: str,
            parts_per_job: int | None = None,
            fail_after_jobs: int | None = None) -> dict:
        """Execute (or resume) a validation run. ``parts_per_job`` bounds
        how many partition buckets commit together (default: all pending
        in one job — fewer, bigger jobs; tests use small values to
        exercise resume). ``fail_after_jobs`` simulates a crash for the
        kill/restart test."""
        state = RunState(out_dir)
        tables = {name: SnapshotTable(out_dir, name)
                  for name in ("violations", "verdicts", "metrics",
                               "lineage")}
        docs_p = self.checked(docs)

        pending = sorted(set(range(self.n_buckets)) -
                         state.completed_parts())
        chunk = parts_per_job or max(len(pending), 1)
        jobs = [pending[i:i + chunk] for i in range(0, len(pending), chunk)]
        for j, parts in enumerate(jobs):
            if fail_after_jobs is not None and j >= fail_after_jobs:
                raise RuntimeError("simulated crash for resume test")
            started = _now()
            stage_of = {
                "violations": self.local_violations,
                "verdicts": partition_verdicts,
                "metrics": self.metrics,
            }
            # Per-table commits are not jointly atomic; idempotency is
            # per PART: each table commits only the buckets it has not
            # already recorded in a snapshot's meta. A crash between the
            # three commits — or a resume with a different parts_per_job
            # chunking — can therefore never double-commit a bucket's
            # rows for any table.
            snap = None
            for name, build in stage_of.items():
                todo = sorted(set(parts) - _parts_done(tables[name]))
                if not todo:
                    continue
                sub = docs_p.filter(F.col("part").isin(todo))
                batch = tables[name].stage_batch(build(sub))
                s = tables[name].commit([batch], {"parts": todo})
                snap = snap or s
            snap = snap or "snap-preexisting"
            state.commit_parts(parts, snap, started)
            lineage = spark.createDataFrame(
                [(state.run_id, p, snap, "committed", started, _now())
                 for p in parts], LINEAGE_SCHEMA)
            tables["lineage"].append(lineage)

        if not state.global_done:
            def _stage_done(table, stage):
                return any(s.get("meta", {}).get("stage") == stage
                           for s in table.manifest()["snapshots"])
            if not _stage_done(tables["violations"], "corpus"):
                corpus = self.corpus_violations(docs_p, media_dim)
                tables["violations"].append(corpus, {"stage": "corpus"})
            if not _stage_done(tables["metrics"], "drift"):
                tables["metrics"].append(
                    self.drift_metrics(docs_p, out_dir), {"stage": "drift"})
            state.mark_global_done()

        return {
            "run_id": state.run_id,
            "completed_parts": sorted(state.completed_parts()),
            "tables": {k: v.dir for k, v in tables.items()},
        }
