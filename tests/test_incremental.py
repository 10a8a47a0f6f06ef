"""Incremental (delta) validation: only new snapshots are scanned,
cross-snapshot uniqueness via the id index, drift vs the first
snapshot's baseline, idempotent resume per (table, snapshot)."""

import os

import pytest
from pyspark.sql import functions as F

from jsi_spark.datagen import gen_docs, gen_media_dim
from jsi_spark.incremental import CROSS_DUP_KEY, IncrementalValidator
from jsi_spark.io.tableio import SnapshotTable
from jsi_spark.pipeline import ValidationPipeline

N_DOCS, N_MEDIA = 1200, 120


@pytest.fixture(scope="module")
def halves(spark):
    """Deterministic split of one corpus into two appends. The split is
    by xxhash parity of the row index (NOT doc_id: datagen plants
    duplicate doc_ids, which must be able to land on both sides)."""
    docs = gen_docs(spark, N_DOCS, n_media=N_MEDIA, seed=7)
    docs = docs.withColumn(
        "__h", F.pmod(F.xxhash64(F.monotonically_increasing_id(),
                                 F.lit("split")), F.lit(2)))
    a = docs.filter("__h = 0").drop("__h").cache()
    b = docs.filter("__h = 1").drop("__h").cache()
    a.count(), b.count()
    return a, b


@pytest.fixture(scope="module")
def media(spark):
    return gen_media_dim(spark, N_MEDIA, seed=7).cache()


def _corpus(tmp_path, *snapshots):
    t = SnapshotTable(str(tmp_path), "corpus")
    for df in snapshots:
        t.append(df)
    return t


def test_first_snapshot_equals_batch_run(spark, halves, media, tmp_path):
    a, _ = halves
    corpus = _corpus(tmp_path, a)
    inc = IncrementalValidator(corpus, str(tmp_path / "out"), n_buckets=8)
    res = inc.run_once(spark, media)
    assert len(res["consumed"]) == 1

    batch = ValidationPipeline(n_buckets=8)
    bres = batch.run(spark, a, media, str(tmp_path / "batch_out"))
    broot = bres["tables"]["verdicts"].rsplit("/", 1)
    bverd = {r.part: (r.docs, r.passed, r.failed)
             for r in SnapshotTable(broot[0], broot[1])
             .read(spark).collect()}
    iverd = {r.part: (r.docs, r.passed, r.failed)
             for r in inc.merged_verdicts(spark).collect()}
    assert iverd == bverd

    # first snapshot has nothing earlier to collide with
    v = inc.violations(spark)
    assert v.filter(F.col("message_key") == CROSS_DUP_KEY).count() == 0


def test_delta_scans_only_new_batches(spark, halves, media, tmp_path):
    a, b = halves
    corpus = _corpus(tmp_path, a)
    inc = IncrementalValidator(corpus, str(tmp_path / "out"), n_buckets=8)
    inc.run_once(spark, media)

    corpus.append(b)
    pend = inc.pending()
    assert len(pend) == 1
    # the pending snapshot's batches are exactly the second append's
    first = corpus.manifest()["snapshots"][0]["batches"]
    assert not (set(pend[0]["batches"]) & set(first))
    res = inc.run_once(spark, media)
    assert len(res["consumed"]) == 1

    # merged verdicts equal a batch run over the union corpus
    batch = ValidationPipeline(n_buckets=8)
    bres = batch.run(spark, a.unionByName(b), media,
                     str(tmp_path / "batch_out"))
    broot = bres["tables"]["verdicts"].rsplit("/", 1)
    bverd = {r.part: (r.docs, r.passed, r.failed)
             for r in SnapshotTable(broot[0], broot[1])
             .read(spark).collect()}
    iverd = {r.part: (r.docs, r.passed, r.failed)
             for r in inc.merged_verdicts(spark).collect()}
    assert iverd == bverd


def test_cross_snapshot_duplicates_flagged(spark, halves, media, tmp_path):
    a, b = halves
    corpus = _corpus(tmp_path, a, b)
    inc = IncrementalValidator(corpus, str(tmp_path / "out"), n_buckets=8)
    inc.run_once(spark, media)

    expected = (b.select("doc_id")
                .join(a.select("doc_id").distinct(), "doc_id", "left_semi")
                .count())
    assert expected > 0, "datagen should plant ids on both sides"
    got = inc.violations(spark).filter(
        F.col("message_key") == CROSS_DUP_KEY)
    assert got.count() == expected
    # and every flagged id really is in the first snapshot
    bad = (got.select("doc_id").distinct()
           .join(a.select("doc_id").distinct(), "doc_id", "left_anti")
           .count())
    assert bad == 0


def test_resume_is_idempotent(spark, halves, media, tmp_path):
    a, b = halves
    corpus = _corpus(tmp_path, a)
    inc = IncrementalValidator(corpus, str(tmp_path / "out"), n_buckets=8)
    inc.run_once(spark, media)

    # simulate a crash mid-snapshot: second append processed up to
    # verdicts, but ids never indexed -> snapshot NOT consumed
    corpus.append(b)
    snap = inc.pending()[0]
    sid = snap["snapshot_id"]
    inc.tables["violations"].append(
        inc.pipeline.local_violations(
            inc.pipeline.checked(inc._snapshot_df(spark, snap)))
        .limit(0), {"source_snapshot": sid})
    assert sid not in inc.consumed()

    inc.run_once(spark, media)  # resume
    assert sid in inc.consumed()
    # violations table has exactly ONE committed batch-set for sid per
    # run plus the simulated partial -> but verdicts/metrics/id_index
    # committed exactly once
    for table in ("verdicts", "metrics", "id_index"):
        srcs = [s["meta"].get("source_snapshot")
                for s in inc.tables[table].manifest()["snapshots"]]
        assert srcs.count(sid) == 1, table
    # re-running with nothing pending is a no-op
    res = inc.run_once(spark, media)
    assert res["consumed"] == []


def test_drift_baseline_from_first_snapshot(spark, halves, media, tmp_path):
    a, b = halves
    corpus = _corpus(tmp_path, a)
    out = str(tmp_path / "out")
    inc = IncrementalValidator(corpus, out, n_buckets=8)
    inc.run_once(spark, media)
    assert os.path.exists(os.path.join(out, "drift_baseline.json"))

    corpus.append(b)
    inc.run_once(spark, media)
    m = inc.tables["metrics"].read(spark)
    psis = [r.psi for r in m.filter("column = 'n_spans_psi'").collect()]
    assert len(psis) == 2
    # the baseline snapshot scores exactly 0 against itself; row order
    # across parquet batches is not defined, so assert by value
    assert 0.0 in psis
    # the two halves share a distribution: drift must be small
    assert all(p < 0.1 for p in psis)


def test_per_snapshot_violation_audit(spark, halves, media, tmp_path):
    a, b = halves
    corpus = _corpus(tmp_path, a, b)
    inc = IncrementalValidator(corpus, str(tmp_path / "out"), n_buckets=8)
    inc.run_once(spark, media)
    sids = [s["snapshot_id"] for s in corpus.manifest()["snapshots"]]
    per = [inc.violations(spark, source_snapshot=s) for s in sids]
    total = inc.violations(spark).count()
    assert sum(p.count() for p in per) == total
    # cross-snapshot dups only appear in the SECOND snapshot's audit
    assert per[0].filter(F.col("message_key") == CROSS_DUP_KEY).count() == 0


def test_compaction_snapshot_is_not_revalidated(spark, halves, media,
                                                tmp_path):
    """Compacting the corpus rewrites already-validated rows; the
    incremental validator must skip the REPLACE snapshot (re-validating
    it would double every verdict count)."""
    a, b = halves
    corpus = _corpus(tmp_path, a, b)
    inc = IncrementalValidator(corpus, str(tmp_path / "out"), n_buckets=8)
    inc.run_once(spark, media)
    before = {r.part: r.docs for r in inc.merged_verdicts(spark).collect()}

    corpus.compact(spark, target_files=2)
    assert inc.pending() == []
    res = inc.run_once(spark, media)
    assert res["consumed"] == []
    after = {r.part: r.docs for r in inc.merged_verdicts(spark).collect()}
    assert after == before
    # a genuinely new append after compaction IS pending
    corpus.append(a.limit(50))
    assert len(inc.pending()) == 1


def test_evolved_delta_still_validates(spark, halves, media, tmp_path):
    """A delta append that gained a new column (schema evolution) must
    validate unchanged: the compiled validator binds only the schema's
    fields, and the extra column never enters the outputs."""
    a, b = halves
    corpus = _corpus(tmp_path, a)
    inc = IncrementalValidator(corpus, str(tmp_path / "out"), n_buckets=8)
    inc.run_once(spark, media)

    corpus.append(b.withColumn("pipeline_tag", F.lit("v2")))
    inc.run_once(spark, media)
    mv = inc.merged_verdicts(spark)
    assert sum(r.docs for r in mv.collect()) == a.count() + b.count()
    assert "pipeline_tag" not in inc.violations(spark).columns
