"""Physical-plan audits: the scale-critical properties asserted as
plan-shape tests, so a regression that silently de-optimizes the
100 TB path (Python in the hot loop, lost broadcast, lost pushdown,
lost partial aggregation) fails CI — not just a benchmark.
"""

import pytest
from pyspark.sql import functions as F

from jsi_spark.compile.compiler import compile_schema
from jsi_spark.datagen import gen_docs, gen_media_dim
from jsi_spark.exec.columnar import typed_validator
from jsi_spark.exec.referential import dangling_refs
from jsi_spark.exec.stats import column_stats
from jsi_spark.exec.uniqueness import duplicate_keys
from jsi_spark.plans.docs_schema import DOCS_JSON_SCHEMA, DOCS_SCHEMA


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return gen_docs(spark, 2000, n_media=100)


def test_typed_validator_is_pure_jvm(spark, docs):
    tv = typed_validator(compile_schema(DOCS_JSON_SCHEMA), DOCS_SCHEMA)
    plan = plan_of(docs.withColumn("valid", tv.valid_column()))
    assert "EvalPython" not in plan, "Python stage in the typed hot path"
    # whole plan is Column expressions in a single Project over the scan
    # (AQE prints the pre-execution plan without codegen stars, so assert
    # structure rather than the WholeStageCodegen marker)
    assert plan.lstrip().startswith("Project"), plan[:200]


def test_parquet_scan_prunes_and_pushes_down(spark, tmp_path):
    path = str(tmp_path / "docs")
    gen_docs(spark, 1000, n_media=50).write.parquet(path)
    df = (spark.read.parquet(path)
          .filter(F.col("doc_id") > "doc-000000500")
          .select("doc_id"))
    plan = plan_of(df)
    # column pruning: the wide spans column must not be read
    assert "ReadSchema: struct<doc_id:string>" in plan
    # predicate pushdown to the parquet scan (no IsNotNull companion:
    # constraint propagation is off session-wide — session.py — and
    # GreaterThan already excludes nulls at the reader)
    assert "PushedFilters: [GreaterThan(doc_id" in plan


def test_referential_broadcasts_small_dim(spark, docs):
    media = gen_media_dim(spark, 100)
    plan = plan_of(dangling_refs(docs, media, broadcast_dim=True))
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan


def test_referential_sort_merge_path_shuffles_distinct_only(spark, docs):
    media = gen_media_dim(spark, 100)
    plan = plan_of(dangling_refs(docs, media, broadcast_dim=False))
    # the fact side is reduced to distinct refs before any wide exchange
    assert "HashAggregate" in plan


def test_stats_single_pass_partial_final(spark, docs):
    flat = docs.select("doc_id", F.size("spans").alias("n_spans"))
    plan = plan_of(column_stats(flat, ["doc_id", "n_spans"]))
    # Catalyst plans partial (map-side) + final aggregation
    assert "partial_" in plan.lower() or "HashAggregate" in plan


def test_stats_is_one_scan_one_exchange(spark, docs):
    """ALL columns' stats come from ONE wide aggregate: one scan of the
    input and one (partial→final) exchange — not C scans unioned."""
    flat = docs.select("doc_id", F.size("spans").alias("n_spans"),
                       F.size("spans").alias("b"), F.size("spans").alias("c"))
    plan = plan_of(column_stats(flat, ["doc_id", "n_spans", "b", "c"]))
    assert plan.count("Scan ") <= 1, plan
    assert plan.count("Exchange") <= 1, plan
    assert "Union" not in plan, plan


def test_salted_uniqueness_two_phase(spark, docs):
    plan = plan_of(duplicate_keys(docs, "doc_id", 16))
    # two aggregation phases: (key, salt) then key
    assert plan.count("HashAggregate") >= 4  # 2 logical x partial/final


def test_violations_filter_first(spark, docs):
    """The violation expansion must sit above a filter on ~valid, so
    the expensive error expressions never execute for passing rows."""
    tv = typed_validator(compile_schema(DOCS_JSON_SCHEMA), DOCS_SCHEMA)
    checked = docs.withColumn("valid", tv.valid_column())
    viol = (checked.filter(~F.col("valid"))
            .select("doc_id", F.explode(tv.violations_column()).alias("v")))
    opt = optimized_of(viol)
    assert "Filter" in opt
    assert opt.index("Generate") < opt.index("Filter"), \
        "explode must be planned above (after) the validity filter"


def test_exact_dedup_shuffles_hash_not_text(spark, docs):
    """exact_duplicates must shuffle (id, hash, length) — the raw text
    column must never be an exchange partition key."""
    from jsi_spark.ops.dedup import exact_duplicates

    flat = docs.select("doc_id", F.concat(F.lit("text-"), F.col("doc_id"))
                       .alias("text"))
    plan = plan_of(exact_duplicates(flat, content_col="text"))
    assert "hashpartitioning(_h" in plan, plan
    assert "hashpartitioning(text" not in plan, plan


def test_minhash_banded_projection_not_text_below_exchange(spark, docs):
    """The LSH self-join must join on the tiny (id, band, bucket)
    projection — the raw text column never partakes in an exchange."""
    from jsi_spark.ops.dedup import lsh_candidate_pairs, release_caches

    flat = docs.select("doc_id", F.concat(F.lit("text of doc "),
                                          F.col("doc_id")).alias("text"))
    try:
        plan = plan_of(lsh_candidate_pairs(flat))
        assert "hashpartitioning(text" not in plan, plan
        assert "text" not in plan.split("Exchange", 1)[1].split("\n")[0], \
            plan
    finally:
        release_caches()


def test_ann_lsh_broadcasts_queries(spark):
    """Sign-LSH candidate generation broadcasts the query buckets; the
    corpus side is never broadcast or duplicated."""
    from jsi_spark.ops.similarity import lsh_tables, lsh_topk, make_queries

    emb = spark.range(500).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.rand(seed=i) * 2 - 1) for i in range(8)])
        .alias("embedding"))
    tables = lsh_tables(dim=8, n_planes=4, n_tables=2)
    plan = plan_of(lsh_topk(emb, make_queries(emb, [0, 1]), tables, k=3))
    assert "BroadcastExchange" in plan, plan


def test_ivf_auto_impl_stays_jvm(spark):
    """Small coarse quantizers (q_ann_ivf's 8 centroids × 64 dims =
    512 FMAs/row) must resolve impl='auto' to the pure-JVM Column fold:
    the IVF search plan contains NO Python evaluation node. Pins out
    the round-2 regression where Arrow assignment paid two bridge round
    trips for a matmul too small to amortize them."""
    import random

    from jsi_spark.ops.similarity import (
        ivf_topk, make_queries, use_arrow_impl)

    # the shared engine/oracle heuristic itself
    assert not use_arrow_impl(8, 64)        # ann_ivf -> column
    assert use_arrow_impl(8 * 8, 64)        # ann_lsh -> arrow
    assert use_arrow_impl(16 * 9, 64)       # emb_near_dups -> arrow

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.rand(seed=i) * 2 - 1) for i in range(8)])
        .alias("embedding"))
    rng = random.Random(3)
    cents = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(4)]
    plan = plan_of(ivf_topk(emb, make_queries(emb, [0, 1]), cents, k=3))
    assert "EvalPython" not in plan, plan
    assert "BroadcastExchange" in plan, plan   # probe side broadcast


def test_duplicate_clusters_shuffles_labels_only(spark):
    from jsi_spark.ops.dedup import duplicate_clusters

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    plan = plan_of(duplicate_clusters(pairs, max_iter=2))
    # the final labels plan must not carry anything besides id/label
    assert "text" not in plan and "cluster_id" in plan


def test_emb_near_dups_shuffles_longs_not_vectors(spark):
    """The near-dup candidate self-join meets on the (id, table, bucket)
    long projection: no shuffle Exchange repartitions the vector column.
    Vectors appear only in scans and the id-keyed verify joins."""
    from jsi_spark.ops.dedup import release_caches
    from jsi_spark.ops.similarity import (
        embedding_near_duplicates, lsh_tables)

    emb = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.rand(seed=i) * 2 - 1) for i in range(8)])
        .alias("embedding"))
    try:
        plan = plan_of(embedding_near_duplicates(
            emb, lsh_tables(dim=8, n_planes=4, n_tables=4)))
        for frag in plan.split("Exchange hashpartitioning(")[1:]:
            keys = frag.split(")", 1)[0]
            assert "embedding" not in keys, plan
    finally:
        release_caches()


def test_benchmark_overlap_probe_broadcasts(spark):
    """Decontamination joins the corpus against a BROADCAST distinct
    probe-shingle projection — the corpus side never shuffles to meet
    the probe; the only hashpartitioning exchange is the final per-doc
    aggregate."""
    from jsi_spark.ops.dedup import benchmark_overlap

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("some words of doc "), F.col("id")).alias("text"))
    probe = docs.limit(10)
    plan = plan_of(benchmark_overlap(docs, probe))
    assert "BroadcastHashJoin" in plan, plan
    # no shuffle keyed on the shingle column (that'd be the corpus
    # repartitioning to meet the probe)
    for frag in plan.split("Exchange hashpartitioning(")[1:]:
        keys = frag.split(")", 1)[0]
        assert not keys.startswith("sh#"), plan


def test_incremental_cross_snapshot_join_is_pruned(spark, docs, tmp_path):
    """The cross-snapshot uniqueness check must semi-join ONLY the
    id-index projection (doc_id) — never re-scan history rows or pull
    spans into the exchange — and stay fully JVM-side."""
    from jsi_spark.datagen import gen_media_dim
    from jsi_spark.incremental import IncrementalValidator
    from jsi_spark.io.tableio import SnapshotTable

    corpus = SnapshotTable(str(tmp_path), "corpus")
    corpus.append(docs.limit(1000))
    inc = IncrementalValidator(corpus, str(tmp_path / "out"), n_buckets=8)
    inc.run_once(spark, gen_media_dim(spark, 100))
    corpus.append(docs.limit(1500))

    delta = inc._snapshot_df(spark, inc.pending()[0])
    checked = inc.pipeline.checked(delta)
    plan = plan_of(inc.cross_snapshot_dups(checked, spark))
    assert "EvalPython" not in plan, "Python stage in the index join"
    assert "LeftSemi" in plan, plan[:400]
    # BOTH scans (delta and id-index) are pruned to doc_id only — the
    # delta's spans/valid columns and the index's part column never
    # leave parquet for this check
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert len(scans) == 2, plan[:600]
    for ln in scans:
        assert "ReadSchema: struct<doc_id:string>" in ln, ln
