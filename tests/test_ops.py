"""Training-data ops: dedup (exact / MinHash-LSH / n-gram Jaccard /
SimHash), similarity search (brute-force / LSH / IVF), text analysis,
multimodal plumbing — checked against brute-force / pandas oracles on
the driver-provided testdata tables."""

import itertools

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from jsi_spark.ops.dedup import (
    exact_duplicates, minhash_near_duplicates, ngram_jaccard_pairs,
    simhash_candidates,
)
from jsi_spark.ops.similarity import (
    brute_force_topk, embedding_near_duplicates, ivf_centroids, ivf_topk,
    lsh_tables, lsh_topk, make_queries,
)
from jsi_spark.ops.text import text_profile


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _jaccard(a: str, b: str, n=3):
    def sh(t):
        toks = t.lower().split()
        return {" ".join(toks[i:i + n])
                for i in range(max(len(toks) - n + 1, 1))}
    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_duplicates_oracle(spark, documents):
    # testdata has no exact text dups — inject copies under new ids
    dup_src = (documents.filter(F.col("doc_id") < 20)
               .withColumn("doc_id", F.col("doc_id") + 100000))
    docs = documents.unionByName(dup_src)
    out = {r.doc_id: (r.dup_group_size, r.is_canonical)
           for r in exact_duplicates(docs).collect()}
    pdf = docs.select("doc_id", "text").toPandas()
    sizes = pdf.groupby("text")["doc_id"].agg(["count", "min"])
    lookup = pdf.set_index("doc_id")["text"]
    for doc_id, (size, canon) in out.items():
        text = lookup[doc_id]
        assert size == sizes.loc[text, "count"]
        assert canon == (doc_id == sizes.loc[text, "min"])
    # the sf docs tables contain real duplicate texts
    assert any(s > 1 for s, _ in out.values())


def test_ngram_jaccard_matches_bruteforce(spark, documents):
    sub = documents.filter(F.col("doc_id") < 120).cache()
    engine = {(r.id_a, r.id_b): r.jaccard
              for r in ngram_jaccard_pairs(sub, threshold=0.5).collect()}
    rows = {r.doc_id: r.text for r in sub.collect()}
    oracle = {}
    for a, b in itertools.combinations(sorted(rows), 2):
        j = _jaccard(rows[a], rows[b])
        if j >= 0.5:
            oracle[(a, b)] = j
    assert set(engine) == set(oracle)
    for k, v in engine.items():
        assert v == pytest.approx(oracle[k], abs=1e-9)


def test_minhash_lsh_recall_and_precision(spark, documents):
    sub = documents.filter(F.col("doc_id") < 300).cache()
    found = {(r.id_a, r.id_b)
             for r in minhash_near_duplicates(sub, threshold=0.8)
             .collect()}
    rows = {r.doc_id: r.text for r in sub.collect()}
    truth = {(a, b) for a, b in itertools.combinations(sorted(rows), 2)
             if _jaccard(rows[a], rows[b]) >= 0.8}
    # exact-verification stage ⇒ perfect precision
    assert found <= truth
    # banded LSH @ (64 perms, 16 bands) on ≥0.8 jaccard: recall ≈ 1
    if truth:
        assert len(found) / len(truth) >= 0.9
    # identical texts must always collide
    ident = {(a, b) for (a, b) in truth if rows[a] == rows[b]}
    assert ident <= found


def test_simhash_near_dups(spark, documents):
    sub = documents.filter(F.col("doc_id") < 300)
    cands = simhash_candidates(sub).collect()
    rows = {r.doc_id: r.text for r in sub.collect()}
    # identical docs have hamming 0 and must be candidates
    ident = {(a, b) for a, b in itertools.combinations(sorted(rows), 2)
             if rows[a] == rows[b]}
    got = {(r.id_a, r.id_b) for r in cands}
    zero = {(r.id_a, r.id_b) for r in cands if r.hamming == 0}
    assert ident <= got
    assert ident <= zero


def test_simhash_arrow_column_parity(spark, documents):
    """The Arrow-batched majority vote (default) and the pure-Column
    fold are bit-identical fingerprints → identical candidate sets."""
    sub = documents.filter(F.col("doc_id") < 500)
    arrow = simhash_candidates(sub, impl="arrow").collect()
    column = simhash_candidates(sub, impl="column").collect()
    key = lambda r: (r.id_a, r.id_b, r.hamming)  # noqa: E731
    assert sorted(map(key, arrow)) == sorted(map(key, column))
    assert len(arrow) > 0


def test_brute_force_topk_matches_numpy(spark, embeddings):
    import numpy as np

    qids = [0, 1, 2]
    out = brute_force_topk(embeddings, make_queries(embeddings, qids),
                           k=5).collect()
    pdf = embeddings.orderBy("vec_id").toPandas()
    mat = np.array(pdf["embedding"].tolist())
    ids = pdf["vec_id"].to_numpy()
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for q in qids:
        sims = mat_n @ mat_n[list(ids).index(q)]
        order = sorted(
            [(round(float(s), 6), int(i)) for s, i in zip(sims, ids)
             if i != q], key=lambda t: (-t[0], t[1]))[:5]
        got = sorted([(r.sim, r.vec_id) for r in out
                      if r.query_id == q],
                     key=lambda t: (-t[0], t[1]))
        assert [i for _, i in got] == [i for _, i in order]


def test_lsh_and_ivf_recall(spark, embeddings):
    qids = [3, 7, 11, 19]
    queries = make_queries(embeddings, qids)
    exact = brute_force_topk(embeddings, queries, k=10).collect()
    truth = {q: {r.vec_id for r in exact if r.query_id == q}
             for q in qids}

    tables = lsh_tables(dim=64, n_planes=6, n_tables=16)
    approx = lsh_topk(embeddings, queries, tables, k=10).collect()
    lsh_recall = sum(
        len({r.vec_id for r in approx if r.query_id == q} & truth[q])
        for q in qids) / (10 * len(qids))

    cents = ivf_centroids(embeddings, n_centroids=8)
    ivf = ivf_topk(embeddings, queries, cents, k=10, nprobe=3).collect()
    ivf_recall = sum(
        len({r.vec_id for r in ivf if r.query_id == q} & truth[q])
        for q in qids) / (10 * len(qids))

    # approximate paths trade recall for candidate pruning; floors are
    # intentionally loose — the structural contract is "subset of corpus,
    # correct shape, non-trivial recall"
    assert lsh_recall >= 0.3, f"LSH recall {lsh_recall}"
    assert ivf_recall >= 0.5, f"IVF recall {ivf_recall}"


def test_benchmark_overlap_planted(spark):
    """Planted contamination is found; clean docs are absent; the probe
    side broadcasts (corpus never shuffles to meet it)."""
    from jsi_spark.ops.dedup import benchmark_overlap

    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "pack my box with five dozen liquor jugs")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(10, "he saw the quick brown fox run"),        # overlaps probe 0
         (11, "jugs liquor dozen five with box my pack"),  # same tokens
                                                            # reversed: no
                                                            # shared 3-gram
         (12, "completely unrelated sentence here ok"),
         (13, "the quick brown fox jumps again and pack my box with "
              "five dozen")],                           # overlaps 0 and 1
        "doc_id long, text string")
    out = {r.doc_id: r for r in benchmark_overlap(corpus, bench).collect()}
    assert set(out) == {10, 13}
    assert out[10].n_hits == 2        # "the quick brown", "quick brown fox"
    assert out[10].n_probe_docs == 1
    assert out[13].n_probe_docs == 2  # hits both benchmark docs
    # reversed word order shares no 3-gram: doc 11 must be clean
    plan = (benchmark_overlap(corpus, bench)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_embedding_near_duplicates_planted(spark):
    """Planted near-identical vectors must be recovered: identical
    vectors land in the same bucket of EVERY table, so recall on exact
    dups is 1.0 regardless of plane luck; unrelated orthogonal-ish
    vectors must stay out."""
    import random
    rng = random.Random(42)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(20)]
    rows = [(i, v) for i, v in enumerate(base)]
    # plant: 100+i duplicates vector i (tiny perturbation, cos ≈ 1)
    rows += [(100 + i, [x * 1.0001 for x in base[i]]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    tables = lsh_tables(dim=16, n_planes=4, n_tables=8, seed=5)
    out = embedding_near_duplicates(emb, tables, threshold=0.99).collect()
    found = {(r.id_a, r.id_b) for r in out}
    assert {(i, 100 + i) for i in range(5)} <= found
    for r in out:
        assert r.sim >= 0.99

    # bucket-size cap: 0-cap drops every bucket -> no candidates
    assert embedding_near_duplicates(emb, tables, threshold=0.0,
                                     max_bucket_size=0).count() == 0


def test_emb_near_dups_matches_golden(spark):
    """Driver query ≡ pure-numpy golden (bit-exact, incl. rounded sim)."""
    import __spark_entry__ as entrymod
    from jsi_spark.oracles import _read as oracle_read
    from jsi_spark.oracles import emb_near_dup_rows

    got = sorted(tuple(r) for r in
                 entrymod.q_emb_near_dups(spark, SF_DIR).collect())
    emb = [(vid, [float(x) for x in v])
           for vid, v in oracle_read(SF_DIR, "embeddings",
                                     ["vec_id", "embedding"])]
    assert got == sorted(emb_near_dup_rows(emb))


def test_text_profile_oracle(spark, documents):
    out = text_profile(documents.limit(50)).collect()
    texts = {r.doc_id: r.text
             for r in documents.limit(50).collect()}
    for r in out:
        t = texts[r.doc_id]
        assert r.ws_tokens == len(t.split())
        assert r.pred_lang in ("en", "es", "de", "fr", "und")
        assert 0.0 <= r.quality <= 1.0
        assert r.fingerprint >= 0
    # deterministic: same text ⇒ same fingerprint
    by_text = {}
    for r in out:
        by_text.setdefault(texts[r.doc_id], set()).add(r.fingerprint)
    assert all(len(v) == 1 for v in by_text.values())


def test_multimodal_plumbing(spark):
    from jsi_spark.datagen import gen_media_dim
    from jsi_spark.ops.multimodal import (
        extract_features, resize_images, synth_media,
    )

    media = synth_media(gen_media_dim(spark, 200))
    feats = extract_features(media).collect()
    assert len(feats) == 200
    for r in feats[:20]:
        assert len(r.features) == 16
        assert all(-1.0 <= f <= 1.0 for f in r.features)
        if r.media_kind == "image":
            assert r.n_frames == 1
        else:
            assert r.n_frames >= 1
    # determinism across runs
    again = {r.media_ref: r.features
             for r in extract_features(media).collect()}
    for r in feats:
        assert again[r.media_ref] == r.features

    resized = resize_images(media).filter(
        F.col("media_kind") == "image").collect()
    for r in resized:
        assert max(r.target_width, r.target_height) <= 256
        assert r.target_width <= r.width and r.target_height <= r.height

    # synth_media payloads are hash bytes, not a supported codec format:
    # decode="real" raises at the codec plug point (inside the UDF, so
    # at action time, surfaced through Spark's PythonException)
    with pytest.raises(Exception, match="plug the codec"):
        extract_features(media, decode="real").collect()


def test_simhash_bucket_cap_defuses_hot_cluster(spark):
    """A template cluster larger than max_bucket_size contributes no
    pairs (it is a duplicate *group* by construction); uncapped it goes
    quadratic."""
    rows = [(i, "the same boilerplate text repeated for every document")
            for i in range(30)]
    rows += [(100, "a unique document about something else entirely"),
             (101, "a unique document about something else entirely ok")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = simhash_candidates(df, max_bucket_size=None).count()
    capped = {(r.id_a, r.id_b)
              for r in simhash_candidates(df, max_bucket_size=10).collect()}
    assert uncapped >= 30 * 29 / 2
    assert not any(a < 30 and b < 30 for a, b in capped)


def test_ngram_df_cap_drops_stop_shingles(spark):
    """A corpus-wide shingle above the df cap is removed from the
    universe (numerator AND denominator), so docs sharing only that
    boilerplate yield no pairs."""
    rows = [(i, f"alpha beta gamma u{i} v{i} w{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(df, threshold=0.1,
                                   max_shingle_df=None).count()
    capped = ngram_jaccard_pairs(df, threshold=0.1,
                                 max_shingle_df=5).count()
    assert uncapped == 20 * 19 / 2   # all pairs share "alpha beta gamma"
    assert capped == 0


def test_release_caches(spark, documents):
    from jsi_spark.ops.dedup import release_caches

    sub = documents.filter(F.col("doc_id") < 50)
    minhash_near_duplicates(sub, threshold=0.8).count()
    assert release_caches() >= 2
    assert release_caches() == 0


def test_duplicate_clusters_union_find_oracle(spark):
    from jsi_spark.ops.dedup import duplicate_clusters
    from jsi_spark.oracles import union_find_clusters

    # two chains + a triangle + an isolated pair; chain diameter > 1
    # exercises multi-round propagation
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12),
             (20, 21), (5, 6), (6, 7), (7, 8), (8, 9)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = sorted((r.id, r.cluster_id)
                 for r in duplicate_clusters(df).collect())
    assert got == union_find_clusters(edges)
    # every component labeled by its minimum id
    assert dict(got)[4] == 1 and dict(got)[12] == 10 and dict(got)[9] == 5


def test_golden_dedup_clusters_matches(spark):
    from conftest import SF_DIR
    import duckdb

    import __spark_entry__ as E
    from jsi_spark.oracles import golden_oracle_sqls

    df = E.queries()["dedup_clusters"](spark, SF_DIR)
    got = sorted((r.id, r.cluster_id) for r in df.collect())
    con = duckdb.connect()
    rows = con.execute(golden_oracle_sqls(SF_DIR)["dedup_clusters"]) \
        .fetchall()
    assert got == sorted(rows)


def test_repetition_features_oracle(spark):
    from jsi_spark.ops.text import repetition_features

    rows = [
        (1, "a b\na b\nc d\n\na b"),          # 'a b' x3 of 4 lines
        (2, "unique one\nunique two"),
        (3, "spam spam spam spam spam"),       # hot bigram 'spam spam'
        (4, ""),
        (5, "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.f.asDict()
           for r in df.select("doc_id",
                              repetition_features(F.col("text"))
                              .alias("f")).collect()}

    def oracle(text):
        lines = [ln for ln in text.split("\n") if ln.strip()]
        n = len(lines)
        extra = 0
        seen = {}
        for ln in lines:
            seen[ln] = seen.get(ln, 0) + 1
        extra = sum((c - 1) * len(ln) for ln, c in seen.items())
        line_chars = sum(len(ln) for ln in lines)
        # match Spark tokens(): split(lower(trim(text)), \s+)
        toks = text.strip().lower().split() if text.strip() else [""]
        grams = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
        cover = 0
        for g in set(grams):
            cover = max(cover, grams.count(g) * len(g))
        return {
            "dup_line_frac": round((n - len(seen)) / max(n, 1), 6),
            "dup_line_char_frac": round(extra / max(line_chars, 1), 6),
            "top_bigram_char_frac": round(cover / max(len(text), 1), 6),
        }

    for doc_id, text in rows:
        exp = oracle(text)
        for k, v in exp.items():
            assert got[doc_id][k] == pytest.approx(v, abs=1e-9), \
                (doc_id, k, got[doc_id], exp)
    assert got[1]["dup_line_frac"] == pytest.approx(0.5)
    assert got[3]["top_bigram_char_frac"] > 0.3


def test_stratified_cap_exact_and_skew_path(spark, documents):
    import hashlib

    from jsi_spark.ops.sampling import stratified_cap, stratum_budget_report

    cap = 7
    out = stratified_cap(documents, cap=cap, margin=1.2)
    plain = stratified_cap(documents, cap=cap, prefilter=False)
    got = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert got == sorted(r.doc_id for r in plain.select("doc_id").collect())

    # pandas oracle: smallest (md5(id), id) per source
    pdf = documents.select("doc_id", "source").toPandas()
    pdf["r"] = pdf.doc_id.map(
        lambda i: hashlib.md5(str(i).encode()).hexdigest())
    exp = (pdf.sort_values(["r", "doc_id"]).groupby("source").head(cap))
    assert got == sorted(exp.doc_id)

    # all original columns preserved
    assert out.columns == documents.columns

    rep = {r.stratum: (r.n_docs, r.n_kept, r.capped)
           for r in stratum_budget_report(documents, cap=cap).collect()}
    by_src = pdf.groupby("source").size()
    for s, n in by_src.items():
        assert rep[s] == (n, min(n, cap), n > cap)


def test_stratified_cap_projected_window_plan(spark, documents):
    """The rank shuffle must not carry the document payload: no `text`
    reference below the window's Exchange."""
    from jsi_spark.ops.sampling import stratified_cap

    plan = stratified_cap(documents, cap=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "_rn" in plan
    # every Exchange/Sort feeding the window partitions on _s — none
    # may reference the payload column
    saw_window_exchange = False
    for line in plan.splitlines():
        if "hashpartitioning(_s" in line or ("Sort" in line
                                             and "_r" in line):
            saw_window_exchange = True
            assert "text" not in line, line
    assert saw_window_exchange


def test_repetition_features_property_based(spark):
    """Hypothesis-style sweep without per-example Spark jobs: generate
    a batch of adversarial random texts, run ONE DataFrame pass, and
    compare every row against the pure-Python definition."""
    import random

    from jsi_spark.ops.text import repetition_features

    rng = random.Random(20260817)
    words = ["a", "bb", "ccc", "dd dd", "x", "longword", "1", "!"]
    texts = []
    for _ in range(60):
        n_lines = rng.randint(0, 6)
        lines = []
        for _ in range(n_lines):
            k = rng.randint(0, 5)
            lines.append(" ".join(rng.choice(words) for _ in range(k)))
        if lines and rng.random() < 0.5:    # force duplicate lines
            lines.append(rng.choice(lines))
        texts.append("\n".join(lines))
    texts += ["", " ", "\n\n", "a", "a\na", " \n a \n a"]
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.f.asDict()
           for r in df.select("doc_id",
                              repetition_features(F.col("text"))
                              .alias("f")).collect()}

    def expected(text):
        import re

        # mirror the ENGINE's semantics exactly: Spark trim() (and the
        # DuckDB oracle's trim()) strips spaces only, not \n/\t, and
        # Spark split keeps boundary empty tokens
        lines = [ln for ln in text.split("\n") if ln.strip(" ")]
        seen = {}
        for ln in lines:
            seen[ln] = seen.get(ln, 0) + 1
        extra = sum((c - 1) * len(ln) for ln, c in seen.items())
        line_chars = sum(len(ln) for ln in lines)
        toks = re.split(r"\s+", text.lower().strip(" "))
        grams = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
        cover = max((grams.count(g) * len(g) for g in set(grams)),
                    default=0)
        return (round((len(lines) - len(seen)) / max(len(lines), 1), 6),
                round(extra / max(line_chars, 1), 6),
                round(cover / max(len(text), 1), 6))

    for doc_id, text in rows:
        e = expected(text)
        g = (got[doc_id]["dup_line_frac"],
             got[doc_id]["dup_line_char_frac"],
             got[doc_id]["top_bigram_char_frac"])
        for gv, ev in zip(g, e):
            assert gv == pytest.approx(ev, abs=1e-9), (doc_id, repr(text), g, e)


def test_multipleof_divisor_overflow_branch(spark):
    """Divisor outside Decimal(38,12): double-fmod fallback, no crash."""
    from pyspark.sql import types as T

    from jsi_spark.compile.compiler import compile_schema
    from jsi_spark.exec.columnar import typed_validator

    schema = {"$schema": "https://json-schema.org/draft/2020-12/schema",
              "properties": {"x": {"multipleOf": 1e30}}}
    st = T.StructType([T.StructField("x", T.DoubleType())])
    tv = typed_validator(compile_schema(schema), st)
    df = spark.createDataFrame([(2e30,), (1.5e30,), (0.0,)], st)
    got = {r.x: r.v
           for r in df.select("x", tv.valid_column().alias("v")).collect()}
    assert got[2e30] is True and got[0.0] is True
    assert got[1.5e30] is False


def test_multipleof_huge_value_fractional_divisor(spark):
    """Value outside Decimal(38,12) with a fractional divisor: IEEE fmod
    fallback — exact huge multiples (2^90 % 2.0) are VALID (reference
    BigDecimal semantics, numeric.rb), while the official suite's
    1e308 % 0.123456789 stays invalid. Typed must agree with the generic
    path's Fraction fallback."""
    from pyspark.sql import types as T

    from jsi_spark.compile.compiler import compile_schema, is_multiple_of
    from jsi_spark.exec.columnar import typed_validator

    cases = [(float(2 ** 90), 2.0, True),
             (float(2 ** 90) + 2.0 ** 38, 2.0, True),   # still a multiple
             (1e308, 0.123456789, False),
             (float(2 ** 90), 3.0, False)]
    for v, q, want in cases:
        assert is_multiple_of(v, q) is want, (v, q)
        schema = {"$schema":
                  "https://json-schema.org/draft/2020-12/schema",
                  "properties": {"x": {"multipleOf": q}}}
        st = T.StructType([T.StructField("x", T.DoubleType())])
        tv = typed_validator(compile_schema(schema), st)
        df = spark.createDataFrame([(v,)], st)
        got = df.select(tv.valid_column().alias("ok")).collect()[0].ok
        assert got is want, (v, q, got)


def test_gen_corpora_deterministic_and_structured(spark):
    """gen_text_corpus / gen_vec_corpus (the scale-stress inputs):
    values independent of partitioning, planted duplicate structure
    present — a hot template/identical cluster plus exact+near dup
    classes — so the bucket caps have something real to defuse."""
    from pyspark.sql import functions as F

    from jsi_spark.datagen import gen_text_corpus, gen_vec_corpus

    d1 = gen_text_corpus(spark, 1500, partitions=2)
    d2 = gen_text_corpus(spark, 1500, partitions=11)
    assert d1.exceptAll(d2).count() == 0 and d2.exceptAll(d1).count() == 0
    assert d1.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,lang:string,source:string,"
        "n_chars:bigint>")
    # hot template cluster: one text shared by ~0.5% of rows
    top = (d1.groupBy("text").count().orderBy(F.desc("count"))
           .first())["count"]
    assert top >= 4
    # near-dup class: pairs with high-but-not-1.0 token Jaccard exist
    assert d1.count() - d1.select("text").distinct().count() >= top - 1

    v1 = gen_vec_corpus(spark, 800, partitions=2)
    v2 = gen_vec_corpus(spark, 800, partitions=7)
    assert v1.exceptAll(v2).count() == 0
    assert v1.schema.simpleString() == (
        "struct<vec_id:bigint,embedding:array<float>,label:int>")
    vtop = (v1.groupBy(F.col("embedding").cast("string")).count()
            .orderBy(F.desc("count")).first())["count"]
    assert vtop >= 2  # identical-vector cluster planted


def test_bucket_assignment_helpers_match_pair_ops(spark, documents):
    """The censused bucket frames (minhash_band_buckets /
    lsh_bucket_assignments) are the SAME bucketing the candidate joins
    run on: every candidate pair shares at least one censused bucket."""
    from pyspark.sql import functions as F

    from jsi_spark.ops.dedup import (
        lsh_candidate_pairs, minhash_band_buckets, release_caches,
    )

    docs = documents.limit(300)
    banded = minhash_band_buckets(docs)
    pairs = lsh_candidate_pairs(docs, max_bucket_size=None)
    a = banded.alias("a")
    b = banded.alias("b")
    joined = (a.join(b, (F.col("a.band") == F.col("b.band"))
                     & (F.col("a.bucket") == F.col("b.bucket"))
                     & (F.col("a._id") < F.col("b._id")))
              .select(F.col("a._id").alias("id_a"),
                      F.col("b._id").alias("id_b")).distinct())
    assert pairs.exceptAll(joined).count() == 0
    assert joined.exceptAll(pairs).count() == 0
    release_caches()


def test_duplicate_clusters_star_matches_union_find(spark):
    """Alternating large-star/small-star CC: same contract as
    duplicate_clusters, O(log n) rounds on ANY graph. Cases: the
    label-prop fixture graph, a seeded random graph, and a 64-node
    CHAIN whose diameter exceeds label-prop's default round budget —
    the regime the star variant exists for."""
    import random

    from jsi_spark.ops.dedup import duplicate_clusters_star
    from jsi_spark.oracles import union_find_clusters

    fixture = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12),
               (20, 21), (5, 6), (6, 7), (7, 8), (8, 9)]
    rng = random.Random(5)
    rand = [(rng.randrange(100), rng.randrange(100)) for _ in range(150)]
    rand = [(a, b) for a, b in rand if a != b]
    chain = [(i, i + 1) for i in range(64)]
    for edges in (fixture, rand, chain):
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = sorted((r.id, r.cluster_id)
                     for r in duplicate_clusters_star(df).collect())
        assert got == union_find_clusters(edges)


def test_duplicate_clusters_star_on_minhash_pairs(spark, documents):
    """Star CC and label-prop CC agree on real near-dup pairs."""
    from jsi_spark.ops.dedup import (
        duplicate_clusters, duplicate_clusters_star,
        minhash_near_duplicates, release_caches,
    )

    pairs = minhash_near_duplicates(documents, threshold=0.5) \
        .select("id_a", "id_b").localCheckpoint(eager=True)
    release_caches()
    a = sorted(map(tuple, duplicate_clusters(pairs).collect()))
    b = sorted(map(tuple, duplicate_clusters_star(pairs).collect()))
    assert a == b


def test_duplicate_clusters_auto_matches_union_find(spark):
    """Auto-dispatch CC: the label-prop probe answers tiny-diameter
    graphs outright; a 64-chain (diameter >> probe_rounds) exercises
    the quotient+star fallback; a mixed graph exercises BOTH regimes in
    one call (converged clusters collapse to quotient singletons, the
    chain contracts via star). All must equal the union-find golden."""
    import random

    from jsi_spark.ops.dedup import duplicate_clusters_auto
    from jsi_spark.oracles import union_find_clusters

    fixture = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12),
               (20, 21), (5, 6), (6, 7), (7, 8), (8, 9)]
    chain = [(i, i + 1) for i in range(64)]
    rng = random.Random(11)
    mixed = (fixture + [(100 + i, 101 + i) for i in range(40)]
             + [(rng.randrange(200, 260), rng.randrange(200, 260))
                for _ in range(60)])
    mixed = [(a, b) for a, b in mixed if a != b]
    for edges in (fixture, chain, mixed):
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = sorted((r.id, r.cluster_id)
                     for r in duplicate_clusters_auto(df).collect())
        assert got == union_find_clusters(edges)


def test_duplicate_clusters_auto_probe_short_circuits(spark):
    """On a tiny-diameter graph the probe converges and the star phase
    must not run: pin by passing max_iter=0 AND a path graph (1-2-3)
    whose raw edge set is NOT a star forest — a 0-round star phase
    would label 3 with 2, so only the propagation path yields the
    union-find answer."""
    from jsi_spark.ops.dedup import duplicate_clusters_auto
    from jsi_spark.oracles import union_find_clusters

    edges = [(1, 2), (2, 3), (7, 8)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = sorted((r.id, r.cluster_id)
                 for r in duplicate_clusters_auto(
                     df, probe_rounds=6, max_iter=0).collect())
    assert got == union_find_clusters(edges)


def test_train_quantizer_deterministic_and_order_free():
    """Quantizer training (shared engine/oracle routine) is a pure
    function of the sample SET: permuting input row order changes
    nothing (rows are re-sorted by the hash rule), seeds come from the
    hash order, one Lloyd step moves centroids to member means, and an
    empty cell keeps its seed."""
    import random as _r

    import numpy as np

    from jsi_spark.functions.xxh64 import xxhash64
    from jsi_spark.ops.similarity import train_quantizer

    rng = _r.Random(7)
    sample = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(40)]
    cents = train_quantizer(sample, n_centroids=4)
    shuffled = list(sample)
    rng.shuffle(shuffled)
    assert train_quantizer(shuffled, n_centroids=4) == cents
    assert len(cents) == 4 and all(len(c) == 8 for c in cents)

    # refined centroids are member means under first-max cosine argmax
    order = sorted(sample, key=lambda r: (xxhash64(("long", r[0])) % 997,
                                          r[0]))
    seeds = np.asarray([v for _, v in order[:4]])
    mat = np.asarray([v for _, v in order], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    cell = np.argmax((mat @ seeds.T) / norms, axis=1)
    for c in range(4):
        members = mat[cell == c]
        want = members.mean(axis=0) if len(members) else seeds[c]
        assert cents[c] == [float(x) for x in want]

    # duplicate vectors: all land in one cell; empty cells keep seeds
    flat = [(i, [1.0] * 8) for i in range(10)]
    cents2 = train_quantizer(flat, n_centroids=3)
    assert cents2[0] == [1.0] * 8
    assert cents2[1] == [1.0] * 8 and cents2[2] == [1.0] * 8


def test_ivf_topk_empty_queries(spark):
    """An empty query frame returns an empty, correctly-typed result
    (the literal inline() probe frame cannot express a zero-row array)."""
    from jsi_spark.ops.similarity import ivf_topk
    emb = spark.createDataFrame([(1, [0.1] * 4), (2, [0.2] * 4)],
                                "vec_id long, embedding array<double>")
    q = spark.createDataFrame([], "query_id long, qvec array<double>")
    out = ivf_topk(emb, q, [[0.1] * 4, [0.9] * 4], k=2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == \
        ["query_id", "vec_id", "rank", "sim"]


def test_semantic_dedup_planted(spark):
    """SemDeDup drop rule: a planted near-identical copy of vector i
    lands in i's cell (identical direction → identical argmax) and is
    dropped with dup_of == i; near-orthogonal base vectors survive a
    high threshold. Cap of 0 drops every cell → empty result."""
    import random

    from jsi_spark.ops.similarity import semantic_dedup, train_quantizer
    rng = random.Random(7)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(20)]
    rows = [(i, v) for i, v in enumerate(base)]
    rows += [(100 + i, [x * 1.0001 for x in base[i]]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_quantizer(rows, 4)
    out = semantic_dedup(emb, cents, threshold=0.99).collect()
    got = {(r.vec_id, r.dup_of) for r in out}
    assert got == {(100 + i, i) for i in range(5)}
    for r in out:
        assert r.sim >= 0.99
    assert semantic_dedup(emb, cents, threshold=0.0,
                          max_cell_size=0).count() == 0


def test_semantic_dedup_matches_golden(spark):
    """Driver query ≡ pure-numpy golden (bit-exact, incl. rounded sim),
    and invariant under input partitioning."""
    import __spark_entry__ as entrymod
    from jsi_spark.oracles import _read as oracle_read
    from jsi_spark.oracles import semantic_dedup_rows

    got = sorted(tuple(r) for r in
                 entrymod.q_semantic_dedup(spark, SF_DIR).collect())
    emb = [(vid, [float(x) for x in v])
           for vid, v in oracle_read(SF_DIR, "embeddings",
                                     ["vec_id", "embedding"])]
    assert got == sorted(semantic_dedup_rows(emb))
    assert len(got) > 0

    # partition-layout independence: same corpus, adversarial layout
    from jsi_spark.ops.similarity import ivf_centroids, semantic_dedup
    emb_df = entrymod._emb_double(spark, SF_DIR).repartition(13)
    cents = ivf_centroids(emb_df, n_centroids=8)
    got2 = sorted(tuple(r) for r in
                  semantic_dedup(emb_df, cents, threshold=0.35).collect())
    assert got2 == got


def test_pq_topk_planted_twin(spark):
    """A near-identical planted twin encodes to the SAME m codes, so
    its ADC distance equals the query's own self-distance floor — it
    must be rank 1. Empty query set returns a typed empty frame."""
    import random

    from jsi_spark.ops.similarity import pq_topk, train_pq
    rng = random.Random(11)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(30)]
    rows = [(i, v) for i, v in enumerate(base)]
    rows += [(100, [x * 1.0001 for x in base[0]])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = train_pq(rows, m=4, n_codes=8)
    q = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"))
    out = pq_topk(emb, q, books, k=3).collect()
    top = [r for r in out if r.rank == 1][0]
    assert top.vec_id == 100
    empty = pq_topk(emb, q.limit(0), books, k=3)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "vec_id", "rank", "adist"]


def test_ann_pq_matches_golden(spark):
    """Driver query ≡ pure-numpy golden (bit-exact ADC distances), and
    invariant under input partitioning."""
    import __spark_entry__ as entrymod
    from jsi_spark.oracles import _read as oracle_read
    from jsi_spark.oracles import ann_pq_rows

    got = sorted(tuple(r) for r in
                 entrymod.q_ann_pq(spark, SF_DIR).collect())
    emb = [(vid, [float(x) for x in v])
           for vid, v in oracle_read(SF_DIR, "embeddings",
                                     ["vec_id", "embedding"])]
    assert got == sorted(ann_pq_rows(emb))
    assert len(got) == 25  # 5 queries x k=5

    from jsi_spark.ops.similarity import make_queries, pq_codebooks, pq_topk
    emb_df = entrymod._emb_double(spark, SF_DIR).repartition(13)
    books = pq_codebooks(emb_df, m=8, n_codes=64)
    got2 = sorted(tuple(r) for r in pq_topk(
        emb_df, make_queries(emb_df, entrymod.ANN_QUERY_IDS),
        books, k=5).collect())
    assert got2 == got


def test_ann_ivf_pq_matches_golden(spark):
    """Driver query ≡ pure-numpy golden; a planted twin shares cell
    AND codes, so it is rank 1 with the ADC floor distance."""
    import random

    import __spark_entry__ as entrymod
    from jsi_spark.oracles import _read as oracle_read
    from jsi_spark.oracles import ann_ivf_pq_rows

    got = sorted(tuple(r) for r in
                 entrymod.q_ann_ivf_pq(spark, SF_DIR).collect())
    emb = [(vid, [float(x) for x in v])
           for vid, v in oracle_read(SF_DIR, "embeddings",
                                     ["vec_id", "embedding"])]
    assert got == sorted(ann_ivf_pq_rows(emb))
    assert len(got) == 25

    from jsi_spark.ops.similarity import (
        ivf_pq_topk, train_pq_residual, train_quantizer,
    )
    rng = random.Random(23)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(30)]
    rows = [(i, v) for i, v in enumerate(base)]
    rows += [(100, [x * 1.0001 for x in base[0]])]
    emb_df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<double>")
    cents = train_quantizer(rows, 4)
    books = train_pq_residual(rows, cents, m=4, n_codes=8)
    q = emb_df.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"))
    out = ivf_pq_topk(emb_df, q, cents, books, k=3, nprobe=2).collect()
    assert [r for r in out if r.rank == 1][0].vec_id == 100
    assert ivf_pq_topk(emb_df, q.limit(0), cents, books, k=3).count() == 0


def test_semantic_dedup_strategies_agree(spark):
    """The pairs (JVM fold) and grouped (per-cell GEMM) strategies
    implement the same contract; on the test corpus their rounded
    outputs are identical."""
    import __spark_entry__ as entrymod
    from jsi_spark.ops.similarity import (
        ivf_centroids, semantic_dedup, semantic_n_centroids,
    )
    emb = entrymod._emb_double(spark, SF_DIR)
    k = semantic_n_centroids(500)
    cents = ivf_centroids(emb, n_centroids=k)
    a = sorted(tuple(r) for r in semantic_dedup(
        emb, cents, threshold=0.35, max_cell_size=1000,
        strategy="pairs").collect())
    b = sorted(tuple(r) for r in semantic_dedup(
        emb, cents, threshold=0.35, max_cell_size=1000,
        strategy="grouped").collect())
    assert a == b and len(a) > 0


# -- exact-substring duplication coverage ---------------------------------------------

def _substr_golden(rows, k):
    """Pure-Python oracle for substring_dup_spans: global window count,
    then per-doc merged fixed-length interval coverage."""
    from collections import Counter
    toks = {d: t.lower().split() for d, t in rows}
    wins = {d: [" ".join(t[i:i + k]) for i in range(len(t) - k + 1)]
            for d, t in toks.items()}
    cnt = Counter(g for ws in wins.values() for g in ws)
    out = {}
    for d, t in toks.items():
        dup = [i for i, g in enumerate(wins[d]) if cnt[g] > 1]
        covered = 0
        for j, s in enumerate(dup):
            nxt = dup[j + 1] if j + 1 < len(dup) else None
            covered += k if nxt is None else min(k, nxt - s)
        frac = round(covered / len(t), 6)
        out[d] = (len(wins[d]), len(dup), covered, frac)
    return out


def test_substring_dup_spans_hand_computed(spark):
    from jsi_spark.ops.dedup import substring_dup_spans
    docs = spark.createDataFrame(
        [(0, "a b c d e"),        # shares "a b c","b c d" with doc 1
         (1, "x a b c d y"),
         (2, "p q"),              # shorter than k: zero windows
         (3, "z z z z z z")],     # self-repeats: fully covered
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"],
                         r["covered_tokens"], r["dup_token_fraction"])
           for r in substring_dup_spans(docs, k=3).collect()}
    assert got[0] == (3, 2, 4, round(4 / 5, 6))
    assert got[1] == (4, 2, 4, round(4 / 6, 6))
    assert got[2] == (0, 0, 0, 0.0)
    assert got[3] == (4, 4, 6, 1.0)


def test_substring_dup_spans_matches_golden(spark, documents):
    from jsi_spark.ops.dedup import substring_dup_spans
    rows = [(r["doc_id"], r["text"])
            for r in documents.select("doc_id", "text").collect()]
    want = _substr_golden(rows, k=8)
    got = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"],
                         r["covered_tokens"], r["dup_token_fraction"])
           for r in substring_dup_spans(documents, k=8).collect()}
    assert got == want
    assert any(v[1] > 0 for v in want.values())  # non-vacuous on testdata


def test_substring_dup_spans_layout_independent(spark, documents):
    from jsi_spark.ops.dedup import substring_dup_spans
    a = sorted(map(tuple, substring_dup_spans(documents, k=8).collect()))
    b = sorted(map(tuple, substring_dup_spans(
        documents.repartition(7, "source"), k=8).collect()))
    assert a == b


def test_substring_dup_spans_plan_pure_jvm(spark, documents):
    """The whole pipeline must stay JVM-side: no Python eval nodes, and
    the exchange below the dup-count aggregate carries only the
    fixed-width key projection, never the window text."""
    from jsi_spark.ops.dedup import substring_dup_spans
    plan = substring_dup_spans(documents, k=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# -- BPE trainer / encoder ------------------------------------------------------------

def test_bpe_train_hand_computed(spark):
    """'low low lower' x freq: first merges must follow max-freq with
    lexicographic tie-breaks, exactly as the pure-Python reference."""
    from jsi_spark.ops.bpe import encode_words_py, train_bpe
    docs = spark.createDataFrame(
        [(0, "low low low lower"), (1, "low lowest low")],
        "doc_id long, text string")
    merges = train_bpe(docs, n_merges=4)
    # word freqs: low x5, lower x1, lowest x1 -> all 7 words start l,o
    # pairs r1: (l,o)=7 (o,w)=7 (w,e)=2 ... tie 7: (l,o) < (o,w)
    assert merges[0] == ("l", "o")
    # r2: (lo,w)=7 wins
    assert merges[1] == ("lo", "w")
    # r3: (low,e)=2 wins over singles
    assert merges[2] == ("low", "e")
    assert encode_words_py("lowest", merges[:3]) == ["lowe", "s", "t"]


def test_bpe_matches_python_reference(spark, documents):
    """Distributed trainer == pure-Python trainer on the real corpus,
    and the encode query == the golden row set."""
    from jsi_spark.oracles import bpe_rows
    from jsi_spark.ops.bpe import bpe_token_counts, train_bpe
    rows = [(r["doc_id"], r["text"])
            for r in documents.select("doc_id", "text").collect()]
    want = bpe_rows(rows, n_merges=12)
    merges = train_bpe(documents, n_merges=12)
    # the driver-side and distributed trainers must learn identical
    # rules (driver_vocab_max=0 forces the distributed loop)
    assert train_bpe(documents, n_merges=12, driver_vocab_max=0) == merges
    got = sorted((r["doc_id"], r["n_words"], r["n_bpe_tokens"])
                 for r in bpe_token_counts(documents, merges).collect())
    assert got == want


def test_bpe_layout_independent(spark, documents):
    from jsi_spark.ops.bpe import bpe_token_counts, train_bpe
    m_a = train_bpe(documents, n_merges=6)
    m_b = train_bpe(documents.repartition(7, "source"), n_merges=6)
    assert m_a == m_b
    a = sorted(map(tuple, bpe_token_counts(documents, m_a).collect()))
    b = sorted(map(tuple, bpe_token_counts(
        documents.repartition(5), m_a).collect()))
    assert a == b


def test_bpe_corpus_side_plan_jvm(spark, documents):
    """The Arrow UDF may appear ONCE (vocab-side encode); the corpus
    side (split/explode/join/sum) must be JVM, and row-at-a-time Python
    must never appear."""
    from jsi_spark.ops.bpe import bpe_token_counts, train_bpe
    merges = train_bpe(documents, n_merges=3)
    plan = bpe_token_counts(documents, merges)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") == 1


def test_bpe_irrelevant_merges_yield_char_counts(spark):
    from jsi_spark.ops.bpe import bpe_token_counts
    docs = spark.createDataFrame([(0, "zzq")], "doc_id long, text string")
    # merge rules whose symbols never occur leave words as characters
    out = bpe_token_counts(docs, [("a", "b")]).collect()
    assert [tuple(r) for r in out] == [(0, 1, 3)]


def test_bpe_empty_doc_emits_zero_row(spark):
    """A doc whose text tokenizes to zero words still gets a
    (doc_id, 0, 0) row — the oracle emits one, so dropping it would
    break the driver's hash gate on a corpus with empty docs."""
    from jsi_spark.ops.bpe import bpe_token_counts
    docs = spark.createDataFrame(
        [(0, "ab ab"), (1, ""), (2, "   ")], "doc_id long, text string")
    out = sorted(tuple(r) for r in
                 bpe_token_counts(docs, [("a", "b")]).collect())
    assert out == [(0, 2, 2), (1, 0, 0), (2, 0, 0)]


# -- PII redaction ----------------------------------------------------------------------

def test_pii_scrub_hand_computed(spark):
    from jsi_spark.ops.text import pii_scrub
    docs = spark.createDataFrame(
        [(0, "mail a@b.co and c.d+x@e-f.org ok"),
         (1, "ip 10.0.3.250 phone 555-123-4567 end"),
         (2, "plain words only"),
         (3, "8.8.8.8")],
        "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in pii_scrub(docs).collect()}
    assert (got[0]["n_email"], got[0]["n_ipv4"], got[0]["n_phone"]) == (2, 0, 0)
    assert got[0]["scrubbed"] == "mail <EMAIL> and <EMAIL> ok"
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (0, 1, 1)
    assert got[1]["scrubbed"] == "ip <IPV4> phone <PHONE> end"
    assert got[2]["scrubbed"] == "plain words only"
    assert got[3]["scrubbed"] == "<IPV4>"


def test_pii_scrub_plan_pure_jvm(spark):
    from jsi_spark.ops.text import pii_scrub
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
