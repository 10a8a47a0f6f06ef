"""Deduplication operators for large-scale training-data pipelines.

All JVM-side expressions (no Python in the hot path):

- exact: hash-groupBy on normalized content; at 100 TB this is one
  shuffle of (hash, doc_id) pairs — never the text itself.
- MinHash + LSH: shingle → per-permutation min-hash → band buckets →
  candidate pairs via self-join on (band, band_hash). Only docs sharing
  a band bucket ever meet, so the pair space is output-sensitive rather
  than O(n²).
- n-gram Jaccard: exact similarity on shingle sets via an inverted-
  index self-join (explode shingle → join on shingle → count per pair).
- SimHash: 64-bit weighted-majority fingerprint; near-dup candidates
  share one of four 16-bit chunks (Hamming ≤ 3 w.h.p. heuristic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jsi_spark.session import ensure_py_files

# Persisted intermediates registered here so long-running sessions (the
# resumable CLI pipeline, the bench harness) can free them after the
# consuming action; persist() entries in Spark's CacheManager are keyed
# by logical plan and are NOT garbage-collected with the DataFrame.
_CACHED: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    # MEMORY_ONLY, not the MEMORY_AND_DISK default: these intermediates
    # are tiny key projections (a few longs per doc), and Spark's
    # semantics under memory pressure are safe either way (partitions
    # that don't fit are recomputed, not failed). Empirically the disk-
    # fallback flag alone makes the cache-write job ~14x slower on this
    # host (9.3s vs 0.66s for the same 20k-row frame), dominating every
    # dedup query at bench scale.
    from pyspark.storagelevel import StorageLevel
    df = df.persist(StorageLevel.MEMORY_ONLY)
    _CACHED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every intermediate cached by the dedup ops. Callers own
    the cache lifecycle: call after the action that consumes the result
    (later actions recompute — correct, just slower). Returns the number
    of frames released."""
    n = len(_CACHED)
    while _CACHED:
        _CACHED.pop().unpersist()
    return n


# -- exact ---------------------------------------------------------------------

def exact_duplicates(df: DataFrame, content_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, dup_group_size, is_canonical): canonical = lowest id in its
    content group.

    Groups by ``(xxhash64(content), length(content))``, NOT the content
    itself: the projection below the exchange is three fixed-width
    values per row, so at 100 TB the shuffle carries ~20 B/doc while the
    text stays in the scan stage. Collision risk for a 64-bit hash AND
    equal length is ~n²/2⁶⁵ within a group — negligible and detectable
    (a collision merges two groups; re-verify over-size groups by
    content if that matters downstream)."""
    w = Window.partitionBy("_h", "_len")
    w_rank = w.orderBy(F.col(id_col))
    return (df.select(F.col(id_col),
                      F.xxhash64(content_col).alias("_h"),
                      F.length(content_col).alias("_len"))
            .select(
                F.col(id_col),
                F.count(F.lit(1)).over(w).alias("dup_group_size"),
                (F.row_number().over(w_rank) == 1).alias("is_canonical")))


# -- shingles ---------------------------------------------------------------------

def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (sorted for deterministic output).

    Built by zipping n-1 shifted copies of the token array — each shift
    is evaluated ONCE per row. (The naive transform-over-indices form
    references `toks` inside the lambda, and Spark re-evaluates lambda-
    captured expressions per element: O(len²) tokenizations per row.)"""
    toks = F.split(F.lower(text), r"\s+")
    grams = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1,
                          F.greatest(F.size(toks) - k, F.lit(0)))
        # zip_with pads the shorter side with null; concat_ws skips
        # nulls, so trailing partial grams match the truncated-join form
        grams = F.zip_with(grams, shifted,
                           lambda g, t: F.concat_ws(" ", g, t))
    grams = F.slice(grams, 1,
                    F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.array_sort(F.array_distinct(grams))


# -- MinHash + LSH ------------------------------------------------------------------

def minhash_signature(shingles: Column, num_perm: int = 64,
                      seed: int = 1337) -> Column:
    """num_perm-wide signature: sig[j] = min over shingles of the
    permutation hash ``xxhash64(xxhash64(s, seed), j)``.

    Structured as ONE fold over the PRE-HASHED shingle array: the
    string hashes are a separate transform evaluated once per shingle,
    and the fold's per-permutation work re-hashes only the resulting
    long. (Folding over the raw shingles with the string hash inside
    the per-j lambda computes num_perm string hashes per shingle —
    interpreted HOF lambdas get no common-subexpression elimination
    across iterations; measured ~2x on this stage.) The expensive
    `shingles` expression is the transform's traversal argument, so it
    too evaluates once per row."""
    idx = F.sequence(F.lit(0), F.lit(num_perm - 1))
    init = F.array_repeat(F.lit((1 << 63) - 1).cast("long"), num_perm)
    hashes = F.transform(shingles,
                         lambda s: F.xxhash64(s, F.lit(seed)))
    return F.aggregate(
        hashes, init,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(idx, lambda j: F.xxhash64(h, j)),
            lambda a, b: F.least(a, b)))


# NOTE on impl choice (measured at sf0.1, 1M docs): an Arrow-batched
# numpy variant of the permutation fold (vectorized bit-exact XXH64 over
# the (Σ shingles, num_perm) matrix) ran 5x SLOWER than this JVM fold —
# the fmix chain is ~10 memory-bound elementwise passes with temporaries,
# where whole-row interpreted-HOF JVM evaluation stays register-resident.
# Arrow wins only when the per-batch math is BLAS-shaped (see
# similarity.lsh_buckets_arrow) or trivially wide bit ops (see
# simhash_from_hashes_arrow); keep minhash JVM-side.
def minhash_band_buckets(df: DataFrame, id_col: str = "doc_id",
                         content_col: str = "text", num_perm: int = 64,
                         bands: int = 16,
                         shingle_n: int = 3) -> DataFrame:
    """(_id, band, bucket) LSH band assignments — the projection the
    candidate self-join runs on, persisted (3 longs × bands per doc).
    Public so scale tooling can census bucket sizes with the exact
    production bucketing (tools/scale_stress.py)."""
    rows_per_band = num_perm // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(word_shingles(F.col(content_col), shingle_n),
                          num_perm).alias("_sig"))
    banded = sig.select(
        "_id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(F.concat_ws(
                    ",", F.transform(
                        F.slice("_sig", b * rows_per_band + 1,
                                rows_per_band),
                        lambda x: x.cast("string")))).alias("bucket"))))
        .alias("bb")).select("_id", "bb.band", "bb.bucket")
    # the self-join would otherwise recompute the full shingle→minhash
    # pipeline for BOTH sides; persist the (id, band, bucket) projection
    # (tiny: 3 longs × bands per doc) so each side is a cache scan
    return _persist(banded)


def lsh_candidate_pairs(df: DataFrame, id_col: str = "doc_id",
                        content_col: str = "text", num_perm: int = 64,
                        bands: int = 16, shingle_n: int = 3,
                        max_bucket_size: int | None = 200) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) that collide in at
    least one LSH band. rows/perm per band = num_perm // bands.

    ``max_bucket_size`` caps bucket width before the self-join: a bucket
    holding B docs yields B²/2 pairs, so one template cluster (boiler-
    plate shared by millions of docs) would otherwise dominate the
    output quadratically. Docs in over-cap buckets are duplicates *as a
    group* by construction — handle them as clusters, not pairs."""
    banded = minhash_band_buckets(df, id_col, content_col, num_perm,
                                  bands, shingle_n)
    if max_bucket_size is not None:
        ok_buckets = (banded.groupBy("band", "bucket")
                      .agg(F.count(F.lit(1)).alias("_n"))
                      .filter(F.col("_n") <= max_bucket_size)
                      .drop("_n"))
        banded = banded.join(ok_buckets, ["band", "bucket"])
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"))
            .distinct())


def minhash_near_duplicates(df: DataFrame, id_col: str = "doc_id",
                            content_col: str = "text",
                            threshold: float = 0.7, num_perm: int = 64,
                            bands: int = 16, shingle_n: int = 3,
                            max_bucket_size: int | None = 200) -> DataFrame:
    """LSH candidates verified with exact Jaccard on shingle sets:
    (id_a, id_b, jaccard). The shingle projection is persisted so the
    two verify-joins scan it instead of re-tokenizing the corpus."""
    pairs = lsh_candidate_pairs(df, id_col, content_col, num_perm, bands,
                                shingle_n, max_bucket_size)
    sh = _persist(df.select(F.col(id_col).alias("_id"),
                            word_shingles(F.col(content_col), shingle_n)
                            .alias("_sh")))
    joined = (pairs
              .join(sh.withColumnRenamed("_id", "id_a")
                    .withColumnRenamed("_sh", "sh_a"), "id_a")
              .join(sh.withColumnRenamed("_id", "id_b")
                    .withColumnRenamed("_sh", "sh_b"), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return (joined.select("id_a", "id_b",
                          (inter / union).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


# -- exact n-gram Jaccard (inverted index; oracle-friendly) -------------------------

def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        content_col: str = "text", shingle_n: int = 3,
                        threshold: float = 0.5,
                        max_shingle_df: int | None = 10_000) -> DataFrame:
    """Exact Jaccard over word n-gram sets for all pairs sharing ≥1
    shingle. The explode→join is the classic inverted-index plan: the
    shuffle carries (shingle, id), and only co-occurring docs meet.

    ``max_shingle_df`` drops shingles whose document frequency exceeds
    the cap from the universe BEFORE pair generation (stop-shingle
    removal): a shingle present in D docs contributes D²/2 pairs, so one
    piece of corpus-wide boilerplate otherwise explodes the pair space
    quadratically. The cap is applied consistently to numerator and
    denominator — the result is exact Jaccard over the capped shingle
    sets. ``None`` disables (exact, but unsafe on corpora with hot
    boilerplate).

    Plan shape (round 5 — replaced the classic inverted-index
    self-join): ONE shuffle groups the exploded (shingle, id) stream
    into per-shingle sorted id arrays; the df cap is then a free
    size() filter on the groups (the old shape needed a separate
    df-count aggregate PLUS a rare-set join), and the co-occurring
    pairs are generated MAP-SIDE from each array with higher-order
    functions — no self-join, so the shingle stream is shuffled once
    instead of three times (count, probe, build). Per-group memory and
    pair fan-out are both bounded by the cap (ids array ≤ 8·cap
    bytes; ≤ cap²/2 pairs emitted per group, the same pair count the
    join produced, minus its probe-side shuffle). Measured at sf0.1
    (bench, comparable host weather): 3.49 s → 2.44 s with identical
    output; the remaining wall is the pair-count aggregate plus
    fixed per-stage latency at this corpus size."""
    sh = df.select(F.col(id_col).alias("_id"),
                   F.explode(word_shingles(F.col(content_col), shingle_n))
                   .alias("sh"))
    groups = sh.groupBy("sh").agg(
        F.sort_array(F.collect_list("_id")).alias("ids"))
    if max_shingle_df is not None:
        groups = groups.filter(F.size("ids") <= max_shingle_df)
    groups = _persist(groups.select("ids"))
    # per-doc capped set size: one count over the exploded group ids
    sizes = (groups.select(F.explode("ids").alias("_id"))
             .groupBy("_id").agg(F.count(F.lit(1)).alias("n")))
    # ordered pairs (i < j) from each sorted array, map-side
    ids = F.col("ids")
    pair_arr = F.flatten(F.transform(
        ids,
        lambda x, i: F.transform(
            F.slice(ids, i + F.lit(2),
                    F.greatest(F.size(ids) - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("a"), y.alias("b")))))
    common = (groups.filter(F.size("ids") > 1)
              .select(F.explode(pair_arr).alias("p"))
              .groupBy(F.col("p.a").alias("id_a"),
                       F.col("p.b").alias("id_b"))
              .agg(F.count(F.lit(1)).alias("common")))
    out = (common
           .join(sizes.select(F.col("_id").alias("id_a"),
                              F.col("n").alias("n_a")), "id_a")
           .join(sizes.select(F.col("_id").alias("id_b"),
                              F.col("n").alias("n_b")), "id_b")
           .select("id_a", "id_b",
                   (F.col("common")
                    / (F.col("n_a") + F.col("n_b") - F.col("common")))
                   .alias("jaccard")))
    return out.filter(F.col("jaccard") >= threshold)


# -- duplicate clusters (connected components) ---------------------------------------

def duplicate_clusters(pairs: DataFrame, id_a: str = "id_a",
                       id_b: str = "id_b",
                       max_iter: int = 20) -> DataFrame:
    """(id, cluster_id): connected components over candidate pairs —
    cluster_id = the smallest id in the component. Near-dup PAIRS are
    the detector output; dedup decisions need CLUSTERS (keep one doc
    per component), and over-cap LSH buckets are already clusters by
    construction.

    Min-label propagation: every iteration joins each node's current
    label against its neighbors' and keeps the minimum, converging in
    O(component diameter) rounds — near-dup components are
    template-clusters with tiny diameters, so this is 2-4 shuffles in
    practice, each carrying only (id, label) longs. localCheckpoint
    truncates the growing lineage each round (at 100 TB the iteration
    count, not data volume, is the plan-size risk). The classic
    alternating large-star/small-star optimization drops in here if
    diameters ever grow."""
    edges = (pairs.select(F.col(id_a).alias("src"),
                          F.col(id_b).alias("dst"))
             .union(pairs.select(F.col(id_b).alias("src"),
                                 F.col(id_a).alias("dst")))
             .distinct())
    # materialize the edge list ONCE: every propagation round joins it,
    # and without this each round would recompute the entire upstream
    # candidate-pair pipeline (e.g. shingle→minhash→band) from scratch
    edges = edges.localCheckpoint(eager=True)
    labels, _ = _propagate(edges, max_iter)
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


def _propagate(edges: DataFrame, max_iter: int) -> tuple:
    """Min-label propagation over a checkpointed bidirectional
    (src, dst) edge frame. Returns ``(labels, converged)`` — labels as
    (id, label), and whether a fixpoint was observed within
    ``max_iter`` rounds (the convergence probe runs every 2nd round AND
    on the last, so the flag is always decided)."""
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("label", F.col("id")))
    converged = False
    for i in range(max_iter):
        neighbor_min = (edges.join(labels.withColumnRenamed("id", "dst")
                                   .withColumnRenamed("label", "nl"),
                                   "dst")
                        .groupBy("src").agg(F.min("nl").alias("nmin")))
        new_label = F.least("label", F.coalesce("nmin", "label"))
        new_labels = (labels.join(neighbor_min.withColumnRenamed(
                                      "src", "id"), "id", "left")
                      .select("id", new_label.alias("label"),
                              # labels only ever decrease, so "changed"
                              # is computed IN the propagation pass —
                              # no separate old-vs-new join job
                              (new_label < F.col("label"))
                              .alias("_changed")))
        new_labels = new_labels.localCheckpoint(eager=True)
        labels = new_labels.drop("_changed")
        # convergence probe every 2nd round (and on the last): a flag
        # scan of the just-checkpointed partitions. One wasted no-op
        # propagation round after convergence costs less than a driver
        # action every round — at 100 TB the per-round job count, not
        # the probe's data volume, is the driver-side bottleneck.
        if (i % 2 == 1 or i == max_iter - 1) and \
                new_labels.filter("_changed").isEmpty():
            converged = True
            break
    return labels, converged


def duplicate_clusters_star(pairs: DataFrame, id_a: str = "id_a",
                            id_b: str = "id_b",
                            max_iter: int = 20) -> DataFrame:
    """(id, cluster_id): connected components via alternating
    large-star/small-star rounds (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14 — public algorithm). Same output
    contract as :func:`duplicate_clusters`.

    Use WHEN component diameters are not small: label propagation is
    O(diameter) rounds, star contraction is O(log n) rounds on ANY
    graph — a duplicate CHAIN (a≈b≈c≈… from overlapping shingle edits)
    of length 10^6 takes label-prop 10^6 rounds but star ~20. Each
    round is one groupBy + one self-contribution union over (long,
    long) edges; the edge set only shrinks toward the final star
    forest, so per-round cost decreases.

    large-star: every node hangs its LARGER neighbors onto its current
    minimum (min over neighborhood ∪ self); small-star symmetrically
    re-hangs the smaller-or-equal side. Both preserve connectivity;
    alternation converges to per-component stars rooted at the
    component minimum."""
    edges = (pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
             .filter(F.col("u") != F.col("v")))
    nodes = (edges.select(F.col("u").alias("id"))
             .union(edges.select(F.col("v").alias("id"))).distinct()
             .localCheckpoint(eager=True))
    # canonical undirected form (min, max); star rounds rewire it
    edges = (edges.select(F.least("u", "v").alias("u"),
                          F.greatest("u", "v").alias("v"))
             .distinct().localCheckpoint(eager=True))

    def _round(e: DataFrame, large: bool) -> DataFrame:
        # neighborhoods as directed views: large-star groups by EVERY
        # endpoint (bidirectional), small-star by the larger endpoint
        if large:
            d = e.union(e.select(F.col("v").alias("u"),
                                 F.col("u").alias("v")))
        else:
            d = e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        m = (d.groupBy("u")
             .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        nbrs = d.join(m, "u")
        if large:
            # hang strictly-larger neighbors onto the local minimum
            out = (nbrs.filter(F.col("v") > F.col("u"))
                   .select(F.col("m").alias("u"), F.col("v").alias("v")))
        else:
            # re-hang all smaller-side neighbors and self onto the min
            out = (nbrs.select(F.col("m").alias("u"),
                               F.col("v").alias("v"))
                   .union(m.select(F.col("m").alias("u"),
                                   F.col("u").alias("v"))))
        return (out.filter(F.col("u") != F.col("v"))
                .select(F.least("u", "v").alias("u"),
                        F.greatest("u", "v").alias("v"))
                .distinct())

    for i in range(max_iter):
        new_edges = _round(_round(edges, large=True), large=False)
        new_edges = new_edges.localCheckpoint(eager=True)
        # converged when the (large ∘ small) round is a no-op: probe by
        # symmetric difference count on the tiny (long, long) edge set
        if (i % 2 == 1 or i == max_iter - 1) and \
                new_edges.exceptAll(edges).isEmpty() and \
                edges.exceptAll(new_edges).isEmpty():
            edges = new_edges
            break
        edges = new_edges
    # star forest: u = component min, v = member; singletons (nodes
    # whose every edge contracted away) label themselves. The min-agg
    # is a no-op at convergence (each member hangs off one root) and a
    # safe partial answer if max_iter truncated the contraction.
    labels = (edges.select(F.col("v").alias("id"),
                           F.col("u").alias("cluster_id"))
              .groupBy("id").agg(F.min("cluster_id").alias("cluster_id")))
    roots = (nodes.join(labels, "id", "left_anti")
             .select("id", F.col("id").alias("cluster_id")))
    return labels.union(roots)


def duplicate_clusters_auto(pairs: DataFrame, id_a: str = "id_a",
                            id_b: str = "id_b", probe_rounds: int = 4,
                            max_iter: int = 20) -> DataFrame:
    """(id, cluster_id): connected components with runtime strategy
    selection — the cheap-diameter-probe dispatcher over
    :func:`duplicate_clusters` (label-prop, O(diameter) rounds, 1
    shuffle/round — optimal for the tiny-diameter template clusters
    near-dup detection actually produces) and
    :func:`duplicate_clusters_star` (large/small-star contraction,
    O(log n) rounds on ANY graph — the chain-shaped safety net).

    The probe IS useful work, not a throwaway: run ``probe_rounds`` of
    label propagation. If the fixpoint is reached (the overwhelmingly
    common case — measured diameters on minhash pair graphs are 1-3),
    those labels are the answer and nothing else runs. Otherwise the
    graph has diameter > probe_rounds; instead of discarding the probe,
    contract the QUOTIENT graph (edges mapped through the partial
    labels, self-loops dropped — every propagated cluster collapses to
    one node) with star rounds and compose: node → partial label →
    star root. Correctness: partial labels always stay inside their
    component and the component-minimum node keeps itself, so quotient
    components image the original components and their min label is
    the component min — the same contract as both underlying ops.

    At 100 TB: the probe costs probe_rounds (id,label)-long shuffles on
    the quotient-bound edge set; the star phase then runs on a graph
    already shrunk by every diameter-≤probe cluster, which is the bulk
    of near-dup mass."""
    edges = (pairs.select(F.col(id_a).alias("src"),
                          F.col(id_b).alias("dst"))
             .union(pairs.select(F.col(id_b).alias("src"),
                                 F.col(id_a).alias("dst")))
             .distinct().localCheckpoint(eager=True))
    labels, converged = _propagate(edges, probe_rounds)
    if converged:
        return labels.select("id", F.col("label").alias("cluster_id"))
    lab_src = labels.select(F.col("id").alias("src"),
                            F.col("label").alias("la"))
    lab_dst = labels.select(F.col("id").alias("dst"),
                            F.col("label").alias("lb"))
    quotient = (edges.join(lab_src, "src").join(lab_dst, "dst")
                .filter(F.col("la") != F.col("lb"))
                .select(F.col("la").alias("id_a"),
                        F.col("lb").alias("id_b")))
    star = duplicate_clusters_star(quotient, max_iter=max_iter)
    return (labels.join(star.withColumnRenamed("id", "label"),
                        "label", "left")
            .select("id", F.coalesce("cluster_id", "label")
                    .alias("cluster_id")))


# -- SimHash -------------------------------------------------------------------------

def simhash64(text: Column, seed: int = 7) -> Column:
    """64-bit SimHash over word tokens: bit b set iff the majority of
    token-hashes have bit b set.

    Pure integer bit math: tokens are hashed ONCE each (a transform
    producing the hash array — NOT a hash expression inside the fold
    lambda, which Spark would re-evaluate per bit), then a single fold
    zip-adds each hash's 64 bits (``bit_get``, MSB-first) into a
    64-wide counter array; a final fold packs the majority votes into a
    long. Replaces the former ``lpad(bin(h))`` + 64 substring calls per
    token — string work for what is integer bit extraction."""
    toks = F.array_distinct(F.split(F.lower(text), r"\s+"))
    n = F.size(toks)
    msb_first = F.sequence(F.lit(63), F.lit(0), F.lit(-1))
    hashes = F.transform(toks, lambda t: F.xxhash64(t, F.lit(seed)))
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(msb_first, lambda i: F.bit_get(h, i).cast("int")),
            lambda a, b: a + b))
    return F.aggregate(
        counts, F.lit(0).cast("long"),
        # shiftleft, not *2: setting bit 63 overflows a signed long and
        # ANSI mode (Spark 4 default) raises on arithmetic overflow
        lambda acc, c: F.shiftleft(acc, 1)
        .bitwiseOR((c * 2 > n).cast("long")))


def simhash_from_hashes_arrow():
    """Arrow-batched SimHash finalizer: pandas_udf mapping the per-row
    array<long> of token hashes → int64 fingerprint. One numpy pass per
    batch unpacks every hash's 64 bits, segment-sums them with reduceat,
    and packs the majority votes — replacing tokens × 64 interpreted HOF
    add steps per row (same trade as :func:`minhash_signature_arrow`).
    Bit order matches :func:`simhash64`: output bit k = majority of
    input-hash bit k."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    shifts = np.arange(63, -1, -1, dtype=np.uint64)      # MSB-first

    def _sh(col):
        lens = np.fromiter(
            ((0 if v is None else len(v)) for v in col),
            dtype=np.int64, count=len(col))
        total = int(lens.sum())
        packed = np.zeros(len(col), dtype=np.int64)
        if total:
            flat = np.concatenate(
                [np.asarray(v, dtype=np.int64)
                 for v in col if v is not None and len(v)]
            ).astype(np.uint64)
            bits = ((flat[:, None] >> shifts[None, :])
                    & np.uint64(1)).astype(np.int64)     # (total, 64)
            nz = np.flatnonzero(lens)
            offs = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
            counts = np.add.reduceat(bits, offs, axis=0)  # (|nz|, 64)
            maj = (counts * 2 > lens[nz, None]).astype(np.uint64)
            with np.errstate(over="ignore"):
                packed[nz] = (maj << shifts[None, :]).sum(
                    axis=1, dtype=np.uint64).astype(np.int64)
        return pd.Series(
            [None if v is None else packed[i]
             for i, v in enumerate(col)])

    _sh.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(_sh, "bigint")


def simhash_chunk_buckets(df: DataFrame, id_col: str = "doc_id",
                          content_col: str = "text", chunks: int = 4,
                          impl: str = "arrow") -> DataFrame:
    """(_id, _h, chunk, val) banded SimHash frame: one row per doc per
    16-bit chunk of its 64-bit fingerprint, persisted. The blocking
    frame for :func:`simhash_candidates`'s self-join, exposed so
    tools/scale_stress.py can census the (chunk, val) bucket sizes with
    the exact production banding."""
    width = 64 // chunks
    if impl == "arrow":
        ensure_py_files(df.sparkSession)
        toks = F.array_distinct(
            F.split(F.lower(F.col(content_col)), r"\s+"))
        hashes = F.transform(toks,
                             lambda t: F.xxhash64(t, F.lit(7)))
        h_col = simhash_from_hashes_arrow()(hashes)
    else:
        h_col = simhash64(F.col(content_col))
    h = df.select(F.col(id_col).alias("_id"), h_col.alias("_h"))
    banded = h.select("_id", "_h", F.explode(F.array(*[
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftright(F.col("_h"), c * width)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("val"))
        for c in range(chunks)]))
        .alias("cb")).select("_id", "_h", "cb.chunk", "cb.val")
    # persist the tiny fingerprint projection: the self-join must not
    # recompute the 64-bit majority-vote expression for both sides
    return _persist(banded)


def simhash_candidates(df: DataFrame, id_col: str = "doc_id",
                       content_col: str = "text", chunks: int = 4,
                       max_bucket_size: int | None = 200,
                       impl: str = "arrow") -> DataFrame:
    """Near-dup candidates sharing ≥1 of 4 16-bit SimHash chunks,
    with exact Hamming distance attached.

    ``max_bucket_size`` caps (chunk, val) bucket width before the
    self-join, exactly as in :func:`lsh_candidate_pairs`: one hot 16-bit
    chunk value (short/empty docs, template clusters) otherwise yields
    B²/2 pairs. Docs in over-cap buckets are near-duplicates *as a
    group* by construction — handle them as clusters, not pairs."""
    banded = simhash_chunk_buckets(df, id_col=id_col,
                                   content_col=content_col,
                                   chunks=chunks, impl=impl)
    if max_bucket_size is not None:
        ok_buckets = (banded.groupBy("chunk", "val")
                      .agg(F.count(F.lit(1)).alias("_n"))
                      .filter(F.col("_n") <= max_bucket_size)
                      .drop("_n"))
        banded = banded.join(ok_buckets, ["chunk", "val"])
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                    & (F.col("a.val") == F.col("b.val"))
                    & (F.col("a._id") < F.col("b._id")))
             .select(F.col("a._id").alias("id_a"),
                     F.col("b._id").alias("id_b"),
                     F.col("a._h").alias("h_a"),
                     F.col("b._h").alias("h_b"))
             .distinct())
    xor = F.col("h_a").bitwiseXOR(F.col("h_b"))
    return pairs.select("id_a", "id_b",
                        F.bit_count(xor).alias("hamming"))


# -- decontamination (benchmark n-gram overlap) --------------------------------------

def benchmark_overlap(df: DataFrame, probe: DataFrame, shingle_n: int = 3,
                      id_col: str = "doc_id", content_col: str = "text",
                      probe_id_col: str = "doc_id",
                      probe_content_col: str = "text",
                      broadcast_probe: bool = True) -> DataFrame:
    """Decontamination: training docs sharing ≥1 word n-gram with a
    benchmark/eval probe set (the GPT-3 / Gopher n-gram overlap check —
    a training-data-pipeline op beyond the reference's own surface).
    Returns (id_col, n_hits, n_probe_docs): distinct overlapping
    shingles and how many distinct probe documents those shingles
    touch.

    Scale shape: the probe side (benchmarks are small — 10^5..10^6
    distinct shingles) is distinct-projected and broadcast, so the
    corpus side is a map-side hash-semi-join + one aggregate shuffle of
    matched (id, shingle, probe_id) rows only; the corpus text itself
    never shuffles. Set ``broadcast_probe=False`` for probe sets beyond
    broadcast size (falls back to a (shingle)-keyed shuffle join). The
    two exact COUNT(DISTINCT)s plan one Expand (input ×2) over the
    matched subset — matched rows are rare post-filter, so that is the
    right trade vs approx sketches here.
    """
    corpus = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(content_col), shingle_n))
        .alias("sh"))
    pr = (probe.select(
        F.col(probe_id_col).alias("_pid"),
        F.explode(word_shingles(F.col(probe_content_col), shingle_n))
        .alias("sh"))
        .distinct())
    if broadcast_probe:
        pr = F.broadcast(pr)
    return (corpus.join(pr, "sh")
            .groupBy("_id")
            .agg(F.countDistinct("sh").alias("n_hits"),
                 F.countDistinct("_pid").alias("n_probe_docs"))
            .select(F.col("_id").alias(id_col), "n_hits", "n_probe_docs"))


# -- exact-substring duplication coverage ---------------------------------------------

def substring_windows(text: Column, k: int = 8) -> Column:
    """Positional k-token windows of whitespace-split lowercased text
    (shifted-zip construction: O(k) array ops per row). Unlike
    word_shingles (which keeps one truncated gram so short docs still
    have a shingle set), a doc shorter than k tokens has ZERO windows.
    Shared by substring_dup_spans and the scale-stress census."""
    toks = F.split(F.lower(text), r"\s+")
    grams = toks
    for j in range(1, k):
        shifted = F.slice(toks, j + 1,
                          F.greatest(F.size(toks) - j, F.lit(0)))
        grams = F.zip_with(grams, shifted,
                           lambda g, t: F.concat_ws(" ", g, t))
    return F.slice(grams, 1,
                   F.greatest(F.size(toks) - (k - 1), F.lit(0)))


def substring_dup_spans(df: DataFrame, id_col: str = "doc_id",
                        content_col: str = "text", k: int = 8) -> DataFrame:
    """Per-document exact-substring duplication coverage: the
    distributed k-token-window realization of ExactSubstr dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499 — there a suffix array finds ≥50-token
    repeats; here every k-token window is fingerprinted and a window is
    *duplicated* when the identical token sequence occurs anywhere else
    in the corpus, another document or another offset of the same one).

    Returns one row per input document:
      n_windows          — number of k-token windows (0 when the doc is
                           shorter than k tokens)
      n_dup_windows      — windows whose text occurs >1 time corpus-wide
      covered_tokens     — tokens covered by ≥1 duplicated window
                           (fixed-length intervals, merged)
      dup_token_fraction — covered_tokens / token count (ROUND 6) — the
                           "fraction of the doc that is copied text"
                           signal used to drop or trim training docs

    Scale shape: the only per-window data that shuffles is
    (xxhash64(window), length(window), doc_id, pos) ≈ 24 B — the window
    text itself stays in the map stage, built by the shifted-zip trick
    (see word_shingles: O(k) array ops per row, not O(len·k)). Dup
    detection is a partial-agg count over the 64-bit key (+length, same
    collision posture as exact_duplicates: a (xxhash64, length)
    collision between DISTINCT same-length windows would mark false
    duplicates — the one place the Spark definition is hash-equality
    while the SQL oracle groups the full window text; at ~2^32 windows
    per birthday collision, accepted and documented rather than paid
    for with a text-equality confirm join) followed by a key-projected
    join that AQE skew-splits if one boilerplate window goes hot; the
    per-doc coverage fold is an array aggregate over that doc's dup
    positions (bounded by the doc's own token count). Two map-side
    scans of the text (windows + per-doc sizes), zero driver actions.
    """
    toks = F.split(F.lower(F.col(content_col)), r"\s+")
    windows = substring_windows(F.col(content_col), k)

    # n_windows arithmetically — size(windows) would evaluate the whole
    # k-layer zip chain per row just to read its length
    base = df.select(F.col(id_col).alias("_id"),
                     F.size(toks).cast("long").alias("_n_toks"),
                     F.greatest(F.size(toks).cast("long") - (k - 1),
                                F.lit(0).cast("long")).alias("n_windows"))
    # persisted: BOTH consumers (dup-count agg, dup-occ join) read this
    # narrow fixed-width projection — without it each re-evaluates the
    # k-layer window chain from the scan (same trade as the minhash
    # banded projection; ~28 B/window, released via release_caches)
    occ = _persist(
        df.select(F.col(id_col).alias("_id"),
                  F.posexplode(windows).alias("pos", "_g"))
        .select("_id", "pos", F.xxhash64("_g").alias("_h"),
                F.length("_g").alias("_len")))
    dup_keys = (occ.groupBy("_h", "_len")
                .agg(F.count(F.lit(1)).alias("_c"))
                .filter(F.col("_c") > 1)
                .drop("_c"))
    dup_occ = occ.join(dup_keys, ["_h", "_len"]).select("_id", "pos")

    ps = F.sort_array(F.collect_list("pos"))
    per_doc = dup_occ.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_dup_windows"), ps.alias("_ps"))
    # covered tokens of merged fixed-length-k intervals at sorted starts
    # s_1..s_m: sum of min(k, s_{j+1} - s_j), with the last term = k
    nexts = F.slice(F.col("_ps"), 2,
                    F.greatest(F.size("_ps") - 1, F.lit(0)))
    contrib = F.zip_with(F.col("_ps"), nexts,
                         lambda s, nx: F.least(F.lit(k),
                                               F.coalesce(nx - s, F.lit(k))))
    per_doc = per_doc.select(
        "_id", "n_dup_windows",
        F.aggregate(contrib, F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("covered_tokens"))

    return (base.join(per_doc, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    "n_windows",
                    F.coalesce("n_dup_windows", F.lit(0)).cast("long")
                    .alias("n_dup_windows"),
                    F.coalesce("covered_tokens", F.lit(0)).cast("long")
                    .alias("covered_tokens"),
                    F.round(F.coalesce("covered_tokens", F.lit(0))
                            / F.col("_n_toks"), 6)
                    .alias("dup_token_fraction")))
