"""Scale-stress the dedup/ANN caps: same queries at sf0.1-equivalent
and sf1-equivalent corpora, confirming bucket caps and df-filters keep
candidate-pair counts OUTPUT-sensitive (not O(n²)) as the corpus grows.

Runs the seven dedup/similarity driver queries (the exact functions in
__spark_entry__.queries()) over deterministic synthetic corpora
(jsi_spark.datagen.gen_text_corpus / gen_vec_corpus — documents/
embeddings schema with controlled duplicate structure, incl. a hot
template cluster and an identical-vector cluster that the
max_bucket_size caps MUST drop), at n and 10n rows, and publishes:

- wall seconds + output rows per query at both scales (+ ratios);
- the bucket-size histogram (log2 bins) for the four blockers —
  MinHash band buckets, SimHash chunk buckets, sign-LSH embedding
  buckets, and SemDeDup k-means cells (n_centroids scaled with the
  corpus, the production rule) — with implied pre-cap vs post-cap
  pair counts;
- the occurrence-multiplicity census for substring windows (a linear
  op — no self-join, so no cap; the census shows dup mass stays
  occurrence-bounded).

A query is scale-clean when time and rows grow ~linearly (ratio ≲ 10x
for a 10x corpus; pair outputs may grow slightly faster since near-dup
CLASSES are fixed-rate — each exact-dup base gains quadratically within
its group until the cap bites, which the histogram makes visible).

Usage: python tools/scale_stress.py [--scales 1,10] [--workdir DIR]
Writes one JSON line per (scale, query) plus a summary markdown table
to stdout; paste the table into SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from jsi_spark.datagen import gen_text_corpus, gen_vec_corpus  # noqa: E402
from jsi_spark.io.tableio import parquet_num_rows  # noqa: E402
from jsi_spark.ops.dedup import (  # noqa: E402
    minhash_band_buckets, release_caches, simhash_chunk_buckets,
    substring_windows,
)
from jsi_spark.ops.similarity import (  # noqa: E402
    ivf_centroids, lsh_bucket_assignments, lsh_tables, near_dup_planes,
    semantic_cell_assignments, semantic_n_centroids,
)
from jsi_spark.session import get_spark  # noqa: E402

BASE_DOCS = 5_000      # sf0.1-equivalent documents rows
BASE_VECS = 2_000      # sf0.1-equivalent embeddings rows

QUERIES = ["ngram_jaccard", "minhash_near_dups", "dedup_clusters",
           "simhash_candidates", "emb_near_dups", "semantic_dedup",
           "substring_dup_spans"]

# caps as used by the driver queries (__spark_entry__.py)
MINHASH_CAP = 200
SIMHASH_CAP = 200
EMB_CAP = 400
SEM_CELL_CAP = 1000    # degenerate-cell guard (semantic_dedup max_cell_size)


def gen_dir(spark, workdir: str, scale: int) -> str:
    sf_dir = os.path.join(workdir, f"stress_x{scale}")
    docs_p = os.path.join(sf_dir, "documents.parquet")
    embs_p = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(docs_p):
        # fixed partitioning: corpus bytes are identical at any session
        # parallelism, so reruns/other-parallelism runs share the input
        gen_text_corpus(spark, BASE_DOCS * scale, partitions=64) \
            .write.mode("overwrite").parquet(docs_p)
        gen_vec_corpus(spark, BASE_VECS * scale, partitions=64) \
            .write.mode("overwrite").parquet(embs_p)
    return sf_dir


def size_census(assign, keys, cap):
    """Bucket-size histogram (log2 bins) + implied pair counts with and
    without the cap, from a (.., key..) assignment frame."""
    sizes = (assign.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
             .select("n").cache())
    hist_rows = (sizes.groupBy(
        F.floor(F.log2("n")).cast("int").alias("bin"))
        .agg(F.count(F.lit(1)).alias("buckets"),
             F.sum("n").alias("rows"),
             F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"))
        .orderBy("bin").collect())
    agg = sizes.agg(
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pre"),
        F.sum(F.when(F.col("n") <= cap,
                     F.col("n") * (F.col("n") - 1) / 2)
              .otherwise(F.lit(0))).alias("post"),
        F.count(F.when(F.col("n") > cap, 1)).alias("over"),
        F.max("n").alias("maxb")).collect()[0]
    sizes.unpersist()
    hist = {f"2^{r['bin']}": {"buckets": r["buckets"],
                              "pairs": int(r["pairs"])}
            for r in hist_rows}
    return {"hist": hist, "pairs_pre_cap": int(agg["pre"]),
            "pairs_post_cap": int(agg["post"]),
            "over_cap_buckets": int(agg["over"]),
            "max_bucket": int(agg["maxb"])}


def occurrence_census(occ, keys):
    """Multiplicity histogram for a LINEAR op (substring windows): dup
    handling is count>1 + a key join, so cost scales with occurrences,
    never with pairs — no cap needed; the census shows the dup mass and
    the hottest window stay occurrence-bounded as the corpus grows."""
    sizes = (occ.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
             .select("n").cache())
    agg = sizes.agg(
        F.count(F.lit(1)).alias("distinct"),
        F.sum("n").alias("occurrences"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(F.lit(0)))
        .alias("dup_occurrences"),
        F.max("n").alias("max_multiplicity")).collect()[0]
    sizes.unpersist()
    return {k: int(agg[k]) for k in
            ("distinct", "occurrences", "dup_occurrences",
             "max_multiplicity")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--workdir",
                    default=os.environ.get("SPARK_GRAFT_STRESS_DIR",
                                           "/tmp/jsi_stress"))
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    spark = get_spark("jsi-spark-scale-stress")
    qfns = entrymod.queries()

    results: dict[int, dict] = {}
    for scale in scales:
        sf_dir = gen_dir(spark, args.workdir, scale)
        res: dict = {"docs": BASE_DOCS * scale, "vecs": BASE_VECS * scale}

        # -- query timings + output rows (timed action = count; min of
        # --repeat runs — the shared host shows multi-minute noise
        # bursts of up to 5x, see BENCH/BASELINE.md) -------------------
        for name in QUERIES:
            best, rows = None, None
            for _ in range(args.repeat):
                t0 = time.time()
                rows = qfns[name](spark, sf_dir).count()
                dt = time.time() - t0
                release_caches()
                best = dt if best is None else min(best, dt)
            res[name] = {"sec": round(best, 2), "rows": rows}
            print(json.dumps({"scale": scale, "query": name,
                              "sec": round(best, 2), "rows": rows}),
                  flush=True)

        # -- bucket censuses (production bucketing, exact params) ------
        docs = spark.read.parquet(os.path.join(sf_dir,
                                               "documents.parquet"))
        emb = spark.read.parquet(os.path.join(sf_dir,
                                              "embeddings.parquet")) \
            .select("vec_id",
                    F.transform("embedding", lambda x: x.cast("double"))
                    .alias("embedding"))
        res["census"] = {}
        mh = minhash_band_buckets(docs)
        res["census"]["minhash"] = size_census(mh, ["band", "bucket"],
                                               MINHASH_CAP)
        release_caches()
        sh = simhash_chunk_buckets(docs)
        res["census"]["simhash"] = size_census(sh, ["chunk", "val"],
                                               SIMHASH_CAP)
        release_caches()
        n_vecs = parquet_num_rows(os.path.join(sf_dir,
                                               "embeddings.parquet"))
        tables = lsh_tables(dim=64, n_planes=near_dup_planes(n_vecs),
                            n_tables=16)
        eb = lsh_bucket_assignments(emb, tables)
        res["census"]["emb_lsh"] = size_census(eb, ["_tbl", "_bucket"],
                                               EMB_CAP)
        release_caches()
        # SemDeDup cells: the production rule (semantic_n_centroids,
        # also applied by the driver query itself) — cells stay bounded
        # as the corpus grows because the quantizer grows with it
        cents = ivf_centroids(emb,
                              n_centroids=semantic_n_centroids(n_vecs))
        sc = semantic_cell_assignments(emb, cents)
        res["census"]["sem_cells"] = size_census(sc, ["cell"],
                                                 SEM_CELL_CAP)
        release_caches()
        # substring windows: a LINEAR op (no self-join) — census is the
        # occurrence multiplicity, not pairs
        occ = (docs.select(F.explode(
                   substring_windows(F.col("text"), 8)).alias("g"))
               .select(F.xxhash64("g").alias("_h"),
                       F.length("g").alias("_len")))
        res["census"]["substring_windows"] = occurrence_census(
            occ, ["_h", "_len"])
        release_caches()
        for fam, cen in res["census"].items():
            print(json.dumps({"scale": scale, "census": fam, **cen}),
                  flush=True)
        results[scale] = res

    # -- summary markdown ------------------------------------------------
    if len(scales) >= 2:
        lo, hi = scales[0], scales[-1]
        fac = hi / lo
        print(f"\n| query | x{lo} sec | x{lo} rows | x{hi} sec "
              f"| x{hi} rows | sec ratio (vs {fac:.0f}x data) "
              f"| rows ratio |")
        print("|---|---|---|---|---|---|---|")
        for name in QUERIES:
            a, b = results[lo][name], results[hi][name]
            sr = b["sec"] / a["sec"] if a["sec"] else float("inf")
            rr = b["rows"] / a["rows"] if a["rows"] else float("inf")
            print(f"| {name} | {a['sec']} | {a['rows']} | {b['sec']} "
                  f"| {b['rows']} | {sr:.2f}x | {rr:.2f}x |")
    print(json.dumps({"summary": {str(k): v for k, v in results.items()}},
                     default=str))


if __name__ == "__main__":
    main()
