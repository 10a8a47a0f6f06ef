"""Recall@k of every approximate ANN path vs the exact brute-force
baseline, at a chosen sf_dir — quantitative quality evidence for the
ANN family (the oracle gate proves each path computes ITS OWN
definition exactly; this measures how close each approximation gets to
the true neighbors).

recall@k = |approx top-k ∩ exact top-k| / k, averaged over queries.
PQ/IVF-PQ rank by ADC L2 distance while the exact baseline ranks by
cosine; with near-unit-norm synthetic embeddings the orderings are
comparable (L2^2 = 2 - 2cos for unit vectors).

Usage: python tools/ann_recall.py [sf_dir] [k]
       python tools/ann_recall.py --clustered [k]
The --clustered mode swaps the near-orthogonal testdata embeddings
(PQ's worst case: no cluster structure, centroids ~ 0, residual ~ raw)
for a deterministic 20-tight-cluster corpus — the regime IVFADC's
residual coding exists for — and reports raw-vs-residual recall.
Prints one JSON line per path plus a markdown row block for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def clustered_main(k: int):
    import json as _json
    import random

    from jsi_spark.ops.similarity import (
        brute_force_topk, ivf_pq_topk, make_queries, train_pq,
        train_pq_residual, train_quantizer, train_sample,
    )
    from jsi_spark.session import ensure_py_files, get_spark

    spark = get_spark("jsi-spark-ann-recall")
    ensure_py_files(spark)
    rng = random.Random(5)
    centers = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(20)]
    rows = [(i, [x + rng.gauss(0, 0.15) for x in centers[i % 20]])
            for i in range(2000)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").cache()
    queries = make_queries(emb, list(range(50)))

    def sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    exact = sets(brute_force_topk(emb, queries, k=k))
    sample = train_sample(emb)
    cents = train_quantizer(sample, 20)
    books = train_pq(sample, 8, 64)
    rbooks = train_pq_residual(sample, cents, 8, 64)
    for name, df in (
            ("ivf_pq_raw", ivf_pq_topk(emb, queries, cents, books,
                                       k=k, nprobe=3, residual=False)),
            ("ivfadc_residual", ivf_pq_topk(emb, queries, cents,
                                            rbooks, k=k, nprobe=3,
                                            residual=True))):
        a = sets(df)
        rec = sum(len(a.get(q, set()) & exact[q]) / k
                  for q in exact) / len(exact)
        print(_json.dumps({"path": name, "recall_at_k": round(rec, 3),
                           "k": k, "corpus": "20-tight-clusters"}),
              flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--clustered":
        clustered_main(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import __spark_entry__ as E
    from jsi_spark.io.tableio import parquet_num_rows
    from jsi_spark.ops.similarity import (
        brute_force_topk, ivf_pq_topk, ivf_topk, lsh_tables, lsh_topk,
        make_queries, near_dup_planes, pq_topk, train_pq,
        train_pq_residual, train_quantizer, train_sample,
    )
    from jsi_spark.session import get_spark

    spark = get_spark("jsi-spark-ann-recall")
    emb = E._persist_op(E._emb_double(spark, sf_dir))
    n_vecs = parquet_num_rows(f"{sf_dir}/embeddings.parquet")
    qids = list(range(0, min(50, n_vecs)))
    queries = make_queries(emb, qids)

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    exact = topk_sets(brute_force_topk(emb, queries, k=k))
    # the driver queries' own configurations
    sample = train_sample(emb)
    cents = train_quantizer(sample, 8)
    books = train_pq(sample, 8, 64)
    rbooks = train_pq_residual(sample, cents, 8, 64)
    tables = lsh_tables(dim=64, n_planes=near_dup_planes(n_vecs),
                        n_tables=16)
    paths = {
        "lsh": lsh_topk(emb, queries, tables, k=k),
        "ivf": ivf_topk(emb, queries, cents, k=k, nprobe=3),
        "pq": pq_topk(emb, queries, books, k=k),
        "ivf_pq_raw": ivf_pq_topk(emb, queries, cents, books, k=k,
                                  nprobe=3, residual=False),
        "ivfadc_residual": ivf_pq_topk(emb, queries, cents, rbooks,
                                       k=k, nprobe=3, residual=True),
    }
    rows = []
    for name, df in paths.items():
        approx = topk_sets(df)
        recalls = [len(approx.get(q, set()) & exact[q]) / k
                   for q in exact]
        r = round(sum(recalls) / len(recalls), 3)
        rows.append((name, r))
        print(json.dumps({"path": name, "recall_at_k": r, "k": k,
                          "queries": len(recalls), "n_vecs": n_vecs}),
              flush=True)
    print(f"\n| path | recall@{k} ({len(exact)} queries, "
          f"{n_vecs} vectors) |")
    print("|---|---|")
    for name, r in rows:
        print(f"| {name} | {r} |")


if __name__ == "__main__":
    main()
