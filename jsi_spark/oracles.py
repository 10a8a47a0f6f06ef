"""Independently-derived golden oracles for the driver queries that
plain DuckDB SQL cannot express (no xxhash64; no iterative training):
minhash_near_dups, dedup_clusters, simhash_candidates, ann_lsh,
ann_ivf, ann_pq, emb_near_dups, semantic_dedup, media_features,
bpe_token_counts.

Each oracle recomputes the expected result in pure Python/numpy from the
OPERATOR DEFINITIONS (MinHash banding, SimHash majority vote, sign-LSH,
IVF probing, the synthetic media metadata formulas) over the
deterministic test parquet — no Spark involved. The only shared code
with the engine is the XXH64 primitive (jsi_spark.functions.xxh64),
itself pinned bit-exact against the JVM by tests/test_xxh64_parity.py,
and the driver-side plane/centroid constructors (plain ``random`` /
arithmetic, not Spark). The result is rendered as a DuckDB
``VALUES``-table SQL string, so the driver's oracle harness can compare
rows/schema/values exactly as it does for the SQL-expressible queries.

Validity: the golden is computed from the parquet under ``sf_dir`` at
call time (default /root/testdata/sf0.01 — the driver's correctness
scale), so it tracks the data, not a frozen fixture.

Float parity notes:
- tokenization mirrors Java ``\\s`` (ASCII-only class) and Spark
  split's limit=-1 (trailing empties kept — re.split semantics);
- rounding mirrors Spark's ROUND(d, 6): BigDecimal.valueOf →
  Decimal(repr(x)), HALF_UP;
- every floating sum/dot replicates the engine's sequential fold order
  (IEEE doubles are deterministic given the same op order).
"""

from __future__ import annotations

import math
import re
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal
from functools import lru_cache

import numpy as np

from jsi_spark.functions.xxh64 import hash_int_np, xxhash64

DEFAULT_SF_DIR = "/root/testdata/sf0.01"

# Java \s (no UNICODE_CHARACTER_CLASS), as Spark's split() compiles it
_WS = re.compile(r"[ \t\n\x0B\f\r]+")

_U64 = (1 << 64) - 1


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           ROUND_HALF_UP))


def _tokens(text: str) -> list[str]:
    return _WS.split(text.lower())


def _shingles(toks: list[str], n: int = 3) -> set[str]:
    return {" ".join(toks[i:i + n]) for i in range(max(len(toks) - n + 1, 1))}


def _dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _norm(a) -> float:
    acc = 0.0
    for x in a:
        acc = acc + x * x
    return math.sqrt(acc)


def _read(sf_dir: str, table: str, cols: list[str]):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/{table}.parquet", columns=cols)
    return list(zip(*[t.column(c).to_pylist() for c in cols]))


# -- minhash_near_dups ---------------------------------------------------------

def minhash_rows(docs, threshold=0.5, num_perm=64, bands=16, shingle_n=3,
                 max_bucket_size=200, seed=1337):
    rpb = num_perm // bands
    j_idx = np.arange(num_perm, dtype=np.int64)
    sh_sets, sigs = {}, {}
    for doc_id, text in docs:
        sset = _shingles(_tokens(text), shingle_n)
        sh_sets[doc_id] = sset
        # engine: sig[j] = min over shingles of
        #   xxhash64(xxhash64(s, lit(seed)), j) — the outer call chains
        #   hash_long(inner, 42) then hash_int(j, ·); compute the
        #   hash_long stage per shingle, vectorize the per-j stage
        h1 = np.array([xxhash64(("long", xxhash64(s, seed)), seed=42)
                       for s in sset], dtype=np.int64)
        mat = hash_int_np(j_idx[None, :], h1[:, None])
        sigs[doc_id] = mat.min(axis=0)
    buckets = defaultdict(list)
    for doc_id, sig in sigs.items():
        for b in range(bands):
            key = ",".join(str(int(x))
                           for x in sig[b * rpb:(b + 1) * rpb])
            buckets[(b, xxhash64(key))].append(doc_id)
    pairs = set()
    for ids in buckets.values():
        if max_bucket_size is not None and len(ids) > max_bucket_size:
            continue
        ids = sorted(ids)
        for i in range(len(ids)):
            for k in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[k]))
    rows = []
    for a, b in sorted(pairs):
        sa, sb = sh_sets[a], sh_sets[b]
        inter = float(len(sa & sb))
        union = float(len(sa)) + float(len(sb)) - inter
        j = inter / union
        if j >= threshold:
            rows.append((a, b, _round6(j)))
    return rows


# -- simhash_candidates --------------------------------------------------------

def simhash_rows(docs, chunks=4, max_bucket_size=200, seed=7,
                 max_hamming=4):
    width = 64 // chunks
    shifts = (np.uint64(63) - np.arange(64, dtype=np.uint64))
    fingerprints = {}
    for doc_id, text in docs:
        toks = list(dict.fromkeys(_tokens(text)))   # array_distinct order
        n = len(toks)
        hs = np.array([xxhash64(t, seed, seed=42) for t in toks],
                      dtype=np.int64).astype(np.uint64)
        bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)
        counts = bits.sum(axis=0)
        h = 0
        for c in counts:          # MSB-first pack, majority vote
            h = ((h << 1) | (1 if int(c) * 2 > n else 0)) & _U64
        fingerprints[doc_id] = h - (1 << 64) if h >= (1 << 63) else h
    buckets = defaultdict(list)
    for doc_id, h in fingerprints.items():
        for c in range(chunks):
            buckets[(c, (h >> (c * width)) & ((1 << width) - 1))] \
                .append(doc_id)
    pairs = set()
    for ids in buckets.values():
        if max_bucket_size is not None and len(ids) > max_bucket_size:
            continue
        ids = sorted(ids)
        for i in range(len(ids)):
            for k in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[k]))
    rows = []
    for a, b in sorted(pairs):
        ham = bin((fingerprints[a] ^ fingerprints[b]) & _U64).count("1")
        if ham <= max_hamming:
            rows.append((a, b, ham))
    return rows


def union_find_clusters(pairs) -> list:
    """(id, cluster_id=min of component) — independent union-find over
    the pair list, the oracle for the iterative min-label-propagation
    connected components."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ids = {i for p in pairs for i in p}
    return sorted((i, find(i)) for i in ids)


# -- ANN (sign-LSH and IVF) ----------------------------------------------------

def _topk_rows(cand_by_query, vecs, k=5):
    rows = []
    for q, cids in sorted(cand_by_query.items()):
        qv = vecs[q]
        qn = _norm(qv)
        scored = []
        for v in cids:
            if v == q:
                continue
            sim = _round6(_dot(vecs[v], qv) / (_norm(vecs[v]) * qn))
            scored.append((v, sim))
        scored.sort(key=lambda t: (-t[1], t[0]))
        for rank, (v, sim) in enumerate(scored[:k], 1):
            rows.append((q, v, rank, sim))
    return rows


def _lsh_bucket_ids(emb, tables):
    """(n, L) sign-LSH bucket ids, mirroring whichever impl the
    engine's ``impl="auto"`` resolves to (ops.similarity.use_arrow_impl
    is the single shared decision): the Arrow path is one numpy matmul
    (same BLAS, same dtype); the Column path is the sequential JVM fold
    acc*2 + signbit with a sequential dot."""
    from jsi_spark.ops.similarity import use_arrow_impl

    n_tables, n_planes = len(tables), len(tables[0])
    dim = len(tables[0][0])
    if use_arrow_impl(n_tables * n_planes, dim):
        planes = np.asarray(tables, dtype=np.float64)
        flat = planes.reshape(n_tables * n_planes, -1)
        pows = (1 << np.arange(n_planes - 1, -1, -1)).astype(np.int64)
        mat = np.asarray([v for _, v in emb], dtype=np.float64)
        bits = (mat @ flat.T >= 0.0).astype(np.int64)
        return bits.reshape(len(emb), n_tables, n_planes) @ pows
    ids = np.zeros((len(emb), n_tables), dtype=np.int64)
    for i, (_, v) in enumerate(emb):
        for t, table in enumerate(tables):
            acc = 0
            for plane in table:
                acc = acc * 2 + (1 if _dot(v, plane) >= 0.0 else 0)
            ids[i, t] = acc
    return ids


def ann_lsh_rows(emb, query_ids=(0, 1, 2, 3, 4), k=5,
                 n_planes=8, n_tables=8, seed=99):
    from jsi_spark.ops.similarity import lsh_tables

    vecs = dict(emb)
    tables = lsh_tables(dim=len(emb[0][1]), n_planes=n_planes,
                        n_tables=n_tables, seed=seed)
    ids = _lsh_bucket_ids(emb, tables)                    # (n, L)

    row_of = {vec_id: i for i, (vec_id, _) in enumerate(emb)}
    cand = defaultdict(set)
    for t_i in range(n_tables):
        by_bucket = defaultdict(list)
        for i, (vec_id, _) in enumerate(emb):
            by_bucket[int(ids[i, t_i])].append(vec_id)
        for q in query_ids:
            for vec_id in by_bucket.get(int(ids[row_of[q], t_i]), ()):
                cand[q].add(vec_id)
    return _topk_rows(cand, vecs, k)


def emb_near_dup_rows(emb, threshold=0.4, n_planes=None, n_tables=16,
                      seed=99, max_bucket_size=400):
    """Golden for embedding_near_duplicates: identical sign-LSH
    bucketing (same numpy matmul as the engine's Arrow path), pair
    enumeration per (table, bucket) with the bucket-size cap, dedup
    across tables, exact cosine verify on the rounded sim.
    ``n_planes=None`` applies the query's corpus-scaled rule
    (ops.similarity.near_dup_planes)."""
    from jsi_spark.ops.similarity import lsh_tables, near_dup_planes

    if n_planes is None:
        n_planes = near_dup_planes(len(emb))
    vecs = dict(emb)
    tables = lsh_tables(dim=len(emb[0][1]), n_planes=n_planes,
                        n_tables=n_tables, seed=seed)
    ids = _lsh_bucket_ids(emb, tables)                    # (n, L)

    pairs = set()
    for t_i in range(n_tables):
        by_bucket = defaultdict(list)
        for i, (vec_id, _) in enumerate(emb):
            by_bucket[int(ids[i, t_i])].append(vec_id)
        for members in by_bucket.values():
            if max_bucket_size is not None and len(members) > max_bucket_size:
                continue
            members.sort()
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    pairs.add((members[x], members[y]))
    rows = []
    # verify mirrors whichever kernel the engine's impl="auto" picked:
    # Arrow = numpy pairwise-sum reduction of (a*b); Column = the
    # sequential HOF fold (_dot). Same use_arrow_impl decision.
    from jsi_spark.ops.similarity import use_arrow_impl

    arrow = use_arrow_impl(n_tables * n_planes, len(emb[0][1]))
    nv = {k: np.asarray(v, dtype=np.float64) for k, v in vecs.items()}
    for ia, ib in sorted(pairs):
        if arrow:
            a, b = nv[ia], nv[ib]
            sim = _round6(float((a * b).sum()
                                / (np.sqrt((a * a).sum())
                                   * np.sqrt((b * b).sum()))))
        else:
            a, b = vecs[ia], vecs[ib]
            sim = _round6(_dot(a, b) / (_norm(a) * _norm(b)))
        if sim >= threshold:
            rows.append((ia, ib, sim))
    return rows


def ann_ivf_rows(emb, query_ids=(0, 1, 2, 3, 4), k=5, n_centroids=8,
                 nprobe=3):
    vecs = dict(emb)
    # quantizer training is the ENGINE'S OWN driver-side function
    # (ops/similarity.train_quantizer: hash-ordered seeds + one numpy
    # Lloyd step over the bounded sample, which at oracle scale is the
    # whole corpus) — shared verbatim so centroid float association
    # cannot drift between engine and golden.
    from jsi_spark.ops.similarity import train_quantizer, use_arrow_impl

    refined = train_quantizer([(i, list(v)) for i, v in emb], n_centroids)

    # engine SEARCH cell assignment (impl="auto") resolves via the SAME
    # heuristic: Arrow numpy matmul + argmax when the centroid matrix
    # amortizes the bridge, else the JVM Column fold (sequential dot,
    # strict-> update = first max wins). Mirror whichever the engine
    # picks so the float association is identical.
    dim = len(refined[0])
    if use_arrow_impl(n_centroids, dim):
        mat = np.asarray([v for _, v in emb], dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)

        def assign_all(centroids):
            sims = (mat @ np.asarray(centroids, dtype=np.float64).T) \
                / norms
            return np.argmax(sims, axis=1)
    else:
        def assign_all(centroids):
            out = []
            for _, v in emb:
                nv = _norm(v)
                best_i, best_s = 0, -1e30
                for j, c in enumerate(centroids):
                    s = _dot(v, c) / nv
                    if s > best_s:
                        best_i, best_s = j, s
                out.append(best_i)
            return out

    cells = defaultdict(list)
    for (vec_id, v), c in zip(emb, assign_all(refined)):
        cells[int(c)].append(vec_id)

    cand = defaultdict(set)
    for q in query_ids:
        qv = list(vecs[q])
        qn = math.sqrt(sum(x * x for x in qv)) or 1.0
        sims = []
        for i, c in enumerate(refined):
            cn = math.sqrt(sum(x * x for x in c)) or 1.0
            sims.append((sum(a * b for a, b in zip(qv, c)) / (qn * cn), i))
        for _, i in sorted(sims, reverse=True)[:nprobe]:
            cand[q].update(cells.get(i, ()))
    return _topk_rows(cand, vecs, k)


def ann_pq_rows(emb, query_ids=(0, 1, 2, 3, 4), k=5, m=8, n_codes=64):
    """Golden for ops.similarity.pq_topk: codebook training and the
    ADC lookup tables are the ENGINE'S OWN driver-side functions
    (train_pq / pq_luts — shared verbatim, same rationale as
    ann_ivf_rows); corpus encoding mirrors whichever kernel the
    engine's impl="auto" resolves (use_arrow_impl(m*n_codes, dim/m)):
    Arrow = numpy argmin over a batched distance matrix, Column = the
    sequential L2^2 fold with strict < (first min wins). ADC score =
    sequential sum of the m LUT entries, rounded; rank by (adist asc,
    vec_id asc), self excluded."""
    from jsi_spark.ops.similarity import pq_luts, train_pq, use_arrow_impl

    books = train_pq([(i, list(v)) for i, v in emb], m, n_codes)
    d_sub = len(books[0][0])
    arrow = use_arrow_impl(m * n_codes, d_sub)
    if arrow:
        mat = np.asarray([v for _, v in emb], dtype=np.float64)
        codes_all = []
        for s in range(m):
            sub = mat[:, s * d_sub:(s + 1) * d_sub]
            bm = np.asarray(books[s], dtype=np.float64)
            d2 = ((sub[:, None, :] - bm[None, :, :]) ** 2).sum(axis=2)
            codes_all.append(np.argmin(d2, axis=1))
        codes = {vid: [int(codes_all[s][i]) for s in range(m)]
                 for i, (vid, _) in enumerate(emb)}
    else:
        codes = {}
        for vid, v in emb:
            row = []
            for s in range(m):
                sub = v[s * d_sub:(s + 1) * d_sub]
                best_i, best_d = 0, 1e30
                for j, c in enumerate(books[s]):
                    d2 = 0.0
                    for x, y in zip(sub, c):
                        d2 += (x - y) * (x - y)
                    if d2 < best_d:
                        best_i, best_d = j, d2
                row.append(best_i)
            codes[vid] = row

    vecs = dict(emb)
    rows = []
    for q in query_ids:
        luts = pq_luts(list(vecs[q]), books)
        scored = []
        for vid, cs in codes.items():
            if vid == q:
                continue
            d = 0.0
            for s in range(m):
                d += luts[s][cs[s]]
            scored.append((_round6(d), vid))
        scored.sort()
        for rank, (d, vid) in enumerate(scored[:k], start=1):
            rows.append((q, vid, rank, d))
    return rows


def ann_ivf_pq_rows(emb, query_ids=(0, 1, 2, 3, 4), k=5, n_centroids=8,
                    nprobe=3, m=8, n_codes=64):
    """Golden for ops.similarity.ivf_pq_topk (IVFADC, residual=True):
    coarse quantizer, residual codebooks, cell assignment and LUTs are
    all the ENGINE'S OWN driver/numpy functions (train_quantizer,
    train_pq_residual, assign_cells_np, pq_luts — shared verbatim);
    the oracle re-runs the same numpy index pass (cell + residual
    codes per vector), probes each query's nprobe best cells
    (driver-side cosine over the centroid list, same float order as
    the engine), builds a residual LUT PER PROBED CELL, ADC-scores
    and ranks by (adist asc, vec_id asc), self excluded."""
    from jsi_spark.ops.similarity import (
        assign_cells_np, pq_luts, train_pq_residual, train_quantizer,
    )

    vecs = dict(emb)
    sample = [(i, list(v)) for i, v in emb]
    refined = train_quantizer(sample, n_centroids)
    books = train_pq_residual(sample, refined, m, n_codes)

    mat = np.asarray([v for _, v in emb], dtype=np.float64)
    cmat = np.asarray(refined, dtype=np.float64)
    assigned = assign_cells_np(mat, cmat)
    resid = mat - cmat[assigned]
    d_sub = len(books[0][0])
    codes_cols = []
    for s in range(m):
        sub = resid[:, s * d_sub:(s + 1) * d_sub]
        bm = np.asarray(books[s], dtype=np.float64)
        d2 = ((sub[:, None, :] - bm[None, :, :]) ** 2).sum(axis=2)
        codes_cols.append(np.argmin(d2, axis=1))
    codes = {vid: [int(codes_cols[s][i]) for s in range(m)]
             for i, (vid, _) in enumerate(emb)}
    cells = defaultdict(list)
    for (vec_id, _), c in zip(emb, assigned):
        cells[int(c)].append(vec_id)

    rows = []
    for q in query_ids:
        qv = list(vecs[q])
        qn = math.sqrt(sum(x * x for x in qv)) or 1.0
        sims = []
        for i, c in enumerate(refined):
            cn = math.sqrt(sum(x * x for x in c)) or 1.0
            sims.append((sum(a * b for a, b in zip(qv, c)) / (qn * cn), i))
        scored = []
        for _, i in sorted(sims, reverse=True)[:nprobe]:
            luts = pq_luts([a - b for a, b in zip(qv, refined[i])],
                           books)
            for vid in cells.get(i, ()):
                if vid == q:
                    continue
                d = 0.0
                for s in range(m):
                    d += luts[s][codes[vid][s]]
                scored.append((_round6(d), vid))
        scored.sort()
        for rank, (d, vid) in enumerate(scored[:k], start=1):
            rows.append((q, vid, rank, d))
    return rows


def semantic_dedup_rows(emb, threshold=0.35, n_centroids=None,
                        max_cell_size=1000):
    """Golden for ops.similarity.semantic_dedup: quantizer training is
    the engine's own driver-side ``train_quantizer`` (shared verbatim,
    same rationale as ann_ivf_rows); cell assignment and pair cosine
    mirror whichever kernel the engine's impl="auto" resolves
    (``use_arrow_impl`` over the centroid matrix). Drop rule: a vector
    is dropped iff some lower-id vector in its cell has rounded cosine
    >= threshold; dup_of = the SMALLEST such partner. Defaults mirror
    the driver query: n_centroids=None applies the corpus-scaled rule
    (semantic_n_centroids) and max_cell_size=1000 the degenerate-cell
    guard."""
    from jsi_spark.ops.similarity import (
        semantic_n_centroids, train_quantizer, use_arrow_impl,
    )

    if n_centroids is None:
        n_centroids = semantic_n_centroids(len(emb))
    refined = train_quantizer([(i, list(v)) for i, v in emb], n_centroids)
    dim = len(refined[0])
    arrow = use_arrow_impl(n_centroids, dim)
    if arrow:
        mat = np.asarray([v for _, v in emb], dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        assigned = list(np.argmax(
            (mat @ np.asarray(refined, dtype=np.float64).T) / norms,
            axis=1))
    else:
        assigned = []
        for _, v in emb:
            nv = _norm(v)
            best_i, best_s = 0, -1e30
            for j, c in enumerate(refined):
                s = _dot(v, c) / nv
                if s > best_s:
                    best_i, best_s = j, s
            assigned.append(best_i)

    # pair scoring: the engine's grouped path runs cell_dup_rows
    # (one GEMM per cell) per Arrow group — the oracle calls the SAME
    # function over the same sorted-by-id cell members, so the floats
    # cannot drift
    from jsi_spark.ops.similarity import cell_dup_rows

    vecs = dict(emb)
    cells = defaultdict(list)
    for (vec_id, _), c in zip(emb, assigned):
        cells[int(c)].append(vec_id)
    rows = []
    for c, members in cells.items():
        if max_cell_size is not None and len(members) > max_cell_size:
            continue
        members.sort()
        mat = np.stack([np.asarray(vecs[i], dtype=np.float64)
                        for i in members])
        rows.extend(cell_dup_rows(np.asarray(members), mat, c,
                                  threshold))
    rows.sort()
    return rows


# -- media_features ------------------------------------------------------------

def media_feature_rows(n_media=30, frame_sample_ms=1000, dim=16):
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n_media):
        ref = f"m{i}"
        kind = kinds[i % 3]
        if kind == "image":
            n_frames = 1
        else:
            duration = xxhash64(ref, 2) % 600_000 + 1000
            n_frames = duration // frame_sample_ms + 1
        rows.append((ref, kind, n_frames, dim))
    return rows


def media_png_rows(n_media=30, max_side=16):
    """Golden for media_png_real: pixel statistics computed DIRECTLY on
    the deterministic synthetic pixels — the engine round-trips the same
    pixels through the stdlib PNG encoder + decoder before computing
    stats, so any codec defect (filter math, stride, channel order,
    CRC) diverges here. Shared constructors (synth_dims/synth_pixels/
    pixel_stats) are payload/feature *definitions*, same category as the
    ANN plane constructors; the codec itself is not shared. Values are
    float32-quantized before rounding because the engine materializes
    features as array<float>."""
    import numpy as np

    from jsi_spark.ops.png import pixel_stats, synth_dims, synth_pixels
    rows = []
    for i in range(0, n_media, 3):   # media_kind 'image' ⇔ i % 3 == 0
        ref = f"m{i}"
        w, h = synth_dims(ref, max_side)
        st = pixel_stats(synth_pixels(ref, w, h), w, h)
        q = [float(np.float32(x)) for x in st]
        rows.append((ref, _round6(q[0]), _round6(q[1]), _round6(q[2]),
                     _round6(q[6]), _round6(q[14])))
    return rows


def media_jpeg_rows(n_media=30, max_side=16):
    """Golden for media_jpeg_real. JPEG is LOSSY, so the golden is the
    pure block-math reference (jpeg.reference_roundtrip: DCT → quantize
    → dequantize → IDCT, no marker/Huffman/byte code) over the same
    deterministic pixels — the engine path additionally runs the full
    T.81 entropy layer (zigzag, DC prediction, canonical Huffman, 0xFF
    stuffing), so any defect there shifts coefficients and diverges.
    Same shared-constructor category as media_png_rows."""
    import numpy as np

    from jsi_spark.ops.jpeg import reference_roundtrip
    from jsi_spark.ops.png import pixel_stats, synth_dims, synth_pixels
    rows = []
    for i in range(0, n_media, 3):   # media_kind 'image' ⇔ i % 3 == 0
        ref = f"m{i}"
        w, h = synth_dims(ref, max_side)
        gray = np.frombuffer(synth_pixels(ref, w, h, channels=1),
                             dtype=np.uint8).reshape(h, w)
        exp = reference_roundtrip(gray)
        rgb = np.repeat(exp.reshape(-1, 1), 3, axis=1).tobytes()
        st = pixel_stats(rgb, w, h)
        q = [float(np.float32(x)) for x in st]
        rows.append((ref, _round6(q[1]), _round6(q[4]), _round6(q[6]),
                     _round6(q[14])))
    return rows


def media_jpeg_color_rows(n_media=30, max_side=16):
    """Golden for media_jpeg_color_real: same construction as
    media_jpeg_rows but through the COLOR reference round trip (YCbCr
    transform + per-plane block math, single final round) — gating the
    interleaved-MCU / chroma-table / color-transform layer."""
    import numpy as np

    from jsi_spark.ops.jpeg import reference_roundtrip_color
    from jsi_spark.ops.png import pixel_stats, synth_dims, synth_pixels
    rows = []
    for i in range(0, n_media, 3):   # media_kind 'image' ⇔ i % 3 == 0
        ref = f"m{i}"
        w, h = synth_dims(ref, max_side)
        rgb = np.frombuffer(synth_pixels(ref, w, h, channels=3),
                            dtype=np.uint8).reshape(h, w, 3)
        exp = reference_roundtrip_color(rgb)
        st = pixel_stats(exp.tobytes(), w, h)
        q = [float(np.float32(x)) for x in st]
        rows.append((ref, _round6(q[0]), _round6(q[1]), _round6(q[2]),
                     _round6(q[6]), _round6(q[14])))
    return rows


def media_jpeg420_rows(n_media=30, max_side=16):
    """Golden for media_jpeg420_real: the 4:2:0 reference round trip
    (YCbCr → 2x2 box-average chroma downsample → per-plane block math →
    nearest 2x upsample, single final round) — gating the subsampled
    16x16-MCU interleave (four Y + Cb + Cr per MCU), the downsample/
    upsample kernels, and the generalized sampling-factor decode."""
    import numpy as np

    from jsi_spark.ops.jpeg import reference_roundtrip_420
    from jsi_spark.ops.png import pixel_stats, synth_dims, synth_pixels
    rows = []
    for i in range(0, n_media, 3):   # media_kind 'image' ⇔ i % 3 == 0
        ref = f"m{i}"
        w, h = synth_dims(ref, max_side)
        rgb = np.frombuffer(synth_pixels(ref, w, h, channels=3),
                            dtype=np.uint8).reshape(h, w, 3)
        exp = reference_roundtrip_420(rgb)
        st = pixel_stats(exp.tobytes(), w, h)
        q = [float(np.float32(x)) for x in st]
        rows.append((ref, _round6(q[0]), _round6(q[1]), _round6(q[2]),
                     _round6(q[6]), _round6(q[14])))
    return rows


def media_jpeg_prog_rows(n_media=30, max_side=16):
    """Golden for media_jpeg_prog_real. Progressive (SOF2) entropy
    coding is LOSSLESS over the same quantized coefficients as
    baseline, so the golden is the SAME 4:2:0 block-math reference
    round trip the baseline query uses — any defect in the multi-scan
    layer (spectral bands, EOB runs, successive-approximation bit
    planes, refinement correction bits) shifts coefficients and
    hash-mismatches."""
    import numpy as np

    from jsi_spark.ops.jpeg import reference_roundtrip_subsampled
    from jsi_spark.ops.png import pixel_stats, synth_dims, synth_pixels
    rows = []
    for i in range(0, n_media, 3):   # media_kind 'image' ⇔ i % 3 == 0
        ref = f"m{i}"
        w, h = synth_dims(ref, max_side)
        rgb = np.frombuffer(synth_pixels(ref, w, h, channels=3),
                            dtype=np.uint8).reshape(h, w, 3)
        exp = reference_roundtrip_subsampled(rgb, "420")
        st = pixel_stats(exp.tobytes(), w, h)
        q = [float(np.float32(x)) for x in st]
        rows.append((ref, _round6(q[0]), _round6(q[1]), _round6(q[2]),
                     _round6(q[6]), _round6(q[14])))
    return rows


def media_resize_rows(n_media=30, max_side=8, src_max_side=16):
    """Golden for media_resize_real: nearest-neighbor resample + stats
    computed directly on the source pixels (no codec), against the
    engine's decode→resample→encode→decode chain."""
    import numpy as np

    from jsi_spark.ops.png import (
        pixel_stats, resample_nearest, synth_dims, synth_pixels,
        target_dims,
    )
    rows = []
    for i in range(0, n_media, 3):   # media_kind 'image' ⇔ i % 3 == 0
        ref = f"m{i}"
        w, h = synth_dims(ref, src_max_side)
        tw, th = target_dims(w, h, max_side)
        px = resample_nearest(synth_pixels(ref, w, h), w, h, tw, th)
        st = pixel_stats(px, tw, th)
        q = [float(np.float32(x)) for x in st]
        rows.append((ref, tw, th, _round6(q[0]), _round6(q[6])))
    return rows


def media_frames_rows(n_media=30, every_ms=100, max_side=12,
                      max_frames=8):
    """Golden for media_frames_real: frame sampling + pixel statistics
    computed DIRECTLY on the deterministic synthetic indexed frames
    (constructors + sample_ticks + palette expansion — all pure math,
    no codec) — the engine round-trips the same frames through the
    stdlib GIF LZW encoder + decoder and then the PNG codec before
    computing stats, so any defect in either codec (LZW width growth,
    dictionary reset, sub-block packing, delay math) diverges here."""
    import numpy as np

    from jsi_spark.ops.gif import (
        expand_palette, sample_ticks, synth_clip_params,
        synth_frame_indexes, synth_gif_palette,
    )
    from jsi_spark.ops.png import pixel_stats
    rows = []
    for i in range(2, n_media, 3):   # media_kind 'video' ⇔ i % 3 == 2
        ref = f"m{i}"
        w, h, n_frames, delay = synth_clip_params(ref, max_side,
                                                  max_frames)
        pal = synth_gif_palette(ref)
        for j in sample_ticks([delay] * n_frames, every_ms):
            rgb = expand_palette(
                synth_frame_indexes(ref, j, w, h, len(pal) // 3), pal)
            st = pixel_stats(rgb, w, h)
            q = [float(np.float32(x)) for x in st]
            rows.append((ref, j, j * delay, w, h,
                         _round6(q[0]), _round6(q[6])))
    return rows


def media_mp4_frames_rows(n_media=30, every_ms=100, max_side=16,
                          max_frames=5):
    """Golden for media_mp4_frames_real: frame sampling + pixel
    statistics computed on the deterministic synthetic frames through
    the pure block-math 4:2:0 JPEG reference (constructors +
    sample_ticks — NO container/marker/Huffman code), while the engine
    muxes real MJPEG MP4s, demuxes them through the ISO-BMFF sample
    tables, entropy-decodes each sampled JPEG, and round-trips the
    frame through PNG — any defect in the box framing, the
    stts/stsc/stsz/stco walk, the duration math, or either codec
    diverges here."""
    import numpy as np

    from jsi_spark.ops.gif import sample_ticks
    from jsi_spark.ops.jpeg import reference_roundtrip_subsampled
    from jsi_spark.ops.mp4 import synth_mp4_params
    from jsi_spark.ops.png import pixel_stats, synth_pixels
    rows = []
    for i in range(2, n_media, 3):   # media_kind 'video' ⇔ i % 3 == 2
        ref = f"m{i}"
        w, h, n_frames, delay = synth_mp4_params(ref, max_side,
                                                 max_frames)
        for j in sample_ticks([delay] * n_frames, every_ms):
            rgb = np.frombuffer(
                synth_pixels(f"{ref}#f{j}", w, h, channels=3),
                dtype=np.uint8).reshape(h, w, 3)
            exp = reference_roundtrip_subsampled(rgb, "420")
            st = pixel_stats(exp.tobytes(), w, h)
            q = [float(np.float32(x)) for x in st]
            rows.append((ref, j, j * delay, w, h,
                         _round6(q[0]), _round6(q[6])))
    return rows


def media_wav_rows(n_media=30, sample_rate=16000):
    """Golden for media_wav_real: audio statistics computed DIRECTLY on
    the deterministic synthetic samples — the engine round-trips them
    through the stdlib WAV encoder + decoder first (same independence
    argument as media_png_rows)."""
    import numpy as np

    from jsi_spark.ops.wav import (
        audio_stats, synth_duration_ms, synth_samples,
    )
    rows = []
    for i in range(1, n_media, 3):   # media_kind 'audio' ⇔ i % 3 == 1
        ref = f"m{i}"
        n = sample_rate * synth_duration_ms(ref) // 1000
        st = audio_stats(synth_samples(ref, n), sample_rate)
        q = [float(np.float32(x)) for x in st]
        rows.append((ref, _round6(q[0]), _round6(q[1]), _round6(q[3]),
                     _round6(q[14])))
    return rows


# -- bpe_token_counts ----------------------------------------------------------

def bpe_rows(docs, n_merges: int = 30):
    """Reference BPE (Sennrich arXiv:1508.07909): train n_merges rules
    on the word-frequency table (tie-break: max summed freq, then
    lexicographically smallest pair), apply greedily left-to-right,
    then count per-doc words and BPE tokens. Mirrors
    ops/bpe.train_bpe + bpe_token_counts exactly."""
    from collections import Counter

    freqs: Counter = Counter()
    for _id, text in docs:
        for w in _tokens(text):
            if w:
                freqs[w] += 1
    syms = {w: list(w) for w in freqs}
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, f in freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        for w, s in syms.items():
            out: list = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    rows = []
    for _id, text in docs:
        ws = [w for w in _tokens(text) if w]
        rows.append((_id, len(ws), sum(len(syms[w]) for w in ws)))
    return sorted(rows)


# -- VALUES-SQL rendering ------------------------------------------------------

def _lit(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def values_sql(rows, cols: list[str], types: list[str]) -> str:
    sel = ", ".join(f"CAST({c} AS {t}) AS {c}"
                    for c, t in zip(cols, types))
    if not rows:
        nulls = ", ".join("NULL" for _ in cols)
        return (f"SELECT {sel} FROM (VALUES ({nulls})) "
                f"AS t({', '.join(cols)}) WHERE FALSE")
    vals = ", ".join("(" + ", ".join(_lit(v) for v in r) + ")"
                     for r in rows)
    return f"SELECT {sel} FROM (VALUES {vals}) AS t({', '.join(cols)})"


@lru_cache(maxsize=4)
def golden_oracle_sqls(sf_dir: str = DEFAULT_SF_DIR) -> dict:
    """DuckDB SQL (literal VALUES tables) for the hash-dependent
    driver queries, recomputed from the parquet under ``sf_dir``."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    emb_raw = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # engine casts float→double before scoring; float() of a float32
    # parquet value is that exact cast
    emb = [(vid, [float(x) for x in v]) for vid, v in emb_raw]
    mh = minhash_rows(docs)
    return {
        "minhash_near_dups": values_sql(
            mh, ["id_a", "id_b", "jaccard"],
            ["BIGINT", "BIGINT", "DOUBLE"]),
        "dedup_clusters": values_sql(
            union_find_clusters([(a, b) for a, b, _ in mh]),
            ["id", "cluster_id"], ["BIGINT", "BIGINT"]),
        # star contraction computes the SAME components — one golden,
        # two engine implementations (label-prop and large/small-star)
        "dedup_clusters_star": values_sql(
            union_find_clusters([(a, b) for a, b, _ in mh]),
            ["id", "cluster_id"], ["BIGINT", "BIGINT"]),
        # the auto dispatcher (probe → label-prop | quotient star) is a
        # third implementation of the same contract
        "dedup_clusters_auto": values_sql(
            union_find_clusters([(a, b) for a, b, _ in mh]),
            ["id", "cluster_id"], ["BIGINT", "BIGINT"]),
        "simhash_candidates": values_sql(
            simhash_rows(docs), ["id_a", "id_b", "hamming"],
            ["BIGINT", "BIGINT", "INTEGER"]),
        "ann_lsh": values_sql(
            ann_lsh_rows(emb), ["query_id", "vec_id", "rank", "sim"],
            ["BIGINT", "BIGINT", "INTEGER", "DOUBLE"]),
        "emb_near_dups": values_sql(
            emb_near_dup_rows(emb), ["id_a", "id_b", "sim"],
            ["BIGINT", "BIGINT", "DOUBLE"]),
        "ann_ivf": values_sql(
            ann_ivf_rows(emb), ["query_id", "vec_id", "rank", "sim"],
            ["BIGINT", "BIGINT", "INTEGER", "DOUBLE"]),
        "semantic_dedup": values_sql(
            semantic_dedup_rows(emb),
            ["vec_id", "cell", "dup_of", "sim"],
            ["BIGINT", "INTEGER", "BIGINT", "DOUBLE"]),
        "ann_pq": values_sql(
            ann_pq_rows(emb), ["query_id", "vec_id", "rank", "adist"],
            ["BIGINT", "BIGINT", "INTEGER", "DOUBLE"]),
        "ann_ivf_pq": values_sql(
            ann_ivf_pq_rows(emb),
            ["query_id", "vec_id", "rank", "adist"],
            ["BIGINT", "BIGINT", "INTEGER", "DOUBLE"]),
        "bpe_token_counts": values_sql(
            bpe_rows(docs), ["doc_id", "n_words", "n_bpe_tokens"],
            ["BIGINT", "BIGINT", "BIGINT"]),
        "media_features": values_sql(
            media_feature_rows(), ["media_ref", "media_kind", "n_frames",
                                   "dim"],
            ["VARCHAR", "VARCHAR", "INTEGER", "INTEGER"]),
        "media_png_real": values_sql(
            media_png_rows(),
            ["media_ref", "mean_r", "mean_g", "mean_b", "lum_h0",
             "aspect"],
            ["VARCHAR", "DOUBLE", "DOUBLE", "DOUBLE", "DOUBLE",
             "DOUBLE"]),
        "media_jpeg_real": values_sql(
            media_jpeg_rows(),
            ["media_ref", "mean_g", "var_g", "lum_h0", "aspect"],
            ["VARCHAR", "DOUBLE", "DOUBLE", "DOUBLE", "DOUBLE"]),
        "media_jpeg_color_real": values_sql(
            media_jpeg_color_rows(),
            ["media_ref", "mean_r", "mean_g", "mean_b", "lum_h0",
             "aspect"],
            ["VARCHAR", "DOUBLE", "DOUBLE", "DOUBLE", "DOUBLE",
             "DOUBLE"]),
        "media_jpeg420_real": values_sql(
            media_jpeg420_rows(),
            ["media_ref", "mean_r", "mean_g", "mean_b", "lum_h0",
             "aspect"],
            ["VARCHAR", "DOUBLE", "DOUBLE", "DOUBLE", "DOUBLE",
             "DOUBLE"]),
        "media_jpeg_prog_real": values_sql(
            media_jpeg_prog_rows(),
            ["media_ref", "mean_r", "mean_g", "mean_b", "lum_h0",
             "aspect"],
            ["VARCHAR", "DOUBLE", "DOUBLE", "DOUBLE", "DOUBLE",
             "DOUBLE"]),
        "media_wav_real": values_sql(
            media_wav_rows(),
            ["media_ref", "rms", "peak", "zcr", "dur_s"],
            ["VARCHAR", "DOUBLE", "DOUBLE", "DOUBLE", "DOUBLE"]),
        "media_resize_real": values_sql(
            media_resize_rows(),
            ["media_ref", "width", "height", "mean_r", "lum_h0"],
            ["VARCHAR", "INTEGER", "INTEGER", "DOUBLE", "DOUBLE"]),
        "media_frames_real": values_sql(
            media_frames_rows(),
            ["media_ref", "frame_index", "t_ms", "width", "height",
             "mean_r", "lum_h0"],
            ["VARCHAR", "INTEGER", "INTEGER", "INTEGER", "INTEGER",
             "DOUBLE", "DOUBLE"]),
        "media_mp4_frames_real": values_sql(
            media_mp4_frames_rows(),
            ["media_ref", "frame_index", "t_ms", "width", "height",
             "mean_r", "lum_h0"],
            ["VARCHAR", "INTEGER", "INTEGER", "INTEGER", "INTEGER",
             "DOUBLE", "DOUBLE"]),
    }
