"""Adversarial, arithmetic-independent verification of the golden
float oracles (VERDICT r2 "What's wrong #4").

The golden VALUES oracles for the ANN / embedding-near-dup queries
(jsi_spark/oracles.py) deliberately mirror the engine's float
reduction order so the driver's hash gate can be bit-exact — which
means the oracle-vs-engine comparison verifies blocking/structure but
is numpy-vs-numpy on the math itself. This module closes that gap
WITHOUT Spark: every cosine similarity the oracles report is
re-derived in exact arithmetic — Fraction dot products (every float64
is an exact rational, so the three dots are exact) divided under a
50-digit Decimal square root (correctly rounded; error ~1e-50) — and
must match the reported round-6 value within the rounding half-width
plus a 1e-9 reduction-order allowance. Any systematic error in the
shared numpy kernels (wrong axis, dtype truncation, normalization by
the wrong vector, stale rounding) fails here even though engine and
oracle agree with each other.

Also re-ranks brute-force top-k under exact arithmetic: the reported
ranking must be a valid (-sim, id) order of the exact sims at round-6
resolution.
"""

from __future__ import annotations

import decimal
from decimal import Decimal
from fractions import Fraction

import pytest

from jsi_spark.oracles import (_read, ann_ivf_rows, ann_lsh_rows,
                               emb_near_dup_rows, _topk_rows)

SF_DIR = "/root/testdata/sf0.001"

# round-6 half-width + slack for legitimate reduction-order drift of a
# float64 sum of ≤64 products (observed ≲1e-13; 1e-9 is generous)
TOL = 5e-7 + 1e-9

_CTX = decimal.Context(prec=50)


def exact_cosine(a: list[float], b: list[float]) -> Decimal:
    """cos(a, b) with exact rational dots and a 50-digit sqrt."""
    fa = [Fraction(x) for x in a]
    fb = [Fraction(x) for x in b]
    dot = sum(x * y for x, y in zip(fa, fb))
    na2 = sum(x * x for x in fa)
    nb2 = sum(x * x for x in fb)
    num = _CTX.divide(Decimal(dot.numerator), Decimal(dot.denominator))
    n2 = Fraction(na2.numerator * nb2.numerator,
                  na2.denominator * nb2.denominator)
    den = _CTX.sqrt(_CTX.divide(Decimal(n2.numerator),
                                Decimal(n2.denominator)))
    return _CTX.divide(num, den)


@pytest.fixture(scope="module")
def emb():
    return [(vid, [float(x) for x in v])
            for vid, v in _read(SF_DIR, "embeddings",
                                ["vec_id", "embedding"])]


def _check_sims(rows, vecs, sim_ix):
    assert rows, "oracle produced no rows to verify"
    worst = 0.0
    for row in rows:
        ia, ib = row[0], row[1]
        reported = row[sim_ix]
        exact = exact_cosine(vecs[ia], vecs[ib])
        err = abs(float(exact) - reported)
        worst = max(worst, err)
        assert err <= TOL, (
            f"pair ({ia},{ib}): reported {reported} vs exact {exact} "
            f"(err {err:.3e} > {TOL:.3e})")
    return worst


def test_emb_near_dup_sims_exact(emb):
    vecs = dict(emb)
    rows = emb_near_dup_rows(emb)          # (id_a, id_b, sim)
    worst = _check_sims(rows, vecs, sim_ix=2)
    assert worst < TOL


def test_ann_lsh_sims_exact(emb):
    vecs = dict(emb)
    rows = ann_lsh_rows(emb)               # (query_id, vec_id, rank, sim)
    _check_sims(rows, vecs, sim_ix=3)


def test_ann_ivf_sims_exact(emb):
    vecs = dict(emb)
    rows = ann_ivf_rows(emb)
    _check_sims(rows, vecs, sim_ix=3)


def test_bruteforce_topk_is_exact_topk(emb):
    """The brute-force oracle's ranking must survive exact re-ranking:
    for each query, the reported k-th sim must beat (at round-6
    resolution) the best EXCLUDED candidate's exact sim."""
    vecs = dict(emb)
    ids = sorted(vecs)
    queries = ids[:5]
    cand = {q: set(ids) for q in queries}
    rows = _topk_rows(cand, vecs, k=5)     # (query, vec, rank, sim)

    by_q = {}
    for q, v, rank, sim in rows:
        by_q.setdefault(q, []).append((rank, v, sim))
    for q, entries in by_q.items():
        entries.sort()
        chosen = {v for _, v, _ in entries}
        kth_sim = entries[-1][2]
        # best excluded exact sim must not exceed kth reported + TOL
        best_out = max(
            (float(exact_cosine(vecs[q], vecs[v]))
             for v in ids if v != q and v not in chosen),
            default=-2.0)
        assert best_out <= kth_sim + TOL, (
            f"query {q}: excluded candidate beats reported top-k "
            f"({best_out} > {kth_sim} + {TOL})")
        # ranks strictly follow (-sim, id) on the reported values
        for (r1, v1, s1), (r2, v2, s2) in zip(entries, entries[1:]):
            assert (-s1, v1) <= (-s2, v2)
