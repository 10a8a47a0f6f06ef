"""Bit-exact parity of the pure-Python XXH64 (jsi_spark.functions.xxh64)
vs Spark's ``F.xxhash64`` expression — the primitive every DuckDB-free
golden oracle (MinHash / SimHash / media metadata) rests on."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsi_spark.functions import xxh64 as X

rng = random.Random(7)

STRS = ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "abcdefghi", "héllo wörld", "日本語テキスト", "x" * 31, "y" * 32,
        "z" * 33, "w" * 39, "v" * 40, "u" * 41] + [
    "".join(chr(rng.randint(32, 1000)) for _ in range(rng.randint(0, 64)))
    for _ in range(40)]
INTS = [0, 1, -1, 2**31 - 1, -2**31] + [
    rng.randint(-2**31, 2**31 - 1) for _ in range(20)]
LONGS = [0, 1, -1, 2**63 - 1, -2**63] + [
    rng.randint(-2**63, 2**63 - 1) for _ in range(20)]


def test_strings_every_tail_length(spark):
    df = spark.createDataFrame([(s,) for s in STRS], "s string")
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    assert got == [X.xxhash64(s) for s in STRS]


def test_ints_and_longs(spark):
    df = spark.createDataFrame(list(zip(INTS, LONGS)), "i int, l long")
    got = df.select(F.xxhash64("i"), F.xxhash64("l")).collect()
    assert [r[0] for r in got] == [X.hash_int(i, 42) for i in INTS]
    assert [r[1] for r in got] == [X.hash_long(v, 42) for v in LONGS]


def test_seed_chains_as_used_by_ops(spark):
    """The exact chains the dedup ops build: xxhash64(str, lit(int))
    and xxhash64(long, int)."""
    df = spark.createDataFrame(list(zip(STRS[:20], INTS[:20])),
                               "s string, i int")
    got = df.select(F.xxhash64("s", F.lit(1337)),
                    F.xxhash64(F.xxhash64("s", F.lit(7)), "i")).collect()
    assert [r[0] for r in got] == [X.xxhash64(s, 1337) for s in STRS[:20]]
    assert [r[1] for r in got] == [
        X.xxhash64(("long", X.xxhash64(s, 7)), i)
        for s, i in zip(STRS[:20], INTS[:20])]


@pytest.mark.parametrize("fn,vec", [(X.hash_long, X.hash_long_np),
                                    (X.hash_int, X.hash_int_np)])
def test_numpy_vectorized_matches_scalar(fn, vec):
    vals = [rng.randint(-2**31, 2**31 - 1) for _ in range(200)]
    seeds = [rng.randint(-2**63, 2**63 - 1) for _ in range(200)]
    got = vec(np.array(vals, dtype=np.int64),
              np.array(seeds, dtype=np.int64))
    assert got.tolist() == [fn(v, s) for v, s in zip(vals, seeds)]
