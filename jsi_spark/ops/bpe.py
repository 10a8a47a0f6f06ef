"""Distributed byte-pair-encoding: train merge rules over a corpus and
count per-document BPE tokens — the real-tokenizer upgrade of
ops/text.py's whitespace/regex token counting (reference scope: the
training-data pipeline ops the driver adds around notEthan/jsi's
validation surface; algorithm: Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units", arXiv:1508.07909).

Scale design — the trainer NEVER iterates over the corpus:

1. One corpus scan builds the (word, freq) table (``word_freqs``) —
   Zipf-bounded (~10^7-10^8 distinct words at 10^12 docs), the classic
   BPE trainer input.
2. Each merge round is one small Spark job ON THAT TABLE: explode
   adjacent symbol pairs weighted by freq, partial-agg count, take the
   argmax (ties: lexicographically smallest pair — deterministic at any
   partitioning). The only driver action per round is a 1-row collect.
   The merge is applied JVM-side with an array fold (``_apply_merge``),
   and the table localCheckpoints each round (measured fastest:
   re-executing stacked merge layers inside every pair-count job costs
   more than eagerly materializing the small vocab table), keeping
   plan depth bounded at any n_merges.
3. Encoding re-tokenizes only the distinct-word table (an Arrow-batched
   pandas UDF applying the merge list in vectorized batches — the
   small side; real tokenizers run native code on executors, and a
   JVM-expression encoding of hundreds of sequential merges would blow
   the codegen tree), then the corpus joins word→n_tokens on the word
   key and aggregates per doc. The corpus-side plan is pure JVM:
   split, explode, join, sum.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def word_freqs(df: DataFrame, content_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace-split lowercased text — the
    Zipf-bounded trainer input (one corpus scan, one exchange)."""
    return (df.select(F.explode(
                F.split(F.lower(F.col(content_col)), r"\s+")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _apply_merge(sym: Column, a: str, b: str) -> Column:
    """Greedy left-to-right replacement of adjacent (a, b) with a+b in a
    symbol array, as one JVM array fold. F.get (null past the end, no
    ANSI throw) probes the accumulator top; CASE evaluates only the
    taken branch, so the slice is safe when the guard passed."""
    merged = F.lit(a + b)
    return F.aggregate(
        sym, F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))))


def train_bpe(df: DataFrame, n_merges: int = 30,
              content_col: str = "text",
              checkpoint_every: int = 1) -> list:
    """Learn ``n_merges`` BPE merge rules. Returns [(a, b), ...] in
    application order. Stops early when no adjacent pair repeats.

    Tie-break: highest summed frequency, then lexicographically
    smallest (a, b) — binary UTF-8 order on both engines, so goldens
    written in plain Python agree."""
    wf = (word_freqs(df, content_col)
          .select("freq", F.split("word", "").alias("sym"))
          .localCheckpoint())
    merges: list = []
    for i in range(n_merges):
        nxt = F.slice("sym", 2, F.greatest(F.size("sym") - 1, F.lit(0)))
        pairs = (wf.select("freq", F.explode(
                    F.zip_with("sym", nxt,
                               lambda x, y: F.struct(x.alias("a"),
                                                     y.alias("b"))))
                 .alias("p"))
                 .filter(F.col("p.b").isNotNull()))
        best = (pairs.groupBy("p").agg(F.sum("freq").alias("c"))
                .orderBy(F.desc("c"), F.asc("p.a"), F.asc("p.b"))
                .limit(1).collect())
        if not best or best[0]["c"] < 2:
            break
        a, b = best[0]["p"]["a"], best[0]["p"]["b"]
        merges.append((a, b))
        wf = wf.select("freq", _apply_merge(F.col("sym"), a, b).alias("sym"))
        if (i + 1) % checkpoint_every == 0:
            wf = wf.localCheckpoint()
    return merges


def encode_words_py(word: str, merges: list) -> list:
    """Reference greedy encoder (also the executor-side kernel): apply
    each merge rule in order, left-to-right."""
    sym = list(word)
    for a, b in merges:
        out: list = []
        for x in sym:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        sym = out
    return sym


def _n_tokens_udf(merges: list):
    mg = list(merges)

    @F.pandas_udf("long")
    def n_tok(words: pd.Series) -> pd.Series:
        return words.map(lambda w: len(encode_words_py(w, mg)))

    return n_tok


def bpe_token_counts(df: DataFrame, merges: list,
                     id_col: str = "doc_id",
                     content_col: str = "text") -> DataFrame:
    """Per-doc (n_words, n_bpe_tokens) under the given merge list.

    The Arrow UDF touches only the DISTINCT-word table; the corpus side
    is split→explode→join(word)→sum, pure JVM. The word→n_tokens side
    is Zipf-bounded, not broadcast-forced (AQE broadcasts it when it
    fits; at 10^8 words it shuffle-joins on the word key). Unseen words
    (encoder applied to a different corpus than the trainer) fall back
    to character count — exactly what zero learned merges produce."""
    words = (df.select(F.col(id_col).alias("_id"), F.explode(
                F.split(F.lower(F.col(content_col)), r"\s+")).alias("word"))
             .filter(F.col("word") != ""))
    vocab = (words.select("word").distinct()
             .select("word", _n_tokens_udf(merges)("word").alias("_nt")))
    return (words.join(vocab, "word", "left")
            .groupBy("_id")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum(F.coalesce("_nt", F.length("word")))
                 .alias("n_bpe_tokens"))
            .select(F.col("_id").alias(id_col), "n_words", "n_bpe_tokens"))
