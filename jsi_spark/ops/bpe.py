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


def train_bpe_inmem(word_freq: list, n_merges: int) -> list:
    """Driver-side trainer over a collected (word, freq) table — the
    classic incremental Sennrich algorithm: pair counts and a
    pair→words index are built once, and each merge round touches only
    the words that actually contain the chosen pair. Semantics are
    identical to the distributed loop (freq-weighted adjacent-pair
    counts, max count with lexicographically-smallest tie-break, stop
    below count 2, greedy left-to-right application)."""
    from collections import Counter, defaultdict

    syms = [list(w) for w, _ in word_freq]
    freqs = [f for _, f in word_freq]
    counts: Counter = Counter()
    index: defaultdict = defaultdict(set)
    for i, sym in enumerate(syms):
        f = freqs[i]
        for pair in zip(sym, sym[1:]):
            counts[pair] += f
            index[pair].add(i)
    merges: list = []
    for _ in range(n_merges):
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((a, b))
        for i in sorted(index[(a, b)]):
            sym, f = syms[i], freqs[i]
            for pair in zip(sym, sym[1:]):
                counts[pair] -= f
                if counts[pair] <= 0:
                    del counts[pair]
                index[pair].discard(i)
            out: list = []
            for x in sym:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[i] = out
            for pair in zip(out, out[1:]):
                counts[pair] += f
                index[pair].add(i)
    return merges


def train_bpe(df: DataFrame, n_merges: int = 30,
              content_col: str = "text",
              checkpoint_every: int = 1,
              driver_vocab_max: int = 65536) -> list:
    """Learn ``n_merges`` BPE merge rules. Returns [(a, b), ...] in
    application order. Stops early when no adjacent pair repeats.

    Tie-break: highest summed frequency, then lexicographically
    smallest (a, b) — binary UTF-8 order on both engines (Python str
    comparison is code-point order, which UTF-8 byte order preserves),
    so goldens written in plain Python agree.

    Scale dispatch: the (word, freq) table is Zipf-bounded, so after
    the one corpus scan it is PROBED with limit(driver_vocab_max + 1);
    if the whole table came back it is trained on the driver
    (``train_bpe_inmem`` — this is how production BPE trainers run:
    word counts fit in one machine's memory even for web-scale
    corpora, and 30 merge rounds cost zero cluster jobs). Only a
    vocabulary too large to collect takes the distributed
    one-small-job-per-round loop below; both paths produce identical
    merges. ``driver_vocab_max=0`` forces the distributed loop."""
    wf0 = word_freqs(df, content_col)
    if driver_vocab_max > 0:
        head = wf0.limit(driver_vocab_max + 1).collect()
        if len(head) <= driver_vocab_max:
            return train_bpe_inmem(
                [(r["word"], r["freq"]) for r in head], n_merges)
    wf = (wf0.select("freq", F.split("word", "").alias("sym"))
          .localCheckpoint())
    merges = []
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
    to character count — exactly what zero learned merges produce.
    Documents whose text tokenizes to zero words (empty or
    whitespace-only) still emit a (doc_id, 0, 0) row: the per-doc
    aggregate is left-joined back onto the id frame — the same
    base-frame pattern substring_dup_spans uses."""
    words = (df.select(F.col(id_col).alias("_id"), F.explode(
                F.split(F.lower(F.col(content_col)), r"\s+")).alias("word"))
             .filter(F.col("word") != ""))
    vocab = (words.select("word").distinct()
             .select("word", _n_tokens_udf(merges)("word").alias("_nt")))
    agg = (words.join(vocab, "word", "left")
           .groupBy("_id")
           .agg(F.count(F.lit(1)).alias("n_words"),
                F.sum(F.coalesce("_nt", F.length("word")))
                .alias("n_bpe_tokens")))
    return (df.select(F.col(id_col).alias("_id")).join(agg, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce("n_words", F.lit(0)).alias("n_words"),
                    F.coalesce("n_bpe_tokens", F.lit(0))
                    .alias("n_bpe_tokens")))
