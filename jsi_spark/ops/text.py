"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting — all pure Column expressions
(100 TB hot path; every one is a map-side projection, zero shuffle
until the caller aggregates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword inventories for the n-gram/stopword
#: heuristic (extendable; the operator shape is what matters)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for",
           "with", "as", "on", "at", "by"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
           "es", "por", "con", "para"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den",
           "im", "für", "auf", "ein", "eine"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "en", "un", "une",
           "que", "pour", "dans", "sur"],
}

TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def whitespace_token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)) \
        .otherwise(F.size(tokens(text)))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish count: alpha runs + digit runs + punctuation marks
    (a BPE-like regex segmentation, not a learned vocab)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def stopword_hits(text: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))


def lang_scores(text: Column) -> Column:
    """struct of per-language stopword-hit ratios.

    ONE tokenization and ONE fold for all languages (the per-language
    `stopword_hits` form tokenizes the text once per language AND once
    more for the denominator — five splits per row, and a 5x larger
    expression tree for Catalyst to analyze and codegen)."""
    langs = list(STOPWORDS)
    toks_arr = tokens(text)
    sws = [F.array(*[F.lit(w) for w in STOPWORDS[lg]]) for lg in langs]
    hits = F.aggregate(
        toks_arr,
        F.array_repeat(F.lit(0), len(langs)),
        lambda acc, t: F.zip_with(
            acc,
            F.array(*[F.array_contains(sw, t).cast("int") for sw in sws]),
            lambda a, b: a + b))
    n = F.when(F.length(F.trim(text)) == 0, F.lit(0)) \
        .otherwise(F.size(toks_arr))
    return F.struct(*[
        (F.element_at(hits, i + 1) / F.greatest(n, F.lit(1))).alias(lg)
        for i, lg in enumerate(langs)])


def predict_lang(text: Column) -> Column:
    """argmax language by stopword ratio; 'und' (undetermined) when no
    stopword fires."""
    scores = lang_scores(text)
    langs = list(STOPWORDS)
    best_lang = F.lit("und")
    best = F.lit(0.0)
    for lang in langs:
        s = scores.getField(lang)
        better = s > best
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best = F.when(better, s).otherwise(best)
    return best_lang


def quality_features(text: Column) -> Column:
    """struct(n_chars, n_tokens, mean_token_len, punct_ratio,
    stopword_ratio, digit_ratio)."""
    n_chars = F.length(text)
    n_tokens = whitespace_token_count(text)
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    sw = stopword_hits(text, "en")
    return F.struct(
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_chars / F.greatest(n_tokens, F.lit(1)))
        .alias("mean_token_len"),
        (punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (sw / F.greatest(n_tokens, F.lit(1))).alias("stopword_ratio"),
        (digits / F.greatest(n_chars, F.lit(1))).alias("digit_ratio"))


def quality_score(text: Column) -> Column:
    """[0,1] heuristic: rewarded for stopword presence and sane token
    lengths, penalized for punctuation/digit soup. Deterministic,
    closed-form (reproducible in ANSI SQL for the oracle)."""
    f = quality_features(text)
    score = (
        F.lit(0.35) * F.least(f.getField("stopword_ratio") * 4, F.lit(1.0))
        + F.lit(0.25) * F.when(
            (f.getField("mean_token_len") >= 3)
            & (f.getField("mean_token_len") <= 10), 1.0).otherwise(0.0)
        + F.lit(0.2) * (F.lit(1.0) - F.least(
            f.getField("punct_ratio") * 5, F.lit(1.0)))
        + F.lit(0.2) * (F.lit(1.0) - F.least(
            f.getField("digit_ratio") * 5, F.lit(1.0))))
    return F.round(score, 6)


def fingerprint(text: Column, mod: int = 2_147_483_647) -> Column:
    """Order-sensitive rolling document fingerprint: fold word token
    hashes with positional weights (31^k-style), mod a prime. Expressed
    with aggregate() so it's one pass over the token array."""
    toks = tokens(text)
    word_h = F.transform(
        toks,
        lambda t: (F.length(t) * 131
                   + F.ascii(F.substring(t, 1, 1)) * 7
                   + F.ascii(F.substring(t, -1, 1))).cast("long"))
    return F.aggregate(
        word_h, F.lit(0).cast("long"),
        lambda acc, h: F.pmod(acc * 31 + h, F.lit(mod)))


# -- repetition / boilerplate signals (Gopher-style) ---------------------------
#
# The repetition filters from Rae et al. 2021 ("Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", appendix A1.1,
# public arXiv:2112.11446) — the standard web-pipeline boilerplate
# detectors. Each is a pure Column expression over ONE row (zero
# shuffle); the per-row cost is O(L log L) via array_sort + single-pass
# folds, NOT the naive O(L²) count-each-distinct-in-place form (Spark
# re-evaluates lambda-captured expressions per element, so nesting a
# filter over the line array inside a per-distinct-line lambda would
# re-split the text L times per row).

def nonempty_lines(text: Column) -> Column:
    return F.filter(F.split(text, r"\n"),
                    lambda ln: F.length(F.trim(ln)) > 0)


def _dup_extra_chars(sorted_lines: Column) -> Column:
    """Chars in repeated line occurrences beyond each first occurrence:
    single fold over the sorted array tracking the previous element."""
    init = F.struct(F.lit(None).cast("string").alias("prev"),
                    F.lit(0).alias("extra"))
    step = lambda acc, ln: F.struct(
        ln.alias("prev"),
        (acc["extra"] + F.when(
            acc["prev"].isNotNull() & (acc["prev"] == ln),
            F.length(ln)).otherwise(F.lit(0))).alias("extra"))
    return F.aggregate(sorted_lines, init, step, lambda acc: acc["extra"])


def _top_run_cover(sorted_grams: Column) -> Column:
    """max over distinct values of (occurrence count × value length) —
    the char mass of the most repeated gram — in one fold over the
    sorted array (equal values are adjacent, so a run counter
    suffices)."""
    init = F.struct(F.lit(None).cast("string").alias("prev"),
                    F.lit(0).alias("run"),
                    F.lit(0).alias("best"))
    step = lambda acc, g: F.struct(
        g.alias("prev"),
        F.when(acc["prev"].isNotNull() & (acc["prev"] == g),
               acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            (F.when(acc["prev"].isNotNull() & (acc["prev"] == g),
                    acc["run"] + 1).otherwise(F.lit(1)))
            * F.length(g)).alias("best"))
    return F.aggregate(sorted_grams, init, step, lambda acc: acc["best"])


def word_bigrams(text: Column) -> Column:
    """All word 2-grams (order-sensitive, with repeats)."""
    toks = tokens(text)
    shifted = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    grams = F.zip_with(toks, shifted,
                       lambda g, t: F.concat_ws(" ", g, t))
    return F.slice(grams, 1, F.greatest(F.size(toks) - 1, F.lit(0)))


def repetition_features(text: Column) -> Column:
    """struct(dup_line_frac, dup_line_char_frac, top_bigram_char_frac):

    - dup_line_frac: fraction of non-empty lines that are repeats of an
      earlier identical line,
    - dup_line_char_frac: fraction of line characters inside those
      repeated occurrences,
    - top_bigram_char_frac: char mass of the most frequent word 2-gram
      (count × gram length) over total text length.

    Documents over the Gopher thresholds (e.g. dup_line_frac > 0.30)
    are boilerplate/template suspects. All ratios round(6) so the
    DuckDB oracle reproduces them bit-for-bit."""
    ls = nonempty_lines(text)
    n_lines = F.size(ls)
    n_distinct = F.size(F.array_distinct(ls))
    line_chars = F.aggregate(
        F.transform(ls, lambda ln: F.length(ln)),
        F.lit(0), lambda a, c: a + c)
    extra_chars = _dup_extra_chars(F.array_sort(ls))
    top_cover = _top_run_cover(F.array_sort(word_bigrams(text)))
    return F.struct(
        F.round((n_lines - n_distinct)
                / F.greatest(n_lines, F.lit(1)), 6)
        .alias("dup_line_frac"),
        F.round(extra_chars / F.greatest(line_chars, F.lit(1)), 6)
        .alias("dup_line_char_frac"),
        F.round(top_cover / F.greatest(F.length(text), F.lit(1)), 6)
        .alias("top_bigram_char_frac"))


def text_profile(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """One row per doc: all text-analysis outputs (the pipeline's
    text-ops projection)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        whitespace_token_count(t).alias("ws_tokens"),
        bpe_ish_token_count(t).alias("bpe_tokens"),
        predict_lang(t).alias("pred_lang"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"))


# -- PII redaction --------------------------------------------------------------------

#: pattern inventory deliberately restricted to syntax Java regex and
#: RE2 (DuckDB) interpret identically: character classes, bounded
#: repetition, \b word boundaries — no backrefs, no lookaround
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b",
}


def pii_scrub(df: DataFrame, content_col: str = "text",
              patterns: dict | None = None,
              scrubbed_col: str = "scrubbed") -> DataFrame:
    """Redact PII-shaped spans (emails, IPv4 addresses, phone-formatted
    digit groups) and count what was removed — the pre-training scrub
    stage of public web-corpus pipelines (e.g. the C4 / CCNet
    postprocessing step). Appends one count column per pattern
    (``n_<name>``) plus ``scrubbed_col`` with each match replaced by
    ``<NAME>``.

    100 TB shape: pure map-side projection — regexp_count +
    regexp_replace chained per pattern, whole-stage codegen, zero
    shuffle, zero Python. Patterns are restricted to the Java∩RE2
    common dialect so the DuckDB oracle runs the very same strings.

    Overlap semantics: each ``n_<name>`` counts matches of that pattern
    on the ORIGINAL text, while replacements chain — so a span matching
    two patterns (phone-shaped digits inside an email local-part) is
    counted under both names although only the first pattern's token
    survives in ``scrubbed_col``; sum(n_*) may exceed the number of
    redacted spans. The oracle mirrors this exactly (counts on the raw
    text, replacements applied in the same pattern order).
    """
    pats = patterns or PII_PATTERNS
    out = df
    scrub = F.col(content_col)
    for name, pat in pats.items():
        out = out.withColumn(f"n_{name}",
                             F.regexp_count(F.col(content_col), F.lit(pat))
                             .cast("long"))
        scrub = F.regexp_replace(scrub, pat, f"<{name.upper()}>")
    return out.withColumn(scrubbed_col, scrub)
