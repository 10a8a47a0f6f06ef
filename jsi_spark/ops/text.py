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
    """struct of per-language stopword-hit ratios."""
    n = whitespace_token_count(text)
    return F.struct(*[
        (stopword_hits(text, lang) / F.greatest(n, F.lit(1)))
        .alias(lang) for lang in STOPWORDS])


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
