"""Text-analysis column builders for training-data pipelines:
language-ID (stopword-profile heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and rolling-hash document
fingerprinting. Pure column expressions — no Python in the hot path;
each has a 1:1 ANSI-SQL mirror for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword profiles: enough signal for a heuristic
# n-gram/stopword language id (the reference has no langid; lang is a
# corpus column — this operator serves pipelines where it is absent)
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "nl": ["de", "het", "een", "en", "van", "ik", "dat", "niet"],
    "fr": ["le", "la", "les", "et", "des", "une", "est", "dans"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
}


def _tokens(text_col: Column) -> Column:
    cleaned = F.lower(F.regexp_replace(text_col, r"[^\p{L}\p{N}\s]", " "))
    return F.filter(F.split(F.trim(cleaned), r"\s+"), lambda t: t != "")


def lang_scores(text_col: Column) -> dict:
    """Per-language stopword hit-rate columns."""
    toks = _tokens(text_col)
    total = F.greatest(F.size(toks), F.lit(1))
    out = {}
    for lang, words in LANG_PROFILES.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(words)))
        out[lang] = (hits / total).alias(f"score_{lang}")
    return out

def lang_id(text_col: Column) -> Column:
    """argmax over the profile scores; 'und' when no stopword hits."""
    scores = lang_scores(text_col)
    langs = list(scores.keys())
    pairs = F.array(
        *[
            F.struct(scores[lg].alias("score"), F.lit(lg).alias("lang"))
            for lg in langs
        ]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def token_count_ws(text_col: Column) -> Column:
    """Whitespace token count."""
    return F.size(
        F.filter(F.split(F.trim(text_col), r"\s+"), lambda t: t != "")
    )


def token_count_bpe_ish(text_col: Column) -> Column:
    """BPE-ish subword estimate: count of the GPT-2-style pretokenizer
    pieces (word fragments, numbers, punctuation runs)."""
    pieces = F.regexp_extract_all(
        text_col, F.lit(r"[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]+"), 0
    )
    return F.size(pieces)


def quality_score(text_col: Column) -> Column:
    """Heuristic document quality in [0,1]: penalizes too-short text,
    high punctuation density, low alphabetic ratio, and stopword
    starvation (English profile). Mirrors the common C4/Gopher-style
    length/punct/stopword gates as one scalar."""
    n_chars = F.greatest(F.length(text_col), F.lit(1))
    alpha = F.length(F.regexp_replace(text_col, r"[^\p{L}]", ""))
    punct = F.length(F.regexp_replace(text_col, r"[^.,;:!?\"'()\[\]{}]", ""))
    toks = _tokens(text_col)
    n_toks = F.greatest(F.size(toks), F.lit(1))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(LANG_PROFILES["en"])))
    len_score = F.least(n_toks / F.lit(20.0), F.lit(1.0))
    alpha_ratio = alpha / n_chars
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - (punct / n_chars) * 5)
    stop_score = F.least(stop_hits / F.lit(2.0), F.lit(1.0))
    return (
        (len_score + alpha_ratio + punct_penalty + stop_score) / 4.0
    ).alias("quality")


def doc_fingerprint(text_col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the canonical token
    stream (rolling content hash, whitespace/punct-insensitive) —
    stable under reformatting, portable to the SQL oracle."""
    return F.md5(F.concat_ws(" ", _tokens(text_col)))
