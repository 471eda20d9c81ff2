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
    """Whitespace token count (same word expression as
    :func:`_ws_words`, so this count can never diverge from
    ``gopher_metrics``' ``n_words``)."""
    return F.size(_ws_words(text_col))


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


def _ws_words(text_col: Column) -> Column:
    """Raw whitespace words (symbols kept — Gopher's metrics are about
    the unnormalized surface, unlike :func:`_tokens`)."""
    return F.filter(F.split(F.trim(text_col), r"\s+"), lambda t: t != "")


def gopher_metrics(text_col: Column) -> dict:
    """Gopher-rules quality signals (Rae et al. 2021 §A1.1) as pure
    column expressions, one scan, no Python:

    - ``n_words`` — whitespace word count
    - ``mean_word_len`` — characters per word
    - ``frac_alpha_words`` — fraction of words containing a letter
    - ``dup_line_frac`` — fraction of non-empty lines that are
      duplicates of an earlier line (repetition signal)
    - ``symbol_word_ratio`` — ``#``/ellipsis occurrences per word
    - ``stop_hits`` — English stopword hits (the "has ≥2 stop words"
      gate)

    Every expression has a 1:1 DuckDB mirror (single-division ratios,
    so the float arithmetic is IEEE-identical on both sides)."""
    words = _ws_words(text_col)
    n_words = F.size(words)
    denom = F.greatest(n_words, F.lit(1))
    mean_word_len = F.length(F.concat_ws("", words)) / denom
    # \p{L}, not [A-Za-z]: the rest of the module is Unicode-aware and
    # an ASCII-only test would fail every non-Latin-script document
    frac_alpha = (
        F.size(F.filter(words, lambda w: w.rlike(r"\p{L}"))) / denom
    )
    lines = F.filter(
        F.transform(F.split(text_col, "\n"), F.trim), lambda l: l != ""
    )
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)) / n_lines,
    ).otherwise(F.lit(0.0))
    symbol_ratio = F.regexp_count(text_col, F.lit(r"#|\.\.\.")) / denom
    toks = _tokens(text_col)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(LANG_PROFILES["en"])))
    return {
        "n_words": n_words.alias("n_words"),
        "mean_word_len": mean_word_len.alias("mean_word_len"),
        "frac_alpha_words": frac_alpha.alias("frac_alpha_words"),
        "dup_line_frac": dup_line_frac.alias("dup_line_frac"),
        "symbol_word_ratio": symbol_ratio.alias("symbol_word_ratio"),
        "stop_hits": stop_hits.alias("stop_hits"),
    }


def gopher_pass(
    text_col: Column,
    min_words: int = 8,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_frac_alpha: float = 0.7,
    max_dup_line_frac: float = 0.5,
    max_symbol_ratio: float = 0.1,
    min_stop_hits: int = 1,
) -> Column:
    """Gopher-style keep/drop gate over :func:`gopher_metrics`
    (thresholds default to the paper's shape, scaled for short
    fixtures)."""
    m = gopher_metrics(text_col)
    return (
        (m["n_words"] >= min_words)
        & (m["n_words"] <= max_words)
        & (m["mean_word_len"] >= min_mean_word_len)
        & (m["mean_word_len"] <= max_mean_word_len)
        & (m["frac_alpha_words"] >= min_frac_alpha)
        & (m["dup_line_frac"] <= max_dup_line_frac)
        & (m["symbol_word_ratio"] <= max_symbol_ratio)
        & (m["stop_hits"] >= min_stop_hits)
    ).alias("gopher_pass")


# PII patterns shared byte-for-byte with the DuckDB oracle: RE2 ∩
# java.util.regex syntax only (no lookaround, no possessives). Applied
# in order — emails before phones so the local-part digits can't be
# phone-matched; IPs before phones so dotted quads survive intact.
# The phone pattern's \b after the optional '+' blocks matches that
# start mid-digit-run ('98765-123-456-7890' must not yield a phone).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?\b[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
]


def pii_counts(text_col: Column) -> dict:
    """Per-kind PII match counts (email / dotted-quad IP / dashed
    international phone), counted **sequentially on the progressively
    redacted text** — pattern *k* counts what :func:`pii_redact` would
    actually replace at step *k*, so counts and redactions agree even
    when a later pattern could also match inside an earlier kind's
    span (a phone-like run inside an e-mail local part)."""
    out = {}
    cur = text_col
    for kind, pat, repl in PII_PATTERNS:
        out[kind] = F.regexp_count(cur, F.lit(pat)).alias(f"n_{kind}")
        cur = F.regexp_replace(cur, pat, repl)
    return out


def pii_redact(text_col: Column) -> Column:
    """Replace every PII match with its placeholder token, in
    :data:`PII_PATTERNS` order — the standard pre-training scrub
    pass. Pure ``regexp_replace`` chain (vectorized, codegen'd)."""
    out = text_col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out.alias("redacted")


def doc_fingerprint(text_col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the canonical token
    stream (rolling content hash, whitespace/punct-insensitive) —
    stable under reformatting, portable to the SQL oracle."""
    return F.md5(F.concat_ws(" ", _tokens(text_col)))
