"""Text-analysis operators for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure Column expressions (whole-stage codegen; zero Python, zero shuffle
— these are per-row map operators that scale linearly with input splits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Language-specific stopword sets (public vocabulary); deliberately small and
# disjoint so the n-gram-free heuristic stays cheap and deterministic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "es": ["el", "la", "los", "las", "que", "para", "por", "una", "con", "del"],
    "fr": ["le", "les", "des", "une", "est", "dans", "pour", "sur", "avec", "pas"],
    "pt": ["os", "uma", "não", "são", "como", "mais", "pelo", "pela", "isso", "ele"],
}

MOD = 1_000_000_007


def _stop_count(words: Column, lang: str) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(STOPWORDS[lang])))


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword hits; ties resolve en > es > fr > pt
    (deterministic)."""
    words = F.split(text, " ")
    scores = {lang: _stop_count(words, lang) for lang in STOPWORDS}
    best = F.lit("en")
    best_score = scores["en"]
    for lang in ["es", "fr", "pt"]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


def token_count_ws(text: Column) -> Column:
    """Whitespace tokens."""
    return F.size(F.split(F.trim(text), r"\s+"))


BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish segmentation: letter runs, digit runs, single punctuation."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: alpha-char ratio + stopword ratio +
    word-length sanity, rounded to 4 decimals for cross-engine stability."""
    n_chars = F.length(text)
    words = F.split(text, " ")
    n_words = F.size(words)
    n_alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    n_stop = _stop_count(words, "en")
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    avg_wlen = (n_chars - (n_words - 1)) / F.greatest(n_words, F.lit(1))
    wlen_ok = F.when((avg_wlen >= 3) & (avg_wlen <= 10), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(0.5 * alpha_ratio + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
                   + 0.2 * wlen_ok, 4)


def repetition_signals(text: Column) -> dict:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    Models" §A1.1 quality heuristics — public paper): duplicate-word
    fraction and most-frequent-2-gram occurrence fraction.  Pure expressions
    (codegen, zero shuffle).  The top-2-gram scan is O(n_distinct * n) per
    row — linear-ish for natural text where n-gram diversity is high;
    boilerplate-heavy rows (the ones the filter exists to catch) have FEW
    distinct grams, so the scan stays cheap exactly when rows are worst.

    Returns a dict of named Columns so callers pick what they project.
    """
    words = F.split(F.trim(text), r"\s+")
    n = F.size(words)
    dup_word_frac = F.round(
        (n - F.size(F.array_distinct(words))) / F.greatest(n, F.lit(1)), 4)
    grams = F.filter(
        F.transform(words, lambda w, i: F.concat_ws(" ", w, F.get(words, i + 1))),
        lambda g, i: i < n - 1,
    )
    top_gram_count = F.when(n <= 1, F.lit(0)).otherwise(F.array_max(
        F.transform(F.array_distinct(grams),
                    lambda g: F.size(F.filter(grams, lambda x: x == g)))))
    top_2gram_frac = F.round(
        top_gram_count / F.greatest(F.size(grams), F.lit(1)), 4)
    return {"dup_word_frac": dup_word_frac, "top_2gram_frac": top_2gram_frac}


def gopher_pass(text: Column, max_dup_word_frac: float = 0.3,
                max_top_2gram_frac: float = 0.18) -> Column:
    """Boolean keep/drop verdict from the repetition signals with the
    published Gopher-style thresholds as defaults."""
    sig = repetition_signals(text)
    return ((sig["dup_word_frac"] <= max_dup_word_frac)
            & (sig["top_2gram_frac"] <= max_top_2gram_frac))


# PII patterns restricted to the regex subset Java (Spark) and RE2 (DuckDB)
# interpret identically, so the scrub is oracle-checkable cross-engine.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9][0-9() .\-]{6,16}[0-9]"


def pii_scrub(text: Column) -> Column:
    """Redact emails then phone-like digit runs (training-data hygiene pass;
    emails first so phone redaction cannot eat an address's digits)."""
    no_email = F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_PATTERN, "<PHONE>")


def fingerprint(text: Column) -> Column:
    """Rolling polynomial hash over characters mod 1e9+7 (order-sensitive
    document fingerprint; bigint-safe: acc*31+c < 2^63)."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.coalesce(F.ascii(c), F.lit(0))) % MOD,
    )
