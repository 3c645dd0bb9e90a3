"""Text-analysis operators for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Column expressions in whole-stage codegen wherever the semantics allow
(zero Python, zero shuffle — per-row map operators that scale linearly
with input splits); the one gram-counting kernel that needs a hash map is
a single Arrow-batched pandas UDF.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    """Reference fold formulation: count split-on-space tokens that are
    stopwords.  Kept as the semantic spec; hot paths use
    ``_stop_count_rx`` — higher-order array functions (filter/aggregate)
    are CodegenFallback in Spark, i.e. interpreted per element, measured
    ~13 ms/row on 800-word pages vs ~30 µs for the regexp single pass."""
    return F.size(F.filter(words, lambda w: w.isin(STOPWORDS[lang])))


def _stop_count_rx(text: Column, lang: str) -> Column:
    """Token-exact regexp reformulation of ``_stop_count``: a token of
    ``split(text, ' ')`` equals a stopword iff the stopword occurs in
    ``text`` bounded by start-of-input/space on the left and
    space/end-of-input on the right.  ``\\z`` (not ``$``) so a trailing
    newline is NOT an end boundary, matching Python/split semantics; the
    lookahead keeps the right boundary unconsumed so adjacent stopwords
    ("the of") both count.  Whole-stage codegen, one pass per language."""
    alts = "|".join(STOPWORDS[lang])
    return F.regexp_count(text, F.lit(f"(?:^| )(?:{alts})(?= |\\z)"))


# Script-ratio detection for non-Latin languages (r05 widening): one
# regexp_count per script, whole-stage codegen like the stopword passes.
# Order matters — ja (kana) is checked before zh (han) because Japanese
# text mixes kanji into the han range; a >30% kana share is decisively
# Japanese while han chars alone are Chinese.
_SCRIPTS = [
    ("ar", "[؀-ۿ]"),  # Arabic
    ("th", "[฀-๿]"),  # Thai
    ("ko", "[가-힯]"),  # Hangul syllables
    ("ja", "[぀-ヿ]"),  # Hiragana + Katakana
    ("zh", "[一-鿿]"),  # CJK unified ideographs
    ("ru", "[Ѐ-ӿ]"),  # Cyrillic
]
_SCRIPT_THRESHOLD_PCT = 30  # script chars > 30% of non-space chars


def lang_id(text: Column) -> Column:
    """Two-stage heuristic, fully codegen (no Python, no HOFs):

    1. script ratio — if >30% of non-space characters belong to one of
       the ``_SCRIPTS`` ranges (checked in order), that script's language
       wins (ar/th/ko/ja/zh/ru);
    2. otherwise argmax of per-language stopword hits over the Latin
       set; ties resolve en > es > fr > pt (deterministic).
    """
    scores = {lang: _stop_count_rx(text, lang) for lang in STOPWORDS}
    best = F.lit("en")
    best_score = scores["en"]
    for lang in ["es", "fr", "pt"]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    nonspace = F.length(F.regexp_replace(text, r"\s", ""))
    for lang, rng in reversed(_SCRIPTS):
        cnt = F.regexp_count(text, F.lit(rng))
        best = F.when(cnt * 100 > nonspace * _SCRIPT_THRESHOLD_PCT,
                      F.lit(lang)).otherwise(best)
    return best


def lang_id_two_phase(df, *cols, text: str = "text", alias: str = "lang_guess"):
    """Plan-shape reformulation of ``lang_id`` — same result (equivalence
    tested), each regex pass evaluated once per row.

    The single-Column ``lang_id`` nests the score subexpressions inside CASE
    WHEN *branches*, which Spark's subexpression elimination cannot merge
    (branches are lazily evaluated), so the physical plan duplicates the
    en-stopword scan ~8x and the ``\\s``-strip 6x (r6 plan audit; a typical
    Latin-text row paid ~20+ regex/array evaluations instead of 11).  Here
    the 11 passes land in an inner projection and the identical decision
    fold runs over the bound columns in an outer one; CollapseProject keeps
    the barrier because the non-cheap score columns are referenced more than
    once."""
    t = F.col(text)
    inner = df.select(
        *cols,
        F.length(F.regexp_replace(t, r"\s", "")).alias("__nonspace"),
        *[_stop_count_rx(t, lang).alias(f"__stop_{lang}") for lang in STOPWORDS],
        *[F.regexp_count(t, F.lit(rng)).alias(f"__script_{lang}")
          for lang, rng in _SCRIPTS],
    )
    scores = {lang: F.col(f"__stop_{lang}") for lang in STOPWORDS}
    best = F.lit("en")
    best_score = scores["en"]
    for lang in ["es", "fr", "pt"]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    nonspace = F.col("__nonspace")
    for lang, _rng in reversed(_SCRIPTS):
        cnt = F.col(f"__script_{lang}")
        best = F.when(cnt * 100 > nonspace * _SCRIPT_THRESHOLD_PCT,
                      F.lit(lang)).otherwise(best)
    return inner.select(*cols, best.alias(alias))


def token_count_ws(text: Column) -> Column:
    """Whitespace tokens.  ``size(split(s, p)) == regexp_count(s, p) + 1``
    identically (Spark split keeps trailing empties, limit -1), and the
    count form skips materializing the token array per row."""
    return F.regexp_count(F.trim(text), F.lit(r"\s+")) + F.lit(1)


BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish segmentation: letter runs, digit runs, single punctuation."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: alpha-char ratio + stopword ratio +
    word-length sanity, rounded to 4 decimals for cross-engine stability."""
    n_chars = F.length(text)
    # size(split(text, ' ')) without building the array (see token_count_ws)
    n_words = F.regexp_count(text, F.lit(" ")) + F.lit(1)
    n_alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    n_stop = _stop_count_rx(text, "en")
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    avg_wlen = (n_chars - (n_words - 1)) / F.greatest(n_words, F.lit(1))
    wlen_ok = F.when((avg_wlen >= 3) & (avg_wlen <= 10), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(0.5 * alpha_ratio + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
                   + 0.2 * wlen_ok, 4)


_REP_COUNTS_SCHEMA = T.StructType([
    T.StructField("n", T.IntegerType()),
    T.StructField("n_distinct", T.IntegerType()),
    T.StructField("n_grams", T.IntegerType()),
    T.StructField("top_gram", T.IntegerType()),
])

# Java \s (no UNICODE_CHARACTER_CLASS)==[ \t\n\x0B\f\r]; re.ASCII matches it.
_WS_ASCII = re.compile(r"\s+", re.ASCII)


@F.pandas_udf(_REP_COUNTS_SCHEMA)
def _rep_counts(s: "pd.Series") -> "pd.DataFrame":
    """Integer repetition counts in one linear pass per row (hash-map
    Counter).  The prior pure-Column form scanned grams once per DISTINCT
    gram — O(n_distinct*n) interpreted-lambda work, i.e. quadratic exactly
    on high-diversity natural text (ADVICE r02).  Token/gram construction
    replicates Spark ``split(trim(text), '\\s+')`` byte-for-byte: trim
    strips 0x20 only, split keeps leading/trailing empty tokens (limit -1),
    grams join adjacent tokens with one space.  Only COUNTS are computed
    here; ratios + rounding stay in Spark columns so float semantics vs
    the DuckDB oracle are untouched."""
    rows = []
    for v in s:
        if v is None:
            rows.append((None, None, None, None))
            continue
        toks = _WS_ASCII.split(v.strip(" "))
        n = len(toks)
        grams = [toks[i] + " " + toks[i + 1] for i in range(n - 1)]
        top = max(Counter(grams).values()) if grams else 0
        rows.append((n, len(set(toks)), len(grams), top))
    return pd.DataFrame(rows, columns=["n", "n_distinct", "n_grams", "top_gram"])


def repetition_signals(text: Column) -> dict:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    Models" §A1.1 quality heuristics — public paper): duplicate-word
    fraction and most-frequent-2-gram occurrence fraction.  Counts come
    from one Arrow-batched kernel (linear per row, zero shuffle — a per-row
    map operator); ratio arithmetic is Column-tier.

    Returns a dict of named Columns so callers pick what they project.
    """
    c = _rep_counts(text)
    n = c["n"]
    dup_word_frac = F.round(
        (n - c["n_distinct"]) / F.greatest(n, F.lit(1)), 4)
    top_gram_count = F.when(n <= 1, F.lit(0)).otherwise(c["top_gram"])
    top_2gram_frac = F.round(
        top_gram_count / F.greatest(c["n_grams"], F.lit(1)), 4)
    return {"dup_word_frac": dup_word_frac, "top_2gram_frac": top_2gram_frac}


def gopher_pass(text: Column = None, max_dup_word_frac: float = 0.3,
                max_top_2gram_frac: float = 0.18,
                signals: dict = None) -> Column:
    """Boolean keep/drop verdict from the repetition signals with the
    published Gopher-style thresholds as defaults.  Pass ``signals`` (an
    existing ``repetition_signals`` dict) when the caller also projects the
    signal columns — otherwise the counts kernel would run twice per row."""
    sig = signals if signals is not None else repetition_signals(text)
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


def fingerprint_fold(text: Column) -> Column:
    """Rolling polynomial hash over characters mod 1e9+7 (order-sensitive
    document fingerprint; bigint-safe: acc*31+c < 2^63).

    SEMANTIC SPEC ONLY: higher-order array lambdas are CodegenFallback —
    interpreted per element, ~4,800 elements on a long-form page (the exact
    anti-pattern measured at ~13 ms/row in the old lang_id, BENCH.md §5).
    Hot paths use ``fingerprint`` (the Arrow kernel); equivalence is
    enforced by tests/test_datapipe.py::test_fingerprint_kernel_matches_fold.
    """
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.coalesce(F.ascii(c), F.lit(0))) % MOD,
    )


# 31^k mod MOD table, grown on demand and shared across batches (max doc
# length bounds it; growth is amortized-once per worker).
_POW31 = np.array([1], dtype=np.int64)


def _pow31_upto(n: int) -> np.ndarray:
    global _POW31
    if len(_POW31) < n:
        m = len(_POW31)
        ext = np.empty(n, dtype=np.int64)
        ext[:m] = _POW31
        for i in range(m, n):
            ext[i] = ext[i - 1] * 31 % MOD
        _POW31 = ext
    return _POW31


def _fingerprint_py(text: str) -> int:
    """Vectorized replica of the ``fingerprint_fold`` Horner recurrence via
    the closed form sum(code_i * 31^(n-1-i)) mod MOD.  UTF-32 decode gives
    one element per code point — identical to Spark's split-by-'' (Java
    regex splits between code points, keeping surrogate pairs whole) +
    ``ascii`` (code point of the char).  Overflow-safe in int64: code <
    2^21, pow < 2^30 -> products < 2^51; each term is reduced mod MOD
    before the sum, so the running sum stays < n * 2^30."""
    n = len(text)
    if n == 0:
        return 0
    codes = np.frombuffer(
        text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    pw = _pow31_upto(n)[:n][::-1]
    return int((codes * pw % MOD).sum() % MOD)


@F.pandas_udf(T.LongType())
def fingerprint_kernel(s: "pd.Series") -> "pd.Series":
    """Arrow-batched polynomial fingerprint, value-identical to
    ``fingerprint_fold`` (VERDICT r03 #3: the per-character interpreted
    fold was the last CodegenFallback scale-killer in the hot path)."""
    return s.map(lambda v: None if v is None else _fingerprint_py(v))


def fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint (rolling 31-polynomial hash mod
    1e9+7) — dispatches to the Arrow kernel; ``fingerprint_fold`` remains
    the pure-Column semantic spec."""
    return fingerprint_kernel(text)
