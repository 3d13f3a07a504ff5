"""Text-analysis operators for training-data pipelines (north-star
extensions, SURVEY.md §7 module 10): language ID, quality scoring, token
counting, document fingerprinting.

All pure Column expressions (JVM-side, codegen'd) — a 100 TB corpus never
leaves the executors and never crosses into Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import normalized_fingerprint, tokens  # re-exported building blocks

# Minimal stopword profiles for the n-gram/stopword-ratio language
# heuristic. Deliberately tiny: the point is the operator shape (set
# membership ratios over token arrays), not lexicon quality.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on"),
    "es": ("el", "la", "de", "y", "que", "en", "los", "las", "un", "una"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "que", "dans"),
}

EN_STOPWORDS = LANG_PROFILES["en"]


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(F.trim(c), r"\s+"))


def word_token_count(text: Column | str) -> Column:
    """BPE-ish word/punctuation token count: alphanumeric runs and single
    non-space punctuation marks each count as one token."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.regexp_extract_all(c, F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), F.lit(0))
    )


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are profile stopwords."""
    t = tokens(text)
    hits = F.size(F.filter(t, lambda w: w.isin(*stopwords)))
    return hits / F.greatest(F.size(t), F.lit(1))


def language_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-ratio scores."""
    return {lang: stopword_ratio(text, words) for lang, words in LANG_PROFILES.items()}


def detect_language(text: Column | str, min_ratio: float = 0.05) -> Column:
    """Argmax language over the profiles; 'und' when no profile clears
    ``min_ratio``. Deterministic tie-break: profile declaration order wins
    (strict > comparison against the running best)."""
    scores = language_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(float(min_ratio))
    for lang, score in scores.items():
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def punct_ratio(text: Column | str) -> Column:
    """Fraction of non-whitespace chars that are punctuation/symbols."""
    c = F.col(text) if isinstance(text, str) else text
    no_ws = F.regexp_replace(c, r"\s", "")
    non_punct = F.regexp_replace(no_ws, r"[^a-zA-Z0-9]", "")
    return (F.length(no_ws) - F.length(non_punct)) / F.greatest(F.length(no_ws), F.lit(1))


def mean_word_length(text: Column | str) -> Column:
    t = tokens(text)
    total = F.aggregate(t, F.lit(0), lambda acc, w: acc + F.length(w))
    return total / F.greatest(F.size(t), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1]:
    - length component: saturating n_tokens / 200
    - fluency component: 1 - punct_ratio
    - naturalness component: stopword ratio saturating at 0.08
    Weighted 0.4 / 0.3 / 0.3 — the standard shape of corpus-filtering
    scores (length/punct/stopword mix), tuned for determinism not SOTA.
    """
    length_c = F.least(token_count(text) / F.lit(200.0), F.lit(1.0))
    punct_c = F.lit(1.0) - punct_ratio(text)
    stop_c = F.least(stopword_ratio(text) / F.lit(0.08), F.lit(1.0))
    return 0.4 * length_c + 0.3 * punct_c + 0.3 * stop_c


def doc_fingerprint(text: Column | str) -> Column:
    """Stable content fingerprint: md5 of the sorted distinct token set
    (whitespace/order-invariant). Alias of the dedup building block."""
    return normalized_fingerprint(text)


# PII patterns deliberately written in the regex subset every engine
# parses identically (no lookarounds, no \b word boundaries — DuckDB RE2
# and Java regex agree on these literals and classes).
# ipv4 MUST precede phone, and phone's separator class excludes '.': an
# IPv4 with 3-digit octets (192.168.100.200) would otherwise fully match a
# dotted phone pattern, mislabeling both the scrub token and the per-kind
# audit counts (which match each pattern independently on the raw text).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    ("phone", r"\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}", "<PHONE>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
)


def scrub_pii(text: Column | str, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace PII spans with typed placeholder tokens — chained
    ``regexp_replace`` (JVM-side, codegen'd; order = PII_PATTERNS order,
    so SSN-looking strings inside already-scrubbed spans can't re-match).
    """
    col = F.col(text) if isinstance(text, str) else text
    for kind, pattern, token in PII_PATTERNS:
        if kinds is None or kind in kinds:
            col = F.regexp_replace(col, pattern, token)
    return col


def pii_hit_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind match counts (audit metric before destructive scrubbing)."""
    col = F.col(text) if isinstance(text, str) else text
    return {
        kind: F.coalesce(F.regexp_count(col, F.lit(pattern)), F.lit(0)).cast("long")
        for kind, pattern, _ in PII_PATTERNS
    }
