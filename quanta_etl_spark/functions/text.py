"""Text-analysis expressions for large-scale document pipelines.

Everything here is a Catalyst Column expression (JVM-side, codegen'd) —
no row-at-a-time Python. These are the primitives the dedup /
language-ID / quality-scoring operators compose; at 100 TB they run at
parquet-scan speed.

All functions are deterministic so results hash-match a SQL oracle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword lists for the n-gram-free language-ID
# heuristic: score = fraction of whitespace tokens that are stopwords of
# each language; argmax wins. Deliberately tiny — language ID at scale
# needs only a coarse signal per document, and a 20-word list keeps the
# whole computation a single JVM expression.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "that", "it", "was", "for",
           "on", "are", "as", "with", "his", "they", "at", "be", "this", "have"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den", "nicht",
           "ein", "eine", "auf", "sich", "des", "im", "dem", "für", "als",
           "auch", "es"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "en", "que", "qui",
           "dans", "pour", "pas", "une", "au", "sur", "avec", "son", "ne",
           "se"),
    "es": ("el", "la", "los", "las", "de", "que", "y", "en", "un", "una",
           "es", "por", "con", "para", "su", "se", "del", "al", "lo", "como"),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string>; empty text → empty array."""
    t = F.trim(_c(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    """Whitespace token count (the `wc -w` definition)."""
    return F.size(ws_tokens(text))


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-ish subword-boundary tokenization: letter runs, digit runs,
    and single punctuation marks each count as one token — a cheap,
    deterministic proxy for a real BPE vocab (which needs model files).
    """
    return F.regexp_extract_all(
        _c(text), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)
    )


def bpe_ish_token_count(text: Column | str) -> Column:
    return F.size(bpe_ish_tokens(text))


def stopword_hits(text: Column | str, lang: str) -> Column:
    """Count of whitespace tokens (lowercased) in ``lang``'s stopword list.

    Implemented as ONE native ``regexp_count`` over the lowered text —
    ``(?<!\\S)(?:w1|w2|…)(?!\\S)`` counts exactly the whitespace-
    delimited occurrences, i.e. token membership, because tokens ARE
    the maximal non-whitespace runs. The previous
    ``filter(toks, array_contains)`` form was a Catalyst higher-order
    lambda: interpreted per token per stopword (tokens × 20 linear
    probes × languages per doc — the same interpreted-lambda class the
    r10 oracle fix removed from DuckDB, r11 removes from the Spark
    side). Alternatives rejected: ``array_intersect`` deduplicates
    (membership, not occurrences); ``size - size(array_except)`` also
    deduplicates. Longest-first alternation minimizes backtracking; the
    ``(?!\\S)`` lookahead makes match choice order-independent (a
    prefix word failing the lookahead backtracks into the longer one).
    """
    words = sorted(STOPWORDS[lang], key=len, reverse=True)
    pat = r"(?<!\S)(?:" + "|".join(re.escape(w) for w in words) + r")(?!\S)"
    return F.regexp_count(F.lower(_c(text)), F.lit(pat))


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts;
    'und' (undetermined) when no stopword of any language occurs.
    Ties break by language code order (deterministic).
    """
    scores = [(lang, stopword_hits(text, lang)) for lang in sorted(STOPWORDS)]
    best = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    # Reverse order so earlier language codes win ties (last when wins).
    for lang, score in reversed(scores):
        result = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(result)
    return result


def punct_ratio(text: Column | str) -> Column:
    """Punctuation characters / total characters (0.0 for empty text)."""
    t = _c(text)
    n = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}\-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n)


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    n = token_count(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        stopword_hits(text, lang).cast("double") / n
    )


def quality_score(text: Column | str) -> Column:
    """Composite document-quality score in [0, 1]:

        0.4 * length_score  (saturates at 2000 chars)
      + 0.4 * stopword_score (english stopword ratio, saturates at 0.4)
      + 0.2 * (1 - excess punctuation) (penalize punct ratio beyond 0.1)

    The exact formula is arbitrary by design — what matters is that it's
    deterministic, monotone in the obvious directions, and cheap.
    """
    t = _c(text)
    length_score = F.least(F.length(t).cast("double") / 2000.0, F.lit(1.0))
    sw_score = F.least(stopword_ratio(t) / 0.4, F.lit(1.0))
    punct_penalty = F.least(
        F.greatest(punct_ratio(t) - 0.1, F.lit(0.0)) / 0.4, F.lit(1.0)
    )
    return 0.4 * length_score + 0.4 * sw_score + 0.2 * (1.0 - punct_penalty)


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace,
    strip leading/trailing space."""
    return F.trim(F.regexp_replace(F.lower(_c(text)), r"\s+", " "))


# ---------------------------------------------------------------------------
# Corpus cleanup: markup stripping, URL extraction, PII redaction.
# All patterns are RE2-compatible (no backrefs/lookarounds) so every
# function is reproducible in engines with RE2 regexes (DuckDB) — the
# same portability rule as `fingerprint`'s md5.
# ---------------------------------------------------------------------------

_URL_RE = r"https?://[^\s<>\"')\]]+"
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9()\s.-]{7,}[0-9]"


def strip_html(text: Column | str) -> Column:
    """Remove markup tags and decode the common entities — the cheap
    scrape-cleanup pass (a full HTML parser is per-row Python; this
    stays a native regexp chain and covers the typical crawl text)."""
    t = F.regexp_replace(_c(text), r"<[^>]+>", " ")
    for ent, rep in (
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
        ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def extract_urls(text: Column | str) -> Column:
    """All http(s) URLs in the text → array<string> (document order)."""
    return F.regexp_extract_all(_c(text), F.lit(_URL_RE), F.lit(0))


def url_domains(text: Column | str) -> Column:
    """Distinct registrable-ish domains (host part, lowercased) of all
    URLs in the text → array<string>."""
    return F.array_distinct(
        F.transform(
            extract_urls(text),
            lambda u: F.lower(
                F.regexp_extract(u, r"https?://([^/:?#]+)", 1)
            ),
        )
    )


def redact_pii(text: Column | str, replacement: str = "[REDACTED]") -> Column:
    """Mask emails and phone-number-shaped digit runs. Pattern-based —
    the standard cheap pass before corpus release; NOT a guarantee
    (free-text PII needs NER, which is model territory)."""
    t = F.regexp_replace(_c(text), _EMAIL_RE, replacement)
    return F.regexp_replace(t, _PHONE_RE, replacement)


def fingerprint(text: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint (md5 hex of the
    normalized text). md5 rather than xxhash64 so a SQL oracle can
    reproduce it engine-independently."""
    return F.md5(normalize_text(text))


def char_shingles(text: Column | str, k: int = 5) -> Column:
    """Distinct character k-grams of the normalized text → array<string>.
    Documents shorter than k chars yield a single shingle (the whole
    text). Pure expression: substring over a generated index sequence.
    """
    t = normalize_text(text)
    n = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: t.substr(i, F.lit(k))))


def shingle_hashes(text: Column | str, k: int = 5) -> Column:
    """Distinct 64-bit hashes of character k-grams → array<bigint>."""
    return F.transform(char_shingles(text, k), lambda s: F.xxhash64(s))


def portable_hash60(s: Column) -> Column:
    """60-bit engine-portable string hash: the first 15 hex chars of
    md5 as an integer — ``('0x' || substr(md5(s),1,15))::UBIGINT`` in
    DuckDB. Slower than xxhash64 but reproducible anywhere md5 exists;
    the hash behind every `variant="md5_60"` knob in this engine."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def _gram_hash(s: Column, variant: str) -> Column:
    if variant == "xxhash64":
        return F.xxhash64(s)
    if variant == "md5_60":
        return portable_hash60(s)
    raise ValueError(f"unknown hash variant: {variant!r}")


def rolling_kgram_hashes(
    text: Column | str, k: int = 7, variant: str = "xxhash64"
) -> Column:
    """ORDERED (non-distinct) rolling k-gram hashes of the normalized
    text — position matters, unlike ``shingle_hashes``."""
    t = normalize_text(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: _gram_hash(t.substr(i, F.lit(k)), variant))


def winnow_fingerprints(
    text: Column | str, k: int = 7, window: int = 4, variant: str = "xxhash64"
) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): take the min rolling-hash from
    every window of ``window`` consecutive k-gram hashes; the distinct
    selected hashes are the fingerprint set. Guarantee: any shared
    substring of length >= window + k - 1 yields a shared fingerprint,
    with density ~2/(window+1) of all hashes.

    Implementation note — the let-binding idiom: the hash array is
    wrapped in a 1-element array and consumed through a lambda VARIABLE
    (``transform(array(h), arr -> ...)[0]``). Lambda variables are bound
    values, so ``arr`` is referenced per window for free; inlining the
    hash expression directly into the window lambda would re-hash the
    whole document once per window (O(n²))."""
    h = rolling_kgram_hashes(text, k, variant)
    return F.transform(
        F.array(h),
        lambda arr: F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size(arr) - (window - 1), F.lit(1))
                ),
                lambda i: F.array_min(F.slice(arr, i, window)),
            )
        ),
    )[0]
