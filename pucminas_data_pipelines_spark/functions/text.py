"""Text primitives as Catalyst expressions: normalization, tokenization,
shingling, language scoring, quality metrics — the building blocks of the
dedup / text-analysis operators (SURVEY.md §7 M5).

Everything here is a column expression (JVM-side). Each primitive is written
to be *portable*: the same logic is expressible in ANSI-ish SQL so DuckDB
oracles can mirror it exactly (e.g. language scoring counts via
length-difference tricks rather than engine-specific functions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword markers for the n-gram/stopword heuristic
# language ID. Deliberately small + deterministic; counting is done with
# the portable (length - length(replace)) / len(marker) trick.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " de ", " que "],
    "fr": [" le ", " et ", " les "],
    "de": [" der ", " und ", " die "],
    "zh": ["的", "是", "了"],
}


def normalize_text(col: Column) -> Column:
    """lower → strip non-alphanumerics to space → collapse whitespace → trim.
    The canonical form used by exact-dedup and fingerprinting."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def tokens(col: Column) -> Column:
    """Whitespace tokens of the raw text (array<string>)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """A BPE-ish proxy token count: word pieces + digit runs + punctuation
    marks counted separately (regexp-based, no model). Useful as a stable
    token-budget estimator for LLM pipelines."""
    pieces = F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces)


def occurrence_count(col: Column, marker: str) -> Column:
    """Portable substring occurrence count:
    (len(s) - len(replace(s, marker, ''))) / len(marker)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("int")


def lang_score(col: Column, lang: str) -> Column:
    """Marker-occurrence score for one language over ' '||lower(text)||' '."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    score = F.lit(0)
    for marker in LANG_MARKERS[lang]:
        score = score + occurrence_count(padded, marker)
    return score


def char_shingles(col: Column, n: int = 5) -> Column:
    """Distinct character n-grams of the normalized text (array<string>).
    Basis for MinHash/Jaccard near-dup detection."""
    norm = normalize_text(col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.substring(norm, i, F.lit(n)))
    )


def token_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams (array<string>) of the normalized text."""
    toks = F.split(normalize_text(col), " ")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), k)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )
