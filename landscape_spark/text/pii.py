"""PII scrubbing: pattern-based redaction of emails / IPv4s / phone numbers.

The standard pre-training cleanup pass (public C4/Dolma-style pipelines
redact or drop contact-info spans). Implementation is pure JVM
`regexp_replace` chains — one projection over the scan, no UDF, no shuffle —
with patterns chosen inside the Java-regex ∩ RE2 common subset (no
lookaround, no backreferences) so the DuckDB oracle replicates the rewrite
byte-for-byte (verified for multi-match rows, overlapping candidates, and
adjacent-span edge cases; note DuckDB needs the 'g' flag — its default
replaces only the FIRST match, Java replaces all).

At 100 TB this is the cheapest operator class in the engine: a per-row
regex pipeline with no data movement, fully pushdown-compatible column
pruning, and whole-stage codegen keeps it JVM-side end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"

# applied in this order: the email pattern can consume characters a later
# pattern would otherwise match inside (e.g. digits in a mailbox name), so
# order is part of the operator's contract and mirrored in the oracle
PATTERNS = [(EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>")]


def scrub_col(text: F.Column) -> F.Column:
    for pat, repl in PATTERNS:
        text = F.regexp_replace(text, pat, repl)
    return text


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, clean_text): per-doc match counts
    plus the redacted text. Counts are taken BEFORE redaction (order-
    independent); redaction applies the patterns in PATTERNS order."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phones"),
        scrub_col(t).alias("clean_text"),
    )


def pii_scrub_sql(source_sql: str = "SELECT doc_id, text FROM documents") -> str:
    """DuckDB oracle over any (doc_id, text) source; clean text is md5'd on
    both sides by the gate to keep compare rows small."""
    return f"""
WITH src AS ({source_sql})
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{IPV4_RE}')) AS n_ips,
       len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{IPV4_RE}', '<IP>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g') AS clean_text
FROM src
"""
