"""PII scrubbing for training corpora — redact personally identifiable
spans (emails, IPv4 addresses, US-SSN-shaped ids, long digit runs such as
card/phone numbers) and count them per document.

A standard pretraining-hygiene pass (the C4/Dolma pipelines ship the same
class of regex scrubbers).  Not in the cuML reference (dense-matrix data
model); first-class here like the dedup tier.

Scale shape: pure column expressions — ``regexp_extract_all`` for counts
and chained ``regexp_replace`` for redaction, all JVM codegen, zero
shuffles and zero UDFs; the pass fuses into whatever scan feeds it.

Patterns are deliberately conservative, anchored constructs that mean the
same thing to Java regex (Spark) and RE2 (DuckDB), so every count and the
scrubbed text itself are oracle-checkable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered: email first (an address contains dot-runs an IP pattern could
# nibble at), then IP, SSN, and bare 13-16 digit runs (card-like)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("number", r"\b\d{13,16}\b", "[NUMBER]"),
]


def scrub_pii(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """→ (id_col, scrubbed, n_email, n_ip, n_ssn, n_number).

    Counts are measured on the ORIGINAL text per category (independent of
    replacement order); ``scrubbed`` applies the replacements in PII_PATTERNS
    order so nested matches resolve deterministically.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .alias(f"n_{name}")
        for name, pat, _repl in PII_PATTERNS
    ]
    scrubbed = F.col(text_col)
    for _name, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(F.col(id_col), scrubbed.alias("scrubbed"), *counts)
