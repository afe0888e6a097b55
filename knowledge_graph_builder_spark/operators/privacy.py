"""PII redaction for corpus pipelines: mask emails, national-ID-shaped
numbers, phone numbers, and IPv4 addresses before a corpus is released
or used for training. A standard pretraining preprocessing stage (the
reference has no privacy pass; this is part of the LLM-data-pipeline
surface the engine adds on top of reference parity).

Pure column expressions — `regexp_extract_all` + `regexp_replace`
chains, codegen'd JVM-side, zero shuffle. Patterns use only syntax
shared by Java regex (Spark) and RE2 (DuckDB oracle): no lookaround,
no backreferences.

Counts are taken on the text as it stands BEFORE that pattern's own
redaction (patterns are applied in list order), so an email whose
local part looks like a phone number is counted once, as an email.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) applied in order; order matters because
# each redaction rewrites the text the next pattern scans.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII mask + per-type hit counts.

    Output: (doc_id, redacted, n_email, n_ssn, n_phone, n_ipv4, n_pii).
    Scale shape: per-row column math only — no shuffle, no UDF; at
    100 TB this is a map-only stage fused into whatever scan feeds it.
    """
    text = F.col(text_col)
    counts: list[tuple[str, object]] = []
    for name, pat, repl in PII_PATTERNS:
        c = F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).cast("int")
        counts.append((name, c))
        text = F.regexp_replace(text, pat, repl)
    total = None
    for _, c in counts:
        total = c if total is None else total + c
    return docs.select(
        F.col(id_col).alias("doc_id"),
        text.alias("redacted"),
        *[c.alias(f"n_{name}") for name, c in counts],
        total.cast("int").alias("n_pii"),
    )
