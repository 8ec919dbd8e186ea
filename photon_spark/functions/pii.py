"""PII detection and redaction over a text corpus.

Scrubbing personally identifiable information is a standard pass in a
training-data pipeline (alongside dedup/quality filtering — see README
pipeline stages). Pure ``pyspark.sql.functions`` regex work: the counters
compile to codegen'd ``regexp_count`` / ``regexp_replace`` over the scan —
no UDFs, no shuffle, linear at any scale.

The patterns use only syntax with identical semantics in Java regex
(Spark) and RE2 (DuckDB), so the per-doc counters are oracle-checkable.
The driver corpus is synthetic word-salad with zero PII-like spans, which
would make a gated query an all-zeros hash — so this module is pinned by
unit tests on constructed documents instead (tests/test_enrich.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Detection patterns, in redaction priority order (email before phone so
#: the digits of a phone-bearing email aren't double-redacted).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "card": r"\b\d{13,16}\b",
    "phone": r"\+?\d[\d().\- ]{7,14}\d\b",
}


def pii_counts(text_col) -> dict[str, Column]:
    """Per-kind span counts for one text column (codegen regexp_count)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return {kind: F.regexp_count(c, F.lit(pat)).cast("long")
            for kind, pat in PII_PATTERNS.items()}


def pii_profile(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """→ one row per document: per-kind counts + total + has_pii flag."""
    counts = pii_counts(text_col)
    total = None
    for col in counts.values():
        total = col if total is None else total + col
    return df.select(
        F.col(id_col),
        *[col.alias(f"n_{kind}") for kind, col in counts.items()],
        total.alias("n_pii"),
        (total > 0).alias("has_pii"))


def redact(df: DataFrame, text_col: str = "text",
           out_col: str | None = None) -> DataFrame:
    """Replace every PII span with ``[KIND]`` placeholders, in
    :data:`PII_PATTERNS` priority order. One chained projection — the regex
    passes fuse into a single codegen stage over the scan."""
    c = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"[{kind.upper()}]")
    return df.withColumn(out_col or text_col, c)
