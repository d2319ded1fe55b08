"""PII detection and scrubbing for a large-scale training-data pipeline.

The reference never redacts — its content cleaning stops at whitespace
normalization and ad-marker drops (collectors/isna/isna_source.py:100-112,
collectors/shargh/pages_collector.py:270-277). A corpus that ships to a
trainer additionally needs a PII pass: detect and replace emails / IPv4
addresses / international phone numbers with typed placeholders.

Everything here is a pure ``pyspark.sql.functions`` expression — JVM-side
regex, whole-stage codegen, zero Python in the hot path — so the pass is
a single scan at 100 TB (no shuffle, no UDF). The patterns are kept to
the common regex subset (character classes, bounded quantifiers, ``\\b``)
so Java's engine and the DuckDB oracle's RE2 agree byte-for-byte; the
x11 gate query value-hashes both the per-kind counts and the scrubbed
text against a DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: the scrub applies top to bottom, so a pattern must not match
# inside an earlier pattern's placeholder. Kept RE2-compatible (no
# lookarounds, no backreferences) for oracle parity.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{8,15}", "<PHONE>"),
)


def _col(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def pii_count(text: Column | str, kind: str) -> Column:
    """Number of matches of one PII kind in the text."""
    pattern = {k: p for k, p, _ in PII_PATTERNS}[kind]
    return F.regexp_count(_col(text), F.lit(pattern))


def scrub_pii(text: Column | str) -> Column:
    """Text with every PII match replaced by its typed placeholder.

    Chained ``regexp_replace`` in PII_PATTERNS order: emails first (an
    email contains dot-runs an IPv4 pattern could otherwise bite into),
    then IPv4, then phones. One codegen'd projection, no UDF.
    """
    c = _col(text)
    for _, pattern, placeholder in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, placeholder)
    return c


def with_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Single-scan PII audit: per-kind match counts + the scrubbed text.

    Columns added: ``n_email, n_ipv4, n_phone, text_scrubbed``. The
    counts let a pipeline route high-PII documents to quarantine while
    the scrubbed column feeds the trainer — both from one pass.
    """
    return docs.select(
        "*",
        *[
            pii_count(text_col, kind).alias(f"n_{kind}")
            for kind, _, _ in PII_PATTERNS
        ],
        scrub_pii(text_col).alias("text_scrubbed"),
    )
