"""PII scrubbing for training text — the corpus-side sibling of the
column-masking family (functions/masking.py masks structured fields; this
scrubs free text before it enters a training mix).

Patterns are chosen to behave identically in Java regex (Spark) and RE2
(DuckDB oracle): character classes, bounded repetition and ``\\b`` only — no
backreferences, no lookaround. Replacement is token-preserving (``<EMAIL>``)
so downstream token statistics stay meaningful.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: pattern -> placeholder, applied in order (order matters: emails contain
#: dots that the IP pattern must not see first)
PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d -]{7,}\d", "<PHONE>"),
]


def scrub_pii(col: Column) -> Column:
    """Apply every PII rule in order — pure JVM-side regexp_replace chain."""
    out = col
    for pattern, placeholder in PII_RULES:
        out = F.regexp_replace(out, pattern, placeholder)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-rule match counts (for corpus auditing dashboards)."""
    return {
        placeholder.strip("<>").lower() + "_count": F.regexp_count(
            col, F.lit(pattern)
        ).cast("bigint")
        for pattern, placeholder in PII_RULES
    }
