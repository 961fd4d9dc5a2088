"""PII redaction for training-data curation.

Standard pipeline hygiene (the C4 / RefinedWeb / Pile lineage): scrub
emails, phone numbers, and IP addresses from corpus text before
training, and record per-class hit counts so the removal is auditable.

Spark shape: pure per-row ``regexp_extract_all`` + ``regexp_replace``
chains — zero shuffle, whole-stage codegen, embarrassingly parallel at
any corpus size.  The patterns stick to the regex subset where Java's
engine and RE2 (DuckDB) agree (character classes, non-capturing
groups, bounded repeats, ``\\b``), so the DuckDB twin in
``__spark_entry__.oracle_sql()`` is bit-exact.

Classes are applied in a fixed order (email, then phone, then IPv4),
each counted on the text as it stands after the previous class was
scrubbed — overlap between classes is therefore counted once,
deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Ordered: email first (its local part may contain digit runs the
# phone/IP classes would otherwise claim).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\b(?:\d{3}[-.]){2}\d{4}\b"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
)

REPLACEMENT = "<PII>"


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "scrubbed_text"
) -> DataFrame:
    """Adds ``n_<class>`` count columns and ``out_col`` with every
    PII class replaced by ``<PII>``, in class order."""
    cur: Column = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, REPLACEMENT)
    return df.select("*", *counts, cur.alias(out_col))
