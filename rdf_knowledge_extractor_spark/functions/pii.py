"""PII detection and redaction over a text column.

Training-data hygiene sibling of operators/decontam.py (outside the
reference's small-KG scope — /root/reference/README.md — added for the
100-TB corpus pipeline): count and mask e-mail addresses, IPv4
addresses and US-style phone numbers before a corpus ships.

Pure Catalyst — `regexp_count` / `regexp_replace` run JVM-side inside
whole-stage codegen, so the scrub is a zero-shuffle map over the scan
at any scale.  The patterns deliberately use only the regex subset
with identical semantics in Java (Spark) and RE2 (DuckDB oracle): no
lookaround, no backreferences.

Counting and redaction semantics:

- counts are computed INDEPENDENTLY per type on the original text, so
  a string matching two patterns (an IPv4 inside an e-mail's domain)
  counts under both — counts answer "how many of each did we see",
  not "how many replacements happened";
- redaction is SEQUENTIAL in PII_TYPES order (email → ipv4 → phone):
  an e-mail is masked whole before the IP pattern can see its domain,
  so `user@10.0.0.1` becomes `<EMAIL>`, not `<EMAIL-with-<IPV4>>`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: type -> (pattern, replacement token), in redaction order.
PII_TYPES: dict[str, tuple[str, str]] = {
    "email": (r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
}


def pii_count(text: Column, pii_type: str) -> Column:
    """Number of `pii_type` matches in `text` (0 for no match; NULL
    propagates for NULL text)."""
    pattern, _ = PII_TYPES[pii_type]
    return F.regexp_count(text, F.lit(pattern))


def redact_pii(text: Column) -> Column:
    """`text` with every PII match replaced by its type token, applied
    sequentially in PII_TYPES order (see module docstring)."""
    out = text
    for pattern, token in PII_TYPES.values():
        out = F.regexp_replace(out, pattern, token)
    return out


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds `n_<type>` count columns per PII type plus a `redacted`
    column; original columns pass through unchanged."""
    out = df
    for t in PII_TYPES:
        out = out.withColumn(f"n_{t}", pii_count(F.col(text_col), t))
    return out.withColumn("redacted", redact_pii(F.col(text_col)))
