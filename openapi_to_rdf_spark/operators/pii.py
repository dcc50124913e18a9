"""PII detection / redaction / filtering over document corpora — the
compliance pass every LLM training pipeline runs before a corpus ships
(emails, phone numbers, SSNs, IPv4 addresses, card numbers), in the
spirit of the C4/Dolma/RefinedWeb PII scrubbers.

Semantics (pinned for the driver's DuckDB oracles ``pii_report`` /
``pii_redact``):

- Detection is pure regex over the raw text; one count per PII kind per
  document (``regexp_extract_all`` length), ``n_pii`` the sum and
  ``has_pii`` its flag.
- Redaction replaces every match with the kind's ``<TOKEN>``, applied in
  ``REDACT_ORDER`` (most-specific / longest patterns first) so that a
  card number is never half-eaten by the phone pattern.
- Filtering (``pii_filter``) keeps documents whose total hit count is
  ≤ ``max_hits`` (default 0: drop any doc with PII).

The patterns deliberately use only the regex intersection of Java
(Spark's engine) and RE2 (DuckDB's): no backreferences, no lookaround —
both engines then produce identical leftmost-first matches, which is
what makes the DuckDB oracle byte-exact. They are practical scrubbing
patterns, not validators (no Luhn check, no IP octet range check) —
matching what production scrubbers actually deploy at 100 TB, where a
false positive costs a token and a false negative costs an incident.

Scale design: every operator here is a single projection over the corpus
scan — no joins, no shuffles, no Python; `regexp_extract_all` /
`regexp_replace` are JVM codegen expressions, so the whole pass runs
inside WholeStageCodegen at scan speed. The report is a pure map
(per-doc), and the filter is scan + filter: at 10^12 documents this is
the cheapest full-corpus pass in the repo.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Kind -> (pattern, redaction token). Patterns restricted to the
# Java-regex ∩ RE2 dialect (see module docstring).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "card": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

# Redaction applies most-specific first: a 16-digit card would otherwise
# be partially consumed by the phone pattern, and a dotted phone would
# be shadowed by ipv4 if ipv4 ran first.
REDACT_ORDER = ["email", "card", "ssn", "phone", "ipv4"]

REDACT_TOKENS = {kind: f"<{kind.upper()}>" for kind in PII_PATTERNS}


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match-count columns for one text column (all JVM)."""
    return {
        kind: F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        for kind, pat in PII_PATTERNS.items()
    }


def redact_text(col: Column) -> Column:
    """Text with every PII match replaced by its ``<KIND>`` token."""
    out = col
    for kind in REDACT_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind],
                               REDACT_TOKENS[kind])
    return out


def pii_report(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, n_<kind>..., n_pii, has_pii) per document — one codegen
    projection over the corpus scan, no shuffle."""
    counts = pii_counts(F.col(text_col))
    cols = [F.col(id_col)]
    total = None
    for kind in PII_PATTERNS:
        c = counts[kind].cast("long").alias(f"n_{kind}")
        cols.append(c)
        total = c if total is None else total + counts[kind].cast("long")
    return (docs.select(*cols,
                        total.alias("n_pii"))
            .withColumn("has_pii", F.col("n_pii") > 0))


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus with ``text_col`` scrubbed in place (all other columns
    untouched) — the shipping-side transform."""
    return docs.withColumn(text_col, redact_text(F.col(text_col)))


def pii_filter(docs: DataFrame, max_hits: int = 0,
               text_col: str = "text") -> DataFrame:
    """Documents whose total PII hit count is ≤ ``max_hits`` — scan +
    filter, the drop-don't-scrub policy variant."""
    counts = pii_counts(F.col(text_col))
    total = None
    for kind in PII_PATTERNS:
        c = counts[kind].cast("long")
        total = c if total is None else total + c
    return docs.filter(total <= max_hits)


def oracle_count_sql(text_expr: str) -> dict[str, str]:
    """DuckDB expressions mirroring :func:`pii_counts` for the driver
    oracle — same patterns, same engine-intersection dialect."""
    return {
        kind: f"len(regexp_extract_all({text_expr}, '{pat}'))"
        for kind, pat in PII_PATTERNS.items()
    }


def oracle_redact_sql(text_expr: str) -> str:
    """DuckDB expression mirroring :func:`redact_text` (global flag —
    Spark's regexp_replace is global by default, DuckDB's is not)."""
    out = text_expr
    for kind in REDACT_ORDER:
        out = (f"regexp_replace({out}, '{PII_PATTERNS[kind]}', "
               f"'{REDACT_TOKENS[kind]}', 'g')")
    return out
