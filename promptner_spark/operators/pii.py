"""PII scrubbing — redact emails, IPv4 addresses and phone numbers
from document text before it ships as training data (the C4 /
BigCode-style pre-training hygiene pass).

Reference scope: the reference (a pandas NER harness) has no PII
surface — this belongs to the LLM-training-data operator family this
build adds on top of the ported surface (SURVEY.md §2.10), exercised
as `q_pii_scrub` with a full DuckDB value-exact oracle.

Scale shape (the 100 TB lens): every expression here is a pure
`regexp_count` / `regexp_replace` composition — JVM-side, codegen'd
inside the parquet scan stage, zero Python per row and ZERO shuffles.
At corpus scale the cost is one streaming regex pass per document,
which is the floor for any verbatim-pattern redaction scheme.

Cross-engine portability: the patterns avoid every construct where
Java's backtracking engine and DuckDB's RE2 could disagree — no
backreferences, no lookaround, no possessive quantifiers; just
character classes and bounded repetition, where leftmost non-
overlapping scan semantics are identical. The DuckDB mirrors
(`duckdb_*_sql`) render the SAME pattern strings so the oracle
hash-gate pins equivalence on real data.

Redaction order is part of the semantics and is identical in both
engines: emails first (an email whose domain is a dotted quad would
otherwise leave its local part orphaned next to an ``<IP>`` token),
then IPv4, then phones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: (kind, pattern, replacement) in redaction order. Patterns are
#: valid and equivalent under both java.util.regex and RE2.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+-]+@(?:[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
     r"|\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d ()-]{6,}\d", "<PHONE>"),
]


def pii_counts(text: Column) -> list[tuple[str, Column]]:
    """[(kind, count-column)] — non-overlapping match counts per kind,
    evaluated on the ORIGINAL text (before any redaction)."""
    return [(kind, F.regexp_count(text, F.lit(pat)))
            for kind, pat, _ in PII_PATTERNS]


def scrub_text(text: Column) -> Column:
    """The redacted text: all three patterns replaced by their
    placeholder tokens, applied in PII_PATTERNS order."""
    out = text
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def scrub_pii(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(id_col, text_col, n_email, n_ipv4, n_phone): redacted text
    plus the per-kind match counts a pipeline audits (and alerts on)
    before shipping a shard — column names preserved so stages chain.
    Map-only; pipelines inside the scan stage."""
    t = F.col(text_col)
    cols = [F.col(id_col), scrub_text(t).alias(text_col)]
    cols += [c.cast("long").alias(f"n_{kind}")
             for kind, c in pii_counts(t)]
    return docs.select(*cols)


# ------------------------------------------------------ DuckDB mirrors

def _sql_quote(pat: str) -> str:
    return "'" + pat.replace("'", "''") + "'"


def duckdb_scrub_sql(expr: str) -> str:
    """DuckDB rendering of :func:`scrub_text` over ``expr``."""
    out = expr
    for _, pat, rep in PII_PATTERNS:
        out = (f"regexp_replace({out}, {_sql_quote(pat)}, "
               f"'{rep}', 'g')")
    return out


def duckdb_count_sql(expr: str, kind: str) -> str:
    """DuckDB rendering of one :func:`pii_counts` column."""
    pat = next(p for k, p, _ in PII_PATTERNS if k == kind)
    return (f"CAST(len(regexp_extract_all({expr}, {_sql_quote(pat)})) "
            f"AS BIGINT)")


__all__ = ["PII_PATTERNS", "pii_counts", "scrub_text", "scrub_pii",
           "duckdb_scrub_sql", "duckdb_count_sql"]
