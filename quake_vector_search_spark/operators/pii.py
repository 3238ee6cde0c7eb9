"""PII detection and redaction for training-data curation.

A corpus destined for model training has to be scrubbed of obvious
personal identifiers (emails, phone numbers, IP addresses, long
account-number-like digit runs) before anything downstream sees it.
At 100 TB this must be a narrow, single-scan transform: every signal
here is pure Catalyst `regexp_*` expression work — no UDFs, no
shuffle, fully pipelined inside whole-stage codegen, and trivially
parallel at any partition count.

The regex patterns are deliberately restricted to the Java-regex ∩
RE2 portable subset (no backreferences, no lookaround) so the exact
same pattern strings run under Spark (java.util.regex) and DuckDB
(RE2) — which is what lets the registry query hash-match a full
redaction byte-for-byte across engines.

Redaction order is load-bearing: emails first (their local/domain
parts contain digit runs and dots that the IP / id-run patterns could
otherwise bite into), then phones (their digit groups would otherwise
be partially eaten by the id-run rule), then IPs, then bare long
digit runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Portable Java-regex ∩ RE2 patterns (single-quoted into DuckDB SQL
# unchanged — DuckDB standard strings don't process backslashes).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{1,3}[- ]\d{3}[- ]\d{4}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
IDRUN_RE = r"\b\d{9,}\b"

# (pattern, placeholder) in application order — see module docstring.
REDACTION_RULES: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (IPV4_RE, "<IP>"),
    (IDRUN_RE, "<ID>"),
]


def _count(c: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def pii_signals(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts + a boolean curation flag.

    One narrow projection — counts per category, their total, and
    `has_pii` for downstream filtering. No shuffle; the scan this
    feeds from keeps its pushed filters and pruned columns.
    """
    c = F.col(text_col)
    out = (docs
           .withColumn("n_email", _count(c, EMAIL_RE))
           .withColumn("n_phone", _count(c, PHONE_RE))
           .withColumn("n_ip", _count(c, IPV4_RE))
           .withColumn("n_idrun", _count(c, IDRUN_RE)))
    total = (F.col("n_email") + F.col("n_phone")
             + F.col("n_ip") + F.col("n_idrun"))
    return (out.withColumn("pii_total", total)
               .withColumn("has_pii", total > 0))


def redact(docs: DataFrame, id_col: str = "doc_id",
           text_col: str = "text",
           out_col: str = "text_redacted") -> DataFrame:
    """Replace every PII match with its typed placeholder.

    Chained `regexp_replace` (global by construction in Spark; the
    DuckDB twin needs the 'g' flag) in REDACTION_RULES order. Still a
    single narrow projection.
    """
    c: Column = F.col(text_col)
    for pattern, placeholder in REDACTION_RULES:
        c = F.regexp_replace(c, pattern, placeholder)
    return docs.withColumn(out_col, c)


def redact_sql(expr: str) -> str:
    """The DuckDB-side twin of :func:`redact` as a SQL expression over
    ``expr`` — same patterns, same order, global flag."""
    for pattern, placeholder in REDACTION_RULES:
        expr = (f"regexp_replace({expr}, '{pattern}', "
                f"'{placeholder}', 'g')")
    return expr
