"""PII scrubbing for training corpora: regex redaction of emails, IPv4
addresses and long digit runs, with per-doc redaction counts.

All pure Column algebra (``regexp_count``/``regexp_replace`` run inside
whole-stage codegen) — at 10^12 rows this is a map-only pass bounded by
scan bandwidth, the same envelope as functions/text_quality.py. Patterns
are written in the RE2-compatible subset (no lookarounds, no backrefs) so
the DuckDB oracle twin uses the byte-identical pattern strings.

The sandbox corpus is synthetic word-salad with no PII, so the operator's
contract harness INJECTS deterministic PII into every third document
(``doc_id % 3 == 0``) before scrubbing — identical injection on both
engines — which exercises both the hit and the clean path at any scale
factor with no external data. Redaction output parity is proven by sha256
of the scrubbed text (never shipping the text itself).

Counts are taken sequentially on the progressively-redacted text, so each
count is exactly the number of substitutions its pass performed (an email's
digits are never double-counted as a long number).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2-safe patterns, shared verbatim with the DuckDB twin
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
LONGNUM_RE = "[0-9]{8,}"

_PASSES = [  # (pattern, replacement, count-column name)
    (EMAIL_RE, "<EMAIL>", "n_email"),
    (IPV4_RE, "<IP>", "n_ipv4"),
    (LONGNUM_RE, "<NUM>", "n_num"),
]


def inject_pii(text: Column, doc_id: Column) -> Column:
    """Deterministic PII appended to every third doc (test harness)."""
    injected = F.concat(
        text,
        F.lit(" contact user"), doc_id.cast("string"),
        F.lit("@example.com from 10.2."),
        (doc_id % 256).cast("string"),
        F.lit(".7 card 4111111111111111"),
    )
    return F.when(doc_id % 3 == 0, injected).otherwise(text)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_num, redacted_sha256)."""
    t = F.col(text_col)
    counts = []
    for pat, repl, name in _PASSES:
        counts.append(F.regexp_count(t, F.lit(pat)).cast("long").alias(name))
        t = F.regexp_replace(t, pat, repl)
    return docs.select(
        "doc_id", *counts, F.sha2(t, 256).alias("redacted_sha256")
    )


def redact_pii_injected(docs: DataFrame) -> DataFrame:
    """Contract entry: inject deterministic PII, then scrub it."""
    return redact_pii(
        docs.select(
            "doc_id", inject_pii(F.col("text"), F.col("doc_id")).alias("text")
        )
    )


def redact_pii_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`redact_pii_injected` (same injection, same
    patterns, same sequential count-then-replace nesting as the Spark
    column expression)."""
    inject = (
        "CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || "
        "doc_id::VARCHAR || '@example.com from 10.2.' || "
        "(doc_id % 256)::VARCHAR || '.7 card 4111111111111111' "
        "ELSE text END"
    )
    exprs = []
    t = "t0"
    for pat, repl, name in _PASSES:
        exprs.append(f"len(regexp_extract_all({t}, '{pat}'))::BIGINT AS {name}")
        t = f"regexp_replace({t}, '{pat}', '{repl}', 'g')"
    return f"""
WITH i AS (SELECT doc_id, {inject} AS t0 FROM {table})
SELECT doc_id, {', '.join(exprs)}, sha256({t}) AS redacted_sha256
FROM i
"""
