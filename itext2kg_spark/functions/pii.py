"""PII detection and redaction over a documents table — pure Catalyst.

The standard pre-release scrubbing pass of a web-text pipeline (C4 and
most open corpora strip emails/IPs/phone-like spans before publishing).
Three pattern families, all RE2-compatible (no lookahead/backreference),
so the DuckDB oracle executes the IDENTICAL patterns and — verified by an
in-repo parity test over adversarial strings — Java regex and RE2 agree
on every match boundary these patterns can produce:

- EMAIL: user@host.tld with a 2+ letter TLD (rejects 'a@b.c' single-letter
  TLDs and '@@').
- IPV4: four dotted 1-3 digit octets, word-bounded. No range check
  (999.999.999.999 matches) — it's a scrubber, over-redaction is the safe
  direction.
- PHONE: digit-bracketed runs of 8+ phone characters (digits, space,
  (), . or -). This deliberately also matches dotted IPs — redaction
  applies EMAIL -> IPV4 -> PHONE in that fixed order, so IPs are already
  tokenized away before the phone pass runs; detection counts are
  per-pattern over the RAW text and may overlap.

Counts are emitted alongside the redacted text so a pipeline can filter
on PII density (drop documents over a threshold) or just keep the
scrubbed column. Everything is a single codegen projection: no shuffle,
no UDF, scale-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9][0-9()\s.-]{6,}[0-9]"

# (pattern, replacement) in application order — order matters where the
# families overlap (see module docstring).
_REDACTIONS = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def _count(text, pattern: str):
    return F.size(F.regexp_extract_all(text, F.lit(f"({pattern})"), 1))


def redacted_col(text):
    """The text with EMAIL -> IPV4 -> PHONE spans replaced by tokens."""
    out = text
    for pattern, token in _REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_scrub(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """doc_id, n_emails, n_ips, n_phones, redacted."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        _count(t, EMAIL_RE).cast("long").alias("n_emails"),
        _count(t, IPV4_RE).cast("long").alias("n_ips"),
        _count(t, PHONE_RE).cast("long").alias("n_phones"),
        redacted_col(t).alias("redacted"),
    )
