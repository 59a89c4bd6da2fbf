"""PII detection and redaction over a document corpus.

Training-data pipelines scrub personally identifiable information
before anything else sees the text (C4 strips lines with bad words;
Dolma/RedPajama-style pipelines regex-redact emails, phone numbers and
IP addresses with typed placeholders — all public recipes).  This is
the Spark-native version: per-document match counts + a redacted text
column, as ONE stateless JVM-side scan projection — no UDFs, no
shuffle, no state; at 100 TB it is a pure map pass that fuses into
whole-stage codegen with whatever scan/filter runs next.

Redaction is SEQUENTIAL (email → IP → phone) and each count is taken
on the text as it stands at that step: the phone pattern could
otherwise bite into dotted IPv4 runs, so ordering makes the output
deterministic and lets an oracle replay it engine-for-engine.  The
patterns stick to character classes + bounded quantifiers (no
lookaround, no backrefs) so Java regex and RE2 agree on every match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# character-class-only patterns, identical semantics in Java regex
# (Spark) and RE2 (DuckDB): no lookaround, no backreferences
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9][0-9()\- .]{7,}[0-9]"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def _scrub_one(text: Column, pattern: str, token: str) -> tuple[Column, Column]:
    return (
        F.regexp_count(text, F.lit(pattern)),
        F.regexp_replace(text, pattern, token),
    )


def pii_scrub(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(doc_id, n_emails, n_ips, n_phones, n_pii, redacted)`` — typed
    placeholder redaction applied email → IP → phone, counts taken on
    the intermediate text at each step (see module docstring for why
    the order is part of the contract)."""
    t0 = F.col(text_col)
    n_email, t1 = _scrub_one(t0, EMAIL_RE, EMAIL_TOKEN)
    n_ip, t2 = _scrub_one(t1, IPV4_RE, IP_TOKEN)
    n_phone, t3 = _scrub_one(t2, PHONE_RE, PHONE_TOKEN)
    return docs.select(
        F.col(id_col),
        n_email.cast("int").alias("n_emails"),
        n_ip.cast("int").alias("n_ips"),
        n_phone.cast("int").alias("n_phones"),
        (n_email + n_ip + n_phone).cast("int").alias("n_pii"),
        t3.alias("redacted"),
    )


def pii_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-row corpus summary: documents with any PII, total hits per
    class — a map-side-combined aggregate over the scrub projection."""
    s = pii_scrub(docs, text_col=text_col, id_col=id_col)
    return s.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_pii") > 0).cast("long")).alias("docs_with_pii"),
        F.sum("n_emails").cast("long").alias("total_emails"),
        F.sum("n_ips").cast("long").alias("total_ips"),
        F.sum("n_phones").cast("long").alias("total_phones"),
    )
