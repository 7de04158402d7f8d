"""PII redaction over the documents table — the RefinedWeb/FineWeb-class
scrub (Penedo et al. 2023/2024): emails, phone numbers, and IP literals are
replaced with typed placeholder tokens before a corpus ships.

Scale design: map-only Catalyst — a regexp_count + regexp_replace chain over
the text column, no UDF, no shuffle (besides the canonical sort); it composes
with sample/clean/filter upstream without a materialization barrier.

Every pattern is written in the common Java-regex/RE2 subset (explicit ASCII
classes, no lookaround, no backreferences, \\b only between ASCII word chars
— identical in both engines), so the DuckDB oracle is exact; the adversarial
cross-engine corpus (tests/test_filter_family_cross_engine.py) probes
unicode, RTL, and metacharacter text through both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from docling_core_spark.operators.canon import canonical_order

# Redaction order is email -> ip -> phone.  Counts are taken on the
# ORIGINAL text, per category, independently: when one pattern nests inside
# another (an email like x@1.2.3.4.com embeds a dotted quad; a phone-shaped
# local part embeds a phone), n_ips/n_phones can count matches whose text
# was already consumed by the earlier email replacement — the counts answer
# "how many pattern hits existed in the input", not "how many tokens were
# emitted".  Both engines compute counts the same way, so oracle parity
# holds either way; this is the documented contract.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"
PHONE_RE = r"(\+[0-9]{1,2}[ -])?(\([0-9]{3}\)[ -]?|[0-9]{3}[ -])[0-9]{3}[ -][0-9]{4}"

EMAIL_TOKEN = "[EMAIL]"
IP_TOKEN = "[IP]"
PHONE_TOKEN = "[PHONE]"


def pii_redact(docs: DataFrame, canonical=None, passthrough=()) -> DataFrame:
    """(doc_id, redacted_text, n_emails, n_ips, n_phones, any_pii).

    Counts are per-category non-overlapping match counts on the original
    text; redacted_text applies the three replacements in a fixed order.
    """
    text = F.col("text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN), IP_RE, IP_TOKEN
        ),
        PHONE_RE,
        PHONE_TOKEN,
    )
    n_emails = F.regexp_count(text, F.lit(EMAIL_RE)).cast("long")
    n_ips = F.regexp_count(text, F.lit(IP_RE)).cast("long")
    n_phones = F.regexp_count(text, F.lit(PHONE_RE)).cast("long")
    return docs.select(
        "doc_id",
        *passthrough,
        redacted.alias("redacted_text"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
        ((n_emails + n_ips + n_phones) > 0).alias("any_pii"),
    ).transform(lambda d: canonical_order(d, "doc_id", canonical=canonical))


def _sql_quote(pattern: str) -> str:
    return pattern.replace("'", "''")


def pii_redact_sql(table: str = "documents") -> str:
    """DuckDB oracle SQL for pii_redact (same patterns, order, tokens)."""
    email, ip, phone = _sql_quote(EMAIL_RE), _sql_quote(IP_RE), _sql_quote(PHONE_RE)
    redacted = (
        f"regexp_replace(regexp_replace(regexp_replace(text,"
        f" '{email}', '{EMAIL_TOKEN}', 'g'),"
        f" '{ip}', '{IP_TOKEN}', 'g'),"
        f" '{phone}', '{PHONE_TOKEN}', 'g')"
    )
    return f"""
SELECT doc_id,
       {redacted} AS redacted_text,
       CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{ip}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{phone}')) AS BIGINT) AS n_phones,
       (len(regexp_extract_all(text, '{email}'))
        + len(regexp_extract_all(text, '{ip}'))
        + len(regexp_extract_all(text, '{phone}'))) > 0 AS any_pii
FROM {table}
ORDER BY doc_id
"""


def pii_demo_docs(docs: DataFrame) -> DataFrame:
    """Deterministic PII-bearing variant of the documents table (the raw
    synthetic corpus contains no PII — a redactor run on it alone would be
    green-but-vacuous).  Both engines express the same concat/CASE."""
    sid = F.col("doc_id").cast("string")
    base = F.col("text")
    with_email = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(base, F.lit(" contact user"), sid, F.lit("@example.com")),
    ).otherwise(base)
    with_phone = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(with_email, F.lit(" call +1 555-123-4567 now")),
    ).otherwise(with_email)
    with_alt_phone = F.when(
        F.col("doc_id") % 6 == 0,
        F.concat(with_phone, F.lit(" fax (555) 987-6543")),
    ).otherwise(with_phone)
    with_ip = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(with_alt_phone, F.lit(" from host 93.184.216.34 tail")),
    ).otherwise(with_alt_phone)
    return docs.select("doc_id", with_ip.alias("text"))


def pii_demo_docs_sql(table: str = "documents") -> str:
    """The pii_demo_docs transformation as a DuckDB CTE body."""
    return f"""
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN t3 || ' from host 93.184.216.34 tail' ELSE t3 END AS text
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 6 = 0 THEN t2 || ' fax (555) 987-6543' ELSE t2 END AS t3
    FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0 THEN t1 || ' call +1 555-123-4567 now' ELSE t1 END AS t2
      FROM (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || doc_id || '@example.com' ELSE text END AS t1
        FROM {table}
      )
    )
  )
"""
