"""PII detection and redaction for training corpora.

A training-data pipeline scrubs personally identifiable information
before packing shards (the C4/Dolma-style cleanup stage).  Three
pattern families — emails, IPv4 addresses, phone-like digit runs — as
narrow per-row ``regexp`` projections: zero shuffle, whole-stage
codegen, linear in corpus size, so the pass costs one scan at any
scale.

Counting and redaction walk the SAME progressive order (email → ip →
phone, each counted on the text with the previous classes already
redacted) so a digit run inside an email's local part is never
double-reported as a phone number.  Redaction is idempotent: the
placeholder tokens contain no digits or ``@``, so re-running the pass
is a no-op (pinned in tests).

The synthetic gate corpus contains no PII (letters-only tokens), so
this operator is evidenced by crafted-fixture pytest oracles rather
than a driver gate — a zero-signal corpus would prove only that both
engines agree on "no match".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: redaction order matters: emails first (their local parts can contain
#: phone-like digit runs), then IPv4 (dotted digit runs a phone pattern
#: would otherwise swallow), then bare phone-like runs.
#:
#: The phone pattern requires AT LEAST 9 DIGITS within the run (the
#: lookahead counts digits separated only by run characters) and
#: excludes '.' from the separator set — otherwise ordinary numeric
#: text is destroyed corpus-wide: a year range "2020-2021" (8 digits)
#: or a formatted amount "1 000 000.00" (the '.' splits the run to 7
#: digits) must NOT be redacted.  Dotted European phone formats are the
#: accepted miss; long separator-free IDs (13 digits) are the accepted
#: hit — standard scrubber trade-offs.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "phone": (r"\+?(?=(?:[ ()-]*\d){9})\d[\d ()-]{6,18}\d", "<PHONE>"),
}


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``docs`` plus per-class match counts, a ``has_pii`` flag, and the
    fully-redacted ``redacted_text`` — one narrow projection.

    Columns added: ``n_email``, ``n_ip``, ``n_phone`` (ints, counted on
    the progressively-redacted text so classes never overlap),
    ``has_pii`` (any count > 0), ``redacted_text``.
    """
    stage = F.col(text_col)
    counts = {}
    for name, (pattern, token) in PII_PATTERNS.items():
        counts[name] = F.regexp_count(stage, F.lit(pattern))
        stage = F.regexp_replace(stage, pattern, token)
    out = docs
    for name in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", counts[name])
    any_pii = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}") > 0
        any_pii = c if any_pii is None else (any_pii | c)
    return out.withColumn("has_pii", any_pii).withColumn("redacted_text", stage)
