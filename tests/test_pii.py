"""PII scrub operator (operators/pii.py): crafted-fixture oracles —
known counts per class, progressive-order non-overlap, idempotence,
and a clean pass over the (PII-free) gate corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.pii import scrub_pii


def _scrub_one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return scrub_pii(df).collect()[0]


def test_counts_and_redaction_per_class(spark):
    r = _scrub_one(
        spark,
        "mail alice@example.com or bob.smith+tag@sub.domain.org, "
        "host 192.168.0.1, call +1 (555) 123-4567 or 020-7946-0958.",
    )
    assert (r.n_email, r.n_ip, r.n_phone) == (2, 1, 2)
    assert r.has_pii is True
    assert "<EMAIL>" in r.redacted_text and "<IP>" in r.redacted_text
    assert "example.com" not in r.redacted_text
    assert "192.168.0.1" not in r.redacted_text
    assert "123-4567" not in r.redacted_text


def test_email_digits_not_double_counted_as_phone(spark):
    # the local part is a 10-digit run — phone must NOT see it, because
    # counting happens on the email-redacted text
    r = _scrub_one(spark, "contact 0123456789@example.com today")
    assert (r.n_email, r.n_phone) == (1, 0)


def test_ip_not_counted_as_phone(spark):
    r = _scrub_one(spark, "server at 10.20.30.40 responded")
    assert (r.n_ip, r.n_phone) == (1, 0)


def test_ordinary_numeric_text_is_not_phone(spark):
    # year ranges (8 digits) and formatted amounts (dot-split runs) must
    # survive: the phone pattern needs >= 9 digits in one dotless run
    r = _scrub_one(spark, "revenue was 1 000 000.00 over 2020-2021 (see p. 12)")
    assert r.n_phone == 0 and r.has_pii is False
    assert r.redacted_text == r.text


def test_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "alice@example.com from 10.0.0.1 dials 555-123-4567")],
        "doc_id long, text string",
    )
    once = scrub_pii(df).select(
        F.col("redacted_text").alias("text")
    )
    twice = scrub_pii(once).collect()[0]
    assert (twice.n_email, twice.n_ip, twice.n_phone) == (0, 0, 0)
    assert twice.has_pii is False
    assert twice.redacted_text == twice.text


def test_clean_text_unchanged(spark, sf_dir):
    from jobcan_data_integrator_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = scrub_pii(docs)
    assert out.filter(F.col("has_pii")).count() == 0
    assert out.filter(F.col("redacted_text") != F.col("text")).count() == 0


def test_plan_is_narrow(spark, sf_dir):
    from jobcan_data_integrator_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = scrub_pii(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one scan, zero shuffle
