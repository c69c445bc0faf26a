"""PII screening/redaction and Gopher-style repetition signals."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_to_s3_spark.operators.text import pii_counts, redact_pii, repetition_stats


def _one(spark, text, cols):
    df = spark.createDataFrame([(text,)], "text: string")
    return df.select(*[c.alias(n) for n, c in cols(F.col("text")).items()]).first()


def test_pii_counts(spark):
    r = _one(
        spark,
        "mail a@b.co and x.y+z@host.example.com, call +1 (555) 123-4567, "
        "host 10.0.0.1, ssn 123-45-6789",
        pii_counts,
    )
    assert r.n_email == 2
    # screening counts overlap by design: the SSN also matches the looser
    # phone shape (redact_pii's ordering is what resolves precedence)
    assert r.n_phone == 2
    assert r.n_ipv4 == 1
    assert r.n_ssn == 1


def test_pii_counts_clean_text_zero(spark):
    r = _one(spark, "no personal data in this perfectly ordinary sentence", pii_counts)
    assert (r.n_email, r.n_phone, r.n_ipv4, r.n_ssn) == (0, 0, 0, 0)


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [("contact a@b.co or 10.0.0.1 now",)], "text: string"
    )
    out = df.select(redact_pii(F.col("text")).alias("t")).first().t
    assert out == "contact <PII> or <PII> now"
    assert "@" not in out and "10.0" not in out


def test_redaction_order_email_before_phone(spark):
    # digits inside an email must be consumed by the email pattern, not
    # left half-eaten by the phone pattern
    df = spark.createDataFrame([("reach me: user12345678@host.com",)], "text: string")
    out = df.select(redact_pii(F.col("text")).alias("t")).first().t
    assert out == "reach me: <PII>"


def test_repetition_stats(spark):
    r = _one(spark, "spam spam spam spam", repetition_stats)
    assert r.dup_word_frac == 0.75  # 1 distinct of 4
    assert r.top_bigram_frac == 1.0  # "spam spam" is every bigram
    r2 = _one(spark, "all words here are unique tokens", repetition_stats)
    assert r2.dup_word_frac == 0.0
    assert round(r2.top_bigram_frac, 2) == 0.2  # 1 of 5 bigrams


def test_repetition_stats_degenerate(spark):
    assert _one(spark, "", repetition_stats).dup_word_frac == 0.0
    one = _one(spark, "word", repetition_stats)
    assert one.dup_word_frac == 0.0 and one.top_bigram_frac == 0.0
