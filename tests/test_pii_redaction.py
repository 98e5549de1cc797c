"""PII scrubbing: typed placeholders, clean text untouched, pure map-only
plan (no shuffle, no Python)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nursing_home_data_etl_pipeline_spark.functions.text import (
    pii_hit_count,
    redact_pii,
)


@pytest.fixture(scope="module")
def redacted(spark):
    rows = [
        (0, "contact jane.doe+test@example.co.uk for details"),
        (1, "card 4111 1111 1111 1111 on file"),
        (2, "ssn 123-45-6789 leaked"),
        (3, "call +1 (555) 123-4567 or 555-123-4567"),
        (4, "server at 192.168.0.1 responded"),
        (5, "perfectly clean prose with numbers like 42 and 1998"),
        (6, ""),
        (7, "host 192.168.100.200 pinged"),  # 3-digit octets: IP, not phone
        (8, "sku 202#555#0143 and code 123*456*7890 kept"),  # not separators
    ]
    df = spark.createDataFrame(rows, "id long, text string").select(
        "id",
        redact_pii(F.col("text")).alias("red"),
        pii_hit_count(F.col("text")).alias("hits"),
    )
    return {r.id: (r.red, r.hits) for r in df.collect()}


def test_email(redacted):
    assert redacted[0] == ("contact <EMAIL> for details", 1)


def test_card_number(redacted):
    assert redacted[1] == ("card <CARD> on file", 1)


def test_ssn(redacted):
    assert redacted[2] == ("ssn <SSN> leaked", 1)


def test_phones_both_styles(redacted):
    red, hits = redacted[3]
    assert "<PHONE>" in red and "555" not in red
    assert hits == 2


def test_ipv4(redacted):
    assert redacted[4] == ("server at <IP> responded", 1)


def test_clean_text_untouched(redacted):
    assert redacted[5] == (
        "perfectly clean prose with numbers like 42 and 1998",
        0,
    )
    assert redacted[6] == ("", 0)


def test_ip_with_3digit_octets_not_mislabeled_phone(redacted):
    assert redacted[7] == ("host <IP> pinged", 1)


def test_punct_separated_codes_not_redacted(redacted):
    # '#' and '*' sat inside the 0x20-0x2E range of the old [ -.] class;
    # dashes must lead the class or arbitrary punctuation joins numbers.
    assert redacted[8] == ("sku 202#555#0143 and code 123*456*7890 kept", 0)


def test_map_only_plan(spark):
    df = spark.range(10).select(
        redact_pii(F.concat(F.lit("a@b.co x"), F.col("id"))).alias("r")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan  # no Python


def test_ssn_adjacent_digits_not_swallowed_as_card(spark):
    """SSN runs before CARD: the card pattern tolerates single space/dash
    separators, so it used to span '123-45-6789 2024' as one 13-digit
    <CARD> — mistyping the SSN and destroying the non-PII year."""
    from nursing_home_data_etl_pipeline_spark.functions.text import redact_pii

    row = spark.createDataFrame(
        [("SSN 123-45-6789 2024",)], ["text"]
    ).select(redact_pii(F.col("text")).alias("red")).collect()[0]
    assert row.red == "SSN <SSN> 2024"
