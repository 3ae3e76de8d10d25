"""Golden-format unit tests pinning the reference formatter contracts
(FIXTURES.md §B4; report_generator.py:12-41 'LOCKED' semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark.functions import formatters as fmt


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _apply(spark, fn, raw):
    df = spark.createDataFrame([(raw,)], "v string")
    return df.select(fn(F.col("v")).alias("out")).collect()[0]["out"]


def test_currency_golden(spark):
    cases = {
        "1500": "$1,500",
        "1500.5": "$1,500.50",
        "49.9": "$49.90",
        "0": "$0",
        "abc": "",
        None: "",
        "1234567.89": "$1,234,567.89",
    }
    for raw, want in cases.items():
        assert _apply(spark, fmt.format_currency, raw) == want, raw


def test_percent_golden_truncates(spark):
    cases = {"1500": "1500%", "50": "50%", "49.9": "49%", "0": "0%", "abc": "", None: ""}
    for raw, want in cases.items():
        assert _apply(spark, fmt.format_percent, raw) == want, raw


def test_date_golden_and_fallback(spark):
    assert _apply(spark, fmt.format_long_date, "2025-12-10") == "December 10, 2025"
    # malformed input falls back to the parameterized date, not wall clock
    out = _apply(
        spark, lambda c: fmt.format_long_date(c, F.to_date(F.lit("2024-02-29"))), "garbage"
    )
    assert out == "February 29, 2024"


def test_safe_name_and_filename(spark):
    assert _apply(spark, fmt.safe_name, "John Doe/Jr") == "John_Doe_Jr"
    assert (
        _apply(spark, fmt.letter_filename, "John Doe")
        == "Engagement_Letter_John_Doe.pdf"
    )


def test_clean_scraped_text_nbsp(spark):
    # leading NBSP must become strippable whitespace (crs_ui_bot.py:223)
    assert _apply(spark, fmt.clean_scraped_text, "  12-034 56 ") == "12-034 56"


def test_digits_only_and_try_cast(spark):
    assert _apply(spark, fmt.digits_only, "a1b2.5c%") == "12.5"
    assert _apply(spark, fmt.to_number_safe, "12.5") == 12.5
    assert _apply(spark, fmt.to_number_safe, "nope") is None


def test_split_extract_last(spark):
    assert _apply(spark, fmt.split_extract_last, "Parcel ID: 069-123  ") == "069-123"
