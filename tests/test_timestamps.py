"""Timestamp canonicalization parity with the reference semantics
(``tests/unit_test/utils/timestamp_test.py:14-30``: naive strings are
US/Eastern, canonical form is ISO-8601 UTC with Z)."""
from datetime import datetime, timezone

from data_hub_ejp_xml_pipeline_ray.functions.timestamps import (
    convert_datetime_to_string,
    convert_string_to_datetime,
    format_optional_to_iso_timestamp,
    format_to_iso_timestamp,
    parse_timestamp,
    to_default_tz_display_format,
)


def test_naive_assumed_us_eastern_winter():
    # EST = UTC-5
    assert format_to_iso_timestamp("2020-01-01 12:00:00") == "2020-01-01T17:00:00Z"


def test_naive_assumed_us_eastern_summer():
    # EDT = UTC-4
    assert format_to_iso_timestamp("2020-07-01 12:00:00") == "2020-07-01T16:00:00Z"


def test_timezone_aware_passthrough():
    # reference timestamp.py:11-17: aware inputs are returned UNCHANGED;
    # the original offset is preserved (only +00:00 renders as Z)
    assert (
        format_to_iso_timestamp("2020-01-01T12:00:00+02:00")
        == "2020-01-01T12:00:00+02:00"
    )
    assert format_to_iso_timestamp("2020-01-01T12:00:00+00:00") == "2020-01-01T12:00:00Z"


def test_ambiguous_fall_back_resolves_to_standard_time():
    # 2020-11-01 01:30 happens twice in US/Eastern; pytz localize
    # (is_dst=False, the reference default) picks EST (UTC-5)
    assert format_to_iso_timestamp("2020-11-01 01:30:00") == "2020-11-01T06:30:00Z"


def test_gap_spring_forward_resolves_to_standard_time():
    # 2020-03-08 02:30 does not exist in US/Eastern; is_dst=False reads
    # it as EST (UTC-5)
    assert format_to_iso_timestamp("2020-03-08 02:30:00") == "2020-03-08T07:30:00Z"


def test_parse_returns_utc():
    dt = parse_timestamp("2020-01-01 12:00:00")
    assert dt.tzinfo == timezone.utc


def test_optional_variant():
    assert format_optional_to_iso_timestamp(None) is None
    assert format_optional_to_iso_timestamp("") is None
    assert format_optional_to_iso_timestamp("2020-01-01T00:00:00Z") == "2020-01-01T00:00:00Z"


def test_display_format_round_trip_to_eastern():
    assert to_default_tz_display_format("2020-01-01T17:00:00Z") == "01 Jan 20  12:00:00"


def test_watermark_serde_roundtrip():
    dt = datetime(2021, 3, 4, 5, 6, 7)
    assert convert_string_to_datetime(convert_datetime_to_string(dt)) == dt
