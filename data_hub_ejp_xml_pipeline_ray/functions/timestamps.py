"""Timestamp canonicalization (reference
``ejp_xml_pipeline/utils/xml_transform_util/timestamp.py``).

The reference parses arbitrary timestamp strings with dateutil, assumes
naive values are US/Eastern, converts to UTC (``timestamp.py:11-17``)
and formats as ISO-8601 with a ``Z`` suffix (``timestamp.py:28-31``).
These functions reproduce those exact semantics for event/lineage
metadata; merged data columns carry Arrow ``timestamp[us, UTC]`` and
never round-trip through strings.
"""
from __future__ import annotations

from datetime import datetime, timedelta, timezone
from zoneinfo import ZoneInfo

from dateutil import parser as date_parser

DEFAULT_TIMEZONE = ZoneInfo("America/New_York")  # reference: US/Eastern

#: Watermark serialization format (reference ``timestamp.py:40-51``).
WATERMARK_FORMAT = "%Y-%m-%d %H:%M:%S"

#: Human display format (reference ``timestamp.py:34-37``).
DISPLAY_FORMAT = "%d %b %y  %H:%M:%S"


def _localize_default_tz(naive: datetime) -> datetime:
    """Attach US/Eastern with pytz ``localize(is_dst=False)`` semantics
    (reference ``timestamp.py:14-16``): ambiguous fall-back times and
    spring-forward gap times both resolve to STANDARD time (EST). With
    zoneinfo that means fold=1 for ambiguous times and fold=0 for gap
    times — so prefer whichever fold yields ``dst() == 0``."""
    dt0 = naive.replace(tzinfo=DEFAULT_TIMEZONE, fold=0)
    if dt0.dst() != timedelta(0):
        dt1 = naive.replace(tzinfo=DEFAULT_TIMEZONE, fold=1)
        if dt1.dst() == timedelta(0):
            return dt1  # ambiguous: second (standard-time) occurrence
    return dt0


def parse_timestamp(timestamp_str: str) -> datetime:
    """Parse a timestamp string. Reference parity (``timestamp.py:11-17``):
    tz-AWARE inputs are returned unchanged (their original offset is
    preserved — ``format_to_iso_timestamp`` keeps it rather than
    normalizing to Z); NAIVE inputs are assumed US/Eastern
    (standard-time resolution for ambiguous/gap instants, matching pytz
    ``localize(is_dst=False)``) and converted to UTC."""
    parsed = date_parser.parse(timestamp_str)
    if parsed.tzinfo is None:
        return _localize_default_tz(parsed).astimezone(timezone.utc)
    return parsed


def format_to_iso_timestamp(timestamp_str: str) -> str:
    """ISO-8601 form with ``Z`` for UTC (reference ``timestamp.py:28-31``).
    Aware inputs keep their ORIGINAL offset (only a ``+00:00`` offset
    renders as ``Z``); naive inputs come out as UTC ``Z``."""
    return parse_timestamp(timestamp_str).isoformat().replace("+00:00", "Z")


def format_optional_to_iso_timestamp(timestamp_str: str | None) -> str | None:
    """Empty/None-safe variant (reference ``extract.py:14-15``)."""
    if not timestamp_str:
        return None
    return format_to_iso_timestamp(timestamp_str)


def datetime_to_iso(dt: datetime) -> str:
    """A datetime (aware or naive-UTC) to the canonical ``Z`` form."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc).isoformat().replace("+00:00", "Z")


def to_default_tz_display_format(timestamp_str: str) -> str:
    """UTC -> US/Eastern display string (reference ``timestamp.py:34-37``)."""
    return parse_timestamp(timestamp_str).astimezone(DEFAULT_TIMEZONE).strftime(
        DISPLAY_FORMAT
    )


def convert_datetime_to_string(dt: datetime) -> str:
    """Watermark serialization (reference ``timestamp.py:40-45``)."""
    return dt.strftime(WATERMARK_FORMAT)


def convert_string_to_datetime(value: str) -> datetime:
    """Watermark deserialization (reference ``timestamp.py:48-51``)."""
    return datetime.strptime(value, WATERMARK_FORMAT)
