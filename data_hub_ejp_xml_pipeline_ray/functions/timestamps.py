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

from datetime import datetime, timezone
from zoneinfo import ZoneInfo

from dateutil import parser as date_parser

DEFAULT_TIMEZONE = ZoneInfo("America/New_York")  # reference: US/Eastern

#: Watermark serialization format (reference ``timestamp.py:40-51``).
WATERMARK_FORMAT = "%Y-%m-%d %H:%M:%S"

#: Human display format (reference ``timestamp.py:34-37``).
DISPLAY_FORMAT = "%d %b %y  %H:%M:%S"


def parse_timestamp(timestamp_str: str) -> datetime:
    """Parse a timestamp string; naive values are assumed US/Eastern and
    converted to UTC (reference ``timestamp.py:11-17``)."""
    parsed = date_parser.parse(timestamp_str)
    if parsed.tzinfo is None:
        parsed = parsed.replace(tzinfo=DEFAULT_TIMEZONE)
    return parsed.astimezone(timezone.utc)


def format_to_iso_timestamp(timestamp_str: str) -> str:
    """Canonical ISO-8601 UTC form with ``Z`` suffix
    (reference ``timestamp.py:28-31``)."""
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
