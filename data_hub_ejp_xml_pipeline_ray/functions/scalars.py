"""Scalar derivation functions (reference §2.3: to_bool/to_int, id
derivation, lineage keys). Pure functions used inside ``map_batches``
bodies and in driver-side config/lineage handling.
"""
from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Casts (reference ejp_manuscript_xml.py:59-68,336-343)
# ---------------------------------------------------------------------------

def to_bool(value: str | None) -> bool | None:
    """'true'/'false' (case-insensitive) -> bool, else None."""
    if value is None:
        return None
    lowered = value.lower()
    if lowered == "true":
        return True
    if lowered == "false":
        return False
    return None


def parse_yes_no(value: str | None) -> bool | None:
    """'yes'/'no' (case-insensitive) -> bool, else None."""
    if value is None:
        return None
    lowered = value.lower()
    if lowered == "yes":
        return True
    if lowered == "no":
        return False
    return None


def to_int(value: str | None) -> int | None:
    """int, or None on empty/None (reference ``to_int``)."""
    if value is None or value == "":
        return None
    return int(value)


# ---------------------------------------------------------------------------
# Key derivation (reference ejp_manuscript_xml.py:56,71-89,425-431;
# ejp_person_xml.py:142-151; ejp_zip.py:48-49)
# ---------------------------------------------------------------------------

#: Analog of the manuscript-number id regex (``.*e[Ll]ife.*-(\d{5,6})``):
#: extract the numeric site id from a crawl url, fall back to the full
#: value when the pattern misses.
_URL_ID_PATTERN = re.compile(r".*//site-(\d+)\.[^/]*/.*")

NOT_ACCEPTABLE_SENTINEL = "NotAcceptable"


def url_to_site_id(url: str) -> str:
    """Derive the canonical site id from a url; full url when the pattern
    does not match; rejects blank input (mirrors
    ``manuscript_number_to_manuscript_id``, ``ejp_manuscript_xml.py:71-85``)."""
    if not url:
        raise ValueError("url must not be blank")
    m = _URL_ID_PATTERN.match(url)
    return m.group(1) if m else url


def path_to_page_name(path: str) -> str:
    """Basename sans extension (mirrors ``filename_to_manuscript_number``)."""
    base = path.rsplit("/", 1)[-1]
    return base.rsplit(".", 1)[0] if "." in base else base


def derive_version_id(url: str, iso_timestamp: str | None) -> str:
    """``f'{url}/{ts}'`` with a sentinel when no timestamp exists (mirrors
    ``derive_version_id_from_manuscript_id_and_created_timestamp``,
    ``ejp_manuscript_xml.py:425-431``)."""
    if not iso_timestamp:
        return f"{NOT_ACCEPTABLE_SENTINEL} no timestamp for {url}"
    return f"{url}/{iso_timestamp}"


_GENERATED_PREFIX = "generated-"


def generate_surrogate_id(source_name: str, index: int) -> str:
    """Deterministic surrogate key for records arriving without one
    (mirrors ``generate_person_id``, ``ejp_person_xml.py:142-147``)."""
    return f"{_GENERATED_PREFIX}{source_name}-{index}"


def is_generated_id(record_id: str | None) -> bool:
    return bool(record_id) and record_id.startswith(_GENERATED_PREFIX)


def join_segment_and_url(segment_name: str, url: str) -> str:
    """Lineage key ``'{segment}/{url}'`` (mirrors
    ``join_zip_and_xml_filename``, ``ejp_zip.py:48-49``)."""
    return f"{segment_name}/{url}"


def split_prefixed_kind(full_kind: str, prefix: str = "Initial Submission:") -> tuple[str, str]:
    """Split ``'<overall>:<specific>'`` kinds (mirrors
    ``overall_stage_and_manuscript_type_from_full_manuscript_type``,
    ``ejp_manuscript_xml.py:219-229``): returns (overall_stage, kind)."""
    if full_kind.startswith(prefix):
        return "Initial Submission", full_kind[len(prefix):].strip()
    return "Full Submission", full_kind.strip()


def truncate_run_id(run_id: str, limit: int = 250) -> str:
    """Mirror of the reference's ``run_id[:250]`` truncation
    (``data_pipeline_dag_utils.py:69-71``)."""
    return run_id[:limit]
