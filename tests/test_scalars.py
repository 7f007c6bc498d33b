from data_hub_ejp_xml_pipeline_ray.functions.scalars import (
    derive_version_id,
    generate_surrogate_id,
    is_generated_id,
    join_segment_and_url,
    parse_yes_no,
    path_to_page_name,
    split_prefixed_kind,
    to_bool,
    to_int,
    truncate_run_id,
    url_to_site_id,
)
import pytest


def test_to_bool():
    assert to_bool("true") is True
    assert to_bool("FALSE") is False
    assert to_bool("maybe") is None
    assert to_bool(None) is None


def test_parse_yes_no():
    assert parse_yes_no("Yes") is True
    assert parse_yes_no("no") is False
    assert parse_yes_no("") is None


def test_to_int():
    assert to_int("42") == 42
    assert to_int("") is None
    assert to_int(None) is None


def test_url_to_site_id_pattern_and_fallback():
    assert url_to_site_id("https://site-123.example/p/0001") == "123"
    assert url_to_site_id("https://other.example/x") == "https://other.example/x"
    with pytest.raises(ValueError):
        url_to_site_id("")


def test_path_to_page_name():
    assert path_to_page_name("/a/b/page-7.parquet") == "page-7"
    assert path_to_page_name("noext") == "noext"


def test_derive_version_id_sentinel():
    assert derive_version_id("u", "2020-01-01T00:00:00Z") == "u/2020-01-01T00:00:00Z"
    assert derive_version_id("u", None).startswith("NotAcceptable")


def test_surrogate_ids():
    sid = generate_surrogate_id("seg-1", 3)
    assert sid == "generated-seg-1-3"
    assert is_generated_id(sid)
    assert not is_generated_id("real-id")
    assert not is_generated_id(None)


def test_lineage_key_and_truncate():
    assert join_segment_and_url("segment-00001.parquet", "https://a/b") == (
        "segment-00001.parquet/https://a/b"
    )
    assert truncate_run_id("x" * 300) == "x" * 250


def test_split_prefixed_kind():
    assert split_prefixed_kind("Initial Submission: Research Article") == (
        "Initial Submission",
        "Research Article",
    )
    assert split_prefixed_kind("Research Article") == (
        "Full Submission",
        "Research Article",
    )
