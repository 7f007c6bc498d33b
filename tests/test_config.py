"""Config templating + extractor registry (reference §2.10 parity:
``update_deployment_env_placeholder``, ``entity_type_mapping``)."""
import json

import pytest

from data_hub_ejp_xml_pipeline_ray.config import (
    ExtractorRegistry,
    load_job_config,
    replace_env_placeholder,
    update_deployment_env_placeholder,
)


def test_string_substitution():
    assert replace_env_placeholder("bucket-{ENV}-raw", "prod") == "bucket-prod-raw"


def test_recursive_substitution():
    cfg = {
        "lake": "s3://lake-{ENV}/pages",
        "nested": {"state": "{ENV}/state.json", "n": 5},
        "list": ["{ENV}-a", 7, {"x": "{ENV}"}],
    }
    out = update_deployment_env_placeholder(cfg, "ci")
    assert out == {
        "lake": "s3://lake-ci/pages",
        "nested": {"state": "ci/state.json", "n": 5},
        "list": ["ci-a", 7, {"x": "ci"}],
    }
    # input untouched
    assert cfg["lake"] == "s3://lake-{ENV}/pages"


def test_load_job_config(tmp_path, monkeypatch):
    p = tmp_path / "job.json"
    p.write_text(json.dumps({"wal": "/data/{ENV}/wal"}))
    assert load_job_config(str(p), "staging") == {"wal": "/data/staging/wal"}
    monkeypatch.setenv("DEPLOYMENT_ENV", "prod")
    assert load_job_config(str(p)) == {"wal": "/data/prod/wal"}


def test_registry_exact_and_fallback():
    reg = ExtractorRegistry()

    @reg.register(1)
    def v1(x):
        return "v1"

    @reg.register(2)
    def v2(x):
        return "v2"

    assert reg.get(1)(None) == "v1"
    assert reg.get(2)(None) == "v2"
    assert reg.get(7)(None) == "v2"  # forward-compat fallback
    with pytest.raises(KeyError):
        reg.get(0)
    with pytest.raises(ValueError):
        reg.register(2)(lambda x: x)
    assert reg.versions() == [1, 2]
