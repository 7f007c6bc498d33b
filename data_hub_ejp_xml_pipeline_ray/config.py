"""Job configuration: env-templated config loading + extractor registry.

Mirrors the reference's config surface (``dag_pipeline_config/
xml_config.py``): a config document (dict / JSON file) with ``{ENV}``
placeholders recursively substituted
(``update_deployment_env_placeholder``, ``xml_config.py:115-158``), and
a registry keyed by ``schema_version`` standing in for the reference's
``entity_type_mapping`` (``xml_config.py:91-112``) — adding a schema
version = registering one extractor callable, no engine change.
"""
from __future__ import annotations

import json
import os
from typing import Any, Callable

DEFAULT_PLACEHOLDER = "{ENV}"


def replace_env_placeholder(
    value: str, deployment_env: str, placeholder: str = DEFAULT_PLACEHOLDER
) -> str:
    """String-level ``{ENV}`` substitution (``xml_config.py:115-123``)."""
    return value.replace(placeholder, deployment_env)


def update_deployment_env_placeholder(
    config: Any, deployment_env: str, placeholder: str = DEFAULT_PLACEHOLDER
) -> Any:
    """Recursive ``{ENV}`` substitution through dicts / lists / strings
    (``xml_config.py:126-158``). Non-string leaves pass through."""
    if isinstance(config, dict):
        return {
            k: update_deployment_env_placeholder(v, deployment_env, placeholder)
            for k, v in config.items()
        }
    if isinstance(config, list):
        return [
            update_deployment_env_placeholder(v, deployment_env, placeholder)
            for v in config
        ]
    if isinstance(config, str):
        return replace_env_placeholder(config, deployment_env, placeholder)
    return config


def load_job_config(
    path: str, deployment_env: str | None = None, env_var: str = "DEPLOYMENT_ENV"
) -> dict:
    """Load a JSON job config, substituting ``{ENV}`` from the argument
    or the ``DEPLOYMENT_ENV`` environment variable (the reference reads
    its env pointer the same way, ``dags/s3_xml_import_pipeline.py:90-99``)."""
    with open(path, "r", encoding="utf-8") as f:
        doc = json.load(f)
    env = deployment_env or os.environ.get(env_var, "dev")
    return update_deployment_env_placeholder(doc, env)


class ExtractorRegistry:
    """schema_version -> extractor callable registry (the analog of the
    entity-type registry): the CDC pipeline looks extractors up here so
    new wire schema versions plug in without touching the engine."""

    def __init__(self):
        self._by_version: dict[int, Callable] = {}

    def register(self, schema_version: int):
        def deco(fn: Callable) -> Callable:
            if schema_version in self._by_version:
                raise ValueError(f"schema_version {schema_version} already registered")
            self._by_version[schema_version] = fn
            return fn

        return deco

    def get(self, schema_version: int) -> Callable:
        """Exact version, else highest registered version below it
        (forward compatibility: v3 events parse with the v2 extractor
        until a v3 extractor ships)."""
        if schema_version in self._by_version:
            return self._by_version[schema_version]
        older = [v for v in self._by_version if v < schema_version]
        if not older:
            raise KeyError(f"no extractor for schema_version {schema_version}")
        return self._by_version[max(older)]

    def versions(self) -> list[int]:
        return sorted(self._by_version)
