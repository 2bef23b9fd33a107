"""Config loading: YAML/JSON path or raw string -> validated PipelineConfig.

Secrets: ``{{secret.scope:key}}`` placeholders are resolved on the driver,
before validation, via a caller-supplied resolver (the reference hardcodes
Databricks dbutils; we take any ``resolver(scope, key) -> str``).
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Callable
from typing import Any

from distributed_api_etl_spark.config.models import PipelineConfig

_SECRET_RE = re.compile(r"\{\{\s*secret\.([A-Za-z0-9_\-]+):([A-Za-z0-9_\-]+)\s*\}\}")

SecretResolver = Callable[[str, str], str]


def _resolve_secrets(node: Any, resolver: SecretResolver | None) -> Any:
    if isinstance(node, dict):
        return {k: _resolve_secrets(v, resolver) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_secrets(v, resolver) for v in node]
    if isinstance(node, str) and _SECRET_RE.search(node):
        if resolver is None:
            raise ValueError(f"secret placeholder found but no resolver given: {node!r}")
        return _SECRET_RE.sub(lambda m: resolver(m.group(1), m.group(2)), node)
    return node


def env_secret_resolver(scope: str, key: str) -> str:
    """Default resolver: SECRET_<SCOPE>_<KEY> environment variable
    (hyphens become underscores — env var names can't hold '-')."""
    var = f"SECRET_{scope.upper()}_{key.upper()}".replace("-", "_")
    val = os.environ.get(var)
    if val is None:
        raise KeyError(f"secret env var {var} not set")
    return val


def load_config(
    source: str | dict,
    secret_resolver: SecretResolver | None = env_secret_resolver,
) -> PipelineConfig:
    """Load from a dict, a YAML/JSON file path, or a raw YAML/JSON string."""
    if isinstance(source, dict):
        data = source
    else:
        text = source
        if os.path.exists(source):
            with open(source) as fh:
                text = fh.read()
        try:
            data = json.loads(text)
        except json.JSONDecodeError:
            import yaml

            data = yaml.safe_load(text)
    if not isinstance(data, dict):
        raise ValueError("config must be a mapping")
    data = _resolve_secrets(data, secret_resolver)
    return PipelineConfig.model_validate(data)
