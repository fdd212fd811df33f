"""YAML config tree with dot-path lookup.

Parity with reference src/utils/config_loader.py:109-132 (load YAML, get
nested values by "a.b.c" path with a default).  YAML is optional in this
environment; plain dicts work too.
"""

from __future__ import annotations

from typing import Any


def load_yaml(path: str) -> dict:
    try:
        import yaml  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise ImportError("pyyaml not installed; pass a dict instead") from e
    with open(path) as f:
        return yaml.safe_load(f) or {}


def get_path(tree: dict, dotted: str, default: Any = None) -> Any:
    """Dot-path lookup: get_path(cfg, "spark.executor.memory", "2g")."""
    node: Any = tree
    for part in dotted.split("."):
        if not isinstance(node, dict) or part not in node:
            return default
        node = node[part]
    return node


class Config:
    """Tiny wrapper bundling a config tree with dot-path access."""

    def __init__(self, tree: dict | None = None, path: str | None = None):
        self.tree = load_yaml(path) if path else (tree or {})

    def get(self, dotted: str, default: Any = None) -> Any:
        return get_path(self.tree, dotted, default)
