"""Config loading (SURVEY.md §2.1 S7).

The reference loads a JSON config once at startup and addresses values
by JSON-pointer path, failing fast on missing required keys
(``load_values_from_json`` reference src/utils.c:12-44;
``json_pointer_get(config, "/dd/mqtt/host", ...)``
src/modules/dd/producer.c:45-54). The engine analog keeps the same
contract: one parse at startup, pointer-path access, loud failure on
required keys (the P12 null-guard rejects), defaulting for optional
ones (P13).
"""

from __future__ import annotations

import json
from typing import Any

_MISSING = object()


class PipelineConfig:
    """Parsed config document with JSON-pointer-style access."""

    def __init__(self, root: dict[str, Any]) -> None:
        self._root = root

    @classmethod
    def from_file(cls, path: str) -> PipelineConfig:
        with open(path) as f:
            return cls(json.load(f))

    def get(self, pointer: str, default: Any = _MISSING) -> Any:
        """Fetch ``/a/b/c``-style paths. Raises ``KeyError`` naming the
        full pointer when the key is required (no default) and absent —
        the reference's fail-fast init contract (utils.c:36-42)."""
        node: Any = self._root
        for part in pointer.strip("/").split("/"):
            if isinstance(node, list):
                try:
                    node = node[int(part)]
                    continue
                except (ValueError, IndexError):
                    node = _MISSING
                    break
            if not isinstance(node, dict) or part not in node:
                node = _MISSING
                break
            node = node[part]
        if node is _MISSING:
            if default is _MISSING:
                raise KeyError(f"required config key missing: {pointer}")
            return default
        return node

    def require(self, *pointers: str) -> list[Any]:
        """Validate-and-fetch a batch of required keys (the producer's
        five-key null guard, producer.c:55-60)."""
        return [self.get(p) for p in pointers]
