"""Layered runtime configuration — ST4 parity with the reference's configs
table + scoped resolution (app/main.py:211-235 reads scope='global' per key;
implementation.md:344 defines scope = 'global' | 'vendor:{vendor_id}';
requirements.md:141 SD-002: thresholds configurable globally AND per vendor).

Resolution order per key: ``vendor:{partition_key}`` scope → ``global``
scope → the caller's default.  Values are arbitrary JSON-ish scalars; the
float coercion mirrors the reference's tolerant ``_get_cfg`` (raw number,
{"value": x} wrapper, stringly number — anything else falls back).

The store is a plain picklable object: build it once on the driver, ship it
with ``ray.put`` alongside the profile broadcast, resolve vectorized per
partition inside map_batches / map_groups stages.
"""
from __future__ import annotations

import json
from typing import Any, Iterable

import numpy as np

GLOBAL_SCOPE = "global"


def _coerce_float(value: Any, default: float) -> float:
    """The reference's tolerant JSONB→float coercion (app/main.py:224-235)."""
    if isinstance(value, bool):  # bool is an int subclass; the ref casts it
        return float(value)
    if isinstance(value, (int, float)):
        return float(value)
    if isinstance(value, dict) and "value" in value:
        try:
            return float(value["value"])
        except (TypeError, ValueError):
            return float(default)
    try:
        return float(value)
    except (TypeError, ValueError):
        return float(default)


class ConfigStore:
    """(scope, key) → value with layered scope fallback."""

    def __init__(self, entries: dict[tuple[str, str], Any] | None = None):
        self._entries: dict[tuple[str, str], Any] = dict(entries or {})

    # -- construction -------------------------------------------------------
    def set(self, scope: str, key: str, value: Any) -> "ConfigStore":
        self._entries[(scope, key)] = value
        return self

    @classmethod
    def from_rows(cls, rows: Iterable[dict]) -> "ConfigStore":
        """Rows shaped like the reference's configs table: dicts with
        ``scope``, ``key``, ``value`` (value may be a JSON string)."""
        store = cls()
        for r in rows:
            v = r["value"]
            if isinstance(v, str):
                try:
                    v = json.loads(v)
                except (ValueError, TypeError):
                    pass
            store.set(str(r["scope"]), str(r["key"]), v)
        return store

    @classmethod
    def from_json(cls, path: str) -> "ConfigStore":
        with open(path) as f:
            return cls.from_rows(json.load(f))

    # -- resolution ----------------------------------------------------------
    def get(self, key: str, default: Any, partition_key: str | None = None) -> Any:
        """vendor:{partition_key} → global → default (raw value)."""
        if partition_key is not None:
            hit = self._entries.get((f"vendor:{partition_key}", key), _MISSING)
            if hit is not _MISSING:
                return hit
        hit = self._entries.get((GLOBAL_SCOPE, key), _MISSING)
        return default if hit is _MISSING else hit

    def get_float(self, key: str, default: float,
                  partition_key: str | None = None) -> float:
        return _coerce_float(self.get(key, default, partition_key), default)

    def resolve_floats(self, key: str, default: float,
                       partition_keys: np.ndarray) -> np.ndarray:
        """Vectorized per-partition resolution: one dict lookup per DISTINCT
        partition in the batch, broadcast back with the unique-inverse."""
        uniq, inv = np.unique(np.asarray(partition_keys, dtype=object),
                              return_inverse=True)
        vals = np.array(
            [self.get_float(key, default, str(k)) for k in uniq], dtype=np.float64
        )
        return vals[inv]

    def scopes(self) -> set[str]:
        return {s for s, _ in self._entries}

    def __len__(self) -> int:
        return len(self._entries)


_MISSING = object()
