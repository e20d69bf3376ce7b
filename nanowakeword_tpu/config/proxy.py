"""ConfigProxy: mapping wrapper with leaf-access tracking.

Parity target: `/root/reference/nanowakeword/_config/ConfigProxy.py` — every
leaf key ever read (including defaulted `get()`s) is recorded so the live
config table (utils/dynamic_table.py) and the training journal can show
exactly the parameters a run actually used. Nested dicts proxy recursively
with dotted prefixes; a proxy wrapping a scalar coerces like one.
"""

from __future__ import annotations

import collections.abc


class ConfigProxy(collections.abc.Mapping):
    def __init__(self, data, root_proxy=None, prefix: str = ""):
        self._internal_data = data
        self._internal_root = root_proxy if root_proxy is not None else self
        self._internal_prefix = prefix
        if self._internal_root is self:
            self._internal_used_params = {}
            self._internal_accessed_keys = set()

    def _track_access(self, key, value):
        full_key = self._internal_prefix + key
        if not isinstance(value, dict):
            root = self._internal_root
            if full_key not in root._internal_accessed_keys:
                root._internal_used_params[full_key] = value
                root._internal_accessed_keys.add(full_key)

    def __getitem__(self, key):
        if key not in self._internal_data:
            raise KeyError(f"Key '{self._internal_prefix}{key}' not found "
                           "in configuration.")
        value = self._internal_data[key]
        self._track_access(key, value)
        if isinstance(value, dict):
            return ConfigProxy(value, root_proxy=self._internal_root,
                               prefix=f"{self._internal_prefix}{key}.")
        return value

    def __iter__(self):
        return iter(self._internal_data)

    def __len__(self):
        return len(self._internal_data)

    def get(self, key: str, default=None):
        if key in self._internal_data:
            return self[key]
        self._track_access(key, default)
        if isinstance(default, dict):
            return ConfigProxy(default, root_proxy=self._internal_root,
                               prefix=f"{self._internal_prefix}{key}.")
        return default

    def __setitem__(self, key, value):
        self._internal_data[key] = value
        self._track_access(key, value)

    def report(self) -> dict:
        """All parameters accessed so far (leaf keys, dotted paths)."""
        return self._internal_root._internal_used_params

    def to_dict(self) -> dict:
        out = {}
        for key, value in self.items():
            out[key] = value.to_dict() if isinstance(value, ConfigProxy) else value
        return out

    def __repr__(self):
        return (f"ConfigProxy(prefix='{self._internal_prefix}', "
                f"data={self._internal_data})")

    def _leaf(self):
        if isinstance(self._internal_data, dict):
            raise TypeError(
                "This ConfigProxy wraps a dictionary and cannot be treated "
                f"as a single value. Path: '{self._internal_prefix}'")
        return self._internal_data

    def __int__(self):
        return int(self._leaf())

    def __float__(self):
        return float(self._leaf())

    def __str__(self):
        if isinstance(self._internal_data, dict):
            return str(self._internal_data)
        return str(self._leaf())

    def __add__(self, other):
        return self._leaf() + other

    def __radd__(self, other):
        return other + self._leaf()


def deep_merge(d1: dict, d2: dict) -> dict:
    """Recursively merge d2 into d1 (trainer.py:81-92)."""
    for k, v in d2.items():
        if (k in d1 and isinstance(d1[k], dict)
                and isinstance(v, collections.abc.Mapping)):
            d1[k] = deep_merge(d1[k], v)
        else:
            d1[k] = v
    return d1
