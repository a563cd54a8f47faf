"""A minimal yacs-compatible config node (no external dependency).

Supports the subset of yacs the reference uses
(maskrcnn_benchmark/config/defaults.py + tools/*): attribute access,
``clone()``, ``merge_from_file`` (YAML), ``merge_from_list``,
``freeze()``/``defrost()``, and pre-freeze assignment of new keys
(the reference attribute-assigns TASK/STEP/NAME, SURVEY.md §5.6).
"""

from __future__ import annotations

import copy
from typing import Any, List

import yaml


class ConfigNode(dict):
    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict=None):
        super().__init__()
        self.__dict__[ConfigNode.IMMUTABLE] = False
        if init_dict:
            for k, v in init_dict.items():
                self[k] = ConfigNode(v) if isinstance(v, dict) else v

    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"Config has no key {name!r}")

    def __setattr__(self, name: str, value: Any) -> None:
        if self.__dict__.get(ConfigNode.IMMUTABLE, False):
            raise AttributeError(f"Config is frozen; cannot set {name!r}")
        self[name] = ConfigNode(value) if isinstance(value, dict) else value

    def freeze(self) -> None:
        self.__dict__[ConfigNode.IMMUTABLE] = True
        for v in self.values():
            if isinstance(v, ConfigNode):
                v.freeze()

    def defrost(self) -> None:
        self.__dict__[ConfigNode.IMMUTABLE] = False
        for v in self.values():
            if isinstance(v, ConfigNode):
                v.defrost()

    def is_frozen(self) -> bool:
        return self.__dict__.get(ConfigNode.IMMUTABLE, False)

    def clone(self) -> "ConfigNode":
        out = ConfigNode()
        for k, v in self.items():
            out[k] = v.clone() if isinstance(v, ConfigNode) else copy.deepcopy(v)
        return out

    @staticmethod
    def _decode(v):
        """yacs compatibility: YAML values like "(16,)" arrive as strings —
        decode python-literal tuples/lists (yacs _decode_cfg_value)."""
        if isinstance(v, str) and v[:1] in "([":
            import ast

            try:
                v = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                pass
        if isinstance(v, list):
            v = tuple(v)
        return v

    def _merge(self, other: dict, path="") -> None:
        for k, v in other.items():
            here = f"{path}.{k}" if path else k
            if isinstance(v, dict):
                if k not in self:
                    self[k] = ConfigNode()
                if not isinstance(self[k], ConfigNode):
                    raise KeyError(f"cannot merge dict into scalar at {here}")
                self[k]._merge(v, here)
            else:
                self[k] = self._decode(v)

    def merge_from_file(self, path: str) -> None:
        if self.is_frozen():
            raise AttributeError("Config is frozen")
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        self._merge(data)

    def merge_from_dict(self, data: dict) -> None:
        if self.is_frozen():
            raise AttributeError("Config is frozen")
        self._merge(data)

    def merge_from_list(self, opts: List[Any]) -> None:
        if self.is_frozen():
            raise AttributeError("Config is frozen")
        assert len(opts) % 2 == 0, "override list must be key value pairs"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if isinstance(value, str):
                decoded = self._decode(value)
                if decoded is value:
                    try:
                        decoded = yaml.safe_load(value)
                    except Exception:
                        decoded = value
                value = decoded
            if isinstance(value, list):
                value = tuple(value)
            node[leaf] = value

    def dump(self) -> str:
        def to_plain(node):
            return {
                k: to_plain(v) if isinstance(v, ConfigNode) else v
                for k, v in node.items()
            }

        return yaml.safe_dump(to_plain(self), sort_keys=True)
