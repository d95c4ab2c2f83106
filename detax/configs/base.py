"""Config base machinery: frozen dataclasses + JSON round-trip.

Mirrors the reference ``BaseConf`` contract (``python/src/config/base.py:39-57``:
``to_dict`` / ``save`` / ``load`` via JSON) but uses frozen dataclasses so that
configs are hashable — required for passing them as static args to ``jax.jit``
— and reconstructs nested configs through a class registry keyed by a
``__conf__`` tag embedded in the JSON.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Type, TypeVar

_REGISTRY: Dict[str, type] = {}

T = TypeVar("T")


def register_conf(cls: Type[T]) -> Type[T]:
    """Class decorator: make a frozen dataclass JSON round-trippable."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    _REGISTRY[cls.__name__] = cls
    return cls


def _to_jsonable(value: Any) -> Any:
    if dataclasses.is_dataclass(value) and not isinstance(value, type):
        out = {"__conf__": type(value).__name__}
        for f in dataclasses.fields(value):
            out[f.name] = _to_jsonable(getattr(value, f.name))
        return out
    if isinstance(value, tuple):
        return {"__tuple__": [_to_jsonable(v) for v in value]}
    if isinstance(value, list):
        return [_to_jsonable(v) for v in value]
    if isinstance(value, dict):
        return {k: _to_jsonable(v) for k, v in value.items()}
    return value


def _from_jsonable(value: Any) -> Any:
    if isinstance(value, dict):
        if "__conf__" in value:
            cls = _REGISTRY[value["__conf__"]]
            kwargs = {k: _from_jsonable(v) for k, v in value.items() if k != "__conf__"}
            return cls(**kwargs)
        if "__tuple__" in value:
            return tuple(_from_jsonable(v) for v in value["__tuple__"])
        return {k: _from_jsonable(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_from_jsonable(v) for v in value]
    return value


def config_from_dict(data: Dict[str, Any]):
    return _from_jsonable(data)


class BaseConf:
    """Mixin with the reference ``BaseConf`` API (``config/base.py:39-57``)."""

    def to_dict(self) -> Dict[str, Any]:
        return _to_jsonable(self)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, sort_keys=True)

    @classmethod
    def load(cls, path: str):
        with open(path) as f:
            obj = _from_jsonable(json.load(f))
        if not isinstance(obj, cls):
            raise TypeError(f"{path} holds a {type(obj).__name__}, expected {cls.__name__}")
        return obj

    def replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)
