"""Environment/paths settings tier (reference: dynaconf ``settings.toml`` +
``.env`` — ``/root/reference/settings.toml:1-5``, ``.env:1-3``).

The reference resolves four workspace paths (``ckp_dir``, ``run_dir``,
``data_dir``, ``exp_dir``) through dynaconf with an environment-variable
override layer; model code calls ``settings.get("data_dir")``. detax mirrors
that capability without the dependency:

- a TOML settings file — ``detax-settings.toml`` in the working directory,
  or the path named by ``$DETAX_SETTINGS`` — with the same ``[default]``
  table of paths;
- per-key environment overrides ``DETAX_<KEY>`` (highest precedence, the
  ``.env`` analog);
- built-in defaults under ``./workspace`` so a bare checkout works.

CLI flags remain the top layer: ``cli.py`` uses these values only as flag
DEFAULTS (``--checkpoint-dir`` etc.), so nothing changes for existing users.
"""

from __future__ import annotations

import os
import tomllib
from typing import Dict, Optional

_KEYS = ("ckp_dir", "run_dir", "data_dir", "exp_dir")
_cache: Optional[Dict[str, str]] = None


def _defaults() -> Dict[str, str]:
    root = os.path.join(os.getcwd(), "workspace")
    return {
        "ckp_dir": os.path.join(root, "checkpoint"),
        "run_dir": os.path.join(root, "run"),
        "data_dir": os.path.join(root, "data"),
        "exp_dir": os.path.join(root, "export"),
    }


def _load() -> Dict[str, str]:
    global _cache
    if _cache is not None:
        return _cache
    values = _defaults()
    path = os.environ.get("DETAX_SETTINGS") or "detax-settings.toml"
    if os.path.exists(path):
        with open(path, "rb") as f:
            data = tomllib.load(f)
        table = data.get("default", data)  # dynaconf-style [default] table
        for k in _KEYS:
            if k in table:
                values[k] = str(table[k])
    for k in _KEYS:
        env = os.environ.get(f"DETAX_{k.upper()}")
        if env:
            values[k] = env
    _cache = values
    return values


def get(key: str, default: Optional[str] = None) -> Optional[str]:
    """``settings.get("data_dir")`` — the reference's dynaconf call shape."""
    return _load().get(key, default)


def reload() -> None:
    """Drop the cache (tests / settings-file edits at runtime)."""
    global _cache
    _cache = None
