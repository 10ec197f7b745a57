"""Model registry.

Reference: models/__init__.py:14-52 resolves `<name>_model` modules
dynamically; here registration is explicit and importable.
"""
from __future__ import annotations

_REGISTRY = {}


def register_model(name: str):
    def deco(cls):
        _REGISTRY[name.lower()] = cls
        return cls
    return deco


def create_model(name: str, *args, **kwargs):
    key = name.lower()
    if key not in _REGISTRY:
        # Import known model modules lazily so registration side effects run.
        from . import marscf, srflow, gp, video_sr  # noqa: F401
    if key not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[key](*args, **kwargs)
