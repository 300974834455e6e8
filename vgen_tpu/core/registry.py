"""Name -> component registries.

TPU-native re-implementation of the reference registry system
(reference: utils/registry.py:74-153, utils/registry_class.py:9-19).

Semantics kept identical to the reference so yaml configs are drop-in:
a component config is a dict with a ``type`` key naming a registered
class or function; ``build`` pops ``type`` and calls the component with
the remaining keys as kwargs (merged with any extra kwargs passed to
``build`` itself, call-site kwargs winning).
"""

from __future__ import annotations

import copy
from typing import Any, Callable, Dict, Optional


class Registry:
    """A name -> class/function map with config-driven construction."""

    def __init__(self, name: str, build_func: Optional[Callable] = None):
        self.name = name
        self._entries: Dict[str, Any] = {}
        self._build_func = build_func or build_from_config

    # ------------------------------------------------------------------ #
    # registration
    # ------------------------------------------------------------------ #
    def register_class(self, name: Optional[str] = None):
        """Decorator registering a class under ``name`` (default: class name)."""

        def _register(cls):
            key = name or cls.__name__
            if key in self._entries and self._entries[key] is not cls:
                raise KeyError(
                    f"{key!r} already registered in registry {self.name!r}")
            self._entries[key] = cls
            return cls

        return _register

    def register_function(self, name: Optional[str] = None):
        """Decorator registering a callable under ``name`` (default: __name__)."""

        def _register(fn):
            key = name or fn.__name__
            if key in self._entries and self._entries[key] is not fn:
                raise KeyError(
                    f"{key!r} already registered in registry {self.name!r}")
            self._entries[key] = fn
            return fn

        return _register

    # ------------------------------------------------------------------ #
    # lookup / build
    # ------------------------------------------------------------------ #
    def get(self, name: str) -> Any:
        if name not in self._entries:
            known = ", ".join(sorted(self._entries))
            raise KeyError(
                f"{name!r} not found in registry {self.name!r}. Known: {known}")
        return self._entries[name]

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def keys(self):
        return self._entries.keys()

    def build(self, __cfg: Any = None, **kwargs) -> Any:
        """Instantiate a component from a dict-with-'type' config + kwargs.
        (positional-only config so component kwargs named 'cfg' work)"""
        return self._build_func(__cfg, registry=self, **kwargs)

    def __repr__(self):
        return f"Registry(name={self.name!r}, items={sorted(self._entries)})"


def build_from_config(cfg: Any, /, registry: Registry = None, **kwargs) -> Any:
    """Build a component from a ``{'type': name, **component_kwargs}`` dict.

    Mirrors reference ``build_from_config`` (utils/registry.py:24-71):
    - dict cfg: pop 'type', look up, call with remaining keys + kwargs.
    - str cfg: look up directly; call with kwargs if any, else return the
      raw class/function (reference returns req_type_entry uncalled only
      for functions; we call when kwargs are given which matches all
      in-repo usage).
    """
    if isinstance(cfg, str):
        entry = registry.get(cfg)
        if kwargs:
            return entry(**kwargs)
        return entry
    if not isinstance(cfg, dict):
        raise TypeError(f"config must be a dict or str, got {type(cfg)!r}")
    if "type" not in cfg:
        raise KeyError(f"config for registry {registry.name!r} missing 'type': {cfg}")
    cfg = copy.deepcopy(dict(cfg))
    name = cfg.pop("type")
    entry = registry.get(name)
    cfg.update(kwargs)
    return entry(**cfg)


# --------------------------------------------------------------------------- #
# Global registries — same set as the reference (utils/registry_class.py:9-19)
# --------------------------------------------------------------------------- #
AUTO_ENCODER = Registry("AUTO_ENCODER")
DATASETS = Registry("DATASETS")
DIFFUSION = Registry("DIFFUSION")
DISTRIBUTION = Registry("DISTRIBUTION")
EMBEDDER = Registry("EMBEDDER")
EMBEDMANAGER = Registry("EMBEDMANAGER")
ENGINE = Registry("ENGINE")
INFER_ENGINE = Registry("INFER_ENGINE")
MODEL = Registry("MODEL")
PRETRAIN = Registry("PRETRAIN")
VISUAL = Registry("VISUAL")
