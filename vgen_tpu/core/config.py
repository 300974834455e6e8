"""Yaml config system with ``_BASE`` inheritance and CLI dotted-key overrides.

TPU-native re-implementation of the reference config loader
(reference: utils/config.py:10-225, utils/assign_cfg.py:59-77).

Behavioral contract kept from the reference so its yaml files work verbatim:
  * ``--cfg <file>`` + trailing ``KEY VALUE`` override pairs, ``--debug``,
    ``--init_method`` (accepted for CLI parity; distributed init is handled
    by jax.distributed instead).
  * ``configs/base.yaml`` is merged under every config when present.
  * A config may reference parents via ``_BASE`` / ``_BASE_RUN`` /
    ``_BASE_MODEL`` keys, absolute ("./configs/x.yaml" relative to the cfg
    file's directory) or relative ("../x.yaml"); children win on conflicts,
    dicts merge recursively.
  * Dotted override keys up to depth 4; keys must already exist for
    depth >= 2 (same assert as reference utils/config.py:157-202).
  * Scientific-notation strings like "1e-5" are coerced to float on
    attribute wrapping (reference utils/config.py:210-211).

Deliberate improvement over the reference: CLI override values are parsed
with yaml.safe_load, so ``lr 0.0001`` arrives as a float rather than a
string (the reference leaves these as strings).
"""

from __future__ import annotations

import argparse
import copy
import json
import os
from typing import Any, Dict, List, Optional

import yaml

_BASE_KEYS = ("_BASE", "_BASE_RUN", "_BASE_MODEL")


class AttrDict(dict):
    """A dict with recursive attribute access (EasyDict-style).

    Used wherever the reference uses easydict/Config wrapping; unlike the
    reference's ``Config`` object it still IS a dict, so engines can use
    both ``cfg.key`` and ``cfg['key']`` uniformly.
    """

    def __init__(self, d: Optional[Dict] = None, **kwargs):
        super().__init__()
        d = dict(d or {})
        d.update(kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, dict) and not isinstance(value, AttrDict):
            return AttrDict(value)
        if isinstance(value, (list, tuple)):
            return type(value)(AttrDict._wrap(v) for v in value)
        if isinstance(value, str) and value[1:3] == "e-":
            # "1e-5"-style yaml strings -> float (reference :210-211)
            try:
                return float(value)
            except ValueError:
                return value
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, self._wrap(value))

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __delattr__(self, key):
        try:
            del self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __deepcopy__(self, memo):
        return AttrDict({k: copy.deepcopy(dict.__getitem__(self, k), memo)
                         for k in self})

    def update(self, other=None, **kwargs):  # keep AttrDict wrapping
        for k, v in dict(other or {}, **kwargs).items():
            self[k] = v

    def dump(self) -> str:
        return json.dumps(self, indent=2, default=str)


def merge_dicts(base: Dict, new: Dict, preserve_base: bool = False) -> Dict:
    """Merge ``new`` over ``base`` (new wins; dicts merge recursively).

    ``_BASE*`` keys in ``new`` are dropped unless ``preserve_base``
    (reference utils/config.py:130-141).
    """
    out = dict(base)
    for k, v in new.items():
        if k in out and isinstance(v, dict) and isinstance(out[k], dict):
            out[k] = merge_dicts(out[k], v)
        elif k in out:
            out[k] = v
        elif "BASE" not in k or preserve_base:
            out[k] = v
    return out


def _resolve_base_path(cfg_path: str, base_ref: str) -> str:
    """Resolve a ``_BASE*`` reference relative to the referencing file."""
    cfg_dir = os.path.dirname(cfg_path)
    if base_ref.startswith("./"):
        return os.path.normpath(os.path.join(cfg_dir, base_ref[2:]))
    if base_ref.startswith(".."):
        up = base_ref.count("..")
        parts = base_ref.split("/")
        anchor = cfg_dir
        for _ in range(up):
            anchor = os.path.dirname(anchor)
        return os.path.normpath(os.path.join(anchor, *parts[up:]))
    return base_ref


def load_yaml_with_bases(path: str) -> Dict:
    """Load a yaml file, recursively resolving its ``_BASE*`` parents."""
    with open(path, "r") as f:
        cfg = yaml.safe_load(f.read()) or {}

    if "_BASE" in cfg:
        base = load_yaml_with_bases(_resolve_base_path(path, cfg["_BASE"]))
        cfg = merge_dicts(base, cfg)
    else:
        if "_BASE_RUN" in cfg:
            base = load_yaml_with_bases(_resolve_base_path(path, cfg["_BASE_RUN"]))
            cfg = merge_dicts(base, cfg, preserve_base=True)
        if "_BASE_MODEL" in cfg:
            base = load_yaml_with_bases(_resolve_base_path(path, cfg["_BASE_MODEL"]))
            cfg = merge_dicts(base, cfg)
    cfg.pop("_BASE", None)
    return cfg


def _parse_value(raw: str) -> Any:
    """Parse a CLI override value: yaml-typed when possible, else raw str."""
    if not isinstance(raw, str):
        return raw
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def apply_cli_overrides(cfg: Dict, opts: List[str]) -> Dict:
    """Apply trailing ``KEY VALUE`` pairs; dotted keys to depth 4.

    Same existence asserts as the reference (utils/config.py:157-202):
    dotted parents must already exist; a depth-1 key may be new.
    """
    if not opts:
        return cfg
    if len(opts) % 2 != 0:
        raise ValueError(f"Override list has odd length: {opts}")
    for key, raw in zip(opts[0::2], opts[1::2]):
        parts = key.split(".")
        if len(parts) > 4:
            raise ValueError(f"Override key depth > 4: {key}")
        node = cfg
        for i, p in enumerate(parts[:-1]):
            if p not in node:
                raise KeyError(f"Non-existent override key: {key}")
            node = node[p]
        if len(parts) > 1 and parts[-1] not in node:
            raise KeyError(f"Non-existent override key: {key}")
        node[parts[-1]] = _parse_value(raw)
    return cfg


def _find_global_base() -> Optional[str]:
    """Locate configs/base.yaml like the reference does (cwd-anchored)."""
    cand = os.path.join(os.getcwd(), "configs", "base.yaml")
    if os.path.exists(cand):
        return cand
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(here, "configs", "base.yaml")
    if os.path.exists(cand):
        return cand
    return None


class Config:
    """CLI-facing config object: ``Config(load=True)`` in entry scripts.

    Attribute access mirrors the reference; ``cfg_dict`` holds the raw
    merged dict handed to engines (engines re-merge it over the default
    config from vgen_tpu.core.defaults).
    """

    def __init__(self, load: bool = True, cfg_dict: Optional[Dict] = None,
                 args: Optional[List[str]] = None):
        if load:
            self.args = self._parse_args(args)
            base_path = _find_global_base()
            cfg = yaml.safe_load(open(base_path).read()) if base_path else {}
            cfg_file = load_yaml_with_bases(self.args.cfg_file)
            cfg = merge_dicts(cfg or {}, cfg_file)
            cfg = apply_cli_overrides(cfg, self.args.opts)
            for var in vars(self.args):
                cfg[var] = getattr(self.args, var)
            cfg_dict = cfg
        self.cfg_dict = dict(cfg_dict or {})
        self._attr = AttrDict(self.cfg_dict)

    @staticmethod
    def _parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
        parser = argparse.ArgumentParser(description="vgen-tpu config")
        parser.add_argument("--cfg", dest="cfg_file", default="configs/t2v_infer.yaml",
                            help="Path to the configuration file")
        parser.add_argument("--init_method", default="tcp://localhost:9999", type=str,
                            help="accepted for reference-CLI parity (unused on TPU)")
        parser.add_argument("--debug", action="store_true", default=False)
        parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                            help="KEY VALUE override pairs")
        return parser.parse_args(argv)

    def __getattr__(self, key):
        # only called when normal lookup fails
        attr = self.__dict__.get("_attr")
        if attr is not None and key in attr:
            return attr[key]
        raise AttributeError(key)

    def __repr__(self):
        return json.dumps(self.cfg_dict, indent=2, default=str)


def assign_single_cfg(cfg: AttrDict, cfg_update: Dict, tname: str) -> AttrDict:
    """Merge the yaml referenced by ``cfg_update[tname]`` into a copy of cfg.

    Equivalent of reference ``assign_signle_cfg`` (utils/assign_cfg.py:59-77):
    infer configs name their train yaml via e.g. ``vldm_cfg``; dict values
    update existing keys, scalars overwrite.
    """
    out = AttrDict(copy.deepcopy(dict(cfg)))
    path = cfg_update.get(tname)
    if path and os.path.exists(path):
        loaded = yaml.safe_load(open(path).read()) or {}
        for k, v in loaded.items():
            if isinstance(v, dict) and k in out and isinstance(out[k], dict):
                merged = dict(out[k])
                merged.update(v)
                out[k] = merged
            else:
                out[k] = v
    return out


# reference-spelling alias (utils/assign_cfg.py:64)
assign_signle_cfg = assign_single_cfg


def _merge_named_yaml(cfg: AttrDict, path: str) -> AttrDict:
    """One reference-style merge: dict values update existing keys,
    scalars overwrite (utils/assign_cfg.py:15-21)."""
    out = AttrDict(copy.deepcopy(dict(cfg)))
    loaded = yaml.safe_load(open(path).read()) or {}
    for k, v in loaded.items():
        if isinstance(v, dict) and k in out and isinstance(out[k], dict):
            merged = dict(out[k])
            merged.update(v)
            out[k] = merged
        else:
            out[k] = v
    return out


def assign_prior_mudule_cfg(cfg: AttrDict):
    """HiGen dual-module merge (reference utils/assign_cfg.py:6-32):
    ``cfg.prior_cfg`` and ``cfg.vldm_cfg`` each name a yaml that is
    merged onto a COPY of the base cfg, yielding the (prior, vldm)
    config pair. Reference-typo name preserved."""
    return (_merge_named_yaml(cfg, cfg["prior_cfg"]),
            _merge_named_yaml(cfg, cfg["vldm_cfg"]))


def assign_vldm_vsr_mudule_cfg(cfg: AttrDict):
    """tft2v->sr600 chain merge (reference utils/assign_cfg.py:35-60):
    (vldm, vsr) config pair from ``cfg.vldm_cfg`` / ``cfg.vsr_cfg``."""
    return (_merge_named_yaml(cfg, cfg["vldm_cfg"]),
            _merge_named_yaml(cfg, cfg["vsr_cfg"]))
