"""Hydra-compatible configuration without Hydra.

The reference composes ``configs/train.yaml`` with config groups
``model=`` / ``data=`` plus CLI dot-overrides via Hydra 1.3, and persists
the composed config as ``<run>/.hydra/config.yaml``, which evaluation and
benchmarking re-read as the model manifest
(``Reflected-Diffusion/utils.py:7-10``,
``Benchmark/gto_halo_benchmarking.py:135-140``).  That contract is
load-bearing, so we reimplement exactly that subset on PyYAML:

* ``defaults:`` list with ``_self_`` and ``group: option`` entries
  (``override hydra/...`` entries are ignored);
* CLI overrides: ``group=option`` swaps a config group,
  ``a.b.c=value`` sets a leaf (YAML-parsed), ``+a.b=v`` adds a new leaf;
* ``save_config_snapshot`` writes ``.hydra/config.yaml``;
* ``load_hydra_config_from_run`` reads it back — our files are plain YAML
  and remain readable by OmegaConf, and reference-produced run dirs load
  fine here.

Config objects are ``ConfigDict``: attribute + item access, ``.get()``,
recursive merge.
"""
from __future__ import annotations

import os
from typing import Any, Iterable

import yaml

DEFAULT_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


class ConfigDict(dict):
    """Minimal dot-access dict (the subset of OmegaConf the pipeline uses)."""

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return ConfigDict({k: ConfigDict.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [ConfigDict.wrap(v) for v in obj]
        return obj

    def to_plain(self):
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o
        return unwrap(self)


def _merge(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def _set_dotted(cfg: dict, dotted: str, value: Any, allow_new: bool = True):
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        if k not in node:
            if not allow_new:
                raise KeyError(f"Unknown config path: {dotted}")
            node[k] = ConfigDict()
        node = node[k]
    node[keys[-1]] = ConfigDict.wrap(value)


def _load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def load_config(name: str = "train", overrides: Iterable[str] = (),
                config_dir: str = DEFAULT_CONFIG_DIR) -> ConfigDict:
    """Compose ``<config_dir>/<name>.yaml`` with its defaults list and
    Hydra-style CLI overrides."""
    overrides = list(overrides)
    root = _load_yaml(os.path.join(config_dir, f"{name}.yaml"))
    defaults = root.pop("defaults", [])
    root.pop("hydra", None)

    # Group selections: defaults entries, then CLI group swaps.
    group_choice = {}
    order = []
    for entry in defaults:
        if entry == "_self_" or entry is None:
            continue
        if isinstance(entry, dict):
            for g, opt in entry.items():
                if str(g).startswith("override "):
                    continue
                group_choice[g] = opt
                order.append(g)
    cli_sets = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override must be key=value, got {ov!r}")
        key, _, raw = ov.partition("=")
        add = key.startswith("+")
        key = key.lstrip("+")
        value = yaml.safe_load(raw)
        if isinstance(value, str):
            # YAML 1.1 does not parse bare scientific notation ("1e-3");
            # coerce numeric-looking strings like Hydra/OmegaConf do.
            try:
                value = int(value)
            except ValueError:
                try:
                    value = float(value)
                except ValueError:
                    pass
        if key in group_choice or (key in ("model", "data") and "." not in key and isinstance(value, str) and os.path.isdir(os.path.join(config_dir, key))):
            group_choice[key] = value
            if key not in order:
                order.append(key)
        else:
            cli_sets.append((key, value, add))

    cfg: dict = ConfigDict()
    for g in order:
        opt = group_choice[g]
        group_cfg = _load_yaml(os.path.join(config_dir, g, f"{opt}.yaml"))
        _merge(cfg, ConfigDict.wrap({g: group_cfg}))
    _merge(cfg, ConfigDict.wrap(root))
    for key, value, add in cli_sets:
        _set_dotted(cfg, key, value, allow_new=True)
    return ConfigDict.wrap(cfg)


def save_config_snapshot(cfg: ConfigDict, work_dir: str) -> str:
    """Persist the composed config as ``<work_dir>/.hydra/config.yaml`` —
    the manifest contract consumed by vis/benchmark."""
    hydra_dir = os.path.join(work_dir, ".hydra")
    os.makedirs(hydra_dir, exist_ok=True)
    path = os.path.join(hydra_dir, "config.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_plain() if isinstance(cfg, ConfigDict) else cfg, f,
                       sort_keys=False)
    return path


def load_hydra_config_from_run(load_dir: str) -> ConfigDict:
    """Reference ``utils.py:7-10``."""
    return ConfigDict.wrap(_load_yaml(os.path.join(load_dir, ".hydra", "config.yaml")))
