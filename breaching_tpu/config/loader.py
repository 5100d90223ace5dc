"""Minimal hydra-style YAML composition for the breaching-tpu config surface.

The reference framework (JonasGeiping/breaching) wires every component through a
hydra config tree (reference: breaching/config/cfg.yaml, breaching/__init__.py:16-37).
Hydra is not available in this environment, so this module implements the small
subset of hydra semantics the framework needs:

- ``defaults:`` lists inside YAML files (``- data: CIFAR10``, ``- _self_``,
  ``- _default_optimization_attack`` for same-group inheritance),
- group swaps from the command line / overrides (``attack=deepleakage``,
  ``case/data=CIFAR100``),
- dotted key overrides (``case.user.num_data_points=4``),
- attribute-style access on the composed config.

The YAML tree under ``breaching_tpu/config`` mirrors the reference's group and
key names (case/attack/data/user/server/impl) so that experiment names remain
interchangeable.
"""

from __future__ import annotations

import ast
import copy
import os
from typing import Any, Iterable

import yaml

CONFIG_ROOT = os.path.dirname(os.path.abspath(__file__))


class ConfigNode(dict):
    """A dict with attribute access, used for all composed configs.

    Intentionally small: supports ``cfg.attack.optim.step_size`` reads,
    ``cfg.name = 'x'`` writes, ``in``, ``.get``, ``.keys/items/values``,
    and deep-copy. Missing attribute access raises AttributeError so typos
    fail loudly (like hydra's strict mode).
    """

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(f"Config key '{key}' not found; present keys: {list(self.keys())}") from e

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __delattr__(self, key: str) -> None:
        try:
            del self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __deepcopy__(self, memo):
        return ConfigNode({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        def conv(x):
            if isinstance(x, dict):
                return {k: conv(v) for k, v in x.items()}
            if isinstance(x, (list, tuple)):
                return [conv(v) for v in x]
            return x

        return conv(self)


def _wrap(obj: Any) -> Any:
    if isinstance(obj, dict):
        return ConfigNode({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return obj


def _deep_merge(base: Any, incoming: Any) -> Any:
    """Merge ``incoming`` on top of ``base`` (hydra-style: dicts merge by key)."""
    if isinstance(base, dict) and isinstance(incoming, dict):
        out = ConfigNode(base)
        for k, v in incoming.items():
            out[k] = _deep_merge(base[k], v) if k in base else _wrap(v)
        return out
    return _wrap(incoming)


def _load_yaml(path: str) -> dict:
    with open(path) as fh:
        data = yaml.safe_load(fh)
    return data if data is not None else {}


def _resolve_file(group_dir: str, name: str) -> str:
    path = os.path.join(CONFIG_ROOT, group_dir, f"{name}.yaml")
    if not os.path.exists(path):
        group = group_dir if group_dir else "<root>"
        available = sorted(
            f[:-5]
            for f in os.listdir(os.path.join(CONFIG_ROOT, group_dir))
            if f.endswith(".yaml")
        )
        raise FileNotFoundError(f"No config '{name}' in group '{group}'. Available: {available}")
    return path


def _compose_file(group_dir: str, name: str, group_overrides: dict[str, str]) -> ConfigNode:
    """Compose one YAML file, resolving its defaults list recursively.

    ``group_overrides`` maps group paths relative to this file's directory
    (e.g. ``data`` or ``server``) to replacement config names.
    """
    raw = _load_yaml(_resolve_file(group_dir, name))
    defaults = raw.pop("defaults", [])
    self_body = _wrap(raw)

    merged: ConfigNode = ConfigNode()
    self_seen = False
    for entry in defaults:
        if entry == "_self_":
            merged = _deep_merge(merged, self_body)
            self_seen = True
        elif isinstance(entry, str):
            # Same-group inheritance, e.g. `- _default_optimization_attack`.
            parent = _compose_file(group_dir, entry, group_overrides)
            merged = _deep_merge(merged, parent)
        elif isinstance(entry, dict):
            (sub_group, sub_name), = entry.items()
            sub_name = group_overrides.get(sub_group, sub_name)
            if sub_name is None:
                continue
            sub_dir = os.path.join(group_dir, sub_group) if group_dir else sub_group
            # Strip overrides one level down: `data/db=LMDB` seen from `case` becomes `db=LMDB` inside data.
            nested = {
                k[len(sub_group) + 1:]: v
                for k, v in group_overrides.items()
                if k.startswith(sub_group + "/")
            }
            child = _compose_file(sub_dir, sub_name, nested)
            merged = _deep_merge(merged, {sub_group: child})
        else:
            raise ValueError(f"Unsupported defaults entry {entry!r} in {group_dir}/{name}.yaml")
    if not self_seen:
        merged = _deep_merge(merged, self_body)
    return merged


def _parse_value(text: str) -> Any:
    if text == "" or text.lower() in ("null", "none", "~"):
        return None
    if text.lower() == "true":
        return True
    if text.lower() == "false":
        return False
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


def _set_dotted(cfg: ConfigNode, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for key in keys[:-1]:
        if key not in node or not isinstance(node[key], dict):
            node[key] = ConfigNode()
        node = node[key]
    node[keys[-1]] = _wrap(value)


def compose(config_name: str = "cfg", overrides: Iterable[str] | None = None) -> ConfigNode:
    """Compose the global config, hydra-style.

    Overrides support three forms:
    - ``group=name``      (e.g. ``attack=deepleakage``, top-level group swap)
    - ``group/sub=name``  (e.g. ``case/data=CIFAR100``, nested group swap)
    - ``a.b.c=value``     (dotted leaf override, applied after composition)
    """
    overrides = list(overrides or [])
    group_swaps: dict[str, str] = {}
    dotted: list[tuple[str, Any]] = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override '{ov}' is not of the form key=value")
        key, _, val = ov.partition("=")
        key = key.strip()
        if "." not in key and (
            "/" in key or os.path.isdir(os.path.join(CONFIG_ROOT, key))
        ):
            group_swaps[key] = val.strip()
        else:
            dotted.append((key, _parse_value(val.strip())))

    cfg = _compose_file("", config_name, group_swaps)
    for key, val in dotted:
        _set_dotted(cfg, key, val)
    return cfg
