"""Config system: nested dict configs with YAML files + dotted CLI overrides.

Capability parity with the reference's omegaconf setup
(`diffnext/utils/omegaconf_utils.py:34-102`): load a YAML, merge
``key.sub=value`` command-line overrides, resolve ``target:``-style declarative
object construction, and flatten for experiment trackers. Implemented on plain
dicts so it stays dependency-light and picklable.
"""

import ast
import importlib
from typing import Any, Callable, Dict, List, Optional

import yaml


class Config(dict):
    """A dict with attribute access and recursive wrapping."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any):
        self[name] = value

    @classmethod
    def wrap(cls, obj: Any) -> Any:
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return type(obj)(cls.wrap(v) for v in obj)
        return obj

    def to_dict(self) -> Dict:
        def unwrap(obj):
            if isinstance(obj, dict):
                return {k: unwrap(v) for k, v in obj.items()}
            if isinstance(obj, (list, tuple)):
                return [unwrap(v) for v in obj]
            return obj

        return unwrap(self)


def _parse_value(text: str) -> Any:
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


def set_by_path(cfg: Dict, dotted: str, value: Any):
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, Config())
    node[keys[-1]] = Config.wrap(value)


def get_by_path(cfg: Dict, dotted: str, default: Any = None) -> Any:
    node = cfg
    for k in dotted.split("."):
        if not isinstance(node, dict) or k not in node:
            return default
        node = node[k]
    return node


def merge(base: Dict, override: Dict) -> Dict:
    """Recursively merge ``override`` into ``base`` (returns base)."""
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            merge(base[k], v)
        else:
            base[k] = Config.wrap(v)
    return base


def load_config(path: str) -> Config:
    with open(path) as f:
        return Config.wrap(yaml.safe_load(f) or {})


def get_config(argv: Optional[List[str]] = None, defaults: Optional[Dict] = None) -> Config:
    """Build a config from CLI args of the form ``config=<yaml>`` and ``a.b=v``.

    Mirrors the reference CLI contract (`omegaconf_utils.py:34-38`).
    """
    cfg = Config.wrap(defaults or {})
    argv = list(argv or [])
    for arg in argv:
        if "=" not in arg:
            raise ValueError(f"Expected key=value argument, got: {arg!r}")
        key, value = arg.split("=", 1)
        if key == "config":
            merge(cfg, load_config(value))
    for arg in argv:
        key, value = arg.split("=", 1)
        if key != "config":
            set_by_path(cfg, key, _parse_value(value))
    return cfg


def locate(dotted_path: str) -> Any:
    """Import an object from a dotted module path."""
    module_path, _, attr = dotted_path.rpartition(".")
    if not module_path:
        raise ImportError(f"Not a dotted path: {dotted_path!r}")
    return getattr(importlib.import_module(module_path), attr)


def config_to_object(node: Any, **extra_kwargs) -> Any:
    """Instantiate a ``{"target": "pkg.mod.Cls", "params": {...}}`` config node.

    Parity with `omegaconf_utils.py:51-73`. Non-target nodes pass through.
    """
    if not isinstance(node, dict) or "target" not in node:
        return node
    cls: Callable = locate(node["target"])
    params = dict(node.get("params", {}) or {})
    params.update(extra_kwargs)
    return cls(**params)


def flatten_config(cfg: Dict, prefix: str = "") -> Dict[str, Any]:
    """Flatten nested config to dotted keys (for wandb-style trackers)."""
    flat = {}
    for k, v in cfg.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(flatten_config(v, key))
        else:
            flat[key] = v
    return flat
