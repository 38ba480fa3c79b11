"""Name -> factory registry.

Capability parity with the reference's registry
(`diffnext/utils/registry.py:22-54`): register callables under one or more
string keys, look them up lazily, and optionally bind keyword defaults at
registration time.
"""

import functools
from typing import Any, Callable, Dict, Iterable, Optional, Union


class Registry:
    """A string-keyed registry of factory callables."""

    def __init__(self, name: str):
        self.name = name
        self._registry: Dict[str, Callable] = {}

    def has(self, key: str) -> bool:
        return key in self._registry

    def keys(self) -> Iterable[str]:
        return self._registry.keys()

    def register(self, key: Union[str, Iterable[str]], fn: Optional[Callable] = None, **kwargs):
        """Register ``fn`` (or decorate) under ``key``; kwargs become partial defaults."""

        def _do_register(k: str, f: Callable):
            if k in self._registry:
                raise KeyError(f"'{k}' already registered in <{self.name}>")
            self._registry[k] = functools.partial(f, **kwargs) if kwargs else f

        keys = [key] if isinstance(key, str) else list(key)
        if fn is not None:
            for k in keys:
                _do_register(k, fn)
            return fn

        def decorator(inner: Callable) -> Callable:
            for k in keys:
                _do_register(k, inner)
            return inner

        return decorator

    def get(self, key: str) -> Callable:
        if key not in self._registry:
            known = ", ".join(sorted(self._registry))
            raise KeyError(f"'{key}' is not registered in <{self.name}>. Known: [{known}]")
        return self._registry[key]

    def create(self, key: str, *args, **kwargs) -> Any:
        """Instantiate the factory registered under ``key``."""
        return self.get(key)(*args, **kwargs)

    def __contains__(self, key: str) -> bool:
        return self.has(key)

    def __repr__(self) -> str:
        return f"Registry(name={self.name!r}, keys={sorted(self._registry)})"
