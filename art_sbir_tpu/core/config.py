"""Typed configuration and string-keyed registries.

The reference dispatches components by ``eval()`` on user strings
(reference `transformations.py:57-59`, `data_preparation.py:735-739`,
`visualization.py:499`). Here every string-keyed factory goes through an
explicit :class:`Registry`, and experiment configuration is plain frozen
dataclasses that serialize to the JSON results contract.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Callable, Dict, Generic, Iterator, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    """An explicit, typo-checked string->factory mapping."""

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, T] = {}

    def register(self, name: str, value: T | None = None) -> Callable[[T], T] | T:
        if value is not None:
            self._check_new(name)
            self._entries[name] = value
            return value

        def deco(v: T) -> T:
            self._check_new(name)
            self._entries[name] = v
            return v

        return deco

    def _check_new(self, name: str) -> None:
        if name in self._entries:
            raise KeyError(f"duplicate {self.kind} registration: {name!r}")

    def __getitem__(self, name: str) -> T:
        try:
            return self._entries[name]
        except KeyError:
            known = ", ".join(sorted(self._entries))
            raise KeyError(f"unknown {self.kind} {name!r}; known: {known}") from None

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def __iter__(self) -> Iterator[str]:
        return iter(sorted(self._entries))

    def names(self) -> list[str]:
        return sorted(self._entries)


def asdict_jsonable(cfg: Any) -> Dict[str, Any]:
    """Dataclass -> JSON-ready dict (Paths to str, tuples to lists)."""

    def conv(v: Any) -> Any:
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            return {f.name: conv(getattr(v, f.name)) for f in dataclasses.fields(v)}
        if isinstance(v, Path):
            return str(v)
        if isinstance(v, (list, tuple)):
            return [conv(x) for x in v]
        if isinstance(v, dict):
            return {str(k): conv(x) for k, x in v.items()}
        return v

    return conv(cfg)


def dump_config(cfg: Any, path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(asdict_jsonable(cfg), indent=4))
