"""Name → constructor registries.

The reference keeps string-keyed registries for models, layers, tasks,
optimizers, schedulers and callbacks (`src/utils/registry.py:1-81`) so that
experiments are pure config. We keep the same idea with a tiny generic
registry; entries are registered by decorator at import time, so importing
`dna_tpu.models` / `dna_tpu.data` / `dna_tpu.train` populates everything.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Generic, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, T] = {}

    def register(self, name: str) -> Callable[[T], T]:
        def deco(obj: T) -> T:
            if name in self._entries:
                raise KeyError(f"duplicate {self.kind} registry entry {name!r}")
            self._entries[name] = obj
            return obj

        return deco

    def __getitem__(self, name: str) -> T:
        try:
            return self._entries[name]
        except KeyError:
            raise KeyError(
                f"unknown {self.kind} {name!r}; available: {sorted(self._entries)}"
            ) from None

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def names(self):
        return sorted(self._entries)


# The object kinds mirroring the reference's registries (src/utils/registry.py).
model = Registry["Callable[..., Any]"]("model")
layer = Registry["Callable[..., Any]"]("layer")
task = Registry["Callable[..., Any]"]("task")
dataset = Registry["Callable[..., Any]"]("dataset")
optimizer = Registry["Callable[..., Any]"]("optimizer")
scheduler = Registry["Callable[..., Any]"]("scheduler")
encoder = Registry["Callable[..., Any]"]("encoder")
decoder = Registry["Callable[..., Any]"]("decoder")
experiment = Registry["Callable[..., Any]"]("experiment")
# (the reference also has a callback registry; PL-style callbacks are
# integrated into TrainLoop directly — timer/norms/eval/staging — so no
# registry indirection is needed here)


def instantiate(reg: Registry, spec: Any, *args, **extra):
    """Instantiate from a `{'name': ..., **kwargs}` spec (reference semantics:
    `src/utils/config.py:63-104` `_name_`-keyed partial instantiation)."""
    if spec is None:
        return None
    if isinstance(spec, str):
        return reg[spec](*args, **extra)
    spec = dict(spec)
    name = spec.pop("name", None) or spec.pop("_name_")
    return reg[name](*args, **spec, **extra)
