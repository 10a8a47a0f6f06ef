"""Custom-keyword plugin surface.

The reference lets applications extend dialects with custom
vocabularies (``Vocabulary.new(elements:)`` + ``describes_schema!``,
lib/jsi/schema.rb:560-604; suite_test.rb:17-24 registers test-only
keywords the same way). The engine analog: a registered keyword
contributes

- ``compile_fn(schema_value) -> check(instance) -> bool`` — the generic
  path closure, compiled once per schema node;
- optional ``typed_fn(schema_value, col, dtype) -> Column | None`` —
  the typed-path Column compiler; returning ``None`` (or omitting it)
  makes the typed compiler decline with ``TypedCompileError`` so the
  schema routes to the generic path, exactly like any other
  typed-unsupported construct.

Failures emit ``validation.keyword.<name>.invalid`` rows, shaped like
every built-in violation. Registration is read at SCHEMA COMPILE time:
schemas compiled before ``register_keyword`` are unaffected.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional


@dataclass(frozen=True)
class CustomKeyword:
    name: str
    compile_fn: Callable
    typed_fn: Optional[Callable] = None


_REGISTRY: dict = {}


def register_keyword(name: str, compile_fn: Callable,
                     typed_fn: Callable | None = None) -> None:
    _REGISTRY[name] = CustomKeyword(name, compile_fn, typed_fn)


def unregister_keyword(name: str) -> None:
    _REGISTRY.pop(name, None)


def registered() -> dict:
    return dict(_REGISTRY)
