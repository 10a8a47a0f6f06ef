"""Validation results and errors.

Mirrors the reference's result algebra (reference:
lib/jsi/validation/result.rb:96-228 ``Result::Full`` / ``Result::Valid``;
lib/jsi/validation/error.rb:5-38 ``Validation::Error`` fields
(message, keyword, schema, instance_ptr, nested_errors);
``evaluated_tokens`` merged only from *valid* in-place results per
result.rb:47-63). ``message_key`` values reuse JSI's i18n keys verbatim
(e.g. ``validation.keyword.type.not_match``, elements/type.rb:35) for
test parity.
"""

from __future__ import annotations


class Error:
    __slots__ = ("message_key", "keyword", "instance_ptr", "schema_location",
                 "nested")

    def __init__(self, message_key: str, keyword: str | None,
                 instance_ptr: str, schema_location: str,
                 nested: tuple = ()):
        self.message_key = message_key
        self.keyword = keyword
        self.instance_ptr = instance_ptr
        self.schema_location = schema_location
        self.nested = nested

    def walk(self):
        """Pre-order traversal of this error and its nested errors."""
        yield self
        for e in self.nested:
            yield from e.walk()

    def __repr__(self):
        return (f"Error({self.message_key} kw={self.keyword} "
                f"at={self.instance_ptr!r} schema={self.schema_location})")


class Result:
    """Outcome of validating one instance node against one schema node."""

    __slots__ = ("valid", "errors", "evaluated_items", "evaluated_props")

    def __init__(self):
        self.valid: bool = True
        self.errors: list[Error] = []
        #: array indices evaluated by item applicators (for unevaluatedItems)
        self.evaluated_items: set[int] = set()
        #: property names evaluated by property applicators
        self.evaluated_props: set[str] = set()

    def all_errors(self):
        for e in self.errors:
            yield from e.walk()

    def leaf_errors(self):
        """Errors with no nested errors — the most specific failures."""
        for e in self.all_errors():
            if not e.nested:
                yield e

    def violation_rows(self):
        """Flattened rows (keyword, instance_ptr, message_key,
        schema_location) for the violations table (FIXTURES.md §5)."""
        return [
            (e.keyword, e.instance_ptr, e.message_key, e.schema_location)
            for e in self.all_errors()
        ]

    def __repr__(self):
        return f"Result(valid={self.valid}, errors={len(self.errors)})"


_VALID_SINGLETON = Result()


def valid_result() -> Result:
    return _VALID_SINGLETON
