"""RFC 6901 JSON Pointer.

Semantics match the reference's ``JSI::Ptr`` (reference: lib/jsi/ptr.rb:4-130,
251-276): a frozen token sequence with evaluate / parent / child, plus
URI-fragment encode/decode used by ``$ref`` resolution.
"""

from __future__ import annotations

from urllib.parse import quote, unquote


class PointerError(ValueError):
    pass


def escape_token(token: str) -> str:
    return token.replace("~", "~0").replace("/", "~1")


def unescape_token(token: str) -> str:
    return token.replace("~1", "/").replace("~0", "~")


class Pointer:
    """Immutable JSON pointer (tuple of string tokens)."""

    __slots__ = ("tokens",)

    def __init__(self, tokens: tuple[str, ...] = ()):
        self.tokens = tuple(str(t) for t in tokens)

    @classmethod
    def from_fragment(cls, fragment: str) -> "Pointer":
        """Parse a URI fragment like ``#/foo/b%20ar`` (percent-decoded)."""
        return cls.from_pointer(unquote(fragment))

    @classmethod
    def from_pointer(cls, ptr: str) -> "Pointer":
        if ptr == "":
            return cls(())
        if not ptr.startswith("/"):
            raise PointerError(f"invalid JSON pointer: {ptr!r}")
        return cls(tuple(unescape_token(t) for t in ptr.split("/")[1:]))

    def __str__(self) -> str:
        return "".join("/" + escape_token(t) for t in self.tokens)

    def fragment(self) -> str:
        return quote(str(self), safe="/~!$&'()*+,;=:@")

    def __repr__(self) -> str:
        return f"Pointer({str(self)!r})"

    def __eq__(self, other) -> bool:
        return isinstance(other, Pointer) and self.tokens == other.tokens

    def __hash__(self) -> int:
        return hash(self.tokens)

    def __len__(self) -> int:
        return len(self.tokens)

    def child(self, *tokens) -> "Pointer":
        return Pointer(self.tokens + tuple(str(t) for t in tokens))

    def parent(self) -> "Pointer":
        if not self.tokens:
            raise PointerError("root pointer has no parent")
        return Pointer(self.tokens[:-1])

    def evaluate(self, document):
        """Walk the document (reference: lib/jsi/ptr.rb evaluate)."""
        node = document
        for tok in self.tokens:
            if isinstance(node, dict):
                if tok not in node:
                    raise PointerError(f"key {tok!r} not found at {self}")
                node = node[tok]
            elif isinstance(node, list):
                if not tok.isdigit():
                    raise PointerError(f"bad array index {tok!r} at {self}")
                i = int(tok)
                if i >= len(node):
                    raise PointerError(f"index {i} out of range at {self}")
                node = node[i]
            else:
                raise PointerError(
                    f"cannot descend into {type(node).__name__} with {tok!r}"
                )
        return node
