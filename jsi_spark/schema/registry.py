"""Schema registry: URI → schema resource, with anchor indexing.

The analog of the reference's ``JSI::Registry`` (reference:
lib/jsi/registry.rb:16-138) plus ``JSI::Schema::Ref`` resolution
(lib/jsi/ref.rb:18-176): resources are registered under their canonical
absolute URI; embedded ``$id``s create nested resources; plain-name
anchors (``$anchor`` / ``$dynamicAnchor`` in 2020-12, fragment-only
``$id``/``id`` in drafts <= 07 per lib/jsi/schema/elements/id.rb:18-26)
are indexed per resource. All driver-side, pure Python — executors never
see the registry (compiled plans are shipped instead).
"""

from __future__ import annotations

from urllib.parse import urldefrag, urljoin

from jsi_spark.compile.dialects import Dialect, detect_dialect, iter_subschemas
from jsi_spark.schema.pointer import Pointer


class ResolutionError(ValueError):
    pass


class Resource:
    """One schema resource: a root value with a canonical base URI."""

    __slots__ = ("uri", "document", "dialect", "anchors", "dynamic_anchors")

    def __init__(self, uri: str, document, dialect: Dialect):
        self.uri = uri
        self.document = document
        self.dialect = dialect
        self.anchors: dict[str, Pointer] = {}
        self.dynamic_anchors: dict[str, Pointer] = {}


class Registry:
    def __init__(self, default_dialect=None):
        from jsi_spark.compile.dialects import DRAFT202012

        self.default_dialect = default_dialect or DRAFT202012
        self.resources: dict[str, Resource] = {}
        #: lazy URI → loader callable (analog of registry.rb autoload_uri)
        self._autoload: dict[str, object] = {}

    # -- registration -------------------------------------------------------

    def autoload_uri(self, uri: str, loader) -> None:
        self._autoload[_canon(uri)] = loader

    def register(self, document, uri: str | None = None,
                 dialect: Dialect | None = None) -> str:
        """Register a schema document; returns its canonical base URI.

        Walks the document for embedded ``$id`` resources and anchors
        (reference: lib/jsi/registry.rb:36-63 walks descendants).
        """
        dialect = dialect or detect_dialect(document, self.default_dialect)
        base = uri or ""
        if isinstance(document, dict):
            declared = document.get(dialect.id_keyword)
            if isinstance(declared, str) and not declared.startswith("#"):
                base = urldefrag(urljoin(base, declared)).url
        base = _canon(base)
        res = Resource(base, document, dialect)
        self.resources[base] = res
        self._index(res, document, Pointer(), dialect)
        return base

    def _index(self, res: Resource, schema, ptr: Pointer, dialect: Dialect):
        if not isinstance(schema, dict):
            return
        dialect = detect_dialect(schema, dialect) if "$schema" in schema else dialect
        idv = schema.get(dialect.id_keyword)
        if isinstance(idv, str):
            if idv.startswith("#") and dialect.anchor_in_id:
                # fragment-only id declares a plain-name anchor (<= draft-07)
                res.anchors[idv[1:]] = ptr
            elif not idv.startswith("#") and len(ptr) > 0:
                # embedded resource: new base URI; register subtree as its own
                # resource, keep indexing it there (not in the parent)
                child_uri = urldefrag(urljoin(res.uri, idv)).url
                if child_uri not in self.resources:
                    child = Resource(_canon(child_uri), schema, dialect)
                    self.resources[child.uri] = child
                    self._index(child, schema, Pointer(), dialect)
                return
        if dialect.has_anchor_keyword:
            a = schema.get("$anchor")
            if isinstance(a, str):
                res.anchors[a] = ptr
            da = schema.get("$dynamicAnchor")
            if isinstance(da, str):
                res.dynamic_anchors[da] = ptr
                res.anchors.setdefault(da, ptr)
        for path, sub in iter_subschemas(schema, dialect):
            self._index(res, sub, ptr.child(*path), dialect)

    # -- resolution ---------------------------------------------------------

    def resource_at(self, uri: str) -> Resource:
        key = _canon(urldefrag(uri).url)
        if key not in self.resources and key in self._autoload:
            doc = self._autoload.pop(key)()
            self.register(doc, key)
        if key not in self.resources:
            raise ResolutionError(f"no registered resource for {uri!r}")
        return self.resources[key]

    def resolve(self, uri: str):
        """URI (+fragment) → (Resource, Pointer, schema_value).

        Fragment may be a JSON pointer or a plain-name anchor
        (reference: lib/jsi/ref.rb:50-176).
        """
        base, frag = urldefrag(uri)
        res = self.resource_at(base)
        if frag == "":
            return res, Pointer(), res.document
        if frag.startswith("/"):
            ptr = Pointer.from_fragment(frag)
        else:
            if frag not in res.anchors:
                raise ResolutionError(f"anchor {frag!r} not found in {res.uri!r}")
            ptr = res.anchors[frag]
        return res, ptr, ptr.evaluate(res.document)


def _canon(uri: str) -> str:
    return urldefrag(uri).url
