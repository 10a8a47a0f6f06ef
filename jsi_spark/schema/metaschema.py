"""Meta-schema self-validation: input schema documents are themselves
validated (schema-as-instance) before compilation, so a malformed schema
(e.g. ``{"required": "name"}``) fails with spec-grade keyword-level
errors instead of a best-effort compile error or silent misbehavior.

The reference validates schemas against their dialect's meta-schema
(lib/jsi/metaschema_node.rb bootstrap; shipped drafts under
lib/schemas/json-schema.org/**). Here each dialect's meta-schema is
GENERATED from the same keyword tables the engine interprets
(compile/dialects.py) — the constraints mirror the published draft
meta-schemas (type unions, non-negative integer bounds, schema-valued
applicators recursing via ``$ref: "#"``) and are authored in 2020-12
regardless of the dialect they describe, so the generic Python validator
can run them. Unknown keywords stay unconstrained, exactly like the
official meta-schemas.

Each generated meta-schema validates itself (pinned in
tests/test_metaschema.py), the analog of the reference's
meta-schema-root bootstrap.

Alongside the generated ones, the VERBATIM official draft meta-schema
documents (json-schema.org publications; the reference vendors the
same files under lib/schemas/json-schema.org/**) are embedded under
``metaschemas/`` and compiled through the generic path —
:func:`official_metaschema` — so schema documents can be judged by the
community-adjudicated definition, not only our generated approximation.
The generated meta-schemas remain the runtime compile gate (their
error keys are pinned); tests cross-check the two never disagree on a
verdict, and that each official meta-schema validates ITSELF through
the engine (the reference's metaschema_node.rb self-descriptive
bootstrap).
"""

from __future__ import annotations

import json
from functools import lru_cache

from jsi_spark.compile.dialects import (
    DIALECTS, DRAFT202012, Dialect, detect_dialect,
)

_TYPES = ["array", "boolean", "integer", "null", "number", "object",
          "string"]
_S = {"$ref": "#"}
_ANCHOR_RE = "^[A-Za-z_][-A-Za-z0-9._]*$"


def _schema_array(min_items: int = 1) -> dict:
    return {"type": "array", "minItems": min_items, "items": _S}


def _string_array(**kw) -> dict:
    return {"type": "array", "items": {"type": "string"},
            "uniqueItems": True, **kw}


def _schema_map() -> dict:
    return {"type": "object", "additionalProperties": _S}


def _nonneg_int() -> dict:
    return {"type": "integer", "minimum": 0}


def metaschema_for(dialect: Dialect) -> dict:
    """The validation meta-schema for ``dialect``'s keyword set
    (authored in 2020-12)."""
    p: dict = {
        "$schema": {"type": "string"},
        "$ref": {"type": "string"},
        "type": {"anyOf": [
            {"enum": _TYPES},
            {"type": "array", "items": {"enum": _TYPES},
             "minItems": 1, "uniqueItems": True}]},
        "enum": {"type": "array"},
        "multipleOf": {"type": "number", "exclusiveMinimum": 0},
        "maximum": {"type": "number"},
        "minimum": {"type": "number"},
        "maxLength": _nonneg_int(),
        "minLength": _nonneg_int(),
        "pattern": {"type": "string"},
        "maxItems": _nonneg_int(),
        "minItems": _nonneg_int(),
        "uniqueItems": {"type": "boolean"},
        "maxProperties": _nonneg_int(),
        "minProperties": _nonneg_int(),
        "properties": _schema_map(),
        "patternProperties": _schema_map(),
        "additionalProperties": _S,
        "allOf": _schema_array(),
        "anyOf": _schema_array(),
        "oneOf": _schema_array(),
        "not": _S,
        "format": {"type": "string"},
        "title": {"type": "string"},
        "description": {"type": "string"},
        "default": True,
        "definitions": _schema_map(),
    }
    if dialect.exclusive_minmax_boolean:          # draft-04 forms
        p["exclusiveMaximum"] = {"type": "boolean"}
        p["exclusiveMinimum"] = {"type": "boolean"}
        p["required"] = _string_array(minItems=1)
        p["id"] = {"type": "string"}
    else:
        p["exclusiveMaximum"] = {"type": "number"}
        p["exclusiveMinimum"] = {"type": "number"}
        p["required"] = _string_array()
        p["$id"] = {"type": "string"}
    if dialect.items_tuple_form:                  # drafts ≤ 07
        p["items"] = {"anyOf": [_S, _schema_array()]}
        p["additionalItems"] = _S
        p["dependencies"] = {"type": "object", "additionalProperties": {
            "anyOf": [_S, _string_array()]}}
    else:                                         # 2020-12
        p["items"] = _S
        p["prefixItems"] = _schema_array()
        p["dependentSchemas"] = _schema_map()
        p["dependentRequired"] = {
            "type": "object", "additionalProperties": _string_array()}
    for kw in dialect.keywords:
        if kw in p:
            continue
        shape = _EXTRA_SHAPES.get(kw)
        if shape is not None:
            p[kw] = shape
    return {
        "$schema": DRAFT202012.uri,
        "$id": f"https://jsi-spark.invalid/metaschema/{dialect.name}",
        "title": f"generated validation meta-schema ({dialect.name})",
        "type": ["object", "boolean"],
        "properties": p,
    }


_EXTRA_SHAPES = {
    "const": True,
    "contains": _S,
    "propertyNames": _S,
    "examples": {"type": "array"},
    "if": _S, "then": _S, "else": _S,
    "$comment": {"type": "string"},
    "readOnly": {"type": "boolean"},
    "writeOnly": {"type": "boolean"},
    "deprecated": {"type": "boolean"},
    "contentEncoding": {"type": "string"},
    "contentMediaType": {"type": "string"},
    "$defs": _schema_map(),
    "$anchor": {"type": "string", "pattern": _ANCHOR_RE},
    "$dynamicAnchor": {"type": "string", "pattern": _ANCHOR_RE},
    "$dynamicRef": {"type": "string"},
    "$vocabulary": {"type": "object",
                    "additionalProperties": {"type": "boolean"}},
    "minContains": _nonneg_int(),
    "maxContains": _nonneg_int(),
    "unevaluatedItems": _S,
    "unevaluatedProperties": _S,
}


# -- official draft meta-schemas (verbatim json-schema.org documents) -------

# resolved via importlib.resources, NOT __file__-relative open(): under
# `spark-submit --py-files jsi_spark.zip` the package is zip-imported
# and plain open() on a path inside the archive fails
# (tests/test_spark_submit.py drives that deploy shape end-to-end)
_METASCHEMA_PKG = "jsi_spark.schema"  # metaschemas/ data dir within

# dialect name -> (root URI, relative file of the root document)
OFFICIAL_ROOTS = {
    "draft4": ("http://json-schema.org/draft-04/schema",
               "draft-04.schema.json"),
    "draft6": ("http://json-schema.org/draft-06/schema",
               "draft-06.schema.json"),
    "draft7": ("http://json-schema.org/draft-07/schema",
               "draft-07.schema.json"),
    "draft2020-12": ("https://json-schema.org/draft/2020-12/schema",
                     "draft/2020-12/schema.json"),
}

_2020_VOCABS = ("core", "applicator", "unevaluated", "validation",
                "meta-data", "format-annotation", "content")


@lru_cache(maxsize=1)
def official_metaschema_documents() -> dict:
    """URI -> verbatim official meta-schema document (the four draft
    roots plus 2020-12's seven vocabulary meta-schemas, which the root
    references via relative ``$ref``s in its ``allOf``)."""

    from importlib import resources

    def load(rel):
        node = resources.files(_METASCHEMA_PKG).joinpath("metaschemas")
        for part in rel.split("/"):
            node = node.joinpath(part)
        return json.loads(node.read_text())

    docs = {uri: load(rel) for uri, rel in OFFICIAL_ROOTS.values()}
    for vocab in _2020_VOCABS:
        docs[f"https://json-schema.org/draft/2020-12/meta/{vocab}"] = \
            load(f"draft/2020-12/meta/{vocab}.json")
    return docs


@lru_cache(maxsize=8)
def official_metaschema(dialect_name: str):
    """The OFFICIAL meta-schema for ``dialect_name``, compiled through
    the generic path (a registry preloaded with every embedded official
    document resolves 2020-12's cross-document vocabulary ``$ref``s and
    its ``$dynamicRef: "#meta"`` recursion)."""
    from jsi_spark.compile.compiler import compile_schema
    from jsi_spark.schema.registry import Registry

    docs = official_metaschema_documents()
    reg = Registry()
    for uri, doc in docs.items():
        reg.register(doc, uri=uri)
    root_uri, _ = OFFICIAL_ROOTS[dialect_name]
    return compile_schema(docs[root_uri], registry=reg,
                          dialect=DIALECTS[dialect_name],
                          validate_schema=False)


class SchemaDocumentError(ValueError):
    """Input schema document failed meta-schema validation. ``errors``
    carries the keyword-level Validation errors (message_key, keyword,
    instance_ptr into the SCHEMA document)."""

    def __init__(self, dialect: Dialect, errors):
        self.dialect = dialect
        self.errors = list(errors)
        lines = [f"  {e.instance_ptr or '/'}: {e.message_key}"
                 f" (keyword={e.keyword})" for e in self.errors[:20]]
        super().__init__(
            f"schema document is not a valid {dialect.name} schema:\n"
            + "\n".join(lines))


@lru_cache(maxsize=8)
def _compiled_metaschema(dialect_name: str):
    from jsi_spark.compile.compiler import compile_schema

    return compile_schema(metaschema_for(DIALECTS[dialect_name]),
                          dialect=DRAFT202012, validate_schema=False)


def _set_subschema(container: dict, path: tuple, value) -> None:
    """Replace the subschema at an iter_subschemas path (1 or 2 tokens;
    the second indexes a list by stringified int or a map by key)."""
    if len(path) == 1:
        container[path[0]] = value
    else:
        holder = container[path[0]]
        key = int(path[1]) if isinstance(holder, list) else path[1]
        holder[key] = value


def _extract_foreign_resources(doc, dialect: Dialect):
    """Split out embedded resources that declare a DIFFERENT dialect
    ($schema + their own id keyword — the same identification the
    registry walk uses): each is governed by its own meta-schema, so
    the parent document is validated with those subtrees replaced by
    ``{}`` (valid at any schema location in every draft) and each
    subtree is checked separately against its own dialect."""
    import copy

    from jsi_spark.compile.dialects import iter_subschemas

    doc = copy.deepcopy(doc)
    found: list = []

    def walk(node: dict, d: Dialect) -> None:
        for path, sub in list(iter_subschemas(node, d)):
            if not isinstance(sub, dict):
                continue
            sd = detect_dialect(sub, d) if "$schema" in sub else d
            if sd is not d:
                idv = sub.get(sd.id_keyword)
                if isinstance(idv, str) and not idv.startswith("#"):
                    found.append((sub, sd))
                    _set_subschema(node, path, {})
                    continue
            walk(sub, sd)

    if isinstance(doc, dict):
        walk(doc, dialect)
    return doc, found


def check_schema_document(schema, dialect: Dialect | None = None) -> None:
    """Validate ``schema`` (dict/bool) against its dialect's generated
    meta-schema; raise :class:`SchemaDocumentError` with the leaf
    keyword-level errors on failure. Embedded resources declaring a
    different ``$schema`` are validated against THEIR dialect's
    meta-schema (cross-draft documents: a draft-04 resource embedded in
    a 2020-12 document may use boolean exclusiveMaximum, and vice
    versa)."""
    if dialect is None:
        dialect = detect_dialect(schema)
    pruned, embedded = _extract_foreign_resources(schema, dialect)
    result = _compiled_metaschema(dialect.name).validate(pruned)
    if not result.valid:
        raise SchemaDocumentError(dialect, result.leaf_errors())
    for sub, sub_dialect in embedded:
        check_schema_document(sub, sub_dialect)
