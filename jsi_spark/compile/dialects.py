"""Draft dialects: per-draft keyword sets + semantic flags.

The analog of the reference's Vocabulary/Dialect composition
(reference: lib/jsi/schema/dialect.rb:10-102, draft04.rb / draft06.rb /
draft07.rb / draft202012.rb). Each dialect declares which keywords are
interpreted, how ``$ref`` composes with siblings (exclusive in drafts
04/06/07 per ref.rb:9-20, non-exclusive in 2020-12 per draft202012.rb:36),
the draft-04 integer rule (cxt.rb:51-55, draft04.rb:114-118) and the
boolean exclusiveMaximum/Minimum form (numeric_draft04.rb).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Dialect:
    name: str
    uri: str
    #: keyword that establishes base URI ("id" in draft-04, "$id" after)
    id_keyword: str
    #: "#name" values of the id keyword act as plain-name anchors (drafts <= 07)
    anchor_in_id: bool
    #: $anchor / $dynamicAnchor keywords recognised (2020-12)
    has_anchor_keyword: bool
    #: $ref aborts all sibling keywords (drafts 04/06/07)
    ref_exclusive: bool
    #: draft-04: 1.0 is NOT an integer; later drafts: it is
    integer_disallows_0_fraction: bool
    #: draft-04: exclusiveMaximum / exclusiveMinimum are booleans modifying
    #: maximum / minimum; later drafts: standalone numeric assertions
    exclusive_minmax_boolean: bool
    #: drafts <= 07: items may be a tuple (array of schemas) + additionalItems
    items_tuple_form: bool
    keywords: frozenset = field(default_factory=frozenset)
    #: keyword aliases for named-subschema containers
    defs_keywords: tuple = ("definitions",)


_COMMON = {
    "$schema", "$ref", "type", "enum", "multipleOf", "maximum", "minimum",
    "maxLength", "minLength", "pattern", "items", "additionalItems",
    "maxItems", "minItems", "uniqueItems", "maxProperties", "minProperties",
    "required", "properties", "patternProperties", "additionalProperties",
    "dependencies", "allOf", "anyOf", "oneOf", "not", "format", "title",
    "description", "default", "definitions",
}

DRAFT04 = Dialect(
    name="draft4",
    uri="http://json-schema.org/draft-04/schema#",
    id_keyword="id",
    anchor_in_id=True,
    has_anchor_keyword=False,
    ref_exclusive=True,
    integer_disallows_0_fraction=True,
    exclusive_minmax_boolean=True,
    items_tuple_form=True,
    keywords=frozenset(_COMMON | {"id", "exclusiveMaximum", "exclusiveMinimum"}),
)

DRAFT06 = Dialect(
    name="draft6",
    uri="http://json-schema.org/draft-06/schema#",
    id_keyword="$id",
    anchor_in_id=True,
    has_anchor_keyword=False,
    ref_exclusive=True,
    integer_disallows_0_fraction=False,
    exclusive_minmax_boolean=False,
    items_tuple_form=True,
    keywords=frozenset(
        _COMMON
        | {"$id", "const", "contains", "propertyNames",
           "exclusiveMaximum", "exclusiveMinimum", "examples"}
    ),
)

DRAFT07 = Dialect(
    name="draft7",
    uri="http://json-schema.org/draft-07/schema#",
    id_keyword="$id",
    anchor_in_id=True,
    has_anchor_keyword=False,
    ref_exclusive=True,
    integer_disallows_0_fraction=False,
    exclusive_minmax_boolean=False,
    items_tuple_form=True,
    keywords=frozenset(
        DRAFT06.keywords
        | {"if", "then", "else", "$comment", "readOnly", "writeOnly",
           "contentEncoding", "contentMediaType"}
    ),
)

DRAFT202012 = Dialect(
    name="draft2020-12",
    uri="https://json-schema.org/draft/2020-12/schema",
    id_keyword="$id",
    anchor_in_id=False,
    has_anchor_keyword=True,
    ref_exclusive=False,
    integer_disallows_0_fraction=False,
    exclusive_minmax_boolean=False,
    items_tuple_form=False,
    keywords=frozenset(
        (DRAFT07.keywords - {"dependencies", "additionalItems", "definitions"})
        | {"$defs", "$anchor", "$dynamicRef", "$dynamicAnchor", "$vocabulary",
           "prefixItems", "dependentSchemas", "dependentRequired",
           "minContains", "maxContains", "unevaluatedItems",
           "unevaluatedProperties", "deprecated", "contentSchema"}
    ),
    defs_keywords=("$defs", "definitions"),
)

DIALECTS = {d.name: d for d in (DRAFT04, DRAFT06, DRAFT07, DRAFT202012)}

#: $schema URI (sans trailing '#') → dialect
_BY_URI = {}
for _d in DIALECTS.values():
    _BY_URI[_d.uri.rstrip("#")] = _d
# common aliases
_BY_URI["http://json-schema.org/schema"] = DRAFT07
_BY_URI["https://json-schema.org/draft-04/schema"] = DRAFT04
_BY_URI["https://json-schema.org/draft-06/schema"] = DRAFT06
_BY_URI["https://json-schema.org/draft-07/schema"] = DRAFT07
_BY_URI["http://json-schema.org/draft-06/schema"] = DRAFT06
_BY_URI["http://json-schema.org/draft-07/schema"] = DRAFT07


def dialect_for_schema_uri(uri: str) -> Dialect | None:
    return _BY_URI.get(uri.rstrip("#"))


def detect_dialect(schema, default: Dialect = DRAFT202012) -> Dialect:
    """Pick the dialect from ``$schema`` (reference: lib/jsi/schema.rb:296-304;
    default metaschema behavior lib/jsi.rb:159-182)."""
    if isinstance(schema, dict):
        meta = schema.get("$schema")
        if isinstance(meta, str):
            d = dialect_for_schema_uri(meta)
            if d is not None:
                return d
    return default


# --- subschema locations (for resource/anchor indexing walks) -------------

#: keyword → shape: 's' single schema, 'l' list of schemas,
#: 'm' map of schemas, 'sl' schema-or-list, 'dep' dependencies map
SUBSCHEMA_SHAPE = {
    "additionalItems": "s", "additionalProperties": "s", "not": "s",
    "if": "s", "then": "s", "else": "s", "contains": "s",
    "propertyNames": "s", "unevaluatedItems": "s",
    "unevaluatedProperties": "s", "items": "sl",
    "allOf": "l", "anyOf": "l", "oneOf": "l", "prefixItems": "l",
    "properties": "m", "patternProperties": "m", "definitions": "m",
    "$defs": "m", "dependentSchemas": "m",
    "dependencies": "dep",
    # annotation-only, but a real subschema location: anchors/$ids declared
    # inside it are resolvable (reference:
    # lib/jsi/schema/elements/content_schema.rb:5-16, wired only in the
    # 2020-12 dialect at draft202012.rb:247 — gated in iter_subschemas)
    "contentSchema": "s",
}


def iter_subschemas(schema: dict, dialect: Dialect):
    """Yield (token_path_tuple, subschema_value) for direct subschemas."""
    for kw, shape in SUBSCHEMA_SHAPE.items():
        if kw not in schema:
            continue
        if kw == "contentSchema" and kw not in dialect.keywords:
            continue  # only the 2020-12 dialect treats it as a subschema
        v = schema[kw]
        if shape == "s" or (shape == "sl" and isinstance(v, (dict, bool))):
            if isinstance(v, (dict, bool)):
                yield (kw,), v
        elif shape in ("l",) or (shape == "sl" and isinstance(v, list)):
            if isinstance(v, list):
                for i, sub in enumerate(v):
                    if isinstance(sub, (dict, bool)):
                        yield (kw, str(i)), sub
        elif shape == "m":
            if isinstance(v, dict):
                for k, sub in v.items():
                    if isinstance(sub, (dict, bool)):
                        yield (kw, k), sub
        elif shape == "dep":
            if isinstance(v, dict):
                for k, sub in v.items():
                    if isinstance(sub, (dict, bool)):  # schema-form only
                        yield (kw, k), sub
