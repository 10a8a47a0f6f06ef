"""Meta-schema self-validation of input schema documents: malformed
schemas fail at compile with keyword-level errors (reference:
lib/jsi/metaschema_node.rb; test/metaschema_node_test.rb is the model).
No Spark needed — this is the driver-side generic path."""

import pytest

from jsi_spark.compile.compiler import compile_schema
from jsi_spark.compile.dialects import DIALECTS, detect_dialect
from jsi_spark.schema.metaschema import (
    OFFICIAL_ROOTS, SchemaDocumentError, check_schema_document,
    metaschema_for, official_metaschema, official_metaschema_documents,
)


@pytest.mark.parametrize("name", sorted(DIALECTS))
def test_metaschema_validates_itself(name):
    """The reference's MetaSchemaNode bootstrap analog: each generated
    meta-schema is a valid schema document of its authoring dialect."""
    check_schema_document(metaschema_for(DIALECTS[name]))


BAD = [
    ({"required": "name"}, "required", "type.not_match"),
    ({"required": ["a", "a"]}, "required", "uniqueItems"),
    ({"type": "strnig"}, "type", "enum.none_equal"),
    ({"maxLength": -1}, "maxLength", "minimum"),
    ({"maxLength": 2.5}, "maxLength", "type.not_match"),
    ({"multipleOf": 0}, "multipleOf", "exclusiveMinimum"),
    ({"properties": {"x": 5}}, "properties", "type.not_match"),
    ({"allOf": []}, "allOf", "minItems"),
    ({"allOf": {"type": "string"}}, "allOf", "type.not_match"),
    ({"enum": "abc"}, "enum", "type.not_match"),
    ({"pattern": 5}, "pattern", "type.not_match"),
    ({"$anchor": "0bad"}, "$anchor", "pattern"),
    ({"dependentRequired": {"a": "b"}}, "dependentRequired",
     "type.not_match"),
    ({"$vocabulary": {"x": "yes"}}, "$vocabulary", "type.not_match"),
    # nested: the malformed keyword sits in a subschema
    ({"properties": {"x": {"minItems": -3}}}, "minItems", "minimum"),
    ({"items": {"not": {"required": 7}}}, "required", "type.not_match"),
]


@pytest.mark.parametrize("schema,kw,frag", BAD,
                         ids=[f"{k}-{f}" for _, k, f in BAD])
def test_malformed_schema_fails_with_keyword_errors(schema, kw, frag):
    with pytest.raises(SchemaDocumentError) as ei:
        compile_schema(schema)
    keys = " ".join(f"{e.keyword}:{e.message_key}:{e.instance_ptr}"
                    for e in ei.value.errors)
    assert frag in keys, keys


def test_draft4_boolean_exclusive_and_nonempty_required():
    # draft-04: exclusiveMaximum is a BOOLEAN, required must be non-empty
    compile_schema({"maximum": 5, "exclusiveMaximum": True},
                   dialect="draft4")
    with pytest.raises(SchemaDocumentError):
        compile_schema({"exclusiveMaximum": 5}, dialect="draft4")
    with pytest.raises(SchemaDocumentError):
        compile_schema({"required": []}, dialect="draft4")
    # ≥06: numeric exclusiveMaximum, empty required both fine
    compile_schema({"exclusiveMaximum": 5}, dialect="draft6")
    compile_schema({"required": []}, dialect="draft6")


def test_tuple_items_by_dialect():
    tuple_form = {"items": [{"type": "string"}, {"type": "integer"}]}
    compile_schema(dict(tuple_form), dialect="draft7")
    with pytest.raises(SchemaDocumentError):
        compile_schema(dict(tuple_form), dialect="draft2020-12")


def test_valid_schemas_still_compile():
    compile_schema({"type": "object",
                    "properties": {"a": {"minLength": 2}},
                    "required": ["a"]})
    compile_schema(True)
    compile_schema(False)
    compile_schema({})


def test_opt_out():
    compile_schema({"required": "name"}, validate_schema=False)


def test_error_points_into_schema_document():
    with pytest.raises(SchemaDocumentError) as ei:
        compile_schema({"properties": {"x": {"required": "nope"}}})
    ptrs = [e.instance_ptr for e in ei.value.errors]
    assert any(p == "/properties/x/required" for p in ptrs), ptrs


# -- verbatim official draft meta-schemas (metaschemas/*.json) --------------

@pytest.mark.parametrize("name", sorted(OFFICIAL_ROOTS))
def test_official_metaschema_validates_itself(name):
    """The reference's self-descriptive bootstrap, with the REAL
    documents: each official meta-schema, compiled through the generic
    path (2020-12 resolves its seven vocabulary $refs and its
    $dynamicRef '#meta' recursion across documents), validates its own
    document."""
    docs = official_metaschema_documents()
    ms = official_metaschema(name)
    assert ms.is_valid(docs[OFFICIAL_ROOTS[name][0]])


def test_official_2020_validates_vocab_metas_and_generated():
    """2020-12's vocabulary meta-schemas are themselves valid 2020-12
    schemas, and so are our four GENERATED meta-schemas (all authored
    in 2020-12)."""
    ms = official_metaschema("draft2020-12")
    docs = official_metaschema_documents()
    for uri, doc in docs.items():
        if "/meta/" in uri:
            assert ms.is_valid(doc), uri
    for name in sorted(DIALECTS):
        assert ms.is_valid(metaschema_for(DIALECTS[name])), name


@pytest.mark.parametrize("schema,kw,frag", BAD,
                         ids=[f"official-{k}-{f}" for _, k, f in BAD])
def test_malformed_schemas_fail_official_metaschema(schema, kw, frag):
    """Every malformed-schema case our generated meta-schema rejects is
    also rejected by the OFFICIAL 2020-12 meta-schema — the generated
    gate is not inventing constraints the spec doesn't have."""
    ms = official_metaschema("draft2020-12")
    assert not ms.is_valid(schema), (kw, frag)


def test_generated_and_official_agree_on_fixture_corpus():
    """Verdict agreement between generated and official meta-schemas
    over every schema document in the conformance fixture corpus, per
    its own draft (the generated gate may only be LESS strict than the
    official document on valid schemas — and on this corpus both sides
    must say valid)."""
    from suite_fixtures import SUITE

    from jsi_spark.schema.metaschema import (
        _compiled_metaschema, _extract_foreign_resources,
    )

    n = 0
    for group in SUITE:
        schema = group["schema"]
        if not isinstance(schema, (dict, bool)):
            continue
        dialect = detect_dialect(schema)
        # cross-draft documents: each embedded foreign resource is
        # governed by ITS metaschema (same split check_schema_document
        # applies); validate each piece per its own dialect
        pieces = [(schema, dialect)]
        if isinstance(schema, dict):
            pruned, embedded = _extract_foreign_resources(schema, dialect)
            pieces = [(pruned, dialect)] + embedded
        for doc, d in pieces:
            official = official_metaschema(d.name)
            generated = _compiled_metaschema(d.name)
            o, g = official.is_valid(doc), generated.is_valid(doc)
            assert o and g, (group["description"], d.name, o, g)
        n += 1
    assert n > 150  # the corpus is supposed to be big
