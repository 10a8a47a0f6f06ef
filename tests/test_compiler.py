"""Keyword conformance for the driver-side compiler (no Spark needed).

Mirrors the reference's suite runner assertions
(/root/reference/test/json_schema_test_suite/suite_test.rb:126-130):
full-result validity must equal boolean(short-circuit) validity.
"""

import pytest

from jsi_spark.compile.compiler import compile_schema
from jsi_spark.schema.pointer import Pointer
from jsi_spark.schema.registry import Registry

from suite_fixtures import SUITE


def _cases():
    for group in SUITE:
        for i, t in enumerate(group["tests"]):
            yield pytest.param(
                group["schema"], t["data"], t["valid"],
                id=f"{group['description']}#{i}:{t['description'] or t['valid']}")


@pytest.mark.parametrize("schema,data,valid", list(_cases()))
def test_suite_case(schema, data, valid):
    cs = compile_schema(schema)
    full = cs.validate(data, collect=True)
    assert full.valid == valid, (
        f"full-result verdict {full.valid} != expected {valid}; "
        f"errors: {[e.message_key for e in full.all_errors()]}")
    # boolean (short-circuit) mode must agree with full mode
    assert cs.is_valid(data) == valid
    # invalid results must carry at least one error
    if not valid:
        assert list(full.all_errors())


def test_error_rows_shape():
    cs = compile_schema({
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object",
        "required": ["spans"],
        "properties": {
            "spans": {"type": "array",
                      "items": {"type": "object",
                                "required": ["kind"],
                                "properties": {
                                    "kind": {"enum": ["text", "image"]}}}},
        },
    })
    res = cs.validate({"spans": [{"kind": "text"}, {"kind": "bogus"},
                                 {"offset": 1}]})
    assert not res.valid
    leafs = {(e.keyword, e.instance_ptr) for e in res.leaf_errors()}
    assert ("enum", "/spans/1/kind") in leafs
    assert ("required", "/spans/2") in leafs
    # message keys reuse JSI's i18n keys verbatim
    keys = {e.message_key for e in res.all_errors()}
    assert "validation.keyword.enum.none_equal" in keys
    assert "validation.keyword.required.missing_property_names" in keys


def test_cross_document_ref_via_registry():
    """Remote-registration analog of suite_test.rb:30-63 (remotes under
    http://localhost:1234/...)."""
    reg = Registry()
    reg.register({"$schema": "https://json-schema.org/draft/2020-12/schema",
                  "type": "integer"},
                 uri="http://localhost:1234/integer.json")
    cs = compile_schema({"$ref": "http://localhost:1234/integer.json"},
                        registry=reg)
    assert cs.is_valid(3)
    assert not cs.is_valid("x")


def test_registry_autoload():
    reg = Registry()
    reg.autoload_uri("http://localhost:1234/lazy.json",
                     lambda: {"type": "string"})
    cs = compile_schema({"$ref": "http://localhost:1234/lazy.json"},
                        registry=reg)
    assert cs.is_valid("ok")
    assert not cs.is_valid(5)


def test_id_inside_enum_is_not_an_identifier():
    """Official-suite semantics (draft2020-12/id.json): an "$id" that
    appears inside an enum VALUE is plain data — it must not register a
    resolvable resource, so a $ref to that URI fails resolution
    (surfaced as SchemaCompileError wrapping the ResolutionError)."""
    from jsi_spark.compile.compiler import SchemaCompileError

    schema = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$defs": {"e": {"enum": [
            {"$id": "https://example.test/enum-only.json",
             "type": "null"}]}},
        "$ref": "https://example.test/enum-only.json"}
    with pytest.raises(SchemaCompileError):
        compile_schema(schema)
    # same for const values
    schema2 = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$defs": {"c": {"const":
                        {"$anchor": "only-data", "type": "null"}}},
        "$ref": "#only-data"}
    with pytest.raises(SchemaCompileError):
        compile_schema(schema2)


def test_pointer_roundtrip():
    p = Pointer.from_pointer("/a~1b/3/x~0y")
    assert p.tokens == ("a/b", "3", "x~y")
    assert str(p) == "/a~1b/3/x~0y"
    assert p.evaluate({"a/b": [0, 1, 2, {"x~y": "found"}]}) == "found"


def test_evaluated_annotation_sets():
    """Application-suite analog (reference test/application_suite_test.rb):
    assert which child tokens were evaluated, per branch validity."""
    cs = compile_schema({
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "prefixItems": [{"type": "string"}],
        "contains": {"type": "integer"},
    })
    res = cs.validate(["a", 1, True, 2])
    assert res.evaluated_items == {0, 1, 3}  # prefix + contains matches


def test_remote_ref_graph_multi_hop():
    """Remote schema graph analog of the official suite's remotes/
    (suite_test.rb:30-63): a remote that itself refs another remote,
    plus a ref to a FRAGMENT inside a remote document."""
    reg = Registry()
    reg.register({"$id": "http://localhost:1234/a.json",
                  "$ref": "http://localhost:1234/b.json"},
                 uri="http://localhost:1234/a.json")
    reg.register({"$id": "http://localhost:1234/b.json",
                  "$defs": {"leaf": {"type": "integer"}},
                  "$ref": "#/$defs/leaf"},
                 uri="http://localhost:1234/b.json")
    cs = compile_schema({"$ref": "http://localhost:1234/a.json"},
                        registry=reg)
    assert cs.is_valid(3)
    assert not cs.is_valid("x")
    # fragment directly into the remote's $defs
    cs2 = compile_schema(
        {"$ref": "http://localhost:1234/b.json#/$defs/leaf"},
        registry=reg)
    assert cs2.is_valid(7)
    assert not cs2.is_valid("x")


def test_remote_ref_relative_resolution():
    """Relative $ref inside a remote resolves against the remote's own
    base URI, not the referrer's."""
    reg = Registry()
    reg.register({"$id": "http://localhost:1234/nested/outer.json",
                  "$ref": "inner.json"},
                 uri="http://localhost:1234/nested/outer.json")
    reg.register({"$id": "http://localhost:1234/nested/inner.json",
                  "type": "string"},
                 uri="http://localhost:1234/nested/inner.json")
    cs = compile_schema(
        {"$ref": "http://localhost:1234/nested/outer.json"}, registry=reg)
    assert cs.is_valid("ok")
    assert not cs.is_valid(1)


def test_unicode_property_escape_without_regex_module(monkeypatch):
    """\\p{...} patterns degrade to a named compile-time error when the
    optional third-party `regex` module is absent (it must be on driver
    AND executor Pythons; see compile_regex)."""
    import builtins
    from jsi_spark.compile import compiler

    real_import = builtins.__import__

    def no_regex(name, *a, **k):
        if name == "regex":
            raise ImportError("regex unavailable")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_regex)
    with pytest.raises(compiler.UnsupportedPatternError) as ei:
        compiler.compile_regex(r"^\p{L}+$")
    assert "regex" in str(ei.value)


def test_anchor_resolution_case_sensitive_miss_raises():
    """#FOO must not resolve to an anchor declared as 'foo' — anchors
    are case-sensitive identifiers; a wrong-case ref is a compile-time
    resolution error, never a silent match."""
    from jsi_spark.compile.compiler import SchemaCompileError
    with pytest.raises(SchemaCompileError):
        compile_schema({
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "$ref": "#FOO",
            "$defs": {"a": {"$anchor": "foo", "type": "integer"}}})
