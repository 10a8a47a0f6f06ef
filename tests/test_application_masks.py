"""Application-suite analog: golden assertions of WHICH instance tokens
each schema application evaluated, per pointer, on BOTH paths — modeled
on the reference's YAML application fixtures
(test/application_suite_test.rb:1-52, e.g. child-unevaluatedItems:
/0 → ["#/prefixItems/0"]). The generic path exposes the sets directly
(Result.evaluated_props / evaluated_items); the typed path exposes mask
Columns (TypedValidator.evaluated_props_columns /
evaluated_items_mask)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsi_spark.compile.compiler import compile_schema
from jsi_spark.exec.columnar import typed_validator

ST = T.StructType([
    T.StructField("a", T.LongType()),
    T.StructField("b", T.StringType()),
    T.StructField("arr", T.ArrayType(T.StringType())),
])


def _props_case(schema, row, expected):
    """row: (a, b, arr); expected: set of evaluated root properties."""
    return (schema, row, expected)


# Each case: (schema, one row, expected evaluated-property set).
# NULL fields are absent; the expectation lists only present fields.
PROP_CASES = [
    # plain properties evaluate their fields
    _props_case({"properties": {"a": {"type": "integer"}}},
                (1, "x", None), {"a"}),
    # a FAILED application contributes no annotations
    _props_case({"properties": {"a": {"type": "string"}}},
                (1, "x", None), set()),
    # oneOf: only the valid branch's properties count
    _props_case({"oneOf": [
        {"properties": {"a": {"type": "string"}}, "required": ["zzz"]},
        {"properties": {"b": {"type": "string"}}}]},
        (1, "x", None), {"b"}),
    # if/then/else gating: then applies only when if valid
    _props_case({"if": {"properties": {"a": {"const": 1}},
                        "required": ["a"]},
                 "then": {"properties": {"b": True}},
                 "else": {"properties": {"arr": True}}},
                (1, "x", ["e"]), {"a", "b"}),
    _props_case({"if": {"properties": {"a": {"const": 99}},
                        "required": ["a"]},
                 "then": {"properties": {"b": True}},
                 "else": {"properties": {"arr": True}}},
                (1, "x", ["e"]), {"arr"}),
    # dependentSchemas: applies only when the trigger key is present
    _props_case({"dependentSchemas": {
        "b": {"properties": {"a": True}}}},
        (1, "x", None), {"a"}),
    _props_case({"dependentSchemas": {
        "b": {"properties": {"a": True}}}},
        (1, None, None), set()),
    # patternProperties + additionalProperties split the namespace
    _props_case({"properties": {"a": True},
                 "patternProperties": {"^b$": {"type": "string"}},
                 "additionalProperties": {"type": "array"}},
                (1, "x", ["e"]), {"a", "b", "arr"}),
    # allOf merges annotations from each valid branch
    _props_case({"allOf": [{"properties": {"a": True}},
                           {"properties": {"b": True}}]},
                (1, "x", None), {"a", "b"}),
]


@pytest.mark.parametrize("schema,row,expected", PROP_CASES)
def test_evaluated_props_masks_both_paths(spark, schema, row, expected):
    compiled = compile_schema(schema)
    # generic path: validate the dict instance directly
    inst = {k: v for k, v in zip(("a", "b", "arr"), row) if v is not None}
    res = compiled.validate(inst)
    assert res.evaluated_props == expected, \
        f"generic: {res.evaluated_props}"
    # typed path: mask Columns over a one-row DataFrame
    tv = typed_validator(compiled, ST)
    masks = tv.evaluated_props_columns()
    df = spark.createDataFrame([row], ST)
    got = df.select(*[c.alias(n) for n, c in masks.items()]).collect()[0]
    typed = {n for n in masks if got[n] and inst.get(n) is not None}
    assert typed == expected, f"typed: {typed}"


ITEM_CASES = [
    # prefixItems evaluates the prefix; items the rest
    ({"prefixItems": [{"type": "string"}], "items": {"maxLength": 2}},
     ["abcd", "x", "y"], [True, True, True]),
    # items application failing on the WHOLE array → no annotation from
    # items; prefixItems still applied (independent applications)
    ({"prefixItems": [{"type": "string"}], "items": {"maxLength": 1}},
     ["abcd", "xx", "y"], [True, False, True]),
    # contains evaluates only the matching elements
    ({"contains": {"maxLength": 1}},
     ["abcd", "x", "yy", "z"], [False, True, False, True]),
    # in-place branch (anyOf) merges item annotations when valid
    ({"anyOf": [{"prefixItems": [True, True]},
                {"items": {"maxLength": 0}}]},
     ["a", "b", "c"], [True, True, False]),
]


@pytest.mark.parametrize("schema,arr,expected", ITEM_CASES)
def test_evaluated_items_masks_both_paths(spark, schema, arr, expected):
    root = {"properties": {"arr": schema}}
    compiled = compile_schema(root)
    # generic: validate the array against the arr subschema node
    sub = compile_schema(schema)
    res = sub.validate(arr)
    gen = [i in res.evaluated_items for i in range(len(arr))]
    assert gen == expected, f"generic: {gen}"
    tv = typed_validator(compiled, ST)
    df = spark.createDataFrame([(None, None, arr)], ST)
    got = df.select(tv.evaluated_items_mask("arr").alias("m")) \
        .collect()[0]["m"]
    assert list(got) == expected, f"typed: {got}"


def test_masks_match_reference_style_fixture(spark):
    """The reference's child-unevaluatedItems fixture shape:
    prefixItems evaluates /0, unevaluatedItems picks up the rest."""
    schema = {"prefixItems": [{"type": "string"}],
              "unevaluatedItems": {"maxLength": 1}}
    sub = compile_schema(schema)
    res = sub.validate(["abcd", "x"])
    assert res.valid
    # /0 via #/prefixItems/0, /1 via #/unevaluatedItems
    assert res.evaluated_items == {0, 1}
    res2 = sub.validate(["abcd", "toolong"])
    assert not res2.valid
    assert any(e.keyword == "unevaluatedItems" for e in res2.all_errors())
