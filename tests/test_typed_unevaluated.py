"""Typed-path unevaluatedProperties / unevaluatedItems vs the generic
Arrow path (conformance-grade). The typed path computes per-field /
per-index 'evaluated' Columns across the in-place application graph,
gated on branch validity — the Column re-expression of the reference's
evaluated_tokens merging (lib/jsi/validation/result.rb:47-63)."""

import pytest
from pyspark.sql import types as T

from jsi_spark.compile.compiler import compile_schema
from jsi_spark.exec.columnar import TypedCompileError, typed_validator
from jsi_spark.functions.udfs import row_as_json, valid_json_udf

SCHEMA_T = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("obj", T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.LongType()),
    ])),
    T.StructField("arr", T.ArrayType(T.LongType())),
])

ROWS = [
    (0, (1, "x", None), [1, 2]),
    (1, (1, None, 5), [1, 2, 3, 4]),
    (2, (None, "y", 7), [9]),
    (3, (None, None, None), []),
    (4, None, None),
    (5, (2, "z", 3), [5, 5, 5]),
]

UNEVAL_CASES = [
    ("up_props_only",
     {"properties": {"a": {"type": "integer"}},
      "unevaluatedProperties": False}),
    ("up_props_plus_pattern",
     {"properties": {"a": {}},
      "patternProperties": {"^b$": {"type": "string"}},
      "unevaluatedProperties": False}),
    ("up_allOf_branch",
     {"allOf": [{"properties": {"a": {}, "b": {}}}],
      "unevaluatedProperties": False}),
    ("up_anyOf_gating",
     {"anyOf": [{"properties": {"b": {"type": "string"}},
                 "required": ["b"]},
                {"properties": {"c": {"type": "integer"}},
                 "required": ["c"]}],
      "properties": {"a": {}},
      "unevaluatedProperties": False}),
    ("up_if_then",
     {"if": {"required": ["a"]},
      "then": {"properties": {"b": {}, "c": {}}},
      "properties": {"a": {}},
      "unevaluatedProperties": False}),
    ("up_dependentSchemas",
     {"dependentSchemas": {"a": {"properties": {"b": {}}}},
      "properties": {"a": {}, "c": {}},
      "unevaluatedProperties": False}),
    ("up_schema_not_false",
     {"properties": {"a": {}},
      "unevaluatedProperties": {"type": "string"}}),
]

UNEVAL_ITEM_CASES = [
    ("ui_prefix_false",
     {"prefixItems": [{"type": "integer"}, {"type": "integer"}],
      "unevaluatedItems": False}),
    ("ui_prefix_schema",
     {"prefixItems": [{}],
      "unevaluatedItems": {"maximum": 4}}),
    ("ui_allOf_items",
     {"allOf": [{"items": {"minimum": 0}}],
      "unevaluatedItems": False}),
    ("ui_contains",
     {"contains": {"const": 5}, "minContains": 0,
      "unevaluatedItems": {"maximum": 3}}),
    ("ui_anyOf_prefix",
     {"anyOf": [{"prefixItems": [{"const": 1}, {"const": 2}],
                 "minItems": 2},
                {"prefixItems": [{"const": 9}], "minItems": 1}],
      "unevaluatedItems": False}),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA_T)


def _run_case(spark, df, col, subschema):
    schema = {"$schema": "https://json-schema.org/draft/2020-12/schema",
              "properties": {col: subschema}}
    compiled = compile_schema(schema)
    tv = typed_validator(compiled, SCHEMA_T)
    gv = valid_json_udf(compiled)
    out = df.select("id", tv.valid_column().alias("typed"),
                    gv(row_as_json("id", "obj", "arr")).alias("generic"))
    for r in out.collect():
        assert r.typed == r.generic, \
            f"row id={r.id}: typed={r.typed} generic={r.generic}"


@pytest.mark.parametrize("name,sub", UNEVAL_CASES,
                         ids=[c[0] for c in UNEVAL_CASES])
def test_unevaluated_properties(spark, df, name, sub):
    _run_case(spark, df, "obj", sub)


@pytest.mark.parametrize("name,sub", UNEVAL_ITEM_CASES,
                         ids=[c[0] for c in UNEVAL_ITEM_CASES])
def test_unevaluated_items(spark, df, name, sub):
    _run_case(spark, df, "arr", sub)


def test_map_unevaluated_still_raises(spark):
    st = T.StructType([T.StructField(
        "m", T.MapType(T.StringType(), T.LongType()))])
    with pytest.raises(TypedCompileError):
        typed_validator(compile_schema(
            {"properties": {"m": {"unevaluatedProperties": False}}}),
            st).valid_column()
