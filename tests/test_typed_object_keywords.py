"""Typed-path object keywords (maxProperties … propertyNames) must
agree with the generic Arrow-UDF path row-for-row — the generic path is
the conformance-grade implementation (reference: elements/
object_validation.rb, dependent_required.rb, dependencies.rb,
properties.rb, property_names.rb), the typed path is the Column-only
re-expression of the same semantics."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsi_spark.compile.compiler import compile_schema
from jsi_spark.exec.columnar import typed_validator
from jsi_spark.functions.udfs import row_as_json, valid_json_udf

MAP_ROWS = [
    (0, {"a": 1, "b": 2}),
    (1, {"a": 1}),
    (2, {"a": 1, "b": 2, "c": 3, "d": 4}),
    (3, {"b": 5}),
    (4, {}),
    (5, None),
    (6, {"x1": 7, "a": 1}),
    (7, {"verylongpropertyname": 1}),
]

MAP_SCHEMA_T = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("doc", T.MapType(T.StringType(), T.LongType())),
])

STRUCT_ROWS = [
    (0, (1, "x", None)),
    (1, (None, "y", 3)),
    (2, (2, None, None)),
    (3, (None, None, None)),
    (4, None),
]

STRUCT_SCHEMA_T = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("obj", T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("a_extra", T.LongType()),
    ])),
])

CASES = [
    # (name, doc-subschema, which fixture)
    ("maxProperties", {"maxProperties": 2}, "map"),
    ("minProperties", {"minProperties": 1}, "map"),
    ("dependentRequired", {"dependentRequired": {"b": ["a"]}}, "map"),
    ("dependentSchemas",
     {"dependentSchemas": {"b": {"required": ["a"]}}}, "map"),
    ("dependencies_array", {"dependencies": {"b": ["a"]}}, "map"),
    ("dependencies_schema",
     {"dependencies": {"b": {"required": ["a"]}}}, "map"),
    ("propertyNames", {"propertyNames": {"maxLength": 3}}, "map"),
    ("patternProperties",
     {"patternProperties": {"^x": {"maximum": 5}}}, "map"),
    ("additionalProperties",
     {"properties": {"a": {"minimum": 0}},
      "additionalProperties": {"maximum": 3}}, "map"),
    ("struct_maxProperties", {"maxProperties": 2}, "struct"),
    ("struct_dependentRequired",
     {"dependentRequired": {"b": ["a"]}}, "struct"),
    ("struct_dependentSchemas",
     {"dependentSchemas": {"b": {"required": ["a"]}}}, "struct"),
    ("struct_propertyNames", {"propertyNames": {"maxLength": 2}}, "struct"),
    ("struct_patternProperties",
     {"patternProperties": {"^a": {"type": "integer", "maximum": 2}}},
     "struct"),
    ("struct_additionalProperties",
     {"properties": {"a": {"minimum": 0}},
      "patternProperties": {"extra$": {"maximum": 10}},
      "additionalProperties": {"maxLength": 1}}, "struct"),
]


@pytest.fixture(scope="module")
def map_df(spark):
    return spark.createDataFrame(MAP_ROWS, MAP_SCHEMA_T)


@pytest.fixture(scope="module")
def struct_df(spark):
    return spark.createDataFrame(STRUCT_ROWS, STRUCT_SCHEMA_T)


@pytest.mark.parametrize("name,subschema,fixture",
                         CASES, ids=[c[0] for c in CASES])
def test_typed_matches_generic(spark, map_df, struct_df, name, subschema,
                               fixture):
    df = map_df if fixture == "map" else struct_df
    col = "doc" if fixture == "map" else "obj"
    schema = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "properties": {col: subschema},
    }
    compiled = compile_schema(schema)
    struct_t = MAP_SCHEMA_T if fixture == "map" else STRUCT_SCHEMA_T
    tv = typed_validator(compiled, struct_t)
    gv = valid_json_udf(compiled)
    out = df.select(
        "id",
        tv.valid_column().alias("typed"),
        gv(row_as_json("id", col)).alias("generic")).collect()
    for r in out:
        assert r.typed == r.generic, (
            f"{name}: row id={r.id} typed={r.typed} generic={r.generic}")


def test_typed_violations_run(spark, map_df):
    """Violation columns compile and produce rows for the new keywords."""
    schema = {"$schema": "https://json-schema.org/draft/2020-12/schema",
              "properties": {"doc": {
                  "maxProperties": 2,
                  "propertyNames": {"maxLength": 3},
                  "dependentRequired": {"b": ["a"]}}}}
    tv = typed_validator(compile_schema(schema), MAP_SCHEMA_T)
    rows = (map_df.withColumn("valid", tv.valid_column())
            .filter(~F.col("valid"))
            .select(F.explode(tv.violations_column()).alias("v"))
            .select("v.keyword").collect())
    kws = {r.keyword for r in rows}
    assert "maxProperties" in kws
    assert "propertyNames" in kws
