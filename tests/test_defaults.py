"""`default` read path: absent (NULL) fields coalesce to the schema's
default on read — reference lib/jsi/base.rb:484-505 (jsi_default_child /
use_default): exactly one distinct declared default applies; multiple
different defaults mean none."""

import pytest
from pyspark.sql import types as T

from jsi_spark.compile.compiler import compile_schema
from jsi_spark.exec.columnar import typed_validator

ST = T.StructType([
    T.StructField("a", T.LongType()),
    T.StructField("b", T.StringType()),
    T.StructField("arr", T.ArrayType(T.StringType())),
])


def _tv(schema):
    return typed_validator(compile_schema(schema), ST)


def test_unique_default_coalesces(spark):
    tv = _tv({"properties": {"a": {"default": 7},
                             "b": {"type": "string"}}})
    assert tv.field_defaults() == {"a": 7}
    df = spark.createDataFrame([(None, "x", None), (3, None, None)], ST)
    rows = {r.b: r.a for r in tv.with_defaults(df).collect()}
    assert rows["x"] == 7           # absent → default
    assert rows[None] == 3          # present wins


def test_default_through_ref_and_allof(spark):
    tv = _tv({
        "$defs": {"base": {"properties": {"a": {"default": 5}}}},
        "allOf": [{"$ref": "#/$defs/base"},
                  {"properties": {"b": {"default": "fallback"}}}],
    })
    assert tv.field_defaults() == {"a": 5, "b": "fallback"}


def test_conflicting_defaults_mean_none(spark):
    tv = _tv({"allOf": [{"properties": {"a": {"default": 1}}},
                        {"properties": {"a": {"default": 2}}}]})
    assert tv.field_defaults() == {}
    # deep equality: 1 and 1.0 are the SAME default (JSON equality)
    tv2 = _tv({"allOf": [{"properties": {"a": {"default": 1}}},
                         {"properties": {"a": {"default": 1.0}}}]})
    assert tv2.field_defaults() == {"a": 1}


def test_conditional_branches_do_not_contribute(spark):
    tv = _tv({"anyOf": [{"properties": {"a": {"default": 9}}}, True]})
    assert tv.field_defaults() == {}


def test_array_default(spark):
    tv = _tv({"properties": {"arr": {"default": ["x", "y"]}}})
    df = spark.createDataFrame([(1, None, None)], ST)
    assert tv.with_defaults(df).collect()[0]["arr"] == ["x", "y"]
