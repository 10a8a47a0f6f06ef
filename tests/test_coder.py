"""JSICoder analog (reference lib/jsi/jsi_coder.rb:27-94): schema →
StructType derivation and the loads/dumps JSON boundary."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsi_spark.compile.compiler import compile_schema
from jsi_spark.exec.columnar import typed_validator
from jsi_spark.functions.coder import dumps, loads, struct_type_for
from jsi_spark.plans.docs_schema import DOCS_JSON_SCHEMA


def test_struct_type_from_docs_schema():
    st = struct_type_for(DOCS_JSON_SCHEMA)
    assert isinstance(st, T.StructType)
    assert st["doc_id"].dataType == T.StringType()
    spans = st["spans"].dataType
    assert isinstance(spans, T.ArrayType)
    elem = spans.elementType
    assert elem["kind"].dataType == T.StringType()
    assert elem["offset"].dataType == T.LongType()   # JSON integer → long
    assert elem["text"].dataType == T.StringType()


def test_scalar_and_fallback_mappings():
    st = struct_type_for({
        "type": "object",
        "properties": {
            "i": {"type": "integer"},
            "n": {"type": "number"},
            "b": {"type": "boolean"},
            "u": {"type": ["string", "integer"]},     # union → string
            "free": {},                               # unconstrained
            "m": {"type": "object"},                  # no properties → map
        }})
    assert st["i"].dataType == T.LongType()
    assert st["n"].dataType == T.DoubleType()
    assert st["b"].dataType == T.BooleanType()
    assert st["u"].dataType == T.StringType()
    assert st["free"].dataType == T.StringType()
    assert isinstance(st["m"].dataType, T.MapType)


def test_properties_merge_through_ref_and_allof():
    st = struct_type_for({
        "$defs": {"base": {"type": "object",
                           "properties": {"a": {"type": "integer"}}}},
        "allOf": [{"$ref": "#/$defs/base"}],
        "type": "object",
        "properties": {"b": {"type": "string"}},
    })
    assert {f.name for f in st.fields} == {"a", "b"}


def test_loads_dumps_roundtrip_and_typed_validation(spark):
    schema = DOCS_JSON_SCHEMA
    raw = spark.createDataFrame(
        [('{"doc_id":"doc-000000001","spans":[{"kind":"text",'
          '"text":"hi","offset":0}]}',),
         ('{"doc_id":"BAD","spans":[{"kind":"text","text":"x",'
          '"offset":0}]}',),
         ('not json at all',)],
        "j string")
    typed = loads(raw, "j", schema, out_col="doc")
    st = struct_type_for(schema)
    flat = typed.select("doc.*")
    tv = typed_validator(compile_schema(schema), st)
    got = flat.select(tv.valid_column().alias("v")).collect()
    assert [r.v for r in got] == [True, False, False]
    # dump back: NULL fields dropped, valid row round-trips
    out = typed.filter(F.col("doc.doc_id") == "doc-000000001") \
        .select(dumps("doc").alias("j2")).collect()[0].j2
    assert '"doc_id":"doc-000000001"' in out and '"kind":"text"' in out
    reparsed = loads(spark.createDataFrame([(out,)], "j string"), "j",
                     schema).select("doc.*")
    assert reparsed.select(tv.valid_column()).collect()[0][0] is True
