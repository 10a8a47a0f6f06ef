"""Custom-keyword vocabulary surface (reference:
lib/jsi/schema.rb:560-604 Vocabulary/describes_schema!;
suite_test.rb:17-24): a registered keyword validates on BOTH paths with
standard violation rows; without a typed compiler the typed path
declines and the schema routes to the generic path."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsi_spark.compile.compiler import compile_schema
from jsi_spark.compile.plugins import register_keyword, unregister_keyword
from jsi_spark.exec.columnar import TypedCompileError, typed_validator

ST = T.StructType([T.StructField("s", T.StringType())])


@pytest.fixture
def max_words():
    def compile_fn(n):
        def check(v):
            if not isinstance(v, str):
                return True
            return len(v.split()) <= n
        return check

    def typed_fn(n, col, dt):
        if not isinstance(dt, T.StringType):
            return F.lit(True)
        return F.size(F.split(F.trim(col), r"\s+")) <= n

    register_keyword("maxWords", compile_fn, typed_fn)
    yield
    unregister_keyword("maxWords")


def test_custom_keyword_both_paths(spark, max_words):
    schema = {"properties": {"s": {"maxWords": 2}}}
    compiled = compile_schema(schema)
    # generic path
    assert compiled.is_valid({"s": "one two"})
    assert not compiled.is_valid({"s": "one two three"})
    assert compiled.is_valid({})          # absent property passes
    assert compiled.is_valid({"s": 5})    # non-strings ignored
    res = compiled.validate({"s": "a b c"})
    keys = {(e.keyword, e.message_key) for e in res.all_errors()}
    assert ("maxWords", "validation.keyword.maxWords.invalid") in keys
    # typed path agrees
    tv = typed_validator(compiled, ST)
    df = spark.createDataFrame([("one two",), ("one two three",), (None,)],
                               ST)
    got = [r.v for r in df.select(tv.valid_column().alias("v")).collect()]
    assert got == [True, False, True]   # NULL = absent passes


def test_custom_keyword_without_typed_compiler_routes_generic(spark):
    register_keyword("entropyBelow", lambda n: lambda v: True)
    try:
        compiled = compile_schema({"properties": {"s": {"entropyBelow": 3}}})
        assert compiled.is_valid({"s": "x"})
        with pytest.raises(TypedCompileError):
            typed_validator(compiled, ST).valid_column()
    finally:
        unregister_keyword("entropyBelow")


def test_registration_read_at_compile_time():
    schema = {"properties": {"s": {"maxWords": 1}}}
    before = compile_schema(schema)     # not registered: annotation only
    assert before.is_valid({"s": "a b c d"})
    register_keyword("maxWords",
                     lambda n: lambda v: not isinstance(v, str)
                     or len(v.split()) <= n)
    try:
        after = compile_schema(schema)
        assert not after.is_valid({"s": "a b c d"})
        assert before.is_valid({"s": "a b c d"}), \
            "pre-registration compiles must be unaffected"
    finally:
        unregister_keyword("maxWords")
