"""Fuzzed typed-vs-generic parity: hundreds of randomly composed
schemas (seeded, reproducible) evaluated over a diverse fixed row set —
the typed Column compiler must agree with the generic conformance path
on every (schema, row) pair. All schemas for a seed are evaluated in
ONE Spark job (one column pair per schema) to amortize job overhead."""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsi_spark.compile.compiler import compile_schema
from jsi_spark.exec.columnar import TypedCompileError, typed_validator
from jsi_spark.functions.udfs import row_as_json, valid_json_udf

STRUCT_T = T.StructType([
    T.StructField("s", T.StringType()),
    T.StructField("n", T.LongType()),
    T.StructField("x", T.DoubleType()),
    T.StructField("arr", T.ArrayType(T.LongType())),
    T.StructField("obj", T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
    ])),
])

ROWS = [
    ("hello", 5, 1.5, [1, 2, 3], (1, "p")),
    ("", 0, 0.0, [], (None, None)),
    ("abc", -7, 2.0, [5, 5], (2, None)),
    (None, None, None, None, None),
    ("zzzz", 100, -3.25, [0], (None, "q")),
    ("mid", 42, 7.0, [1, 2, 2, 9], (9, "r")),
]


def _leaf_schema(rng: random.Random) -> dict:
    pick = rng.randrange(11)
    if pick == 9:
        # composite deep-equality literals (typed _deep_eq path)
        return {"const": rng.choice([[1, 2, 3], [], [5, 5],
                                     {"a": 1, "b": "p"}, {"a": 9},
                                     {"b": "r"}])}
    if pick == 10:
        return {"enum": [rng.choice([[1, 2, 3], [0], {"a": 2}]),
                         "hello", 5]}
    if pick == 0:
        return {"type": rng.choice(["string", "integer", "number",
                                    "array", "object", "boolean"])}
    if pick == 1:
        return {"minimum": rng.randint(-5, 50)}
    if pick == 2:
        return {"maximum": rng.randint(-5, 50)}
    if pick == 3:
        return {"minLength": rng.randint(0, 4)}
    if pick == 4:
        return {"maxLength": rng.randint(0, 6)}
    if pick == 5:
        return {"enum": rng.sample(["hello", "abc", "", 5, 42, 0], 3)}
    if pick == 6:
        return {"const": rng.choice(["hello", 5, 0.0, ""])}
    if pick == 7:
        return {"pattern": rng.choice(["^h", "o$", "[a-m]+", "^$"])}
    return {"multipleOf": rng.choice([1, 2, 5])}


def _node_schema(rng: random.Random, depth: int) -> dict:
    if depth >= 2 or rng.random() < 0.4:
        return _leaf_schema(rng)
    pick = rng.randrange(8)
    if pick == 0:
        return {"allOf": [_node_schema(rng, depth + 1)
                          for _ in range(rng.randint(1, 2))]}
    if pick == 1:
        return {"anyOf": [_node_schema(rng, depth + 1)
                          for _ in range(rng.randint(1, 2))]}
    if pick == 2:
        return {"oneOf": [_node_schema(rng, depth + 1)
                          for _ in range(rng.randint(1, 2))]}
    if pick == 3:
        return {"not": _node_schema(rng, depth + 1)}
    if pick == 4:
        out = {"if": _node_schema(rng, depth + 1)}
        if rng.random() < 0.8:
            out["then"] = _node_schema(rng, depth + 1)
        if rng.random() < 0.8:
            out["else"] = _node_schema(rng, depth + 1)
        return out
    if pick == 5:
        return {"items": _node_schema(rng, depth + 1),
                "minItems": rng.randint(0, 2)}
    if pick == 6:
        return {"prefixItems": [_node_schema(rng, depth + 1)],
                "contains": _leaf_schema(rng),
                "minContains": rng.randint(0, 2)}
    return {"properties": {
        rng.choice(["s", "n", "x", "arr", "obj"]): _node_schema(
            rng, depth + 1)}}


DRAFTS = ["https://json-schema.org/draft/2020-12/schema",
          "http://json-schema.org/draft-07/schema#",
          "http://json-schema.org/draft-06/schema#",
          "http://json-schema.org/draft-04/schema#"]


def _root_schema(rng: random.Random) -> dict:
    # drafts differ in items form and keyword sets; the compiler's
    # dialect layer must keep the two paths in agreement on all of them
    root = {"$schema": rng.choice(DRAFTS)}
    cols = rng.sample(["s", "n", "x", "arr", "obj"], rng.randint(1, 3))
    root["properties"] = {c: _node_schema(rng, 0) for c in cols}
    if rng.random() < 0.3:
        root["required"] = rng.sample(cols, 1)
    if rng.random() < 0.25 and "obj" in cols:
        root["properties"]["obj"] = {
            "properties": {"a": _leaf_schema(rng)},
            "unevaluatedProperties": _leaf_schema(rng)}
    if rng.random() < 0.25 and "arr" in cols:
        root["properties"]["arr"] = {
            "prefixItems": [_leaf_schema(rng)],
            "unevaluatedItems": _leaf_schema(rng)}
    return root


@pytest.mark.parametrize("seed", [7, 99, 2026])
def test_fuzzed_schemas_typed_equals_generic(spark, seed):
    rng = random.Random(seed)
    df = spark.createDataFrame(ROWS, STRUCT_T)
    json_col = row_as_json("s", "n", "x", "arr", "obj")
    cols, metas = [], []
    n_target = 40
    attempts = 0
    while len(metas) < n_target and attempts < n_target * 4:
        attempts += 1
        schema = _root_schema(rng)
        compiled = compile_schema(schema)
        try:
            tv = typed_validator(compiled, STRUCT_T)
            typed_col = tv.valid_column()
        except TypedCompileError:
            continue  # legitimately routed to the generic path
        k = len(metas)
        cols.append(typed_col.alias(f"t{k}"))
        cols.append(valid_json_udf(compiled)(json_col).alias(f"g{k}"))
        metas.append(schema)
    assert len(metas) == n_target
    out = df.select(*cols).collect()
    for ridx, row in enumerate(out):
        for k, schema in enumerate(metas):
            assert row[f"t{k}"] == row[f"g{k}"], (
                f"seed={seed} schema#{k} row#{ridx}\n"
                f"schema={schema}\nrow={ROWS[ridx]}\n"
                f"typed={row[f't{k}']} generic={row[f'g{k}']}")
