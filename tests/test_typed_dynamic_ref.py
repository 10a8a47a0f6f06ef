"""Typed-path $dynamicRef: the dynamic-scope chain is statically known
along the inlined compile walk, so the outermost $dynamicAnchor must win
— exactly as on the generic path (reference: elements/dynamic_ref.rb,
dynamic_anchor_map.rb; 2020-12 §8.2.3.2)."""

import pytest
from pyspark.sql import types as T

from jsi_spark.compile.compiler import compile_schema
from jsi_spark.exec.columnar import typed_validator
from jsi_spark.functions.udfs import row_as_json, valid_json_udf

ST = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("arr", T.ArrayType(T.StringType())),
])

ROWS = [
    (0, ["ab"]),          # ≤2 chars: passes the OUTER anchor bound
    (1, ["abc"]),         # 3 chars: fails outer (inner bound is 99)
    (2, []),
    (3, None),
    (4, ["a", "abcd"]),
]

# inner $dynamicRef "#T" statically resolves to T_inner (maxLength 99);
# dynamically the outermost resource's T_outer (maxLength 2) must win.
DYN_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": "https://typed.test/dyn/root",
    "$defs": {"T_outer": {"$dynamicAnchor": "T", "maxLength": 2}},
    "properties": {"arr": {
        "items": {"$id": "https://typed.test/dyn/inner",
                  "$defs": {"T_inner": {"$dynamicAnchor": "T",
                                        "maxLength": 99}},
                  "$dynamicRef": "#T"}}},
}

# no matching $dynamicAnchor anywhere in scope → plain $ref behavior
STATIC_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": "https://typed.test/dyn2/root",
    "$defs": {"x": {"maxLength": 2}},
    "properties": {"arr": {"items": {"$dynamicRef": "#/$defs/x"}}},
}


# the dynamic-scope chain must survive dependentSchemas: the inner
# resource's $dynamicRef still sees the ROOT resource's anchor as
# outermost (regression: _inplace dropped `scope` for dependent schemas)
DEP_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": "https://typed.test/dyn3/root",
    "$defs": {"T_outer": {"$dynamicAnchor": "T", "maxLength": 2}},
    "dependentSchemas": {"arr": {
        "$id": "https://typed.test/dyn3/inner",
        "$defs": {"T_inner": {"$dynamicAnchor": "T", "maxLength": 99}},
        "properties": {"arr": {"items": {"$dynamicRef": "#T"}}}}},
}

# properties applied THROUGH a $dynamicRef count as evaluated for
# unevaluatedProperties (regression: _eval_props skipped dynamic_ref)
UNEVAL_PROPS_DYN = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": "https://typed.test/dyn4/root",
    "$defs": {"all": {"$dynamicAnchor": "A",
                      "properties": {"id": True, "arr": True}}},
    "$dynamicRef": "#A",
    "unevaluatedProperties": False,
}

# items applied THROUGH a $dynamicRef count as evaluated for
# unevaluatedItems (regression: _eval_items_pred skipped dynamic_ref)
UNEVAL_ITEMS_DYN = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": "https://typed.test/dyn5/root",
    "$defs": {"IT": {"$dynamicAnchor": "I", "items": {"maxLength": 3}}},
    "properties": {"arr": {"$dynamicRef": "#I",
                           "unevaluatedItems": False}},
}


@pytest.mark.parametrize("schema,expect", [
    (DYN_SCHEMA, {0: True, 1: False, 2: True, 3: True, 4: False}),
    (STATIC_SCHEMA, {0: True, 1: False, 2: True, 3: True, 4: False}),
    (DEP_SCHEMA, {0: True, 1: False, 2: True, 3: True, 4: False}),
    (UNEVAL_PROPS_DYN, {0: True, 1: True, 2: True, 3: True, 4: True}),
    (UNEVAL_ITEMS_DYN, {0: True, 1: True, 2: True, 3: True, 4: False}),
], ids=["dynamic-outer-wins", "no-anchor-acts-as-ref",
        "scope-through-dependentSchemas", "uneval-props-via-dynamicRef",
        "uneval-items-via-dynamicRef"])
def test_dynamic_ref_typed_matches_generic(spark, schema, expect):
    compiled = compile_schema(schema)
    tv = typed_validator(compiled, ST)
    gv = valid_json_udf(compiled)
    df = spark.createDataFrame(ROWS, ST)
    out = df.select("id", tv.valid_column().alias("typed"),
                    gv(row_as_json("id", "arr")).alias("generic")).collect()
    for r in out:
        assert r.typed == r.generic, f"id={r.id}"
        assert r.typed == expect[r.id], f"id={r.id}: got {r.typed}"
