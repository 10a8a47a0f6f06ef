"""JSICoder analog: the load/dump boundary between JSON text columns and
typed Spark columns, driven by the compiled schema (reference:
lib/jsi/jsi_coder.rb:27-94 — JSI's ActiveRecord ``serialize`` coder
loads a DB string column into schema-typed instances and dumps back).

The Spark lift: derive a ``StructType`` from the compiled JSON Schema
once (driver-side), then ``loads`` = ``from_json`` with that type
(JVM-side parse, columns typed for the TYPED validation path) and
``dumps`` = ``to_json``. The derivation follows the schema's asserted
shape keywords:

- ``type: integer`` → long, ``number`` → double, ``string`` → string,
  ``boolean`` → boolean;
- ``object`` + ``properties`` → struct of the property schemas
  (merged through ``$ref``/``allOf``, the same unconditional walk as
  ``field_defaults``);
- ``array`` + ``items`` → array of the item schema;
- anything unconstrained / union-typed / conditional falls back to
  ``string`` (the raw JSON is preserved verbatim for the generic path —
  a typed column can't hold a JSON union).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsi_spark.compile.compiler import CompiledSchema, compile_schema

_SCALARS = {
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
}


def _merged_kw(node, key, out, seen):
    """Collect ``key`` entries through the unconditional in-place
    applicators ($ref/allOf), outermost first."""
    if id(node) in seen or not isinstance(node.value, dict):
        return
    seen = seen | {id(node)}
    kw = node.kw
    if key in kw:
        out.append(kw[key])
    if "ref" in kw:
        _merged_kw(kw["ref"], key, out, seen)
    for sub in kw.get("allOf", ()):
        _merged_kw(sub, key, out, seen)


def _types_of(node) -> list:
    out: list = []
    _merged_kw(node, "type", out, frozenset())
    flat = []
    for t in out:
        flat.extend(t if isinstance(t, (list, tuple, frozenset, set))
                    else [t])
    return flat


def _datatype_for_node(node) -> T.DataType:
    if not isinstance(node.value, dict):
        return T.StringType()
    types = _types_of(node)
    if len(set(types)) != 1:
        return T.StringType()
    t = types[0]
    if t in _SCALARS:
        return _SCALARS[t]
    if t == "object":
        props: list = []
        _merged_kw(node, "properties", props, frozenset())
        fields, named = [], set()
        for mapping in props:
            for name, sub in mapping.items():
                if name in named:
                    continue
                named.add(name)
                fields.append(T.StructField(name, _datatype_for_node(sub)))
        if not fields:
            return T.MapType(T.StringType(), T.StringType())
        return T.StructType(fields)
    if t == "array":
        items: list = []
        for key in ("items_schema", "items_rest"):
            _merged_kw(node, key, items, frozenset())
        elem = _datatype_for_node(items[0]) if items else T.StringType()
        return T.ArrayType(elem)
    return T.StringType()   # "null" or unknown


def struct_type_for(schema) -> T.DataType:
    """Derive the Spark DataType for instances of ``schema`` (dict /
    bool / CompiledSchema). Root object schemas yield a StructType
    usable as both ``from_json`` schema and ``TypedValidator`` input."""
    compiled = schema if isinstance(schema, CompiledSchema) \
        else compile_schema(schema)
    return _datatype_for_node(compiled.root)


def loads(df: DataFrame, json_col: str, schema,
          out_col: str = "doc") -> DataFrame:
    """JSON-string column → typed column (JSICoder ``load``). Malformed
    JSON yields NULL (from_json semantics); validate with the typed
    path afterwards."""
    return df.withColumn(out_col,
                         F.from_json(F.col(json_col),
                                     struct_type_for(schema)))


def dumps(col: Column | str) -> Column:
    """Typed struct column → JSON string (JSICoder ``dump``).
    ``to_json`` drops NULL fields, matching JSON 'absent'."""
    return F.to_json(col if isinstance(col, Column) else F.col(col))
