"""The interleaved text+media docs table: Spark schema + JSON Schema.

Shape is exactly the driver's ``input_hint``:
``(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)``.
The JSON Schema below is the flagship constraint set the engine validates
at scale; it exercises type / required / pattern / enum / min-max /
if-then-else / items — the keyword families of SURVEY.md §2.1-2.3.
"""

from pyspark.sql import types as T

SPAN_TYPE = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
])

DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", T.ArrayType(SPAN_TYPE)),
])

MEDIA_DIM_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("media_kind", T.StringType()),
    T.StructField("uri", T.StringType()),
    T.StructField("bytes", T.LongType()),
])

SPAN_KINDS = ["text", "image", "audio", "ref"]

#: Flagship document schema (draft 2020-12)
DOCS_JSON_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": "https://jsi-spark.test/schemas/interleaved-doc",
    "type": "object",
    "required": ["doc_id", "spans"],
    "properties": {
        "doc_id": {"type": "string", "pattern": "^doc-[0-9]{9}$"},
        "spans": {
            "type": "array",
            "minItems": 1,
            "maxItems": 64,
            "items": {
                "type": "object",
                "required": ["kind", "offset"],
                "properties": {
                    "kind": {"enum": SPAN_KINDS},
                    "text": {"type": "string", "minLength": 1},
                    "media_ref": {"type": "string", "pattern": "^m[0-9]+$"},
                    "offset": {"type": "integer", "minimum": 0},
                },
                "if": {"properties": {"kind": {"const": "text"}},
                       "required": ["kind"]},
                "then": {"required": ["text"]},
                "else": {"required": ["media_ref"]},
            },
        },
    },
}
