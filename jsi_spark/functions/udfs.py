"""Arrow-vectorized validation UDFs — the generic path.

For instances whose shape isn't statically known (arbitrary JSON columns),
the compiled driver-side node graph (jsi_spark.compile) is shipped to
executors inside pandas UDFs. Data moves as Arrow batches
(spark.sql.execution.arrow.pyspark.enabled); Python cost is one compiled-
closure walk per value within a batch — never row-at-a-time serialization.

This is the slow-path complement to jsi_spark.exec.columnar (pure Column
expressions); use it for conformance-grade semantics ($dynamicRef,
unevaluated*, patternProperties, Python-`re` pattern parity).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from jsi_spark.compile.compiler import CompiledSchema

VIOLATION_TYPE = T.ArrayType(T.StructType([
    T.StructField("keyword", T.StringType()),
    T.StructField("ptr", T.StringType()),
    T.StructField("span_index", T.IntegerType()),
    T.StructField("message_key", T.StringType()),
]))


def _span_index_of(ptr: str, span_field: str) -> int | None:
    """/spans/3/media_ref → 3 (FIXTURES.md §5 violation-row shape)."""
    prefix = f"/{span_field}/"
    if ptr.startswith(prefix):
        idx = ptr[len(prefix):].split("/", 1)[0]
        if idx.isdigit():
            return int(idx)
    return None


def valid_json_udf(compiled: CompiledSchema) -> Column:
    """Returns a callable column: JSON-string column → boolean verdict.

    Boolean short-circuit mode (the reference's Result::Valid cheap pass,
    lib/jsi/validation/result.rb:185-199).
    """
    root = compiled.root

    @pandas_udf(T.BooleanType())
    def _valid(s: pd.Series) -> pd.Series:
        loads = json.loads
        validate = root.validate
        return s.map(
            lambda j: None if j is None
            else validate(loads(j), collect=False).valid)

    return _valid


def violations_json_udf(compiled: CompiledSchema,
                        span_field: str = "spans") -> Column:
    """JSON-string column → array<struct<keyword,ptr,span_index,
    message_key>> of flattened violation rows (Result::Full analog)."""
    root = compiled.root

    @pandas_udf(VIOLATION_TYPE)
    def _viols(s: pd.Series) -> pd.Series:
        loads = json.loads

        def run(j):
            if j is None:
                return None
            res = root.validate(loads(j), collect=True)
            return [
                {"keyword": e.keyword, "ptr": e.instance_ptr,
                 "span_index": _span_index_of(e.instance_ptr, span_field),
                 "message_key": e.message_key}
                for e in res.all_errors()
            ]

        return s.map(run)

    return _viols


def row_as_json(*cols: str) -> Column:
    """Rows → JSON strings for the generic path. ``to_json`` drops NULL
    fields, matching the engine's NULL-models-absent convention."""
    return F.to_json(F.struct(*[F.col(c) for c in cols]))
