"""jsi_spark — a PySpark-native JSON-Schema + constraint validation engine.

Re-expresses the keyword semantics of the reference engine (notEthan/jsi,
see /root/reference) as Spark DataFrame plans:

- ``jsi_spark.compile``   — schema → compiled validator (driver-side, all four
  drafts: 04 / 06 / 07 / 2020-12), the analog of JSI's Element/Vocabulary/
  Dialect machinery (reference: lib/jsi/schema/dialect.rb, element.rb).
- ``jsi_spark.functions`` — Arrow-vectorized pandas UDFs wrapping a compiled
  validator for arbitrary-JSON columns (the generic path).
- ``jsi_spark.exec``      — typed columnar compiler emitting native Column
  expressions for fixed table schemas (the 100 TB hot path), plus corpus
  constraints: stats, drift (PSI/KLL), salted uniqueness, referential joins.
- ``jsi_spark.io``        — table layer (parquet + snapshot manifest fallback
  for Iceberg), checkpoint / lineage.
- ``jsi_spark.ops``       — large-scale training-data ops: dedup (exact,
  MinHash-LSH, SimHash), similarity search, text analysis, multimodal stubs.
"""

__version__ = "0.1.0"

from jsi_spark.compile.compiler import compile_schema  # noqa: F401
from jsi_spark.schema.registry import Registry  # noqa: F401
