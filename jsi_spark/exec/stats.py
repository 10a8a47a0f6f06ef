"""Per-column stats: the corpus-level lift of type/required keyword
semantics (SURVEY.md §2.4; north_rule "per-column stats: null count,
distinct HLL sketch, min/max").

One single-pass hash aggregate per table: every statistic is a partial-
aggregatable expression, so Catalyst plans partial (map-side) + final
aggregation automatically — one shuffle of one tiny row per partition,
regardless of table size. HLL (approx_count_distinct) and KLL-like
(percentile_approx) sketches are mergeable, which is exactly what makes
this hold at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(df: DataFrame, columns: list[str] | None = None,
                 hll_rsd: float = 0.02,
                 quantiles: tuple = (0.25, 0.5, 0.75, 0.95),
                 group_by: str | None = None,
                 exact_distinct: bool = False) -> DataFrame:
    """Long-form stats: one output row per column
    (column, n_rows, null_count, distinct_hll, min_val, max_val,
    kll_quantiles for numeric columns). ``group_by`` adds a grouping
    column (e.g. the partition bucket) for per-partition metrics.
    ``exact_distinct`` swaps the HLL sketch for an exact count-distinct
    (oracle-comparable; the sketch is the default at corpus scale).
    """
    columns = columns or [
        f.name for f in df.schema.fields
        if f.dataType.typeName() in
        ("string", "long", "integer", "double", "float", "short", "byte",
         "decimal", "boolean", "date", "timestamp")]
    numeric = {
        f.name for f in df.schema.fields
        if f.dataType.typeName() in
        ("long", "integer", "double", "float", "short", "byte", "decimal")}

    per_col = []
    for c in columns:
        aggs = [
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(c).isNull().cast("long")).alias("null_count"),
            (F.count_distinct(F.col(c)) if exact_distinct
             else F.approx_count_distinct(c, hll_rsd))
            .alias("distinct_hll"),
            F.min(c).cast("string").alias("min_val"),
            F.max(c).cast("string").alias("max_val"),
            (F.percentile_approx(c, list(quantiles), 10000)
             .cast("array<double>") if c in numeric
             else F.lit(None).cast("array<double>")).alias("kll_quantiles"),
        ]
        keys = [F.lit(c).alias("column")]
        if group_by:
            g = df.groupBy(group_by).agg(*aggs)
            per_col.append(g.select(group_by, *keys, *[F.col(a)
                           for a in ("n_rows", "null_count", "distinct_hll",
                                     "min_val", "max_val", "kll_quantiles")]))
        else:
            per_col.append(df.agg(*aggs).select(*keys, "*"))
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionByName(p)
    return out
