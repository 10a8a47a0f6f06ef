"""Deterministic stratified capping — the per-domain quota pass of a
web-scale training-data pipeline (cap how many documents any one
source/domain may contribute, so a crawl-heavy domain cannot dominate
the corpus).

Selection is by md5-rank of the document id: reproducible across
engines (the DuckDB oracle computes the identical md5 hex), independent
of partitioning, and uniform per stratum. The result is EXACTLY "the
``cap`` docs with the smallest (md5(id), id) per stratum" — the
skew defense below never changes the answer, only the plan.

Scale design (100 TB):

1. The rank/window never sees the document payload: it runs over a
   projected ``(stratum, id, md5)`` frame and the winners semi-join
   back to the full rows. The wide text/media columns stay in the scan
   stage on both sides of the exchange.
2. A hot stratum (one domain with 10^9 docs) would put 10^9 rows into
   one window partition. Treating the first 15 md5 hex chars as a
   uniform draw u ∈ [0,1), a broadcast per-stratum rate filter keeps
   only u ≤ margin·cap/n(stratum) candidates BEFORE the window — an
   expected margin·cap rows per stratum, regardless of skew.
3. The prefilter provably kept the true top-``cap`` iff it kept at
   least min(cap, n) survivors (the top-cap are the cap SMALLEST u;
   losing any of them means fewer than cap survived the ≤-threshold
   cut). Strata failing that check — probability ~exp(-cap·(margin-1)²
   /(2·margin)) per stratum, ~1e-10 at margin 2, cap 200 — are rescued
   through the unfiltered path. Exactness is checked, not assumed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: 16^15 — first 15 md5 hex chars as a fraction of their value space
_HEX15_SPACE = float(1 << 60)


def md5_rank(id_col: Column) -> Column:
    """Deterministic engine-portable rank key: md5 hex of the id
    string. DuckDB: ``md5(CAST(id AS VARCHAR))``."""
    return F.md5(id_col.cast("string"))


def _uniform_from_md5(md5_hex: Column) -> Column:
    """First 15 hex chars → u ∈ [0,1). 15 chars = 60 bits fits a long
    exactly (16 would need unsigned 64)."""
    return (F.conv(F.substring(md5_hex, 1, 15), 16, 10).cast("long")
            / F.lit(_HEX15_SPACE))


def stratified_cap(df: DataFrame, stratum_col: str = "source",
                   id_col: str = "doc_id", cap: int = 100,
                   margin: float = 2.0,
                   prefilter: bool = True) -> DataFrame:
    """Keep at most ``cap`` rows per ``stratum_col``, deterministically:
    the rows with the smallest ``(md5(id), id)`` in their stratum. All
    original columns are preserved.

    ``prefilter=False`` disables the skew defense (plain projected
    window) — same result, used by tests to pin equivalence."""
    sid = F.col(stratum_col)
    key = df.select(sid.alias("_s"), F.col(id_col).alias("_id"),
                    md5_rank(F.col(id_col)).alias("_r"))
    if prefilter:
        counts = key.groupBy("_s").agg(F.count(F.lit(1)).alias("_n"))
        thr = F.least(F.lit(1.0), F.lit(margin * cap) / F.col("_n"))
        cand = (key.join(F.broadcast(counts), "_s")
                .filter(_uniform_from_md5(F.col("_r")) <= thr))
        # exactness check: a stratum whose survivor count fell below
        # min(cap, n) may have lost a true top-cap row → rescue it
        # through the unfiltered path (broadcast: strata are few)
        surv = cand.groupBy("_s").agg(F.count(F.lit(1)).alias("_m"))
        bad = (counts.join(surv, "_s", "left")
               .filter(F.coalesce(F.col("_m"), F.lit(0))
                       < F.least(F.lit(cap), F.col("_n")))
               .select("_s"))
        key = (cand.select("_s", "_id", "_r")
               .join(F.broadcast(bad), "_s", "left_anti")
               .unionByName(key.join(F.broadcast(bad), "_s", "left_semi")))
    w = Window.partitionBy("_s").orderBy("_r", "_id")
    winners = (key.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") <= cap)
               .select(F.col("_id").alias(id_col)))
    return df.join(winners, id_col, "left_semi")


def stratum_budget_report(df: DataFrame, stratum_col: str = "source",
                          cap: int = 100) -> DataFrame:
    """(stratum, n_docs, n_kept, capped): the audit table a quota pass
    emits alongside the sample — one partial-aggregated groupBy."""
    return (df.groupBy(F.col(stratum_col).alias("stratum"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .select("stratum", "n_docs",
                    F.least(F.col("n_docs"), F.lit(cap)).alias("n_kept"),
                    (F.col("n_docs") > cap).alias("capped")))
