"""Driver-contract regression tests: __spark_entry__.queries() vs
oracle_sql() parity on sf0.001 (the same comparison the driver runs at
sf0.01 — order-insensitive, column-name-sorted value equality)."""

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# cheap, representative subset (full sweep runs in the driver / harness)
PARITY = ["docs_valid", "docs_violations", "docs_verdicts",
          "orders_violations", "duplicate_user_ids",
          "referential_dangling", "psi_value_drift",
          "token_counts", "lang_id", "quality_scores", "fingerprints",
          "dedup_exact", "ann_bruteforce", "events_json_violations",
          "lineitem_draft04_valid", "docs_contains", "span_equality",
          "docs_with_defaults", "stream_psi_drift"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(v):
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def _key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", PARITY)
def test_query_matches_oracle(spark, con, name):
    df = E.queries()[name](spark, SF)
    scols = df.columns
    srows = [tuple(r) for r in df.collect()]
    cur = con.execute(E.oracle_sql()[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _key(srows, scols) == _key(orows, ocols)


def test_entry_smoke(spark):
    out = E.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"part", "docs", "passed", "failed", "pass"}


def test_every_query_has_callable_shape(spark):
    qs = E.queries()
    assert len(qs) >= 20
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    # ≥ 2/3 of queries must be oracle-gated (the strong check)
    assert len(oracles) * 3 >= len(qs) * 2


# hash-dependent queries: oracle is a pure-Python/numpy golden rendered
# as a VALUES table (jsi_spark/oracles.py), regenerated HERE at sf0.001
# (oracle_sql() itself bakes the driver's sf0.01)
GOLDEN = ["minhash_near_dups", "simhash_candidates", "ann_lsh",
          "ann_ivf", "media_features", "semantic_dedup", "ann_pq",
          "ann_ivf_pq"]


@pytest.mark.parametrize("name", GOLDEN)
def test_golden_oracle_matches_query(spark, con, name):
    from jsi_spark.oracles import golden_oracle_sqls

    df = E.queries()[name](spark, SF)
    scols = df.columns
    srows = [tuple(r) for r in df.collect()]
    cur = con.execute(golden_oracle_sqls(SF)[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows), \
        f"spark={len(srows)} golden={len(orows)}"
    assert _key(srows, scols) == _key(orows, ocols)


def test_all_driver_queries_have_oracles():
    """Round-2 goal: every queries() entry is oracle-gated."""
    assert set(E.oracle_sql()) == set(E.queries())


def test_incremental_uniqueness_repeat_calls_identical(spark):
    """The (session, sf_dir)-memoized harness state must make repeat
    calls pure: same violation set every time (the bench times pass 2+,
    the driver's gate may call once or twice)."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    q = E.queries()["incremental_uniqueness"]
    a = sorted(tuple(r) for r in q(spark, sf).collect())
    b = sorted(tuple(r) for r in q(spark, sf).collect())
    assert a == b and len(a) > 0


def test_pinned_conf_restores_on_error(spark):
    """_pinned_conf must restore ambient confs even when the body
    raises — a failed streaming drain must not leak a pinned timezone
    into the harness session."""
    import pytest as _pytest

    import __spark_entry__ as E

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    with _pytest.raises(RuntimeError):
        with E._pinned_conf(spark,
                            spark__sql__session__timeZone="America/Denver",
                            spark__sql__shuffle__partitions="3"):
            assert spark.conf.get(
                "spark.sql.session.timeZone") == "America/Denver"
            assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.session.timeZone") == old_tz
    assert spark.conf.get("spark.sql.shuffle.partitions") == old_sp
