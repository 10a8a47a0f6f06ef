"""The typed columnar plan (pure Column exprs) and the generic Arrow-UDF
plan (compiled closure tree) must produce identical verdicts on the docs
table — the engine's two execution paths cross-validate each other.
Mirrors suite_test.rb:126-130's "full == boolean == bootstrap" assertion.
"""

import pytest
from pyspark.sql import functions as F

from jsi_spark.compile.compiler import compile_schema
from jsi_spark.datagen import gen_docs
from jsi_spark.exec.columnar import typed_validator
from jsi_spark.functions.udfs import (
    row_as_json, valid_json_udf, violations_json_udf,
)
from jsi_spark.plans.docs_schema import DOCS_JSON_SCHEMA, DOCS_SCHEMA


@pytest.fixture(scope="module")
def docs(spark):
    return gen_docs(spark, 2000, n_media=100, seed=42).cache()


def test_typed_matches_generic_verdicts(spark, docs):
    compiled = compile_schema(DOCS_JSON_SCHEMA)
    tv = typed_validator(compiled, DOCS_SCHEMA)
    generic_valid = valid_json_udf(compiled)

    out = docs.select(
        "doc_id",
        tv.valid_column().alias("typed_valid"),
        generic_valid(row_as_json("doc_id", "spans")).alias("generic_valid"),
    )
    disagree = out.filter(
        F.col("typed_valid") != F.col("generic_valid")).collect()
    assert disagree == [], f"paths disagree on {len(disagree)} docs: " \
                           f"{disagree[:5]}"
    # the generator injects violations: both verdict classes must occur
    counts = dict(out.groupBy("typed_valid").count().collect())
    assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0


def test_typed_violations_match_generic_on_failures(spark, docs):
    compiled = compile_schema(DOCS_JSON_SCHEMA)
    tv = typed_validator(compiled, DOCS_SCHEMA)

    failing = docs.filter(~tv.valid_column()).limit(200)
    typed = failing.select(
        "doc_id", F.explode(tv.violations_column()).alias("v")
    ).select("doc_id", "v.keyword", "v.ptr").distinct()
    generic = failing.select(
        "doc_id",
        F.explode(violations_json_udf(compiled)(
            row_as_json("doc_id", "spans"))).alias("v")
    ).select("doc_id", "v.keyword", "v.ptr").distinct()

    # typed leaf violations ⊆ generic (generic also emits combinator
    # wrapper errors like then.invalid at the parent ptr)
    missing = typed.exceptAll(generic).collect()
    assert missing == [], f"typed emitted rows generic did not: {missing[:10]}"
    # every failing doc must have at least one violation row in both
    t_docs = {r.doc_id for r in typed.select("doc_id").distinct().collect()}
    g_docs = {r.doc_id for r in generic.select("doc_id").distinct().collect()}
    f_docs = {r.doc_id for r in failing.select("doc_id").collect()}
    assert f_docs == t_docs == g_docs


def test_violation_rows_shape(spark, docs):
    compiled = compile_schema(DOCS_JSON_SCHEMA)
    tv = typed_validator(compiled, DOCS_SCHEMA)
    rows = (docs.filter(~tv.valid_column())
            .select("doc_id", F.explode(tv.violations_column()).alias("v"))
            .select("doc_id", "v.*").limit(50).collect())
    assert rows
    for r in rows:
        assert r.keyword is not None or r.message_key == \
            "validation.false_schema"
        assert r.ptr is not None and (r.ptr == "" or r.ptr.startswith("/"))
        if r.ptr.startswith("/spans/"):
            assert r.span_index == int(r.ptr.split("/")[2])


def test_datagen_deterministic_across_partitioning(spark):
    a = gen_docs(spark, 500, n_media=50, seed=7, partitions=2)
    b = gen_docs(spark, 500, n_media=50, seed=7, partitions=13)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
