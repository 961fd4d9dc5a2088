"""taxonomy_tag: hand-computed topic counts, deterministic tie-break
toward the smallest topic, the untagged convention, and the
zero-shuffle plan shape."""

from __future__ import annotations

from ocr_translation_spark.functions.taxonomy import taxonomy_tag


def _run(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return [
        r.asDict() for r in taxonomy_tag(df, **kw).orderBy("doc_id").collect()
    ]


def test_counts_are_occurrences_not_distinct(spark):
    (r,) = _run(spark, ["join join join data fast"])
    assert r["n_ops"] == 3 and r["n_schema"] == 1 and r["n_perf"] == 1
    assert r["top_topic"] == "ops" and r["top_score"] == 3


def test_tie_breaks_to_smallest_topic(spark):
    # ops and schema tie at 2; sorted topic order picks 'ops'
    (r,) = _run(spark, ["join scan data table"])
    assert r["n_ops"] == 2 == r["n_schema"]
    assert r["top_topic"] == "ops"
    # perf/schema tie without ops -> 'perf'
    (r2,) = _run(spark, ["fast data"])
    assert r2["top_topic"] == "perf" and r2["top_score"] == 1


def test_untagged_documents_get_empty_topic(spark):
    (r,) = _run(spark, ["nothing matches here"])
    assert r["top_topic"] == "" and r["top_score"] == 0


def test_custom_lexicon_and_case_normalization(spark):
    (r,) = _run(
        spark,
        ["Alpha BETA beta"],
        lexicon={"a": ("alpha",), "b": ("beta",)},
    )
    assert r["n_a"] == 1 and r["n_b"] == 2
    assert r["top_topic"] == "b"


def test_plan_is_shuffle_free(spark):
    df = spark.range(50).selectExpr(
        "id as doc_id", "concat('join data fast w', id) as text"
    )
    plan = (
        taxonomy_tag(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
