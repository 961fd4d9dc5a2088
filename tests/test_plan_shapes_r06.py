"""Plan-shape regression gates for the two headline queries that had
none (VERDICT r5 ask #5): extract_flagship and minhash_near_dup.

Constant-factor wins rot silently — an accidental extra
``repartition`` or a new Python crossing changes no result, only the
plan — so these tests pin the physical shape the optimization rounds
measured:

* extract_flagship shape — exactly ONE ``Exchange hashpartitioning``
  (the explicit salted queue-hop repartition; derive + stage B/C stay
  one fused codegen chain) and ZERO Python-evaluation nodes
  (media=None: stage A never runs, B+C are whole-stage codegen).
* minhash_near_dup — the banded candidate path's RUNTIME stage count:
  distinct ShuffleQueryStage ids after execution (textual Exchange
  counts overcount badly here because the persisted shingle+signature
  subtree re-prints under every InMemoryRelation reference —
  tools/plan_stats.py convention).

A companion test proves the exchange gate genuinely fires on an
injected extra ``repartition``.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from ocr_translation_spark.derive import derive_span_documents
from ocr_translation_spark.pipeline import extract

_PY_NODES = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandas",
)

_WORDS = ("alpha", "beta", "gamma", "dup", "scan", "join", "delta")


def _flat_docs(spark, n=120):
    """(doc_id, text): every group of 3 consecutive docs shares one
    12-word text (planted duplicates, so the near-dup path is
    non-degenerate)."""
    words = F.array(*[F.lit(w) for w in _WORDS])
    g = F.col("id") - F.col("id") % 3
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(11)),
                lambda i: F.element_at(
                    words,
                    ((g * 7 + i * 3) % len(_WORDS)).cast("int") + 1,
                ),
            ),
        ).alias("text"),
    )


def _flagship(spark):
    span_docs = derive_span_documents(_flat_docs(spark))
    return extract(spark, span_docs, media=None).result


def test_flagship_single_exchange_no_python(spark):
    df = _flagship(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert not any(m in plan for m in _PY_NODES), plan


def test_flagship_extra_repartition_detected(spark):
    # sanity: the gate genuinely fires on an injected repartition
    df = _flagship(spark).repartition(4, "doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan


@pytest.fixture(scope="module")
def _minhash_executed(spark):
    from ocr_translation_spark.functions.dedup import (
        minhash_near_dup_pairs,
    )

    df = minhash_near_dup_pairs(_flat_docs(spark))
    df.collect()  # finalize the AQE plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_minhash_runtime_stage_budget(_minhash_executed):
    shuffles = len(
        set(re.findall(r"ShuffleQueryStage (\d+)", _minhash_executed))
    )
    # the r6-measured runtime shape: banded-candidate generation +
    # verify joins over the persisted signature subtree. An extra
    # repartition or a lost exchange-reuse raises this.
    assert 1 <= shuffles <= 12, _minhash_executed


def test_minhash_no_python_no_cartesian(_minhash_executed):
    assert not any(m in _minhash_executed for m in _PY_NODES)
    assert "CartesianProduct" not in _minhash_executed
    assert "BroadcastNestedLoop" not in _minhash_executed
