"""Declarative data-contract validation (functions/audit)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_translation_spark.functions.audit import (
    constraint_audit,
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    unique,
)

SCHEMA = "id long, k long, status string, price double, tag string"


def _df(spark):
    rows = [
        (1, 10, "F", 5.0, "1-A"),
        (2, 11, "O", -2.0, "2-B"),     # price out of range
        (3, None, "Z", 7.0, "bad"),    # null k, bad status, bad tag
        (3, 12, "F", 9.0, "3-C"),      # duplicate id
        (4, 99, None, None, None),     # nulls: only not_null(k) sees k
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_hand_computed_counts_per_kind(spark):
    spark_df = _df(spark)
    ref = spark.createDataFrame([(10,), (11,), (12,)], "rk long")
    out = {
        r.rule: (r.n_rows, r.n_violations)
        for r in constraint_audit(
            spark_df,
            [
                not_null("k"),
                in_range("price", 0.0, 100.0),
                in_set("status", ("F", "O")),
                matches("tag", "^[0-9]-"),
                unique(("id",)),
                foreign_key("k", ref, "rk", "ref"),
            ],
        ).collect()
    }
    assert out["not_null(k)"] == (5, 1)
    # NULL price does NOT violate the range rule (row 5)
    assert out["in_range(price,0.0,100.0)"] == (5, 1)
    # NULL status does not violate in_set; 'Z' does
    assert out["in_set(status)"] == (5, 1)
    assert out["matches(tag)"] == (5, 1)
    assert out["unique(id)"] == (5, 1)  # rows beyond first per key
    # k=99 dangles; NULL k is not an FK violation
    assert out["foreign_key(k->ref.rk)"] == (5, 1)


def test_clean_table_reports_zero_everywhere(spark):
    df = spark.createDataFrame([(1, "F"), (2, "O")], "id long, s string")
    out = constraint_audit(
        df, [not_null("id"), in_set("s", ("F", "O")), unique(("id",))]
    ).collect()
    assert all(r.n_violations == 0 for r in out)
    assert {r.rule for r in out} == {
        "not_null(id)", "in_set(s)", "unique(id)"
    }


def test_multi_column_unique(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "a")], "x long, y string"
    )
    out = constraint_audit(df, [unique(("x", "y"))]).collect()[0]
    assert out.rule == "unique(x,y)"
    assert (out.n_rows, out.n_violations) == (4, 1)


def test_row_local_rules_share_one_aggregate(spark):
    # N row-local rules must not add exchanges beyond the single agg
    df = _df(spark)
    one = constraint_audit(df, [not_null("k")])
    many = constraint_audit(
        df,
        [
            not_null("k"),
            in_range("price", 0.0, 100.0),
            in_set("status", ("F", "O")),
            matches("tag", "^[0-9]-"),
        ],
    )

    def _exchanges(q):
        return (
            q._jdf.queryExecution().executedPlan().toString()
        ).count("Exchange")

    assert _exchanges(many) == _exchanges(one)


def test_empty_constraint_list_raises(spark):
    with pytest.raises(ValueError, match="no constraints"):
        constraint_audit(_df(spark), [])
