"""COEC position-bias click modeling over impression logs.

Ranked-list logs (search results, recommendation slates, crawl-queue
review UIs) suffer EXAMINATION BIAS: position 1 gets clicked more
than position 10 regardless of relevance, so raw CTR mis-ranks items.
The industry-standard correction that needs no model fitting is COEC
— Clicks Over Expected Clicks (Zhang/Jones, "Comparing Click Logs and
Editorial Labels", WWW'07 workshop; the examination-hypothesis
normalizer behind most production CTR features):

    ctr(p)   = clicks at position p / impressions at position p
    COEC(i)  = clicks(i) / sum over i's impressions of ctr(pos)

COEC = 1 means the item performs exactly as its positions predict;
> 1 means it out-clicks its placement (under-ranked), < 1 the
opposite. The global position curve is itself the reusable
position-prior artifact.

Exactness: the position curve is carried in truncating-integer ppm
(``clicks_p * 1e6 div imps_p``) and an item's expected clicks as the
BIGINT sum of those ppm values (micro-clicks), so
``coec_ppm = clicks_i * 1e12 div expected_micro`` is engine-identical
— the repo's mirrored-truncation convention (the DEFINED statistic is
the ppm-quantized curve; both engines quantize identically, so no
float ulp can flip a value).

Spark shape (100 TB):
  1. Position assignment is ONE window shuffle keyed
     (user, session-day) — partitions are a user's daily impressions,
     bounded, never a scale hazard — ordered by (ts, tiebreak) for a
     total order.
  2. The position curve is a <= max_pos-row aggregate, BROADCAST back
     onto impressions (no second corpus shuffle for the join).
  3. The item rollup is the second and last corpus shuffle, keyed on
     the uniformly distributed item id.
Expected-click sums go through DECIMAL(38,0): 1e12 impressions of
ppm <= 1e6 stay inside headroom where a BIGINT would saturate.

Reference parity note: the reference has no ranking plane; this is
the feedback-loop operator a deployment ranking its OCR'd documents
(search over translated corpora) needs to de-bias engagement signals
before they feed quality scoring (functions/classifier.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_D38 = "decimal(38,0)"


def coec_position_bias(
    events: DataFrame,
    item: Column | str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    click_type: str = "click",
    max_pos: int = 10,
) -> DataFrame:
    """(item_id, n_impressions, n_clicks, expected_clicks_micro,
    coec_ppm) per item.

    Every event row is an impression of ``item``; rows whose type is
    ``click_type`` are the clicked ones. Position = 1-based rank of
    the impression within its (user, calendar-day) session ordered by
    (ts, tiebreak); impressions past ``max_pos`` are dropped (the
    standard depth cut — deep positions are too sparse for a stable
    prior). ``coec_ppm`` is NULL when the item's expected clicks are
    zero (every impression sat at a zero-CTR position). NULL user or
    ts rows are excluded.
    """
    if max_pos < 1:
        raise ValueError(f"max_pos must be >= 1: {max_pos}")
    it = F.col(item) if isinstance(item, str) else item
    u, t = F.col(user_col), F.col(ts_col)
    w = Window.partitionBy(u, F.to_date(t)).orderBy(
        t, F.col(tiebreak_col)
    )
    imp = (
        events.filter(u.isNotNull() & t.isNotNull())
        .select(
            it.alias("item_id"),
            (F.col(type_col) == click_type).cast("long").alias("clk"),
            F.row_number().over(w).alias("pos"),
        )
        .filter(F.col("pos") <= max_pos)
    )
    curve = imp.groupBy("pos").agg(
        F.count(F.lit(1)).alias("p_imps"),
        F.sum("clk").alias("p_clicks"),
    ).select(
        "pos",
        F.call_function(
            "div", F.col("p_clicks") * 1000000, F.col("p_imps")
        ).alias("ctr_ppm"),
    )
    per_item = (
        imp.join(F.broadcast(curve), "pos")
        .groupBy("item_id")
        .agg(
            F.count(F.lit(1)).alias("n_impressions"),
            F.sum("clk").alias("n_clicks"),
            F.sum(F.col("ctr_ppm").cast(_D38))
            .cast(_D38)
            .alias("_exp"),
        )
    )
    return per_item.select(
        "item_id",
        "n_impressions",
        "n_clicks",
        F.col("_exp").cast("long").alias("expected_clicks_micro"),
        F.when(
            F.col("_exp") > 0,
            F.call_function(
                "div",
                (
                    F.col("n_clicks").cast(_D38)
                    * F.lit(1000000000000).cast(_D38)
                ).cast(_D38),
                F.col("_exp"),
            ).cast("long"),
        ).alias("coec_ppm"),
    )


def position_ctr_curve(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    click_type: str = "click",
    max_pos: int = 10,
) -> DataFrame:
    """The reusable position prior alone: (pos, n_impressions,
    n_clicks, ctr_ppm) — same session/position semantics as
    :func:`coec_position_bias`."""
    u, t = F.col(user_col), F.col(ts_col)
    w = Window.partitionBy(u, F.to_date(t)).orderBy(
        t, F.col(tiebreak_col)
    )
    imp = (
        events.filter(u.isNotNull() & t.isNotNull())
        .select(
            (F.col(type_col) == click_type).cast("long").alias("clk"),
            F.row_number().over(w).alias("pos"),
        )
        .filter(F.col("pos") <= max_pos)
    )
    return imp.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n_impressions"),
        F.sum("clk").alias("n_clicks"),
    ).select(
        "pos",
        "n_impressions",
        "n_clicks",
        F.call_function(
            "div", F.col("n_clicks") * 1000000, F.col("n_impressions")
        ).alias("ctr_ppm"),
    )
