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
sum of ``imps(i, p) * ctr_ppm(p)`` (micro-clicks), so
``coec_ppm = clicks_i * 1e12 div expected_micro`` is engine-identical
— the repo's mirrored-truncation convention (the DEFINED statistic is
the ppm-quantized curve; both engines quantize identically, so no
float ulp can flip a value). A NULL event type is an impression that
is NOT a click (mirroring ``type == click`` Python semantics), never
a NULL that would leak into the curve.

Spark shape (100 TB):
  1. Position assignment is ONE window shuffle keyed
     (user, session-day) — partitions are a user's daily impressions,
     bounded, never a scale hazard — ordered by (ts, tiebreak) for a
     total order.
  2. The corpus immediately collapses to the (item, pos) ROLLUP —
     O(items x max_pos) rows — in the second and last corpus
     shuffle. Both the <= max_pos-row position curve AND the item
     aggregate derive from that rollup, so the events table is
     SCANNED ONCE and window-shuffled ONCE (a curve built from a
     separate branch would defeat ReuseExchange through column
     pruning and double the corpus cost — measured on the executed
     plan before this layout).
  3. The curve joins back to the rollup by BROADCAST; the final item
     aggregate groups O(items x max_pos) rows, not the corpus.
Expected-click products ride DECIMAL(38,0): 1e12 impressions of
ppm <= 1e6 stay inside headroom where a BIGINT would saturate.

Reference parity note: the reference has no ranking plane; this is
the feedback-loop operator a deployment ranking its OCR'd documents
(search over translated corpora) needs to de-bias engagement signals
before they feed quality scoring (functions/classifier.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_D38 = "decimal(38,0)"


def _impression_rollup(
    events: DataFrame,
    item: Column,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str,
    click_type: str,
    max_pos: int,
) -> DataFrame:
    """(item_id, pos, imps, clicks) — the shared (item, position)
    rollup both the curve and the COEC aggregate derive from. One
    corpus scan, one window shuffle, one rollup shuffle."""
    if max_pos < 1:
        raise ValueError(f"max_pos must be >= 1: {max_pos}")
    u, t = F.col(user_col), F.col(ts_col)
    w = Window.partitionBy(u, F.to_date(t)).orderBy(
        t, F.col(tiebreak_col)
    )
    imp = (
        events.filter(u.isNotNull() & t.isNotNull())
        .select(
            item.alias("item_id"),
            # NULL type == not a click (it stays an impression)
            F.coalesce(
                (F.col(type_col) == click_type).cast("long"),
                F.lit(0).cast("long"),
            ).alias("clk"),
            F.row_number().over(w).alias("pos"),
        )
        .filter(F.col("pos") <= max_pos)
    )
    return imp.groupBy("item_id", "pos").agg(
        F.count(F.lit(1)).alias("imps"),
        F.sum("clk").alias("clicks"),
    )


def _curve_from_rollup(rollup: DataFrame) -> DataFrame:
    """(pos, n_impressions, n_clicks, ctr_ppm) from the rollup —
    a <= max_pos-row aggregate over O(items x max_pos) rows."""
    return rollup.groupBy("pos").agg(
        F.sum("imps").alias("n_impressions"),
        F.sum("clicks").alias("n_clicks"),
    ).select(
        "pos",
        "n_impressions",
        "n_clicks",
        F.call_function(
            "div", F.col("n_clicks") * 1000000, F.col("n_impressions")
        ).alias("ctr_ppm"),
    )


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
    ``click_type`` are the clicked ones (NULL type = not a click).
    Position = 1-based rank of the impression within its
    (user, calendar-day) session ordered by (ts, tiebreak);
    impressions past ``max_pos`` are dropped (the standard depth cut
    — deep positions are too sparse for a stable prior).
    ``coec_ppm`` is NULL when the item's expected clicks are zero
    (every impression sat at a zero-CTR position). NULL user or ts
    rows are excluded.
    """
    it = F.col(item) if isinstance(item, str) else item
    rollup = _impression_rollup(
        events, it, user_col, ts_col, type_col, tiebreak_col,
        click_type, max_pos,
    ).persist()
    try:
        curve = _curve_from_rollup(rollup).select("pos", "ctr_ppm")
        per_item = (
            rollup.join(F.broadcast(curve), "pos")
            .groupBy("item_id")
            .agg(
                F.sum("imps").alias("n_impressions"),
                F.sum("clicks").alias("n_clicks"),
                F.sum(
                    F.col("imps").cast(_D38)
                    * F.col("ctr_ppm").cast(_D38)
                )
                .cast(_D38)
                .alias("_exp"),
            )
        )
        out = per_item.select(
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
        # materialize off the shared rollup cache, then release it
        return out.localCheckpoint(eager=True)
    finally:
        rollup.unpersist()


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
    n_clicks, ctr_ppm) — identical session/position semantics to
    :func:`coec_position_bias` (the same rollup helper)."""
    rollup = _impression_rollup(
        events,
        F.lit(0),
        user_col,
        ts_col,
        type_col,
        tiebreak_col,
        click_type,
        max_pos,
    )
    return _curve_from_rollup(rollup)
