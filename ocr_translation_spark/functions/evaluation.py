"""Retrieval-quality evaluation operators.

An approximate index (SRP-LSH, IVF) is only shippable with a measured
recall; at 100 TB the evaluation itself must be a distributed join,
not a driver-side loop over queries. ``topk_recall`` compares an
approximate top-k result against the exact one entirely in-plan:

* per-query exact-result sizes: one hash aggregate;
* hits: one equi-join on (query_id, neighbor_id) + one aggregate;
* recall emitted in exact integer MICRO-units (``1e6 * hits div k``,
  truncating integer division) so the number is engine-exact — the
  repo-wide convention for oracle-checkable fractions.

Queries whose approximate list missed EVERYTHING still appear (left
join, zero-filled) — an evaluation that silently drops its worst rows
overstates recall, the exact failure mode it exists to catch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def topk_recall(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Per-query recall of ``approx`` vs ``exact``; both carry
    (query_id, neighbor_id [, ...]). Returns
    (query_id, n_exact, n_hit, recall_micro)."""
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    e_cnt = e.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    h_cnt = (
        e.join(a, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_hit"))
    )
    return e_cnt.join(h_cnt, "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce(F.col("n_hit"), F.lit(0).cast("long")).alias("n_hit"),
        F.expr(
            "(1000000 * coalesce(n_hit, 0L)) div n_exact"
        ).alias("recall_micro"),
    )


def span_eval(
    pred: DataFrame, gold: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Span-level extraction quality: per-document precision / recall
    / F1 of a predicted span table against a golden one, in exact
    integer micro-units — the evaluation harness for the core
    span-sequence invariant (a pipeline change that reorders, drops,
    or rewrites spans shows up HERE as a number, not just as a
    pass/fail golden assert).

    Both inputs are EXPLODED span rows (id, ord, kind, text,
    media_ref) — the shape ``extract_synthetic_e2e`` emits. Metrics:

    * ``tp`` — multiset intersection on (kind, text, media_ref):
      sum over distinct triples of min(pred count, gold count) —
      order-insensitive credit;
    * ``pos_match`` / ``exact_seq`` — position-aligned agreement on
      ``ord`` (null-safe on every field) and the full-sequence
      equality flag: exact_seq == 1 iff the row passes the pipeline's
      golden span-sequence test;
    * ``precision/recall/f1_micro`` — 1e6-scaled truncating integer
      divisions (f1 = 2e6*tp div (n_pred+n_gold), the count form of
      the harmonic mean — no floats anywhere). A side with zero spans
      yields NULL for its undefined metric, never a silent drop.

    Shape: two (id, triple) hash aggregates, ONE full-outer equi-join
    of the triple tables (reusing their partitioning) whose id rollup
    yields tp and both side totals at once, plus one (id, ord)
    equi-join for position agreement — every join keyed, no window
    over the corpus, and the exploded span inputs are scanned exactly
    once per side."""
    cols = ["kind", "text", "media_ref"]
    # NULL fields (media spans carry NULL text; text spans NULL
    # media_ref) would silently fall out of the triple equi-join —
    # coalesce to a sentinel for the multiset keys (the position
    # compare below stays null-safe on the raw fields)
    sent = "\x01"

    def _norm(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            F.col("ord").cast("long").alias("ord"),
            *[F.col(c).alias(f"{c}_{side}") for c in cols],
        )

    p, g = _norm(pred, "p"), _norm(gold, "g")

    def _triples(df: DataFrame, side: str, cnt: str) -> DataFrame:
        return df.groupBy(
            "id",
            *[
                F.coalesce(F.col(f"{c}_{side}"), F.lit(sent)).alias(c)
                for c in cols
            ],
        ).agg(F.count(F.lit(1)).cast("long").alias(cnt))

    pc = _triples(p, "p", "c_p")
    gc = _triples(g, "g", "c_g")
    # ONE full-outer join of the two triple tables + ONE id rollup
    # yields tp AND both side totals (n_pred = sum of pred multiset
    # counts, likewise n_gold) — the former separate tp equi-join plus
    # two full-relation count aggregates re-scanned the exploded span
    # inputs twice more for numbers the triples already carry. The
    # join keys equal both groupBys' keys, so it reuses their
    # partitioning (no extra exchange before the id rollup).
    counts = (
        pc.join(gc, ["id"] + cols, "full_outer")
        .groupBy("id")
        .agg(
            F.sum(
                F.when(
                    F.col("c_p").isNotNull() & F.col("c_g").isNotNull(),
                    F.least("c_p", "c_g"),
                )
            )
            .cast("long")
            .alias("tp"),
            F.sum("c_p").cast("long").alias("n_pred"),
            F.sum("c_g").cast("long").alias("n_gold"),
        )
    )
    pos = (
        p.join(g, ["id", "ord"])
        .where(
            F.col("kind_p").eqNullSafe(F.col("kind_g"))
            & F.col("text_p").eqNullSafe(F.col("text_g"))
            & F.col("media_ref_p").eqNullSafe(F.col("media_ref_g"))
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("pos_match"))
    )
    z = F.lit(0).cast("long")
    out = (
        counts.join(pos, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_pred", z).alias("n_pred"),
            F.coalesce("n_gold", z).alias("n_gold"),
            F.coalesce("tp", z).alias("tp"),
            F.coalesce("pos_match", z).alias("pos_match"),
        )
    )
    return out.select(
        id_col,
        "n_pred",
        "n_gold",
        "tp",
        "pos_match",
        (
            (F.col("n_pred") == F.col("n_gold"))
            & (F.col("pos_match") == F.col("n_gold"))
        )
        .cast("int")
        .alias("exact_seq"),
        F.when(
            F.col("n_pred") > 0,
            F.expr("(1000000 * tp) div n_pred"),
        ).alias("precision_micro"),
        F.when(
            F.col("n_gold") > 0,
            F.expr("(1000000 * tp) div n_gold"),
        ).alias("recall_micro"),
        F.when(
            F.col("n_pred") + F.col("n_gold") > 0,
            F.expr("(2000000 * tp) div (n_pred + n_gold)"),
        ).alias("f1_micro"),
    )


def mrr_eval(
    df: DataFrame,
    queries: dict[str, list[str]],
    top_k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mean-reciprocal-rank ingredients for a fixed query set over an
    exact-integer BM25 ranking (retrieval.bm25_topk): one row per
    query — (query_id, n_rel_topk, first_rel_rank, rr_micro).

    Ground truth is the boolean-AND rule: a document is RELEVANT to a
    query iff it contains every query term (n_matched == |terms| in
    bm25_topk's output — but the DuckDB twin re-derives both the
    ranking and the relevance independently, so the label is not
    self-certifying). ``first_rel_rank`` is the 1-indexed rank of the
    best relevant document within the top_k (0 if none made the
    cut), and ``rr_micro = 1000000 div first_rel_rank`` is the exact
    truncating reciprocal rank the caller averages into MRR.

    Scale shape: the query set is O(1) (an eval harness, not a
    workload), so the plan is |queries| independent bm25_topk
    subtrees — each one corpus scan with row-local tf/dl aggregates,
    ONE single-row stats broadcast and a TakeOrdered head — unioned;
    the per-query rank/relevance reduction runs over top_k rows.
    """
    from pyspark.sql import Window
    from ocr_translation_spark.functions._lsh_common import (
        pin_exclusive,
    )
    from ocr_translation_spark.functions.retrieval import bm25_topk
    from ocr_translation_spark.functions.text import normalized_text

    if not queries:
        raise ValueError("queries must be non-empty")
    # normalize + tokenize the corpus ONCE and pin it — every query's
    # bm25 subtree reads the cached token arrays instead of re-running
    # the regexp pass per query (|queries| x corpus otherwise)
    toks_df = pin_exclusive(
        df.select(
            F.col(id_col),
            F.filter(
                F.split(normalized_text(F.col(text_col)), " "),
                lambda t: t != "",
            ).alias("_mrr_toks"),
        ),
        site="evaluation.mrr.toks",
    )
    parts = []
    for qid in sorted(queries):
        terms = queries[qid]
        topk = bm25_topk(
            toks_df, terms, top_k=top_k, text_col="_mrr_toks",
            id_col=id_col, pre_split=True,
        )
        # re-derive the 1-indexed rank under bm25_topk's own total
        # order (score desc, numeric id asc) over the tiny k-row head
        w = Window.orderBy(
            F.col("score_micro").desc(),
            F.col(id_col).cast("long").asc(),
        )
        rel = F.col("n_matched") == len(terms)
        parts.append(
            topk.select(
                F.row_number().over(w).alias("rank"),
                rel.alias("rel"),
            ).agg(
                F.lit(qid).alias("query_id"),
                # coalesce: a query matching NO document at all gives
                # an empty top-k, and SUM over an empty relation is
                # NULL, not 0
                F.coalesce(
                    F.sum(F.when(F.col("rel"), 1).otherwise(0)),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_rel_topk"),
                F.coalesce(
                    F.min(F.when(F.col("rel"), F.col("rank"))),
                    F.lit(0),
                )
                .cast("long")
                .alias("first_rel_rank"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "rr_micro",
        F.when(
            F.col("first_rel_rank") > 0,
            F.expr("1000000 div first_rel_rank"),
        ).otherwise(F.lit(0).cast("long")),
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact tie-aware ROC AUC per group, in ppm, without a global
    sort over the corpus.

    AUC is the Mann-Whitney pair statistic: the fraction of
    (positive, negative) pairs where the positive scores strictly
    higher, counting ties as half. The naive formulations are both
    scale-killers — pair counting is O(P*N), and the rank-sum form
    needs ``rank() OVER (ORDER BY score)``, a single-partition window
    over every row. Scalable identity: only the per-DISTINCT-score
    class counts matter. With n_pos(s)/n_neg(s) from one hash
    aggregate,

        2U = sum_s n_pos(s) * (2 * cum_neg_below(s) + n_neg(s))
        AUC_ppm = 1e6 * 2U div (2 * P * N)     (truncating, exact)

    where cum_neg_below is the running negative count over the
    O(distinct-scores) rollup — the corpus itself is touched by ONE
    map-side-combined aggregate; the window runs over the rollup,
    partitioned by group and bounded by the score domain. Callers
    with continuous scores should quantize first (ppm/bucketed
    scores bound the rollup at ~1e6 rows per group, a single-task
    window over counters, not corpus rows — same contract as
    ranknorm's distinct-value rollup). All products are
    DECIMAL(38,0): P*N overflows BIGINT past ~3e9 rows per class.

    Returns one row per group: (group_cols..., n_pos, n_neg,
    tie_pairs, auc_ppm); auc_ppm is NULL when either class is empty
    (AUC undefined), 500000 when every score ties.

    Reference parity note: the reference evaluates nothing; this is
    curation surface — the acceptance gate for the quality/filter
    scorers the engine ships (hashed_classifier_score,
    gopher_quality_rules, bigram_lm_score) against any labeled
    sample.
    """
    from pyspark.sql import Window

    gcols = [F.col(c) for c in group_cols]
    base = df.select(
        *gcols,
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("int").alias("_y"),
    ).filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())

    rollup = base.groupBy(*group_cols, "_s").agg(
        F.sum(F.when(F.col("_y") == 1, 1).otherwise(0))
        .cast("long")
        .alias("_np"),
        F.sum(F.when(F.col("_y") == 1, 0).otherwise(1))
        .cast("long")
        .alias("_nn"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_neg_below = F.coalesce(
        F.sum("_nn").over(w), F.lit(0).cast("long")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per_score = rollup.select(
        *group_cols,
        (
            dec(F.col("_np"))
            * (dec(cum_neg_below) * 2 + dec(F.col("_nn")))
        ).alias("_u2"),
        (dec(F.col("_np")) * dec(F.col("_nn"))).alias("_tie"),
        "_np",
        "_nn",
    )
    agg = per_score.groupBy(*group_cols).agg(
        F.sum("_np").cast("long").alias("n_pos"),
        F.sum("_nn").cast("long").alias("n_neg"),
        F.sum("_tie").cast("long").alias("tie_pairs"),
        F.sum("_u2").alias("_u2"),
    )
    return agg.select(
        *group_cols,
        "n_pos",
        "n_neg",
        "tie_pairs",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr(
                "cast((cast(_u2 as decimal(38,0))"
                " * cast(1000000 as decimal(38,0)))"
                " div (cast(2 as decimal(38,0))"
                " * cast(n_pos as decimal(38,0))"
                " * cast(n_neg as decimal(38,0))) as long)"
            ),
        ).alias("auc_ppm"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bin_width: int = 4,
) -> DataFrame:
    """Reliability-diagram table: bucket an integer score into
    fixed-width bins and report, per bin, the exact empirical
    positive rate against the exact mean score — the calibration
    companion to ``roc_auc`` (AUC measures ranking, this measures
    whether the score VALUE means what it claims).

    One hash aggregate over the corpus, no windows:
    (bin_id, n, n_pos, pos_rate_ppm, mean_score_micro), with
    ``bin_id = score div bin_width`` (floored — negative scores bin
    toward -inf consistently in both engines via floor division on
    longs), ``pos_rate_ppm = 1e6 * n_pos div n`` and
    ``mean_score_micro = 1e6 * sum(score) div n`` in DECIMAL(38,0)
    (sum(score) * 1e6 overflows BIGINT on ~9e12-row bins).
    """
    if bin_width < 1:
        raise ValueError("bin_width must be >= 1")
    base = df.select(
        F.col(score_col).cast("long").alias("_s"),
        F.col(label_col).cast("int").alias("_y"),
    ).filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
    binned = base.groupBy(
        F.floor(F.col("_s") / F.lit(bin_width))
        .cast("long")
        .alias("bin_id")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("_y") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.sum("_s").cast("decimal(38,0)").alias("_ssum"),
    )
    return binned.select(
        "bin_id",
        "n",
        "n_pos",
        F.expr("(1000000 * n_pos) div n").alias("pos_rate_ppm"),
        F.expr(
            "cast((cast(_ssum as decimal(38,0))"
            " * cast(1000000 as decimal(38,0)))"
            " div cast(n as decimal(38,0)) as long)"
        ).alias("mean_score_micro"),
    )


def kendall_tau(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Exact Kendall tau-a rank association between two integer
    scores — the agreement metric for comparing two RANKERS (does the
    cheap quality score order documents the way the expensive one
    does?) that, unlike Pearson/Spearman-with-ties, needs no sqrt and
    so fits the engine's exact-integer contract.

    tau_a = (concordant - discordant) / (n*(n-1)/2) over all row
    pairs. The naive count is O(n^2); the scalable identity is the
    same rollup decomposition as ``roc_auc``: only the joint
    per-distinct-(a, b) cell counts matter. With cells (a_i, b_i,
    n_i) from ONE hash aggregate,

        C = sum over cell pairs with a2 > a1 AND b2 > b1 of n1*n2
        D = sum over cell pairs with a2 > a1 AND b2 < b1 of n1*n2

    (ties on either axis contribute 0 by definition of tau-a). The
    cell-pair join is O(D^2) over the ROLLUP, not the corpus — the
    bounded-score-domain contract (quantize continuous scores first;
    the corpus itself is touched once). Returns one row: (n_rows,
    n_cells, concordant, discordant, tau_a_ppm) — all DECIMAL-exact,
    tau NULL when n < 2.
    """
    base = df.select(
        F.col(a_col).cast("long").alias("_a"),
        F.col(b_col).cast("long").alias("_b"),
    ).filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
    # the rollup feeds FOUR consumers (both join sides, n_cells,
    # n_rows = sum of cell counts — the corpus itself is scanned
    # exactly once); materialize it eagerly — it is O(D), tiny by the
    # bounded-domain contract
    cells = base.groupBy("_a", "_b").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    ).localCheckpoint(eager=True)
    c1 = cells.select(
        F.col("_a").alias("a1"), F.col("_b").alias("b1"),
        F.col("_n").alias("n1"),
    )
    c2 = cells.select(
        F.col("_a").alias("a2"), F.col("_b").alias("b2"),
        F.col("_n").alias("n2"),
    )
    dec = "decimal(38,0)"
    pairs = c1.join(c2, F.col("a2") > F.col("a1")).select(
        F.when(F.col("b2") > F.col("b1"),
               F.col("n1").cast(dec) * F.col("n2").cast(dec))
        .otherwise(F.lit(0).cast(dec))
        .alias("_c"),
        F.when(F.col("b2") < F.col("b1"),
               F.col("n1").cast(dec) * F.col("n2").cast(dec))
        .otherwise(F.lit(0).cast(dec))
        .alias("_d"),
    )
    meta = cells.agg(
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    agg = pairs.agg(
        F.coalesce(F.sum("_c"), F.lit(0).cast(dec)).alias("_C"),
        F.coalesce(F.sum("_d"), F.lit(0).cast(dec)).alias("_D"),
    )
    return (
        agg.join(F.broadcast(meta))
        .select(
            "n_rows",
            "n_cells",
            F.col("_C").cast("long").alias("concordant"),
            F.col("_D").cast("long").alias("discordant"),
            F.expr(
                "case when n_rows >= 2 then cast("
                "((_C - _D) * cast(2000000 as decimal(38,0)))"
                " div (cast(n_rows as decimal(38,0))"
                " * cast(n_rows - 1 as decimal(38,0))) as long) end"
            ).alias("tau_a_ppm"),
        )
    )


def cohens_kappa(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Cohen's kappa inter-annotator agreement (Cohen 1960) in exact
    ppm integers: one row
    ``(n, n_agree, marginal_prod_sum, kappa_ppm)`` where

      kappa = (p_o - p_e) / (1 - p_e)
            = (n * n_agree - marg) / (n * n - marg),
      marg  = sum over categories c of  count_a(c) * count_b(c)

    — the float-free form obtained by multiplying through by ``n^2``.
    ``kappa_ppm`` is the exact rational scaled to ppm with EXPLICIT
    toward-zero division (``sign * (1e6 * |num|) div den`` — the
    trend_slopes discipline: Spark ``div`` truncates toward zero while
    DuckDB ``//`` floors, and kappa is legitimately negative under
    systematic disagreement).  Degenerate tables where chance
    agreement is total (``n*n == marg``: both annotators constant)
    yield NULL, never a division error.

    Spark shape: one (a, b)-keyed cell aggregation over the corpus
    (the contingency table, O(categories^2) rows), then per-annotator
    marginals as two tiny aggregations equi-joined on the shared label
    domain and folded into a single-row rollup — after the first agg,
    every relation is category-bounded.  Annotator labels must be
    non-null (filtered here, identically in the twin).  The kappa
    arithmetic runs in DECIMAL(38,0) (the roc_auc/kendall_tau
    discipline — pure BIGINT would wrap at ~4e6 rows once the 1e6 ppm
    factor multiplies in); the emitted BIGINT ``marginal_prod_sum``
    column caps the audit at ~3e9 labeled rows per aggregation scope —
    far above any human-annotated set; shard beyond that.
    """
    cells = (
        df.select(
            F.col(a_col).alias("_a"), F.col(b_col).alias("_b")
        )
        .filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("c"))
        # three consumers (both marginals + the totals) read the
        # contingency table: persist so the corpus is scanned ONCE
        # per action, not three times. No build-time unpersist — the
        # returned relation still references the cache (the pagerank
        # convention); the mark is O(categories^2).
        .persist()
    )
    row_a = cells.groupBy(F.col("_a").alias("lbl")).agg(
        F.sum("c").alias("na")
    )
    col_b = cells.groupBy(F.col("_b").alias("lbl")).agg(
        F.sum("c").alias("nb")
    )
    marg = (
        row_a.join(col_b, "lbl")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("marg"))
        .select(F.coalesce("marg", F.lit(0)).alias("marg"))
    )
    tot = cells.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("c"))
              .otherwise(0)).alias("n_agree"),
    )
    one = tot.crossJoin(F.broadcast(marg))
    num = F.col("n") * F.col("n_agree") - F.col("marg")
    den = F.col("n") * F.col("n") - F.col("marg")
    return one.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_agree").cast("long").alias("n_agree"),
        F.col("marg").cast("long").alias("marginal_prod_sum"),
        F.when(
            den > 0,
            (F.signum(num).cast("long")
             * F.expr(
                 "cast((1000000 * abs((cast(n as decimal(38,0))"
                 " * n_agree) - marg))"
                 " div ((cast(n as decimal(38,0)) * n) - marg)"
                 " as long)")),
        ).cast("long").alias("kappa_ppm"),
    )
