"""Inverted-index construction (term -> bounded posting list + df).

The retrieval side of a data pipeline (BM25 candidate generation,
contamination lookups, corpus search) needs term postings. At 100 TB
the hazard is the hot-term group: ``collect_list`` over a stopword's
postings is an unbounded single-reducer allocation. The standard fix
applied here: rank doc ids per term with a window FIRST, collect only
ranks <= ``max_postings`` (the conditional inside the aggregate), and
keep the full document frequency from the same aggregate — so the
grouped state is bounded by construction while df stays exact. The
window and the final aggregate share the term hash partitioning: one
shuffle total.

Postings are emitted as a CSV string (sorted ascending) rather than an
array column so the DuckDB value oracle compares scalars exactly.

Reference parity note: the reference service has no index surface;
this is training-data-pipeline breadth beyond parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import normalized_text, tokens


def inverted_index(
    df: DataFrame,
    max_postings: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term, df, postings_csv): document frequency over ALL docs and
    the first ``max_postings`` doc ids (ascending) per term."""
    pairs = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(
            F.array_distinct(tokens(normalized_text(F.col(text_col))))
        ).alias("term"),
    ).where(F.col("term") != "")
    w = Window.partitionBy("term").orderBy("id")
    ranked = pairs.withColumn("rk", F.row_number().over(w))
    postings = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(F.col("rk") <= max_postings, F.col("id"))
                )
            ),
            lambda x: x.cast("string"),
        ),
        ",",
    )
    return ranked.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        postings.alias("postings_csv"),
    )


def anchor_text_agg(
    edges: DataFrame,
    max_anchors: int = 16,
    src_col: str = "src",
    dst_col: str = "dst",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Per-target link-graph anchor-text aggregation — the classic
    web-corpus quality/ranking signal (anchor text describes the
    TARGET better than the target describes itself; public since
    WWW7/PageRank-era search literature).

    Output: ``(dst, in_degree, n_sources, anchors_csv)`` —

    * ``in_degree``  — exact count of incoming links,
    * ``n_sources``  — exact distinct linking documents,
    * ``anchors_csv`` — the first ``max_anchors`` anchor strings in
      (anchor, src) order, '|'-joined.

    Same hot-key discipline as :func:`inverted_index`: a popular
    target (the stopword of link graphs) must not become an unbounded
    ``collect_list`` group, so ranks are computed by a window FIRST
    and only ranks <= ``max_anchors`` enter the aggregate, while
    in_degree / n_sources stay exact over ALL rows of the same
    dst-hash shuffle (window + aggregate share one exchange).
    """
    ranked = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(anchor_col).alias("anchor"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("dst").orderBy("anchor", "src")
        ),
    )
    anchors = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("rk") <= max_anchors,
                        F.struct(
                            F.col("anchor").alias("a"),
                            F.col("src").alias("s"),
                        ),
                    )
                )
            ),
            lambda x: x.getField("a"),
        ),
        "|",
    )
    return ranked.groupBy("dst").agg(
        F.count(F.lit(1)).alias("in_degree"),
        F.countDistinct("src").alias("n_sources"),
        anchors.alias("anchors_csv"),
    )
