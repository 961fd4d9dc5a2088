"""T5-style span-corruption training-example generation.

Seq2seq pretraining (T5, Raffel et al., JMLR'20; UL2's denoisers) is
trained on (corrupted input, target) pairs: ~15% of tokens are
dropped in short contiguous spans, each span replaced by ONE sentinel
token ``<extra_id_k>`` in the input, and the target lists the
sentinels with their dropped spans in order.  Generating these pairs
over the whole corpus is a training-data pipeline stage, and a
deterministic variant is required for verifiable repeated runs.

Determinism here is grid-aligned: token positions are cut into
fixed-width blocks of ``B = 5``; a block whose first ``L = 3`` tokens
fit entirely in the document is masked iff a sha256 of
``(doc_id, block)`` selects it (1-in-4) — giving a 3/5 * 1/4 = 15%
expected token-mask rate, the T5 default, with spans that can NEVER
overlap (the published samplers resample until spans are disjoint;
the grid gets disjointness by construction, which is what makes the
operator exactly reproducible on two engines).

Spark shape at 100 TB: the whole operator is ONE row-local projection
chain — tokenize, per-block mask flags, running sentinel index, and
the input/target reassembly are all array expressions over NAMED
columns (each lambda references a bound column attribute, never an
expression subtree, so nothing is re-evaluated per element — the
classifier.py / shingles CSE note).  Zero shuffles, zero joins, zero
Python; Catalyst fuses it into a single WholeStageCodegen map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import normalized_text

_B = 5  # block width (tokens)
_L = 3  # masked span length (first L tokens of a selected block)


def _block_hash(id_str: Column, b: Column) -> Column:
    """sha256-derived selector for (doc, block): first 5 hex chars as
    an integer (same recipe as classifier._tok_hash; DuckDB spells it
    ('0x' || substr(sha256(s), 1, 5))::UBIGINT)."""
    return F.conv(
        F.substring(
            F.sha2(F.concat(id_str, F.lit(":"), b.cast("string")), 256),
            1,
            5,
        ),
        16,
        10,
    ).cast("long")


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    select_mod: int = 4,
) -> DataFrame:
    """Per document: ``(id, n_tokens, n_spans, n_masked_tokens,
    input_text, target_text)``.

    ``select_mod`` tunes the mask rate: a maskable block is selected
    when ``hash(doc, block) % select_mod == 0``, so the expected token
    rate is ``(L/B) / select_mod`` (= 15% at the default 4).
    Sentinels are numbered sequentially per document in block order,
    exactly the T5 target format::

        input:  tok tok <extra_id_0> tok ... <extra_id_1> ...
        target: <extra_id_0> dropped span <extra_id_1> dropped span
    """
    t = F.col(text_col)
    toks = F.when(
        F.trim(t) == "", F.array().cast("array<string>")
    ).otherwise(F.split(normalized_text(t), " "))

    step1 = df.select(
        F.col(id_col).alias("_id"),
        F.col(id_col).cast("string").alias("_ids"),
        toks.alias("_toks"),
    )
    n = F.size("_toks")
    nb = F.floor((n + _B - 1) / _B).cast("int")
    # sequence() DESCENDS when stop < start — guard empty docs
    step2 = step1.select(
        "*",
        F.when(nb > 0, F.sequence(F.lit(0), nb - 1))
        .otherwise(F.array().cast("array<int>"))
        .alias("_bs"),
    )
    # mask flag per block: the span must fit entirely (5b + 3 <= n)
    step3 = step2.select(
        "_id",
        "_toks",
        "_bs",
        F.transform(
            "_bs",
            lambda b: F.when(
                (b * _B + _L <= F.size("_toks"))
                & (_block_hash(F.col("_ids"), b) % select_mod == 0),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        ).alias("_mf"),
    )
    # running sentinel index: masked blocks BEFORE b (slice of the
    # named _mf attribute — O(nb^2) integer adds on in-row arrays)
    step4 = step3.select(
        "*",
        F.transform(
            "_bs",
            lambda b: F.aggregate(
                F.slice("_mf", 1, b.cast("int")),
                F.lit(0),
                lambda acc, x: acc + x,
            ),
        ).alias("_cum"),
    )

    def _sent(b: Column) -> Column:
        return F.concat(
            F.lit("<extra_id_"),
            F.element_at("_cum", (b + 1).cast("int")).cast("string"),
            F.lit(">"),
        )

    def _masked(b: Column) -> Column:
        return F.element_at("_mf", (b + 1).cast("int")) == 1

    pieces_in = F.transform(
        "_bs",
        lambda b: F.when(
            _masked(b),
            F.concat(
                F.array(_sent(b)),
                F.slice("_toks", b * _B + _L + 1, _B - _L),
            ),
        ).otherwise(F.slice("_toks", b * _B + 1, _B)),
    )
    pieces_tgt = F.transform(
        "_bs",
        lambda b: F.when(
            _masked(b),
            F.concat(F.array(_sent(b)), F.slice("_toks", b * _B + 1, _L)),
        ).otherwise(F.array().cast("array<string>")),
    )
    return step4.select(
        F.col("_id").alias(id_col),
        F.size("_toks").cast("long").alias("n_tokens"),
        F.aggregate("_mf", F.lit(0), lambda a, x: a + x)
        .cast("long")
        .alias("n_spans"),
        (
            F.aggregate("_mf", F.lit(0), lambda a, x: a + x) * _L
        )
        .cast("long")
        .alias("n_masked_tokens"),
        F.concat_ws(" ", F.flatten(pieces_in)).alias("input_text"),
        F.concat_ws(" ", F.flatten(pieces_tgt)).alias("target_text"),
    )
