"""Greedy k-center coreset selection (Gonzalez farthest-point).

Training-data curation wants a small, maximally-diverse exemplar set
— seed prompts, eval anchors, cluster initializations. Farthest-point
traversal is the classic answer: repeatedly pick the point farthest
from everything chosen so far. It is a 2-approximation to the optimal
k-center cover (Gonzalez 1985), and unlike random sampling it cannot
collapse onto one dense mode.

Scale shape: the naive form recomputes distance-to-selected-set every
round — O(k^2 n) vector ops. The incremental identity
``mind_r(x) = least(mind_{r-1}(x), dist2(x, c_{r-1}))`` needs only the
NEWEST center per round: k corpus scans total (O(k n) vector ops),
each one persisted map + one TakeOrdered(1) argmax — no shuffle at
all beyond the seed/argmax reductions. Driver state is the selected
centers themselves, O(k * dim) longs (the same bounded-control-state
contract as IVF's centroid collect).

Exactness: coordinates quantize via ``floor(x * 2^20)`` — a power-of-
two multiply is an exponent shift (exact in binary FP) and floor has
no rounding mode, so Spark and DuckDB produce identical BIGINTs from
identical floats; squared-L2 on quantized coords stays far inside
BIGINT (dim 64: <= 64 * 2^42 ~ 2^48). Ties at the argmax break by
smallest id — fully deterministic under any partitioning.

Reference parity note: the reference selects nothing; this is the
data-selection family (mixture_resample, dsir_select pick by WEIGHT;
this picks by GEOMETRY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def _dist2(vcol, center: list[int]):
    lit = F.array(*[F.lit(int(c)).cast("long") for c in center])
    return F.aggregate(
        F.zip_with(vcol, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kcenter_coreset(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale_bits: int = 20,
) -> DataFrame:
    """Greedy k-center selection: (sel_rank, vec_id, sel_dist2,
    radius2). ``sel_rank`` 0 is the seed (smallest id, sel_dist2 0);
    rank r > 0 is the point farthest (quantized squared L2) from
    centers 0..r-1 at its selection, ties to smallest id; ``radius2``
    is the k-center objective — the max remaining distance AFTER all
    k centers — repeated on every row. Stops early (fewer rows) when
    the corpus has fewer than k points."""
    if k < 1:
        raise ValueError("k must be >= 1")
    mul = float(1 << scale_bits)
    q = (
        df.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).cast("long").alias("_id"),
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * F.lit(mul)).cast(
                    "long"
                ),
            ).alias("_v"),
        )
    )

    seed = q.orderBy("_id").limit(1).collect()
    if not seed:
        return df.sparkSession.createDataFrame(
            [],
            "sel_rank long, vec_id long, sel_dist2 long, radius2 long",
        )
    selected = [(int(seed[0]["_id"]), list(seed[0]["_v"]), 0)]

    cur = q.withColumn("_md", F.lit(None).cast("long"))
    prev = None
    try:
        for _ in range(1, k):
            c_id, c_vec, _ = selected[-1]
            nxt = cur.withColumn(
                "_md",
                F.least(
                    F.coalesce(F.col("_md"), F.lit(1 << 62)),
                    _dist2(F.col("_v"), c_vec),
                ),
            ).persist(StorageLevel.MEMORY_AND_DISK)
            chosen = set(s[0] for s in selected)
            top = (
                nxt.filter(
                    ~F.col("_id").isin([int(i) for i in chosen])
                )
                .orderBy(F.col("_md").desc(), F.col("_id").asc())
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
            prev = nxt
            cur = nxt
            if not top:
                break  # corpus exhausted before k centers
            r = top[0]
            selected.append(
                (int(r["_id"]), list(r["_v"]), int(r["_md"]))
            )
        # objective: max distance after the LAST center's update
        c_id, c_vec, _ = selected[-1]
        final_md = F.least(
            F.coalesce(F.col("_md"), F.lit(1 << 62)),
            _dist2(F.col("_v"), c_vec),
        )
        chosen = [int(s[0]) for s in selected]
        rad = (
            cur.select(final_md.alias("_f"), "_id")
            .filter(~F.col("_id").isin(chosen))
            .agg(F.max("_f").alias("r"))
            .collect()[0]["r"]
        )
        radius2 = int(rad) if rad is not None else 0
    finally:
        if prev is not None:
            prev.unpersist()

    rows = [
        (rank, sid, sdist, radius2)
        for rank, (sid, _, sdist) in enumerate(selected)
    ]
    return df.sparkSession.createDataFrame(
        rows, "sel_rank long, vec_id long, sel_dist2 long, radius2 long"
    )
