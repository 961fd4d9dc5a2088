"""Product-quantization ANN: per-subspace codebooks + ADC scoring.

The third scale path for similarity search (beside SRP-LSH in
similarity.py and IVF in ivf.py), shaped like FAISS PQ / ScaNN's
asymmetric hashing: split the ``dim``-dimensional vector into ``m``
contiguous subspaces, learn a tiny codebook per subspace, and store
each corpus vector as ``m`` small integer codes.  At query time the
query is NOT quantized (the asymmetric trick): a per-subspace table of
exact query-to-codeword affinities is computed once per query, and
every corpus vector's approximate inner product is just ``m`` table
lookups summed — no per-candidate float vector ever touched.

Why this matters at 100 TB: a 64-dim float64 corpus is 512 bytes/row;
4 codes of a 4-entry codebook are 4 bytes/row (128x).  The scan that
dominates ANN cost becomes memory-bandwidth-light, and the encode pass
is ONE narrow no-shuffle projection (argmax over ``n_codes`` literal
dot products per subspace — all WholeStageCodegen, no Python, no
join).  Scoring is a broadcast of the tiny per-query distance tables
against the linear code scan; the only shuffle is the final per-query
top-k window.

This variant quantizes for MAXIMUM INNER PRODUCT (the ScaNN/MIPS
formulation) rather than L2: assignment and ADC both use the plain dot
product, which reuses the repo's exact-verified dot machinery
(``similarity._dot`` == DuckDB ``list_dot_product`` — the ivf/cosine
oracles already prove bit-agreement on this data), keeping the DuckDB
twin value-exact without floating-point re-association risk.

Determinism contract (mirrored by the oracle in ``__spark_entry__``):
* training sample: same bounded sha-prefix + smallest-id-cap rule as
  IVF (``ivf.training_set``);
* codebook init (per subspace): the subvectors of the ``n_codes``
  smallest training ids;
* assign: max inner product, ties to the smaller code id;
* update: per-dimension median per code (order-independent — the
  reason k-MEDIANS, see ivf.py); empty code keeps its previous entry;
* encode/score: ties in the final ranking break on the neighbor id.

Reference parity: the reference has no ANN at all; this is part of the
similarity-search family the 100 TB brief requires (brute-force exact,
LSH, IVF, PQ — the standard ladder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .ivf import training_set
from .similarity import _dot

__all_dot = _dot  # kept imported: the rerank's exact pass uses it


def _lit_arr_sql(vec: list[float]) -> str:
    """A double-array literal as SQL text. One ``F.lit(list)`` plus
    the per-element Column ops costs dozens of py4j round trips; with
    m * n_codes codeword literals per expression that adds SECONDS of
    driver-side build time per call site (measured 4.2 s per training
    iteration). A single SQL string is one py4j call and parses
    JVM-side. ``repr`` round-trips doubles exactly; the ``D`` suffix
    forces DOUBLE (a bare ``1.5`` parses as DECIMAL in Spark SQL)."""
    return "array(" + ",".join(repr(float(x)) + "D" for x in vec) + ")"


def _dot_sql(arr_sql: str, vec: list[float]) -> str:
    """SQL text for ``similarity._dot(arr, lit(vec))`` — the SAME
    aggregate(zip_with(...)) Catalyst expression (identical fold
    order, so bit-identical doubles), just parsed instead of built
    op-by-op over py4j."""
    return (
        f"aggregate(zip_with({arr_sql}, {_lit_arr_sql(vec)}, "
        "(x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _assign_sql(arr_sql: str, book: list[tuple[int, list[float]]]) -> str:
    """SQL text for the codeword assignment: smallest (-dot, code)
    struct — identical semantics to the Column-built form."""
    structs = ",".join(
        f"named_struct('d', -({_dot_sql(arr_sql, vec)}),"
        f" 'code', cast({int(code)} as int))"
        for code, vec in book
    )
    return f"element_at(array_sort(array({structs})), 1).code"


def pq_codebooks(
    emb: DataFrame,
    dim: int,
    m: int = 4,
    n_codes: int = 4,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample_hex_zeros: int | None = None,
    train_cap: int | None = None,
) -> list[list[tuple[int, list[float]]]]:
    """Per-subspace k-medians codebooks: ``books[s]`` is
    ``[(code, codeword)]`` for subspace ``s``.  Codebooks live on the
    driver (``m * n_codes * dim/m`` doubles — tiny); each training
    iteration is one distributed assign + one distributed per-dim
    median over the bounded training sample (see
    ``ivf.training_set``)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sd = dim // m
    t = training_set(
        emb.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        ),
        train_sample_hex_zeros,
        train_cap,
    )
    # the bounded sample feeds m * (1 init + iters) jobs; checkpoint
    # it eagerly so the corpus-wide sample scan runs ONCE, not ~3m
    # times (at 100 TB the sample rule is a full-corpus filter/top-k —
    # the training rows themselves are tiny)
    t = t.localCheckpoint(eager=True)
    # ALL m subspaces train in ONE job per phase (the driver-loop
    # batching the per-round tiny jobs otherwise cost ~3m collect
    # actions of fixed scheduling latency each — the dominant cold
    # cost, not data volume):
    #   init   — the n_codes smallest-id training rows are the SAME
    #            rows for every subspace, so one collect of the full
    #            vectors serves all m (sliced driver-side);
    #   iter   — the sample explodes to (s, sv) pairs once, each row
    #            assigns against its own subspace's centroid literals
    #            (element_at on an array-of-arrays literal indexed by
    #            s), and one (s, code, dim) median aggregate updates
    #            every codebook in a single collect.
    # Per-subspace semantics are unchanged: same init rows, same
    # (-dot, code) tie order, same per-dim medians, empty codes keep
    # their previous entry.
    init_rows = t.orderBy("_id").limit(n_codes).collect()
    cents_by_s: list[list[tuple[int, list[float]]]] = [
        [
            (i, list(r["v"][s * sd : (s + 1) * sd]))
            for i, r in enumerate(init_rows)
        ]
        for s in range(m)
    ]
    for _ in range(iters):
        sub_structs = F.array(
            *[
                F.struct(
                    F.lit(s).cast("int").alias("s"),
                    F.slice(F.col("v"), s * sd + 1, sd).alias("sv"),
                )
                for s in range(m)
            ]
        )
        es_all = t.select(F.explode(sub_structs).alias("e")).select(
            "e.s", "e.sv"
        )
        per_s_arrays = ",".join(
            "array("
            + ",".join(
                f"named_struct('d', -({_dot_sql('sv', vec)}),"
                f" 'code', cast({int(code)} as int))"
                for code, vec in cents_by_s[s]
            )
            + ")"
            for s in range(m)
        )
        assigned = es_all.select(
            "s",
            "sv",
            F.expr(
                "element_at(array_sort(element_at("
                f"array({per_s_arrays}), s + 1)), 1).code"
            ).alias("code"),
        )
        med = (
            assigned.select(
                "s", "code", F.posexplode("sv").alias("dim", "val")
            )
            .groupBy("s", "code", "dim")
            .agg(F.expr("percentile(val, 0.5)").alias("md"))
            .groupBy("s", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "md"))),
                    lambda x: x["md"],
                ).alias("cvec")
            )
            .collect()
        )
        updated = {(r["s"], r["code"]): list(r["cvec"]) for r in med}
        cents_by_s = [
            [(c, updated.get((s, c), vec)) for c, vec in cents_by_s[s]]
            for s in range(m)
        ]
    return cents_by_s


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 4,
    n_codes: int = 4,
    iters: int = 1,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    train_sample_hex_zeros: int | None = None,
    train_cap: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, score, rank): top-k corpus vectors per
    query by the ADC-approximate inner product (sum of per-subspace
    exact query-to-codeword dots).  Same family shape as
    brute_force_topk/ivf_topk; recall < 1 by design (quantization
    error), measured in the recall gate test."""
    sd = dim // m
    books = pq_codebooks(
        corpus, dim, m=m, n_codes=n_codes, iters=iters,
        id_col=id_col, vec_col=vec_col,
        train_sample_hex_zeros=train_sample_hex_zeros,
        train_cap=train_cap,
    )

    def _sub_sql(s):
        return f"slice(v, {s * sd + 1}, {sd})"

    # codes / dtab as single SQL strings: the Column-built forms cost
    # O(m * n_codes) py4j round trips per literal codeword (seconds of
    # driver time for m=8, n_codes=16); semantics identical
    codes_sql = (
        "array("
        + ",".join(_assign_sql(_sub_sql(s), books[s]) for s in range(m))
        + ")"
    )
    enc = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).select("neighbor_id", F.expr(codes_sql).alias("codes"))

    dtab_sql = (
        "array("
        + ",".join(
            "array("
            + ",".join(_dot_sql(_sub_sql(s), vec) for _, vec in books[s])
            + ")"
            for s in range(m)
        )
        + ")"
    )
    qd = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).select("query_id", F.expr(dtab_sql).alias("dtab"))

    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("dtab"),
            lambda c, row: F.element_at(row, (c + 1).cast("int")),
        ),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    scored = (
        enc.crossJoin(F.broadcast(qd))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(adc, round_digits).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    shortlist: int = 100,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    train_sample_hex_zeros: int | None = None,
    train_cap: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, score, rank): ADC-shortlist + exact
    rerank — the production PQ shape (ScaNN / FAISS IVFADC+refine).
    The compressed-code scan ranks EVERY candidate by approximate
    inner product and keeps only the top ``shortlist`` per query; the
    exact dot product then reranks that bounded set.  Quantization
    error costs recall only when a true neighbor falls outside the
    shortlist — measured in the recall gate test (0.87 @ C=100 over
    the sf0.001 corpus vs exact-IP top-5).

    Scale shape: the full-corpus pass touches only the ``m``-byte
    codes (broadcast dtab, no shuffle); the exact rerank joins
    ``n_queries * shortlist`` rows — a constant — back to the corpus
    vectors by id, so raw vectors are fetched for a vanishing fraction
    of the corpus.  The only shuffles are the two per-query top-k
    windows and the rerank equi-join."""
    sd = dim // m
    books = pq_codebooks(
        corpus, dim, m=m, n_codes=n_codes, iters=iters,
        id_col=id_col, vec_col=vec_col,
        train_sample_hex_zeros=train_sample_hex_zeros,
        train_cap=train_cap,
    )

    def _sub_sql(s):
        return f"slice(v, {s * sd + 1}, {sd})"

    # single-SQL-string codes/dtab (see pq_topk): one py4j call each
    # instead of O(m * n_codes) literal-building round trips
    codes_sql = (
        "array("
        + ",".join(_assign_sql(_sub_sql(s), books[s]) for s in range(m))
        + ")"
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    enc = c.select("neighbor_id", F.expr(codes_sql).alias("codes"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    dtab_sql = (
        "array("
        + ",".join(
            "array("
            + ",".join(_dot_sql(_sub_sql(s), vec) for _, vec in books[s])
            + ")"
            for s in range(m)
        )
        + ")"
    )
    qd = q.select("query_id", F.expr(dtab_sql).alias("dtab"))
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("dtab"),
            lambda cc, row: F.element_at(row, (cc + 1).cast("int")),
        ),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    cand = (
        enc.crossJoin(F.broadcast(qd))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("raw"))
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.col("raw").desc(), F.col("neighbor_id").asc()
    )
    short = (
        cand.withColumn("_srn", F.row_number().over(ws))
        .filter(F.col("_srn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    rr = (
        short.join(
            q.select("query_id", F.col("v").alias("qv")), "query_id"
        )
        .join(
            c.select("neighbor_id", F.col("v").alias("nv")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("nv")), round_digits
            ).alias("score"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return rr.withColumn("rank", F.row_number().over(wr)).filter(
        F.col("rank") <= k
    )
