"""Longest-prefix-match (LPM) CIDR enrichment join.

Enriching fact rows that carry an IPv4 address with the most specific
matching CIDR block — GeoIP lookup, ASN attribution, bot-network and
datacenter-range tagging, allowlist/denylist routing — is the classic
log-pipeline join that plain equi-join cannot express: a /24 block
must beat the /16 and /8 blocks that also contain the address.

Spark shape (100 TB): the block table is dimension-sized (GeoIP is
~10M rows; here O(nations)); the fact table is the corpus.  A naive
theta-join (``ip BETWEEN lo AND hi``) degenerates to
broadcast-nested-loop — O(|facts| x |blocks|) comparisons.  The
scalable form exploits that a CIDR match IS an equality on the
prefix-truncated address:

    ip matches (bits, len)  <=>  (ip >> (32-len)) << (32-len) = bits

so for each DISTINCT prefix length present in the block table (<= 33,
collected driver-side like IVF centroids — O(1) control metadata) we
run ONE broadcast HASH join on the truncated address, longest length
first, and coalesce the first hit.  Every join is whole-stage-codegen
broadcast equality — zero shuffles, zero row expansion; the fact
table streams through k <= 33 hash probes.  Real GeoIP tables
concentrate on ~8 lengths, so k is small in practice.

The DuckDB twin deliberately runs the OTHER formulation — range
containment (``ip BETWEEN lo AND hi``) + ``row_number() ... ORDER BY
prefix_len DESC`` — so the oracle proves the prefix-equality identity
rather than re-stating the plan.

Reference parity note: the reference service has no network-analytics
surface (`src/configs/morgan.js` logs request IPs and drops them);
this is training-data/log-pipeline breadth beyond parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def lpm_enrich(
    facts: DataFrame,
    blocks: DataFrame,
    ip_col: str = "ip32",
    owner_col: str = "owner",
) -> DataFrame:
    """Left-enrich ``facts`` with the longest matching CIDR block.

    ``blocks`` must carry ``prefix_len`` (0..32), ``prefix_bits`` (the
    network address as a 32-bit integer, low bits zero) and
    ``owner_col``.  Adds ``matched_owner`` / ``matched_len`` columns
    (NULL / NULL when no block covers the address).  Rows whose
    ``ip_col`` is NULL pass through unmatched.

    Duplicate (prefix_len, prefix_bits) blocks would fan out fact
    rows; callers must deduplicate the block table (CIDR tables are
    keyed by network) — enforced here with a loud error because a
    silent fan-out corrupts downstream counts.
    """
    lens_rows = (
        blocks.groupBy("prefix_len")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("prefix_bits").alias("nd"),
        )
        .collect()
    )  # O(<=33) rows: driver-side control metadata, like IVF centroids
    dup = [r for r in lens_rows if r["n"] != r["nd"]]
    if dup:
        raise ValueError(
            "duplicate (prefix_len, prefix_bits) blocks at lengths "
            f"{sorted(r['prefix_len'] for r in dup)}; deduplicate the "
            "CIDR table — a fan-out here silently corrupts counts"
        )
    lengths = sorted((r["prefix_len"] for r in lens_rows), reverse=True)
    if not lengths:
        return facts.select(
            "*",
            F.lit(None).cast("string").alias("matched_owner"),
            F.lit(None).cast("int").alias("matched_len"),
        )
    if lengths[0] > 32 or lengths[-1] < 0:
        raise ValueError(f"prefix_len out of [0, 32]: {lengths}")

    out = facts
    owner_cols = []
    for ln in lengths:
        side = (
            blocks.filter(F.col("prefix_len") == ln)
            .select(
                F.col("prefix_bits").alias(f"_pb_{ln}"),
                F.col(owner_col).alias(f"_own_{ln}"),
            )
        )
        trunc = (
            F.shiftleft(F.shiftright(F.col(ip_col), 32 - ln), 32 - ln)
            if ln < 32
            else F.col(ip_col)
        )
        out = out.join(
            F.broadcast(side), trunc == F.col(f"_pb_{ln}"), "left"
        )
        owner_cols.append(f"_own_{ln}")

    matched_len = F.lit(None).cast("int")
    for ln in reversed(lengths):  # build when-chain longest-last
        matched_len = (
            F.when(F.col(f"_own_{ln}").isNotNull(), F.lit(ln))
            .otherwise(matched_len)
        )
    return out.select(
        *[c for c in facts.columns],
        F.coalesce(*[F.col(c) for c in owner_cols]).alias(
            "matched_owner"
        ),
        matched_len.alias("matched_len"),
    )
