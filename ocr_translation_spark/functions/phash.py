"""Perceptual media hashing + banded-Hamming near-duplicate join over
the binary media column.

The image-dedup analogue of simhash for documents: a 64-bit
OCCUPANCY-GRID hash — each payload's token coordinates are quantized
onto a fixed ``grid x grid`` raster (bit g*floor(y*g/h) + floor(x*g/w)
set iff any token lands in that cell). The signature drifts O(1) bits
under small edits and under proportional rescaling — NEAR-invariant,
not exactly invariant, because the codec stores no dimensions and
w/h are re-derived as max coord + 1, so cells at bin boundaries can
shift (the drift bound is pinned against ``multimodal.resize_tokens``
in tests; size ``max_hamming`` accordingly when hunting rescaled
copies). This is the deterministic
stand-in for DCT pHash: the real-pixel path would compute the same
64-bit signature from an 8x8 low-frequency DCT behind the PIL gate in
``functions/multimodal.py``; the SYNTHIMG token grid gives the exact
same plumbing (binary column in, 64-bit signature + banded join out)
with a value-oracle-able hash.

Spark shape (100 TB): the whole hash is JVM codegen — decode bytes to
text, split/explode token lines, regexp coordinates, ONE media_ref
exchange shared by the dims window and the bit_or aggregate; no
Python anywhere. The near-dup join is the LSH band discipline used by
simhash: split the 64-bit hash into ``bands`` equal slices, equi-join
on (band index, band value), then the exact popcount filter. With
``max_hamming < bands`` the pigeonhole principle makes the banded
join EXACT (any pair within the radius agrees on some band), so the
candidate join is a complete, cross-join-free substitute for the
quadratic all-pairs scan — the same recall argument as
``dedup.simhash_near_dup``.

Reference parity: the reference dedups uploads by md5 of bytes only
(`src/services/ocr.js` cache key); this adds the perceptual layer a
crawl-scale media corpus needs (same image, different encode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ocr_translation_spark.semantics import MEDIA_MAGIC


def media_phash(media_df: DataFrame, grid: int = 8) -> DataFrame:
    """(media_ref, phash, n_tokens, synth) — 64-bit occupancy-grid
    perceptual hash per payload. Non-SYNTHIMG payloads get NULL phash
    with synth=false (the PIL/DCT gate is where they would decode);
    token-less synthetic payloads hash to 0.
    """
    if not 2 <= grid <= 8:
        raise ValueError("grid must be in [2, 8] (grid^2 bits <= 64)")
    # magic check on raw BYTES (UTF-8 decode is strict in Spark 4 and
    # would throw on real binary formats); the decode itself uses
    # ISO-8859-1, which never fails and is byte-identical to UTF-8 on
    # the ASCII SYNTHIMG codec
    magic = MEDIA_MAGIC.encode()
    synth = (
        F.substring(F.col("media_bytes"), 1, len(magic)) == F.lit(magic)
    )
    base = media_df.select("media_ref", synth.alias("synth"))
    toks = (
        media_df.filter(synth)
        .select(
            "media_ref",
            F.explode(
                F.split(
                    F.decode(F.col("media_bytes"), "ISO-8859-1"), "\n"
                )
            ).alias("line"),
        )
        .filter(
            (F.col("line") != "") & (F.col("line") != MEDIA_MAGIC)
        )
        .select(
            "media_ref",
            F.regexp_extract("line", r"^(.*)@(\d+),(\d+)$", 2)
            .cast("long").alias("y"),
            F.regexp_extract("line", r"^(.*)@(\d+),(\d+)$", 3)
            .cast("long").alias("x"),
        )
    )
    w = Window.partitionBy("media_ref")
    g = F.lit(grid).cast("long")
    # dims = max coord + 1, the decode_tokens convention; the window
    # and the bit_or aggregate below share ONE media_ref exchange
    dims = toks.select(
        "media_ref", "y", "x",
        (F.max("x").over(w) + 1).alias("w"),
        (F.max("y").over(w) + 1).alias("h"),
    )
    # integer floor division (y*g div h): coordinates and grid are
    # small longs, the product can never overflow
    cells = dims.select(
        "media_ref",
        (
            g * F.expr(f"(y * {grid}) div h")
            + F.expr(f"(x * {grid}) div w")
        ).cast("int").alias("bit"),
    )
    hashed = cells.groupBy("media_ref").agg(
        F.expr("bit_or(shiftleft(1L, bit))").alias("phash"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
    return (
        base.select("media_ref", "synth")
        .join(hashed, "media_ref", "left")
        .select(
            "media_ref",
            F.when(
                F.col("synth"), F.coalesce(F.col("phash"), F.lit(0))
            ).alias("phash"),
            F.when(
                F.col("synth"),
                F.coalesce(F.col("n_tokens"), F.lit(0)),
            ).alias("n_tokens"),
            "synth",
        )
    )


def phash_near_dup(
    media_df: DataFrame,
    grid: int = 8,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """(ref_a, ref_b, hamming) for every unordered pair of synthetic
    payloads whose perceptual hashes differ in <= max_hamming bits.

    Requires ``max_hamming < bands`` so the banded candidate join is
    pigeonhole-EXACT (complete recall, no cross join).
    """
    if max_hamming >= bands:
        raise ValueError(
            "max_hamming must be < bands for pigeonhole-exact recall"
        )
    # band over the grid^2 LIVE bits only: with grid < 8, banding the
    # full 64-bit word would make every always-zero upper band match
    # every pair — the equi-join would silently degenerate to the
    # quadratic all-pairs scan it exists to avoid
    live_bits = grid * grid
    if live_bits % bands:
        raise ValueError("bands must divide grid^2")
    width = live_bits // bands
    mask = (1 << width) - 1
    ph = media_phash(media_df, grid=grid).filter("synth").select(
        "media_ref", "phash"
    )
    banded = ph.select(
        "media_ref",
        "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    (
                        F.shiftright(F.col("phash"), i * width)
                        .bitwiseAND(F.lit(mask))
                    ).alias("val"),
                )
                for i in range(bands)
            ])
        ).alias("bv"),
    ).select("media_ref", "phash", "bv.band", "bv.val")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.media_ref") < F.col("b.media_ref")),
        )
        .select(
            F.col("a.media_ref").alias("ref_a"),
            F.col("b.media_ref").alias("ref_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs
