"""Unit tests for the perceptual occupancy-grid media hash and the
banded-Hamming near-dup join (functions/phash.py): pure-Python parity
(two's-complement folded — Spark longs are signed), non-synthetic
payload gating, token-less hash-0, pigeonhole-exact pair recall vs
brute force, small-edit drift bounds, resize drift bounds, partition
invariance, and the parameter guards."""

import random

import pytest

from ocr_translation_spark.functions.multimodal import resize_tokens
from ocr_translation_spark.functions.phash import (
    media_phash,
    phash_near_dup,
)
from ocr_translation_spark.semantics import decode_media, encode_media


def _ref_phash(b, grid=8):
    toks = decode_media(b)
    if not toks:
        return 0
    w = max(x for _, _, x in toks) + 1
    h = max(y for _, y, _ in toks) + 1
    bits = 0
    for _, y, x in toks:
        bits |= 1 << (grid * (y * grid // h) + (x * grid // w))
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def _payloads(n=40, seed=9):
    rng = random.Random(seed)
    out = {}
    for i in range(n):
        toks = [
            (f"t{j}", rng.randrange(0, 30), rng.randrange(0, 50))
            for j in range(rng.randrange(0, 25))
        ]
        out[f"m{i:03d}"] = encode_media(toks)
    return out


def _media_df(spark, payloads, extra=()):
    rows = [(r, b, "synth") for r, b in payloads.items()]
    rows += list(extra)
    return spark.createDataFrame(
        rows, "media_ref string, media_bytes binary, media_kind string"
    ).repartition(5)


def test_phash_matches_python_reference(spark):
    payloads = _payloads()
    df = _media_df(spark, payloads,
                   extra=[("real01", b"\x89PNG\r\n\x1a\n", "png")])
    got = {
        r["media_ref"]: (r["phash"], r["n_tokens"], r["synth"])
        for r in media_phash(df).collect()
    }
    for ref, b in payloads.items():
        assert got[ref] == (_ref_phash(b), len(decode_media(b)), True)
    # real binary payload: gated, not decoded, not crashed on
    assert got["real01"] == (None, None, False)


def test_tokenless_payload_hashes_to_zero(spark):
    df = _media_df(spark, {"empty": encode_media([])})
    row = media_phash(df).collect()[0]
    assert (row["phash"], row["n_tokens"], row["synth"]) == (0, 0, True)


def test_near_dup_equals_brute_force(spark):
    payloads = _payloads(60, seed=21)
    # plant near-dups: drop the first token of every 4th payload
    for i in range(0, 60, 4):
        toks = decode_media(payloads[f"m{i:03d}"])
        if toks:
            payloads[f"m{i:03d}~v2"] = encode_media(toks[1:])
    df = _media_df(spark, payloads)
    hs = {r: _ref_phash(b) for r, b in payloads.items()}
    brute = sorted(
        (a, b, bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1"))
        for a in hs for b in hs
        if a < b
        and bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1") <= 3
    )
    got = sorted(
        (r["ref_a"], r["ref_b"], r["hamming"])
        for r in phash_near_dup(df).collect()
    )
    assert got == brute
    assert len(got) > 0


def test_small_edit_moves_few_bits(spark):
    # dropping a token that does NOT define the dims (some other
    # token still attains max x and max y) flips at most one
    # occupancy cell; dropping the dim-defining token rescales the
    # grid and may move many bits — that is the resize case below
    payloads = _payloads(30, seed=33)
    checked = 0
    for b in payloads.values():
        toks = decode_media(b)
        if len(toks) < 3:
            continue
        mx = max(x for _, _, x in toks)
        my = max(y for _, y, _ in toks)
        for i, (_, y, x) in enumerate(toks):
            rest = toks[:i] + toks[i + 1:]
            if (max(xx for _, _, xx in rest) == mx
                    and max(yy for _, yy, _ in rest) == my):
                a = _ref_phash(b)
                c = _ref_phash(encode_media(rest))
                assert bin((a ^ c) & ((1 << 64) - 1)).count("1") <= 1
                checked += 1
                break
    assert checked >= 10


def test_upscale_drift_is_bounded(spark):
    # dims are re-derived from max coords (the codec stores no w/h),
    # so integer upscaling is near- but not exactly invariant; the
    # documented contract is O(1)-bit drift
    payloads = _payloads(40, seed=9)
    worst = 0
    for b in payloads.values():
        toks = decode_media(b)
        if not toks:
            continue
        w = max(x for _, _, x in toks) + 1
        h = max(y for _, y, _ in toks) + 1
        rb = resize_tokens(b, w * 3, h * 3)
        d = bin((_ref_phash(b) ^ _ref_phash(rb)) & ((1 << 64) - 1))
        worst = max(worst, d.count("1"))
    assert worst <= 8


def test_partition_invariance(spark):
    payloads = _payloads(25, seed=4)
    one = {tuple(r) for r in media_phash(
        _media_df(spark, payloads).coalesce(1)).collect()}
    many = {tuple(r) for r in media_phash(
        _media_df(spark, payloads).repartition(11)).collect()}
    assert one == many


def test_parameter_guards(spark):
    df = _media_df(spark, {"a": encode_media([("t", 0, 0)])})
    with pytest.raises(ValueError):
        media_phash(df, grid=9)
    with pytest.raises(ValueError):
        phash_near_dup(df, bands=4, max_hamming=4)
    with pytest.raises(ValueError):
        phash_near_dup(df, bands=5)


def test_small_grid_bands_stay_selective(spark):
    # with grid < 8 the bands must cover only the grid^2 live bits;
    # banding the full 64-bit word would match every pair on the
    # always-zero upper bands (review fix). Parity with brute force
    # AND a candidate-count sanity bound.
    payloads = _payloads(50, seed=41)
    df = _media_df(spark, payloads)
    hs = {}
    for ref, b in payloads.items():
        toks = decode_media(b)
        bits = 0
        if toks:
            w = max(x for _, _, x in toks) + 1
            h = max(y for _, y, _ in toks) + 1
            for _, y, x in toks:
                bits |= 1 << (4 * (y * 4 // h) + (x * 4 // w))
        hs[ref] = bits
    brute = sorted(
        (a, b, bin(hs[a] ^ hs[b]).count("1"))
        for a in hs for b in hs
        if a < b and bin(hs[a] ^ hs[b]).count("1") <= 3
    )
    got = sorted(
        (r["ref_a"], r["ref_b"], r["hamming"])
        for r in phash_near_dup(df, grid=4, bands=4,
                                max_hamming=3).collect()
    )
    assert got == brute
