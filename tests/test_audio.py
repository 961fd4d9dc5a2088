"""Audio segmentation: container decode + windowing semantics."""

from __future__ import annotations

import pytest

from ocr_translation_spark.functions.audio import (
    AUDIO_MAGIC,
    BYTES_PER_SAMPLE,
    decode_audio,
    encode_audio,
    segment_audio,
    segment_pcm,
)


def _pcm(n: int) -> bytes:
    """n deterministic 16-bit samples."""
    return b"".join(
        ((i * 2654435761) % 65536).to_bytes(2, "little") for i in range(n)
    )


def _wav(rate: int, pcm: bytes, channels=1, bits=16, fmt=1) -> bytes:
    fmt_body = (
        fmt.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * bits // 8).to_bytes(4, "little")
        + (channels * bits // 8).to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    chunks = (
        b"fmt " + len(fmt_body).to_bytes(4, "little") + fmt_body
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_synthaud_roundtrip():
    pcm = _pcm(321)
    rate, got = decode_audio(encode_audio(16000, pcm))
    assert rate == 16000 and got == pcm


def test_wav_parse_dependency_free():
    pcm = _pcm(200)
    rate, got = decode_audio(_wav(8000, pcm))
    assert rate == 8000 and got == pcm


def test_wav_non_pcm16_gated():
    with pytest.raises(NotImplementedError):
        decode_audio(_wav(8000, _pcm(10), channels=2))
    with pytest.raises(NotImplementedError):
        decode_audio(_wav(8000, _pcm(10), fmt=3))


def test_unknown_codec_gated():
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x03mp3-ish payload")
    with pytest.raises(NotImplementedError):
        decode_audio(AUDIO_MAGIC[:4])  # truncated magic -> WAV path fails


def test_segment_pcm_covers_every_sample_once_per_hop():
    segs = segment_pcm(550, 200, 100)
    # starts stride by hop, last window partial, all samples covered
    assert [s[1] for s in segs] == [0, 100, 200, 300, 400, 500]
    assert segs[-1] == (5, 500, 50)
    assert segs[4] == (4, 400, 150)  # second-to-last also partial
    assert all(n == 200 for _, s, n in segs[:4])
    covered = set()
    for _, s, n in segs:
        covered |= set(range(s, s + n))
    assert covered == set(range(550))


def test_segment_audio_spark(spark):
    rows = [
        ("a", encode_audio(100, _pcm(550))),   # 2s window/1s hop -> 6 segs
        ("b", encode_audio(100, _pcm(150))),   # -> 2 segs
        ("c", encode_audio(100, b"")),         # empty -> null seg row
        ("d", b"\xff\xfenot audio at all"),    # undecodable -> null row
        ("e", _wav(50, _pcm(120))),            # real WAV -> 120/100 -> 2
    ]
    df = spark.createDataFrame(rows, "media_ref string, media_bytes binary")
    out = segment_audio(df, window_seconds=2, hop_seconds=1)
    got = {
        (r["media_ref"], r["seg_idx"]): r for r in out.collect()
    }
    assert sum(1 for (ref, _) in got if ref == "a") == 6
    a0, a5 = got[("a", 0)], got[("a", 5)]
    assert (a0["start_sample"], a0["n_samples"]) == (0, 200)
    assert (a5["start_sample"], a5["n_samples"]) == (500, 50)
    assert bytes(a5["seg_bytes"]) == _pcm(550)[2 * 500:]
    assert got[("b", 1)]["n_samples"] == 50
    # empty + undecodable payloads surface, never dropped
    assert got[("c", None)]["sample_rate"] == 100
    assert got[("d", None)]["sample_rate"] is None
    # WAV leg: 50 Hz rate -> window 100 samples, hop 50
    e1 = got[("e", 1)]
    assert (e1["sample_rate"], e1["start_sample"], e1["n_samples"]) == (
        50, 50, 70,
    )
    assert len(bytes(e1["seg_bytes"])) == 70 * BYTES_PER_SAMPLE


def test_segment_audio_validates_params(spark):
    df = spark.createDataFrame(
        [("a", b"")], "media_ref string, media_bytes binary"
    )
    with pytest.raises(ValueError):
        segment_audio(df, window_seconds=0)
    with pytest.raises(ValueError):
        segment_audio(df, window_seconds=2, hop_seconds=0)


def test_null_payload_surfaces_not_crashes(spark):
    # a NULL binary (failed fetch) must become a null-segment row,
    # never a TypeError in the executor
    df = spark.createDataFrame(
        [("n", None), ("ok", encode_audio(100, _pcm(150)))],
        "media_ref string, media_bytes binary",
    )
    got = {r["media_ref"]: r for r in
           segment_audio(df, window_seconds=2, hop_seconds=1)
           .where("seg_idx is null or media_ref = 'n'").collect()}
    assert got["n"]["sample_rate"] is None
    assert got["n"]["seg_idx"] is None


def test_wav_declared_rate_zero_is_gated(spark):
    # fmt chunk says rate 0: hop would be 0 -> must gate, not crash
    bad = _wav(0, _pcm(50))
    with pytest.raises(NotImplementedError):
        decode_audio(bad)
    df = spark.createDataFrame(
        [("z", bad)], "media_ref string, media_bytes binary"
    )
    rows = segment_audio(df, window_seconds=2).collect()
    assert len(rows) == 1 and rows[0]["seg_idx"] is None
