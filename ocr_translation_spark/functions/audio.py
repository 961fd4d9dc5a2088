"""Audio segmentation: fixed-window PCM chunking for ASR-style prep.

The audio leg of the multimodal column family (images:
``multimodal.decode_tokens``/``resize_media``; video:
``multimodal.sample_frames``).  A speech-recognition or
audio-embedding stage consumes fixed-duration windows (Whisper's
30 s chunks are the canonical example); the corpus-side operator is
"split every audio payload into hop-strided windows" — embarrassingly
parallel over rows, so the Spark shape is one ``mapInPandas`` pass:
Arrow-batched, zero shuffles, fan-out happens INSIDE the batch (no
Spark-side explode of raw bytes), output volume bounded by
``window/hop`` x input bytes.

Container support, mirroring the image/video split between real and
synthetic formats:

* ``SYNTHAUD`` — the deterministic synthetic container this repo's
  fixtures use: 8-byte magic + 4-byte big-endian sample rate + raw
  16-bit PCM mono samples.  Fully decoded here.
* WAV (RIFF/WAVE, PCM 16-bit mono) — parsed dependency-free from the
  chunk structure, no audio library needed.
* Compressed codecs (mp3/flac/ogg) — ``NotImplementedError`` in the
  gated hook where ffmpeg/soundfile would slot in (this container
  ships no audio library; same policy as the image PIL gate and the
  video ffmpeg gate, ``multimodal.py``).

Undecodable payloads surface as a single null-segment row — never a
dropped ref — so drop accounting stays exact (repo convention).

Reference parity note: the reference pipeline is image-OCR only
(``src/utils/ocr.js``); audio is the brief's multimodal-column
extension, not a reference behavior.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

AUDIO_MAGIC = b"SYNTHAUD"
_HEADER_LEN = len(AUDIO_MAGIC) + 4  # magic + 4-byte BE sample rate
BYTES_PER_SAMPLE = 2  # 16-bit PCM mono

SEGMENT_SCHEMA = (
    "media_ref string, seg_idx int, sample_rate int, "
    "start_sample bigint, n_samples bigint, seg_bytes binary"
)


def encode_audio(sample_rate: int, pcm: bytes) -> bytes:
    """SYNTHAUD container: magic + 4-byte BE rate + raw PCM16 bytes."""
    if sample_rate <= 0:
        raise ValueError("sample_rate must be positive")
    if len(pcm) % BYTES_PER_SAMPLE:
        raise ValueError("PCM16 payload must have an even byte count")
    return AUDIO_MAGIC + sample_rate.to_bytes(4, "big") + pcm


def _parse_wav(b: bytes):
    """Dependency-free RIFF/WAVE parse: (rate, pcm) for PCM 16-bit
    mono; NotImplementedError for any other encoding (the gated hook
    where a real audio library would decode)."""
    try:
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise ValueError("not RIFF/WAVE")
        i, rate, bits, channels, data = 12, None, None, None, None
        while i + 8 <= len(b):
            cid = b[i:i + 4]
            size = int.from_bytes(b[i + 4:i + 8], "little")
            body = b[i + 8:i + 8 + size]
            if cid == b"fmt ":
                fmt = int.from_bytes(body[0:2], "little")
                channels = int.from_bytes(body[2:4], "little")
                rate = int.from_bytes(body[4:8], "little")
                bits = int.from_bytes(body[14:16], "little")
                if fmt != 1:
                    raise NotImplementedError(
                        "compressed WAV needs an audio library"
                    )
            elif cid == b"data":
                data = body
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if rate is None or data is None:
            raise ValueError("missing fmt/data chunk")
        if rate <= 0:
            # declared-rate-0 corruption would make hop = 0 downstream
            raise NotImplementedError("invalid WAV sample rate")
        if bits != 16 or channels != 1:
            raise NotImplementedError(
                "non-PCM16-mono WAV needs an audio library"
            )
        return rate, data
    except (IndexError, ValueError):
        raise NotImplementedError(
            "real-format audio decode needs an audio library "
            "(ffmpeg/soundfile hook)"
        )


def decode_audio(media_bytes: bytes):
    """(sample_rate, pcm_bytes) for SYNTHAUD and PCM16-mono WAV;
    NotImplementedError for everything else (codec hook) — including
    NULL payloads, so the executor surfaces them as null-segment rows
    instead of dying on a TypeError."""
    if media_bytes is None:
        raise NotImplementedError("NULL media payload")
    b = bytes(media_bytes)
    if b.startswith(AUDIO_MAGIC):
        if len(b) < _HEADER_LEN:
            raise NotImplementedError("truncated SYNTHAUD header")
        rate = int.from_bytes(b[len(AUDIO_MAGIC):_HEADER_LEN], "big")
        if rate <= 0:
            raise NotImplementedError("invalid SYNTHAUD sample rate")
        pcm = b[_HEADER_LEN:]
        return rate, pcm[: len(pcm) - (len(pcm) % BYTES_PER_SAMPLE)]
    return _parse_wav(b)


def segment_pcm(n_samples: int, window: int, hop: int):
    """Pure segment arithmetic: [(seg_idx, start, n), ...] covering
    every sample; the final window may be partial.  Shared by the
    executor body and the unit tests' reference."""
    return [
        (k, start, min(window, n_samples - start))
        for k, start in enumerate(range(0, n_samples, hop))
    ]


def segment_batches(window_seconds: int, hop_seconds: int):
    def _body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, b in zip(pdf["media_ref"], pdf["media_bytes"]):
                try:
                    rate, pcm = decode_audio(b)
                except NotImplementedError:
                    rows.append((ref, None, None, None, None, None))
                    continue
                n = len(pcm) // BYTES_PER_SAMPLE
                if n == 0:
                    rows.append((ref, None, rate, None, None, None))
                    continue
                win = window_seconds * rate
                hop = hop_seconds * rate
                for k, start, seg_n in segment_pcm(n, win, hop):
                    lo = BYTES_PER_SAMPLE * start
                    rows.append(
                        (ref, k, rate, start, seg_n,
                         pcm[lo:lo + BYTES_PER_SAMPLE * seg_n])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "seg_idx", "sample_rate",
                    "start_sample", "n_samples", "seg_bytes",
                ],
            )

    return _body


def segment_audio(
    media_df: DataFrame,
    window_seconds: int = 30,
    hop_seconds: int | None = None,
) -> DataFrame:
    """One row per hop-strided window of each audio payload:
    (media_ref, seg_idx, sample_rate, start_sample, n_samples,
    seg_bytes).  ``hop_seconds`` defaults to ``window_seconds``
    (non-overlapping); a smaller hop yields overlapping windows
    (ASR context carry).  Integer seconds keep every boundary an
    exact sample index at any rate.

    Scale shape: a single Arrow-batched ``mapInPandas`` over
    (media_ref, media_bytes) — per-row independent, NO shuffle, and
    the bytes fan-out (window/hop overlap factor) happens inside the
    Python batch, so Spark never materializes an exploded raw-bytes
    relation wider than one batch."""
    if window_seconds < 1:
        raise ValueError("window_seconds must be >= 1")
    hop = window_seconds if hop_seconds is None else hop_seconds
    if hop < 1:
        raise ValueError("hop_seconds must be >= 1")
    return media_df.select("media_ref", "media_bytes").mapInPandas(
        segment_batches(window_seconds, hop), schema=SEGMENT_SCHEMA
    )
