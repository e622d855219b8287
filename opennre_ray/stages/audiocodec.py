"""Stdlib-only audio codec: RIFF/WAVE PCM (and IEEE-float) decode.

Companion to ``imagecodec`` — the audio modality's "smallest real decode
path" implementable without soundfile/ffmpeg: WAV is a length-prefixed
chunk format (``RIFF`` → ``fmt `` → ``data``) that ``struct`` parses
directly. Anything beyond integer/float PCM (ADPCM, MP3-in-WAV, ...)
raises ``NotImplementedError`` naming the library that would plug in.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n_samples, n_channels) array, sample_rate).

    PCM 8/16/32-bit and IEEE float32/64 supported; samples come back in
    their native dtype (callers normalize as needed)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid, ln = struct.unpack("<4sI", payload[pos:pos + 8])
        pos += 8
        body = payload[pos:pos + ln]
        pos += ln + (ln & 1)                       # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt == 1:                             # integer PCM
        if bits not in _PCM_DTYPES:
            raise NotImplementedError(
                f"{bits}-bit PCM unsupported — plug soundfile here")
        dt = np.dtype(_PCM_DTYPES[bits]).newbyteorder("<")
    elif audio_fmt == 3:                           # IEEE float
        if bits not in (32, 64):
            raise NotImplementedError(f"float{bits} WAV unsupported")
        dt = np.dtype(np.float32 if bits == 32 else np.float64) \
            .newbyteorder("<")
    else:
        raise NotImplementedError(
            f"WAV format tag {audio_fmt} (non-PCM) — plug ffmpeg here")
    n = len(data) // dt.itemsize // n_ch
    arr = np.frombuffer(data, dt, n * n_ch).reshape(n, n_ch)
    return arr.copy(), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, ch) int16 → WAV bytes — enough to write artifacts and
    round-trip-test the decoder."""
    samples = np.ascontiguousarray(samples, np.int16)
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(samples: np.ndarray, rate: int,
                   n_frames: int = 8) -> np.ndarray:
    """Deterministic lightweight feature head: [rms, zero-crossing
    rate, duration_sec] + ``n_frames`` per-frame RMS values — stands in
    for a real audio-embedding forward (same contract as
    ``ImageFeatures``)."""
    mono = samples.astype(np.float64).mean(axis=1)
    n = len(mono)
    if n == 0:
        return np.zeros(3 + n_frames, np.float32)
    rms = float(np.sqrt((mono * mono).mean()))
    zcr = float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean()) \
        if n > 1 else 0.0
    dur = n / rate
    fl = max(1, n // n_frames)
    frames = [float(np.sqrt((mono[i * fl:(i + 1) * fl] ** 2).mean()))
              if len(mono[i * fl:(i + 1) * fl]) else 0.0
              for i in range(n_frames)]
    return np.asarray([rms, zcr, dur] + frames, np.float32)
