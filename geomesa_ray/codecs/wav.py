"""RIFF/WAVE PCM container (16-bit mono/stereo), pure struct + NumPy.

Makes the audio-feature stage's compressed gate real for the standard
interchange container: ``fmt == "wav"`` payloads parse to int16 sample
arrays + sample rate. Non-PCM encodings (float, ADPCM, mp3-in-wav)
raise ``NotImplementedError`` (honest gate).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 (n,) mono or (n, ch) -> WAV bytes."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) \
        + b"WAVE" \
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return out


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, ch) int16 samples, sample_rate)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    n = len(buf)
    while pos + 8 <= n:
        tag = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV format {audio_fmt}/{bits}-bit (16-bit PCM only)")
    samples = np.frombuffer(data, dtype="<i2",
                            count=(len(data) // (2 * ch)) * ch)
    return samples.reshape(-1, ch), rate
