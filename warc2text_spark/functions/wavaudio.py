"""Dependency-free WAV (RIFF PCM) audio decode — the audio leg of the
multimodal story made real (r6): struct-only container walk + PCM sample
materialization, no audio libraries.

Scope (never raises — kernel contract): RIFF/WAVE container, ``fmt ``
chunk with audio format 1 (integer PCM), bit depths 8 (unsigned) and 16
(signed little-endian), any channel count; malformed/unsupported input
returns None and callers fall back to the labeled fake twins
(operators/multimodal.py).  The fixture encoder emits the canonical
44-byte header + raw data, so byte size is closed-form (44 + n_bytes of
PCM) for the driver oracle, and the striped fixture's sample mean is a
closed-form the oracle states in SQL.
"""

from __future__ import annotations

import struct

import numpy as np


def parse_wav(payload: bytes):
    """``dict(sample_rate, channels, bits, n_samples, mean, rms)`` or
    None.

    ``n_samples`` counts frames (per-channel sample groups); ``mean`` is
    the arithmetic mean of ALL raw sample values (unsigned 0..255 for
    8-bit, signed for 16-bit) — the cheap level feature a curation
    pipeline filters on (silence / clipping / DC offset)."""
    try:
        if len(payload) < 12 or payload[:4] != b"RIFF" \
                or payload[8:12] != b"WAVE":
            return None
        pos = 12
        fmt = None
        data = None
        n = len(payload)
        while pos + 8 <= n:
            cid = payload[pos:pos + 4]
            (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
            body = payload[pos + 8:pos + 8 + clen]
            if cid == b"fmt " and len(body) >= 16:
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                data = body
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            return None
        audio_format, channels, sample_rate, _brate, _balign, bits = fmt
        if audio_format != 1 or channels < 1 \
                or bits not in (8, 16) or sample_rate == 0:
            return None
        if bits == 8:
            samples = np.frombuffer(data, dtype=np.uint8)
        else:
            samples = np.frombuffer(data[:len(data) - (len(data) % 2)],
                                    dtype="<i2")
        if samples.size == 0:
            return None
        f64 = samples.astype(np.float64)
        return {
            "sample_rate": int(sample_rate),
            "channels": int(channels),
            "bits": int(bits),
            "n_samples": int(samples.size // channels),
            "mean": float(f64.mean()),
            # RMS level — the second cheap audio-curation feature
            # (energy; silence gates and clipping checks use it)
            "rms": float(np.sqrt((f64 * f64).mean())),
        }
    except Exception:
        return None


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Canonical 44-byte-header mono WAV from uint8 (8-bit) or int16
    samples — ``len(encode_wav(s)) == 44 + s.nbytes`` exactly (the
    closed form the driver oracle mirrors)."""
    if samples.dtype == np.uint8:
        bits = 8
    else:
        samples = samples.astype("<i2")
        bits = 16
    data = samples.tobytes()
    byte_rate = sample_rate * bits // 8
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                   byte_rate, bits // 8, bits)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data
