"""Dependency-free AVI (RIFF) container parsing + MJPEG frame access.

With the baseline JPEG decoder in :mod:`jpegpixels` the video modality
can decode for real: an AVI file is a RIFF chunk tree — ``RIFF('AVI ',
LIST('hdrl', avih + LIST('strl', strh + strf)) + LIST('movi', '00dc'
frame chunks...))`` (msdn AVI RIFF reference; OpenDML extends it but the
core layout is public and stable) — and an MJPEG stream's ``00dc``
chunks each hold one complete baseline JPEG.  :func:`parse_avi` walks
the chunk tree (never raises — kernel contract);
:func:`build_avi_mjpeg` is the fixture encoder whose byte size is
closed-form so the driver oracle states it in SQL.

Reference parity note: warc2text itself treats video payloads as opaque
binaries to route/skip (src/warcpreprocessor.cc URL-extension filters);
the decode layer here is the beyond-reference multimodal training-
pipeline surface.
"""

from __future__ import annotations

import struct


def _chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking a RIFF chunk
    sequence; stops at the first malformed chunk."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = pos + 8
        if body + size > end:
            return
        yield fourcc, body, size
        pos = body + size + (size & 1)  # chunks are word-aligned


def parse_avi(payload: bytes):
    """``{"width", "height", "n_frames", "handler", "frames"}`` for an
    AVI container (``frames`` = the raw ``00dc``/``00db`` chunk payloads
    in stream order), or None on anything malformed.  Dims come from the
    ``avih`` main header (dwWidth/dwHeight, dwTotalFrames); the stream
    handler fourcc comes from ``strh``.  Never raises."""
    try:
        if len(payload) < 12 or payload[:4] != b"RIFF" \
                or payload[8:12] != b"AVI ":
            return None
        (riff_size,) = struct.unpack("<I", payload[4:8])
        end = min(len(payload), 8 + riff_size)
        width = height = n_frames = 0
        handler = b""
        frames: list[bytes] = []

        def walk(pos: int, stop: int):
            nonlocal width, height, n_frames, handler
            for fourcc, body, size in _chunks(payload, pos, stop):
                if fourcc == b"LIST" and size >= 4:
                    ltype = payload[body:body + 4]
                    if ltype in (b"hdrl", b"strl", b"movi", b"rec "):
                        walk(body + 4, body + size)
                elif fourcc == b"avih" and size >= 40:
                    n_frames = struct.unpack(
                        "<I", payload[body + 16:body + 20])[0]
                    width, height = struct.unpack(
                        "<II", payload[body + 32:body + 40])
                elif fourcc == b"strh" and size >= 8:
                    if payload[body:body + 4] == b"vids":
                        handler = payload[body + 4:body + 8]
                elif fourcc[2:4] in (b"dc", b"db") \
                        and fourcc[:2].isdigit():
                    frames.append(payload[body:body + size])

        walk(12, end)
        if not frames and not n_frames:
            return None
        return {"width": width, "height": height,
                "n_frames": n_frames or len(frames),
                "handler": handler, "frames": frames}
    except Exception:
        return None


def first_frame_pixels(payload: bytes):
    """Decoded pixels of the first video frame, or None.  MJPEG frames
    (each ``00dc`` chunk a baseline JPEG) go through
    :func:`jpegpixels.decode_jpeg`; other codecs return None (the
    honest edge — a deployment adds ffmpeg here)."""
    try:
        avi = parse_avi(payload)
        if not avi or not avi["frames"]:
            return None
        frame = avi["frames"][0]
        if frame.startswith(b"\xff\xd8"):
            from .jpegpixels import decode_jpeg
            return decode_jpeg(frame)
        return None
    except Exception:
        return None


# --- fixture builder ----------------------------------------------------


def build_avi_mjpeg(frames: list[bytes], w: int, h: int,
                    fps: int = 10) -> bytes:
    """Minimal REAL AVI wrapping pre-encoded JPEG frames as an MJPEG
    video stream.  Layout (sizes fixed so the total is closed-form):
    12 RIFF header + 200 hdrl LIST (64 avih + 124 strl) + movi LIST of
    12 + per frame (8 + len(frame) + pad-to-even) — see
    :func:`avi_mjpeg_size`."""
    n = len(frames)
    usec = 1_000_000 // max(fps, 1)
    avih = struct.pack("<10I", usec, 0, 0, 0x10, n, 0, 1, 0, w, h) \
        + b"\x00" * 16
    strh = (b"vids" + b"MJPG" + struct.pack("<I", 0)
            + struct.pack("<2H", 0, 0)
            + struct.pack("<8I", 0, 1, fps, 0, n, 0, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24, 0x47504A4D,
                       w * h * 3, 0, 0, 0, 0)  # BITMAPINFOHEADER, 'MJPG'
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) \
        + b"strl" \
        + b"strh" + struct.pack("<I", len(strh)) + strh \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl)) \
        + b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih + strl
    movi_body = b"".join(
        b"00dc" + struct.pack("<I", len(f)) + f + (b"\x00" * (len(f) & 1))
        for f in frames)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" \
        + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_mjpeg_size(frame_size: int, n_frames: int) -> int:
    """Byte size of :func:`build_avi_mjpeg` over ``n_frames`` frames of
    ``frame_size`` bytes each: 224 fixed overhead + per frame 8-byte
    chunk header + payload + word-align pad."""
    return 224 + n_frames * (8 + frame_size + (frame_size & 1))
