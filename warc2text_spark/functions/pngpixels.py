"""Dependency-free PNG pixel decode / encode / resize (VERDICT r5 item 2).

Replaces the synthetic pixel stubs for PNG with a real codec built on
stdlib ``zlib`` + numpy (both baked in): chunk walk, concatenated-IDAT
inflate, per-scanline unfilter (all five ISO/IEC 15948 §9 filter types),
and nearest-neighbor resize.  The encoder writes level-0 (stored-block)
zlib streams so the output size is CLOSED-FORM in the pixel dimensions —
the property the driver oracle needs:

    raw      D = height * (1 + width * channels)       (filter byte/row)
    zlib     2 header + 4 adler + D + 5 * ceil(D/65535) stored-block hdrs
    png      8 sig + 25 IHDR + 12 IDAT framing + 12 IEND + zlib
           = 63 + D + 5 * ceil(D / 65535)              (png_encoded_size)

Scope (honest edges, never raises — kernel contract): bit depth 8 only,
color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
non-interlaced only; anything else returns None and callers fall back to
the header-parse / deterministic-fake twins (operators/multimodal.py).
Filters Sub and Up unfilter vectorized (cumsum / add); Average and Paeth
take a per-pixel loop (correct, differential-tested; fine for fixture
and thumbnail work — a wheels-available deployment swaps in Pillow).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# channels per color type (bit depth 8)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes):
    """``(array[h, w, ch] uint8, palette | None)`` or ``None``.

    The array is the raw image plane: palette images (color type 3)
    come back as 1-channel index planes plus their RGB palette so
    callers can choose to dereference; every other supported type is
    the literal sample plane."""
    try:
        if not payload.startswith(_SIG):
            return None
        pos = 8
        width = height = None
        color_type = bit_depth = interlace = None
        palette = None
        idat = []
        n = len(payload)
        while pos + 8 <= n:
            (length,) = struct.unpack(">I", payload[pos:pos + 4])
            ctype = payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + length]
            if len(data) < length:
                return None
            if ctype == b"IHDR":
                if length != 13:
                    return None
                width, height, bit_depth, color_type, _comp, _filt, \
                    interlace = struct.unpack(">IIBBBBB", data)
            elif ctype == b"PLTE":
                palette = np.frombuffer(data[:(length // 3) * 3],
                                        dtype=np.uint8).reshape(-1, 3)
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            pos += 12 + length  # len + type + data + crc
        if (width is None or not idat or bit_depth != 8 or interlace != 0
                or color_type not in _CHANNELS or width == 0 or height == 0):
            return None
        ch = _CHANNELS[color_type]
        raw = zlib.decompress(b"".join(idat))
        stride = 1 + width * ch
        if len(raw) < stride * height:
            return None
        rows = np.frombuffer(raw[:stride * height],
                             dtype=np.uint8).reshape(height, stride)
        out = np.zeros((height, width * ch), dtype=np.uint8)
        prev = np.zeros(width * ch, dtype=np.uint16)
        for y in range(height):
            ftype = rows[y, 0]
            line = rows[y, 1:].astype(np.uint16)
            if ftype == 0:
                recon = line
            elif ftype == 1:  # Sub: recon[x] = line[x] + recon[x-ch]
                lanes = line.reshape(-1, ch)
                recon = (np.cumsum(lanes, axis=0, dtype=np.uint64)
                         & 0xFF).astype(np.uint16).reshape(-1)
            elif ftype == 2:  # Up
                recon = (line + prev) & 0xFF
            elif ftype == 3:  # Average
                recon = np.empty_like(line)
                for x in range(width * ch):
                    a = recon[x - ch] if x >= ch else 0
                    recon[x] = (line[x] + ((int(a) + int(prev[x])) >> 1)) \
                        & 0xFF
            elif ftype == 4:  # Paeth
                recon = np.empty_like(line)
                for x in range(width * ch):
                    a = int(recon[x - ch]) if x >= ch else 0
                    b = int(prev[x])
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    recon[x] = (line[x] + pred) & 0xFF
            else:
                return None
            out[y] = recon.astype(np.uint8)
            prev = recon
        return out.reshape(height, width, ch), palette
    except Exception:
        return None


def _zlib_stored(data: bytes) -> bytes:
    """A zlib stream of raw stored (BTYPE=00) deflate blocks, emitted
    directly (RFC 1950/1951) rather than via ``zlib.compress(·, 0)`` —
    CPython's level-0 block splits follow internal buffering and are NOT
    a clean 65535 law; this framing is exactly ``6 + D +
    5 * ceil(D/65535)`` bytes, the closed form the oracle needs.  Any
    inflater (including ``zlib.decompress``) reads it back."""
    out = [b"\x78\x01"]  # CMF/FLG: deflate, 32K window, check bits
    n = len(data)
    pos = 0
    while True:
        chunk = data[pos:pos + 65535]
        pos += len(chunk)
        final = pos >= n
        out.append(struct.pack("<BHH", 1 if final else 0, len(chunk),
                               len(chunk) ^ 0xFFFF) + chunk)
        if final:
            break
    out.append(struct.pack(">I", zlib.adler32(data)))
    return b"".join(out)


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal real PNG from a ``uint8`` array ``[h, w]`` or
    ``[h, w, ch]`` (ch 1=gray, 2=gray+alpha, 3=RGB, 4=RGBA): filter 0
    on every scanline, one stored-block zlib stream — so
    ``len(encode_png(a)) == png_encoded_size(w, h, ch)`` exactly."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    comp = _zlib_stored(raw)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp)
            + chunk(b"IEND", b""))


def png_encoded_size(width: int, height: int, channels: int = 1) -> int:
    """Exact ``len(encode_png(...))`` for the given dims — the closed
    form the driver oracle mirrors in SQL."""
    d = height * (1 + width * channels)
    return 63 + d + 5 * ((max(d, 1) + 65534) // 65535)


def resize_dims(w: int, h: int, max_dim: int) -> tuple[int, int]:
    """Nearest-neighbor target dims: cap the longer side at ``max_dim``,
    floor-scale the shorter (never below 1), no upscaling — integer
    arithmetic only so the SQL oracle states the same expression."""
    if max(w, h) <= max_dim:
        return w, h
    if w >= h:
        return max_dim, max(1, h * max_dim // w)
    return max(1, w * max_dim // h), max_dim


def resize_nearest(arr: np.ndarray, max_dim: int) -> np.ndarray:
    """Nearest-neighbor resample to :func:`resize_dims`: source index
    ``floor(i * src / dst)`` — pure integer mapping, fancy-indexed."""
    h, w = arr.shape[:2]
    w2, h2 = resize_dims(w, h, max_dim)
    ys = (np.arange(h2) * h) // h2
    xs = (np.arange(w2) * w) // w2
    return arr[ys][:, xs]
