"""Dependency-free GIF LZW codec (r6): real pixel decode for GIF frames.

``lzw_decode`` is the full GIF-flavor LZW decompressor (GIF89a spec
appendix F: variable code width from min_code_size+1 up to 12 bits,
LSB-first bit packing, CLEAR resets, the KwKwK self-reference case, the
first-code-after-clear rule).  Never raises — malformed streams return
None and callers fall back to the labeled fake twins.

``lzw_literal_encode`` is the fixture/test encoder: literal codes only,
with a CLEAR emitted before the decoder's dictionary would force a code
width bump — so with ``min_code_size`` 7 every code is exactly one byte
and the stream length is CLOSED-FORM (n_pixels + 2 bytes for up to 126
pixels per clear section), the property the driver oracle states in SQL.
Any compliant LZW decoder reads it back; round-trip is differential-
tested against :func:`lzw_decode`.
"""

from __future__ import annotations


def lzw_decode(data: bytes, min_code_size: int,
               max_pixels: int = 1 << 24):
    """Decoded index bytes, or None on a malformed stream."""
    try:
        if not 1 <= min_code_size <= 11:
            return None
        clear = 1 << min_code_size
        end = clear + 1
        out = bytearray()
        # dictionary as (prefix_code, last_byte); literals implicit
        prefix = [0] * 4096
        suffix = bytearray(4096)
        first = bytearray(4096)  # first byte of each sequence
        length = [0] * 4096

        def reset():
            for i in range(clear):
                suffix[i] = i
                first[i] = i
                length[i] = 1
            return clear + 2, min_code_size + 1

        next_code, width = reset()
        prev = -1
        acc = 0
        nbits = 0
        pos = 0
        n = len(data)
        seq = bytearray()
        while True:
            while nbits < width:
                if pos >= n:
                    return bytes(out)  # truncated: return what we have
                acc |= data[pos] << nbits
                pos += 1
                nbits += 8
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                next_code, width = reset()
                prev = -1
                continue
            if code == end:
                return bytes(out)
            if code >= next_code and not (code == next_code and prev >= 0):
                return None  # out-of-range code: corrupt
            if prev < 0:
                out.append(first[code])
                prev = code
                continue
            if code == next_code:  # KwKwK
                # seq = seq(prev) + first byte of seq(prev)
                new_first = first[prev]
                _expand(seq, prefix, suffix, length, first, prev)
                seq.append(new_first)
            else:
                _expand(seq, prefix, suffix, length, first, code)
            out.extend(seq)
            if len(out) > max_pixels:
                return None
            if next_code < 4096:
                prefix[next_code] = prev
                suffix[next_code] = seq[0]
                first[next_code] = first[prev]
                length[next_code] = length[prev] + 1
                # suffix of the new entry is the FIRST byte of the
                # current sequence
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = code
            seq.clear()
        return bytes(out)
    except Exception:
        return None


def _expand(seq: bytearray, prefix, suffix, length, first, code) -> None:
    """Materialize dictionary sequence ``code`` into ``seq`` (cleared)."""
    seq.clear()
    ln = length[code]
    seq.extend(b"\x00" * ln)
    i = ln - 1
    c = code
    while i > 0:
        seq[i] = suffix[c]
        c = prefix[c]
        i -= 1
    seq[0] = first[code]


def lzw_literal_encode(indices: bytes, min_code_size: int = 7) -> bytes:
    """Literal-code LZW stream: CLEAR, then runs of at most
    ``2^min - 2`` literal codes separated by CLEARs, then END — the
    dictionary never forces a width bump, so every code is exactly
    ``min_code_size + 1`` bits.  With min_code_size 7 that is one byte
    per code and ``len == n + 1 + ceil(n / 126) `` … for n <= 126:
    ``n + 2`` bytes (the fixture's closed form)."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    codes = [clear]
    run = 0
    limit = (1 << min_code_size) - 2
    for b in indices:
        if b >= clear:
            raise ValueError("index out of palette range")
        if run == limit:
            codes.append(clear)
            run = 0
        codes.append(b)
        run += 1
    codes.append(end)
    out = bytearray()
    acc = 0
    nbits = 0
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)
