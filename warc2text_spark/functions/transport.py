"""HTTP transport decode: chunked transfer dechunk + content-encoding.

Reference: /root/reference/src/decompress.hh.

* ``dechunk`` (:98-123) — grammar ``(<hex size><space>*\\r\\n<chunk>\\r\\n)+0(\\r\\n)?``.
  The reference edits the buffer *in place* and the caller keeps the buffer
  as-is when the grammar throws mid-stream (record.cc:114-128), so a failed
  dechunk yields a *partially* dechunked payload; a ``0`` chunk breaks out
  leaving any trailing bytes (e.g. a final CRLF or trailers) in the buffer.
  Both behaviors are reproduced here via :class:`DechunkError.partial`.
* ``decompress`` (:87-96) — gzip/x-gzip inflated (magic ``1F 8B`` required,
  :52-53); ``none/identity/raw/utf-8`` pass through (:9); anything else
  (including br/deflate) raises -> raw payload kept.
"""

from __future__ import annotations

import gzip
import re

NONCOMPRESSED_ENCODINGS = frozenset({"none", "identity", "raw", "utf-8"})

# std::stoul(line, &processed, 16): optional leading C whitespace, then hex
_HEX_RE = re.compile(rb"[ \t\n\v\f\r]*([0-9a-fA-F]+)")


class DechunkError(ValueError):
    def __init__(self, msg: str, partial: bytes):
        super().__init__(msg)
        self.partial = partial


def dechunk(data: bytes) -> bytes:
    """Merge chunked-transfer chunks; raises DechunkError with the
    partially-edited buffer on grammar violations (decompress.hh:98-123)."""
    out = bytearray()
    rest = data
    while rest:
        line_end = rest.find(b"\r\n")
        if line_end < 0:
            line_end = len(rest)
        line = rest[:line_end]
        m = _HEX_RE.match(line)
        if not m or line[m.end():].strip(b" "):
            # stoul failure or trailing non-space junk in the size line
            raise DechunkError("chunk size line has unrecognized format",
                              bytes(out) + rest)
        chunk_size = int(m.group(1), 16)
        rest = rest[line_end + 2:]  # erase size line + CRLF
        if chunk_size == 0:
            break
        if chunk_size >= len(rest):
            raise DechunkError("chunk size larger than remaining input",
                              bytes(out) + rest)
        out += rest[:chunk_size]
        if rest[chunk_size:chunk_size + 2] != b"\r\n":
            raise DechunkError("no CRLF immediately after a chunk",
                              bytes(out) + rest[chunk_size:])
        rest = rest[chunk_size + 2:]
    return bytes(out) + rest


def decompress(data: bytes, encoding: str) -> bytes:
    if encoding in ("gzip", "x-gzip"):
        if len(data) < 2 or data[0] != 0x1F or data[1] != 0x8B:
            raise ValueError("not a gzip-ed string")
        try:
            return gzip.decompress(data)
        except Exception as e:  # zlib errors -> same "keep raw" path
            raise ValueError(f"gzip decompression failed: {e}") from e
    if encoding in NONCOMPRESSED_ENCODINGS:
        return data
    raise ValueError(f"unsupported HTTP Content-Encoding: {encoding}")


def transport_decode(data: bytes, transfer_encoding: str, content_encoding: str) -> bytes:
    """record.cc:114-128: dechunk then decompress, one try block; on error
    keep the payload as it stands (possibly partially dechunked)."""
    try:
        if transfer_encoding:
            if transfer_encoding == "chunked":
                data = dechunk(data)
            else:
                raise ValueError("unsupported HTTP Transfer-Encoding")
        if content_encoding:
            data = decompress(data, content_encoding.lower())
    except DechunkError as e:
        data = e.partial
    except ValueError:
        pass
    return data
