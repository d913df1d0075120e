"""Dependency-free zstd streaming compression via ctypes over the system
libzstd (the public facebook/zstd C API, zstd.h).

The reference's column writer supports zstd output
(/root/reference/src/bilangwriter.cc:47-51, suffix ".zst" at :101) through
boost::iostreams over libzstd.  This sandbox ships ``libzstd.so.1`` but no
Python binding wheel, so the compat writer binds the same C library
directly: ``ZSTD_compressStream2`` for a bounded-memory file-like writer
(column files can be GBs at scale — no whole-file buffering), and
``ZSTD_decompressStream`` for the read-back used by tests/consumers.
Everything is gated behind :func:`available` — on a host without libzstd
the caller gets a clear error, not an import failure.
"""

from __future__ import annotations

import ctypes
import ctypes.util


class _Buf(ctypes.Structure):
    # ZSTD_inBuffer and ZSTD_outBuffer share this layout (ptr, size, pos)
    _fields_ = [("p", ctypes.c_void_p), ("size", ctypes.c_size_t),
                ("pos", ctypes.c_size_t)]


_LIB = None
_ZSTD_c_compressionLevel = 100  # zstd.h ZSTD_cParameter
_CONTINUE, _END = 0, 2          # ZSTD_EndDirective


def _lib():
    global _LIB
    if _LIB is None:
        name = ctypes.util.find_library("zstd")
        if not name:
            raise OSError("libzstd not found on this host")
        lib = ctypes.CDLL(name)
        szt, vp, i32 = ctypes.c_size_t, ctypes.c_void_p, ctypes.c_int
        lib.ZSTD_createCCtx.restype = vp
        lib.ZSTD_freeCCtx.argtypes = [vp]
        lib.ZSTD_CCtx_setParameter.restype = szt
        lib.ZSTD_CCtx_setParameter.argtypes = [vp, i32, i32]
        lib.ZSTD_compressStream2.restype = szt
        lib.ZSTD_compressStream2.argtypes = [
            vp, ctypes.POINTER(_Buf), ctypes.POINTER(_Buf), i32]
        lib.ZSTD_createDCtx.restype = vp
        lib.ZSTD_freeDCtx.argtypes = [vp]
        lib.ZSTD_decompressStream.restype = szt
        lib.ZSTD_decompressStream.argtypes = [
            vp, ctypes.POINTER(_Buf), ctypes.POINTER(_Buf)]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [szt]
        lib.ZSTD_CStreamOutSize.restype = szt
        lib.ZSTD_DStreamOutSize.restype = szt
        _LIB = lib
    return _LIB


def available() -> bool:
    try:
        _lib()
        return True
    except OSError:
        return False


class ZstdWriter:
    """File-like streaming zstd compressor (write/close), drop-in for the
    compat writer's ``gzip.open(path, "wb")`` handles."""

    def __init__(self, path: str, level: int = 3):
        lib = _lib()
        self._lib = lib
        self._cctx = lib.ZSTD_createCCtx()
        if not self._cctx:
            raise OSError("ZSTD_createCCtx failed")
        try:
            rc = lib.ZSTD_CCtx_setParameter(
                self._cctx, _ZSTD_c_compressionLevel, int(level))
            if lib.ZSTD_isError(rc):
                raise OSError(
                    f"ZSTD_CCtx_setParameter rejected level {level}")
            self._f = open(path, "wb")
        except BaseException:
            lib.ZSTD_freeCCtx(self._cctx)
            self._cctx = None
            raise
        self._cap = lib.ZSTD_CStreamOutSize()
        self._out = ctypes.create_string_buffer(self._cap)

    def _pump(self, data: bytes, end_op: int) -> None:
        lib = self._lib
        src = ctypes.create_string_buffer(data, len(data)) if data else None
        inb = _Buf(ctypes.cast(src, ctypes.c_void_p) if src else None,
                   len(data), 0)
        while True:
            outb = _Buf(ctypes.cast(self._out, ctypes.c_void_p),
                        self._cap, 0)
            rc = lib.ZSTD_compressStream2(
                self._cctx, ctypes.byref(outb), ctypes.byref(inb), end_op)
            if lib.ZSTD_isError(rc):
                raise OSError(f"ZSTD_compressStream2 error ({rc})")
            if outb.pos:
                self._f.write(self._out.raw[:outb.pos])
            if end_op == _END:
                if rc == 0:
                    return
            elif inb.pos >= inb.size:
                return

    def write(self, data: bytes) -> None:
        if data:
            self._pump(data, _CONTINUE)

    def close(self) -> None:
        if self._cctx is None:
            return
        try:
            self._pump(b"", _END)
        finally:
            self._lib.ZSTD_freeCCtx(self._cctx)
            self._cctx = None
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def decompress(data: bytes) -> bytes:
    """Whole-buffer streaming decompression (handles frames written with
    unknown content size, which ZSTD_decompress one-shot cannot)."""
    lib = _lib()
    dctx = lib.ZSTD_createDCtx()
    if not dctx:
        raise OSError("ZSTD_createDCtx failed")
    try:
        cap = lib.ZSTD_DStreamOutSize()
        out = ctypes.create_string_buffer(cap)
        src = ctypes.create_string_buffer(data, len(data))
        inb = _Buf(ctypes.cast(src, ctypes.c_void_p), len(data), 0)
        chunks = []
        rc = 0
        while inb.pos < inb.size:
            outb = _Buf(ctypes.cast(out, ctypes.c_void_p), cap, 0)
            rc = lib.ZSTD_decompressStream(
                dctx, ctypes.byref(outb), ctypes.byref(inb))
            if lib.ZSTD_isError(rc):
                raise OSError(f"ZSTD_decompressStream error ({rc})")
            if outb.pos:
                chunks.append(out.raw[:outb.pos])
            if outb.pos == 0 and inb.pos >= inb.size:
                break
        # ZSTD_decompressStream returns 0 exactly at a frame boundary; a
        # nonzero rc with the input exhausted means the frame is
        # unfinished — fail loudly instead of returning silently truncated
        # output (same contract as the gzip-split no-progress check).
        if rc != 0:
            raise OSError(
                "zstd frame incomplete: input ended mid-frame "
                f"(decoder still expects ~{rc} bytes)")
        return b"".join(chunks)
    finally:
        lib.ZSTD_freeDCtx(dctx)
