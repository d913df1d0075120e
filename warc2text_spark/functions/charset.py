"""Charset detection and UTF-8 transcode.

Reference: /root/reference/src/util.cc:68-98 and record.cc:231-251.

The reference runs uchardet over the whole payload and *trusts the detected
charset over the declared one*; if detection fails it falls back to the
declared charset (lower-cased); an empty result or a charset the converter
cannot handle is UNKNOWN_ENCODING_ERROR.  Conversion uses strict error
handling — failure is UTF8_CONVERSION_ERROR.  Payloads already in
utf8/utf-8/ascii are not converted (record.cc:240).

uchardet's statistical model is version-sensitive and unavailable here, so
the default detector is deterministic and pluggable (mirroring the
reference's pluggable ``LanguageDetector`` pattern): strict ASCII / strict
UTF-8 recognition, everything else falls back to the declared charset.
Fixtures pin declared-charset cases so the precedence logic is stable (see
FIXTURES.md F09).
"""

from __future__ import annotations

import codecs


def default_detect(data: bytes) -> str | None:
    """Deterministic stand-in for uchardet: ascii/utf-8 or give up."""
    try:
        data.decode("ascii")
        return "ascii"
    except UnicodeDecodeError:
        pass
    try:
        data.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return None


def charset_is_supported(charset: str) -> bool:
    """boost::locale::conv::to_utf("" , charset) validity probe (util.cc:84-90)."""
    try:
        codecs.lookup(charset)
        return True
    except LookupError:
        return False


def detect_charset(data: bytes, declared: str, detector=default_detect) -> str | None:
    """util.cc:68-91: detected wins over declared; None => unknown encoding."""
    detected = detector(data)
    charset = detected.lower() if detected else (declared or "").lower()
    if not charset:
        return None
    if not charset_is_supported(charset):
        return None
    return charset


NO_CONVERT = frozenset({"utf8", "utf-8", "ascii"})  # record.cc:240


def needs_conversion(charset: str) -> bool:
    return charset not in NO_CONVERT


def to_utf8(data: bytes, charset: str) -> str:
    """Strict conversion (util.cc:93-98); UnicodeDecodeError propagates as
    the UTF8_CONVERSION_ERROR signal."""
    return data.decode(charset, errors="strict")
