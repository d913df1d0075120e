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
reference's pluggable ``LanguageDetector`` pattern):

* strong detections (BOMs, strict ASCII, strict UTF-8) win over the
  declared charset, like uchardet does;
* otherwise the declared charset (lower-cased) is used;
* with *no* declared charset, a weak legacy-class guess recovers the page
  as windows-1252 (or iso-8859-1 when cp1252's five undefined bytes
  appear) instead of dropping it — uchardet classifies undeclared legacy
  Latin pages the same way (util.cc:68-91), and old crawls are full of
  them.  Documented delta vs the reference: our weak guess defers to an
  explicit declaration, where uchardet's guess would override it; strong
  detections keep the reference's detected-wins precedence.

Fixtures pin declared-charset cases so the precedence logic is stable (see
FIXTURES.md F09).
"""

from __future__ import annotations

import codecs


# CJK codepoint ranges for the multibyte detector's content check
_CJK_RANGES = ((0x3040, 0x30FF),   # kana
               (0x3400, 0x9FFF),   # han
               (0xFF61, 0xFF9F))   # half-width kana
_MB_SAMPLE = 65536
_MB_MIN_HI = 16          # too few high bytes: no statistical signal
_MB_MIN_CJK_RATIO = 0.5  # decoded CJK chars vs high-byte pair estimate
# CJK multibyte body text is dense in high bytes even with ASCII markup
# (>= 30% typical); accented Latin text stays under ~5%, so the density
# floor rejects a French page whose accents happen to form valid pairs
_MB_MIN_HI_DENSITY = 0.10


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(a <= cp <= b for a, b in _CJK_RANGES)


def _cjk_multibyte_guess(data: bytes) -> str | None:
    """Deterministic slice of uchardet's statistical model: legacy CJK
    multibyte encodings (the reference trusts uchardet over the declared
    charset, util.cc:68-91 — a page declaring iso-8859-1 while shipping
    Shift_JIS bytes must be overridden).  Fires only when UNAMBIGUOUS:

    * enough high bytes to carry a signal (>= 16 in the 64 KB sample);
    * the sample STRICTLY decodes in exactly one candidate encoding
      (shift_jis / euc_jp / gb2312 — euc_jp and gb2312 overlap heavily,
      so genuinely ambiguous pages fall through to the declared charset);
    * the decoded high-byte pairs are mostly CJK characters (a cp1252 doc
      whose sparse curly quotes happen to parse as Shift_JIS lead bytes
      decodes to isolated kanji soup, but its high-byte count is tiny and
      its CJK ratio check still holds — the guard is the pair-count floor).

    KOI8-R/cp1251 discrimination is NOT attempted: every byte maps in
    both, so strictness carries no signal (documented gap; uchardet uses
    letter-frequency models there)."""
    sample = data[:_MB_SAMPLE]
    n_hi = sum(1 for b in sample if b >= 0x80)
    if n_hi < _MB_MIN_HI or n_hi < _MB_MIN_HI_DENSITY * len(sample):
        return None
    hits = []
    for enc in ("shift_jis", "euc_jp", "gb2312"):
        try:
            txt = sample.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
        cjk = sum(1 for ch in txt if _is_cjk(ch))
        if cjk >= _MB_MIN_CJK_RATIO * (n_hi / 2):
            hits.append(enc)
    return hits[0] if len(hits) == 1 else None


def default_detect(data: bytes) -> str | None:
    """Deterministic stand-in for uchardet's confident classes: BOMs,
    strict ASCII, strict UTF-8, unambiguous legacy CJK multibyte;
    anything else gives up (weak-class recovery happens in
    detect_charset)."""
    if data.startswith(codecs.BOM_UTF8):
        try:
            data.decode("utf-8-sig")
            return "utf-8-sig"
        except UnicodeDecodeError:
            return None
    if data.startswith(codecs.BOM_UTF16_LE) or data.startswith(codecs.BOM_UTF16_BE):
        try:
            data.decode("utf-16")  # BOM-aware, strips it
            return "utf-16"
        except UnicodeDecodeError:
            return None
    try:
        data.decode("ascii")
        return "ascii"
    except UnicodeDecodeError:
        pass
    try:
        data.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    return _cjk_multibyte_guess(data)


import re as _re

# the five cp1252 code points with no assignment; their presence pushes the
# weak guess to iso-8859-1 (where they are C1 controls but still decode)
_CP1252_UNDEFINED_RE = _re.compile(rb"[\x81\x8D\x8F\x90\x9D]")
# C0 controls other than \t\n\v\f\r (plus DEL): essentially absent from
# legacy text but dense in binary formats — the confidence gate below
_BINARY_CTRL = bytes(c for c in range(0x20) if c not in (9, 10, 11, 12, 13)) \
    + b"\x7f"
_SAMPLE = 65536
_MAX_CTRL_RATIO = 0.02


def legacy_guess(data: bytes) -> str | None:
    """Weak-class guess for undeclared non-UTF-8 payloads: the
    windows-1252/latin-1 family that dominates legacy web text.

    Gated on the payload looking like text at all (uchardet's statistical
    model returns nothing on binary data, util.cc:75-77): more than 2%
    non-whitespace control bytes in the leading sample means a binary or
    mislabeled payload -> None -> UNKNOWN_ENCODING_ERROR, like the
    reference.  All checks are C-speed (translate/regex), never per-byte
    Python."""
    sample = data[:_SAMPLE]
    if not sample:
        return None
    n_ctrl = len(sample) - len(sample.translate(None, _BINARY_CTRL))
    if n_ctrl > len(sample) * _MAX_CTRL_RATIO:
        return None
    if _CP1252_UNDEFINED_RE.search(data):
        return "iso-8859-1"
    return "windows-1252"


def charset_is_supported(charset: str) -> bool:
    """boost::locale::conv::to_utf("" , charset) validity probe (util.cc:84-90)."""
    try:
        codecs.lookup(charset)
        return True
    except LookupError:
        return False


def detect_charset(data: bytes, declared: str, detector=default_detect) -> str | None:
    """util.cc:68-91: detected wins over declared; an unsupported declared
    charset is unknown-encoding; with neither a detection nor a declared
    charset, the weak legacy-class guess recovers the page (see module
    docstring for the precedence delta vs the reference)."""
    detected = detector(data)
    if detected:
        # the reference probes the CHOSEN charset for converter support
        # (util.cc:84-90); a pluggable detector may return a name codecs
        # can't handle — that must surface as UNKNOWN_ENCODING_ERROR here,
        # not UTF8_CONVERSION_ERROR downstream.  The built-in detector only
        # emits known-good names, so the probe is skipped for it.
        if detector is not default_detect and not charset_is_supported(detected):
            return None
        return detected.lower()
    charset = (declared or "").lower()
    if not charset:
        return legacy_guess(data)
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
