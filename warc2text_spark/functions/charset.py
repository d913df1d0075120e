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
  declared charset unconditionally, like uchardet does;
* statistical detections — legacy CJK multibyte (shift_jis / euc_jp /
  gb2312 / big5 / euc_kr, script-evidence scored) and the single-byte
  families (Cyrillic cp1251/koi8-r/iso-8859-5/cp866, Greek, Hebrew,
  Arabic, Thai — coherence + case + letter-frequency argmax) —
  win only when the declared charset is IMPLAUSIBLE on the same sample
  (fails strict decode, or claims a Western-Latin charset for
  high-byte-dense text).  This is uchardet's confidence asymmetry: a
  correctly-declared cp1251 page is never stomped by a coincidental
  Shift_JIS parse, while a declared-latin-but-actually-cp1251/shift_jis
  page is recovered;
* otherwise the declared charset (lower-cased) is used;
* with *no* declared charset, the statistical models above run first,
  then a weak legacy-class guess recovers the page as windows-1252 (or
  iso-8859-1 when cp1252's five undefined bytes appear) instead of
  dropping it — uchardet classifies undeclared legacy Latin pages the
  same way (util.cc:68-91), and old crawls are full of them.

Remaining scope gap vs uchardet: no frequency model for euc-kr-vs-gb2312
han-only text (deterministic preference order documented at
_cjk_multibyte_guess); same-layout single-byte aliases report the
first-listed name (iso-8859-7 over windows-1253, windows-1255 over
iso-8859-8, tis-620 for the Thai trio) since the letter banks coincide.

Fixtures pin declared-charset cases so the precedence logic is stable (see
FIXTURES.md F09).
"""

from __future__ import annotations

import codecs


# script codepoint ranges for the multibyte detector's content checks.
# Half-width katakana (U+FF61-FF9F) is deliberately NOT evidence: shift_jis
# maps every SINGLE byte 0xA1-0xDF there, so any dense single-byte text
# (koi8-r lowercase Cyrillic lives at 0xC0-0xDF) "decodes" to hw-kana soup
# — the classic false positive.  Real Japanese pages are dominated by
# full-width kana/kanji (2-byte), which still carries the signal; a
# hw-kana-only page (old mobile content) falls back to its declared
# charset (documented miss).
_KANA_RANGES = ((0x3040, 0x30FF),)
_HAN_RANGES = ((0x3400, 0x9FFF), (0xF900, 0xFAFF))
_HANGUL_RANGES = ((0xAC00, 0xD7A3), (0x1100, 0x11FF), (0x3130, 0x318F))
_MB_SAMPLE = 65536
_MB_MIN_HI = 16          # too few high bytes: no statistical signal
_MB_MIN_CJK_RATIO = 0.5  # decoded CJK chars vs high-byte pair estimate
# CJK multibyte body text is dense in high bytes even with ASCII markup
# (>= 30% typical); accented Latin text stays under ~5%, so the density
# floor rejects a French page whose accents happen to form valid pairs
_MB_MIN_HI_DENSITY = 0.10


def _in_ranges(cp: int, ranges) -> bool:
    return any(a <= cp <= b for a, b in ranges)


def _script_counts(txt: str):
    kana = han = hangul = 0
    for ch in txt:
        cp = ord(ch)
        if cp < 0x80:
            continue
        if _in_ranges(cp, _KANA_RANGES):
            kana += 1
        elif _in_ranges(cp, _HAN_RANGES):
            han += 1
        elif _in_ranges(cp, _HANGUL_RANGES):
            hangul += 1
    return kana, han, hangul


def _cjk_multibyte_guess(data: bytes) -> str | None:
    """Deterministic slice of uchardet's statistical model: legacy CJK
    multibyte encodings (the reference trusts uchardet over the declared
    charset, util.cc:68-91 — a page declaring iso-8859-1 while shipping
    Shift_JIS bytes must be overridden).  Gates first (both measured on
    the 64 KB sample):

    * enough high bytes to carry a signal (>= 16) at body-text density
      (>= 10% — accented Latin stays under ~5%);
    * a candidate counts only if the sample STRICTLY decodes and the
      decoded high-byte pairs are mostly CJK/hangul characters.

    The EUC-structured encodings overlap heavily (Korean euc-kr text
    strictly decodes in euc_jp/gb2312/big5 too), so a unique strict
    decode is rare; ambiguity resolves by script evidence, mirroring
    uchardet's per-encoding frequency models with deterministic rules:

    1. hangul-dominant euc_kr decode (>= 60% of pairs) -> euc-kr: no
       other candidate's native text produces hangul at all;
    2. kana-dominant decode (>= 25% of pairs) -> Japanese: prefer
       shift_jis, then euc_jp (gb2312 carries kana rows, but
       gb2312-encoded kana-dominant text is essentially nonexistent);
    3. han-only text -> gb2312 over big5 over euc_jp: real big5 text
       almost always hits low trail bytes (0x40-0x7E) that kill the EUC
       grids so it usually decodes uniquely; a kanji-only euc_jp page is
       the documented residual confusion (uchardet shares it)."""
    sample = data[:_MB_SAMPLE]
    n_hi = sum(1 for b in sample if b >= 0x80)
    if n_hi < _MB_MIN_HI or n_hi < _MB_MIN_HI_DENSITY * len(sample):
        return None
    n_pairs = max(n_hi / 2, 1)
    hits: dict[str, tuple[int, int, int]] = {}
    for enc in ("shift_jis", "euc_jp", "gb2312", "big5", "euc_kr"):
        try:
            txt = sample.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
        kana, han, hangul = _script_counts(txt)
        if kana + han + hangul >= _MB_MIN_CJK_RATIO * n_pairs:
            hits[enc] = (kana, han, hangul)
    if not hits:
        return None
    if len(hits) == 1:
        return next(iter(hits))
    if "euc_kr" in hits:
        if hits["euc_kr"][2] >= 0.6 * n_pairs:
            return "euc_kr"
        del hits["euc_kr"]  # mixed hangul/han soup: not Korean
        if len(hits) == 1:
            return next(iter(hits))
        if not hits:
            return None
    kana_dominant = [e for e in ("shift_jis", "euc_jp", "gb2312")
                     if e in hits and hits[e][0] >= 0.25 * n_pairs]
    if kana_dominant:
        return kana_dominant[0]
    for enc in ("gb2312", "big5", "euc_jp", "shift_jis"):
        if enc in hits:
            return enc
    return None


# Legacy single-byte families (uchardet's statistical scope, util.cc:
# 68-91): these charsets decode nearly every byte, so strictness carries
# no signal — discriminate by where the decoded high bytes land:
#
# * coherence: >= 90% of decoded high bytes must be the family's script;
# * case statistics (bicameral scripts only): the layouts place the
#   upper/lower banks differently, so a WRONG same-family decode of real
#   text is uppercase-dominant;
# * common-letter share: the ~ten most frequent letters of the
#   language(s) behind a script cover ~50-70% of running text; a decode
#   through the WRONG family scatters roughly uniformly and lands far
#   below.  The WINNER is the argmax of this share (not just any passer:
#   Hebrew bytes decoded through the Greek layouts stay coherent and
#   lowercase at ~0.53 common share, while the true Hebrew decode scores
#   ~0.68 — measured in tests/test_record.py's matrix).
#
# Same-layout aliases (iso-8859-7 vs windows-1253 for Greek letters,
# windows-1255 vs iso-8859-8 for Hebrew letters) tie exactly; strict >
# keeps the first-listed, more common encoding.
_SB_MIN_HI_DENSITY = 0.10
_SB_MIN_COHERENCE = 0.9
_SB_MIN_LOWER = 0.6
_SB_MIN_COMMON = 0.45
_SB_MIN_ADJACENCY = 0.8
_SB_HI_BYTES = bytes(range(0x80, 0x100))
import re as _sb_re
_SB_ISOLATED_RE = _sb_re.compile(
    rb"(?<![\x80-\xff])[\x80-\xff](?![\x80-\xff])")
_SB_FAMILIES = (
    dict(encodings=("windows-1251", "koi8-r", "iso-8859-5", "cp866"),
         rng=((0x0400, 0x04FF),),
         lower=((0x0430, 0x045F), (0x0491, 0x0491)),
         common=frozenset("оеаинтслвр")),
    dict(encodings=("iso-8859-7", "windows-1253"),
         rng=((0x0370, 0x03FF),),
         lower=((0x03B1, 0x03C9), (0x03AC, 0x03AF), (0x03CC, 0x03CE)),
         common=frozenset("αοειτνησρπ")),
    dict(encodings=("windows-1255", "iso-8859-8"),
         rng=((0x0590, 0x05FF),), lower=None,
         common=frozenset("אוהילרמשתב")),
    dict(encodings=("windows-1256",),
         rng=((0x0600, 0x06FF),), lower=None,
         common=frozenset("اليمونهرتب")),
    dict(encodings=("tis-620",),   # cp874/iso-8859-11 share the letters
         rng=((0x0E00, 0x0E7F),), lower=None,
         common=frozenset("านรอเกงมยว่ัี้")),
)


def _single_byte_guess(data: bytes) -> str | None:
    sample = data[:_MB_SAMPLE]
    n_hi = len(sample) - len(sample.translate(None, _SB_HI_BYTES))
    if n_hi < _MB_MIN_HI or n_hi < _SB_MIN_HI_DENSITY * len(sample):
        return None
    # run-structure gate: in a genuine non-Latin single-byte page, words
    # are CONSECUTIVE high bytes, so nearly every high byte neighbors
    # another (measured ~1.0 for he/ar/th/ru text); accent-dense Latin
    # has isolated high bytes inside ASCII words (French 0.0, Portuguese
    # with its -ção runs 0.47).  This is what protects the CASELESS
    # families, which have no upper/lower-bank evidence to reject an
    # accents-as-letters decode.  One C regex pass: adjacent = total
    # minus isolated high bytes.
    isolated = len(_SB_ISOLATED_RE.findall(sample))
    if (n_hi - isolated) < _SB_MIN_ADJACENCY * n_hi:
        return None
    best, best_common = None, 0.0
    for fam in _SB_FAMILIES:
        rngs, lows = fam["rng"], fam["lower"]
        for enc in fam["encodings"]:
            try:
                txt = sample.decode(enc)
            except (UnicodeDecodeError, LookupError):
                continue
            scr = [ch for ch in txt
                   if any(a <= ord(ch) <= b for a, b in rngs)]
            if len(scr) < _SB_MIN_COHERENCE * n_hi:
                continue
            if lows is not None:
                n_low = sum(1 for ch in scr
                            if any(a <= ord(ch) <= b for a, b in lows))
                if n_low < _SB_MIN_LOWER * len(scr):
                    continue
            common = sum(1 for ch in scr if ch in fam["common"]) / len(scr)
            if common < _SB_MIN_COMMON:
                continue
            if common > best_common:
                best, best_common = enc, common
    return best


# detections in this set are certain (BOM / strict-decode classes) and
# always beat the declared charset; anything else default_detect returns
# is statistical and subject to detect_charset's declared-plausibility
# asymmetry
STRONG_DETECTIONS = frozenset({"utf-8-sig", "utf-16", "ascii", "utf-8"})


def default_detect(data: bytes) -> str | None:
    """Deterministic stand-in for uchardet's confident classes: BOMs,
    strict ASCII, strict UTF-8, statistical legacy CJK multibyte and
    Cyrillic single-byte models; anything else gives up (weak-class
    recovery happens in detect_charset)."""
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
    return (_cjk_multibyte_guess(data) or _single_byte_guess(data)
            or _central_european_guess(data))


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


# Central-European legacy Latin (cp1250 / iso-8859-2): byte-level
# statistics cannot separate these from cp1252 (all are accented-Latin
# layouts), so the evidence is LINGUISTIC — the accented stopwords of the
# CE languages (už, że, się, és, však, după, …) decode to real function
# words only under the CE layouts.  Lazily derived from the langid
# stopword tables so language breadth feeds charset detection.
_CE_LANGS = ("cs", "sk", "pl", "hu", "sl", "hr", "ro", "lt", "lv", "et")
_WEST_LANGS = ("fr", "es", "pt", "de", "it", "sv", "da", "no", "ca",
               "fi", "is")
_CE_ACC: frozenset | None = None
_WEST_ACC: frozenset | None = None


def _accented_stopwords():
    global _CE_ACC, _WEST_ACC
    if _CE_ACC is None:
        from .langid import _STOPWORDS
        acc = lambda langs: frozenset(  # noqa: E731
            w for l in langs for w in _STOPWORDS[l]
            if any(ord(c) > 127 for c in w))
        _CE_ACC = acc(_CE_LANGS)
        _WEST_ACC = acc(_WEST_LANGS)
    return _CE_ACC, _WEST_ACC


_CE_PROBE = 8192
_HI_BYTES = bytes(range(0x80, 0x100))


def _central_european_guess(data: bytes) -> str | None:
    """cp1250/iso-8859-2 detection by accented-stopword evidence: the CE
    decode must produce >= 2 distinct accented CE function words AND
    strictly more than the cp1252 decode produces Western ones (a French
    or Catalan page stays windows-1252).  Candidates argmax over both CE
    layouts (they differ at š/ž and a few vowels).

    Hot-path cost control: this runs for every legacy page that reaches
    the end of the detector chain, so an 8 KB single-decode probe gates
    the full evaluation — function words are frequent, so a CE page finds
    its >= 2 evidence types inside the first 8 KB; an ordinary Western
    page pays one short decode and bails."""
    probe = data[:_CE_PROBE]
    n_hi = len(probe) - len(probe.translate(None, _HI_BYTES))
    if n_hi < _MB_MIN_HI:
        return None
    ce_acc, west_acc = _accented_stopwords()
    if all(len(set(probe.decode(enc, errors="replace")
                   .lower().split()) & ce_acc) < 2
           for enc in ("cp1250", "iso-8859-2")):
        return None
    sample = data[:_MB_SAMPLE]
    west = len(set(sample.decode("cp1252", errors="replace")
                   .lower().split()) & west_acc)
    best, best_hits = None, max(west, 1)
    for enc in ("cp1250", "iso-8859-2"):
        toks = set(sample.decode(enc, errors="replace").lower().split())
        hits = len(toks & ce_acc)
        if hits >= 2 and hits > best_hits:
            best, best_hits = enc, hits
    return best


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


# Western-Latin single-byte charsets: body text in these is mostly ASCII
# letters (accents stay under ~5% of bytes), so a >= 10% high-byte-dense
# page declaring one of them is as good as a failed strict decode — the
# evidence the statistical override needs.  Central-European Latin
# charsets (cp1250, iso-8859-2) are deliberately absent: their accent
# density is legitimately high.
_LATIN_SINGLE_BYTE = frozenset({
    "windows-1252", "cp1252", "iso-8859-1", "latin-1", "latin1",
    "iso8859-1", "iso-8859-15", "us-ascii", "ascii",
})


def _declared_plausible(data: bytes, charset: str) -> bool:
    """uchardet-style confidence asymmetry for STATISTICAL detections: a
    declared charset that strictly decodes the sample and is consistent
    with its byte statistics keeps precedence; one that fails to decode
    (or claims a Western-Latin charset for high-byte-dense text) loses to
    the detector (ADVICE r3: the CJK guess must not stomp a correctly
    declared cp1251 page)."""
    sample = data[:_MB_SAMPLE]
    try:
        sample.decode(charset)
    except (UnicodeDecodeError, LookupError):
        return False
    if charset in _LATIN_SINGLE_BYTE:
        n_hi = sum(1 for b in sample if b >= 0x80)
        if n_hi >= _MB_MIN_HI_DENSITY * len(sample):
            return False
    return True


def detect_charset(data: bytes, declared: str, detector=default_detect) -> str | None:
    """util.cc:68-91: detected wins over declared (strong detections
    unconditionally; statistical ones only when the declared charset is
    implausible on the same sample); an unsupported declared charset is
    unknown-encoding; with neither a detection nor a declared charset,
    the weak legacy-class guess recovers the page (see module docstring
    for the precedence delta vs the reference)."""
    detected = detector(data)
    declared_lc = (declared or "").lower()
    if detected:
        # the reference probes the CHOSEN charset for converter support
        # (util.cc:84-90); a pluggable detector may return a name codecs
        # can't handle — that must surface as UNKNOWN_ENCODING_ERROR here,
        # not UTF8_CONVERSION_ERROR downstream.  The built-in detector only
        # emits known-good names, so the probe is skipped for it.
        if detector is not default_detect and not charset_is_supported(detected):
            return None
        if (detector is default_detect
                and detected not in STRONG_DETECTIONS
                and declared_lc and charset_is_supported(declared_lc)
                and declared_lc != detected.lower()
                and _declared_plausible(data, declared_lc)):
            return declared_lc
        return detected.lower()
    if not declared_lc:
        return legacy_guess(data)
    if not charset_is_supported(declared_lc):
        return None
    return declared_lc


NO_CONVERT = frozenset({"utf8", "utf-8", "ascii"})  # record.cc:240


def needs_conversion(charset: str) -> bool:
    return charset not in NO_CONVERT


def to_utf8(data: bytes, charset: str) -> str:
    """Strict conversion (util.cc:93-98); UnicodeDecodeError propagates as
    the UTF8_CONVERSION_ERROR signal."""
    return data.decode(charset, errors="strict")
