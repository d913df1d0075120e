"""Language identification strategies.

Reference: /root/reference/src/lang.hh:14-23 — a pluggable
``LanguageDetector`` with ``detect(text) -> {lang: chunk}``; implementations
are CLD2 single (whole text under the top language, ``unk`` when unreliable,
lang_cld2.cc:11-16), CLD2 multilang (per-chunk reassembly of the top <=3
languages, lang_cld2.cc:20-75), fastText (top-1 with probability threshold
0.5, lang_fasttext.cc:18-38) and skip (single chunk under the empty-string
key, lang.cc:10-15).  The unknown label is ``"unk"`` (lang.cc:5).

CLD2/fastText models are not available here, so the classifying detectors
use a deterministic stopword/character n-gram scorer with the same *shape*
(labels, thresholds, unk semantics, multilang chunk reassembly).  Language
labels are not part of the span-equality invariant; classifier-dependent
tests assert histogram shape only (FIXTURES.md F19).
"""

from __future__ import annotations

UNKNOWN_LANG = "unk"  # lang.cc:5

# Minimal deterministic evidence tables (top web languages): distinctive,
# high-frequency function words.  Deliberately small and frozen — this is a
# reproducible stand-in, not a competitive classifier.
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "his", "this", "have", "not", "are", "but", "they"},
    "es": {"el", "la", "los", "las", "de", "que", "y", "en", "un", "una",
           "es", "del", "se", "por", "con", "para", "como", "está"},
    "fr": {"le", "la", "les", "des", "de", "et", "est", "en", "un", "une",
           "du", "que", "qui", "dans", "pour", "pas", "sur", "avec"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu",
           "den", "von", "mit", "sich", "des", "auf", "für", "im", "dem"},
    "pt": {"o", "a", "os", "as", "de", "que", "e", "do", "da", "em", "um",
           "uma", "para", "com", "não", "por", "mais", "dos"},
    "it": {"il", "la", "le", "di", "che", "e", "è", "un", "una", "per",
           "non", "sono", "con", "del", "della", "gli", "nel", "si"},
    "nl": {"de", "het", "een", "en", "van", "is", "dat", "die", "in", "te",
           "niet", "met", "voor", "zijn", "op", "aan", "maar", "ook"},
}

_THRESHOLD = 0.5  # fastText confidence threshold, lang_fasttext.cc:21


def _tokenize(text: str) -> list[str]:
    return text.lower().split()


def _build_word_langs() -> dict[str, tuple[str, ...]]:
    out: dict[str, list[str]] = {}
    for lang, words in _STOPWORDS.items():
        for w in words:
            out.setdefault(w, []).append(lang)
    return {w: tuple(ls) for w, ls in out.items()}


_WORD_LANGS = _build_word_langs()


def _hits(tokens: list[str]) -> dict[str, int]:
    # one pass over the tokens with a combined word->langs table (vs one
    # scan per language)
    hits: dict[str, int] = {}
    wl = _WORD_LANGS
    for t in tokens:
        langs = wl.get(t)
        if langs:
            for lang in langs:
                hits[lang] = hits.get(lang, 0) + 1
    return hits


def classify(text: str) -> tuple[str, float]:
    """Top-1 (label, confidence); ('unk', 0.0) when no evidence.

    Confidence is margin-based — top / (top + runner-up) — so shared
    function words across related languages don't sink a clear winner.
    """
    hits = _hits(_tokenize(text))
    if not hits:
        return UNKNOWN_LANG, 0.0
    ranked = sorted(hits.items(), key=lambda kv: (-kv[1], kv[0]))
    top_lang, top = ranked[0]
    second = ranked[1][1] if len(ranked) > 1 else 0
    return top_lang, top / (top + second)


class SkipDetector:
    """lang.cc:10-15: single chunk under the empty-string key."""

    def detect(self, text: str) -> dict[str, str]:
        return {"": text}


class HeuristicDetector:
    """Single-language detection: whole text under the top label, or unk
    when below the 0.5 confidence threshold (lang_fasttext.cc:21-38)."""

    def detect(self, text: str) -> dict[str, str]:
        lang, prob = classify(text)
        if prob < _THRESHOLD:
            return {UNKNOWN_LANG: text}
        return {lang: text}


class HeuristicMultiDetector:
    """Multilang detection with CLD2-multilang shape (lang_cld2.cc:20-75):
    classify per line, keep the top <=3 languages by assigned bytes,
    reassemble each language's chunk in text order, drop empty chunks;
    unreliable (no evidence at all) => whole text under unk."""

    def detect(self, text: str) -> dict[str, str]:
        lines = text.split("\n")
        labeled: list[tuple[str, str]] = []
        for i, line in enumerate(lines):
            chunk = line + ("\n" if i < len(lines) - 1 else "")
            lang, prob = classify(line)
            labeled.append((lang if prob >= _THRESHOLD else UNKNOWN_LANG, chunk))
        by_bytes: dict[str, int] = {}
        for lang, chunk in labeled:
            if lang != UNKNOWN_LANG:
                by_bytes[lang] = by_bytes.get(lang, 0) + len(chunk.encode("utf-8"))
        if not by_bytes:
            return {UNKNOWN_LANG: text}
        top = sorted(by_bytes, key=lambda k: (-by_bytes[k], k))[:3]
        out: dict[str, str] = {}
        for lang, chunk in labeled:
            if lang in top:
                out[lang] = out.get(lang, "") + chunk
        return {k: v for k, v in out.items() if v}


DETECTORS = {
    "skip": SkipDetector,
    "heuristic": HeuristicDetector,
    "multilang": HeuristicMultiDetector,
}


def get_detector(name: str):
    return DETECTORS[name]()
