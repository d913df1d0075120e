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
    "pl": {"się", "nie", "jest", "w", "na", "i", "z", "do", "że", "to",
           "jak", "ale", "po", "co", "tak", "przez", "oraz", "już"},
    "cs": {"je", "se", "na", "v", "a", "to", "že", "s", "z", "do",
           "pro", "jako", "ale", "podle", "být", "jsou", "však", "už"},
    "sv": {"och", "att", "det", "som", "en", "på", "är", "av", "för",
           "med", "den", "till", "inte", "om", "har", "de", "ett", "var"},
    "ro": {"și", "de", "în", "la", "cu", "este", "un", "o", "pentru",
           "care", "nu", "pe", "din", "mai", "sau", "sunt", "dar", "după"},
    "tr": {"bir", "ve", "bu", "için", "ile", "da", "de", "olarak", "çok",
           "daha", "gibi", "ama", "en", "var", "değil", "sonra", "kadar",
           "olan"},
    "fi": {"ja", "on", "ei", "että", "se", "hän", "oli", "mutta", "niin",
           "kun", "myös", "tämä", "ovat", "jos", "mikä", "vain", "voi",
           "kuin"},
    "id": {"yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini",
           "dari", "dalam", "akan", "pada", "juga", "saya", "ke", "karena",
           "ada", "mereka"},
    "vi": {"của", "là", "và", "có", "trong", "được", "các", "một",
           "những", "cho", "không", "với", "này", "đã", "người", "khi",
           "để", "trên"},
    # breadth batch 2 (r4, CLD2-direction): sets curated to be distinctive
    # against their close siblings — shared function words (da/no, cs/sk,
    # lt/lv, nl/af) are deliberately left out or shared knowingly (a shared
    # word credits every owner; the margin rule resolves or yields unk)
    "da": {"af", "ud", "hvad", "hvem", "hvordan", "også", "være", "meget",
           "nogle", "sådan", "mellem", "når", "efter", "uden"},
    "no": {"av", "ut", "hva", "fra", "eller", "noen", "bare", "mye",
           "slik", "blir", "etter", "mot", "ble", "skal"},
    "is": {"að", "það", "ekki", "við", "fyrir", "hafa", "þetta", "eins",
           "hún", "hann", "því", "verið", "þegar", "mjög"},
    "hu": {"és", "hogy", "nem", "egy", "az", "van", "volt", "csak",
           "már", "mint", "még", "vagy", "ez", "minden"},
    "ca": {"amb", "més", "però", "dels", "aquesta", "també", "són",
           "molt", "fins", "després", "aquest", "altres", "quan", "seva"},
    "hr": {"što", "također", "jer", "nakon", "između", "već", "vrlo",
           "kao", "ili", "biti", "dok", "samo", "ovo", "svi"},
    "sl": {"tudi", "lahko", "vendar", "zdaj", "bilo", "kjer", "ker",
           "zelo", "brez", "proti", "bolj", "lahko", "vse", "njih"},
    "sk": {"som", "ako", "aj", "tiež", "môže", "pri", "sú", "ktorý",
           "ešte", "veľmi", "medzi", "bolo", "ich", "bude"},
    "et": {"ning", "või", "ka", "kui", "seda", "oma", "aga", "väga",
           "juba", "siis", "nagu", "üle", "välja", "kõik"},
    "lt": {"ir", "yra", "kad", "bet", "tai", "kaip", "buvo", "labai",
           "dar", "jau", "taip", "nes", "tik", "apie"},
    "lv": {"un", "ar", "ka", "kā", "tika", "vai", "tas", "šis", "ļoti",
           "pēc", "arī", "bija", "var", "savu"},
    "af": {"nie", "vir", "baie", "hulle", "gesê", "ná", "sodat", "egter",
           "waarin", "word", "dat", "hierdie", "teen", "volgens"},
    "sq": {"dhe", "në", "për", "një", "është", "nuk", "me", "të", "si",
           "nga", "por", "kjo", "janë", "sipas"},
    "sw": {"ya", "wa", "kwa", "ni", "za", "katika", "hii", "sana",
           "lakini", "watu", "kama", "hata", "wake", "yake"},
    "tl": {"ang", "ng", "mga", "sa", "ay", "hindi", "ito", "kung",
           "naman", "siya", "lamang", "niya", "kanyang", "ito"},
    # breadth batch 3 (r4): ten further CLD2-supported Latin-script
    # languages; same curation rule — distinctive function words, close
    # siblings (gl vs pt/es, az/uz vs tr) resolved by accented or
    # language-unique forms
    "cy": {"mae", "yn", "bod", "wedi", "gyda", "ond", "hefyd", "iawn",
           "fel", "dyma", "eich", "ei", "wrth", "gan"},
    "ga": {"agus", "ar", "go", "an", "atá", "bhí", "sé", "ach",
           "seo", "mar", "freisin", "chun", "leis", "na"},
    "eu": {"eta", "da", "ez", "bat", "du", "dira", "baina", "ere",
           "dela", "izan", "hori", "zen", "oso", "egin"},
    "gl": {"unha", "súa", "tamén", "despois", "máis", "pero", "polo",
           "cando", "onde", "todo", "foi", "sobre", "seus", "dous"},
    "mt": {"li", "hija", "huwa", "dan", "din", "kif", "biex", "fuq",
           "kien", "jew", "aktar", "ħafna", "qed", "kollha"},
    "az": {"və", "bir", "bu", "ki", "üçün", "ilə", "daha", "olan",
           "edir", "olaraq", "çox", "sonra", "lakin", "isə"},
    "uz": {"va", "bir", "bu", "uchun", "bilan", "ham", "emas",
           "juda", "keyin", "lekin", "yoki", "edi", "uning", "katta"},
    "so": {"iyo", "oo", "waa", "ka", "uu", "ay", "in", "waxaa",
           "lagu", "soo", "kale", "sida", "laakiin", "markii"},
    "lb": {"an", "datt", "mat", "fir", "vun", "net", "och", "awer",
           "ginn", "hunn", "dëst", "iwwer", "nach", "ëmmer"},
    "eo": {"kaj", "la", "estas", "ne", "por", "kun", "sed", "tio",
           "ankaŭ", "pri", "kiu", "estis", "tre", "povas"},
    # breadth batch 4 (r5): six further Latin-script languages; same
    # curation rule — distinctive function words, shared forms left out
    # (gd deliberately omits agus/ach/seo/mar, all Irish too)
    "ht": {"nan", "yo", "ak", "pou", "te", "ki", "men", "gen", "nou",
           "kap", "yon", "tout", "epi", "lòt"},
    "br": {"hag", "gant", "evit", "war", "eus", "ivez", "hini", "deus",
           "dre", "kalz", "bremañ", "hervez", "etre", "holl"},
    "mg": {"ny", "sy", "dia", "izay", "ary", "koa", "tsy", "misy",
           "amin'ny", "anefa", "ihany", "olona", "rehetra", "tokony"},
    "jv": {"lan", "ing", "sing", "iku", "karo", "saka", "kanggo", "ora",
           "uga", "wis", "bisa", "amarga", "nanging", "iki"},
    "gd": {"agus", "tha", "bha", "chan", "eil", "anns", "airson", "aig",
           "bho", "dhan", "gur", "nuair", "fhèin", "mòran"},
    "la": {"atque", "enim", "autem", "quoque", "igitur", "tamen", "apud",
           "ergo", "quibus", "esse", "quidem", "inter", "sine", "erga"},
    # breadth batch 5 (late r5): six further Latin-script languages,
    # same curation rule — distinctive function words only; shared
    # forms left out (ceb omits ang/mga/sa/na shared with Tagalog, mi
    # omits te/ki/ka/me shared with Haitian Creole, ha omits
    # da/ya/ta/na, zu swaps uma (Portuguese) for ukuze)
    "ceb": {"ug", "dili", "kini", "aron", "usa", "kay", "adunay",
            "ilang", "gikan", "karon", "apan", "busa"},
    "yo": {"àwọn", "ní", "tí", "pé", "sí", "láti", "jẹ́", "àti", "fún",
           "kò", "gbogbo", "nítorí"},
    "ha": {"cikin", "wannan", "suka", "amma", "saboda", "kuma", "domin",
           "wata", "wani", "zai", "tana", "yana"},
    "zu": {"futhi", "kanye", "ukuthi", "ngoba", "noma", "kodwa",
           "ukuze", "lapho", "bonke", "ngakho", "kufanele", "phakathi"},
    "mi": {"ngā", "kua", "tēnei", "ēnei", "rātou", "mātou", "tātou",
           "koutou", "hoki", "anō", "kāore", "engari"},
    "ku": {"û", "ji", "bi", "ku", "ew", "xwe", "wek", "hemû", "divê",
           "hev", "lê", "jî"},
    # breadth batch 6 (late r5): the HARD sibling triplet — each new
    # language is a notoriously close pair with an existing label
    # (ms/id, fy/nl-af, oc/ca-es), so every stopword here is exclusive
    # (ms omits the ~90% of function words shared with Indonesian —
    # yang/dengan/untuk/dari; fy omits yn (Welsh) and all Dutch-shared
    # forms; oc omits amb/aquesta (Catalan) and los (Spanish))
    # (second curation pass, review finding: the first cut used words
    # that are ordinary vocabulary in the sibling — boleh/pula/amat/
    # semalam/pantas/ialah are standard Indonesian, wurde is the German
    # past of werden, dins/mas/coma/perque are common Catalan/
    # Portuguese/Galician — real sibling text was flipping.  Every form
    # below is checked absent from the sibling's everyday register,
    # not just its stopword table.)
    "ms": {"kerana", "iaitu", "sahaja", "hendaklah", "selepas",
           "bercakap", "awak", "sebarang", "samarata", "kelmarin"},
    # wurde/wurdt are excluded from the fy TRAINING text entirely (the
    # wur/urd trigrams are the German past of werden — real German was
    # flipping to fy); wurdt survives only as a sibling MARKER, which
    # does not train the model
    "fy": {"fan", "mei", "tsjin", "foar", "jimme", "hja", "oan",
           "dizze", "hawwe", "wêze", "harren", "inoar", "sille"},
    "oc": {"aquò", "tanben", "aital", "dempuèi", "çò", "totjorn",
           "pasmens", "èsser", "quicòm", "amassa"},
}

_THRESHOLD = 0.5  # fastText confidence threshold, lang_fasttext.cc:21

# Unicode script-range evidence for non-Latin languages (CLD2 covers these
# via script detection, cld2 public tables; this is the zero-dependency
# stand-in).  Each (start, end_inclusive, class); 'han'/'kana' combine into
# zh/ja below.  Fires only when the stopword tables produced no evidence,
# so Latin-script classification (and its SQL oracle twin) is unchanged.
_SCRIPT_RANGES = (
    (0x0370, 0x03FF, "el"),   # Greek
    (0x0400, 0x04FF, "cyr"),  # Cyrillic (ru/uk/bg resolved below)
    (0x0530, 0x058F, "hy"),   # Armenian
    (0x0590, 0x05FF, "he"),   # Hebrew
    (0x0600, 0x06FF, "arab"),  # Arabic script (ar/fa/ur resolved below)
    (0x0750, 0x077F, "arab"),  # Arabic Supplement
    (0x0780, 0x07BF, "dv"),   # Thaana (Divehi)
    (0x0900, 0x097F, "dev"),  # Devanagari (hi/mr resolved below)
    (0x0980, 0x09FF, "bn"),   # Bengali
    (0x0A00, 0x0A7F, "pa"),   # Gurmukhi
    (0x0A80, 0x0AFF, "gu"),   # Gujarati
    (0x0B00, 0x0B7F, "or"),   # Odia
    (0x0B80, 0x0BFF, "ta"),   # Tamil
    (0x0C00, 0x0C7F, "te"),   # Telugu
    (0x0C80, 0x0CFF, "kn"),   # Kannada
    (0x0D00, 0x0D7F, "ml"),   # Malayalam
    (0x0D80, 0x0DFF, "si"),   # Sinhala
    (0x0E00, 0x0E7F, "th"),   # Thai
    (0x0E80, 0x0EFF, "lo"),   # Lao
    (0x0F00, 0x0FFF, "bo"),   # Tibetan
    (0x1000, 0x109F, "my"),   # Myanmar
    (0x10A0, 0x10FF, "ka"),   # Georgian
    (0x1100, 0x11FF, "ko"),   # Hangul Jamo
    (0x1200, 0x137F, "am"),   # Ethiopic (Amharic et al.)
    (0x13A0, 0x13FF, "chr"),  # Cherokee syllabary
    (0x1400, 0x167F, "iu"),   # Unified Canadian Aboriginal Syllabics
    (0x1780, 0x17FF, "km"),   # Khmer
    (0x3040, 0x309F, "kana"),  # Hiragana
    (0x30A0, 0x30FF, "kana"),  # Katakana
    (0x3400, 0x4DBF, "han"),  # CJK Ext A
    (0x4E00, 0x9FFF, "han"),  # CJK Unified
    (0xAC00, 0xD7AF, "ko"),   # Hangul syllables
)

# minimum script-evidence characters before a label is emitted (CLD2-style
# reliability floor on very short non-Latin runs)
_MIN_SCRIPT_EVIDENCE = 4

# same-script discriminators (CLD2's quadgram breadth direction,
# lang_cld2.cc:11-16, as zero-dependency letter evidence): letters that are
# frequent in one sibling language and absent (or vanishingly rare) in the
# others.  Counted over the lower-cased text; first-listed language wins
# ties; no marker at all falls back to the family default.  The rule is a
# single CASE expression, so the SQL oracle twin is definitionally
# identical (plans/benchqueries._langid_script_oracle).
_CYRILLIC_MARKERS = (
    # NB: order is the tie-break (first-listed wins).  і is shared by uk
    # and be: pure-be text adds ў so be outranks uk; pure-uk text adds
    # ї/є so uk outranks be — uk listed first keeps the tie when only і
    # appears.  Serbian and Macedonian share ј/љ/њ/џ; the split letters
    # are ђ/ћ (sr) vs ѓ/ќ/ѕ (mk), counted on top of the shared set.
    ("uk", "іїєґ"),       # Ukrainian letters (і shared with be/kk)
    ("be", "іў"),         # Belarusian: ў is unique, і shared with uk
    ("kk", "әғқңөұүһі"),  # Kazakh consonants/vowels (+ shared і)
    ("sr", "ђћјљњџ"),     # Serbian Cyrillic (ј љ њ џ shared with mk)
    ("mk", "ѓќѕјљњџ"),    # Macedonian (ѓ ќ ѕ unique)
    ("ru", "ыэё"),        # Russian letters absent from uk/bg
    ("bg", "ъ"),          # ~3% of Bulgarian text, ~0.02% of Russian
)
_DEVANAGARI_MARKERS = (
    ("mr", "ळ"),      # retroflex LLA: frequent in Marathi, absent in Hindi
)
_ARABIC_MARKERS = (
    # ps/ug listed before fa: both borrow Persian پ/چ/ژ/گ, but their own
    # letters (Pashto retroflexes; Uyghur vowel letters, written in every
    # syllable) dominate native text, while fa text carries none of them
    ("ur", "ٹڈڑںےہ"),   # Urdu-only letters (retroflexes, bari ye, gol he)
    ("ps", "ځڅښږګڼۍ"),  # Pashto-only letters (incl. ګ U+06AB, not گ)
    ("ug", "ۇۆۈېۋە"),   # Uyghur vowel letters (U+06C6-06D0 range + ە)
    ("fa", "پچژگ"),     # Persian-only letters (pe, che, zhe, gaf)
)


def _marker_lang(lowered: str, markers, default: str) -> str:
    best_lang, best = default, 0
    for lang, chars in markers:
        c = sum(lowered.count(ch) for ch in chars)
        if c > best:  # strict: earlier-listed language keeps ties
            best_lang, best = lang, c
    return best_lang


def _script_scores(text: str) -> dict[str, int]:
    counts: dict[str, int] = {}
    for ch in text:
        cp = ord(ch)
        if cp < 0x0370:  # fast path: ASCII/Latin-1/Latin Extended
            continue
        for start, end, cls in _SCRIPT_RANGES:
            if start <= cp <= end:
                counts[cls] = counts.get(cls, 0) + 1
                break
    if not counts:
        return counts
    han = counts.pop("han", 0)
    kana = counts.pop("kana", 0)
    # Han + any kana => Japanese; Han alone => Chinese (CLD2's effective
    # rule for unhinted text)
    if kana:
        counts["ja"] = counts.get("ja", 0) + kana + han
    elif han:
        counts["zh"] = counts.get("zh", 0) + han
    # same-script families: the whole family count goes to the marker
    # winner (family default when no marker letter appears)
    cyr = counts.pop("cyr", 0)
    if cyr:
        lang = _marker_lang(text.lower(), _CYRILLIC_MARKERS, "ru")
        counts[lang] = counts.get(lang, 0) + cyr
    dev = counts.pop("dev", 0)
    if dev:
        lang = _marker_lang(text.lower(), _DEVANAGARI_MARKERS, "hi")
        counts[lang] = counts.get(lang, 0) + dev
    arab = counts.pop("arab", 0)
    if arab:
        lang = _marker_lang(text.lower(), _ARABIC_MARKERS, "ar")
        counts[lang] = counts.get(lang, 0) + arab
    return counts


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
    # identical semantics two ways, picked by document length: short
    # docs take one interpreted pass over the tokens with the combined
    # word->langs table; long docs build a C-level Counter of the tokens
    # once and then probe only the ~600 stopword table entries — on a
    # 17 KB page that turns ~3k interpreted iterations into one C pass
    # + a fixed-size loop (the langid share of extract_bigdoc)
    hits: dict[str, int] = {}
    wl = _WORD_LANGS
    if len(tokens) < 512:
        for t in tokens:
            langs = wl.get(t)
            if langs:
                for lang in langs:
                    hits[lang] = hits.get(lang, 0) + 1
        return hits
    from collections import Counter
    counts = Counter(tokens)
    get = counts.get
    for w, langs in wl.items():
        c = get(w)
        if c:
            for lang in langs:
                hits[lang] = hits.get(lang, 0) + c
    return hits


def classify(text: str) -> tuple[str, float]:
    """Top-1 (label, confidence); ('unk', 0.0) when no evidence.

    Confidence is margin-based — top / (top + runner-up) — so shared
    function words across related languages don't sink a clear winner.
    Stopword evidence (Latin-script languages) is tried first; when it is
    empty, Unicode script ranges classify zh/ja/ko/ru/ar/hi/el/he/th.
    """
    hits = _hits(_tokenize(text))
    if not hits:
        hits = _script_scores(text)
        if not hits or max(hits.values()) < _MIN_SCRIPT_EVIDENCE:
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
    the text is tiled into ResultChunk-shaped byte ranges (offset, n_bytes,
    lang) over its UTF-8 encoding, the top <=3 languages are ranked by
    assigned bytes (CLD2's percents), and each language's output is the
    concatenation of its byte slices in text order (the reference's
    ``ref->append(text, chunk.offset, chunk.bytes)``, lang_cld2.cc:60-66);
    empty chunks are erased (lang_cld2.cc:70-73); unreliable (no confident
    chunk at all) => whole text under unk (lang_cld2.cc:35-38).

    Chunk boundaries here are newline positions (the deterministic stand-in
    for CLD2's internal segmentation); boundaries always fall on ASCII
    bytes, so every slice is valid UTF-8.
    """

    def detect_chunks(self, text: str) -> list[tuple[int, int, str]]:
        """ResultChunk-shaped (offset, n_bytes, lang) list tiling the UTF-8
        encoding of ``text``: offsets are contiguous from 0 and n_bytes sum
        to the encoded length (property-tested invariants)."""
        data = text.encode("utf-8")
        chunks: list[tuple[int, int, str]] = []
        start = 0
        n = len(data)
        while start < n:
            nl = data.find(b"\n", start)
            end = n if nl < 0 else nl + 1
            seg = data[start:end]
            lang, prob = classify(seg.decode("utf-8"))
            chunks.append((start, end - start,
                           lang if prob >= _THRESHOLD else UNKNOWN_LANG))
            start = end
        return chunks

    def detect(self, text: str) -> dict[str, str]:
        return _assemble_multilang(text, self.detect_chunks(text))


def _assemble_multilang(text: str,
                        chunks: list[tuple[int, int, str]]) -> dict[str, str]:
    """CLD2 reassembly shared by both multilang detectors: top <=3
    languages by assigned bytes, each language's output the concatenation
    of its byte slices in text order (lang_cld2.cc:60-66), empty chunks
    erased (:70-73), no confident chunk at all => whole text under unk
    (:35-38)."""
    data = text.encode("utf-8")
    by_bytes: dict[str, int] = {}
    for _, nbytes, lang in chunks:
        if lang != UNKNOWN_LANG:
            by_bytes[lang] = by_bytes.get(lang, 0) + nbytes
    if not by_bytes:
        return {UNKNOWN_LANG: text}
    top = sorted(by_bytes, key=lambda k: (-by_bytes[k], k))[:3]
    out: dict[str, str] = {}
    for off, nbytes, lang in chunks:
        if lang in top and nbytes:
            out[lang] = out.get(lang, "") \
                + data[off:off + nbytes].decode("utf-8")
    return {k: v for k, v in out.items() if v}


class ModelMultiDetector:
    """Multilang detection scored by the TRAINED trigram model (r6,
    VERDICT r5 item 7): the same CLD2 ResultChunk shape and reassembly
    as :class:`HeuristicMultiDetector`, but chunk labels come from model
    evidence in two passes —

    1. each newline-tiled segment is scored by :func:`classify_model`
       (trained trigram tables; script fallback inside);
    2. segments the model finds UNRELIABLE on their own (too short,
       mixed, low margin) are re-scored over a window of their
       neighboring segments (previous + self + next) — CLD2's effective
       behavior of letting surrounding evidence carry weak spans — and
       take the windowed label when that window is reliable, else unk;

    then adjacent same-label ranges MERGE into single ResultChunks, so
    chunk boundaries reflect actual language changes rather than the
    newline tiling (the <=3-langs byte-ranked contract is unchanged,
    lang_cld2.cc:20-75)."""

    def detect_chunks(self, text: str) -> list[tuple[int, int, str]]:
        """Merged (offset, n_bytes, lang) ranges tiling the UTF-8
        encoding: offsets contiguous from 0, n_bytes sum to the encoded
        length, adjacent ranges never share a label (property-tested
        invariants)."""
        data = text.encode("utf-8")
        segs: list[tuple[int, int, str]] = []
        start = 0
        n = len(data)
        while start < n:
            nl = data.find(b"\n", start)
            end = n if nl < 0 else nl + 1
            segs.append((start, end - start,
                         data[start:end].decode("utf-8")))
            start = end
        labs: list[str | None] = []
        for _off, _nb, seg in segs:
            lang, _c, rel = classify_model(seg)
            labs.append(lang if rel else None)
        for i, lab in enumerate(labs):
            if lab is None:
                window = "".join(
                    s for _o, _b, s in segs[max(0, i - 1):i + 2])
                lang, _c, rel = classify_model(window)
                labs[i] = lang if rel else UNKNOWN_LANG
        merged: list[tuple[int, int, str]] = []
        for (off, nb, _seg), lab in zip(segs, labs):
            if merged and merged[-1][2] == lab:
                poff, pnb, plab = merged[-1]
                merged[-1] = (poff, pnb + nb, plab)
            else:
                merged.append((off, nb, lab))
        return merged

    def detect(self, text: str) -> dict[str, str]:
        return _assemble_multilang(text, self.detect_chunks(text))


# --- trained character-trigram model (VERDICT r4 item 4) -----------------
# Tables generated offline by tools/gen_langid_model.py from per-language
# seed text (UDHR-article-1 phrasing + everyday sentences + the stopword
# head); pure-Python inference, no wheels.  CLD2-style reliability: a
# label is reliable only with a clear margin AND enough per-trigram
# evidence (lang_cld2.cc:11-16 reliable-flag shape; threshold shape
# lang_fasttext.cc:21-27).

_MODEL_RELIABLE_MARGIN = 0.52
_MODEL_MIN_EVIDENCE = 0.25  # mean log-odds per trigram under the top lang

# sibling-pair discriminators (CLD2's same-script refinement direction):
# when the model's top two languages are a known close pair, decisive
# orthographic markers — letters one sibling's inventory has and the
# other lacks, or standard orthographic splits (da 'af'/'gik' vs no
# 'av'/'gikk'; Estonian õ, absent from Finnish; Czech ř/ě/ů vs Slovak
# ľ/ĺ/ŕ/ô) — override the raw trigram margin.  Chosen from letter
# inventories, not tuned on any fixture.
_MODEL_SIBLINGS = {
    frozenset({"cs", "sk"}): {"cs": (set("řěů"), set()),
                              "sk": (set("ľĺŕô"), set())},
    frozenset({"da", "no"}): {"da": (set(), {"af", "gik", "ud", "nogle"}),
                              "no": (set(), {"av", "gikk", "ut", "noen"})},
    # NB every word marker must be EXCLUSIVE to its side: 'ei' (negation)
    # is core vocabulary in BOTH Estonian and Finnish and must not appear
    # here (code-review r5 finding); fi side uses words whose Estonian
    # equivalents differ (hän/tema, myös/ka, mutta/aga, että/et)
    frozenset({"et", "fi"}): {"et": (set("õ"), {"ning", "aga"}),
                              "fi": (set(), {"hän", "myös", "mutta",
                                             "että"})},
    # Irish marks long vowels with ACUTE accents, Scottish Gaelic with
    # GRAVE — a clean orthographic split between the two Gaelics
    frozenset({"ga", "gd"}): {"ga": (set("áéíóú"), set()),
                              "gd": (set("àèìòù"), set())},
    # Philippine pair (batch 5): the and/not/this function words split
    # cleanly — Cebuano ug/dili/kini vs Tagalog at/hindi/ito; every
    # word is exclusive to its side (ang/mga/sa/na are shared and
    # excluded)
    frozenset({"ceb", "tl"}): {
        "ceb": (set(), {"ug", "dili", "kini", "karon", "gikan",
                        "bahin"}),
        "tl": (set(), {"at", "hindi", "ito", "ngayon", "ng", "mula"})},
    # Swahili/Hausa (batch 5): short-text trigram profiles overlap;
    # in/but/about and together/and split exclusively
    frozenset({"sw", "ha"}): {
        "sw": (set(), {"katika", "kwamba", "lakini", "kuhusu",
                       "pamoja", "kwenda"}),
        "ha": (set(), {"cikin", "amma", "kuma", "wannan", "suka",
                       "tare", "game"})},
    # batch 6 — the hard pairs.  Malay/Indonesian share ~90% of
    # function words; the because/can words split by standardized
    # orthography (kerana/karena, boleh/bisa) and ialah/iaitu are
    # Malay-only copulas
    frozenset({"ms", "id"}): {
        "ms": (set(), {"kerana", "iaitu", "sahaja", "selepas",
                       "hendaklah", "bercakap", "kelmarin"}),
        # adalah/saja/setelah are standard Malay too and must not be
        # id markers (same shared-vocabulary rule as 'ei')
        "id": (set(), {"karena", "bisa", "yaitu", "bagaimana",
                       "berbicara", "kemarin"})},
    # Frisian vs Dutch/Afrikaans: of/with/in/for differ root-deep
    # (fan/van, mei/met, foar/voor-vir, oan/aan)
    # 'wurde' is the German past of werden and 'mei' the Dutch month —
    # fy sides use wurdt/inoar instead (review finding)
    frozenset({"fy", "nl"}): {
        "fy": (set(), {"fan", "foar", "oan", "hja", "wurdt", "dizze",
                       "inoar"}),
        "nl": (set(), {"van", "met", "voor", "aan", "zij", "worden",
                       "deze"})},
    frozenset({"fy", "af"}): {
        "fy": (set(), {"fan", "foar", "oan", "hja", "wurdt", "dizze",
                       "inoar"}),
        "af": (set(), {"van", "met", "vir", "aan", "hulle", "word",
                       "hierdie"})},
    # Frisian is trigram-close to German too (both West Germanic, and
    # genuine Frisian 'wurde' is the German past of werden) — de-side
    # markers are absent from Frisian (fy: en/is/net/ek/mar)
    frozenset({"fy", "de"}): {
        "fy": (set(), {"fan", "foar", "oan", "hja", "wurdt", "dizze",
                       "inoar"}),
        "de": (set(), {"und", "ist", "nicht", "auch", "aber", "wird",
                       "eine"})},
    # Occitan vs Catalan/Spanish: demonstratives and adverbs split
    # (aquò/això/esto, tanben/també/también, mas/però/pero)
    # 'mas' is a Catalan noun (farmhouse) and the Portuguese 'but';
    # 'fins'/'sempre' are valid Occitan — dropped from both sides
    frozenset({"oc", "ca"}): {
        "oc": (set(), {"aquò", "tanben", "aital", "çò", "totjorn",
                       "dempuèi", "pasmens"}),
        "ca": (set(), {"això", "també", "però", "doncs", "des",
                       "aquests"})},
    frozenset({"oc", "es"}): {
        "oc": (set(), {"aquò", "tanben", "aital", "çò", "totjorn",
                       "dempuèi", "pasmens"}),
        "es": (set(), {"esto", "también", "pero", "pues", "hasta",
                       "desde"})},
    # --- non-Latin sibling pairs (r6: markers demoted to tie-breakers
    # behind the trained per-script trigram tables).  Letter-inventory
    # splits, chosen from the alphabets, not tuned on fixtures:
    # ru ы/э/ё vs uk і/ї/є/ґ; uk ї/є/ґ vs be ў (і is SHARED uk/be and
    # must not be a marker — the 'ei' rule); ru и/щ/ъ vs be ў/і (be
    # writes і for и and ' for ъ); bg ъ is ~3% of text vs ~0.02% in ru;
    # sr ђ/ћ vs mk ѓ/ќ/ѕ (ј/љ/њ/џ shared).
    # full pair matrix over the six Slavic Cyrillic orthographies: each
    # side lists letters the OTHER side's alphabet lacks (sr/mk dropped
    # й щ ъ ь э ю я ё ы for ј-series letters; be replaced и with і and
    # щ/ъ with шч/'; uk dropped ы э ё ъ for і ї є ґ; bg dropped ы э ё).
    frozenset({"ru", "uk"}): {"ru": (set("ыэёъ"), set()),
                              "uk": (set("іїєґ"), set())},
    frozenset({"ru", "bg"}): {"ru": (set("ыэё"), {"это", "что"}),
                              "bg": (set("ъ"), {"това", "които"})},
    frozenset({"ru", "be"}): {"ru": (set("ищъ"), set()),
                              "be": (set("ўі"), set())},
    frozenset({"ru", "sr"}): {"ru": (set("йыьэюяёщъ"), set()),
                              "sr": (set("ђћјљњџ"), set())},
    frozenset({"ru", "mk"}): {"ru": (set("йыьэюяёщъ"), set()),
                              "mk": (set("ѓќѕјљњџ"), set())},
    frozenset({"uk", "be"}): {"uk": (set("їєґ"), set()),
                              "be": (set("ўы"), set())},
    frozenset({"uk", "bg"}): {"uk": (set("іїєґ"), set()),
                              "bg": (set("ъ"), {"това", "които", "със"})},
    frozenset({"uk", "sr"}): {"uk": (set("іїєґйьюя"), set()),
                              "sr": (set("ђћјљњџ"), set())},
    frozenset({"uk", "mk"}): {"uk": (set("іїєґйьюя"), set()),
                              "mk": (set("ѓќѕјљњџ"), set())},
    frozenset({"be", "bg"}): {"be": (set("ўіэы"), set()),
                              "bg": (set("ъщи"), set())},
    frozenset({"be", "sr"}): {"be": (set("ўіыэёй"), set()),
                              "sr": (set("ђћјљњџ"), set())},
    frozenset({"be", "mk"}): {"be": (set("ўіыэёй"), set()),
                              "mk": (set("ѓќѕјљњџ"), set())},
    frozenset({"bg", "sr"}): {"bg": (set("йщъюя"), set()),
                              "sr": (set("ђћјљњџ"), set())},
    frozenset({"bg", "mk"}): {"bg": (set("йщъюя"), {"това", "които"}),
                              "mk": (set("ѓќѕјљњџ"),
                                     {"во", "со", "нив", "многу"})},
    frozenset({"sr", "mk"}): {"sr": (set("ђћ"), set()),
                              "mk": (set("ѓќѕ"), set())},
    # Arabic script: Arabic yeh ي U+064A / kaf ك U+0643 vs the Persian
    # forms ی U+06CC / ک U+06A9 every fa/ur word uses; fa پ/چ/ژ/گ; ur
    # retroflexes + bari ye + gol he; ps retroflex series; ug vowel
    # letters.  که (fa, with ه) vs کہ (ur, with ہ) are distinct strings.
    frozenset({"ar", "fa"}): {"ar": (set("يكة"), set()),
                              "fa": (set("یکپچژگ"), set())},
    frozenset({"ar", "ur"}): {"ar": (set("يكة"), set()),
                              "ur": (set("ٹڈڑںےہ"), set())},
    frozenset({"fa", "ur"}): {"fa": (set(), {"است", "های", "که"}),
                              "ur": (set("ٹڈڑںےہ"), set())},
    frozenset({"fa", "ps"}): {"fa": (set(), {"است", "این", "را"}),
                              "ps": (set("ځڅښږګڼۍ"), set())},
    frozenset({"ur", "ps"}): {"ur": (set("ے"), {"ہے", "کے"}),
                              "ps": (set("ځڅښږګڼۍ"), set())},
    # Devanagari: Marathi retroflex ळ (absent from standard Hindi);
    # copulas/conjunctions split root-deep (है/आहे, और/आणि, नहीं/नाही).
    # की is a complementizer in BOTH and must not be a marker.
    frozenset({"hi", "mr"}): {
        "hi": (set(), {"है", "हैं", "और", "था", "नहीं"}),
        "mr": (set("ळ"), {"आहे", "आहेत", "आणि", "होते", "नाही"})},
}
# refinement fires only on genuinely close calls: a decisive trigram
# margin must not be overridden by one stray foreign token (a quoted
# 'gikk' in a Danish page, an Estonian place name in Finnish text)
_MODEL_SIBLING_MAX_CONF = 0.60
# (calibrated on the held-out set: true-language sentences score
# 0.28-1.0+ per trigram with margins 0.54-0.80; random-letter gibberish
# lands at margin ~0.50 — the margin rule, not the evidence floor, is
# what rejects it, while the floor rejects low-coverage/mixed text)

def _is_model_char(ch: str) -> bool:
    """Letters, the apostrophe, and combining marks survive model
    normalization.  Combining marks matter for the non-Latin tables:
    Devanagari vowel signs (matras, category Mc) and the virama (Mn)
    are not ``isalpha()`` but carry most of the hi/mr signal — stripping
    them would shred every word into consonant fragments.  (NFC Latin
    text has no combining marks, so the Latin tables are unaffected.)"""
    if ch.isalpha() or ch == "'":
        return True
    cached = _MODEL_CHAR_CACHE.get(ch)
    if cached is None:
        import unicodedata
        cached = unicodedata.category(ch).startswith("M")
        _MODEL_CHAR_CACHE[ch] = cached
    return cached


_MODEL_CHAR_CACHE: dict[str, bool] = {}


def normalize_model(text: str) -> str:
    """Model text normalization: lower-case, every non-word character
    (see :func:`_is_model_char`) except the apostrophe becomes a space,
    runs collapse, single-space padding — shared verbatim by training
    (tools/gen_langid_model.py) and inference."""
    lowered = text.lower()
    cleaned = "".join(
        ch if _is_model_char(ch) else " " for ch in lowered)
    return " " + " ".join(cleaned.split()) + " "


def _tri_index():
    """{trigram: ((lang, weight), ...)} inverted index, built once."""
    global _TRI_INDEX
    if _TRI_INDEX is None:
        from ._langid_model import MODEL
        idx: dict[str, list[tuple[str, float]]] = {}
        for lang in sorted(MODEL):
            for tri, w in MODEL[lang].items():
                idx.setdefault(tri, []).append((lang, w))
        _TRI_INDEX = {t: tuple(ls) for t, ls in idx.items()}
    return _TRI_INDEX


_TRI_INDEX = None


def _model_family(cp: int) -> str | None:
    """Script family of a letter codepoint, for the model-coverage gate:
    'latin' (below Greek, same boundary as _script_scores' fast path,
    plus Latin Extended Additional — Vietnamese diacritics at
    0x1E00-0x1EFF), 'cyr', 'arab' (incl. presentation forms), 'dev',
    else None (family has no trained tables)."""
    if cp < 0x0370 or 0x1E00 <= cp <= 0x1EFF:
        return "latin"
    if 0x0400 <= cp <= 0x052F:
        return "cyr"
    if (0x0600 <= cp <= 0x06FF or 0x0750 <= cp <= 0x077F
            or 0xFB50 <= cp <= 0xFDFF or 0xFE70 <= cp <= 0xFEFF):
        return "arab"
    if 0x0900 <= cp <= 0x097F:
        return "dev"
    return None


def classify_model(text: str) -> tuple[str, float, bool]:
    """(label, confidence, reliable) from the trained trigram model.

    Scores are summed per-language trigram log-odds; confidence is the
    top-vs-runner-up margin (same rule as :func:`classify`); ``reliable``
    additionally requires mean evidence per trigram.  The model scores
    text whose letters predominantly belong to ONE model-covered script
    family — Latin, Cyrillic, Arabic script, or Devanagari (r6: the
    same-script sibling families ru/uk/bg/be/sr/mk/kk, ar/fa/ur/ps/ug
    and hi/mr are now model-scored, demoting the marker lists to
    tie-breakers): a mostly-CJK page, or one containing stray
    other-script brand/URL tokens, must NOT collect a spurious label
    from those tokens — it (and any text with no model evidence at all)
    falls back to the heuristic :func:`classify` path with reliability
    from its margin, so the model wraps, never degrades, the full label
    coverage."""
    from collections import Counter
    t = normalize_model(text)
    n_tris = len(t) - 2
    alpha = 0
    fam_counts: dict[str, int] = {}
    for ch in t:
        if ch != " " and ch != "'":
            alpha += 1
            fam = _model_family(ord(ch))
            if fam is not None:
                fam_counts[fam] = fam_counts.get(fam, 0) + 1
    dominant = max(fam_counts.values()) if fam_counts else 0
    if n_tris >= 1 and alpha and dominant * 2 >= alpha:
        counts = Counter(t[i:i + 3] for i in range(n_tris))
        idx = _tri_index()
        scores: dict[str, float] = {}
        for tri, c in counts.items():
            entry = idx.get(tri)
            if entry:
                for lang, w in entry:
                    scores[lang] = scores.get(lang, 0.0) + w * c
        if scores:
            ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
            top_lang, top = ranked[0]
            second = ranked[1][1] if len(ranked) > 1 else 0.0
            conf = top / (top + second) if top + second > 0 else 0.0
            reliable = (conf >= _MODEL_RELIABLE_MARGIN
                        and top / n_tris >= _MODEL_MIN_EVIDENCE)
            # sibling refinement: a decisive orthographic marker settles
            # a close same-script pair the trigram margin cannot — but
            # only on close calls (guard), and the reported confidence is
            # recomputed from the flipped winner's perspective
            if len(ranked) > 1 and conf < _MODEL_SIBLING_MAX_CONF:
                other_lang = ranked[1][0]
                sib = _MODEL_SIBLINGS.get(
                    frozenset((top_lang, other_lang)))
                if sib is not None:
                    toks = set(t.split())
                    hits = {
                        lang: sum(t.count(ch) for ch in chars)
                        + sum(1 for w in words if w in toks)
                        for lang, (chars, words) in sib.items()}
                    a, b = sorted(hits)
                    if hits[a] != hits[b]:
                        winner = a if hits[a] > hits[b] else b
                        loser = b if winner == a else a
                        if winner != top_lang:
                            other_lang, top_lang = top_lang, winner
                            # the flipped winner had the LOWER trigram
                            # score, so a score-ratio confidence would
                            # read < 0.5 on a reliable label; report the
                            # marker-hit margin instead (> 0.5 by
                            # construction: hits differ and winner leads)
                            conf = hits[winner] / (hits[winner]
                                                   + hits[loser])
                        # decisive marker = reliable, provided the winner
                        # still carries real trigram evidence
                        reliable = (scores[winner] / n_tris
                                    >= _MODEL_MIN_EVIDENCE)
            return top_lang, round(conf, 6), reliable
    lang, prob = classify(text)
    return lang, prob, prob >= _THRESHOLD and lang != UNKNOWN_LANG


class ModelDetector:
    """Single-language detection backed by the trained trigram model:
    whole text under the top label when reliable, else ``unk`` (CLD2
    reliable-flag semantics, lang_cld2.cc:11-16)."""

    def detect(self, text: str) -> dict[str, str]:
        lang, _conf, reliable = classify_model(text)
        if not reliable:
            return {UNKNOWN_LANG: text}
        return {lang: text}


DETECTORS = {
    "skip": SkipDetector,
    "heuristic": HeuristicDetector,
    "multilang": HeuristicMultiDetector,
    "model": ModelDetector,
    "multilang_model": ModelMultiDetector,
}


def get_detector(name: str):
    return DETECTORS[name]()
