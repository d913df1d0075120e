"""Record-level payload cleaning: the fused scalar pipeline for one payload.

Reference: /root/reference/src/record.cc:192-289.  This is the function the
extraction kernel applies to every text span (and to zip-extractable media
spans) of a document.

Pipeline (record.cc:215-289):

1. content-type cleanup + charset param (:192-208);
2. non-text MIME and not a zipped doc format -> NOT_VALID_RECORD (:217-226);
3. zipped doc formats: payload replaced by matching zip members (:228-229);
4. charset detection, detected wins over declared (:231-238);
5. text/plain: convert -> trimLines -> ctrl chars to spaces (:257-267);
   HTML: tokenize+assemble (html.cc:44-87) -> convert -> entity decode
   (:269-287).

Divergence (documented): for non-UTF-8 HTML the reference assigns the
*converted* text to ``payload`` but entity-decodes the *unconverted* bytes
into ``plaintext`` (record.cc:272-287) — i.e. its plaintext keeps the
original encoding, which its own JSON output layer then mangles.  Here the
converted text is entity-decoded instead; conversion failures still yield
UTF8_CONVERSION_ERROR with reference semantics.  Fixtures pin the shared
paths (UTF-8 HTML, declared-charset text/plain).
"""

from __future__ import annotations

from . import charset as cs
from . import textextract as tx
from . import ziputil

# record.cc:17
TEXT_CONTENT_TYPES = frozenset({
    "text/plain", "text/html", "application/xml", "text/vnd.wap.wml",
    "application/atom+xml", "application/opensearchdescription+xml",
    "application/rss+xml", "application/xhtml+xml",
})

# util.hh:34-41 codes re-exported plus kernel-exception codes: the reference
# drops records on escaped exceptions before the error-code dispatch
# (warcpreprocessor.cc:180-185); we track them as distinct codes.
SUCCESS = tx.SUCCESS
HTML_PARSING_ERROR = tx.HTML_PARSING_ERROR
FILTERED_DOCUMENT_ERROR = tx.FILTERED_DOCUMENT_ERROR
UNKNOWN_ENCODING_ERROR = tx.UNKNOWN_ENCODING_ERROR
UTF8_CONVERSION_ERROR = tx.UTF8_CONVERSION_ERROR
NOT_VALID_RECORD = tx.NOT_VALID_RECORD
ZIP_READ_ERROR = 6           # util::ZipReadError -> drop (warcpreprocessor.cc:182)
NUMERIC_RANGE_ERROR = 7      # std::out_of_range from entity stoul -> drop (:180)

ERROR_NAMES = {
    SUCCESS: "SUCCESS",
    HTML_PARSING_ERROR: "HTML_PARSING_ERROR",
    FILTERED_DOCUMENT_ERROR: "FILTERED_DOCUMENT_ERROR",
    UNKNOWN_ENCODING_ERROR: "UNKNOWN_ENCODING_ERROR",
    UTF8_CONVERSION_ERROR: "UTF8_CONVERSION_ERROR",
    NOT_VALID_RECORD: "NOT_VALID_RECORD",
    ZIP_READ_ERROR: "ZIP_READ_ERROR",
    NUMERIC_RANGE_ERROR: "NUMERIC_RANGE_ERROR",
}


def clean_content_type(http_ct: str) -> tuple[str, str]:
    """record.cc:192-208 -> (clean content type, declared charset)."""
    http_ct = http_ct or ""
    delim = http_ct.find(";")
    charset = ""
    if delim < 0:
        clean = http_ct.lower()
    else:
        clean = http_ct[:delim].lower()
        cpos = http_ct.find("charset=")
        if cpos >= 0:
            end = http_ct.find(";", cpos + 8)
            charset = http_ct[cpos + 8: end if end >= 0 else len(http_ct)].strip()
    return clean.strip(), charset


def is_text_format(clean_http_ct: str) -> bool:
    """record.cc:359-361."""
    return clean_http_ct in TEXT_CONTENT_TYPES


def clean_payload(
    payload: bytes,
    clean_http_ct: str,
    declared_charset: str,
    url: str,
    tag_filters=None,
    skip_extraction: bool = False,
    charset_detector=cs.default_detect,
    encoding_errors: str = "replace",
) -> tuple[str, int, str]:
    """Extract plain text from one payload; returns (text, err, charset).

    ``text`` is the extracted plaintext ('' when err != SUCCESS/FILTERED);
    for ``skip_extraction`` it is the (possibly converted) raw payload.
    Exceptions never escape — exception-coded errors come back as err codes.

    ``encoding_errors`` governs payloads whose charset is in the no-convert
    set (utf8/utf-8/ascii, record.cc:240) but whose bytes are NOT valid
    UTF-8 — the case the reference surfaces at JSON serialization time
    (--encoding-errors, warc2text_main.cc:164-174): 'ignore' drops the bad
    bytes, 'replace' (the reference default) substitutes U+FFFD, 'strict'
    (CLI 'discard') discards the record exactly like nlohmann error 316
    (warcpreprocessor.cc:237-246).  Delta vs the reference: we drop at the
    kernel, so a discarded record is also excluded from the text/lang
    counters, whereas the reference counts it before the writer throws.
    """
    non_text = bool(clean_http_ct) and clean_http_ct not in TEXT_CONTENT_TYPES
    zip_ct = ziputil.zip_content_type(clean_http_ct, url)

    if non_text and not zip_ct:
        return "", NOT_VALID_RECORD, ""

    if zip_ct:
        try:
            payload = ziputil.read_zip_payload(zip_ct, payload)
        except ziputil.ZipReadError:
            return "", ZIP_READ_ERROR, ""

    charset = cs.detect_charset(payload, declared_charset, charset_detector)
    if charset is None:
        return "", UNKNOWN_ENCODING_ERROR, ""

    need_convert = cs.needs_conversion(charset)
    is_plain = clean_http_ct == "text/plain"

    if skip_extraction:
        if need_convert:
            try:
                return cs.to_utf8(payload, charset), SUCCESS, charset
            except (UnicodeDecodeError, LookupError):
                return "", UTF8_CONVERSION_ERROR, charset
        try:
            return payload.decode("utf-8", errors=encoding_errors), \
                SUCCESS, charset
        except UnicodeDecodeError:  # encoding_errors == "strict": error 316
            return "", UTF8_CONVERSION_ERROR, charset

    if is_plain:
        if need_convert:
            try:
                text = cs.to_utf8(payload, charset)
            except (UnicodeDecodeError, LookupError):
                return "", UTF8_CONVERSION_ERROR, charset
            payload = text.encode("utf-8")
        extracted = tx.replace_ctrl(tx.trim_lines_copy(payload))
        try:
            return extracted.decode("utf-8", errors=encoding_errors), \
                SUCCESS, charset
        except UnicodeDecodeError:
            return "", UTF8_CONVERSION_ERROR, charset

    extracted, retval = tx.process_html(payload, tag_filters)
    if need_convert:
        try:
            text = cs.to_utf8(extracted, charset)
        except (UnicodeDecodeError, LookupError):
            return "", UTF8_CONVERSION_ERROR, charset
    else:
        try:
            text = extracted.decode("utf-8", errors=encoding_errors)
        except UnicodeDecodeError:
            return "", UTF8_CONVERSION_ERROR, charset

    from .entities import EntityOverflowError, decode_entities
    try:
        plaintext = decode_entities(text)
    except EntityOverflowError:
        return "", NUMERIC_RANGE_ERROR, charset
    return plaintext, retval, charset
