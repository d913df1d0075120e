"""Robustness: kernel functions never raise on arbitrary inputs (the
pipeline's contract is that all error paths become the err column)."""

import base64

from hypothesis import given, settings
from hypothesis import strategies as st

from warc2text_spark.functions.record import clean_payload
from warc2text_spark.functions.textextract import process_html, trim_lines_copy
from warc2text_spark.functions.transport import transport_decode
from warc2text_spark.operators.extract import ExtractOptions, _clean_one_doc


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=4096))
def test_process_html_never_raises(data):
    text, err = process_html(data)
    assert isinstance(text, bytes)
    assert err in (0, 1, 2)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048),
       st.sampled_from(["text/html", "text/plain", "image/png", "",
                        "application/xml", "application/vnd.oasis.opendocument.text"]),
       st.sampled_from(["", "utf-8", "latin-1", "bogus-charset"]))
def test_clean_payload_never_raises(data, ct, charset):
    text, err, cs = clean_payload(data, ct, charset, "http://x/y")
    assert isinstance(text, str)
    assert 0 <= err <= 7


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=1024),
       st.sampled_from(["", "chunked", "gzip2"]),
       st.sampled_from(["", "gzip", "br", "identity", "weird"]))
def test_transport_decode_never_raises(data, te, ce):
    out = transport_decode(data, te, ce)
    assert isinstance(out, bytes)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=300), st.text(max_size=50),
       st.booleans(), st.integers(min_value=-5, max_value=5))
def test_clean_one_doc_never_raises(text, url, as_media, offset):
    span = ({"kind": "media", "text": "",
             "media_ref": base64.b64encode(text.encode()).decode(),
             "offset": offset}
            if as_media else
            {"kind": "text", "text": text, "media_ref": "", "offset": offset})
    row = {"doc_id": "d", "url": url, "http_ct": "text/html",
           "content_enc": "", "transfer_enc": "", "spans": [span]}
    charset, err, plaintext, spans = _clean_one_doc(row, {}, ExtractOptions())
    assert isinstance(plaintext, str)


def test_clean_one_doc_null_fields():
    row = {"doc_id": None, "url": None, "http_ct": None, "content_enc": None,
           "transfer_enc": None,
           "spans": [{"kind": None, "text": None, "media_ref": None,
                      "offset": None}]}
    charset, err, plaintext, spans = _clean_one_doc(row, {}, ExtractOptions())
    assert isinstance(plaintext, str)


def test_invalid_base64_media_on_zip_path():
    row = {"doc_id": "d", "url": "http://x/a.docx", "http_ct": "",
           "content_enc": "", "transfer_enc": "",
           "spans": [{"kind": "media", "text": "", "media_ref": "!!!not-b64",
                      "offset": 0}]}
    from warc2text_spark.functions.record import ZIP_READ_ERROR
    charset, err, plaintext, spans = _clean_one_doc(row, {}, ExtractOptions())
    assert err == ZIP_READ_ERROR


@settings(max_examples=400, deadline=None)
@given(st.lists(st.one_of(
    st.sampled_from([b"<script>", b"</script>", b"<style>", b"</style>",
                     b"<!--", b"-->", b"<![CDATA[", b"]]>", b"<!ENTITY x 'y'>",
                     b"<p>", b"</p>", b"<a href=x>", b"<b c='d'>", b"<img/>",
                     b"&amp;", b"&#65;", b"&bogus", b" ", b"\x0b", b"\t\n",
                     b"<", b">", b"/", b'"', b"'", b"=", b"word"]),
    st.binary(max_size=24)), max_size=40))
def test_fused_equals_unfused_on_soup(pieces):
    # the fused fast paths (body segments, whole-head skip, window scans,
    # entity one-shot) must be output-identical to the reference-shaped
    # token loop on arbitrary tag/entity/binary soup
    data = b"".join(pieces)
    assert process_html(data, fused=True) == process_html(data, fused=False)
