"""Dependency-free PDF text extraction (functions/pdftext.py): the
ISO-32000 text-showing subset — string syntax, filters, operators — and
the total-function kernel contract."""

import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from warc2text_spark.functions.pdftext import (build_minimal_pdf,
                                               extract_pdf_text)


def test_roundtrip_plain_and_flate():
    lines = ["Hello doc 42", "second line with (parens) and \\ slash"]
    assert extract_pdf_text(build_minimal_pdf(lines)) \
        == "Hello doc 42\nsecond line with (parens) and \\ slash\n"
    assert extract_pdf_text(build_minimal_pdf(lines, flate=True)) \
        == extract_pdf_text(build_minimal_pdf(lines))


def test_string_syntax_and_operators():
    raw = (b"%PDF-1.4\n4 0 obj << /Length 1 >> stream\n"
           b"BT [(a) -120 (b)] TJ T* <48656c6c6f> Tj (line)' "
           b"(\\110\\151) Tj (esc\\)paren) Tj (nest(ed)) Tj ET "
           b"endstream\n%%EOF")
    # NB ' means "next line, THEN show": the shows after (line)' continue
    # on line's line until the next line operator
    assert extract_pdf_text(raw) == "ab\nHello\nlineHiesc)parennest(ed)\n"


def test_octal_escapes_and_continuation():
    raw = (b"%PDF-1.4\nstream\nBT (\\101\\102\\103) Tj (a\\\nb) Tj ET "
           b"endstream\n%%EOF")
    # octal ABC; backslash-newline joins the halves
    assert extract_pdf_text(raw) == "ABCab\n"


def test_non_pdf_and_malformed_inputs():
    assert extract_pdf_text(b"") == ""
    assert extract_pdf_text(b"GIF89a") == ""
    assert extract_pdf_text(b"%PDF-1.4 no streams here") == ""
    # corrupt flate body: stream skipped, no raise
    bad = (b"%PDF-1.4\n<< /Filter /FlateDecode /Length 5 >> stream\n"
           b"xxxxxendstream\n%%EOF")
    assert extract_pdf_text(bad) == ""
    good = build_minimal_pdf(["ok"])
    for cut in range(0, len(good), 37):
        out = extract_pdf_text(good[:cut])
        assert isinstance(out, str)


@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=255),
    max_size=30), min_size=1, max_size=4))
@settings(max_examples=200, deadline=None)
def test_generator_roundtrip_property(lines):
    """Any latin-1-ish text survives the generator -> extractor round
    trip (escaping of parens/backslash included)."""
    pdf = build_minimal_pdf(lines)
    got = extract_pdf_text(pdf)
    expected = [ln for ln in lines]
    # shows are joined with newlines (T* after each), empty shows vanish
    joined = "\n".join(expected)
    want = (joined.rstrip("\n") + "\n") if joined.strip() else ""
    # strings containing only whitespace may collapse per the newline
    # rule; assert content preservation on the non-degenerate case
    if all(ln.strip() for ln in lines):
        assert got == want


@given(st.binary(max_size=400))
@settings(max_examples=200, deadline=None)
def test_extract_pdf_text_never_raises(data):
    out = extract_pdf_text(b"%PDF-" + data)
    assert isinstance(out, str)
    assert extract_pdf_text(data) == "" or data.startswith(b"%PDF")
