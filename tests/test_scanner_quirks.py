"""Deep scanner-quirk tests — the fixed-buffer edge cases cited in
SURVEY.md §7 ("What's hard").  Each expectation is hand-derived from the
reference state machine (xh_scanner.cc) semantics.
"""

from warc2text_spark.functions import scanner as sc
from warc2text_spark.functions.textextract import process_html


def tokens(data: bytes, limit=200):
    s = sc.Scanner(data)
    out = []
    for _ in range(limit):
        t, v = s.next_token()
        out.append((t, v, s.tag_name))
        if t in (sc.TT_EOF, sc.TT_ERROR):
            break
    return out


def test_script_close_straddling_window_is_missed():
    # scan_special windows are 1023 bytes; a '</script>' whose '<' falls
    # just before the window end (within tag_len+3 bytes) is pushed back,
    # but one fully *straddling* without that guard is missed and the raw
    # scan continues to the NEXT close tag (xh_scanner.cc:286-317).
    # Construct: window holds exactly 1014 bytes then '</script>' begins;
    # guard: '<' at value_length 1014 -> 1014+6+3 >= 1024 -> pushed back,
    # so the close IS found at the next window. Use filler 1014.
    filler = b"x" * 1014
    doc = b"<p>a</p><script>" + filler + b"</script><p>b</p>"
    text, err = process_html(doc)
    assert err == sc.TT_EOF * 0  # SUCCESS
    assert text == b"a\nb\n"

    # '<' at 1013 (1013+6+3 = 1022 < 1024) is consumed and the close tag
    # still fits inside the window (ends at index 1021 <= 1022): the guard's
    # tag_len+3 margin makes a straddled well-formed close tag impossible —
    # that is precisely why the reference has it (xh_scanner.cc:291-295).
    # 'leaked' right after </script> is still suppressed (tag stays
    # 'script'), then <p>c and <p>d flow normally.
    filler2 = b"x" * 1013
    doc2 = (b"<p>a</p><script>" + filler2 + b"</script>leaked<p>c</p>"
            + b"</script><p>d</p>")
    text2, err2 = process_html(doc2)
    assert text2 == b"a\nc\nd\n"


def test_comment_end_straddling_window_is_missed():
    # scan_comment looks for '-->' inside one 1023-byte window
    # (xh_scanner.cc:257-277): straddle it and the comment swallows
    # content until a later '-->' fully inside a window.
    filler = b"c" * 1022  # '-->' starts at window byte 1022 -> straddles
    doc = b"<p>a</p><!--" + filler + b"--><p>gone</p> more -->" + b"<p>b</p>"
    text, err = process_html(doc)
    assert text == b"a\nb\n"


def test_entity_decl_detection_needs_clean_stale_byte():
    # '<!ENTITY' fires only when the persistent name buffer's 8th byte is
    # NUL (strncmp with length 8, xh_scanner.cc:194-199).  Fresh scanner:
    # byte 7 is zero -> fires.
    toks = tokens(b"<!ENTITY x 'y'><p>a</p>")
    assert toks[0][0] == sc.TT_ENTITY_START
    # after a tag name with >= 8 chars, the stale byte is non-zero ->
    # the check fails and '<!ENTITY...' parses as a normal tag start.
    toks2 = tokens(b"<longtagname></longtagname><!ENTITY x 'y'><p>a</p>")
    kinds2 = [t[0] for t in toks2]
    assert sc.TT_ENTITY_START not in kinds2
    # ...but a subsequent 7-byte tag name re-zeroes byte 7 via the driver's
    # get_tag_name NUL write, so the check fires again (history-sensitive)
    toks3 = tokens(b"<abcdefgh>x</abcdefgh><abcdefg>y</abcdefg><!ENTITY x 'y'>")
    assert sc.TT_ENTITY_START in [t[0] for t in toks3]


def test_short_tag_after_script_is_not_special():
    # The reference driver NUL-terminates the persistent name buffer on
    # every TAG_START/TAG_END (get_tag_name, xh_scanner.cc:24 via
    # html.cc:63), so a tag that is a prefix of a previous script/style
    # name can never stale-match strncmp(tag_name, "script", 6): '<s>'
    # right after '</script>' parses normally and its text is kept.
    text, err = process_html(b"<script>x</script><s>hidden</s> tail")
    assert text == b"hidden tail\n"
    text2, _ = process_html(b"<script>x</script><scrip>also</scrip> t")
    assert text2 == b"also t\n"
    # '<scriptx>' still raw-scans (strncmp compares only 6 bytes and the
    # name is 7 long, so the NUL at index 7 doesn't matter)
    text3, _ = process_html(b"<scriptx>gone</scriptx>kept")
    assert b"gone" not in text3 and b"kept" in text3
    # same rule for style's 5-byte compare
    text4, _ = process_html(b"<style>x</style><st>in</st> y")
    assert text4 == b"in y\n"


def test_attr_value_cap_1023():
    val = b"v" * 3000
    toks = tokens(b'<div class="' + val + b'">x</div>')
    attr = [t for t in toks if t[0] == sc.TT_ATTR][0]
    assert len(attr[1]) == 1023


def test_tag_name_cap_127():
    name = b"t" * 300
    toks = tokens(b"<" + name + b">word</" + name + b">")
    assert toks[0][0] == sc.TT_TAG_START
    assert len(toks[0][2]) == 127


def test_unquoted_attr_eof_is_error():
    toks = tokens(b"<a href=http://x")
    assert toks[-1][0] == sc.TT_ERROR or toks[-1][0] == sc.TT_EOF


def test_quoted_attr_eof_is_error():
    # EOF inside a quoted value: while(c) exits -> TT_ERROR
    toks = tokens(b'<a href="unterminated')
    assert toks[-1][0] == sc.TT_ERROR


def test_cdata_detection_at_length_8():
    toks = tokens(b"<![CDATA[ raw ]]><p>a</p>")
    assert toks[0][0] == sc.TT_CDATA_START
    kinds = [t[0] for t in toks]
    assert sc.TT_CDATA_END in kinds


def test_self_closing_within_head_after_attrs():
    toks = tokens(b'<img src="x"/>y')
    kinds = [t[0] for t in toks]
    assert kinds[0] == sc.TT_TAG_START
    assert sc.TT_ATTR in kinds
    assert sc.TT_TAG_END in kinds  # from the '/>' in scan_head


def test_pi_like_tag_parses_as_tag():
    # '<?xml version="1.0"?>' has no special handling: tag '?xml' with an
    # attr, then a '?' attribute from the trailing '?'
    toks = tokens(b'<?xml version="1.0"?><p>a</p>')
    assert toks[0][0] == sc.TT_TAG_START
    assert toks[0][2] == b"?xml"
