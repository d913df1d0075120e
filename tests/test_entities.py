"""Entity decoder contract tests (reference: src/entities.cc)."""

import pytest

from warc2text_spark.functions.entities import (
    EntityOverflowError,
    NAMED_ENTITIES,
    decode_entities,
    find_entity_end,
)


def test_table_size_matches_reference():
    # entities.cc:143-2172 has 2,029 entries
    assert len(NAMED_ENTITIES) == 2029


@pytest.mark.parametrize("name,value", [
    ("amp", "&"), ("AMP", ""), ("semi", ""), ("nbsp", " "), ("shy", ""),
    ("ensp", " "), ("emsp", " "), ("thinsp", " "), ("MediumSpace", " "),
    ("ZeroWidthSpace", ""), ("lt", "<"), ("gt", ">"), ("quot", '"'),
    ("eacute", "é"), ("ohm", "Ω"), ("angst", "Å"),
])
def test_table_quirks(name, value):
    # entities.cc:151,162,186,204,606-669,616
    assert NAMED_ENTITIES[name] == value


def test_named_decode_and_unknown_elided():
    assert decode_entities("a&amp;b &AMP;c &nbsp;d") == "a&b c  d"
    assert decode_entities("x &bogus; y") == "x  y"  # unknown -> elided
    assert decode_entities("x &unterminated y") == "x &unterminated y"


def test_x_initial_names_take_hex_grammar():
    # entities.cc:28-31: a leading x/X after '&' sets hex mode even
    # without '#', so these never resolve as named entities.
    assert decode_entities("a&xi;b") == "a&xi;b"        # 'i' not xdigit
    assert decode_entities("a&Xi;b") == "a&Xi;b"
    assert decode_entities("a&xcup;b") == "a&xcup;b"    # 'u' stops hex run
    assert decode_entities("a&xrarr;b") == "a&xrarr;b"
    assert decode_entities("a&xyz;b") == "a&xyz;b"      # 'y' stops hex run
    # pure-hex run after x reaching ';' -> unknown named -> elided
    assert decode_entities("a&xab;b") == "ab"


def test_numeric_entities():
    assert decode_entities("&#65;&#x42;") == "AB"
    assert decode_entities("&#160;") == " "    # nbsp -> space
    assert decode_entities("&#173;") == ""     # shy -> empty
    assert decode_entities("&#10;") == " "     # cp<32 -> space
    assert decode_entities("&#8194;") == " "  # dead-code branch: normal
    # > U+10FFFF: silently elided (entities.cc:80-82 condition false)
    assert decode_entities("a&#1114112;b") == "ab"
    assert decode_entities("a&#x110000;b") == "ab"


def test_numeric_overflow_raises():
    # std::stoul out_of_range escapes and drops the record
    with pytest.raises(EntityOverflowError):
        decode_entities("&#99999999999999999999999;")


def test_malformed_kept_literal():
    assert decode_entities("AT&T rocks") == "AT&T rocks"
    assert decode_entities("a & b") == "a & b"
    assert decode_entities("&#;") == ";"       # empty digits: '&#' consumed
    assert decode_entities("&#x;") == ";"      # empty hex digits
    assert decode_entities("5 &#xG;") == "5 &#xG;"  # invalid before ';'
    assert decode_entities("fish &chips") == "fish &chips"
    assert decode_entities("tail &") == "tail &"


def test_find_entity_end_grammar():
    s = "&amp;"
    assert find_entity_end(s, 0) == 4
    assert find_entity_end("&amp x", 0) == 4  # ' ' invalid -> its index
    assert find_entity_end("&", 0) is None
    assert find_entity_end("&#", 0) is None
    # leading x sets hex mode even without '#': 'z' not xdigit
    assert find_entity_end("&xz;", 0) == 2


def test_adjacent_and_boundary():
    assert decode_entities("&lt;&gt;") == "<>"
    assert decode_entities("&amp;amp;") == "&amp;"
    assert decode_entities("") == ""
    assert decode_entities("no entities at all") == "no entities at all"


def test_fast_path_matches_slow_path():
    # the _FAST_ENT one-shot regex must be output-identical to the
    # reference-shaped find_entity_end loop on randomized entity soup
    import random
    import re

    from warc2text_spark.functions import entities as ent
    pieces = ["&amp;", "&bogus;", "&#65;", "&#x41;", "&#X4a;", "&#;", "&#x;",
              "&amp", "&", "&&", "&#123abc;", "&x41;", "&nbsp;", "&shy;",
              "&#173;", "&#8203;", "&semi;", "&AMP;", "&eacute;", "plain ",
              "x&y", "&#160;", "&#1114112;", "&#x110000;", ";", "#", "é",
              "&xi;", "&Xi;", "&xyz;", "&xcup;", "&xrarr;", "&xab;", "&Xab;",
              "&x;", "&X;"]
    rng = random.Random(7)
    never = re.compile(r"(?!x)x")
    for _ in range(500):
        s = "".join(rng.choice(pieces) for _ in range(rng.randint(1, 30)))
        fast = ent.decode_entities(s)
        orig = ent._FAST_ENT
        ent._FAST_ENT = never
        try:
            slow = ent.decode_entities(s)
        finally:
            ent._FAST_ENT = orig
        assert fast == slow, s[:120]
