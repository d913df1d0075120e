"""URL predicates, paragraph-id, langid tests."""

from warc2text_spark.functions.langid import (
    HeuristicDetector,
    HeuristicMultiDetector,
    SkipDetector,
    classify,
)
from warc2text_spark.functions.paragraph import paragraph_id
from warc2text_spark.functions.urlutil import (
    combine_url_filters,
    encode_url,
    is_pdf,
    is_robots_txt,
    url_filter_ok,
)


# --- F13 robots --------------------------------------------------------------
def test_is_robots_txt():
    assert is_robots_txt("https://x.y/robots.txt")
    assert is_robots_txt("//x.y/robots.txt")
    assert is_robots_txt("x.y/robots.txt")
    assert not is_robots_txt("https://x.y/robots.txt2")
    assert not is_robots_txt("https://x.y/a/robots.txt")  # path starts /a
    assert not is_robots_txt("https://x.y/")
    assert not is_robots_txt("https://x.y")  # no path at all


# --- F14 pdf -----------------------------------------------------------------
def test_is_pdf():
    assert is_pdf("http://a/x.pdf", "application/octet-stream", False)
    assert is_pdf("http://a/x", "application/pdf", False)
    # bitextor-converted case: text format wins (warcpreprocessor.cc:50-56)
    assert not is_pdf("http://a/x.pdf", "text/html", True)
    assert not is_pdf("http://a/x", "text/html", True)


# --- F12 url filters ----------------------------------------------------------
def test_url_extension_denylist():
    assert not url_filter_ok("http://a/logo.png")
    assert not url_filter_ok("http://a/archive.tar.gz")
    assert url_filter_ok("http://a/page.html")


def test_user_regex_combined():
    rx = combine_url_filters([r"\.example\.com/", "# comment", "", r"(bad["])
    assert rx is not None  # invalid regex line skipped
    assert not url_filter_ok("http://www.example.com/x", rx)
    assert url_filter_ok("http://www.example.org/x", rx)


# --- T8 url encoding -----------------------------------------------------------
def test_encode_url_quirks():
    assert encode_url("http://a.b/c?d=1&e=[2]") == "http://a.b/c?d=1&e=[2]"
    assert encode_url("a b") == "a%20b"
    assert encode_url("a\"b") == "a%22b"
    # signed-char quirk: byte 0xc3 prints as %ffffffc3
    assert encode_url("é") == "%ffffffc3%ffffffa9"


# --- F20 paragraph id -----------------------------------------------------------
def test_paragraph_id():
    assert paragraph_id("a\nb\n") == "a\t1:2\nb\t2:2\n"
    assert paragraph_id("a\nb") == "a\t1:2\nb\t2:2\n"
    assert paragraph_id("") == ""
    assert paragraph_id("\n\n") == ""
    assert paragraph_id("x\n\ny\n") == "x\t1:3\n\t2:3\ny\t3:3\n"


# --- F19 langid -------------------------------------------------------------
def test_skip_detector():
    assert SkipDetector().detect("hello\n") == {"": "hello\n"}


def test_heuristic_detector():
    en = "the cat and the dog are in the house and they are happy\n"
    assert HeuristicDetector().detect(en) == {"en": en}
    noise = "qwerty zxcvb asdfgh\n"
    assert HeuristicDetector().detect(noise) == {"unk": noise}
    assert classify(en)[0] == "en"
    assert classify("el perro y el gato en la casa es para un niño")[0] == "es"
    assert classify("le chat est dans la maison avec les enfants du village")[0] == "fr"


def test_multilang_detector():
    en = "the cat and the dog are in the house with the mouse"
    es = "el perro y el gato en la casa es de la niña"
    text = en + "\n" + es + "\n"
    out = HeuristicMultiDetector().detect(text)
    assert out == {"en": en + "\n", "es": es + "\n"}
    # unreliable -> unk with whole text
    assert HeuristicMultiDetector().detect("zzz qqq\n") == {"unk": "zzz qqq\n"}
