"""Property test: the native Column filter predicates agree with their
pure-Python twins (the robots/pdf/url logic intentionally exists in both
worlds — SQL for pushdown, Python for WARC-side tooling — and must match)."""

import random

import pyspark.sql.functions as F

from warc2text_spark.functions.record import clean_content_type, is_text_format
from warc2text_spark.functions.urlutil import STATUS_RE, is_pdf, is_robots_txt, url_filter_ok
from warc2text_spark.operators import filters as flt

URL_PARTS = [
    "https://", "http://", "//", "", "host.example", "a.b.c", "x",
    "/robots.txt", "/robots.txt2", "/a/robots.txt", "/page.html", "/x.pdf",
    "/logo.png", "/archive.gz", "/deep/path/robots.txt", "", "?q=1",
    ":8080", "/robots.txtx", "/ROBOTS.TXT", "://weird", "//",
]

CTS = ["text/html", "text/html; charset=utf-8", "application/pdf",
       "text/plain", "image/png", "", None, "TEXT/HTML; x=y",
       "application/xhtml+xml", "application/octet-stream; charset=x"]

STATUSES = ["200 OK", "200", "203 Non-Authoritative", "206 Partial",
            "404 Not Found", "301 Moved", "20 OK", "2000", None, "",
            "200OK", "503 x"]


def _gen_urls(n=300, seed=7):
    rng = random.Random(seed)
    urls = []
    for _ in range(n):
        urls.append("".join(rng.choice(URL_PARTS)
                            for _ in range(rng.randint(1, 4))))
    return urls


def test_robots_predicate_matches_python(spark):
    urls = _gen_urls()
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", flt.is_robots_txt().alias("flag")).collect()
    for r in rows:
        assert r.flag == is_robots_txt(r.url), r.url


def test_pdf_predicate_matches_python(spark):
    rng = random.Random(11)
    rows = [(u, rng.choice(CTS)) for u in _gen_urls(200, 13)]
    df = spark.createDataFrame(rows, "url string, http_ct string")
    out = df.select("url", "http_ct", flt.is_pdf().alias("flag")).collect()
    for r in out:
        clean_ct, _ = clean_content_type(r.http_ct or "")
        expected = is_pdf(r.url or "", clean_ct, is_text_format(clean_ct))
        assert r.flag == expected, (r.url, r.http_ct)


def test_status_predicate_matches_python(spark):
    df = spark.createDataFrame([(s,) for s in STATUSES], "http_status string")
    out = df.select("http_status", flt.http_status_ok().alias("flag")).collect()
    for r in out:
        expected = (r.http_status is None or r.http_status == ""
                    or bool(STATUS_RE.match(r.http_status)))
        assert r.flag == expected, r.http_status


def test_url_filter_matches_python(spark):
    urls = _gen_urls(200, 23)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select("url", flt.url_ok().alias("flag")).collect()
    for r in out:
        assert r.flag == url_filter_ok(r.url or ""), r.url
