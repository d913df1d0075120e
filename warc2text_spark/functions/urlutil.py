"""URL predicates and the percent-encoding transform.

Reference citations inline.
"""

from __future__ import annotations

import re

ROBOTS_PATH = "/robots.txt"

# warcpreprocessor.cc:68-69
REMOVE_EXTENSIONS = (".jpg", ".jpeg", ".gif", ".png", ".css", ".js", ".mp3",
                     ".mp4", ".flv", ".wmv", ".gz", ".zip", ".rar")

STATUS_RE = re.compile(r"^20[036] ?.*$")  # warcpreprocessor.cc:82


def is_robots_txt(url: str) -> bool:
    """warcpreprocessor.cc:16-47: path is exactly /robots.txt."""
    host_offset = url.find("://")
    if host_offset >= 0:
        host_offset += 3
    elif url[:2] == "//":
        host_offset = 2
    else:
        host_offset = 0
    path_offset = url.find("/", host_offset)
    if path_offset < 0:
        return False
    if url[path_offset:path_offset + len(ROBOTS_PATH)] != ROBOTS_PATH:
        return False
    return len(url) <= path_offset + len(ROBOTS_PATH)


def is_pdf(url: str, clean_http_ct: str, is_text_format: bool) -> bool:
    """warcpreprocessor.cc:49-64: .pdf URL or application/pdf content type,
    unless the record already has a text content type (converted PDFs)."""
    if is_text_format:
        return False
    return url.endswith(".pdf") or clean_http_ct == "application/pdf"


def url_filter_ok(url: str, user_regex: re.Pattern | None = None) -> bool:
    """warcpreprocessor.cc:98-109: True when the URL survives."""
    for ext in REMOVE_EXTENSIONS:
        if url.endswith(ext):
            return False
    if user_regex is not None and user_regex.search(url):
        return False
    return True


def combine_url_filters(lines: list[str]) -> re.Pattern | None:
    """util.cc:132-158: OR-combine valid regex lines into (r1)|(r2)|..."""
    parts = []
    for line in lines:
        if not line.strip() or line.startswith("#"):
            continue
        try:
            re.compile(line)
        except re.error:
            continue
        parts.append(f"({line})")
    if not parts:
        return None
    return re.compile("|".join(parts))


_RESERVED = set("!#$&'()*+,/:;=?[]")  # util.hh:31
_ALNUM = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")
_KEEP = _ALNUM | set("-._~") | _RESERVED


def encode_url(url: str) -> str:
    """util.cc:166-188 — including the reference quirk: escaped bytes are
    printed as ``'%' << std::hex << int(c)`` with *signed* char and no
    zero-padding, so bytes >= 0x80 render as %ffffffXX."""
    out = []
    for b in url.encode("utf-8"):
        c = chr(b)
        if c in _KEEP:
            out.append(c)
        elif b >= 0x80:
            out.append("%" + format(0x100000000 + (b - 0x100), "x"))
        else:
            out.append("%" + format(b, "x"))
    return "".join(out)
