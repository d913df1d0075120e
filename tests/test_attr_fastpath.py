"""Differential test: scan_head's attribute fast path vs the slow loop —
identical token streams on randomized attribute soup."""

import random

from warc2text_spark.functions import scanner as sc


def token_stream(data: bytes):
    s = sc.Scanner(data)
    out = []
    for _ in range(500):
        t, v = s.next_token()
        out.append((t, v, s.tag_name, s.attr_name))
        if t in (sc.TT_EOF, sc.TT_ERROR):
            break
    return out


ATTR_PIECES = [
    ' class="footer main"', " id='x1'", " align=center", " a=b", " checked",
    ' data-x = "spaced"', " b =c", ' q="unterminated', " name= 'v w'",
    ' z="quo\'te"', " v='dq\"uo'", " n=", " =weird", ' x="a>b"', " y=a>b",
    " long" + "g" * 200 + '="v"', ' v="' + "w" * 1500 + '"', " a<b=c",
    " t=\tx", "  ", " /", ' mixed="1" two=2 three', " empty=''",
]


def test_differential_attr_parsing():
    rng = random.Random(99)
    docs = []
    for _ in range(300):
        attrs = "".join(rng.choice(ATTR_PIECES)
                        for _ in range(rng.randint(0, 5)))
        docs.append(f"<p{attrs}>body text</p><div{attrs}/>x".encode())
    for doc in docs:
        sc._ATTR_FAST_ENABLED = True
        fast = token_stream(doc)
        sc._ATTR_FAST_ENABLED = False
        try:
            slow = token_stream(doc)
        finally:
            sc._ATTR_FAST_ENABLED = True
        assert fast == slow, doc[:120]
