"""Dependency-free PDF text extraction (the "PDF/layout parse" leg of
the extraction pipeline).

The reference routes ``application/pdf`` records to a side WARC rather
than parsing them (warcpreprocessor.cc pdf pass-through, K3); at
training-data scale the pipeline wants the text too, so this module
implements the text-showing subset of the public PDF format (ISO 32000
§9.4 text-showing operators, §7.3.4 string syntax, §7.4.4 Flate
filter — all public knowledge; zlib is in the stdlib):

* content streams: ``stream``/``endstream`` blocks, raw or
  ``/FlateDecode`` (zlib);
* text blocks: ``BT`` ... ``ET``;
* show operators: ``(s) Tj``, ``[(a) -120 (b)] TJ``, ``(s) '``,
  ``(aw ac s) "``, plus hex strings ``<48656c6c6f>``;
* literal-string escapes: ``\\n \\r \\t \\b \\f \\( \\) \\\\``, octal
  ``\\ddd``, and the line-continuation backslash;
* line-positioning operators (``Td TD T* ' "``) and block boundaries
  emit newlines.

Layout reconstruction (multi-column ordering, font decoding beyond the
standard encodings) is out of scope: strings are emitted in content
order, which matches how simple generators (and this repo's fixtures)
write text.  The function is TOTAL — malformed input yields the text
recovered so far, never an exception (kernel contract).
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")
_HEX_RE = re.compile(rb"[0-9a-fA-F]{2}")

_ESCAPES = {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b",
            0x66: b"\f", 0x28: b"(", 0x29: b")", 0x5C: b"\\"}


def _literal_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(...)`` literal from ``data[i] == '('``; returns
    (decoded bytes, index past the closing paren).  Balanced unescaped
    parens nest (ISO 32000 7.3.4.2)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            if i + 1 >= n:
                break
            e = data[i + 1]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 2
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                j = i + 1
                val = 0
                while j < n and j < i + 4 and 0x30 <= data[j] <= 0x37:
                    val = val * 8 + (data[j] - 0x30)
                    j += 1
                out.append(val & 0xFF)
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 2
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself
                out.append(e)
                i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if not depth:
                i += 1
                break
        if depth:
            out.append(c)
        i += 1
    return bytes(out), i


def _hex_string(data: bytes, i: int) -> tuple[bytes, int]:
    end = data.find(b">", i)
    if end < 0:
        end = len(data)
    body = b"".join(_HEX_RE.findall(data[i + 1:end]))
    try:
        return bytes.fromhex(body.decode("ascii")), end + 1
    except ValueError:
        return b"", end + 1


_NEWLINE_OPS = {b"Td", b"TD", b"T*"}
_TOKEN_RE = re.compile(rb"[A-Za-z*'\"]{1,3}|\S")


def _extract_block(block: bytes, out: list[str]) -> None:
    """Walk one BT..ET body: collect show-operator strings, newline on
    line-positioning operators between shows."""
    i = 0
    n = len(block)
    pending: list[bytes] = []
    emitted_any = False

    def flush(newline: bool) -> None:
        nonlocal emitted_any
        if pending:
            text = b"".join(pending).decode("utf-8", "replace")
            if text:
                out.append(text)
                emitted_any = True
            pending.clear()
        if newline and emitted_any and out and out[-1] != "\n":
            out.append("\n")

    strings_since_op: list[bytes] = []
    while i < n:
        c = block[i]
        if c == 0x28:  # (
            s, i = _literal_string(block, i)
            strings_since_op.append(s)
            continue
        if c == 0x3C:  # <
            if i + 1 < n and block[i + 1] == 0x3C:  # dict <<
                i += 2
                continue
            s, i = _hex_string(block, i)
            strings_since_op.append(s)
            continue
        m = _TOKEN_RE.match(block, i)
        if m is None:
            i += 1
            continue
        tok = m.group()
        i = m.end()
        if tok in (b"Tj", b"TJ"):
            pending.extend(strings_since_op)
            strings_since_op = []
            flush(False)
        elif tok == b"'" or tok == b'"':
            flush(True)
            pending.extend(strings_since_op)
            strings_since_op = []
            flush(False)
        elif tok in _NEWLINE_OPS:
            strings_since_op = []
            flush(True)
        elif tok[:1].isalpha() and len(tok) <= 3:
            # any other operator consumes its (non-show) operands
            strings_since_op = []
    flush(False)


def extract_pdf_text(payload: bytes) -> str:
    """Text of a PDF payload via the content-order text-showing subset;
    '' for non-PDF input or when nothing is recoverable.  Never raises."""
    try:
        if not payload.startswith(b"%PDF"):
            return ""
        out: list[str] = []
        prev_end = 0
        for m in _STREAM_RE.finditer(payload):
            body = m.group(1)
            # THIS stream's dict declares the filter: scope the lookback
            # to after the previous stream and after the last object
            # boundary, so a neighboring object's /FlateDecode can never
            # leak in (code-review r5 finding), and a long dict still
            # reaches its own declaration
            start = max(0, m.start() - 1000, prev_end)
            head = payload[start:m.start()]
            cut = head.rfind(b"endobj")
            if cut != -1:
                head = head[cut:]
            prev_end = m.end()
            if _FLATE_RE.search(head):
                try:
                    body = zlib.decompress(body)
                except Exception:
                    continue
            j = 0
            while True:
                bt = body.find(b"BT", j)
                if bt < 0:
                    break
                et = body.find(b"ET", bt + 2)
                if et < 0:
                    et = len(body)
                _extract_block(body[bt + 2:et], out)
                if out and out[-1] != "\n":
                    out.append("\n")
                j = et + 2
        text = "".join(out)
        return text.rstrip("\n") + "\n" if text.strip() else ""
    except Exception:
        return ""


def build_minimal_pdf(text_lines: list[str], flate: bool = False) -> bytes:
    """Deterministic single-page PDF carrying ``text_lines`` as Tj shows
    (fixture/test generator — byte-stable for closed-form oracles)."""
    shows = []
    for line in text_lines:
        esc = (line.replace("\\", r"\\").replace("(", r"\(")
               .replace(")", r"\)"))
        shows.append(f"({esc}) Tj T*".encode())
    content = b"BT /F1 12 Tf 14 TL 72 720 Td " + b" ".join(shows) + b" ET"
    filt = b""
    if flate:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
        b"4 0 obj << " + filt + b"/Length " + str(len(content)).encode()
        + b" >> stream\n" + content + b"endstream endobj",
    ]
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"
