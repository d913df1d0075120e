"""HTML entity decoding with the reference's exact grammar and table.

Contract (reference: /root/reference/src/entities.cc):

* ``find_entity_end`` — grammar scan from a ``&`` (entities.cc:18-49):
  returns the index of the terminating ``;``, or the index of the first
  invalid character, or ``None`` when the string ends mid-entity.
  Note the quirk that a leading ``x``/``X`` sets hex mode even without
  ``#`` (entities.cc:28-31).
* ``decode_entities`` — the driver loop (entities.cc:51-101):
  - entity with no proper end: remainder appended verbatim, done;
  - invalid char before ``;``: the consumed chars appended verbatim;
  - numeric entity: parsed as unsigned 64-bit (``std::stoul``); values
    > 2**64-1 raise :class:`EntityOverflowError` exactly like the uncaught
    ``std::out_of_range`` (the caller drops the whole record,
    warcpreprocessor.cc:180); values > U+10FFFF or with trailing junk are
    silently elided (entities.cc:80-82);
  - named entity: looked up (case-sensitive, no ``;`` in key); unknown
    names are silently elided (entities.cc:89-93).
* ``codepoint_to_text`` — numeric-entity rendering (entities.cc:104-140):
  cp < 32 -> space; 160 (nbsp) -> space; 173 (shy) -> empty; the
  8194-8202/8203/9287 branches are dead code in the reference (they sit
  inside the ``cp <= 0x7FF`` arm) and are preserved as such here by simply
  not special-casing those codepoints.
* Table: WHATWG html5 named entities (stdlib ``html.entities.html5``) minus
  96 removals plus 31 value overrides — see ``_entity_data.py`` (generated,
  reference table at entities.cc:143-2172).

All character-class tests are ASCII-only (C locale semantics).
"""

from __future__ import annotations

import html.entities
import re

from ._entity_data import OVERRIDES, REMOVALS

_DEC_RUN = re.compile(r"[0-9]*")
_HEX_RUN = re.compile(r"[0-9a-fA-F]*")
_NAME_RUN = re.compile(r"[0-9a-zA-Z]*")

_UNICODE_MAX = 0x10FFFF
_ULONG_MAX = 2**64 - 1


class EntityOverflowError(Exception):
    """Numeric entity exceeding unsigned-64 range (record-fatal)."""


def _build_table() -> dict[str, str]:
    table = {k.rstrip(";"): v for k, v in html.entities.html5.items()}
    for name in REMOVALS:
        del table[name]
    table.update(OVERRIDES)
    return table


NAMED_ENTITIES: dict[str, str] = _build_table()


def find_entity_end(source: str, pos: int) -> int | None:
    """Scan an entity starting at ``source[pos] == \'&\'``; see module doc.

    The reference's per-char class loop (entities.cc:36-47) collapses to one
    regex run per mode: the run's end IS the first invalid character (';'
    is in no run class, and for decimal mode an alpha terminator and a
    non-alnum terminator return the same position).
    """
    numeric = False
    hexmode = False
    pos += 1
    n = len(source)
    if pos >= n:
        return None
    if source[pos] == "#":
        numeric = True
        pos += 1
    if pos >= n:
        return None
    if source[pos] in "xX":
        hexmode = True
        pos += 1
    run = _HEX_RUN if hexmode else (_DEC_RUN if numeric else _NAME_RUN)
    end = run.match(source, pos).end()
    if end >= n:
        return None
    return end


def codepoint_to_text(cp: int) -> str:
    if cp < 32:
        return " "
    if cp == 160:
        return " "
    if cp == 173:
        return ""
    if cp <= _UNICODE_MAX:
        # Surrogate codepoints are not representable in a Python str; the
        # reference emits their raw (ill-formed) UTF-8 bytes, which the
        # output boundary would re-escape anyway.  Render as U+FFFD.
        if 0xD800 <= cp <= 0xDFFF:
            return "�"
        return chr(cp)
    return ""


# fast path: a complete, well-terminated entity in one match — named,
# decimal, or hex (the same run classes as find_entity_end, followed by
# ';').  Anything else (missing ';', empty digit runs, EOF) takes the
# reference-shaped slow path below.  Names starting with x/X are EXCLUDED
# from the named alternative: find_entity_end (entities.cc:28-31) switches
# to hex mode on a leading x/X even without '#', so '&xi;'/'&Xi;'/'&xcup;'
# stay verbatim and '&xab;' (pure hex run) is an unknown-name elision —
# only the slow path reproduces that grammar.
_FAST_ENT = re.compile(
    r"&(?:((?![xX])[a-zA-Z0-9]+)|#([0-9]+)|#[xX]([0-9a-fA-F]+));"
)


def decode_entities(source: str) -> str:
    """Decode HTML entities in ``source`` (entities.cc:51-101).

    Fast path: ONE ``_FAST_ENT.split`` pass over the whole document when
    every ``&`` begins a well-formed fast entity (the overwhelmingly
    common case on real pages — checked by scanning the split's text
    chunks for residual ``&``); the per-entity work is then just the
    table lookup / numeric decode.  Any irregular entity falls back to
    the reference-shaped per-entity loop (:func:`_decode_entities_loop`,
    the differential twin) for the whole string.
    """
    if "&" not in source:
        return source
    parts = _FAST_ENT.split(source)
    if len(parts) == 1 or any("&" in parts[i]
                              for i in range(0, len(parts), 4)):
        return _decode_entities_loop(source)
    out = [parts[0]]
    append = out.append
    named = NAMED_ENTITIES.get
    for i in range(1, len(parts), 4):
        name = parts[i]
        if name is not None:
            value = named(name)
            if value is not None:
                append(value)
        else:
            dec = parts[i + 1]
            code = int(dec) if dec is not None else int(parts[i + 2], 16)
            if code > _ULONG_MAX:
                raise EntityOverflowError(dec or parts[i + 2])
            if code <= _UNICODE_MAX:
                append(codepoint_to_text(code))
        append(parts[i + 3])
    return "".join(out)


def _decode_entities_loop(source: str) -> str:
    """Per-entity loop (entities.cc:51-101 shape) — the exact-grammar
    path for irregular entities and the differential twin of the split
    fast path."""
    pos = source.find("&")
    if pos < 0:
        return source
    out: list[str] = []
    end_pos = 0
    fast = _FAST_ENT.match
    named = NAMED_ENTITIES.get
    while pos >= 0:
        out.append(source[end_pos:pos])
        m = fast(source, pos)
        if m is not None:
            name, dec, hx = m.groups()
            if name is not None:
                value = named(name)
                if value is not None:
                    out.append(value)
            else:
                code = int(dec) if dec is not None else int(hx, 16)
                if code > _ULONG_MAX:
                    raise EntityOverflowError(dec or hx)
                if code <= _UNICODE_MAX:
                    out.append(codepoint_to_text(code))
            end_pos = m.end()
            pos = source.find("&", end_pos)
            continue
        end = find_entity_end(source, pos)
        if end is None:
            out.append(source[pos:])
            end_pos = len(source)
            break
        if source[end] != ";":
            # '&' did not start a proper entity: keep the consumed chars
            out.append(source[pos:end])
            end_pos = end
        elif source[pos + 1] == "#":
            hexmode = (pos + 2 < end) and source[pos + 2] in "xX"
            start = pos + (3 if hexmode else 2)
            digits = source[start:end]
            if not digits:
                # std::stoul("") -> invalid_argument: keep consumed chars
                # (start == end here, so nothing is appended)
                end_pos = end
            else:
                code = int(digits, 16 if hexmode else 10)
                if code > _ULONG_MAX:
                    raise EntityOverflowError(digits)
                if code <= _UNICODE_MAX:
                    out.append(codepoint_to_text(code))
                end_pos = end + 1
        else:
            value = NAMED_ENTITIES.get(source[pos + 1:end])
            if value is not None:
                out.append(value)
            end_pos = end + 1
        pos = source.find("&", end_pos)
    out.append(source[end_pos:])
    return "".join(out)
