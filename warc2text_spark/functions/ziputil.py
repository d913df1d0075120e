"""Zipped broader-document-format extraction (ODT/ODS/ODP/DOCX/PPTX/XLSX/EPUB).

Reference: /root/reference/src/record.cc:132-190 and src/zipreader.cc.

* ``zip_content_type`` — URL-extension sniff first (including the
  reference's literal ``.xslx`` typo for the xlsx extension,
  record.cc:159), then content-type membership (record.cc:142-172).
* ``read_zip_payload`` — concatenates (in archive order) the decompressed
  bytes of members whose names match the per-MIME regex
  (record.cc:174-190).  A member that fails to read (bad CRC etc.) is
  skipped; a payload that fails to open as a zip raises
  :class:`ZipReadError` and the caller drops the record
  (warcpreprocessor.cc:182-185).
"""

from __future__ import annotations

import io
import re
import zipfile

ZIP_TYPES = {  # record.cc:132-140
    "application/vnd.oasis.opendocument.text": re.compile(r"^content\.xml$"),
    "application/vnd.oasis.opendocument.spreadsheet": re.compile(r"^content\.xml$"),
    "application/vnd.oasis.opendocument.presentation": re.compile(r"^content\.xml$"),
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document":
        re.compile(r"^word/document\.xml$"),
    "application/vnd.openxmlformats-officedocument.presentationml.presentation":
        re.compile(r"^ppt/slides/slide.*$"),
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet":
        re.compile(r"^xl/sharedStrings\.xml$"),
    "application/epub+zip": re.compile(r"^.*ml$"),
}

_EXT_TO_TYPE = (  # record.cc:144-164 (".xslx" typo preserved)
    (".odt", "application/vnd.oasis.opendocument.text"),
    (".ods", "application/vnd.oasis.opendocument.spreadsheet"),
    (".odp", "application/vnd.oasis.opendocument.presentation"),
    (".docx", "application/vnd.openxmlformats-officedocument.wordprocessingml.document"),
    (".pptx", "application/vnd.openxmlformats-officedocument.presentationml.presentation"),
    (".xslx", "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"),
    (".epub", "application/epub+zip"),
)


class ZipReadError(Exception):
    pass


def zip_content_type(content_type: str, url: str) -> str:
    for ext, ctype in _EXT_TO_TYPE:
        if url.endswith(ext):
            return ctype
    if content_type in ZIP_TYPES:
        return content_type
    return ""


def read_zip_payload(content_type: str, payload: bytes) -> bytes:
    pattern = ZIP_TYPES[content_type]
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        names = zf.namelist()
    except Exception as e:
        raise ZipReadError(str(e)) from e
    out = bytearray()
    for name in names:
        if pattern.fullmatch(name):
            try:
                out += zf.read(name)  # zipfile verifies CRC on read
            except Exception:
                continue  # bad member: skipped (record.cc:181-186)
    return bytes(out)
