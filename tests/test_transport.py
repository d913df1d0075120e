"""Transport decode tests (reference: src/decompress.hh:51-123)."""

import gzip

import pytest

from warc2text_spark.functions.transport import (
    DechunkError,
    dechunk,
    decompress,
    transport_decode,
)


def chunked(*parts, trailer=b""):
    out = b""
    for p in parts:
        out += format(len(p), "x").encode() + b"\r\n" + p + b"\r\n"
    return out + b"0\r\n" + trailer


def test_dechunk_basic():
    assert dechunk(chunked(b"hello ", b"world")) == b"hello world"


def test_dechunk_zero_chunk_keeps_trailing_bytes():
    # the reference breaks after erasing the "0" line, leaving trailers
    assert dechunk(chunked(b"x", trailer=b"\r\n")) == b"x\r\n"


def test_dechunk_size_line_spaces_ok():
    assert dechunk(b"5  \r\nhello\r\n0\r\n") == b"hello"


def test_dechunk_malformed_size_line():
    with pytest.raises(DechunkError) as e:
        dechunk(b"zz\r\nhello\r\n")
    assert e.value.partial == b"zz\r\nhello\r\n"


def test_dechunk_partial_state_on_midstream_error():
    # first chunk ok, second size line bad -> partial keeps decoded prefix
    data = b"5\r\nhello\r\nQQ\r\n"
    with pytest.raises(DechunkError) as e:
        dechunk(data)
    assert e.value.partial == b"helloQQ\r\n"


def test_dechunk_chunk_too_large():
    with pytest.raises(DechunkError):
        dechunk(b"ff\r\nshort\r\n")


def test_dechunk_missing_crlf_after_chunk():
    with pytest.raises(DechunkError):
        dechunk(b"5\r\nhelloXX0\r\n")


def test_decompress_gzip_roundtrip():
    payload = b"<p>hi</p>" * 100
    assert decompress(gzip.compress(payload), "gzip") == payload


def test_decompress_magic_check():
    with pytest.raises(ValueError):
        decompress(b"not gzip", "gzip")


def test_decompress_passthrough_and_unsupported():
    assert decompress(b"abc", "identity") == b"abc"
    for enc in ("br", "deflate", "bogus"):
        with pytest.raises(ValueError):
            decompress(b"abc", enc)


def test_transport_decode_keeps_raw_on_errors():
    # br -> unsupported -> raw kept (record.cc:126-128)
    assert transport_decode(b"rawbytes", "", "br") == b"rawbytes"
    # unsupported transfer-encoding -> raw kept, decompress skipped
    assert transport_decode(b"rawbytes", "gzip2", "identity") == b"rawbytes"
    # happy path
    assert transport_decode(chunked(b"ab"), "chunked", "") == b"ab"
    # malformed chunking -> partially dechunked state kept
    assert transport_decode(b"5\r\nhello\r\nQQ\r\n", "chunked", "") == b"helloQQ\r\n"
