"""Property tests for the codec layer (SURVEY.md §5.2).

Semantics under test mirror reference codec/codec.go:35-52 and
checksum/checksum.go:31-43 (see docstrings in tikv_data_compare_spark.codec).
"""

import pytest
from hypothesis import given, strategies as st

from tikv_data_compare_spark import codec


@given(st.binary(max_size=64))
def test_encode_decode_bytes_roundtrip(b):
    assert codec.decode_bytes(codec.encode_bytes(b)) == b


@given(st.binary(max_size=32), st.binary(max_size=32))
def test_encode_bytes_order_preserving(a, b):
    # memcomparable: encoded order == raw bytewise order
    assert (codec.encode_bytes(a) < codec.encode_bytes(b)) == (a < b)


@given(st.binary(max_size=64))
def test_key_v2_roundtrip(raw):
    assert codec.decode_key_v2(codec.encode_key_v2(raw)) == raw


def test_encode_bytes_known_vectors():
    # groups of 8 padded with zeros, marker 0xFF - pad (TiKV memcomparable)
    assert codec.encode_bytes(b"") == b"\x00" * 8 + b"\xf7"
    assert codec.encode_bytes(b"abc") == b"abc" + b"\x00" * 5 + b"\xfa"
    assert codec.encode_bytes(b"12345678") == b"12345678" + b"\xff" + b"\x00" * 8 + b"\xf7"


@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
def test_ts_roundtrip(ts):
    assert codec.decode_ts(codec.encode_ts(ts)) == ts


@given(st.integers(min_value=0, max_value=(1 << 64) - 2))
def test_ts_inverted_ordering(ts):
    # newer (larger) ts encodes to a bytewise-smaller key: sorts first
    assert codec.encode_ts(ts + 1) < codec.encode_ts(ts)


def test_decode_ts_reference_convention():
    # ^BigEndian.Uint64 (codec/codec.go:35-36)
    assert codec.decode_ts(b"\xff" * 8) == 0
    assert codec.decode_ts(b"\x00" * 8) == (1 << 64) - 1


@given(st.binary(max_size=32))
def test_next_key_is_successor(b):
    nk = codec.next_key(b)
    assert nk > b
    # nothing strictly between b and b+0x00
    assert nk == b + b"\x00"


def test_parse_key_formats():
    assert codec.parse_key("raw", "abc") == b"abc"
    assert codec.parse_key("hex", "6162: 63".replace(": ", "")) == b"abc"
    assert codec.parse_key("escaped", "a\\x00b\\nc") == b"a\x00b\nc"
    with pytest.raises(ValueError):
        codec.parse_key("nope", "x")


def test_hex_upper():
    assert codec.hex_upper(b"\x00\xabz") == "00AB7A"


def test_decode_malformed():
    with pytest.raises(ValueError):
        codec.decode_bytes(b"\x01\x02")
    with pytest.raises(ValueError):
        codec.decode_key_v2(codec.encode_bytes(b"r\x00"))  # shorter than prefix
