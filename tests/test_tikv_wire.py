"""Golden wire vectors for the TiKV client contract (sources/tikv_wire.py).

A real tikv-client adapter implements the 3-method contract of
sources/tikv.py; these fixtures pin the request/response BYTES each method
maps to, so an adapter can be validated offline (encode → compare to
golden, decode golden → compare to values) before touching a cluster.

The hex strings below are FROZEN — they are the contract.  If an encoder
change alters them, that is a wire-compat break and must be deliberate.
"""

import pytest

from tikv_data_compare_spark.sources import tikv_wire as w

# ------------------------------------------------------------------- goldens

#: RawScanRequest: [0x00..00, 0x00..ff) (8-byte keys), limit 10240 — the
#: reference's batch size (scan/scan.go:42)
GOLDEN_SCAN_REQ = "120800000000000000001880503a0800000000000000ff"

#: RawScanResponse: two pairs (key 1 → b"v1", key 2 → b"v2")
GOLDEN_SCAN_RESP = "1a0e120800000000000000011a0276311a0e120800000000000000021a027632"

#: RawChecksumRequest: two region sub-ranges [00,64) and [64,c8)
GOLDEN_CKSUM_REQ = "1a060a01001201641a060a01641201c8"

#: RawChecksumResponse: the CRC-64/XZ check value as crc64_xor,
#: total_kvs=4599, total_bytes=312093
GOLDEN_CKSUM_RESP = "18faf3e4f8bdb7f2ae990120f723289d8613"

#: PD config endpoint JSON → API version (utils/utils.go:13-26)
GOLDEN_PD_CONFIG_V2 = b'{"storage": {"api-version": 2, "enable-ttl": false}}'
GOLDEN_PD_CONFIG_V1TTL = b'{"storage": {"api-version": 1, "enable-ttl": true}}'
GOLDEN_PD_CONFIG_V1 = b'{"storage": {}}'


def test_scan_request_golden():
    start, end = bytes.fromhex("0000000000000000"), bytes.fromhex("00000000000000ff")
    enc = w.encode_raw_scan_request(start, end, 10240)
    assert enc.hex() == GOLDEN_SCAN_REQ
    dec = w.decode_raw_scan_request(bytes.fromhex(GOLDEN_SCAN_REQ))
    assert dec == {"start_key": start, "limit": 10240, "key_only": False, "end_key": end}


def test_scan_response_golden():
    pairs = [
        (bytes.fromhex("0000000000000001"), b"v1"),
        (bytes.fromhex("0000000000000002"), b"v2"),
    ]
    assert w.encode_raw_scan_response(pairs).hex() == GOLDEN_SCAN_RESP
    assert w.decode_raw_scan_response(bytes.fromhex(GOLDEN_SCAN_RESP)) == pairs


def test_checksum_request_golden():
    ranges = [(b"\x00", b"\x64"), (b"\x64", b"\xc8")]
    assert w.encode_raw_checksum_request(ranges).hex() == GOLDEN_CKSUM_REQ
    assert w.decode_raw_checksum_request(bytes.fromhex(GOLDEN_CKSUM_REQ)) == ranges


def test_checksum_response_golden():
    triple = (0x995DC9BBDF1939FA, 4599, 312093)
    assert w.encode_raw_checksum_response(*triple).hex() == GOLDEN_CKSUM_RESP
    assert w.decode_raw_checksum_response(bytes.fromhex(GOLDEN_CKSUM_RESP)) == triple


def test_api_version_handshake_golden():
    assert w.parse_api_version(GOLDEN_PD_CONFIG_V2) == "V2"
    assert w.parse_api_version(GOLDEN_PD_CONFIG_V1TTL) == "V1TTL"
    assert w.parse_api_version(GOLDEN_PD_CONFIG_V1) == "V1"


# ------------------------------------------------------------ codec properties


@pytest.mark.parametrize("n", [0, 1, 127, 128, 300, 2**32, 2**63, 2**64 - 1])
def test_varint_roundtrip(n):
    enc = w.encode_varint(n)
    got, pos = w.decode_varint(enc, 0)
    assert got == n and pos == len(enc)


def test_scan_request_roundtrip_unbounded():
    # empty bounds = unbounded range (config/config.go:32-33): omitted fields
    enc = w.encode_raw_scan_request(None, None, 5)
    dec = w.decode_raw_scan_request(enc)
    assert dec["start_key"] == b"" and dec["end_key"] == b"" and dec["limit"] == 5


def test_scan_response_roundtrip_empty_value():
    # a present key with an empty value survives (proto3 omits empty bytes,
    # so the decode default must be b"")
    pairs = [(b"\x01", b"")]
    assert w.decode_raw_scan_response(w.encode_raw_scan_response(pairs)) == pairs


def test_checksum_response_roundtrip_zero_triple():
    # the identity triple of the checksum monoid (empty range)
    assert w.decode_raw_checksum_response(w.encode_raw_checksum_response(0, 0, 0)) == (0, 0, 0)


def test_truncated_payloads_raise():
    with pytest.raises(ValueError):
        w.decode_varint(b"\xff", 0)  # continuation bit with no next byte
    with pytest.raises(ValueError):
        w.decode_fields(bytes.fromhex("1a05ffff"))  # length past the buffer


def test_wire_pagination_resume_cursor():
    """The connector's resume protocol (lastKey + 0x00, scan/scan.go:59)
    expressed at the wire layer: the follow-up request's start_key is the
    previous page's last key with a 0x00 byte appended."""
    page = w.decode_raw_scan_response(bytes.fromhex(GOLDEN_SCAN_RESP))
    last_key = page[-1][0]
    nxt = w.encode_raw_scan_request(last_key + b"\x00", None, 10240)
    dec = w.decode_raw_scan_request(nxt)
    assert dec["start_key"] == bytes.fromhex("0000000000000002") + b"\x00"
