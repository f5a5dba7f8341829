"""Wire-protocol codec for the TiKV client contract — offline golden seam.

The reference talks to TiKV through tikv/client-go's gRPC stubs
(rawkv.NewClientWithOpts, /root/reference/diff/diff.go:19-31; the Checksum
RPC, /root/reference/checksum/checksum.go:83).  This environment has no wire
client, so sources/tikv.py defines a 3-method client contract and runs the
connector against an in-process fake.  This module pins the BYTES that
contract maps to, so a future real adapter can be validated offline against
golden fixtures (tests/test_tikv_wire.py) before ever touching a cluster:

- ``scan``      ↔ kvrpcpb.RawScanRequest / RawScanResponse
- checksum      ↔ kvrpcpb.RawChecksumRequest / RawChecksumResponse
                  (the {crc64_xor, total_kvs, total_bytes} triple)
- ``api_version`` ↔ the PD config HTTP endpoint's JSON
                  (``storage.api-version``), as used by the reference's
                  GetClusterAPIVersion (utils/utils.go:13-26)

Message shapes follow the public kvproto ``kvrpcpb.proto`` definitions
(field numbers documented per function).  The codec is a minimal
protobuf-wire implementation (varint + length-delimited fields only — all
these messages need nothing else), not a protobuf library dependency.
"""

from __future__ import annotations

import json


# ------------------------------------------------------------ wire primitives

_WIRE_VARINT = 0
_WIRE_LEN = 2


def encode_varint(n: int) -> bytes:
    if n < 0:
        raise ValueError("protobuf varints here are unsigned")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint longer than 64 bits")


def _field_varint(field: int, value: int) -> bytes:
    if not value:  # proto3 default: zero values are omitted
        return b""
    return encode_varint((field << 3) | _WIRE_VARINT) + encode_varint(value)


def _field_bytes(field: int, value: bytes) -> bytes:
    if not value:
        return b""
    return encode_varint((field << 3) | _WIRE_LEN) + encode_varint(len(value)) + value


def decode_fields(data: bytes) -> dict[int, list]:
    """field number → list of raw values (ints for varint fields, bytes for
    length-delimited)."""
    out: dict[int, list] = {}
    pos = 0
    while pos < len(data):
        key, pos = decode_varint(data, pos)
        field, wire = key >> 3, key & 0x7
        if wire == _WIRE_VARINT:
            v, pos = decode_varint(data, pos)
        elif wire == _WIRE_LEN:
            ln, pos = decode_varint(data, pos)
            if pos + ln > len(data):
                raise ValueError("truncated length-delimited field")
            v = data[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(f"unsupported wire type {wire} (field {field})")
        out.setdefault(field, []).append(v)
    return out


# --------------------------------------------------------------- RawScan RPC


def encode_raw_scan_request(
    start_key: bytes | None,
    end_key: bytes | None,
    limit: int,
    key_only: bool = False,
) -> bytes:
    """kvrpcpb.RawScanRequest: start_key=2, limit=3, key_only=4, end_key=7
    (context=1/reverse=5/cf=6 omitted — proto3 defaults).  Matches the
    paginated ascending scan the reference issues (scan/scan.go:44-60):
    half-open [start, end), resume cursor in start_key."""
    return (
        _field_bytes(2, start_key or b"")
        + _field_varint(3, limit)
        + _field_varint(4, int(key_only))
        + _field_bytes(7, end_key or b"")
    )


def decode_raw_scan_request(data: bytes) -> dict:
    f = decode_fields(data)
    return {
        "start_key": f.get(2, [b""])[0],
        "limit": f.get(3, [0])[0],
        "key_only": bool(f.get(4, [0])[0]),
        "end_key": f.get(7, [b""])[0],
    }


def encode_raw_scan_response(pairs: list[tuple[bytes, bytes]]) -> bytes:
    """kvrpcpb.RawScanResponse: kvs=3, each kvrpcpb.KvPair {key=2, value=3}."""
    out = b""
    for k, v in pairs:
        pair = _field_bytes(2, k) + _field_bytes(3, v)
        out += _field_bytes(3, pair)
    return out


def decode_raw_scan_response(data: bytes) -> list[tuple[bytes, bytes]]:
    pairs = []
    for raw in decode_fields(data).get(3, []):
        f = decode_fields(raw)
        pairs.append((f.get(2, [b""])[0], f.get(3, [b""])[0]))
    return pairs


# ----------------------------------------------------------- RawChecksum RPC


#: kvrpcpb.ChecksumAlgorithm: Crc64_Xor = 0
CHECKSUM_CRC64_XOR = 0


def encode_raw_checksum_request(ranges: list[tuple[bytes, bytes]]) -> bytes:
    """kvrpcpb.RawChecksumRequest: algorithm=2 (Crc64_Xor=0, omitted as the
    proto3 default), ranges=3 — each kvrpcpb.KeyRange {start_key=1,
    end_key=2}.  One request per region sub-range, exactly the reference's
    per-region Checksum call (checksum/checksum.go:83)."""
    out = b""
    for start, end in ranges:
        out += _field_bytes(3, _field_bytes(1, start) + _field_bytes(2, end))
    return out


def decode_raw_checksum_request(data: bytes) -> list[tuple[bytes, bytes]]:
    out = []
    for raw in decode_fields(data).get(3, []):
        f = decode_fields(raw)
        out.append((f.get(1, [b""])[0], f.get(2, [b""])[0]))
    return out


def encode_raw_checksum_response(crc64_xor: int, total_kvs: int, total_bytes: int) -> bytes:
    """kvrpcpb.RawChecksumResponse: checksum=3, total_kvs=4, total_bytes=5 —
    the commutative-monoid triple the reference merges per region
    (checksum/checksum.go:25-29)."""
    return (
        _field_varint(3, crc64_xor)
        + _field_varint(4, total_kvs)
        + _field_varint(5, total_bytes)
    )


def decode_raw_checksum_response(data: bytes) -> tuple[int, int, int]:
    f = decode_fields(data)
    return (
        f.get(3, [0])[0],
        f.get(4, [0])[0],
        f.get(5, [0])[0],
    )


# -------------------------------------------------- API-version handshake


def parse_api_version(pd_config_json: bytes) -> str:
    """Extract the cluster API version from the PD config endpoint's JSON
    (``storage.api-version``: 1 → V1, 2 → V2), the metadata the reference's
    GetClusterAPIVersion handshake compares between src and dst before any
    operator runs (utils/utils.go:13-26; gate at checksum/checksum.go:134-137).
    ``storage.enable-ttl`` distinguishes V1TTL from V1."""
    cfg = json.loads(pd_config_json)
    storage = cfg.get("storage", {})
    v = int(storage.get("api-version", 1))
    if v == 2:
        return "V2"
    return "V1TTL" if storage.get("enable-ttl") else "V1"
