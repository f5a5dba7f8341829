"""Multimodal plumbing tests: metadata, Arrow-batched fake decode, stub gate."""

import pytest
from pyspark.sql import functions as F

from tikv_data_compare_spark.operators import multimodal as mm


def test_payload_meta_closed_form(spark):
    df = spark.createDataFrame([(1, "abcd"), (2, "é")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in mm.payload_meta(df).collect()}
    assert rows[1]["n_bytes"] == 4 and rows[1]["n_chunks"] == 1
    assert rows[2]["n_bytes"] == 2  # UTF-8 two bytes
    assert rows[1]["content_id"] is not None


def test_decode_features_fake_path(spark, documents):
    docs = documents.limit(10)
    feats = mm.decode_features(docs)
    rows = {r["doc_id"]: r for r in feats.collect()}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(rows) == set(src)
    for did, r in rows.items():
        payload = src[did].encode()
        assert r["n_bytes"] == len(payload)
        assert r["decoded"] is True
        assert len(r["byte_histogram_head"]) == 4
        assert abs(r["byte_mean"] - (sum(payload) / len(payload))) < 1e-9


def test_decode_features_real_decode_raises(spark, documents):
    feats = mm.decode_features(documents.limit(2), real_decode=True)
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        feats.collect()


def test_frame_sample_offsets(spark):
    df = spark.createDataFrame([(1, "x" * 130)], "doc_id long, text string")
    rows = mm.frame_sample(df, every_n_bytes=64).collect()
    assert [(r["frame_idx"], r["byte_offset"]) for r in rows] == [(0, 0), (1, 64), (2, 128)]


def _png_bytes(w, h):
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00"
    )


def _jpeg_bytes(w, h):
    # SOI + APP0 (JFIF, 16-byte segment) + SOF0 with dims + EOI
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x03" + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif_bytes(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00\x00\x00"


def test_image_dims_header_parsing(spark):
    """PNG/JPEG/GIF header parsing is REAL (struct offsets / SOF marker
    walk), exercised through the distributed Arrow path; junk payloads map
    to NULLs instead of failing the batch."""
    from tikv_data_compare_spark.operators.multimodal import image_dims, parse_image_header

    assert parse_image_header(_png_bytes(640, 480)) == ("png", 640, 480)
    assert parse_image_header(_jpeg_bytes(1920, 1080)) == ("jpeg", 1920, 1080)
    assert parse_image_header(_gif_bytes(320, 200)) == ("gif", 320, 200)
    assert parse_image_header(b"not an image") is None

    rows = [
        (1, bytearray(_png_bytes(640, 480))),
        (2, bytearray(_jpeg_bytes(1920, 1080))),
        (3, bytearray(_gif_bytes(320, 200))),
        (4, bytearray(b"garbage payload")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in image_dims(df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 640, 480)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("jpeg", 1920, 1080)
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("gif", 320, 200)
    assert got[4]["format"] is None and got[4]["width"] is None


def _wav_bytes(ch=2, sr=44100, bits=16, dsz=1000, extra_chunk=False):
    import struct

    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * ch * bits // 8, ch * bits // 8, bits)
    chunks = fmt
    if extra_chunk:
        chunks += b"LIST" + struct.pack("<I", 4) + b"INFO"
    chunks += b"data" + struct.pack("<I", dsz)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_parse_wav_header():
    from tikv_data_compare_spark.operators.multimodal import parse_wav_header

    assert parse_wav_header(_wav_bytes(1, 8000, 8, 555)) == (1, 8000, 8, 555)
    # chunk walk must skip unknown chunks between fmt and data
    assert parse_wav_header(_wav_bytes(2, 48000, 16, 7, extra_chunk=True)) == (2, 48000, 16, 7)
    assert parse_wav_header(b"RIFFxxxxWAVE") is None  # no fmt/data chunks
    assert parse_wav_header(b"not audio at all") is None
    assert parse_wav_header(b"") is None


def test_audio_meta_distributed(spark):
    from tikv_data_compare_spark.operators.multimodal import audio_meta

    rows = [
        (1, _wav_bytes(1, 16000, 8, 321)),
        (2, _wav_bytes(2, 44100, 16, 4321, extra_chunk=True)),
        (3, b"garbage payload"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in audio_meta(df).collect()}
    assert (got[1]["channels"], got[1]["sample_rate"], got[1]["bits"], got[1]["data_size"]) == (1, 16000, 8, 321)
    assert (got[2]["channels"], got[2]["sample_rate"], got[2]["bits"], got[2]["data_size"]) == (2, 44100, 16, 4321)
    assert got[3]["channels"] is None and got[3]["data_size"] is None


def test_wav_header_roundtrip_property():
    """Any synthesized RIFF/WAVE header must parse back to its own fields
    (struct-pack → chunk-walk inverse), with or without an interposed
    chunk."""
    from hypothesis import given, settings, strategies as st

    from tikv_data_compare_spark.operators.multimodal import parse_wav_header

    @settings(max_examples=200, deadline=None)
    @given(
        ch=st.integers(1, 8),
        sr=st.integers(1, 384_000),
        bits=st.sampled_from([8, 16, 24, 32]),
        dsz=st.integers(0, 2**31 - 1),
        extra=st.booleans(),
    )
    def check(ch, sr, bits, dsz, extra):
        data = _wav_bytes(ch, sr, bits, dsz, extra_chunk=extra)
        assert parse_wav_header(data) == (ch, sr, bits, dsz)

    check()


def test_image_header_roundtrip_property():
    """PNG (big-endian) and GIF (little-endian) headers parse back to their
    synthesized dimensions."""
    import struct

    from hypothesis import given, settings, strategies as st

    from tikv_data_compare_spark.operators.multimodal import parse_image_header

    @settings(max_examples=200, deadline=None)
    @given(w=st.integers(0, 2**16 - 1), h=st.integers(0, 2**16 - 1), gif=st.booleans())
    def check(w, h, gif):
        if gif:
            data = b"GIF89a" + struct.pack("<HH", w, h)
        else:
            data = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", w, h)
        fmt, pw, ph = parse_image_header(data)
        assert (fmt, pw, ph) == ("gif" if gif else "png", w, h)

    check()


def test_jpeg_fill_bytes_between_segments():
    from tikv_data_compare_spark.operators.multimodal import parse_image_header

    # SOI, APP0(len 4), a run of 0xFF fill bytes (legal padding, ITU T.81
    # B.1.1.2), then SOF0 with height=7 width=9
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0\x00\x04\x00\x00"
        + b"\xff\xff\xff"  # fill bytes
        + b"\xff\xc0\x00\x11\x08" + (7).to_bytes(2, "big") + (9).to_bytes(2, "big")
        + b"\x00" * 8
    )
    assert parse_image_header(jpeg) == ("jpeg", 9, 7)


def test_jpeg_walk_stops_at_sos():
    from tikv_data_compare_spark.operators.multimodal import parse_image_header

    # SOS before any SOF: the walk must stop (entropy-coded data follows),
    # not keep scanning compressed bytes that may contain FF Cx sequences
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xda\x00\x04\x00\x00"  # SOS
        + b"\xff\xc0\x00\x11\x08" + (7).to_bytes(2, "big") + (9).to_bytes(2, "big")
        + b"\x00" * 8
    )
    assert parse_image_header(jpeg) is None


def test_media_probe_matches_single_modality_parsers(spark):
    """media_probe (one Arrow pass over both payload columns) must agree
    field-for-field with image_dims + audio_meta run separately."""
    from pyspark.sql import functions as F

    from tikv_data_compare_spark.operators.multimodal import (
        audio_meta,
        image_dims,
        media_probe,
    )

    png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
        + (320).to_bytes(4, "big") + (240).to_bytes(4, "big")
    )
    gif = b"GIF89a" + (12).to_bytes(2, "little") + (34).to_bytes(2, "little")
    wav = (
        b"RIFF" + (36 + 8).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (2).to_bytes(2, "little") + (44100).to_bytes(4, "little")
        + (176400).to_bytes(4, "little") + (4).to_bytes(2, "little")
        + (16).to_bytes(2, "little") + b"data" + (8).to_bytes(4, "little")
    )
    rows = [
        (1, "alpha", png, wav),
        (2, "beta", gif, b"junkjunkjunkjunk"),
        (3, "gamma", b"not an image", wav),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, image_payload binary, audio_payload binary"
    )
    probe = {r["doc_id"]: r for r in media_probe(df, passthrough_cols=["text"]).collect()}
    img = {
        r["doc_id"]: r
        for r in image_dims(df.select("doc_id", F.col("image_payload").alias("payload"))).collect()
    }
    aud = {
        r["doc_id"]: r
        for r in audio_meta(df.select("doc_id", F.col("audio_payload").alias("payload"))).collect()
    }
    for doc_id, text, *_ in rows:
        p = probe[doc_id]
        assert p["text"] == text
        assert (p["format"], p["width"], p["height"]) == (
            img[doc_id]["format"], img[doc_id]["width"], img[doc_id]["height"],
        )
        assert (p["channels"], p["sample_rate"], p["bits"], p["data_size"]) == (
            aud[doc_id]["channels"], aud[doc_id]["sample_rate"],
            aud[doc_id]["bits"], aud[doc_id]["data_size"],
        )


def test_media_probe_passthrough_keeps_input_types(spark):
    """Non-string passthrough columns (long, binary) must keep their input
    types in the probe output — not be coerced to string."""
    from tikv_data_compare_spark.operators.multimodal import media_probe

    rows = [(1, 7, b"\x01\x02", None, None)]
    df = spark.createDataFrame(
        rows, "doc_id long, rank long, blob binary, image_payload binary, audio_payload binary"
    )
    out = media_probe(df, passthrough_cols=["rank", "blob"])
    dts = dict(out.dtypes)
    assert dts["rank"] == "bigint" and dts["blob"] == "binary"
    r = out.collect()[0]
    assert r["rank"] == 7 and bytes(r["blob"]) == b"\x01\x02" and r["format"] is None

    with pytest.raises(ValueError, match="passthrough_cols"):
        media_probe(df, passthrough_cols=["nope"])
