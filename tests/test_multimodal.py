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


def _crc_chunk(typ: bytes, payload: bytes) -> bytes:
    import zlib

    return (
        len(payload).to_bytes(4, "big")
        + typ
        + payload
        + (zlib.crc32(typ + payload) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _encode_png(pixels: list[list[int]], width: int, channels: int, filters: list[int]) -> bytes:
    """Forward-filter + deflate planted pixel rows into a real PNG, so the
    decoder under test must invert every filter type it's handed."""
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    height, stride, bpp = len(pixels), width * channels, channels
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    raw = bytearray()
    prev = [0] * stride
    for row, f in zip(pixels, filters):
        assert len(row) == stride
        out = list(row)
        if f == 1:  # Sub
            for i in range(stride - 1, -1, -1):
                a = row[i - bpp] if i >= bpp else 0
                out[i] = (row[i] - a) & 0xFF
        elif f == 2:  # Up
            out = [(row[i] - prev[i]) & 0xFF for i in range(stride)]
        elif f == 3:  # Average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                out[i] = (row[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[i] = (row[i] - pred) & 0xFF
        raw += bytes([f]) + bytes(out)
        prev = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + _crc_chunk(b"IHDR", ihdr)
        + _crc_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _crc_chunk(b"IEND", b"")
    )


def _encode_wav(samples: list[int], channels: int = 1, rate: int = 8000) -> bytes:
    import struct

    payload = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_png_all_filter_types():
    """Planted pixels, every PNG filter type (None/Sub/Up/Average/Paeth) on
    a 4x5 RGB image — the decoder must invert each scanline exactly."""
    import random

    rng = random.Random(7)
    w, ch = 4, 3
    pixels = [[rng.randrange(256) for _ in range(w * ch)] for _ in range(5)]
    data = _encode_png(pixels, w, ch, filters=[0, 1, 2, 3, 4])
    width, height, channels, decoded = mm.decode_png(data)
    assert (width, height, channels) == (w, 5, ch)
    assert list(decoded) == [b for row in pixels for b in row]


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_decode_png_color_types(channels):
    w = 3
    pixels = [[(y * 50 + i) % 256 for i in range(w * channels)] for y in range(2)]
    data = _encode_png(pixels, w, channels, filters=[4, 4])
    width, height, ch, decoded = mm.decode_png(data)
    assert (width, height, ch) == (w, 2, channels)
    assert list(decoded) == [b for row in pixels for b in row]


def test_decode_png_rejects_out_of_lattice():
    assert mm.decode_png(b"not a png at all") is None
    # 16-bit depth: recognized as PNG but outside the baseline lattice
    data = bytearray(_encode_png([[1, 2, 3]], 3, 1, filters=[0]))
    data[8 + 4 + 4 + 8] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError, match="unsupported PNG lattice"):
        mm.decode_png(bytes(data))


def test_decode_wav_pcm_planted_samples():
    samples = [0, 1000, -1000, 32767, -32768, 5]
    ch, rate, got = mm.decode_wav_pcm(_encode_wav(samples, channels=1, rate=16000))
    assert (ch, rate) == (1, 16000)
    assert list(got) == samples
    assert mm.decode_wav_pcm(b"RIFFxxxxJUNK") is None


def test_decode_features_real_decode_end_to_end(spark):
    """real_decode=True decodes planted PNG pixels / WAV samples inside the
    Arrow workers; features are computed over the DECODED content bytes
    (pixel mean, PCM byte count), and non-media payloads fall back to
    raw-byte features with decoded=false."""
    png = _encode_png([[10, 20], [30, 40]], 2, 1, filters=[0, 2])  # gray 2x2
    wav = _encode_wav([256, -256])  # 4 PCM payload bytes
    rows = [(1, png), (2, wav), (3, b"plain text payload")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in mm.decode_features(df, real_decode=True, payload_col="payload").collect()
    }
    assert got[1]["decoded"] is True
    assert got[1]["n_bytes"] == 4  # 2x2 gray pixels, not the container size
    assert abs(got[1]["byte_mean"] - (10 + 20 + 30 + 40) / 4) < 1e-9
    assert got[2]["decoded"] is True
    assert got[2]["n_bytes"] == 4  # two int16 samples
    assert got[3]["decoded"] is False
    assert got[3]["n_bytes"] == len(b"plain text payload")


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


def test_resize_images_planted_pixels(spark):
    """Nearest-neighbor resize of a planted 4x2 PNG: downsample to 2x1 and
    upsample to 8x4 pick exactly the expected source pixels."""
    px = [[10, 0, 0], [0, 20, 0], [0, 0, 30], [40, 40, 40]]
    row = [v for p in px for v in p]  # 4 RGB pixels, flat scanline
    png = _encode_png([row, row], width=4, channels=3, filters=[0, 0])
    df = spark.createDataFrame([(1, bytearray(png)), (2, bytearray(b"junk"))],
                               "doc_id long, payload binary")
    rows = {r["doc_id"]: r for r in mm.resize_images(df, 2, 1).collect()}
    assert rows[2]["decoded"] is False and rows[2]["rgb"] is None
    r1 = rows[1]
    assert (r1["src_w"], r1["src_h"], r1["decoded"]) == (4, 2, True)
    got = list(bytes(r1["rgb"]))
    # centers at x=(0.5,1.5)*4/2 -> src cols 1 and 3; y center -> src row 1
    assert got == px[1] + px[3]

    up = {r["doc_id"]: r for r in mm.resize_images(df, 8, 4).collect()}
    rgb = bytes(up[1]["rgb"])
    assert len(rgb) == 8 * 4 * 3
    # every output pixel must be one of the four source pixels
    pix = {tuple(rgb[i : i + 3]) for i in range(0, len(rgb), 3)}
    assert pix <= {tuple(p) for p in px}

    with pytest.raises(ValueError, match=">= 1"):
        mm.resize_images(df, 0, 4)


def test_resize_images_normalizes_non_rgb_to_rgb(spark):
    """r9 (r8 ADVICE): grayscale / gray+alpha / RGBA decodes all honor the
    documented out_w*out_h*3 RGB contract — luma replicated, alpha dropped,
    BEFORE resampling."""
    gray = _encode_png([[10, 20], [30, 40]], 2, 1, filters=[0, 0])
    gray_a = _encode_png([[10, 200, 20, 201], [30, 202, 40, 203]], 2, 2, filters=[0, 0])
    rgba = _encode_png(
        [[1, 2, 3, 250, 4, 5, 6, 251], [7, 8, 9, 252, 10, 11, 12, 253]],
        2, 4, filters=[0, 0],
    )
    df = spark.createDataFrame(
        [(1, bytearray(gray)), (2, bytearray(gray_a)), (3, bytearray(rgba))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in mm.resize_images(df, 2, 2).collect()}
    for i in (1, 2, 3):
        assert rows[i]["decoded"] is True
        assert len(bytes(rows[i]["rgb"])) == 2 * 2 * 3
    # identity resize (2x2 -> 2x2): exact expected pixel bytes
    assert list(bytes(rows[1]["rgb"])) == [10] * 3 + [20] * 3 + [30] * 3 + [40] * 3
    assert list(bytes(rows[2]["rgb"])) == [10] * 3 + [20] * 3 + [30] * 3 + [40] * 3
    assert list(bytes(rows[3]["rgb"])) == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]


def test_audio_frames_windowing(spark):
    """Planted PCM: frame boundaries, per-frame RMS/peak, and non-WAV rows
    dropping out."""
    import math

    samples = [100] * 8 + [-200] * 8
    wav = _encode_wav(samples, channels=1, rate=8000)
    df = spark.createDataFrame([(7, bytearray(wav)), (8, bytearray(b"nope"))],
                               "doc_id long, payload binary")
    rows = sorted(
        (r["frame_idx"], r["start_sample"], r["n_samples"], r["rms"], r["peak"])
        for r in mm.audio_frames(df, frame_len=8, hop=4).collect()
    )
    # frames at starts 0, 4, 8 (len 16, frame 8, hop 4 -> starts 0..8)
    assert [(r[0], r[1], r[2]) for r in rows] == [(0, 0, 8), (1, 4, 8), (2, 8, 8)]
    assert rows[0][3] == pytest.approx(100.0) and rows[0][4] == 100
    assert rows[1][3] == pytest.approx(math.sqrt((4 * 100**2 + 4 * 200**2) / 8))
    assert rows[2][3] == pytest.approx(200.0) and rows[2][4] == 200


# ------------------------------------------------------------ image dhash


def _gradient_png(w, h, noise: dict | None = None, seed_shift: int = 0):
    """An RGB image with a strong horizontal gradient (stable dhash bits)
    plus optional per-pixel overrides {(x, y): value}."""
    rows = []
    for y in range(h):
        row = []
        for x in range(w):
            v = (x * 255 // max(w - 1, 1) + seed_shift) % 256
            if noise and (x, y) in noise:
                v = noise[(x, y)]
            row += [v, v, v]
        rows.append(row)
    return _encode_png(rows, w, len(rows) and 3, [0] * h)


def test_image_dhash_deterministic_and_perceptual(spark):
    from tikv_data_compare_spark.operators.multimodal import image_dhash

    base = _gradient_png(32, 32)
    noisy = _gradient_png(32, 32, noise={(5, 5): 250, (20, 9): 3})
    inverted = _gradient_png(32, 32, seed_shift=128)  # wraps → different layout
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(base)), (3, bytearray(noisy)),
         (4, bytearray(inverted)), (5, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in image_dhash(df).collect()}
    assert rows[1]["dhash"] == rows[2]["dhash"]          # identical bytes
    assert rows[1]["decoded"] and not rows[5]["decoded"]
    assert rows[5]["dhash"] is None
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    # few-pixel noise: small distance; wrapped gradient: large
    assert ham(rows[1]["dhash"], rows[3]["dhash"]) <= 6
    assert ham(rows[1]["dhash"], rows[4]["dhash"]) > 6
    # two runs bit-identical
    again = {r["doc_id"]: r["dhash"] for r in image_dhash(df.repartition(3)).collect()}
    assert all(again[i] == rows[i]["dhash"] for i in (1, 2, 3, 4))


def test_dhash_pairs_banded_join(spark):
    from tikv_data_compare_spark.operators.multimodal import dhash_pairs, image_dhash

    base = _gradient_png(32, 32)
    noisy = _gradient_png(32, 32, noise={(5, 5): 250})
    inverted = _gradient_png(32, 32, seed_shift=128)
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(noisy)), (3, bytearray(inverted)),
         (4, bytearray(b"junk"))],
        "doc_id long, payload binary",
    )
    hashes = image_dhash(df)
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dhash_pairs(hashes, max_hamming=6).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert all(3 not in p and 4 not in p for p in pairs)
    # pigeonhole recall: a hash with exactly max_hamming flips in distinct
    # bands still shares a band
    import pytest
    h = spark.createDataFrame(
        [(10, 0), (11, 0b10000001_00000001_00000001 << 8)],  # 4 flips, 3 bands
        "doc_id long, dhash long",
    )
    got = dhash_pairs(h, max_hamming=6).collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in got] == [(10, 11, 4)]
    with pytest.raises(ValueError, match="n_bands"):
        dhash_pairs(h, n_bands=0)
    with pytest.raises(ValueError, match="geometry"):
        from tikv_data_compare_spark.operators.multimodal import image_dhash as ih
        ih(df, hash_w=9, hash_h=9)


def test_image_dhash_null_payload_survives(spark):
    from tikv_data_compare_spark.operators.multimodal import image_dhash

    df = spark.createDataFrame(
        [(1, bytearray(_gradient_png(16, 16))), (2, None)],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in image_dhash(df).collect()}
    assert rows[1]["decoded"] and rows[2]["dhash"] is None
    assert not rows[2]["decoded"]
