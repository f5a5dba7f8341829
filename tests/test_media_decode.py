"""GIF LZW + baseline JPEG decoder tests: planted pixels through real
container bytes built by pure-Python test-side encoders, so the decoders
must invert genuine LZW streams / Huffman-coded scans — no image library
on either side."""

import pytest

from tikv_data_compare_spark.operators import media_decode as md
from tikv_data_compare_spark.operators import multimodal as mm

# ---------------------------------------------------------------------------
# GIF test-side encoder: real LZW with dictionary growth + width bumps
# ---------------------------------------------------------------------------


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Proper GIF LZW compression (dictionary growth, variable code width).
    Code widths are derived by replaying the DECODER's width schedule, so a
    sync bug in either direction fails the roundtrip test."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    codes = [clear]
    prefix = b""
    for b in indices:
        nxt = prefix + bytes([b])
        if nxt in table:
            prefix = nxt
            continue
        codes.append(table[prefix])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
        prefix = bytes([b])
    if prefix:
        codes.append(table[prefix])
    codes.append(end)

    # pack LSB-first, replaying the decoder's width/table-size model
    out = bytearray()
    acc = nbits = 0
    width = min_code_size + 1
    table_size = end + 1
    prev_seen = False
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if c == clear:
            width, table_size, prev_seen = min_code_size + 1, end + 1, False
        elif c != end:
            if prev_seen and table_size < 4096:
                table_size += 1
            prev_seen = True
            if table_size == (1 << width) and width < 12:
                width += 1
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _encode_gif(indices: bytes, width: int, height: int, palette: list[tuple[int, int, int]]) -> bytes:
    assert len(indices) == width * height
    pal_bits = max(1, (len(palette) - 1).bit_length())
    pal_n = 1 << pal_bits
    gct = b"".join(bytes(c) for c in palette) + b"\x00\x00\x00" * (pal_n - len(palette))
    min_code_size = max(2, pal_bits)
    lzw = _lzw_encode(indices, min_code_size)
    sub_blocks = b"".join(
        bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255] for i in range(0, len(lzw), 255)
    )
    return (
        b"GIF89a"
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + bytes([0x80 | (pal_bits - 1), 0, 0])
        + gct
        + b"\x2c"
        + b"\x00\x00\x00\x00"
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + b"\x00"
        + bytes([min_code_size])
        + sub_blocks
        + b"\x00"
        + b"\x3b"
    )


def test_decode_gif_planted_pixels():
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    indices = bytes([0, 1, 2, 3, 3, 2, 1, 0, 0, 0, 2, 2])  # 4x3
    w, h, ch, rgb = md.decode_gif(_encode_gif(indices, 4, 3, palette))
    assert (w, h, ch) == (4, 3, 3)
    expect = b"".join(bytes(palette[i]) for i in indices)
    assert rgb == expect


def test_decode_gif_skips_extensions_and_rejects():
    palette = [(1, 2, 3), (4, 5, 6)]
    indices = bytes([0, 1, 1, 0])
    data = _encode_gif(indices, 2, 2, palette)
    # splice a graphic-control extension between LSD+GCT and the image
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    head_len = 13 + 3 * 2  # header+LSD + padded GCT (2 colors -> 2 entries)
    data = data[:head_len] + gce + data[head_len:]
    w, h, ch, rgb = md.decode_gif(data)
    assert (w, h) == (2, 2)
    assert rgb == b"".join(bytes(palette[i]) for i in indices)

    assert md.decode_gif(b"not a gif") is None
    # interlaced flag -> out of lattice
    raw = bytearray(_encode_gif(indices, 2, 2, palette))
    raw[13 + 6 + 9] |= 0x40  # image-descriptor packed byte
    with pytest.raises(ValueError, match="interlaced"):
        md.decode_gif(bytes(raw))


def test_gif_lzw_roundtrip_property():
    """decode(encode(x)) == x over random index streams — exercises
    dictionary growth, code-width bumps and the KwKwK case."""
    import random

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        n=st.integers(1, 600),
        alphabet=st.sampled_from([2, 4, 7, 16, 256]),
    )
    def check(seed, n, alphabet):
        rng = random.Random(seed)
        # runs of repeats make the dictionary actually grow
        indices = bytearray()
        while len(indices) < n:
            sym = rng.randrange(alphabet)
            indices += bytes([sym]) * rng.randint(1, 6)
        indices = bytes(indices[:n])
        mcs = max(2, (alphabet - 1).bit_length())
        assert md._lzw_decode(_lzw_encode(indices, mcs), mcs) == indices

    check()


# ---------------------------------------------------------------------------
# JPEG test-side encoder: DC-only flat blocks, custom canonical Huffman
# ---------------------------------------------------------------------------

_DC_BITS = [0, 0, 0, 12] + [0] * 12  # 12 categories, all 4-bit codes
_DC_HUFFVAL = bytes(range(12))
_AC_BITS = [1] + [0] * 15  # single 1-bit code: EOB
_AC_HUFFVAL = bytes([0x00])

# richer AC table for coefficient tests: EOB, ZRL and (run 0..15, size 1..10)
# all as 8-bit canonical codes (162 of 256 — the all-ones code stays unused)
_AC_FULL_HUFFVAL = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_FULL_BITS = [0] * 7 + [len(_AC_FULL_HUFFVAL)] + [0] * 8
_AC_FULL_CODE = {sym: i for i, sym in enumerate(_AC_FULL_HUFFVAL)}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = self.nbits = 0

    def align(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _encode_dc(writer: _BitWriter, diff: int) -> None:
    cat = abs(diff).bit_length()
    writer.write(cat, 4)  # our DC table: category c -> code c, width 4
    if cat:
        writer.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    writer.write(0, 1)  # EOB (our AC table: code 0, width 1)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _encode_jpeg_flat(
    width: int,
    height: int,
    comps: list[tuple[int, int]],
    block_values: list[list[int]],
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG of flat 8x8 blocks.  ``comps`` lists per-component
    (h, v) sampling factors; ``block_values[ci]`` gives the flat pixel value
    (0..255) of each of that component's blocks in MCU/encode order.  Quant
    table is all-ones, so block DC = 8 * (value - 128) exactly."""
    dqt = _seg(0xDB, b"\x00" + b"\x01" * 64)
    dht = _seg(
        0xC4,
        b"\x00" + bytes(_DC_BITS) + _DC_HUFFVAL + b"\x10" + bytes(_AC_BITS) + _AC_HUFFVAL,
    )
    sof = b"\x08" + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([len(comps)])
    for ci, (h, v) in enumerate(comps):
        sof += bytes([ci + 1, (h << 4) | v, 0])
    sos = bytes([len(comps)])
    for ci in range(len(comps)):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    head = b"\xff\xd8" + dqt + dht + _seg(0xC0, sof) + _seg(0xDA, sos)
    if restart_interval:
        head = head[: -len(_seg(0xDA, sos))] + _seg(
            0xDD, restart_interval.to_bytes(2, "big")
        ) + _seg(0xDA, sos)

    hmax = max(h for h, _ in comps)
    vmax = max(v for _, v in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    writer = _BitWriter()
    dc_pred = [0] * len(comps)
    block_pos = [0] * len(comps)
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.align()
            writer.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            dc_pred = [0] * len(comps)
        for ci, (h, v) in enumerate(comps):
            for _ in range(h * v):
                value = block_values[ci][block_pos[ci]]
                block_pos[ci] += 1
                dc = 8 * (value - 128)
                _encode_dc(writer, dc - dc_pred[ci])
                dc_pred[ci] = dc
    writer.align()
    return head + bytes(writer.out) + b"\xff\xd9"


def _encode_jpeg_coefs(width: int, height: int, quant: list[int], blocks) -> bytes:
    """Grayscale baseline JPEG from QUANTIZED coefficient blocks (raster
    8x8 order) — full AC run-length/ZRL/EOB encoding against the rich AC
    table, custom quant table emitted in zigzag order per the spec."""
    dqt = _seg(0xDB, b"\x00" + bytes(quant[md._ZIGZAG[z]] for z in range(64)))
    dht = _seg(
        0xC4,
        b"\x00" + bytes(_DC_BITS) + _DC_HUFFVAL
        + b"\x10" + bytes(_AC_FULL_BITS) + _AC_FULL_HUFFVAL,
    )
    sof = b"\x08" + height.to_bytes(2, "big") + width.to_bytes(2, "big") + b"\x01\x01\x11\x00"
    sos = b"\x01\x01\x00\x00\x3f\x00"
    writer = _BitWriter()
    dc_pred = 0
    for block in blocks:
        assert len(block) == 64
        diff = block[0] - dc_pred
        dc_pred = block[0]
        cat = abs(diff).bit_length()
        writer.write(cat, 4)
        if cat:
            writer.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
        run = 0
        for z in range(1, 64):
            v = block[md._ZIGZAG[z]]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                writer.write(_AC_FULL_CODE[0xF0], 8)  # ZRL
                run -= 16
            size = abs(v).bit_length()
            writer.write(_AC_FULL_CODE[(run << 4) | size], 8)
            writer.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if run:
            writer.write(_AC_FULL_CODE[0x00], 8)  # EOB
    writer.align()
    return (
        b"\xff\xd8" + dqt + dht + _seg(0xC0, sof) + _seg(0xDA, sos)
        + bytes(writer.out) + b"\xff\xd9"
    )


def test_decode_jpeg_ac_coefficients_full_pipeline():
    """Planted AC coefficients + a non-trivial quant table: the decoder's
    Huffman AC run-length decode, ZRL handling, dezigzag and dequantize must
    reproduce an independently-computed IDCT exactly."""
    import random

    import numpy as np

    rng = random.Random(1234)
    quant = [1 + ((i * 7) % 13) for i in range(64)]
    blocks = []
    for _ in range(4):
        block = [0] * 64
        block[0] = rng.randint(-64, 64)
        # scatter nonzero ACs: some adjacent (run 0), some after long zero
        # gaps (forces ZRL), sizes up to 8 bits
        for z in rng.sample(range(1, 64), 9) + [30, 55]:
            block[md._ZIGZAG[z]] = rng.choice([-1, 1]) * rng.randint(1, 255)
        blocks.append(block)
    data = _encode_jpeg_coefs(32, 8, quant, blocks)
    w, h, ch, pix = md.decode_jpeg(data)
    assert (w, h, ch) == (32, 8, 1)

    # independent IDCT reference
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    basis = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8)
    basis[0, :] = np.sqrt(1.0 / 8)
    q = np.array(quant).reshape(8, 8)
    img = np.frombuffer(pix, dtype=np.uint8).reshape(8, 32)
    for bi, block in enumerate(blocks):
        coef = np.array(block).reshape(8, 8) * q
        want = np.clip(np.round(basis.T @ coef @ basis + 128), 0, 255).astype(np.uint8)
        got = img[:, 8 * bi : 8 * bi + 8]
        assert (got == want).all(), f"block {bi} mismatch"


def test_decode_jpeg_zrl_sixteen_zero_run():
    """A >15 zero run between ACs must round-trip through the ZRL symbol."""
    import numpy as np

    block = [0] * 64
    block[0] = 8  # DC
    block[md._ZIGZAG[1]] = 40
    block[md._ZIGZAG[20]] = -25  # 18 zeros after z=1 -> ZRL + run 2
    data = _encode_jpeg_coefs(8, 8, [1] * 64, [block])
    w, h, ch, pix = md.decode_jpeg(data)
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    basis = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8)
    basis[0, :] = np.sqrt(1.0 / 8)
    want = np.clip(
        np.round(basis.T @ np.array(block, dtype=float).reshape(8, 8) @ basis + 128), 0, 255
    ).astype(np.uint8)
    assert (np.frombuffer(pix, dtype=np.uint8).reshape(8, 8) == want).all()


def test_decode_jpeg_grayscale_flat_blocks():
    """16x8 grayscale, two flat blocks: decoded pixels must equal the
    planted values exactly (all-ones quant + DC-only -> exact IDCT)."""
    data = _encode_jpeg_flat(16, 8, [(1, 1)], [[133, 61]])
    w, h, ch, pix = md.decode_jpeg(data)
    assert (w, h, ch) == (16, 8, 1)
    import numpy as np

    img = np.frombuffer(pix, dtype=np.uint8).reshape(8, 16)
    assert (img[:, :8] == 133).all()
    assert (img[:, 8:] == 61).all()


def test_decode_jpeg_color_444():
    """8x8 YCbCr 4:4:4 flat planes -> BT.601 RGB, checked closed-form."""
    import numpy as np

    y, cb, cr = 90, 200, 60
    data = _encode_jpeg_flat(8, 8, [(1, 1), (1, 1), (1, 1)], [[y], [cb], [cr]])
    w, h, ch, pix = md.decode_jpeg(data)
    assert (w, h, ch) == (8, 8, 3)
    r = int(np.clip(round(y + 1.402 * (cr - 128)), 0, 255))
    g = int(np.clip(round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)), 0, 255))
    b = int(np.clip(round(y + 1.772 * (cb - 128)), 0, 255))
    img = np.frombuffer(pix, dtype=np.uint8).reshape(8, 8, 3)
    assert (img == [r, g, b]).all()


def test_decode_jpeg_420_subsampling():
    """16x16 4:2:0: four flat Y blocks (one MCU), neutral chroma — each 8x8
    quadrant must carry its own planted luma after chroma upsampling."""
    import numpy as np

    ys = [96, 112, 144, 176]  # MCU block order: (0,0) (0,1) (1,0) (1,1)
    data = _encode_jpeg_flat(16, 16, [(2, 2), (1, 1), (1, 1)], [ys, [128], [128]])
    w, h, ch, pix = md.decode_jpeg(data)
    assert (w, h, ch) == (16, 16, 3)
    img = np.frombuffer(pix, dtype=np.uint8).reshape(16, 16, 3)
    assert (img[:8, :8] == ys[0]).all()
    assert (img[:8, 8:] == ys[1]).all()
    assert (img[8:, :8] == ys[2]).all()
    assert (img[8:, 8:] == ys[3]).all()


def test_decode_jpeg_restart_markers():
    """DRI=1: an RSTn between every MCU; DC predictors reset across them."""
    import numpy as np

    data = _encode_jpeg_flat(24, 8, [(1, 1)], [[50, 128, 210]], restart_interval=1)
    w, h, ch, pix = md.decode_jpeg(data)
    img = np.frombuffer(pix, dtype=np.uint8).reshape(8, 24)
    assert (img[:, :8] == 50).all() and (img[:, 8:16] == 128).all() and (img[:, 16:] == 210).all()


def test_decode_jpeg_rejects_out_of_lattice():
    assert md.decode_jpeg(b"not a jpeg") is None
    data = bytearray(_encode_jpeg_flat(8, 8, [(1, 1)], [[100]]))
    sof_at = bytes(data).find(b"\xff\xc0")
    data[sof_at + 1] = 0xC2  # progressive
    with pytest.raises(ValueError, match="SOF2"):
        md.decode_jpeg(bytes(data))


def test_decode_jpeg_non_mcu_aligned_dims():
    """Dims not multiples of the MCU size: decoder must crop the padded
    plane back to the declared WxH."""
    import numpy as np

    # 12x5 grayscale: 2x1 MCU grid of 8x8 blocks, cropped to 12x5
    data = _encode_jpeg_flat(12, 5, [(1, 1)], [[70, 180]])
    w, h, ch, pix = md.decode_jpeg(data)
    assert (w, h, ch) == (12, 5, 1)
    img = np.frombuffer(pix, dtype=np.uint8).reshape(5, 12)
    assert (img[:, :8] == 70).all() and (img[:, 8:] == 180).all()


def test_decode_jpeg_single_component_ignores_sof_sampling():
    """Grayscale converted from 4:2:0 often keeps 2x2 SOF sampling factors;
    a single-component scan is non-interleaved per T.81 A.2, so the decoder
    must use 8x8 data units regardless of the declared factors."""
    import numpy as np

    data = bytearray(_encode_jpeg_flat(16, 8, [(1, 1)], [[133, 61]]))
    sof_at = bytes(data).find(b"\xff\xc0")
    assert data[sof_at + 11] == 0x11  # the single component's h/v byte
    data[sof_at + 11] = 0x22
    w, h, ch, pix = md.decode_jpeg(bytes(data))
    assert (w, h, ch) == (16, 8, 1)
    img = np.frombuffer(pix, dtype=np.uint8).reshape(8, 16)
    assert (img[:, :8] == 133).all() and (img[:, 8:] == 61).all()


def test_decode_jpeg_rejects_multi_scan_and_undefined_tables():
    # scan covering 1 of 3 components: legal baseline, outside our lattice
    data = bytearray(_encode_jpeg_flat(8, 8, [(1, 1), (1, 1), (1, 1)], [[90], [128], [128]]))
    sos_at = bytes(data).find(b"\xff\xda")
    data[sos_at + 4] = 1  # Ns
    with pytest.raises(ValueError, match="multi-scan"):
        md.decode_jpeg(bytes(data))

    # scan referencing an undefined Huffman table id -> ValueError, not KeyError
    data = bytearray(_encode_jpeg_flat(8, 8, [(1, 1)], [[100]]))
    sos_at = bytes(data).find(b"\xff\xda")
    data[sos_at + 6] = 0x11  # dc table 1 / ac table 1 (only 0 defined)
    with pytest.raises(ValueError, match="undefined Huffman table"):
        md.decode_jpeg(bytes(data))


def test_decode_features_corrupt_container_falls_back(spark):
    """A payload that LOOKS like a media container but is corrupt inside
    must fall back to raw-byte features — whatever the decoder raises —
    never fail the Arrow batch."""
    rows = [
        (1, b"\xff\xd8\xff\xc0\x00\x05ga"),  # JPEG SOI + truncated SOF
        (2, b"GIF89a\x02\x00\x02\x00\x80\x00\x00junk"),  # GIF + garbage body
        (3, b"\x89PNG\r\n\x1a\n truncated"),  # PNG sig + garbage
        (4, b"RIFF\x04\x00\x00\x00WAVE"),  # WAV with no fmt/data
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in mm.decode_features(df, real_decode=True, payload_col="payload").collect()
    }
    for doc_id, payload in rows:
        assert got[doc_id]["decoded"] is False
        assert got[doc_id]["n_bytes"] == len(payload)


def test_decode_features_real_decode_gif_jpeg(spark):
    """real_decode=True now decodes GIF and JPEG payloads inside the Arrow
    workers: features are computed over DECODED pixel bytes."""
    palette = [(0, 0, 0), (255, 255, 255)]
    gif = _encode_gif(bytes([0, 1, 1, 0]), 2, 2, palette)
    jpeg = _encode_jpeg_flat(8, 8, [(1, 1)], [[133]])
    df = spark.createDataFrame(
        [(1, gif), (2, jpeg)], "doc_id long, payload binary"
    )
    got = {
        r["doc_id"]: r
        for r in mm.decode_features(df, real_decode=True, payload_col="payload").collect()
    }
    assert got[1]["decoded"] is True
    assert got[1]["n_bytes"] == 2 * 2 * 3  # RGB pixels, not container bytes
    assert abs(got[1]["byte_mean"] - 127.5) < 1e-9  # half black, half white
    assert got[2]["decoded"] is True
    assert got[2]["n_bytes"] == 8 * 8  # grayscale pixels
    assert abs(got[2]["byte_mean"] - 133.0) < 1e-9


def test_truncated_streams_raise_valueerror_not_indexerror():
    """The documented malformed-payload contract is ValueError: direct
    callers catch it — a truncated entropy segment / GIF descriptor must
    not leak IndexError (r8, ADVICE)."""
    palette = [(1, 2, 3), (4, 5, 6)]
    indices = bytes([0, 1, 1, 0])
    gif = _encode_gif(indices, 2, 2, palette)
    # cut inside the image descriptor, at the LZW min-code-size byte, and
    # mid-LZW-data (underrun) — each a distinct truncation site
    for cut in (13 + 3 * 2 + 4, 13 + 3 * 2 + 10, len(gif) - 4):
        with pytest.raises(ValueError):
            md.decode_gif(gif[:cut])

    jpeg = _encode_jpeg_flat(16, 8, [(1, 1)], [[133, 61]])
    # cut inside the entropy-coded scan: the bit reader must report a
    # truncated stream, not index past the buffer
    with pytest.raises(ValueError, match="truncated"):
        md.decode_jpeg(jpeg[: len(jpeg) - 4])


def test_jpeg_zero_sampling_factor_rejected():
    """A declared sampling factor of 0 raises ValueError instead of dividing
    by zero in the MCU math (r8 high review)."""
    data = bytearray(_encode_jpeg_flat(16, 8, [(1, 1)], [[133, 61]]))
    # locate SOF0 and zero its h/v nibbles
    i = bytes(data).find(b"\xff\xc0")
    assert i > 0
    hv_off = i + 4 + 7  # marker(2) + len(2) + precision(1) + dims(4) + ncomp(1) + cid(1)
    data[hv_off] = 0x00
    with pytest.raises(ValueError, match="sampling factor"):
        md.decode_jpeg(bytes(data))
