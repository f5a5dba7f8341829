"""Pure-stdlib GIF and baseline-JPEG pixel decoders for the multimodal path.

Companions to :func:`multimodal.decode_png` / :func:`multimodal.decode_wav_pcm`:
no image library exists in this container, so decode is implemented from the
published container specs directly —

* GIF (GIF87a/GIF89a): logical-screen + image-descriptor struct walk, LZW
  decompression with variable code width / clear-code resets / dictionary
  growth, palette mapping to RGB.  First frame only, non-interlaced lattice.
* JPEG (baseline DCT, SOF0): DQT/DHT/SOF0/DRI/SOS marker walk, canonical
  Huffman table construction, entropy decode with byte-unstuffing and
  restart markers, dequantize + dezigzag, orthonormal 8×8 IDCT as two numpy
  matmuls, per-component upsampling for 4:2:0 / 4:2:2 chroma subsampling,
  YCbCr→RGB (JFIF full-range, ITU-R BT.601 coefficients).

Both follow the PNG decoder's contract: return ``None`` for payloads that
are not the container at all; raise ``ValueError`` for payloads inside the
container but outside the supported lattice (progressive JPEG, interlaced
GIF, truncated streams).  Callers that must not fail an Arrow batch catch
per row (multimodal.decode_features).

These are correctness-first baselines: at cluster scale a native decoder
would be swapped into the same mapInPandas seam without touching the plan
(see multimodal module docstring).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Decompress a GIF LZW stream (already de-sub-blocked).

    Variable code width starting at ``min_code_size+1``; CLEAR resets the
    dictionary and the width; width bumps when the next entry would not fit
    (capped at 12 bits per the GIF spec)."""
    clear_code = 1 << min_code_size
    end_code = clear_code + 1

    def fresh_table() -> list[bytes]:
        return [bytes([i]) for i in range(clear_code)] + [b"", b""]

    table = fresh_table()
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear_code:
                table = fresh_table()
                width = min_code_size + 1
                prev = None
                continue
            if code == end_code:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("GIF LZW: first code after clear not a literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"GIF LZW: code {code} beyond table size {len(table)}")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, int, bytes] | None:
    """(width, height, 3, rgb_bytes) from a GIF payload — REAL pixel decode:
    LZW decompression + palette mapping, stdlib only.  First image frame,
    non-interlaced; returns None for non-GIF payloads, raises for GIFs
    outside that lattice."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    packed = data[10]
    pos = 13
    global_palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_palette = data[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                raise ValueError("GIF: truncated stream (image descriptor cut short)")
            w = int.from_bytes(data[pos + 5 : pos + 7], "little")
            h = int.from_bytes(data[pos + 7 : pos + 9], "little")
            ipacked = data[pos + 9]
            pos += 10
            if ipacked & 0x40:
                raise ValueError("unsupported GIF lattice: interlaced frame")
            palette = global_palette
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                palette = data[pos : pos + 3 * n]
                pos += 3 * n
            if palette is None:
                raise ValueError("GIF frame has neither local nor global color table")
            if pos >= len(data):
                raise ValueError("GIF: truncated stream (no LZW minimum code size)")
            min_code_size = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                sz = data[pos]
                lzw += data[pos + 1 : pos + 1 + sz]
                pos += 1 + sz
            indices = _lzw_decode(bytes(lzw), min_code_size)
            if len(indices) < w * h:
                raise ValueError(
                    f"GIF LZW underrun: {len(indices)} indices for {w}x{h} frame"
                )
            # a frame smaller than the logical screen is returned as-is
            # (the frame's own dims, not the screen's)
            rgb = bytearray(w * h * 3)
            npal = len(palette) // 3
            for i in range(w * h):
                idx = indices[i]
                if idx >= npal:
                    raise ValueError(f"GIF palette index {idx} beyond table {npal}")
                rgb[3 * i : 3 * i + 3] = palette[3 * idx : 3 * idx + 3]
            return (w, h, 3, bytes(rgb))
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block introducer 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


# ---------------------------------------------------------------------------
# JPEG (baseline DCT)
# ---------------------------------------------------------------------------

#: JPEG zigzag order: zigzag index -> raster index in the 8x8 block
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _HuffTable:
    """Canonical JPEG Huffman table from the DHT BITS/HUFFVAL arrays
    (ITU T.81 Annex C): codes of each length assigned in increasing order."""

    def __init__(self, bits: list[int], huffval: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = huffval[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; stops cleanly at a marker (RSTn handled by caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            # the documented contract is ValueError for malformed payloads;
            # bare indexing would leak IndexError to direct callers (ADVICE)
            raise ValueError("JPEG: truncated stream (entropy data ends mid-scan)")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("JPEG: truncated stream (dangling 0xFF at end)")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt & 0x07)
            else:
                raise ValueError(f"JPEG: marker 0xFF{nxt:02x} inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        # drop already-consumed high bits: without this, acc accumulates the
        # whole entropy stream and every bit() shifts a multi-megabit int —
        # O(n^2) on a normal-size JPEG
        self.acc &= (1 << self.nbits) - 1

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")

    def byte_align(self) -> None:
        self.nbits = 0

    def skip_restart(self) -> None:
        """Consume the RSTn marker the reader is parked on."""
        assert self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, n: int):
        self.n = n


def _extend(v: int, t: int) -> int:
    """JPEG magnitude decode (T.81 F.2.2.1): t-bit value v -> signed amp."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes] | None:
    """(width, height, channels, pixel_bytes) from a baseline JPEG payload —
    REAL pixel decode with numpy + stdlib only: Huffman entropy decode,
    dequantize, IDCT, chroma upsample, YCbCr→RGB.

    Supports the baseline lattice (SOF0, 8-bit, 1 or 3 components, sampling
    factors 1–2, restart intervals); returns None for non-JPEG payloads and
    raises ValueError for JPEGs outside that lattice (progressive SOF2,
    arithmetic coding, 12-bit precision)."""
    import numpy as np

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id) -> table
    restart_interval = 0
    frame = None  # (width, height, [(comp_id, h, v, tq)])
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}, got 0x{data[pos]:02x}")
        marker = data[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        seglen = int.from_bytes(data[pos + 2 : pos + 4], "big")
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("unsupported JPEG lattice: 16-bit quant table")
                if i + 65 > len(seg):
                    raise ValueError("JPEG: truncated stream (DQT segment cut short)")
                q = np.zeros(64, dtype=np.int32)
                for z in range(64):
                    q[_ZIGZAG[z]] = seg[i + 1 + z]
                qtables[tq] = q.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                htables[(tc, th)] = _HuffTable(bits, seg[i + 17 : i + 17 + n])
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("unsupported JPEG lattice: non-8-bit precision")
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported JPEG lattice: {ncomp} components")
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                h, v = hv >> 4, hv & 0x0F
                # a declared sampling factor of 0 would divide-by-zero in the
                # MCU math / chroma upsample (r8 review) — malformed, not a
                # lattice we degrade on
                if not (1 <= h <= 2 and 1 <= v <= 2):
                    raise ValueError(
                        f"unsupported JPEG lattice: sampling factor {h}x{v} "
                        "(baseline decoder handles 1-2)"
                    )
                comps.append((cid, h, v, seg[8 + 3 * c]))
            frame = (width, height, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"unsupported JPEG lattice: SOF{marker - 0xC0} "
                "(baseline decoder handles SOF0 only)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG: SOS before SOF0")
            ns = seg[0]
            if ns != len(frame[2]):
                raise ValueError(
                    "unsupported JPEG lattice: non-interleaved multi-scan file "
                    f"(scan covers {ns} of {len(frame[2])} components)"
                )
            scan_tables = {}  # comp_id -> (dc table, ac table)
            for c in range(ns):
                cs = seg[1 + 2 * c]
                td, ta = seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0x0F
                if (0, td) not in htables or (1, ta) not in htables:
                    raise ValueError(f"JPEG: scan references undefined Huffman table {td}/{ta}")
                scan_tables[cs] = (htables[(0, td)], htables[(1, ta)])
            return _decode_scan(
                data, pos + 2 + seglen, frame, qtables, scan_tables, restart_interval
            )
        elif marker == 0xD9:  # EOI before any scan
            break
        pos += 2 + seglen
    raise ValueError("JPEG contains no scan")


def _idct_basis():
    import numpy as np

    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    a = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8)
    a[0, :] = np.sqrt(1.0 / 8)
    return a


def _decode_scan(data, pos, frame, qtables, scan_tables, restart_interval):
    import numpy as np

    width, height, comps = frame
    if len(comps) == 1:
        # a single-component scan is non-interleaved per T.81 A.2: the MCU is
        # ONE 8x8 data unit regardless of the SOF's declared sampling factors
        # (grayscale files converted from 4:2:0 commonly still declare 2x2)
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("unsupported JPEG lattice: sampling factor > 2")
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    basis = _idct_basis()
    planes = []
    for _, h, v, _ in comps:
        planes.append(np.zeros((mcuy * v * 8, mcux * h * 8), dtype=np.float64))
    reader = _BitReader(data, pos)
    dc_pred = {cid: 0 for cid, _, _, _ in comps}
    next_rst = 0
    mcu = 0
    while mcu < mcux * mcuy:
        if restart_interval and mcu and mcu % restart_interval == 0:
            reader.byte_align()
            reader.skip_restart()
            dc_pred = {cid: 0 for cid, _, _, _ in comps}
            next_rst = (next_rst + 1) & 0x07
        my, mx = divmod(mcu, mcux)
        try:
            for ci, (cid, h, v, tq) in enumerate(comps):
                dc_tab, ac_tab = scan_tables[cid]
                q = qtables[tq]
                for by in range(v):
                    for bx in range(h):
                        coef = np.zeros(64, dtype=np.int32)
                        t = reader.huff(dc_tab)
                        dc_pred[cid] += _extend(reader.bits(t), t)
                        coef[0] = dc_pred[cid]
                        z = 1
                        while z < 64:
                            rs = reader.huff(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                z += 16
                                continue
                            z += r
                            if z > 63:
                                raise ValueError("JPEG: AC run beyond block")
                            coef[_ZIGZAG[z]] = _extend(reader.bits(s), s)
                            z += 1
                        block = coef.reshape(8, 8) * q
                        pix = basis.T @ block @ basis
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
        except _RestartMarker:
            raise ValueError("JPEG: restart marker inside MCU") from None
        mcu += 1
    out_planes = []
    for ci, (_, h, v, _) in enumerate(comps):
        p = planes[ci]
        if h < hmax or v < vmax:  # pixel-replication chroma upsample
            p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        out_planes.append(p[:height, :width])
    if len(comps) == 1:
        gray = np.clip(np.round(out_planes[0] + 128), 0, 255).astype(np.uint8)
        return (width, height, 1, gray.tobytes())
    y, cb, cr = out_planes[0] + 128, out_planes[1], out_planes[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
    return (width, height, 3, rgb.tobytes())
