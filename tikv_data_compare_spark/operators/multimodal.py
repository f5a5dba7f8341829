"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Images/audio/video are carried as ``binary`` columns plus metadata.  No
image/audio library exists in this container, so real decode is implemented
from the published container specs directly: PNG pixel decode via stdlib
zlib (IDAT inflate + per-scanline unfiltering, all five filter types of the
PNG spec §6), GIF pixel decode (LZW + palette) and baseline JPEG pixel
decode (Huffman + IDCT + YCbCr — see operators/media_decode.py), and
RIFF/WAVE PCM sample decode via struct offsets.  Payloads
no decoder recognizes fall back to byte-level features with
``decoded=false`` — the distributed path (schema, Arrow batching,
mapInPandas signature, partitioning) is identical either way.

Scale shape: mapInPandas streams Arrow batches through Python once, with all
metadata extraction staying JVM-side where possible (payload_meta is pure
builtins — no Python).  The pure-Python PNG unfilter is a correctness-first
baseline (vectorized per scanline with numpy where the filter allows);
throughput-critical decode at cluster scale would swap a native decoder into
the same mapInPandas seam without touching the plan.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

from tikv_data_compare_spark.functions import sqlgen
from tikv_data_compare_spark.operators import media_decode

#: schema of the decoded-feature output of decode_features()
FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_mean double, byte_histogram_head array<long>, "
    "decoded boolean"
)


def _scaled(df: DataFrame, key: str) -> DataFrame:
    """Widen an under-split source before a CPU-heavy Arrow stage: the
    decode/parse work runs in the scan stage, and a compact parquet source
    can plan 1-2 splits (see session.scale_out; cluster no-op).  Keyed so
    placement is retry-deterministic; every batch function here is a pure
    per-row parser, so placement never affects results."""
    from tikv_data_compare_spark.session import scale_out

    return scale_out(df, key=key)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Render a text column as an opaque binary payload column (the fixture
    stand-in for real media bytes) plus a mime tag."""
    return df.withColumn("payload", F.col(text_col).cast("binary")).withColumn(
        "mime", F.lit("application/octet-stream")
    )


def payload_meta(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Typed metadata over the payload, fully JVM-side: byte length, 60-bit
    content id, 1 KiB chunk count."""
    with_m = df.withColumn("_m", F.md5(F.col(text_col)))
    return with_m.select(
        id_col,
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        F.expr(sqlgen.hexfold_i64("_m")).cast("long").alias("content_id"),
        F.expr(f"CAST(ceil(octet_length({text_col}) / 1024.0) AS BIGINT)").alias("n_chunks"),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type → samples per pixel (bit depth 8, non-interlaced)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytes:
    """Reverse the per-scanline filters of PNG spec §6 (None/Sub/Up/Average/
    Paeth).  ``raw`` is the inflated IDAT stream: height scanlines, each a
    1-byte filter type + width·bpp filtered bytes."""
    import numpy as np

    stride = width * bpp
    if len(raw) != height * (1 + stride):
        raise ValueError(
            f"PNG IDAT size mismatch: got {len(raw)} bytes, "
            f"want {height}*(1+{stride}) (interlaced or corrupt payload?)"
        )
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ftype == 1:  # Sub: left neighbor — sequential in x, vectorize per pixel column
            for i in range(bpp, stride):
                line[i] = (int(line[i]) + int(line[i - bpp])) & 0xFF
        elif ftype == 2:  # Up: fully vectorized
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                line[i] = (int(line[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (int(line[i]) + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = line
        prev = line
    return out.tobytes()


def decode_png(data: bytes) -> tuple[int, int, int, bytes] | None:
    """(width, height, channels, pixel_bytes) from a PNG payload — REAL pixel
    decode with stdlib zlib only: chunk walk, IDAT concat + inflate, scanline
    unfiltering.  Supports the baseline lattice (bit depth 8, color types
    0/2/4/6, non-interlaced); returns None for non-PNG payloads and raises
    on PNGs outside that lattice (truncated/corrupt streams raise too —
    callers that must not fail a batch catch per row)."""
    if len(data) < 8 or data[:8] != _PNG_SIG:
        return None
    pos, idat = 8, b""
    width = height = channels = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            width = int.from_bytes(chunk[0:4], "big")
            height = int.from_bytes(chunk[4:8], "big")
            bit_depth, color_type, interlace = chunk[8], chunk[9], chunk[12]
            if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
                raise ValueError(
                    f"unsupported PNG lattice: bit_depth={bit_depth} "
                    f"color_type={color_type} interlace={interlace} "
                    "(baseline decoder handles 8-bit, color types 0/2/4/6, "
                    "non-interlaced)"
                )
            channels = _PNG_CHANNELS[color_type]
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + payload + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT chunk")
    raw = zlib.decompress(idat)
    return (width, height, channels, _png_unfilter(raw, width, height, channels))


def decode_wav_pcm(data: bytes):
    """(channels, sample_rate, samples: numpy int array) from a RIFF/WAVE
    PCM payload — real sample decode via struct offsets (16-bit signed or
    8-bit unsigned little-endian PCM, format code 1).  Returns None for
    non-WAV payloads; raises on WAVs outside the PCM lattice."""
    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    channels = sample_rate = bits = fmt_code = None
    payload = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        csz = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and pos + 24 <= len(data):
            fmt_code = int.from_bytes(data[pos + 8 : pos + 10], "little")
            channels = int.from_bytes(data[pos + 10 : pos + 12], "little")
            sample_rate = int.from_bytes(data[pos + 12 : pos + 16], "little")
            bits = int.from_bytes(data[pos + 22 : pos + 24], "little")
        elif cid == b"data":
            payload = data[pos + 8 : pos + 8 + csz]
        pos += 8 + csz + (csz & 1)
    if None in (channels, sample_rate, bits) or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt_code != 1 or bits not in (8, 16):
        raise ValueError(
            f"unsupported WAV lattice: format={fmt_code} bits={bits} "
            "(baseline decoder handles PCM 8/16-bit)"
        )
    dtype = np.dtype("<i2") if bits == 16 else np.uint8
    samples = np.frombuffer(payload[: len(payload) - len(payload) % dtype.itemsize], dtype=dtype)
    return (channels, sample_rate, samples)


def decode_features(
    df: DataFrame, real_decode: bool = False, payload_col: str | None = None
) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched mapInPandas.

    Default: deterministic byte-level features over the raw payload (the
    fixture path — documents carry text-as-binary).  ``real_decode=True``
    DECODES recognized media containers first — PNG pixels
    (:func:`decode_png`, stdlib-zlib inflate + unfilter), GIF pixels
    (:func:`media_decode.decode_gif`, LZW + palette), baseline JPEG pixels
    (:func:`media_decode.decode_jpeg`, Huffman + IDCT + YCbCr) and WAV PCM
    samples (:func:`decode_wav_pcm`) — and computes the same features over
    the decoded content bytes with ``decoded=true``; unrecognized or
    out-of-lattice payloads fall back to raw-byte features with
    ``decoded=false`` instead of failing the batch.

    ``payload_col`` selects an existing binary column; default renders the
    text column via :func:`attach_payload` (fixture stand-in).
    """
    if payload_col is None:
        payloads, payload_col = attach_payload(df), "payload"
    else:
        payloads = df

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def content_bytes(payload: bytes) -> tuple[bytes, bool]:
            if real_decode:
                try:
                    for pixel_decoder in (decode_png, media_decode.decode_gif, media_decode.decode_jpeg):
                        decoded = pixel_decoder(payload)
                        if decoded is not None:
                            return decoded[3], True
                    wav = decode_wav_pcm(payload)
                    if wav is not None:
                        return wav[2].tobytes(), True
                except (ValueError, zlib.error, IndexError, KeyError,
                        struct.error, OverflowError, MemoryError, ZeroDivisionError):
                    # adversarial/corrupt payloads must never fail the Arrow
                    # batch (the documented contract) — but only the error
                    # classes a malformed CONTAINER can realistically raise
                    # are downgraded to decoded=false (KeyError: a scan
                    # referencing an undeclared huffman/quant table id;
                    # MemoryError: adversarial 65535×65535 declared dims); a
                    # genuine programming error (TypeError/NameError/
                    # AttributeError) in a decoder still surfaces in tests
                    # instead of silently zeroing every row (r8, ADVICE)
                    pass
            return payload, False

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                content, decoded = content_bytes(bytes(payload))
                b = np.frombuffer(content, dtype=np.uint8)
                hist = np.bincount(b % 16, minlength=16)[:4]
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_bytes": int(b.size),
                        "byte_mean": float(b.mean()) if b.size else 0.0,
                        "byte_histogram_head": [int(x) for x in hist],
                        "decoded": decoded if real_decode else True,
                    }
                )
            yield pd.DataFrame(rows)

    return _scaled(payloads.select("doc_id", payload_col), "doc_id").mapInPandas(
        extract, FEATURE_SCHEMA
    )


def parse_image_header(data: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from PNG/JPEG/GIF header bytes — pure struct
    parsing, no image library.  Returns None for unrecognized payloads.

    PNG: IHDR width/height at bytes 16..24 (big-endian u32 pair).
    GIF: logical screen size at bytes 6..10 (little-endian u16 pair).
    JPEG: walk the marker stream to the first SOF0-SOF15 frame header.
    """
    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        w = int.from_bytes(data[16:20], "big")
        h = int.from_bytes(data[20:24], "big")
        return ("png", w, h)
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(data[6:8], "little")
        h = int.from_bytes(data[8:10], "little")
        return ("gif", w, h)
    if len(data) >= 4 and data[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                return None
            # 0xFF fill/padding bytes are legal between segments (ITU T.81
            # B.1.1.2): skip runs of 0xFF so the byte after the run is the
            # marker code, instead of misreading a fill byte as a marker
            # with a bogus length
            while i + 1 < len(data) and data[i + 1] == 0xFF:
                i += 1
            if i + 9 >= len(data):
                break
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no-payload markers
                i += 2
                continue
            if marker in (0xDA, 0xD9):  # SOS: entropy-coded data follows; EOI
                return None  # no SOF seen before the scan — dims unknowable
            seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):  # SOFn
                h = int.from_bytes(data[i + 5 : i + 7], "big")
                w = int.from_bytes(data[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            i += 2 + seg_len
    return None


def image_dims(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Decode-free image metadata: (id, format, width, height) parsed from
    header bytes via an Arrow-batched mapInPandas — REAL parsing (PNG/GIF
    fixed offsets, JPEG SOF marker walk), no image library involved.
    Unrecognized payloads yield NULL format/dims rather than failing the
    batch."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                parsed = parse_image_header(bytes(payload)) if payload is not None else None
                fmt, w, h = parsed if parsed else (None, None, None)
                rows.append({id_col: int(doc_id), "format": fmt, "width": w, "height": h})
            yield pd.DataFrame(rows)

    return _scaled(df.select(id_col, payload_col), id_col).mapInPandas(
        extract, f"{id_col} long, format string, width long, height long"
    )


def parse_wav_header(data: bytes) -> tuple[int, int, int, int] | None:
    """(channels, sample_rate, bits_per_sample, data_size) from a RIFF/WAVE
    header — pure struct parsing, no audio library.  Walks the chunk list
    (``fmt `` for the format fields, ``data`` for the payload size) so
    extra chunks between them are handled; returns None when either chunk
    is missing or the payload is not RIFF/WAVE."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    channels = sample_rate = bits = data_size = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        csz = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and pos + 24 <= len(data):
            channels = int.from_bytes(data[pos + 10 : pos + 12], "little")
            sample_rate = int.from_bytes(data[pos + 12 : pos + 16], "little")
            bits = int.from_bytes(data[pos + 22 : pos + 24], "little")
        elif cid == b"data":
            data_size = csz
        pos += 8 + csz + (csz & 1)
    if None in (channels, sample_rate, bits, data_size):
        return None
    return (channels, sample_rate, bits, data_size)


def audio_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Decode-free audio metadata: (id, channels, sample_rate, bits,
    data_size) parsed from RIFF/WAVE header bytes via Arrow-batched
    mapInPandas — REAL chunk-walk parsing, no audio library.  Unrecognized
    payloads yield NULL fields rather than failing the batch."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                parsed = parse_wav_header(bytes(payload)) if payload is not None else None
                ch, sr, bits, dsz = parsed if parsed else (None, None, None, None)
                rows.append(
                    {
                        id_col: int(doc_id),
                        "channels": ch,
                        "sample_rate": sr,
                        "bits": bits,
                        "data_size": dsz,
                    }
                )
            yield pd.DataFrame(rows)

    return _scaled(df.select(id_col, payload_col), id_col).mapInPandas(
        extract,
        f"{id_col} long, channels long, sample_rate long, bits long, data_size long",
    )


def media_probe(
    df: DataFrame,
    id_col: str = "doc_id",
    image_col: str = "image_payload",
    audio_col: str = "audio_payload",
    passthrough_cols: list[str] | None = None,
) -> DataFrame:
    """Image AND audio header parsing in ONE Arrow pass — the heterogeneous-
    corpus shape: a row may carry any mix of modalities, and probing them in
    separate :func:`image_dims` / :func:`audio_meta` passes means one scan +
    one join per modality.  This operator runs both struct parsers over each
    row inside a single ``mapInPandas``, so the corpus is read once and no
    join is needed; ``passthrough_cols`` ride along for downstream JVM-side
    metadata projection (e.g. :func:`payload_meta`'s expressions applied to
    the probe output instead of a third scan)."""
    passthrough = list(passthrough_cols or [])
    # passthrough fields keep their INPUT types (a long id or binary payload
    # hardcoded as `string` here would be an Arrow schema mismatch at runtime)
    in_types = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in passthrough if c not in in_types]
    if missing:
        raise ValueError(f"passthrough_cols not in input schema: {missing}")
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())]
        + [T.StructField(c, in_types[c]) for c in passthrough]
        + [
            T.StructField("format", T.StringType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("channels", T.LongType()),
            T.StructField("sample_rate", T.LongType()),
            T.StructField("bits", T.LongType()),
            T.StructField("data_size", T.LongType()),
        ]
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                img, wav = r[image_col], r[audio_col]
                pi = parse_image_header(bytes(img)) if img is not None else None
                fmt, w, h = pi if pi else (None, None, None)
                pw = parse_wav_header(bytes(wav)) if wav is not None else None
                ch, sr, bits, dsz = pw if pw else (None, None, None, None)
                row = {id_col: int(r[id_col])}
                for c in passthrough:
                    row[c] = r[c]
                row.update(
                    format=fmt, width=w, height=h,
                    channels=ch, sample_rate=sr, bits=bits, data_size=dsz,
                )
                rows.append(row)
            yield pd.DataFrame(rows)

    return _scaled(df.select(id_col, *passthrough, image_col, audio_col), id_col).mapInPandas(
        extract, out_schema
    )


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL pixel resize: decode each payload (PNG/GIF/baseline-JPEG via the
    from-spec decoders), nearest-neighbor resample to (out_w, out_h), and
    emit the resized RGB bytes — the image-normalization stage of a
    multimodal training pipeline (fixed input dims for the encoder).

    One Arrow pass, pure numpy index math (nearest-neighbor = one fancy
    index per image; no convolution, deterministic across platforms).
    Undecodable payloads yield ``decoded=false`` with NULL pixels — the
    row survives for audit, the batch never fails.  Output bytes are
    row-major RGB, ``out_w·out_h·3`` per decoded row (bounded output: the
    operator SHRINKS data for any out dims below the source).  Non-RGB
    decodes are converted BEFORE resampling so the contract holds for
    every input the decoders produce (r8 ADVICE): grayscale and
    gray+alpha replicate the luma channel ×3, RGBA drops alpha — the
    standard training-encoder normalization (fixed 3-channel tensor in,
    alpha is not signal for natural-image encoders).
    """
    if out_w < 1 or out_h < 1:
        raise ValueError(f"resize dims must be >= 1, got {out_w}x{out_h}")
    from tikv_data_compare_spark.operators import media_decode

    out_schema = (
        f"{id_col} long, src_w long, src_h long, rgb binary, decoded boolean"
    )

    def work(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = None
                try:
                    for d in (decode_png, media_decode.decode_gif, media_decode.decode_jpeg):
                        dec = d(bytes(payload))
                        if dec is not None:
                            break
                except (ValueError, zlib.error, IndexError, KeyError,
                        struct.error, OverflowError, MemoryError, ZeroDivisionError):
                    dec = None
                if dec is None:
                    rows.append((int(doc_id), None, None, None, False))
                    continue
                w, h, ch, rgb = dec
                img = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, ch)
                # normalize to 3 channels first: gray/gray+alpha -> replicate
                # luma, RGBA -> drop alpha (channel 3); channels 1/2/4 are
                # the PNG color types 0/4/6 + grayscale JPEG
                if ch in (1, 2):
                    img = np.repeat(img[:, :, :1], 3, axis=2)
                elif ch == 4:
                    img = img[:, :, :3]
                # nearest-neighbor index maps (the standard floor((i+0.5)*scale))
                yi = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(int), h - 1)
                xi = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(int), w - 1)
                resized = img[yi][:, xi]
                rows.append((int(doc_id), int(w), int(h), resized.tobytes(), True))
            yield pd.DataFrame(
                rows, columns=[id_col, "src_w", "src_h", "rgb", "decoded"]
            )

    return _scaled(df.select(id_col, payload_col), id_col).mapInPandas(work, out_schema)


def audio_frames(
    df: DataFrame,
    frame_len: int = 1024,
    hop: int = 512,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL audio frame sampling: decode WAV PCM samples and emit one row
    per (overlapping) analysis frame with its RMS and peak — the windowed
    feature-extraction shape (VAD, loudness gating, silence trimming) of an
    audio pipeline, without shipping raw frames (two scalars per frame).

    Channels are interleaved in PCM; frames are cut over the interleaved
    stream (frame boundaries at sample multiples of ``hop``), which is the
    bounded-output audit shape — a channel-split variant is one reshape
    away inside the same batch function.  Non-WAV payloads yield no rows.
    """
    if frame_len < 1 or hop < 1:
        raise ValueError(f"frame_len/hop must be >= 1, got {frame_len}/{hop}")
    out_schema = (
        f"{id_col} long, frame_idx long, start_sample long, n_samples long, "
        "rms double, peak long"
    )

    def work(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    dec = decode_wav_pcm(bytes(payload))
                except (ValueError, struct.error, IndexError, OverflowError):
                    dec = None
                if dec is None:
                    continue
                _, _, samples = dec
                x = samples.astype(np.float64)
                for idx, start in enumerate(range(0, max(len(x) - frame_len + 1, 1), hop)):
                    fr = x[start : start + frame_len]
                    if not len(fr):
                        break
                    rows.append(
                        (
                            int(doc_id),
                            idx,
                            start,
                            len(fr),
                            float(np.sqrt((fr**2).mean())),
                            int(np.abs(fr).max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "frame_idx", "start_sample", "n_samples", "rms", "peak"],
            )

    return _scaled(df.select(id_col, payload_col), id_col).mapInPandas(work, out_schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: one row per sampled chunk offset — the
    Spark shape of video frame extraction (posexplode of offsets computed
    JVM-side; the per-frame decode itself would be a mapInPandas stub)."""
    payloads = attach_payload(df)
    return payloads.select(
        "doc_id",
        F.posexplode(
            F.expr(f"sequence(0, greatest(octet_length(text) - 1, 0), {every_n_bytes})")
        ).alias("frame_idx", "byte_offset"),
    )


def image_dhash(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    hash_w: int = 8,
    hash_h: int = 8,
) -> DataFrame:
    """Perceptual image hash for IMAGE near-dup detection — the visual
    analogue of SimHash over text: re-encodes, small crops/scales and
    minor pixel noise leave most bits intact, so near-identical images
    sit within a small hamming distance.

    The DIFFERENCE hash (dHash, Krawetz) rather than DCT pHash,
    deliberately: every step is integer math — luma
    ``(299·R + 587·G + 114·B) // 1000``, nearest-neighbor resample to
    ``(hash_w+1) × hash_h`` (the same index map as ``resize_images``),
    bit = left pixel > right neighbor — so the hash is bit-deterministic
    across platforms/BLAS builds, the repo-wide replay contract.  A
    float DCT's threshold bits can flip in the last ulp between BLAS
    libraries, which would make task retries disagree.

    Returns ``(id, dhash, decoded)`` — ``dhash`` is a 64-bit BIGINT for
    the default 8×8 geometry; undecodable payloads survive with NULL
    hash and ``decoded=false`` (audit, never fail the batch).  One Arrow
    pass over the payloads; pair search composes via
    :func:`dhash_pairs`."""
    if hash_w < 1 or hash_h < 1 or hash_w * hash_h > 64:
        raise ValueError(
            f"hash geometry must satisfy 1 <= hash_w*hash_h <= 64 bits, "
            f"got {hash_w}x{hash_h}"
        )
    from tikv_data_compare_spark.operators import media_decode

    out_schema = f"{id_col} long, dhash long, decoded boolean"
    w_cols, h_rows = hash_w, hash_h

    def work(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, hashes, flags = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:  # NULL payloads audit, never fail
                    ids.append(int(doc_id))
                    hashes.append(None)
                    flags.append(False)
                    continue
                dec = None
                try:
                    for d in (decode_png, media_decode.decode_gif, media_decode.decode_jpeg):
                        dec = d(bytes(payload))
                        if dec is not None:
                            break
                except (ValueError, zlib.error, IndexError, KeyError,
                        struct.error, OverflowError, MemoryError, ZeroDivisionError):
                    dec = None
                if dec is None:
                    ids.append(int(doc_id))
                    hashes.append(None)
                    flags.append(False)
                    continue
                w, h, ch, rgb = dec
                img = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, ch)
                if ch in (1, 2):
                    luma = img[:, :, 0].astype(np.int64)
                elif ch >= 3:
                    px = img[:, :, :3].astype(np.int64)
                    luma = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
                # nearest-neighbor to (h_rows, w_cols+1): same index math as
                # resize_images — integer-exact, platform-stable
                gw = w_cols + 1
                yi = np.minimum(((np.arange(h_rows) + 0.5) * h / h_rows).astype(int), h - 1)
                xi = np.minimum(((np.arange(gw) + 0.5) * w / gw).astype(int), w - 1)
                g = luma[yi][:, xi]
                bits = (g[:, :-1] > g[:, 1:]).flatten()
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                # 64-bit two's complement into BIGINT
                if val >= 1 << 63:
                    val -= 1 << 64
                ids.append(int(doc_id))
                hashes.append(val)
                flags.append(True)
            # dhash MUST be a nullable Int64 column, never inferred: a batch
            # mixing hashes with a None (undecodable row) would otherwise
            # coerce to float64 and silently ROUND the 64-bit hash to 53
            # bits of precision — observed as batch-composition-dependent
            # hashes before this pin
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "dhash": pd.array(hashes, dtype="Int64"),
                    "decoded": flags,
                }
            )

    return _scaled(df.select(id_col, payload_col), id_col).mapInPandas(work, out_schema)


def dhash_band_rows(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    n_bands: int = 8,
) -> DataFrame:
    """``(doc_id, band, slice, dhash)`` byte-slice band rows of each 64-bit
    perceptual hash — one map-side explode, no shuffle.  The shared banding
    primitive of :func:`dhash_pairs` (batch self-join) and the persistent
    index (``operators/dhash_index.py``): both sides of any candidate join
    MUST band through here so slices are always comparable.  NULL hashes
    (undecodable images) are dropped — they can never pair."""
    if not 1 <= n_bands <= 64:
        raise ValueError(f"n_bands must be in [1, 64], got {n_bands}")
    from pyspark.sql import functions as F

    width = 64 // n_bands
    h = hashes.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.col(hash_col).alias("dhash")
    )
    bands = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("band"),
                    F.expr(
                        f"{sqlgen.shiftright('dhash', j * width, sqlgen.SPARK)}"
                        f" & {(1 << width) - 1}"
                    ).alias("slice"),
                )
                for j in range(n_bands)
            ]
        )
    ).alias("b")
    return h.select("doc_id", "dhash", bands).select(
        "doc_id", F.col("b.band").alias("band"),
        F.col("b.slice").alias("slice"), "dhash",
    )


def dhash_pairs(
    hashes: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    n_bands: int = 8,
) -> DataFrame:
    """Candidate + verified near-dup pairs over perceptual hashes: band the
    64-bit hash into ``n_bands`` byte-slices, equi-join on (band, slice)
    — two images within ``max_hamming <= n_bands - 1`` bit flips MUST
    share at least one unflipped band (pigeonhole), so recall is complete
    at the default geometry — then verify with the exact
    ``bit_count(xor)``.  The same banded-equi-join shape as
    ``simhash_pairs``: no all-pairs product anywhere, candidates bounded
    by band collisions.  NULL hashes (undecodable images) never pair.

    Returns ``(doc_a, doc_b, hamming)`` with ``doc_a < doc_b``."""
    from pyspark.sql import functions as F

    rows = dhash_band_rows(hashes, id_col, hash_col, n_bands)
    a, b = rows.alias("a"), rows.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.dhash").alias("_ha"),
            F.col("b.dhash").alias("_hb"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.expr("CAST(bit_count(_ha ^ _hb) AS BIGINT)").alias("hamming"),
    ).where(F.col("hamming") <= int(max_hamming))
