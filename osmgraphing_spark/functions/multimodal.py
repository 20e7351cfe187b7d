"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with a
metadata struct; all Spark-side plumbing here is real (schemas, Arrow batch
shapes, partition-preserving mapInPandas). Codecs are real where a format
is decodable without external libraries — PPM (P6) images via a pure-numpy
header parse, 8-bit PNG (gray/RGB/RGBA/palette, all five scanline filters)
via stdlib zlib + numpy, single-frame GIF (variable-width LZW, global or
local palette), baseline JPEG (functions/jpeg.py: Huffman + IDCT +
4:4:4/4:2:0, pure numpy), and WAV (PCM) audio via the stdlib ``wave``
module. Video: the MP4/ISO-BMFF container parse is real (box walker +
sample tables), and MJPEG frame decode is real too (``mp4_jpeg_frames``
slices samples via stsz/stco and reuses the baseline-JPEG decoder) — only
inter-frame codecs (H.264/AV1, genuinely lib-bound entropy decoding) raise
the clearly-marked NotImplementedError in strict mode / deterministic
content-hash fake in test mode. Swap ``_decode_image_impl``'s fallback for
a PIL call in production; nothing else changes.

Design rules applied:
- media bytes never hit the driver; every transform is mapInPandas over
  Arrow batches (bounded memory per batch via maxRecordsPerBatch);
- metadata travels as a typed struct column so Catalyst can prune/push
  filters on it WITHOUT touching the binary blob (check ReadSchema in
  .explain: a filter on meta.width must not read ``data``);
- derived features (embeddings, frame samples) are array columns, keeping
  downstream similarity ops (operators/similarity.py) directly applicable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("data", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("channels", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("format", StringType()),
                ]
            ),
        ),
    ]
)

STRICT = False  # True → non-PPM/WAV decode raises NotImplementedError


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6). Lib-free counterpart of
    ``_decode_ppm``; used by synth_media and tests for exact roundtrips."""
    h, w, c = img.shape
    if c != 3 or img.dtype != np.uint8:
        raise ValueError("PPM P6 is 3-channel uint8")
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def _decode_ppm(data: bytes) -> np.ndarray:
    """REAL decode: binary PPM (P6) → (h, w, 3) uint8. Header is
    'P6' <ws> width <ws> height <ws> maxval <single-ws> raster; '#'
    comments allowed between tokens."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # exactly one whitespace byte before the raster
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated PNG chunk")
        got = int.from_bytes(data[pos + 8 + ln : pos + 12 + ln], "big")
        import zlib as _z

        if _z.crc32(typ + body) & 0xFFFFFFFF != got:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        yield typ, body
        pos += 12 + ln
        if typ == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Per-scanline defilter (PNG spec §6: None/Sub/Up/Average/Paeth).
    Up is fully vectorized; Sub/Average/Paeth need the left neighbor so
    they walk the row — fine for the thumbnail-scale images a metadata
    pipeline decodes (heavy rasters belong to the GPU stage, not Spark)."""
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint16)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(h):
        ft, row = rows[y, 0], rows[y, 1:].astype(np.uint16)
        if ft == 0:
            cur = row
        elif ft == 1:  # Sub
            cur = row.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft == 3:  # Average
            cur = row.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = row.copy()
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pr) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8)


def _decode_png(data: bytes) -> np.ndarray:
    """REAL decode: 8-bit non-interlaced PNG (gray / gray+alpha / RGB /
    RGBA / palette) → (h, w, c) uint8, pure stdlib-zlib + numpy. Interlaced
    or 16-bit files raise — they are rare in web corpora and a production
    deploy swaps in PIL without touching the Spark plumbing."""
    import zlib as _z

    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    ihdr = None
    plte = trns = None
    idat = bytearray()
    for typ, body in _png_chunks(data):
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"PLTE":
            plte = body
        elif typ == b"tRNS":
            trns = body
        elif typ == b"IDAT":
            idat.extend(body)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, _comp, _filt, interlace = ihdr[8:13]
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported (depth={depth})")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if nch is None:
        raise ValueError(f"unknown PNG color type {ctype}")
    raw = np.frombuffer(_z.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * nch
    if raw.size != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    img = _png_unfilter(raw, h, stride, nch).reshape(h, w, nch)
    if ctype == 3:  # palette → RGB(A)
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        rgb = pal[img[:, :, 0]]
        if trns is not None:
            alpha = np.full(256, 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return np.dstack([rgb, alpha[img[:, :, 0]]])
        return rgb
    return img


def encode_png(img: np.ndarray) -> bytes:
    """(h, w[, c]) uint8 → PNG bytes (filter 0 rows, one zlib stream).
    Lib-free counterpart of ``_decode_png`` for roundtrip tests/synth."""
    import zlib as _z

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, ctype, 0, 0, 0])
    )
    raster = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    idat = _z.compress(raster, 6)

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big") + typ + body
            + (_z.crc32(typ + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW (GIF89a spec appendix F): variable code width
    starting at min_code_size+1, CLEAR/EOI codes, dictionary grows to
    4096 then freezes until CLEAR. Returns the index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader, LSB-first
    bitpos = 0
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal bitpos
        v = 0
        for i in range(width):
            if bitpos >= nbits:
                return -1
            byte = data[bitpos >> 3]
            v |= ((byte >> (bitpos & 7)) & 1) << i
            bitpos += 1
        return v

    def reset():
        d = {i: [i] for i in range(clear)}
        return d, min_code_size + 1

    table, width = reset()
    prev: list[int] | None = None
    while True:
        code = read(width)
        if code in (-1, eoi):
            break
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif prev is not None and code == len(table) + 2:
            entry = prev + [prev[0]]
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None and len(table) + 2 < 4096:
            table[len(table) + 2] = prev + [entry[0]]
            if len(table) + 2 == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def _decode_gif(data: bytes) -> np.ndarray:
    """REAL decode: first frame of a GIF87a/89a → (h, w, 3) uint8
    (global/local palette, LZW sub-blocks; interlace and transparency
    composition unsupported — raise, like the PNG decoder's exclusions)."""
    if not data.startswith((b"GIF87a", b"GIF89a")):
        raise ValueError("not a GIF")
    pos = 6
    sw, sh = int.from_bytes(data[pos:pos+2], "little"), int.from_bytes(data[pos+2:pos+4], "little")
    flags = data[pos+4]
    pos += 7
    gpal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gpal = np.frombuffer(data[pos:pos + 3*n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            w = int.from_bytes(data[pos+5:pos+7], "little")
            h = int.from_bytes(data[pos+7:pos+9], "little")
            iflags = data[pos+9]
            pos += 10
            pal = gpal
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(data[pos:pos + 3*n], dtype=np.uint8).reshape(-1, 3)
                pos += 3 * n
            if iflags & 0x40:
                raise ValueError("interlaced GIF not supported")
            if pal is None:
                raise ValueError("GIF frame has no palette")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw.extend(data[pos+1:pos+1+ln])
                pos += 1 + ln
            idx = _gif_lzw_decode(bytes(lzw), mcs)
            if len(idx) < w * h:
                raise ValueError("GIF raster truncated")
            arr = np.array(idx[: w * h], dtype=np.int32).reshape(h, w)
            return pal[arr].astype(np.uint8)
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image frame")


def encode_gif(img: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) palette-index uint8 + (n, 3) palette → single-frame GIF89a
    (uncompressed-style LZW: emit a CLEAR before every literal so codes
    never grow — valid per spec, sidesteps encoder dictionary logic)."""
    h, w = img.shape
    n = len(palette)
    bits = max(2, int(np.ceil(np.log2(max(n, 4)))))
    pal_n = 1 << bits
    pal = np.zeros((pal_n, 3), dtype=np.uint8)
    pal[:n] = palette
    head = (
        b"GIF89a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x80 | (bits - 1), 0, 0])
        + pal.tobytes()
    )
    clear = 1 << bits
    mcs = bits
    width = bits + 1
    out_bits: list[int] = []

    def emit(code: int):
        for i in range(width):
            out_bits.append((code >> i) & 1)

    emit(clear)
    for v in img.flatten():
        emit(int(v))
        emit(clear)  # keep the decoder table permanently fresh
    emit(clear + 1)  # EOI
    by = bytearray()
    for i in range(0, len(out_bits), 8):
        chunk = out_bits[i:i+8]
        by.append(sum(bit << j for j, bit in enumerate(chunk)))
    body = bytearray([0x2C]) + (0).to_bytes(2, "little") * 2         + w.to_bytes(2, "little") + h.to_bytes(2, "little") + bytes([0, mcs])
    for i in range(0, len(by), 255):
        sub = by[i:i+255]
        body += bytes([len(sub)]) + sub
    body += b"\x00\x3b"
    return head + bytes(body)


def _decode_image_impl(
    data: bytes, width: int, height: int, channels: int, strict: bool | None = None
) -> np.ndarray:
    """PPM (P6) and 8-bit PNG decode for REAL (pure numpy + stdlib zlib).
    Remaining formats (JPEG/MP4 need DCT/ffmpeg machinery): production
    would call PIL.Image.open(io.BytesIO(data)); here they raise in strict
    mode or produce a deterministic fake keyed on sha256(data) so tests
    exercise the full pipeline shape with reproducible values."""
    if data.startswith(b"P6"):
        return _decode_ppm(data)
    if data.startswith(_PNG_SIG):
        return _decode_png(data)
    if data.startswith((b"GIF87a", b"GIF89a")):
        return _decode_gif(data)
    if data.startswith(b"\xff\xd8"):
        from .jpeg import decode_jpeg

        return decode_jpeg(data)
    if STRICT if strict is None else strict:
        raise NotImplementedError(
            "image decode for this format requires a library not present in "
            "this container (PPM/PNG/GIF/baseline-JPEG decode natively); "
            "set functions.multimodal.STRICT=False for the deterministic fake"
        )
    seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


def _decode_audio_impl(data: bytes) -> tuple[np.ndarray, int]:
    """REAL decode: WAV (PCM16/PCM8) via the stdlib ``wave`` module →
    (float32 samples in [-1, 1] of shape (n, channels), sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        n, ch, sw, rate = (
            wf.getnframes(), wf.getnchannels(), wf.getsampwidth(), wf.getframerate()
        )
        raw = wf.readframes(n)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    return x.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float samples in [-1, 1] (n,) or (n, ch) → PCM16 WAV bytes."""
    import io
    import wave

    x = np.atleast_2d(np.asarray(samples, dtype=np.float64).T).T
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(pcm.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def _resize_impl(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize — pure numpy (no codec needed), real logic."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[np.ix_(ys, xs)]


def image_features(
    media: DataFrame, out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """decode → resize → channel-mean feature vector per image.
    → (media_id, feature array<float>). One Arrow batch at a time; the
    binary column never leaves the executor."""
    strict = STRICT  # snapshot driver-side: executor workers re-import the
    # module fresh, so the module global alone would not reach them

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for row in pdf.itertuples(index=False):
                if row.kind != "image":
                    continue
                meta = row.meta
                # Arrow → pandas widens nullable struct ints to float; coerce
                img = _decode_image_impl(
                    bytes(row.data),
                    int(meta["width"]),
                    int(meta["height"]),
                    int(meta["channels"]),
                    strict=strict,
                )
                small = _resize_impl(img, out_w, out_h)
                feats.append(small.mean(axis=2).astype(np.float32).ravel())
                ids.append(row.media_id)
            if not ids:
                # a batch with no image rows must yield NOTHING: an empty
                # pandas frame defaults its columns to float64, which Arrow
                # cannot convert to the declared array<float> (seen when a
                # wide-parallelism session leaves one row per partition)
                continue
            yield pd.DataFrame({"media_id": ids, "feature": [f.tolist() for f in feats]})

    return media.select("media_id", "kind", "data", "meta").mapInPandas(
        run, schema="media_id long, feature array<float>"
    )


def audio_features(media: DataFrame, frame: int = 512) -> DataFrame:
    """WAV decode (REAL, stdlib) → per-clip DSP features: RMS energy,
    zero-crossing rate, duration. → (media_id, rms float, zcr float,
    duration_s float). Same Arrow-batched mapInPandas shape as
    image_features; bytes never hit the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rms, zcr, dur = [], [], [], []
            for row in pdf.itertuples(index=False):
                if row.kind != "audio":
                    continue
                x, rate = _decode_audio_impl(bytes(row.data))
                mono = x.mean(axis=1)
                ids.append(row.media_id)
                rms.append(float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0)
                zcr.append(
                    float(np.mean(np.abs(np.diff(np.signbit(mono)))))
                    if len(mono) > 1 else 0.0
                )
                dur.append(len(mono) / float(rate))
            if not ids:
                continue  # no audio rows in this batch — see image_features
            yield pd.DataFrame(
                {"media_id": ids, "rms": rms, "zcr": zcr, "duration_s": dur}
            )

    return media.select("media_id", "kind", "data").mapInPandas(
        run, schema="media_id long, rms double, zcr double, duration_s double"
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: → (media_id, frame_idx) rows for
    every n-th frame, from metadata only (no decode; the decode of chosen
    frames is the same stubbed path as images)."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
                )
            ).alias("frame_idx"),
        )
    )


def encode_wav_pcm16(pcm: np.ndarray, rate: int) -> bytes:
    """int16 PCM samples (n,) or (n, ch) → WAV bytes, no float transcoding.
    Keeps planted test signals exactly integer so a SQL oracle can reproduce
    the decoded values bit-for-bit (encode_wav's float clip path cannot)."""
    import io
    import wave

    x = np.asarray(pcm, dtype="<i2")
    if x.ndim == 1:
        x = x[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(x.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(x.tobytes())
    return buf.getvalue()


def synth_images_from_ids(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PPM image per id, ENCODED EXECUTOR-SIDE (mapInPandas —
    the bytes never exist on the driver). Gradient pattern chosen so every
    channel mean is a closed-form 1-D average a SQL oracle can reproduce:
    w = 8 + id%5*4, h = 8 + id%3*4,
    R(x,y) = (x*(id%7+1)) % 256          (constant down columns),
    G(x,y) = (y*(id%11+2)) % 256         (constant across rows),
    B(x,y) = (id + y*w + x) % 256        (linear in the raster index).
    → (id_col, kind='image', data, meta) rows in MEDIA_SCHEMA shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, datas, metas = [], [], []
            for i in pdf[id_col].astype("int64"):
                i = int(i)
                w, h = 8 + (i % 5) * 4, 8 + (i % 3) * 4
                yy, xx = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [
                        (xx * (i % 7 + 1)) % 256,
                        (yy * (i % 11 + 2)) % 256,
                        (i + yy * w + xx) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                ids.append(i)
                datas.append(encode_ppm(img))
                metas.append(
                    {"width": w, "height": h, "channels": 3, "sample_rate": None,
                     "n_frames": None, "format": "ppm"}
                )
            yield pd.DataFrame(
                {id_col: ids, "kind": "image", "data": datas, "meta": metas}
            )

    schema = StructType(
        [StructField(id_col, LongType()), MEDIA_SCHEMA["kind"],
         MEDIA_SCHEMA["data"], MEDIA_SCHEMA["meta"]]
    )
    return ids_df.select(id_col).mapInPandas(run, schema=schema)


def synth_audio_from_ids(
    ids_df: DataFrame, id_col: str = "doc_id", n_samples: int = 4000,
    rate: int = 16000,
) -> DataFrame:
    """Deterministic WAV clip per id, encoded executor-side: integer
    sawtooth pcm(t) = ((id*7 + t*13) % 4096) - 2048 — pure integer
    arithmetic end to end, so decode → RMS/ZCR is SQL-reproducible with no
    float-transcendental dialect risk. → (id_col, kind='audio', data)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            ids, datas = [], []
            for i in pdf[id_col].astype("int64"):
                i = int(i)
                pcm = ((i * 7 + t * 13) % 4096 - 2048).astype("<i2")
                ids.append(i)
                datas.append(encode_wav_pcm16(pcm, rate))
            yield pd.DataFrame({id_col: ids, "kind": "audio", "data": datas})

    schema = StructType(
        [StructField(id_col, LongType()), MEDIA_SCHEMA["kind"], MEDIA_SCHEMA["data"]]
    )
    return ids_df.select(id_col).mapInPandas(run, schema=schema)


def _decode_image_real(data: bytes) -> np.ndarray:
    """Strict REAL-decode dispatch (no fakes): P6 PPM or 8-bit PNG →
    (h, w, c) uint8; anything else raises."""
    if data.startswith(b"P6"):
        return _decode_ppm(data)
    if data.startswith(_PNG_SIG):
        return _decode_png(data)
    if data.startswith((b"GIF87a", b"GIF89a")):
        return _decode_gif(data)
    if data.startswith(b"\xff\xd8"):
        from .jpeg import decode_jpeg

        return decode_jpeg(data)
    raise ValueError(
        "unsupported image format for real decode (PPM/PNG/GIF/JPEG only)"
    )


def image_stats(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """REAL decode (PPM or PNG, never the fake) → per-image header dims +
    per-channel means.
    → (id_col, width, height, n_px, mean_r, mean_g, mean_b). Width/height
    come from the decoded raster shape (proving the header parse ran), not
    from metadata; grayscale broadcasts its single channel to r=g=b and an
    alpha channel is excluded from the means. Same Arrow-batched
    mapInPandas shape as image_features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   (id_col, "width", "height", "n_px", "mean_r", "mean_g", "mean_b")}
            for row in pdf.itertuples(index=False):
                img = _decode_image_real(bytes(row.data))
                if img.shape[2] in (2, 4):  # drop alpha
                    img = img[:, :, : img.shape[2] - 1]
                if img.shape[2] == 1:  # gray → r=g=b
                    img = np.repeat(img, 3, axis=2)
                h, w = img.shape[:2]
                means = img.astype(np.float64).mean(axis=(0, 1))
                out[id_col].append(getattr(row, id_col))
                out["width"].append(w)
                out["height"].append(h)
                out["n_px"].append(w * h)
                out["mean_r"].append(round(float(means[0]), 6))
                out["mean_g"].append(round(float(means[1]), 6))
                out["mean_b"].append(round(float(means[2]), 6))
            yield pd.DataFrame(out)

    return media.select(id_col, "data").mapInPandas(
        run,
        schema=(f"{id_col} long, width int, height int, n_px long, "
                "mean_r double, mean_g double, mean_b double"),
    )


def audio_stats(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """REAL WAV decode → (id_col, rms, zcr, duration_s), rounded to the
    1e-6 grid. Same DSP as audio_features (RMS energy, zero-crossing rate)
    but keyed on an arbitrary id column for oracle-checked pipelines."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rms, zcr, dur = [], [], [], []
            for row in pdf.itertuples(index=False):
                x, rate = _decode_audio_impl(bytes(row.data))
                # float64 DSP: the decoded float32 samples are exact dyadics
                # (pcm/2^15), so widening makes mean/rms accumulation exact
                # and bit-reproducible by the SQL oracle
                mono = x.astype(np.float64).mean(axis=1)
                ids.append(getattr(row, id_col))
                rms.append(round(float(np.sqrt(np.mean(mono**2))), 6)
                           if len(mono) else 0.0)
                zcr.append(round(float(np.mean(np.abs(np.diff(np.signbit(mono))))), 6)
                           if len(mono) > 1 else 0.0)
                dur.append(len(mono) / float(rate))
            yield pd.DataFrame(
                {id_col: ids, "rms": rms, "zcr": zcr, "duration_s": dur}
            )

    return media.select(id_col, "data").mapInPandas(
        run, schema=f"{id_col} long, rms double, zcr double, duration_s double"
    )


def synth_media(spark, n: int = 32) -> DataFrame:
    """Deterministic media table for tests: images are REAL PPMs (gradient
    pattern keyed on media_id), audio clips are REAL PCM16 WAVs (sine at a
    per-id frequency), video payloads are opaque seeded bytes (no lib-free
    container format exists; its decode stays stubbed)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = 16 + (i % 4) * 8, 16 + (i % 3) * 8
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(xx * (i + 1)) % 256, (yy * (i + 2)) % 256, (xx + yy + i) % 256],
                axis=-1,
            ).astype(np.uint8)
            payload, meta = encode_ppm(img), {
                "width": w, "height": h, "channels": 3, "sample_rate": None,
                "n_frames": None, "format": "ppm",
            }
        elif kind == "audio":
            rate, freq = 16000, 110.0 * (1 + i % 8)
            t = np.arange(rate // 4) / rate  # 250 ms
            payload, meta = encode_wav(np.sin(2 * np.pi * freq * t), rate), {
                "width": None, "height": None, "channels": None,
                "sample_rate": rate, "n_frames": None, "format": "wav",
            }
        else:
            payload, meta = hashlib.sha256(str(i).encode()).digest() * 4, {
                "width": None, "height": None, "channels": None,
                "sample_rate": None, "n_frames": 100 + i, "format": "mp4",
            }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# MP4 container metadata (REAL box parse; frame decode stays stubbed)
# ---------------------------------------------------------------------------


def _mp4_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Iterate ISO BMFF boxes: (type, body_start, body_end). 64-bit
    largesize boxes supported; size-0 (to-EOF) supported at top level."""
    pos = start
    end = len(data) if end is None else end
    while pos + 8 <= end:
        size = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            size = int.from_bytes(data[pos + 8:pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"malformed MP4 box {typ!r} at {pos}")
        yield typ.decode("latin1"), body, pos + size
        pos += size


def mp4_metadata(data: bytes) -> dict:
    """REAL parse of an MP4/ISO-BMFF container's structure → dict with
    duration_s, timescale, n_tracks, and per-track (handler, width,
    height, codec). This is the metadata a 100 TB pipeline filters on
    BEFORE shipping bytes to a GPU decode stage; the frame decode itself
    remains the documented stub (H.264/AV1 entropy decoding is the one
    thing this repo does not reimplement)."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 (missing ftyp)")
    out: dict = {"duration_s": None, "timescale": None, "tracks": []}
    for typ, b, e in _mp4_boxes(data):
        if typ != "moov":
            continue
        for t2, b2, e2 in _mp4_boxes(data, b, e):
            if t2 == "mvhd":
                ver = data[b2]
                if ver == 1:
                    ts = int.from_bytes(data[b2 + 20:b2 + 24], "big")
                    dur = int.from_bytes(data[b2 + 24:b2 + 32], "big")
                else:
                    ts = int.from_bytes(data[b2 + 12:b2 + 16], "big")
                    dur = int.from_bytes(data[b2 + 16:b2 + 20], "big")
                out["timescale"] = ts
                out["duration_s"] = round(dur / ts, 6) if ts else None
            elif t2 == "trak":
                trk = {"handler": None, "width": None, "height": None,
                       "codec": None}
                for t3, b3, e3 in _mp4_boxes(data, b2, e2):
                    if t3 == "tkhd":
                        ver = data[b3]
                        off = b3 + (96 if ver == 1 else 84)
                        # 16.16 fixed-point width/height at the box tail
                        trk["width"] = int.from_bytes(
                            data[off - 8:off - 4], "big") >> 16 or None
                        trk["height"] = int.from_bytes(
                            data[off - 4:off], "big") >> 16 or None
                    elif t3 == "mdia":
                        for t4, b4, e4 in _mp4_boxes(data, b3, e3):
                            if t4 == "hdlr":
                                trk["handler"] = data[b4 + 8:b4 + 12].decode(
                                    "latin1")
                            elif t4 == "minf":
                                for t5, b5, e5 in _mp4_boxes(data, b4, e4):
                                    if t5 != "stbl":
                                        continue
                                    for t6, b6, e6 in _mp4_boxes(
                                            data, b5, e5):
                                        if t6 == "stsd":
                                            n = int.from_bytes(
                                                data[b6 + 4:b6 + 8], "big")
                                            if n:
                                                trk["codec"] = data[
                                                    b6 + 12:b6 + 16
                                                ].decode("latin1")
                out["tracks"].append(trk)
    if out["timescale"] is None:
        raise ValueError("MP4 has no moov/mvhd (fragmented-only streams "
                         "unsupported)")
    out["n_tracks"] = len(out["tracks"])
    return out


def video_stats(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """REAL MP4 container parse → (id_col, duration_s, n_tracks, width,
    height, codec) — width/height/codec from the first video track. Same
    Arrow-batched mapInPandas shape as image_stats; the binary column is
    read but never decoded beyond box structure."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   (id_col, "duration_s", "n_tracks", "width", "height",
                    "codec")}
            for row in pdf.itertuples(index=False):
                m = mp4_metadata(bytes(row.data))
                vid = next(
                    (t for t in m["tracks"] if t["handler"] == "vide"),
                    {"width": None, "height": None, "codec": None},
                )
                out[id_col].append(getattr(row, id_col))
                out["duration_s"].append(m["duration_s"])
                out["n_tracks"].append(m["n_tracks"])
                out["width"].append(vid["width"])
                out["height"].append(vid["height"])
                out["codec"].append(vid["codec"])
            yield pd.DataFrame(out)

    return media.select(id_col, "data").mapInPandas(
        run,
        schema=(f"{id_col} long, duration_s double, n_tracks int, "
                "width int, height int, codec string"),
    )


def encode_mp4_skeleton(
    duration_s: float,
    width: int,
    height: int,
    codec: str = "avc1",
    timescale: int = 1000,
) -> bytes:
    """Minimal structurally-valid MP4 (ftyp + moov[mvhd + trak[tkhd +
    mdia[hdlr + minf[stbl[stsd]]]]], no media data) for metadata-path
    tests — the container the parser reads, with none of the frames it
    refuses to decode."""

    def box(typ: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    dur = int(round(duration_s * timescale))
    mvhd = box(b"mvhd", bytes(12) + timescale.to_bytes(4, "big")
               + dur.to_bytes(4, "big") + bytes(80))
    tkhd = box(b"tkhd", bytes(76)
               + (width << 16).to_bytes(4, "big")
               + (height << 16).to_bytes(4, "big"))
    hdlr = box(b"hdlr", bytes(8) + b"vide" + bytes(12))
    stsd = box(b"stsd", bytes(4) + (1).to_bytes(4, "big")
               + box(codec.encode("latin1")[:4].ljust(4), bytes(8)))
    stbl = box(b"stbl", stsd)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    ftyp = box(b"ftyp", b"isom" + bytes(4) + b"isomiso2")
    return ftyp + moov


def synth_mp4_from_ids(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MP4 skeleton per id, encoded executor-side
    (mapInPandas): duration_s = (id % 97 + 1)/4 (exact quarter-seconds at
    timescale 1000), width = 320 + id%5·160, height = 240 + id%3·120,
    codec cycling avc1/hvc1/av01 — every field a closed form a SQL oracle
    reproduces, so the container parse is value-checked end to end.
    → (id_col, kind='video', data, meta) rows in MEDIA_SCHEMA shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, datas, metas = [], [], []
            for i in pdf[id_col].astype("int64"):
                i = int(i)
                dur = (i % 97 + 1) / 4.0
                w = 320 + (i % 5) * 160
                h = 240 + (i % 3) * 120
                codec = ["avc1", "hvc1", "av01"][i % 3]
                ids.append(i)
                datas.append(encode_mp4_skeleton(dur, w, h, codec))
                metas.append(
                    {"width": w, "height": h, "channels": None,
                     "sample_rate": None, "n_frames": None, "format": "mp4"}
                )
            yield pd.DataFrame(
                {id_col: ids, "kind": "video", "data": datas, "meta": metas}
            )

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("kind", StringType()),
            StructField("data", BinaryType()),
            StructField("meta", MEDIA_SCHEMA["meta"].dataType),
        ]
    )
    return ids_df.select(id_col).mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# MJPEG video: real frame decode (closes the video-frame stub for the one
# codec expressible with the in-repo baseline-JPEG machinery; H.264/AV1
# entropy decoding remains the documented lib-bound refusal)
# ---------------------------------------------------------------------------


def encode_mjpeg_mp4(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 4,
    timescale: int = 1000,
) -> bytes:
    """Baseline-JPEG frames → a real MJPEG-in-MP4: ftyp + mdat holding the
    frame bytes + moov whose stbl carries the actual sample tables (stsd
    'jpeg', stts, stsc one-sample-per-chunk, stsz per-frame sizes, stco
    absolute offsets into mdat). Everything ``mp4_jpeg_frames`` needs to
    locate and decode frames, with none of the inter-frame machinery this
    repo deliberately refuses to fake."""

    def box(typ: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    ftyp = box(b"ftyp", b"isom" + bytes(4) + b"isomiso2")
    mdat_body = b"".join(frames)
    # absolute chunk offsets need the final mdat position: ftyp, then mdat
    mdat_start = len(ftyp) + 8
    offs, pos = [], mdat_start
    for fb in frames:
        offs.append(pos)
        pos += len(fb)
    n = len(frames)
    dur = int(round(n / fps * timescale))
    sample_dur = int(round(timescale / fps))
    mvhd = box(b"mvhd", bytes(12) + timescale.to_bytes(4, "big")
               + dur.to_bytes(4, "big") + bytes(80))
    tkhd = box(b"tkhd", bytes(76)
               + (width << 16).to_bytes(4, "big")
               + (height << 16).to_bytes(4, "big"))
    hdlr = box(b"hdlr", bytes(8) + b"vide" + bytes(12))
    stsd = box(b"stsd", bytes(4) + (1).to_bytes(4, "big")
               + box(b"jpeg", bytes(8)))
    stts = box(b"stts", bytes(4) + (1).to_bytes(4, "big")
               + n.to_bytes(4, "big") + sample_dur.to_bytes(4, "big"))
    stsc = box(b"stsc", bytes(4) + (1).to_bytes(4, "big")
               + (1).to_bytes(4, "big") + (1).to_bytes(4, "big")
               + (1).to_bytes(4, "big"))
    stsz = box(b"stsz", bytes(4) + (0).to_bytes(4, "big")
               + n.to_bytes(4, "big")
               + b"".join(len(fb).to_bytes(4, "big") for fb in frames))
    stco = box(b"stco", bytes(4) + n.to_bytes(4, "big")
               + b"".join(o.to_bytes(4, "big") for o in offs))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + box(b"mdat", mdat_body) + moov


def mp4_jpeg_frames(data: bytes) -> list[np.ndarray]:
    """REAL frame decode for MJPEG-in-MP4: walk the video track's stbl,
    slice each sample out of the file via stsz + stco (one sample per
    chunk, the layout ``encode_mjpeg_mp4`` writes and the common MJPEG
    shape), and run each through the in-repo baseline-JPEG decoder.
    Non-JPEG codecs raise the same typed strict-mode error as before —
    H.264/AV1 entropy decoding is the one genuinely lib-bound step."""
    from .jpeg import decode_jpeg

    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 (missing ftyp)")
    for typ, b, e in _mp4_boxes(data):
        if typ != "moov":
            continue
        for t2, b2, e2 in _mp4_boxes(data, b, e):
            if t2 != "trak":
                continue
            handler, codec, sizes, offsets = None, None, None, None
            for t3, b3, e3 in _mp4_boxes(data, b2, e2):
                if t3 != "mdia":
                    continue
                for t4, b4, e4 in _mp4_boxes(data, b3, e3):
                    if t4 == "hdlr":
                        handler = data[b4 + 8:b4 + 12].decode("latin1")
                    elif t4 == "minf":
                        for t5, b5, e5 in _mp4_boxes(data, b4, e4):
                            if t5 != "stbl":
                                continue
                            for t6, b6, e6 in _mp4_boxes(data, b5, e5):
                                if t6 == "stsd":
                                    if int.from_bytes(
                                            data[b6 + 4:b6 + 8], "big"):
                                        codec = data[b6 + 12:b6 + 16].decode(
                                            "latin1")
                                elif t6 == "stsz":
                                    cnt = int.from_bytes(
                                        data[b6 + 8:b6 + 12], "big")
                                    fixed = int.from_bytes(
                                        data[b6 + 4:b6 + 8], "big")
                                    sizes = (
                                        [fixed] * cnt if fixed else [
                                            int.from_bytes(
                                                data[b6 + 12 + 4 * i:
                                                     b6 + 16 + 4 * i], "big")
                                            for i in range(cnt)
                                        ]
                                    )
                                elif t6 == "stco":
                                    cnt = int.from_bytes(
                                        data[b6 + 4:b6 + 8], "big")
                                    offsets = [
                                        int.from_bytes(
                                            data[b6 + 8 + 4 * i:
                                                 b6 + 12 + 4 * i], "big")
                                        for i in range(cnt)
                                    ]
            if handler != "vide":
                continue
            if codec != "jpeg":
                raise NotImplementedError(
                    f"video frame decode for codec {codec!r} requires a "
                    "library not present in this container (MJPEG decodes "
                    "natively via functions/jpeg.py)"
                )
            if not sizes or not offsets or len(sizes) != len(offsets):
                raise ValueError("MJPEG track missing stsz/stco sample tables")
            return [
                decode_jpeg(data[o:o + s]) for o, s in zip(offsets, sizes)
            ]
    raise ValueError("MP4 has no video track")


def video_frame_stats(
    media: DataFrame, every_n: int = 1, id_col: str = "media_id"
) -> DataFrame:
    """Decoded-frame statistics for MJPEG videos → one row per sampled
    frame: (id_col, frame_idx, height, width, mean_px). Arrow-batched
    mapInPandas like image_stats; the Spark-side shape (schema,
    partitioning, batch iteration) is identical for any codec — only the
    per-sample decode call is codec-bound."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   (id_col, "frame_idx", "height", "width", "mean_px")}
            for row in pdf.itertuples(index=False):
                frames = mp4_jpeg_frames(bytes(row.data))
                for idx in range(0, len(frames), max(every_n, 1)):
                    img = frames[idx]
                    out[id_col].append(getattr(row, id_col))
                    out["frame_idx"].append(idx)
                    out["height"].append(int(img.shape[0]))
                    out["width"].append(int(img.shape[1]))
                    out["mean_px"].append(float(np.mean(img)))
            yield pd.DataFrame(out)

    return media.select(id_col, "data").mapInPandas(
        run,
        schema=(f"{id_col} long, frame_idx int, height int, width int, "
                "mean_px double"),
    )


def synth_mjpeg_from_ids(
    ids_df: DataFrame, id_col: str = "doc_id", size: int = 16
) -> DataFrame:
    """Deterministic MJPEG-in-MP4 per id: n_frames = 3 + id%4 solid-gray
    ``size``×``size`` frames with level g(id, f) = 2·((id·31 + f·17) % 120)
    + 8 — EVEN gray levels make the quant=1 baseline-JPEG roundtrip exact
    (a constant block has one DC coefficient, 8·(g−128), divisible by the
    flat quantizer), so decoded frame means are closed forms a SQL oracle
    reproduces bit-for-bit. → (id_col, kind='video', data, meta)."""
    from .jpeg import encode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, datas, metas = [], [], []
            for i in pdf[id_col].astype("int64"):
                i = int(i)
                n = 3 + i % 4
                frames = []
                for f in range(n):
                    g = 2 * ((i * 31 + f * 17) % 120) + 8
                    img = np.full((size, size), g, dtype=np.uint8)
                    frames.append(encode_jpeg(img, quant=1))
                ids.append(i)
                datas.append(encode_mjpeg_mp4(frames, size, size))
                metas.append(
                    {"width": size, "height": size, "channels": 1,
                     "sample_rate": None, "n_frames": n, "format": "mp4"}
                )
            yield pd.DataFrame(
                {id_col: ids, "kind": "video", "data": datas, "meta": metas}
            )

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("kind", StringType()),
            StructField("data", BinaryType()),
            StructField("meta", MEDIA_SCHEMA["meta"].dataType),
        ]
    )
    return ids_df.select(id_col).mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# perceptual image hashing (dHash) + near-dup blocking
# ---------------------------------------------------------------------------


def _dhash_bits(img: np.ndarray) -> tuple[int, int]:
    """(h, w[, c]) uint8 → 64-bit dHash as (sig_hi, sig_lo) signed-long
    halves. Deterministic integer pipeline: channel mean → 8×9
    nearest-neighbor downsample (index floor, no interpolation dialects)
    → row-wise gradient sign bits, row-major."""
    g = img.astype(np.float64)
    if g.ndim == 3:
        g = g.mean(axis=2)
    h, w = g.shape
    ridx = (np.arange(8) * h) // 8
    cidx = (np.arange(9) * w) // 9
    small = g[np.ix_(ridx, cidx)]
    bits = (small[:, 1:] > small[:, :-1]).flatten()
    hi = int(sum(int(b) << (31 - i) for i, b in enumerate(bits[:32])))
    lo = int(sum(int(b) << (31 - i) for i, b in enumerate(bits[32:])))
    # match the simhash signature convention: signed 32-bit halves in longs
    return hi - (1 << 32) if hi >= (1 << 31) else hi, \
        lo - (1 << 32) if lo >= (1 << 31) else lo


def image_dhash(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """REAL decode (PPM/PNG/GIF/JPEG) → 64-bit perceptual dHash per image
    → (id, sig_hi, sig_lo), the standard near-dup signature for image
    corpora (gradient sign survives re-encoding and mild resizing, unlike
    the content digest). Same (id, sig_hi, sig_lo) shape as
    `operators.dedup.simhash64`, so the text machinery applies as-is."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, his, los = [], [], []
            for row in pdf.itertuples(index=False):
                hi, lo = _dhash_bits(_decode_image_real(bytes(row.data)))
                ids.append(getattr(row, id_col))
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame({"id": ids, "sig_hi": his, "sig_lo": los})

    return media.select(id_col, "data").mapInPandas(
        run, schema="id long, sig_hi long, sig_lo long"
    )


def image_near_dups(
    media: DataFrame, max_hamming: int = 6, id_col: str = "media_id"
) -> DataFrame:
    """Near-duplicate image pairs → (id_a, id_b, hamming): dHash
    signatures fed through the SAME pigeonhole chunk blocking + exact
    Hamming verify as text SimHash (`operators.dedup
    .signature_near_pairs`) — never an all-pairs join, hot-bucket
    behavior identical to the text path's documented trade."""
    from ..operators.dedup import signature_near_pairs

    return signature_near_pairs(image_dhash(media, id_col), max_hamming)
