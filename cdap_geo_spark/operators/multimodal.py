"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque ``binary`` payloads + typed metadata structs —
the same convention as geometry spans (``media_ref`` pointers in the
interleaved docs, resolved to blobs by an upstream fetch stage).

Decode strategy: flat binary formats (netpbm P5/P6, uncompressed
24-bit BMP, PCM16 WAV) are decoded FOR REAL in pure NumPy
(``decode_ppm``/``decode_bmp``/``decode_wav``/``decode_auto``), so the
decode -> feature-extract -> resize path is genuinely exercised
end-to-end. Codec formats (JPEG/PNG/MP4) need libraries this container
lacks — ``decode=`` accepts any ``bytes -> np.ndarray`` callable for
those, and ``deterministic_fake_decode`` is a seeded stand-in for
exact tests of the batching machinery.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_TYPE = T.StructType([
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha", T.StringType()),
])


def not_implemented_decode(blob: bytes) -> np.ndarray:
    raise NotImplementedError(
        "media codecs unavailable in this environment; inject decode=")


# ---------------------------------------------------------------------------
# real decoders for library-free formats (pure NumPy byte parsing)
# ---------------------------------------------------------------------------
# JPEG/PNG/MP4 need codec libraries this container lacks (inject
# ``decode=`` for those), but PPM/PGM, uncompressed BMP and PCM WAV
# are flat binary layouts — decoded here for real, so the multimodal
# pipeline has a genuinely exercised decode path end-to-end.

def _ppm_tokens(blob: bytes, n: int, pos: int):
    """First n whitespace-separated header tokens after ``pos``,
    skipping ``#`` comments (netpbm spec)."""
    toks = []
    while len(toks) < n:
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos:pos + 1].isspace():
            pos += 1
        toks.append(blob[start:pos])
    return toks, pos + 1  # single whitespace after maxval


def decode_ppm(blob: bytes) -> np.ndarray:
    """P6 (RGB) / P5 (gray) binary netpbm -> (h, w, 3|1) uint8."""
    magic = blob[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary netpbm payload")
    (w, h, maxval), pos = _ppm_tokens(blob, 3, 2)
    w, h, maxval = int(w), int(h), int(maxval)
    if maxval > 255:
        raise ValueError("16-bit netpbm unsupported")
    ch = 3 if magic == b"P6" else 1
    data = np.frombuffer(blob, np.uint8, count=h * w * ch, offset=pos)
    return data.reshape(h, w, ch)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3|1) uint8 -> P6/P5 bytes (round-trips decode_ppm)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    magic = b"P6" if arr.shape[2] == 3 else b"P5"
    head = b"%s\n%d %d\n255\n" % (magic, arr.shape[1], arr.shape[0])
    return head + arr.astype(np.uint8).tobytes()


def decode_bmp(blob: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BI_RGB, BITMAPINFOHEADER) ->
    (h, w, 3) uint8 RGB, top-down."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(blob[10:14], "little")
    w = int.from_bytes(blob[18:22], "little", signed=True)
    h = int.from_bytes(blob[22:26], "little", signed=True)
    bpp = int.from_bytes(blob[28:30], "little")
    comp = int.from_bytes(blob[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(blob, np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flip else img


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: channels per PNG color type (palette type 3 unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunks(blob: bytes):
    """Yield (type, data) chunks, CRC-checked (PNG spec layout)."""
    import zlib
    pos = 8
    while pos + 8 <= len(blob):
        size = int.from_bytes(blob[pos:pos + 4], "big")
        ctype = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + size]
        crc = int.from_bytes(blob[pos + 8 + size:pos + 12 + size], "big")
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos += 12 + size
        if ctype == b"IEND":
            return


def _paeth_predict(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(blob: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG (gray / RGB / gray+alpha / RGBA) ->
    (h, w, channels) uint8. Pure NumPy + stdlib zlib: chunk walk,
    IDAT inflate, per-scanline unfilter (all five PNG filter types;
    Sub as a per-lane cumulative sum, Up vectorized, Average/Paeth
    byte loops over the one sequential dimension). Palette (color
    type 3), 16-bit and Adam7-interlaced payloads raise ValueError.
    """
    import zlib
    if blob[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    ihdr = None
    idat = bytearray()
    for ctype, data in _png_chunks(bytes(blob)):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.extend(data)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype_n, _comp, _filt, interlace = ihdr[8:13]
    if depth != 8:
        raise ValueError("only 8-bit PNG supported")
    if ctype_n not in _PNG_CHANNELS:
        raise ValueError("palette PNG unsupported")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG unsupported")
    ch = _PNG_CHANNELS[ctype_n]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1)
        if f == 0:
            rec = row.copy()
        elif f == 1:   # Sub: rec[x] = row[x] + rec[x-ch] -> lane cumsum
            rec = (row.reshape(w, ch).astype(np.int64).cumsum(axis=0)
                   % 256).astype(np.uint8).reshape(stride)
        elif f == 2:   # Up
            rec = row + prev
        elif f == 3:   # Average
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (row[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:   # Paeth
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                c = int(prev[x - ch]) if x >= ch else 0
                rec[x] = (row[x] + _paeth_predict(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec
        prev = out[y]
    return out.reshape(h, w, ch)


def encode_png(arr: np.ndarray, filters=0) -> bytes:
    """(h, w[, channels]) uint8 -> PNG bytes (round-trips
    :func:`decode_png`). ``filters``: one filter type 0-4 for every
    scanline, or a per-row list — encoding with varied filters is how
    the tests (and the oracle-gated query) exercise every unfilter
    path. All five filters vectorize at encode time (they read only
    already-reconstructed bytes)."""
    import zlib
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    ctype_n = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    rec = arr.astype(np.uint8).reshape(h, w * ch)
    flist = [int(filters)] * h if np.isscalar(filters) else list(filters)
    lines = bytearray()
    zero = np.zeros(w * ch, np.uint8)
    for y in range(h):
        cur = rec[y].astype(np.int16)
        up = (rec[y - 1] if y else zero).astype(np.int16)
        left = np.zeros(w * ch, np.int16)
        left[ch:] = cur[:-ch]
        upleft = np.zeros(w * ch, np.int16)
        upleft[ch:] = up[:-ch]
        f = flist[y]
        if f == 0:
            raw = cur
        elif f == 1:
            raw = cur - left
        elif f == 2:
            raw = cur - up
        elif f == 3:
            raw = cur - ((left + up) >> 1)
        elif f == 4:
            p = left + up - upleft
            pa, pb, pc = (abs(p - left), abs(p - up), abs(p - upleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, up, upleft))
            raw = cur - pred
        else:
            raise ValueError(f"unknown PNG filter {f}")
        lines.append(f)
        lines.extend((raw & 0xFF).astype(np.uint8).tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (len(data).to_bytes(4, "big") + ctype + data +
                (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big") +
            bytes([8, ctype_n, 0, 0, 0]))
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(bytes(lines), 6)) +
            chunk(b"IEND", b""))


def decode_wav(blob: bytes) -> np.ndarray:
    """PCM 16-bit RIFF/WAVE -> (n_samples, n_channels) int16."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, n_ch, bits, data = 12, None, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        size = int.from_bytes(blob[pos + 4:pos + 8], "little")
        body = blob[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            n_ch = int.from_bytes(body[2:4], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1 or bits != 16:
                raise ValueError("only PCM16 WAV supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if data is None or n_ch is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, "<i2")
    return samples.reshape(-1, n_ch)


def decode_auto(blob: bytes) -> np.ndarray:
    """Magic-byte dispatch: netpbm / BMP / PNG / WAV decoded for real;
    remaining codec formats (JPEG/MP4/...) raise (inject decode=)."""
    if blob[:2] in (b"P6", b"P5"):
        return decode_ppm(blob)
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:8] == _PNG_MAGIC:
        return decode_png(blob)
    if blob[:4] == b"RIFF":
        return decode_wav(blob)
    # ValueError, not NotImplementedError: under decode_auto an
    # unknown codec payload is a per-ROW failure (ok=False), while
    # NotImplementedError stays the "no decoder injected at all" guard
    # that fails the whole job loudly.
    raise ValueError(
        "no lib-free decoder for this payload; inject decode= for "
        "codec formats (JPEG/MP4)")


def resize_nearest(arr: np.ndarray, height: int, width: int) -> np.ndarray:
    """Nearest-neighbour resample (pure index arithmetic)."""
    h, w = arr.shape[0], arr.shape[1]
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[yi][:, xi]


def deterministic_fake_decode(blob: bytes) -> np.ndarray:
    """Seeded stand-in decoder: bytes -> fake HxWx3 uint8 'image' whose
    content is a pure function of the payload (tests stay exact)."""
    h = (sum(blob[:16]) % 8) + 2 if blob else 2
    w = (sum(blob[-16:]) % 8) + 2 if blob else 2
    seed = int.from_bytes(blob[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)


def media_metadata(df: DataFrame, blob_col: str = "media",
                   media_type: str = "image") -> DataFrame:
    """Typed metadata columns — native, no decode needed."""
    return df.withColumn("media_meta", F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.length(F.col(blob_col)).cast("long").alias("n_bytes"),
        F.sha2(F.col(blob_col), 256).alias("sha"),
    ))


def extract_features(df: DataFrame, *, blob_col: str = "media",
                     id_col: str = "doc_id", feat_dim: int = 16,
                     decode=not_implemented_decode,
                     batch_limit: int = 256) -> DataFrame:
    """mapInPandas feature extraction: blob -> decode -> pooled feature
    vector (mean/std per channel + shape), emitted as array<float>.

    ``batch_limit`` caps rows per emitted pandas frame so a partition
    of large blobs never materializes more than ~batch_limit decoded
    frames at once (the memory contract a 100 TB media table needs).
    """
    schema = T.StructType([
        df.schema[id_col],
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ])

    def gen(batches):
        for pdf in batches:
            for s in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[s:s + batch_limit]
                feats, oks = [], []
                for blob in chunk[blob_col]:
                    try:
                        arr = decode(bytes(blob)) if blob is not None else None
                    except NotImplementedError:
                        raise
                    except Exception:
                        arr = None
                    if arr is None:
                        feats.append(None)
                        oks.append(False)
                        continue
                    a = arr.astype(np.float64)
                    if a.ndim == 1:      # mono audio
                        a = a[:, None, None]
                    elif a.ndim == 2:    # (samples, channels) audio
                        a = a[:, None, :]
                    v = np.concatenate([
                        a.mean(axis=(0, 1)), a.std(axis=(0, 1)),
                        [a.shape[0], a.shape[1]]])
                    v = np.resize(v, feat_dim).astype(np.float32)
                    feats.append(v.tolist())
                    oks.append(True)
                yield pd.DataFrame({
                    id_col: chunk[id_col].to_numpy(),
                    "features": feats,
                    "decode_ok": oks,
                })

    return df.select(id_col, blob_col).mapInPandas(gen, schema=schema)


def frame_sample_refs(df: DataFrame, *, id_col: str = "doc_id",
                      n_frames_col: str = "n_frames",
                      every: int = 10) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index —
    native sequence/explode (the decode of each frame is a later
    ``extract_features`` pass over the fetched frame blobs)."""
    idxs = F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every))
    return df.select(id_col, F.explode(idxs).alias("frame_idx"))


def resize_images(df: DataFrame, *, height: int, width: int,
                  blob_col: str = "media", id_col: str = "doc_id",
                  decode=decode_auto,
                  batch_limit: int = 256) -> DataFrame:
    """mapInPandas image resize: decode -> nearest-neighbour resample
    -> re-encode as netpbm bytes. Same memory contract as
    :func:`extract_features` (``batch_limit`` decoded frames in
    flight per partition); failed decodes yield NULL + ok=False."""
    schema = T.StructType([
        df.schema[id_col],
        T.StructField("resized", T.BinaryType()),
        T.StructField("ok", T.BooleanType()),
    ])

    def gen(batches):
        for pdf in batches:
            for s in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[s:s + batch_limit]
                outs, oks = [], []
                for blob in chunk[blob_col]:
                    try:
                        arr = decode(bytes(blob)) if blob is not None \
                            else None
                    except NotImplementedError:
                        raise
                    except Exception:
                        arr = None
                    if arr is None or arr.ndim < 2:
                        outs.append(None)
                        oks.append(False)
                        continue
                    outs.append(encode_ppm(
                        resize_nearest(arr, height, width)))
                    oks.append(True)
                yield pd.DataFrame({
                    id_col: chunk[id_col].to_numpy(),
                    "resized": outs,
                    "ok": oks,
                })

    return df.select(id_col, blob_col).mapInPandas(gen, schema=schema)
