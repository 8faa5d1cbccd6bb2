"""Multimodal (image/audio/video) columns: binary payloads + typed metadata.

Beyond-reference extension surface (north-star scope): a training-data
pipeline treats media as opaque BINARY columns with structured metadata and
runs decode / feature-extract / resize / frame-sample as Arrow-batched
Pandas transforms (`mapInPandas`). The Spark-side plumbing here — schemas,
header parsing, UDF signatures, batch iteration — is real and tested; only
the *external-codec* decode (JPEG/PNG/audio) is stubbed behind a try-import,
because the image/audio libraries are not in this container.

The testable payload is a tiny deterministic raw format:

    b'IMG1' | height:uint16be | width:uint16be | channels:uint8 | pixels...

so header extraction, pixel statistics, nearest-neighbor resize and frame
sampling all do REAL work on real bytes.

Scale notes:
  * Metadata (header fields) parses with NATIVE binary expressions — no
    Python in the partition-pruning / filtering path. Filter on width/height
    BEFORE decoding pixels and Catalyst prunes the heavy `img` column out of
    scans that only read metadata.
  * Pixel work runs in `mapInPandas`: one Python worker round-trip per Arrow
    batch, not per row. For 100 KB+ payloads set
    spark.sql.execution.arrow.maxRecordsPerBatch so a batch stays ~tens of
    MB (default 10k rows x 100 KB = 1 GB batches would OOM the worker).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"IMG1"
HEADER_LEN = 9

#: Typed metadata schema for media columns.
IMAGE_META_DDL = "height INT, width INT, channels INT, format STRING"


def pack_image(height: int, width: int, channels: int, pixels: bytes) -> bytes:
    """Encode the synthetic raw-image format."""
    return MAGIC + struct.pack(">HHB", height, width, channels) + pixels


def synthetic_images(
    spark: SparkSession, n: int, height: int = 8, width: int = 8, channels: int = 3
) -> DataFrame:
    """Deterministic distributed corpus of synthetic images: (img_id BIGINT,
    img BINARY). Pixel (i, y, x, c) = (img_id*31 + y*7 + x*3 + c) % 256 —
    generated inside mapInPandas, so creation is cluster-parallel too."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for img_id in pdf["id"]:
                px = bytes(
                    (img_id * 31 + y * 7 + x * 3 + c) % 256
                    for y in range(height)
                    for x in range(width)
                    for c in range(channels)
                )
                blobs.append(pack_image(height, width, channels, px))
            yield pd.DataFrame({"img_id": pdf["id"], "img": blobs})

    return spark.range(n).mapInPandas(gen, "img_id BIGINT, img BINARY")


def _be_int(col: Column, pos: int, nbytes: int) -> Column:
    """Big-endian unsigned int from binary bytes [pos, pos+nbytes) — native
    expression (hex → base-10), no Python. Public API only (F.substring
    operates on BINARY directly) — no `_jc` internals, so this survives
    Spark Connect."""
    return F.conv(F.hex(F.substring(col, pos, nbytes)), 16, 10).cast("int")


def image_meta_expr(img_col: str) -> Column:
    """STRUCT(height, width, channels, format) parsed from the header with
    native binary expressions — the cheap path for metadata-only queries."""
    magic_ok = F.substring(F.col(img_col), 1, 4) == F.lit(MAGIC)
    h = _be_int(F.col(img_col), 5, 2)
    w = _be_int(F.col(img_col), 7, 2)
    c = _be_int(F.col(img_col), 9, 1)
    return F.when(
        magic_ok,
        F.struct(
            h.alias("height"),
            w.alias("width"),
            c.alias("channels"),
            F.lit("img1").alias("format"),
        ),
    )


def _decode(blob: bytes):
    """Python-side decode of the synthetic format -> (h, w, c, pixels)."""
    if blob[:4] != MAGIC:
        raise ValueError("not an IMG1 payload")
    h, w, c = struct.unpack(">HHB", blob[4:HEADER_LEN])
    return h, w, c, blob[HEADER_LEN:]


def image_stats(df: DataFrame, img_col: str = "img", id_col: str = "img_id") -> DataFrame:
    """Per-image pixel statistics via Arrow-batched mapInPandas: (id, height,
    width, channels, mean_px DOUBLE, max_px INT). The numpy work is
    vectorized per batch — one Python round trip per Arrow batch."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("img_id", "height", "width", "channels", "mean_px", "max_px")}
            for img_id, blob in zip(pdf[id_col], pdf[img_col]):
                h, w, c, px = _decode(bytes(blob))
                arr = np.frombuffer(px, dtype=np.uint8)
                out["img_id"].append(img_id)
                out["height"].append(h)
                out["width"].append(w)
                out["channels"].append(c)
                out["mean_px"].append(float(arr.mean()) if arr.size else 0.0)
                out["max_px"].append(int(arr.max()) if arr.size else 0)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        stats,
        "img_id BIGINT, height INT, width INT, channels INT, mean_px DOUBLE, max_px INT",
    )


def resize_nearest(
    df: DataFrame, out_h: int, out_w: int, img_col: str = "img", id_col: str = "img_id"
) -> DataFrame:
    """Nearest-neighbor resize producing new IMG1 payloads (numpy indexing
    per Arrow batch). Output: (img_id, img) with out_h x out_w pixels."""
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for img_id, blob in zip(pdf[id_col], pdf[img_col]):
                h, w, c, px = _decode(bytes(blob))
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, c)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                small = arr[ys][:, xs]
                ids.append(img_id)
                blobs.append(pack_image(out_h, out_w, c, small.tobytes()))
            yield pd.DataFrame({"img_id": ids, "img": blobs})

    return df.mapInPandas(resize, "img_id BIGINT, img BINARY")


def sample_frames(
    df: DataFrame,
    every_nth: int,
    frame_col: str = "video",
    id_col: str = "video_id",
) -> DataFrame:
    """Frame sampling for 'video' payloads (an array of IMG1 frame blobs):
    keep every n-th frame, exploded to (video_id, frame_idx, img). Pure
    native expressions — selection never touches Python."""
    frames = F.col(frame_col)
    idx = F.sequence(F.lit(0), F.size(frames) - 1)
    kept = F.filter(idx, lambda i: i % every_nth == 0)
    pairs = F.transform(
        kept, lambda i: F.struct(i.alias("frame_idx"), F.element_at(frames, i + 1).alias("img"))
    )
    out = df.select(F.col(id_col), F.explode(pairs).alias("f"))
    return out.select(id_col, F.col("f.frame_idx"), F.col("f.img"))


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunks(blob: bytes):
    """Iterate (type, data) chunks of a PNG byte string."""
    if blob[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    i = 8
    while i + 8 <= len(blob):
        ln = int.from_bytes(blob[i : i + 4], "big")
        typ = blob[i + 4 : i + 8]
        yield typ, blob[i + 8 : i + 8 + ln]
        i += 12 + ln  # length + type + data + crc


def _avg_unfilter(line, prev, channels):
    """Average unfilter of one scanline. The left-neighbor dependence makes
    this inherently sequential along x, so each channel lane runs as a plain
    Python int loop over `.tolist()` values (numpy scalar indexing in a hot
    loop is slower than list indexing); the up-neighbor term is precomputed
    list-side."""
    import numpy as np

    w = line.size // channels
    r2 = line.reshape(w, channels)
    u2 = prev.reshape(w, channels)
    out = np.empty((w, channels), dtype=np.uint8)
    for ch in range(channels):
        r, u = r2[:, ch].tolist(), u2[:, ch].tolist()
        o, left = [], 0
        for i in range(w):
            left = (r[i] + ((left + u[i]) >> 1)) & 0xFF
            o.append(left)
        out[:, ch] = o
    return out.reshape(-1)


def _paeth_unfilter(line, prev, channels):
    """Paeth unfilter of one scanline — same sequential-along-x structure as
    `_avg_unfilter`; up and up-left lanes come from the (fully known)
    previous scanline."""
    import numpy as np

    w = line.size // channels
    r2 = line.reshape(w, channels)
    u2 = prev.reshape(w, channels)
    out = np.empty((w, channels), dtype=np.uint8)
    for ch in range(channels):
        r, u = r2[:, ch].tolist(), u2[:, ch].tolist()
        ul = [0] + u[:-1]
        o, left = [], 0
        for i in range(w):
            b, c = u[i], ul[i]
            p = left + b - c
            pa = abs(p - left)
            pb = abs(p - b)
            pc = abs(p - c)
            pred = left if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            left = (r[i] + pred) & 0xFF
            o.append(left)
        out[:, ch] = o
    return out.reshape(-1)


def decode_png(blob: bytes) -> tuple[int, int, int, bytes]:
    """Codec-library-free PNG decode → (height, width, channels, raw pixels).

    zlib inflate of the IDAT stream + per-scanline unfilter (all five PNG
    filter types: None/Sub/Up/Average/Paeth) — stdlib + numpy only. The
    unfilter is numpy-vectorized where the data dependence allows: Sub is a
    per-channel-lane cumulative sum (sum mod 256 distributes over the
    prefix), Up is one wrapping uint8 vector add, None is a copy; Average
    and Paeth depend on the just-reconstructed left neighbor, so they run
    as per-lane integer loops (w iterations, not w*channels byte ops in
    bytearrays as before). Palette expansion is one numpy fancy-index.
    Supports 8-bit gray / gray+alpha / RGB / RGBA / palette (expanded to
    RGB), non-interlaced; 16-bit and Adam7 raise NotImplementedError
    explicitly (at decode, with the offending parameter named)."""
    import numpy as np
    ihdr, plte, idat = None, None, bytearray()
    for typ, data in _png_chunks(bytes(blob)):
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8 supported)")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"bad PNG color type {ctype}")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG pixel data length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(arr[y, 0])
        line = arr[y, 1:]
        if f == 0:
            cur = line.copy()
        elif f == 1:  # Sub: prefix sum per channel lane (mod-256 distributes)
            cur = (
                (line.reshape(w, channels).astype(np.int32).cumsum(axis=0) & 0xFF)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif f == 2:  # Up: wrapping uint8 vector add
            cur = line + prev
        elif f == 3:  # Average
            cur = _avg_unfilter(line, prev, channels)
        elif f == 4:  # Paeth
            cur = _paeth_unfilter(line, prev, channels)
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = cur
        prev = out[y]
    if ctype == 3:  # palette indices -> RGB, one fancy-index gather
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        out = pal[out.reshape(-1)]
        channels = 3
    return h, w, channels, out.tobytes()


def decode_external(
    df: DataFrame,
    img_col: str = "img",
    id_col: str = "img_id",
    fmt: str = "png",
) -> DataFrame:
    """Decode real-world image formats into IMG1 payloads — (img_id, img)
    rows downstream operators (`image_stats`, `resize_nearest`) consume
    unchanged. Same Arrow-batched `mapInPandas` plumbing as `image_stats`:
    one Python round trip per batch, never per row.

    PNG decodes with the stdlib-only `decode_png` (zlib inflate +
    unfilter) — no external codec library required. Other formats (JPEG,
    WebP, ...) need PIL, which this container does not ship; they raise
    NotImplementedError at plan-BUILD time (not mid-job on an executor)
    until pillow is installed, at which point the PIL branch below handles
    any format it can open."""
    fmt = fmt.lower()
    use_pil = fmt != "png"
    if use_pil:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                f"decoding {fmt!r} requires pillow, which is not installed; "
                "PNG decodes without it (fmt='png'), and the IMG1 synthetic "
                "format (image_stats/resize_nearest) needs no codec at all"
            ) from exc

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_pil:
            import io

            import numpy as np
            import PIL.Image
        for pdf in batches:
            ids, blobs = [], []
            for img_id, blob in zip(pdf[id_col], pdf[img_col]):
                if use_pil:
                    arr = np.asarray(PIL.Image.open(io.BytesIO(bytes(blob))))
                    h, w = arr.shape[:2]
                    c = 1 if arr.ndim == 2 else arr.shape[2]
                    px = arr.astype("uint8").tobytes()
                else:
                    h, w, c, px = decode_png(bytes(blob))
                ids.append(img_id)
                blobs.append(pack_image(h, w, c, px))
            yield pd.DataFrame({"img_id": ids, "img": blobs})

    return df.mapInPandas(dec, "img_id BIGINT, img BINARY")
