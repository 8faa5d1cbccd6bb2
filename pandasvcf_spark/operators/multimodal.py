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


def decode_external(df: DataFrame, img_col: str = "img", fmt: str = "jpeg") -> DataFrame:
    """Decode real-world formats (JPEG/PNG/...). STUB: the decoding libraries
    (PIL / torchvision / ffmpeg) are not available in this container; the
    Spark plumbing (Arrow batching, schema) is identical to `image_stats` —
    swap `_decode` for the codec call when a codec is installed."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "external image codecs are not installed in this environment; "
            "use the IMG1 synthetic format (image_stats/resize_nearest) or "
            "install pillow to enable this path"
        ) from exc
    raise NotImplementedError("wire PIL decode here when available")
