"""Tests: multimodal binary columns, pandas-UDF extension surface,
reshape union, parquet sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandasvcf_spark.operators.multimodal import (
    decode_external,
    image_meta_expr,
    image_stats,
    resize_nearest,
    sample_frames,
    synthetic_images,
)


@pytest.fixture(scope="module")
def images(spark):
    return synthetic_images(spark, 20, height=8, width=6, channels=3).cache()


def test_native_header_parse_matches_pandas_decode(spark, images):
    meta = images.select("img_id", image_meta_expr("img").alias("m"))
    stats = image_stats(images)
    j = meta.join(stats, on="img_id")
    rows = j.collect()
    assert len(rows) == 20
    for r in rows:
        assert (r["m"]["height"], r["m"]["width"], r["m"]["channels"]) == (
            r["height"], r["width"], r["channels"]) == (8, 6, 3)
        assert r["m"]["format"] == "img1"


def test_image_stats_deterministic(spark, images):
    r = {x["img_id"]: x for x in image_stats(images).collect()}
    # pixel(0, y, x, c) = (y*7 + x*3 + c) % 256 — recompute expected mean
    px = [(y * 7 + x * 3 + c) % 256 for y in range(8) for x in range(6) for c in range(3)]
    assert abs(r[0]["mean_px"] - sum(px) / len(px)) < 1e-9
    assert r[0]["max_px"] == max(px)


def test_resize_shape_and_content(spark, images):
    small = resize_nearest(images, 4, 3)
    meta = small.select("img_id", image_meta_expr("img").alias("m")).collect()
    for r in meta:
        assert (r["m"]["height"], r["m"]["width"]) == (4, 3)
    # resized payload stays decodable end to end
    stats = image_stats(small).collect()
    assert all(0 <= s["mean_px"] <= 255 for s in stats)


def test_frame_sampling_native(spark, images):
    # build "videos" of 6 frames each from the image corpus
    vids = (
        images.withColumn("video_id", F.col("img_id") % 4)
        .groupBy("video_id")
        .agg(F.collect_list("img").alias("video"))
    )
    sampled = sample_frames(vids, every_nth=2)
    rows = sampled.collect()
    assert all(r["frame_idx"] % 2 == 0 for r in rows)
    per_vid = {}
    for r in rows:
        per_vid.setdefault(r["video_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 2, 4] for v in per_vid.values())


def _encode_png(h, w, channels, pixels, filters=None):
    """Minimal test-side PNG encoder (stdlib only): one IHDR, one zlib IDAT,
    per-scanline filter bytes chosen by `filters` so every unfilter branch
    of the decoder gets exercised."""
    import struct
    import zlib

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = w * channels
    filters = filters or [0] * h
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = bytes(pixels[y * stride : (y + 1) * stride])
        f = filters[y]
        enc = bytearray()
        for x in range(stride):
            a = line[x - channels] if x >= channels else 0
            b = prev[x]
            c = prev[x - channels] if x >= channels else 0
            if f == 0:
                v = line[x]
            elif f == 1:
                v = line[x] - a
            elif f == 2:
                v = line[x] - b
            elif f == 3:
                v = line[x] - ((a + b) >> 1)
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = line[x] - pred
            enc.append(v & 0xFF)
        raw.append(f)
        raw += enc
        prev = line

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_all_filters_roundtrip():
    """decode_png must invert every PNG filter type bit-exactly."""
    from pandasvcf_spark.operators.multimodal import decode_png

    h, w, c = 5, 7, 3
    pixels = bytes((y * 31 + x * 7 + ch * 3) % 256 for y in range(h) for x in range(w) for ch in range(c))
    png = _encode_png(h, w, c, pixels, filters=[0, 1, 2, 3, 4])
    got = decode_png(png)
    assert got == (h, w, c, pixels)
    # grayscale path
    g = bytes((x * 11) % 256 for x in range(12))
    assert decode_png(_encode_png(3, 4, 1, g, filters=[4, 2, 1])) == (3, 4, 1, g)


def test_decode_external_png_feeds_image_stats(spark):
    """decode_external transcodes real PNG bytes into IMG1 payloads the
    existing operators consume — no codec library involved."""
    h, w, c = 6, 4, 3
    rows = []
    for img_id in range(8):
        px = bytes((img_id * 17 + i) % 256 for i in range(h * w * c))
        rows.append((img_id, _encode_png(h, w, c, px, filters=[img_id % 5] * h), px))
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in rows], "img_id long, img binary"
    )
    decoded = decode_external(df, fmt="png")
    stats = {r["img_id"]: r for r in image_stats(decoded).collect()}
    for img_id, _, px in rows:
        s = stats[img_id]
        assert (s["height"], s["width"], s["channels"]) == (h, w, c)
        assert abs(s["mean_px"] - sum(px) / len(px)) < 1e-9
        assert s["max_px"] == max(px)


def test_decode_png_vectorized_throughput():
    """The numpy unfilter must beat a per-byte reference loop by >=10x on
    the chain-free filter types (None/Sub/Up) on a realistic 256x256 RGB
    payload. Average/Paeth depend on the just-reconstructed left neighbor —
    inherently sequential along x (even libpng's SIMD paths only vectorize
    across channel lanes there) — so they are reported but not asserted."""
    import time

    import numpy as np

    from pandasvcf_spark.operators.multimodal import decode_png

    h, w, c = 256, 256, 3
    img = np.clip(
        80
        + 60 * np.sin(np.arange(h) / 37.0)[:, None, None]
        + 50 * np.cos(np.arange(w) / 23.0)[None, :, None]
        + np.arange(c)[None, None, :] * 12,
        0,
        255,
    ).astype(np.uint8)
    px = img.tobytes()
    png_up = _encode_png(h, w, c, px, filters=[2] * h)

    def decode_ref_up(blob):
        # the pre-vectorization per-byte unfilter shape, Up rows only
        import struct
        import zlib

        from pandasvcf_spark.operators.multimodal import _png_chunks

        ihdr, idat = None, bytearray()
        for typ, data in _png_chunks(bytes(blob)):
            if typ == b"IHDR":
                ihdr = data
            elif typ == b"IDAT":
                idat.extend(data)
        w_, h_, _d, _ct, _co, _f, _i = struct.unpack(">IIBBBBB", ihdr)
        raw = zlib.decompress(bytes(idat))
        stride = w_ * c
        out, prev, pos = bytearray(), bytearray(stride), 0
        for _ in range(h_):
            line = bytearray(raw[pos + 1 : pos + 1 + stride])
            pos += 1 + stride
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
            out += line
            prev = line
        return h_, w_, c, bytes(out)

    assert decode_png(png_up) == (h, w, c, px)
    assert decode_ref_up(png_up) == (h, w, c, px)

    def best_of(fn, blob, n):
        best = 1e9
        for _ in range(n):
            t0 = time.time()
            fn(blob)
            best = min(best, time.time() - t0)
        return best

    t_new = best_of(decode_png, png_up, 10)
    t_ref = best_of(decode_ref_up, png_up, 3)
    mb = h * w * c / 1e6
    report = [f"up: {mb / t_new:.0f} MB/s ({t_ref / t_new:.1f}x vs per-byte)"]
    for name, f in [("avg", 3), ("paeth", 4)]:
        png_f = _encode_png(h, w, c, px, filters=[f] * h)
        assert decode_png(png_f) == (h, w, c, px)
        report.append(f"{name}: {mb / best_of(decode_png, png_f, 3):.1f} MB/s")
    print("png decode throughput —", "; ".join(report))
    assert t_ref / t_new >= 10, (t_ref, t_new)


def test_decode_external_exotic_fmt_needs_pil(spark, images):
    # jpeg moved to the native branch in round 9 (operators/jpeg.py),
    # lossless webp in round 10 (operators/webp.py); TIFF is now the
    # representative pillow-gated format (the PERMANENT gate: the
    # container ships no codec library by design, COVERAGE.md)
    try:
        import PIL  # noqa: F401

        pytest.skip("pillow installed; stub branch not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_external(images, fmt="tiff")


# --- baseline JPEG codec (operators/jpeg.py — native, no pillow) -----------


def _gradient_rgb(h, w):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 / max(1, w - 1),
            yy * 255 / max(1, h - 1),
            (xx + yy) * 255 / max(1, w + h - 2),
        ],
        axis=2,
    ).astype("uint8")


def test_jpeg_roundtrip_444_and_420():
    """Encode→decode round trip on a smooth gradient: 4:4:4 at q95 within
    ±3 of the source, 4:2:0 within ±8 (chroma is box-meaned then
    replicated); non-multiple-of-16 dims exercise edge padding."""
    import numpy as np

    from pandasvcf_spark.operators.jpeg import decode_jpeg, encode_jpeg

    h, w = 40, 56
    img = _gradient_rgb(h, w)
    for sub, tol in ((False, 3), (True, 8)):
        blob = encode_jpeg(h, w, 3, img.tobytes(), quality=95, subsample=sub)
        hh, ww, cc, px = decode_jpeg(blob)
        assert (hh, ww, cc) == (h, w, 3)
        out = np.frombuffer(px, np.uint8).reshape(h, w, 3)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= tol


def test_jpeg_grayscale_and_restart_markers():
    import numpy as np

    from pandasvcf_spark.operators.jpeg import decode_jpeg, encode_jpeg

    h, w = 24, 40
    g = _gradient_rgb(h, w)[:, :, 0]
    blob = encode_jpeg(h, w, 1, g.tobytes(), quality=95)
    hh, ww, cc, px = decode_jpeg(blob)
    assert (hh, ww, cc) == (h, w, 1)
    assert (
        np.abs(
            np.frombuffer(px, np.uint8).reshape(h, w).astype(int)
            - g.astype(int)
        ).max()
        <= 3
    )
    # restart markers: DRI emitted, RSTn present, decode bit-identical
    # to the restart-free stream's decode
    img = _gradient_rgb(h, w)
    plain = encode_jpeg(h, w, 3, img.tobytes(), quality=95)
    rst = encode_jpeg(h, w, 3, img.tobytes(), quality=95, restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xd0" in rst
    assert decode_jpeg(rst) == decode_jpeg(plain)


def test_jpeg_progressive_raises_named_marker():
    from pandasvcf_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = _gradient_rgb(16, 16)
    blob = bytearray(encode_jpeg(16, 16, 3, img.tobytes()))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="0xC2"):
        decode_jpeg(bytes(blob))


def test_decode_external_jpeg_native(spark):
    """The decode_external fmt='jpeg' branch: JPEG blobs become IMG1
    payloads whose image_stats match the source image statistics within
    quantization tolerance — no pillow involved."""
    import numpy as np

    from pandasvcf_spark.operators.jpeg import encode_jpeg
    from pandasvcf_spark.operators.multimodal import image_stats

    h, w = 32, 48
    rows = []
    means = {}
    for img_id in range(4):
        arr = np.roll(_gradient_rgb(h, w), img_id * 5, axis=1)
        rows.append((img_id, encode_jpeg(h, w, 3, arr.tobytes(), quality=95)))
        means[img_id] = float(arr.mean())
    df = spark.createDataFrame(rows, "img_id long, img binary")
    out = image_stats(decode_external(df, fmt="jpeg")).collect()
    assert len(out) == 4
    for r in out:
        assert (r["height"], r["width"], r["channels"]) == (h, w, 3)
        assert abs(r["mean_px"] - means[r["img_id"]]) < 2.0


def test_decode_external_pil_branch(spark):
    """Exercise the use_pil branch of decode_external the day pillow shows
    up in the environment. This skip is the PERMANENT documented gate
    (round-10 ruling, COVERAGE.md): the container ships no codec library
    by design; PNG/BMP/GIF/baseline-JPEG/lossless-WebP all decode
    natively, and the PIL branch exists solely for user environments
    that install pillow (lossy WebP, progressive JPEG, TIFF). BMP is
    lossless, so decoded pixel statistics must match the source array
    exactly."""
    Image = pytest.importorskip(
        "PIL.Image",
        reason="permanent by-design gate: container ships no pillow; "
        "branch activates only in user environments that install it",
    )
    import io

    import numpy as np

    h, w = 6, 4
    rows = []
    for img_id in range(3):
        arr = (
            (np.arange(h * w * 3).reshape(h, w, 3) * (img_id + 1)) % 256
        ).astype("uint8")
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="BMP")
        rows.append((img_id, buf.getvalue(), arr))
    df = spark.createDataFrame(
        [(i, b) for i, b, _ in rows], "img_id long, img binary"
    )
    stats = {
        r["img_id"]: r
        for r in image_stats(decode_external(df, fmt="bmp")).collect()
    }
    for img_id, _, arr in rows:
        s = stats[img_id]
        assert (s["height"], s["width"], s["channels"]) == (h, w, 3)
        assert abs(s["mean_px"] - float(arr.mean())) < 1e-9
        assert s["max_px"] == int(arr.max())


def test_pandas_udf_vartype_matches_native(spark):
    """The pandas-UDF extension path agrees with the native HOF expression
    on every reference F5 branch (SURVEY §2.6)."""
    from pandasvcf_spark.functions.genomics import vartype_expr
    from pandasvcf_spark.functions.udf_ext import py_vartype

    cases = [
        ("A", "A"), ("A", "G"), ("CA", "AT"), ("AT", "A"),
        ("A", "AT"), ("ACG", "AT"), ("A", "."), ("TTT", "T"),
    ]
    df = spark.createDataFrame(cases, "ref string, allele string")
    rows = df.select(
        vartype_expr("ref", F.col("allele")).alias("native"),
        py_vartype()("ref", "allele").alias("udf"),
    ).collect()
    assert all(r["native"] == r["udf"] for r in rows)


def test_grouped_apply_zscore(spark):
    from pandasvcf_spark.functions.udf_ext import grouped_apply, zscore_group

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0)], "k string, v double"
    )
    out = grouped_apply(
        df, ["k"], zscore_group("v"), "k string, v double, zscore double"
    ).collect()
    got = {(r["k"], r["v"]): r["zscore"] for r in out}
    assert got[("a", 1.0)] == -1.0 and got[("a", 3.0)] == 1.0
    assert got[("b", 5.0)] == 0.0


def test_union_genotypes(spark):
    from pandasvcf_spark.operators.reshape import union_genotypes

    a = spark.createDataFrame([(1, "x")], "POS long, GT string")
    b = spark.createDataFrame([("y", 2, 9.5)], "GT string, POS long, extra double")
    u = union_genotypes(a, b)
    assert u.count() == 2
    assert set(u.columns) == {"POS", "GT", "extra"}
    assert u.filter(F.col("POS") == 1).first()["extra"] is None


def test_vcf_to_parquet_roundtrip(spark, tmp_path):
    import os

    from pandasvcf_spark.operators import annotate_vcf
    from pandasvcf_spark.sources.vcf import read_vcf, vcf_to_parquet

    src = os.path.join(os.path.dirname(__file__), "data", "golden.vcf")
    out = str(tmp_path / "pq")
    vcf_to_parquet(spark, src, out)
    back = spark.read.parquet(out)
    direct = read_vcf(spark, src)
    assert sorted(back.columns) == sorted(direct.columns)
    assert back.count() == direct.count()
    # CHROM partition dirs exist -> partition pruning is available downstream
    assert any(d.startswith("CHROM=") for d in os.listdir(out))
    # annotations over the parquet-backed wide table match the direct path
    from pandasvcf_spark.operators.annotate import annotate_genotypes, explode_genotypes

    ann_pq = annotate_genotypes(explode_genotypes(back), format_fields=["DP"])
    ann_vcf = annotate_vcf(spark, src)
    assert sorted(map(tuple, ann_pq.collect())) == sorted(map(tuple, ann_vcf.collect()))


def test_catalog_scan_pushdown(spark):
    """The declared scan query must reach the parquet reader with its filter
    and pruned 4-column schema (Catalyst pushdown, SURVEY §4)."""
    from pandasvcf_spark.queries import QUERIES

    df = QUERIES["s4_scan_project_filter"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "l_quantity" in plan and "PushedFilters" in plan
    scan_line = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # projection pruned to the 4 needed columns (no l_tax etc.)
    assert "l_tax" not in scan_line


def test_no_cartesian_in_similarity_catalog(spark):
    from pandasvcf_spark.queries import QUERIES

    for q in ["v_ann_topk", "v_ivf_topk", "dedup_embedding_cosine"]:
        df = QUERIES[q].fn(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, q


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed identically on the join key must join without
    ANY Exchange (the pre-shuffled 100 TB co-location strategy)."""
    from pandasvcf_spark.plans.bucketing import read_table, write_bucketed

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    write_bucketed(li, "li_b", "l_orderkey", 8,
                   path=str(tmp_path / "li_b"), sort_by="l_orderkey")
    write_bucketed(o, "o_b", "o_orderkey", 8,
                   path=str(tmp_path / "o_b"), sort_by="o_orderkey")
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a, b = read_table(spark, "li_b"), read_table(spark, "o_b")
        j = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:800]
        # and it actually computes the right thing
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


# ---------------------------------------------------------------------------
# Audio (RIFF/WAV) + video (MP4/ISO-BMFF) metadata and features
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def audio(spark):
    from pandasvcf_spark.operators.multimodal import synthetic_audio

    return synthetic_audio(
        spark, 12, n_samples=200, sample_rate=8000, channels=2
    ).cache()


def test_wav_native_meta_matches_chunk_walk(spark, audio):
    """The native canonical-layout parse (wav_meta_expr) and the
    mapInPandas chunk walk (wav_meta) must agree field-for-field on
    canonical files."""
    from pandasvcf_spark.operators.multimodal import wav_meta, wav_meta_expr

    native = {
        r["audio_id"]: r["m"]
        for r in audio.select("audio_id", wav_meta_expr("wav").alias("m")).collect()
    }
    walked = {r["audio_id"]: r for r in wav_meta(audio).collect()}
    assert len(native) == len(walked) == 12
    for aid, m in native.items():
        w = walked[aid]
        assert m is not None, aid
        assert (m["channels"], m["sample_rate"], m["bits_per_sample"]) == (
            w["channels"], w["sample_rate"], w["bits_per_sample"]) == (2, 8000, 16)
        assert m["n_samples"] == w["n_samples"] == 200
        assert abs(m["duration_sec"] - 200 / 8000) < 1e-12


def test_wav_noncanonical_null_native_ok_in_walk(spark):
    """A LIST chunk before `data` breaks the canonical layout: the native
    guard must yield NULL (never wrong numbers), the chunk walk must still
    parse it, and a malformed rate-0 canonical-looking payload must not
    trip an ANSI division error."""
    import struct

    from pandasvcf_spark.operators.multimodal import (
        pack_wav, wav_meta, wav_meta_expr,
    )

    pcm = struct.pack("<4h", 100, -100, 200, -200)
    good = pack_wav(8000, 1, pcm)
    # splice a LIST chunk between fmt and data
    info = b"LIST" + struct.pack("<I", 4) + b"INFO"
    noncanon = good[:36] + info + good[36:]
    noncanon = noncanon[:4] + struct.pack("<I", len(noncanon) - 8) + noncanon[8:]
    rate0 = bytearray(good)
    rate0[24:28] = struct.pack("<I", 0)  # sample_rate = 0
    df = spark.createDataFrame(
        [(1, bytes(noncanon)), (2, bytes(rate0))], "audio_id long, wav binary"
    )
    rows = {
        r["audio_id"]: r["m"]
        for r in df.select("audio_id", wav_meta_expr("wav").alias("m")).collect()
    }
    assert rows[1] is None and rows[2] is None
    walked = {r["audio_id"]: r for r in wav_meta(df).collect()}
    assert walked[1]["n_samples"] == 4 and walked[1]["sample_rate"] == 8000


def test_wav_meta_expr_is_native_no_python(spark, audio):
    """Metadata-only audio queries must stay JVM-side: no Arrow/Python
    eval node in the plan (the same pruning contract as image_meta_expr)."""
    from pandasvcf_spark.operators.multimodal import wav_meta_expr

    q = audio.select("audio_id", wav_meta_expr("wav").alias("m")).filter(
        F.col("m.sample_rate") > 0
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert q.count() == 12


def test_audio_stats_exact(spark):
    """rms/peak/zero-crossings computed by the Arrow kernel must equal a
    direct numpy reference on a known waveform."""
    import numpy as np
    import struct

    from pandasvcf_spark.operators.multimodal import audio_stats, pack_wav

    vals = [1000, -1000, 1000, -1000, 500, 500, -500, 0]
    pcm = struct.pack(f"<{len(vals)}h", *vals)
    df = spark.createDataFrame(
        [(7, pack_wav(16000, 1, pcm))], "audio_id long, wav binary"
    )
    r = audio_stats(df).first()
    x = np.array(vals, dtype=np.int64)
    assert r["n_samples"] == 8
    assert abs(r["rms"] - float(np.sqrt(np.mean(x.astype(float) ** 2)))) < 1e-9
    assert r["peak"] == 1000
    # signbit treats 0 as non-negative: flips at 0→1,1→2,2→3,3→4,5→6,6→7
    assert r["zero_crossings"] == 6


def test_audio_stats_rejects_non_16bit(spark):
    from pandasvcf_spark.operators.multimodal import audio_stats

    df = spark.createDataFrame([(1, b"junk")], "audio_id long, wav binary")
    with pytest.raises(Exception, match="16-bit PCM|NotImplementedError"):
        audio_stats(df).collect()


def test_mp4_meta_walk_and_brand_expr(spark):
    """pack_mp4 -> mp4_meta round-trip: brand/timescale/duration/tracks
    exact; the native ftyp brand expr agrees; 64-bit largesize and
    version-1 mvhd variants parse; corrupt payloads yield NULL rows."""
    import struct

    from pandasvcf_spark.operators.multimodal import (
        _box, mp4_brand_expr, mp4_meta, pack_mp4,
    )

    v0 = pack_mp4(timescale=600, duration=1200, n_tracks=2)
    # version-1 mvhd (64-bit times) inside moov
    mvhd1 = _box(
        b"mvhd",
        struct.pack(">B3x", 1) + struct.pack(">QQ", 0, 0)
        + struct.pack(">I", 1000) + struct.pack(">Q", 5000) + b"\x00" * 80,
    )
    v1 = _box(b"ftyp", b"iso5" + struct.pack(">I", 0) + b"iso5") + _box(
        b"moov", mvhd1 + _box(b"trak", b"")
    )
    # 64-bit largesize on the moov box
    moov_body = _box(
        b"mvhd",
        struct.pack(">B3x", 0) + struct.pack(">II", 0, 0)
        + struct.pack(">II", 90000, 270000) + b"\x00" * 80,
    )
    big = _box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42") + (
        struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(moov_body))
        + moov_body
    )
    df = spark.createDataFrame(
        [(1, v0), (2, v1), (3, big), (4, b"\x00\x00\x00\x08haha")],
        "video_id long, mp4 binary",
    )
    got = {r["video_id"]: r for r in mp4_meta(df).collect()}
    assert (got[1]["major_brand"], got[1]["timescale"], got[1]["duration"],
            got[1]["n_tracks"]) == ("isom", 600, 1200, 2)
    assert abs(got[1]["duration_sec"] - 2.0) < 1e-12
    assert (got[2]["major_brand"], got[2]["timescale"], got[2]["duration"],
            got[2]["n_tracks"]) == ("iso5", 1000, 5000, 1)
    assert (got[3]["timescale"], got[3]["duration"]) == (90000, 270000)
    assert abs(got[3]["duration_sec"] - 3.0) < 1e-12
    assert got[4]["major_brand"] is None and got[4]["timescale"] is None

    brands = {
        r["video_id"]: r["b"]
        for r in df.select("video_id", mp4_brand_expr("mp4").alias("b")).collect()
    }
    assert brands[1] == "isom" and brands[2] == "iso5" and brands[3] == "mp42"
    assert brands[4] is None


def test_decode_png_16bit_all_filters():
    """16-bit PNG: filters operate on byte lanes of width channels*2, and
    samples downconvert to the IMG1 8-bit payload via their MSB. Built
    with a byte-level encoder twin (lane = bpp), exercised across every
    filter type and gray/RGB/RGBA."""
    import struct
    import zlib

    from pandasvcf_spark.operators.multimodal import decode_png

    def encode16(h, w, channels, samples16, filters):
        ctype = {1: 0, 3: 2, 4: 6}[channels]
        bpp = channels * 2
        stride = w * bpp
        line_bytes = []
        for y in range(h):
            row = b"".join(
                struct.pack(">H", samples16[(y * w + x) * channels + c])
                for x in range(w)
                for c in range(channels)
            )
            line_bytes.append(row)
        raw = bytearray()
        prev = bytes(stride)
        for y, line in enumerate(line_bytes):
            f = filters[y]
            enc = bytearray()
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 0:
                    v = line[x]
                elif f == 1:
                    v = line[x] - a
                elif f == 2:
                    v = line[x] - b
                elif f == 3:
                    v = line[x] - ((a + b) >> 1)
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] - pred
                enc.append(v & 0xFF)
            raw.append(f)
            raw += enc
            prev = line

        def chunk(typ, data):
            return (
                struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data))
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 16, ctype, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
        )

    for channels in (1, 3, 4):
        h, w = 5, 4
        vals = [
            ((y * 7919 + x * 104729 + c * 31337) * 257) % 65536
            for y in range(h) for x in range(w) for c in range(channels)
        ]
        blob = encode16(h, w, channels, vals, filters=[0, 1, 2, 3, 4])
        gh, gw, gc, px = decode_png(blob)
        assert (gh, gw, gc) == (h, w, channels)
        want = bytes(v >> 8 for v in vals)
        assert px == want, f"channels={channels}"


def test_decode_png_adam7_interlaced():
    """Adam7: seven independently-filtered passes must reassemble to the
    exact image, across sizes that exercise empty and partial passes
    (1x1, 3x2, 8x8, 9x5), RGB and grayscale, mixed filter types."""
    import struct
    import zlib

    from pandasvcf_spark.operators.multimodal import _ADAM7_PASSES, decode_png

    def encode_adam7(h, w, channels, pixels):
        ctype = {1: 0, 3: 2, 4: 6}[channels]
        img = [
            [
                [pixels[(y * w + x) * channels + c] for c in range(channels)]
                for x in range(w)
            ]
            for y in range(h)
        ]
        raw = bytearray()
        for pi, (x0, dx, y0, dy) in enumerate(_ADAM7_PASSES):
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = pw * channels
            prev = bytes(stride)
            for py in range(ph):
                line = bytes(
                    img[y0 + py * dy][x0 + px * dx][c]
                    for px in range(pw)
                    for c in range(channels)
                )
                f = (pi + py) % 5  # vary filters across passes and rows
                enc = bytearray()
                for x in range(stride):
                    a = line[x - channels] if x >= channels else 0
                    b = prev[x]
                    cc = prev[x - channels] if x >= channels else 0
                    if f == 0:
                        v = line[x]
                    elif f == 1:
                        v = line[x] - a
                    elif f == 2:
                        v = line[x] - b
                    elif f == 3:
                        v = line[x] - ((a + b) >> 1)
                    else:
                        p = a + b - cc
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                        pred = (
                            a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                        )
                        v = line[x] - pred
                    enc.append(v & 0xFF)
                raw.append(f)
                raw += enc
                prev = line

        def chunk(typ, data):
            return (
                struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data))
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)  # interlace=1
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
        )

    for h, w, channels in [(1, 1, 3), (3, 2, 1), (8, 8, 3), (9, 5, 4)]:
        pixels = bytes(
            (y * 31 + x * 7 + c * 3 + h * 11 + w) % 256
            for y in range(h) for x in range(w) for c in range(channels)
        )
        blob = encode_adam7(h, w, channels, pixels)
        assert decode_png(blob) == (h, w, channels, pixels), (h, w, channels)


def test_media_walkers_never_throw_on_garbage():
    """_wav_walk and _mp4_walk are the per-row kernels of wav_meta /
    mp4_meta: on a 100 TB scan a corrupt payload must come back as a NULL
    metadata row, never as an executor exception. Fuzz with random bytes,
    truncations of VALID payloads at every boundary, and adversarial
    size fields."""
    import random
    import struct

    from pandasvcf_spark.operators.multimodal import (
        _box, _mp4_walk, _wav_walk, pack_mp4, pack_wav,
    )

    rnd = random.Random(99)
    good_wav = pack_wav(8000, 2, struct.pack("<8h", *range(8)))
    good_mp4 = pack_mp4(600, 1200, n_tracks=2)

    for blob in (good_wav, good_mp4):
        for cut in range(len(blob) + 1):  # every truncation boundary
            _wav_walk(blob[:cut])
            _mp4_walk(blob[:cut])
    for _ in range(300):  # random garbage, some with valid magic prefixes
        n = rnd.randrange(0, 200)
        junk = bytes(rnd.randrange(256) for _ in range(n))
        for payload in (junk, b"RIFF" + junk, good_wav[:12] + junk,
                        _box(b"ftyp", b"isom") + junk):
            _wav_walk(payload)
            _mp4_walk(payload)
    # adversarial sizes: zero-size chunk (would loop forever if unguarded),
    # size pointing past EOF, 64-bit largesize overrunning the buffer
    evil_riff = b"RIFF" + struct.pack("<I", 100) + b"WAVE" + b"junk" + struct.pack("<I", 0) * 10
    _wav_walk(evil_riff)
    evil_mp4 = struct.pack(">I", 0xFFFFFFF0) + b"moov" + b"x" * 8
    assert _mp4_walk(evil_mp4) is None
    evil_large = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 2**60) + b"x" * 8
    assert _mp4_walk(evil_large) is None


def test_bmp_roundtrip_and_variants(spark):
    """BI_RGB BMP decodes codec-free: 24-bit bottom-up round-trips, a
    top-down (negative height) variant gives identical pixels, 8-bit
    palette expands via the color table, compressed raises."""
    import struct

    import pytest as _pytest

    from pandasvcf_spark.operators.multimodal import (
        decode_bmp,
        decode_external,
        image_meta_expr,
        pack_bmp,
    )

    rgb = bytes(
        v for y in range(2) for x in range(3)
        for v in (10 * y + x, 100 + x, 200 - y)
    )
    bottom_up = pack_bmp(2, 3, rgb)
    assert decode_bmp(bottom_up) == (2, 3, 3, rgb)

    # top-down: flip the height sign and reorder rows
    off = 14 + 40
    stride = 3 * 3 + ((-9) % 4)
    body = bytearray(bottom_up[off:])
    flipped = bytes(
        b for y in range(1, -1, -1) for b in body[y * stride:(y + 1) * stride]
    )
    hdr = bytearray(bottom_up[:off])
    struct.pack_into("<i", hdr, 22, -2)
    assert decode_bmp(bytes(hdr) + flipped) == (2, 3, 3, rgb)

    # 8-bit palette: 2 colors, 1x2 image
    pal = bytes((255, 0, 0, 0)) + bytes((0, 0, 255, 0))  # blue, red (BGRX)
    row = bytes((0, 1)) + b"\x00\x00"  # padded to 4
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 8, 0, len(row), 0, 0, 2, 0)
    poff = 14 + 40 + len(pal)
    head = struct.pack("<2sIHHI", b"BM", poff + len(row), 0, 0, poff)
    h, w, c, px = decode_bmp(head + dib + pal + row)
    assert (h, w, c) == (1, 2, 3)
    assert px == bytes((0, 0, 255)) + bytes((255, 0, 0))  # blue then red

    # compression refused with the value named
    bad = bytearray(bottom_up)
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
    with _pytest.raises(NotImplementedError, match="compression 1"):
        decode_bmp(bytes(bad))

    # Spark path: decode_external(fmt='bmp') -> IMG1 metadata matches
    d = spark.createDataFrame([(1, bytearray(bottom_up))], "img_id long, img binary")
    out = decode_external(d, fmt="bmp")
    meta = out.select(image_meta_expr("img").alias("m")).collect()[0].m
    assert (meta.height, meta.width, meta.channels) == (2, 3, 3)


def test_gif_roundtrip_and_real_lzw():
    """pack_gif(literal codes) round-trips through decode_gif; a REAL
    LZW stream (dictionary growth through code-width increases) decodes
    identically; interlace and bad magic raise the honest boundaries."""
    import numpy as np
    import pytest as _pytest

    from pandasvcf_spark.operators.multimodal import (
        _lzw_decode,
        decode_gif,
        pack_gif,
    )

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = bytes([(i * 7) % 4 for i in range(24)])
    h, w, c, rgb = decode_gif(pack_gif(4, 6, idx, pal))
    assert (h, w, c) == (4, 6, 3)
    want = np.frombuffer(pal, np.uint8).reshape(4, 3)[
        np.frombuffer(idx, np.uint8)
    ].tobytes()
    assert rgb == want

    # real LZW encoder (dictionary growth + width changes) vs decoder
    def lzw_encode(seq, min_code):
        clear, end = 1 << min_code, (1 << min_code) + 1
        table = {bytes([i]): i for i in range(1 << min_code)}
        next_code = end + 1
        cw = min_code + 1
        acc = bits = 0
        out = bytearray()

        def emit(code):
            nonlocal acc, bits, cw
            acc |= code << bits
            bits += cw
            while bits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                bits -= 8

        emit(clear)
        cur = b""
        for b in seq:
            nxt = cur + bytes([b])
            if nxt in table:
                cur = nxt
                continue
            emit(table[cur])
            table[nxt] = next_code
            next_code += 1
            if next_code - 1 == (1 << cw) and cw < 12:
                cw += 1
            cur = bytes([b])
        if cur:
            emit(table[cur])
        emit(end)
        if bits:
            out.append(acc & 0xFF)
        return bytes(out)

    seq = bytes([(i * i + i // 3) % 4 for i in range(3000)])
    enc = lzw_encode(seq, 2)
    assert len(enc) < len(seq)  # actually compresses
    assert _lzw_decode(enc, 2, len(seq)) == seq

    with _pytest.raises(ValueError, match="magic"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)

    # 4-pass interlace: store rows in pass order, decoder de-interlaces
    h2, w2 = 11, 3
    pal2 = bytes(range(48))  # 16 colors
    img = np.arange(h2 * w2, dtype=np.uint8).reshape(h2, w2) % 16
    order = [r for st, sp in ((0, 8), (4, 8), (2, 4), (1, 2))
             for r in range(st, h2, sp)]
    g = bytearray(pack_gif(h2, w2, img[order].tobytes(), pal2))
    di = 13 + 48  # header + global color table -> image descriptor
    assert g[di] == 0x2C
    g[di + 9] |= 0x40  # set interlace flag
    hh, ww, cc, rgb2 = decode_gif(bytes(g))
    want2 = np.frombuffer(pal2, np.uint8).reshape(16, 3)[
        img.reshape(-1)
    ].tobytes()
    assert (hh, ww, cc) == (h2, w2, 3) and rgb2 == want2


def test_decode_external_gif_feeds_image_stats(spark):
    """GIF payloads decode through the same mapInPandas plumbing into
    IMG1 rows that image_stats consumes (the decode_external contract,
    codec-library-free)."""
    from pandasvcf_spark.operators.multimodal import (
        decode_external,
        image_stats,
        pack_gif,
    )

    pal = bytes([0, 0, 0, 255, 255, 255])
    idx = bytes([i % 2 for i in range(12)])
    g = pack_gif(3, 4, idx, pal)
    df = spark.createDataFrame([(1, bytearray(g))], "img_id long, img binary")
    out = image_stats(decode_external(df, fmt="gif")).collect()[0]
    assert (out.height, out.width, out.channels) == (3, 4, 3)
    assert out.max_px == 255 and abs(out.mean_px - 127.5) < 1e-9


def test_image_phash_matches_numpy_reference(spark):
    """dHash/aHash bit strings must equal an independent numpy
    reimplementation (integer nearest-resize, luminance by channel mean,
    horizontal-difference / mean-threshold bits) on a non-trivial image."""
    import numpy as np

    from pandasvcf_spark.operators.multimodal import image_phash, pack_image

    h, w, c = 11, 13, 3
    px = bytes((y * y * 5 + x * 17 + c_ * 29) % 256
               for y in range(h) for x in range(w) for c_ in range(c))
    df = spark.createDataFrame([(7, bytearray(pack_image(h, w, c, px)))],
                               "img_id long, img binary")
    row = image_phash(df, hash_size=8).collect()[0]

    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, c)
    gray = arr.astype(np.float64).mean(axis=2)

    def ref_resize(g, oh, ow):
        ys = (np.arange(oh) * g.shape[0]) // oh
        xs = (np.arange(ow) * g.shape[1]) // ow
        return g[ys][:, xs]

    d = ref_resize(gray, 8, 9)
    want_d = "".join("1" if b else "0"
                     for b in (d[:, 1:] > d[:, :-1]).ravel())
    a = ref_resize(gray, 8, 8)
    want_a = "".join("1" if b else "0" for b in (a > a.mean()).ravel())
    assert row["dhash"] == want_d and len(row["dhash"]) == 64
    assert row["ahash"] == want_a and len(row["ahash"]) == 64


def test_near_dup_images_finds_planted_pairs_only(spark):
    """Planted corpus: id 0 gradient, id 1 exact copy (hamming 0), id 2
    copy perturbed in one corner (small hamming — a localized edit, the
    re-encode/watermark case dHash is built for), id 3 inverted gradient
    (hamming 64 — every horizontal difference reverses sign).
    near_dup_images must return exactly the planted pairs at k=6 and only
    the exact pair at k=0."""
    from pandasvcf_spark.operators.multimodal import near_dup_images, pack_image

    h, w, c = 16, 16, 3

    def grad(flip=False, bump=0):
        out = bytearray()
        for y in range(h):
            for x in range(w):
                for ch in range(c):
                    v = (y * 9 + x * 5 + ch) % 256
                    if flip:
                        v = 255 - v
                    out.append(min(255, v + (bump if (x < 1 and y < 8) else 0)))
        return bytes(out)

    rows = [
        (0, bytearray(pack_image(h, w, c, grad()))),
        (1, bytearray(pack_image(h, w, c, grad()))),          # exact dup
        (2, bytearray(pack_image(h, w, c, grad(bump=12)))),   # near dup
        (3, bytearray(pack_image(h, w, c, grad(flip=True)))), # far
    ]
    df = spark.createDataFrame(rows, "img_id long, img binary")

    pairs = {(r["a_id"], r["b_id"]): r["hamming"]
             for r in near_dup_images(df, k=6).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and (1, 2) in pairs and pairs[(0, 2)] <= 6
    assert not any(3 in p for p in pairs)

    exact_only = {(r["a_id"], r["b_id"])
                  for r in near_dup_images(df, k=0).collect()}
    assert exact_only == {(0, 1)}


def test_audio_logmel_matches_numpy_replica(spark):
    """Round-14 audio feature-extract: the Arrow log-mel kernel must
    equal an independent numpy replay (framing, periodic Hann, rFFT
    power, HTK-mel triangles, log floor) on a 440 Hz sine; a pure tone
    concentrates energy in the mel band containing 440 Hz; stereo
    downmixes by mean; short clips yield 0 frames; 8-bit raises."""
    import struct as _struct

    import numpy as np

    from pandasvcf_spark.operators.multimodal import (
        audio_logmel,
        mel_filterbank,
        pack_wav,
    )

    sr, n_fft, hop, n_mels = 8000, 256, 128, 20
    t = np.arange(sr)  # 1 second
    sine = (0.5 * np.sin(2 * np.pi * 440.0 * t / sr) * 32767).astype("<i2")
    pcm = sine.tobytes()
    stereo = np.repeat(sine, 2).tobytes()  # L == R -> downmix == mono
    df = spark.createDataFrame(
        [
            (1, pack_wav(sr, 1, pcm)),
            (2, pack_wav(sr, 2, stereo)),
            (3, pack_wav(sr, 1, pcm[: 2 * 100])),  # 100 samples < n_fft
        ],
        "audio_id long, wav binary",
    )
    rows = {
        r["audio_id"]: r
        for r in audio_logmel(
            df, n_fft=n_fft, hop=hop, n_mels=n_mels
        ).collect()
    }
    # independent replica
    x = sine.astype(np.float64) / 32768.0
    n_frames = 1 + (len(x) - n_fft) // hop
    win = np.hanning(n_fft + 1)[:-1]
    frames = np.stack(
        [x[i * hop : i * hop + n_fft] * win for i in range(n_frames)]
    )
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    fb = mel_filterbank(sr, n_fft, n_mels)
    want = np.log10(np.maximum(spec @ fb.T, 1e-10)).astype(np.float32)
    got = np.array(rows[1]["logmel"], dtype=np.float32)
    assert rows[1]["n_frames"] == n_frames and got.shape == want.shape
    assert np.allclose(got, want, atol=1e-5)
    # tone concentration: the argmax mel band contains 440 Hz
    mean_energy = got.mean(axis=0)
    peak_band = int(mean_energy.argmax())
    band_hz = fb[peak_band].nonzero()[0] * sr / n_fft
    assert band_hz.min() - 100 <= 440 <= band_hz.max() + 100
    # stereo L==R downmix == mono bit-for-bit
    assert np.allclose(
        np.array(rows[2]["logmel"], dtype=np.float32), got, atol=1e-6
    )
    assert rows[3]["n_frames"] == 0 and rows[3]["logmel"] == []

    bad = spark.createDataFrame(
        [(9, b"RIFFjunkWAVE")], "audio_id long, wav binary"
    )
    with pytest.raises(Exception, match="16-bit PCM|NotImplementedError"):
        audio_logmel(bad).collect()


def test_audio_mfcc_matches_numpy_replica(spark):
    """Round-15 MFCC: the Arrow kernel equals an independent numpy
    replay (the logmel replica + an explicit orthonormal DCT-II) on a
    440 Hz sine; c0 carries the (scaled) frame log-energy; the DCT
    matrix is orthonormal (D·Dᵀ = I on the kept rows)."""
    import numpy as np

    from pandasvcf_spark.operators.multimodal import (
        audio_mfcc,
        dct2_matrix,
        mel_filterbank,
        pack_wav,
    )

    sr, n_fft, hop, n_mels, n_mfcc = 8000, 256, 128, 20, 13
    t = np.arange(sr)
    sine = (0.5 * np.sin(2 * np.pi * 440.0 * t / sr) * 32767).astype("<i2")
    df = spark.createDataFrame(
        [(1, pack_wav(sr, 1, sine.tobytes()))], "audio_id long, wav binary"
    )
    row = audio_mfcc(
        df, n_fft=n_fft, hop=hop, n_mels=n_mels, n_mfcc=n_mfcc
    ).collect()[0]
    # replica: logmel (as the round-14 pin) then DCT-II ortho
    x = sine.astype(np.float64) / 32768.0
    n_frames = 1 + (len(x) - n_fft) // hop
    win = np.hanning(n_fft + 1)[:-1]
    frames = np.stack(
        [x[i * hop : i * hop + n_fft] * win for i in range(n_frames)]
    )
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    fb = mel_filterbank(sr, n_fft, n_mels)
    lm = np.log10(np.maximum(spec @ fb.T, 1e-10)).astype(np.float32)
    D = dct2_matrix(n_mels, n_mfcc)
    want = (lm.astype(np.float64) @ D.T).astype(np.float32)
    got = np.array(row["mfcc"], dtype=np.float32)
    assert row["n_frames"] == n_frames and got.shape == (n_frames, n_mfcc)
    assert np.allclose(got, want, atol=1e-5)
    # orthonormal rows: D @ D.T == I_{n_mfcc}
    assert np.allclose(D @ D.T, np.eye(n_mfcc), atol=1e-12)
    # c0 == sqrt(1/n_mels) * sum(logmel) per frame
    assert np.allclose(
        got[:, 0], lm.sum(axis=1) * np.sqrt(1.0 / n_mels), atol=1e-4
    )


def test_audio_fingerprint_dedup_and_plan(spark):
    """Round-15 audio fingerprint dedup (Wang 2003 landmarks): a
    half-gain re-encode of a clip shares (nearly) all landmark hashes
    with the original — amplitude invariance by construction — while a
    different tone mix shares ~none; audio_dedup keeps min-id survivors
    through the transitive closure; the bucket join is an equi-join
    (NO CartesianProduct in the plan — the guard); degenerate hashes
    above max_bucket are pruned out of the join."""
    import numpy as np

    from pandasvcf_spark.operators.multimodal import (
        audio_dedup,
        audio_fingerprints,
        audio_near_dup_pairs,
        pack_wav,
    )

    sr = 8000
    seg = sr // 4  # 0.25 s notes — NON-stationary, like real audio
    # (a stationary tone is the picker's worst case: time-plateaus make
    # strict maxima flip on quantization noise; onsets localize peaks)

    def clip(notes, gain=0.4):
        t = np.arange(seg)
        env = np.hanning(seg)  # per-note attack/decay
        x = np.concatenate(
            [np.sin(2 * np.pi * f * t / sr) * env for f in notes]
        )
        return pack_wav(
            sr, 1, (gain * x * 32767).astype("<i2").tobytes()
        )

    melody = [440.0, 975.0, 660.0, 1660.0, 520.0, 1240.0, 880.0, 330.0]
    other = [613.0, 1330.0, 737.0, 2470.0, 413.0, 1790.0, 557.0, 2210.0]
    a = clip(melody)
    a_half = clip(melody, gain=0.2)  # same recording, -6 dB
    b = clip(other)
    df = spark.createDataFrame(
        [(1, a), (2, a_half), (3, b)], "audio_id long, wav binary"
    )
    fps = audio_fingerprints(df).localCheckpoint()
    sets = {
        aid: {r["fp"] for r in rows}
        for aid, rows in __import__("itertools").groupby(
            sorted(fps.collect(), key=lambda r: r["audio_id"]),
            key=lambda r: r["audio_id"],
        )
    }
    j12 = len(sets[1] & sets[2]) / len(sets[1] | sets[2])
    j13 = len(sets[1] & sets[3]) / len(sets[1] | sets[3])
    assert j12 > 0.8, j12   # gain change: nearly identical constellation
    assert j13 < 0.2, j13   # different recording: disjoint
    pairs = audio_near_dup_pairs(fps, min_matches=5)
    got_pairs = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got_pairs == {(1, 2)}
    # plan guard: bucket equi-join, never a cartesian
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

    surv = sorted(
        r["audio_id"]
        for r in audio_dedup(df, min_matches=5).select("audio_id").collect()
    )
    assert surv == [1, 3]

    # degenerate-hash prune: a hash shared by MANY clips must not join
    import pyspark.sql.functions as F
    many = spark.createDataFrame(
        [(i, 7, 0) for i in range(50)], "audio_id long, fp long, t1 int"
    )
    assert audio_near_dup_pairs(
        many, min_matches=1, max_bucket=10
    ).count() == 0
