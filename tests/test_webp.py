"""Native VP8L (lossless WebP) codec: encoder↔decoder round-trips,
hand-built bitstreams for the decoder-only features (LZ77 backward
references incl. the 2-D near-distance map, color cache, predictor /
subtract-green / palette transforms), spec-vector pins, and the
decode_external wiring. Lossy 'VP8 ' stays the documented permanent
pillow gate and must raise naming the chunk."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pandasvcf_spark.operators.webp import (
    _CODE_TO_PLANE,
    _BitReader,
    _BitWriter,
    _canonical_codes,
    _plane_code_to_distance,
    _prefix_value,
    _write_code_msb,
    _write_prefix_code,
    decode_webp,
    encode_webp_lossless,
)


def _wrap_vp8l(bits: _BitWriter) -> bytes:
    body = b"\x2f" + bits.finish()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(bwr: _BitWriter, w: int, h: int) -> None:
    bwr.write(w - 1, 14)
    bwr.write(h - 1, 14)
    bwr.write(0, 1)  # alpha hint
    bwr.write(0, 3)  # version


def _emit(bwr, codes, sym) -> None:
    c, nb = codes[sym]
    _write_code_msb(bwr, c, nb)


def test_round_trip_gradient_noise_flat_alpha():
    rng = np.random.RandomState(42)
    cases = []
    h, w = 16, 21
    yy, xx = np.mgrid[0:h, 0:w]
    grad = np.stack(
        [xx * 12 % 256, yy * 17 % 256, (xx + yy) * 7 % 256], axis=2
    ).astype(np.uint8)
    cases.append((h, w, 3, grad.tobytes()))
    cases.append((10, 13, 3, rng.randint(0, 256, (10, 13, 3), dtype=np.uint8).tobytes()))
    cases.append((8, 9, 4, rng.randint(0, 256, (8, 9, 4), dtype=np.uint8).tobytes()))
    cases.append((5, 7, 3, np.full((5, 7, 3), 123, np.uint8).tobytes()))
    cases.append((1, 1, 3, bytes([9, 8, 7])))
    for h, w, c, px in cases:
        h2, w2, c2, px2 = decode_webp(encode_webp_lossless(h, w, c, px))
        assert (h2, w2, c2, px2) == (h, w, c, px)


def test_opaque_alpha_collapses_to_3_channels():
    rng = np.random.RandomState(1)
    op = rng.randint(0, 256, (4, 5, 4), dtype=np.uint8)
    op[:, :, 3] = 255
    h, w, c, px = decode_webp(encode_webp_lossless(4, 5, 4, op.tobytes()))
    assert (h, w, c) == (4, 5, 3)
    assert px == op[:, :, :3].tobytes()


def test_code_to_plane_matches_spec_leading_entries():
    """The near-distance map is generated (d² asc, dy desc, dx desc);
    its packed form must equal the spec's published table — pinned on
    the leading 56 entries (the spec document's own listing order:
    (0,1),(1,0),(1,1),(-1,1),(0,2),(2,0),... )."""
    spec_prefix = [
        0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
        0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
        0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
        0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
        0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
        0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02,
    ]
    assert len(_CODE_TO_PLANE) == 120
    assert _CODE_TO_PLANE[: len(spec_prefix)] == spec_prefix
    # structural sanity of the full table: codes decode to unique
    # in-scan-order offsets
    seen = set()
    for pc in range(1, 121):
        packed = _CODE_TO_PLANE[pc - 1]
        dy, dx = packed >> 4, 8 - (packed & 0xF)
        assert dy > 0 or dx > 0
        assert (dx, dy) not in seen
        seen.add((dx, dy))
    # scan-order distances for a wide row
    assert _plane_code_to_distance(100, 1) == 100  # (0,1)
    assert _plane_code_to_distance(100, 2) == 1    # (1,0)
    assert _plane_code_to_distance(100, 121) == 1  # beyond map: linear


def test_prefix_value_spec_vectors():
    """LZ77 length/distance layout: codes 0-3 direct, then
    (2+(code&1))<<extra + extra bits + 1."""
    br = _BitReader(b"\x00" * 8)
    assert _prefix_value(br, 0) == 1
    assert _prefix_value(br, 3) == 4
    # code 4: extra=1, offset=2<<1=4 -> value 5 with extra bit 0
    br = _BitReader(bytes([0b0]))
    assert _prefix_value(br, 4) == 5
    # code 5: extra=1, offset=3<<1=6 -> value 7+bit
    br = _BitReader(bytes([0b1]))
    assert _prefix_value(br, 5) == 8
    # code 6: extra=2, offset=2<<2=8 -> 9..12
    br = _BitReader(bytes([0b11]))
    assert _prefix_value(br, 6) == 12


def _literal_codes_stream(w, h, greens, reds, blues, alphas, extra_syms=(),
                          dist_sym=1):
    """Build header + prefix codes for a literal stream over the given
    per-channel symbol sets (plus LZ77/length symbols in the green
    alphabet); returns (writer, per-channel canonical code dicts)."""
    bwr = _BitWriter()
    _header(bwr, w, h)
    bwr.write(0, 1)  # no transforms
    bwr.write(0, 1)  # no meta groups
    bwr.write(0, 1)  # no color cache
    lens = []
    for syms in (set(greens) | set(extra_syms), reds, blues, alphas):
        ss = sorted(set(syms))
        ln = {s: 1 for s in ss} if len(ss) <= 2 else {
            s: max(2, (len(ss) - 1).bit_length()) for s in ss
        }
        # make lengths a valid prefix code: balanced fixed-length
        if len(ss) > 2:
            k = (len(ss) - 1).bit_length()
            ln = {s: k for s in ss}
        lens.append(ln)
    g_alpha = 256 + 24
    for ln, size in zip(lens, (g_alpha, 256, 256, 256)):
        _write_prefix_code(bwr, ln, size)
    _write_prefix_code(bwr, {dist_sym: 1}, 40)  # distance: 1 symbol
    return bwr, [_canonical_codes(ln) for ln in lens]


def test_decoder_lz77_backward_reference_near_distance():
    """Hand-built stream: 4 literal pixels then a length-4 copy via the
    2-D near-distance code (0,1) — the decoder must replicate row 0
    into row 1 and insert copies pixel-by-pixel."""
    w, h = 4, 2
    greens = [10, 20, 30, 40]
    # distance symbol 0 -> prefix value 1 -> plane code 1 = (0,1)
    bwr, (gc, rc, bc, ac) = _literal_codes_stream(
        w, h, greens, [7], [3], [255], extra_syms=[256 + 3], dist_sym=0
    )
    for g in greens:  # literals: (a,r,g,b) = (255,7,g,3); the r/b/a
        _emit(bwr, gc, g)  # trees are single-symbol -> ZERO bits each
    # LZ77: length code 3 -> length 4; distance symbol 0 -> prefix
    # value 1 -> plane code 1 = (0,1) -> distance w = 4
    _emit(bwr, gc, 256 + 3)
    # distance tree is single-symbol (reads 0 bits)
    hh, ww, c, px = decode_webp(_wrap_vp8l(bwr))
    assert (hh, ww, c) == (2, 4, 3)
    arr = np.frombuffer(px, np.uint8).reshape(2, 4, 3)
    assert (arr[0] == arr[1]).all()
    assert list(arr[0, :, 1]) == greens


def test_decoder_color_cache():
    """Stream with a 4-bit color cache: literal pixel, then the SAME
    pixel via its cache index."""
    w, h = 2, 1
    pixel = (255 << 24) | (9 << 16) | (77 << 8) | 4
    idx = ((0x1E35A7BD * pixel) & 0xFFFFFFFF) >> (32 - 4)
    bwr = _BitWriter()
    _header(bwr, w, h)
    bwr.write(0, 1)  # no transforms
    bwr.write(0, 1)  # no meta groups
    bwr.write(1, 1)  # color cache present
    bwr.write(4, 4)  # cache_bits = 4
    g_alpha = 256 + 24 + 16
    glens = {77: 1, 256 + 24 + idx: 1}
    _write_prefix_code(bwr, glens, g_alpha)
    for v, size in (({9: 1}, 256), ({4: 1}, 256), ({255: 1}, 256), ({1: 1}, 40)):
        _write_prefix_code(bwr, v, size)
    gc = _canonical_codes(glens)
    _emit(bwr, gc, 77)  # literal: r/b/a trees single-symbol, 0 bits
    _emit(bwr, gc, 256 + 24 + idx)  # cache hit
    hh, ww, c, px = decode_webp(_wrap_vp8l(bwr))
    arr = np.frombuffer(px, np.uint8).reshape(1, 2, 3)
    assert (arr[0, 0] == arr[0, 1]).all()
    assert list(arr[0, 0]) == [9, 77, 4]


def test_decoder_subtract_green_transform():
    """Stream with ONLY the subtract-green transform: stored residual
    r'=r-g, b'=b-g (mod 256); the decoder must add green back."""
    w, h = 1, 1
    r, g, b = 200, 50, 10
    bwr = _BitWriter()
    _header(bwr, w, h)
    bwr.write(1, 1)  # transform present
    bwr.write(2, 2)  # SUBTRACT_GREEN
    bwr.write(0, 1)  # no more transforms
    bwr.write(0, 1)  # no meta
    bwr.write(0, 1)  # no cache
    glens = {g: 1}
    _write_prefix_code(bwr, glens, 256 + 24)
    _write_prefix_code(bwr, {(r - g) % 256: 1}, 256)
    _write_prefix_code(bwr, {(b - g) % 256: 1}, 256)
    _write_prefix_code(bwr, {255: 1}, 256)
    _write_prefix_code(bwr, {1: 1}, 40)
    # every tree single-symbol: zero data bits
    hh, ww, c, px = decode_webp(_wrap_vp8l(bwr))
    assert list(px) == [r, g, b]


def test_decoder_predictor_transform_top_mode():
    """Predictor transform, one block, mode 2 (= top): row 0 uses the
    left-predictor edge rule, row 1 adds the pixel above."""
    w, h = 2, 2
    bwr = _BitWriter()
    _header(bwr, w, h)
    bwr.write(1, 1)
    bwr.write(0, 2)  # PREDICTOR
    bwr.write(2, 3)  # size_bits = 4 -> one 16x16 block
    # sub-image 1x1: single pixel, green = mode 2
    bwr.write(0, 1)  # (sub-image) no cache
    _write_prefix_code(bwr, {2: 1}, 256 + 24)
    _write_prefix_code(bwr, {0: 1}, 256)
    _write_prefix_code(bwr, {0: 1}, 256)
    _write_prefix_code(bwr, {255: 1}, 256)
    _write_prefix_code(bwr, {1: 1}, 40)
    bwr.write(0, 1)  # no more transforms
    bwr.write(0, 1)  # no meta
    bwr.write(0, 1)  # no cache
    # residual pixels: greens vary, r/b constant 0, alpha residuals:
    # pixel 0 residual alpha must SET 255 (pred black has a=255 -> 0)
    greens = {10: 2, 5: 2}
    glens = {10: 1, 5: 1}
    _write_prefix_code(bwr, glens, 256 + 24)
    _write_prefix_code(bwr, {0: 1}, 256)
    _write_prefix_code(bwr, {0: 1}, 256)
    _write_prefix_code(bwr, {0: 1}, 256)
    _write_prefix_code(bwr, {1: 1}, 40)
    gc = _canonical_codes(glens)
    # residuals scan order: (10, 5, 10, 5)
    for v in (10, 5, 10, 5):
        _emit(bwr, gc, v)
    hh, ww, c, px = decode_webp(_wrap_vp8l(bwr))
    arr = np.frombuffer(px, np.uint8).reshape(2, 2, 3)
    # row 0: p00.g = 10 (pred black); p01.g = 10+5=15 (left)
    # row 1: p10.g = 10+10=20 (top); p11.g = 15+5=20 (mode 2: top)
    assert list(arr[:, :, 1].reshape(-1)) == [10, 15, 20, 20]


def test_decoder_palette_transform_with_packing():
    """Color-indexing transform, 2-entry palette -> 8 pixels pack per
    byte; a 10-wide row must unpack to alternating palette entries."""
    w, h = 10, 1
    bwr = _BitWriter()
    _header(bwr, w, h)
    bwr.write(1, 1)
    bwr.write(3, 2)  # COLOR_INDEXING
    bwr.write(1, 8)  # palette size - 1 = 1 -> 2 colors
    # palette sub-image (2x1): entries delta-coded; entry0=(255,1,2,3),
    # entry1 delta = (0, 9, 9, 9) -> (255,10,11,12)
    bwr.write(0, 1)  # no cache
    pg = {2: 1, 9: 1}
    _write_prefix_code(bwr, pg, 256 + 24)
    pr = {1: 1, 9: 1}
    _write_prefix_code(bwr, pr, 256)
    pb = {3: 1, 9: 1}
    _write_prefix_code(bwr, pb, 256)
    pa = {255: 1, 0: 1}
    _write_prefix_code(bwr, pa, 256)
    _write_prefix_code(bwr, {1: 1}, 40)
    gcp, rcp, bcp, acp = (
        _canonical_codes(pg), _canonical_codes(pr),
        _canonical_codes(pb), _canonical_codes(pa),
    )
    for g_, r_, b_, a_ in ((2, 1, 3, 255), (9, 9, 9, 0)):
        _emit(bwr, gcp, g_)
        _emit(bwr, rcp, r_)
        _emit(bwr, bcp, b_)
        _emit(bwr, acp, a_)
    bwr.write(0, 1)  # no more transforms
    # main image: packed width ceil(10/8) = 2; green bytes hold bits
    # 0b01010101 (alternating idx 1,0,...: pixel x uses bit x) and
    # 0b00000001 for the 2 remaining pixels (x=8 idx 1, x=9 idx 0)
    bwr.write(0, 1)  # no meta
    bwr.write(0, 1)  # no cache
    mg = {0b10101010: 1, 0b00000010: 1}
    _write_prefix_code(bwr, mg, 256 + 24)
    _write_prefix_code(bwr, {0: 1}, 256)
    _write_prefix_code(bwr, {0: 1}, 256)
    _write_prefix_code(bwr, {255: 1}, 256)
    _write_prefix_code(bwr, {1: 1}, 40)
    mgc = _canonical_codes(mg)
    _emit(bwr, mgc, 0b10101010)
    _emit(bwr, mgc, 0b00000010)
    hh, ww, c, px = decode_webp(_wrap_vp8l(bwr))
    assert (hh, ww) == (1, 10)
    arr = np.frombuffer(px, np.uint8).reshape(10, c)
    e0, e1 = [1, 2, 3], [10, 11, 12]
    for x in range(10):
        want = e1 if (x % 2 == 1 and x < 8) or x == 9 else e0
        assert list(arr[x][:3]) == want, (x, list(arr[x]))


def test_lossy_vp8_raises_named_permanent_gate():
    fake = b"RIFF" + struct.pack("<I", 20) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(NotImplementedError, match="LOSSY VP8"):
        decode_webp(fake)
    fakex = b"RIFF" + struct.pack("<I", 20) + b"WEBP" + b"VP8X" + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(NotImplementedError, match="VP8X"):
        decode_webp(fakex)


def test_decode_external_webp_native(spark):
    """fmt='webp' routes through the native VP8L decoder inside the
    Arrow-batched mapInPandas plumbing — no pillow involved."""
    from pandasvcf_spark.operators.multimodal import (
        decode_external,
        image_stats,
    )

    rng = np.random.RandomState(3)
    rows = []
    means = {}
    h, w = 12, 8
    for img_id in range(4):
        arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        rows.append((img_id, encode_webp_lossless(h, w, 3, arr.tobytes())))
        means[img_id] = float(arr.mean())
    df = spark.createDataFrame(rows, "img_id long, img binary")
    out = image_stats(decode_external(df, fmt="webp")).collect()
    assert len(out) == 4
    for r in out:
        assert (r["height"], r["width"], r["channels"]) == (h, w, 3)
        assert abs(r["mean_px"] - means[r["img_id"]]) < 1e-6


def test_code_lengths_complete_kraft_and_skewed_round_trip():
    """The encoder's length-limited code must be COMPLETE (Kraft sum
    exactly 1 — strict decoders like libwebp reject incomplete prefix
    tables) and cost-optimal under the 15-bit cap. The old
    decrement/increment depth clamp collapsed the Kraft sum to 0.0066
    on Fibonacci-weighted planes (round-10 ADVICE); package-merge
    fixes both. Plus an end-to-end round trip on a Fibonacci-skewed
    pixel histogram — the exact input class that broke the clamp."""
    import random
    from fractions import Fraction

    from pandasvcf_spark.operators.webp import (
        _code_lengths,
        decode_webp,
        encode_webp_lossless,
    )

    def kraft(lens):
        return sum(Fraction(1, 2 ** l) for l in lens.values() if l > 0)

    fib = [1, 1]
    for _ in range(28):
        fib.append(fib[-1] + fib[-2])
    lens = _code_lengths({i: f for i, f in enumerate(fib)}, 15)
    assert max(lens.values()) <= 15
    assert kraft(lens) == 1

    rng = random.Random(11)
    for _ in range(50):
        n = rng.randint(2, 280)
        freqs = {s: rng.randint(1, 10 ** rng.randint(0, 6)) for s in range(n)}
        lens = _code_lengths(freqs, 15)
        assert kraft(lens) == 1 and max(lens.values()) <= 15
    for _ in range(50):  # the 7-bit code-length-code regime
        n = rng.randint(2, 19)
        freqs = {s: rng.randint(1, 10 ** 6) for s in range(n)}
        lens = _code_lengths(freqs, 7)
        assert kraft(lens) == 1 and max(lens.values()) <= 7

    # Fibonacci-skewed green plane, end-to-end
    vals = []
    for sym, f in enumerate(fib[:16]):
        vals.extend([sym * 16] * f)
    rng.shuffle(vals)
    side = 1
    while side * side < len(vals):
        side += 1
    vals.extend([0] * (side * side - len(vals)))
    px = bytes(
        b for v in vals for b in (v, (v * 7) % 256, (v * 13) % 256)
    )
    blob = encode_webp_lossless(side, side, 3, px)
    h, w, c, out = decode_webp(blob)
    assert (h, w, c) == (side, side, 3)
    assert out == px
