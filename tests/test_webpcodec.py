"""Lossless-WebP (VP8L) codec conformance.

No second WebP decoder exists in this container (no PIL, and javax
ImageIO has no WebP plugin), so the pinning strategy is: (a) spec
constants asserted directly (the 120-entry short-distance table
prefix as listed in the WebP Lossless Bitstream Specification, the
code-length-code order), (b) exact round-trips through every decode
path with deterministic encoder parameters, (c) the plain profile's
bit layout re-walked by hand in Python exactly as q_webp_decode's
DuckDB oracle re-walks it in SQL, and (d) the driver's oracle row
itself (CORRECTNESS_r10)."""

from __future__ import annotations

import numpy as np
import pytest

from iceberg_tracking_spark.operators.webpcodec import (
    _DIST_TABLE,
    WEBP_PLAIN_PIXEL_BIT_OFFSET,
    decode_webp,
    encode_webp_lossless,
    is_webp,
    is_webp_lossless,
)

# The spec's listed table, first 40 entries (transcribed prefix — the
# generation rule in _dist_table must reproduce it exactly).
_SPEC_PREFIX = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
]


def test_distance_table_matches_spec():
    assert len(_DIST_TABLE) == 120
    assert _DIST_TABLE[:40] == _SPEC_PREFIX
    # domain: dy 0..7; dx 1..8 when dy=0, else -7..8; no duplicates
    assert len(set(_DIST_TABLE)) == 120
    for dx, dy in _DIST_TABLE:
        assert 0 <= dy <= 7
        assert (1 <= dx <= 8) if dy == 0 else (-7 <= dx <= 8)


def test_plain_profile_layout_and_roundtrip():
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (12, 15), dtype=np.uint8)
    data = encode_webp_lossless(g, plain=True)
    assert is_webp(data) and is_webp_lossless(data)
    # container layout: payload at byte 20, signature 0x2f
    assert data[:4] == b"RIFF" and data[8:16] == b"WEBPVP8L"
    assert data[20] == 0x2F
    # dimension bits (the media_from_webp_files / oracle arithmetic)
    w = 1 + (data[21] | (data[22] & 0x3F) << 8)
    h = 1 + ((data[22] >> 6) | data[23] << 2 | (data[24] & 0xF) << 10)
    assert (w, h) == (15, 12)
    # pixel k's 8-bit code: payload bits 293+8k, MSB-first → the grey
    # value is the bit-reversed window (the q_webp_decode oracle walk)
    assert WEBP_PLAIN_PIXEL_BIT_OFFSET == 293
    flat = g.ravel()
    for k in range(w * h):
        win = ((data[56 + k] | data[57 + k] << 8) >> 5) & 0xFF
        val = sum(((win >> j) & 1) << (7 - j) for j in range(8))
        assert val == flat[k]
    out = decode_webp(data)
    assert out.shape == (12, 15, 4)
    for c in range(3):
        assert np.array_equal(out[:, :, c], g)
    assert np.all(out[:, :, 3] == 255)


def test_roundtrip_literal_and_subtract_green():
    rng = np.random.default_rng(7)
    m = rng.integers(0, 256, (9, 14, 4), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp_lossless(m)), m)
    assert np.array_equal(
        decode_webp(encode_webp_lossless(m, subtract_green=True)), m
    )
    grey = rng.integers(0, 256, (6, 5), dtype=np.uint8)
    out = decode_webp(encode_webp_lossless(grey))
    assert np.array_equal(out[:, :, 0], grey)
    rgb = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    out = decode_webp(encode_webp_lossless(rgb))
    assert np.array_equal(out[:, :, :3], rgb) and np.all(out[:, :, 3] == 255)


def test_roundtrip_predictor_all_modes():
    """37×41 at block bits 2 → 10×11 blocks; mode map (bx*5+by*3)%14
    covers all 14 predictor modes, edge rows/columns and the
    TR-wraps-to-row-start rule."""
    rng = np.random.default_rng(11)
    m = rng.integers(0, 256, (37, 41, 4), dtype=np.uint8)
    for bits in (2, 4):
        data = encode_webp_lossless(m, predictor_bits=bits)
        assert np.array_equal(decode_webp(data), m)


def test_roundtrip_cross_color_and_combo():
    rng = np.random.default_rng(13)
    m = rng.integers(0, 256, (21, 18, 4), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp_lossless(m, color_bits=3)), m)
    data = encode_webp_lossless(
        m, predictor_bits=3, color_bits=2, subtract_green=True
    )
    assert np.array_equal(decode_webp(data), m)


@pytest.mark.parametrize("nc", [2, 4, 13, 250])
def test_roundtrip_palette_all_bundle_widths(nc):
    """2/4/13/250 colors → pixel bundling at 8/4/2/1 indices per byte."""
    rng = np.random.default_rng(nc)
    base = rng.integers(0, 256, (nc, 4), dtype=np.uint8)
    img = base[rng.integers(0, nc, (17, 23))]
    data = encode_webp_lossless(img, palette=True)
    assert np.array_equal(decode_webp(data), img)


def test_roundtrip_cache_backrefs_meta():
    rng = np.random.default_rng(17)
    flat = (rng.integers(0, 8, (25, 30, 3), dtype=np.uint8) * 31).astype(
        np.uint8
    )
    for kw in (
        dict(cache_bits=4, use_backrefs=True),
        dict(use_backrefs=True),
        dict(cache_bits=7),
        dict(meta_bits=2),
        dict(
            predictor_bits=2, color_bits=3, subtract_green=True,
            cache_bits=5, use_backrefs=True, meta_bits=3,
        ),
    ):
        data = encode_webp_lossless(flat, **kw)
        assert np.array_equal(decode_webp(data)[:, :, :3], flat), kw


def test_hand_built_bitstream_plane_code_and_max_symbol():
    """Decoder pinned against a bitstream written BIT BY BIT from the
    spec — fully independent of the encoder (which never writes the
    max_symbol shortcut and only emits distances that map to plane
    code 2). 3×2 image: green is a hand-declared NORMAL code over
    {64 → '0', 256 → '1'} (code lengths delivered through the
    code-length code using 18-runs AND the max_symbol read-budget
    path), red/blue/alpha/distance are 1-symbol simple codes (0
    bits), pixels are three literals, two backrefs through distance
    PLANE CODE 1 — the spec table's first entry (0, 1), i.e. the
    pixel directly above (dist = 1·w + 0) — and one more literal.
    Expected: every pixel (r, g, b, a) = (10, 64, 20, 255)."""
    from iceberg_tracking_spark.operators.webpcodec import (
        _BitWriter,
        _riff_wrap,
    )

    bw = _BitWriter()
    bw.write(0x2F, 8)  # signature
    bw.write(3 - 1, 14)  # w = 3
    bw.write(2 - 1, 14)  # h = 2
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta-prefix image
    # --- green: normal code, lengths {64: 1, 256: 1}
    bw.write(0, 1)  # not simple
    bw.write(0, 4)  # num_code_lengths = 4 (covers clc symbols 17,18,0,1)
    for ln in (0, 1, 0, 1):  # order 17, 18, 0, 1 → 18→len1, 1→len1
        bw.write(ln, 3)
    # clc canonical: symbol 1 → '0', symbol 18 → '1'
    bw.write(1, 1)  # USE the max_symbol read budget
    bw.write(3, 3)  # length_nbits = 2 + 2*3 = 8
    bw.write(3, 8)  # max_symbol = 2 + 3 = 5 codes, then implicit zeros
    bw.write_code(1, 1)  # 18: zero-run
    bw.write(64 - 11, 7)  # 64 zeros → symbols 0..63
    bw.write_code(0, 1)  # literal length 1 → symbol 64
    bw.write_code(1, 1)  # 18: zero-run
    bw.write(138 - 11, 7)  # 138 zeros → symbols 65..202
    bw.write_code(1, 1)  # 18: zero-run
    bw.write(53 - 11, 7)  # 53 zeros → symbols 203..255
    bw.write_code(0, 1)  # literal length 1 → symbol 256
    # budget exhausted (5 codes) → symbols 257..279 stay 0
    # --- red / blue / alpha / distance: 1-symbol simple codes
    for sym in (10, 20, 255, 0):
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        bw.write(1, 1)  # 8-bit field
        bw.write(sym, 8)
    # --- pixels: green canonical {64 → '0', 256 → '1'}
    bw.write_code(0, 1)  # lit g=64 (r/b/a decode 0 bits)
    bw.write_code(0, 1)  # lit
    bw.write_code(0, 1)  # lit
    bw.write_code(1, 1)  # backref: length prefix 0 → 1 px, 0 extra
    #                      distance: 0-bit symbol 0 → prefix value 1
    #                      → plane code 1 → (dx, dy) = (0, 1) → dist 3
    bw.write_code(1, 1)  # backref again
    bw.write_code(0, 1)  # lit
    data = _riff_wrap(bw.bytes())
    out = decode_webp(data)
    assert out.shape == (2, 3, 4)
    expect = np.tile(
        np.array([10, 64, 20, 255], np.uint8), (2, 3, 1)
    )
    assert np.array_equal(out, expect)


def test_constant_image_backref_only_groups():
    """A constant image under backrefs + meta groups can leave a group
    whose green tree has a SINGLE used symbol ≥ 256 (backref length
    code only — no literal ever starts in it). The decoder's
    single-symbol special case reads zero bits; the encoder must emit
    zero bits for it too (regression: the canonical length-1 code word
    was being written, desyncing the streams)."""
    flat = np.full((16, 64, 3), 200, np.uint8)
    for kw in (
        dict(use_backrefs=True),
        dict(use_backrefs=True, meta_bits=2),
        dict(use_backrefs=True, cache_bits=3, meta_bits=2),
    ):
        out = decode_webp(encode_webp_lossless(flat, **kw))
        assert np.array_equal(out[:, :, :3], flat), kw


def test_alpha_channel_survives():
    rng = np.random.default_rng(19)
    m = rng.integers(0, 256, (8, 9, 4), dtype=np.uint8)
    m[..., 3] = rng.integers(0, 255, (8, 9), dtype=np.uint8)  # non-opaque
    data = encode_webp_lossless(m, cache_bits=3, use_backrefs=True)
    assert np.array_equal(decode_webp(data), m)


def test_vp8x_container_walk():
    """A VP8L chunk behind a VP8X extended header still decodes (the
    RIFF walk skips unknown chunks)."""
    import struct

    g = np.arange(20, dtype=np.uint8).reshape(4, 5)
    data = encode_webp_lossless(g, plain=True)
    payload = data[20 : 20 + struct.unpack("<I", data[16:20])[0]]
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes(10)
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    body = b"WEBP" + vp8x + vp8l
    wrapped = b"RIFF" + struct.pack("<I", len(body)) + body
    out = decode_webp(wrapped)
    assert np.array_equal(out[:, :, 0], g)


def test_error_contracts():
    with pytest.raises(ValueError, match="not a WebP"):
        decode_webp(b"GIF89a" + bytes(40))
    # lossy VP8 is a loud, documented rejection
    import struct

    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + bytes(4)
    )
    with pytest.raises(ValueError, match="lossy"):
        decode_webp(lossy)
    assert not is_webp_lossless(lossy)
    with pytest.raises(ValueError, match="uint8"):
        encode_webp_lossless(np.zeros((4, 4), np.int32))
    with pytest.raises(ValueError, match="grey"):
        encode_webp_lossless(np.zeros((4, 4, 3), np.uint8), plain=True)
    with pytest.raises(ValueError, match="256 distinct"):
        rng = np.random.default_rng(1)
        encode_webp_lossless(
            rng.integers(0, 256, (40, 40, 4), dtype=np.uint8), palette=True
        )
    # truncated stream
    g = np.arange(42, dtype=np.uint8).reshape(6, 7)
    data = encode_webp_lossless(g, plain=True)
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(data[:-4])


def test_decode_media_dispatch_and_rejection_message():
    from iceberg_tracking_spark.operators.multimodal import decode_media

    rng = np.random.default_rng(23)
    rgb = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    data = encode_webp_lossless(rgb, subtract_green=True)
    grey = decode_media(data, 12, 10, decode_stub=False)
    expect = (rgb.astype(np.int64).sum(axis=2) // 3).astype(np.uint8)
    assert np.array_equal(grey, expect)
    # non-lossless WebP still routes to the documented rejection
    import struct

    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + bytes(4)
    )
    with pytest.raises(NotImplementedError, match="lossy-VP8"):
        decode_media(lossy, 4, 4, decode_stub=False)


def test_webp_fixture_is_deterministic():
    import os
    import tempfile

    from iceberg_tracking_spark.sources.binary import ensure_webp_fixture

    with tempfile.TemporaryDirectory() as t:
        a = ensure_webp_fixture(os.path.join(t, "a"))
        b = ensure_webp_fixture(os.path.join(t, "b"))
        for i, fn in enumerate(sorted(os.listdir(a))):
            ba = open(os.path.join(a, fn), "rb").read()
            assert ba == open(os.path.join(b, fn), "rb").read()
            out = decode_webp(ba)
            h, w = 9 + i % 5, 11 + i % 4
            yy, xx = np.mgrid[0:h, 0:w]
            g = ((xx * (i + 3) + yy * (i + 7) + i * 5) % 256).astype(np.uint8)
            assert np.array_equal(out[:, :, 1], g)
