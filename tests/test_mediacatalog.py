"""parse_media_header: general container walks, beyond the fixture
profiles the q_media_catalog oracle pins (the oracle re-derives the
FIXTURE layouts arithmetically; these tests cover the layouts the
generic parser must also survive — real encoder outputs for every
natively-decodable format, hand-built containers for the rest, and
malformed input tolerance)."""

import os
import struct

import numpy as np
import pytest

from iceberg_tracking_spark.operators.mediacatalog import parse_media_header


def _info(data: bytes) -> dict:
    return parse_media_header(data)


# --------------------------------------------------- native encoders


def test_pgm_header():
    from iceberg_tracking_spark.operators.imagecodec import encode_pgm

    mat = np.arange(35, dtype=np.uint8).reshape(5, 7)
    i = _info(encode_pgm(mat))
    assert (i["format"], i["width"], i["height"]) == ("pgm", 7, 5)
    assert i["decodable"] and not i["is_animated"]


def test_png_header_grey_and_rgba():
    from iceberg_tracking_spark.operators.imagecodec import encode_png

    grey = np.arange(24, dtype=np.uint8).reshape(4, 6)
    i = _info(encode_png(grey))
    assert (i["format"], i["width"], i["height"]) == ("png", 6, 4)
    assert not i["has_alpha"] and i["decodable"]
    # RGBA: hand-built IHDR with color type 6 (the encoder is grey/RGB
    # only — alpha detection is a header read, not a decode)
    ihdr = struct.pack(">II", 5, 3) + bytes([8, 6, 0, 0, 0])
    rgba = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4
    )
    j = _info(rgba)
    assert j["has_alpha"] and (j["width"], j["height"]) == (5, 3)
    # decodable mirrors decode_png, which rejects alpha color types
    assert not j["decodable"]


def test_gif_single_vs_animated():
    from iceberg_tracking_spark.operators.gifcodec import encode_gif

    pal = np.stack([np.arange(16)] * 3, axis=1).astype(np.uint8)
    one = np.zeros((1, 4, 5), dtype=np.uint8)
    i = _info(encode_gif(one, pal, delays_ms=[40]))
    assert (i["format"], i["width"], i["height"]) == ("gif", 5, 4)
    assert not i["is_animated"] and i["decodable"]
    three = np.zeros((3, 4, 5), dtype=np.uint8)
    j = _info(encode_gif(three, pal, delays_ms=[40, 50, 60]))
    assert j["is_animated"]


def test_jpeg_header_baseline():
    from iceberg_tracking_spark.operators.jpegcodec import encode_jpeg

    mat = (np.arange(64, dtype=np.int32) * 3 % 256).astype(np.uint8)
    data = encode_jpeg(mat.reshape(8, 8))
    i = _info(data)
    assert (i["format"], i["width"], i["height"]) == ("jpeg", 8, 8)
    assert i["codec"] == "jpeg-baseline" and i["decodable"]


def test_webp_vp8l_direct_and_vp8x_wrapped():
    from iceberg_tracking_spark.operators.webpcodec import encode_webp_lossless

    g = (np.arange(6 * 9, dtype=np.int32) % 256).astype(np.uint8).reshape(6, 9)
    plain = encode_webp_lossless(g, plain=True)
    i = _info(plain)
    assert (i["format"], i["codec"]) == ("webp", "vp8l")
    assert (i["width"], i["height"]) == (9, 6) and i["decodable"]
    # VP8X wrap: canvas dims now come from the VP8X chunk — the exact
    # case the fixed-offset scan mis-parsed before the r11 guard
    vp8x = (
        b"VP8X" + struct.pack("<I", 10)
        + bytes([0x10, 0, 0, 0])  # alpha flag set
        + (8).to_bytes(3, "little") + (5).to_bytes(3, "little")
    )
    chunks = vp8x + plain[12:]
    wrapped = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks
    j = _info(wrapped)
    assert (j["width"], j["height"]) == (9, 6) and j["codec"] == "vp8l"
    assert j["has_alpha"] and j["decodable"]


def test_wav_and_y4m_classify():
    from iceberg_tracking_spark.operators.audiocodec import encode_wav

    wav = encode_wav(np.zeros(100, dtype=np.int16), 8000)
    assert _info(wav)["format"] == "wav"
    y4m = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 Cmono\nFRAME\n" + b"\x00" * 8
    i = _info(y4m)
    assert i["format"] == "y4m" and i["is_animated"]


# ------------------------------------------------ hand-built headers


def test_lossy_vp8_dims_and_rejection_flag():
    tag = ((1 << 4) | (77 << 5)).to_bytes(3, "little")
    body = tag + b"\x9d\x01\x2a" + struct.pack("<HH", 640, 480) + b"\x00" * 16
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    i = _info(data)
    assert i["codec"] == "vp8" and not i["decodable"]
    assert (i["width"], i["height"]) == (640, 480)


def test_avif_box_tree_with_alpha_and_largesize():
    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p

    ftyp = box(b"ftyp", b"avif\x00\x00\x00\x00avifmif1")
    ispe = box(b"ispe", b"\x00\x00\x00\x00" + struct.pack(">II", 300, 200))
    auxc = box(b"auxC", b"\x00\x00\x00\x00urn:mpeg:mpegB:cicp:systems:auxiliary:alpha\x00")
    ipco = box(b"ipco", ispe + box(b"av1C", b"\x81\x04\x0c\x00") + auxc)
    meta = box(b"meta", b"\x00\x00\x00\x00" + box(b"iprp", ipco))
    # mdat with a 64-bit largesize header: the walk must honor it
    payload = b"\x00" * 10
    mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
    i = _info(ftyp + meta + mdat)
    assert (i["format"], i["codec"]) == ("avif", "av01")
    assert (i["width"], i["height"]) == (300, 200)
    assert i["has_alpha"] and not i["is_animated"] and not i["decodable"]


def test_avis_brand_marks_animated():
    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p

    data = box(b"ftyp", b"avis\x00\x00\x00\x00avismif1")
    i = _info(data)
    assert i["format"] == "avif" and i["is_animated"]


def test_heic_brand_classifies_heif():
    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p

    data = box(b"ftyp", b"heic\x00\x00\x00\x00heicmif1") + box(
        b"meta",
        b"\x00\x00\x00\x00"
        + box(
            b"iprp",
            box(
                b"ipco",
                box(b"ispe", b"\x00\x00\x00\x00" + struct.pack(">II", 64, 48))
                + box(b"hvcC", b"\x01\x02"),
            ),
        ),
    )
    i = _info(data)
    assert (i["format"], i["codec"]) == ("heif", "hvc1")
    assert (i["width"], i["height"]) == (64, 48) and not i["decodable"]


def test_apng_actl_marks_animated_not_decodable():
    from iceberg_tracking_spark.operators.imagecodec import encode_png

    png = encode_png(np.zeros((2, 2), dtype=np.uint8))
    # splice an acTL chunk right after IHDR (byte 33)
    actl = struct.pack(">I", 8) + b"acTL" + struct.pack(">II", 2, 0) + b"\x00\x00\x00\x00"
    data = png[:33] + actl + png[33:]
    i = _info(data)
    assert i["is_animated"] and not i["decodable"]


def test_tiff_both_byte_orders_and_multipage():
    def ifd(bo, entries, nxt=0):
        out = len(entries).to_bytes(2, bo)
        for tag, typ, cnt, val in entries:
            v = val.to_bytes(2, bo) + b"\x00\x00" if typ == 3 else val.to_bytes(4, bo)
            out += tag.to_bytes(2, bo) + typ.to_bytes(2, bo) + cnt.to_bytes(4, bo) + v
        return out + nxt.to_bytes(4, bo)

    for bo, magic in (("little", b"II*\x00"), ("big", b"MM\x00*")):
        hdr = magic + (8).to_bytes(4, bo)
        body = ifd(bo, [(256, 3, 1, 640), (257, 4, 1, 480)])
        i = _info(hdr + body)
        assert (i["format"], i["width"], i["height"]) == ("tiff", 640, 480)
        assert not i["is_animated"] and not i["decodable"]
    # multi-page + ExtraSamples alpha
    bo = "little"
    hdr = b"II*\x00" + (8).to_bytes(4, bo)
    body = ifd(bo, [(256, 3, 1, 10), (257, 3, 1, 20), (338, 3, 1, 2)], nxt=200)
    j = _info(hdr + body)
    assert j["is_animated"] and j["has_alpha"]
    assert (j["width"], j["height"]) == (10, 20)


def test_bmp_top_down_and_alpha():
    hdr = (
        b"BM" + (122).to_bytes(4, "little") + b"\x00" * 4
        + (122).to_bytes(4, "little")
        + (108).to_bytes(4, "little")
        + (7).to_bytes(4, "little")
        + (-5).to_bytes(4, "little", signed=True)  # top-down
        + (1).to_bytes(2, "little")
        + (32).to_bytes(2, "little")
    )
    i = _info(hdr)
    assert (i["format"], i["width"], i["height"]) == ("bmp", 7, 5)
    assert i["has_alpha"] and not i["decodable"]


def test_truncated_vp8l_not_decodable():
    """A WebP whose VP8L chunk has no parseable 0x2F header must not
    catalog as natively decodable (review finding: fourcc alone used
    to set decodable=True on garbage decode_webp rejects)."""
    i = _info(b"RIFF\xff\xff\xff\xffWEBPVP8L\xff\xff\xff\xff\x00")
    assert i["format"] == "webp" and i["codec"] == "vp8l"
    assert not i["decodable"] and i["width"] is None


def test_os2_core_header_bmp_yields_null_dims():
    """An OS/2 BITMAPCOREHEADER (DIB size 12, 16-bit dims) must NOT be
    read through the BITMAPINFOHEADER offsets — that would fuse width
    and height into plausible garbage; NULL dims is the contract."""
    hdr = (
        b"BM" + (40).to_bytes(4, "little") + b"\x00" * 4
        + (26).to_bytes(4, "little")
        + (12).to_bytes(4, "little")      # BITMAPCOREHEADER
        + (100).to_bytes(2, "little")     # 16-bit width
        + (50).to_bytes(2, "little")      # 16-bit height
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
        + b"\x00" * 8
    )
    i = _info(hdr)
    assert i["format"] == "bmp"
    assert i["width"] is None and i["height"] is None


def test_subsampled_lossless_jpeg_not_decodable():
    """decode_jpeg rejects SOF3 frames with non-1:1 sampling — the
    catalog must mirror that instead of overstating decodability."""
    def sof3(sampling):
        comps = b"".join(
            bytes([cid, sampling, 0]) for cid in (1, 2, 3)
        )
        seg = b"\x08" + (10).to_bytes(2, "big") + (20).to_bytes(2, "big") \
            + bytes([3]) + comps
        return (
            b"\xff\xd8" + b"\xff\xc3"
            + (2 + len(seg)).to_bytes(2, "big") + seg
        )

    ok = _info(sof3(0x11))
    assert ok["codec"] == "jpeg-lossless" and ok["decodable"]
    assert (ok["width"], ok["height"]) == (20, 10)
    bad = _info(sof3(0x21))
    assert bad["codec"] == "jpeg-lossless" and not bad["decodable"]


def test_svg_sniffing():
    assert _info(b'<svg xmlns="http://www.w3.org/2000/svg"/>')["format"] == "svg"
    assert _info(b'<?xml version="1.0"?>\n<svg width="3"/>')["format"] == "svg"
    assert _info(b'  \n<svg/>')["format"] == "svg"
    assert _info(b'<?xml version="1.0"?><html/>')["format"] == "unknown"


# --------------------------------------------------------- tolerance


@pytest.mark.parametrize(
    "junk",
    [
        b"",
        b"\x00",
        b"RIFF",
        b"RIFF\x00\x00\x00\x00WEBP",
        b"RIFF\xff\xff\xff\xffWEBPVP8L\xff\xff\xff\xff\x00",
        b"\x00\x00\x00\x08ftyp",  # truncated ftyp
        b"\x89PNG\r\n\x1a\n\x00\x00",
        b"GIF89a\x05",
        b"\xff\xd8\xff",
        b"not media at all" * 3,
        b"II*\x00",
        b"MM\x00*\x00\x00\x00\x08",
        b"BM\x01",
    ],
)
def test_malformed_inputs_never_raise(junk):
    i = _info(junk)
    assert isinstance(i, dict) and "format" in i


def test_catalog_fixture_roundtrip():
    """Every fixture blob catalogs with the values the oracle derives
    (kind table from ensure_catalog_fixture's docstring)."""
    import os

    from iceberg_tracking_spark.sources.binary import (
        CATALOG_FIXTURE_N,
        ensure_catalog_fixture,
    )

    p = ensure_catalog_fixture()
    seen = 0
    for fn in sorted(os.listdir(p)):
        idx = int(fn.split(".")[0])
        data = open(os.path.join(p, fn), "rb").read()
        i = _info(data)
        seen += 1
        h, w = 9 + idx % 5, 11 + idx % 4
        if idx >= 12:  # appended alpha profiles (ALPH webp / auxC avif)
            assert i["has_alpha"] and not i["is_animated"]
            assert (i["width"], i["height"]) == (w, h)
            assert not i["decodable"]
            assert i["codec"] == ("vp8" if idx == 12 else "av01")
            assert i["format"] == ("webp" if idx == 12 else "avif")
            continue
        kind = idx % 6
        if kind < 4:
            assert i["format"] == "webp"
            assert (i["width"], i["height"]) == (w, h)
            assert i["codec"] == ("vp8" if kind == 2 else "vp8l")
            assert i["is_animated"] == (kind == 3)
            assert i["decodable"] == (kind in (0, 1))
        else:
            assert i["format"] == "avif" and i["codec"] == "av01"
            assert (i["width"], i["height"]) == (w, h)
            assert i["is_animated"] == (kind == 5)
            assert not i["decodable"]
    assert seen == CATALOG_FIXTURE_N


def test_vp8x_wrapped_fixture_still_decodes():
    """The kind-1 fixture files (VP8X-wrapped VP8L) must decode through
    the real codec — cataloging 'decodable' has to be TRUE in fact."""
    import os

    from iceberg_tracking_spark.operators.multimodal import decode_media
    from iceberg_tracking_spark.sources.binary import ensure_catalog_fixture

    p = ensure_catalog_fixture()
    data = open(os.path.join(p, "0001.webp"), "rb").read()
    i = _info(data)
    mat = decode_media(data, i["width"], i["height"], decode_stub=False)
    assert mat.shape == (i["height"], i["width"])


# ------------------------------- r11 ADVICE decodable-contract gates


def test_truncated_gif_not_decodable():
    """decode_gif raises 'truncated GIF header' below 13 bytes — a
    magic-only stump must not catalog as decodable (r11 ADVICE #1)."""
    i = _info(b"GIF89a\x05\x00")
    assert i["format"] == "gif" and not i["decodable"]
    assert i["width"] is None and i["height"] is None


def test_garbage_block_gif_not_decodable():
    """A valid logical screen descriptor followed by a junk block
    stream: decode_gif raises on the unknown block, so the catalog
    must not claim decodable (r11 ADVICE #1)."""
    lsd = b"GIF89a" + struct.pack("<HH", 4, 3) + bytes([0x00, 0, 0])
    i = _info(lsd + b"\x7f\xff\xff")
    assert i["format"] == "gif" and (i["width"], i["height"]) == (4, 3)
    assert not i["decodable"]
    # same screen descriptor but no blocks at all (no image data, no
    # trailer): decode_gif raises "GIF contains no image data"
    j = _info(lsd)
    assert not j["decodable"]
    # and with only a trailer (still zero frames): not decodable
    k = _info(lsd + b"\x3b")
    assert not k["decodable"]


def test_cmyk_jpeg_not_decodable():
    """4-component (Adobe CMYK) SOF0: header parses, dims catalog,
    but decode_jpeg raises on ncomp not in (1, 3) — decodable must
    mirror that (r11 ADVICE #2)."""
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(4))
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 4, 8, 7, 9, 4) + comps
    data = b"\xff\xd8" + sof + b"\xff\xd9"
    i = _info(data)
    assert i["codec"] == "jpeg-baseline"
    assert (i["width"], i["height"]) == (9, 7)
    assert not i["decodable"]
    # the identical frame with 3 components IS decodable
    comps3 = b"".join(bytes([i + 1, 0x11, 0]) for i in range(3))
    sof3 = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 3, 8, 7, 9, 3) + comps3
    assert _info(b"\xff\xd8" + sof3 + b"\xff\xd9")["decodable"]


def test_pgm_comment_lines_parse():
    """'#...' comment lines between header tokens are netpbm-legal and
    decode_pgm strips them — the catalog tokenizer must too, instead
    of cataloging NULL dims on a decodable file (r11 ADVICE #4)."""
    from iceberg_tracking_spark.operators.imagecodec import decode_pgm

    data = b"P5\n# made by a tool\n7 # width\n5\n# about maxval\n255\n" + bytes(35)
    i = _info(data)
    assert (i["width"], i["height"]) == (7, 5) and i["decodable"]
    # the mirror is real: decode_pgm accepts the same bytes
    assert decode_pgm(data).shape == (5, 7)


def test_pgm_16bit_not_decodable():
    """maxval > 255 raises in decode_pgm — catalog dims still parse
    but decodable must be False (codec-mirror contract)."""
    data = b"P5\n7 5\n65535\n" + bytes(70)
    i = _info(data)
    assert (i["width"], i["height"]) == (7, 5)
    assert not i["decodable"]


def test_pgm_unparseable_header_not_decodable():
    i = _info(b"P5\nxx yy\n")
    assert i["format"] == "pgm" and not i["decodable"]
    assert i["width"] is None


def test_webp_scan_parity_with_catalog(spark):
    """The two WebP header readers — media_from_webp_files' zero-
    Python Catalyst fixed-offset parse (guarded to plain VP8L-first
    files) and parse_media_header's general RIFF walk — must agree on
    every blob the scan accepts (r11 verdict task #4: the parsers are
    kept separate deliberately; this pins them consistent)."""
    from iceberg_tracking_spark.operators.multimodal import media_from_webp_files

    rows = media_from_webp_files(spark).select(
        "media_id", "content", "width", "height"
    ).collect()
    assert rows, "webp fixture scan returned nothing"
    for r in rows:
        i = _info(bytes(r.content))
        assert i["format"] == "webp" and i["codec"] == "vp8l"
        assert (i["width"], i["height"]) == (r.width, r.height), r.media_id
        assert i["decodable"]


# ------------------------------ r12: bounded-IO head-bytes scan path


def _head_invariant(data: bytes) -> None:
    """parse_media_head must NEVER differ from the full parse — it
    either returns the identical row or None (needs more bytes)."""
    from iceberg_tracking_spark.operators.mediacatalog import parse_media_head

    full = parse_media_header(data)
    assert parse_media_head(data, len(data)) == full
    for cut in range(16, len(data), 13):
        got = parse_media_head(data[:cut], len(data))
        assert got is None or got == full, (cut, got, full)


def test_head_parse_never_differs_from_full():
    """Every-format sweep of the head-parse invariant: a prefix parse
    is either exactly the full-file row or an explicit _NeedMore."""
    from iceberg_tracking_spark.operators.gifcodec import encode_gif
    from iceberg_tracking_spark.operators.imagecodec import encode_pgm, encode_png
    from iceberg_tracking_spark.operators.jpegcodec import encode_jpeg
    from iceberg_tracking_spark.operators.webpcodec import encode_webp_lossless

    g = (np.arange(24 * 17, dtype=np.int32) % 256).astype(np.uint8).reshape(24, 17)
    pal = np.stack([np.arange(16)] * 3, axis=1).astype(np.uint8)
    anim = (np.arange(3 * 6 * 7) % 16).astype(np.uint8).reshape(3, 6, 7)
    blobs = [
        encode_pgm(g),
        encode_png(g),
        encode_jpeg(g),
        encode_gif(anim, pal, delays_ms=[40, 50, 60]),
        encode_webp_lossless(g, plain=True),
        encode_webp_lossless(g, plain=False),
    ]
    for data in blobs:
        _head_invariant(data)


def _tail_ifd_tiff(total: int = 200_000) -> bytes:
    """Little-endian TIFF whose IFD sits at the file TAIL — the
    documented container-directs-past-head case."""
    ifd_off = total - 2 - 12 * 2 - 4
    entries = (
        struct.pack("<HHIHH", 256, 3, 1, 321, 0)
        + struct.pack("<HHIHH", 257, 3, 1, 123, 0)
    )
    ifd = struct.pack("<H", 2) + entries + struct.pack("<I", 0)
    return (
        b"II*\x00" + struct.pack("<I", ifd_off)
        + bytes(ifd_off - 8) + ifd
    )


def test_head_parse_tail_ifd_tiff_needs_more():
    from iceberg_tracking_spark.operators.mediacatalog import parse_media_head

    data = _tail_ifd_tiff()
    assert parse_media_head(data[:65536], len(data)) is None
    full = parse_media_header(data)
    assert (full["width"], full["height"]) == (321, 123)


def test_head_scan_bytes_read_bounded(spark, tmp_path):
    """The catalog scan's IO bound, measured: a 300 KB WebP whose
    image chunk is followed by a large skippable chunk must read
    EXACTLY head_bytes; a tail-IFD TIFF must fall back to a full read
    and still produce the full-parse row (test style:
    test_generate_embeddings_frame_cache_locality — assert on the
    measured quantity, not the mechanism)."""
    from iceberg_tracking_spark.operators.mediacatalog import catalog_from_listing
    from iceberg_tracking_spark.operators.webpcodec import encode_webp_lossless
    from iceberg_tracking_spark.sources.binary import list_files

    g = (np.arange(11 * 13, dtype=np.int32) % 256).astype(np.uint8).reshape(11, 13)
    webp = bytearray(encode_webp_lossless(g, plain=True))
    junk = b"JUNK" + struct.pack("<I", 300_000) + bytes(300_000)
    webp[4:8] = struct.pack("<I", len(webp) - 8 + len(junk))
    webp = bytes(webp) + junk
    (tmp_path / "0001.webp").write_bytes(webp)
    tiff = _tail_ifd_tiff()
    (tmp_path / "0002.tiff").write_bytes(tiff)

    rows = {
        os.path.basename(r.path): r
        for r in catalog_from_listing(
            list_files(spark, str(tmp_path)), head_bytes=65536
        ).collect()
    }
    w = rows["0001.webp"]
    assert w.bytes_read == 65536 < w.file_size == len(webp)
    assert (w.format, w.codec, w.width, w.height) == ("webp", "vp8l", 13, 11)
    assert w.decodable
    t = rows["0002.tiff"]
    assert t.bytes_read == t.file_size == len(tiff)  # fallback: full
    assert (t.format, t.width, t.height) == ("tiff", 321, 123)


def test_head_scan_row_parity_with_binaryfile_path(spark):
    """Same fixture, both scan paths (bounded listing+heads vs full
    binaryFile content), identical catalog rows."""
    from iceberg_tracking_spark.operators.mediacatalog import (
        catalog_from_listing,
        parse_media_header,
    )
    from iceberg_tracking_spark.sources.binary import (
        ensure_catalog_fixture,
        list_files,
        read_binary_files,
    )

    p = ensure_catalog_fixture()
    head_rows = {
        os.path.basename(r.path): r
        for r in catalog_from_listing(list_files(spark, p)).collect()
    }
    full_rows = read_binary_files(spark, p, glob="*").collect()
    assert len(head_rows) == len(full_rows) > 0
    for r in full_rows:
        info = parse_media_header(bytes(r.content))
        h = head_rows[os.path.basename(r.path)]
        got = (h.format, h.codec, h.width, h.height, h.has_alpha,
               h.is_animated, h.decodable)
        want = (info["format"], info["codec"], info["width"],
                info["height"], info["has_alpha"], info["is_animated"],
                info["decodable"])
        assert got == want, r.path
