"""Pure-numpy image codec: REAL decode/resize/crop for uncompressed
formats (SURVEY §2.8 M3).

The container has no PIL/cv2/ffmpeg, so compressed codecs (JPEG/PNG)
stay behind the stub gate in operators/multimodal.py — but nothing
stops a *real* codec for an uncompressed container. This module
implements binary PGM (P5): a 3-token ASCII header + raw 8-bit
samples. The fixture images written by sources/binary.py are genuine
PGM files any external tool can open, and every transform here
(bilinear resize, crop-with-pad) is the actual pixel math the
reference applies through OpenCV (embedding.py:280-310 crop/resize/pad
to the backbone's input size), not a hash-based fake.

Everything is vectorized numpy — inside a mapInPandas batch these run
at C speed per partition; no Python-per-pixel loops.
"""

from __future__ import annotations

import numpy as np


def encode_pgm(mat: np.ndarray) -> bytes:
    """(h, w) uint8 → binary PGM (P5) bytes."""
    if mat.ndim != 2:
        raise ValueError(f"PGM is single-channel; got shape {mat.shape}")
    m = np.ascontiguousarray(mat, dtype=np.uint8)
    h, w = m.shape
    return b"P5\n%d %d\n255\n" % (w, h) + m.tobytes()


def is_pgm(data: bytes) -> bool:
    return data[:2] == b"P5"


def decode_pgm(data: bytes) -> np.ndarray:
    """Binary PGM (P5) bytes → (h, w) uint8. Handles arbitrary header
    whitespace and `#` comments per the netpbm spec; maxval ≤ 255."""
    if not is_pgm(data):
        raise ValueError("not a binary PGM (missing P5 magic)")
    idx = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while idx < len(data) and data[idx : idx + 1].isspace():
            idx += 1
        if data[idx : idx + 1] == b"#":
            while idx < len(data) and data[idx] != 0x0A:
                idx += 1
            continue
        start = idx
        while idx < len(data) and not data[idx : idx + 1].isspace():
            idx += 1
        tokens.append(int(data[start:idx]))
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError(f"16-bit PGM not supported (maxval={maxval})")
    idx += 1  # exactly one whitespace byte separates header from samples
    if len(data) - idx < w * h:
        raise ValueError("truncated PGM payload")
    return np.frombuffer(data, dtype=np.uint8, count=w * h, offset=idx).reshape(
        h, w
    ).copy()


def resize_bilinear(mat: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resample to (out_h, out_w) with half-pixel-center
    alignment (OpenCV INTER_LINEAR convention). Returns float64; use
    np.rint(...).astype(np.uint8) for display-ready output.

    Pure gather math: source coordinates for every output pixel are
    computed as arrays and fetched with two fancy-indexing passes —
    no per-pixel Python.
    """
    in_h, in_w = mat.shape
    m = mat.astype(np.float64)
    ys = (np.arange(out_h) + 0.5) * in_h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * in_w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, in_h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, in_w - 1)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    top = m[y0][:, x0] * (1.0 - wx) + m[y0][:, x1] * wx
    bot = m[y1][:, x0] * (1.0 - wx) + m[y1][:, x1] * wx
    return top * (1.0 - wy) + bot * wy


def crop_pad(
    mat: np.ndarray, left: int, top: int, width: int, height: int, fill: int = 0
) -> np.ndarray:
    """Crop the (left, top, width, height) window; regions outside the
    image are padded with `fill` (the reference pads detection crops
    that touch the frame border, embedding.py:280-310)."""
    out = np.full((height, width), fill, dtype=mat.dtype)
    src_t, src_l = max(top, 0), max(left, 0)
    src_b = min(top + height, mat.shape[0])
    src_r = min(left + width, mat.shape[1])
    if src_b > src_t and src_r > src_l:
        out[src_t - top : src_b - top, src_l - left : src_r - left] = mat[
            src_t:src_b, src_l:src_r
        ]
    return out


def draw_box(
    mat: np.ndarray, left: int, top: int, width: int, height: int, value: int = 255
) -> np.ndarray:
    """Draw a 1-px rectangle outline (clipped to the image) — the
    annotated-image overlay of the reference's visualize step
    (visualize.py draws detection boxes), as pure array writes."""
    out = mat.copy()
    h, w = out.shape
    t, b = max(top, 0), min(top + height - 1, h - 1)
    l, r = max(left, 0), min(left + width - 1, w - 1)
    if t > b or l > r:
        return out
    if 0 <= top < h:
        out[top, l : r + 1] = value
    if 0 <= top + height - 1 < h:
        out[top + height - 1, l : r + 1] = value
    if 0 <= left < w:
        out[t : b + 1, left] = value
    if 0 <= left + width - 1 < w:
        out[t : b + 1, left + width - 1] = value
    return out
