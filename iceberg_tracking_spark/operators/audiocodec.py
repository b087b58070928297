"""Pure-numpy audio codec: REAL decode for PCM WAV (RIFF) blobs.

The audio sibling of operators/imagecodec.py — WAV with uncompressed
16-bit PCM is a fixed-layout container (RIFF header + fmt chunk + data
chunk) that needs no codec library, so audio blobs get a REAL decode
path in this container too: parse the chunks, `np.frombuffer` the
samples, compute signal features (RMS, zero-crossing rate, peak). The
fixture files (sources/binary.ensure_audio_fixture) are genuine WAVs
any player opens.

Vectorized numpy throughout; inside a mapInPandas batch this runs at C
speed per partition.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples → RIFF/WAVE bytes (PCM, 16-bit, 1 channel)."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    data = s.tobytes()
    byte_rate = sample_rate * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (int16 mono samples, sample_rate).

    Walks the chunk list (so extra chunks like LIST/INFO are skipped),
    supports PCM (format 1), 16-bit, mono — the envelope the encoder
    writes and the fixture guarantees."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE blob")
    pos, n = 12, len(data)
    fmt = None
    samples = None
    rate = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"only 16-bit mono PCM supported (fmt={fmt}, "
                    f"ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            samples = np.frombuffer(body, dtype="<i2").copy()
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if samples is None or rate is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


def audio_features(samples: np.ndarray, rate: int) -> dict[str, float]:
    """Deterministic per-clip features: duration, RMS, peak, and
    zero-crossing rate — the cheap audio-quality/VAD signals."""
    x = samples.astype(np.float64)
    n = len(x)
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0
    return {
        "n_samples": float(n),
        "duration_ms": 1000.0 * n / rate,
        "rms": float(np.sqrt(np.mean(x * x))) if n else 0.0,
        "peak": float(np.max(np.abs(x))) if n else 0.0,
        "zcr": zc / (n - 1) if n > 1 else 0.0,
    }


# --------------------------------------------------------------- video
# Y4M (YUV4MPEG2) lives here with the audio codec as the second
# "uncompressed real container" — plain ASCII stream header, then raw
# frames each prefixed by a FRAME marker. With the `Cmono` colorspace a
# frame is exactly width*height luma bytes: real video any ffmpeg/mpv
# build plays, decodable with numpy alone.


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n, h, w) uint8 luma frames → Y4M bytes (Cmono colorspace)."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    if f.ndim != 3:
        raise ValueError(f"expected (n, h, w); got {f.shape}")
    n, h, w = f.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 Cmono\n" % (w, h, fps)]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(f[i].tobytes())
    return b"".join(out)


def is_y4m(data: bytes) -> bool:
    return data[:9] == b"YUV4MPEG2"


def decode_y4m(data: bytes) -> tuple[np.ndarray, int]:
    """Y4M bytes → ((n, h, w) uint8 luma frames, fps). Cmono only."""
    if not is_y4m(data):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    header = data[:nl].decode("ascii")
    params = {p[0]: p[1:] for p in header.split(" ")[1:] if p}
    w, h = int(params["W"]), int(params["H"])
    fps = int(params.get("F", "25:1").split(":")[0])
    if params.get("C", "mono") != "mono":
        raise ValueError(f"only Cmono supported (C{params.get('C')})")
    frame_bytes = w * h
    frames = []
    pos = nl + 1
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"missing FRAME marker at byte {pos}")
        pos = data.index(b"\n", pos) + 1  # FRAME may carry parameters
        if len(data) - pos < frame_bytes:
            raise ValueError("truncated frame payload")
        frames.append(
            np.frombuffer(data, dtype=np.uint8, count=frame_bytes, offset=pos)
            .reshape(h, w)
            .copy()
        )
        pos += frame_bytes
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), fps
