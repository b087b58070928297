"""Pure-numpy/stdlib lossless WebP (VP8L) codec.

Decode implements the public "WebP Lossless Bitstream Specification"
(the VP8L format): RIFF container walk, LSB-first bit reading,
canonical prefix codes (simple and normal, with the 19-symbol
code-length code and 16/17/18 repeats), color cache, LZ77 backward
references with the 120-entry 2-D distance mapping, meta-prefix
groups (the "huffman image"), and all four transforms — predictor
(14 modes), cross-color, subtract-green, and color-indexing with
sub-byte pixel bundling — applied inverse in reverse read order.

Reference parity: the reference pipeline reads WebP transparently
through PIL (embedding.py:234-250; extension sniffing
helpers.py:665-685) — WebP is the highest-frequency scraped-corpus
format this engine previously rejected (r9 verdict task #2). Lossy
VP8/VP8X-only files remain a documented rejection (DCT codec, out of
the bounded-numpy-codec scope).

The encoder is original work for round-trip pinning: general canonical
Huffman construction (balanced complete-code fallback), RLE'd
code-length emission, optional transforms, color cache, backward
references, and meta-prefix groups. `plain=True` writes a constrained
grey profile — SUBTRACT_GREEN + fixed 8-bit green code, 0-bit
red/blue/alpha/distance codes — whose pixel stream sits at a fixed
bit offset so q_webp_decode's DuckDB oracle re-walks it from hex
(the q_gif_decode pattern).

Performance shape (the jpegcodec note, same class): the prefix-decode
loop is per-pixel Python — this codec is for fixture-scale correctness
evidence and modest blob sizes inside mapInPandas batches; a production
deployment drops in PIL/cv2 behind the same decode_media() dispatch
without touching any plan. The transform inverses vectorize where
L-dependence allows (subtract-green, palette unbundling).
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

# ------------------------------------------------------------- bits


class _BitReader:
    """LSB-first bit reader (VP8L convention: first bit read is the
    least-significant bit of the current byte)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bit = pos * 8

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            b = self.bit
            if b >> 3 >= len(self.data):
                raise ValueError("truncated VP8L bitstream")
            v |= ((self.data[b >> 3] >> (b & 7)) & 1) << i
            self.bit += 1
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        self.acc |= (val & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes are walked MSB-first by the decoder."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self.out)
        if self.n:
            out += bytes([self.acc & 0xFF])
        return out

    @property
    def bitpos(self) -> int:
        return len(self.out) * 8 + self.n


# ------------------------------------------------- canonical prefix codes

_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _canonical_codes(lengths: list[int]) -> list[int]:
    """DEFLATE-style canonical code assignment (by length, then symbol)."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    codes = [0] * len(lengths)
    for sym, ln in enumerate(lengths):
        if ln:
            codes[sym] = next_code[ln]
            next_code[ln] += 1
    return codes


class _Huff:
    """Bit-by-bit canonical prefix decoder. A code with exactly one
    used symbol decodes that symbol reading ZERO bits (the VP8L
    single-symbol special case)."""

    def __init__(self, lengths: list[int]) -> None:
        used = [(s, ln) for s, ln in enumerate(lengths) if ln]
        if not used:
            raise ValueError("VP8L prefix code with no symbols")
        if len(used) == 1:
            self.single: int | None = used[0][0]
            self.table: dict[tuple[int, int], int] = {}
            self.max_len = 0
            return
        self.single = None
        kraft = sum(1 << (15 - ln) for _, ln in used)
        if kraft != 1 << 15:
            raise ValueError("over/under-subscribed VP8L prefix code")
        codes = _canonical_codes(lengths)
        self.table = {(ln, codes[s]): s for s, ln in used}
        self.max_len = max(ln for _, ln in used)

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code word")


def _read_code_lengths(br: _BitReader, clc_lengths: list[int], n: int) -> list[int]:
    """Symbol code lengths through the 19-symbol code-length code,
    with 16 (repeat previous, 3+2bits) / 17 (zeros, 3+3bits) /
    18 (zeros, 11+7bits) and the optional max_symbol read budget."""
    clc = _Huff(clc_lengths)
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = n
    lengths = [0] * n
    prev = 8
    symbol = 0
    while symbol < n:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code = clc.decode(br)
        if code < 16:
            lengths[symbol] = code
            symbol += 1
            if code:
                prev = code
        else:
            if code == 16:
                repeat, fill = 3 + br.read(2), prev
            elif code == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if symbol + repeat > n:
                raise ValueError("VP8L code-length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Huff:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bits = br.read(1)
        lengths = [0] * alphabet_size
        s0 = br.read(8 if first_8bits else 1)
        if s0 >= alphabet_size:
            raise ValueError("VP8L simple-code symbol out of range")
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size or s1 == s0:
                raise ValueError("VP8L simple-code symbol invalid")
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1
        return _Huff(lengths)
    num_codes = br.read(4) + 4
    if num_codes > len(_CLC_ORDER):
        raise ValueError("VP8L bad code-length-code count")
    clc_lengths = [0] * len(_CLC_ORDER)
    for i in range(num_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    return _Huff(_read_code_lengths(br, clc_lengths, alphabet_size))


# ------------------------------------------------- LZ77 distance mapping


def _dist_table() -> list[tuple[int, int]]:
    """The 120 short-distance (dx, dy) neighborhood offsets: dy in
    0..7 (dx 1..8 when dy = 0, else dx -7..8), sorted by squared
    distance, then |dx|, positive dx first — which reproduces the
    spec's listed table exactly (prefix pinned in tests)."""
    cand = [(dx, 0) for dx in range(1, 9)]
    cand += [(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    return cand


_DIST_TABLE = _dist_table()


def _plane_code_to_dist(xsize: int, plane_code: int) -> int:
    if plane_code > len(_DIST_TABLE):
        return plane_code - len(_DIST_TABLE)
    dx, dy = _DIST_TABLE[plane_code - 1]
    return max(1, dy * xsize + dx)


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length / distance prefix decoding (value ≥ 1)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ------------------------------------------------------------- decode


def _decode_pixels(
    br: _BitReader,
    w: int,
    h: int,
    cache_bits: int,
    groups: list[tuple[_Huff, _Huff, _Huff, _Huff, _Huff]],
    meta: np.ndarray | None,
    meta_bits: int,
) -> np.ndarray:
    n = w * h
    out = np.zeros(n, np.uint32)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    mw = _sub_size(w, meta_bits) if meta is not None else 0

    def insert(px: int) -> None:
        if cache is not None:
            cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            grp = groups[int(meta[(y >> meta_bits) * mw + (x >> meta_bits)])]
        else:
            grp = groups[0]
        green, red, blue, alpha, dist_t = grp
        s = green.decode(br)
        if s < 256:
            # stream order after green is red, blue, alpha
            r = red.decode(br)
            b = blue.decode(br)
            a = alpha.decode(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            insert(px)
            pos += 1
        elif s < 280:
            length = _prefix_value(s - 256, br)
            dist = _plane_code_to_dist(w, _prefix_value(dist_t.decode(br), br))
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                insert(px)
                pos += 1
        else:
            if cache is None or s - 280 >= len(cache):
                raise ValueError("VP8L color-cache symbol without cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out


def _decode_image_stream(
    br: _BitReader, w: int, h: int, is_level0: bool
) -> tuple[np.ndarray, int, int]:
    """Returns (flat packed-ARGB uint32 pixels, final_w, final_h) with
    every transform already inverted (subimages have none)."""
    transforms: list[tuple] = []
    cur_w = w
    if is_level0:
        while br.read(1):
            ttype = br.read(2)
            if any(t[0] == ttype for t in transforms):
                raise ValueError("VP8L transform repeated")
            if ttype in (0, 1):  # predictor / cross-color
                bits = br.read(3) + 2
                tdata, _, _ = _decode_image_stream(
                    br, _sub_size(cur_w, bits), _sub_size(h, bits), False
                )
                transforms.append((ttype, bits, tdata, cur_w))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None, cur_w))
            else:  # color indexing
                num_colors = br.read(8) + 1
                pbits = (
                    3 if num_colors <= 2 else 2 if num_colors <= 4
                    else 1 if num_colors <= 16 else 0
                )
                pal, _, _ = _decode_image_stream(br, num_colors, 1, False)
                # palette entries are per-channel cumulative sums
                b = pal.view(np.uint8).reshape(-1, 4).astype(np.uint32)
                pal = np.cumsum(b, axis=0, dtype=np.uint32) & 0xFF
                pal = (pal.astype(np.uint8)).copy().view(np.uint32).ravel()
                transforms.append((3, (pbits, num_colors), pal, cur_w))
                cur_w = _sub_size(cur_w, pbits)
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L bad color-cache bits {cache_bits}")
    meta = None
    meta_bits = 0
    ngroups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mimg, _, _ = _decode_image_stream(
            br, _sub_size(cur_w, meta_bits), _sub_size(h, meta_bits), False
        )
        meta = ((mimg >> 8) & 0xFFFF).astype(np.int64)
        ngroups = int(meta.max()) + 1
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = [
        (
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 40),
        )
        for _ in range(ngroups)
    ]
    pix = _decode_pixels(br, cur_w, h, cache_bits, groups, meta, meta_bits)
    for t in reversed(transforms):
        pix, cur_w = _apply_inverse(t, pix, cur_w, h)
    return pix, cur_w, h


def _argb_channels(pix: np.ndarray) -> np.ndarray:
    """flat packed uint32 → (n, 4) int32 [a, r, g, b]."""
    return np.stack(
        [
            (pix >> 24) & 0xFF,
            (pix >> 16) & 0xFF,
            (pix >> 8) & 0xFF,
            pix & 0xFF,
        ],
        axis=1,
    ).astype(np.int32)


def _pack_argb(ch: np.ndarray) -> np.ndarray:
    c = ch.astype(np.uint32) & 0xFF
    return (c[:, 0] << 24) | (c[:, 1] << 16) | (c[:, 2] << 8) | c[:, 3]


def _apply_inverse(
    t: tuple, pix: np.ndarray, cur_w: int, h: int
) -> tuple[np.ndarray, int]:
    ttype = t[0]
    if ttype == 2:  # subtract green
        ch = _argb_channels(pix)
        ch[:, 1] = (ch[:, 1] + ch[:, 2]) & 0xFF
        ch[:, 3] = (ch[:, 3] + ch[:, 2]) & 0xFF
        return _pack_argb(ch), cur_w
    if ttype == 3:  # color indexing: unbundle + palette lookup
        (pbits, num_colors), pal, orig_w = t[1], t[2], t[3]
        packed = ((pix >> 8) & 0xFF).astype(np.int64).reshape(h, cur_w)
        if pbits:
            bpp = 8 >> pbits
            xs = np.arange(orig_w)
            idx = (
                packed[:, xs >> pbits] >> ((xs & ((1 << pbits) - 1)) * bpp)
            ) & ((1 << bpp) - 1)
        else:
            idx = packed[:, :orig_w]
        if int(idx.max(initial=0)) >= num_colors:
            raise ValueError("VP8L palette index out of range")
        return pal[idx].ravel(), orig_w
    bits, tdata, tw = t[1], t[2], t[3]
    ch = _argb_channels(pix).reshape(h, cur_w, 4)
    bw = _sub_size(tw, bits)
    if ttype == 1:  # cross-color inverse
        te = _argb_channels(tdata).reshape(-1, bw, 4)
        for y in range(h):
            trow = te[y >> bits]
            for x in range(cur_w):
                g2r, g2b, r2b = (
                    trow[x >> bits, 3],
                    trow[x >> bits, 2],
                    trow[x >> bits, 1],
                )
                g = int(ch[y, x, 2])
                r = (int(ch[y, x, 1]) + _ct_delta(g2r, g)) & 0xFF
                b = (
                    int(ch[y, x, 3]) + _ct_delta(g2b, g) + _ct_delta(r2b, r)
                ) & 0xFF
                ch[y, x, 1] = r
                ch[y, x, 3] = b
        return _pack_argb(ch.reshape(-1, 4)), cur_w
    # predictor inverse (scalar: L-dependence serializes within a row)
    modes = (_argb_channels(tdata)[:, 2]).reshape(-1, bw)
    for y in range(h):
        mrow = modes[y >> bits]
        for x in range(cur_w):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = ch[0, x - 1]
            elif x == 0:
                pred = ch[y - 1, 0]
            else:
                L, T, TL = ch[y, x - 1], ch[y - 1, x], ch[y - 1, x - 1]
                # 1-D addressing: TR of the last column wraps to the
                # current row's first (already decoded) pixel
                TR = ch[y - 1, x + 1] if x + 1 < cur_w else ch[y, 0]
                pred = _predict(int(mrow[x >> bits]), L, T, TL, TR)
            for c in range(4):
                ch[y, x, c] = (int(ch[y, x, c]) + int(pred[c])) & 0xFF
    return _pack_argb(ch.reshape(-1, 4)), cur_w


def _ct_delta(t: int, c: int) -> int:
    """Cross-color delta: (int8(t) * int8(c)) >> 5, arithmetic shift."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _avg2(a, b) -> tuple:
    return tuple((int(a[i]) + int(b[i])) >> 1 for i in range(4))


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, L, T, TL, TR) -> tuple:
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return tuple(L)
    if mode == 2:
        return tuple(T)
    if mode == 3:
        return tuple(TR)
    if mode == 4:
        return tuple(TL)
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        pL = sum(abs(int(T[i]) - int(TL[i])) for i in range(4))
        pT = sum(abs(int(L[i]) - int(TL[i])) for i in range(4))
        return tuple(L) if pL < pT else tuple(T)
    if mode == 12:
        return tuple(
            _clamp(int(L[i]) + int(T[i]) - int(TL[i])) for i in range(4)
        )
    if mode == 13:
        out = []
        for i in range(4):
            a = (int(L[i]) + int(T[i])) >> 1
            d = a - int(TL[i])
            # C truncating division by 2 (not an arithmetic shift)
            out.append(_clamp(a + (abs(d) >> 1) * (1 if d >= 0 else -1)))
        return tuple(out)
    raise ValueError(f"invalid VP8L predictor mode {mode}")


def is_webp(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WEBP"


def _find_vp8l(data: bytes) -> bytes:
    """RIFF chunk walk → the VP8L payload. Lossy VP8 raises."""
    if not is_webp(data) or len(data) < 20:
        raise ValueError("not a WebP (missing RIFF/WEBP header)")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            return body
        if fourcc == b"VP8 ":
            raise ValueError(
                "lossy WebP (VP8) is a documented rejection — only the "
                "lossless VP8L profile decodes natively"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("WebP container has no VP8L chunk")


def is_webp_lossless(data: bytes) -> bool:
    try:
        _find_vp8l(data)
        return True
    except ValueError:
        return False


def decode_webp(data: bytes) -> np.ndarray:
    """Lossless WebP bytes → (h, w, 4) uint8 RGBA."""
    payload = _find_vp8l(data)
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(payload, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    pix, fw, fh = _decode_image_stream(br, w, h, True)
    if fw != w:
        raise ValueError("VP8L width mismatch after inverse transforms")
    argb = _argb_channels(pix).astype(np.uint8).reshape(fh, fw, 4)
    return argb[:, :, [1, 2, 3, 0]]  # ARGB → RGBA


# ------------------------------------------------------------- encode


def _huffman_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Code lengths for the used symbols; falls back to the balanced
    complete code whenever plain Huffman exceeds max_len."""
    used = sorted(s for s, f in freqs.items() if f > 0)
    if len(used) < 2:
        return {s: 1 for s in used}
    heap = [(freqs[s], i, (s,)) for i, s in enumerate(used)]
    heapq.heapify(heap)
    tick = len(used)
    depth = {s: 0 for s in used}
    while len(heap) > 1:
        fa, _, sa = heapq.heappop(heap)
        fb, _, sb = heapq.heappop(heap)
        for s in sa + sb:
            depth[s] += 1
        tick += 1
        heapq.heappush(heap, (fa + fb, tick, sa + sb))
    if max(depth.values()) <= max_len:
        return depth
    n = len(used)
    flat = max(1, (n - 1).bit_length())
    short = (1 << flat) - n  # this many symbols one bit shorter → complete
    return {
        s: (flat - 1 if i < short and flat > 1 else flat)
        for i, s in enumerate(used)
    }


def _emit_prefix_code(
    bw: _BitWriter, freqs: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Emit a prefix-code declaration; returns symbol → (code, len)."""
    used = sorted(s for s, f in freqs.items() if f > 0)
    if not used:
        used = [0]
    if len(used) <= 2 and max(used) <= 255:
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        if used[0] <= 1 and len(used) == 1:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        return {used[0]: (0, 1), used[1]: (1, 1)}
    depth = _huffman_lengths({s: freqs.get(s, 0) for s in used}, 15)
    lengths = [depth.get(s, 0) for s in range(alphabet_size)]
    # RLE the length sequence with 16 (repeat prev non-zero) / 17 / 18
    tokens: list[tuple[int, int, int]] = []  # (clc symbol, extra, extra bits)
    i = 0
    prev = -1
    while i < alphabet_size:
        ln = lengths[i]
        run = 1
        while i + run < alphabet_size and lengths[i + run] == ln:
            run += 1
        if ln == 0:
            r = run
            while r >= 11:
                take = min(r, 138)
                tokens.append((18, take - 11, 7))
                r -= take
            while r >= 3:
                take = min(r, 10)
                tokens.append((17, take - 3, 3))
                r -= take
            for _ in range(r):
                tokens.append((0, 0, 0))
        else:
            r = run
            if ln != prev:
                tokens.append((ln, 0, 0))
                prev = ln
                r -= 1
            while r >= 3:
                take = min(r, 6)
                tokens.append((16, take - 3, 2))
                r -= take
            for _ in range(r):
                tokens.append((ln, 0, 0))
        if ln:
            prev = ln
        i += run
    # trailing zero runs are implicit via max_symbol? keep explicit: they
    # were already tokenized above (the whole array is walked).
    clc_freq: dict[int, int] = {}
    for sym, _, _ in tokens:
        clc_freq[sym] = clc_freq.get(sym, 0) + 1
    clc_depth = _huffman_lengths(clc_freq, 7)
    if len(clc_depth) == 1:
        # a 1-entry clc decodes 0-bit; give it length 1 anyway (the
        # decoder's single-symbol special case reads no bits)
        clc_depth = {next(iter(clc_depth)): 1}
    clc_lengths = [0] * 19
    for s, ln in clc_depth.items():
        clc_lengths[s] = ln
    num_codes = max(
        4, max(i for i, s in enumerate(_CLC_ORDER) if clc_lengths[s]) + 1
    )
    bw.write(0, 1)  # normal
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(clc_lengths[_CLC_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol shortcut
    clc_codes = _canonical_codes(clc_lengths)
    single_clc = len(clc_depth) == 1
    for sym, extra, ebits in tokens:
        if not single_clc:
            bw.write_code(clc_codes[sym], clc_lengths[sym])
        if ebits:
            bw.write(extra, ebits)
    codes = _canonical_codes(lengths)
    if len(used) == 1:
        # single-symbol normal code (symbol ≥ 256, e.g. a meta group
        # whose only green tokens are backrefs): the DECODER's
        # single-symbol special case reads ZERO bits per occurrence —
        # emit zero bits too, or the streams desync
        return {used[0]: (0, 0)}
    return {s: (codes[s], lengths[s]) for s in used}


def _length_to_prefix(v: int) -> tuple[int, int, int]:
    """value ≥ 1 → (prefix code, extra bits value, extra bit count)."""
    if v <= 4:
        return v - 1, 0, 0
    hi = (v - 1).bit_length() - 1
    rem = v - 1 - (1 << hi)
    if rem < (1 << (hi - 1)):
        return 2 * hi, rem, hi - 1
    return 2 * hi + 1, rem - (1 << (hi - 1)), hi - 1


def _hash_px(px: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)


def _tokenize(
    pix: np.ndarray, w: int, cache_bits: int, use_backrefs: bool
) -> list[tuple]:
    """flat packed ARGB → tokens: ('lit', px) / ('cache', idx) /
    ('ref', length, dist). Backrefs are dist-1 runs (≥3), which
    exercises the plane-code table (dist 1 → plane code 2)."""
    tokens: list[tuple] = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    n = len(pix)
    pos = 0
    while pos < n:
        px = int(pix[pos])
        if use_backrefs and pos > 0 and px == int(pix[pos - 1]):
            run = 1
            while pos + run < n and int(pix[pos + run]) == px and run < 4096:
                run += 1
            if run >= 3:
                tokens.append(("ref", run, 1))
                if cache is not None:
                    cache[_hash_px(px, cache_bits)] = px
                pos += run
                continue
        if cache is not None and cache[_hash_px(px, cache_bits)] == px:
            tokens.append(("cache", _hash_px(px, cache_bits)))
            pos += 1
            continue
        tokens.append(("lit", px))
        if cache is not None:
            cache[_hash_px(px, cache_bits)] = px
        pos += 1
    return tokens


def _emit_entropy_image(
    bw: _BitWriter,
    pix: np.ndarray,
    w: int,
    h: int,
    cache_bits: int = 0,
    use_backrefs: bool = False,
    group_of: "np.ndarray | None" = None,
    n_groups: int = 1,
    level0: bool = False,
    meta: "tuple | None" = None,
) -> None:
    """Emit one entropy-coded image (no transform bits — the caller
    writes those): cache header, the meta-prefix bit (+ recursive
    meta image) when level0, 5 prefix codes per group, pixels.
    group_of maps pixel index → group id matching the meta image."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        if meta is None:
            bw.write(0, 1)
        else:
            mbits, mw, mh, gid = meta
            bw.write(1, 1)
            bw.write(mbits - 2, 3)
            mpix = (np.uint32(0xFF000000) | (gid.astype(np.uint32) << 8)).ravel()
            _emit_entropy_image(bw, mpix, mw, mh)
    tokens = _tokenize(pix, w, cache_bits, use_backrefs)
    # per-group frequency tables
    freqs = [
        [dict() for _ in range(5)] for _ in range(n_groups)
    ]  # green/red/blue/alpha/dist

    def bump(d: dict, s: int) -> None:
        d[s] = d.get(s, 0) + 1

    pos = 0
    for tok in tokens:
        g = int(group_of[pos]) if group_of is not None else 0
        fg = freqs[g]
        if tok[0] == "lit":
            px = tok[1]
            bump(fg[0], (px >> 8) & 0xFF)
            bump(fg[1], (px >> 16) & 0xFF)
            bump(fg[2], px & 0xFF)
            bump(fg[3], (px >> 24) & 0xFF)
            pos += 1
        elif tok[0] == "cache":
            bump(fg[0], 280 + tok[1])
            pos += 1
        else:
            _, length, dist = tok
            lc, _, _ = _length_to_prefix(length)
            bump(fg[0], 256 + lc)
            plane = _dist_to_plane(dist, w)
            dc, _, _ = _length_to_prefix(plane)
            bump(fg[4], dc)
            pos += length
    alpha_sizes = (256 + 24 + ((1 << cache_bits) if cache_bits else 0),
                   256, 256, 256, 40)
    books = [
        [
            _emit_prefix_code(bw, freqs[g][i], alpha_sizes[i])
            for i in range(5)
        ]
        for g in range(n_groups)
    ]
    pos = 0
    for tok in tokens:
        g = int(group_of[pos]) if group_of is not None else 0
        green, red, blue, alpha, dist_b = books[g]
        if tok[0] == "lit":
            px = tok[1]
            c, ln = green[(px >> 8) & 0xFF]
            bw.write_code(c, ln)
            c, ln = red[(px >> 16) & 0xFF]
            bw.write_code(c, ln)
            c, ln = blue[px & 0xFF]
            bw.write_code(c, ln)
            c, ln = alpha[(px >> 24) & 0xFF]
            bw.write_code(c, ln)
            pos += 1
        elif tok[0] == "cache":
            c, ln = green[280 + tok[1]]
            bw.write_code(c, ln)
            pos += 1
        else:
            _, length, dist = tok
            lc, extra, ebits = _length_to_prefix(length)
            c, ln = green[256 + lc]
            bw.write_code(c, ln)
            if ebits:
                bw.write(extra, ebits)
            plane = _dist_to_plane(dist, w)
            dc, extra, ebits = _length_to_prefix(plane)
            c, ln = dist_b[dc]
            bw.write_code(c, ln)
            if ebits:
                bw.write(extra, ebits)
            pos += length


_PLANE_OF: dict[tuple[int, int], int] = {
    dd: i + 1 for i, dd in enumerate(_DIST_TABLE)
}


def _dist_to_plane(dist: int, w: int) -> int:
    """distance → plane code (short 2-D codes when the offset is in
    the neighborhood table, else dist + 120)."""
    for (dx, dy), pc in _PLANE_OF.items():
        if dy * w + dx == dist:
            return pc
    return dist + 120


def _riff_wrap(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# ------------------------------------------------- forward transforms


def _forward_predictor(
    pix: np.ndarray, w: int, h: int, mode_map: np.ndarray, bits: int
) -> np.ndarray:
    ch = _argb_channels(pix).reshape(h, w, 4)
    res = np.zeros_like(ch)
    for y in range(h):
        mrow = mode_map[y >> bits]
        for x in range(w):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = ch[0, x - 1]
            elif x == 0:
                pred = ch[y - 1, 0]
            else:
                L, T, TL = ch[y, x - 1], ch[y - 1, x], ch[y - 1, x - 1]
                TR = ch[y - 1, x + 1] if x + 1 < w else ch[y, 0]
                pred = _predict(int(mrow[x >> bits]), L, T, TL, TR)
            for c in range(4):
                res[y, x, c] = (int(ch[y, x, c]) - int(pred[c])) & 0xFF
    return _pack_argb(res.reshape(-1, 4))


def _forward_color(
    pix: np.ndarray, w: int, h: int, elems: np.ndarray, bits: int
) -> np.ndarray:
    ch = _argb_channels(pix).reshape(h, w, 4)
    for y in range(h):
        erow = elems[y >> bits]
        for x in range(w):
            g2r, g2b, r2b = erow[x >> bits]
            g = int(ch[y, x, 2])
            r = int(ch[y, x, 1])
            ch[y, x, 1] = (r - _ct_delta(int(g2r), g)) & 0xFF
            ch[y, x, 3] = (
                int(ch[y, x, 3]) - _ct_delta(int(g2b), g)
                - _ct_delta(int(r2b), r)
            ) & 0xFF
    return _pack_argb(ch.reshape(-1, 4))


# ------------------------------------------------------------- encoder

# Bit offset (within the VP8L payload) of the first pixel code in the
# `plain=True` profile. Constant by construction: the plain header is
# byte-for-byte fixed apart from the 14-bit dimension fields, which are
# fixed-WIDTH. q_webp_decode's oracle and the fixture test both pin it.
WEBP_PLAIN_PIXEL_BIT_OFFSET = 293


def _encode_plain_grey(g: np.ndarray) -> bytes:
    """Grey (h, w) uint8 → constrained VP8L: SUBTRACT_GREEN + a fixed
    8-symbol-bit green code (all 256 literal lengths = 8, so the
    canonical code of value v IS v, read MSB-first) + 0-bit
    red/blue/alpha/distance codes. Pixel k's 8 bits sit at payload bit
    WEBP_PLAIN_PIXEL_BIT_OFFSET + 8k — the arithmetic the DuckDB
    oracle replays from hex."""
    h, w = g.shape
    if not (0 < w <= 1 << 14 and 0 < h <= 1 << 14):
        raise ValueError("plain profile dimension out of range")
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    bw.write(1, 1)
    bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta-prefix image
    # green code (normal): literals 0..255 all length 8, 256..279 zero
    bw.write(0, 1)  # not simple
    bw.write(8, 4)  # num_code_lengths = 12 (covers clc symbols 8/16/18)
    clc = {8: 1, 16: 2, 18: 2}
    for i in range(12):
        bw.write(clc.get(_CLC_ORDER[i], 0), 3)
    bw.write(0, 1)  # no max_symbol shortcut
    bw.write_code(0, 1)  # literal "8"            (1 symbol assigned)
    for _ in range(42):
        bw.write_code(2, 2)  # "16" repeat prev
        bw.write(3, 2)  # x6                      (+252)
    bw.write_code(2, 2)
    bw.write(0, 2)  # x3                          (+3 → 256)
    bw.write_code(3, 2)  # "18"
    bw.write(13, 7)  # 24 zeros                   (→ 280, done)
    for sym, wide in ((0, False), (0, False), (255, True), (0, False)):
        bw.write(1, 1)  # simple, 1 symbol: red/blue=0, alpha=255, dist=0
        bw.write(0, 1)
        bw.write(1 if wide else 0, 1)
        bw.write(sym, 8 if wide else 1)
    if bw.bitpos != WEBP_PLAIN_PIXEL_BIT_OFFSET:
        raise AssertionError(
            f"plain header drifted: {bw.bitpos} != {WEBP_PLAIN_PIXEL_BIT_OFFSET}"
        )
    for v in g.ravel().tolist():
        bw.write_code(int(v), 8)
    return _riff_wrap(bw.bytes())


def encode_webp_lossless(
    mat: np.ndarray,
    *,
    subtract_green: bool = False,
    palette: bool = False,
    predictor_bits: int | None = None,
    color_bits: int | None = None,
    cache_bits: int = 0,
    use_backrefs: bool = False,
    meta_bits: int | None = None,
    plain: bool = False,
) -> bytes:
    """(h, w[, 3|4]) uint8 → lossless WebP bytes — exact:
    decode_webp(encode_webp_lossless(m)) reproduces m bit-for-bit.

    Transform/feature flags exist to pin each decode path in
    round-trip tests; `plain=True` (grey input only) writes the
    fixed-offset oracle profile. Predictor/cross-color block
    parameters are chosen deterministically per block so the forward
    transform is reproducible."""
    arr = np.ascontiguousarray(mat)
    if arr.dtype != np.uint8:
        raise ValueError(f"WebP encoder takes uint8 samples, got {arr.dtype}")
    if plain:
        if arr.ndim != 2:
            raise ValueError("plain profile is grey (h, w) only")
        return _encode_plain_grey(arr)
    if arr.ndim == 2:
        arr = np.stack([arr, arr, arr, np.full_like(arr, 255)], axis=-1)
    elif arr.shape[2] == 3:
        arr = np.concatenate(
            [arr, np.full(arr.shape[:2] + (1,), 255, np.uint8)], axis=2
        )
    h, w, _ = arr.shape
    if not (0 < w <= 1 << 14 and 0 < h <= 1 << 14):
        raise ValueError("dimension out of VP8L range")
    a32 = arr.astype(np.uint32)
    pix = (
        (a32[..., 3] << 24) | (a32[..., 0] << 16)
        | (a32[..., 1] << 8) | a32[..., 2]
    ).ravel()
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if bool(np.any(arr[..., 3] != 255)) else 0, 1)
    bw.write(0, 3)
    cur_w = w
    if palette:
        colors = np.unique(pix)
        if len(colors) > 256:
            raise ValueError("palette transform needs ≤256 distinct colors")
        lookup = {int(c): i for i, c in enumerate(colors.tolist())}
        nc = len(colors)
        pbits = 3 if nc <= 2 else 2 if nc <= 4 else 1 if nc <= 16 else 0
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(nc - 1, 8)
        pc = _argb_channels(colors.astype(np.uint32))
        deltas = np.empty_like(pc)
        deltas[0] = pc[0]
        deltas[1:] = (pc[1:] - pc[:-1]) & 0xFF
        _emit_entropy_image(bw, _pack_argb(deltas), nc, 1)
        idx = np.array(
            [lookup[int(p)] for p in pix.tolist()], np.uint32
        ).reshape(h, w)
        if pbits:
            ppp, bpp = 1 << pbits, 8 >> pbits
            pw = _sub_size(w, pbits)
            bundled = np.zeros((h, pw), np.uint32)
            for x in range(w):
                bundled[:, x >> pbits] |= idx[:, x] << ((x % ppp) * bpp)
        else:
            pw, bundled = w, idx
        pix = (np.uint32(0xFF000000) | (bundled.astype(np.uint32) << 8)).ravel()
        cur_w = pw
    if predictor_bits is not None:
        tb = predictor_bits
        if not 2 <= tb <= 9:
            raise ValueError("predictor bits out of range")
        tw, th = _sub_size(cur_w, tb), _sub_size(h, tb)
        by, bx = np.mgrid[0:th, 0:tw]
        mode_map = ((bx * 5 + by * 3) % 14).astype(np.int64)
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(tb - 2, 3)
        tpix = (np.uint32(0xFF000000) | (mode_map.astype(np.uint32) << 8)).ravel()
        _emit_entropy_image(bw, tpix, tw, th)
        pix = _forward_predictor(pix, cur_w, h, mode_map, tb)
    if color_bits is not None:
        tb = color_bits
        if not 2 <= tb <= 9:
            raise ValueError("color-transform bits out of range")
        tw, th = _sub_size(cur_w, tb), _sub_size(h, tb)
        by, bx = np.mgrid[0:th, 0:tw]
        elems = np.stack(  # (g2r, g2b, r2b), deterministic per block
            [
                (bx * 7 + by * 3 + 1) % 256,
                (bx * 11 + by * 5 + 2) % 256,
                (bx * 13 + by * 9 + 3) % 256,
            ],
            axis=-1,
        ).astype(np.int64)
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(tb - 2, 3)
        tpix = (
            np.uint32(0xFF000000)
            | (elems[..., 2].astype(np.uint32) << 16)  # r2b in red
            | (elems[..., 1].astype(np.uint32) << 8)  # g2b in green
            | elems[..., 0].astype(np.uint32)  # g2r in blue
        ).ravel()
        _emit_entropy_image(bw, tpix, tw, th)
        pix = _forward_color(pix, cur_w, h, elems, tb)
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        ch = _argb_channels(pix)
        ch[:, 1] = (ch[:, 1] - ch[:, 2]) & 0xFF
        ch[:, 3] = (ch[:, 3] - ch[:, 2]) & 0xFF
        pix = _pack_argb(ch)
    bw.write(0, 1)  # end of transforms
    group_of = None
    n_groups = 1
    meta_emit = None
    if meta_bits is not None:
        if not 2 <= meta_bits <= 9:
            raise ValueError("meta bits out of range")
        mw, mh = _sub_size(cur_w, meta_bits), _sub_size(h, meta_bits)
        gy, gx = np.mgrid[0:mh, 0:mw]
        gid = ((gx + gy) % 2).astype(np.int64)
        n_groups = 2
        ys, xs = np.mgrid[0:h, 0:cur_w]
        group_of = gid[ys >> meta_bits, xs >> meta_bits].ravel()
        meta_emit = (meta_bits, mw, mh, gid)
    _emit_entropy_image(
        bw, pix, cur_w, h, cache_bits, use_backrefs,
        group_of=group_of, n_groups=n_groups, level0=True, meta=meta_emit,
    )
    return _riff_wrap(bw.bytes())
