"""Pure-stdlib VP8L (lossless WebP) codec — the decode kernel that
ungates the `RIFF....WEBP` branch of functions/imagecodec.decode_image.

Like the PNG and baseline-JPEG kernels, this exists because the
container ships no Pillow/libwebp and a silent fake would poison
training features. VP8L is a fully lossless format built from LSB-first
bit packing, canonical prefix (Huffman) codes, LZ77 backward references
with a 2-D distance mapping, an LRU-less color cache, an optional
meta-prefix (entropy) image, and four reversible transforms
(predictor, color, subtract-green, color-indexing) — all implementable
with zero dependencies. Transcribed from the public VP8L bitstream
specification (RFC 9649); no reference-repo code involved (the
reference delegates media decode to client libraries).

Decoder: the complete feature surface above — every transform, the
color cache, meta-prefix groups, and both simple and code-length-coded
prefix trees. Encoder: a correct, deliberately simple subset used to
synthesize REAL certifiable fixtures — literal coding with fixed
complete prefix codes, optional subtract-green, optional per-row LZ77
backrefs (exercising the 2-D distance map), optional color cache, an
optional whole-image predictor, an optional whole-image color
transform (cross-channel deltas), and optional palette
(color-indexing) emission with sub-byte bundling; the meta-prefix
group-routing path is exercised by a hand-assembled stream in tests. decode(encode(img)) is bit-exact (the
format is lossless), which is what the SQL-oracle certification
replays.

Lossy (VP8) WebP remains gated by name: a DCT+loop-filter pipeline
without a codec library is out of scope, exactly like non-baseline
JPEG.

Scale note: runs INSIDE Arrow-batched mapInPandas workers
(functions/multimodal.py); per-thumbnail pure-Python cost is dwarfed by
payload I/O at 100 TB.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence, Tuple

# ---------------------------------------------------------------- bits

class _BitReader:
    """LSB-first bit reader (VP8L convention)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bit = pos * 8

    def read(self, n: int) -> int:
        v = 0
        d, b = self.data, self.bit
        for i in range(n):
            byte = d[(b + i) >> 3]
            v |= ((byte >> ((b + i) & 7)) & 1) << i
        self.bit = b + n
        return v

    def read_bit(self) -> int:
        b = self.bit
        bit = (self.data[b >> 3] >> (b & 7)) & 1
        self.bit = b + 1
        return bit


class _BitWriter:
    """LSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes are consumed MSB-of-code-first (DEFLATE style)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self.out)
        if self.n:
            out += bytes([self.acc & 0xFF])
        return out


# ------------------------------------------------------------- huffman

def _canonical_codes(lengths: Sequence[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length), canonical (DEFLATE) assignment."""
    pairs = sorted(
        (l, s) for s, l in enumerate(lengths) if l > 0
    )
    codes: Dict[int, Tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


def _assert_complete(lengths: Sequence[int]) -> None:
    kraft = sum(2 ** -l for l in lengths if l > 0)
    if abs(kraft - 1.0) > 1e-12:
        raise ValueError(f"incomplete prefix code (kraft={kraft})")


class _Tree:
    """Decode structure: (length, code) -> symbol, read bit by bit."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: Sequence[int] = (), single: int = None):
        self.single = single
        if single is None:
            _assert_complete(lengths)
            self.table = {
                (l, c): s for s, (c, l) in _canonical_codes(lengths).items()
            }
        else:
            self.table = {}

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        t = self.table
        while True:
            code = (code << 1) | br.read_bit()
            length += 1
            s = t.get((length, code))
            if s is not None:
                return s
            if length > 15:
                raise ValueError("corrupt VP8L: bad prefix code")


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)


def _read_tree(br: _BitReader, alphabet: int) -> _Tree:
    if br.read_bit():  # simple code
        nsym = br.read_bit() + 1
        if br.read_bit():
            s0 = br.read(8)
        else:
            s0 = br.read_bit()
        if nsym == 1:
            return _Tree(single=s0)
        s1 = br.read(8)
        lengths = [0] * alphabet
        lengths[s0] = 1
        lengths[s1] = 1
        # canonical: smaller SYMBOL of equal lengths gets code 0 — but
        # VP8L simple codes assign code 0 to the FIRST transmitted
        # symbol; encode that directly
        t = _Tree.__new__(_Tree)
        t.single = None
        t.table = {(1, 0): s0, (1, 1): s1}
        return t
    nclen = 4 + br.read(4)
    cl_lens = [0] * 19
    for i in range(nclen):
        cl_lens[_CL_ORDER[i]] = br.read(3)
    cl_tree = _Tree(cl_lens)
    if br.read_bit():
        nbits = 2 + 2 * br.read(3)
        max_ops = 2 + br.read(nbits)
    else:
        max_ops = alphabet
    lens = [0] * alphabet
    sym = 0
    prev = 8  # spec: code 16 before any literal repeats 8
    while sym < alphabet:
        if max_ops == 0:
            break
        max_ops -= 1
        cl = cl_tree.read(br)
        if cl < 16:
            lens[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym < alphabet:
                    lens[sym] = prev
                    sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    return _Tree(lens)


# --------------------------------------------------- prefix (LZ77) code

def _prefix_decode(br: _BitReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(v: int) -> Tuple[int, int, int]:
    """value -> (code, n_extra_bits, extra_value)."""
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    hb = x.bit_length() - 1
    if x < (3 << (hb - 1)):
        return 2 * hb, hb - 1, x - (2 << (hb - 1))
    return 2 * hb + 1, hb - 1, x - (3 << (hb - 1))


# 2-D distance mapping (RFC 9649 §5.2.2): codes 1..120 address a local
# neighborhood; codes >120 are plain distances offset by 120.
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (6, 5), (-6, 5), (5, 6), (-5, 6),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (8, 3), (-8, 3), (5, 7), (-5, 7), (7, 5),
    (-7, 5), (8, 4), (3, 8), (-3, 8), (8, 5), (4, 8), (-4, 8), (8, 6),
]
assert len(_DIST_MAP) == 120


def _map_distance(dcode: int, xsize: int) -> int:
    if dcode > 120:
        return dcode - 120
    dx, dy = _DIST_MAP[dcode - 1]
    return max(1, dy * xsize + dx)


def _dist_to_code(dist: int, xsize: int) -> int:
    """Smallest dist-code for `dist` (2-D entry if one matches)."""
    for i, (dx, dy) in enumerate(_DIST_MAP):
        if dy * xsize + dx == dist and dist >= 1:
            return i + 1
    return dist + 120


# ------------------------------------------------------------ channels

def _a(p): return (p >> 24) & 0xFF
def _r(p): return (p >> 16) & 0xFF
def _g(p): return (p >> 8) & 0xFF
def _b(p): return p & 0xFF


def _argb(a, r, g, b):
    return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)


def _add_px(p, q):
    """Per-channel modular sum (predictor residual application)."""
    return _argb(_a(p) + _a(q), _r(p) + _r(q), _g(p) + _g(q), _b(p) + _b(q))


def _sub_px(p, q):
    return _argb(_a(p) - _a(q), _r(p) - _r(q), _g(p) - _g(q), _b(p) - _b(q))


def _avg2(p, q):
    return _argb(
        (_a(p) + _a(q)) >> 1, (_r(p) + _r(q)) >> 1,
        (_g(p) + _g(q)) >> 1, (_b(p) + _b(q)) >> 1,
    )


def _clamp(v):
    return 0 if v < 0 else 255 if v > 255 else v


def _clamp_add_sub_full(l, t, tl):
    return _argb(
        _clamp(_a(l) + _a(t) - _a(tl)), _clamp(_r(l) + _r(t) - _r(tl)),
        _clamp(_g(l) + _g(t) - _g(tl)), _clamp(_b(l) + _b(t) - _b(tl)),
    )


def _clamp_add_sub_half(ave, tl):
    def one(av, c):
        d = av - c
        # C integer division truncates toward zero
        h = d // 2 if d >= 0 else -((-d) // 2)
        return _clamp(av + h)
    return _argb(
        one(_a(ave), _a(tl)), one(_r(ave), _r(tl)),
        one(_g(ave), _g(tl)), one(_b(ave), _b(tl)),
    )


def _select(l, t, tl):
    p_a = _a(l) + _a(t) - _a(tl)
    p_r = _r(l) + _r(t) - _r(tl)
    p_g = _g(l) + _g(t) - _g(tl)
    p_b = _b(l) + _b(t) - _b(tl)
    pl = abs(p_a - _a(l)) + abs(p_r - _r(l)) + abs(p_g - _g(l)) + abs(p_b - _b(l))
    pt = abs(p_a - _a(t)) + abs(p_r - _r(t)) + abs(p_g - _g(t)) + abs(p_b - _b(t))
    return l if pl < pt else t


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(l, t), tl)
    raise ValueError(f"corrupt VP8L: predictor mode {mode}")


def _ct_delta(t: int, c: int) -> int:
    """Color-transform delta: (int8)t * (int8)c >> 5 (arithmetic)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


# ------------------------------------------------------------ decoding

def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _read_pixels(
    br: _BitReader,
    xsize: int,
    ysize: int,
    groups: List[Tuple[_Tree, _Tree, _Tree, _Tree, _Tree]],
    meta: Optional[List[int]],
    meta_bits: int,
    cache_bits: int,
) -> List[int]:
    cache = [0] * (1 << cache_bits) if cache_bits else None
    mxs = _subsample(xsize, meta_bits) if meta is not None else 0
    total = xsize * ysize
    pix: List[int] = [0] * total
    pos = 0
    gi = 0
    while pos < total:
        if meta is not None:
            x = pos % xsize
            y = pos // xsize
            gi = meta[(y >> meta_bits) * mxs + (x >> meta_bits)]
        gt, rt, bt, at, dt = groups[gi]
        s = gt.read(br)
        if s < 256:
            g = s
            r = rt.read(br)
            b = bt.read(br)
            a = at.read(br)
            p = _argb(a, r, g, b)
            pix[pos] = p
            if cache is not None:
                cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)] = p
            pos += 1
        elif s < 280:
            length = _prefix_decode(br, s - 256)
            dcode = _prefix_decode(br, dt.read(br))
            dist = _map_distance(dcode, xsize)
            if dist > pos or pos + length > total:
                raise ValueError("corrupt VP8L: backref out of range")
            for _ in range(length):
                p = pix[pos - dist]
                pix[pos] = p
                if cache is not None:
                    cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)] = p
                pos += 1
        else:
            if cache is None:
                raise ValueError("corrupt VP8L: cache symbol without cache")
            pix[pos] = cache[s - 280]
            pos += 1
    return pix


def _read_image_stream(
    br: _BitReader, xsize: int, ysize: int, is_main: bool
) -> List[int]:
    """Spatially-coded image (is_main) or entropy-coded subimage."""
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_main and br.read_bit():
        meta_bits = 2 + br.read(3)
        meta_px = _read_image_stream(
            br, _subsample(xsize, meta_bits), _subsample(ysize, meta_bits), False
        )
        meta = [((p >> 8) & 0xFFFF) for p in meta_px]  # (r<<8)|g
        n_groups = max(meta) + 1
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"corrupt VP8L: cache_bits {cache_bits}")
    groups = []
    for _ in range(n_groups):
        gt = _read_tree(br, 256 + 24 + (1 << cache_bits if cache_bits else 0))
        rt = _read_tree(br, 256)
        bt = _read_tree(br, 256)
        at = _read_tree(br, 256)
        dt = _read_tree(br, 40)
        groups.append((gt, rt, bt, at, dt))
    return _read_pixels(br, xsize, ysize, groups, meta, meta_bits, cache_bits)


def _inv_predictor(pix, xsize, ysize, bits, modes_px):
    mxs = _subsample(xsize, bits)
    out = pix
    for y in range(ysize):
        for x in range(xsize):
            i = y * xsize + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = out[i - 1]
            elif x == 0:
                pred = out[i - xsize]
            else:
                mode = _g(modes_px[(y >> bits) * mxs + (x >> bits)])
                l = out[i - 1]
                t = out[i - xsize]
                tl = out[i - xsize - 1]
                # top-right = out[i - xsize + 1] even at the right edge:
                # in the contiguous raster that index is the CURRENT
                # row's first (already reconstructed) pixel, which is
                # exactly libwebp's upper[x+1] behavior
                tr = out[i - xsize + 1]
                pred = _predict(mode, l, t, tl, tr)
            out[i] = _add_px(out[i], pred)
    return out


def _inv_color_transform(pix, xsize, ysize, bits, cte_px):
    mxs = _subsample(xsize, bits)
    for y in range(ysize):
        for x in range(xsize):
            i = y * xsize + x
            cte = cte_px[(y >> bits) * mxs + (x >> bits)]
            g2r = _b(cte)
            g2b = _g(cte)
            r2b = _r(cte)
            p = pix[i]
            g = _g(p)
            r = (_r(p) + _ct_delta(g2r, g)) & 0xFF
            b = (_b(p) + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            pix[i] = _argb(_a(p), r, g, b)
    return pix


def _inv_subtract_green(pix):
    for i, p in enumerate(pix):
        g = _g(p)
        pix[i] = _argb(_a(p), _r(p) + g, g, _b(p) + g)
    return pix


def _inv_color_index(pix, xsize, ysize, palette, width_bits):
    n = len(palette)
    if width_bits == 0:
        out = []
        for p in pix:
            idx = _g(p)
            out.append(palette[idx] if idx < n else 0)
        return out, xsize
    # sub-byte bundling: packed green bytes carry 1<<width_bits indices
    per = 1 << width_bits
    ibits = 8 >> width_bits
    packed_xs = _subsample(xsize, width_bits)
    out = [0] * (xsize * ysize)
    mask = (1 << ibits) - 1
    for y in range(ysize):
        for px_ in range(packed_xs):
            v = _g(pix[y * packed_xs + px_])
            for k in range(per):
                x = px_ * per + k
                if x >= xsize:
                    break
                idx = (v >> (k * ibits)) & mask
                out[y * xsize + x] = palette[idx] if idx < n else 0
    return out, xsize


def webp_decode(payload: bytes) -> Tuple[int, int, int, bytes]:
    """Decode a lossless (VP8L) WebP. Returns (w, h, 4, RGBA bytes).
    Lossy VP8 and extended VP8X containers raise by name."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("corrupt WebP: bad RIFF container")
    fourcc = payload[12:16]
    if fourcc == b"VP8 ":
        raise NotImplementedError("lossy (VP8) WebP requires a codec library")
    if fourcc == b"VP8X":
        raise NotImplementedError("extended (VP8X) WebP not supported")
    if fourcc != b"VP8L":
        raise ValueError(f"corrupt WebP: unknown chunk {fourcc!r}")
    size = struct.unpack("<I", payload[16:20])[0]
    data = payload[20 : 20 + size]
    if not data or data[0] != 0x2F:
        raise ValueError("corrupt VP8L: bad signature byte")
    br = _BitReader(data, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("corrupt VP8L: bad version")

    # transforms (each at most once, order matters for inversion)
    transforms = []
    xsize = w
    seen = set()
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("corrupt VP8L: repeated transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            bits = 2 + br.read(3)
            sub = _read_image_stream(
                br, _subsample(xsize, bits), _subsample(h, bits), False
            )
            transforms.append(("pred", bits, sub))
        elif ttype == 1:  # color transform
            bits = 2 + br.read(3)
            sub = _read_image_stream(
                br, _subsample(xsize, bits), _subsample(h, bits), False
            )
            transforms.append(("color", bits, sub))
        elif ttype == 2:  # subtract green
            transforms.append(("subgreen", 0, None))
        else:  # color indexing
            n = br.read(8) + 1
            pal_delta = _read_image_stream(br, n, 1, False)
            palette = []
            prev = 0
            for p in pal_delta:
                prev = _add_px(prev, p)
                palette.append(prev)
            width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
            transforms.append(("palette", width_bits, palette))
            xsize = _subsample(xsize, width_bits)

    pix = _read_image_stream(br, xsize, h, True)

    for kind, bits, aux in reversed(transforms):
        if kind == "palette":
            pix, xsize = _inv_color_index(pix, w, h, aux, bits)
        elif kind == "subgreen":
            pix = _inv_subtract_green(pix)
        elif kind == "pred":
            pix = _inv_predictor(pix, xsize, h, bits, aux)
        elif kind == "color":
            pix = _inv_color_transform(pix, xsize, h, bits, aux)

    out = bytearray(w * h * 4)
    for i, p in enumerate(pix):
        out[4 * i] = _r(p)
        out[4 * i + 1] = _g(p)
        out[4 * i + 2] = _b(p)
        out[4 * i + 3] = _a(p)
    return w, h, 4, bytes(out)


# ------------------------------------------------------------ encoding
#
# A deliberately simple, provably complete-code encoder: fixed prefix
# lengths chosen so the Kraft sum is exactly 1 (asserted), literal
# coding by default, with optional subtract-green / whole-image
# predictor / per-row backrefs / color cache / palette to exercise the
# decoder's full surface in round-trip tests.

def _rle_code_lengths(lengths: Sequence[int]):
    """lengths -> [(cl_sym, n_extra_bits, extra_val), ...] ops."""
    ops = []
    i = 0
    n = len(lengths)
    while i < n:
        v = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == v:
            run += 1
        if v == 0:
            left = run
            while left >= 11:
                take = min(left, 138)
                ops.append((18, 7, take - 11))
                left -= take
            while left >= 3:
                take = min(left, 10)
                ops.append((17, 3, take - 3))
                left -= take
            ops.extend((0, 0, 0) for _ in range(left))
        else:
            ops.append((v, 0, 0))
            left = run - 1
            while left >= 3:
                take = min(left, 6)
                ops.append((16, 2, take - 3))
                left -= take
            ops.extend((v, 0, 0) for _ in range(left))
        i += run
    # drop trailing zero ops: max_symbol cuts them off implicitly
    while ops and ops[-1][0] in (0, 17, 18):
        ops.pop()
    return ops


def _balanced_lengths(symbols: Sequence[int], size: int = 19) -> List[int]:
    """Complete prefix code over `symbols`: 2^L - k codes of length
    L-1, the rest length L (Kraft exactly 1); single symbol -> pad."""
    syms = sorted(set(symbols))
    if len(syms) == 1:
        syms.append((syms[0] + 1) % size)
    k = len(syms)
    L = max(1, (k - 1).bit_length())
    n_short = (1 << L) - k
    out = [0] * size
    for j, s in enumerate(syms):
        out[s] = L - 1 if j < n_short and L > 1 else L
    return out


def _write_code_lengths(bw: _BitWriter, lengths: Sequence[int]) -> None:
    """Normal (code-length-coded) tree emission."""
    bw.write(0, 1)  # not simple
    ops = _rle_code_lengths(lengths)
    # decoder computes max_ops = 2 + read(nbits): pad to >= 2 ops with
    # harmless explicit zero lengths (must happen BEFORE the CL tree is
    # sized so symbol 0 gets a code)
    while len(ops) < 2:
        ops.append((0, 0, 0))
    cl_lens = _balanced_lengths([op[0] for op in ops])
    _assert_complete(cl_lens)
    # cover every used symbol's position in the fixed transmission order
    last = max(i for i, s in enumerate(_CL_ORDER) if cl_lens[s] > 0)
    nclen = max(4, last + 1)
    bw.write(nclen - 4, 4)
    for i in range(nclen):
        bw.write(cl_lens[_CL_ORDER[i]], 3)
    # bound the number of ops explicitly (trailing zeros implicit)
    n_ops = len(ops)
    k = 0
    while ((1 << (2 + 2 * k)) - 1) < n_ops - 2:
        k += 1
    bw.write(1, 1)  # use max_symbol
    bw.write(k, 3)
    bw.write(n_ops - 2, 2 + 2 * k)
    cl_codes = _canonical_codes(cl_lens)
    for sym, nb, ev in ops:
        code, ln = cl_codes[sym]
        bw.write_code(code, ln)
        if nb:
            bw.write(ev, nb)


def _write_tree(bw: _BitWriter, lengths: Sequence[int]) -> Dict[int, Tuple[int, int]]:
    used = [s for s, l in enumerate(lengths) if l > 0]
    if len(used) == 1 and used[0] <= 255:
        s0 = used[0]
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if s0 <= 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(s0, 1)
        else:
            bw.write(1, 1)  # 8-bit first symbol
            bw.write(s0, 8)
        return {s0: (0, 0)}
    _write_code_lengths(bw, lengths)
    return _canonical_codes(lengths)


def _g_tree_lengths(cache_bits: int) -> List[int]:
    """Green+length(+cache) alphabet with Kraft exactly 1."""
    if cache_bits == 0:
        lens = [10] * 256 + [4] * 8 + [5] * 8 + [0] * 8
    else:
        lens = (
            [10] * 256 + [4] * 8 + [6] * 8 + [0] * 8
            + [cache_bits + 3] * (1 << cache_bits)
        )
    _assert_complete(lens)
    return lens


def _encode_image_stream(
    bw: _BitWriter,
    pix: Sequence[int],
    xsize: int,
    ysize: int,
    is_main: bool,
    cache_bits: int = 0,
    backref_rows: bool = False,
) -> None:
    if is_main:
        bw.write(0, 1)  # no meta-prefix image
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    g_lens = _g_tree_lengths(cache_bits)
    byte_lens = [8] * 256
    if backref_rows:
        d_lens = [5] * 24 + [6] * 16
    else:
        d_lens = [0] * 40
        d_lens[0] = 1  # single-symbol simple tree handles this
    g_codes = _write_tree(bw, g_lens)
    r_codes = _write_tree(bw, byte_lens)
    b_codes = _write_tree(bw, byte_lens)
    a_codes = _write_tree(bw, byte_lens)
    if backref_rows:
        d_codes = _write_tree(bw, d_lens)
    else:
        # simple single-symbol distance tree (never read)
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        d_codes = {0: (0, 0)}

    cache = [0] * (1 << cache_bits) if cache_bits else None

    def emit_code(codes, sym):
        c, ln = codes[sym]
        bw.write_code(c, ln)

    pos = 0
    total = xsize * ysize
    while pos < total:
        y, x = divmod(pos, xsize)
        if (
            backref_rows
            and x == 0
            and y > 0
            and xsize >= 1
            and pix[pos : pos + xsize] == pix[pos - xsize : pos]
        ):
            lcode, lnb, lev = _prefix_encode(xsize)
            emit_code(g_codes, 256 + lcode)
            if lnb:
                bw.write(lev, lnb)
            dcode = _dist_to_code(xsize, xsize)
            pc, pnb, pev = _prefix_encode(dcode)
            emit_code(d_codes, pc)
            if pnb:
                bw.write(pev, pnb)
            if cache is not None:
                for p in pix[pos : pos + xsize]:
                    cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)] = p
            pos += xsize
            continue
        p = pix[pos]
        if cache is not None:
            slot = (0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[slot] == p and pos > 0:
                emit_code(g_codes, 280 + slot)
                pos += 1
                continue
            cache[slot] = p
        emit_code(g_codes, _g(p))
        emit_code(r_codes, _r(p))
        emit_code(b_codes, _b(p))
        emit_code(a_codes, _a(p))
        pos += 1


def _fwd_predictor(pix: List[int], xsize: int, ysize: int, mode: int) -> List[int]:
    """Whole-image forward predictor: residual = pixel - pred(orig)."""
    out = [0] * len(pix)
    for y in range(ysize):
        for x in range(xsize):
            i = y * xsize + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]
            elif x == 0:
                pred = pix[i - xsize]
            else:
                pred = _predict(
                    mode, pix[i - 1], pix[i - xsize], pix[i - xsize - 1],
                    pix[i - xsize + 1],
                )
            out[i] = _sub_px(pix[i], pred)
    return out


def webp_encode(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    subtract_green: bool = False,
    predictor: Optional[int] = None,
    backref_rows: bool = False,
    cache_bits: int = 0,
    palette: bool = False,
    color_transform: Optional[Tuple[int, int, int]] = None,
) -> bytes:
    """Encode to lossless WebP (VP8L). Exact: decode(encode(x)) == x.
    channels: 1 (gray), 3 (RGB) or 4 (RGBA). color_transform applies a
    whole-image (green_to_red, green_to_blue, red_to_blue) element
    (signed -128..127 each), exercising the decoder's cross-channel
    delta inversion."""
    if channels not in (1, 3, 4):
        raise ValueError(f"unsupported channel count {channels}")
    if width > 16384 or height > 16384:
        raise ValueError("VP8L dimensions exceed 14-bit limit")
    pix = []
    for i in range(width * height):
        if channels == 1:
            v = pixels[i]
            pix.append(_argb(255, v, v, v))
        elif channels == 3:
            r, g, b = pixels[3 * i : 3 * i + 3]
            pix.append(_argb(255, r, g, b))
        else:
            r, g, b, a = pixels[4 * i : 4 * i + 4]
            pix.append(_argb(a, r, g, b))

    bw = _BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if channels == 4 else 0, 1)
    bw.write(0, 3)  # version

    xsize = width
    if palette:
        if subtract_green or predictor is not None:
            raise ValueError("palette mode composes with no other transform")
        pal = sorted(set(pix))
        if len(pal) > 256:
            raise ValueError("palette mode requires <= 256 distinct colors")
        lut = {p: i for i, p in enumerate(pal)}
        n = len(pal)
        bw.write(1, 1)
        bw.write(3, 2)  # color indexing
        bw.write(n - 1, 8)
        deltas = [pal[0]] + [_sub_px(pal[i], pal[i - 1]) for i in range(1, n)]
        _encode_image_stream(bw, deltas, n, 1, False)
        width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        if width_bits == 0:
            pix = [_argb(255, 0, lut[p], 0) for p in pix]
        else:
            per = 1 << width_bits
            ibits = 8 >> width_bits
            packed_xs = _subsample(width, width_bits)
            packed = []
            for y in range(height):
                for bx in range(packed_xs):
                    v = 0
                    for k in range(per):
                        x = bx * per + k
                        if x < width:
                            v |= lut[pix[y * width + x]] << (k * ibits)
                    packed.append(_argb(255, 0, v, 0))
            pix = packed
            xsize = packed_xs
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
            pix = [
                _argb(_a(p), _r(p) - _g(p), _g(p), _b(p) - _g(p)) for p in pix
            ]
        if color_transform is not None:
            g2r, g2b, r2b = (int(v) & 0xFF for v in color_transform)
            size_bits = 7
            if max(width, height) > (1 << (size_bits + 2)):
                raise ValueError("image too large for single-block cte")
            bw.write(1, 1)
            bw.write(1, 2)  # color transform
            bw.write(size_bits - 2, 3)
            sub_x = _subsample(xsize, size_bits)
            sub_y = _subsample(height, size_bits)
            cte = _argb(255, r2b, g2b, g2r)
            _encode_image_stream(bw, [cte] * (sub_x * sub_y), sub_x, sub_y, False)
            # forward: subtract the deltas the decoder will add back;
            # b' uses the ORIGINAL r (== the final decoded r)
            pix = [
                _argb(
                    _a(p),
                    _r(p) - _ct_delta(g2r, _g(p)),
                    _g(p),
                    _b(p) - _ct_delta(g2b, _g(p)) - _ct_delta(r2b, _r(p)),
                )
                for p in pix
            ]
        if predictor is not None:
            if not (0 <= predictor <= 13):
                raise ValueError(f"bad predictor mode {predictor}")
            size_bits = 7  # 512-px blocks: one mode block covers the image
            if max(width, height) > (1 << (size_bits + 2)):
                raise ValueError("image too large for single-block predictor")
            bw.write(1, 1)
            bw.write(0, 2)
            bw.write(size_bits - 2, 3)
            sub_x = _subsample(xsize, size_bits)
            sub_y = _subsample(height, size_bits)
            modes = [_argb(255, 0, predictor, 0)] * (sub_x * sub_y)
            _encode_image_stream(bw, modes, sub_x, sub_y, False)
            pix = _fwd_predictor(pix, xsize, height, predictor)

    bw.write(0, 1)  # no more transforms
    _encode_image_stream(
        bw, pix, xsize, height, True,
        cache_bits=cache_bits, backref_rows=backref_rows,
    )
    data = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
