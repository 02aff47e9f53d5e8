"""Pure-Python scanline EXR reader (fallback + independent cross-check).

Supports what the BMFR datasets need: single-part scanline files, NONE /
RLE / ZIPS / ZIP / PIZ / PXR24 compression, HALF and FLOAT channels.
Written against the OpenEXR file-format spec independently of the C++
implementation in ``native/bmfr_io.cpp`` so the two act as cross-checks
for each other (the environment ships no third-party EXR decoder).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 20000630


class _Cursor:
    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def read(self, n):
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise IOError("truncated EXR")
        self.pos += n
        return b

    def u32(self):
        return struct.unpack("<I", self.read(4))[0]

    def i32(self):
        return struct.unpack("<i", self.read(4))[0]

    def u64(self):
        return struct.unpack("<Q", self.read(8))[0]

    def u8(self):
        return self.read(1)[0]

    def cstr(self):
        end = self.buf.index(b"\0", self.pos)
        s = self.buf[self.pos : end].decode("latin-1")
        self.pos = end + 1
        return s


def _rle_decompress(data: bytes, out_size: int) -> bytes:
    """EXR RLE: signed count byte; negative = literals, else repeat."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < out_size:
        count = data[i]
        i += 1
        if count > 127:  # negative int8 -> literal run
            ln = 256 - count
            out += data[i : i + ln]
            i += ln
        else:
            out += bytes([data[i]]) * (count + 1)
            i += 1
    if len(out) != out_size:
        raise IOError("corrupt RLE EXR chunk")
    return bytes(out)


def _unfilter(data: bytes) -> bytes:
    arr = np.frombuffer(data, np.uint8).astype(np.int16)
    arr = (np.cumsum(arr - 128, dtype=np.int64) + 128) % 256
    arr = arr.astype(np.uint8)
    # re-interleave the two halves
    half = (len(arr) + 1) // 2
    out = np.empty(len(arr), np.uint8)
    out[0::2] = arr[:half]
    out[1::2] = arr[half:]
    return out.tobytes()


def _unfilter_pxr24(data: bytes) -> np.ndarray:
    """PXR24 predictor: plain running sum over the whole buffer (no
    ZIP-style two-half interleave)."""
    arr = np.frombuffer(data, np.uint8).astype(np.int64)
    if arr.size:
        arr = np.cumsum(arr - 128) + 128
    return (arr % 256).astype(np.uint8)


def _float_to_float24(v: np.ndarray) -> np.ndarray:
    """OpenEXR's floatToFloat24, vectorized (ImfPxr24Compressor.cpp).

    Finite values round the significand to 15 bits with round-half-up on
    exact ties: ((e|m) + (m & 0x80) + 0x3f) >> 8 — the carry may
    propagate into the exponent; if it overflows into the infinity
    exponent the significand is truncated instead. NaNs keep their top
    15 significand bits but force at least one bit set so they never
    collapse to infinity; infinities pass through.
    """
    u32 = np.ascontiguousarray(v, np.float32).view(np.uint32)
    s = (u32 & 0x80000000) >> np.uint32(8)
    e = u32 & 0x7F800000
    m = u32 & 0x007FFFFF
    m24 = m >> np.uint32(8)
    nan_i24 = (e >> np.uint32(8)) | m24 | (m24 == 0).astype(np.uint32)
    rounded = ((e | m) + (m & 0x80) + np.uint32(0x3F)) >> np.uint32(8)
    fin_i24 = np.where(rounded >= 0x7F8000, (e | m) >> np.uint32(8),
                       rounded)
    i24 = np.where(e == 0x7F800000,
                   np.where(m != 0, nan_i24, e >> np.uint32(8)),
                   fin_i24)
    return (s | i24).astype(np.uint32)


def _decode_pxr24(chunk: bytes, channels, W: int, nlines: int) -> bytes:
    """PXR24 chunk -> the standard per-line-per-channel raw layout.

    FLOAT channels are stored as 3 MSB-first byte planes of a 24-bit
    float (f32 with the low 8 mantissa bits dropped; decode is exact:
    shift left 8). HALF channels as 2 byte planes."""
    raw = _unfilter_pxr24(zlib.decompress(chunk))
    out = bytearray()
    p = 0
    for _ in range(nlines):
        for cn, ptype in channels:
            if ptype == 1:  # HALF: 2 planes
                hi = raw[p : p + W].astype(np.uint16)
                lo = raw[p + W : p + 2 * W].astype(np.uint16)
                p += 2 * W
                out += ((hi << 8) | lo).astype("<u2").tobytes()
            elif ptype == 2:  # FLOAT: 3 planes of the top 24 bits
                b0 = raw[p : p + W].astype(np.uint32)
                b1 = raw[p + W : p + 2 * W].astype(np.uint32)
                b2 = raw[p + 2 * W : p + 3 * W].astype(np.uint32)
                p += 3 * W
                u = ((b0 << 24) | (b1 << 16) | (b2 << 8)).astype("<u4")
                out += u.tobytes()
            else:
                raise IOError("UINT EXR channels not supported")
    return bytes(out)


def _b44_unpack14(b: bytes):
    """One 14-byte B44 block -> 16 transformed uint16 (row-major 4x4)."""
    t = [0] * 16
    t[0] = (b[0] << 8) | b[1]
    shift = b[2] >> 2
    bias = 0x20 << shift

    t[4] = t[0] + ((((b[2] << 4) | (b[3] >> 4)) & 0x3F) << shift) - bias
    t[8] = t[4] + ((((b[3] << 2) | (b[4] >> 6)) & 0x3F) << shift) - bias
    t[12] = t[8] + ((b[4] & 0x3F) << shift) - bias

    t[1] = t[0] + ((b[5] >> 2) << shift) - bias
    t[5] = t[4] + ((((b[5] << 4) | (b[6] >> 4)) & 0x3F) << shift) - bias
    t[9] = t[8] + ((((b[6] << 2) | (b[7] >> 6)) & 0x3F) << shift) - bias
    t[13] = t[12] + ((b[7] & 0x3F) << shift) - bias

    t[2] = t[1] + ((b[8] >> 2) << shift) - bias
    t[6] = t[5] + ((((b[8] << 4) | (b[9] >> 4)) & 0x3F) << shift) - bias
    t[10] = t[9] + ((((b[9] << 2) | (b[10] >> 6)) & 0x3F) << shift) - bias
    t[14] = t[13] + ((b[10] & 0x3F) << shift) - bias

    t[3] = t[2] + ((b[11] >> 2) << shift) - bias
    t[7] = t[6] + ((((b[11] << 4) | (b[12] >> 4)) & 0x3F) << shift) - bias
    t[11] = t[10] + ((((b[12] << 2) | (b[13] >> 6)) & 0x3F) << shift) - bias
    t[15] = t[14] + ((b[13] & 0x3F) << shift) - bias
    return [v & 0xFFFF for v in t]


def _b44_untransform(t: int) -> int:
    """Invert the order-preserving half transform of B44."""
    if t & 0x8000:
        return t & 0x7FFF
    return (~t) & 0xFFFF


def _decode_b44(chunk: bytes, channels, W: int, nlines: int,
                b44a: bool) -> bytes:
    """B44/B44A chunk -> the standard per-line-per-channel raw layout.

    HALF channels are 4x4 blocks of 14 packed bytes (3 for B44A flat
    blocks, marker b[2] == 0xfc); FLOAT channels are stored raw."""
    out = np.zeros((nlines, sum(2 * W if pt == 1 else 4 * W
                                for _, pt in channels)), np.uint8)
    # column byte offsets of each channel within a scanline
    col_off = []
    off = 0
    for cn, pt in channels:
        col_off.append(off)
        off += 2 * W if pt == 1 else 4 * W

    pos = 0
    for ci, (cn, pt) in enumerate(channels):
        if pt != 1:  # FLOAT/UINT stored raw, line by line
            nb = 4 * W
            for y in range(nlines):
                row = np.frombuffer(chunk[pos : pos + nb], np.uint8)
                out[y, col_off[ci] : col_off[ci] + nb] = row
                pos += nb
            continue
        vals = np.zeros((nlines + 3, W + 3), np.uint16)
        for by in range(0, nlines, 4):
            for bx in range(0, W, 4):
                if b44a and pos + 3 <= len(chunk) and chunk[pos + 2] == 0xFC:
                    t0 = (chunk[pos] << 8) | chunk[pos + 1]
                    blk = [t0] * 16
                    pos += 3
                else:
                    blk = _b44_unpack14(chunk[pos : pos + 14])
                    pos += 14
                for r in range(4):
                    for c in range(4):
                        vals[by + r, bx + c] = _b44_untransform(
                            blk[4 * r + c])
        half_rows = vals[:nlines, :W].astype("<u2")
        for y in range(nlines):
            out[y, col_off[ci] : col_off[ci] + 2 * W] = (
                half_rows[y].view(np.uint8))
    return out.tobytes()


def _decode_piz(chunk: bytes, channels, W: int, nlines: int) -> bytes:
    """PIZ chunk -> the standard per-line-per-channel raw layout."""
    from . import piz

    shapes = []
    for cn, ptype in channels:
        size = 2 if ptype == 2 else 1
        shapes.append((nlines, W, size))
    bufs = piz.piz_uncompress(chunk, shapes)
    out = bytearray()
    for line in range(nlines):
        for (cn, ptype), buf in zip(channels, bufs):
            out += buf[line].astype("<u2").tobytes()
    return bytes(out)


def write_exr_py(path: str, img_hwc: np.ndarray, half: bool = True,
                 compression: str = "piz"):
    """Minimal scanline EXR writer for PIZ / PXR24 files (fixtures and
    round-trip tests; the native writer covers NONE/RLE/ZIPS/ZIP).

    Channels are written B, G, R (EXR requires alphabetical order), same
    as the native writer (native/bmfr_io.cpp:742-756)."""
    from . import piz as piz_mod

    comp_id = {"piz": 4, "pxr24": 5}[compression]
    lpb = {4: 32, 5: 16}[comp_id]
    img = np.asarray(img_hwc, np.float32)
    H, W, C = img.shape
    if C != 3:
        raise ValueError("write_exr_py: only 3 channels supported")

    out = bytearray()
    out += struct.pack("<II", _MAGIC, 2)

    def attr(name, typ, data):
        out.extend(name.encode() + b"\0" + typ.encode() + b"\0")
        out.extend(struct.pack("<I", len(data)))
        out.extend(data)

    chl = bytearray()
    for cn in ("B", "G", "R"):
        chl += cn.encode() + b"\0"
        chl += struct.pack("<iBBBBii", 1 if half else 2, 0, 0, 0, 0, 1, 1)
    chl += b"\0"
    attr("channels", "chlist", bytes(chl))
    attr("compression", "compression", bytes([comp_id]))
    dw = struct.pack("<iiii", 0, 0, W - 1, H - 1)
    attr("dataWindow", "box2i", dw)
    attr("displayWindow", "box2i", dw)
    attr("lineOrder", "lineOrder", b"\0")
    attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    out += b"\0"

    nblocks = (H + lpb - 1) // lpb
    table_pos = len(out)
    out += b"\0" * (8 * nblocks)

    src = img[:, :, ::-1]  # B, G, R file order
    offsets = []
    for b in range(nblocks):
        offsets.append(len(out))
        ylo = b * lpb
        nlines = min(lpb, H - ylo)
        rows = src[ylo : ylo + nlines]  # [nlines, W, 3]
        if comp_id == 4:
            chans = []
            for c in range(3):
                if half:
                    buf16 = rows[:, :, c].astype(np.float16).view(np.uint16)
                    chans.append((np.ascontiguousarray(buf16), 1))
                else:
                    buf16 = np.ascontiguousarray(
                        rows[:, :, c]).view(np.uint16).reshape(nlines, 2 * W)
                    chans.append((buf16, 2))
            payload = piz_mod.piz_compress(chans)
        else:  # PXR24
            planes = bytearray()
            for line in range(nlines):
                for c in range(3):
                    v = rows[line, :, c]
                    if half:
                        h16 = v.astype(np.float16).view(np.uint16)
                        planes += (h16 >> 8).astype(np.uint8).tobytes()
                        planes += (h16 & 0xFF).astype(np.uint8).tobytes()
                    else:
                        u = _float_to_float24(v)
                        planes += (u >> 16).astype(np.uint8).tobytes()
                        planes += ((u >> 8) & 0xFF).astype(np.uint8).tobytes()
                        planes += (u & 0xFF).astype(np.uint8).tobytes()
            arr = np.frombuffer(bytes(planes), np.uint8).astype(np.int64)
            d = np.empty_like(arr)
            d[0] = arr[0]
            d[1:] = arr[1:] - arr[:-1] + 128
            payload = zlib.compress((d % 256).astype(np.uint8).tobytes())
        raw_size = (2 if half else 4) * W * 3 * nlines
        if len(payload) >= raw_size:
            # store raw (decoder takes the packed >= unpacked path)
            payload = bytearray()
            for line in range(nlines):
                for c in range(3):
                    v = rows[line, :, c]
                    payload += (v.astype(np.float16).view("<u2").tobytes()
                                if half else v.astype("<f4").tobytes())
            payload = bytes(payload)
        out += struct.pack("<iI", ylo, len(payload))
        out += payload
    for b, off in enumerate(offsets):
        out[table_pos + 8 * b : table_pos + 8 * (b + 1)] = struct.pack(
            "<Q", off)
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_exr_py(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        buf = f.read()
    c = _Cursor(buf)
    if c.u32() != _MAGIC:
        raise IOError(f"{path}: not an EXR file")
    version = c.u32()
    if version & 0x200:
        raise IOError(f"{path}: tiled EXR unsupported")

    channels = []
    compression = 0
    dw = (0, 0, 0, 0)
    while True:
        name = c.cstr()
        if not name:
            break
        typ = c.cstr()
        size = c.u32()
        payload_end = c.pos + size
        if name == "channels" and typ == "chlist":
            while True:
                cn = c.cstr()
                if not cn:
                    break
                ptype = c.i32()
                c.read(4 + 8)  # pLinear+reserved, x/y sampling
                channels.append((cn, ptype))
        elif name == "compression":
            compression = c.u8()
        elif name == "dataWindow":
            dw = struct.unpack("<iiii", c.read(16))
        c.pos = payload_end

    W = dw[2] - dw[0] + 1
    H = dw[3] - dw[1] + 1
    lpb = {0: 1, 1: 1, 2: 1, 3: 16, 4: 32, 5: 16, 6: 32, 7: 32}.get(
        compression)
    if lpb is None:
        raise IOError(f"{path}: unsupported compression {compression}")

    nch = len(channels)
    order = {"R": 0, "G": 1, "B": 2}
    chan_out = [order.get(cn, i) for i, (cn, _) in enumerate(channels)]
    dtypes = [np.float16 if pt == 1 else np.float32 for _, pt in channels]
    line_bytes = sum(np.dtype(d).itemsize * W for d in dtypes)

    nblocks = (H + lpb - 1) // lpb
    offsets = [c.u64() for _ in range(nblocks)]

    out = np.zeros((H, W, min(nch, 3) if nch >= 3 else nch), np.float32)
    for off in offsets:
        y0, packed = struct.unpack("<iI", buf[off : off + 8])
        ylo = y0 - dw[1]
        nlines = min(lpb, H - ylo)
        chunk = buf[off + 8 : off + 8 + packed]
        raw_size = line_bytes * nlines
        if compression == 0 or packed >= raw_size:
            raw = chunk
        elif compression == 1:
            raw = _unfilter(_rle_decompress(chunk, raw_size))
        elif compression == 4:
            raw = _decode_piz(chunk, channels, W, nlines)
        elif compression == 5:
            raw = _decode_pxr24(chunk, channels, W, nlines)
        elif compression in (6, 7):
            raw = _decode_b44(chunk, channels, W, nlines,
                              b44a=compression == 7)
        else:
            raw = _unfilter(zlib.decompress(chunk))
        p = 0
        for line in range(nlines):
            y = ylo + line
            for ci, dt in enumerate(dtypes):
                nb = np.dtype(dt).itemsize * W
                vals = np.frombuffer(raw[p : p + nb], dt).astype(np.float32)
                oc = chan_out[ci]
                if oc < out.shape[2]:
                    out[y, :, oc] = vals
                p += nb
    return out


def _b44_transform(s: int) -> int:
    """B44's order-preserving half transform (encode side)."""
    if (s & 0x7C00) == 0x7C00:  # inf/nan collapse
        return 0x8000
    if s & 0x8000:
        return (~s) & 0xFFFF
    return s | 0x8000


def _b44_pack14(t):
    """Pack 16 transformed uint16 (row-major 4x4) into 14 bytes.

    Test/fixture encoder: picks the smallest shift whose quantized chain
    deltas fit 6 bits; exact when shift-0 deltas fit (smooth blocks)."""
    chains = [(4, 0), (8, 4), (12, 8),
              (1, 0), (5, 4), (9, 8), (13, 12),
              (2, 1), (6, 5), (10, 9), (14, 13),
              (3, 2), (7, 6), (11, 10), (15, 14)]

    def attempt(shift):
        bias = 0x20 << shift
        rec = {0: t[0]}
        es = {}
        exact = feasible = True
        for i, p in chains:
            delta = t[i] - rec[p] + bias
            e = delta >> shift
            if e < 0 or e > 63:
                feasible = False
                e = max(0, min(63, e))
            rec[i] = (rec[p] + (e << shift) - bias) & 0xFFFF
            if rec[i] != t[i]:
                exact = False
            es[i] = e
        return es, exact, feasible

    chosen = None
    for shift in range(14):
        es, exact, feasible = attempt(shift)
        if exact:
            chosen = (shift, es)
            break
        if chosen is None and feasible:
            chosen = (shift, es)
    if chosen is None:
        chosen = (13, attempt(13)[0])
    shift, e = chosen
    b = bytearray(14)
    b[0] = t[0] >> 8
    b[1] = t[0] & 0xFF
    b[2] = (shift << 2) | (e[4] >> 4)
    b[3] = ((e[4] & 0xF) << 4) | (e[8] >> 2)
    b[4] = ((e[8] & 3) << 6) | e[12]
    b[5] = (e[1] << 2) | (e[5] >> 4)
    b[6] = ((e[5] & 0xF) << 4) | (e[9] >> 2)
    b[7] = ((e[9] & 3) << 6) | e[13]
    b[8] = (e[2] << 2) | (e[6] >> 4)
    b[9] = ((e[6] & 0xF) << 4) | (e[10] >> 2)
    b[10] = ((e[10] & 3) << 6) | e[14]
    b[11] = (e[3] << 2) | (e[7] >> 4)
    b[12] = ((e[7] & 0xF) << 4) | (e[11] >> 2)
    b[13] = ((e[11] & 3) << 6) | e[15]
    return bytes(b)


def write_exr_b44(path: str, img_hwc: np.ndarray, b44a: bool = False):
    """Minimal B44/B44A EXR writer (HALF channels only; fixtures)."""
    img = np.asarray(img_hwc, np.float32)
    H, W, C = img.shape
    if C != 3:
        raise ValueError("write_exr_b44: only 3 channels supported")
    comp_id = 7 if b44a else 6
    lpb = 32

    out = bytearray()
    out += struct.pack("<II", _MAGIC, 2)

    def attr(name, typ, data):
        out.extend(name.encode() + b"\0" + typ.encode() + b"\0")
        out.extend(struct.pack("<I", len(data)))
        out.extend(data)

    chl = bytearray()
    for cn in ("B", "G", "R"):
        chl += cn.encode() + b"\0"
        chl += struct.pack("<iBBBBii", 1, 0, 0, 0, 0, 1, 1)
    chl += b"\0"
    attr("channels", "chlist", bytes(chl))
    attr("compression", "compression", bytes([comp_id]))
    dw = struct.pack("<iiii", 0, 0, W - 1, H - 1)
    attr("dataWindow", "box2i", dw)
    attr("displayWindow", "box2i", dw)
    attr("lineOrder", "lineOrder", b"\0")
    attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    out += b"\0"

    nblocks = (H + lpb - 1) // lpb
    table_pos = len(out)
    out += b"\0" * (8 * nblocks)
    src = img[:, :, ::-1]
    offsets = []
    for bi in range(nblocks):
        offsets.append(len(out))
        ylo = bi * lpb
        nlines = min(lpb, H - ylo)
        payload = bytearray()
        for c in range(3):
            h16 = src[ylo : ylo + nlines, :, c].astype(
                np.float16).view(np.uint16)
            # pad to 4x4 blocks by edge replication (like the reference
            # encoder), transform, pack
            ph = ((nlines + 3) // 4) * 4
            pw = ((W + 3) // 4) * 4
            pad = np.zeros((ph, pw), np.uint16)
            pad[:nlines, :W] = h16
            pad[nlines:, :W] = h16[-1:]
            pad[:, W:] = pad[:, W - 1 : W]
            for by in range(0, ph, 4):
                for bx in range(0, pw, 4):
                    blk = [int(_b44_transform(int(pad[by + r, bx + cc])))
                           for r in range(4) for cc in range(4)]
                    if b44a and len(set(blk)) == 1:
                        payload += bytes([blk[0] >> 8, blk[0] & 0xFF,
                                          0xFC])
                    else:
                        payload += _b44_pack14(blk)
        out += struct.pack("<iI", ylo, len(payload))
        out += bytes(payload)
    for bi, off in enumerate(offsets):
        out[table_pos + 8 * bi : table_pos + 8 * (bi + 1)] = struct.pack(
            "<Q", off)
    with open(path, "wb") as f:
        f.write(bytes(out))
