"""Pure-Python scanline EXR reader (fallback + independent cross-check).

Supports what the BMFR datasets need: single-part scanline files, NONE /
ZIPS / ZIP compression, HALF and FLOAT channels. Written against the
OpenEXR file-format spec independently of the C++ implementation in
``native/bmfr_io.cpp`` so the two act as cross-checks for each other
(the environment ships no third-party EXR decoder).
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
    lpb = {0: 1, 1: 1, 2: 1, 3: 16}.get(compression)
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
