"""PIZ (wavelet + Huffman) EXR compression codec, pure numpy.

Written from the OpenEXR file-format specification so the TUNI dataset
loads regardless of how its EXRs were compressed (the reference reads
anything via OpenImageIO — opencl/bmfr.cpp:145-163; our readers
previously only handled NONE/RLE/ZIPS/ZIP). The native C++ reader
(native/bmfr_io.cpp) carries an independent implementation; the two are
cross-checked against each other and by encode/decode round-trips.

A PIZ chunk covers up to 32 scanlines and stores, per channel, a
contiguous plane of uint16 samples (FLOAT channels contribute two
interleaved uint16 planes). The pipeline is:

  compress:   bitmap/forward-LUT -> 2-D wavelet -> canonical Huffman
  uncompress: Huffman -> inverse wavelet -> reverse-LUT

Wavelet: per 2x2 quad, average/difference transform, hierarchical by
power-of-two levels; exact integer versions with 14-bit (plain int16)
and 16-bit (mod-2^16 with offset) arithmetic, chosen by the LUT's max
value. Huffman: canonical codes up to 58 bits, code lengths packed in
6-bit fields with zero-run escapes (59..63), a run-length pseudo-symbol
(index ``iM``) followed by an 8-bit repeat count, bits MSB-first.
"""

from __future__ import annotations

import struct

import numpy as np

USHORT_RANGE = 1 << 16
BITMAP_SIZE = USHORT_RANGE >> 3

# ---------------------------------------------------------------- bitmap/LUT


def bitmap_from_data(data: np.ndarray) -> np.ndarray:
    bitmap = np.zeros(BITMAP_SIZE, np.uint8)
    u = np.unique(data.astype(np.uint16))
    np.bitwise_or.at(bitmap, u >> 3, (1 << (u & 7)).astype(np.uint8))
    bitmap[0] &= 0xFE  # zero is never stored explicitly
    return bitmap


def forward_lut(bitmap: np.ndarray):
    """lut mapping data values -> compact indices; returns (lut, maxValue)."""
    present = np.zeros(USHORT_RANGE, bool)
    bits = np.unpackbits(bitmap, bitorder="little")
    present[: bits.size] = bits.astype(bool)
    present[0] = True
    lut = np.zeros(USHORT_RANGE, np.uint16)
    idx = np.flatnonzero(present)
    lut[idx] = np.arange(idx.size, dtype=np.uint16)
    return lut, idx.size - 1


def reverse_lut(bitmap: np.ndarray):
    """lut mapping compact indices -> data values; returns (lut, maxValue)."""
    present = np.zeros(USHORT_RANGE, bool)
    bits = np.unpackbits(bitmap, bitorder="little")
    present[: bits.size] = bits.astype(bool)
    present[0] = True
    idx = np.flatnonzero(present).astype(np.uint16)
    lut = np.zeros(USHORT_RANGE, np.uint16)
    lut[: idx.size] = idx
    return lut, idx.size - 1


# ------------------------------------------------------------------ wavelet

_A_OFFSET = 1 << 15
_MOD_MASK = (1 << 16) - 1


def _wenc14(a, b):
    a_s = a.astype(np.int16).astype(np.int32)
    b_s = b.astype(np.int16).astype(np.int32)
    m = (a_s + b_s) >> 1
    d = a_s - b_s
    return m.astype(np.uint16), d.astype(np.uint16)


def _wdec14(lo, hi):
    ls = lo.astype(np.int16).astype(np.int32)
    hs = hi.astype(np.int16).astype(np.int32)
    ai = ls + (hs & 1) + (hs >> 1)
    a = ai.astype(np.int16)
    b = (a.astype(np.int32) - hs).astype(np.int16)
    return a.astype(np.uint16), b.astype(np.uint16)


def _wenc16(a, b):
    ao = (a.astype(np.int32) + _A_OFFSET) & _MOD_MASK
    m = (ao + b.astype(np.int32)) >> 1
    d = ao - b.astype(np.int32)
    m = np.where(d < 0, (m + _A_OFFSET) & _MOD_MASK, m)
    d &= _MOD_MASK
    return m.astype(np.uint16), d.astype(np.uint16)


def _wdec16(lo, hi):
    m = lo.astype(np.int32)
    d = hi.astype(np.int32)
    b = (m - (d >> 1)) & _MOD_MASK
    a = (d + b - _A_OFFSET) & _MOD_MASK
    return a.astype(np.uint16), b.astype(np.uint16)


def wav2_encode(plane: np.ndarray, max_value: int) -> np.ndarray:
    """In-place-style 2-D wavelet encode of a [ny, nx] uint16 plane."""
    enc = _wenc14 if max_value < (1 << 14) else _wenc16
    a = plane.copy()
    ny, nx = a.shape
    n = min(nx, ny)
    p, p2 = 1, 2
    while p2 <= n:
        ey = ny - p2
        ex = nx - p2
        ys = np.arange(0, ey + 1, p2)
        xs = np.arange(0, ex + 1, p2)
        if ys.size and xs.size:
            q00 = a[np.ix_(ys, xs)]
            q01 = a[np.ix_(ys, xs + p)]
            q10 = a[np.ix_(ys + p, xs)]
            q11 = a[np.ix_(ys + p, xs + p)]
            i00, i01 = enc(q00, q01)
            i10, i11 = enc(q10, q11)
            r00, r10 = enc(i00, i10)
            r01, r11 = enc(i01, i11)
            a[np.ix_(ys, xs)] = r00
            a[np.ix_(ys, xs + p)] = r01
            a[np.ix_(ys + p, xs)] = r10
            a[np.ix_(ys + p, xs + p)] = r11
        if nx & p:
            # odd remainder column (one past the last processed quad),
            # paired vertically
            x = xs[-1] + p2
            c0, c1 = enc(a[ys, x], a[ys + p, x])
            a[ys, x] = c0
            a[ys + p, x] = c1
        if ny & p:
            # odd remainder row, paired horizontally
            y = ys[-1] + p2
            r0, r1 = enc(a[y, xs], a[y, xs + p])
            a[y, xs] = r0
            a[y, xs + p] = r1
        p = p2
        p2 <<= 1
    return a


def wav2_decode(plane: np.ndarray, max_value: int) -> np.ndarray:
    dec = _wdec14 if max_value < (1 << 14) else _wdec16
    a = plane.copy()
    ny, nx = a.shape
    n = min(nx, ny)
    p = 1
    while p <= n:
        p <<= 1
    p >>= 1
    p2 = p
    p >>= 1
    while p >= 1:
        ey = ny - p2
        ex = nx - p2
        ys = np.arange(0, ey + 1, p2)
        xs = np.arange(0, ex + 1, p2)
        if ys.size and xs.size:
            q00 = a[np.ix_(ys, xs)]
            q01 = a[np.ix_(ys, xs + p)]
            q10 = a[np.ix_(ys + p, xs)]
            q11 = a[np.ix_(ys + p, xs + p)]
            i00, i10 = dec(q00, q10)
            i01, i11 = dec(q01, q11)
            r00, r01 = dec(i00, i01)
            r10, r11 = dec(i10, i11)
            a[np.ix_(ys, xs)] = r00
            a[np.ix_(ys, xs + p)] = r01
            a[np.ix_(ys + p, xs)] = r10
            a[np.ix_(ys + p, xs + p)] = r11
        if nx & p:
            x = xs[-1] + p2
            c0, c1 = dec(a[ys, x], a[ys + p, x])
            a[ys, x] = c0
            a[ys + p, x] = c1
        if ny & p:
            y = ys[-1] + p2
            r0, r1 = dec(a[y, xs], a[y, xs + p])
            a[y, xs] = r0
            a[y, xs + p] = r1
        p2 = p
        p >>= 1
    return a


# ------------------------------------------------------------------ Huffman

_SHORT_ZEROCODE_RUN = 59
_LONG_ZEROCODE_RUN = 63
_SHORTEST_LONG_RUN = 2 + _LONG_ZEROCODE_RUN - _SHORT_ZEROCODE_RUN  # 6
_HUF_ENCSIZE = USHORT_RANGE + 1  # one pseudo-symbol slot past 16 bits


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int):
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.out.append((self.acc << (8 - self.n)) & 0xFF)
            self.acc = 0
            self.n = 0


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def get(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos >= len(self.data):
                raise IOError("truncated PIZ bit stream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= nbits
        v = (self.acc >> self.n) & ((1 << nbits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def align(self):
        self.acc = 0
        self.n = 0


def _canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """OpenEXR canonical code assignment: count codes per length, first
    code per length computed longest-to-shortest, codes assigned in
    increasing symbol order within each length. Returns uint64 codes."""
    n = np.zeros(59, np.int64)
    for l in lengths[lengths > 0]:
        n[l] += 1
    c = 0
    first = np.zeros(59, np.int64)
    for i in range(58, 0, -1):
        nc = (c + n[i]) >> 1
        first[i] = c
        c = nc
    codes = np.zeros(lengths.size, np.int64)
    nxt = first.copy()
    for i in np.flatnonzero(lengths > 0):
        l = lengths[i]
        codes[i] = nxt[l]
        nxt[l] += 1
    return codes


def _build_lengths(freq: np.ndarray) -> np.ndarray:
    """Huffman code lengths (<= 58 bits) for nonzero-frequency symbols.

    Standard two-queue/heap construction; the resulting length set feeds
    the canonical assignment, so only the *lengths* must match what a
    decoder derives from the packed table (any valid prefix code works
    for files we write ourselves)."""
    import heapq

    idx = np.flatnonzero(freq)
    if idx.size == 1:
        lengths = np.zeros(freq.size, np.int64)
        lengths[idx[0]] = 1
        return lengths
    heap = [(int(freq[i]), int(i), None, None) for i in idx]
    heapq.heapify(heap)
    cnt = 0
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        cnt += 1
        heapq.heappush(heap, (a[0] + b[0], USHORT_RANGE + cnt, a, b))
    lengths = np.zeros(freq.size, np.int64)
    stack = [(heap[0], 0)]
    while stack:
        node, depth = stack.pop()
        if node[2] is None:
            lengths[node[1]] = max(depth, 1)
        else:
            stack.append((node[2], depth + 1))
            stack.append((node[3], depth + 1))
    if lengths.max() > 58:
        raise ValueError("huffman code length overflow")
    return lengths


def _pack_enc_table(w: _BitWriter, lengths: np.ndarray, im: int, iM: int):
    i = im
    while i <= iM:
        l = int(lengths[i])
        if l == 0:
            run = 1
            while i + run <= iM and lengths[i + run] == 0 and \
                    run < 255 + _SHORTEST_LONG_RUN:
                run += 1
            if run >= _SHORTEST_LONG_RUN:
                w.put(_LONG_ZEROCODE_RUN, 6)
                w.put(run - _SHORTEST_LONG_RUN, 8)
                i += run
                continue
            if run >= 2:
                w.put(_SHORT_ZEROCODE_RUN + run - 2, 6)
                i += run
                continue
            w.put(0, 6)
            i += 1
        else:
            w.put(l, 6)
            i += 1


def _unpack_enc_table(r: _BitReader, im: int, iM: int) -> np.ndarray:
    lengths = np.zeros(_HUF_ENCSIZE, np.int64)
    i = im
    while i <= iM:
        l = r.get(6)
        if l == _LONG_ZEROCODE_RUN:
            run = r.get(8) + _SHORTEST_LONG_RUN
            i += run
        elif l >= _SHORT_ZEROCODE_RUN:
            i += l - _SHORT_ZEROCODE_RUN + 2
        else:
            lengths[i] = l
            i += 1
    if i != iM + 1:
        raise IOError("corrupt PIZ huffman table")
    return lengths


def huf_compress(data: np.ndarray) -> bytes:
    data = data.astype(np.uint16)
    if data.size == 0:
        return b""
    freq = np.bincount(data, minlength=_HUF_ENCSIZE).astype(np.int64)
    im = int(np.flatnonzero(freq)[0])
    iM = int(np.flatnonzero(freq)[-1])
    # run-length pseudo-symbol one past the largest data symbol
    iM += 1
    freq[iM] = 1
    lengths = _build_lengths(freq)
    codes = _canonical_codes(lengths)

    w = _BitWriter()
    _pack_enc_table(w, lengths, im, iM)
    w.flush()
    table_bytes = bytes(w.out)

    d = _BitWriter()
    rlc = iM
    vals = data
    # encode with run-length compression of repeats
    n = vals.size
    boundaries = np.flatnonzero(np.r_[True, vals[1:] != vals[:-1]])
    run_lens = np.diff(np.r_[boundaries, n])
    nbits = 0
    for start, rl in zip(boundaries, run_lens):
        s = int(vals[start])
        cl, cc = int(lengths[s]), int(codes[s])
        rl = int(rl)
        # first occurrence always coded literally
        d.put(cc, cl)
        nbits += cl
        rest = rl - 1
        rlc_l, rlc_c = int(lengths[rlc]), int(codes[rlc])
        while rest > 0:
            chunk = min(rest, 255)
            if chunk * cl > rlc_l + 8:
                d.put(rlc_c, rlc_l)
                d.put(chunk, 8)
                nbits += rlc_l + 8
            else:
                for _ in range(chunk):
                    d.put(cc, cl)
                nbits += chunk * cl
            rest -= chunk
    d.flush()
    head = struct.pack("<IIIII", im, iM, len(table_bytes), nbits, 0)
    return head + table_bytes + bytes(d.out)


def huf_decompress(comp: bytes, n_out: int) -> np.ndarray:
    if n_out == 0:
        return np.zeros(0, np.uint16)
    if len(comp) < 20:
        raise IOError("corrupt PIZ huffman header")
    im, iM, _table_len, nbits, _ = struct.unpack("<IIIII", comp[:20])
    if im >= _HUF_ENCSIZE or iM >= _HUF_ENCSIZE or im > iM:
        raise IOError("corrupt PIZ huffman header")
    r = _BitReader(comp, 20)
    lengths = _unpack_enc_table(r, im, iM)
    if r.n:
        r.align()
    codes = _canonical_codes(lengths)
    rlc = iM

    # decode table: direct lookup for codes <= 14 bits, dict for longer
    DEC = 14
    table_sym = np.full(1 << DEC, -1, np.int64)
    table_len = np.zeros(1 << DEC, np.int64)
    long_codes = {}
    for s in np.flatnonzero(lengths > 0):
        l = int(lengths[s])
        c = int(codes[s])
        if l <= DEC:
            base = c << (DEC - l)
            table_sym[base : base + (1 << (DEC - l))] = s
            table_len[base : base + (1 << (DEC - l))] = l
        else:
            long_codes[(l, c)] = int(s)

    out = np.zeros(n_out, np.uint16)
    oi = 0
    data = r.data
    pos = r.pos
    acc = 0
    nacc = 0
    consumed = 0
    end = len(data)
    while oi < n_out and consumed < nbits:
        while nacc < DEC and pos < end:
            acc = (acc << 8) | data[pos]
            pos += 1
            nacc += 8
        if nacc >= DEC:
            peek = (acc >> (nacc - DEC)) & ((1 << DEC) - 1)
        else:
            peek = (acc << (DEC - nacc)) & ((1 << DEC) - 1)
        s = table_sym[peek]
        if s >= 0:
            l = int(table_len[peek])
        else:
            # long code: extend bit by bit beyond DEC
            l = DEC + 1
            while True:
                while nacc < l and pos < end:
                    acc = (acc << 8) | data[pos]
                    pos += 1
                    nacc += 8
                if nacc < l:
                    raise IOError("corrupt PIZ huffman data")
                c = (acc >> (nacc - l)) & ((1 << l) - 1)
                if (l, c) in long_codes:
                    s = long_codes[(l, c)]
                    break
                l += 1
                if l > 58:
                    raise IOError("corrupt PIZ huffman data")
        if nacc < l:
            raise IOError("corrupt PIZ huffman data")
        nacc -= l
        acc &= (1 << nacc) - 1
        consumed += l
        if s == rlc:
            while nacc < 8 and pos < end:
                acc = (acc << 8) | data[pos]
                pos += 1
                nacc += 8
            if nacc < 8:
                raise IOError("corrupt PIZ huffman data")
            nacc -= 8
            cnt = (acc >> nacc) & 0xFF
            acc &= (1 << nacc) - 1
            consumed += 8
            if oi == 0 or oi + cnt > n_out:
                raise IOError("corrupt PIZ run length")
            out[oi : oi + cnt] = out[oi - 1]
            oi += cnt
        else:
            out[oi] = s
            oi += 1
    if oi != n_out:
        raise IOError("truncated PIZ huffman data")
    return out


# ---------------------------------------------------------------- PIZ chunk


def piz_compress(channels) -> bytes:
    """channels: list of ``(buf, size)`` where ``buf`` is a
    ``[ny, nx*size]`` uint16 channel buffer (FLOAT channels interleave
    their two uint16 halves, ``size``=2; HALF channels ``size``=1) in
    file channel order. The wavelet runs per interleaved sub-plane with
    stride ``size``; the Huffman stream keeps the interleaved order."""
    flat = np.concatenate([buf.ravel() for buf, _ in channels])
    bitmap = bitmap_from_data(flat)
    lut, max_value = forward_lut(bitmap)
    nz = np.flatnonzero(bitmap)
    if nz.size:
        min_nz, max_nz = int(nz[0]), int(nz[-1])
    else:
        min_nz, max_nz = BITMAP_SIZE - 1, 0  # empty bitmap convention

    pieces = []
    for buf, size in channels:
        mapped = lut[buf]
        enc = np.empty_like(mapped)
        for j in range(size):
            enc[:, j::size] = wav2_encode(
                np.ascontiguousarray(mapped[:, j::size]), max_value)
        pieces.append(enc.ravel())
    huf = huf_compress(np.concatenate(pieces))

    out = bytearray(struct.pack("<HH", min_nz, max_nz))
    if min_nz <= max_nz:
        out += bitmap[min_nz : max_nz + 1].tobytes()
    out += struct.pack("<i", len(huf))
    out += huf
    return bytes(out)


def piz_uncompress(comp: bytes, channel_shapes) -> list:
    """Inverse of :func:`piz_compress`.

    channel_shapes: list of ``(ny, nx, size)`` per channel; returns
    ``[ny, nx*size]`` uint16 buffers in the same order."""
    if len(comp) < 4:
        raise IOError("corrupt PIZ chunk")
    min_nz, max_nz = struct.unpack("<HH", comp[:4])
    pos = 4
    bitmap = np.zeros(BITMAP_SIZE, np.uint8)
    if min_nz <= max_nz:
        nbytes = max_nz - min_nz + 1
        if pos + nbytes > len(comp):
            raise IOError("corrupt PIZ bitmap")
        bitmap[min_nz : max_nz + 1] = np.frombuffer(
            comp[pos : pos + nbytes], np.uint8)
        pos += nbytes
    lut, max_value = reverse_lut(bitmap)
    if pos + 4 > len(comp):
        raise IOError("corrupt PIZ chunk")
    (huf_len,) = struct.unpack("<i", comp[pos : pos + 4])
    pos += 4
    if huf_len < 0 or pos + huf_len > len(comp):
        raise IOError("corrupt PIZ chunk length")
    total = sum(ny * nx * size for ny, nx, size in channel_shapes)
    data = huf_decompress(comp[pos : pos + huf_len], total)

    out = []
    off = 0
    for ny, nx, size in channel_shapes:
        buf = data[off : off + ny * nx * size].reshape(ny, nx * size)
        off += ny * nx * size
        dec = np.empty_like(buf)
        for j in range(size):
            dec[:, j::size] = wav2_decode(
                np.ascontiguousarray(buf[:, j::size]), max_value)
        out.append(lut[dec])
    return out
