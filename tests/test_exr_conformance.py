"""Adversarial EXR conformance corpus (VERDICT round-2 missing #3).

PIZ/PXR24/B44 here were written from the OpenEXR format spec and, in
the absence of a third-party decoder in this environment, validated by
two *independent* readers (pure Python io/exr_py.py+io/piz.py and
native/bmfr_io.cpp). This corpus drives both readers through the
spec's edge cases — deep Huffman codes beyond the 14-bit fast table,
the encoding-table zero-run escapes, the 14-vs-16-bit wavelet switch at
maxValue, B44A flat blocks, PXR24 byte-plane delta wraps, chunk
boundaries — plus randomized bitmap fuzzing, asserting bit-exact
agreement everywhere. A shared spec-misreading would have to survive
two codebases in two languages on inputs chosen to break it.

Reference role: OpenImageIO decodes these files for the reference
(opencl/bmfr.cpp:145-163).
"""

import struct

import numpy as np
import pytest

from bmfr_tpu.io import piz
from bmfr_tpu.io.exr_py import read_exr_py, write_exr_b44, write_exr_py

try:
    from bmfr_tpu.io import native

    HAVE_NATIVE = native.available()
except Exception:  # pragma: no cover
    HAVE_NATIVE = False

needs_native = pytest.mark.skipif(not HAVE_NATIVE,
                                  reason="native IO unavailable")


def both_readers_bit_exact(path, expect_hwc=None):
    """Read with the Python reader (and the native one when built);
    assert bitwise agreement between readers (and vs the expectation)."""
    got_py = read_exr_py(path)
    views = {"python": got_py}
    if HAVE_NATIVE:
        views["native"] = native.read_exr(path)
    for name, got in views.items():
        assert got.dtype == np.float32
        if expect_hwc is not None:
            np.testing.assert_array_equal(
                got.view(np.uint32), np.asarray(
                    expect_hwc, np.float32).view(np.uint32),
                err_msg=f"{name} reader diverges on {path}")
    if HAVE_NATIVE:
        np.testing.assert_array_equal(
            views["python"].view(np.uint32),
            views["native"].view(np.uint32),
            err_msg=f"reader cross-check diverges on {path}")
    return got_py


def half_img(bits_u16):
    """uint16 bit patterns -> [H, W, 3] f32 image exactly representable
    in half (what a half EXR round-trips to)."""
    h = bits_u16.astype(np.uint16).view(np.float16)
    return h.astype(np.float32)


# ------------------------------------------------------------------
# Huffman: encoding-table zero-run escapes (hand-built length arrays)
# ------------------------------------------------------------------

def _table_roundtrip(lengths, im, iM):
    w = piz._BitWriter()
    piz._pack_enc_table(w, lengths, im, iM)
    w.flush()
    r = piz._BitReader(bytes(w.out))
    got = piz._unpack_enc_table(r, im, iM)
    np.testing.assert_array_equal(got[im:iM + 1], lengths[im:iM + 1])


@pytest.mark.parametrize("runs", [
    [1], [2], [5], [piz._SHORTEST_LONG_RUN - 1],
    [piz._SHORTEST_LONG_RUN],               # exactly the long-run escape
    [piz._SHORTEST_LONG_RUN + 1],
    [255 + piz._SHORTEST_LONG_RUN],         # max single long run
    [255 + piz._SHORTEST_LONG_RUN + 3],     # must split into two runs
    [1, 2, 6, 300, 2, 1],                   # interleaved escapes
])
def test_enc_table_zero_run_escapes(runs):
    """Zero runs of every escape class (single 0, short codes 59-62,
    long code 63 with 8-bit count, runs beyond one escape)."""
    lengths = np.zeros(piz._HUF_ENCSIZE, np.int64)
    i = 5
    lengths[i] = 12
    for run in runs:
        i += 1 + run
        lengths[i] = (i % 20) + 1
    _table_roundtrip(lengths, 5, i)


def test_enc_table_trailing_values_and_max_length():
    lengths = np.zeros(piz._HUF_ENCSIZE, np.int64)
    lengths[0] = 58                          # spec maximum code length
    lengths[1] = 1
    lengths[piz._HUF_ENCSIZE - 1] = 30
    _table_roundtrip(lengths, 0, piz._HUF_ENCSIZE - 1)


# ------------------------------------------------------------------
# Huffman: codes beyond the 14-bit fast decode table
# ------------------------------------------------------------------

def _fib_skewed_symbols(depth=22, seed=3):
    """Symbol stream with Fibonacci frequencies: the Huffman tree is a
    maximally skewed chain, so max code length ~= depth > 14."""
    fibs = [1, 1]
    while len(fibs) < depth:
        fibs.append(fibs[-1] + fibs[-2])
    vals = []
    for i, f in enumerate(fibs):
        vals.append(np.full(f, i * 37, np.uint16))
    rng = np.random.default_rng(seed)
    data = np.concatenate(vals)
    rng.shuffle(data)
    return data


def test_huffman_deep_codes_roundtrip():
    data = _fib_skewed_symbols()
    freq = np.bincount(data, minlength=piz._HUF_ENCSIZE).astype(np.int64)
    lengths = piz._build_lengths(freq)
    assert lengths.max() > 14, "vector failed to force deep codes"
    comp = piz.huf_compress(data)
    got = piz.huf_decompress(comp, data.size)
    np.testing.assert_array_equal(got, data)


@pytest.mark.parametrize("vals,counts", [
    ([7], [5000]),                   # single symbol, pure run-length
    ([0, 65534], [1, 1]),            # extreme symbol span (2-entry table)
    ([3, 3, 9], [255, 256, 300]),    # run-length splits at the 255 cap
    ([1], [1]),                      # one element
])
def test_huffman_degenerate_distributions(vals, counts):
    parts = [np.full(c, v, np.uint16) for v, c in zip(vals, counts)]
    data = np.concatenate(parts)
    got = piz.huf_decompress(piz.huf_compress(data), data.size)
    np.testing.assert_array_equal(got, data)


# ------------------------------------------------------------------
# Wavelet: the 14-vs-16-bit switch at maxValue
# ------------------------------------------------------------------

@pytest.mark.parametrize("mx", [(1 << 14) - 2, (1 << 14) - 1, 1 << 14,
                                (1 << 14) + 1, (1 << 16) - 1])
@pytest.mark.parametrize("shape", [(32, 32), (33, 31), (1, 7), (7, 1),
                                   (2, 2), (5, 64)])
def test_wavelet_mode_switch(mx, shape):
    """Both wavelet modes, exactly at the switch boundary, with data
    saturating the value range (the 16-bit mode's modular arithmetic
    must wrap identically on re-decode)."""
    rng = np.random.default_rng(mx % 97 + shape[0])
    plane = rng.integers(0, mx + 1, size=shape).astype(np.uint16)
    plane.flat[0] = mx
    plane.flat[-1] = 0
    enc = piz.wav2_encode(plane, mx)
    dec = piz.wav2_decode(enc, mx)
    np.testing.assert_array_equal(dec, plane)


# ------------------------------------------------------------------
# File-level PIZ vectors
# ------------------------------------------------------------------

def test_piz_every_finite_half_pattern(tmp_path):
    """An image containing every finite half bit pattern exercises the
    full bitmap/LUT domain (forward_lut/reverse_lut over all symbols)."""
    bits = np.arange(1 << 16, dtype=np.uint32)
    finite = bits[(bits & 0x7C00) != 0x7C00]        # drop inf/NaN
    n = finite.size // 256 * 256
    img = half_img(finite[:n].reshape(-1, 256))[..., None]
    img = np.repeat(img, 3, axis=2)
    img[:, :, 1] = img[::-1, :, 1]                  # decorrelate channels
    p = str(tmp_path / "allhalf.exr")
    write_exr_py(p, img, half=True, compression="piz")
    both_readers_bit_exact(p, img)


def test_piz_deep_codes_in_file(tmp_path):
    """Exponentially skewed value histogram inside a real PIZ chunk
    drives both readers through >14-bit Huffman codes."""
    data = _fib_skewed_symbols(depth=23, seed=11)
    n = data.size // 64 * 64
    img = half_img(data[:n].reshape(-1, 64))[..., None]
    img = np.repeat(img, 3, axis=2)
    p = str(tmp_path / "deep.exr")
    write_exr_py(p, img, half=True, compression="piz")
    both_readers_bit_exact(p, img)


@pytest.mark.parametrize("H", [1, 15, 16, 17, 31, 32, 33, 65])
def test_piz_chunk_boundaries(tmp_path, H):
    """PIZ chunks are 32 scanlines: heights straddling the boundary and
    the ragged final chunk."""
    rng = np.random.default_rng(H)
    img = half_img(rng.integers(0, 0x7C00, size=(H, 40, 3)))
    p = str(tmp_path / f"h{H}.exr")
    write_exr_py(p, img, half=True, compression="piz")
    both_readers_bit_exact(p, img)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_piz_random_bitmap_fuzz(tmp_path, seed):
    """Random sparse symbol sets: random bitmap occupancy stresses the
    LUT construction and table packing differently every seed."""
    rng = np.random.default_rng(seed)
    n_sym = int(rng.integers(2, 300))
    symbols = rng.choice(np.arange(0x7C00, dtype=np.uint16), n_sym,
                         replace=False)
    img = half_img(rng.choice(symbols, size=(37, 53, 3)))
    p = str(tmp_path / f"fuzz{seed}.exr")
    write_exr_py(p, img, half=True, compression="piz")
    both_readers_bit_exact(p, img)


# ------------------------------------------------------------------
# PXR24: delta wrap + lossy truncation semantics
# ------------------------------------------------------------------

def _float_to_float24_scalar(i: int) -> int:
    """Literal scalar transliteration of OpenEXR's floatToFloat24
    (ImfPxr24Compressor.cpp) — the independent oracle for the writer's
    vectorized version. Ties (mantissa low byte exactly 0x80) round up;
    NaNs keep their top significand bits but force one bit set; a
    rounding carry into the infinity exponent truncates instead."""
    s = i & 0x80000000
    e = i & 0x7F800000
    m = i & 0x007FFFFF
    if e == 0x7F800000:
        if m:
            m >>= 8
            i24 = (e >> 8) | m | int(m == 0)
        else:
            i24 = e >> 8
    else:
        i24 = ((e | m) + (m & 0x80) + 0x3F) >> 8
        if i24 >= 0x7F8000:
            i24 = (e | m) >> 8
    return (s >> 8) | i24


def _pxr24_expected(img):
    """PXR24 is lossy: f32 values land as float24 (decode shifts left 8,
    so the low mantissa byte is zero)."""
    u = img.view(np.uint32).ravel()
    t = np.array([_float_to_float24_scalar(int(x)) for x in u],
                 np.uint32).reshape(img.shape)
    return (t << np.uint32(8)).view(np.float32)


def test_pxr24_delta_wrap(tmp_path):
    """Adjacent pixels whose truncated patterns differ across byte-plane
    carries: the per-byte horizontal deltas wrap mod 256 many times."""
    # exponent ramp alternating signs + mantissa boundary patterns
    exps = np.linspace(-60, 60, 41 * 61).reshape(41, 61)
    img = (2.0 ** exps).astype(np.float32)
    img[::2, ::2] *= -1.0
    img = np.stack([img,
                    np.nextafter(img, np.float32(np.inf)),
                    np.nextafter(img, np.float32(-np.inf))], axis=-1)
    p = str(tmp_path / "wrap.exr")
    write_exr_py(p, img, half=False, compression="pxr24")
    both_readers_bit_exact(p, _pxr24_expected(img))


def test_pxr24_random_and_boundaries(tmp_path):
    rng = np.random.default_rng(9)
    for H in (1, 15, 16, 17, 33):
        img = rng.standard_normal((H, 29, 3)).astype(np.float32) * 1e3
        p = str(tmp_path / f"pxr{H}.exr")
        write_exr_py(p, img, half=False, compression="pxr24")
        both_readers_bit_exact(p, _pxr24_expected(img))


def test_pxr24_rounding_edge_cases(tmp_path):
    """The floatToFloat24 corners: exact ties (low mantissa byte 0x80)
    must round UP; NaNs whose top-15 mantissa bits are zero must stay
    NaN (not collapse to infinity); values whose rounding carry would
    overflow the exponent truncate instead of becoming inf."""
    pats = np.array([
        0x3F800080,  # 1.0 + tie: low byte exactly 0x80 -> rounds up
        0x3F800180,  # odd 15-bit significand + tie -> also rounds up
        0x3F80007F,  # just below tie -> rounds down
        0x3F800081,  # just above tie -> rounds up
        0x7F800001,  # NaN with top-15 mantissa bits zero
        0x7FC00000,  # quiet NaN
        0xFF800055,  # negative NaN, low-bits-only payload
        0x7F7FFFFF,  # FLT_MAX: rounding would overflow -> truncate
        0xFF7FFFC0,  # -FLT_MAX area tie at the overflow boundary
        0x7F800000,  # +inf passes through
        0xFF800000,  # -inf passes through
        0x00000001,  # denormal
        0x80000000,  # -0.0
    ], np.uint32)
    img = np.resize(pats.view(np.float32), (3, 5, 3)).copy()
    p = str(tmp_path / "edge.exr")
    write_exr_py(p, img, half=False, compression="pxr24")
    exp = _pxr24_expected(img)
    # spot-check the oracle itself on the load-bearing corners
    assert _float_to_float24_scalar(0x3F800080) == 0x3F8001  # tie up
    assert _float_to_float24_scalar(0x3F80007F) == 0x3F8000
    nan24 = _float_to_float24_scalar(0x7F800001)
    assert (nan24 & 0x7F8000) == 0x7F8000 and (nan24 & 0x7FFF) != 0
    assert _float_to_float24_scalar(0x7F7FFFFF) == 0x7F7FFF  # no inf
    both_readers_bit_exact(p, exp)


# ------------------------------------------------------------------
# B44 / B44A
# ------------------------------------------------------------------

def test_b44a_flat_blocks(tmp_path):
    """B44A's 3-byte flat-block encoding: fully flat image, flat blocks
    mixed with textured ones, and flat blocks at ragged edges."""
    rng = np.random.default_rng(5)
    img = np.full((19, 27, 3), np.float32(0.25))         # ragged 4x4 grid
    img[4:8, 4:8] = half_img(rng.integers(0x3000, 0x4000, (4, 4, 3)))
    img[12:16, 20:24, 0] = 1.5
    p = str(tmp_path / "b44a_flat.exr")
    write_exr_b44(p, img, b44a=True)
    got = both_readers_bit_exact(p)
    # flat regions must be exact; B44 is lossy on textured blocks
    np.testing.assert_array_equal(got[:4, :4], np.float32(0.25))
    np.testing.assert_array_equal(got[16:, 24:],
                                  np.float32(0.25) *
                                  np.ones_like(got[16:, 24:]))


@pytest.mark.parametrize("b44a", [False, True])
@pytest.mark.parametrize("shape", [(4, 4), (3, 5), (17, 18), (33, 31)])
def test_b44_shapes_cross_reader(tmp_path, b44a, shape):
    """Both readers agree bitwise on every block geometry (full blocks,
    ragged right/bottom edges, single ragged block)."""
    rng = np.random.default_rng(shape[0] * 100 + shape[1] + b44a)
    img = half_img(rng.integers(0, 0x7C00, size=shape + (3,)))
    p = str(tmp_path / f"b44_{b44a}_{shape[0]}x{shape[1]}.exr")
    write_exr_b44(p, img, b44a=b44a)
    both_readers_bit_exact(p)
