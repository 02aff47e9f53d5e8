"""PIZ / PXR24 EXR compression support (VERDICT round-1 missing #3).

The reference reads any EXR compression via OpenImageIO
(opencl/bmfr.cpp:145-163); our two independent readers (native C++ and
pure Python) must both decode PIZ and PXR24. Conformance strategy: the
codecs are written independently from the OpenEXR format spec in C++
and numpy, cross-checked against each other, and round-tripped through
the Python PIZ/PXR24 writer.
"""

import os

import numpy as np
import pytest

from bmfr_tpu.io import piz
from bmfr_tpu.io.exr_py import read_exr_py, write_exr_py

try:
    from bmfr_tpu.io import native

    HAVE_NATIVE = native.available()
except Exception:  # pragma: no cover
    HAVE_NATIVE = False


def _img(shape=(48, 70, 3), seed=0):
    rng = np.random.default_rng(seed)
    img = rng.normal(0.4, 0.3, shape).astype(np.float32)
    img[0, 0, 0] = 0.0
    img[1, 1, 1] = 65000.0  # large half-range value
    return img


# ------------------------------------------------------------ codec units


@pytest.mark.parametrize("shape", [(17, 33), (1, 5), (5, 1), (32, 64),
                                   (31, 63), (2, 2), (3, 3)])
@pytest.mark.parametrize("mx", [100, 60000])
def test_wavelet_roundtrip(shape, mx):
    rng = np.random.default_rng(1)
    a = rng.integers(0, mx + 1, shape).astype(np.uint16)
    assert np.array_equal(piz.wav2_decode(piz.wav2_encode(a, mx), mx), a)


def test_wavelet_uses_both_arithmetic_modes():
    """maxValue >= 2^14 switches to mod-2^16 arithmetic; the two modes
    must genuinely differ (guards against silently using one for both)."""
    rng = np.random.default_rng(2)
    a = rng.integers(0, 1 << 14, (16, 16)).astype(np.uint16)
    assert not np.array_equal(piz.wav2_encode(a, 100),
                              piz.wav2_encode(a, 60000))


@pytest.mark.parametrize("data", [
    np.zeros(1000, np.uint16),
    np.arange(5000).astype(np.uint16),
    np.full(7, 65535, np.uint16),
    np.array([3], np.uint16),
    np.repeat(np.arange(20, dtype=np.uint16), 400),  # long runs -> RLE code
])
def test_huffman_roundtrip(data):
    comp = piz.huf_compress(data)
    assert np.array_equal(piz.huf_decompress(comp, data.size), data)


def test_piz_chunk_mixed_channels():
    rng = np.random.default_rng(3)
    bufs = [(rng.random((16, 40)).astype(np.float16).view(np.uint16), 1),
            (rng.random((16, 40)).astype(np.float32).view(np.uint16), 2)]
    comp = piz.piz_compress(bufs)
    out = piz.piz_uncompress(comp, [(16, 40, 1), (16, 40, 2)])
    for (b, _), o in zip(bufs, out):
        assert np.array_equal(b, o)


def test_huffman_rejects_corrupt():
    comp = piz.huf_compress(np.arange(100).astype(np.uint16))
    with pytest.raises(IOError):
        piz.huf_decompress(comp[:24], 100)  # truncated bit stream


# --------------------------------------------------------- file roundtrip


@pytest.mark.parametrize("comp", ["piz", "pxr24"])
@pytest.mark.parametrize("half", [True, False])
def test_python_exr_roundtrip(tmp_path, comp, half):
    img = _img()
    p = os.path.join(tmp_path, "t.exr")
    write_exr_py(p, img, half=half, compression=comp)
    back = read_exr_py(p)
    if half:
        exp = img.astype(np.float16).astype(np.float32)
    elif comp == "pxr24":
        # OpenEXR floatToFloat24 rounding: ties (low byte 0x80) round
        # up via the (m & 0x80) term (see test_exr_conformance for the
        # scalar oracle incl. NaN/overflow corners; inputs here are
        # finite and far from FLT_MAX)
        u = img.view(np.uint32).astype(np.uint64)
        s, em = u & 0x80000000, u & 0x7FFFFFFF
        t = (s >> 8) | ((em + (em & 0x80) + 0x3F) >> 8)
        exp = (t << 8).astype(np.uint32).view(np.float32)
    else:
        exp = img
    assert np.array_equal(back, exp)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native IO unavailable")
@pytest.mark.parametrize("comp", ["piz", "pxr24"])
@pytest.mark.parametrize("half", [True, False])
def test_native_matches_python(tmp_path, comp, half):
    """The C++ and Python decoders are independent implementations; they
    must agree bit-for-bit on the same files."""
    img = _img(seed=7)
    p = os.path.join(tmp_path, "t.exr")
    write_exr_py(p, img, half=half, compression=comp)
    assert np.array_equal(read_exr_py(p), native.read_exr(p))


@pytest.mark.skipif(not HAVE_NATIVE, reason="native IO unavailable")
def test_native_multichunk_piz(tmp_path):
    """>32 scanlines exercises multiple PIZ chunks; constant regions
    exercise the Huffman run-length pseudo-symbol."""
    rng = np.random.default_rng(8)
    img = np.zeros((100, 130, 3), np.float32)
    img[30:60, 20:90] = rng.normal(0.3, 0.1, (30, 70, 3))
    p = os.path.join(tmp_path, "big.exr")
    write_exr_py(p, img, half=True, compression="piz")
    a = read_exr_py(p)
    assert np.array_equal(a, native.read_exr(p))
    assert np.array_equal(a, img.astype(np.float16).astype(np.float32))


@pytest.mark.skipif(not HAVE_NATIVE, reason="native IO unavailable")
def test_native_rejects_corrupt_piz(tmp_path):
    img = _img(seed=9)
    p = os.path.join(tmp_path, "t.exr")
    write_exr_py(p, img, half=True, compression="piz")
    data = bytearray(open(p, "rb").read())
    data = data[:-20]  # truncate inside the huffman stream
    q = os.path.join(tmp_path, "bad.exr")
    open(q, "wb").write(bytes(data))
    with pytest.raises(Exception):
        native.read_exr(q)


# ------------------------------------------------------------------ B44


@pytest.mark.parametrize("b44a", [False, True])
def test_b44_roundtrip_exact_on_smooth(tmp_path, b44a):
    """Shift-0 blocks (tiny gradients) round-trip exactly."""
    from bmfr_tpu.io.exr_py import write_exr_b44

    img = (0.5 + np.linspace(0, 0.002, 40 * 52 * 3)
           .reshape(40, 52, 3)).astype(np.float32)
    p = os.path.join(tmp_path, "t.exr")
    write_exr_b44(p, img, b44a=b44a)
    back = read_exr_py(p)
    assert np.array_equal(back, img.astype(np.float16).astype(np.float32))


def test_b44a_flat_blocks(tmp_path):
    from bmfr_tpu.io.exr_py import write_exr_b44

    img = np.full((36, 36, 3), 0.5, np.float32)
    p = os.path.join(tmp_path, "t.exr")
    write_exr_b44(p, img, b44a=True)
    assert np.array_equal(read_exr_py(p), img)
    # flat blocks are 3 bytes -> far smaller than 14-byte packing
    assert os.path.getsize(p) < 36 * 36 * 3 * 2 // 4


def test_b44_lossy_bounded(tmp_path):
    """B44 is lossy on rough data; error stays bounded (quantized
    deltas), never wild."""
    from bmfr_tpu.io.exr_py import write_exr_b44

    rng = np.random.default_rng(5)
    img = rng.random((36, 40, 3)).astype(np.float32)
    p = os.path.join(tmp_path, "t.exr")
    write_exr_b44(p, img)
    back = read_exr_py(p)
    assert np.abs(back - img.astype(np.float16).astype(np.float32)).max() < 0.5


@pytest.mark.skipif(not HAVE_NATIVE, reason="native IO unavailable")
@pytest.mark.parametrize("b44a", [False, True])
def test_b44_native_matches_python(tmp_path, b44a):
    from bmfr_tpu.io.exr_py import write_exr_b44

    rng = np.random.default_rng(6)
    for img in [(0.5 + np.linspace(0, 0.002, 40 * 52 * 3)
                 .reshape(40, 52, 3)).astype(np.float32),
                rng.random((70, 60, 3)).astype(np.float32)]:
        p = os.path.join(tmp_path, "t.exr")
        from bmfr_tpu.io.exr_py import write_exr_b44 as w
        w(p, img, b44a=b44a)
        assert np.array_equal(read_exr_py(p), native.read_exr(p))
