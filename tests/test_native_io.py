"""Native C++ IO library: EXR round-trips, cross-validation vs OpenCV,
PNG writing, threaded batch loads."""

import os

import numpy as np
import pytest

from bmfr_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native IO library not built")


@pytest.fixture
def img():
    r = np.random.RandomState(0)
    return (r.rand(48, 64, 3) * 4.0 - 1.0).astype(np.float32)


def test_exr_float_roundtrip(tmp_path, img):
    p = str(tmp_path / "a.exr")
    native.write_exr(p, img)
    back = native.read_exr(p)
    assert back.shape == img.shape
    np.testing.assert_array_equal(back, img)


def test_exr_half_roundtrip(tmp_path, img):
    p = str(tmp_path / "h.exr")
    native.write_exr(p, img, half=True)
    back = native.read_exr(p)
    np.testing.assert_allclose(back, img, rtol=2e-3, atol=2e-3)


def test_exr_cross_validated_with_python_reader(tmp_path, img):
    """The C++ writer's files must decode identically through the
    independently-written pure-Python reader (this environment has no
    third-party EXR decoder — OpenCV ships without OpenEXR)."""
    from bmfr_tpu.io.exr_py import read_exr_py

    for half, tol in ((False, 0.0), (True, 2e-3)):
        p = str(tmp_path / f"x_{half}.exr")
        native.write_exr(p, img, half=half)
        via_py = read_exr_py(p)
        via_c = native.read_exr(p)
        np.testing.assert_array_equal(via_py, via_c)
        np.testing.assert_allclose(via_py, img, rtol=tol, atol=tol)


def test_png_write_readable(tmp_path):
    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    cv2 = pytest.importorskip("cv2")
    r = np.random.RandomState(1)
    img8 = (r.rand(33, 57, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    native.write_png(p, img8)
    back = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    assert back is not None
    np.testing.assert_array_equal(back[:, :, ::-1], img8)


def test_threaded_batch_load(tmp_path, img):
    paths = []
    for i in range(8):
        p = str(tmp_path / f"f{i}.exr")
        native.write_exr(p, img + i)
        paths.append(p)
    arr = native.load_frames(paths, img.shape[1], img.shape[0], 3, threads=4)
    assert arr.shape == (8, 48, 64, 3)
    for i in range(8):
        np.testing.assert_array_equal(arr[i], img + i)


def test_batch_load_error_reported(tmp_path, img):
    p = str(tmp_path / "ok.exr")
    native.write_exr(p, img)
    with pytest.raises(IOError):
        native.load_frames([p, str(tmp_path / "missing.exr")],
                           img.shape[1], img.shape[0], 3)


def test_read_header(tmp_path, img):
    p = str(tmp_path / "a.exr")
    native.write_exr(p, img)
    import ctypes

    lib = native._load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    assert lib.bmfr_exr_read_header(p.encode(), w, h, c) == 0
    assert (w.value, h.value, c.value) == (64, 48, 3)


@pytest.mark.parametrize("compression", ["none", "rle", "zips", "zip"])
def test_exr_compression_modes_roundtrip(tmp_path, img, compression):
    p = str(tmp_path / f"{compression}.exr")
    native.write_exr(p, img, compression=compression)
    np.testing.assert_array_equal(native.read_exr(p), img)
    # independent python reader agrees
    from bmfr_tpu.io.exr_py import read_exr_py

    np.testing.assert_array_equal(read_exr_py(p), img)


def _encode_png(img, filter_type, bitdepth=8):
    """Hand-rolled PNG encoder applying one fixed filter type to every
    row — produces the filtered streams our readers must invert."""
    import struct
    import zlib

    h, w, c = img.shape
    bpp = c * (bitdepth // 8)
    if bitdepth == 16:
        data = img.astype(">u2").tobytes()
    else:
        data = img.astype(np.uint8).tobytes()
    stride = w * bpp
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = data[y * stride:(y + 1) * stride]
        raw.append(filter_type)
        out = bytearray(row)
        if filter_type == 1:
            for i in range(stride - 1, bpp - 1, -1):
                out[i] = (row[i] - row[i - bpp]) & 0xFF
        elif filter_type == 2:
            for i in range(stride):
                out[i] = (row[i] - prev[i]) & 0xFF
        elif filter_type == 3:
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                out[i] = (row[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif filter_type == 4:
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else cc)
                out[i] = (row[i] - pred) & 0xFF
        raw += out
        prev = row
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, ctype, 0, 0, 0)

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_read_all_filters_both_readers(tmp_path, filter_type):
    """Both the native and the pure-Python PNG readers must invert every
    PNG scanline filter (reference outputs are written by OpenImageIO,
    which uses adaptive filtering)."""
    from bmfr_tpu.io.png import read_png_rgb01_py

    r = np.random.RandomState(42 + filter_type)
    img = (r.rand(21, 17, 3) * 255).astype(np.uint8)
    p = str(tmp_path / f"f{filter_type}.png")
    with open(p, "wb") as f:
        f.write(_encode_png(img, filter_type))
    expect = img.astype(np.float32) / 255.0
    np.testing.assert_allclose(native.read_png_rgb01(p), expect, atol=1e-6)
    np.testing.assert_allclose(read_png_rgb01_py(p), expect, atol=1e-6)


@pytest.mark.parametrize("channels,bitdepth", [(1, 8), (2, 8), (4, 8),
                                               (3, 16)])
def test_png_read_formats(tmp_path, channels, bitdepth):
    from bmfr_tpu.io.png import read_png_rgb01_py

    r = np.random.RandomState(7)
    maxv = 65535 if bitdepth == 16 else 255
    img = (r.rand(9, 11, channels) * maxv).astype(
        np.uint16 if bitdepth == 16 else np.uint8)
    p = str(tmp_path / "fmt.png")
    with open(p, "wb") as f:
        f.write(_encode_png(img, 2, bitdepth=bitdepth))
    got_c = native.read_png_rgb01(p)
    got_py = read_png_rgb01_py(p)
    assert got_c.shape == (9, 11, 3)
    np.testing.assert_allclose(got_c, got_py, atol=1e-6)
    # gray broadcast / alpha drop semantics
    if channels in (1, 2):
        np.testing.assert_allclose(got_c[..., 0], got_c[..., 1])
    if channels >= 3:
        np.testing.assert_allclose(
            got_c, img[..., :3].astype(np.float32) / maxv, atol=1e-6)


def test_png_roundtrip_native_writer(tmp_path):
    img8 = (np.random.RandomState(3).rand(20, 30, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "rt.png")
    native.write_png(p, img8)
    np.testing.assert_allclose(
        native.read_png_rgb01(p), img8.astype(np.float32) / 255.0, atol=1e-6)


def test_png_read_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.png")
    with open(p, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot really a png at all")
    with pytest.raises(IOError):
        native.read_png_rgb01(p)
    from bmfr_tpu.io.png import read_png_rgb01_py

    with pytest.raises(ValueError):
        read_png_rgb01_py(p)


def test_exr_rejects_corrupt_chunk_y_origin(tmp_path, img):
    """ADVICE medium #1: a crafted chunk y0 outside the data window must be
    rejected, not written out of bounds (heap corruption in round 1)."""
    p = str(tmp_path / "evil.exr")
    native.write_exr(p, img, compression="none")
    with open(p, "rb") as f:
        buf = bytearray(f.read())
    # NONE compression, H=48 scanline chunks; the last chunk occupies the
    # final 8 + W*3*4 bytes. Patch its y0 (first 4 bytes) to a huge
    # negative value.
    chunk_size = 8 + img.shape[1] * 3 * 4
    import struct

    struct.pack_into("<i", buf, len(buf) - chunk_size, -(1 << 30))
    with open(p, "wb") as f:
        f.write(buf)
    with pytest.raises(IOError, match="y origin"):
        native.read_exr(p)
    # python twin must reject it too (any error is fine, no crash/UB there)
    from bmfr_tpu.io.exr_py import read_exr_py

    with pytest.raises(Exception):
        read_exr_py(p)


def test_exr_rejects_truncated_raw_chunk(tmp_path, img):
    p = str(tmp_path / "short.exr")
    native.write_exr(p, img, compression="none")
    with open(p, "rb") as f:
        buf = bytearray(f.read())
    # shrink the last chunk's declared packed size below a full scanline
    chunk_size = 8 + img.shape[1] * 3 * 4
    import struct

    struct.pack_into("<I", buf, len(buf) - chunk_size + 4, 8)
    with open(p, "wb") as f:
        f.write(buf[:len(buf) - chunk_size + 16])
    with pytest.raises(IOError):
        native.read_exr(p)


def test_exr_rle_compresses_flat_image(tmp_path):
    # half-float data is what the EXR byte predictor is designed for
    flat = np.full((48, 64, 3), 0.25, np.float32)
    p_rle = str(tmp_path / "flat_rle.exr")
    p_none = str(tmp_path / "flat_none.exr")
    native.write_exr(p_rle, flat, half=True, compression="rle")
    native.write_exr(p_none, flat, half=True, compression="none")
    import os as _os

    assert _os.path.getsize(p_rle) < _os.path.getsize(p_none) / 4
    np.testing.assert_array_equal(native.read_exr(p_rle), flat)
