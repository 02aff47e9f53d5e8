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
