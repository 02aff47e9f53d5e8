"""Dataset layer: export -> discover -> load round-trip (TUNI layout)."""

import numpy as np
import pytest

from bmfr_tpu.io import native
from bmfr_tpu.io.camera import parse_camera_matrices_header
from bmfr_tpu.io.dataset import SceneDescriptor, discover_scenes
from bmfr_tpu.io.export import export_scene
from bmfr_tpu.io.fixtures import synthetic_sequence


@pytest.fixture(scope="module")
def on_disk_scene(tmp_path_factory):
    if not native.available():
        pytest.skip("native IO library not built")
    sc = synthetic_sequence(width=64, height=48, frames=3, seed=1)
    root = tmp_path_factory.mktemp("scenes")
    export_scene(sc, str(root / "testscene"))
    return sc, str(root)


def test_discover_and_load(on_disk_scene):
    sc, root = on_disk_scene
    scenes = discover_scenes(root)
    assert len(scenes) == 1
    sd = scenes[0]
    sd.frame_count, sd.width, sd.height = 3, 64, 48
    data = sd.load_frames()
    np.testing.assert_array_equal(data["noisy"], sc["noisy"])
    np.testing.assert_array_equal(data["normals"], sc["normals"])
    np.testing.assert_array_equal(data["positions"], sc["positions"])
    np.testing.assert_array_equal(data["albedo"], sc["albedo"])
    np.testing.assert_allclose(
        data["camera_matrices"], sc["camera_matrices"], rtol=1e-6)
    np.testing.assert_allclose(
        data["pixel_offsets"], sc["pixel_offsets"], rtol=1e-6)
    assert data["position_limit_squared"] == pytest.approx(0.03)
    assert data["normal_limit_squared"] == pytest.approx(0.5)


def test_camera_header_parser_formats():
    text = """
    // generated header
    const float camera_matrices[2][4][4] = {
        { {1.0f, 0.0f, 0.0f, 0.0f}, {0.0f, 1.0f, 0.0f, 0.0f},
          {0.0f, 0.0f, 1.0f, 0.0f}, {0.0f, 0.0f, 0.0f, 1.0f} },
        { {2e-1f, -0.5f, .25f, 1e3f}, {0,0,0,0}, {0,0,0,0}, {0,0,0,1} },
    };
    const float pixel_offsets[2][2] = { {0.5f, 0.5f}, {0.25f, 0.75f} };
    const float position_limit_squared = 0.001f;
    const float normal_limit_squared = 1.0f;
    """
    d = parse_camera_matrices_header(text)
    assert d["camera_matrices"].shape == (2, 4, 4)
    assert d["camera_matrices"][1, 0, 0] == pytest.approx(0.2)
    assert d["camera_matrices"][1, 0, 3] == pytest.approx(1000.0)
    assert d["pixel_offsets"][1, 1] == pytest.approx(0.75)
    assert d["position_limit_squared"] == pytest.approx(0.001)


def test_scene_frame_subset(on_disk_scene):
    sc, root = on_disk_scene
    sd = SceneDescriptor(path=root + "/testscene", frame_count=3,
                         width=64, height=48)
    data = sd.load_frames(frames=[1, 2])
    assert data["noisy"].shape[0] == 2
    np.testing.assert_array_equal(data["noisy"][0], sc["noisy"][1])
