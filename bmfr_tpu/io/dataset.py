"""Dataset descriptor + loading for the TUNI BMFR scene layout.

The reference hard-codes one scene per build: four EXR series named
``color``/``shading_normal``/``world_position``/``albedo`` + ``NN.exr``
(opencl/bmfr.cpp:49-52) and a generated ``camera_matrices.h``
(opencl/bmfr.cpp:46-47) in one directory. Here a scene is a runtime object;
all seven dataset scenes (README.md:10-12) can be enumerated and loaded
concurrently. Loading is threaded (native C++ loader when built, Python
thread pool otherwise) — the equivalent of the OpenMP parallel-for
(opencl/bmfr.cpp:259-307).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np

from .camera import parse_camera_matrices_header
from .exr import read_image_file
from . import native

#: The seven scenes of the TUNI dataset (README.md:10-12).
TUNI_SCENES = (
    "classroom", "living-room", "san-miguel", "sponza",
    "sponza-glossy", "sponza-moving-light", "crytek-sponza",
)

BUFFER_NAMES = ("color", "shading_normal", "world_position", "albedo")


@dataclass
class SceneDescriptor:
    """One scene directory: EXR series + camera header."""

    path: str
    frame_count: int = 60
    width: int = 1280
    height: int = 720

    def buffer_path(self, buffer: str) -> str:
        return os.path.join(self.path, buffer)

    def camera_header_path(self) -> str:
        return os.path.join(self.path, "camera_matrices.h")

    def load_camera(self):
        return parse_camera_matrices_header(self.camera_header_path())

    def load_frames(self, frames=None, threads=0):
        """Load all four buffer series (one parallel batch across all
        series — the OpenMP-parallel load of opencl/bmfr.cpp:259-307).
        Returns dict of f32[T,H,W,3] plus camera data merged in."""
        frames = list(range(self.frame_count)) if frames is None else list(frames)
        threads = threads or (os.cpu_count() or 8)
        out = {}
        if native.available():
            paths = []
            for buf in BUFFER_NAMES:
                base = self.buffer_path(buf)
                paths += [f"{base}{f}.exr" for f in frames]
            arr = native.load_frames(
                paths, self.width, self.height, 3, threads)
            n = len(frames)
            for i, buf in enumerate(BUFFER_NAMES):
                out[buf] = arr[i * n:(i + 1) * n]
        else:
            for buf in BUFFER_NAMES:
                out[buf] = np.empty(
                    (len(frames), self.height, self.width, 3), np.float32)

            def load_one(job):
                buf, i, f = job
                res, img = read_image_file(
                    self.buffer_path(buf), f, (self.height, self.width))
                if not res:
                    raise IOError(res.error_message)
                out[buf][i] = img

            jobs = [(buf, i, f) for buf in BUFFER_NAMES
                    for i, f in enumerate(frames)]
            with ThreadPoolExecutor(max_workers=threads) as ex:
                list(ex.map(load_one, jobs))
        cam = self.load_camera()
        out["camera_matrices"] = cam["camera_matrices"][frames]
        out["pixel_offsets"] = cam["pixel_offsets"][frames]
        out["position_limit_squared"] = cam["position_limit_squared"]
        out["normal_limit_squared"] = cam["normal_limit_squared"]
        # pipeline-facing aliases
        out["noisy"] = out.pop("color")
        out["normals"] = out.pop("shading_normal")
        out["positions"] = out.pop("world_position")
        return out


def probe_scene(path: str) -> SceneDescriptor:
    """Build a descriptor with dimensions/frame count detected from the
    files (the reference hard-codes 1280x720x60, opencl/bmfr.cpp:39-42,
    with a TODO to auto-detect — done here)."""
    from .exr import read_exr

    img = read_exr(os.path.join(path, "color0.exr"))
    n = 0
    while os.path.exists(os.path.join(path, f"color{n}.exr")):
        n += 1
    return SceneDescriptor(path=path, frame_count=n,
                           width=img.shape[1], height=img.shape[0])


def discover_scenes(root: str):
    """Find scene directories under ``root`` (any directory holding a
    camera_matrices.h and a color0.exr), with auto-detected geometry."""
    scenes = []
    for name in sorted(os.listdir(root)):
        p = os.path.join(root, name)
        if (os.path.isdir(p)
                and os.path.exists(os.path.join(p, "camera_matrices.h"))
                and os.path.exists(os.path.join(p, "color0.exr"))):
            scenes.append(probe_scene(p))
    return scenes
