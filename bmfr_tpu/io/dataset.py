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

#: Candidate series names for the dataset's 4096-spp reference renders
#: (README.md:10-12 — the dataset ships them; naming varies by mirror).
REFERENCE_EXR_CANDIDATES = (
    "reference", "clean", "ref", "reference/reference", "clean/clean",
)

#: Candidate locations of the OpenCL implementation's own tone-mapped
#: outputs (written as outputs/output<N>.png, opencl/bmfr.cpp:53,528).
OPENCL_PNG_CANDIDATES = (
    "outputs/output", "opencl_outputs/output", "opencl/output",
)


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


    def find_reference_exr(self):
        """Series prefix of the scene's clean (4096-spp) EXR renders, or
        None when the dataset mirror doesn't ship them."""
        for cand in REFERENCE_EXR_CANDIDATES:
            if os.path.exists(os.path.join(self.path, f"{cand}0.exr")):
                return cand
        return None

    def find_opencl_png(self):
        """Series prefix of the OpenCL reference implementation's output
        PNGs (opencl/bmfr.cpp:53,528), or None."""
        for cand in OPENCL_PNG_CANDIDATES:
            if os.path.exists(os.path.join(self.path, f"{cand}0.png")):
                return cand
        return None

    def load_references(self, frames=None, threads=0):
        """Load whatever golden references exist for this scene.

        Returns a dict with up to two keys:
          * ``clean``: f32[T,H,W,3] linear 4096-spp renders (EXR);
          * ``opencl``: f32[T,H,W,3] in [0,1] — the OpenCL implementation's
            tone-mapped output PNGs, for the BASELINE "within 0.1 dB of the
            OpenCL reference" comparison.
        Missing series are simply absent from the dict.
        """
        frames = (list(range(self.frame_count)) if frames is None
                  else list(frames))
        threads = threads or (os.cpu_count() or 8)
        out = {}
        exr_prefix = self.find_reference_exr()
        if exr_prefix is not None:
            base = os.path.join(self.path, exr_prefix)
            paths = [f"{base}{f}.exr" for f in frames]
            if native.available():
                out["clean"] = native.load_frames(
                    paths, self.width, self.height, 3, threads)
            else:
                imgs = np.empty(
                    (len(frames), self.height, self.width, 3), np.float32)

                def load_one(i):
                    res, img = read_image_file(
                        base, frames[i], (self.height, self.width))
                    if not res:
                        raise IOError(res.error_message)
                    imgs[i] = img

                with ThreadPoolExecutor(max_workers=threads) as ex:
                    list(ex.map(load_one, range(len(frames))))
                out["clean"] = imgs
        png_prefix = self.find_opencl_png()
        if png_prefix is not None:
            from .png import read_png_rgb01

            base = os.path.join(self.path, png_prefix)
            imgs = np.empty(
                (len(frames), self.height, self.width, 3), np.float32)

            def load_png(i):
                imgs[i] = read_png_rgb01(f"{base}{frames[i]}.png")

            with ThreadPoolExecutor(max_workers=threads) as ex:
                list(ex.map(load_png, range(len(frames))))
            out["opencl"] = imgs
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
