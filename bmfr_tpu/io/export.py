"""Export a scene to the TUNI dataset directory layout.

Writes the four EXR series (``color``/``shading_normal``/``world_position``/
``albedo`` + ``NN.exr``, opencl/bmfr.cpp:49-52) and a ``camera_matrices.h``
with the same C-initializer shape the dataset generator produces
(consumed at opencl/bmfr.cpp:46-47, :226-227, :440-444). Used to create
on-disk test scenes and demo datasets from the synthetic renderer.
"""

from __future__ import annotations

import os

import numpy as np

from .exr import write_exr


def export_scene(scene: dict, path: str,
                 position_limit_squared=0.03, normal_limit_squared=0.5,
                 half: bool = False):
    os.makedirs(path, exist_ok=True)
    T = scene["noisy"].shape[0]
    series = {
        "color": scene["noisy"],
        "shading_normal": scene["normals"],
        "world_position": scene["positions"],
        "albedo": scene["albedo"],
    }
    for name, arr in series.items():
        for t in range(T):
            write_exr(os.path.join(path, f"{name}{t}.exr"),
                      arr[t], half=half)

    cams = np.asarray(scene["camera_matrices"], np.float64)
    offs = np.asarray(scene["pixel_offsets"], np.float64)
    lines = [f"const float camera_matrices[{T}][4][4] = {{"]
    for t in range(T):
        rows = ",\n        ".join(
            "{" + ", ".join(f"{v:.9g}f" for v in cams[t, r]) + "}"
            for r in range(4))
        lines.append("    {\n        " + rows + "\n    },")
    lines.append("};")
    lines.append(f"const float pixel_offsets[{T}][2] = {{")
    for t in range(T):
        lines.append(
            "    {" + ", ".join(f"{v:.9g}f" for v in offs[t]) + "},")
    lines.append("};")
    lines.append(
        f"const float position_limit_squared = {position_limit_squared}f;")
    lines.append(
        f"const float normal_limit_squared = {normal_limit_squared}f;")
    with open(os.path.join(path, "camera_matrices.h"), "w") as f:
        f.write("\n".join(lines) + "\n")
