"""Synthetic test scenes: an analytic G-buffer renderer.

The reference is verified only against the 19 GB TUNI dataset (README.md:8-14)
which is not redistributable here, so the test strategy (SURVEY.md §4)
replaces it with a deterministic synthetic scene: a sphere on a ground plane
under a directional light, viewed by an orbiting jittered camera. The
generator emits exactly the reference's input contract
(opencl/bmfr.cpp:49-52 and the camera_matrices.h symbols at :440-444):

* ``normals``, ``world_position``, ``albedo`` — analytic G-buffer
* ``noisy`` — 1-spp-like Monte-Carlo-noised diffuse shading
* ``clean`` — the converged shading (stand-in for the 4096-spp references)
* ``camera_matrices[T,4,4]`` — stored so that its *columns* project, i.e.
  ``uv = wp4 @ M`` (matching opencl/bmfr.cl:342-347)
* ``pixel_offsets[T,2]`` — sub-pixel jitter in [0,1)

All arrays are channels-last numpy (host layout); convert at the device
boundary.
"""

from __future__ import annotations

import numpy as np


def _look_at(eye, center, up):
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float64)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[:3, 3] = -m[:3, :3] @ eye
    return m


def _perspective(fov_y, aspect, near, far):
    t = 1.0 / np.tan(fov_y / 2)
    m = np.zeros((4, 4), dtype=np.float64)
    m[0, 0] = t / aspect
    m[1, 1] = t
    m[2, 2] = (far + near) / (near - far)
    m[2, 3] = 2 * far * near / (near - far)
    m[3, 2] = -1.0
    return m


def _halton(i, b):
    f, r = 1.0, 0.0
    while i > 0:
        f /= b
        r += f * (i % b)
        i //= b
    return r


_LIGHT = np.array([0.408, 0.816, 0.408])
_SPHERE_C = np.array([0.0, 0.0, 0.0])
_SPHERE_R = 1.0
_PLANE_Y = -1.0


def _render_gbuffer(vp, eye, width, height, ox, oy):
    """Analytic G-buffer for one camera at one sub-pixel offset.

    Returns dict of HWC arrays: positions, normals, albedo, irr (clean
    irradiance), miss mask.
    """
    xs = np.arange(width)[None, :] + ox
    ys = np.arange(height)[:, None] + (1.0 - oy)
    ndc_x = np.broadcast_to(2.0 * xs / width - 1.0, (height, width))
    ndc_y = np.broadcast_to(2.0 * ys / height - 1.0, (height, width))

    inv = np.linalg.inv(vp)

    def unproject(z):
        clip = np.stack(
            [ndc_x, ndc_y, np.full_like(ndc_x, z), np.ones_like(ndc_x)],
            axis=-1)
        wp = clip @ inv.T
        return wp[..., :3] / wp[..., 3:4]

    p0 = unproject(-1.0)
    p1 = unproject(0.9)
    d = p1 - p0
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(eye, d.shape)

    oc = o - _SPHERE_C
    b = np.sum(oc * d, axis=-1)
    c = np.sum(oc * oc, axis=-1) - _SPHERE_R**2
    disc = b * b - c
    t_sph = np.where(disc >= 0, -b - np.sqrt(np.maximum(disc, 0.0)), np.inf)
    t_sph = np.where(t_sph > 1e-3, t_sph, np.inf)

    t_pl = (_PLANE_Y - o[..., 1]) / d[..., 1]
    t_pl = np.where(t_pl > 1e-3, t_pl, np.inf)

    t_hit = np.minimum(t_sph, t_pl)
    hit_sphere = t_sph <= t_pl
    t_safe = np.where(np.isfinite(t_hit), t_hit, 50.0)
    pos = o + t_safe[..., None] * d

    n_sph = pos - _SPHERE_C
    n_sph = n_sph / np.linalg.norm(n_sph, axis=-1, keepdims=True)
    n_pl = np.broadcast_to(np.array([0.0, 1.0, 0.0]), pos.shape)
    normal = np.where(hit_sphere[..., None], n_sph, n_pl)

    checker = ((np.floor(pos[..., 0]) + np.floor(pos[..., 2])) % 2)
    alb_pl = np.stack([0.8 - 0.5 * checker, 0.7 - 0.3 * checker,
                       0.6 - 0.2 * checker], axis=-1)
    alb_sph = np.broadcast_to(np.array([0.85, 0.45, 0.25]), pos.shape)
    albedo = np.where(hit_sphere[..., None], alb_sph, alb_pl)
    miss = ~np.isfinite(t_hit)
    albedo = np.where(miss[..., None], 0.05, albedo)

    ndl = np.maximum(np.sum(normal * _LIGHT, axis=-1), 0.0)
    irr = (0.25 + 0.75 * ndl)[..., None] * np.ones(3)
    irr = np.where(miss[..., None], 0.3, irr)
    return dict(positions=np.where(miss[..., None], 0.0, pos),
                normals=np.where(miss[..., None], 0.0, normal),
                albedo=albedo, irr=irr, miss=miss)


def synthetic_sequence(width=64, height=48, frames=4, seed=0,
                       noise_scale=0.35, orbit_step=0.02, aa_samples=1):
    """Render a deterministic synthetic sequence.

    Returns a dict of numpy arrays:
      normals/positions/albedo/noisy/clean: ``f32[T, H, W, 3]``
      clean_aa: supersampled clean render (only if ``aa_samples > 1``) —
        the fair reference for the anti-aliasing TAA output
      camera_matrices: ``f32[T, 4, 4]`` (column-projecting storage)
      pixel_offsets: ``f32[T, 2]``
    """
    rng = np.random.RandomState(seed)
    T = frames
    keys = ["normals", "positions", "albedo", "noisy", "clean"]
    if aa_samples > 1:
        keys.append("clean_aa")
    out = {k: np.zeros((T, height, width, 3), np.float32) for k in keys}
    cams = np.zeros((T, 4, 4), np.float32)
    offsets = np.array(
        [[_halton(t + 1, 2), _halton(t + 1, 3)] for t in range(T)],
        np.float32)

    for t in range(T):
        ang = 0.7 + orbit_step * t
        eye = np.array([3.2 * np.cos(ang), 1.2 + 0.05 * t, 3.2 * np.sin(ang)])
        view = _look_at(eye, np.array([0.0, -0.2, 0.0]),
                        np.array([0.0, 1.0, 0.0]))
        proj = _perspective(np.deg2rad(50.0), width / height, 0.1, 100.0)
        vp = proj @ view
        # Stored transposed so that *columns* project (opencl/bmfr.cl:342-347)
        cams[t] = vp.T.astype(np.float32)

        ox, oy = offsets[t]
        g = _render_gbuffer(vp, eye, width, height, ox, oy)

        noise = rng.gamma(shape=1.0 / max(noise_scale, 1e-6) ** 2,
                          scale=noise_scale**2, size=g["irr"].shape)
        out["positions"][t] = g["positions"]
        out["normals"][t] = g["normals"]
        out["albedo"][t] = g["albedo"]
        out["clean"][t] = (g["albedo"] * g["irr"]).astype(np.float32)
        out["noisy"][t] = (g["irr"] * noise).astype(np.float32)

        if aa_samples > 1:
            acc = np.zeros((height, width, 3), np.float64)
            for s in range(aa_samples):
                sx = _halton(s + 1, 2)
                sy = _halton(s + 1, 3)
                gs = _render_gbuffer(vp, eye, width, height, sx, sy)
                acc += gs["albedo"] * gs["irr"]
            out["clean_aa"][t] = (acc / aa_samples).astype(np.float32)

    out["camera_matrices"] = cams
    out["pixel_offsets"] = offsets
    return out
