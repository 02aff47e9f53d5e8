"""Diagnose the fused Cholesky fitter's full-resolution parity collapse
(PARITY_FULLRES round 4: pallas_cholesky 8-12 dB vs oracle while the
Householder path sits at 60-120 dB; CPU interpret at the same width
matches to 3e-6, random data matches — scene data on hardware fails).

Hypothesis: degenerate blocks (flat normals/positions after the scale
conditional leave near-zero columns regularized only by the 1e-2
noise) make the f32 normal equations cancel to a non-positive pivot ->
NaN -> the w-guard zeroes the whole block -> black 32x32 squares.

Prints per-block comparison stats of fit_reconstruct_cholesky vs
fit_reconstruct_direct on one full-res synthetic-scene frame, on
whatever backend is active.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bmfr_tpu.config import BMFRConfig
    from bmfr_tpu.io.fixtures import synthetic_sequence
    from bmfr_tpu.ops.blockify import blockify_view
    from bmfr_tpu.ops.fitter_direct import (_pads_for_direct,
                                            fit_reconstruct_cholesky,
                                            fit_reconstruct_direct)

    H, W = 720, 1280
    cfg = BMFRConfig(image_width=W, image_height=H,
                     position_limit_squared=0.03,
                     normal_limit_squared=0.5).validate()
    sc = synthetic_sequence(width=W, height=H, frames=1, scene="orbit")
    to_chw = lambda a: jnp.asarray(
        np.moveaxis(a, -1, 0).astype(np.float32))
    raw9 = jnp.concatenate(
        [to_chw(sc["normals"][0]), to_chw(sc["positions"][0]),
         to_chw(sc["noisy"][0])], axis=0)
    mw_pad = _pads_for_direct(cfg)[1]
    f = jnp.int32(1)
    view = blockify_view(cfg, raw9, f, width=mw_pad)
    a = np.asarray(jax.jit(
        lambda v: fit_reconstruct_direct(cfg, v, f))(view))
    b = np.asarray(jax.jit(
        lambda v: fit_reconstruct_cholesky(cfg, v, f))(view))
    print("backend:", jax.default_backend())
    print("householder: finite", np.isfinite(a).all(),
          "range", a.min(), a.max())
    print("cholesky:    finite", np.isfinite(b).all(),
          "range", b.min(), b.max())
    d = np.abs(a - b)
    print("max|diff|", d.max(), " mean", d.mean())
    # per-block stats over the margins grid
    be = cfg.block_edge
    nby, nbx = view.shape[1] // be, view.shape[2] // be
    db = d[:, :nby * be, :nbx * be].reshape(3, nby, be, nbx, be)
    bmax = db.max(axis=(0, 2, 4))                    # [nby, nbx]
    bad = np.argwhere(bmax > 1e-2)
    print(f"blocks with max|diff| > 1e-2: {len(bad)} / {nby * nbx}")
    # is the cholesky output ~zero there (the NaN->0 guard signature)?
    bb = np.abs(b[:, :nby * be, :nbx * be]).reshape(
        3, nby, be, nbx, be).max(axis=(0, 2, 4))
    if len(bad):
        zero_blocks = sum(1 for y, x in bad if bb[y, x] < 1e-6)
        print(f"  of those, cholesky-output ~ZERO blocks: {zero_blocks}")
        y, x = bad[0]
        print(f"  example block ({y},{x}): householder max "
              f"{np.abs(a[:, y*be:(y+1)*be, x*be:(x+1)*be]).max():.4f}, "
              f"cholesky max {bb[y, x]:.4e}")


if __name__ == "__main__":
    main()
