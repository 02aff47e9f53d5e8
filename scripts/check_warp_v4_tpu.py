"""Hardware check of the fused warp kernel: does it compile on the
real TPU and is the fused output bit-identical to the packed-gather
reference on real reprojection fields? (Named for the round-3 'v4'
exact-origin kernel it was written to validate; that kernel turned out
NOT to compile — Mosaic rejects unaligned dynamic DMA origins — and the
shipped kernel is back to aligned origins + in-kernel rolls. This check
is version-neutral and remains the fastest whole-kernel hardware
smoke.)"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bmfr_tpu.config import BMFRConfig
    from bmfr_tpu.io.fixtures import synthetic_sequence
    from bmfr_tpu.ops.gather import floor_int
    from bmfr_tpu.ops.reproject import reproject_coords
    from bmfr_tpu.ops.warp import gather_taps
    from bmfr_tpu.ops.warp_pallas import (
        _mask_bits, blend_from_taps, warp_blend_pallas)

    H, W = 720, 1280
    cfg = BMFRConfig(image_width=W, image_height=H,
                     position_limit_squared=0.03,
                     normal_limit_squared=0.5,
                     warp_mode="pallas").validate()
    sc = synthetic_sequence(width=W, height=H, frames=3)
    rng = np.random.default_rng(0)
    stacked = jnp.asarray(rng.random((16, H, W)).astype(np.float32))
    t = 2
    pos = jnp.asarray(np.moveaxis(sc["positions"][t], -1, 0)
                      .astype(np.float32))
    cur6 = jnp.concatenate(
        [pos, jnp.asarray(np.moveaxis(sc["normals"][t], -1, 0)
                          .astype(np.float32))], axis=0)
    cam = jnp.asarray(sc["camera_matrices"][t - 1])
    off = jnp.asarray(sc["pixel_offsets"][t])

    pfx, pfy = reproject_coords(cfg, pos, cam, off)

    t0 = time.time()
    fused = jax.jit(lambda st, c6, px, py: warp_blend_pallas(
        cfg, st, c6, px, py))
    planes, stats = fused(stacked, cur6, pfx, pfy)
    planes = np.asarray(planes)
    print(f"compile+run {time.time()-t0:.1f}s  stats={np.asarray(stats)}")

    # reference: exact packed-tap blend
    ix = floor_int(pfx)
    iy = floor_int(pfy)
    fx = pfx - ix.astype(jnp.float32)
    fy = pfy - iy.astype(jnp.float32)
    bits = _mask_bits(iy, ix, H, W)
    taps = gather_taps(stacked, iy, ix, mode="packed_x_bf16")
    want = np.asarray(jax.jit(blend_from_taps, static_argnums=0)(
        cfg, taps[0], taps[1], taps[2], taps[3], cur6, bits, fx, fy))

    diff = np.abs(planes - want)
    print("max|diff| =", float(diff.max()),
          "(kernel tier agrees to ~1e-5 on hardware — Mosaic FMA "
          "association, DIVERGENCES.md #11)")
    assert float(diff.max()) <= 2e-5
    print("V4 OK")


if __name__ == "__main__":
    main()
