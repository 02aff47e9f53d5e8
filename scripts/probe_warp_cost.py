"""Decompose the fused warp kernel's 1.1 ms/frame on the real TPU.

Times warp_blend_pallas in a 30-step in-jit loop (inputs chained
through the output so nothing hoists/DCEs; ~25 ms dispatch amortizes to
<0.1 ms/step) under ablations:

  full          the shipped kernel (3 depth phases, rolls, blend)
  phase0-only   DEPTH_PHASES forced to ((4,8,32),)x3 — every tile uses
                the shallowest select stack (UNSOUND output for deep
                tiles; cost isolation only)
  phase2-only   ((16,20,40),)x3 — every tile pays the deepest stack

The full-vs-phase0 delta bounds what adaptive select depth still pays;
phase2-only bounds the worst case. Window DMA + loop + blend are
constant across the three.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

T = 30


def main():
    from bmfr_tpu.config import BMFRConfig
    from bmfr_tpu.ops import warp_pallas as wp

    H, W = 720, 1280
    cfg = BMFRConfig(image_width=W, image_height=H,
                     position_limit_squared=0.03,
                     normal_limit_squared=0.5,
                     warp_mode="pallas").validate()
    rng = np.random.default_rng(0)
    stacked = jnp.asarray(rng.standard_normal((16, H, W)).astype(
        np.float32))
    cur6 = jnp.asarray(rng.standard_normal((6, H, W)).astype(np.float32))
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pfx0 = jnp.asarray((xx + 3.3 + 2 * np.sin(yy / 80)).astype(
        np.float32))
    pfy0 = jnp.asarray((yy - 2.1 + 1.5 * np.cos(xx / 95)).astype(
        np.float32))

    def run_loop(stacked, cur6, pfx0, pfy0):
        def body(c, _):
            pfx, pfy, s = c
            planes, stats = wp.warp_blend_pallas(cfg, stacked, cur6,
                                                 pfx, pfy)
            d = planes[0, 0, 0] * 1e-6
            return (pfx + d, pfy - d, s + jnp.sum(planes[:, ::8, ::8])), None
        (pfx, pfy, s), _ = jax.lax.scan(
            body, (pfx0, pfy0, jnp.float32(0)), None, length=T)
        return s

    def timed(name):
        f = jax.jit(run_loop)
        out = f(stacked, cur6, pfx0, pfy0)
        assert np.isfinite(float(out))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(stacked, cur6, pfx0, pfy0))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:<22} {best / T * 1e3:8.3f} ms/frame")

    orig = wp.DEPTH_PHASES
    timed("full (3 phases)")
    wp.DEPTH_PHASES = ((4, 8, 32),) * 3
    timed("phase0-only (4,8)")
    wp.DEPTH_PHASES = ((16, 20, 40),) * 3
    timed("phase2-only (16,20)")
    wp.DEPTH_PHASES = orig


if __name__ == "__main__":
    main()
