"""On-chip bench: v2 Pallas warp kernel vs the XLA gather pair, with
coverage statistics on the synthetic bench scene's real reprojection.
Amortized timing (per-call dispatch on this stack is ~25-30 ms)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

N_IT = 20


def amortized(fn_loop, *args):
    f1 = jax.jit(lambda *a: fn_loop(1, *a))
    fN = jax.jit(lambda *a: fn_loop(N_IT, *a))
    float(jnp.sum(f1(*args)))
    float(jnp.sum(fN(*args)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(f1(*args)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(fN(*args)))
        tN = time.perf_counter() - t0
        best = min(best, (tN - t1) / (N_IT - 1))
    return best


def main():
    from bmfr_tpu.config import BMFRConfig
    from bmfr_tpu.io.fixtures import synthetic_sequence
    from bmfr_tpu.ops.gather import floor_int, gather_planes
    from bmfr_tpu.ops.reproject import reproject_coords
    from bmfr_tpu.ops.warp_pallas import _plan, warp_rows_pallas

    H, W, C = 720, 1280, 16
    cfg = BMFRConfig(image_width=W, image_height=H).validate()
    sc = synthetic_sequence(width=W, height=H, frames=8)
    pos = jnp.asarray(np.moveaxis(sc["positions"], -1, 1))
    cams = jnp.asarray(sc["camera_matrices"])
    offs = jnp.asarray(sc["pixel_offsets"])

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(
        -2**31, 2**31 - 1, size=(C, H, W), dtype=np.int64).astype(np.int32))

    @jax.jit
    def field(p, c, o):
        pfx, pfy = reproject_coords(cfg, p, c, o)
        return floor_int(pfy), floor_int(pfx)

    print("per-frame uncovered counts (fix-up capacity 12288):",
          file=sys.stderr)
    plan_j = jax.jit(lambda s, a, b: _plan(s, a, b).n_uncovered)
    for t in range(1, 8):
        iy, ix = field(pos[t], cams[t - 1], offs[t])
        print(f"  frame {t}: uncovered={int(plan_j(src, iy, ix))}",
              file=sys.stderr, flush=True)

    # amortized timing on a steady frame's real field
    iy, ix = field(pos[4], cams[3], offs[4])

    def ploop(n, src, iy0, ix0):
        def body(i, carry):
            s, acc = carry
            iyd = iy0 + (s % 2)   # live dependence XLA cannot fold
            r0, r1 = warp_rows_pallas(src, iyd, ix0)
            v = r0[0, 0, 0]
            return v & 7, acc + v + r1[0, 0, 0]
        return jax.lax.fori_loop(0, n, body, (jnp.int32(0), jnp.int32(0)))[1]

    def xloop(n, src, iy0, ix0):
        def body(i, carry):
            s, acc = carry
            iyd = iy0 + (s % 2)
            r0 = gather_planes(src, iyd, ix0)
            r1 = gather_planes(src, iyd + 1, ix0)
            v = r0[0, 0, 0]
            return v & 7, acc + v + r1[0, 0, 0]
        return jax.lax.fori_loop(0, n, body, (jnp.int32(0), jnp.int32(0)))[1]

    tp = amortized(ploop, src, iy, ix)
    tx = amortized(xloop, src, iy, ix)

    # correctness on the real field
    r0p, r1p = jax.jit(warp_rows_pallas)(src, iy, ix)
    r0x = gather_planes(src, iy, ix)
    m0 = np.asarray((iy >= 0) & (iy <= H - 1)
                    & (ix >= -1) & (ix <= W - 1))[None]
    same = bool((np.where(m0, np.asarray(r0p), 0)
                 == np.where(m0, np.asarray(r0x), 0)).all())
    print(f"pallas: {tp*1e3:.3f} ms   xla pair: {tx*1e3:.3f} ms   "
          f"speedup {tx/tp:.1f}x   row0 match={same}")


if __name__ == "__main__":
    main()
