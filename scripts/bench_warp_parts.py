"""Amortized cost breakdown of the v2 warp path: plan / kernel / fixup."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    from bmfr_tpu.ops.gather import floor_int
    from bmfr_tpu.ops.reproject import reproject_coords
    from bmfr_tpu.ops import warp_pallas as wp

    H, W, C = 720, 1280, 16
    cfg = BMFRConfig(image_width=W, image_height=H).validate()
    sc = synthetic_sequence(width=W, height=H, frames=6)
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

    iy, ix = field(pos[4], cams[3], offs[4])
    plan = jax.jit(wp._plan)(src, iy, ix)
    print("class histograms:",
          np.bincount(np.asarray(plan.cls_y), minlength=4),
          np.bincount(np.asarray(plan.cls_x), minlength=4),
          "n_uncovered:", int(plan.n_uncovered), file=sys.stderr)

    # --- plan alone ---
    def plan_loop(n, src, iy0, ix0):
        def body(i, carry):
            s, acc = carry
            p = wp._plan(src, iy0 + (s % 2), ix0)
            v = p.sel[0, 0]
            return v & 7, acc + v + p.n_uncovered
        return jax.lax.fori_loop(0, n, body, (jnp.int32(0), jnp.int32(0)))[1]

    tplan = amortized(plan_loop, src, iy, ix)
    print(f"plan:   {tplan*1e3:7.3f} ms", flush=True)

    # --- kernel alone (plan precomputed; perturb wo to defeat hoisting) ---
    nty, ntx = -(-H // wp.TH), -(-W // wp.TC)
    Hk, Wk = nty * wp.TH, ntx * wp.TC
    kernel = functools.partial(wp._warp_kernel, C, nty, ntx)

    def run_kernel(p_wo, p_raxo, p_cy, p_cx, p_src, p_sel):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2, C, Hk, Wk), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
            + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((C, wp.WH, wp.TW), jnp.int32),
                pltpu.VMEM((2 * wp.TH, wp.TW), jnp.int32),
                pltpu.VMEM((2, C, wp.TH, wp.TC), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(p_wo, p_raxo, p_cy, p_cx, p_src, p_sel)

    raxo = jnp.concatenate([plan.ra, plan.xo128])

    def kern_loop(n, wo, raxo, cy, cx, srcp, sel):
        def body(i, carry):
            s, acc = carry
            out = run_kernel(wo + (s & 0) * 8, raxo, cy, cx, srcp, sel)
            v = out[0, 0, 0, 0]
            return v & 7, acc + v
        return jax.lax.fori_loop(0, n, body, (jnp.int32(0), jnp.int32(0)))[1]

    tker = amortized(kern_loop, plan.wo, raxo, plan.cls_y, plan.cls_x,
                     plan.src_pad, plan.sel)
    print(f"kernel: {tker*1e3:7.3f} ms", flush=True)

    # --- fixup alone ---
    iy0 = jnp.clip(iy, 0, H - 1)
    ixc = jnp.clip(ix, 0, W - 1)
    flat0 = (iy0 * W + ixc).ravel()
    row0k = jnp.zeros((C, H, W), jnp.int32)

    def fix_loop(n, uncov, flat0, src, row0k):
        src_flat = src.reshape(C, H * W)

        def body(i, carry):
            s, acc = carry
            u = uncov if True else uncov
            idx = jnp.nonzero(u.ravel(), size=wp.FIXUP_K,
                              fill_value=0)[0].astype(jnp.int32) + (s % 2)
            v0 = src_flat[:, flat0[idx]]
            r0 = row0k.reshape(C, H * W).at[:, idx].set(v0)
            v = r0[0, 0]
            return v & 7, acc + v
        return jax.lax.fori_loop(0, n, body, (jnp.int32(0), jnp.int32(0)))[1]

    tfix = amortized(fix_loop, plan.uncovered, flat0, src, row0k)
    print(f"fixup (one row set): {tfix*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
