"""Is lax.cond executing both warp branches? Time the full path vs a
variant whose fallback branch is trivial, plus a true plan cost (full
sel consumed)."""

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


def warp_no_fallback(src_packed, iy, ix):
    """warp_rows_pallas with the fallback branch stubbed to zeros."""
    from bmfr_tpu.ops import warp_pallas as wp

    C, H, W = src_packed.shape
    nty, ntx = -(-H // wp.TH), -(-W // wp.TC)
    plan = wp._plan(src_packed, iy, ix)
    Hk, Wk = nty * wp.TH, ntx * wp.TC
    kernel = functools.partial(wp._warp_kernel, C, nty, ntx)

    iy0 = jnp.clip(iy, 0, H - 1)
    iy1 = jnp.clip(iy + 1, 0, H - 1)
    ixc = jnp.clip(ix, 0, W - 1)
    flat0 = (iy0 * W + ixc).ravel()
    flat1 = (iy1 * W + ixc).ravel()
    src_flat = src_packed.reshape(C, H * W)

    out = pl.pallas_call(
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
    )(plan.wo, jnp.concatenate([plan.ra, plan.xo128]),
      plan.cls_y, plan.cls_x, plan.src_pad, plan.sel)
    row0k = out[0, :, :H, :W]
    row1k = out[1, :, :H, :W]

    idx = jnp.nonzero(plan.uncovered.ravel(), size=wp.FIXUP_K,
                      fill_value=0)[0].astype(jnp.int32)
    v0 = src_flat[:, flat0[idx]]
    v1 = src_flat[:, flat1[idx]]
    r0 = row0k.reshape(C, H * W).at[:, idx].set(v0).reshape(C, H, W)
    r1 = row1k.reshape(C, H * W).at[:, idx].set(v1).reshape(C, H, W)
    return r0, r1


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

    def loop(fn):
        def run(n, src, iy0, ix0):
            def body(i, carry):
                s, acc = carry
                r0, r1 = fn(src, iy0 + (s % 2), ix0)
                v = r0[0, 0, 0]
                return v & 7, acc + v + r1[0, 0, 0]
            return jax.lax.fori_loop(0, n, body,
                                     (jnp.int32(0), jnp.int32(0)))[1]
        return run

    t_nf = amortized(loop(warp_no_fallback), src, iy, ix)
    print(f"no-fallback variant: {t_nf*1e3:7.3f} ms", flush=True)

    t_full = amortized(loop(wp.warp_rows_pallas), src, iy, ix)
    print(f"full path (cond):    {t_full*1e3:7.3f} ms", flush=True)

    # true plan cost (whole sel consumed)
    def plan_loop(n, src, iy0, ix0):
        def body(i, carry):
            s, acc = carry
            p = wp._plan(src, iy0 + (s % 2), ix0)
            v = jnp.sum(p.sel[::17, ::13]) + jnp.sum(p.wo) + p.n_uncovered
            return v.astype(jnp.int32) & 7, acc + v.astype(jnp.int32)
        return jax.lax.fori_loop(0, n, body, (jnp.int32(0), jnp.int32(0)))[1]

    t_plan = amortized(plan_loop, src, iy, ix)
    print(f"plan (sel consumed): {t_plan*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
