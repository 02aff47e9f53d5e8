"""Bisect the composed warp path: which combination step adds ~9 ms?"""
from __future__ import annotations
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_IT = 20

def amortized(fn_loop, *args):
    f1 = jax.jit(lambda *a: fn_loop(1, *a))
    fN = jax.jit(lambda *a: fn_loop(N_IT, *a))
    float(jnp.sum(f1(*args))); float(jnp.sum(fN(*args)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(jnp.sum(f1(*args))); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(jnp.sum(fN(*args))); tN = time.perf_counter() - t0
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
    src = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (C, H, W),
                                   dtype=np.int64).astype(np.int32))

    @jax.jit
    def field(p, c, o):
        pfx, pfy = reproject_coords(cfg, p, c, o)
        return floor_int(pfy), floor_int(pfx)
    iy, ix = field(pos[4], cams[3], offs[4])

    nty, ntx = -(-H // wp.TH), -(-W // wp.TC)
    Hk, Wk = nty * wp.TH, ntx * wp.TC
    kernel = functools.partial(wp._warp_kernel, C, nty, ntx)

    def run_kernel(plan):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2, C, Hk, Wk), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
            + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((C, wp.WH, wp.TW), jnp.int32),
                pltpu.VMEM((2 * wp.TH, wp.TW), jnp.int32),
                pltpu.VMEM((2, C, wp.TH, wp.TC), jnp.int32),
                pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(plan.wo, jnp.concatenate([plan.ra, plan.xo128]), plan.resid,
          plan.src_pad, plan.sel)

    def variant(mode):
        def fn(src, iy, ix):
            plan = wp._plan(src, iy, ix)
            if mode == "plan_only":
                return plan.sel[0:1, 0:1] + plan.wo[0]
            out = run_kernel(plan)
            if mode == "plan_kernel":
                return out[0, 0, 0:1, 0:1]
            iy0 = jnp.clip(iy, 0, H - 1); iy1 = jnp.clip(iy + 1, 0, H - 1)
            ixc = jnp.clip(ix, 0, W - 1)
            flat0 = (iy0 * W + ixc).ravel(); flat1 = (iy1 * W + ixc).ravel()
            src_flat = src.reshape(C, H * W)
            idx = jnp.nonzero(plan.uncovered.ravel(), size=wp.FIXUP_K,
                              fill_value=0)[0].astype(jnp.int32)
            v = jnp.concatenate([src_flat[:, flat0[idx]],
                                 src_flat[:, flat1[idx]]], axis=0)
            if mode == "no_scatter":
                return out[0, 0, 0:1, 0:1] + v[0, 0]
            rows = out[:, :, :H, :W].reshape(2 * C, H * W)
            rows = rows.at[:, idx].set(v)
            return rows[0, 0:1, None]
        return fn

    modes = (sys.argv[1:] if len(sys.argv) > 1
             else ["plan_only", "plan_kernel", "no_scatter", "full"])
    for mode in modes:
        fn = variant(mode)
        def loop(n, src, iy0, ix0):
            def body(i, carry):
                s, acc = carry
                r = fn(src, iy0 + (s % 2), ix0)
                v = r.reshape(-1)[0]
                return v & 7, acc + v
            return jax.lax.fori_loop(0, n, body, (jnp.int32(0), jnp.int32(0)))[1]
        t = amortized(loop, src, iy, ix)
        print(f"  {mode:12s}: {t*1e3:7.3f} ms", flush=True)

if __name__ == "__main__":
    main()
