"""Cost of dynamic lane/sublane pltpu.roll inside a tile loop, and the
real warp kernel with rolls ablated — isolates the kernel's hot part."""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_IT = 20
C, WH, TW = 16, 48, 512
NT = 225


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


def make_tile_loop(mode):
    """A kernel that per tile does one window DMA + the op under test +
    an output DMA, 225 tiles."""

    def kern(amt_ref, src_hbm, out_hbm, win, stage, sem_w, sem_o):
        def body(i, _):
            wo = pl.multiple_of((i % 8) * 16, 8)
            dw = pltpu.make_async_copy(
                src_hbm.at[:, pl.ds(wo, WH), :], win, sem_w)
            dw.start()
            dw.wait()
            a = amt_ref[i]
            x = win[...]
            if mode == "none":
                y = x
            elif mode == "lane":
                y = pltpu.roll(x, shift=TW - a, axis=2)
            elif mode == "sublane":
                y = pltpu.roll(x, shift=WH - (a & 7), axis=1)
            elif mode == "both":
                y = pltpu.roll(x, shift=TW - a, axis=2)
                y = pltpu.roll(y, shift=WH - (a & 7), axis=1)
            elif mode == "lane_static":
                y = pltpu.roll(x, shift=17, axis=2)
            stage[...] = y[:, 0:16, 0:256]
            do = pltpu.make_async_copy(
                stage, out_hbm.at[:, pl.ds((i % 45) * 16, 16), :], sem_o)
            do.start()
            do.wait()
            return 0

        jax.lax.fori_loop(0, NT, body, 0)

    @jax.jit
    def run(amt, src):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((C, 720, 256), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((C, WH, TW), jnp.int32),
                pltpu.VMEM((C, 16, 256), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(amt, src)

    return run


def main():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (C, 800, TW),
                                   dtype=np.int64).astype(np.int32))
    amt = jnp.asarray(rng.integers(0, 128, NT).astype(np.int32))

    for mode in ("none", "lane_static", "lane", "sublane", "both"):
        run = make_tile_loop(mode)

        def loop(n, amt, src):
            def body(i, carry):
                s, acc = carry
                out = run(amt + (s % 2), src)
                v = out[0, 0, 0]
                return v & 7, acc + v
            return jax.lax.fori_loop(0, n, body,
                                     (jnp.int32(0), jnp.int32(0)))[1]

        t = amortized(loop, amt, src)
        print(f"  {mode:12s}: {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
