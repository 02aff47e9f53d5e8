"""Does a lane/sublane-UNALIGNED HBM window DMA origin compile, and how
does it perform vs the current 128-lane/8-sublane-aligned window fetch?

The fused warp kernel currently rounds each tile's window origin down to
(8, 128) alignment and undoes the slack with two in-kernel rolls, which
forces a [8, 40, 512] fetch for a [16, 256] tile (5x overfetch). If the
DMA engine takes arbitrary origins at full speed, the window shrinks to
[8, 33, 277-384] and the rolls disappear.
"""

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


def make(NT, WH, TW, align):
    def kern(wo_ref, xo_ref, src_hbm, out_hbm, win2, acc, sem_w, sem_o):
        def dma(k, slot):
            i = k
            wo = wo_ref[i]
            xo = xo_ref[i]
            if align:
                wo = pl.multiple_of(wo, 8)
                xo = pl.multiple_of(xo, 128)
            return pltpu.make_async_copy(
                src_hbm.at[:, pl.ds(wo, WH), pl.ds(xo, TW)],
                win2.at[slot], sem_w.at[slot])

        dma(0, 0).start()

        def body(k, _):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < NT)
            def _():
                dma(k + 1, 1 - slot).start()

            dma(k, slot).wait()
            # touch one row so the fetch isn't dead
            acc[...] = acc[...] + win2[slot, :, 0, :128]
            return 0

        jax.lax.fori_loop(0, NT, body, 0)
        do = pltpu.make_async_copy(acc, out_hbm, sem_o)
        do.start()
        do.wait()

    return kern


def run_case(name, src, wo, xo, NT, WH, TW, align):
    kern = make(NT, WH, TW, align)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 8, WH, TW), jnp.int32),
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )

    def loop(n, wo, xo, src):
        # the kernel result must feed the carry LIVE: an `o[0,0] * 0`
        # dependence lets XLA dead-code-eliminate the pallas_call, and
        # the "measurement" then times an empty loop — this probe's
        # original version did exactly that, which is how the v4
        # unaligned-origin kernels shipped without ever compiling on a
        # real TPU (round-4 postmortem; Mosaic in fact REJECTS dynamic
        # sublane origins it cannot prove 8-aligned)
        def it(j, acc):
            o = f(wo + (acc % 2), xo + (acc % 2), src)
            return acc + (o[0, 0] & 1)
        return jax.lax.fori_loop(0, n, it, jnp.int32(0))

    try:
        ms = amortized(loop, wo, xo, src) * 1e3
        mb = NT * 8 * WH * TW * 4 / 1e6
        print(f"{name:<34}{ms:8.3f} ms   {mb:6.1f} MB  "
              f"{mb / ms:7.1f} GB/s")
    except Exception as e:
        print(f"{name:<34}FAILS: {type(e).__name__} "
              f"{str(e)[:120]}")


def main():
    Hp, Wp = 768, 1664
    NT = 225
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(-2**31, 2**31 - 1,
                                   (8, Hp, Wp)).astype(np.int32))
    wo_al = jnp.asarray(rng.integers(0, (Hp - 48) // 8, NT).astype(
        np.int32) * 8)
    xo_al = jnp.asarray(rng.integers(0, (Wp - 512) // 128, NT).astype(
        np.int32) * 128)
    wo_un = jnp.asarray(rng.integers(0, Hp - 48, NT).astype(np.int32))
    xo_un = jnp.asarray(rng.integers(0, Wp - 512, NT).astype(np.int32))

    run_case("aligned   [8,40,512] (current)", src, wo_al, xo_al,
             NT, 40, 512, True)
    run_case("unaligned [8,40,512]", src, wo_un, xo_un, NT, 40, 512,
             False)
    run_case("unaligned [8,40,384]", src, wo_un, xo_un, NT, 40, 384,
             False)
    run_case("unaligned [8,33,384]", src, wo_un, xo_un, NT, 33, 384,
             False)
    run_case("unalign-x [8,40,384] (wo 8-al)", src, wo_al, xo_un,
             NT, 40, 384, False)
    run_case("aligned   [8,40,384]", src, wo_al, xo_al, NT, 40, 384,
             True)


if __name__ == "__main__":
    main()
