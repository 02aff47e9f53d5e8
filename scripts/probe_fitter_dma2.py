"""Bisect from the PASSING side: probe_dma_align's kernel structure
verbatim, morphed one ingredient at a time toward the direct fitter's
(which fails Mosaic's dim-1 divisibility check on this stack)."""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make(NT, C, WH, TW, dtype, hint=False):
    def kern(wo_ref, xo_ref, src_hbm, out_hbm, win2, acc, sem_w, sem_o):
        def dma(k, slot):
            wo = wo_ref[k]
            xo = xo_ref[k]
            if hint:
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
            acc[...] = acc[...] + win2[slot, :8, 0, :128].astype(
                jnp.float32)
            return 0

        jax.lax.fori_loop(0, NT, body, 0)
        do = pltpu.make_async_copy(acc, out_hbm, sem_o)
        do.start()
        do.wait()

    return kern


def run_case(name, C, Hp, Wp, WH, TW, dtype, direct_call, hint=False):
    NT = 16
    kern = make(NT, C, WH, TW, dtype, hint=hint)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, C, WH, TW), dtype),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((C, Hp, Wp)).astype(
        np.float32)).astype(dtype)
    if hint:  # aligned runtime values, prover satisfied via the hint
        wo = jnp.asarray((rng.integers(0, (Hp - WH - 8) // 8, NT)
                          * 8).astype(np.int32))
        xo = jnp.asarray((rng.integers(0, (Wp - TW - 128) // 128, NT)
                          * 128).astype(np.int32))
    else:
        wo = jnp.asarray(rng.integers(0, Hp - WH - 2, NT).astype(np.int32))
        xo = jnp.asarray(rng.integers(0, Wp - TW - 2, NT).astype(np.int32))

    if direct_call == "barrier":
        def fb(wo, xo, src):
            wo, xo = jax.lax.optimization_barrier((wo, xo))
            return f(wo, xo, src)
        g = jax.jit(fb)
        args = (wo, xo, src)
    elif direct_call == "const":
        # compile-time-constant origins (the frame-0 hoist case)
        def fc(src):
            return f(wo, xo, src)
        g = jax.jit(fc)
        args = (src,)
    elif direct_call == "const_barrier":
        def fcb(src):
            w, x = jax.lax.optimization_barrier((wo, xo))
            return f(w, x, src)
        g = jax.jit(fcb)
        args = (src,)
    elif direct_call == "scan":
        # the pipeline's structure: pallas_call inside a lax.scan body,
        # origins computed from the scan counter (like jitter_origin(t))
        def sloop(wo, xo, src):
            def body(c, t):
                # perturbation preserves any 8/128 alignment of wo/xo
                o = f(wo + (t % 2) * 8, xo + (t % 2) * 128, src)
                return c + o[0, 0], None
            c, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(4, dtype=jnp.int32))
            return c
        g = jax.jit(sloop)
        args = (wo, xo, src)
    elif direct_call == "fori_idx":
        # fori_loop, origins depend on the loop INDEX (not the carry)
        def floop(wo, xo, src):
            def it(j, acc):
                o = f(wo + j % 2, xo + j % 2, src)
                return acc + o[0, 0]
            return jax.lax.fori_loop(0, 2, it, jnp.float32(0))
        g = jax.jit(floop)
        args = (wo, xo, src)
    elif direct_call == "scan_carry":
        # scan, origins depend on the CARRY (opaque to XLA)
        def sloop(wo, xo, src):
            def body(c, t):
                o = f(wo + c.astype(jnp.int32) % 2,
                      xo + c.astype(jnp.int32) % 2, src)
                return c + o[0, 0], None
            c, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(4, dtype=jnp.int32))
            return c
        g = jax.jit(sloop)
        args = (wo, xo, src)
    elif direct_call:
        g = jax.jit(f)
        args = (wo, xo, src)
    else:
        # probe_dma_align's calling shape: pallas_call inside a traced
        # fori_loop with data-dependent origin perturbation
        def loop(wo, xo, src):
            def it(j, acc):
                o = f(wo + (acc % 2), xo + (acc % 2), src)
                return acc + o[0, 0].astype(jnp.int32) * 0 + 1
            return jax.lax.fori_loop(0, 2, it, jnp.int32(0))
        g = jax.jit(loop)
        args = (wo, xo, src)
    try:
        out = g(*args)
        print(f"{name:<56} ok")
    except Exception as e:
        msg = str(e)
        key = ("divisible" if "divisible" in msg else msg[:90])
        print(f"{name:<56} FAILS: {key}")


def main():
    f32, i32 = jnp.float32, jnp.int32
    run_case("align-probe exact: 8pl i32 [40,512] loop-call",
             8, 768, 1664, 40, 512, i32, False)
    run_case("align-probe direct-call", 8, 768, 1664, 40, 512, i32, True)
    run_case("WH=32 loop-call", 8, 768, 1664, 32, 512, i32, False)
    run_case("f32 loop-call", 8, 768, 1664, 40, 512, f32, False)
    run_case("9pl loop-call", 9, 800, 1664, 40, 512, i32, False)
    run_case("9pl f32 WH=32 loop-call", 9, 800, 1664, 32, 512, f32,
             False)
    run_case("direct-call + opt barrier", 8, 768, 1664, 40, 512, i32,
             "barrier")
    run_case("constant origins", 8, 768, 1664, 40, 512, i32, "const")
    run_case("constant origins + opt barrier", 8, 768, 1664, 40, 512,
             i32, "const_barrier")
    run_case("lax.scan body, origin from counter", 9, 800, 1664, 32,
             512, f32, "scan")
    run_case("fori_loop, origin from index", 9, 800, 1664, 32, 512,
             f32, "fori_idx")
    run_case("lax.scan, origin from carry", 9, 800, 1664, 32, 512,
             f32, "scan_carry")
    run_case("multiple_of hint, direct-call", 9, 808, 1792, 40, 544,
             f32, True, hint=True)
    run_case("multiple_of hint, constant origins", 9, 808, 1792, 40,
             544, f32, "const", hint=True)
    run_case("multiple_of hint, scan counter", 9, 808, 1792, 40, 544,
             f32, "scan", hint=True)


if __name__ == "__main__":
    main()
