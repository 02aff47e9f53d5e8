"""Mosaic feature probes for the v2 warp kernel:
  1. DMA with dynamic sublane (8-aligned) + lane (128-aligned) offsets
  2. lax.switch on an SMEM scalar selecting unrolled bodies
  3. mock v2 tile loop timing (win DMA + y-selects + roll + x-selects)
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

C, WH, TW = 16, 56, 512
TH, TC = 16, 256


def probe_dma2d():
    print("== 1. two-axis dynamic DMA offset ==", flush=True)
    Hp, Wp = 784, 1664

    def kern(wo_ref, xo_ref, src_hbm, out_ref, win, sem):
        wo = pl.multiple_of(wo_ref[0], 8)
        xo = pl.multiple_of(xo_ref[0], 128)
        dma = pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(wo, WH), pl.ds(xo, TW)], win, sem)
        dma.start()
        dma.wait()
        out_ref[...] = win[...]

    @jax.jit
    def run(wo, xo, src):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((C, WH, TW), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((C, WH, TW), jnp.int32),
                            pltpu.SemaphoreType.DMA],
        )(wo, xo, src)

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (C, Hp, Wp),
                                   dtype=np.int64).astype(np.int32))
    try:
        out = run(jnp.asarray([16], jnp.int32), jnp.asarray([384], jnp.int32),
                  src)
        ok = bool(jnp.all(out == src[:, 16:16 + WH, 384:384 + TW]))
        print(f"  two-axis DMA: compiles, correct={ok}", flush=True)
    except Exception as e:
        print(f"  two-axis DMA FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def probe_switch():
    print("== 2. lax.switch in kernel ==", flush=True)

    def kern(cls_ref, x_ref, o_ref):
        def mk(n):
            def body(_):
                acc = jnp.zeros_like(x_ref[0:TH])
                for k in range(n):
                    acc = jnp.where(x_ref[k:k + TH] > k, x_ref[k:k + TH],
                                    acc)
                return acc
            return body

        o_ref[...] = jax.lax.switch(cls_ref[0], [mk(2), mk(4), mk(8)],
                                    None)

    @jax.jit
    def run(cls, x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((TH, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(cls, x)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 10, (24, 128), dtype=np.int64)
                    .astype(np.int32))
    try:
        outs = [np.asarray(run(jnp.asarray([c], jnp.int32), x))
                for c in range(3)]
        differ = not np.array_equal(outs[0], outs[2])
        print(f"  switch: compiles, branches differ={differ}", flush=True)
    except Exception as e:
        print(f"  switch FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def probe_mock_timing():
    print("== 3. mock v2 tile loop timing ==", flush=True)
    Hp, Wp = 784, 1664
    NT = 225
    NY, NX = 8, 8  # mock class depths (avg-ish)

    def kern(wo_ref, xo_ref, ra_ref, src_hbm, sel_hbm, out_hbm,
             win, sel, stage, sem_w, sem_s, sem_o):
        def body(i, _):
            wo = pl.multiple_of(wo_ref[i], 8)
            xo = pl.multiple_of(xo_ref[i], 128)
            dw = pltpu.make_async_copy(
                src_hbm.at[:, pl.ds(wo, WH), pl.ds(xo, TW)], win, sem_w)
            dw.start()
            ds = pltpu.make_async_copy(
                sel_hbm.at[pl.ds(i * 32, 32), :], sel, sem_s)
            ds.start()
            dw.wait()
            ds.wait()
            u = sel[0:TH][None]
            t = sel[TH:32, :TC][None]
            acc0 = jnp.zeros((C, TH, TW), jnp.int32)
            acc1 = jnp.zeros((C, TH, TW), jnp.int32)
            for k in range(NY):
                cmp = u == k
                acc0 = jnp.where(cmp, win[:, k:k + TH, :], acc0)
                acc1 = jnp.where(cmp, win[:, k + 1:k + 1 + TH, :], acc1)
            ra = ra_ref[i]
            r0 = pltpu.roll(acc0, shift=ra, axis=2)
            r1 = pltpu.roll(acc1, shift=ra, axis=2)
            o0 = jnp.zeros((C, TH, TC), jnp.int32)
            o1 = jnp.zeros((C, TH, TC), jnp.int32)
            for j in range(NX):
                cmpj = t == j
                o0 = jnp.where(cmpj, r0[:, :, j:j + TC], o0)
                o1 = jnp.where(cmpj, r1[:, :, j:j + TC], o1)
            stage[0] = o0
            stage[1] = o1
            ty = i // 5
            tx = i % 5
            do = pltpu.make_async_copy(
                stage, out_hbm.at[:, :, pl.ds(ty * TH, TH),
                                  pl.ds(tx * TC, TC)], sem_o)
            do.start()
            do.wait()
            return 0

        jax.lax.fori_loop(0, NT, body, 0)

    @jax.jit
    def run(wo, xo, ra, src, sel):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((2, C, 720, 1280), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
            + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((C, WH, TW), jnp.int32),
                            pltpu.VMEM((32, TW), jnp.int32),
                            pltpu.VMEM((2, C, TH, TC), jnp.int32),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(wo, xo, ra, src, sel)

    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (C, Hp, Wp),
                                   dtype=np.int64).astype(np.int32))
    sel = jnp.asarray(rng.integers(0, NY, (NT * 32, TW), dtype=np.int64)
                      .astype(np.int32))
    wo = jnp.asarray((rng.integers(0, 80, NT) * 8).astype(np.int32))
    xo = jnp.asarray((rng.integers(0, 9, NT) * 128).astype(np.int32))
    ra = jnp.asarray(rng.integers(0, 128, NT).astype(np.int32))

    def loop(n, wo, xo, ra, src, sel):
        def body(i, carry):
            s, acc = carry
            out = run(jnp.where(s < 2**30, wo, wo + 8), xo, ra, src, sel)
            v = out[0, 0, 0, 0]
            return v & 0, acc + v
        return jax.lax.fori_loop(0, n, body, (jnp.int32(0), jnp.int32(0)))[1]

    try:
        lp1 = jax.jit(lambda *a: loop(1, *a))
        lpN = jax.jit(lambda *a: loop(20, *a))
        float(jnp.sum(lp1(wo, xo, ra, src, sel)))
        float(jnp.sum(lpN(wo, xo, ra, src, sel)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(lp1(wo, xo, ra, src, sel)))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jnp.sum(lpN(wo, xo, ra, src, sel)))
            tN = time.perf_counter() - t0
            best = min(best, (tN - t1) / 19)
        print(f"  mock kernel ({NY}y x {NX}x selects): {best*1e3:.3f} "
              f"ms/frame", flush=True)
    except Exception as e:
        print(f"  mock kernel FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "1"):
        probe_dma2d()
    if which in ("all", "2"):
        probe_switch()
    if which in ("all", "3"):
        probe_mock_timing()
